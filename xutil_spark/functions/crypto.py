"""Column crypto: AES encrypt/decrypt + digests (crypto.go parity).

The reference's ``Crypto`` (crypto.go:95-160) supports AES/DES across
ECB/CBC/CTR/OFB/CFB with PKCS5 or zero padding.  Spark ships native
``aes_encrypt``/``aes_decrypt`` (JVM-side, codegen'd) covering AES ×
{ECB, CBC, GCM} × {PKCS, NONE} — PKCS here is PKCS#7, identical to
PKCS5 at AES's 16-byte block size, so AES/ECB/PKCS5 and AES/CBC/PKCS5
round-trip bit-identically with the reference.

DES and the CTR/OFB/CFB stream modes have no Spark builtin and no
crypto library exists in this environment; requesting them raises
``NotImplementedError`` (documented gap, not silent fallback).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SUPPORTED_MODES = {"ECB", "CBC", "GCM"}


def _check(algorithm: str, mode: str) -> None:
    if algorithm.upper() != "AES":
        raise NotImplementedError(
            f"algorithm {algorithm}: only AES has a Spark-native kernel "
            "(crypto.go DES path needs a cipher library absent here)"
        )
    if mode.upper() not in _SUPPORTED_MODES:
        raise NotImplementedError(
            f"mode {mode}: Spark aes_encrypt supports {_SUPPORTED_MODES}"
        )


def encrypt(col, key: str, algorithm: str = "AES", mode: str = "ECB",
            padding: str = "PKCS") -> Column:
    """Crypto.Encrypt (crypto.go:95-125) for the AES modes — returns
    binary ciphertext.  ``key`` must be 16/24/32 bytes."""
    _check(algorithm, mode)
    c = col if isinstance(col, Column) else F.col(col)
    return F.aes_encrypt(
        c.cast("binary"), F.lit(key).cast("binary"),
        F.lit(mode.upper()), F.lit(padding.upper()),
    )


def decrypt(col, key: str, algorithm: str = "AES", mode: str = "ECB",
            padding: str = "PKCS") -> Column:
    """Crypto.Decrypt (crypto.go:127-160) for the AES modes."""
    _check(algorithm, mode)
    c = col if isinstance(col, Column) else F.col(col)
    return F.aes_decrypt(
        c, F.lit(key).cast("binary"),
        F.lit(mode.upper()), F.lit(padding.upper()),
    )


def md5_hex(col) -> Column:
    """Hash.MD5 (crypto.go:24-28)."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.md5(c.cast("binary"))


def sha1_hex(col) -> Column:
    """Hash.SHA1 (crypto.go:31-35)."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.sha1(c.cast("binary"))
