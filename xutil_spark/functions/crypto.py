"""Column crypto: AES/DES encrypt/decrypt + digests (crypto.go parity).

The reference's ``Crypto`` (crypto.go:66-160) supports {AES, DES} ×
{ECB, CBC, CTR, OFB, CFB} × {PKCS5, ZERO} with IV = key.  Coverage:

* **AES × {ECB, CBC, GCM} × {PKCS, NONE}** — Spark-native
  ``aes_encrypt``/``aes_decrypt`` (JVM-side, codegen'd; PKCS#7 ==
  PKCS5 at AES's 16-byte block).  ECB ciphertext is bit-identical to
  the reference (pytest-pinned vs a from-scratch FIPS-197 block);
  native CBC prepends a RANDOM IV (reference uses IV = key) — round
  trips match, ciphertexts don't (documented divergence; use the
  kernel path below for reference-exact CBC bytes).
* **DES × every mode, AES × {CTR, OFB, CFB}** — pure-python kernels
  (kernels/blockciphers: FIPS 46-3 DES + FIPS-197 AES-128 forward
  block, both NIST-KAT-pinned) behind one Arrow-batched pandas UDF,
  with the reference's quirks preserved: IV = key, every mode pads on
  encrypt / unpads on decrypt, ZERO unpadding strips NULs from both
  ends, CFB is full-block feedback.  The kernel path is a parity
  surface, not a throughput path — bulk-encrypt pipelines should use
  the AES-native modes.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_NATIVE_AES_MODES = {"ECB", "CBC", "GCM"}
_KERNEL_MODES = {"ECB", "CBC", "CTR", "OFB", "CFB"}


def _kernel_udf(key: str, algorithm: str, mode: str, padding: str,
                decrypt: bool):
    from pyspark.sql.functions import pandas_udf

    from xutil_spark.kernels.blockciphers import crypt

    kb = key.encode() if isinstance(key, str) else bytes(key)
    pad = "PKCS5" if padding.upper() in ("PKCS", "PKCS5") else "ZERO"

    def run(col: pd.Series) -> pd.Series:
        return col.map(
            lambda v: None if v is None else crypt(
                bytes(v), kb, algorithm, mode, pad, decrypt=decrypt
            )
        )

    run.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return pandas_udf(run, "binary")


def _route(algorithm: str, mode: str) -> str:
    algorithm, mode = algorithm.upper(), mode.upper()
    if algorithm == "AES" and mode in _NATIVE_AES_MODES:
        return "native"
    if algorithm in ("AES", "DES") and mode in _KERNEL_MODES:
        return "kernel"
    raise NotImplementedError(f"{algorithm}/{mode}: reference supports "
                              f"AES|DES x {sorted(_KERNEL_MODES)}")


def encrypt(col, key: str, algorithm: str = "AES", mode: str = "ECB",
            padding: str = "PKCS") -> Column:
    """Crypto.Encrypt (crypto.go:95-125) — binary ciphertext.
    AES ECB/CBC/GCM run JVM-native; DES and the stream modes run the
    NIST-pinned python kernel with reference IV=key semantics."""
    c = col if isinstance(col, Column) else F.col(col)
    if _route(algorithm, mode) == "native":
        return F.aes_encrypt(
            c.cast("binary"), F.lit(key).cast("binary"),
            F.lit(mode.upper()), F.lit(padding.upper()),
        )
    return _kernel_udf(key, algorithm.upper(), mode.upper(), padding,
                       decrypt=False)(c.cast("binary"))


def decrypt(col, key: str, algorithm: str = "AES", mode: str = "ECB",
            padding: str = "PKCS") -> Column:
    """Crypto.Decrypt (crypto.go:127-160)."""
    c = col if isinstance(col, Column) else F.col(col)
    if _route(algorithm, mode) == "native":
        return F.aes_decrypt(
            c, F.lit(key).cast("binary"),
            F.lit(mode.upper()), F.lit(padding.upper()),
        )
    return _kernel_udf(key, algorithm.upper(), mode.upper(), padding,
                       decrypt=True)(c.cast("binary"))


def md5_hex(col) -> Column:
    """Hash.MD5 (crypto.go:24-28)."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.md5(c.cast("binary"))


def sha1_hex(col) -> Column:
    """Hash.SHA1 (crypto.go:31-35)."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.sha1(c.cast("binary"))
