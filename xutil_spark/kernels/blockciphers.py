"""Pure-python block ciphers + cipher modes for the reference's
``Crypto`` surface (crypto.go:66-160): DES (FIPS 46-3, public tables)
and an AES-128 forward block (FIPS-197) powering the stream modes.

Spark's native ``aes_encrypt`` covers AES × {ECB, CBC, GCM}; everything
else the reference supports — DES in every mode, AES CTR/OFB/CFB — is
implemented here and exposed as Arrow-batched UDFs in
functions/crypto.py.  Correctness pins (tests/test_relational_text.py):

* DES forward/inverse on the classic FIPS-81-lineage known-answer
  vector (key 133457799BBCDFF1, pt 0123456789ABCDEF →
  ct 85E813540F0AB405);
* AES-128 CTR / OFB / CFB128 first blocks against NIST SP 800-38A
  (F.5.1 / F.4.1 / F.3.13);
* round-trips across every algorithm × mode × padding combination.

Reference quirks preserved (crypto.go):

* the IV defaults to the KEY (``NewCrypto``, crypto.go:77);
* padding is applied in EVERY mode — the stream modes pad too
  (crypto.go:105, before the mode switch), and decrypt unpads in every
  mode (crypto.go:159);
* ``ZERO`` unpadding is Go ``bytes.TrimFunc`` — it strips NUL bytes
  from BOTH ends of the plaintext (crypto.go:60-64);
* CFB is full-block feedback (Go ``cipher.NewCFBEncrypter``): CFB128
  for AES, CFB64 for DES.
"""

from __future__ import annotations

# --------------------------------------------------------------- DES
# FIPS 46-3 tables (public standard), 1-based as printed.

_IP = [58, 50, 42, 34, 26, 18, 10, 2, 60, 52, 44, 36, 28, 20, 12, 4,
       62, 54, 46, 38, 30, 22, 14, 6, 64, 56, 48, 40, 32, 24, 16, 8,
       57, 49, 41, 33, 25, 17, 9, 1, 59, 51, 43, 35, 27, 19, 11, 3,
       61, 53, 45, 37, 29, 21, 13, 5, 63, 55, 47, 39, 31, 23, 15, 7]
_FP = [40, 8, 48, 16, 56, 24, 64, 32, 39, 7, 47, 15, 55, 23, 63, 31,
       38, 6, 46, 14, 54, 22, 62, 30, 37, 5, 45, 13, 53, 21, 61, 29,
       36, 4, 44, 12, 52, 20, 60, 28, 35, 3, 43, 11, 51, 19, 59, 27,
       34, 2, 42, 10, 50, 18, 58, 26, 33, 1, 41, 9, 49, 17, 57, 25]
_E = [32, 1, 2, 3, 4, 5, 4, 5, 6, 7, 8, 9, 8, 9, 10, 11, 12, 13,
      12, 13, 14, 15, 16, 17, 16, 17, 18, 19, 20, 21, 20, 21, 22, 23,
      24, 25, 24, 25, 26, 27, 28, 29, 28, 29, 30, 31, 32, 1]
_P = [16, 7, 20, 21, 29, 12, 28, 17, 1, 15, 23, 26, 5, 18, 31, 10,
      2, 8, 24, 14, 32, 27, 3, 9, 19, 13, 30, 6, 22, 11, 4, 25]
_PC1 = [57, 49, 41, 33, 25, 17, 9, 1, 58, 50, 42, 34, 26, 18,
        10, 2, 59, 51, 43, 35, 27, 19, 11, 3, 60, 52, 44, 36,
        63, 55, 47, 39, 31, 23, 15, 7, 62, 54, 46, 38, 30, 22,
        14, 6, 61, 53, 45, 37, 29, 21, 13, 5, 28, 20, 12, 4]
_PC2 = [14, 17, 11, 24, 1, 5, 3, 28, 15, 6, 21, 10,
        23, 19, 12, 4, 26, 8, 16, 7, 27, 20, 13, 2,
        41, 52, 31, 37, 47, 55, 30, 40, 51, 45, 33, 48,
        44, 49, 39, 56, 34, 53, 46, 42, 50, 36, 29, 32]
_SHIFTS = [1, 1, 2, 2, 2, 2, 2, 2, 1, 2, 2, 2, 2, 2, 2, 1]
_SBOX = [
    [14, 4, 13, 1, 2, 15, 11, 8, 3, 10, 6, 12, 5, 9, 0, 7,
     0, 15, 7, 4, 14, 2, 13, 1, 10, 6, 12, 11, 9, 5, 3, 8,
     4, 1, 14, 8, 13, 6, 2, 11, 15, 12, 9, 7, 3, 10, 5, 0,
     15, 12, 8, 2, 4, 9, 1, 7, 5, 11, 3, 14, 10, 0, 6, 13],
    [15, 1, 8, 14, 6, 11, 3, 4, 9, 7, 2, 13, 12, 0, 5, 10,
     3, 13, 4, 7, 15, 2, 8, 14, 12, 0, 1, 10, 6, 9, 11, 5,
     0, 14, 7, 11, 10, 4, 13, 1, 5, 8, 12, 6, 9, 3, 2, 15,
     13, 8, 10, 1, 3, 15, 4, 2, 11, 6, 7, 12, 0, 5, 14, 9],
    [10, 0, 9, 14, 6, 3, 15, 5, 1, 13, 12, 7, 11, 4, 2, 8,
     13, 7, 0, 9, 3, 4, 6, 10, 2, 8, 5, 14, 12, 11, 15, 1,
     13, 6, 4, 9, 8, 15, 3, 0, 11, 1, 2, 12, 5, 10, 14, 7,
     1, 10, 13, 0, 6, 9, 8, 7, 4, 15, 14, 3, 11, 5, 2, 12],
    [7, 13, 14, 3, 0, 6, 9, 10, 1, 2, 8, 5, 11, 12, 4, 15,
     13, 8, 11, 5, 6, 15, 0, 3, 4, 7, 2, 12, 1, 10, 14, 9,
     10, 6, 9, 0, 12, 11, 7, 13, 15, 1, 3, 14, 5, 2, 8, 4,
     3, 15, 0, 6, 10, 1, 13, 8, 9, 4, 5, 11, 12, 7, 2, 14],
    [2, 12, 4, 1, 7, 10, 11, 6, 8, 5, 3, 15, 13, 0, 14, 9,
     14, 11, 2, 12, 4, 7, 13, 1, 5, 0, 15, 10, 3, 9, 8, 6,
     4, 2, 1, 11, 10, 13, 7, 8, 15, 9, 12, 5, 6, 3, 0, 14,
     11, 8, 12, 7, 1, 14, 2, 13, 6, 15, 0, 9, 10, 4, 5, 3],
    [12, 1, 10, 15, 9, 2, 6, 8, 0, 13, 3, 4, 14, 7, 5, 11,
     10, 15, 4, 2, 7, 12, 9, 5, 6, 1, 13, 14, 0, 11, 3, 8,
     9, 14, 15, 5, 2, 8, 12, 3, 7, 0, 4, 10, 1, 13, 11, 6,
     4, 3, 2, 12, 9, 5, 15, 10, 11, 14, 1, 7, 6, 0, 8, 13],
    [4, 11, 2, 14, 15, 0, 8, 13, 3, 12, 9, 7, 5, 10, 6, 1,
     13, 0, 11, 7, 4, 9, 1, 10, 14, 3, 5, 12, 2, 15, 8, 6,
     1, 4, 11, 13, 12, 3, 7, 14, 10, 15, 6, 8, 0, 5, 9, 2,
     6, 11, 13, 8, 1, 4, 10, 7, 9, 5, 0, 15, 14, 2, 3, 12],
    [13, 2, 8, 4, 6, 15, 11, 1, 10, 9, 3, 14, 5, 0, 12, 7,
     1, 15, 13, 8, 10, 3, 7, 4, 12, 5, 6, 11, 0, 14, 9, 2,
     7, 11, 4, 1, 9, 12, 14, 2, 0, 6, 10, 13, 15, 3, 5, 8,
     2, 1, 14, 7, 4, 10, 8, 13, 15, 12, 9, 0, 3, 5, 6, 11],
]


def _permute(val: int, width: int, table: list[int]) -> int:
    out = 0
    for pos in table:
        out = (out << 1) | ((val >> (width - pos)) & 1)
    return out


def des_subkeys(key: bytes) -> list[int]:
    """16 round subkeys (48-bit ints) from an 8-byte key."""
    if len(key) != 8:
        raise ValueError("DES key must be 8 bytes")
    k = int.from_bytes(key, "big")
    cd = _permute(k, 64, _PC1)
    c, d = cd >> 28, cd & 0xFFFFFFF
    keys = []
    for s in _SHIFTS:
        c = ((c << s) | (c >> (28 - s))) & 0xFFFFFFF
        d = ((d << s) | (d >> (28 - s))) & 0xFFFFFFF
        keys.append(_permute((c << 28) | d, 56, _PC2))
    return keys


def _des_f(r: int, k: int) -> int:
    x = _permute(r, 32, _E) ^ k
    out = 0
    for i in range(8):
        six = (x >> (42 - 6 * i)) & 0x3F
        row = ((six >> 4) & 0b10) | (six & 1)
        col = (six >> 1) & 0xF
        out = (out << 4) | _SBOX[i][(row << 4) | col]
    return _permute(out, 32, _P)


def des_block(block: bytes, subkeys: list[int], decrypt: bool = False) -> bytes:
    """One 8-byte DES block through 16 Feistel rounds."""
    v = _permute(int.from_bytes(block, "big"), 64, _IP)
    l, r = v >> 32, v & 0xFFFFFFFF
    for k in (reversed(subkeys) if decrypt else subkeys):
        l, r = r, l ^ _des_f(r, k)
    return _permute((r << 32) | l, 64, _FP).to_bytes(8, "big")


class DES:
    block_size = 8

    def __init__(self, key: bytes):
        self._ks = des_subkeys(key)

    def encrypt_block(self, b: bytes) -> bytes:
        return des_block(b, self._ks)

    def decrypt_block(self, b: bytes) -> bytes:
        return des_block(b, self._ks, decrypt=True)


# ------------------------------------------------------------- AES-128
# FIPS-197 forward block (the stream modes need only encryption).

def _aes_sbox() -> list[int]:
    p = q = 1
    sbox = [0] * 256
    while True:
        p = p ^ ((p << 1) & 0xFF) ^ (0x1B if p & 0x80 else 0)
        q ^= q << 1
        q ^= q << 2
        q ^= q << 4
        q &= 0xFF
        if q & 0x80:
            q ^= 0x09
        x = q ^ ((q << 1) | (q >> 7)) ^ ((q << 2) | (q >> 6)) \
            ^ ((q << 3) | (q >> 5)) ^ ((q << 4) | (q >> 4))
        sbox[p] = (x ^ 0x63) & 0xFF
        if p == 1:
            break
    sbox[0] = 0x63
    return sbox


_SB = _aes_sbox()
_INV_SB = [0] * 256
for _i, _v in enumerate(_SB):
    _INV_SB[_v] = _i


def _xtime(a: int) -> int:
    return ((a << 1) ^ 0x1B) & 0xFF if a & 0x80 else a << 1


def _gm(a: int, b: int) -> int:
    """GF(2^8) multiply (InvMixColumns coefficients 9/11/13/14)."""
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


def _aes128_expand(key: bytes) -> list[list[int]]:
    w = [list(key[i:i + 4]) for i in range(0, 16, 4)]
    rcon = 1
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = [_SB[t[1]] ^ rcon, _SB[t[2]], _SB[t[3]], _SB[t[0]]]
            rcon = _xtime(rcon)
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return w


class AES128:
    block_size = 16

    def __init__(self, key: bytes):
        if len(key) != 16:
            raise ValueError("AES-128 key must be 16 bytes")
        self._w = _aes128_expand(key)

    def encrypt_block(self, block: bytes) -> bytes:
        w = self._w
        s = [[block[r + 4 * c] for c in range(4)] for r in range(4)]
        for r in range(4):
            for c in range(4):
                s[r][c] ^= w[c][r]
        for rnd in range(1, 11):
            s = [[_SB[x] for x in row] for row in s]
            s = [s[r][r:] + s[r][:r] for r in range(4)]
            if rnd < 10:
                ns = [[0] * 4 for _ in range(4)]
                for c in range(4):
                    a = [s[r][c] for r in range(4)]
                    ns[0][c] = _xtime(a[0]) ^ _xtime(a[1]) ^ a[1] ^ a[2] ^ a[3]
                    ns[1][c] = a[0] ^ _xtime(a[1]) ^ _xtime(a[2]) ^ a[2] ^ a[3]
                    ns[2][c] = a[0] ^ a[1] ^ _xtime(a[2]) ^ _xtime(a[3]) ^ a[3]
                    ns[3][c] = _xtime(a[0]) ^ a[0] ^ a[1] ^ a[2] ^ _xtime(a[3])
                s = ns
            for r in range(4):
                for c in range(4):
                    s[r][c] ^= w[4 * rnd + c][r]
        return bytes(s[r % 4][r // 4] for r in range(16))

    def decrypt_block(self, block: bytes) -> bytes:
        """FIPS-197 inverse cipher (the engine routes AES ECB/CBC
        decrypt to Spark's native kernel; this completes the pure-
        python matrix for tests and standalone use)."""
        w = self._w
        s = [[block[r + 4 * c] for c in range(4)] for r in range(4)]
        for r in range(4):
            for c in range(4):
                s[r][c] ^= w[40 + c][r]
        for rnd in range(9, -1, -1):
            s = [s[r][-r:] + s[r][:-r] if r else s[r] for r in range(4)]
            s = [[_INV_SB[x] for x in row] for row in s]
            for r in range(4):
                for c in range(4):
                    s[r][c] ^= w[4 * rnd + c][r]
            if rnd > 0:
                ns = [[0] * 4 for _ in range(4)]
                for c in range(4):
                    a = [s[r][c] for r in range(4)]
                    ns[0][c] = _gm(a[0], 14) ^ _gm(a[1], 11) ^ _gm(a[2], 13) ^ _gm(a[3], 9)
                    ns[1][c] = _gm(a[0], 9) ^ _gm(a[1], 14) ^ _gm(a[2], 11) ^ _gm(a[3], 13)
                    ns[2][c] = _gm(a[0], 13) ^ _gm(a[1], 9) ^ _gm(a[2], 14) ^ _gm(a[3], 11)
                    ns[3][c] = _gm(a[0], 11) ^ _gm(a[1], 13) ^ _gm(a[2], 9) ^ _gm(a[3], 14)
                s = ns
        return bytes(s[r % 4][r // 4] for r in range(16))


# ------------------------------------------------------------ mode layer


def _pad(data: bytes, bs: int, padding: str) -> bytes:
    n = bs - len(data) % bs
    if padding == "PKCS5":
        return data + bytes([n]) * n
    return data + b"\x00" * n


def _unpad(data: bytes, padding: str) -> bytes:
    if padding == "PKCS5":
        if not data:
            return data
        return data[: len(data) - data[-1]]
    # Go bytes.TrimFunc(r == 0): strips NULs from BOTH ends (quirk)
    return data.strip(b"\x00")


def _keystream_apply(cipher, iv: bytes, data: bytes, mode: str,
                     decrypt: bool) -> bytes:
    """CTR / OFB / CFB over a full-block feedback register."""
    bs = cipher.block_size
    out = bytearray()
    reg = iv
    ctr = int.from_bytes(iv, "big")
    for i in range(0, len(data), bs):
        chunk = data[i:i + bs]
        if mode == "CTR":
            ks = cipher.encrypt_block(ctr.to_bytes(bs, "big"))
            ctr = (ctr + 1) % (1 << (8 * bs))
        elif mode == "OFB":
            reg = cipher.encrypt_block(reg)
            ks = reg
        else:  # CFB, full-block feedback
            ks = cipher.encrypt_block(reg)
        enc = bytes(a ^ b for a, b in zip(chunk, ks))
        if mode == "CFB":
            # feedback = ciphertext (input chunk when decrypting)
            reg = (chunk if decrypt else enc)[:bs]
            reg = reg + b"\x00" * (bs - len(reg))  # short final chunk
        out += enc
    return bytes(out)


def crypt(data: bytes, key: bytes, algorithm: str = "AES", mode: str = "CBC",
          padding: str = "PKCS5", iv: bytes | None = None,
          decrypt: bool = False) -> bytes:
    """crypto.go Encrypt/Decrypt semantics for one value: pad-then-mode
    on encrypt (EVERY mode pads, crypto.go:105), mode-then-unpad on
    decrypt (crypto.go:159); IV defaults to the key."""
    cipher = DES(key) if algorithm == "DES" else AES128(key)
    bs = cipher.block_size
    iv = (key if iv is None else iv)[:bs]
    if not decrypt:
        data = _pad(data, bs, padding)
    if mode in ("CTR", "OFB", "CFB"):
        out = _keystream_apply(cipher, iv, data, mode, decrypt)
    elif mode == "ECB":
        f = cipher.decrypt_block if decrypt else cipher.encrypt_block
        out = b"".join(f(data[i:i + bs]) for i in range(0, len(data), bs))
    elif mode == "CBC":
        out = bytearray()
        prev = iv
        for i in range(0, len(data), bs):
            blk = data[i:i + bs]
            if decrypt:
                dec = cipher.decrypt_block(blk)
                out += bytes(a ^ b for a, b in zip(dec, prev))
                prev = blk
            else:
                x = bytes(a ^ b for a, b in zip(blk, prev))
                prev = cipher.encrypt_block(x)
                out += prev
        out = bytes(out)
    else:
        raise NotImplementedError(f"mode {mode}")
    return _unpad(out, padding) if decrypt else out
