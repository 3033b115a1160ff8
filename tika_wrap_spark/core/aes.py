"""Pure-stdlib AES-128/256 CBC (FIPS-197) — the crypt primitive behind the
PDF standard security handler's AESV2 (/V 4) and AESV3 (/V 5 R 6) filters
(PDF 32000 §7.6.2; ISO 32000-2 Algorithm 2.A/2.B). The reference opens such
documents via Tika (/root/reference/src/java-env.cpp:313); the rebuild
implements the cipher itself — tables are computed at import from the
GF(2^8) definition, encryption/decryption use the standard 32-bit T-table
formulation (public-domain structure), fast enough (~MB/s) for the rare
encrypted-document slice.

Only CBC (plus the single-block ECB case CBC-with-zero-IV degenerates to)
is provided — exactly what the PDF handler needs. No padding here; PKCS#7
handling is the caller's (pdfbin) concern.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# tables, computed from the field definition (no magic constants beyond the
# FIPS-197 polynomial 0x11B and the 0x63 affine constant)
# ---------------------------------------------------------------------------


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _build_tables():
    # log/exp over generator 3 (x+1), a generator of GF(256)*
    exp = [0] * 256
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= _xtime(x)  # multiply by 3
    def gmul(a: int, b: int) -> int:
        if a == 0 or b == 0:
            return 0
        return exp[(log[a] + log[b]) % 255]

    sbox = [0] * 256
    inv_sbox = [0] * 256
    for a in range(256):
        # (255 - log) mod 255: without the wrap, inv(1) reads exp[255],
        # one past the filled cycle — SBOX[1] silently wrong
        inv = exp[(255 - log[a]) % 255] if a else 0
        b = inv
        s = 0x63
        for _ in range(5):  # b ^ rotl1 ^ rotl2 ^ rotl3 ^ rotl4, folded
            s ^= b
            b = ((b << 1) | (b >> 7)) & 0xFF
        sbox[a] = s
        inv_sbox[s] = a

    # encryption T-tables: column = 2,1,1,3 MixColumns of sbox output
    t0 = [0] * 256
    te = [t0, [0] * 256, [0] * 256, [0] * 256]
    td = [[0] * 256, [0] * 256, [0] * 256, [0] * 256]
    for a in range(256):
        s = sbox[a]
        w = (gmul(s, 2) << 24) | (s << 16) | (s << 8) | gmul(s, 3)
        for i in range(4):
            te[i][a] = w
            w = ((w >> 8) | (w << 24)) & 0xFFFFFFFF
        si = inv_sbox[a]
        # decryption tables: InvMixColumns (14,9,13,11) of inv-sbox output
        wd = (
            (gmul(si, 14) << 24)
            | (gmul(si, 9) << 16)
            | (gmul(si, 13) << 8)
            | gmul(si, 11)
        )
        for i in range(4):
            td[i][a] = wd
            wd = ((wd >> 8) | (wd << 24)) & 0xFFFFFFFF
    return sbox, inv_sbox, te, td, gmul


_SBOX, _INV_SBOX, _TE, _TD, _GMUL = _build_tables()
_TE0, _TE1, _TE2, _TE3 = _TE
_TD0, _TD1, _TD2, _TD3 = _TD
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36, 0x6C, 0xD8]


def _expand_key(key: bytes) -> list[int]:
    """Key schedule -> list of 4*(Nr+1) 32-bit round-key words."""
    nk = len(key) // 4
    if nk not in (4, 8):
        raise ValueError("AES key must be 16 or 32 bytes")
    nr = nk + 6
    w = [int.from_bytes(key[4 * i : 4 * i + 4], "big") for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = ((t << 8) | (t >> 24)) & 0xFFFFFFFF  # RotWord
            t = (
                (_SBOX[(t >> 24) & 0xFF] << 24)
                | (_SBOX[(t >> 16) & 0xFF] << 16)
                | (_SBOX[(t >> 8) & 0xFF] << 8)
                | _SBOX[t & 0xFF]
            )
            t ^= _RCON[i // nk - 1] << 24
        elif nk == 8 and i % nk == 4:
            t = (
                (_SBOX[(t >> 24) & 0xFF] << 24)
                | (_SBOX[(t >> 16) & 0xFF] << 16)
                | (_SBOX[(t >> 8) & 0xFF] << 8)
                | _SBOX[t & 0xFF]
            )
        w.append(w[i - nk] ^ t)
    return w


def _expand_key_dec(key: bytes) -> list[int]:
    """Equivalent-inverse-cipher round keys: reversed order, InvMixColumns
    applied to the middle rounds."""
    w = _expand_key(key)
    nr = len(w) // 4 - 1
    dw: list[int] = []
    for rnd in range(nr, -1, -1):
        for i in range(4):
            word = w[4 * rnd + i]
            if 0 < rnd < nr:
                # InvMixColumns on the round-key word via TD(SBOX^-1(SBOX(x)))
                word = (
                    _TD0[_SBOX[(word >> 24) & 0xFF]]
                    ^ _TD1[_SBOX[(word >> 16) & 0xFF]]
                    ^ _TD2[_SBOX[(word >> 8) & 0xFF]]
                    ^ _TD3[_SBOX[word & 0xFF]]
                )
            dw.append(word)
    return dw


def _encrypt_block(w: list[int], b: bytes) -> bytes:
    nr = len(w) // 4 - 1
    s0 = int.from_bytes(b[0:4], "big") ^ w[0]
    s1 = int.from_bytes(b[4:8], "big") ^ w[1]
    s2 = int.from_bytes(b[8:12], "big") ^ w[2]
    s3 = int.from_bytes(b[12:16], "big") ^ w[3]
    k = 4
    for _ in range(nr - 1):
        t0 = _TE0[s0 >> 24] ^ _TE1[(s1 >> 16) & 0xFF] ^ _TE2[(s2 >> 8) & 0xFF] ^ _TE3[s3 & 0xFF] ^ w[k]
        t1 = _TE0[s1 >> 24] ^ _TE1[(s2 >> 16) & 0xFF] ^ _TE2[(s3 >> 8) & 0xFF] ^ _TE3[s0 & 0xFF] ^ w[k + 1]
        t2 = _TE0[s2 >> 24] ^ _TE1[(s3 >> 16) & 0xFF] ^ _TE2[(s0 >> 8) & 0xFF] ^ _TE3[s1 & 0xFF] ^ w[k + 2]
        t3 = _TE0[s3 >> 24] ^ _TE1[(s0 >> 16) & 0xFF] ^ _TE2[(s1 >> 8) & 0xFF] ^ _TE3[s2 & 0xFF] ^ w[k + 3]
        s0, s1, s2, s3 = t0, t1, t2, t3
        k += 4
    out = bytearray(16)
    for i, (a, b_, c, d) in enumerate(
        ((s0, s1, s2, s3), (s1, s2, s3, s0), (s2, s3, s0, s1), (s3, s0, s1, s2))
    ):
        word = (
            (_SBOX[a >> 24] << 24)
            | (_SBOX[(b_ >> 16) & 0xFF] << 16)
            | (_SBOX[(c >> 8) & 0xFF] << 8)
            | _SBOX[d & 0xFF]
        ) ^ w[k + i]
        out[4 * i : 4 * i + 4] = word.to_bytes(4, "big")
    return bytes(out)


def _decrypt_block(dw: list[int], b: bytes) -> bytes:
    nr = len(dw) // 4 - 1
    s0 = int.from_bytes(b[0:4], "big") ^ dw[0]
    s1 = int.from_bytes(b[4:8], "big") ^ dw[1]
    s2 = int.from_bytes(b[8:12], "big") ^ dw[2]
    s3 = int.from_bytes(b[12:16], "big") ^ dw[3]
    k = 4
    for _ in range(nr - 1):
        t0 = _TD0[s0 >> 24] ^ _TD1[(s3 >> 16) & 0xFF] ^ _TD2[(s2 >> 8) & 0xFF] ^ _TD3[s1 & 0xFF] ^ dw[k]
        t1 = _TD0[s1 >> 24] ^ _TD1[(s0 >> 16) & 0xFF] ^ _TD2[(s3 >> 8) & 0xFF] ^ _TD3[s2 & 0xFF] ^ dw[k + 1]
        t2 = _TD0[s2 >> 24] ^ _TD1[(s1 >> 16) & 0xFF] ^ _TD2[(s0 >> 8) & 0xFF] ^ _TD3[s3 & 0xFF] ^ dw[k + 2]
        t3 = _TD0[s3 >> 24] ^ _TD1[(s2 >> 16) & 0xFF] ^ _TD2[(s1 >> 8) & 0xFF] ^ _TD3[s0 & 0xFF] ^ dw[k + 3]
        s0, s1, s2, s3 = t0, t1, t2, t3
        k += 4
    out = bytearray(16)
    for i, (a, b_, c, d) in enumerate(
        ((s0, s3, s2, s1), (s1, s0, s3, s2), (s2, s1, s0, s3), (s3, s2, s1, s0))
    ):
        word = (
            (_INV_SBOX[a >> 24] << 24)
            | (_INV_SBOX[(b_ >> 16) & 0xFF] << 16)
            | (_INV_SBOX[(c >> 8) & 0xFF] << 8)
            | _INV_SBOX[d & 0xFF]
        ) ^ dw[k + i]
        out[4 * i : 4 * i + 4] = word.to_bytes(4, "big")
    return bytes(out)


# ---------------------------------------------------------------------------
# CBC (no padding — callers handle PKCS#7 where the format demands it)
# ---------------------------------------------------------------------------


def cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    if len(data) % 16:
        raise ValueError("CBC plaintext must be a multiple of 16 bytes")
    w = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(x ^ y for x, y in zip(data[i : i + 16], prev))
        prev = _encrypt_block(w, block)
        out += prev
    return bytes(out)


def cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    if len(data) % 16:
        raise ValueError("CBC ciphertext must be a multiple of 16 bytes")
    dw = _expand_key_dec(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        ct = data[i : i + 16]
        out += bytes(x ^ y for x, y in zip(_decrypt_block(dw, ct), prev))
        prev = ct
    return bytes(out)
