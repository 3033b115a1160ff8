"""Pure-stdlib AES (core/aes.py) — FIPS-197 / SP 800-38A vector pins and
CBC properties. The cipher backs the PDF standard security handler's
AESV2 (/V 4) and AES-256 (/V 5 R 6) crypt filters (test_pdfbin.py covers
the document-level integration)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tika_wrap_spark.core.aes import (
    _decrypt_block,
    _encrypt_block,
    _expand_key,
    _expand_key_dec,
    _INV_SBOX,
    _SBOX,
    cbc_decrypt,
    cbc_encrypt,
)

PT = bytes.fromhex("00112233445566778899aabbccddeeff")


def test_sbox_known_values_and_involution():
    # spot values from the FIPS-197 table — including SBOX[1], the entry a
    # log/exp-table wraparound bug silently corrupts (exp[255] unfilled)
    assert _SBOX[0x00] == 0x63
    assert _SBOX[0x01] == 0x7C
    assert _SBOX[0x53] == 0xED
    assert _SBOX[0xFF] == 0x16
    assert all(_INV_SBOX[_SBOX[i]] == i for i in range(256))


def test_fips197_c1_aes128():
    key = bytes(range(16))
    ct = _encrypt_block(_expand_key(key), PT)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert _decrypt_block(_expand_key_dec(key), ct) == PT


def test_fips197_c3_aes256():
    key = bytes(range(32))
    ct = _encrypt_block(_expand_key(key), PT)
    assert ct.hex() == "8ea2b7ca516745bfeafc49904b496089"
    assert _decrypt_block(_expand_key_dec(key), ct) == PT


def test_sp800_38a_cbc_aes256():
    key = bytes.fromhex(
        "603deb1015ca71be2b73aef0857d77811f352c073b6108d72d9810a30914dff4"
    )
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
    assert cbc_encrypt(key, iv, pt).hex() == "f58c4c04d6e5f1ba779eabfb5f7bfbd6"
    assert cbc_decrypt(key, iv, bytes.fromhex("f58c4c04d6e5f1ba779eabfb5f7bfbd6")) == pt


@given(
    st.binary(min_size=16, max_size=16),
    st.sampled_from([16, 32]),
    st.binary(min_size=0, max_size=20),
)
@settings(max_examples=40, deadline=None)
def test_cbc_roundtrip_property(iv, klen, seed):
    key = (seed * 3 + bytes(64))[:klen]
    data = (seed + bytes(48))[: (len(seed) // 16 + 2) * 16]
    assert cbc_decrypt(key, iv, cbc_encrypt(key, iv, data)) == data


def test_cbc_rejects_misaligned():
    with pytest.raises(ValueError):
        cbc_encrypt(bytes(16), bytes(16), b"short")
    with pytest.raises(ValueError):
        cbc_decrypt(bytes(16), bytes(16), b"17-bytes-of-data!")
