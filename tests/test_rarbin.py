"""RAR5 archives — core/rarbin.py parse_rar / build_rar.

Header walk per the official RAR 5.0 technote (vint numbers, CRC32 over
size-field+data, file headers with stored payloads). The builder's
archives are pinned against the system bsdtar (libarchive's independent
RAR5 reader) — libarchive cannot WRITE rar, so the reverse direction is
spec-vector + roundtrip pinned. The proprietary compressed methods and
RAR4 raise the declared seam (commons-compress takes the same position;
Tika reads rar via junrar, /root/reference/src/java-env.cpp:313-314)."""

import os
import random
import shutil
import subprocess
import tempfile

import pytest

from tika_wrap_spark.core.errors import ExtractError
from tika_wrap_spark.core.extract import extract_document
from tika_wrap_spark.core.rarbin import (
    RAR4_MAGIC,
    _vint,
    _vint_enc,
    build_rar,
    build_rar_text,
    parse_rar,
)
from tika_wrap_spark.core.sniff import KIND_RAR, sniff_kind
from tika_wrap_spark.core.tarbin import build_tar_text

_HAS_BSDTAR = shutil.which("bsdtar") is not None

_FILES = [
    ("a.txt", b"alpha payload"),
    ("sub/b.csv", b"x,y\n1,2\n" * 40),
    ("c.bin", bytes(range(256)) * 4),
]


def test_vint_roundtrip():
    for v in (0, 1, 0x7F, 0x80, 0x3FFF, 0x4000, 1 << 20, (1 << 63) + 7):
        enc = _vint_enc(v)
        assert _vint(enc, 0) == (v, len(enc)), v


def test_roundtrip_and_order():
    assert parse_rar(build_rar(_FILES)) == _FILES


def test_builder_refuses_empty_members():
    # libarchive spins on zero-size data areas and rejects absent ones —
    # there is no portable empty encoding, so the builder refuses
    with pytest.raises(ValueError):
        build_rar([("e.txt", b"")])


def test_reader_accepts_empty_no_data_layout():
    """Other writers encode empty files with NO data area (header flag
    bit 2 unset) — the reader must yield an empty payload for those."""
    import struct
    import zlib

    from tika_wrap_spark.core import rarbin as rb

    out = bytearray(rb.RAR5_MAGIC)
    out += rb._header(1, rb._vint_enc(0))
    fields = (
        rb._vint_enc(0)  # file flags: no mtime/crc
        + rb._vint_enc(0)  # unpacked size
        + rb._vint_enc(0)  # attributes
        + rb._vint_enc(0)  # compression info (stored)
        + rb._vint_enc(0)  # host os
        + rb._vint_enc(len(b"empty.txt"))
        + b"empty.txt"
    )
    out += rb._header(2, fields)  # NO data area
    out += rb._header(5, rb._vint_enc(0))
    assert parse_rar(bytes(out)) == [("empty.txt", b"")]


def test_unsupported_seams_raise():
    good = build_rar(_FILES)
    with pytest.raises(ExtractError, match="RAR4"):
        parse_rar(RAR4_MAGIC + good[8:])
    with pytest.raises(ExtractError):
        parse_rar(good[:-5])  # cut end header
    flip = len(good) - 40  # inside the last stored payload
    bad = good[:flip] + bytes([good[flip] ^ 0xFF]) + good[flip + 1 :]
    with pytest.raises(ExtractError):
        parse_rar(bad)


def test_bitflip_fuzz_policy():
    rng = random.Random(55)
    base = build_rar(_FILES)
    for _ in range(400):
        i = rng.randrange(len(base))
        bad = base[:i] + bytes([base[i] ^ (1 << rng.randrange(8))]) + base[i + 1 :]
        try:
            parse_rar(bad)
        except ExtractError:
            pass


@pytest.mark.skipif(not _HAS_BSDTAR, reason="no system bsdtar")
def test_builder_archives_extract_through_libarchive():
    a = build_rar(_FILES)
    with tempfile.NamedTemporaryFile(suffix=".rar", delete=False) as f:
        f.write(a)
        path = f.name
    try:
        p = subprocess.run(["bsdtar", "-tf", path], capture_output=True, timeout=30)
        assert p.returncode == 0, p.stderr[:200]
        assert p.stdout.decode().split() == [n for n, _p in _FILES]
        for name, payload in _FILES:
            p = subprocess.run(
                ["bsdtar", "-xOf", path, name], capture_output=True, timeout=30
            )
            assert p.returncode == 0 and p.stdout == payload, (name, p.stderr[:200])
    finally:
        os.unlink(path)


def test_extraction_routes_and_recurses():
    inner = build_tar_text([("deep/x.txt", "buried text")])
    a = build_rar_text([("top.txt", "surface note"), ("pack.tar", inner)])
    assert sniff_kind(a) == KIND_RAR
    assert sniff_kind("Rar! said the pirate") != KIND_RAR
    r = extract_document([{"kind": "text", "text": a, "media_ref": "", "offset": 0}])
    assert r["parse_ok"]
    assert r["meta"]["container_format"] == "rar"
    assert int(r["meta"]["n_container_entries"]) == 3
    texts = [s["text"] for s in r["spans"]]
    assert "surface note" in texts and "buried text" in texts


def test_corrupt_becomes_error_row():
    a = build_rar_text([("doomed.txt", "w" * 250)])
    bad = a[:-30] + chr(ord(a[-30]) ^ 0x01) + a[-29:]
    r = extract_document([{"kind": "text", "text": bad, "media_ref": "", "offset": 0}])
    assert not r["parse_ok"] and r["error"].startswith("rar:")
