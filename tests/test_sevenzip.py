"""7z archives — core/sevenzip.py parse_7z / build_7z.

Header property-tree walk (7zFormat.txt), 7z variable-length numbers,
Copy/LZMA1/LZMA2 folders via stdlib lzma FORMAT_RAW, kEncodedHeader
recursion, CRC verification. BOTH directions are cross-validated against
the system bsdtar (libarchive's independent 7z implementation) — our
archives must extract through it, and its archives (LZMA1-coded by
default) must parse through us. Reference reach: Tika reads .7z via
commons-compress SevenZFile (/root/reference/src/java-env.cpp:313-314)."""

import os
import random
import shutil
import subprocess
import tempfile

import pytest

from tika_wrap_spark.core.errors import ExtractError
from tika_wrap_spark.core.extract import extract_document
from tika_wrap_spark.core.sevenzip import (
    _num,
    _Reader,
    build_7z,
    build_7z_text,
    parse_7z,
)
from tika_wrap_spark.core.sniff import KIND_SEVENZ, sniff_kind
from tika_wrap_spark.core.tarbin import build_tar_text

_HAS_BSDTAR = shutil.which("bsdtar") is not None

_FILES = [
    ("a.txt", b"alpha content here"),
    ("empty.txt", b""),
    ("sub/dir/c.csv", b"x,y\n1,2\n" * 60),
    ("bin.dat", bytes(range(256)) * 8),
]


def test_number_encoding_roundtrip():
    for v in (0, 1, 0x7F, 0x80, 0xFF, 0x100, 0x3FFF, 0x4000,
              1 << 20, 1 << 30, (1 << 56) - 1, 1 << 56, (1 << 63) + 5):
        enc = _num(v)
        r = _Reader(enc)
        assert r.number() == v and r.i == len(enc), (v, enc.hex())


def test_roundtrip_all_layouts():
    for codec in ("copy", "lzma2"):
        for eh in (False, True):
            assert parse_7z(build_7z(_FILES, codec=codec, encoded_header=eh)) == _FILES


def test_empty_archive_and_all_empty_files():
    assert parse_7z(build_7z([], codec="copy")) == []
    only_empty = [("one.txt", b""), ("two.txt", b"")]
    assert parse_7z(build_7z(only_empty)) == only_empty


def test_seeded_fuzz_roundtrip():
    rng = random.Random(41)
    for trial in range(25):
        files = [
            (
                "m%02d.bin" % i,
                bytes(rng.randrange(256) for _ in range(rng.randrange(0, 3000))),
            )
            for i in range(rng.randrange(1, 6))
        ]
        codec = rng.choice(("copy", "lzma2"))
        eh = rng.random() < 0.5
        assert parse_7z(build_7z(files, codec=codec, encoded_header=eh)) == files, trial


def test_malformed_raise():
    good = build_7z(_FILES, codec="copy")
    with pytest.raises(ExtractError):
        parse_7z(b"7z\xbc\xaf\x27\x1d" + good[6:])  # bad magic
    with pytest.raises(ExtractError):
        parse_7z(good[:20])  # truncated signature header
    with pytest.raises(ExtractError):
        parse_7z(good[:-3])  # truncated next header (CRC fails)
    flip = 34  # inside the copy-coded stream area -> substream CRC
    bad = good[:flip] + bytes([good[flip] ^ 0xFF]) + good[flip + 1 :]
    with pytest.raises(ExtractError):
        parse_7z(bad)


def test_bitflip_fuzz_policy():
    """Seeded bit flips anywhere: parse_7z raises only ExtractError, and
    the extraction pipeline turns those into error rows."""
    rng = random.Random(42)
    base = build_7z(
        [("a.txt", b"hello" * 120), ("b.txt", b"world" * 50)], codec="lzma2"
    )
    for _ in range(400):
        i = rng.randrange(len(base))
        bad = base[:i] + bytes([base[i] ^ (1 << rng.randrange(8))]) + base[i + 1 :]
        try:
            parse_7z(bad)
        except ExtractError:
            pass


@pytest.mark.skipif(not _HAS_BSDTAR, reason="no system bsdtar")
def test_builder_archives_extract_through_libarchive():
    for codec in ("copy", "lzma2"):
        for eh in (False, True):
            a = build_7z(_FILES, codec=codec, encoded_header=eh)
            with tempfile.NamedTemporaryFile(suffix=".7z", delete=False) as f:
                f.write(a)
                path = f.name
            try:
                for name, payload in _FILES:
                    if not payload:
                        continue
                    p = subprocess.run(
                        ["bsdtar", "-xOf", path, name], capture_output=True
                    )
                    assert p.returncode == 0, (codec, eh, name, p.stderr[:200])
                    assert p.stdout == payload, (codec, eh, name)
            finally:
                os.unlink(path)


@pytest.mark.skipif(not _HAS_BSDTAR, reason="no system bsdtar")
def test_libarchive_archives_parse_through_ours():
    """bsdtar writes LZMA1-coded 7z — the classic-coder path."""
    d = tempfile.mkdtemp()
    os.makedirs(os.path.join(d, "sub"), exist_ok=True)
    payload1 = b"first file payload " * 40
    payload2 = b"second, smaller"
    open(os.path.join(d, "one.txt"), "wb").write(payload1)
    open(os.path.join(d, "sub", "two.txt"), "wb").write(payload2)
    out = os.path.join(d, "t.7z")
    p = subprocess.run(
        ["bsdtar", "-cf", out, "--format", "7zip", "-C", d, "one.txt", "sub/two.txt"],
        capture_output=True,
    )
    assert p.returncode == 0, p.stderr[:300]
    got = dict(parse_7z(open(out, "rb").read()))
    assert got["one.txt"] == payload1
    assert got["sub/two.txt"] == payload2


def test_extraction_routes_and_recurses():
    inner_tar = build_tar_text([("inner/x.txt", "nested text body")])
    a = build_7z_text(
        [("doc.txt", "top level note"), ("bundle.tar", inner_tar)],
        codec="lzma2",
        encoded_header=True,
    )
    assert sniff_kind(a) == KIND_SEVENZ
    assert sniff_kind("7z is a compressor") != KIND_SEVENZ
    r = extract_document([{"kind": "text", "text": a, "media_ref": "", "offset": 0}])
    assert r["parse_ok"]
    assert r["meta"]["container_format"] == "7z"
    assert int(r["meta"]["n_container_entries"]) == 3  # 2 members + tar member
    assert int(r["meta"]["container_depth"]) == 2
    texts = [s["text"] for s in r["spans"]]
    assert "top level note" in texts and "nested text body" in texts


def test_corrupt_becomes_error_row():
    a = build_7z_text([("doomed.txt", "y" * 200)], codec="copy")
    bad = a[:40] + chr(ord(a[40]) ^ 0xFF) + a[41:]
    r = extract_document([{"kind": "text", "text": bad, "media_ref": "", "offset": 0}])
    assert not r["parse_ok"] and r["error"].startswith("7z:")
