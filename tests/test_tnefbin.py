"""TNEF (winmail.dat) extraction — core/tnefbin.py.

MS-OXTNEF attribute walk: signature + legacy key, level/id/length/data/
checksum attribute framing, subject/body surfacing, attachment recursion
through the shared member routing, checksum-verify taxonomy, and the
sniff integration (offset-0 0x223E9F78 signature, both forms)."""

import random

import pytest

from tika_wrap_spark.core.errors import ExtractError
from tika_wrap_spark.core.extract import extract_document
from tika_wrap_spark.core.sniff import KIND_TNEF, sniff_kind
from tika_wrap_spark.core.tnefbin import build_tnef, build_tnef_text, parse_tnef


def _doc_for(text: str) -> dict:
    return extract_document(
        [{"kind": "tnef", "text": text, "media_ref": "", "offset": 0}]
    )


def test_roundtrip():
    data = build_tnef(
        "Quarterly numbers",
        "see attached",
        [("report.csv", b"a,b\n1,2"), ("note.txt", b"hello")],
    )
    mc, subj, body, atts = parse_tnef(data)
    assert mc == "IPM.Note"
    assert subj == "Quarterly numbers"
    assert body == "see attached"
    assert atts == [("report.csv", b"a,b\n1,2"), ("note.txt", b"hello")]


def test_no_attachments():
    mc, subj, body, atts = parse_tnef(build_tnef("s", "b"))
    assert (subj, body, atts) == ("s", "b", [])


def test_unnamed_attachment_gets_a_name():
    # rend-data + data without a title attribute
    import struct

    from tika_wrap_spark.core import tnefbin as t

    data = bytearray(t.MAGIC + struct.pack("<H", 1))
    data.extend(t._attr(t.LVL_ATTACHMENT, t.ATT_ATTACH_REND_DATA, b"\x00" * 14))
    data.extend(t._attr(t.LVL_ATTACHMENT, t.ATT_ATTACH_DATA, b"payload"))
    _mc, _s, _b, atts = parse_tnef(bytes(data))
    assert atts == [("attachment_0", b"payload")]


def test_error_taxonomy():
    good = build_tnef("s", "b", [("a.txt", b"x" * 100)])
    with pytest.raises(ExtractError, match="bad signature"):
        parse_tnef(b"xx" + good[2:])
    with pytest.raises(ExtractError, match="truncated attribute header"):
        parse_tnef(good[:9])  # a partial attribute header after the key
    with pytest.raises(ExtractError, match="overruns payload"):
        parse_tnef(good[:-5])  # cut mid-data
    # flip one data byte -> checksum mismatch
    bad = bytearray(good)
    bad[-10] ^= 0x01
    with pytest.raises(ExtractError, match="checksum mismatch"):
        parse_tnef(bytes(bad))
    # bad level byte
    lvl = bytearray(good)
    lvl[6] = 0x07
    with pytest.raises(ExtractError, match="bad attribute level"):
        parse_tnef(bytes(lvl))
    # declared length overruns
    ovr = bytearray(good)
    ovr[11] = 0xFF  # length high byte of the first attribute
    with pytest.raises(ExtractError, match="overruns payload"):
        parse_tnef(bytes(ovr))


def test_sniff_both_near_misses():
    assert sniff_kind(build_tnef_text("s", "b")) == KIND_TNEF
    assert sniff_kind("\x78\x9f\x3e\x22") == KIND_TNEF
    assert sniff_kind("\x78\x9f\x3e") == "text"
    assert sniff_kind("x\x78\x9f\x3e\x22") == "text"


def test_extraction_attachments_recurse():
    payload = build_tnef_text(
        "subject line",
        "plain body text",
        [("inner.csv", "h1,h2,h3\n1,2,3"), ("memo.txt", "memo body")],
    )
    res = _doc_for(payload)
    assert res["parse_ok"], res["error"]
    meta = res["meta"]
    assert meta["container_format"] == "tnef"
    assert meta["eml_subject"] == "subject line"
    assert meta["n_container_entries"] == "2"
    texts = [s["text"] for s in res["spans"]]
    assert texts[0] == "plain body text"
    assert any("1,2,3" in t for t in texts[1:])


def test_extraction_corrupt_is_row_not_failure():
    good = build_tnef_text("s", "b", [("a.txt", "x" * 50)])
    bad = good[:-8] + chr(ord(good[-8]) ^ 0x01) + good[-7:]
    res = _doc_for(bad)
    assert not res["parse_ok"]
    assert res["error"].startswith("tnef:")
    assert res["spans"] == []


def test_bitflip_fuzz_never_raises_through_policy():
    rng = random.Random(77)
    base = build_tnef_text("fuzz subject", "fuzz body", [("a.txt", "y" * 64)])
    for _ in range(300):
        pos = rng.randrange(len(base))
        flipped = (
            base[:pos]
            + chr(ord(base[pos]) ^ (1 << rng.randrange(8)))
            + base[pos + 1 :]
        )
        res = extract_document(
            [{"kind": "tnef", "text": flipped, "media_ref": "", "offset": 0}]
        )
        assert res["parse_ok"] or res["error"], "silent failure"
