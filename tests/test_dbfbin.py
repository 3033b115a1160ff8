"""dBase .dbf table extraction — core/dbfbin.py.

Header/field-descriptor/record-array walk, deleted-record skip, the
guarded \\x03 sniff (version byte + plausible date + field-type letter at
offset 43), malformation taxonomy, and the extraction integration."""

import random

import pytest

from tika_wrap_spark.core.dbfbin import (
    build_dbf,
    build_dbf_text,
    dbf_to_text,
    parse_dbf,
)
from tika_wrap_spark.core.errors import ExtractError
from tika_wrap_spark.core.extract import extract_document
from tika_wrap_spark.core.sniff import KIND_DBF, sniff_kind

NAMES = ["ID", "NAME", "CITY"]
ROWS = [["1", "ada", "london"], ["2", "grace", "nyc"], ["3", "alan", "cambridge"]]


def _doc_for(text: str) -> dict:
    return extract_document(
        [{"kind": "dbf", "text": text, "media_ref": "", "offset": 0}]
    )


def test_roundtrip():
    ns, rs = parse_dbf(build_dbf(NAMES, ROWS))
    assert ns == NAMES and rs == ROWS


def test_deleted_records_skip():
    ns, rs = parse_dbf(build_dbf(NAMES, ROWS, deleted={1}))
    assert rs == [ROWS[0], ROWS[2]]


def test_text_block_shape():
    txt, fields = dbf_to_text(build_dbf(NAMES, ROWS))
    lines = txt.split("\n")
    assert lines[0] == "ID,NAME,CITY" == fields
    assert lines[1:] == ["1,ada,london", "2,grace,nyc", "3,alan,cambridge"]


def test_values_stripped_of_padding():
    # fixed-width fields pad with spaces; values come back exact
    ns, rs = parse_dbf(build_dbf(["A", "B"], [["x", "longvalue"], ["yy", "z"]]))
    assert rs == [["x", "longvalue"], ["yy", "z"]]


def test_sniff_guards():
    good = build_dbf_text(NAMES, ROWS)
    assert sniff_kind(good) == KIND_DBF
    # bad month byte
    assert sniff_kind("\x03\x7c\x0d" + good[3:]) == "text"
    # bad day byte
    assert sniff_kind(good[:3] + "\x20" + good[4:]) == "text"
    # bad type letter at offset 43
    assert sniff_kind(good[:43] + "Q" + good[44:]) == "text"
    # short payloads and \x03-opener prose fall through
    assert sniff_kind("\x03\x7c\x06\x0f") == "text"
    assert sniff_kind("\x03 prose") == "text"


def test_error_taxonomy():
    good = build_dbf(NAMES, ROWS)
    cases = [
        (good[:20], "truncated header"),
        (b"\x04" + good[1:], "unsupported version"),
        (good[:2] + b"\x00" + good[3:], "implausible last-update"),
        (good[:8] + b"\x07\x00" + good[10:], "bad header size"),
        (good[:-40], "overrun the payload"),
    ]
    for data, msg in cases:
        with pytest.raises(ExtractError, match=msg):
            parse_dbf(data)
    # bad field-descriptor terminator
    ht = bytearray(good)
    ht[32 + 32 * len(NAMES)] = 0x00
    with pytest.raises(ExtractError, match="terminator"):
        parse_dbf(bytes(ht))
    # bad deletion flag
    rec0 = 32 + 32 * len(NAMES) + 1
    bf = bytearray(good)
    bf[rec0] = 0x51
    with pytest.raises(ExtractError, match="deletion flag"):
        parse_dbf(bytes(bf))


def test_extraction_integration():
    res = _doc_for(build_dbf_text(NAMES, ROWS, deleted={0}))
    assert res["parse_ok"], res["error"]
    assert res["meta"]["dbf_fields"] == "ID,NAME,CITY"
    texts = [s["text"] for s in res["spans"]]
    assert texts == ["ID,NAME,CITY\n2,grace,nyc\n3,alan,cambridge"]


def test_extraction_truncated_is_row_not_failure():
    res = _doc_for(build_dbf_text(NAMES, ROWS)[:-30])
    assert not res["parse_ok"]
    assert res["error"].startswith("dbf:")
    assert res["spans"] == []


def test_bitflip_fuzz_never_raises_through_policy():
    """Seeded bit flips anywhere in a valid table: parse either succeeds
    or lands a 'dbf:' error row — never an unhandled exception."""
    rng = random.Random(99)
    base = build_dbf_text(NAMES, ROWS)
    for _ in range(300):
        pos = rng.randrange(len(base))
        flipped = (
            base[:pos]
            + chr(ord(base[pos]) ^ (1 << rng.randrange(8)))
            + base[pos + 1 :]
        )
        res = extract_document(
            [{"kind": "dbf", "text": flipped, "media_ref": "", "offset": 0}]
        )
        assert res["parse_ok"] or res["error"], "silent failure"


def test_builder_name_truncation():
    # names cap at the 11-byte field (header line reflects the stored name)
    ns, _ = parse_dbf(build_dbf(["AVERYLONGFIELDNAME"], [["v"]]))
    assert ns == ["AVERYLONGFI"]
