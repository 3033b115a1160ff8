"""Parquet parsing (core/parquetbin.py): hand-rolled Thrift-compact
footer walk + PLAIN v1 pages + RLE/bit-packed definition levels,
cross-validated against pyarrow — the reference Arrow C++ writer builds
every fixture, so reader agreement IS reference agreement (the
sqlite/plist discipline)."""

from __future__ import annotations

import pytest

from tika_wrap_spark.core.errors import ExtractError
from tika_wrap_spark.core.parquetbin import (
    build_parquet,
    build_parquet_text,
    parquet_extract,
    parquet_extract_text,
)
from tika_wrap_spark.core.sniff import sniff_kind

NAMES = ["id", "name", "score", "ok", "tag"]
TYPES = ["long", "string", "double", "bool", "?string"]
ROWS = [
    [1, "alpha", 1.5, True, None],
    [2, "bb", -2.25, False, "x"],
    [3, "ccc", 1e9, True, None],
]


def test_roundtrip_flat_required_and_nullable():
    text, cols = parquet_extract(build_parquet(NAMES, ROWS * 40, TYPES))
    lines = text.split("\n")
    assert cols == "id,name,score,ok,tag"
    assert lines[0] == cols and len(lines) == 121
    assert lines[1] == "1,alpha,1.5,true,"
    assert lines[2] == "2,bb,-2.25,false,x"
    assert lines[3] == "3,ccc,1e+09,true,"


def test_multiple_row_groups_identical():
    one = parquet_extract(build_parquet(NAMES, ROWS * 40, TYPES))
    many = parquet_extract(
        build_parquet(NAMES, ROWS * 40, TYPES, row_group_size=16)
    )
    assert one == many


def test_all_null_and_all_set_nullable_pages():
    rows = [[i, None] for i in range(20)] + [[99, "set"]]
    text, _c = parquet_extract(build_parquet(["a", "b"], rows, ["long", "?string"]))
    lines = text.split("\n")
    assert lines[1] == "0," and lines[-1] == "99,set"


def test_int32_and_float32():
    rows = [[1, 0.5], [2, -1.5]]
    text, _c = parquet_extract(build_parquet(["a", "b"], rows, ["int", "float"]))
    assert text.split("\n")[1:] == ["1,0.5", "2,-1.5"]


def test_utf8_values():
    text, _c = parquet_extract(
        build_parquet(["s"], [["déjà vu"], ["日本語"]], ["string"])
    )
    assert text.split("\n")[1:] == ["déjà vu", "日本語"]


def test_sniff_routes_parquet():
    assert sniff_kind(build_parquet_text(["a"], [[1]], ["long"]), "") == "parquet"
    # one-sided magic / short payloads must fall through
    assert sniff_kind("PAR1 is the magic word", "") == "text"
    assert sniff_kind("PAR1PAR1", "") == "text"


def test_bad_framing_raises():
    data = build_parquet(["a"], [[1]], ["long"])
    with pytest.raises(ExtractError, match="parquet:"):
        parquet_extract(data[:-4])  # tail magic gone
    with pytest.raises(ExtractError, match="parquet:"):
        parquet_extract(b"XXXX" + data[4:])


def test_corrupt_footer_length_raises():
    data = bytearray(build_parquet(["a"], [[1]], ["long"]))
    data[-6] = 0xFF  # high byte of the LE metadata length
    with pytest.raises(ExtractError, match="implausible footer length"):
        parquet_extract(bytes(data))


def test_dictionary_encoding_rejected():
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"s": ["a", "a", "b"] * 50})
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="NONE", use_dictionary=True)
    with pytest.raises(ExtractError, match="parquet:"):
        parquet_extract(buf.getvalue())


def test_compressed_codec_rejected():
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"s": ["abc"] * 50})
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="snappy", use_dictionary=False)
    with pytest.raises(ExtractError, match="parquet:"):
        parquet_extract(buf.getvalue())


def test_nested_schema_rejected():
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"m": [{"x": 1}, {"x": 2}]})
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="NONE", use_dictionary=False)
    with pytest.raises(ExtractError, match="nested schemas"):
        parquet_extract(buf.getvalue())


def test_text_bridge():
    t = build_parquet_text(["id"], [[5], [6]], ["long"])
    text, cols = parquet_extract_text(t)
    assert cols == "id" and text == "id\n5\n6"
