"""WARC (ISO 28500) record parsing — core/warcbin.py.

The web-archive container path: record grammar walk, HTTP envelope strip,
target-URI member naming, malformation taxonomy, and the extraction
integration (records recurse like archive members, html bodies run the
real boilerplate stripper)."""

import random

import pytest

from tika_wrap_spark.core.errors import ExtractError
from tika_wrap_spark.core.extract import extract_document
from tika_wrap_spark.core.sniff import KIND_WARC, sniff_kind
from tika_wrap_spark.core.warcbin import build_warc, parse_warc_text

HTML_PAGE = (
    "<html><head><title>Crawl Target</title></head><body>"
    "<p>" + "substantial page content paragraph retained by extraction. " * 6
    + "</p></body></html>"
)


def _doc_for(text: str) -> dict:
    return extract_document(
        [{"kind": "warc", "text": text, "media_ref": "", "offset": 0}]
    )


def test_sniffs_warc():
    w = build_warc([("https://a/b", "text/plain", "body")])
    assert w.startswith("WARC/1.0\r\n")
    assert sniff_kind(w) == KIND_WARC
    # near-misses never route warc
    assert sniff_kind("warc/1.0\n") != KIND_WARC
    assert sniff_kind(" WARC/1.0\n") != KIND_WARC


def test_roundtrip_members_and_meta():
    w = build_warc(
        [
            ("https://one.example/a", "text/html", HTML_PAGE),
            ("https://two.example/b", "text/plain", "plain text body\nline 2"),
        ]
    )
    members, meta = parse_warc_text(w)
    assert [m[0] for m in members] == [
        "https://one.example/a",
        "https://two.example/b",
    ]
    assert members[0][1] == HTML_PAGE  # HTTP envelope stripped exactly
    assert members[1][1] == "plain text body\nline 2"
    # warcinfo is plumbing: tallied, never a member
    assert meta == {"warc_target": "https://one.example/a", "n_warc_records": "3"}


def test_resource_and_conversion_records_direct_payload():
    rec = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: https://conv.example/x\r\n"
        "Content-Length: 14\r\n"
        "\r\n"
        "converted text\r\n\r\n"
    )
    members, meta = parse_warc_text(rec)
    assert members == [("https://conv.example/x", "converted text")]
    assert meta["n_warc_records"] == "1"


def test_request_and_metadata_records_skipped():
    rec = (
        "WARC/1.0\r\n"
        "WARC-Type: request\r\n"
        "Content-Length: 4\r\n"
        "\r\n"
        "GET \r\n\r\n"
        "WARC/1.0\r\n"
        "WARC-Type: metadata\r\n"
        "Content-Length: 3\r\n"
        "\r\n"
        "k:v\r\n\r\n"
    )
    members, meta = parse_warc_text(rec)
    assert members == []
    assert meta["n_warc_records"] == "2"


def test_folded_header_continuation():
    rec = (
        "WARC/1.0\r\n"
        "WARC-Type: resource\r\n"
        "WARC-Target-URI: https://folded.example/\r\n"
        "X-Long: first part\r\n"
        "  second part\r\n"
        "Content-Length: 2\r\n"
        "\r\n"
        "ok\r\n\r\n"
    )
    members, _ = parse_warc_text(rec)
    assert members == [("https://folded.example/", "ok")]


def test_bare_lf_line_endings_tolerated():
    rec = (
        "WARC/1.0\n"
        "WARC-Type: resource\n"
        "Content-Length: 4\n"
        "\n"
        "body\n\n"
    )
    members, _ = parse_warc_text(rec)
    assert members == [("record-1", "body")]


def test_headers_only_http_response_yields_empty_payload():
    http = "HTTP/1.1 304 Not Modified\r\nETag: x\r\n\r\n"
    rec = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        "Content-Length: %d\r\n"
        "\r\n" % len(http)
    ) + http + "\r\n\r\n"
    members, _ = parse_warc_text(rec)
    assert members == [("record-1", "")]


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda w: "X" + w, "missing WARC/ version magic"),
        (lambda w: w[:-40], "overruns payload"),
        (
            lambda w: w.replace("Content-Length", "Content-Hength", 1),
            "missing/garbled Content-Length",
        ),
        (lambda w: w.replace("WARC/1.0", "WARC/x.0", 1), "bad version line"),
        (
            lambda w: w.replace("WARC-Type: ", "WARC-Type ", 1),
            "malformed field line",
        ),
    ],
)
def test_malformations_raise(mutate, msg):
    w = build_warc([("https://m.example/", "text/html", HTML_PAGE)])
    with pytest.raises(ExtractError) as exc:
        parse_warc_text(mutate(w))
    assert str(exc.value).startswith("warc:")
    assert msg in str(exc.value)


def test_extraction_integration():
    w = build_warc(
        [
            ("https://one.example/a", "text/html", HTML_PAGE),
            ("https://two.example/b", "text/plain", "plain text body"),
        ]
    )
    doc = _doc_for(w)
    assert doc["parse_ok"]
    m = doc["meta"]
    assert m["container_format"] == "warc"
    assert m["warc_target"] == "https://one.example/a"
    assert m["n_containers"] == "1"
    assert m["n_container_entries"] == "2"
    assert m["kinds"] == "html,text,warc"
    # the html body ran the real boilerplate stripper: its content
    # paragraph survives as a text span, the plain record verbatim
    texts = [s["text"] for s in doc["spans"]]
    assert any("substantial page content" in t for t in texts)
    assert "plain text body" in texts


def test_truncated_adversarial_row_lands_in_warc_class():
    from tika_wrap_spark.corpus import N_ADVERSARIAL, adversarial_rows, generate_golden

    rows = adversarial_rows(0)
    assert len(rows) == N_ADVERSARIAL == 40
    golden = generate_golden(rows[22:23])  # the truncated-warc row
    assert not golden[0]["parse_ok"]
    assert golden[0]["error"].startswith("warc:")


def test_bitflip_fuzz_through_policy():
    """Single-byte corruption sweep routed through the extraction policy:
    every outcome is a row (parse_ok either way), never an exception."""
    w = build_warc(
        [
            ("https://f.example/a", "text/html", HTML_PAGE),
            ("https://f.example/b", "text/plain", "fuzz body " * 20),
        ]
    )
    rng = random.Random(11)
    for _ in range(120):
        pos = rng.randrange(len(w))
        mutated = w[:pos] + chr(ord(w[pos]) ^ (1 << rng.randrange(8))) + w[pos + 1 :]
        doc = _doc_for(mutated)
        assert isinstance(doc["parse_ok"], bool)
        if not doc["parse_ok"]:
            assert doc["error"]
