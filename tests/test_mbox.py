"""mbox mailbox parsing — core/mbox.py.

The mailbox-as-container path: guarded From_ sniffing, mboxrd quote
round-trip, per-message routing through the shared eml core, and the
empty-sender raise path."""

import random

import pytest

from tika_wrap_spark.core.eml import build_eml
from tika_wrap_spark.core.errors import ExtractError
from tika_wrap_spark.core.extract import extract_document
from tika_wrap_spark.core.mbox import build_mbox, parse_mbox
from tika_wrap_spark.core.sniff import KIND_EML, KIND_MBOX, KIND_TEXT, sniff_kind


def _msg(subject: str, body: str) -> str:
    return build_eml(subject, "a@x.example", "b@y.example", body)


def _doc_for(text: str) -> dict:
    return extract_document(
        [{"kind": "mbox", "text": text, "media_ref": "", "offset": 0}]
    )


def test_sniff_guards():
    mb = build_mbox([("a@x.example", _msg("hello", "body one"))])
    assert sniff_kind(mb) == KIND_MBOX
    # prose starting "From " without the corroborators stays text; a bare
    # message keeps routing eml
    assert sniff_kind("From the desk of\nall the best\n") == KIND_TEXT
    assert sniff_kind("From a@x Thu Jan  1\nno header here\n") == KIND_TEXT
    assert sniff_kind("From no-at Thu\nSubject: hi\n\nx\n") == KIND_TEXT
    assert sniff_kind(_msg("hi", "plain")) == KIND_EML


def test_split_and_names():
    mb = build_mbox(
        [
            ("one@x.example", _msg("first", "body one")),
            ("two@y.example", _msg("second", "body two")),
        ]
    )
    msgs = parse_mbox(mb)
    assert [n for n, _m in msgs] == ["msg-1/one@x.example", "msg-2/two@y.example"]
    assert "body one" in msgs[0][1] and "Subject: first" in msgs[0][1]
    assert "body two" in msgs[1][1]


def test_mboxrd_quote_roundtrip():
    body = "line one\nFrom here it looks like a separator\n>From quoted too\nend"
    mb = build_mbox([("q@x.example", _msg("quoting", body))])
    # on the wire both lines gained one '>'
    assert "\n>From here it looks" in mb and "\n>>From quoted too" in mb
    msgs = parse_mbox(mb)
    assert len(msgs) == 1  # the quoted line never splits the mailbox
    assert "\nFrom here it looks like a separator" in msgs[0][1]
    assert "\n>From quoted too" in msgs[0][1]


def test_empty_sender_raises():
    bad = "From  doomed@x Thu Jan  1\nSubject: hi\n\nbody\n"
    assert sniff_kind(bad) == KIND_MBOX
    with pytest.raises(ExtractError) as exc:
        parse_mbox(bad)
    assert str(exc.value).startswith("mbox: empty envelope sender")


def test_extraction_integration():
    mb = build_mbox(
        [
            ("one@x.example", _msg("first subject", "body one text")),
            ("two@y.example", _msg("second subject", "body two text")),
        ]
    )
    doc = _doc_for(mb)
    assert doc["parse_ok"]
    m = doc["meta"]
    assert m["container_format"] == "mbox"
    # mailbox (1) + each message's eml container (2)
    assert m["n_containers"] == "3"
    assert m["container_depth"] == "2"
    assert m["eml_subject"] == "first subject"  # first message wins
    texts = [s["text"] for s in doc["spans"]]
    assert any("body one text" in t for t in texts)
    assert any("body two text" in t for t in texts)


def test_bad_member_message_fails_document():
    # same policy as a bad archive member: the eml error propagates
    cut = _msg("will be cut", "x").replace("Subject:", "NoHeaders-", 1)
    cut = "\n".join(
        ln for ln in cut.split("\n") if not ln.startswith(("From:", "To:"))
    )
    mb = build_mbox([("ok@x.example", _msg("fine", "ok body")), ("bad@x", cut)])
    doc = _doc_for(mb)
    assert not doc["parse_ok"]
    assert doc["error"].startswith("eml:")


def test_adversarial_row_lands_in_mbox_class():
    from tika_wrap_spark.corpus import N_ADVERSARIAL, adversarial_rows, generate_golden

    rows = adversarial_rows(0)
    assert len(rows) == N_ADVERSARIAL == 40
    golden = generate_golden(rows[23:24])  # the empty-sender mbox row
    assert not golden[0]["parse_ok"]
    assert golden[0]["error"].startswith("mbox:")


def test_bitflip_fuzz_through_policy():
    mb = build_mbox(
        [
            ("f@x.example", _msg("fuzz one", "fuzz body " * 10)),
            ("g@y.example", _msg("fuzz two", "other body " * 10)),
        ]
    )
    rng = random.Random(13)
    for _ in range(120):
        pos = rng.randrange(len(mb))
        mutated = mb[:pos] + chr(ord(mb[pos]) ^ (1 << rng.randrange(8))) + mb[pos + 1 :]
        doc = _doc_for(mutated)
        assert isinstance(doc["parse_ok"], bool)
        if not doc["parse_ok"]:
            assert doc["error"]
