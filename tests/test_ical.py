"""iCalendar (RFC 5545) / vCard (RFC 6350) extraction: unfolding,
escaping, quoted params, component blocks, malformed policy, and the
sniffer routing (Tika ICalParser/VCardParser analog,
/root/reference/src/java-env.cpp:313)."""

import pytest

from tika_wrap_spark.core.errors import ExtractError
from tika_wrap_spark.core.extract import extract_document
from tika_wrap_spark.core.ical import (
    build_ics,
    build_vcf,
    parse_ical,
    parse_vcard,
)
from tika_wrap_spark.core.sniff import sniff_kind


def _doc(payload):
    return [{"kind": "x", "text": payload, "media_ref": "", "offset": 0}]


class TestIcs:
    def test_event_block_in_property_order(self):
        ics = build_ics(
            [
                {
                    "summary": "Team sync; weekly",
                    "description": "Agenda:\n1,2",
                    "location": "Room A",
                    "organizer": "Ada L",
                    "attendee": "bob@x.org",
                }
            ]
        )
        blocks, meta = parse_ical(ics)
        assert blocks == ["Team sync; weekly\nAgenda:\n1,2\nRoom A\nAda L\nbob@x.org"]
        assert meta == {"summary": "Team sync; weekly", "n_components": 1}

    def test_folded_lines_unfold(self):
        # RFC 5545 §3.1: 75-octet folding with leading-space continuation
        long = "x" * 200
        blocks, _ = parse_ical(build_ics([{"summary": long}]))
        assert blocks == [long]

    def test_quoted_param_with_colon_and_semicolon(self):
        ics = (
            "BEGIN:VCALENDAR\r\nBEGIN:VEVENT\r\n"
            'ORGANIZER;CN="Dr. A:B;C";ROLE=CHAIR:mailto:a@x\r\n'
            "END:VEVENT\r\nEND:VCALENDAR\r\n"
        )
        blocks, _ = parse_ical(ics)
        assert blocks == ["Dr. A:B;C"]

    def test_attendee_without_cn_strips_mailto(self):
        ics = (
            "BEGIN:VCALENDAR\nBEGIN:VEVENT\nATTENDEE:MAILTO:p@q.org\n"
            "END:VEVENT\nEND:VCALENDAR\n"
        )
        blocks, _ = parse_ical(ics)
        assert blocks == ["p@q.org"]

    def test_multi_event_and_empty_event(self):
        ics = build_ics([{"summary": "a"}, {}, {"summary": "c"}])
        blocks, meta = parse_ical(ics)
        assert blocks == ["a", "c"]  # the empty event emits no block
        assert meta["n_components"] == 3

    def test_unterminated_component_raises(self):
        with pytest.raises(ExtractError, match="ics: unterminated"):
            parse_ical("BEGIN:VCALENDAR\r\nBEGIN:VEVENT\r\nSUMMARY:s\r\n")
        with pytest.raises(ExtractError, match="ics: mismatched"):
            parse_ical("BEGIN:VCALENDAR\nEND:VEVENT\n")

    def test_valarm_nested_component_closes_cleanly(self):
        ics = (
            "BEGIN:VCALENDAR\nBEGIN:VEVENT\nSUMMARY:s\n"
            "BEGIN:VALARM\nDESCRIPTION:ring\nEND:VALARM\n"
            "END:VEVENT\nEND:VCALENDAR\n"
        )
        blocks, _ = parse_ical(ics)
        assert blocks == ["s\nring"]


class TestVcf:
    def test_card_block(self):
        vcf = build_vcf(
            [
                {
                    "fn": "Grace Hopper",
                    "org": "Navy",
                    "title": "RAdm",
                    "email": "g@navy.mil",
                    "tel": "+1 555",
                    "note": "COBOL, etc.",
                }
            ]
        )
        blocks, meta = parse_vcard(vcf)
        assert blocks == [
            "Grace Hopper\nHopper Grace\nNavy\nRAdm\ng@navy.mil\n+1 555\nCOBOL, etc."
        ]
        assert meta == {"summary": "Grace Hopper", "n_components": 1}

    def test_structured_n_parts_join(self):
        vcf = (
            "BEGIN:VCARD\nVERSION:4.0\nFN:A B\n"
            "N:B;A;Q.;Dr.;Jr.\nEND:VCARD\n"
        )
        blocks, _ = parse_vcard(vcf)
        assert blocks == ["A B\nB A Q. Dr. Jr."]

    def test_unterminated_card_raises(self):
        with pytest.raises(ExtractError, match="vcf: unterminated"):
            parse_vcard("BEGIN:VCARD\nFN:x\n")


class TestRouting:
    def test_sniffer_kinds(self):
        assert sniff_kind(build_ics([{"summary": "s"}]), "") == "ics"
        assert sniff_kind(build_vcf([{"fn": "f"}]), "") == "vcf"
        assert sniff_kind("begin:vcalendar\r\nEND:VCALENDAR\r\n", "") == "ics"
        # near-misses stay text (BEGIN:VEVENT alone is not an opener)
        assert sniff_kind("BEGIN:VEVENT\nSUMMARY:s\n", "") == "text"
        # attendee commas must not reach the csv rule
        ics = "BEGIN:VCALENDAR\nATTENDEE:mailto:a@x,b@y,c@z\nEND:VCALENDAR\n"
        assert sniff_kind(ics, "") == "ics"

    def test_extraction_routes_and_meta(self):
        ics = build_ics([{"summary": "Standup", "location": "R2"}])
        res = extract_document(_doc(ics))
        assert res["parse_ok"], res["error"]
        assert res["meta"]["kinds"] == "ics"
        assert res["meta"]["ical_summary"] == "Standup"
        assert [s["text"] for s in res["spans"]] == ["Standup\nR2"]

        vcf = build_vcf([{"fn": "Ada L", "email": "a@l.org"}])
        res = extract_document(_doc(vcf))
        assert res["parse_ok"]
        assert res["meta"]["kinds"] == "vcf"
        assert res["meta"]["ical_summary"] == "Ada L"

    def test_malformed_is_row_not_crash(self):
        cut = build_ics([{"summary": "never ends"}]).rsplit("END:VEVENT", 1)[0]
        res = extract_document(_doc(cut))
        assert not res["parse_ok"]
        assert res["error"].startswith("ics:")
        assert res["spans"] == []

    def test_corpus_slice_roundtrip(self):
        import random

        from tika_wrap_spark.corpus import _gen_ics_payload, _gen_vcf_payload

        rng = random.Random(3)
        for gen, kind in ((_gen_ics_payload, "ics"), (_gen_vcf_payload, "vcf")):
            for _ in range(10):
                payload = gen(rng)
                assert sniff_kind(payload, "") == kind
                res = extract_document(_doc(payload))
                assert res["parse_ok"], res["error"]
                assert all(s["text"] for s in res["spans"])

    def test_utf16_ics_transcodes_then_routes(self):
        """A BOM'd UTF-16 calendar sniffs text-family on the wire; the
        charset ladder decodes it and the re-sniff routes ics."""
        from tika_wrap_spark.core.charset import encode_charset

        ics = build_ics([{"summary": "Réunion à neuf heures"}])
        wire = encode_charset(ics, "utf-16le", bom=True)
        res = extract_document(_doc(wire))
        assert res["parse_ok"], res["error"]
        assert res["meta"]["kinds"] == "ics"
        assert res["meta"]["charset"].startswith("utf-16")
        assert res["meta"]["ical_summary"] == "Réunion à neuf heures"
