"""Charset detection ladder (core/charset.py) — the AutoDetectReader analog
the reference inherits from Tika's text-family parse path
(/root/reference/src/java-env.cpp:313 routes through Tika's auto-detect
parser, which charset-sniffs before tokenizing)."""

from __future__ import annotations

import random

from tika_wrap_spark.core.charset import decode_charset, encode_charset
from tika_wrap_spark.core.extract import extract_document
from tika_wrap_spark.core.sniff import sniff_kind
from tika_wrap_spark.corpus import _gen_html_payload, _gen_text_payload


class TestDecodeCharset:
    def test_bom_roundtrips(self):
        body = "log line one\nlog line two, with commas\nfinal line"
        for codec in ("utf-16le", "utf-16be", "utf-32le", "utf-32be", "utf-8"):
            wire = encode_charset(body, codec)
            decoded, name = decode_charset(wire)
            assert (decoded, name) == (body, codec), codec

    def test_bomless_utf16_nul_heuristic(self):
        body = "2025-01-02 03:04:05 INFO ascii dominated log line payload"
        for codec in ("utf-16le", "utf-16be"):
            wire = encode_charset(body, codec, bom=False)
            decoded, name = decode_charset(wire)
            assert (decoded, name) == (body, codec), codec

    def test_shift_jis_kana_beats_gbk(self):
        body = "これは日本語のテスト文書です。\n抽出パイプライン検証。"
        wire = encode_charset(body, "shift_jis", bom=False)
        decoded, name = decode_charset(wire)
        assert name == "shift_jis" and decoded == body

    def test_gbk_cjk(self):
        body = "这是一个中文测试文档。\n大规模数据处理管道。"
        wire = encode_charset(body, "gbk", bom=False)
        decoded, name = decode_charset(wire)
        assert name == "gbk" and decoded == body

    def test_bomless_multibyte_utf8(self):
        body = "mixed ascii with café naïve Zürich 日本語 text"
        wire = body.encode("utf-8").decode("latin-1")
        decoded, name = decode_charset(wire)
        assert (decoded, name) == (body, "utf-8")

    def test_plain_ascii_passes_through(self):
        body = "plain ascii log line, nothing exotic at all"
        assert decode_charset(body) == (body, "")

    def test_latin1_accents_not_misdetected(self):
        # bytes-as-text latin-1 accents (0xE9 etc.) are invalid UTF-8
        # continuations and invalid SJIS/GBK pairs with the following space
        body = "caf\xe9 r\xe9sum\xe9 se\xf1or fa\xe7ade d\xe9j\xe0 vu"
        assert decode_charset(body) == (body, "")

    def test_cjk_confidence_bar_short_pairs_pass_through(self):
        # a run of decodable double-byte pairs below the home-script
        # minimum is NOT evidence of a CJK page (hypothesis-found case:
        # '\x81\x80' strict-decodes as GBK hanzi)
        body = "\x81\x80\x81\x80"
        assert decode_charset(body) == (body, "")

    def test_cjk_confidence_bar_mixed_junk_passes_through(self):
        # enough pairs to clear the count, but the decode output is NOT
        # dominated by the CJK repertoire (cp1252-ish prose with adjacent
        # accents interleaved with pair-decodable runs)
        body = "r\xe9sum\xe9s \x81\x80ab \xe9t\xe9 caf\xe9s no\xebl pi\xf1a"
        assert decode_charset(body) == (body, "")

    def test_real_unicode_untouched_except_feff(self):
        body = "already decoded 日本語 payload"
        assert decode_charset(body) == (body, "")
        assert decode_charset("﻿" + body) == (body, "utf-8")

    def test_binary_like_not_transcoded(self):
        # PNG-ish high-byte head: high bytes but not valid utf-8/sjis/gbk
        blob = "\x89PNG\r\n\x1a\n" + "\x00\xff\xfd\x80" * 16
        decoded, name = decode_charset(blob)
        assert name == "" and decoded == blob

    def test_truncated_utf16_is_lenient(self):
        wire = encode_charset("truncated payload", "utf-16le")[:-1]
        decoded, name = decode_charset(wire)
        assert name == "utf-16le" and decoded.startswith("truncated payloa")

    def test_empty(self):
        assert decode_charset("") == ("", "")


class TestExtractIntegration:
    def test_utf16_html_routes_as_html(self):
        rng = random.Random(77)
        html = _gen_html_payload(rng)
        wire = encode_charset(html, "utf-16le")
        assert sniff_kind(wire) == "text"  # pre-decode: no magic matches
        res = extract_document([{"kind": "text", "text": wire, "media_ref": "", "offset": 0}])
        ref = extract_document([{"kind": "html", "text": html, "media_ref": "", "offset": 0}])
        assert res["parse_ok"] and res["spans"] == ref["spans"]
        assert res["meta"]["charset"] == "utf-16le"
        assert res["meta"]["n_transcoded"] == "1"
        assert "html" in res["meta"]["kinds"]

    def test_transcode_restores_exact_text_spans(self):
        rng = random.Random(78)
        body = _gen_text_payload(rng)
        for codec in ("utf-16be", "utf-32le", "utf-8"):
            wire = encode_charset(body, codec)
            res = extract_document(
                [{"kind": "text", "text": wire, "media_ref": "", "offset": 0}]
            )
            assert res["parse_ok"] and len(res["spans"]) == 1
            assert res["spans"][0]["text"] == body
            assert res["meta"]["charset"] == codec

    def test_sjis_page_extracts_real_unicode(self):
        body = "これは日本語のテスト文書です。"
        wire = encode_charset(body, "shift_jis", bom=False)
        res = extract_document([{"kind": "text", "text": wire, "media_ref": "", "offset": 0}])
        assert res["spans"][0]["text"] == body
        assert res["meta"]["charset"] == "shift_jis"

    def test_untouched_docs_report_no_charset(self):
        res = extract_document(
            [{"kind": "text", "text": "plain ascii", "media_ref": "", "offset": 0}]
        )
        assert res["meta"]["charset"] == "" and res["meta"]["n_transcoded"] == "0"

    def test_binary_payloads_never_transcode(self):
        # jpeg magic bytes-as-text routes media, not through the ladder
        jpeg_head = "\xff\xd8\xff\xe0" + "\x00" * 32
        res = extract_document(
            [{"kind": "media", "text": jpeg_head, "media_ref": "", "offset": 0}]
        )
        assert res["meta"]["n_transcoded"] == "0"


class TestHtmlDeclaredCharset:
    """<meta charset=...> declarations (WHATWG prescan / Tika
    HtmlEncodingDetector analog): the ladder never runs on the html sniff
    kind, so declared CJK/cp1252 pages decode via their own hook inside
    the html route (core/charset.decode_html_charset)."""

    def _wire(self, label: str, codec: str, body: str, title: str = "t") -> str:
        page = (
            '<!DOCTYPE html><html><head><meta charset="%s"><title>%s</title>'
            "</head><body><div id=\"main\"><p>%s</p><p>%s</p></div></body></html>"
            % (label, title, body, body)
        )
        return page.encode(codec).decode("latin-1")

    def test_meta_charset_sjis(self):
        from tika_wrap_spark.core.charset import decode_html_charset

        body = "かな漢字混じりの本文です。文字コードは宣言どおりに復号します。"
        wire = self._wire("shift_jis", "shift_jis", body, "日本語の題")
        assert sniff_kind(wire) == "html"  # ASCII markup routes pre-decode
        dec, codec = decode_html_charset(wire)
        assert codec == "shift_jis" and body in dec
        res = extract_document([{"kind": "html", "text": wire, "media_ref": "", "offset": 0}])
        assert res["parse_ok"]
        assert res["meta"]["charset"] == "shift_jis"
        assert res["meta"]["n_transcoded"] == "1"
        assert res["meta"]["html_title"] == "日本語の題"
        assert any(body in s["text"] for s in res["spans"])

    def test_http_equiv_content_type_form(self):
        from tika_wrap_spark.core.charset import decode_html_charset

        body = "数据处理管道按内容路由每个文档并递归解析。"
        page = (
            '<html><head><meta http-equiv="Content-Type" '
            'content="text/html; charset=gb2312"></head>'
            "<body><p>%s</p><p>%s</p></body></html>" % (body, body)
        )
        wire = page.encode("gbk").decode("latin-1")
        dec, codec = decode_html_charset(wire)
        assert codec == "gbk" and body in dec

    def test_latin1_label_remaps_to_cp1252(self):
        # WHATWG maps the latin-1 family to windows-1252: 0x93/0x94 decode
        # as curly quotes, not C1 controls
        from tika_wrap_spark.core.charset import decode_html_charset

        wire = self._wire("iso-8859-1", "cp1252", "“quoted prose” here")
        dec, codec = decode_html_charset(wire)
        assert codec == "windows-1252" and "“quoted prose”" in dec

    def test_ascii_utf8_declaration_is_noop(self):
        from tika_wrap_spark.core.charset import decode_html_charset

        wire = self._wire("utf-8", "utf-8", "plain ascii body")
        assert decode_html_charset(wire) == (wire, "")

    def test_unknown_label_passes_through(self):
        from tika_wrap_spark.core.charset import decode_html_charset

        wire = self._wire("utf-8", "utf-8", "body").replace("utf-8", "klingon", 1)
        assert decode_html_charset(wire)[1] == ""

    def test_bad_declaration_never_fails_document(self):
        # declared sjis but bytes are NOT valid shift_jis: pass through
        from tika_wrap_spark.core.charset import decode_html_charset

        wire = self._wire("shift_jis", "cp1252", "prose with “bytes” éé")
        dec, codec = decode_html_charset(wire)
        res = extract_document([{"kind": "html", "text": wire, "media_ref": "", "offset": 0}])
        assert res["parse_ok"]

    def test_declaration_outside_prescan_window_ignored(self):
        from tika_wrap_spark.core.charset import decode_html_charset

        page = (
            "<!DOCTYPE html><html><head>"
            + "<!-- %s -->" % ("x" * 1100)
            + '<meta charset="shift_jis"></head><body><p>late</p></body></html>'
        )
        assert decode_html_charset(page)[1] == ""

    def test_real_unicode_html_untouched(self):
        from tika_wrap_spark.core.charset import decode_html_charset

        page = '<html><head><meta charset="shift_jis"></head><body><p>既に復号済み</p></body></html>'
        assert decode_html_charset(page) == (page, "")

    def test_corpus_page_roundtrip(self):
        from tika_wrap_spark.corpus import _gen_html_charset_page

        rng = random.Random(5)
        for _ in range(8):
            wire = _gen_html_charset_page(rng)
            assert sniff_kind(wire) == "html"
            res = extract_document(
                [{"kind": "html", "text": wire, "media_ref": "", "offset": 0}]
            )
            assert res["parse_ok"]
            assert res["meta"]["charset"] in (
                "shift_jis", "gbk", "euc-jp", "windows-1252",
            )
            assert res["meta"]["n_transcoded"] == "1"
