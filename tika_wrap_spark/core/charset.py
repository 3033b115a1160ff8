"""Charset detection + transcode for text-family payloads.

Tika wraps every text-family parse in an ``AutoDetectReader`` (ICU4J-style
charset detection) before handing characters to the parser; the reference
inherits that server-side (any document Tika accepts —
/root/reference/src/java-env.cpp:313 routes through Tika's auto-detect
parser). The rebuild's payloads travel as bytes-as-text (latin-1: one char
per byte), so without detection a UTF-16 log file extracts as NUL-ridden
garbage and a UTF-8 document keeps its multibyte sequences as mojibake.

Detection ladder (deterministic, order matters):
  1. BOMs, longest first: UTF-32 LE/BE, UTF-8, UTF-16 LE/BE.
  2. BOM-less UTF-16: a NUL-interleave pattern over the head window
     (printable ASCII in UTF-16 puts a 0x00 in every other byte).
  3. Valid multibyte UTF-8: strict whole-payload decode with at least one
     real multibyte sequence.
  4. Shift-JIS vs GBK: strict-decode both; prefer the one whose output
     lands in its own script block (kana for Shift-JIS, CJK for GBK).
Anything else passes through unchanged (codec '').

Only applied to payloads that sniff text-family (text/csv/json) — binary
magics (PNG/JPEG/zip/...) are full of high bytes and must never be
"transcoded". Real-unicode payloads (chars above U+00FF, e.g. an eml body
already decoded through its declared charset) are left alone except for a
leading U+FEFF strip.
"""

from __future__ import annotations

import re

# BOM table, checked longest-first (UTF-32 BOMs contain the UTF-16 ones as
# prefixes). Entries: (bom_bytes_as_text, python_codec, reported_name).
_BOMS: tuple[tuple[str, str, str], ...] = (
    ("\xff\xfe\x00\x00", "utf-32-le", "utf-32le"),
    ("\x00\x00\xfe\xff", "utf-32-be", "utf-32be"),
    ("\xef\xbb\xbf", "utf-8", "utf-8"),
    ("\xff\xfe", "utf-16-le", "utf-16le"),
    ("\xfe\xff", "utf-16-be", "utf-16be"),
)

# Head window for the BOM-less UTF-16 NUL-interleave heuristic.
_NUL_WINDOW = 64

# Minimum high bytes before the multibyte-codec heuristics may fire — a
# lone accented char in otherwise-ascii prose is not evidence of a charset.
_MIN_HIGH_BYTES = 4


def _nul_pattern_codec(raw: bytes) -> tuple[str, str] | None:
    """BOM-less UTF-16 detection: for ASCII-dominated UTF-16 text, every
    other byte is NUL (odd positions for LE, even for BE). Requires a clean
    pattern — ALL of one parity NUL-free and >=3/4 of the other NUL."""
    head = raw[:_NUL_WINDOW]
    half = len(head) // 2
    if half < 4:
        return None
    even = head[0::2]
    odd = head[1::2]
    nul_even = even.count(0)
    nul_odd = odd.count(0)
    if nul_even == 0 and nul_odd * 4 >= len(odd) * 3:
        return ("utf-16-le", "utf-16le")
    if nul_odd == 0 and nul_even * 4 >= len(even) * 3:
        return ("utf-16-be", "utf-16be")
    return None


def _has_utf8_multibyte(raw: bytes) -> bool:
    """True iff a strict-valid utf-8 payload actually contains a multibyte
    sequence (pure ASCII is 'valid utf-8' but needs no transcode)."""
    return any(b >= 0x80 for b in raw)


# confidence bar for the CJK double-byte codecs: at least this many
# home-script chars in the decode output, and at least 9/10 of ALL decoded
# non-ASCII chars inside the CJK repertoire. ICU's detector scores the same
# way (char-frequency confidence); the bar keeps arbitrary high-byte pairs
# that merely happen to strict-decode (e.g. '\\x81\\x80' runs, cp1252 prose
# with adjacent accents) from being garbled into hanzi.
_CJK_MIN_HOME = 4


def _cjk_confident(decoded: str, home_lo: str, home_hi: str) -> bool:
    home = 0
    non_ascii = 0
    cjk_family = 0
    for c in decoded:
        if c <= "\x7f":
            continue
        non_ascii += 1
        if home_lo <= c <= home_hi:
            home += 1
            cjk_family += 1
        elif (
            "一" <= c <= "鿿"  # CJK unified (kanji inside Japanese text)
            or "　" <= c <= "〿"  # CJK symbols/punctuation (。、「」)
            or "！" <= c <= "￮"  # full/half-width forms
        ):
            cjk_family += 1
    return home >= _CJK_MIN_HOME and cjk_family * 10 >= non_ascii * 9


def _cjk_codec(raw: bytes) -> tuple[str, str] | None:
    """Shift-JIS vs GBK disambiguation: both are lead/trail double-byte
    encodings with heavily overlapping byte ranges, so byte-level rules
    cannot separate them — decode with both and check the OUTPUT lands in
    the codec's home script block (ICU's detector scores the same way).
    Confidence-gated (``_cjk_confident``): a handful of decodable pairs in
    otherwise-unrelated bytes is not evidence of a CJK page."""
    try:
        sjis = raw.decode("shift_jis")
    except (UnicodeDecodeError, ValueError):
        sjis = None
    try:
        gbk = raw.decode("gbk")
    except (UnicodeDecodeError, ValueError):
        gbk = None
    # kana (hiragana/katakana U+3040-U+30FF) exists only in Japanese text;
    # a Shift-JIS decode of GBK bytes lands in random kanji, not kana
    if sjis is not None and _cjk_confident(sjis, "぀", "ヿ"):
        return ("shift_jis", "shift_jis")
    if gbk is not None and _cjk_confident(gbk, "一", "鿿"):
        return ("gbk", "gbk")
    if sjis is not None and _cjk_confident(sjis, "一", "鿿"):
        return ("shift_jis", "shift_jis")
    return None


def decode_charset(text: str) -> tuple[str, str]:
    """Detect and transcode a text-family payload.

    Returns ``(decoded_text, codec_name)``; ``codec_name`` is '' when no
    transcode applied (the overwhelmingly common case). Never raises —
    detection failures pass the payload through unchanged."""
    if not text:
        return text, ""
    if text[0] == "﻿":
        # already-real-unicode payload carrying a decoded BOM char
        return text[1:], "utf-8"
    try:
        raw = text.encode("latin-1")
    except (UnicodeEncodeError, ValueError):
        # real unicode (chars above U+00FF): already decoded upstream
        return text, ""
    for bom, codec, name in _BOMS:
        if text.startswith(bom):
            body = raw[len(bom) :]
            try:
                if codec == "utf-8":
                    return body.decode("utf-8"), name
                # UTF-16/32: lenient on truncated tails (a cut log file
                # must not fail the document)
                return body.decode(codec, "replace"), name
            except (UnicodeDecodeError, ValueError):
                return text, ""
    pat = _nul_pattern_codec(raw)
    if pat is not None:
        codec, name = pat
        return raw.decode(codec, "replace"), name
    high = sum(1 for b in raw[:4096] if b >= 0x80)
    if high < _MIN_HIGH_BYTES:
        return text, ""
    try:
        decoded = raw.decode("utf-8")
        if _has_utf8_multibyte(raw):
            return decoded, "utf-8"
        return text, ""
    except (UnicodeDecodeError, ValueError):
        pass
    cjk = _cjk_codec(raw)
    if cjk is not None:
        codec, name = cjk
        return raw.decode(codec, "replace"), name
    return text, ""


# --- HTML declared charsets (WHATWG prescan analog) -------------------
#
# Tika's HtmlEncodingDetector reads the <meta charset=...> declaration
# before parsing; browsers do the same via the WHATWG "prescan the byte
# stream" algorithm over the first 1024 bytes. The ladder above never runs
# on the html sniff kind (markup routes by its ASCII markers before any
# transcode), so declared-charset pages get their own decode hook, applied
# inside the html route.

# prescan window (chars == bytes for bytes-as-text payloads)
_HTML_PRESCAN = 1024

# any <meta ...> tag carrying a charset= token — covers both the html5
# <meta charset="..."> form and the legacy http-equiv content-type form
# (whose content attribute embeds "charset=...")
_META_TAG_RE = re.compile(r"(?is)<meta\b[^>]*>")
_CHARSET_TOKEN_RE = re.compile(r"""(?i)charset\s*=\s*["']?\s*([\w.:\-]+)""")

# label -> (python codec, reported name); WHATWG maps the latin-1/ascii
# family to windows-1252 (browsers and Tika both decode 0x80-0x9F as the
# cp1252 punctuation, not C1 controls). utf-16 labels are deliberately
# absent: a real utf-16 page never reaches the html route as bytes (the
# ladder catches the NUL interleave first), and WHATWG itself remaps
# utf-16 declarations.
_HTML_CHARSETS: dict[str, tuple[str, str]] = {
    "utf-8": ("utf-8", "utf-8"),
    "utf8": ("utf-8", "utf-8"),
    "shift_jis": ("shift_jis", "shift_jis"),
    "shift-jis": ("shift_jis", "shift_jis"),
    "sjis": ("shift_jis", "shift_jis"),
    "x-sjis": ("shift_jis", "shift_jis"),
    "ms_kanji": ("shift_jis", "shift_jis"),
    "gbk": ("gbk", "gbk"),
    "gb2312": ("gbk", "gbk"),
    "x-gbk": ("gbk", "gbk"),
    "gb18030": ("gb18030", "gb18030"),
    "big5": ("big5", "big5"),
    "euc-jp": ("euc_jp", "euc-jp"),
    "euc-kr": ("euc_kr", "euc-kr"),
    "windows-1252": ("cp1252", "windows-1252"),
    "cp1252": ("cp1252", "windows-1252"),
    "iso-8859-1": ("cp1252", "windows-1252"),
    "latin-1": ("cp1252", "windows-1252"),
    "us-ascii": ("cp1252", "windows-1252"),
}


def html_declared_charset(text: str) -> str:
    """The first recognized charset label declared in a <meta> tag within
    the prescan window ('' if none)."""
    for tag in _META_TAG_RE.finditer(text[:_HTML_PRESCAN]):
        m = _CHARSET_TOKEN_RE.search(tag.group(0))
        if m:
            label = m.group(1).lower()
            if label in _HTML_CHARSETS:
                return label
    return ""


def decode_html_charset(text: str) -> tuple[str, str]:
    """Honor an html payload's declared <meta> charset.

    Returns ``(decoded_text, codec_name)``; codec '' when nothing applied
    — no declaration, unknown label, already-real-unicode payload, decode
    failure (a bad declaration never fails the document), or a decode
    that changes nothing (ascii bytes declared utf-8)."""
    if not text:
        return text, ""
    label = html_declared_charset(text)
    if not label:
        return text, ""
    try:
        raw = text.encode("latin-1")
    except (UnicodeEncodeError, ValueError):
        return text, ""  # real unicode: already decoded upstream
    codec, name = _HTML_CHARSETS[label]
    try:
        decoded = raw.decode(codec)
    except (UnicodeDecodeError, ValueError):
        return text, ""
    if decoded == text:
        return text, ""
    return decoded, name


def encode_charset(text: str, codec: str, bom: bool = True) -> str:
    """Inverse helper for corpus/fixture builders: encode real-unicode
    ``text`` with ``codec`` and return the wire bytes as latin-1 text
    (optionally BOM-prefixed). Builder-side only — the extractor never
    encodes."""
    canonical = {
        "utf-8": "utf-8",
        "utf-16le": "utf-16-le",
        "utf-16be": "utf-16-be",
        "utf-32le": "utf-32-le",
        "utf-32be": "utf-32-be",
        "shift_jis": "shift_jis",
        "gbk": "gbk",
    }[codec]
    raw = text.encode(canonical)
    if bom:
        prefix = next((b for b, c, n in _BOMS if n == codec), "")
        raw = prefix.encode("latin-1") + raw
    return raw.decode("latin-1")
