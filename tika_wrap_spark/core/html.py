"""HTML -> main-content text runs, with Arc90/Boilerpipe-style boilerplate
stripping — the ``html_extract`` operator.

The reference gets this behavior from Apache Tika's HTML parser via
``PUT /tika`` with ``Accept: text/plain`` (/root/reference/src/java-env.cpp:
250,313); the rebuild implements it natively: a regex tag tokenizer (no
external deps on the hot path), block segmentation at block-level elements,
then per-block text-density / link-density scoring to keep content blocks and
drop navigation / header / footer boilerplate (the Arc90-readability +
Boilerpipe heuristic family, see PAPERS.md).

Deterministic and pure: the same function produces golden fixtures and runs
inside the Spark pandas UDFs.
"""

from __future__ import annotations

import re

from tika_wrap_spark.core.errors import ExtractError

# Elements that open/close a text block. Everything else is inline.
_BLOCK_ELEMENTS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li td th tr ul ol table article section header "
    "footer nav aside main blockquote pre br hr title".split()
)
# Elements whose entire content is dropped.
_DROP_ELEMENTS = frozenset({"script", "style", "noscript", "svg", "template"})
# Elements that, when enclosing a block, force-drop it (structural boilerplate).
_BOILERPLATE_CONTAINERS = frozenset({"nav", "header", "footer", "aside"})

_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:[^>'\"]|'[^']*'|\"[^\"]*\")*?)(/?)>")
_WS_RE = re.compile(r"\s+")

# Named entities: the full WHATWG HTML5 set (stdlib html.entities.html5 —
# public spec data), semicolon-terminated forms only (the lenient
# no-semicolon legacy forms decode as literal text, like Tika's sax path).
from html.entities import html5 as _HTML5_ENTITIES  # noqa: E402

_NAMED = {k: v for k, v in _HTML5_ENTITIES.items() if k.endswith(";")}

# Numeric character references additionally get the WHATWG windows-1252
# remap for the C1 range (browsers decode &#150; as EN DASH, not U+0096).
_CP1252 = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„",
    0x85: "…", 0x86: "†", 0x87: "‡", 0x88: "ˆ",
    0x89: "‰", 0x8A: "Š", 0x8B: "‹", 0x8C: "Œ",
    0x8E: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“",
    0x94: "”", 0x95: "•", 0x96: "–", 0x97: "—",
    0x98: "˜", 0x99: "™", 0x9A: "š", 0x9B: "›",
    0x9C: "œ", 0x9E: "ž", 0x9F: "Ÿ",
}

_ENTITY_RE = re.compile(
    r"&(#[0-9]{1,8};|#[xX][0-9a-fA-F]{1,8};|[a-zA-Z][a-zA-Z0-9]{0,31};)"
)


def _entity_sub(m: "re.Match[str]") -> str:
    ent = m.group(1)
    if ent[0] == "#":
        body = ent[1:-1]
        cp = int(body[1:], 16) if body[0] in "xX" else int(body)
        if cp in _CP1252:
            return _CP1252[cp]
        if cp == 0 or 0xD800 <= cp <= 0xDFFF or cp > 0x10FFFF:
            return "�"  # WHATWG replacement for invalid refs
        return chr(cp)
    return _NAMED.get(ent, m.group(0))  # unknown name -> literal text

# A '<' that never closes within this many chars marks a malformed document.
_MAX_TAG_LEN = 1024

# Arc90-style keep thresholds.
MIN_BLOCK_CHARS = 25
MAX_LINK_DENSITY = 1.0 / 3.0


def _decode_entities(s: str) -> str:
    if "&" not in s:  # fast path: most blocks carry no entities
        return s
    return _ENTITY_RE.sub(_entity_sub, s)


def _normalize_ws(s: str) -> str:
    # equivalent to _WS_RE.sub(" ", s).strip() for all whitespace the
    # corpus can contain, ~3x faster (no regex machinery)
    return " ".join(s.split())


_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL)
_XML_TAG_RE = re.compile(r"<[^>]*>")


def extract_xml_text(xml: str) -> str:
    """Generic XML -> character content: strip tags, decode entities,
    collapse whitespace (Tika's generic XML parser behavior — element text
    only, lenient on malformed markup). One text run per document."""
    return _normalize_ws(_decode_entities(_XML_TAG_RE.sub(" ", xml)))


_XPS_GLYPHS_RE = re.compile(
    r"<Glyphs\b[^>]*?\bUnicodeString\s*=\s*(\"([^\"]*)\"|'([^']*)')",
    re.DOTALL,
)


def xps_fpage_text(xml: str) -> str:
    """XPS FixedPage -> text: the page's visible text lives in
    ``Glyphs/@UnicodeString`` ATTRIBUTES (ECMA-388 §12), so the generic
    element-text strip above yields nothing for .fpage members — this is
    the attribute-level reader Tika's XPSParser implements. One line per
    Glyphs run, document order, entities decoded. A leading ``{}`` escape
    (literal-brace guard for strings that would otherwise parse as
    indexed-glyph syntax) is stripped the way XPS consumers do."""
    runs = []
    for m in _XPS_GLYPHS_RE.finditer(xml):
        raw = m.group(2) if m.group(2) is not None else m.group(3)
        s = _decode_entities(raw)
        if s.startswith("{}"):
            s = s[2:]
        if s:
            runs.append(_normalize_ws(s))
    return "\n".join(r for r in runs if r)


_XML_ROOT_RE = None  # compiled lazily below (module import order)


def xml_root_tag(xml: str) -> str:
    """Root element name of an XML document, lowercased — the subkind
    signal Tika's XML detectors read (``svg`` -> image/svg+xml, ``rss`` /
    ``feed`` -> the syndication types) before handing generic XML to the
    text parser. Skips the prolog, comments, PIs, and DOCTYPE; returns ''
    when no element opens in the head."""
    global _XML_ROOT_RE
    if _XML_ROOT_RE is None:
        import re as _re

        _XML_ROOT_RE = _re.compile(r"<([A-Za-z_][\w.\-:]*)")
    pos = 0
    n = len(xml)
    while pos < n:
        lt = xml.find("<", pos)
        if lt < 0:
            return ""
        nxt = xml[lt + 1 : lt + 2]
        if nxt in ("?", "!"):
            # prolog / PI / comment / DOCTYPE: skip to its closing '>'
            gt = xml.find(">", lt + 1)
            if gt < 0:
                return ""
            pos = gt + 1
            continue
        m = _XML_ROOT_RE.match(xml, lt)
        if not m:
            return ""
        name = m.group(1)
        # namespace prefixes drop (Tika matches local names)
        return name.rsplit(":", 1)[-1].lower() if ":" in name else name.lower()
    return ""


def html_title(html: str) -> str:
    """First ``<title>`` text, whitespace-normalized and entity-decoded —
    the per-format metadata Tika surfaces as ``dc:title`` (the reference's
    ``/meta`` flatten, /root/reference/src/java-env.cpp:290-305). Empty
    string when the document has no title."""
    m = _TITLE_RE.search(html)
    if not m:
        return ""
    return _normalize_ws(_decode_entities(m.group(1)))


class _Block:
    __slots__ = ("parts", "link_chars", "in_boilerplate")

    def __init__(self, in_boilerplate: bool) -> None:
        self.parts: list[str] = []
        self.link_chars = 0
        self.in_boilerplate = in_boilerplate

    def text(self) -> str:
        return _normalize_ws(_decode_entities("".join(self.parts)))


def extract_html_blocks(html: str) -> list[str]:
    """Tokenize ``html`` and return the kept content blocks, in document
    order, whitespace-normalized and entity-decoded.

    Keep rule per block (Arc90/Boilerpipe text-density + link-density):
      keep iff  len(text) >= MIN_BLOCK_CHARS
            and link_chars / len(text) < MAX_LINK_DENSITY
            and the block is not inside nav/header/footer/aside.

    Raises ExtractError on malformed input (an unterminated tag).
    """
    blocks: list[_Block] = []
    boiler_depth = 0  # nesting depth inside boilerplate containers
    link_depth = 0  # nesting depth inside <a>
    drop_until: str | None = None  # inside script/style: skip until this close tag

    cur = _Block(in_boilerplate=False)
    cur_parts = cur.parts  # hot-loop local aliases (CPython attr lookups)
    find = html.find
    startswith = html.startswith
    tag_match = _TAG_RE.match

    pos = 0
    n = len(html)
    while pos < n:
        lt = find("<", pos)
        if lt == -1:
            if drop_until is None:
                text = html[pos:]
                cur_parts.append(text)
                if link_depth > 0:
                    cur.link_chars += len(_normalize_ws(text))
            break
        if lt > pos and drop_until is None:
            text = html[pos:lt]
            cur_parts.append(text)
            if link_depth > 0:
                cur.link_chars += len(_normalize_ws(text))
        # comments
        if startswith("<!--", lt):
            end = find("-->", lt + 4)
            if end == -1:
                raise ExtractError("unterminated comment")
            pos = end + 3
            continue
        # doctype / other declarations
        if startswith("<!", lt):
            end = find(">", lt)
            if end == -1 or end - lt > _MAX_TAG_LEN:
                raise ExtractError("unterminated declaration")
            pos = end + 1
            continue
        m = tag_match(html, lt)
        if m is None:
            gt = find(">", lt)
            if gt == -1 or gt - lt > _MAX_TAG_LEN:
                raise ExtractError("unterminated tag at offset %d" % lt)
            # not a recognizable tag: treat '<...>' literally as text
            if drop_until is None:
                cur_parts.append(html[lt : gt + 1])
            pos = gt + 1
            continue
        closing, name, selfclose = m.group(1, 2, 4)
        name = name.lower()
        pos = m.end()

        if drop_until is not None:
            if closing and name == drop_until:
                drop_until = None
            continue
        if not closing and name in _DROP_ELEMENTS and not selfclose:
            drop_until = name
            continue

        if name == "a":
            if closing:
                link_depth = max(0, link_depth - 1)
            elif not selfclose:
                link_depth += 1
        if name in _BLOCK_ELEMENTS:
            if cur_parts:
                blocks.append(cur)
            cur = _Block(in_boilerplate=boiler_depth > 0)
            cur_parts = cur.parts
        if name in _BOILERPLATE_CONTAINERS:
            if closing:
                boiler_depth = max(0, boiler_depth - 1)
                cur.in_boilerplate = boiler_depth > 0
            elif not selfclose:
                boiler_depth += 1
                cur.in_boilerplate = True
    if cur_parts:
        blocks.append(cur)

    kept: list[str] = []
    for b in blocks:
        text = b.text()
        if not text:
            continue
        if b.in_boilerplate:
            continue
        if len(text) < MIN_BLOCK_CHARS:
            continue
        if b.link_chars / len(text) >= MAX_LINK_DENSITY:
            continue
        kept.append(text)
    return kept
