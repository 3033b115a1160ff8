"""RTF (Rich Text Format) text extraction — pure python, stdlib only.

The reference delegates RTF to Tika's parser family (the server-side
``/tika`` endpoint accepts any document type, /root/reference/src/java-env.cpp:313;
RTF is a core Tika format). The rebuild parses RTF natively from the public
spec (Microsoft RTF 1.9.1): a group-aware control-word tokenizer that keeps
document text, drops destination groups (fonttbl/colortbl/stylesheet/info/
pict/...), decodes ``\\'hh`` cp1252 escapes and ``\\uN`` unicode escapes with
``\\ucN`` fallback skipping, and maps paragraph/line controls to newlines.

Same discipline as core/zipbin.py: hand-rolled structure walk from the
published byte layout, stdlib codecs (cp1252) for decoding, malformed input
raises ``ExtractError`` (which the extraction pipeline turns into a
``parse_ok=false`` row, never a task failure).
"""

from __future__ import annotations

from tika_wrap_spark.core.errors import ExtractError

# Destination control words whose group content is formatting/metadata, not
# document text (RTF 1.9.1 destination list, trimmed to the common set; any
# {\*\...} group is likewise skipped per spec).
_SKIP_DESTINATIONS = frozenset(
    {
        "fonttbl",
        "colortbl",
        "stylesheet",
        "info",
        "header",
        "footer",
        "headerl",
        "headerr",
        "headerf",
        "footerl",
        "footerr",
        "footerf",
        "pict",
        "object",
        "themedata",
        "colorschememapping",
        "datastore",
        "latentstyles",
        "listtable",
        "listoverridetable",
        "revtbl",
        "xmlnstbl",
        "generator",
        "operator",
        "creatim",
        "revtim",
        "printim",
        "comment",
        "doccomm",
        "footnote",
        "ftnsep",
        "ftnsepc",
        "aftnsep",
        "aftnsepc",
        "fldinst",
        "bkmkstart",
        "bkmkend",
    }
)

# Control words that emit fixed text.
_EMIT = {
    "par": "\n",
    "line": "\n",
    "sect": "\n",
    "page": "\n",
    "row": "\n",
    "cell": "\t",
    "tab": "\t",
    "emdash": "\u2014",
    "endash": "\u2013",
    "emspace": " ",
    "enspace": " ",
    "qmspace": " ",
    "bullet": "\u2022",
    "lquote": "\u2018",
    "rquote": "\u2019",
    "ldblquote": "\u201c",
    "rdblquote": "\u201d",
    "~": "\u00a0",  # non-breaking space control symbol
    "-": "",  # optional hyphen
    "_": "\u2011",  # non-breaking hyphen
}

_HEX = "0123456789abcdefABCDEF"


def is_rtf_text(text: str) -> bool:
    """RTF magic: the document group opener ``{\\rtf`` at offset 0."""
    return text.startswith("{\\rtf")


def rtf_to_text(text: str) -> str:  # noqa: PLR0912, PLR0915
    """Extract document text from an RTF payload (bytes-as-text latin-1,
    same bridge as the other binary parsers — RTF itself is 7-bit ASCII
    with ``\\'hh`` escapes for the high half).

    Raises ``ExtractError`` on malformed input: missing ``{\\rtf`` magic,
    unbalanced groups at EOF, or a truncated control sequence.
    """
    if not is_rtf_text(text):
        raise ExtractError("rtf: missing {\\rtf magic")
    out: list[str] = []
    i = 0
    n = len(text)
    # group state stack: (skipping, uc_fallback)
    skipping = False
    uc = 1
    stack: list[tuple[bool, int]] = []
    pending_uc_skip = 0  # chars/escapes to swallow after \uN
    while i < n:
        ch = text[i]
        if ch == "{":
            stack.append((skipping, uc))
            i += 1
            # {\*\dest ...}: the whole group is a skippable destination
            if text[i : i + 2] == "\\*":
                skipping = True
        elif ch == "}":
            if not stack:
                raise ExtractError("rtf: unbalanced group close at %d" % i)
            skipping, uc = stack.pop()
            i += 1
        elif ch == "\\":
            if i + 1 >= n:
                raise ExtractError("rtf: truncated control at end of input")
            c2 = text[i + 1]
            if c2 == "'":
                if i + 3 >= n or text[i + 2] not in _HEX or text[i + 3] not in _HEX:
                    raise ExtractError("rtf: truncated \\'hh escape at %d" % i)
                if pending_uc_skip > 0:
                    pending_uc_skip -= 1
                elif not skipping:
                    out.append(
                        bytes([int(text[i + 2 : i + 4], 16)]).decode(
                            "cp1252", errors="replace"
                        )
                    )
                i += 4
            elif c2 in "\\{}":
                if pending_uc_skip > 0:
                    pending_uc_skip -= 1
                elif not skipping:
                    out.append(c2)
                i += 2
            elif c2 in "~-_":
                if not skipping and pending_uc_skip == 0:
                    out.append(_EMIT[c2])
                if pending_uc_skip > 0:
                    pending_uc_skip -= 1
                i += 2
            elif c2 == "\n" or c2 == "\r":
                # escaped raw newline = \par per spec
                if not skipping:
                    out.append("\n")
                i += 2
            elif c2.isalpha():
                j = i + 1
                while j < n and text[j].isalpha():
                    j += 1
                word = text[i + 1 : j]
                # optional signed numeric parameter
                k = j
                if k < n and (text[k] == "-" or text[k].isdigit()):
                    k += 1
                    while k < n and text[k].isdigit():
                        k += 1
                param_s = text[j:k]
                # one space after a control word is a delimiter, consumed
                if k < n and text[k] == " ":
                    k += 1
                i = k
                if word == "u":
                    # \uN: signed 16-bit code unit; then skip uc fallback
                    try:
                        cp = int(param_s)
                    except ValueError as exc:
                        raise ExtractError("rtf: \\u without parameter") from exc
                    if cp < 0:
                        cp += 65536
                    if not skipping:
                        out.append(chr(cp))
                    pending_uc_skip = uc
                elif word == "uc":
                    uc = int(param_s) if param_s else 1
                elif word == "bin":
                    # raw binary run: skip exactly N bytes, never tokenize
                    blen = int(param_s) if param_s else 0
                    i += max(blen, 0)
                elif word in _SKIP_DESTINATIONS:
                    skipping = True
                elif word in _EMIT:
                    if pending_uc_skip > 0:
                        pending_uc_skip -= 1
                    elif not skipping:
                        out.append(_EMIT[word])
                # all other control words are formatting: ignored
            else:
                # unknown control symbol: ignored per spec
                i += 2
        elif ch == "\r" or ch == "\n":
            i += 1  # raw newlines are not document text in RTF
        else:
            j = i
            while j < n and text[j] not in "\\{}\r\n":
                j += 1
            run = text[i:j]
            if pending_uc_skip > 0:
                drop = min(pending_uc_skip, len(run))
                run = run[drop:]
                pending_uc_skip -= drop
            if not skipping and run:
                out.append(run)
            i = j
    if stack:
        raise ExtractError("rtf: %d unclosed group(s) at end of input" % len(stack))
    return "".join(out)


def build_rtf(paragraphs: list[str], title: str = "") -> str:
    """Deterministic RTF builder for corpus/tests: cp1252-escapes the high
    half, emits one ``\\par`` per paragraph, optional ``\\info`` title
    destination (which extraction must SKIP)."""

    def esc(s: str) -> str:
        parts: list[str] = []
        for c in s:
            if c in "\\{}":
                parts.append("\\" + c)
            elif ord(c) < 128:
                parts.append(c)
            else:
                b = c.encode("cp1252", errors="replace")
                parts.append("\\'%02x" % b[0])
        return "".join(parts)

    body = "".join("%s\\par\n" % esc(p) for p in paragraphs)
    info = "{\\info{\\title %s}}" % esc(title) if title else ""
    return (
        "{\\rtf1\\ansi\\ansicpg1252\\deff0"
        "{\\fonttbl{\\f0\\fswiss Helvetica;}}"
        "{\\colortbl;\\red0\\green0\\blue0;}"
        + info
        + "\\f0\\fs20 "
        + body
        + "}"
    )
