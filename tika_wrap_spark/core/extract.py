"""Per-document extraction orchestration: sniff -> route -> extract ->
ordered span assembly + flat metadata map.

This is the analog of the reference's whole parse path
(``JavaEnvPrivate::autoParserParserFile``, /root/reference/src/java-env.cpp:192-328):
  * routing by content detection   (src/java-env.cpp:233-248 + server-side)
  * ordered text output            (``ctx.txt`` chunk append, :268-271,310)
  * flat string/string metadata    (``meta.txt`` JSON flatten, :290-305)
  * per-document boolean status    (:316-325; failures are data, not crashes)

Output span contract (the north_star invariant): an ``offset``-ordered
``array<struct<kind,text,media_ref,offset>>`` where ``offset`` is the running
sum of preceding kept-text lengths; per-document equality is exact on
``(kind, text, media_ref, order)``.
"""

from __future__ import annotations

from typing import Any

from tika_wrap_spark.core.errors import ExtractError
from tika_wrap_spark.core.html import extract_html_blocks
from tika_wrap_spark.core.pdf import extract_pdf_pages
from tika_wrap_spark.core.sniff import (
    KIND_HTML,
    KIND_MEDIA,
    KIND_PDF,
    KIND_TEXT,
    KIND_ZIP,
    sniff_kind,
)

Span = dict[str, Any]  # {kind, text, media_ref, offset}


def _stringify(value: Any) -> str:
    """Metadata values coerce to flat strings — pins the reference's lossy
    ``obj[k].toString()`` flatten (src/java-env.cpp:300): non-string scalars
    stringify; containers flatten to ''."""
    if value is None:
        return ""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (list, tuple, dict, set, bytes)):
        return ""
    return str(value)


def extract_document(spans: list[Span] | None) -> dict[str, Any]:
    """Extract one document. Never raises — failures become data.

    Returns ``{"spans": [...], "parse_ok": bool, "error": str,
    "meta": {str: str}}`` with output spans ordered by running offset.
    """
    try:
        return _extract_or_raise(spans)
    except ExtractError as exc:  # bad doc => row, never a task failure
        return {"spans": [], "parse_ok": False, "error": str(exc), "meta": {}}
    except Exception as exc:  # absolute backstop, same policy
        return {
            "spans": [],
            "parse_ok": False,
            "error": "internal: %s" % exc,
            "meta": {},
        }


def _extract_or_raise(spans: list[Span] | None) -> dict[str, Any]:
    out: list[Span] = []
    offset = 0
    n_in = 0
    kinds_seen: set[str] = set()
    n_pages = 0  # pdf pages emitted (Tika's per-format metadata analog)
    n_blocks = 0  # html content blocks kept
    n_media = 0

    def emit(kind: str, text: str, media_ref: str) -> None:
        nonlocal offset
        out.append(
            {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}
        )
        offset += len(text)

    for span in spans or []:
        n_in += 1
        text = span.get("text") or ""
        media_ref = span.get("media_ref") or ""
        kind = sniff_kind(text, media_ref)
        kinds_seen.add(kind)
        if kind == KIND_MEDIA:
            n_media += 1
            emit(KIND_MEDIA, "", media_ref)
        elif kind == KIND_HTML:
            for block in extract_html_blocks(text):
                n_blocks += 1
                emit(KIND_TEXT, block, "")
        elif kind == KIND_PDF:
            for page in extract_pdf_pages(text):
                n_pages += 1
                emit(KIND_TEXT, page, "")
        elif kind == KIND_ZIP:
            # container payloads arrive pre-flattened as interleaved spans
            # (FIXTURES.md §1); a raw zip payload is unparseable here.
            raise ExtractError("raw container payload (zip) not supported")
        else:
            emit(KIND_TEXT, text, "")

    n_chars = sum(len(s["text"]) for s in out)
    # per-kind counters mirror the per-format metadata Tika's /meta endpoint
    # exposes (page counts etc.); values flat strings only (reference
    # coercion, src/java-env.cpp:300)
    meta = {
        "n_spans_in": _stringify(n_in),
        "n_spans_out": _stringify(len(out)),
        "n_chars": _stringify(n_chars),
        "n_pdf_pages": _stringify(n_pages),
        "n_html_blocks": _stringify(n_blocks),
        "n_media": _stringify(n_media),
        "kinds": ",".join(sorted(kinds_seen)),
        "parser": "tika_wrap_spark-0.1",
    }
    return {"spans": out, "parse_ok": True, "error": "", "meta": meta}
