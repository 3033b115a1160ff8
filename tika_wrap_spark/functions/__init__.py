"""Reusable column-expression library (the engine's `F`-level surface).

Everything here is a pure JVM-side expression (whole-stage codegen, no
Python) shared by the operators, the driver queries, and user code. The
span-sequence expressions implement the north_star invariant — equality on
``(kind, text, media_ref, order)`` — as columns, so fixture verification
is a join + comparison, not a collect.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# re-exported primitives (single definition point elsewhere)
from tika_wrap_spark.operators.dedup import (  # noqa: F401
    NORM_EXPR,
    NORM_TEMPLATE,
    norm_col,
)
from tika_wrap_spark.operators.similarity import (  # noqa: F401
    cosine_q,
    int_dot,
    quantize,
)

# unit separators for canonical span serialization (never appear in text
# emitted by the extractor, which strips control chars via normalization)
_FIELD_SEP = "\x1e"
_SPAN_SEP = "\x1f"


def norm_text(col: Column | str) -> Column:
    """Whitespace-collapsed, trimmed, lowercased text — THE normalization
    every dedup/quality operator keys on. Built from the same
    ``NORM_TEMPLATE`` as the SQL-string form (one definition point)."""
    if isinstance(col, str):
        return F.expr(NORM_TEMPLATE.format(col=col))
    return norm_col(col)


def sniff_kind_col(text: Column, media_ref: Column) -> Column:
    """JVM-native (whole-stage-codegen) form of ``core.sniff.sniff_kind`` —
    the same routing rules as a ``when``/``substring`` chain, built from the
    SAME marker/magic constants so the two cannot drift
    (``tests/test_plans.py`` pins full-corpus output equality with the
    Python sniffer).

    Use this for standalone route tallies / relational routing; the Python
    sniffer runs only inside the fused extraction pass, where the Arrow
    crossing is already paid."""
    from tika_wrap_spark.core import sniff as sn  # noqa: PLC0415

    head = F.substring(text, 1, sn.HEAD_WINDOW)
    # (?U): Java \s matches only ASCII whitespace by default, but the Python
    # sniffer's str.lstrip() strips unicode whitespace (NBSP etc.) — the
    # unicode flag keeps the two rule sets identical on exotic leading ws.
    # Python's str.isspace() is additionally true for the file/group/record/
    # unit separators \x1c-\x1f, which Unicode White_Space (Java (?U)\s) is
    # NOT — the explicit class closes that parity gap (fuzz + control-char
    # corpus pinned in tests/test_plans.py).
    lowered = F.lower(F.regexp_replace(head, r"(?U)^[\s\x1c-\x1f]+", ""))
    html_marker = F.lit(False)
    for marker in sn._HTML_MARKERS:
        html_marker = html_marker | lowered.startswith(marker)
    is_media_magic = F.lit(False)
    for magic in sn._MEDIA_MAGICS:
        is_media_magic = is_media_magic | head.startswith(magic)
    eml_strong = F.lit(False)
    for s in sn._EML_STRONG:
        eml_strong = eml_strong | lowered.startswith(s)
    eml_weak = F.lit(False)
    for w in sn._EML_WEAK:
        eml_weak = eml_weak | lowered.startswith(w)
    eml_corr = F.lit(False)
    for c in sn._EML_CORROBORATORS:
        eml_corr = eml_corr | lowered.contains(c)
    first_line = F.substring_index(head, "\n", 1)
    return (
        F.when(
            (text.isNull() | (text == "")) & media_ref.isNotNull() & (media_ref != ""),
            F.lit(sn.KIND_MEDIA),
        )
        .when(text.isNull(), F.lit(sn.KIND_TEXT))
        .when(head.startswith("%PDF-"), F.lit(sn.KIND_PDF))
        .when(head.startswith("PK\x03\x04"), F.lit(sn.KIND_ZIP))
        .when(head.startswith("\x1f\x8b"), F.lit(sn.KIND_GZIP))
        .when(head.startswith("\xfd7zXZ\x00"), F.lit(sn.KIND_XZ))
        .when(
            head.startswith("BZh")
            & F.substring(head, 4, 1).isin(*list("123456789")),
            F.lit(sn.KIND_BZ2),
        )
        .when(head.startswith("\x1f\x9d"), F.lit(sn.KIND_Z))
        .when(head.startswith(sn.LZ4_MAGIC_TEXT), F.lit(sn.KIND_LZ4))
        .when(
            head.startswith(sn.MIDI_MAGIC_TEXT)
            & (F.substring(head, 5, 1) == "\x00"),
            F.lit(sn.KIND_MIDI),
        )
        .when(head.startswith(sn.SEVENZ_MAGIC_TEXT), F.lit(sn.KIND_SEVENZ))
        .when(head.startswith(sn.RAR_MAGIC_TEXT), F.lit(sn.KIND_RAR))
        .when(head.startswith(sn.ZSTD_MAGIC_TEXT), F.lit(sn.KIND_ZSTD))
        .when(
            head.startswith(sn.LZMA_MAGIC_TEXT)
            & (
                (F.substring(head, 6, 8) == sn.LZMA_SIZE_UNKNOWN_TEXT)
                | (F.substring(head, 11, 3) == "\x00\x00\x00")
            ),
            F.lit(sn.KIND_LZMA),
        )
        .when(head.startswith(sn.OLE_MAGIC_TEXT), F.lit(sn.KIND_OLE))
        .when(head.startswith(sn.SQLITE_MAGIC_TEXT), F.lit(sn.KIND_SQLITE))
        .when(head.startswith(sn.FONT_TTF_MAGIC_TEXT), F.lit(sn.KIND_FONT))
        .when(
            head.startswith(sn.FONT_OTTO_MAGIC_TEXT)
            & (F.substring(head, 5, 1) == "\x00"),
            F.lit(sn.KIND_FONT),
        )
        .when(
            head.startswith(sn.FONT_WOFF_MAGIC_TEXT)
            & F.substring(head, 5, 1).isin(*sn.FONT_WOFF_FLAVOR_BYTES),
            F.lit(sn.KIND_FONT),
        )
        .when(head.startswith(sn.WARC_MAGIC_TEXT), F.lit(sn.KIND_WARC))
        .when(head.startswith(sn.PLIST_MAGIC_TEXT), F.lit(sn.KIND_PLIST))
        .when(head.startswith(sn.AR_MAGIC_TEXT), F.lit(sn.KIND_AR))
        # cpio: 6-char magic + 8 hex chars (ino field) — the substring is
        # shorter than 8 on short payloads, so the anchored regex fails,
        # matching the Python len guard
        .when(
            F.substring(head, 1, 6).isin(*sn.CPIO_MAGIC_TEXTS)
            & F.substring(head, 7, 8).rlike("^[0-9a-fA-F]{8}$"),
            F.lit(sn.KIND_CPIO),
        )
        # dbf: \x03 version byte + plausible month/day bytes + an xBase
        # field-type letter at the first descriptor's fixed offset; short
        # payloads yield empty substrings (ascii('') = 0, '' not in the
        # type set), matching the Python len guard
        .when(
            (F.substring(head, 1, 1) == "\x03")
            & F.ascii(F.substring(head, 3, 1)).between(1, 12)
            & F.ascii(F.substring(head, 4, 1)).between(1, 31)
            & F.substring(head, sn.DBF_TYPE_OFFSET + 1, 1).isin(
                *list(sn.DBF_FIELD_TYPE_CHARS)
            ),
            F.lit(sn.KIND_DBF),
        )
        .when(head.startswith(sn.TNEF_MAGIC_TEXT), F.lit(sn.KIND_TNEF))
        .when(head.startswith(sn.CAB_MAGIC_TEXT), F.lit(sn.KIND_CAB))
        .when(head.startswith(sn.AVRO_MAGIC_TEXT), F.lit(sn.KIND_AVRO))
        # Parquet 'PAR1' at BOTH ends of the FULL payload (negative-start
        # substring = the Python text[-4:] slice; short payloads yield a
        # short substring -> no match, same as Python)
        .when(
            head.startswith(sn.PARQUET_MAGIC_TEXT)
            & (F.length(text) >= 12)
            & (F.substring(text, -4, 4) == sn.PARQUET_MAGIC_TEXT),
            F.lit(sn.KIND_PARQUET),
        )
        # ISO 9660 'CD001' signature past the 32 KiB system area (before
        # the tar rule — the deterministic pin for hybrid payloads);
        # shorter payloads yield a short/empty substring -> no match,
        # same as the Python slice
        .when(
            F.substring(text, sn.ISO_MAGIC_OFFSET + 1, 5) == "CD001",
            F.lit(sn.KIND_ISO),
        )
        # ustar magic at its fixed in-header offset (1-based substring);
        # shorter payloads yield a short/empty substring -> no match, same
        # as the Python slice
        .when(
            F.substring(text, sn.TAR_MAGIC_OFFSET + 1, 5) == "ustar",
            F.lit(sn.KIND_TAR),
        )
        .when(is_media_magic, F.lit(sn.KIND_MEDIA))
        # ISO-BMFF 'ftyp' fourcc at its fixed offset-4 position (1-based
        # substring), mirroring the Python head[4:8] slice
        .when(
            F.substring(head, sn.MP4_FTYP_OFFSET + 1, 4) == "ftyp",
            F.lit(sn.KIND_MEDIA),
        )
        .when(head.startswith("{\\rtf"), F.lit(sn.KIND_RTF))
        # mbox From_ separator with its two corroborators ('@' in the
        # separator line, an rfc5322 header in the head) — before the html
        # rules, mirroring the Python rule order
        .when(
            head.startswith(sn.MBOX_MAGIC_TEXT)
            & first_line.contains("@")
            & eml_corr,
            F.lit(sn.KIND_MBOX),
        )
        .when(html_marker, F.lit(sn.KIND_HTML))
        .when(lowered.startswith("<?xml"), F.lit(sn.KIND_XML))
        .when(lowered.contains("<html"), F.lit(sn.KIND_HTML))
        .when(eml_strong | (eml_weak & eml_corr), F.lit(sn.KIND_EML))
        .when(lowered.startswith(sn.ICS_OPENER_TEXT), F.lit(sn.KIND_ICS))
        .when(lowered.startswith(sn.VCF_OPENER_TEXT), F.lit(sn.KIND_VCF))
        .when(lowered.startswith("{") | lowered.startswith("["), F.lit(sn.KIND_JSON))
        .when(F.size(F.split(first_line, ",")) >= 3, F.lit(sn.KIND_CSV))
        .otherwise(F.lit(sn.KIND_TEXT))
    )


def span_canonical(span: Column) -> Column:
    """One span -> canonical string on (kind, text, media_ref). Offset is
    excluded: order is the sequence position, offset is derived."""
    return F.concat_ws(_FIELD_SEP, span["kind"], span["text"], span["media_ref"])


def span_seq_hash(spans_col: Column | str) -> Column:
    """Order-SENSITIVE digest of a spans array — two documents compare equal
    under the north_star invariant iff these hashes match."""
    c = F.col(spans_col) if isinstance(spans_col, str) else spans_col
    return F.md5(
        F.concat_ws(_SPAN_SEP, F.transform(c, span_canonical)).cast("binary")
    )


def span_text_length(spans_col: Column | str) -> Column:
    """Total extracted characters across spans (the doc-cost proxy used by
    skew salting), as a codegen'd integer fold."""
    c = F.col(spans_col) if isinstance(spans_col, str) else spans_col
    return F.aggregate(
        F.coalesce(c, F.array()),
        F.lit(0).cast("long"),
        lambda acc, s: acc + F.coalesce(F.length(s["text"]), F.lit(0)),
    )


def offsets_monotonic(spans_col: Column | str) -> Column:
    """True iff span offsets are non-decreasing — the §1.1 ordering
    invariant as a boolean column (property tests / data quality gates)."""
    c = F.col(spans_col) if isinstance(spans_col, str) else spans_col
    return F.coalesce(
        F.aggregate(
            c,
            F.struct(F.lit(True).alias("ok"), F.lit(-1).alias("prev")),
            lambda acc, s: F.struct(
                (acc["ok"] & (s["offset"] >= acc["prev"])).alias("ok"),
                s["offset"].alias("prev"),
            ),
            lambda acc: acc["ok"],
        ),
        F.lit(True),
    )
