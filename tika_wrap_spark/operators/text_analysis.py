"""Declarative text analysis for training-data curation: language ID,
quality scoring, token counting, fingerprinting.

Everything here is built-in pyspark.sql.functions expressions (JVM-side,
whole-stage codegen, vectorized parquet input) — no Python in the hot path,
and each operator has an exact ANSI-SQL oracle. Ratios are quantized as
floor(1000 * int / int), which is exact in IEEE doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tika_wrap_spark.operators.dedup import NORM_EXPR

# language -> (java regex, re2 regex) stopword/charclass markers
LANG_MARKERS: dict[str, tuple[str, str]] = {
    "en": (r"\\b(the|and|of|in|is)\\b", r"\b(the|and|of|in|is)\b"),
    "fr": (r"\\b(le|la|et|les|des)\\b", r"\b(le|la|et|les|des)\b"),
    "es": (r"\\b(el|los|las|una|y)\\b", r"\b(el|los|las|una|y)\b"),
    "de": (r"\\b(der|die|das|und|ein)\\b", r"\b(der|die|das|und|ein)\b"),
    "zh": (r"[\\u4e00-\\u9fff]", r"[\x{4e00}-\x{9fff}]"),
}
LANG_ORDER = ["en", "fr", "es", "de", "zh"]

STOPWORD_JAVA = r"\\b(the|a|of|and|in)\\b"
STOPWORD_RE2 = r"\b(the|a|of|and|in)\b"
PUNCT_JAVA = r"[^a-z0-9 ]"
BPE_JAVA = r"[a-z]+|[0-9]+|[^a-z0-9\\s]"
BPE_RE2 = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def _norm(df: DataFrame) -> DataFrame:
    return df.withColumn("norm", F.expr(NORM_EXPR))


def lang_scores(df: DataFrame) -> DataFrame:
    """n-gram/stopword-marker counts per language + argmax prediction
    (first language wins ties, in LANG_ORDER)."""
    out = _norm(df)
    for lang in LANG_ORDER:
        java_pat = LANG_MARKERS[lang][0]
        out = out.withColumn(
            f"s_{lang}", F.expr(f"regexp_count(norm, '{java_pat}')")
        )
    pred: Column | None = None
    # build CASE from last to first so earlier languages win ties
    pred = F.lit(LANG_ORDER[-1])
    for lang in reversed(LANG_ORDER[:-1]):
        cond = None
        for other in LANG_ORDER:
            if other == lang:
                continue
            later = LANG_ORDER.index(other) > LANG_ORDER.index(lang)
            c = (
                F.col(f"s_{lang}") >= F.col(f"s_{other}")
                if later
                else F.col(f"s_{lang}") > F.col(f"s_{other}")
            )
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return out.withColumn("pred_lang", pred)


def quality_features(df: DataFrame) -> DataFrame:
    """Length / punctuation / stopword features + a quality bucket."""
    out = _norm(df)
    out = (
        out.withColumn("n_chars_norm", F.length("norm"))
        .withColumn("n_tokens", F.size(F.split(F.col("norm"), " ")))
        .withColumn("punct_cnt", F.expr(f"regexp_count(lower(text), '{PUNCT_JAVA}')"))
        .withColumn("stop_cnt", F.expr(f"regexp_count(norm, '{STOPWORD_JAVA}')"))
    )
    out = out.withColumn(
        "punct_ratio_q",
        F.floor(F.lit(1000) * F.col("punct_cnt") / F.greatest(F.col("n_chars_norm"), F.lit(1))).cast("long"),
    ).withColumn(
        "stop_ratio_q",
        F.floor(F.lit(1000) * F.col("stop_cnt") / F.greatest(F.col("n_tokens"), F.lit(1))).cast("long"),
    )
    bucket = (
        F.when(F.col("n_tokens") < 10, F.lit("too_short"))
        .when(F.col("punct_ratio_q") > 300, F.lit("punct_heavy"))
        .when(F.col("stop_ratio_q") >= 100, F.lit("high"))
        .otherwise(F.lit("medium"))
    )
    return out.withColumn("quality", bucket)


def token_counts(df: DataFrame) -> DataFrame:
    """Whitespace tokens + a BPE-ish regex token count (letters / digits /
    single punctuation — the standard pre-tokenizer shape)."""
    out = _norm(df)
    return out.withColumn(
        "tokens_ws", F.size(F.split(F.col("norm"), " "))
    ).withColumn("tokens_bpe", F.expr(f"regexp_count(lower(text), '{BPE_JAVA}')"))


def fingerprints(df: DataFrame) -> DataFrame:
    """Content fingerprints: full/head/tail digests of the normalized text
    (the cheap whole-doc analog of a rolling-hash family)."""
    out = _norm(df)
    return out.select(
        "doc_id",
        F.md5(F.col("norm").cast("binary")).alias("fp_full"),
        F.md5(F.substring(F.col("norm"), 1, 64).cast("binary")).alias("fp_head"),
        F.md5(
            F.expr("substring(norm, greatest(length(norm) - 63, 1))").cast("binary")
        ).alias("fp_tail"),
    )


def repetition_features(df: DataFrame) -> DataFrame:
    """Repetition signals for training-data filtering (the Gopher /
    RefinedWeb family of filters, see PAPERS.md): duplicate-line ratio and
    most-frequent-token share, both exact quantized integers.

    LINEAR at any document size: line stats are per-row array ops, and the
    most-frequent-token count is explode -> groupBy(doc_id, tok) -> max —
    O(tokens) total work with two partial-aggregable shuffles, so a
    1M-token document costs 1M map-side-combined rows, never the
    O(distinct x tokens) per-row array fold that made one giant document an
    unsplittable straggler task (``tests/test_dedup_edge.py`` pins the
    giant-doc case). The per-doc stats ride THROUGH the explode (first()
    in each aggregate), so the whole operator stays a single scan."""
    lines = F.split(F.col("text"), "\n")
    toks = F.split(F.col("norm"), " ")
    toks_clean = F.filter(toks, lambda t: t != "")
    base = df.withColumn("norm", F.expr(NORM_EXPR)).select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(F.array_distinct(lines)).cast("long").alias("n_uniq_lines"),
        F.size(toks_clean).cast("long").alias("n_toks"),
        # explode_outer keeps zero-token docs as one null-tok row, so every
        # input doc surfaces in the output (with max_tok_cnt = 0)
        F.explode_outer(toks_clean).alias("tok"),
    )
    tok_counts = base.groupBy("doc_id", "tok").agg(
        F.count("*").alias("c"),
        F.first("n_lines").alias("n_lines"),
        F.first("n_uniq_lines").alias("n_uniq_lines"),
        F.first("n_toks").alias("n_toks"),
    )
    return (
        tok_counts.groupBy("doc_id")
        .agg(
            F.first("n_lines").alias("n_lines"),
            F.first("n_uniq_lines").alias("n_uniq_lines"),
            F.first("n_toks").alias("n_toks"),
            F.max(
                F.when(F.col("tok").isNull(), F.lit(0)).otherwise(F.col("c"))
            ).cast("long").alias("max_tok_cnt"),
        )
        .select(
            "doc_id",
            "n_lines",
            "n_uniq_lines",
            F.floor(
                F.lit(1000)
                * (F.col("n_lines") - F.col("n_uniq_lines"))
                / F.greatest(F.col("n_lines"), F.lit(1))
            ).cast("long").alias("dup_line_q"),
            "n_toks",
            "max_tok_cnt",
            F.floor(
                F.lit(1000) * F.col("max_tok_cnt") / F.greatest(F.col("n_toks"), F.lit(1))
            ).cast("long").alias("max_tok_share_q"),
        )
    )
