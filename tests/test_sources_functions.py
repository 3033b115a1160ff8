"""Sources round-trips, shared column functions, and distributed corpus
generation determinism."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tika_wrap_spark import sources
from tika_wrap_spark import functions as tw
from tika_wrap_spark.corpus import generate_corpus
from tika_wrap_spark.data import corpus_to_df, distributed_corpus_df


def _rows(df):
    return sorted(
        (
            r["doc_id"],
            tuple((s["kind"], s["text"], s["media_ref"], s["offset"]) for s in (r["spans"] or [])),
        )
        for r in df.collect()
    )


def test_parquet_roundtrip(spark, tmp_path):
    df = corpus_to_df(spark, generate_corpus(30, seed=5))
    p = str(tmp_path / "corpus_pq")
    sources.write_corpus_parquet(df, p)
    assert _rows(sources.read_corpus_parquet(spark, p)) == _rows(df)


def test_jsonl_roundtrip(spark, tmp_path):
    df = corpus_to_df(spark, generate_corpus(30, seed=5))
    p = str(tmp_path / "corpus_jsonl")
    sources.write_corpus_jsonl(df, p)
    assert _rows(sources.read_corpus_jsonl(spark, p)) == _rows(df)


def test_orc_roundtrip(spark, tmp_path):
    df = corpus_to_df(spark, generate_corpus(30, seed=5))
    p = str(tmp_path / "corpus_orc")
    sources.write_corpus_orc(df, p)
    assert _rows(sources.read_corpus_orc(spark, p)) == _rows(df)


def test_text_dir_source(spark, tmp_path):
    d = tmp_path / "raw"
    d.mkdir()
    (d / "a.log").write_text("hello world\nline two")
    (d / "b.txt").write_text("second doc")
    df = sources.read_text_dir(spark, str(d))
    rows = {os.path.basename(r["doc_id"]): r["spans"] for r in df.collect()}
    assert set(rows) == {"a.log", "b.txt"}
    (span,) = rows["a.log"]
    assert (span["kind"], span["text"], span["offset"]) == ("text", "hello world\nline two", 0)


def test_documents_table_source(spark):
    df = sources.corpus_from_documents_table(spark, "/root/testdata/sf0.001")
    assert df.columns == ["doc_id", "spans"]
    assert df.count() == 500
    assert df.filter(F.size("spans") != 1).count() == 0


def test_distributed_corpus_matches_driver_gen(spark):
    """gen_doc is per-doc seeded: the distributed generator must produce
    exactly the driver-side rows, at any partitioning."""
    local = corpus_to_df(spark, generate_corpus(50, seed=9, adversarial=False))
    for parts in (2, 7):
        dist = distributed_corpus_df(spark, 50, seed=9, num_partitions=parts)
        assert _rows(dist) == _rows(local), parts
    # adversarial=True appends exactly generate_corpus's malformed tail
    local_adv = corpus_to_df(spark, generate_corpus(50, seed=9, adversarial=True))
    dist_adv = distributed_corpus_df(spark, 50, seed=9, num_partitions=3, adversarial=True)
    assert _rows(dist_adv) == _rows(local_adv)


def test_distributed_golden_matches_driver_golden(spark):
    """distributed_golden_df (executor-side pure core) must equal the
    driver-side generate_golden expected spans."""
    from tika_wrap_spark.corpus import generate_golden
    from tika_wrap_spark.data import distributed_golden_df

    rows = generate_corpus(30, seed=13, adversarial=True)
    local = corpus_to_df(
        spark,
        [{"doc_id": g["doc_id"], "spans": g["spans"]} for g in generate_golden(rows)],
    )
    dist = distributed_golden_df(spark, 30, seed=13, num_partitions=4, adversarial=True)
    assert _rows(dist) == _rows(local)


def test_span_seq_hash_order_sensitive(spark):
    df = corpus_to_df(spark, generate_corpus(10, seed=3))
    h1 = df.select("doc_id", tw.span_seq_hash("spans").alias("h"))
    rev = df.select("doc_id", F.reverse("spans").alias("spans"))
    h2 = rev.select("doc_id", tw.span_seq_hash("spans").alias("h"))
    multi = df.filter(F.size("spans") > 1).count()
    joined = h1.alias("a").join(h2.alias("b"), "doc_id")
    differing = joined.filter(F.col("a.h") != F.col("b.h")).count()
    assert differing == multi  # every multi-span doc hashes differently reversed


def test_offsets_monotonic_and_cost(spark):
    from tika_wrap_spark.pipeline import extract_in_memory

    df = corpus_to_df(spark, generate_corpus(40, seed=11))
    ext = extract_in_memory(spark, df, num_partitions=4)
    assert ext.filter(~tw.offsets_monotonic("spans")).count() == 0
    # span_text_length == final offset + last text length for non-empty docs
    last = F.try_element_at("spans", F.lit(-1))
    bad = ext.filter(
        (F.size("spans") > 0)
        & (
            tw.span_text_length("spans")
            != last["offset"] + F.coalesce(F.length(last["text"]), F.lit(0))
        )
    ).count()
    assert bad == 0


def test_norm_text_matches_norm_expr(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = docs.select(tw.norm_text("text").alias("n"))
    b = docs.select(F.expr(tw.NORM_EXPR).alias("n"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
