"""Streaming ingestion: drain a directory with availableNow, verify output
equals the batch extraction of the same corpus, and that a second drain
after new files arrive processes ONLY the new files (checkpoint
exactly-once)."""

from __future__ import annotations

from tika_wrap_spark import streaming
from tika_wrap_spark.corpus import generate_corpus
from tika_wrap_spark.data import corpus_to_df
from tika_wrap_spark.operators.extract_ops import extract_spans


def _hashes(spark, df):
    from tika_wrap_spark import functions as tw

    return {
        (r["doc_id"], r["h"], r["parse_ok"])
        for r in df.select("doc_id", tw.span_seq_hash("spans").alias("h"), "parse_ok").collect()
    }


def test_stream_extract_matches_batch_and_is_incremental(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    first = generate_corpus(40, seed=21)
    corpus_to_df(spark, first).coalesce(2).write.mode("append").parquet(in_dir)

    q = streaming.stream_extract(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    want = extract_spans(corpus_to_df(spark, first))
    assert _hashes(spark, got) == _hashes(spark, want)

    # new files land; availableNow drain #2 must process only those
    second = generate_corpus(10, seed=22, adversarial=False)
    renamed = [
        {"doc_id": "late_" + r["doc_id"], "spans": r["spans"]} for r in second
    ]
    corpus_to_df(spark, renamed).coalesce(1).write.mode("append").parquet(in_dir)
    q2 = streaming.stream_extract(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)

    got2 = spark.read.parquet(out_dir)
    assert got2.count() == len(first) + len(renamed)  # no reprocessing
    want_all = _hashes(spark, extract_spans(corpus_to_df(spark, first + renamed)))
    assert _hashes(spark, got2) == want_all
