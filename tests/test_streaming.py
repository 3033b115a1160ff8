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


def test_windowed_metrics_stream_equals_batch(spark, tmp_path):
    """Watermarked tumbling-window agg over the event stream: the drained
    stream (complete mode) must equal the same expression run in batch."""
    import shutil

    from pyspark.sql import functions as F

    in_dir = str(tmp_path / "ev")
    (tmp_path / "ev").mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", in_dir + "/events.parquet")

    ev = streaming.read_events_stream(spark, in_dir)
    q = (
        streaming.windowed_event_metrics(ev)
        .writeStream.format("memory")
        .queryName("win_metrics")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r) for r in spark.table("win_metrics").collect()
    }
    batch = streaming.windowed_event_metrics(
        spark.read.parquet(in_dir)
    )
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_stream_dedup_suppresses_redelivery(spark, tmp_path):
    """dropDuplicatesWithinWatermark: the same file delivered twice (two
    micro-batches — the at-least-once redelivery case) must emit every
    event exactly once; state stays bounded by the watermark."""
    in_dir = str(tmp_path / "evd")
    (tmp_path / "evd").mkdir()
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").filter(
        "event_id < 100"
    )
    ev.coalesce(1).write.mode("append").parquet(in_dir)
    ev.coalesce(1).write.mode("append").parquet(in_dir)  # duplicate delivery

    stream = streaming.read_events_stream(spark, in_dir, max_files_per_trigger=1)
    q = (
        streaming.stream_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_ev")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [r["event_id"] for r in spark.table("dedup_ev").select("event_id").collect()]
    assert sorted(got) == sorted({r["event_id"] for r in ev.collect()})
    # batch degradation: same callable, dropDuplicates semantics
    both = ev.union(ev)
    assert streaming.stream_dedup(both).count() == ev.count()


def test_stateful_user_counts_across_microbatches(spark, tmp_path):
    """applyInPandasWithState: state must carry across micro-batches —
    with maxFilesPerTrigger=1 and two input files, the LAST update per
    user equals the batch per-user count."""
    from pyspark.sql import functions as F

    in_dir = str(tmp_path / "ev2")
    (tmp_path / "ev2").mkdir()
    ev_all = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # two separate files -> two micro-batches
    ev_all.filter("event_id % 2 = 0").coalesce(1).write.mode("append").parquet(in_dir)
    ev_all.filter("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(in_dir)

    stream = streaming.read_events_stream(spark, in_dir, max_files_per_trigger=1)
    q = (
        streaming.stateful_user_counts(stream)
        .writeStream.format("memory")
        .queryName("user_counts")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    updates = spark.table("user_counts").collect()
    assert len(updates) > 0
    # last update per user (max running count) == batch count
    got = {}
    for r in updates:
        got[r["user_id"]] = max(got.get(r["user_id"], 0), r["n_events"])
    want = {
        r["user_id"]: r["n"]
        for r in ev_all.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_stream_shard_export_exactly_once_under_redelivery(spark, tmp_path):
    """stream_shard_export: shard=<k>/batch=<epoch> dynamic-partition
    overwrite makes a redelivered epoch idempotent — simulating the crash
    window by re-invoking the same batch writer with the same epoch id
    must leave the store byte-identical; a different epoch appends."""
    from pyspark.sql import functions as F

    from tika_wrap_spark.operators.curation import shard_assign

    out = str(tmp_path / "shards")

    def write_batch(df, epoch_id):
        o = shard_assign(df, 4).withColumn(
            "batch", F.lit(int(epoch_id)).cast("long")
        )
        (
            o.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("shard", "batch")
            .parquet(out)
        )

    docs = spark.range(0, 200).select(
        F.concat(F.lit("doc_"), F.col("id")).alias("doc_id"),
        (F.col("id") * 7).alias("n_toks"),
    )
    write_batch(docs, 0)
    first = {(r["doc_id"], r["shard"], r["batch"]) for r in spark.read.parquet(out).collect()}
    assert len(first) == 200
    # redelivery of epoch 0 (same data): store unchanged
    write_batch(docs, 0)
    again = {(r["doc_id"], r["shard"], r["batch"]) for r in spark.read.parquet(out).collect()}
    assert again == first
    # epoch 1 with new docs: appends, epoch 0 intact
    docs2 = spark.range(200, 300).select(
        F.concat(F.lit("doc_"), F.col("id")).alias("doc_id"),
        (F.col("id") * 7).alias("n_toks"),
    )
    write_batch(docs2, 1)
    allrows = spark.read.parquet(out).collect()
    assert len(allrows) == 300
    assert {r["batch"] for r in allrows} == {0, 1}
    # the streaming wrapper drives the same writer through a real stream
    import tika_wrap_spark.streaming as streaming

    src = str(tmp_path / "src")
    docs.write.json(src)
    stream = (
        spark.readStream.schema("doc_id string, n_toks long").json(src)
    )
    q = streaming.stream_shard_export(
        stream, str(tmp_path / "s2"), str(tmp_path / "ckpt"), n_shards=4
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "s2"))
    assert got.count() == 200
    assert got.select("shard").distinct().count() == 4
