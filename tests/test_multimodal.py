"""Multimodal plumbing: the decode/resize/frame/embed kernels are declared
deterministic stubs (no media libs in this sandbox), but the Spark-side
contracts — schemas, Arrow batch shapes, 1:N flatMap, partitioning
invariance — are production-real and pinned here."""

from __future__ import annotations

from pyspark.sql import functions as F

from tika_wrap_spark.corpus import generate_corpus
from tika_wrap_spark.data import corpus_to_df
from tika_wrap_spark.operators.multimodal import (
    decode_media,
    embed_media,
    frame_sample,
    media_payloads,
    resize_media,
)
from tika_wrap_spark.pipeline import extract_in_memory


def _media(spark, n=60, seed=31):
    ext = extract_in_memory(spark, corpus_to_df(spark, generate_corpus(n, seed=seed)))
    return media_payloads(ext)


def test_decode_partitioning_invariant(spark):
    media = _media(spark).cache()
    a = sorted(map(tuple, decode_media(media, num_partitions=2).collect()))
    b = sorted(map(tuple, decode_media(media, num_partitions=7).collect()))
    assert a == b and len(a) > 0


def test_embed_media_shape_and_determinism(spark):
    media = _media(spark).cache()
    out = embed_media(media, dim=16)
    rows = out.collect()
    assert len(rows) == media.count()
    for r in rows:
        assert len(r["embedding"]) == 16
        assert all(-1.0 <= x < 1.0 for x in r["embedding"])
    again = {r["media_ref"]: r["embedding"] for r in embed_media(media, dim=16).collect()}
    assert {r["media_ref"]: r["embedding"] for r in rows} == again


def test_embed_feeds_similarity_ops(spark):
    from tika_wrap_spark.operators import similarity as sim

    media = _media(spark)
    b = sim.lsh_bucket(embed_media(media), n_planes=4)
    rows = b.select("media_ref", "bucket").collect()
    assert len(rows) > 0
    assert all(len(r["bucket"]) == 4 and set(r["bucket"]) <= {"0", "1"} for r in rows)


def test_resize_and_frames_shapes(spark):
    media = _media(spark).cache()
    n = media.count()
    r = resize_media(media, 224, 224)
    assert r.count() == n
    assert r.filter((F.col("out_width") != 224) | (F.col("out_height") != 224)).count() == 0
    fr = frame_sample(media)
    # 1:N flatMap: at least one frame per media item, frame_idx dense ints
    per = fr.groupBy("media_ref").agg(F.count("*").alias("k"), F.min("frame_idx").alias("lo"))
    assert per.filter("k < 1 or lo != 0").count() == 0
