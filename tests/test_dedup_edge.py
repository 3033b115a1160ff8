"""Edge cases for the dedup family: documents shorter than the k-gram /
window sizes must produce EMPTY fingerprint sets (DuckDB generate_series
semantics), never spurious grams or a slice() crash.

Regression for the Spark `sequence(1, 0) == [1, 0]` descending-sequence
pitfall (ADVICE r1, high): slice(grams, 0, w) raises
INVALID_PARAMETER_VALUE.START and used to abort the whole winnow_fp job.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from tika_wrap_spark.operators import dedup as dd


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


SHORT_TEXTS = [
    "",  # empty
    "a",  # < k
    "abcdefg",  # k-1 chars
    "abcdefgh",  # exactly k -> 1 gram, < w grams
    "abcdefghij",  # k+2 chars -> 3 grams, still < w
    "abcdefghijk",  # 4 grams == w -> exactly one window
    "a much longer document with plenty of characters to fingerprint",
]


def test_winnow_short_docs_no_crash_and_duckdb_equal(spark):
    df = _docs(spark, SHORT_TEXTS)
    out = dd.winnow_fingerprints(df, k=8, w=4)
    got = sorted((r["doc_id"], r["fp"]) for r in out.collect())

    # same fixture through the DuckDB oracle arithmetic
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": range(len(SHORT_TEXTS)), "text": SHORT_TEXTS}))
    want = sorted(
        map(
            tuple,
            con.execute(
                """
WITH n AS (
  SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm
  FROM documents
), g AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(length(norm) - 7, 0)),
                        i -> md5(substr(norm, i, 8))) AS grams
  FROM n
), w AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(len(grams) - 3, 0)),
                        i -> list_aggregate(grams[i : i + 3], 'min')) AS wins
  FROM g
)
SELECT DISTINCT doc_id, unnest(wins) AS fp FROM w
"""
            ).fetchall(),
        )
    )
    assert got == want
    # docs with < k+w-1 = 11 normalized chars contribute nothing
    short_ids = {i for i, t in enumerate(SHORT_TEXTS) if len(t) < 11}
    assert short_ids.isdisjoint({d for d, _ in got})


def test_doc_ngrams_short_docs_empty(spark):
    df = _docs(spark, ["", "one", "one two", "one two three"])
    got = sorted((r["doc_id"], r["gram"]) for r in dd.doc_ngrams(df, n=2).collect())
    assert got == [(2, "one two"), (3, "one two"), (3, "two three")]


def test_ngram_jaccard_stop_shingle_bounded(spark, tmp_path):
    """A shingle shared by every document must NOT turn the self-join
    quadratic: with the document-frequency cap, candidate pairs stay O(docs)
    — here the only surviving pair is the one sharing RARE shingles."""
    from tika_wrap_spark.queries_training import q_ngram_jaccard

    n = 80
    texts = []
    for i in range(n):
        # every doc shares these 4 words (3 hot 2-grams, df = 80 >> cap)
        t = "every single doc shares unique%d tail%d words%d" % (i, i, i)
        texts.append(t)
    # docs 0 and 1 additionally share a rare 3-word tail (2 rare 2-grams)
    texts[0] += " rare shared ending"
    texts[1] += " rare shared ending"
    pdf = pd.DataFrame(
        {
            "doc_id": range(n),
            "text": texts,
            "source": ["srcA"] * n,
        }
    )
    d = str(tmp_path)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(pdf), d + "/documents.parquet")
    out = q_ngram_jaccard(spark, d).collect()
    # without the cap this corpus yields ~n^2/2 pairs (3 hot shared grams
    # each); with it, only the rare-gram pair survives
    assert [(r["doc_a"], r["doc_b"], r["inter"]) for r in out] == [(0, 1, 2)]


def test_norm_text_column_path_matches_template(spark):
    from pyspark.sql import functions as F

    from tika_wrap_spark import functions as tw

    df = _docs(spark, ["  Mixed   CASE\ttext  ", "", "ünïcode  \n ok"])
    a = df.select(tw.norm_text(F.col("text")).alias("n"))
    b = df.select(F.expr(tw.NORM_EXPR).alias("n"))
    assert [r["n"] for r in a.collect()] == [r["n"] for r in b.collect()]


def test_multi_table_lsh_raises_recall(spark):
    """The L-table ANN path must measurably beat one table: a true neighbor
    only needs to collide in ONE of the L tables (sf0.001 measured:
    5/30 single -> 14/30 multi)."""
    from pyspark.sql import functions as F

    from tika_wrap_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 3)
    exact = sim.brute_force_topk(emb, qs, k=10).select("query_id", "cand_id")
    single = sim.lsh_topk(emb, qs, k=10, n_planes=8).select("query_id", "cand_id")
    multi = sim.lsh_topk_multi(emb, qs, k=10, n_planes=4, n_tables=8).select(
        "query_id", "cand_id"
    )
    hs = exact.join(single, ["query_id", "cand_id"], "left_semi").count()
    hm = exact.join(multi, ["query_id", "cand_id"], "left_semi").count()
    assert hm > hs, (hm, hs)
    assert hm >= 14  # deterministic planes: exact value pinned loosely


def test_simhash_pairs_pigeonhole_complete(spark):
    """Banding must lose NO pair within the hamming budget: compare the
    banded bucket-join against an all-pairs check on a small doc set."""
    from pyspark.sql import functions as F

    from tika_wrap_spark.operators import dedup as dd

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 120
    )
    sigs = dd.simhash_16(dd.doc_tokens(docs))
    banded = {
        (r["doc_a"], r["doc_b"])
        for r in dd.simhash_pairs(sigs, 4, 4, 3).collect()
    }
    rows = sigs.collect()
    brute = {
        (a["doc_id"], b["doc_id"])
        for a in rows
        for b in rows
        if a["doc_id"] < b["doc_id"]
        and bin(a["simhash"] ^ b["simhash"]).count("1") <= 3
    }
    assert banded == brute


def test_connected_components_chain_and_islands(spark):
    """Min-label propagation: a 4-node chain (needs >1 round to converge),
    a triangle, and an isolated pair each collapse to their min id."""
    edges = spark.createDataFrame(
        [(3, 4), (4, 5), (5, 6),      # chain 3-4-5-6
         (10, 11), (11, 12), (10, 12),  # triangle
         (20, 21)],                   # pair
        "doc_a long, doc_b long",
    )
    got = {
        (r["doc_id"], r["cluster"])
        for r in dd.connected_components(edges).collect()
    }
    want = {(3, 3), (4, 3), (5, 3), (6, 3),
            (10, 10), (11, 10), (12, 10),
            (20, 20), (21, 20)}
    assert got == want


def test_connected_components_long_chain_string_ids(spark):
    """Diameter-19 path graph with STRING node ids: needs ~19 propagation
    rounds (past the old max_iter=12, across 19 per-round eager
    localCheckpoints), min label must still reach the far end, and string
    ids must work (the convergence check is a changed-count, not a label
    sum — no ANSI long-sum overflow, no numeric-id requirement)."""
    n = 20
    ids = ["n%02d" % i for i in range(n)]
    edges = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(n - 1)], "doc_a string, doc_b string"
    )
    got = {
        (r["doc_id"], r["cluster"])
        for r in dd.connected_components(edges).collect()
    }
    assert got == {(i, "n00") for i in ids}


def test_ivf_topk_prunes_and_beats_lsh_recall(spark):
    """IVF-Flat: probing nprobe/n_cells of the corpus must (a) actually
    prune (candidates << corpus), (b) reach recall >= the multi-table LSH
    path on the same corpus (measured 24/30 vs 17/30 at sf0.01), and
    (c) be deterministic across runs."""
    from pyspark.sql import functions as F

    from tika_wrap_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 3)
    exact = {(r["query_id"], r["cand_id"]) for r in sim.brute_force_topk(emb, qs, k=10).collect()}
    ivf1 = {(r["query_id"], r["cand_id"]) for r in sim.ivf_topk(emb, qs, k=10, n_cells=16, nprobe=4).collect()}
    ivf2 = {(r["query_id"], r["cand_id"]) for r in sim.ivf_topk(emb, qs, k=10, n_cells=16, nprobe=4).collect()}
    assert ivf1 == ivf2  # deterministic index build + probe
    lsh = {
        (r["query_id"], r["cand_id"])
        for r in sim.lsh_topk_multi(emb, qs, k=10, n_planes=4, n_tables=8).collect()
    }
    assert len(exact & ivf1) >= len(exact & lsh)
    assert len(exact & ivf1) >= 20  # measured 24/30; margin for corpus drift
    # pruning is real: every cell holds < 1/4 of the corpus, so nprobe=4
    # probes well under half of it
    embq = sim.with_quantized(emb)
    cents = sim.ivf_centroids(embq, 16)
    asn = sim._nearest_cells(embq.select("vec_id", "eq", "nq"), cents, "vec_id", 1)
    n = emb.count()
    biggest = max(r["count"] for r in asn.groupBy("cell").count().collect())
    assert biggest < n / 4


def test_repetition_linear_on_giant_doc(spark):
    """max-token-share must be linear in document size: a 60k-token doc with
    30k DISTINCT tokens (the old per-row O(distinct x tokens) fold would do
    ~1.8e9 interpreted array ops — minutes for ONE row) completes fast and
    exactly. Plan shape: explode + two hash aggregates, no array fold."""
    from tika_wrap_spark.operators.text_analysis import repetition_features

    # 30k distinct tokens, each appearing twice, plus one token 7 times
    toks = ["t%05d" % i for i in range(30_000)] * 2 + ["hot"] * 7
    giant = " ".join(toks)
    df = spark.createDataFrame(
        [("giant", giant), ("tiny", "a b a\na b a"), ("empty", " ")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_features(df).collect()}
    assert got["giant"]["n_toks"] == 60_007
    assert got["giant"]["max_tok_cnt"] == 7
    assert got["giant"]["max_tok_share_q"] == 1000 * 7 // 60_007
    assert got["tiny"]["n_lines"] == 2 and got["tiny"]["n_uniq_lines"] == 1
    assert got["tiny"]["dup_line_q"] == 500
    assert got["tiny"]["max_tok_cnt"] == 4  # 'a' appears 4x across lines
    assert got["empty"]["n_toks"] == 0 and got["empty"]["max_tok_cnt"] == 0


def test_semantic_dedup_drops_planted_near_dup(spark):
    """SemDeDup: a vector nearly identical to a smaller-id one is dropped;
    orthogonal vectors all keep; output covers every input exactly once."""
    from tika_wrap_spark.operators.similarity import semantic_dedup

    dim = 8
    rows = []
    for i in range(20):  # a spread-out base set (axis-ish vectors)
        v = [0.0] * dim
        v[i % dim] = 1.0
        v[(i * 3 + 1) % dim] = 0.2 + 0.01 * i
        rows.append((i, v))
    clone = list(rows[5][1])
    clone[0] += 1e-4  # quantizes identically at floor(x*1000)
    rows.append((100, clone))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r for r in semantic_dedup(df, n_cells=4).collect()}
    assert len(got) == 21  # one audit row per input vector
    assert got[100]["keep"] is False and got[100]["n_close"] >= 1
    assert got[5]["keep"] is True  # the smaller-id twin survives
    assert sum(0 if r["keep"] else 1 for r in got.values()) >= 1


def test_substring_dup_ratio_planted_overlap(spark):
    """A verbatim-shared long span marks both carriers (dup_share_q > 0);
    an all-unique doc scores 0; counts match a python winnow replica for
    the fully-duplicated pair."""
    from tika_wrap_spark.operators.dedup import substring_dup_ratio

    shared = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, shared),
        (1, shared),  # exact copy: every window duplicated
        (2, "zxqv wmpl krtn bdfg hjkl qwer uiop asdf"),  # unique gibberish
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in substring_dup_ratio(df).collect()}
    assert got[0]["dup_share_q"] == 1000 and got[1]["dup_share_q"] == 1000
    assert got[0]["n_fp"] == got[1]["n_fp"] == got[0]["n_dup_fp"]
    assert got[2]["dup_share_q"] == 0 and got[2]["n_dup_fp"] == 0


def test_chunk_dedup_first_occurrence_semantics(spark):
    """C4-style chunk dedup: the globally first occurrence (min doc_id,
    then min chunk_idx) is the keeper; exact-copy docs lose every chunk;
    a doc repeating its own first chunk loses the repeat; empty and
    chunk-unique docs survive intact and still emit a row."""
    w = dd.CHUNK_W
    eight = "a1 a2 a3 a4 a5 a6 a7 a8"           # one full chunk
    other = "b1 b2 b3 b4 b5 b6 b7 b8"
    rows = [
        (0, eight + " " + other),                # keeper of both chunks
        (1, eight + " " + other),                # exact copy: all dup
        (2, eight),                              # chunk already seen in doc 0
        (3, "c1 c2 c3 c4 c5 c6 c7 c8 c1 c2 c3 c4 c5 c6 c7 c8"),  # self-repeat: 2nd chunk dup
        (4, ""),                                 # empty: zero chunks, row kept
        (5, "u1 u2 u3"),                         # unique short tail chunk
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dd.chunk_dedup_stats(df, w=w).collect()}
    assert len(got) == 6
    assert got[0]["n_chunks"] == 2 and got[0]["n_dup_chunks"] == 0
    assert got[1]["n_dup_chunks"] == 2 and got[1]["kept_toks"] == 0
    assert got[1]["dup_q"] == 1000
    assert got[2]["n_dup_chunks"] == 1 and got[2]["dup_toks"] == w
    assert got[3]["n_chunks"] == 2 and got[3]["n_dup_chunks"] == 1
    assert got[3]["kept_toks"] == w
    assert got[4]["n_toks"] == 0 and got[4]["n_chunks"] == 0
    assert got[4]["dup_q"] == 0
    assert got[5]["n_chunks"] == 1 and got[5]["n_dup_chunks"] == 0
    assert got[5]["kept_toks"] == 3  # short tail chunk_len = n_toks mod w


def test_pq_adc_self_hit_and_recall(spark):
    """PQ-ADC sanity: every query finds ITSELF at rank 1 (its codes match
    its own LUT row exactly, so its ADC distance is the global minimum),
    the exact side of the agreement record is truly 0 there, and recall
    vs exact L2 top-10 beats the multi-table LSH path on the same corpus
    (measured 19/30 vs 17/30 at sf0.01 with M=32, K=16)."""
    from pyspark.sql import functions as F

    from tika_wrap_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 3)
    rows = sim.pq_adc_topk(emb, qs, k=10).collect()
    self_rows = {r["query_id"]: r for r in rows if r["query_id"] == r["cand_id"]}
    assert set(self_rows) == {0, 1, 2}
    for q, r in self_rows.items():
        assert r["rank"] == 1 and r["exact_l2"] == 0

    eq = {r["vec_id"]: r["eq"] for r in sim.with_quantized(emb).collect()}

    def l2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    hits = 0
    for q in range(3):
        exact = set(sorted(eq, key=lambda c: (l2(eq[q], eq[c]), c))[:10])
        hits += len(exact & {r["cand_id"] for r in rows if r["query_id"] == q})
    assert hits >= 18  # measured 19/30; leave 1 headroom, still > LSH's 17


def test_shingle_containment_flags_embedded_doc(spark):
    """A short doc quoted verbatim inside a long one: containment of the
    smaller side hits 1000 while Jaccard stays low -> subset_like fires;
    an unrelated doc pair produces no candidate at all."""
    import tika_wrap_spark.queries_training as qt
    from tika_wrap_spark.operators import dedup as dd
    from pyspark.sql import functions as F

    short = "alpha beta gamma delta epsilon zeta"
    long_doc = short + " " + " ".join("filler%d word%d" % (i, i) for i in range(40))
    rows = [
        (0, short, "en", "s", 0),
        (1, long_doc, "en", "s", 0),
        (2, "unrelated totally different content here", "en", "s", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    # replicate the query body on a local frame (q_* reads the sf tables)
    grams0 = dd.doc_ngrams(df, n=2).join(df.select("doc_id", "source"), "doc_id")
    g = grams0.select("doc_id", "source", "gram")
    sizes = g.groupBy("doc_id").agg(F.count("*").alias("sz"))
    pairs = (
        g.alias("a")
        .join(
            g.alias("b"),
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        pairs.join(sizes.alias("za"), F.col("doc_a") == F.col("za.doc_id"))
        .join(sizes.alias("zb"), F.col("doc_b") == F.col("zb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.expr("(1000 * inter) div least(za.sz, zb.sz)").alias("cont_q"),
            F.floor(
                F.lit(1000) * F.col("inter")
                / (F.col("za.sz") + F.col("zb.sz") - F.col("inter"))
            ).alias("j_q"),
        )
        .collect()
    )
    got = {(r["doc_a"], r["doc_b"]): r for r in out}
    assert (0, 1) in got
    r = got[(0, 1)]
    assert r["cont_q"] == 1000  # every short-doc shingle appears in the long doc
    assert r["j_q"] < qt.CONTAIN_LOW_J_Q  # symmetric Jaccard misses it
    assert not any(2 in k for k in got)  # unrelated doc never pairs


def test_lsh_giant_bucket_star_edges_linear(spark):
    """The web-scale killer, planted: 1,000 near-identical docs land in ONE
    band bucket per band. The pair clique would be 4 * 1000*999/2 join rows
    (~2M); star edges must emit exactly 999 (O(m)), the capped pair join
    must emit ZERO pairs from the giant bucket while SURFACING the drop,
    and connected components over the star edges still recover the single
    1,000-member cluster."""
    from pyspark.sql import functions as F

    n = 1000
    rows = [(i, "the exact same template text repeated verbatim") for i in range(n)]
    rows += [(n + j, "totally unrelated document %d with words %d" % (j, j)) for j in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = dd.doc_tokens(df)
    sigs = dd.minhash_signatures(toks, 16)

    # star edges: exactly m-1 per component, hub = min doc_id
    edges = dd.lsh_star_edges(sigs, 16, 4)
    got = edges.collect()
    giant = [r for r in got if r["doc_a"] == 0]
    assert len(giant) == n - 1
    assert {r["doc_b"] for r in giant} == set(range(1, n))
    assert all(r["n_shared_bands"] == 4 for r in giant)  # identical sigs: all bands
    # the 5 unrelated docs may star among themselves but never into the giant
    assert all(r["doc_a"] >= n or r["doc_b"] >= n for r in got if r["doc_a"] != 0)

    # capped pair join: giant bucket dropped, drop surfaced, never silent
    pairs = dd.lsh_candidate_pairs(sigs, 16, 4, max_bucket=64)
    assert pairs.filter(F.col("doc_a") < n).filter(F.col("doc_b") < n).count() == 0
    stats = dd.bucket_drop_stats(dd.lsh_bands(sigs, 16, 4), 64).collect()[0]
    assert stats["dropped_buckets"] == 4  # one giant bucket per band
    assert stats["dropped_pairs"] == 4 * n * (n - 1) // 2

    # CC over star edges: one cluster holding all n docs, keeper = 0
    cc = {r["doc_id"]: r["cluster"] for r in dd.connected_components(edges.select("doc_a", "doc_b")).collect()}
    assert all(cc[i] == 0 for i in range(n))


def test_lsh_capped_equals_uncapped_under_cap(spark):
    """With every bucket under the cap, the capped pair join is IDENTICAL
    to the uncapped one (the cap only ever removes over-cap buckets)."""
    df = spark.createDataFrame(
        [(i, "doc %d shares some words %d" % (i, i % 3)) for i in range(30)],
        "doc_id long, text string",
    )
    sigs = dd.minhash_signatures(dd.doc_tokens(df), 16)
    a = {(r["doc_a"], r["doc_b"], r["n_shared_bands"]) for r in dd.lsh_candidate_pairs(sigs, 16, 4).collect()}
    b = {(r["doc_a"], r["doc_b"], r["n_shared_bands"]) for r in dd.lsh_candidate_pairs(sigs, 16, 4, max_bucket=64).collect()}
    assert a == b
    stats = dd.bucket_drop_stats(dd.lsh_bands(sigs, 16, 4), 64).collect()[0]
    assert stats["dropped_buckets"] == 0 and stats["dropped_pairs"] == 0


def test_brute_force_topk_rejects_corpus_sized_query_side(spark):
    """brute_force_topk is the broadcast exact baseline: it must refuse a
    query side beyond BRUTE_FORCE_MAX_QUERIES instead of silently building
    a |corpus|*|queries| nested-loop join."""
    import pytest
    from pyspark.sql import functions as F
    from tika_wrap_spark.operators import similarity as sim

    emb = spark.range(20).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") + i).cast("float") for i in range(4)]).alias("embedding"),
    )
    old = sim.BRUTE_FORCE_MAX_QUERIES
    sim.BRUTE_FORCE_MAX_QUERIES = 5
    try:
        with pytest.raises(ValueError, match="BRUTE_FORCE_MAX_QUERIES"):
            sim.brute_force_topk(emb, emb, k=3)
        assert sim.brute_force_topk(emb, emb.limit(5), k=3).count() == 15
    finally:
        sim.BRUTE_FORCE_MAX_QUERIES = old
