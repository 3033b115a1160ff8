"""Hand-computed fixtures for the final-r5 corpus audits
(`lexical_diversity`, `length_drift`) plus their scale-shape plan pins.

Correctness vs DuckDB is covered by tools/selfcheck.py; these tests pin
the MATH on inputs small enough to verify by hand, and the plan
properties that matter at 100 TB (no per-row python; the only
unpartitioned window in length_drift sees the bounded global-bin table,
never the corpus)."""

from __future__ import annotations

from tika_wrap_spark import plans
from tika_wrap_spark import queries_training as qt

_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"


def _docs_dir(spark, tmp_path, rows):
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, (t, lang, src) in enumerate(rows)],
        _SCHEMA,
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


def test_lexical_diversity_hand_computed(spark, tmp_path):
    # source A: "spam spam spam spam" -> counts {spam:4}, n=4,
    #   simpson = 16/16 = 1.0 -> 1000
    # source A: "a b c d" -> 4 singletons, simpson = 4/16 -> 250
    # source B: "x x y" -> {2,1}, simpson = 5/9 -> floor(5000/9)=555
    d = _docs_dir(
        spark,
        tmp_path,
        [
            ("spam spam spam spam", "en", "A"),
            ("a b c d", "en", "A"),
            ("x x y", "en", "B"),
        ],
    )
    got = {
        (r["source"], r["lang"]): r
        for r in qt.q_lexical_diversity(spark, d).collect()
    }
    a = got[("A", "en")]
    assert (a["n_docs"], a["min_simpson_q"], a["max_simpson_q"]) == (2, 250, 1000)
    assert a["mean_simpson_q"] == (250 + 1000) // 2
    b = got[("B", "en")]
    assert (b["n_docs"], b["mean_simpson_q"]) == (1, 555)


def test_lexical_diversity_ignores_whitespace_runs(spark, tmp_path):
    # normalization collapses whitespace: "  a   a  " is two tokens of one
    # type -> simpson 1000, not a phantom empty-token type
    d = _docs_dir(spark, tmp_path, [("  a   a  ", "en", "A")])
    (row,) = qt.q_lexical_diversity(spark, d).collect()
    assert row["mean_simpson_q"] == 1000


def test_length_drift_identical_source_scores_zero(spark, tmp_path):
    # one source IS the global distribution -> KS = 0 at every bin edge
    d = _docs_dir(
        spark,
        tmp_path,
        [("x" * 10, "en", "A"), ("y" * 200, "en", "A"), ("z" * 400, "en", "A")],
    )
    (row,) = qt.q_length_drift(spark, d).collect()
    assert (row["source"], row["n_docs"], row["ks_q"]) == ("A", 3, 0)


def test_length_drift_separated_sources_hand_computed(spark, tmp_path):
    # A: all short (bin 0), B: all long (bin 6). Global CDF at bin 0 is
    # 2/4; A's CDF there is 1.0 -> KS = |1000000 - 500000| = 500000 for
    # both sources (KS is symmetric here: B has 0 vs 500000 at bin 0).
    d = _docs_dir(
        spark,
        tmp_path,
        [
            ("s" * 10, "en", "A"),
            ("s" * 12, "en", "A"),
            ("l" * 400, "en", "B"),
            ("l" * 410, "en", "B"),
        ],
    )
    got = {r["source"]: r["ks_q"] for r in qt.q_length_drift(spark, d).collect()}
    assert got == {"A": 500000, "B": 500000}


def test_length_drift_scale_shape(spark, tmp_path):
    """Scale-shape pins: the corpus is scanned ONCE and reduced to
    (source, bin) grain by a partial-aggregable HashAggregate before any
    window or join; every window input is therefore bounded by the bin
    dimension (max-doc-length/LEN_BIN), never corpus-sized — the
    pack_sequences mid-bucket rule. And the math holds when a source is
    MISSING a bin entirely (the grid fill): A has docs only in bin 0,
    global mass extends to bin 6."""
    sf = "/root/testdata/sf0.001"
    plan = plans.formatted_plan(qt.q_length_drift(spark, sf))
    assert "BatchEvalPython" not in plan
    # one corpus scan; the dimension-grid/cumulative stages reuse the
    # (source, bin) aggregate, never re-reading documents
    assert plan.count("documents.parquet") == 1, plan
    # the corpus-grain reduction is partial+final (map-side combine)
    assert plan.count("HashAggregate") >= 2, plan

    # grid-fill correctness: a bin with zero docs for a source still
    # contributes that source's (flat) CDF to the max-diff
    d = _docs_dir(
        spark,
        tmp_path,
        [
            ("s" * 10, "en", "A"),
            ("m" * 200, "en", "B"),
            ("l" * 400, "en", "B"),
        ],
    )
    got = {r["source"]: r["ks_q"] for r in qt.q_length_drift(spark, d).collect()}
    # global CDF: bin0=1/3, bin3=2/3, bin6=3/3 (millionths: 333333/666666)
    # A (all in bin0): CDF 1.0 everywhere -> max diff at bin0 = 666667
    # B: CDF 0, 1/2, 1 -> diff at bin0 = 333333, bin3 = |500000-666666|
    assert got == {"A": 1000000 - 333333, "B": 333333}


def test_source_divergence_hand_computed(spark, tmp_path):
    # A: "a a a b" -> a:3 b:1, n=4;  B: "b b b b" -> b:4, n=4
    # global: a:3 b:5, N=8 -> q_a=375000, q_b=625000
    # A: p_a=750000 -> (375000^2) div 375001 = 374999
    #    p_b=250000 -> (375000^2) div 625001 = 224999  => chisq 599998
    # B: p_b=1000000 -> (375000^2) div 625001 = 224999
    d = _docs_dir(
        spark, tmp_path, [("a a a b", "en", "A"), ("b b b b", "en", "B")]
    )
    got = {r["source"]: r for r in qt.q_source_divergence(spark, d).collect()}
    a, b = got["A"], got["B"]
    assert (a["n_tokens"], a["n_types"]) == (4, 2)
    assert a["chisq_q"] == 374999 + 224999
    assert (a["top_contrib"], a["top_tok"]) == (374999, "a")
    assert (b["n_tokens"], b["n_types"], b["chisq_q"]) == (4, 1, 224999)
    assert b["top_tok"] == "b"


def test_source_divergence_uniform_mix_scores_zero(spark, tmp_path):
    # both sources share the same distribution -> p == q -> chisq 0
    d = _docs_dir(
        spark, tmp_path, [("w w z", "en", "A"), ("w w z", "en", "B")]
    )
    for r in qt.q_source_divergence(spark, d).collect():
        assert r["chisq_q"] == 0 and r["top_contrib"] == 0


def test_ngram_novelty_hand_computed(spark, tmp_path):
    # ids 0..3, 8 batches -> batch = id*2. doc0 "a b c" (b0: 'a b','b c'),
    # doc1 "a b d" (b2: 'a b','b d'), doc2 "a b" (b4: 'a b'),
    # doc3 "x" (no bigrams -> batch 6 emits no row).
    d = _docs_dir(
        spark,
        tmp_path,
        [("a b c", "en", "A"), ("a b d", "en", "A"), ("a b", "en", "A"), ("x", "en", "A")],
    )
    rows = qt.q_ngram_novelty(spark, d).collect()
    got = {r["batch"]: (r["n_bigrams"], r["n_new_types"], r["new_share_q"]) for r in rows}
    assert got == {0: (2, 2, 1000), 2: (2, 1, 500), 4: (1, 0, 0)}


def test_ngram_novelty_single_token_docs_contribute_nothing(spark, tmp_path):
    # the sequence(1, 0)-is-descending guard: 1-token docs must yield no
    # bigrams, not raise on a negative slice
    d = _docs_dir(spark, tmp_path, [("solo", "en", "A"), ("pair of tokens", "en", "A")])
    rows = qt.q_ngram_novelty(spark, d).collect()
    assert sum(r["n_bigrams"] for r in rows) == 2


def test_new_audit_plans_stay_jvm_side(spark, tmp_path):
    d = _docs_dir(spark, tmp_path, [("a b c d", "en", "A"), ("b c d e", "en", "B")])
    plan = plans.formatted_plan(qt.q_source_divergence(spark, d))
    assert not plans.has_node(plan, "BatchEvalPython"), plan
    assert not plans.has_node(plan, "Window"), plan
    # ngram_novelty deliberately carries exactly TWO windows: the bigram
    # build is posexplode + lead() (a transform(sequence(...)) lambda
    # referencing the token array inlines the regex-normalize chain PER
    # ELEMENT — finding 28, 14 s -> 0.8 s at sf0.1), and first-occurrence
    # is min(batch) OVER the bigram mid-grain (a window BLOCKS the
    # finding-27 aggregate fold that would double the corpus scan). No
    # lambda-built n-grams may reappear here.
    plan = plans.formatted_plan(qt.q_ngram_novelty(spark, d))
    assert not plans.has_node(plan, "BatchEvalPython"), plan
    assert plans.count_node(plan, "Window") == 2, plan
    assert "transform(sequence" not in plan, plan


def test_collocations_hand_computed(spark, tmp_path):
    # "x y x y x y x y": pairs xy=4, yx=3; uni x=4, y=4, total=8
    # lift(x,y) = 1000*4*8 // 16 = 2000 ; lift(y,x) = 1000*3*8 // 16 = 1500
    d = _docs_dir(spark, tmp_path, [("x y x y x y x y", "en", "A")])
    rows = qt.q_collocations(spark, d).collect()
    assert [(r["w1"], r["w2"], r["pair_cnt"], r["lift_milli"]) for r in rows] == [
        ("x", "y", 4, 2000),
        ("y", "x", 3, 1500),
    ]


def test_collocations_min_pair_threshold(spark, tmp_path):
    # every bigram occurs < 3 times -> empty result, not a divide surprise
    d = _docs_dir(spark, tmp_path, [("a b c d e f", "en", "A")])
    assert qt.q_collocations(spark, d).collect() == []


def test_length_gini_hand_computed(spark, tmp_path):
    # source A: two equal docs -> gini 0; source B: lengths 10 and 30 ->
    # grouped formula S = 10*1 + 30*2 = 70, T = 40, N = 2:
    # (1000*(2*70 - 3*40)) // (2*40) = 250 (the true Gini of [10,30])
    d = _docs_dir(
        spark,
        tmp_path,
        [
            ("x" * 10, "en", "A"),
            ("y" * 10, "en", "A"),
            ("x" * 10, "en", "B"),
            ("y" * 30, "en", "B"),
        ],
    )
    got = {r["source"]: r for r in qt.q_length_gini(spark, d).collect()}
    assert (got["A"]["gini_milli"], got["A"]["n_docs"]) == (0, 2)
    assert (got["B"]["gini_milli"], got["B"]["total_chars"]) == (250, 40)


def test_collocation_gini_plans(spark, tmp_path):
    d = _docs_dir(spark, tmp_path, [("a b a b a b", "en", "A")])
    # collocations: finding-28 bigrams (ONE lead window, no lambda
    # n-grams), top-50 as TakeOrderedAndProject, and the two aggregates
    # hang off the SAME windowed subtree so the doc_id Exchange is reused
    # (no finding-27 double corpus scan)
    plan = plans.formatted_plan(qt.q_collocations(spark, d))
    assert not plans.has_node(plan, "BatchEvalPython"), plan
    assert "transform(sequence" not in plan, plan
    assert plans.has_node(plan, "TakeOrderedAndProject"), plan
    # length_gini: the only window runs over the bounded (source, length)
    # mid-grain, never the corpus — exactly one Window node
    plan = plans.formatted_plan(qt.q_length_gini(spark, d))
    assert not plans.has_node(plan, "BatchEvalPython"), plan
    assert plans.count_node(plan, "Window") == 1, plan


def test_token_burstiness_hand_computed(spark, tmp_path):
    # 'a': 60 occurrences all in one of 2 docs -> N*sumsq - T^2 =
    # 2*3600 - 3600 = 3600, vmr = 1000*3600 // (2*60) = 30000 (bursty).
    # 'c': 30 + 30 evenly split -> 2*1800 - 3600 = 0, vmr = 0 (uniform).
    d = _docs_dir(
        spark,
        tmp_path,
        [
            (("a " * 60) + ("c " * 30).strip(), "en", "A"),
            ("c " * 30, "en", "A"),
        ],
    )
    rows = qt.q_token_burstiness(spark, d).collect()
    got = {r["tok"]: (r["total_cnt"], r["n_docs_with"], r["vmr_milli"]) for r in rows}
    assert got["a"] == (60, 1, 30000)
    assert got["c"] == (60, 2, 0)
    assert [r["tok"] for r in rows] == ["a", "c"]  # bursty first


def test_token_burstiness_threshold(spark, tmp_path):
    # tokens below the 50-count threshold never reach the ratio
    d = _docs_dir(spark, tmp_path, [("rare words only", "en", "A")])
    assert qt.q_token_burstiness(spark, d).collect() == []
