"""Unit tests for the r3 text-analysis additions: integer-exact tf-idf
top-k, PII scrubbing, and the engine-exact HLL sketch building blocks.
(The full oracle comparison runs via tools/selfcheck.py / the driver.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tika_wrap_spark.operators import text_analysis as ta


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_topk_ranks_rare_terms_above_common(spark):
    rows = [
        (1, "alpha alpha alpha common common"),
        (2, "bravo bravo common common"),
        (3, "charlie common common"),
    ]
    out = ta.tfidf_topk(_docs(spark, rows)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # every doc's top term is its unique word (df=1 beats df=3 'common')
    tops = {d: rs[0]["term"] for d, rs in ((d, sorted(rs, key=lambda r: r["rnk"])) for d, rs in by_doc.items())}
    assert tops == {1: "alpha", 2: "bravo", 3: "charlie"}
    # score arithmetic is the documented integers: tf * ((SCALE * N) div df)
    a = next(r for r in out if r["doc_id"] == 1 and r["term"] == "alpha")
    assert a["score_q"] == 3 * ((ta.TFIDF_IDF_SCALE * 3) // 1)
    c = next(r for r in out if r["doc_id"] == 1 and r["term"] == "common")
    assert c["score_q"] == 2 * ((ta.TFIDF_IDF_SCALE * 3) // 3)
    # short tokens are never terms
    assert not [r for r in out if len(r["term"]) < ta.TFIDF_MIN_TERM_LEN]


def test_tfidf_topk_bounds_rows_per_doc(spark):
    rows = [(i, "alpha bravo charlie delta echo foxtrot") for i in range(5)]
    out = ta.tfidf_topk(_docs(spark, rows))
    per = out.groupBy("doc_id").count().collect()
    assert all(r["count"] <= ta.TFIDF_TOPK for r in per) and len(per) == 5


def test_scrub_pii_redacts_and_counts(spark):
    rows = [
        (1, "mail bob.smith+x@corp.example.org and ip 192.168.0.1 tel 555-123-4567"),
        (2, "no pii at all here"),
        (3, "two mails a@b.io c@d.net and 10.0.0.7"),
    ]
    got = {r["doc_id"]: r for r in ta.scrub_pii(_docs(spark, rows)).collect()}
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"]) == (1, 1, 1)
    assert (got[2]["n_email"], got[2]["n_ipv4"], got[2]["n_phone"]) == (0, 0, 0)
    assert (got[3]["n_email"], got[3]["n_ipv4"]) == (2, 1)
    # the scrubbed text carries placeholders, never the original PII
    red = (
        ta.scrub_pii(_docs(spark, rows))
        .join(_docs(spark, rows), "doc_id")
        .select(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace("text", ta.PII_EMAIL, "<EMAIL>"),
                    ta.PII_IPV4, "<IP>"),
                ta.PII_PHONE, "<PHONE>").alias("r")
        )
        .collect()
    )
    joined = " ".join(r["r"] for r in red)
    assert "<EMAIL>" in joined and "<IP>" in joined and "<PHONE>" in joined
    assert "bob.smith" not in joined and "192.168.0.1" not in joined


def test_hll_register_math_matches_python():
    """The hex->register/rho decomposition used by q_sketch_hll, re-derived
    bit-for-bit in plain python over real md5 values."""
    import hashlib

    from tika_wrap_spark.queries import HLL_M, HLL_RHO_CAP, _HLL_NIBBLE_LZ

    for uid in range(200):
        h = hashlib.md5(str(uid).encode()).hexdigest()
        # python ground truth: 6-bit register from first byte, rho from
        # the leading-zero-bit run of the next 48 bits
        reg = int(h[:2], 16) % HLL_M
        suffix = int(h[2:14], 16)
        rho = min(49 if suffix == 0 else 48 - suffix.bit_length() + 1, HLL_RHO_CAP)
        # the expression-form decomposition (mirrors the Spark/DuckDB SQL)
        stripped = h[2:14].lstrip("0")
        zeros = 12 - len(stripped)
        extra = _HLL_NIBBLE_LZ.get(stripped[:1], 0)
        rho_expr = min(zeros * 4 + extra + 1, HLL_RHO_CAP)
        assert rho_expr == rho, (h, rho_expr, rho)
        assert 0 <= reg < HLL_M


def test_cms_overestimates_never_underestimate(spark):
    """CMS point-query invariant: est >= exact always (min over rows of
    non-negative collision sums); the undisputed top token estimates
    exactly when its buckets are collision-dominant anyway."""
    from tika_wrap_spark.operators.text_analysis import cms_heavy_hitters

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = cms_heavy_hitters(docs).collect()
    assert len(rows) == 20
    assert all(r["overest"] >= 0 for r in rows)
    assert all(r["cms_est"] == r["exact_n"] + r["overest"] for r in rows)
    # top-k is ordered-set deterministic: re-run bit-identical
    again = cms_heavy_hitters(docs).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_token_rarity_orders_gibberish_above_boilerplate(spark):
    """A doc of unique tokens scores RARITY_SCALE mean; a doc repeating a
    corpus-wide token scores the corpus-frequency reciprocal."""
    from tika_wrap_spark.operators.text_analysis import RARITY_SCALE, token_rarity

    rows = [(0, "zzqx vvwp kkjh"), (1, "common common common"), (2, "common word")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in token_rarity(df).collect()}
    assert got[0]["rarity_mean_q"] == RARITY_SCALE  # every token unique
    # 'common' occurs 4x corpus-wide
    assert got[1]["rarity_mean_q"] == RARITY_SCALE // 4
    assert got[2]["rarity_sum"] == RARITY_SCALE // 4 + RARITY_SCALE
    assert got[0]["rarity_mean_q"] > got[2]["rarity_mean_q"] > got[1]["rarity_mean_q"]


def test_quality_classifier_separates_planted_docs(spark):
    """High-stopword prose keeps; punctuation soup and stubs drop; logit
    arithmetic matches the hand computation."""
    from tika_wrap_spark.operators.text_analysis import (
        QC_BIAS,
        QC_W_PUNCT,
        QC_W_STOP,
        quality_classifier,
    )

    prose = "the cat sat on the mat and the dog lay in the sun " * 5
    soup = "@#$% ^&*! ~~~ ))) ((( " * 20
    rows = [(0, prose), (1, soup), (2, "tiny doc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in quality_classifier(df).collect()}
    assert got[0]["keep"] is True and got[1]["keep"] is False
    assert got[2]["keep"] is False  # short + no stopword mass
    for r in got.values():
        want = (
            QC_W_STOP * r["stop_ratio_q"]
            + QC_W_PUNCT * r["punct_ratio_q"]
            + r["len_feat"]
            + QC_BIAS
        )
        assert r["logit_q"] == want and r["keep"] == (want >= 0)


@pytest.mark.parametrize("rounds", [3, 8])
def test_bpe_train_matches_python_replica(spark, rounds):
    """The learned merges equal a pure-python BPE replica (Sennrich-style
    vocab pair counting, leftmost non-overlapping merge, count-desc /
    pair-asc tie-break) on the classic low/lower/newest/widest corpus.
    rounds=8 crosses the BPE_CHECKPOINT_EVERY=4 boundary, proving the
    mid-loop localCheckpoint (finding-15 discipline) changes nothing."""
    from collections import Counter

    from tika_wrap_spark.operators.text_analysis import bpe_train

    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    text = " ".join(words)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")

    vocab = Counter(words)
    seqs = {w: list(w) for w in vocab}
    want = []
    for r in range(rounds):
        pc = Counter()
        for w, syms in seqs.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += vocab[w]
        # engine tie-break: count desc, then the FENCED pair string asc
        # ("|a|  |b|"), identical in Spark and the DuckDB oracle
        (a, b), n = min(
            pc.items(), key=lambda kv: (-kv[1], "|%s|  |%s|" % kv[0])
        )
        want.append((r, a, b, a + b, n))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out

    got = [
        (r["round"], r["left_sym"], r["right_sym"], r["merged"], r["pair_n"])
        for r in bpe_train(df, rounds=rounds).orderBy("round").collect()
    ]
    assert got == want, (got, want)


def test_lm_perplexity_scores_oov_and_replicates_python(spark):
    """CCNet-style bigram LM filter: a held-out doc made of bigrams the
    train split repeats constantly scores low surprisal and keeps; a
    held-out gibberish doc of never-seen bigrams costs pure OOV and drops.
    Arithmetic pinned against a python replica of the integer surrogate."""
    from collections import Counter

    from tika_wrap_spark.operators.text_analysis import (
        LM_OOV_SURPRISAL,
        LM_SCALE,
        lm_perplexity,
    )

    # md5('lm:'+id) coin: ids 11/18 land in the SCORE split, the rest train
    train_text = "the cat sat on the mat " * 3
    rows = [(i, train_text) for i in range(60) if i not in (11, 18, 25)]
    rows.append((11, "the cat sat on the mat"))  # all bigrams seen
    rows.append((18, "zzq qqx xxv vvk kkp"))  # pure gibberish: all OOV
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in lm_perplexity(df, keep_max_mean=10_000).collect()}
    assert set(got) >= {11, 18}
    # python replica over the train split
    toks = train_text.strip().split()
    c2: Counter = Counter()
    c1: Counter = Counter()
    for a, b in zip(toks, toks[1:]):
        c2[(a, b)] += 1
        c1[a] += 1
    n_train = len([r for r in rows if r[0] not in (11, 18)])
    stoks = "the cat sat on the mat".split()
    want_sum = sum(
        (LM_SCALE * c1[a] * n_train) // (c2[(a, b)] * n_train)
        for a, b in zip(stoks, stoks[1:])
    )
    r11 = got[11]
    assert r11["n_bigrams"] == 5
    assert r11["surprisal_sum"] == want_sum, (r11["surprisal_sum"], want_sum)
    assert r11["keep"] is True
    r18 = got[18]
    assert r18["n_bigrams"] == 4
    assert r18["surprisal_sum"] == 4 * LM_OOV_SURPRISAL
    assert r18["keep"] is False


def test_bpe_apply_matches_python_replica(spark):
    """bpe_apply re-segments every doc under the learned merges; per-doc
    token budgets equal the pure-python merge application."""
    from collections import Counter

    from tika_wrap_spark.operators.text_analysis import bpe_apply

    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    docs = [(0, " ".join(words[:8])), (1, " ".join(words[8:]))]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # python replica: train 3 merges on the SAME corpus, then apply
    vocab = Counter(words)
    seqs = {w: list(w) for w in vocab}
    for _ in range(3):
        pc: Counter = Counter()
        for w, syms in seqs.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += vocab[w]
        (a, b), _n = min(pc.items(), key=lambda kv: (-kv[1], "|%s|  |%s|" % kv[0]))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out

    got = {r["doc_id"]: r for r in bpe_apply(df, rounds=3).collect()}
    for doc_id, text in docs:
        ws = text.split()
        want_char = sum(len(w) for w in ws)
        want_bpe = sum(len(seqs[w]) for w in ws)
        r = got[doc_id]
        assert r["n_words"] == len(ws)
        assert r["tokens_char"] == want_char
        assert r["tokens_bpe"] == want_bpe
        assert r["saved_q"] == (1000 * (want_char - want_bpe)) // want_char
    # merges actually compress
    assert all(r["tokens_bpe"] < r["tokens_char"] for r in got.values())


def test_gopher_repetition_matches_hand_computation(spark):
    """Planted docs with known n-gram structure: a pure-python replica of
    the quantized share definitions must match the Spark operator exactly
    (same bar as the bpe/perplexity replicas)."""
    from collections import Counter

    from tika_wrap_spark.operators.text_analysis import gopher_repetition

    rows = [
        (0, "ha ha ha ha ha ha"),              # one bigram dominates
        (1, "a b c d e a b c d e a b c d e"),  # repeated 5-gram
        (2, "all distinct words here now"),    # no repetition
        (3, "x"),                              # below every gram order
        (4, ""),                               # empty doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_repetition(df).collect()}

    def replica(text):
        norm = " ".join(text.strip().lower().split())
        toks = [t for t in norm.split(" ") if t]
        out = {"n_chars_norm": len(norm), "n_toks": len(toks)}
        for n, key in ((2, "top2"), (3, "top3")):
            grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            c = Counter(grams)
            out[key + "_chars"] = max((v * len(g) for g, v in c.items()), default=0)
        grams5 = [" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)]
        c5 = Counter(grams5)
        out["dup5_chars"] = sum(v * len(g) for g, v in c5.items() if v > 1)
        for key in ("top2", "top3", "dup5"):
            out[key + "_share_q"] = (
                1000 * out[key + "_chars"] // max(out["n_chars_norm"], 1)
            )
        return out

    assert len(got) == len(rows)
    for doc_id, text in rows:
        want = replica(text)
        have = {k: v for k, v in got[doc_id].items() if k != "doc_id"}
        assert have == want, (doc_id, have, want)
    # sanity on the planted structure itself
    assert got[0]["top2_share_q"] > 800      # 'ha ha' dominates
    assert got[1]["dup5_share_q"] > 500      # repeated 5-gram covers most chars
    assert got[2]["dup5_chars"] == 0
    assert got[3]["top2_chars"] == got[3]["top3_chars"] == 0
    assert got[4]["n_toks"] == 0 and got[4]["dup5_share_q"] == 0


def test_line_dedup_counts_cross_doc_boilerplate(spark, tmp_path):
    """A footer line planted in 3 docs counts as duplicate occurrences;
    a unique long line does not; short lines are ignored entirely."""
    from tika_wrap_spark.queries_training import q_line_dedup

    footer = "all rights reserved by example corp"
    rows = [
        (0, f"unique alpha content line one\n{footer}\nok", "en", "web", 1),
        (1, f"unique beta content line two\n{footer}", "en", "web", 1),
        (2, f"{footer}\nshort", "en", "books", 1),
        (3, "totally original essay paragraph here", "en", "books", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r["source"]: r for r in q_line_dedup(spark, str(tmp_path)).collect()}
    # web: 4 kept lines (2 unique + 2 footer; 'ok' is under the length bar)
    assert got["web"]["n_lines"] == 4
    assert got["web"]["n_dup_lines"] == 2
    assert got["web"]["n_dup_contents"] == 1
    assert got["web"]["dup_q"] == 500
    # books: footer + essay kept, 'short' dropped
    assert got["books"]["n_lines"] == 2
    assert got["books"]["n_dup_lines"] == 1
    assert got["books"]["dup_q"] == 500


def test_readability_hand_computation(spark, tmp_path):
    """FK milli-grade matches the hand-computed integer formula, and a
    long-word document grades above a terse one."""
    from tika_wrap_spark.queries_training import q_readability

    terse = "He ran. She saw. It is."  # short words, many sentences
    dense = (
        "Extraordinarily complicated administrative responsibilities "
        "necessitate comprehensive organizational documentation"
    )
    rows = [(0, terse, "en", "a", 1), (1, dense, "en", "b", 1)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r["source"]: r for r in q_readability(spark, str(tmp_path)).collect()}

    def fk(words, sentences, syll):
        return (390 * words) // sentences + (11800 * syll) // words - 15590

    # terse: norm = 'he ran. she saw. it is.' -> 6 words, 3 sentences;
    # vowel groups: he(1) ran(1) she(1) saw(1) it(1) is(1) = 6
    assert got["a"]["mean_fk_milli"] == fk(6, 3, 6)
    # dense: 8 words, 1 sentence (no terminal punct -> floor 1 applies to
    # count 0), syllable groups counted by the [aeiouy]+ runs
    dense_syll = len(
        [g for g in __import__("re").findall(r"[aeiouy]+", dense.lower())]
    )
    assert got["b"]["mean_fk_milli"] == fk(8, 1, dense_syll)
    assert got["b"]["mean_fk_milli"] > got["a"]["mean_fk_milli"]
