"""Corpus-curation operators beyond dedup/similarity: deterministic
stratified sampling, training-shard assignment, and bloom-filter-pruned
incremental anti-join.

Everything here is engine-portable integer/string arithmetic over md5
(present and identical in Spark and DuckDB), so every operator is
oracle-checkable bit-for-bit — the same discipline as operators/dedup.py.
A hash "bucket" is the integer value of the first ``nibbles`` hex chars of
``md5(salt || key)``; both engines decode hex chars through an index scan
of '0123456789abcdef' (Spark ``locate`` / DuckDB ``strpos``), never through
engine-specific conv()/from_hex().

Scale notes:
  * stratified_sample / shard_assign are PER-ROW expressions — no shuffle,
    no RNG (rand() is neither reproducible across retries nor oracle-able);
    the md5 bucket is stable under task retry, which a 10^12-doc sampling
    job requires for exactly-once semantics.
  * bloom-pruned anti-join: the classic incremental-ingest problem — the
    seen-set is petabytes, but its bloom projection (distinct bit
    positions) is tiny and broadcastable. Membership check = explode each
    candidate's k positions, broadcast-join the seen-position set, count
    hits; only docs with all k positions present (the "maybe" set, exact
    dups + a measurable false-positive tail) pay the exact fingerprint
    anti-join. No bitmap ever materializes on the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def bucket_expr(key: Column, salt: str, nibbles: int) -> Column:
    """Integer in [0, 16**nibbles) from the first ``nibbles`` hex chars of
    ``md5(salt || key)``. Spark side decodes the hex prefix with
    ``conv(.., 16, 10)``; the DuckDB side (bucket_sql_expr) decodes the
    same chars with strpos nibble arithmetic — identical values
    (``tests/test_curation.py`` pins the cross-engine equality)."""
    digest = F.md5(F.concat(F.lit(salt), key).cast("binary"))
    return F.conv(F.substring(digest, 1, nibbles), 16, 10).cast("long")


def bucket_sql_expr(key_sql: str, salt: str, nibbles: int) -> str:
    """The same bucket as bucket_expr, as DuckDB SQL over ``key_sql``."""
    terms = []
    for i in range(nibbles):
        scale = 16 ** (nibbles - 1 - i)
        terms.append(
            f"(strpos('{HEX}', substr(md5('{salt}' || {key_sql}), {i + 1}, 1)) - 1)"
            + (f" * {scale}" if scale > 1 else "")
        )
    return "(" + " + ".join(terms) + ")"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates_4096: dict[str, int],
    key_col: str = "doc_id",
    salt: str = "samp:",
    default_rate: int = 4096,
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff its md5 bucket
    (12 bits) falls below its stratum's threshold out of 4096 — per-stratum
    Bernoulli sampling with a reproducible, retry-stable coin."""
    bucket = bucket_expr(F.col(key_col).cast("string"), salt, 3)
    thr = None
    for stratum, rate in rates_4096.items():
        cond = F.col(strata_col) == stratum
        thr = F.when(cond, rate) if thr is None else thr.when(cond, rate)
    thr = thr.otherwise(default_rate) if thr is not None else F.lit(default_rate)
    return df.withColumn("bucket", bucket).filter(F.col("bucket") < thr)


def shard_assign(
    df: DataFrame, n_shards: int, key_col: str = "doc_id", salt: str = "shard:"
) -> DataFrame:
    """Deterministic training-shard assignment: shard = md5 bucket mod
    n_shards. Uniform by construction (no hot shard), stable across runs
    and retries — the property a resumable multi-day export needs."""
    bucket = bucket_expr(F.col(key_col).cast("string"), salt, 2)
    return df.withColumn("shard", (bucket % n_shards).cast("long"))


def bloom_positions(fp: Column, k: int = 3, salt: str = "bloom") -> Column:
    """Array of k bit positions (12-bit space, m=4096) for a fingerprint:
    position_i = bucket of md5('{salt}{i}:' || fp). k independent positions
    via salted digests — the standard k-hash bloom construction."""
    return F.array(*[bucket_expr(fp, f"{salt}{i}:", 3) for i in range(k)])


def bloom_prune_flags(
    incoming: DataFrame,
    seen: DataFrame,
    fp_col: str = "fp",
    k: int = 3,
) -> DataFrame:
    """Per-incoming-row bloom verdict against the seen-set, fully
    distributed: ``bloom_maybe`` (all k positions present in the seen
    bloom projection — never a false negative) and ``is_dup`` (exact
    fingerprint membership). An is_dup row without bloom_maybe would be a
    bloom soundness bug (``tests/test_curation.py`` pins the implication);
    bloom_maybe without is_dup is the measurable false-positive tail the
    pruning trades for.

    The seen side reduces to (a) its distinct bit positions and (b) its
    distinct fingerprints — both broadcast; the incoming corpus is never
    shuffled. At 100 TB only the bloom-maybe sliver pays join (b)."""
    seen_pos = (
        seen.select(F.explode(bloom_positions(F.col(fp_col), k)).alias("pos"))
        .distinct()
        .withColumn("present", F.lit(1))
    )
    seen_fps = seen.select(fp_col).distinct().withColumn("seen_dup", F.lit(True))
    inc = incoming.withColumn("_positions", bloom_positions(F.col(fp_col), k))
    hits = (
        inc.select("doc_id", F.explode("_positions").alias("pos"))
        .join(F.broadcast(seen_pos), "pos", "left")
        .groupBy("doc_id")
        .agg(F.sum(F.coalesce(F.col("present"), F.lit(0))).alias("hits"))
    )
    return (
        inc.join(hits, "doc_id")
        .join(F.broadcast(seen_fps), fp_col, "left")
        .select(
            "doc_id",
            (F.col("hits") == k).alias("bloom_maybe"),
            F.coalesce(F.col("seen_dup"), F.lit(False)).alias("is_dup"),
        )
    )
