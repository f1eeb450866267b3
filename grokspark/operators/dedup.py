"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash, embedding-cosine. Entirely built-in DataFrame expressions
except SimHash's bit-vote (a vectorized pandas UDF over numpy).

Scale notes (the design constraint is 10^9+ documents):
- exact dedup is one hash-aggregate on a fingerprint (shuffle on the
  fingerprint, not the text);
- MinHash+LSH shuffles (band_id, band_hash) — candidate generation
  never compares all pairs; the verify step joins only bucket
  collisions;
- brute-force pair ops (jaccard_pairs, embedding_cosine_pairs) are
  quadratic *within a blocking key* — they exist as the exactness
  baseline for tests/oracles and for small blocks after LSH.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

__all__ = [
    "exact_dedup",
    "ngrams",
    "jaccard_pairs",
    "minhash_signature",
    "minhash_signature_from_grams",
    "minhash_signature_table",
    "minhash_band_buckets",
    "minhash_lsh_candidates",
    "minhash_lsh_pairs",
    "simhash_signatures",
    "simhash_near_dup_pairs",
    "simhash_py",
    "simhash_batch",
    "duplicate_clusters",
    "dedup_corpus",
    "embedding_cosine_pairs",
    "cosine",
    "semdedup",
    "semdedup_join",
    "semdedup_lsh",
]


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per distinct normalized text.
    One hash aggregate; at scale, group on md5(text) instead of text to
    shrink shuffle width — both shown here (fp is the shuffle key)."""
    from grokspark.operators.textops import content_fingerprint_col

    return (
        df.withColumn("_fp", content_fingerprint_col(F.col(text_col)))
        .groupBy("_fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .drop("_fp")
    )


def ngrams(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the lowercased text.

    Formulated as an (n-1)-deep ``zip_with`` fold over shifted word
    slices — n slices total, each gram built by concatenation — rather
    than the obvious ``transform(sequence(0, size-n), i ->
    array_join(slice(w, i+1, n)))``: higher-order lambdas are
    interpreted, and a slice PER INDEX makes that form O(words^2) per
    document (measured 7x slower at sf0.1; it was the dominant map-side
    cost of the whole MinHash path)."""
    w = F.split(F.lower(F.trim(text)), r"\s+")
    size = F.size(w)
    glen = size - (n - 1)
    grams = F.slice(w, 1, glen)
    for j in range(1, n):
        grams = F.zip_with(
            grams, F.slice(w, j + 1, glen), lambda a, b: F.concat_ws(" ", a, b)
        )
    # documents shorter than n words get their whole text as one shingle
    short = F.array(F.array_join(w, " "))
    return F.array_distinct(F.when(size >= n, grams).otherwise(short))


def ngram_hashes(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram identities as 64-bit hashes, WITHOUT ever
    building the gram strings: the hash of gram (w_i..w_{i+n-1}) is the
    left fold ``xxhash64(...xxhash64(xxhash64(w_i), w_{i+1})...)``.
    Words contain no whitespace (``\\s+`` split), so a gram string
    "w1 w2" decomposes uniquely into its word tuple — tuple identity
    EQUALS string identity, and set sizes/intersections over these
    hashes equal the string-gram ones modulo 64-bit collisions
    (~1e-16/pair; output verified equal to the string path on every
    testdata sf). Skipping the concat_ws string build and hashing the
    distinct pass on longs instead of strings measurably cuts the
    dominant map cost of the MinHash path. Same short-document rule as
    ``ngrams``: fewer than n words hash the whole text as one
    shingle."""
    w = F.split(F.lower(F.trim(text)), r"\s+")
    size = F.size(w)
    glen = size - (n - 1)
    hs = F.transform(F.slice(w, 1, glen), lambda x: F.xxhash64(x))
    for j in range(1, n):
        hs = F.zip_with(
            hs, F.slice(w, j + 1, glen), lambda acc, b: F.xxhash64(acc, b)
        )
    short = F.array(F.xxhash64(F.array_join(w, " ")))
    return F.array_distinct(F.when(size >= n, hs).otherwise(short))


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: Optional[str] = None,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs (id_a < id_b, jaccard >=
    threshold). Quadratic within a block — pass ``block_col`` (e.g.
    lang, or an LSH bucket) to bound the pair space at scale."""
    # the theta-join (id_a < id_b) executes as a nested-loop join
    # whose stream side inherits the scan's partitioning — spread a
    # single-split local input or the whole quadratic verify runs on
    # one core (measured 8.1 s -> <1 s at the gate sf)
    g = _ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        *( [F.col(block_col).alias("_blk")] if block_col else [] ),
        ngrams(F.col(text_col), n).alias("grams"),
    )
    a = g.select(
        F.col("id").alias("id_a"),
        *( [F.col("_blk")] if block_col else [] ),
        F.col("grams").alias("grams_a"),
    )
    b = g.select(
        F.col("id").alias("id_b"),
        *( [F.col("_blk").alias("_blk_b")] if block_col else [] ),
        F.col("grams").alias("grams_b"),
    )
    cond = F.col("id_a") < F.col("id_b")
    joined = a.join(b, cond & (F.col("_blk") == F.col("_blk_b")) if block_col else cond)
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    union = F.size(F.array_union("grams_a", "grams_b"))
    jac = inter.cast("double") / union.cast("double")
    return (
        joined.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signature(
    text: Column, n: int = 3, num_hashes: int = 128
) -> Column:
    """MinHash signature as a single array column: per seed, the min
    hash over the shingle set. Per-row expression variant for small
    inputs / single-doc use — the batch path is
    ``minhash_signature_table`` (same hash family, same values), whose
    plan avoids repeating this num_hashes-lambda expression tree in
    every stage that references it."""
    return minhash_signature_from_grams(ngrams(text, n), num_hashes)


def minhash_signature_from_grams(grams: Column, num_hashes: int = 128) -> Column:
    """MinHash signature from a precomputed shingle-array column.

    Hash family: one 64-bit base hash per gram string, then per seed i
    the cheap long-hash ``xxhash64(base, i)`` — the string is hashed
    once, not once per seed (the standard single-base-hash MinHash
    construction, cf. Spark MLlib's MinHashLSH)."""
    hs = F.transform(grams, lambda s: F.xxhash64(s))
    return F.array(
        *[
            F.array_min(F.transform(hs, lambda x: F.xxhash64(x, F.lit(seed))))
            for seed in range(num_hashes)
        ]
    )


def _ensure_parallelism(df: DataFrame, min_bytes: int = 0) -> DataFrame:
    """Spread a per-row expression stage across the full core pool: a
    small local input (one parquet split) would otherwise evaluate the
    whole map stage — the n-gram shingle expression is the dominant
    cost of the MinHash path, measured ~6 s single-core at sf0.1 — on
    one core. No-op when the input already has >= defaultParallelism
    partitions, which is always true at real scale (scan splits >>
    cores), so no shuffle is added on a cluster.

    ``min_bytes``: only spread when the optimizer's input size
    estimate reaches this many bytes. For operators whose per-row work
    is CHEAP relative to bytes (a split+count, one md5), the spread's
    shuffle costs more than single-core execution saves on tiny local
    inputs (measured: heavy_hitters at sf0.1 0.72 s plain vs 1.19 s
    spread, but 2.40 s plain vs 1.64 s spread at sf1.0 — the
    crossover sits around a few MB). Expression-heavy operators
    (MinHash shingles, rolling hashes, salted-md5 buckets) keep the
    default 0 = always spread. An unknown estimate (e.g. a
    localCheckpointed input) spreads — matching prior behavior."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= p:
        return df
    if min_bytes:
        try:
            est = int(
                str(
                    df._jdf.queryExecution()
                    .optimizedPlan()
                    .stats()
                    .sizeInBytes()
                )
            )
            if est < min_bytes:
                return df
        except Exception:
            pass
    return df.repartition(p)


# input-size floor for spreads guarding byte-cheap map work (see
# _ensure_parallelism's min_bytes doc)
SPREAD_MIN_BYTES = 4 * 1024 * 1024


def _signature_table_from_grams(grams_df: DataFrame, num_hashes: int) -> DataFrame:
    """(id, m0..m{num_hashes-1}) from a precomputed ``(id, grams)``
    table — the shared tail of ``minhash_signature_table`` (see its
    docstring for the shape rationale)."""
    hashed = grams_df.select(
        "id", F.explode("grams").alias("gram")
    ).select("id", F.xxhash64("gram").alias("h"))
    return hashed.groupBy("id").agg(
        *[
            F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"m{i}")
            for i in range(num_hashes)
        ]
    )


def minhash_signature_table(
    df: DataFrame,
    n: int = 3,
    num_hashes: int = 128,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document MinHash signatures as a WIDE TABLE ``(id, m0 ..
    m{num_hashes-1})`` — the batch formulation every LSH op builds on.

    Shape rationale (measured, sf0.01/8 cores): the per-row array
    expression (num_hashes nested lambdas) costs little to execute but
    its ~1 MB codegen unit is re-compiled in EVERY stage of every plan
    that embeds it — the old band-bucket self-join spent 86 s on a 500-
    doc input, almost all of it code generation. This version explodes
    the shingles, hashes each gram string ONCE, and takes num_hashes
    plain ``min`` aggregates of seed-mixed long-hashes: small codegen
    units, JVM-side hashing, and the groupBy's partial aggregation
    collapses each document to one row map-side (a document's grams
    never span partitions), so the exchange carries ~8*num_hashes bytes
    per DOCUMENT, not per gram. 95 s -> 4 s for the full pair op."""
    grams_df = _ensure_parallelism(df).select(
        F.col(id_col).alias("id"), ngrams(F.col(text_col), n).alias("grams")
    )
    return _signature_table_from_grams(grams_df, num_hashes)


def minhash_band_buckets(
    df: DataFrame,
    n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH band-bucket table: ``(id, band_id, band_hash)`` — one row per
    (document, band). Deliberately NARROW: at 10^9+ docs the band
    explode multiplies row count by ``bands``, so nothing wide (grams,
    signatures, text) may ride it — the shuffle below the candidate
    self-join moves ~24 bytes/row, not the shingle arrays. Band hashes
    come straight off the signature-table columns (no per-row array
    rebuild)."""
    sig = minhash_signature_table(df, n, num_hashes, text_col, id_col)
    return _band_buckets_from_sig(sig, num_hashes, bands)


def _band_buckets_from_sig(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    rows_per_band = num_hashes // bands
    return sig.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[F.col(f"m{b * rows_per_band + r}") for r in range(rows_per_band)]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_id", "band_hash"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct candidate id-pairs sharing at least one LSH band bucket.
    The whole stage is hash-narrow: explode ×bands, self-join on
    (band_id, band_hash), dedupe (id_a, id_b). No gram arrays anywhere
    in this plan (plan-asserted in tests/test_plans.py)."""
    banded = minhash_band_buckets(df, n, num_hashes, bands, text_col, id_col)
    return _candidates_from_banded(banded)


def _candidates_from_banded(banded: DataFrame) -> DataFrame:
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


_MASK_SLOTS = 8  # 512-bit gram bloom mask (8 longs) per document


def _mask_aggs(n_slots: int = _MASK_SLOTS) -> list:
    """Aggregate expressions building a ``n_slots*64``-bit bloom mask
    over a column named ``h`` (one exploded gram hash per row): gram g
    sets bit ``pmod(h,64)`` of slot ``pmod(h, bits) div 64``. The mask
    supports an EXACT union bound (see ``minhash_lsh_pairs``)."""
    bits = n_slots * 64
    return [
        F.expr(
            f"bit_or(IF(pmod(h, {bits}) DIV 64 = {i}, "
            f"shiftleft(1L, int(pmod(h, 64))), 0L))"
        ).alias(f"b{i}")
        for i in range(n_slots)
    ]


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize: bool = True,
    broadcast_max_docs: int = 5_000_000,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, exact-verified.

    Candidate generation is unchanged (band explode + bucket self-join
    over ``(id, band_id, band_hash)`` only — identical band hashes,
    identical candidate recall). What changed in round 6 is everything
    AFTER candidates, because at scale the r=2 bands' false-positive
    rate makes candidates the dominant term (measured sf1.0/50k docs:
    78.5M candidate pairs for 2,544 true pairs, and shipping ~600 B
    gram arrays per candidate through two shuffle joins was ~80% of a
    127 s runtime):

    1. grams are carried as xxhash64 LONGS (``gh``), not strings — the
       signature path already hashed every gram, so the verify now
       intersects the same longs (intersection size is exact modulo
       64-bit collisions, ~1e-16/pair; output verified equal to the
       string path on all testdata sfs);
    2. a 512-bit bloom mask per document (8 longs, built in the SAME
       groupBy as the 128 signature mins) gives a deterministic bound:
       every gram of A∪B sets a bit of maskA|maskB, so
       ``union >= P := popcount(maskA|maskB)`` and
       ``jaccard <= (na+nb-P)/P`` EXACTLY — no false negatives. The
       precheck keeps a pair only when ``na+nb >= (1+t)*P`` (plus the
       free size-ratio bound ``min(na,nb) >= t*max(na,nb)``). Measured
       at sf1.0 it prunes 78.5M candidates to the 2,544 true pairs
       before any array is touched;
    3. the precheck tables are NARROW (id, ng, 8 mask longs ≈ 80 B/doc)
       and broadcast when the corpus is below ``broadcast_max_docs``
       (~400 MB at the default; beyond that the precheck falls back to
       shuffle joins, still narrow). Survivors are distinct-ed and then
       verified by streaming the gram-hash table against the BROADCAST
       survivor set — the gram arrays never enter any exchange.

    Measured sf1.0/local[32]: 127 s -> 17 s, identical 2,544-pair
    output; sf0.1 4.1 s -> ~2.5 s.

    ``materialize=True`` localCheckpoints the gram table, the
    signature+mask table and the survivor set (the op is eager, same
    discipline as before); ``materialize=False`` keeps the op fully
    lazy (documented recompute, used by laziness-sensitive callers).

    Precision is exact (every emitted pair is verified); recall is the
    LSH collision probability 1-(1-s^r)^b — pick bands/num_hashes for
    the target threshold (bands=64, num_hashes=128 makes misses at
    s>=0.5 ~1e-8, used by the driver oracle query)."""
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    grams = _ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        ngram_hashes(F.col(text_col), n).alias("gh"),
    )
    if materialize:
        grams = grams.localCheckpoint()
    hashed = grams.select("id", F.explode("gh").alias("h"))
    sig = hashed.groupBy("id").agg(
        *[
            F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"m{i}")
            for i in range(num_hashes)
        ],
        *_mask_aggs(),
        F.count(F.lit(1)).cast("int").alias("ng"),
    )
    # fold the signature mins into their band hashes BEFORE the
    # checkpoint: the downstream consumers need only the 64 band
    # hashes + the 8 mask slots + ng, so the materialization carries
    # 73 longs/doc instead of 137 (same band-hash VALUES — identical
    # candidates) and the band projection becomes a plain posexplode
    rows_per_band = num_hashes // bands
    band_cols = [
        F.xxhash64(
            *[F.col(f"m{b * rows_per_band + r}") for r in range(rows_per_band)]
        ).alias(f"bh{b}")
        for b in range(bands)
    ]
    sig = sig.select(
        "id", "ng", *[f"b{i}" for i in range(_MASK_SLOTS)], *band_cols
    )
    if materialize:
        # one 50k-row-scale table feeds the band explode (read by both
        # sides of the candidate self-join) AND the precheck tables —
        # checkpoint it once so the explode + 128-min aggregate runs
        # exactly once.
        sig = sig.localCheckpoint()
    use_broadcast = True
    if materialize and broadcast_max_docs is not None:
        use_broadcast = grams.count() <= broadcast_max_docs
    banded = sig.select(
        "id",
        F.posexplode(
            F.array(*[F.col(f"bh{b}") for b in range(bands)])
        ).alias("band_id", "band_hash"),
    )
    # candidate self-join: explicit repartition pins the exchange at
    # the full shuffle width (narrow 24 B rows — AQE's byte-based
    # coalescing would squeeze the CPU-heavy precheck stage fused
    # above it down to a handful of tasks; CLAUDE.md measured 5.4x)
    a, b = banded.alias("a"), banded.alias("b")
    pre = (
        a.repartition(n_part, "band_id", "band_hash")
        .join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    slots = [f"b{i}" for i in range(_MASK_SLOTS)]
    ptab = sig.select("id", "ng", *slots)
    pa = ptab.select(
        F.col("id").alias("id_a"),
        F.col("ng").alias("na"),
        *[F.col(s).alias(f"a_{s}") for s in slots],
    )
    pb = ptab.select(
        F.col("id").alias("id_b"),
        F.col("ng").alias("nb"),
        *[F.col(s).alias(f"b_{s}") for s in slots],
    )
    if use_broadcast:
        pa, pb = F.broadcast(pa), F.broadcast(pb)
    else:
        pre = pre.repartition(n_part, "id_a")
    popcount_or = sum(
        F.bit_count(F.col(f"a_{s}").bitwiseOR(F.col(f"b_{s}"))) for s in slots
    )
    prechecked = (
        pre.join(pa, "id_a")
        .join(pb, "id_b")
        # jaccard <= (na+nb-P)/P  (exact: P is a union lower bound)
        .filter(
            (F.col("na") + F.col("nb")).cast("double")
            >= (1.0 + threshold) * popcount_or
        )
        # jaccard <= min/max (exact size-ratio bound)
        .filter(
            F.least("na", "nb").cast("double")
            >= threshold * F.greatest("na", "nb")
        )
    )
    cands = prechecked.select("id_a", "id_b").dropDuplicates()
    if materialize:
        cands = cands.localCheckpoint()
    # verify: stream the gram-hash table, broadcast the (tiny) survivor
    # set — gram arrays never cross an exchange
    cand_b = F.broadcast(cands) if use_broadcast else cands
    left = grams.join(cand_b, F.col("id") == F.col("id_a")).select(
        "id_a", "id_b", F.col("gh").alias("ha")
    )
    left_b = F.broadcast(left) if use_broadcast else left
    ver = grams.join(left_b, F.col("id") == F.col("id_b")).select(
        "id_a", "id_b", "ha", F.col("gh").alias("hb")
    )
    # |A u B| = |A| + |B| - |A n B| (gram arrays are distinct-element),
    # so one array_intersect does the work of intersect + union
    inter = F.size(F.array_intersect("ha", "hb"))
    union = (F.size("ha") + F.size("hb") - inter).cast("double")
    return (
        ver.withColumn("jaccard", inter.cast("double") / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_pairs_vs(
    new_df: DataFrame,
    corpus_df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize: bool = True,
) -> DataFrame:
    """Incremental near-dup: exact-verified pairs ``(new_id,
    corpus_id, jaccard)`` between a NEW batch and an EXISTING corpus —
    the daily-ingest dedup shape ("is anything in today's crawl a
    near-duplicate of what we already have?"). Output excludes
    identical ids (a re-ingested row is exact-dedup's job).

    100-TB shape: the corpus is the big side and NEVER shuffles for
    candidates — the new batch's band table (narrow: 24 bytes x bands
    per doc) is **broadcast** against the corpus band table, and gram
    arrays are re-derived only for the corpus docs that actually hit a
    bucket (semi-join prune). In a deployed pipeline the corpus band
    table is materialized once (bucketed by band hash) and reused
    every batch; this function derives it from ``corpus_df`` with the
    identical plan shape, so swapping in a pre-built table is a
    one-line change at the call site.

    Recall/precision contract matches ``minhash_lsh_pairs``: precision
    exact (same array_intersect verify expression), recall set by the
    band count."""
    new_grams = _ensure_parallelism(new_df).select(
        F.col(id_col).alias("id"), ngrams(F.col(text_col), n).alias("grams")
    ).withColumn("ng", F.size("grams"))
    if materialize:
        new_grams = new_grams.localCheckpoint()
    new_banded = _band_buckets_from_sig(
        _signature_table_from_grams(new_grams, num_hashes), num_hashes, bands
    )
    corpus_banded = minhash_band_buckets(
        corpus_df, n, num_hashes, bands, text_col, id_col
    )
    cands = (
        corpus_banded.alias("c")
        .join(
            F.broadcast(new_banded.alias("nw")),
            (F.col("c.band_id") == F.col("nw.band_id"))
            & (F.col("c.band_hash") == F.col("nw.band_hash"))
            & (F.col("c.id") != F.col("nw.id")),
        )
        .select(
            F.col("nw.id").alias("new_id"), F.col("c.id").alias("corpus_id")
        )
        .dropDuplicates(["new_id", "corpus_id"])
    )
    if materialize:
        cands = cands.localCheckpoint()
    hit_grams = (
        _ensure_parallelism(
            corpus_df.join(
                cands.select(F.col("corpus_id").alias(id_col)).distinct(),
                id_col,
                "left_semi",
            )
        )
        .select(
            F.col(id_col).alias("corpus_id"),
            ngrams(F.col(text_col), n).alias("grams_b"),
        )
        .withColumn("nb", F.size("grams_b"))
    )
    joined = cands.join(
        F.broadcast(
            new_grams.select(
                F.col("id").alias("new_id"),
                F.col("grams").alias("grams_a"),
                F.col("ng").alias("na"),
            )
        ),
        "new_id",
    ).join(hit_grams, "corpus_id")
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    union = (F.col("na") + F.col("nb") - inter).cast("double")
    return (
        joined.withColumn("jaccard", inter.cast("double") / union)
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "corpus_id", "jaccard")
    )


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """64-bit SimHash over word hashes (vectorized numpy pandas UDF:
    the per-bit vote matrix doesn't express well in SQL). Near-dup
    candidates are rows whose signatures differ in few bits.

    The whole Arrow batch is hashed at once: every word of every doc
    goes into one padded byte matrix, FNV-1a folds column-by-column in
    numpy uint64 (wrapping mul — bit-identical to ``_fnv1a``), and the
    per-doc bit votes come from one segmented reduction. Python touches
    each word once (encode), not once per byte — the per-word inner
    loop was the package's slowest path at scale (measured in
    bench_micro.py's ``simhash_*`` scenarios)."""

    @pandas_udf(T.LongType())
    def simhash(texts: pd.Series) -> pd.Series:
        return pd.Series(simhash_batch(texts, bits))

    return df.select(F.col(id_col), simhash(F.col(text_col)).alias("simhash"))


def simhash_batch(texts, bits: int = 64) -> "np.ndarray":
    """SimHash a whole batch of texts at once (signed int64 array,
    bit-identical to ``simhash_py`` per doc — property-tested). This is
    the kernel behind ``simhash_signatures``; importable standalone for
    tests and bench_micro's per-core scenarios."""
    n_docs = len(texts)
    counts = np.zeros(n_docs, dtype=np.int64)
    all_words: list[bytes] = []
    for i, t in enumerate(texts):
        ws = (t or "").lower().split()
        counts[i] = len(ws)
        for w in ws:
            all_words.append(w.encode("utf-8"))
    out = np.zeros(n_docs, dtype=np.int64)
    nz = counts > 0
    if all_words:
        hs = _fnv1a_batch(all_words)
        # uint8 bit matrix via unpackbits: 1 byte/word/bit (~64 B/word
        # peak, not the 512 B/word an int64 matrix costs — and no
        # transient uint64 broadcast either, unlike (hs>>i)&1);
        # reduceat accumulates in int64 via dtype=, so segments longer
        # than 255 words cannot overflow the uint8 storage type
        bits_m = np.unpackbits(
            hs.astype("<u8", copy=False).view(np.uint8).reshape(-1, 8),
            axis=1,
            bitorder="little",
        )[:, :bits]
        # segmented per-doc vote sums: empty docs are excluded, so
        # segment starts are strictly increasing and reduceat's
        # empty-segment quirk never applies
        offsets = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(counts[:-1], out=offsets[1:])
        sums = np.add.reduceat(bits_m, offsets[nz], axis=0, dtype=np.int64)
        votes = 2 * sums - counts[nz, None]
        sigs = (
            (votes > 0).astype(np.uint64)
            << np.arange(bits, dtype=np.uint64)[None, :]
        ).sum(axis=1, dtype=np.uint64)
        out[nz] = sigs.view(np.int64)
    return out


def _fnv1a(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _fnv1a_batch(words: list[bytes]) -> "np.ndarray":
    """FNV-1a of each byte string, vectorized and bit-identical to
    ``_fnv1a`` (property-tested). Words are length-sorted so byte
    position j folds only the still-active prefix — one uint64
    xor+wrapping-multiply per column over a flat byte buffer indexed by
    offsets (no padding, total work O(total bytes))."""
    n = len(words)
    lens = np.fromiter((len(w) for w in words), dtype=np.int64, count=n)
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    maxlen = int(lens.max(initial=0))
    if maxlen == 0:
        return h
    order = np.argsort(-lens, kind="stable")
    lens_s = lens[order]
    flat = np.frombuffer(
        b"".join(words[i] for i in order.tolist()), dtype=np.uint8
    ).astype(np.uint64)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens_s[:-1], out=starts[1:])
    # active[j] = how many (sorted) words still have a byte at column j
    active = n - np.cumsum(np.bincount(lens_s, minlength=maxlen + 1))
    hs = h.copy()
    prime = np.uint64(0x100000001B3)
    for j in range(maxlen):
        k = int(active[j])
        hs[:k] = (hs[:k] ^ flat[starts[:k] + j]) * prime
    h[order] = hs
    return h


def simhash_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
) -> DataFrame:
    """SimHash near-duplicate pairs: ``(id_a, id_b, hamming)`` with
    ``hamming <= max_hamming``, EXACT by construction.

    Candidates come from banding the 64-bit signature into ``bands``
    equal bit-slices and self-joining on (band_id, band_value): by
    pigeonhole, any pair differing in <= bands-1 bits shares at least
    one identical band, so for ``max_hamming <= bands - 1`` recall is
    100% — deterministic, unlike MinHash-LSH's probabilistic bands.
    Verification is a JVM-side popcount on the XOR. The banded stage
    carries only (id, band_id, band_val, simhash) — ~32 bytes/row
    through the xbands shuffle, same narrow-candidate discipline as
    ``minhash_lsh_candidates``."""
    if max_hamming > bands - 1:
        raise ValueError(
            f"banding guarantees recall only for max_hamming <= bands-1 "
            f"(got max_hamming={max_hamming}, bands={bands})"
        )
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    sigs = simhash_signatures(df, text_col, id_col, bits).withColumnRenamed(
        id_col, "id"
    )
    banded = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftrightunsigned("simhash", b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("id", "simhash", "band.band_id", "band.band_val")
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cands.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_py(text: Optional[str], bits: int = 64) -> int:
    """Pure-Python reference SimHash (signed int64, identical to the
    Spark UDF bit-for-bit) — drives oracles and tests."""
    ws = (text or "").lower().split()
    if not ws:
        return 0
    votes = [0] * bits
    for w in ws:
        h = _fnv1a(w)
        for i in range(bits):
            votes[i] += 1 if (h >> i) & 1 else -1
    sig = 0
    for i, v in enumerate(votes):
        if v > 0:
            sig |= 1 << i
    return sig - (1 << bits) if sig >= (1 << (bits - 1)) else sig


def duplicate_clusters(
    pairs: DataFrame,
    max_iterations: int = 20,
    id_a: str = "id_a",
    id_b: str = "id_b",
    driver_max_edges: Optional[int] = 1_000_000,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph:
    ``(id, cluster_id)`` for every id that appears in a pair, where
    cluster_id is the minimum id in the component (the canonical
    representative to keep).

    Iterative hash-to-min label propagation — the standard shuffle-
    friendly CC for Spark: each round every vertex takes the min of its
    own label and its neighbors' labels (one equi-join + one groupBy
    per round), converging in O(component diameter) rounds, NOT
    O(graph size). Near-dup graphs are unions of small cliques, so 2-3
    rounds typically suffice; ``max_iterations`` bounds adversarial
    chains — if the graph has NOT converged by then, a RuntimeError is
    raised rather than silently returning a wrong partial clustering.
    Each round is ``localCheckpoint``-ed to truncate plan lineage
    (without it the plan doubles per iteration). Convergence is
    detected by an exact changed-label count per round.

    The symmetric edge set is materialized ONCE up front
    (``localCheckpoint``): it is joined in every round, and without the
    checkpoint each round re-executes the caller's whole pair plan
    (e.g. the MinHash-LSH candidate+verify job — measured 180 s of pure
    recompute over a 47-node graph). The edge list is tiny relative to
    the corpus (near-dup pairs only), so materializing it is the right
    trade at any scale; on a cluster the same role is played by a
    checkpoint to durable storage.

    SMALL-GRAPH FAST PATH: when the materialized edge set has at most
    ``driver_max_edges`` rows, the components are computed by a
    driver-side union-find over the (already checkpointed) edges — the
    same answer, none of the per-round Spark job latency (measured
    5.7 s of round overhead for a 256-edge gate graph). This is the
    same bounded-driver-state design as the BPE merge loop: the cap is
    explicit, the fallback is the distributed hash-min loop, and at
    corpus scale a pair graph past the cap takes the distributed path
    automatically. Pass ``driver_max_edges=None/0`` to force the
    distributed loop (the scale-shape tests do)."""
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    id_type = edges.schema["src"].dataType
    edges = edges.localCheckpoint()
    if driver_max_edges and edges.count() <= driver_max_edges:
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for r in edges.collect():
            a, b = r["src"], r["dst"]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min: the smaller id becomes the root, so the
                # final label equals the distributed hash-min result
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        rows = [(x, find(x)) for x in parent]
        spark = pairs.sparkSession
        schema = T.StructType(
            [
                T.StructField("id", id_type),
                T.StructField("cluster_id", id_type),
            ]
        )
        return spark.createDataFrame(rows, schema)
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    changed = -1
    for _ in range(max_iterations):
        neighbor_labels = sym.join(
            labels, sym["dst"] == labels["id"]
        ).select(F.col("src").alias("id"), F.col("label"))
        new_labels = (
            labels.select("id", "label")
            .unionByName(neighbor_labels)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iterations} "
            f"iterations ({changed} labels still changing) — raise "
            f"max_iterations (components need rounds >= min-id eccentricity)"
        )
    return labels.select(F.col("id"), F.col("label").alias("cluster_id"))


def dedup_corpus(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    collapse_exact: bool = True,
    max_iterations: int = 20,
    precomputed_pairs: Optional[DataFrame] = None,
) -> DataFrame:
    """The end-to-end dedup decision a training pipeline materializes:
    ``(doc_id, cluster_id, keep)`` for EVERY document — ``cluster_id``
    is the minimum doc id of the document's near-duplicate cluster
    (its own id if unique), ``keep`` marks exactly one representative
    (the minimum id) per cluster.

    Composition: exact-duplicate collapse (md5 of normalized text ->
    one representative per identical group — one cheap hash aggregate
    that shrinks the LSH input; duplicate-heavy corpora are mostly
    EXACT duplicates) -> MinHash-LSH near-dup pairs over the
    representatives -> iterative connected components -> decisions
    broadcast back to all members. Output is IDENTICAL with
    ``collapse_exact=False`` (byte-equal docs have Jaccard 1 >=
    threshold, so they cluster anyway — asserted in tests); the flag
    only changes how much text the LSH stage chews.

    ``precomputed_pairs``: an already-materialized exact-recall pair
    set (``id_a, id_b, ...``) over a SUPERSET of ``df``'s ids — e.g.
    the ``minhash_lsh_pairs`` output a sibling job computed with the
    SAME (threshold, n) on the same corpus. Because the emitted pairs
    are exact-verified (precision) and band-complete at the caller's
    chosen recall, restricting a superset's pairs to the
    representative set equals recomputing pairs over the
    representatives — each pair's membership depends only on the two
    documents. Skips the whole LSH stage (the dominant cost when the
    pair graph is shared across dedup queries)."""
    from grokspark.operators.textops import content_fingerprint_col

    ids = df.select(
        F.col(id_col).alias("id"),
        content_fingerprint_col(F.col(text_col)).alias("_fp"),
    )
    if collapse_exact:
        reps = ids.groupBy("_fp").agg(F.min("id").alias("rep_id"))
        # narrow (id, rep_id) map, checkpointed once: it feeds the
        # representative set, the pair restriction and the final
        # cluster rejoin — lazily each consumer re-ran the md5
        # fingerprint aggregate (the reused-subplan pattern)
        doc_rep = ids.join(reps, "_fp").select("id", "rep_id").localCheckpoint()
    else:
        doc_rep = ids.select("id", F.col("id").alias("rep_id"))
    # representative ids come from the narrow map — no text join
    rep_ids_frame = doc_rep.select("rep_id").distinct()
    if precomputed_pairs is not None:
        pairs = (
            precomputed_pairs.join(
                rep_ids_frame.withColumnRenamed("rep_id", "id_a"),
                "id_a",
                "left_semi",
            ).join(
                rep_ids_frame.withColumnRenamed("rep_id", "id_b"),
                "id_b",
                "left_semi",
            )
        )
    else:
        rep_docs = (
            df.join(
                rep_ids_frame.select(F.col("rep_id").alias(id_col)),
                id_col,
                "left_semi",
            )
            if collapse_exact
            else df
        )
        pairs = minhash_lsh_pairs(
            rep_docs, threshold, n, num_hashes, bands, text_col, id_col
        )
    clusters = duplicate_clusters(pairs, max_iterations).withColumnRenamed(
        "id", "rep_id"
    )
    out = doc_rep.join(clusters, "rep_id", "left").withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col("rep_id"))
    )
    return out.select(
        F.col("id").alias(id_col),
        "cluster_id",
        (F.col("id") == F.col("cluster_id")).alias("keep"),
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two float arrays, computed in double via
    zip_with + aggregate (JVM-side, no UDF)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm_a = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    norm_b = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return dot / (norm_a * norm_b)


def embedding_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: Optional[str] = None,
) -> DataFrame:
    """Embedding near-duplicate pairs by cosine >= threshold.
    Brute-force within a block (pass an LSH bucket / label as
    ``block_col`` at scale)."""
    # same stream-side spread rationale as jaccard_pairs: the
    # interpreted cosine fold otherwise evaluates every pair on one core
    a = _ensure_parallelism(df).select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        *( [F.col(block_col).alias("_blk")] if block_col else [] ),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        *( [F.col(block_col).alias("_blk_b")] if block_col else [] ),
    )
    cond = F.col("id_a") < F.col("id_b")
    joined = a.join(b, cond & (F.col("_blk") == F.col("_blk_b")) if block_col else cond)
    return (
        joined.withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def _semdedup_cells(
    df: DataFrame, centroids: list[list[float]], vec_col: str, id_col: str
) -> DataFrame:
    from grokspark.operators.ivf import ivf_assign_col

    # spread a single-split local scan: the k x dim argmax-dot
    # assignment is an interpreted expression chain and would run on
    # one core (no-op on a cluster; size-floored so tiny local inputs
    # skip the shuffle)
    return _ensure_parallelism(df, SPREAD_MIN_BYTES).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        ivf_assign_col(vec_col, centroids).alias("cell"),
    )


def semdedup_recommended_cells(n_rows: int, target_cell_rows: int = 512) -> int:
    """Centroid count that keeps expected cell size ~constant — the
    SemDeDup scale rule (the paper's k ~ 100k on LAION-5B is exactly
    n/target): per-cell similarity work is quadratic in cell size, so
    k must grow WITH the corpus, never stay fixed."""
    return max(8, int(round(n_rows / max(1, target_cell_rows))))


def semdedup(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): assign every vector to its nearest coarse
    centroid (argmax dot product — ``ivf_assign_col``, the same
    bit-reproducible rule as the IVF index), then inside each cell
    drop a row iff some SMALLER-id cell-mate has cosine >=
    ``threshold`` — the paper's upper-triangular max-similarity rule
    with id order as the scan order. Returns ``(id_col, cell, kept)``
    for every input row.

    100-TB shape: one scan assigns cells (pure JVM expressions), one
    shuffle groups by cell, and the quadratic similarity work is
    bounded per cell — size ``len(centroids)`` so cells stay small
    (the paper uses k ~ 100k on LAION; target n/k of ~1-16k rows).
    Scoring is one float64 normalized matmul per cell (Arrow-batched,
    C speed); each vector ships exactly once. Dropping is local to a
    cell by construction, so no cross-cell pass or global state is
    needed. Mirrors the knn_join_blocked policy: matmul sums in a
    different order than a sequential fold, so scores near the
    threshold could flip in the last ulp — the gate query's corpus
    margins are ~1e-4 (checked), and ``semdedup_join`` is the
    fold-path exactness twin used by the equality test.
    """
    cells = _semdedup_cells(df, centroids, vec_col, id_col)
    return _semdedup_prune(cells, threshold, df.schema[id_col].dataType, id_col)


def _semdedup_prune_join(cells: DataFrame, threshold: float, id_col: str) -> DataFrame:
    """Fold-path twin of ``_semdedup_prune``: same drop rule as a
    self-join + sequential-fold cosine (bit-identical to the SQL
    oracle's evaluation order). Quadratic within a cell — tests only."""
    mates = cells.select(
        F.col("id").alias("id_b"),
        F.col("vec").alias("vec_b"),
        F.col("cell").alias("cell_b"),
    )
    droppers = (
        cells.join(
            mates,
            (F.col("cell") == F.col("cell_b")) & (F.col("id_b") < F.col("id")),
        )
        .filter(cosine(F.col("vec"), F.col("vec_b")) >= float(threshold))
        .select("id")
        .distinct()
        .withColumn("_dropped", F.lit(1))
    )
    return (
        cells.join(droppers, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("cell"),
            F.when(F.col("_dropped").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("kept"),
        )
    )


def _semdedup_prune(
    cells: DataFrame, threshold: float, id_type, id_col: str
) -> DataFrame:
    """Shared prune stage over a prepared ``(id, vec, cell)`` frame:
    one shuffle by cell into a grouped float64 matmul applying the
    smaller-id-mate drop rule."""
    out_schema = T.StructType(
        [
            T.StructField("id", id_type),
            T.StructField("cell", T.IntegerType()),
            T.StructField("kept", T.IntegerType()),
        ]
    )
    thr = float(threshold)

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:  # empty Arrow batch guard
            return pd.DataFrame({"id": [], "cell": [], "kept": []})
        pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
        V = np.array(pdf["vec"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        zero = (norms == 0.0).ravel()
        norms[zero] = 1.0
        N = V / norms
        S = N @ N.T
        # zero-vector edge matches the fold/oracle semantics (ADVICE
        # r5): their cosine is 0/0 = NaN, and NaN compares ABOVE every
        # double in Spark SQL and DuckDB, so a zero-vector pair
        # satisfies ">= threshold" there; numpy would say False. Force
        # +inf on both axes of zero rows so all three paths agree.
        if zero.any():
            S[zero, :] = np.inf
            S[:, zero] = np.inf
        dropped = np.tril(S >= thr, -1).any(axis=1)
        return pd.DataFrame(
            {
                "id": pdf["id"],
                "cell": pdf["cell"].astype("int32"),
                "kept": (~dropped).astype("int32"),
            }
        )

    out = cells.groupBy("cell").applyInPandas(prune, out_schema)
    return out.select(
        F.col("id").alias(id_col), F.col("cell"), F.col("kept")
    )


def semdedup_lsh(
    df: DataFrame,
    n_planes: Optional[int] = None,
    threshold: float = 0.8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    target_cell_rows: int = 512,
    dim: Optional[int] = None,
) -> DataFrame:
    """SemDeDup with SIGN-LSH cells instead of centroid cells — the
    assignment-cost fix the scale probe demanded: centroid assignment
    is O(k) dot products per row and k must grow with the corpus
    (semdedup_recommended_cells), making assignment O(n^2/target)
    overall — the probe measured curvature 0.80 from exactly that
    term. A sign-LSH bucket reaches 2^n_planes cells with n_planes
    (~log2 k) dot products per row, so assignment stays O(n log k).
    Same per-cell drop rule and prune kernel as ``semdedup``; cells
    are hyperplane buckets, so the partition differs from k-means
    cells (near-dups across bucket boundaries are missed by BOTH
    methods by design — the paper's accepted approximation). Buckets
    are less balanced than trained cells; auto-sizing targets
    ``target_cell_rows`` expected rows per bucket."""
    from grokspark.operators.similarity import (
        _resolve_n_planes,
        hyperplanes,
        lsh_bucket_col,
    )

    n_planes = _resolve_n_planes(
        df, n_planes, "semdedup_lsh", target_bucket_rows=target_cell_rows
    )
    if dim is None:
        # empty-input guard (ADVICE r5): head() returns None on an
        # empty frame — return the empty decision table instead of a
        # TypeError; callers that know the width pass ``dim`` and skip
        # this probe job entirely
        probe = df.select(F.size(F.col(vec_col))).head()
        if probe is None:
            return df.sparkSession.createDataFrame(
                [],
                T.StructType(
                    [
                        T.StructField("id", df.schema[id_col].dataType),
                        T.StructField("cell", T.IntegerType()),
                        T.StructField("kept", T.IntegerType()),
                    ]
                ),
            ).withColumnRenamed("id", id_col)
        dim = probe[0]
    planes = hyperplanes(dim, n_planes, seed)
    cells = _ensure_parallelism(df, SPREAD_MIN_BYTES).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket_col(vec_col, planes).cast("int").alias("cell"),
    )
    return _semdedup_prune(cells, threshold, df.schema[id_col].dataType, id_col)


def semdedup_join(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Fold-path exactness twin of ``semdedup``: the same cell
    assignment and drop rule expressed as a self-join + the
    sequential-fold ``cosine`` (bit-identical to the SQL oracle's
    evaluation order). Quadratic within a cell — baseline for tests,
    not the scale path."""
    cells = _semdedup_cells(df, centroids, vec_col, id_col)
    return _semdedup_prune_join(cells, threshold, id_col)
