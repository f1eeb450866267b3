"""Benchmark harness.

Default mode (driver contract): run the headline jobs at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line::

  {"metric": "parse_route_throughput", "value": <seq/sec>, "unit":
   "seq/sec", "queries": {...per-query seconds...}, "sf": ..., ...}

The headline metric is the north-rule one: parse+enrich+route+aggregate
throughput in sequences/sec over a pre-materialized tokenized-sequence
parquet (generation is cached in .bench_cache/ and excluded from
timing; input IO is included, as on a real cluster).

``--scaling`` mode: run the identical parse job at local[8] and
local[32] in fresh subprocesses on the same input and write
BENCH/BASELINE.md with both throughputs and the N->4N scaling
efficiency (the sandbox proxy for the two-cluster-size criterion).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

CACHE = REPO / ".bench_cache"

# sequences-table size by sf dir basename (≈10x lineitem density)
N_BY_SF = {"sf0.001": 10_000, "sf0.01": 100_000, "sf0.1": 1_000_000}


def ensure_input(spark, n: int) -> str:
    """Materialize the deterministic sequences table once; benches read
    it from parquet like any other input table."""
    path = CACHE / f"sequences_{n}"
    marker = path / "_SUCCESS"
    if not marker.exists():
        from grokspark.datagen import sequences_df

        sequences_df(spark, n).write.mode("overwrite").parquet(str(path))
    return str(path)


def time_action(fn, repeats: int = 2) -> float:
    """Best-of-N wall time of one Spark action."""
    best = float("inf")
    for _ in range(repeats):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


def time_once(fn) -> float:
    """One wall-time sample of one Spark action."""
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


def round_robin_best(items: list[tuple[str, object, int]]) -> dict[str, float]:
    """Best-of-N with the attempts INTERLEAVED across the query list:
    run every query once (round 1), then every query again (round 2),
    ... Each query keeps its minimum across rounds.

    Rationale (CLAUDE.md bench discipline, VERDICT r4 finding #1): this
    box has multi-minute external noise windows. Consecutive best-of-2
    puts both attempts of a query INSIDE one window — r4's official
    artifact recorded 6.04 s for a query whose clean reading is 1.22 s.
    Interleaving puts a full list-length gap (~minutes) between a
    query's attempts, so one noise window can poison at most one of
    them.

    ``items``: (name, zero-arg callable returning elapsed seconds,
    n_rounds). A query with n_rounds < max rounds sits out the extra
    rounds (used to give the headline one more sample than the rest).
    """
    best: dict[str, float] = {}
    max_rounds = max(r for _, _, r in items)
    for rnd in range(max_rounds):
        for name, sample, rounds in items:
            if rnd >= rounds:
                continue
            sec = sample()
            prev = best.get(name, float("inf"))
            best[name] = min(prev, sec)
    return best


def run_bench(
    sf_dir: str, cpus: int, n_seq: int | None, parse_only: bool = False
) -> dict:
    from grokspark.session import get_spark

    sf_name = Path(sf_dir).name
    n = n_seq or N_BY_SF.get(sf_name, 100_000)

    spark = get_spark(app_name="grokspark-bench", cores=cpus, shuffle_partitions=cpus)
    seq_path = ensure_input(spark, n)

    queries: dict[str, float] = {}

    # --- headline: parse+enrich+route+aggregate ------------------------
    from grokspark.pipeline import route_match_counts

    def parse_route():
        route_match_counts(spark, spark.read.parquet(seq_path)).collect()

    if parse_only:
        parse_sec = time_action(parse_route, repeats=3)
        queries["parse_route"] = round(parse_sec, 3)
        return {
            "metric": "parse_route_throughput",
            "value": round(n / parse_sec, 1),
            "unit": "seq/sec",
            "queries": queries,
            "sf": sf_name,
            "n_sequences": n,
            "cpus": cpus,
            "elapsed_parse_route_sec": round(parse_sec, 3),
        }

    # --- full pipeline with fan-out sinks (fresh dir, resume off) ------
    # capped input: the sink fan-out is a durability path, not the
    # throughput headline; keep the bench turnaround bounded
    import shutil
    import tempfile

    from grokspark.pipeline import GrokPipeline, PipelineConfig

    n_pipe = min(n, 200_000)
    pipe_path = ensure_input(spark, n_pipe)

    def pipe_sample(**cfg_kwargs) -> float:
        """One timed pipeline run into a fresh sink dir."""
        sink_dir = tempfile.mkdtemp(prefix="grokspark_bench_")
        try:
            t0 = time.monotonic()
            GrokPipeline(
                spark,
                PipelineConfig(out_dir=sink_dir, resume=False, **cfg_kwargs),
            ).run(spark.read.parquet(pipe_path))
            return time.monotonic() - t0
        finally:
            shutil.rmtree(sink_dir, ignore_errors=True)

    # --- headline relational / training-data queries on sf tables ------
    import __spark_entry__ as entry

    qs = entry.queries()

    def q_sample(fn, reset=None):
        """One timed sample of an entry query. ``reset`` drops any
        per-process result cache first — the dedup queries share a
        materialized pair graph so the ORACLE SWEEP builds it once,
        but the bench must measure the full build every sample."""

        def sample():
            if reset is not None:
                reset()
            return time_once(lambda: fn(spark, sf_dir).collect())

        return sample

    # --- JVM fast path vs Arrow kernel, identical query ----------------
    from pyspark.sql import functions as F

    from grokspark import GrokRegistry
    from grokspark.datagen import SOURCES
    from grokspark.jvmgrok import detokenize_col, jvm_field_col, jvm_match_col
    from grokspark.udfs import grok_parse_map_udf

    apache = GrokRegistry.with_default_patterns().compile(
        SOURCES["apache_access"][2], with_alias_only=True
    )

    def apache_arrow():
        parse = grok_parse_map_udf(apache, from_tokens=True)
        (
            spark.read.parquet(seq_path)
            .filter(F.col("source") == "apache_access")
            .withColumn("fields", parse(F.col("tokens")))
            .filter(F.col("fields").isNotNull())
            .groupBy(F.element_at("fields", "verb").alias("verb"))
            .count()
            .collect()
        )

    def apache_jvm():
        lines = (
            spark.read.parquet(seq_path)
            .filter(F.col("source") == "apache_access")
            .withColumn("line", detokenize_col(F.col("tokens")))
            .filter(jvm_match_col(apache, F.col("line")))
        )
        (
            lines.groupBy(
                jvm_field_col(apache, F.col("line"), "verb").alias("verb")
            )
            .count()
            .collect()
        )

    # every query, one sample per round, minimum across rounds; the
    # headline gets a third round. Interleaved so a box-noise window
    # can poison at most one of each query's attempts (see
    # round_robin_best / VERDICT r4 #1).
    items: list[tuple[str, object, int]] = [
        ("parse_route", lambda: time_once(parse_route), 3),
        ("parse_apache_arrow", lambda: time_once(apache_arrow), 2),
        ("parse_apache_jvm", lambda: time_once(apache_jvm), 2),
        ("pipeline_sinks", lambda: pipe_sample(parse_partitions=cpus, single_pass=True), 2),
        # ranged mode: unit = input file-range — one total scan +
        # per-range resume + observe-based counts (the 10^12-scale
        # configuration)
        ("pipeline_sinks_ranged", lambda: pipe_sample(range_units=4), 2),
    ] + [
        (
            name,
            q_sample(
                # the knn_join row runs the BLOCKED scoring path — the
                # promoted default (r4 verdict item 5; fold path stays
                # as the oracle/FP-parity twin, see similarity.knn_join)
                qs["knn_join_blocked" if name == "knn_join" else name],
                reset=entry._DOC_PAIRS_CACHE.clear
                if name.startswith("dedup_") or name == "corpus_prepare"
                else (
                    entry._LM_CACHE.clear
                    if name.startswith("lm_")
                    else (
                        entry._DSIR_WEIGHTS_CACHE.clear
                        if name.startswith("dsir_")
                        else None
                    )
                ),
            ),
            2,
        )
        for name in [
            "agg_pricing_summary",
            "join_segment_revenue",
            "window_top_orders",
            "events_sessionize",
            "dedup_exact",
            "dedup_minhash_lsh",
            "simhash_pairs",
            "knn_join",
            "fingerprint",
            "token_counts",
            "text_quality",
            "ann_topk",
            "bpe_tokenize",
            "corpus_prepare",
            "repetition",
            "redact_pii",
            "lm_perplexity",
            "span_dedup",
            "decontaminate",
            "mixture_sample",
            "bm25_topk",
            "c4_clean",
            "heavy_hitters",
            "quantiles_tokens",
            "events_asof_join",
            "reservoir_sample",
            "semdedup",
            "semdedup_lsh",
            "dsir_select",
        ]
    ]
    best = round_robin_best(items)
    queries.update({name: round(sec, 3) for name, sec in best.items()})
    parse_sec = best["parse_route"]
    throughput = n / parse_sec

    return {
        "metric": "parse_route_throughput",
        "value": round(throughput, 1),
        "unit": "seq/sec",
        "queries": queries,
        "sf": sf_name,
        "n_sequences": n,
        "cpus": cpus,
        "elapsed_parse_route_sec": round(parse_sec, 3),
    }


def _mutated_docs(spark, sf_dir: str, factor: int):
    """``factor`` copies of the documents table, copy c passed through
    a rot-c letter substitution (``F.translate``): equal substrings
    stay equal WITHIN a copy and differ ACROSS copies, so the corpus
    grows by ``factor`` with its near-dup structure and gram-frequency
    distribution held exactly constant — the honest input for
    cost-curvature probes. (Naive replication multiplies the true
    near-dup pair count by factor^2 and measures output growth;
    per-word suffix mutation floods the CHARACTER-gram space with a
    single common boundary gram and starves winnowing's df-cap —
    measured: winnow_pairs output collapsed to 0.)"""
    import string

    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if factor == 1:
        return docs.select("doc_id", "text")
    lower, upper = string.ascii_lowercase, string.ascii_uppercase
    parts = []
    for c in range(factor):
        rot_l = lower[c:] + lower[:c]
        rot_u = upper[c:] + upper[:c]
        parts.append(
            docs.select(
                (F.col("doc_id") + c * 10_000_000).alias("doc_id"),
                F.translate("text", lower + upper, rot_l + rot_u).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _mutated_docs_keep_quality(spark, sf_dir: str, factor: int):
    """Growth variant for the COMPOSED corpus job (prepare_corpus):
    words of >= 4 chars get a per-copy letter suffix; stopwords and
    short function words stay untouched, so the quality filter's
    stopword/punct/word-count features are preserved (the rot-letter
    mutation destroys every English stopword and the filter correctly
    rejects all mutated copies — measured: 10x input produced 1x
    packs), while long-word bigrams decorrelate copies enough that
    cross-copy Jaccard stays below the dedup threshold."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if factor == 1:
        return docs.select("doc_id", "text")
    letters = "abcdefghijklmnopqrstuvwxyz"
    parts = [
        docs.select(
            (F.col("doc_id") + c * 10_000_000).alias("doc_id"),
            F.regexp_replace(
                "text", r"([A-Za-z0-9]{4,})", f"$1q{letters[c % 26]}"
            ).alias("text"),
        )
        for c in range(factor)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _synthetic_embeddings(spark, n: int, dim: int = 64):
    """Deterministic isotropic-ish synthetic embedding corpus:
    per-(id, dim) xxhash64 uniforms in [-0.5, 0.5] — fully
    decorrelated, so sign-LSH buckets spread ~uniformly at any n.
    (Two rejected alternatives, both measured: replicating the sf
    embeddings with additive noise leaves copies bucket-correlated
    and the candidate join goes quadratic; sinusoidal features
    sin(id*13+i) trace a 1-D curve — only 20 of 1024 buckets
    populated, max 8350 rows — which skews the probe into measuring a
    degenerate corpus, not the operator.)"""
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: F.pmod(F.xxhash64(F.col("id"), i), F.lit(1_000_000))
            .cast("double")
            / 1_000_000.0
            - 0.5,
        ).alias("embedding"),
    )


def _parse_probe_rows(path) -> dict[str, dict[int, tuple[float, int, int]]]:
    """Parse the op rows out of an existing SCALE_PROBES.md so a
    filtered probe run (--probe-ops) can re-measure one noisy op
    without discarding the others' readings (the box has multi-minute
    noise windows; re-running everything just re-rolls the dice)."""
    import re as _re

    rows: dict[str, dict[int, tuple[float, int, int]]] = {}
    if not path.exists():
        return rows
    pat = _re.compile(
        r"^\| (\w+) \| ([\d.]+) \| ([\d,]+) \| ([\d,]+) \| ([\d.]+) \| ([\d,]+) \| ([\d,]+) \|"
    )
    for line in path.read_text().splitlines():
        m = pat.match(line)
        if m:
            g = [x.replace(",", "") for x in m.groups()]
            rows[g[0]] = {
                1: (float(g[1]), int(g[2]), int(g[3])),
                10: (float(g[4]), int(g[5]), int(g[6])),
            }
    return rows


def run_scale_probe(sf_dir: str, cpus: int, only: list[str] | None = None) -> None:
    """Cost-curvature probe for the dedup/ANN guards (VERDICT r3 #2):
    run the heavy candidate-generation ops at 1x and 10x the sf corpus
    (structure-preserving growth, see _mutated_docs) and record per-row
    cost curvature in BENCH/SCALE_PROBES.md. The 10x knn_join runs with
    n_planes=None, exercising the auto-sizing path on a corpus big
    enough that the chosen plane count actually grows. `only` restricts
    to the named ops, merging re-measured rows into the existing table
    (noisy-window single-op re-measure without a full 15-min sweep)."""
    from pyspark.sql import functions as F

    from grokspark.operators import (
        decontaminate,
        dsir_select,
        knn_join,
        minhash_lsh_pairs,
        prepare_corpus,
        semdedup,
        semdedup_lsh,
        winnow_pairs,
    )
    from grokspark.operators.dedup import semdedup_recommended_cells
    from grokspark.operators.ivf import seeded_centroids
    from grokspark.operators.clean import c4_clean
    from grokspark.operators.retrieval import bm25_topk
    from grokspark.operators.sketches import heavy_hitter_tokens
    from grokspark.operators.similarity import knn_join_blocked, recommended_n_planes
    from grokspark.session import get_spark

    spark = get_spark(app_name="grokspark-scale-probe", cores=cpus, shuffle_partitions=cpus)
    results: dict[str, dict[int, tuple[float, int]]] = {}
    op_order: list[str] = []

    def probe(name: str, factor: int, build):
        # repartition to the core count BEFORE checkpointing: the 1x
        # documents table is one parquet split (one partition -> the
        # winnow Arrow kernel would run single-core at 1x but 10-wide
        # at 10x, inverting the curve); equal width at both levels
        # isolates per-row cost. Input synthesis excluded from timing.
        df = build(factor).repartition(cpus).localCheckpoint()
        n_rows = df.count()
        best = float("inf")
        out_rows = 0
        for _ in range(2):
            t0 = time.monotonic()
            out_rows = build_op(df).count()
            best = min(best, time.monotonic() - t0)
        results.setdefault(name, {})[factor] = (best, n_rows, out_rows)
        print(f"{name} x{factor}: {best:.1f}s over {n_rows:,} rows -> {out_rows:,} out", file=sys.stderr)

    for name, build_inputs, build_op in [
        (
            "dedup_minhash_lsh",
            lambda f: _mutated_docs(spark, sf_dir, f),
            lambda df: minhash_lsh_pairs(df, threshold=0.5, n=2, bands=64),
        ),
        (
            "winnow_pairs",
            lambda f: _mutated_docs(spark, sf_dir, f),
            lambda df: winnow_pairs(df, min_shared=2, max_fp_df=50),
        ),
        (
            "knn_join_auto",
            lambda f: _synthetic_embeddings(spark, 5_000 * f),
            lambda df: knn_join(df, k=5, n_planes=None, probe_hamming=1),
        ),
        (
            "knn_join_blocked",
            lambda f: _synthetic_embeddings(spark, 5_000 * f),
            lambda df: knn_join_blocked(df, k=5, n_planes=None, probe_hamming=1),
        ),
        (
            "corpus_prepare",
            lambda f: _mutated_docs_keep_quality(spark, sf_dir, f),
            lambda df: prepare_corpus(df, max_len=256, n_buckets=32, n_merges=120),
        ),
        (
            # map-only: curvature should be ~flat-to-sublinear; any
            # rise means a fused rule stopped fusing
            "c4_clean",
            lambda f: _mutated_docs(spark, sf_dir, f),
            lambda df: c4_clean(df),
        ),
        (
            # bounded-state candidates + broadcast verify: curvature
            # tracks the two scans, not the vocabulary. Quality-
            # preserving growth: the rot-letter corpus dilutes EVERY
            # term 10x (copy-specific vocab), emptying any fixed-phi
            # output at 10x; the suffix variant keeps short/stopword
            # frequencies stable so the threshold discriminates at
            # both levels
            "heavy_hitters",
            lambda f: _mutated_docs_keep_quality(spark, sf_dir, f),
            lambda df: heavy_hitter_tokens(df, phi_ppm=5_000),
        ),
        (
            # postings volume grows linearly with the corpus while the
            # probe side (3 queries) is fixed — the inverted-index
            # promise is that query cost tracks posting-list length,
            # not corpus size; curvature checks the postings build
            "bm25_topk",
            lambda f: _mutated_docs(spark, sf_dir, f),
            lambda df: bm25_topk(
                df,
                spark.createDataFrame(
                    [("q1", "hash join order"), ("q2", "fast scan filter table")],
                    "query_id string, text string",
                ),
                k=10,
            ),
        ),
        (
            # k grows with the corpus (semdedup_recommended_cells) so
            # cell size — and the per-cell quadratic matmul — stays
            # ~constant; curvature then tracks the shuffle + per-row
            # scoring, the operator as the scale rule says to run it.
            # A FIXED k would measure the quadratic blowup instead.
            "semdedup",
            lambda f: _synthetic_embeddings(spark, 5_000 * f),
            lambda df: semdedup(
                df,
                seeded_centroids(
                    64, semdedup_recommended_cells(df.count()), seed=42
                ),
                threshold=0.3,
            ),
        ),
        (
            # the O(n log k) assignment fix for semdedup's 0.80: the
            # bucket costs n_planes (~log2 k) dot products per row
            # instead of k, so total assignment stays ~linear
            "semdedup_lsh",
            lambda f: _synthetic_embeddings(spark, 5_000 * f),
            lambda df: semdedup_lsh(df, n_planes=None, threshold=0.3),
        ),
        (
            # linear by construction: two bucket-count aggregates, a
            # <=B-row broadcast ratio table, one per-doc integer sum —
            # curvature confirms no hidden gram-wide shuffle appears
            "dsir_select",
            lambda f: _mutated_docs(spark, sf_dir, f),
            lambda df: dsir_select(
                df.filter(F.col("doc_id") % 11 != 0),
                df.filter(F.col("doc_id") % 11 == 0),
                k=50,
            ),
        ),
        (
            # benchmark side grows with the corpus (same %50 rule the
            # gate query uses), so candidate volume scales honestly
            "decontaminate",
            lambda f: _mutated_docs(spark, sf_dir, f),
            lambda df: decontaminate(
                df.filter(F.col("doc_id") % 50 != 0),
                df.filter(F.col("doc_id") % 50 == 0),
                n=3,
            ),
        ),
    ]:
        op_order.append(name)
        if only and name not in only:
            continue
        for factor in (1, 10):
            probe(name, factor, build_inputs)

    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    if only:
        prior = _parse_probe_rows(bench_dir / "SCALE_PROBES.md")
        results = {
            name: results.get(name) or prior[name]
            for name in op_order
            if name in results or name in prior
        }
    lines = [
        "# BENCH/SCALE_PROBES — 1x vs 10x cost curvature",
        "",
        f"Corpus: {Path(sf_dir).name} documents grown 10x by per-copy",
        "rot-letter substitution (equal substrings stay equal within a",
        "copy, differ across copies — near-dup structure and gram-",
        "frequency distribution held exactly constant, so output grows",
        "~linearly and the probe measures OPERATOR cost curvature, not",
        "output growth); embeddings are the deterministic synthetic",
        f"corpus at 5k/50k rows. local[{cpus}], best-of-2,",
        "input synthesis excluded (localCheckpoint before timing).",
        "",
        "curvature = t10x / (10 * t1x): 1.0 = perfectly linear; < 1 means",
        "fixed overhead amortizes; > 1 means superlinear candidate growth",
        "(the failure mode the occupancy guards exist to catch).",
        "",
        "| op | t 1x (s) | rows 1x | out 1x | t 10x (s) | rows 10x | out 10x | curvature |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, by_factor in results.items():
        t1, r1, o1 = by_factor[1]
        t10, r10, o10 = by_factor[10]
        curv = t10 / (10 * t1)
        lines.append(
            f"| {name} | {t1:.1f} | {r1:,} | {o1:,} | {t10:.1f} | {r10:,} | {o10:,} | {curv:.2f} |"
        )
    n1 = results["knn_join_auto"][1][1]
    n10 = results["knn_join_auto"][10][1]
    target = max(64, 16 * 5)
    lines += [
        "",
        f"knn auto-sizing (k-scaled target {target} rows/bucket): n_planes",
        f"{recommended_n_planes(n1, target)} at 1x -> "
        f"{recommended_n_planes(n10, target)} at 10x (the expected-bucket-",
        "population invariant; asserted in tests/test_scale_guards.py).",
        "",
        "corpus_prepare grows via the quality-preserving variant",
        "(_mutated_docs_keep_quality: >=4-char words get per-copy letter",
        "suffixes, stopwords untouched — the rot corpus has no English",
        "stopwords so the quality filter correctly rejects every mutated",
        "copy). Its 10x output exceeds 10x packs because the BPE vocab",
        "spreads over the suffixed word variants (more pieces/doc) — the",
        "composition is behaving, not leaking.",
        "",
        "decontaminate: benchmark side = the %50 id rule, so it grows",
        "with the corpus; the corpus pass explodes 8-byte gram hashes",
        "against a broadcast benchmark table (no corpus shuffle) and",
        "only candidate docs pay the string-verify rejoin.",
        "",
        "semdedup vs semdedup_lsh is a deliberate A/B of the SAME drop",
        "rule under two cell assignments: centroid argmax-dot costs k",
        "dot products per row and k MUST grow with the corpus to bound",
        "the per-cell quadratic matmul (semdedup_recommended_cells), so",
        "total assignment work is O(n*k) ~ O(n^2/target) — the 0.8",
        "curvature IS that term, measured. The sign-LSH cell reaches",
        "2^n_planes cells with n_planes (~log2 k) dot products per row,",
        "keeping assignment ~linear — same prune kernel, same",
        "gate-query oracle structure, flat curvature. At 100 TB use",
        "semdedup_lsh (or trained centroids with an ANN assigner);",
        "centroid semdedup stays as the paper-faithful baseline.",
        "",
        "knn_join's verify join moves candidates x 2 x vector_width",
        "bytes and fold-scores per row; knn_join_blocked ships each",
        "query vector once per PROBE (not per candidate) into a",
        "cogrouped bucket-local numpy matmul — ~100x less shuffle and",
        "BLAS scoring, same candidate rule (result-equality asserted in",
        "tests/test_scale_guards.py). Probe history that earned these",
        "curves (details in git): a 1024-row occupancy target made kNN",
        "candidates grow n x probes (6.3x curvature) -> k-scaled target;",
        "the interpreted bucket fold re-evaluated per plan reference ->",
        "materialized once; sinusoidal synthetic vectors collapsed onto",
        "20 of 1024 buckets (degenerate-corpus skew, 734 s) -> isotropic",
        "xxhash features.",
    ]
    (bench_dir / "SCALE_PROBES.md").write_text("\n".join(lines) + "\n")
    print("wrote BENCH/SCALE_PROBES.md", file=sys.stderr)


def run_streaming_soak(cpus: int, n_rows: int = 200_000, n_files: int = 20) -> None:
    """Streaming soak characterization (VERDICT r3 #8): drive
    stream_route_sinks and stream_first_seen over ``n_files``
    micro-batches, then REPLAY the whole corpus, and record rows/s plus
    the state-store's on-disk size after each pass in
    BENCH/STREAMING.md — the bounded-state claim, measured: state
    bytes track DISTINCT ids, so pass 2 (pure replay) must not grow
    the store."""
    import shutil
    import tempfile

    from grokspark.session import get_spark
    from grokspark.streaming import (
        read_sequence_stream,
        stream_first_seen,
        stream_route_sinks,
    )

    spark = get_spark(app_name="grokspark-stream-soak", cores=cpus, shuffle_partitions=cpus)
    work = Path(tempfile.mkdtemp(prefix="grokspark_soak_"))
    try:
        from grokspark.datagen import sequences_df

        in_dir = work / "input"
        per_file = n_rows // n_files
        for f in range(n_files):
            # disjoint index ranges -> disjoint doc_ids per file
            sequences_df(
                spark, per_file, partitions=cpus, start=f * per_file
            ).coalesce(1).write.mode("append").parquet(str(in_dir))

        def du(path: Path) -> int:
            return sum(
                p.stat().st_size for p in path.rglob("*") if p.is_file()
            )

        md = [
            "# BENCH/STREAMING — soak characterization",
            "",
            f"{n_rows:,} rows in {n_files} files; local[{cpus}]. Two",
            "throughput configs: maxFilesPerTrigger=1 (micro-batch-",
            "overhead-dominated by design — per-trigger cost floor) and",
            f"maxFilesPerTrigger={n_files // 4} (realistic ~{n_rows // 4:,}-row",
            "batches, best-of-3 fresh-checkpoint passes per the",
            "BENCH/BASELINE.md noise discipline). The STATE metrics are",
            "the store's own exact counters and are noise-free — they",
            "are the soak's bounded-state claim.",
            "",
        ]

        # -- stream_route_sinks throughput --------------------------------
        def sinks_pass(tag: str, mfpt: int) -> tuple[float, int]:
            """One fresh-checkpoint end-to-end sinks run; returns
            (seconds, routed rows written)."""
            sink_out = work / f"sinks_out_{tag}"
            sink_ckpt = work / f"sinks_ckpt_{tag}"
            t0 = time.monotonic()
            q = stream_route_sinks(
                read_sequence_stream(
                    spark, str(in_dir), max_files_per_trigger=mfpt
                ),
                str(sink_out),
                str(sink_ckpt),
            )
            q.awaitTermination()
            sec = time.monotonic() - t0
            n_written = spark.read.parquet(str(sink_out / "sinks")).count()
            shutil.rmtree(sink_out)
            shutil.rmtree(sink_ckpt)
            return sec, n_written

        micro_sec, micro_written = sinks_pass("micro", 1)
        real_mfpt = max(1, n_files // 4)
        real_passes = [
            sinks_pass(f"real{i}", real_mfpt)[0] for i in range(3)
        ]
        real_best = min(real_passes)
        md += [
            "## stream_route_sinks (parse -> enrich -> fan-out, idempotent per-batch publish)",
            "",
            f"- maxFilesPerTrigger=1 ({n_files} micro-batches of"
            f" {n_rows // n_files:,} rows): {micro_sec:.1f}s ->"
            f" {n_rows / micro_sec:,.0f} rows/s"
            f" ({micro_written:,} routed rows written) — per-trigger",
            "  overhead floor, not a throughput claim",
            f"- maxFilesPerTrigger={real_mfpt} (~4 batches of"
            f" {n_rows // 4:,} rows), best of 3 fresh passes"
            f" [{', '.join(f'{s:.1f}s' for s in real_passes)}]:"
            f" {real_best:.1f}s -> **{n_rows / real_best:,.0f} rows/s**",
            "",
        ]

        # -- stream_first_seen state growth -------------------------------
        fs_in = work / "fs_input"
        shutil.copytree(in_dir, fs_in)
        fs_ckpt = work / "fs_ckpt"

        def run_pass() -> tuple[float, dict]:
            """One availableNow pass; returns (sec, state-operator
            metrics of the LAST batch — numRowsTotal is the live
            group-state rowcount, stateOnCurrentVersionSizeBytes the
            live store size; on-disk du would also count retained old
            versions and mis-measure 'growth')."""
            t0 = time.monotonic()
            q = (
                stream_first_seen(
                    read_sequence_stream(spark, str(fs_in), max_files_per_trigger=1)
                )
                .writeStream.format("noop")
                .option("checkpointLocation", str(fs_ckpt))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            ops = (q.lastProgress or {}).get("stateOperators") or [{}]
            return time.monotonic() - t0, ops[0]

        p1, m1 = run_pass()
        # replay: copy the same files in under new names -> every row is
        # a duplicate; live state must not grow
        for p in sorted(in_dir.glob("*.parquet")):
            shutil.copy(p, fs_in / f"replay-{p.name}")
        p2, m2 = run_pass()
        rows1 = m1.get("numRowsTotal", -1)
        rows2 = m2.get("numRowsTotal", -1)
        sz1 = m1.get("stateOnCurrentVersionSizeBytes") or m1.get("memoryUsedBytes", 0)
        sz2 = m2.get("stateOnCurrentVersionSizeBytes") or m2.get("memoryUsedBytes", 0)
        disk = du(fs_ckpt / "state")
        md += [
            "## stream_first_seen (bounded stateful dedup, 8-byte digests over hash buckets)",
            "",
            f"- pass 1 (all-new ids): {p1:.1f}s -> {n_rows / p1:,.0f} rows/s;"
            f" live state {rows1} group rows, {sz1 / 1e6:.1f} MB"
            f" ({sz1 / n_rows:.1f} B per distinct id incl. store overhead)",
            f"- pass 2 (100% replay of all {n_rows:,} rows): {p2:.1f}s ->"
            f" {n_rows / p2:,.0f} rows/s; live state {rows2} group rows,"
            f" {sz2 / 1e6:.1f} MB (growth {100 * (sz2 - sz1) / max(sz1, 1):.1f}%)",
            f"- checkpoint dir on disk: {disk / 1e6:.1f} MB (includes retained",
            "  old state versions pending maintenance cleanup — version",
            "  bookkeeping, not live state; the metrics rows above are the",
            "  store's own live-size counters)",
            "",
            "Live state is a function of DISTINCT ids, not batches: the full",
            "replay adds zero group rows and zero live bytes. Per-id cost is",
            "8 bytes of digest + store overhead; raise FIRST_SEEN_BUCKETS",
            "with corpus size to bound per-group state (streaming.py doc).",
        ]
        if rows1 != rows2:
            raise AssertionError(
                f"replay grew state rows {rows1} -> {rows2} — bounded-state "
                f"contract broken"
            )
        (REPO / "BENCH").mkdir(exist_ok=True)
        (REPO / "BENCH" / "STREAMING.md").write_text("\n".join(md) + "\n")
        print("wrote BENCH/STREAMING.md", file=sys.stderr)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def run_scaling(sf_dir: str, n_seq: int | None) -> None:
    """Run the identical job at two parallelism pairs (4 vs 16, 8 vs 32;
    fresh JVM each) and record throughput + N->4N scaling efficiency in
    BENCH/BASELINE.md. The 8->32 pair spans SMT siblings on this box
    (raw-CPU ceiling ~0.79 measured with plain busy loops), so 4->16 —
    all within physical cores — is the cleaner 4x proxy."""
    # The sandbox has multi-minute windows of external slowdown that can
    # swallow a whole level measured contiguously. Round-robin the
    # levels over several passes and keep each level's best.
    results: dict[int, dict] = {}
    for pass_i in range(3):
        for cpus in (4, 16, 8, 32):
            env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus))
            cmd = [sys.executable, str(REPO / "bench.py"), "--json-only", "--parse-only"]
            if n_seq:
                cmd += ["--n", str(n_seq)]
            out = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True)
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            res = json.loads(line)
            prev = results.get(cpus)
            if prev is None or res["value"] > prev["value"]:
                results[cpus] = res
            print(
                f"pass {pass_i} local[{cpus}]: {res['value']} seq/sec"
                f" (best {results[cpus]['value']})",
                file=sys.stderr,
            )

    eff_4_16 = (results[16]["value"] / results[4]["value"]) / 4.0
    eff_8_32 = (results[32]["value"] / results[8]["value"]) / 4.0
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    n = results[32]["n_sequences"]
    md = f"""# BENCH/BASELINE — measured baseline numbers

Input: deterministic tokenized-sequence table, {n:,} rows (seed=42),
read from parquet. Job: scan -> broadcast-enrich -> salted repartition ->
fused detokenize+grok-parse (pandas UDF) -> per-(route, matched) counts.
Same job, same input, two parallelism pairs (fresh JVM each), the
sandbox proxy for N vs 4N executors per BASELINE.json north_rule.

Local-mode caveat measured on this 32-vCPU box: a Python-UDF stage runs
JVM executor threads AND one Python worker per core concurrently, so
local[k] occupies ~2k threads — local[16] saturates the box and
local[32] oversubscribes it 2x (throughput collapses). The 4->16 pair
is therefore the honest 4x proxy; on a real cluster the same rule is
"size executor cores to leave headroom for Python workers".

| metric | value | config |
|---|---|---|
| parse+route throughput | {results[4]['value']:,.0f} seq/sec | local[4] |
| parse+route throughput | {results[16]['value']:,.0f} seq/sec | local[16] |
| parse+route throughput | {results[8]['value']:,.0f} seq/sec | local[8] |
| parse+route throughput | {results[32]['value']:,.0f} seq/sec | local[32] |
| **scaling efficiency 4->16** | **{eff_4_16:.3f}** | (thr16/thr4)/4, target >= 0.8; within physical cores |
| scaling efficiency 8->32 | {eff_8_32:.3f} | (thr32/thr8)/4; the 32 level spans SMT siblings (raw-CPU busy-loop ceiling measured 0.79 on this box) |

Per-query seconds at local[32] (sf={results[32]['sf']}):

| query | sec |
|---|---|
"""
    for name, sec in results[32]["queries"].items():
        md += f"| {name} | {sec} |\n"
    md += f"""
Raw JSON:

```json
{json.dumps(results[4])}
{json.dumps(results[16])}
{json.dumps(results[8])}
{json.dumps(results[32])}
```
"""
    md += """
## Box ceiling context

The same parse kernel run bare (multiprocessing, no Spark, pre-rendered
lines) measures the hardware's own scaling ceiling for this workload:
1 proc 120k rows/s, 4: 422k, 8: 785k, 16: 1,615k, 32: 2,315k
-> kernel-only 4->16 efficiency 0.96 (physical cores), 8->32 0.74 (SMT).
Normalize the Spark efficiencies against these ceilings to compare with
a multi-node cluster, where SMT-sibling sharing between JVM and Python
workers is absent.
"""
    # Preserve manually-maintained addenda: everything from the first
    # "## Round-" section of the existing file onward survives a
    # regenerate (a prior run of this function once clobbered the
    # recorded per-session history — never again).
    out_path = bench_dir / "BASELINE.md"
    if out_path.exists():
        old = out_path.read_text()
        idx = old.find("\n## Round-")
        if idx != -1:
            md = md.rstrip() + "\n" + old[idx:]
    out_path.write_text(md)
    print(f"scaling efficiency 4->16: {eff_4_16:.3f}, 8->32: {eff_8_32:.3f} -> BENCH/BASELINE.md", file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true", help="run local[8] vs local[32] and write BENCH/BASELINE.md")
    ap.add_argument("--json-only", action="store_true", help="suppress everything but the JSON line")
    ap.add_argument("--n", type=int, default=None, help="sequences-table rows override")
    ap.add_argument("--parse-only", action="store_true", help="headline parse job only (used by --scaling)")
    ap.add_argument("--scale-probe", action="store_true", help="1x vs 10x cost-curvature probe -> BENCH/SCALE_PROBES.md")
    ap.add_argument("--probe-ops", default=None, help="comma list: re-measure only these probe ops, merge into the existing table")
    ap.add_argument("--streaming-soak", action="store_true", help="streaming rows/s + state-store soak -> BENCH/STREAMING.md")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    if args.scaling:
        run_scaling(sf_dir, args.n)
        return
    if args.scale_probe:
        only = args.probe_ops.split(",") if args.probe_ops else None
        run_scale_probe(sf_dir, cpus, only=only)
        return
    if args.streaming_soak:
        run_streaming_soak(cpus)
        return

    result = run_bench(sf_dir, cpus, args.n, parse_only=args.parse_only)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
