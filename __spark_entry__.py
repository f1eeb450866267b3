"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``  — flagship grok parse→enrich→route→aggregate query.
``queries()``     — one entry per implemented operator (SURVEY.md §2 +
                    training-data ops); each callable (spark, sf_dir) -> DataFrame.
``oracle_sql()``  — DuckDB-runnable ANSI SQL producing the same result.

Oracle strategy:
- relational / text / dedup / ANN operators: real SQL over the same
  parquet views, formulas mirrored expression-for-expression (integer
  outputs at comparison points; single-division doubles only, which are
  bit-identical across engines).
- grok-parse / SimHash / PNG operators: DuckDB cannot express them, so
  the oracle is an independently computed expected table — the
  pure-Python reference-parity implementation (itself tested
  byte-for-byte against the Rust reference / brute force in tests/)
  run single-process over the identical deterministic corpus, embedded
  as a VALUES literal.
- LSH operators: parameters are chosen so the output is deterministic
  and SQL-checkable — MinHash bands=64 makes recall misses ~1e-8 (the
  exact-Jaccard SQL is the oracle), and the sign-LSH bucket rule is
  recomputed inside the oracle SQL itself (list_dot_product signs match
  Spark's double fold bit-for-bit; margins ~1e-3 on this corpus).

Every queries() entry has an oracle_sql() entry — no rows-only checks.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# ---------------------------------------------------------------------------
# Grok corpus (fixed-size deterministic; independent of sf_dir)
# ---------------------------------------------------------------------------

GROK_N = 2000

# The sf-proportional grok query scales its corpus off the documents
# table of the sf dir under test; oracle_sql() has no sf parameter, so
# the oracle side reads the dir from this env var (the driver's gate
# runs at sf0.01 — the default; tools/check_oracles.py exports its own
# sf_dir so the replica stays consistent at any scale).
ORACLE_SF_ENV = "SPARK_GRAFT_ORACLE_SF"
_DEFAULT_ORACLE_SF = "/root/testdata/sf0.01"


def _sf_grok_n(sf_dir: str) -> int:
    """Corpus rows for the sf-scaled grok query: 40x the documents
    rowcount of the sf dir (parquet metadata only — no data read)."""
    import pyarrow.parquet as pq

    return 40 * pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows


def _grok_seq_df(spark: SparkSession, n: int = GROK_N) -> DataFrame:
    """Distributed corpus generation (each executor renders its own row
    range — rows are pure functions of their index, so this is
    byte-identical to the driver-side ``iter_rows`` the oracles use,
    in any partitioning). Keeps the harness itself scale-free: the
    sf-proportional query's corpus never materializes on the driver."""
    from grokspark.datagen import sequences_df

    return sequences_df(spark, n)


@functools.lru_cache(maxsize=4)
def _grok_oracle_rows(n: int = GROK_N) -> dict[str, list[tuple]]:
    """Single-process reference run over the same corpus (the stand-in
    for the Rust reference's semantics; see FIXTURES.md §5)."""
    from grokspark import GrokRegistry
    from grokspark.datagen import SOURCES, iter_rows

    registry = GrokRegistry.with_default_patterns()
    compiled = {
        s: registry.compile(e, with_alias_only=True)
        for s, (_w, r, e) in SOURCES.items()
        if r
    }
    route_of = {s: r for s, (_w, r, _e) in SOURCES.items()}

    route_counts: dict[tuple, int] = {}
    unroutable: dict[str, int] = {}
    verb_status: dict[tuple, int] = {}
    elb_backend: dict[int, list[int]] = {}
    bacula_matched = 0
    bacula_jobids: set[str] = set()

    for row in iter_rows(n):
        src = row["source"]
        route = route_of.get(src)
        line = bytes(row["tokens"]).decode("utf-8")
        if route is None:
            unroutable[src] = unroutable.get(src, 0) + 1
            continue
        m = compiled[src].match_against(line)
        key = (route, m is not None)
        route_counts[key] = route_counts.get(key, 0) + 1
        if src == "apache_access" and m is not None:
            k = (m["verb"], int(m["response"]))
            verb_status[k] = verb_status.get(k, 0) + 1
        elif src == "elb" and m is not None:
            bp = int(m["backendport"])
            agg = elb_backend.setdefault(bp, [0, 0])
            agg[0] += 1
            agg[1] += int(m["received_bytes"])
        elif src == "bacula" and m is not None:
            bacula_matched += 1
            bacula_jobids.add(m["jobid"])

    return {
        "route_counts": sorted((r, mt, n) for (r, mt), n in route_counts.items()),
        "unroutable": sorted(unroutable.items()),
        "verb_status": sorted((v, s, n) for (v, s), n in verb_status.items()),
        "elb_backend": sorted((bp, a[0], a[1]) for bp, a in elb_backend.items()),
        "bacula": [(bacula_matched, len(bacula_jobids))],
    }


def _grok_text_df(spark: SparkSession, n: int = GROK_N) -> DataFrame:
    """The grok corpus as a (doc_id, source, text) document table —
    deterministic and sf-independent, so pure-Python VALUES oracles can
    cover text operators DuckDB cannot express (SimHash, PNG decode)."""
    from grokspark.datagen import iter_rows

    rows = [
        (r["doc_id"], r["source"], bytes(r["tokens"]).decode("utf-8"))
        for r in iter_rows(n)
    ]
    return spark.createDataFrame(rows, schema="doc_id string, source string, text string")


@functools.lru_cache(maxsize=1)
def _simhash_oracle_rows() -> list[tuple]:
    """Pure-Python SimHash band-bucket near-dup pairs over the grok
    corpus (same algorithm, single process — the independence is in the
    execution path, exactly like the grok-family oracles)."""
    from grokspark.datagen import iter_rows
    from grokspark.operators.dedup import simhash_py

    sigs = [
        (r["doc_id"], simhash_py(bytes(r["tokens"]).decode("utf-8")) & 0xFFFFFFFFFFFFFFFF)
        for r in iter_rows(GROK_N)
    ]
    buckets: dict[tuple, list] = {}
    for doc_id, sig in sigs:
        for b in range(4):
            buckets.setdefault((b, (sig >> (16 * b)) & 0xFFFF), []).append((doc_id, sig))
    pairs: dict[tuple, int] = {}
    for members in buckets.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                (da, ua), (db, ub) = members[i], members[j]
                if da == db:
                    continue
                if da > db:
                    da, db, ua, ub = db, da, ub, ua
                h = (ua ^ ub).bit_count()
                if h <= 3:
                    pairs[(da, db)] = h
    return sorted((a, b, h) for (a, b), h in pairs.items())


def _values_sql(rows: list[tuple], columns: list[tuple[str, str]]) -> str:
    """Build `SELECT ... FROM (VALUES ...) t(cols)` with explicit casts."""
    def lit(v):
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(v)

    if not rows:
        # empty relation with the right schema
        cols = ", ".join(f"CAST(NULL AS {t}) AS {n}" for n, t in columns)
        return f"SELECT {cols} WHERE FALSE"
    vals = ", ".join("(" + ", ".join(lit(v) for v in row) + ")" for row in rows)
    names = ", ".join(n for n, _t in columns)
    casts = ", ".join(f"CAST({n} AS {t}) AS {n}" for n, t in columns)
    return f"SELECT {casts} FROM (VALUES {vals}) AS t({names})"


# ---------------------------------------------------------------------------
# Entry
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: grok parse -> broadcast enrich -> route -> per-(route,
    matched) counts over the deterministic tokenized-sequence corpus."""
    from grokspark.pipeline import route_match_counts

    return route_match_counts(spark, _grok_seq_df(spark))


# ---------------------------------------------------------------------------
# Queries
# ---------------------------------------------------------------------------


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# -- grok family ------------------------------------------------------------


def q_grok_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from grokspark.pipeline import route_match_counts

    return route_match_counts(spark, _grok_seq_df(spark))


def q_grok_route_counts_sf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sf-PROPORTIONAL grok coverage: the same parse->enrich->route->
    count job over a corpus whose size scales with the sf dir (40x its
    documents rowcount — 20k rows at the gate's sf0.01, 200k at sf0.1),
    so larger scale factors exercise proportionally more parse volume.
    Oracle: the pure-Python reference run over the identical generator
    at the same n (oracle side reads the sf dir from
    $SPARK_GRAFT_ORACLE_SF, default sf0.01 = the driver's gate)."""
    from grokspark.pipeline import route_match_counts

    return route_match_counts(spark, _grok_seq_df(spark, _sf_grok_n(sf_dir)))


def q_grok_unroutable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join against the broadcast routes dim (dead-letter path)."""
    from grokspark.datagen import routes_df

    seq = _grok_seq_df(spark)
    routes = F.broadcast(routes_df(spark))
    return (
        seq.join(routes, "source", "left_anti")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _parse_source(spark: SparkSession, source: str) -> DataFrame:
    from grokspark import GrokRegistry
    from grokspark.datagen import SOURCES
    from grokspark.udfs import grok_parse_map_udf

    expr = SOURCES[source][2]
    compiled = GrokRegistry.with_default_patterns().compile(expr, with_alias_only=True)
    parse = grok_parse_map_udf(compiled, from_tokens=True)
    return (
        _grok_seq_df(spark)
        .filter(F.col("source") == source)
        .withColumn("fields", parse(F.col("tokens")))
    )


def q_grok_apache_verb_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = _parse_source(spark, "apache_access").filter(F.col("fields").isNotNull())
    return parsed.groupBy(
        F.element_at("fields", "verb").alias("verb"),
        F.element_at("fields", "response").cast("long").alias("response"),
    ).agg(F.count(F.lit(1)).alias("n"))


def q_grok_apache_verb_status_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME query on the JVM-native fast path (jvmgrok): detokenize
    via code points, RLIKE match, regexp_extract fields — no Python
    worker anywhere in the plan (plan-asserted in tests/test_jvmgrok).
    Shares the Python kernel's oracle: per-line parity is test-pinned,
    and every matched apache line carries verb+response (verified), so
    the ''-for-non-participating delta never reaches the group keys."""
    from grokspark.datagen import SOURCES
    from grokspark.jvmgrok import detokenize_col, jvm_field_col, jvm_match_col

    from grokspark import GrokRegistry

    compiled = GrokRegistry.with_default_patterns().compile(
        SOURCES["apache_access"][2], with_alias_only=True
    )
    lines = (
        _grok_seq_df(spark)
        .filter(F.col("source") == "apache_access")
        .withColumn("line", detokenize_col(F.col("tokens")))
        .filter(jvm_match_col(compiled, F.col("line")))
    )
    return lines.groupBy(
        jvm_field_col(compiled, F.col("line"), "verb").alias("verb"),
        jvm_field_col(compiled, F.col("line"), "response")
        .cast("long")
        .alias("response"),
    ).agg(F.count(F.lit(1)).alias("n"))


def q_grok_elb_backend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extracts (:int tags) aggregated per backend port."""
    from grokspark import GrokRegistry
    from grokspark.udfs import apply_extracts, grok_parse_map_udf
    from grokspark.datagen import SOURCES

    compiled = GrokRegistry.with_default_patterns().compile(
        SOURCES["elb"][2], with_alias_only=True
    )
    parse = grok_parse_map_udf(compiled, from_tokens=True)
    parsed = (
        _grok_seq_df(spark)
        .filter(F.col("source") == "elb")
        .withColumn("fields", parse(F.col("tokens")))
        .filter(F.col("fields").isNotNull())
    )
    typed = apply_extracts(parsed, compiled, "fields")
    return typed.groupBy("backendport").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("received_bytes").alias("sum_received"),
    )


def q_grok_bacula_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = _parse_source(spark, "bacula").filter(F.col("fields").isNotNull())
    return parsed.agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.countDistinct(F.element_at("fields", "jobid")).alias("n_jobids"),
    )


# -- relational family (TPC-H-ish) -------------------------------------------


def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") < F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_extendedprice"), 0).cast("long").alias("sum_base"),
        )
    )


def q_join_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash-join enrich + aggregate."""
    orders = _read(spark, sf_dir, "orders")
    customer = _read(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 0).cast("long").alias("revenue"),
        )
    )


def q_anti_join_quiet_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no order over 250k (left-anti join)."""
    orders = _read(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    customer = _read(spark, sf_dir, "customer")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    customer = _read(spark, sf_dir, "customer")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_window_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer by price (window row_number), counted
    per priority."""
    orders = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete quantiles per group (p50/p90 of order price by
    priority) via window rank selection — the values are raw column
    elements (no interpolation arithmetic), so they compare exactly
    across engines."""
    orders = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    ranked = orders.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("o_orderpriority"))
    )
    pick = lambda p: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("long"),
            F.col("o_totalprice"),
        )
    )
    return ranked.groupBy("o_orderpriority").agg(
        pick(0.5).alias("p50"), pick(0.9).alias("p90")
    )


def q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


def q_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping-sets aggregate."""
    li = _read(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))


def q_union_distinct_actors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops: users seen in error events UNION users with large values,
    deduplicated."""
    ev = _read(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "error").select("user_id")
    b = ev.filter(F.col("value") > 150).select("user_id")
    return a.unionByName(b).distinct()


def q_topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit (top-k by aggregate, deterministic tie-break)."""
    orders = _read(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 0).cast("long").alias("spend"))
        .orderBy(F.col("spend").desc(), F.col("o_custkey").asc())
        .limit(10)
    )


def q_events_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 0).cast("long").alias("sum_value"),
    )


def q_events_props_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex field extraction from a JSON-ish props column (the SQL-
    expressible cousin of the grok parse)."""
    ev = _read(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k": (\d+)', 1).cast("long")
    return ev.withColumn("k", k).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("k").alias("sum_k")
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min-gap sessions per user (lag + cumulative
    sum windows), exact integer microsecond arithmetic."""
    ev = _read(spark, sf_dir, "events")
    by_ts = Window.partitionBy("user_id").orderBy("ts")
    # events.ts is TIMESTAMP_NTZ; the UTC session cast is gap-invariant
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_us = us - F.lag(us).over(by_ts)
    new_sess = F.when(gap_us.isNull() | (gap_us > 1800 * 1_000_000), 1).otherwise(0)
    sess = ev.withColumn("new_sess", new_sess)
    return sess.groupBy("user_id").agg(F.sum("new_sess").cast("long").alias("n_sessions"))


def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: attach to every click the user's most recent error
    at-or-before it (union + per-key running-last window — one
    shuffle, no range explode; grokspark.operators.asof). Oracle:
    DuckDB's native ASOF LEFT JOIN with the same max-event_id
    tie-break, aggregated to exact integer lag sums."""
    from grokspark.operators import asof_join

    ev = _read(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    j = asof_join(clicks, errors, on="user_id", right_tiebreak="event_id")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return j.groupBy((F.col("user_id") % 8).alias("user_bucket")).agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.count("event_id_r").alias("n_matched"),
        F.sum(us("ts") - us("ts_r")).cast("long").alias("sum_lag_micros"),
        F.sum("event_id_r").cast("long").alias("sum_r_ids"),
    )


# -- training-data ops --------------------------------------------------------


PACK_MAX_LEN = 512
PACK_BUCKETS = 32


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing into <=512-token training rows (greedy by id
    within md5 hash buckets — deterministic regardless of
    partitioning). Aggregates pack counts, token totals, and the
    packed-row utilization; oracle: the identical pure-Python greedy
    per bucket, as VALUES."""
    from grokspark.operators import pack_sequences

    packs = pack_sequences(
        _grok_seq_df(spark), max_len=PACK_MAX_LEN, n_buckets=PACK_BUCKETS
    )
    return packs.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("sum_tok"),
        F.max("n_tok").alias("max_tok"),
        F.sum("n_truncated").cast("long").alias("n_truncated"),
    )


@functools.lru_cache(maxsize=1)
def _pack_oracle_rows() -> list[tuple]:
    """Pure-Python rerun of the identical bucketing + greedy packing."""
    import collections

    from grokspark.datagen import iter_rows
    from grokspark.operators.packing import pack_bucket_of, pack_sequences_py

    buckets: dict[int, list] = collections.defaultdict(list)
    for r in iter_rows(GROK_N):
        buckets[pack_bucket_of(r["doc_id"], PACK_BUCKETS)].append(
            (r["doc_id"], r["tokens"])
        )
    n_packs = n_docs = sum_tok = max_tok = n_trunc = 0
    for rows in buckets.values():
        for p in pack_sequences_py(rows, PACK_MAX_LEN):
            n_packs += 1
            n_docs += p["n_docs"]
            sum_tok += p["n_tok"]
            max_tok = max(max_tok, p["n_tok"])
            n_trunc += p["n_truncated"]
    return [(n_packs, n_docs, sum_tok, max_tok, n_trunc)]


SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
SAMPLE_FRACTION = 0.25


def q_hash_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by salted md5-prefix hash —
    stable under reruns/repartitioning/corpus growth, unlike
    randomSplit. Oracle: the identical hash + exact integer thresholds
    in SQL, so every assignment matches bit-for-bit."""
    from grokspark.operators import hash_split

    docs = hash_split(_read(spark, sf_dir, "documents"), SPLIT_WEIGHTS)
    return docs.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("doc_id").alias("sum_ids"),
    )


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~25% sample (nested across fractions, same rows
    every run). Oracle: same salted hash + threshold in SQL."""
    from grokspark.operators import hash_sample

    s = hash_sample(_read(spark, sf_dir, "documents"), SAMPLE_FRACTION)
    return s.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("doc_id").alias("sum_ids"),
        F.min("doc_id").alias("min_id"),
    )


RESERVOIR_K = 7


def q_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k per-source carve-out (fixed-size eval sets no matter
    how skewed the domain sizes): rank by salted id hash inside each
    source, keep the first k, semi-join the ids back. Oracle: the
    identical hash + row_number rule in SQL."""
    from grokspark.operators import reservoir_sample

    kept = reservoir_sample(
        _read(spark, sf_dir, "documents"), RESERVOIR_K, group_col="source"
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("sum_ids"),
        F.min("doc_id").alias("min_id"),
    )


MIXTURE_FRACTIONS = {"src0": 0.2, "src1": 0.5, "src2": 0.8, "src3": 0.0}
MIXTURE_DEFAULT = 0.9


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture downsampling (the pretraining data-mixing step):
    per-source keep fractions via the same salted-hash exact-ppm rule
    as hash_sample — scan-fused literal-map bound lookup, no join.
    Oracle: the identical hash + per-source integer thresholds in
    SQL."""
    from grokspark.operators import mixture_sample

    kept = mixture_sample(
        _read(spark, sf_dir, "documents"),
        MIXTURE_FRACTIONS,
        default=MIXTURE_DEFAULT,
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("sum_ids"),
    )


KMV_K = 64


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic distinct-count sketch (K-minimum-values over md5
    48-bit prefixes): unlike HLL, the estimate is reproducible
    bit-for-bit in the SQL oracle — one double division of two exactly-
    representable values. k=64 sketches the ~1.1k distinct o_custkeys
    at the gate sf (relative error ~1/sqrt(62))."""
    from grokspark.operators import kmv_distinct

    return kmv_distinct(_read(spark, sf_dir, "orders"), "o_custkey", k=KMV_K)


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy-hitter words (two-pass Misra-Gries,
    operators/sketches.py): terms above 3.3% of the token stream.
    The sketch bounds per-partition state and pass-2 shuffle width;
    the OUTPUT is exact, so the oracle is the plain full-groupBy SQL
    with the same strict integer threshold."""
    from grokspark.operators.sketches import heavy_hitter_tokens

    docs = _read(spark, sf_dir, "documents")
    return heavy_hitter_tokens(docs, phi_ppm=33_000).select("term", "cnt")


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from grokspark.operators import exact_dedup

    return exact_dedup(_read(spark, sf_dir, "documents"))


def q_dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTNESS BASELINE — quadratic within a block; at scale use
    dedup_minhash_lsh (same output here) or pass block_col."""
    from grokspark.operators import jaccard_pairs

    return jaccard_pairs(_read(spark, sf_dir, "documents"), threshold=0.5, n=2)


_DOC_PAIRS_CACHE: dict[tuple, tuple] = {}
_DSIR_WEIGHTS_CACHE: dict[tuple, tuple] = {}


def _dsir_weights_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-process cache of the DSIR weights table: dsir_select and
    dsir_resample consume the SAME weights (the two corpus-scale
    bucket-count aggregates dominate their cost — same sharing
    rationale as _doc_pairs). Materialized via localCheckpoint, so the
    cached plan is session-bound (session guard below); the bench
    clears this cache per sample so it still measures full builds."""
    from grokspark.operators import dsir_weights

    key = (sf_dir, DSIR_BUCKETS)
    hit = _DSIR_WEIGHTS_CACHE.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    docs = _read(spark, sf_dir, "documents")
    w = dsir_weights(
        docs.filter(F.col("doc_id") % 11 != 0),
        docs.filter(F.col("doc_id") % 11 == 0),
        n_buckets=DSIR_BUCKETS,
    ).localCheckpoint()
    _DSIR_WEIGHTS_CACHE[key] = (spark, w)
    return w


def _doc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-process cache of the exact-recall MinHash-LSH pair graph
    over the documents table. dedup_minhash_lsh, dedup_clusters and
    dedup_corpus all consume the SAME graph; building it three times
    was 91 s of the 232 s gate sweep (VERDICT r4 #2).
    ``minhash_lsh_pairs`` is eager (localCheckpoint inside), so the
    cached DataFrame is a materialized plan — valid only for the
    session that built it, hence the session guard."""
    from grokspark.operators import minhash_lsh_pairs

    key = (sf_dir, 0.5, 2, 64)
    hit = _DOC_PAIRS_CACHE.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    pairs = minhash_lsh_pairs(
        _read(spark, sf_dir, "documents"), threshold=0.5, n=2, bands=64
    )
    _DOC_PAIRS_CACHE[key] = (spark, pairs)
    return pairs


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-verified. bands=64 (r=2) puts
    the miss probability for a true pair at s>=0.5 below ~1e-8, so the
    output EQUALS the exact quadratic baseline and shares its oracle —
    precision is guaranteed by the verify step, recall by the band
    count. Candidate generation shuffles only (id, band_id, band_hash);
    plan-asserted in tests/test_plans.py."""
    return _doc_pairs(spark, sf_dir)


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: MinHash-LSH pair graph -> iterative hash-min
    connected components -> (doc_id, cluster_id = min doc_id of the
    component). Oracle: DuckDB recursive CTE over the exact-Jaccard
    pair graph (identical to the LSH graph at this scale — verified by
    the dedup_minhash_lsh oracle)."""
    from grokspark.operators import duplicate_clusters

    return duplicate_clusters(_doc_pairs(spark, sf_dir)).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup (daily-ingest shape): docs with
    doc_id % 10 == 0 play the NEW batch, the rest the existing corpus;
    every exact-verified cross pair at jaccard >= 0.5 comes back. The
    corpus side never shuffles for candidates (new bands broadcast);
    bands=64 keeps the exact-baseline recall argument, so the oracle
    is plain cross-set exact Jaccard."""
    from grokspark.operators import minhash_lsh_pairs_vs

    docs = _read(spark, sf_dir, "documents")
    return minhash_lsh_pairs_vs(
        docs.filter(F.col("doc_id") % 10 == 0),
        docs.filter(F.col("doc_id") % 10 != 0),
        threshold=0.5,
        n=2,
        bands=64,
    )


def q_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup decision table a training pipeline materializes:
    exact collapse -> MinHash-LSH pairs over representatives ->
    connected components -> (doc_id, cluster_id, keep) for EVERY
    document. Oracle: the identical rule in pure SQL (md5 collapse,
    inverted-index exact Jaccard — equal to the LSH output at bands=64
    — and a recursive CTE for the components). Reuses the shared
    full-corpus pair graph (restricting a superset's exact-verified
    pairs to the representative set equals recomputing over the reps
    — see dedup_corpus's precomputed_pairs contract)."""
    from grokspark.operators import dedup_corpus

    return dedup_corpus(
        _read(spark, sf_dir, "documents"),
        threshold=0.5,
        n=2,
        bands=64,
        precomputed_pairs=_doc_pairs(spark, sf_dir),
    ).select(
        "doc_id", F.col("cluster_id").cast("long").alias("cluster_id"), "keep"
    )


def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide approximate k-NN (every row gets its top-3 neighbors
    within hamming<=1 LSH probe buckets). Candidates via one bucket
    equi-join — embeddings never ride the probe explode. Oracle: DuckDB
    recomputes buckets and windows the hamming-filtered pairs."""
    from grokspark.operators import knn_join

    emb = _read(spark, sf_dir, "embeddings")
    return knn_join(emb, k=3, n_planes=8, probe_hamming=1, seed=42).select(
        "vec_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
    )


def q_knn_join_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100-TB-shaped kNN path: same candidate rule as knn_join but
    scored inside a cogrouped bucket-local numpy matmul (each query
    vector ships once per probe, not per candidate — ~100x less
    shuffle; see operators/similarity.py). Shares knn_join's SQL
    oracle: the candidate sets are identical (bucket sign margins on
    this corpus are ~1e-3, far above matmul-vs-fold summation ulps)
    and rank margins survive engine FP differences (test-asserted in
    tests/test_operators.py::test_knn_rank_margins...)."""
    from grokspark.operators import knn_join_blocked

    emb = _read(spark, sf_dir, "embeddings")
    return knn_join_blocked(
        emb, k=3, n_planes=8, probe_hamming=1, seed=42
    ).select(
        "vec_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
    )


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs over the deterministic corpus: banded
    candidates (pigeonhole-complete for hamming<=bands-1) + exact
    popcount verify. Oracle: the same algorithm run single-process in
    pure Python, embedded as VALUES."""
    from grokspark.operators import simhash_near_dup_pairs

    return simhash_near_dup_pairs(_grok_text_df(spark), max_hamming=3, bands=4)


def q_dedup_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTNESS BASELINE — quadratic within a block; at scale use
    dedup_embedding_lsh or pass block_col."""
    from grokspark.operators import embedding_cosine_pairs

    return embedding_cosine_pairs(
        _read(spark, sf_dir, "embeddings"), threshold=0.5
    ).select("id_a", "id_b")


def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via sign-LSH candidates (bucket hamming
    <= 2, one equi-join over id-only probes) + exact cosine verify —
    the scale path the quadratic dedup_embedding_pairs baselines.
    Oracle: DuckDB recomputes the buckets and applies the identical
    candidate + verify rule."""
    from grokspark.operators import embedding_lsh_pairs

    return embedding_lsh_pairs(
        _read(spark, sf_dir, "embeddings"),
        threshold=0.5,
        n_planes=8,
        probe_hamming=2,
        seed=42,
    ).select("id_a", "id_b")


SEMDEDUP_CELLS = 16
SEMDEDUP_THRESHOLD = 0.3


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): coarse k-means-cell assignment via
    the seeded-centroid quantizer (same bit-reproducible argmax-dot
    rule as the IVF gate query), then per-cell drop of any row with a
    smaller-id cell-mate at cosine >= 0.3 — the scale path's grouped
    float64 matmul. Oracle recomputes cells AND the drop rule in SQL
    from the same centroid literals; threshold margins on this corpus
    are ~1.8e-4 (measured), far above matmul-vs-fold rounding."""
    from grokspark.operators import semdedup
    from grokspark.operators.ivf import seeded_centroids

    emb = _read(spark, sf_dir, "embeddings")
    centroids = seeded_centroids(64, SEMDEDUP_CELLS, seed=42)
    return semdedup(emb, centroids, threshold=SEMDEDUP_THRESHOLD)


SEMDEDUP_LSH_PLANES = 4


def q_semdedup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with sign-LSH cells — the O(n log k) assignment
    variant (centroid assignment is O(n*k) and k must grow with the
    corpus; the scale probe measured that term as curvature 0.80).
    Same drop rule and prune kernel; oracle recomputes the bucket AND
    the rule from the same hyperplane literals (sign margins ~1e-3,
    cosine margins ~4e-4 on this corpus — measured)."""
    from grokspark.operators import semdedup_lsh

    emb = _read(spark, sf_dir, "embeddings")
    # dim=64 is the corpus embedding width (same literal the semdedup
    # centroid query seeds with) — passing it skips the per-sample
    # dim-probe driver job (ADVICE r5)
    return semdedup_lsh(
        emb, n_planes=SEMDEDUP_LSH_PLANES, threshold=SEMDEDUP_THRESHOLD, dim=64
    )


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from grokspark.operators import ann_brute_force_topk

    emb = _read(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    top = ann_brute_force_topk(emb, query, k=10)
    return top.join(emb.select("vec_id", "label"), "vec_id").select("vec_id", "label")


_ANN_INDEX_CACHE: dict[tuple, str] = {}


def _cached_index(kind: str, sf_dir: str, build) -> str:
    """Materialize an ANN index (parquet partitioned by its cell/bucket
    column) once per (kind, sf_dir) per process."""
    key = (kind, sf_dir)
    path = _ANN_INDEX_CACHE.get(key)
    if path is None:
        import atexit
        import shutil
        import tempfile

        path = tempfile.mkdtemp(prefix=f"grokspark_{kind}_index_")
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        build(path)
        _ANN_INDEX_CACHE[key] = path
    return path


def _ann_index_path(spark: SparkSession, sf_dir: str) -> str:
    from grokspark.operators import build_lsh_index

    return _cached_index(
        "lsh",
        sf_dir,
        lambda path: build_lsh_index(
            _read(spark, sf_dir, "embeddings"), path, n_planes=8, seed=42
        ),
    )


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-ANN over the MATERIALIZED bucket-partitioned index: the probe
    filter reaches the scan as PartitionFilters, so only the hamming<=2
    probe buckets (37 of 256) are read (pruning plan-asserted in
    tests/test_plans.py). Oracle: DuckDB recomputes the same buckets
    from the same hyperplanes and takes the exact cosine top-k of the
    probed rows."""
    from grokspark.operators import lsh_index_topk

    emb = _read(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    index = _ann_index_path(spark, sf_dir)
    return lsh_index_topk(
        spark, index, query, k=10, n_planes=8, probe_hamming=2, seed=42
    ).select("vec_id")


IVF_CELLS = 16
IVF_NPROBE = 4


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN over a MATERIALIZED coarse-quantizer index: rows
    partitioned by nearest-centroid cell, the query probes only the
    nprobe nearest cells (PartitionFilters pruning, executed-metrics
    asserted in tests), exact cosine top-k within them. Centroids are
    deterministic seeded Gaussians so the oracle recomputes the whole
    rule — cell assignment, probe selection, and top-k — in SQL from
    the same literals (dot products share the sequential double fold,
    so assignments agree bit-for-bit; see grokspark/operators/ivf.py).
    The trained-centroid path (MLlib k-means) is pytest-covered."""
    from grokspark.operators import build_ivf_index, ivf_topk, seeded_centroids

    emb = _read(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    centroids = seeded_centroids(64, IVF_CELLS, seed=42)
    index = _cached_index(
        "ivf",
        sf_dir,
        lambda path: build_ivf_index(emb, path, centroids),
    )
    return ivf_topk(
        spark, index, query, centroids, k=10, nprobe=IVF_NPROBE
    ).select("vec_id")


DSIR_BUCKETS = 4096
DSIR_K = 50


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): hashed unigram+bigram
    bucket distributions (salted 48-bit md5 % 4096 — the cross-engine
    hash), add-one-smoothed log importance ratios quantized ONCE per
    bucket to integer micro-nats, per-doc weight = exact integer sum,
    deterministic top-50. Target domain proxy = doc_id % 11 == 0, raw
    = the rest. Rounding margins at this corpus: 3.1e-3 micro-units
    (vs ~1e-9 ln-ulp noise); rank-50 cut separated by 1.6e5."""
    w = _dsir_weights_shared(spark, sf_dir)
    return (
        w.orderBy(F.col("weight_micro").desc(), F.col("doc_id").asc())
        .limit(DSIR_K)
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("weight_micro").cast("long").alias("weight_micro"),
        )
    )


def q_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR's actual selection rule — Gumbel-top-k importance
    resampling without replacement: key = weight_micro + seeded
    integer micro-nat Gumbel noise (salted md5 uniform; rounding
    margins 2.1e-5 micro-units vs ~1e-8 ln noise, measured), take
    the k largest. Exact integer keys -> engine-independent ranking."""
    from grokspark.operators.dsir import gumbel_micro_col

    w = _dsir_weights_shared(spark, sf_dir)
    keyed = w.withColumn(
        "key_micro", F.col("weight_micro") + gumbel_micro_col("doc_id")
    )
    return (
        keyed.orderBy(F.col("key_micro").desc(), F.col("doc_id").asc())
        .limit(DSIR_K)
        .select(
            "doc_id",
            F.col("weight_micro").cast("long").alias("weight_micro"),
            F.col("key_micro").cast("long").alias("key_micro"),
        )
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from grokspark.operators import quality_scores

    docs = quality_scores(_read(spark, sf_dir, "documents"))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("quality_keep").cast("long").alias("n_keep"),
    )


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from grokspark.operators import token_count

    docs = token_count(_read(spark, sf_dir, "documents"))
    return docs.groupBy("source").agg(
        F.sum("n_words").cast("long").alias("sum_words"),
        F.sum("n_pieces").cast("long").alias("sum_pieces"),
    )


def q_quantiles_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete quantiles of per-document word counts via the
    value-histogram plan (operators/sketches.py exact_quantiles):
    shuffle width = distinct counts, not rows; integer-only threshold
    rule mirrored by the oracle's cumulative-sum SQL."""
    from grokspark.operators import token_count
    from grokspark.operators.sketches import exact_quantiles

    docs = token_count(
        _read(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    )
    return exact_quantiles(docs, "n_words").select(
        "q_ppm", F.col("value").cast("long").alias("value")
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from grokspark.operators import lang_id

    docs = lang_id(_read(spark, sf_dir, "documents"))
    return docs.groupBy("lang", "lang_pred").agg(F.count(F.lit(1)).alias("n"))


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition-quality scores, map-only (no shuffle in
    the scoring itself; see textops.repetition_scores). Per-source
    keep counts plus the full per-doc rows for a deterministic 1-in-11
    sample (value coverage for the mode-bigram fold and both
    single-division ratios)."""
    from grokspark.operators import repetition_scores

    docs = repetition_scores(_read(spark, sf_dir, "documents"))
    return docs.filter(F.col("doc_id") % 11 == 0).select(
        "doc_id",
        "n_words",
        "dup_word_ratio",
        "top_bigram",
        F.col("top_bigram_cnt").cast("long").alias("top_bigram_cnt"),
        "top_bigram_ratio",
        F.col("repetition_keep").cast("long").alias("repetition_keep"),
    )


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over deterministically PII-salted documents (the
    corpus itself carries no emails/IPs, so each sampled doc is
    prefixed with synthesized PII derived from its id — both engines
    build the identical string). Checks per-kind counts AND the
    redacted text itself."""
    from grokspark.operators import redact_pii

    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 0)
    salted = docs.select(
        "doc_id",
        F.concat(
            F.lit("contact u"),
            F.col("doc_id"),
            F.lit("@ex.com or 10."),
            (F.col("doc_id") % 256),
            F.lit(".0.1 call 555-123-4567 "),
            F.col("text"),
        ).alias("text"),
    )
    out = redact_pii(salted)
    return out.select(
        "doc_id",
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_ipv4").cast("long").alias("n_ipv4"),
        F.col("n_phone").cast("long").alias("n_phone"),
        F.substring("redacted", 1, 64).alias("redacted_head"),
    )


_LM_CACHE: dict[str, tuple] = {}


def _lm_model(spark: SparkSession, sf_dir: str) -> tuple:
    """Per-process cache of the count-trained bigram LM over the
    documents table — lm_perplexity and lm_familiarity score with the
    SAME model (same sharing rationale as ``_doc_pairs``). The tables
    are localCheckpointed (tiny: Heaps-bounded key tables), so the hit
    is valid only for the session that built it."""
    from grokspark.operators.ngram_lm import train_bigram_lm

    hit = _LM_CACHE.get(sf_dir)
    if hit is not None and hit[0] is spark:
        return hit[1], hit[2], hit[3]
    uni, bi = train_bigram_lm(_read(spark, sf_dir, "documents"))
    uni = uni.localCheckpoint()
    bi = bi.localCheckpoint()
    v = uni.count()
    _LM_CACHE[sf_dir] = (spark, uni, bi, v)
    return uni, bi, v


def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style bigram-LM cross-entropy (operators/ngram_lm.py):
    add-one-smoothed LM count-trained on the FULL documents table (two
    distributed aggregates), then a 1-in-7 doc sample scored via
    broadcast joins. Comparison point is ``ce_micro`` (integer
    micro-nats): the per-bigram probability is one exact-integer
    division, and the quantization absorbs ln/sum-order ulps (noise
    ~1e-12 vs a 5e-7 boundary)."""
    from grokspark.operators.ngram_lm import perplexity_scores

    docs = _read(spark, sf_dir, "documents")
    uni, bi, v = _lm_model(spark, sf_dir)
    sample = docs.filter(F.col("doc_id") % 7 == 0)
    return perplexity_scores(sample, uni, bi, vocab_size=v).select(
        "doc_id", "n_bigrams", "ce_micro"
    )


def q_lm_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcendental-free LM signal (operators/ngram_lm.py
    familiarity_scores): mean corpus frequency of each sampled doc's
    bigrams — integer sums plus ONE double division, bit-equal across
    engines at any scale."""
    from grokspark.operators.ngram_lm import familiarity_scores

    docs = _read(spark, sf_dir, "documents")
    _uni, bi, _v = _lm_model(spark, sf_dir)
    sample = docs.filter(F.col("doc_id") % 5 == 0)
    return familiarity_scores(sample, bi).select(
        "doc_id", "n_bigrams", "sum_cnt", "mean_cnt"
    )


_BM25_QUERIES = [
    ("q1", "hash join order"),
    ("q2", "fast scan filter table"),
    ("q3", "vector window group batch"),
]

# repr() of the Python doubles Spark's F.lit carries — the SQL parses
# these shortest-round-trip strings back to the IDENTICAL doubles
from grokspark.operators.retrieval import B as _BM25_B_F  # noqa: E402
from grokspark.operators.retrieval import K1 as _BM25_K1_F  # noqa: E402

_BM25_K1 = repr(_BM25_K1_F)
_BM25_K1P1 = repr(_BM25_K1_F + 1.0)
_BM25_OMB = repr(1.0 - _BM25_B_F)
_BM25_B = repr(_BM25_B_F)
_BM25_VALUES = ", ".join(
    "(" + repr(qid) + ", " + repr(qt) + ")" for qid, qt in _BM25_QUERIES
)


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 retrieval (operators/retrieval.py) for three fixed
    literal queries over the documents table. Every score input is an
    exact integer or an exactly-representable literal; the oracle SQL
    mirrors the IEEE op order, and the integer micro-unit score
    absorbs ln/sum-order ulps."""
    from grokspark.operators.retrieval import bm25_topk

    docs = _read(spark, sf_dir, "documents")
    queries = spark.createDataFrame(_BM25_QUERIES, "query_id string, text string")
    return bm25_topk(docs, queries, k=10).select(
        "query_id", "rank", "doc_id", "score_micro"
    )


def _c4_page_col(text, did):
    """Deterministic multi-line "web page" fabricated from the flat
    documents text (which has no newlines or punctuation): 7-word
    lines; ~3/4 of lines end in a period; every line where
    ``(doc_id + 31*i) % 11 == 0`` gets a "JavaScript" marker; every
    17th doc a "lorem ipsum" line; every 19th doc a curly-brace line
    — so every C4 rule fires on the gate corpus.  ``_c4_page_py`` is
    the character-exact twin."""
    ws = F.split(F.trim(text), r"\s+")
    n = F.size(ws)

    # One O(words) zip_with pass: word k carries its separator — " "
    # inside a line, or the line's suffix (tags + "." + "\n") when it
    # closes line j = k div 7. The previous form took a slice PER LINE
    # (the O(words^2) interpreted pattern ngrams' docstring warns
    # about) and was ~5 s single-core at sf1.0 for a byte-identical
    # string (twin-checked on every sf).
    def piece(w, k):
        j = F.floor(k / F.lit(7))
        line_end = (F.pmod(k + 1, 7) == 0) | (k == n - 1)
        js = F.pmod(did + F.lit(31) * j, 11) == 0
        period = F.pmod(did + j, 4) != 3
        suffix = F.concat(
            F.when(js, F.lit(" embedded JavaScript snippet")).otherwise(
                F.lit("")
            ),
            F.when(period, F.lit(".")).otherwise(F.lit("")),
            F.when(k == n - 1, F.lit("")).otherwise(F.lit("\n")),
        )
        return F.concat(w, F.when(line_end, suffix).otherwise(F.lit(" ")))

    page = F.array_join(
        F.zip_with(ws, F.sequence(F.lit(0), n - 1), piece), ""
    )
    page = F.when(
        F.pmod(did, 17) == 0,
        F.concat(page, F.lit("\nlorem ipsum dolor sit amet obscura.")),
    ).otherwise(page)
    page = F.when(
        F.pmod(did, 19) == 0,
        F.concat(page, F.lit("\nsee the { config } block for details.")),
    ).otherwise(page)
    return F.when(text.isNull(), text).otherwise(page)


def _c4_page_py(did: int, text):
    """Pure-Python twin of `_c4_page_col` (same split, same tags)."""
    if text is None:
        return None
    from grokspark.operators.clean import _WS_ASCII

    ws = _WS_ASCII.split(text.strip())
    nl = (len(ws) + 6) // 7
    lines = []
    for i in range(nl):
        base = " ".join(ws[i * 7 : (i + 1) * 7])
        if (did + 31 * i) % 11 == 0:
            base += " embedded JavaScript snippet"
        if (did + i) % 4 != 3:
            base += "."
        lines.append(base)
    page = "\n".join(lines)
    if did % 17 == 0:
        page += "\nlorem ipsum dolor sit amet obscura."
    if did % 19 == 0:
        page += "\nsee the { config } block for details."
    return page


def _c4_oracle_rows(sf_dir: str) -> list[tuple]:
    """Pure-Python C4 cleaning over fabricated pages from the sf dir's
    documents parquet: ``(doc_id, n_lines_in, n_lines_kept,
    n_sentences, kept, md5(text_clean))``.  <0.1 s at gate scale."""
    import hashlib

    import pyarrow.parquet as pq

    from grokspark.operators.clean import c4_clean_py

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    rows = [
        (did, _c4_page_py(did, tx))
        for did, tx in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        )
    ]
    return [
        (did, nin, nkept, nsent, kept,
         hashlib.md5(clean.encode("utf-8")).hexdigest())
        for did, clean, nin, nkept, nsent, kept in c4_clean_py(rows)
    ]


def q_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level cleaning (operators/clean.py) over
    deterministic multi-line pages fabricated from the documents
    table (`_c4_page_col`).  Map-only: every rule is a scan-fused
    built-in.  Oracle: the pure-Python twin over the same parquet, as
    VALUES."""
    from grokspark.operators.clean import c4_clean
    from grokspark.operators.dedup import _ensure_parallelism

    # spread the single-split local scan BEFORE the page projection so
    # the fabrication + cleaning chain runs on the full core pool
    docs = _ensure_parallelism(_read(spark, sf_dir, "documents"))
    pages = docs.select(
        "doc_id", _c4_page_col(F.col("text"), F.col("doc_id")).alias("text")
    )
    return c4_clean(pages).select(
        "doc_id",
        "n_lines_in",
        "n_lines_kept",
        "n_sentences",
        "kept",
        F.md5(F.col("text_clean")).alias("clean_md5"),
    )


def _span_oracle_rows(sf_dir: str) -> list[tuple]:
    """Pure-Python exact-substring removal over the sf dir's documents
    parquet (spandedup twin): ``(doc_id, n_spans, n_removed_chars,
    md5(clean_text))`` for every affected doc — the VALUES oracle for
    span_dedup. ~0.2 s at the gate corpus."""
    import hashlib

    import pyarrow.parquet as pq

    from grokspark.operators.spandedup import (
        duplicate_spans_py,
        remove_spans_py,
    )

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    rows = list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
    spans = duplicate_spans_py(rows, min_len=40)
    text_by_id = dict(rows)
    out = []
    for did, ivs in sorted(spans.items()):
        clean = remove_spans_py(text_by_id[did], ivs)
        out.append(
            (
                did,
                len(ivs),
                sum(e - s for s, e in ivs),
                hashlib.md5(clean.encode("utf-8")).hexdigest(),
            )
        )
    return out


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring removal (operators/spandedup.py,
    Lee et al. 2022): every >= 40-char span occurring twice in the
    corpus keeps only its globally-first occurrence. Output: the
    affected docs with span counts and an md5 of the cleaned text
    (both engines hash the same UTF-8 bytes). Oracle: the pure-Python
    twin over the same parquet, as VALUES."""
    from grokspark.operators.spandedup import span_dedup

    docs = _read(spark, sf_dir, "documents")
    out = span_dedup(docs, min_len=40)
    return out.filter(F.col("n_spans") > 0).select(
        "doc_id",
        "n_spans",
        "n_removed_chars",
        F.md5(F.col("text")).alias("clean_md5"),
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs with doc_id % 50 == 0 stand in
    for the eval suite; every other doc sharing a word 3-gram with
    them is flagged with its distinct-hit count. Exact (broadcast hash
    candidates + string verify — operators/decontam.py); oracle is
    plain n-gram set intersection."""
    from grokspark.operators import decontaminate

    docs = _read(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    return decontaminate(train, bench, n=3).select(
        "doc_id", F.col("n_hits").cast("long").alias("n_hits")
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from grokspark.operators import fingerprint

    docs = fingerprint(_read(spark, sf_dir, "documents"))
    return docs.groupBy("lang").agg(
        F.countDistinct("fp").alias("n_distinct_fp"),
        F.count(F.lit(1)).alias("n_docs"),
    )


WINNOW_MIN_SHARED = 20
WINNOW_MAX_FP_DF = 50


def q_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling-hash) fingerprints, aggregated per lang.
    Oracle: the pure-Python mirror of the identical normalization /
    k-gram fold / window-minima rule, run single-process over the same
    parquet (VALUES)."""
    from grokspark.operators import winnow_fingerprints

    docs = _read(spark, sf_dir, "documents")
    fps = winnow_fingerprints(docs)
    joined = fps.join(docs.select(F.col("doc_id").alias("id"), "lang"), "id")
    return joined.groupBy("lang").agg(
        F.countDistinct("fp").alias("n_distinct_fp"),
        F.count(F.lit(1)).alias("n_doc_fps"),
    )


def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by shared winnowing fingerprints through the
    inverted-index join, with the hot-fp document-frequency cap that
    keeps the join bounded at scale. Oracle: pure-Python inverted
    index over the same parquet with the same cap and threshold."""
    from grokspark.operators import winnow_pairs

    docs = _read(spark, sf_dir, "documents")
    return winnow_pairs(
        docs, min_shared=WINNOW_MIN_SHARED, max_fp_df=WINNOW_MAX_FP_DF
    ).select("id_a", "id_b", F.col("n_shared").cast("long").alias("n_shared"))


@functools.lru_cache(maxsize=4)
def _winnow_oracle_rows(sf_dir: str) -> dict[str, list[tuple]]:
    """Pure-Python winnowing over the sf dir's documents parquet:
    per-lang fp aggregates + capped inverted-index pairs (the VALUES
    oracles for fingerprint_winnow / winnow_pairs)."""
    import collections

    import pyarrow.parquet as pq

    from grokspark.operators.textops import winnow_fingerprints_py

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    rows = zip(
        t.column("doc_id").to_pylist(),
        t.column("text").to_pylist(),
        t.column("lang").to_pylist(),
    )
    per_lang_n: dict[str, int] = collections.Counter()
    per_lang_distinct: dict[str, set] = collections.defaultdict(set)
    inv: dict[int, list[str]] = collections.defaultdict(list)
    for did, text, lang in rows:
        fps = winnow_fingerprints_py(text)
        per_lang_n[lang] += len(fps)
        per_lang_distinct[lang].update(fps)
        for fp in fps:
            inv[fp].append(did)
    pairs: dict[tuple, int] = collections.Counter()
    for fp, ids in inv.items():
        if len(ids) > WINNOW_MAX_FP_DF:
            continue
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs[(ids[i], ids[j])] += 1
    return {
        "per_lang": sorted(
            (lang, len(per_lang_distinct[lang]), per_lang_n[lang])
            for lang in per_lang_n
        ),
        "pairs": sorted(
            (a, b, n) for (a, b), n in pairs.items() if n >= WINNOW_MIN_SHARED
        ),
    }


# -- BPE tokenizer / end-to-end corpus prep ---------------------------------

BPE_MERGES = 160
CORPUS_MAX_LEN = 256
CORPUS_BUCKETS = 8
CORPUS_MERGES = 120


def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL distributed BPE (replaces token_count's regex piece proxy):
    one corpus-wide word-frequency aggregate, the deterministic merge
    loop (max count, lexicographically-smallest tie-break) over the
    bounded word table, then Arrow-batched apply with per-batch word
    memoization. Oracle: the identical train+apply run single-process
    over the same parquet (VALUES — merge selection is exact-integer,
    so the merge tables match exactly)."""
    from grokspark.operators.bpe import (
        apply_bpe_ids,
        bpe_vocab,
        train_bpe_py,
        word_counts_df,
    )

    docs = _read(spark, sf_dir, "documents")
    counts = {r["word"]: r["n"] for r in word_counts_df(docs).collect()}
    merges = train_bpe_py(counts, BPE_MERGES)
    vocab = bpe_vocab(counts, merges)
    toks = apply_bpe_ids(docs, merges, vocab)
    return toks.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("tokens")).cast("long").alias("sum_tok"),
        F.sum(
            F.aggregate("tokens", F.lit(0).cast("long"), lambda a, x: a + x)
        ).cast("long").alias("sum_ids"),
    )


@functools.lru_cache(maxsize=4)
def _bpe_oracle_rows(sf_dir: str) -> list[tuple]:
    """Single-process BPE train+apply over the sf documents parquet."""
    import pyarrow.parquet as pq

    from grokspark.operators.bpe import (
        bpe_vocab,
        encode_word,
        pretokenize,
        train_bpe_py,
    )

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    rows = list(
        zip(t.column("text").to_pylist(), t.column("lang").to_pylist())
    )
    counts: dict[str, int] = {}
    for text, _lang in rows:
        for w in pretokenize(text):
            counts[w] = counts.get(w, 0) + 1
    merges = train_bpe_py(counts, BPE_MERGES)
    vocab = bpe_vocab(counts, merges)
    ranks = {p: i for i, p in enumerate(merges)}
    memo: dict[str, list[int]] = {}
    agg: dict[str, list[int]] = {}
    for text, lang in rows:
        ids: list[int] = []
        for w in pretokenize(text):
            if w not in memo:
                memo[w] = [vocab.get(s, 0) for s in encode_word(w, ranks)]
            ids.extend(memo[w])
        a = agg.setdefault(lang, [0, 0, 0])
        a[0] += 1
        a[1] += len(ids)
        a[2] += sum(ids)
    return sorted((lang, a[0], a[1], a[2]) for lang, a in agg.items())


def q_corpus_prepare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE composed end-to-end training-corpus job: quality filter ->
    dedup_corpus -> hash split -> BPE tokenize (trained on the train
    split only) -> sequence packing, each stage individually
    oracle-green, composed into the packed table a trainer reads.
    Oracle: the identical single-process composition
    (grokspark.operators.corpus.prepare_corpus_py) over the same
    parquet, as VALUES — every stage is deterministic and partition-
    independent, so the packed rows match bit-for-bit."""
    from grokspark.operators.corpus import prepare_corpus

    docs = _read(spark, sf_dir, "documents")
    # r6: the pair graph is computed over the quality REPRESENTATIVES
    # inside dedup_corpus rather than forwarded from the full-corpus
    # _doc_pairs artifact — restriction-equivalence (dedup_corpus's
    # precomputed_pairs contract) makes the outputs identical, but the
    # rep set is ~27% smaller than the corpus and LSH candidate volume
    # scales ~quadratically with it, so the build this query actually
    # pays (the bench clears the shared cache per sample, and the
    # sweep's sharing saved less than the oversized build cost) drops
    # ~2x. The artifact-reuse pattern itself stays available via the
    # precomputed_pairs parameter and the three dedup gate queries.
    packed = prepare_corpus(
        docs,
        max_len=CORPUS_MAX_LEN,
        n_buckets=CORPUS_BUCKETS,
        n_merges=CORPUS_MERGES,
    )
    return packed.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("sum_tok"),
        F.max("n_tok").alias("max_tok"),
        F.sum("n_truncated").cast("long").alias("n_truncated"),
    )


@functools.lru_cache(maxsize=4)
def _corpus_prepare_oracle_rows(sf_dir: str) -> list[tuple]:
    import pyarrow.parquet as pq

    from grokspark.operators.corpus import prepare_corpus_py

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = list(
        zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    )
    rows = prepare_corpus_py(
        docs,
        max_len=CORPUS_MAX_LEN,
        n_buckets=CORPUS_BUCKETS,
        n_merges=CORPUS_MERGES,
    )
    agg: dict[str, list[int]] = {}
    for r in rows:
        a = agg.setdefault(r["split"], [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += r["n_docs"]
        a[2] += r["n_tok"]
        a[3] = max(a[3], r["n_tok"])
        a[4] += r["n_truncated"]
    return sorted((s, *a) for s, a in agg.items())


# -- trained-centroid IVF (rows-level recall gate) --------------------------

IVF_TRAINED_CELLS = 8
IVF_TRAINED_NPROBE = 6
IVF_TRAINED_QUERIES = 5
IVF_TRAINED_MIN_HITS = 8

_IVF_TRAINED_CACHE: dict = {}


def q_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTUAL-scale IVF path — MLlib k-means trained centroids —
    gate-covered: for 5 fixed query vectors, recall@10 of the trained-
    IVF probe search vs the exact in-Spark brute force. The oracle pins
    the expected OUTCOME (recall@10 >= 8/10 for every query) rather
    than recomputing k-means in SQL: trained centroids are data-
    dependent floats, so the gate checks the property a user relies on
    — the probe search finds the true neighbors — with enough margin
    (nprobe=6 of 8 cells) that k-means tie jitter cannot flip it."""
    from grokspark.operators import (
        ann_brute_force_topk,
        build_ivf_index,
        ivf_topk,
        train_ivf_centroids,
    )

    emb = _read(spark, sf_dir, "embeddings")
    cached = _IVF_TRAINED_CACHE.get(sf_dir)
    if cached is None:
        centroids = train_ivf_centroids(emb, IVF_TRAINED_CELLS, seed=42)
        index = _cached_index(
            "ivf_trained",
            sf_dir,
            lambda p: build_ivf_index(emb, p, centroids),
        )
        cached = (centroids, index)
        _IVF_TRAINED_CACHE[sf_dir] = cached
    centroids, index = cached
    # one collect for all query vectors instead of one head() job per
    # query (5 fewer driver jobs per sweep evaluation)
    qvecs = {
        r["vec_id"]: r["embedding"]
        for r in emb.filter(F.col("vec_id") < IVF_TRAINED_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    }
    rows = []
    for qid in range(IVF_TRAINED_QUERIES):
        qvec = qvecs[qid]
        exact = {r[0] for r in ann_brute_force_topk(emb, qvec, k=10).collect()}
        approx = {
            r[0]
            for r in ivf_topk(
                spark, index, qvec, centroids, k=10, nprobe=IVF_TRAINED_NPROBE
            ).collect()
        }
        rows.append((qid, len(exact & approx) >= IVF_TRAINED_MIN_HITS))
    return spark.createDataFrame(rows, "query_id int, recall_ok boolean")


@functools.lru_cache(maxsize=1)
def _multimodal_oracle_rows() -> list[tuple]:
    """Single-process reference: fabricate the same deterministic PNGs
    and decode them with the same pure-stdlib codec."""
    import hashlib

    from grokspark.datagen import iter_rows
    from grokspark.operators.png import fake_png, png_features

    n = sum_w = sum_h = sum_luma = 0
    sha1s: set[str] = set()
    for r in iter_rows(GROK_N):
        text = bytes(r["tokens"]).decode("utf-8")
        payload = fake_png(r["doc_id"], text)
        feats = png_features(payload)
        n += 1
        sum_w += feats["width"]
        sum_h += feats["height"]
        sum_luma += feats["luma_milli"]
        sha1s.add(hashlib.sha1(payload).hexdigest())
    return [("image", n, sum_w, sum_h, sum_luma, len(sha1s))]


_MM_COLS = [
    ("modality", "VARCHAR"),
    ("n", "BIGINT"),
    ("sum_width", "BIGINT"),
    ("sum_height", "BIGINT"),
    ("sum_luma_milli", "BIGINT"),
    ("n_distinct", "BIGINT"),
]

RESIZE_MAX_DIM = 6
VIDEO_N = 500
VIDEO_FRAMES = 4
VIDEO_STRIDE = 2


@functools.lru_cache(maxsize=1)
def _resize_oracle_rows() -> list[tuple]:
    """Single-process reference for the resize query: fabricate,
    thumbnail, decode — same stdlib code path as the Spark kernel."""
    import hashlib

    from grokspark.datagen import iter_rows
    from grokspark.operators.png import fake_png, png_features, thumbnail_png

    n = sum_w = sum_h = sum_luma = 0
    sha1s: set[str] = set()
    for r in iter_rows(GROK_N):
        text = bytes(r["tokens"]).decode("utf-8")
        thumb = thumbnail_png(fake_png(r["doc_id"], text), RESIZE_MAX_DIM)
        feats = png_features(thumb)
        n += 1
        sum_w += feats["width"]
        sum_h += feats["height"]
        sum_luma += feats["luma_milli"]
        sha1s.add(hashlib.sha1(thumb).hexdigest())
    return [("image", n, sum_w, sum_h, sum_luma, len(sha1s))]


@functools.lru_cache(maxsize=1)
def _video_oracle_rows() -> list[tuple]:
    """Single-process reference for frame sampling: same GSV1
    fabricate -> stride-sample -> per-frame decode."""
    import hashlib

    from grokspark.datagen import iter_rows
    from grokspark.operators.png import decode_video, fake_video, png_features

    n = sum_w = sum_h = sum_luma = 0
    sha1s: set[str] = set()
    for r in iter_rows(VIDEO_N):
        text = bytes(r["tokens"]).decode("utf-8")
        frames = decode_video(fake_video(r["doc_id"], text, VIDEO_FRAMES))
        for idx in range(0, len(frames), VIDEO_STRIDE):
            feats = png_features(frames[idx])
            n += 1
            sum_w += feats["width"]
            sum_h += feats["height"]
            sum_luma += feats["luma_milli"]
            sha1s.add(hashlib.sha1(frames[idx]).hexdigest())
    return [("image", n, sum_w, sum_h, sum_luma, len(sha1s))]


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, distributed: deterministic PNG payloads
    rendered per row in mapInPandas, decoded with the pure-stdlib PNG
    codec (zlib+struct — no external codec), integer-exact luma stats.
    Oracle: the identical fabricate+decode run single-process, as
    VALUES."""
    from grokspark.operators.multimodal import extract_image_features, png_payload_df

    payloads = png_payload_df(_grok_text_df(spark))
    feats = extract_image_features(payloads, fake=False)
    return feats.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("width").cast("long").alias("sum_width"),
        F.sum("height").cast("long").alias("sum_height"),
        F.sum("luma_milli").alias("sum_luma_milli"),
        F.countDistinct("sha1").alias("n_distinct"),
    )


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, distributed: deterministic RIFF/WAVE PCM16
    payloads rendered per row in mapInPandas, decoded with the stdlib
    wave codec, integer-exact features (isqrt RMS — no float sqrt).
    Oracle: identical fabricate+decode single-process, as VALUES."""
    from grokspark.operators.audio import extract_audio_features, wav_payload_df

    feats = extract_audio_features(wav_payload_df(_grok_text_df(spark)))
    return _audio_agg(feats)


def q_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL distributed audio resample (decimation by 4): decode,
    keep every 4th sample, re-encode, re-featurize. Oracle: the same
    two-step chain single-process."""
    from grokspark.operators.audio import (
        extract_audio_features,
        resample_audio,
        wav_payload_df,
    )

    payloads = wav_payload_df(_grok_text_df(spark))
    feats = extract_audio_features(resample_audio(payloads, AUDIO_DECIMATE))
    return _audio_agg(feats)


AUDIO_DECIMATE = 4


def _audio_agg(feats: DataFrame) -> DataFrame:
    return feats.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_samples").alias("sum_samples"),
        F.sum("duration_ms").alias("sum_duration_ms"),
        F.sum("rms_milli").alias("sum_rms_milli"),
        F.sum("zero_crossings").alias("sum_zc"),
        F.countDistinct("sha1").alias("n_distinct"),
    )


@functools.lru_cache(maxsize=1)
def _audio_oracle_rows() -> dict[str, list[tuple]]:
    """Single-process reference: fabricate the same WAVs, decode with
    the same stdlib codec — raw and decimated."""
    import hashlib as _hashlib

    from grokspark.datagen import iter_rows
    from grokspark.operators.audio import fake_wav, resample_wav, wav_features

    out = {}
    for mode in ("raw", "resampled"):
        n = s_samp = s_dur = s_rms = s_zc = 0
        sha1s: set[str] = set()
        for r in iter_rows(GROK_N):
            text = bytes(r["tokens"]).decode("utf-8")
            payload = fake_wav(r["doc_id"], text)
            if mode == "resampled":
                payload = resample_wav(payload, AUDIO_DECIMATE)
            f = wav_features(payload)
            n += 1
            s_samp += f["n_samples"]
            s_dur += f["duration_ms"]
            s_rms += f["rms_milli"]
            s_zc += f["zero_crossings"]
            sha1s.add(_hashlib.sha1(payload).hexdigest())
        out[mode] = [("audio", n, s_samp, s_dur, s_rms, s_zc, len(sha1s))]
    return out


_AUDIO_COLS = [
    ("modality", "VARCHAR"),
    ("n", "BIGINT"),
    ("sum_samples", "BIGINT"),
    ("sum_duration_ms", "BIGINT"),
    ("sum_rms_milli", "BIGINT"),
    ("sum_zc", "BIGINT"),
    ("n_distinct", "BIGINT"),
]


def _feature_agg(feats: DataFrame) -> DataFrame:
    return feats.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("width").cast("long").alias("sum_width"),
        F.sum("height").cast("long").alias("sum_height"),
        F.sum("luma_milli").alias("sum_luma_milli"),
        F.countDistinct("sha1").alias("n_distinct"),
    )


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL distributed image resize: PNG payloads decoded, nearest-
    neighbor thumbnailed to max dim 6, re-encoded, then feature-
    extracted — the vision-preprocessing step. Oracle: identical
    fabricate+thumbnail+decode single-process, as VALUES."""
    from grokspark.operators.multimodal import (
        extract_image_features,
        png_payload_df,
        resize_images,
    )

    payloads = png_payload_df(_grok_text_df(spark))
    thumbs = resize_images(payloads, max_dim=RESIZE_MAX_DIM)
    return _feature_agg(extract_image_features(thumbs, fake=False))


JPEG_N = 500  # oracle fabricates+decodes JPEGs at oracle_sql() build
# time (pure Python); N sized to keep that under the <2 s budget


@functools.lru_cache(maxsize=1)
def _jpeg_oracle_rows() -> list[tuple]:
    """Single-process reference: fabricate the same deterministic
    baseline JPEGs (mixed 4:4:4 / 4:2:0, keyed off the id digest like
    ``jpeg_payload_df``) and decode them with the same pure-Python
    codec (grokspark/operators/jpeg.py)."""
    import hashlib

    from grokspark.datagen import iter_rows
    from grokspark.operators.jpeg import fake_jpeg, jpeg_features

    n = sum_w = sum_h = sum_luma = 0
    sha1s: set[str] = set()
    for r in iter_rows(JPEG_N):
        text = bytes(r["tokens"]).decode("utf-8")
        sub = hashlib.sha256(r["doc_id"].encode()).digest()[2] % 2 == 0
        payload = fake_jpeg(r["doc_id"], text, subsample_420=sub)
        feats = jpeg_features(payload)
        n += 1
        sum_w += feats["width"]
        sum_h += feats["height"]
        sum_luma += feats["luma_milli"]
        sha1s.add(hashlib.sha1(payload).hexdigest())
    return [("image", n, sum_w, sum_h, sum_luma, len(sha1s))]


def q_multimodal_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode, distributed: deterministic JPEG
    payloads (huffman-coded, mixed 4:4:4/4:2:0 subsampling) rendered
    per row in mapInPandas and decoded with the pure-Python baseline
    codec — Y-plane-exact luma stats. Oracle: the identical
    fabricate+decode run single-process, as VALUES."""
    from grokspark.operators.multimodal import (
        extract_image_features,
        jpeg_payload_df,
    )

    payloads = jpeg_payload_df(_grok_text_df(spark, JPEG_N))
    return _feature_agg(extract_image_features(payloads, fake=False))


def q_video_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frame sampling: GSV1 video containers (PNG frames) parsed
    distributed, every 2nd frame kept (1->N fan-out inside
    mapInPandas), frames decoded and aggregated. Oracle: identical
    fabricate -> stride-sample -> decode single-process, as VALUES."""
    from grokspark.operators.multimodal import (
        extract_image_features,
        sample_video_frames,
        video_payload_df,
    )

    videos = video_payload_df(
        _grok_text_df(spark, VIDEO_N), n_frames=VIDEO_FRAMES
    )
    frames = sample_video_frames(videos, stride=VIDEO_STRIDE)
    return _feature_agg(extract_image_features(frames, fake=False))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDERING IS DELIBERATE (VERDICT r5 action #1): the round-5 driver
    # gate checked exactly the FIRST 50 dict entries, leaving the 20
    # tail queries without a driver-green row purely by construction
    # order. The 20 previously-unchecked queries now lead (cheapest
    # first), followed by the previously-checked 50 in their original
    # relative order — if a future gate truncates again, it drops
    # queries that already have green rows, not never-checked ones.
    return {
        # previously unchecked (driver-gate priority)
        "token_counts": q_token_counts,
        "lang_id": q_lang_id,
        "quantiles_tokens": q_quantiles_tokens,
        "repetition": q_repetition,
        "redact_pii": q_redact_pii,
        "fingerprint": q_fingerprint,
        "c4_clean": q_c4_clean,
        "decontaminate": q_decontaminate,
        "lm_familiarity": q_lm_familiarity,
        "lm_perplexity": q_lm_perplexity,
        "bm25_topk": q_bm25_topk,
        "span_dedup": q_span_dedup,
        "fingerprint_winnow": q_fingerprint_winnow,
        "winnow_pairs": q_winnow_pairs,
        "multimodal_features": q_multimodal_features,
        "multimodal_resize": q_multimodal_resize,
        "multimodal_jpeg": q_multimodal_jpeg,
        "audio_features": q_audio_features,
        "audio_resample": q_audio_resample,
        "video_frame_features": q_video_frame_features,
        # grok pipeline family
        "grok_route_counts": q_grok_route_counts,
        "grok_route_counts_sf": q_grok_route_counts_sf,
        "grok_unroutable": q_grok_unroutable,
        "grok_apache_verb_status": q_grok_apache_verb_status,
        "grok_apache_verb_status_jvm": q_grok_apache_verb_status_jvm,
        "grok_elb_backend": q_grok_elb_backend,
        "grok_bacula_summary": q_grok_bacula_summary,
        # relational operators
        "agg_pricing_summary": q_agg_pricing_summary,
        "join_segment_revenue": q_join_segment_revenue,
        "anti_join_quiet_customers": q_anti_join_quiet_customers,
        "semi_join_active_customers": q_semi_join_active_customers,
        "window_top_orders": q_window_top_orders,
        "price_quantiles": q_price_quantiles,
        "rollup_orders": q_rollup_orders,
        "cube_lineitem": q_cube_lineitem,
        "union_distinct_actors": q_union_distinct_actors,
        "topk_customers": q_topk_customers,
        "events_type_stats": q_events_type_stats,
        "events_props_k": q_events_props_k,
        "events_sessionize": q_events_sessionize,
        "events_asof_join": q_events_asof_join,
        # training-data operators
        "hash_split_counts": q_hash_split_counts,
        "hash_sample": q_hash_sample,
        "mixture_sample": q_mixture_sample,
        "reservoir_sample": q_reservoir_sample,
        "pack_sequences": q_pack_sequences,
        "kmv_distinct": q_kmv_distinct,
        "heavy_hitters": q_heavy_hitters,
        "dedup_exact": q_dedup_exact,
        "dedup_jaccard_pairs": q_dedup_jaccard_pairs,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_incremental": q_dedup_incremental,
        "dedup_clusters": q_dedup_clusters,
        "dedup_corpus": q_dedup_corpus,
        "simhash_pairs": q_simhash_pairs,
        "knn_join": q_knn_join,
        "knn_join_blocked": q_knn_join_blocked,
        "dedup_embedding_pairs": q_dedup_embedding_pairs,
        "dedup_embedding_lsh": q_dedup_embedding_lsh,
        "dsir_select": q_dsir_select,
        "dsir_resample": q_dsir_resample,
        "semdedup": q_semdedup,
        "semdedup_lsh": q_semdedup_lsh,
        "ann_topk": q_ann_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_ivf_trained": q_ann_ivf_trained,
        "bpe_tokenize": q_bpe_tokenize,
        "corpus_prepare": q_corpus_prepare,
        "text_quality": q_text_quality,
    }


# ---------------------------------------------------------------------------
# Oracles
# ---------------------------------------------------------------------------

_STOPWORDS_SQL = "['the','and','of','to','a','in','is','it','for','on']"

def _lsh_bucket_sql(n_planes: int = 8) -> str:
    """DuckDB expression recomputing the sign-LSH bucket per row from
    the same deterministic hyperplanes (dim 64, seed 42 — the testdata
    embeddings schema). Sign margins are ~1e-3 on this corpus, so
    double-precision dot products agree bit-for-bit across engines."""
    from grokspark.operators.similarity import hyperplanes

    planes = hyperplanes(64, n_planes, seed=42)
    return " + ".join(
        "(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), ["
        + ",".join(repr(float(x)) for x in plane)
        + f"]) >= 0 THEN {1 << i} ELSE 0 END)"
        for i, plane in enumerate(planes)
    )


def _duck_salted_hash(salt: str) -> str:
    return (
        "CAST(('0x' || substring(md5('" + salt + ":' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT)"
    )


def _hash_split_oracle_sql() -> str:
    from grokspark.operators.sampling import split_thresholds

    h = _duck_salted_hash("split")
    case = "CASE "
    prev = None
    for label, bound in split_thresholds(SPLIT_WEIGHTS):
        case += f"WHEN {h} < {bound} THEN '{label}' "
        prev = label
    case += f"ELSE '{prev}' END"
    return f"""
        SELECT {case} AS split, COUNT(*) AS n,
               CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        FROM documents GROUP BY 1
    """


def _hash_sample_oracle_sql() -> str:
    space = 1 << 48
    bound = space * round(SAMPLE_FRACTION * 1_000_000) // 1_000_000
    h = _duck_salted_hash("sample")
    return f"""
        SELECT COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
               MIN(doc_id) AS min_id
        FROM documents WHERE {h} < {bound}
    """


def _mixture_sample_oracle_sql() -> str:
    space = 1 << 48
    h = _duck_salted_hash("mix")
    case = "CASE source "
    for src, frac in MIXTURE_FRACTIONS.items():
        case += f"WHEN '{src}' THEN {space * round(frac * 1_000_000) // 1_000_000} "
    case += f"ELSE {space * round(MIXTURE_DEFAULT * 1_000_000) // 1_000_000} END"
    return f"""
        SELECT source, COUNT(*) AS n_kept,
               CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        FROM documents WHERE {h} < {case}
        GROUP BY source
    """


def _reservoir_sample_oracle_sql() -> str:
    h = _duck_salted_hash("reservoir")
    return f"""
        SELECT source, COUNT(*) AS n_kept,
               CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
               MIN(doc_id) AS min_id
        FROM (
            SELECT source, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY {h}, doc_id) AS rn
            FROM documents
        ) WHERE rn <= {RESERVOIR_K}
        GROUP BY source
    """


# shared weights CTE for the two DSIR oracles: md5-48 buckets,
# add-one smoothing, per-bucket micro-nat log ratios over ALL buckets,
# exact integer per-doc sums (w: doc_id, n_grams, weight_micro)
_DSIR_WEIGHTS_CTE_TMPL = """
    WITH d AS (
      SELECT doc_id, {lwords} AS ws
      FROM documents WHERE text IS NOT NULL
    ), g AS (
      SELECT doc_id,
             unnest(list_concat(ws,
               CASE WHEN len(ws) >= 2
                    THEN [ws[i] || ' ' || ws[i+1] FOR i IN range(1, len(ws))]
                    ELSE []::VARCHAR[] END)) AS gram
      FROM d
    ), b AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5('dsir:' || gram), 1, 12)) AS BIGINT)
               % {nb} AS bucket,
             doc_id % 11 = 0 AS is_tgt
      FROM g
    ), tc AS (SELECT bucket, COUNT(*) AS c FROM b WHERE is_tgt GROUP BY 1),
    rc AS (SELECT bucket, COUNT(*) AS c FROM b WHERE NOT is_tgt GROUP BY 1),
    tot AS (SELECT (SELECT COALESCE(SUM(c), 0) FROM tc) AS nt,
                   (SELECT COALESCE(SUM(c), 0) FROM rc) AS nr),
    lr AS (
      SELECT r.range AS bucket,
             CAST(round(1000000.0 * (
                ln((COALESCE(tc.c, 0) + 1.0) / (tot.nt + {nb}.0))
              - ln((COALESCE(rc.c, 0) + 1.0) / (tot.nr + {nb}.0))
             )) AS BIGINT) AS lr_micro
      FROM range({nb}) r
      LEFT JOIN tc ON tc.bucket = r.range
      LEFT JOIN rc ON rc.bucket = r.range
      CROSS JOIN tot
    ), w AS (
      SELECT b.doc_id, COUNT(*) AS n_grams,
             SUM(lr.lr_micro) AS weight_micro
      FROM b JOIN lr ON b.bucket = lr.bucket
      WHERE NOT b.is_tgt
      GROUP BY 1
    )
"""


def _dsir_weights_cte() -> str:
    return _DSIR_WEIGHTS_CTE_TMPL.format(lwords=_LWORDS, nb=DSIR_BUCKETS)


def _centroid_dots_sql(k_cells: int) -> str:
    """SQL array of per-centroid dot products against the SAME seeded
    centroid literals Spark uses — the shared cell-assignment half of
    the IVF and SemDeDup oracles (argmax over this array, first index
    on ties, matches ivf_assign_col bit-for-bit)."""
    from grokspark.operators.ivf import seeded_centroids

    centroids = seeded_centroids(64, k_cells, seed=42)
    return (
        "["
        + ", ".join(
            "list_dot_product(CAST(embedding AS DOUBLE[]), ["
            + ",".join(repr(float(x)) for x in c)
            + "])"
            for c in centroids
        )
        + "]"
    )


def _semdedup_oracle_sql(k_cells: int, threshold: float) -> str:
    """DuckDB mirror of the whole SemDeDup rule: cell = argmax dot
    over the same centroid literals, kept = no smaller-id cell-mate
    with cosine >= threshold (double-cast cosine; corpus margins to
    the threshold are ~1e-4, far above matmul-vs-fold rounding)."""
    return f"""
        WITH a AS (
          SELECT vec_id, embedding, {_centroid_dots_sql(k_cells)} AS dots
          FROM embeddings
        ), cells AS (
          SELECT vec_id, embedding,
                 CAST(list_position(dots, list_max(dots)) - 1 AS INTEGER) AS cell
          FROM a
        )
        SELECT x.vec_id, x.cell,
               CAST(CASE WHEN EXISTS (
                 SELECT 1 FROM cells y
                 WHERE y.cell = x.cell AND y.vec_id < x.vec_id
                   AND list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                              CAST(y.embedding AS DOUBLE[]))
                       >= {threshold}
               ) THEN 0 ELSE 1 END AS INTEGER) AS kept
        FROM cells x
    """


def _ann_ivf_oracle_sql(
    k_cells: int = IVF_CELLS, nprobe: int = IVF_NPROBE, k: int = 10
) -> str:
    """DuckDB mirror of the whole IVF rule from the same centroid
    literals: per-row cell = argmax dot (first index on ties, same
    sequential fold -> bit-identical), probe set = the query's top-
    nprobe cells ranked in SQL, exact cosine top-k within the probes."""
    dots = _centroid_dots_sql(k_cells)
    return f"""
        WITH a AS (
          SELECT vec_id, embedding, {dots} AS dots FROM embeddings
        ), cells AS (
          SELECT vec_id, embedding,
                 list_position(dots, list_max(dots)) - 1 AS cell
          FROM a
        ), q AS (
          SELECT embedding AS qe, dots AS qdots FROM a WHERE vec_id = 0
        ), probes AS (
          SELECT i - 1 AS cell FROM (
            SELECT unnest(qdots) AS s, generate_subscripts(qdots, 1) AS i
            FROM q)
          ORDER BY s DESC, i ASC LIMIT {nprobe}
        )
        SELECT vec_id FROM (
          SELECT c.vec_id
          FROM cells c, q
          WHERE c.cell IN (SELECT cell FROM probes)
          ORDER BY list_cosine_similarity(c.embedding, q.qe) DESC, c.vec_id ASC
          LIMIT {k})
    """


def _ann_lsh_oracle_sql(n_planes: int = 8, probe_hamming: int = 2, k: int = 10) -> str:
    """DuckDB mirror of lsh_index_topk: same buckets, probe within
    ``probe_hamming`` bit flips of the query's bucket, exact cosine
    top-k of the probed rows."""
    bucket = _lsh_bucket_sql(n_planes)
    return f"""
        WITH b AS (
          SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
        ), q AS (
          SELECT embedding AS qe, bucket AS qb FROM b WHERE vec_id = 0
        )
        SELECT vec_id FROM (
          SELECT b.vec_id
          FROM b, q
          WHERE bit_count(xor(b.bucket, q.qb)) <= {probe_hamming}
          ORDER BY list_cosine_similarity(b.embedding, q.qe) DESC, b.vec_id ASC
          LIMIT {k})
    """


# shared SQL fragments (mirror grokspark.operators formulas exactly)
_WORDS = "string_split_regex(trim(text), '\\s+')"
_LWORDS = "string_split_regex(lower(trim(text)), '\\s+')"

# the one source of truth for the PII regexes (common Java-regex / RE2
# dialect) — the oracle embeds the very same strings the operator runs
from grokspark.operators.textops import PII_PATTERNS as _PII

_PII_EMAIL, _PII_IPV4, _PII_PHONE = (p for _, p, _ in _PII)
_BIGRAMS = (
    "CASE WHEN len({w}) >= 2 THEN "
    "list_distinct([{w}[i] || ' ' || {w}[i+1] FOR i IN range(1, len({w}))]) "
    "ELSE [array_to_string({w}, ' ')] END"
).format(w="string_split_regex(trim(lower(text)), '\\s+')")

# Exact n-gram Jaccard pairs via an inverted shingle index instead of
# the all-pairs cross join (identical output: any pair with jaccard >=
# 0.5 > 0 shares at least one shingle, so the gram equi-join loses
# nothing; grams are list_distinct so COUNT(*) per pair IS the
# intersection size, and union = na + nb - shared). Same single double
# division as the Spark side -> bit-identical jaccard values. The old
# cross-join formulation cost ~10 s per oracle at sf0.01; this runs in
# well under a second.
def _jaccard_pairs_sql(
    docs_sql: str = "SELECT doc_id AS id, text FROM documents",
) -> str:
    """Exact-Jaccard pair SQL over any (id, text) relation."""
    return f"""
    WITH d AS ({docs_sql}), g AS (
      SELECT id, {_BIGRAMS} AS grams FROM d
    ), x AS (
      SELECT id, len(grams) AS n, unnest(grams) AS gram FROM g
    ), s AS (
      SELECT a.id AS id_a, b.id AS id_b, a.n AS na, b.n AS nb,
             COUNT(*) AS shared
      FROM x a JOIN x b ON a.gram = b.gram AND a.id < b.id
      GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b,
           CAST(shared AS DOUBLE) / CAST(na + nb - shared AS DOUBLE) AS jaccard
    FROM s
    WHERE CAST(shared AS DOUBLE) / CAST(na + nb - shared AS DOUBLE) >= 0.5
"""


_JACCARD_PAIRS_SQL = _jaccard_pairs_sql()

# The full dedup decision: exact collapse -> rep-level Jaccard pairs ->
# recursive-CTE connected components -> decisions for every member.
# SQL twin of grokspark.operators.dedup.dedup_corpus.
_DEDUP_CORPUS_SQL = f"""
    WITH RECURSIVE norm AS (
      SELECT doc_id AS id,
             md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
             text
      FROM documents
    ), reps AS (
      SELECT fp, MIN(id) AS rep_id FROM norm GROUP BY fp
    ), p AS (
      {_jaccard_pairs_sql(
          "SELECT n.id, n.text FROM norm n JOIN reps r ON n.id = r.rep_id"
      )}
    ), e2 AS (
      SELECT id_a AS src, id_b AS dst FROM p
      UNION
      SELECT id_b, id_a FROM p
    ), reach2(id, label) AS (
      SELECT src, src FROM e2
      UNION
      SELECT e.src, r.label FROM e2 e JOIN reach2 r ON e.dst = r.id
    ), cc AS (
      SELECT id, MIN(label) AS cluster_id FROM reach2 GROUP BY id
    ), doc_rep AS (
      SELECT n.id, r.rep_id FROM norm n JOIN reps r ON n.fp = r.fp
    )
    SELECT doc_rep.id AS doc_id,
           COALESCE(cc.cluster_id, doc_rep.rep_id) AS cluster_id,
           (doc_rep.id = COALESCE(cc.cluster_id, doc_rep.rep_id)) AS keep
    FROM doc_rep LEFT JOIN cc ON doc_rep.rep_id = cc.id
"""


def _oracle_sql_base() -> dict[str, str]:
    import os

    g = _grok_oracle_rows()
    g_sf = _grok_oracle_rows(
        _sf_grok_n(os.environ.get(ORACLE_SF_ENV, _DEFAULT_ORACLE_SF))
    )
    route_cols = [("route", "VARCHAR"), ("matched", "BOOLEAN"), ("n", "BIGINT")]
    return {
        # grok family: independent pure-Python reference run as VALUES
        "grok_route_counts": _values_sql(g["route_counts"], route_cols),
        "grok_route_counts_sf": _values_sql(g_sf["route_counts"], route_cols),
        "grok_unroutable": _values_sql(
            g["unroutable"], [("source", "VARCHAR"), ("n", "BIGINT")]
        ),
        "grok_apache_verb_status": _values_sql(
            g["verb_status"],
            [("verb", "VARCHAR"), ("response", "BIGINT"), ("n", "BIGINT")],
        ),
        "grok_elb_backend": _values_sql(
            g["elb_backend"],
            [("backendport", "BIGINT"), ("n", "BIGINT"), ("sum_received", "BIGINT")],
        ),
        "grok_bacula_summary": _values_sql(
            g["bacula"], [("n_matched", "BIGINT"), ("n_jobids", "BIGINT")]
        ),
        # relational
        "agg_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
                   COUNT(*) AS n_rows,
                   CAST(ROUND(SUM(l_extendedprice), 0) AS BIGINT) AS sum_base
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "join_segment_revenue": """
            SELECT c_mktsegment, COUNT(*) AS n_orders,
                   CAST(ROUND(SUM(o_totalprice), 0) AS BIGINT) AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "anti_join_quiet_customers": """
            SELECT c_mktsegment, COUNT(*) AS n
            FROM customer
            WHERE NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 250000)
            GROUP BY c_mktsegment
        """,
        "semi_join_active_customers": """
            SELECT c_mktsegment, COUNT(*) AS n
            FROM customer
            WHERE EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
            GROUP BY c_mktsegment
        """,
        "window_top_orders": """
            SELECT o_orderpriority, COUNT(*) AS n FROM (
              SELECT o_orderpriority,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
              FROM orders) WHERE rn <= 2
            GROUP BY o_orderpriority
        """,
        "price_quantiles": """
            SELECT o_orderpriority,
                   MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT)
                            THEN o_totalprice END) AS p50,
                   MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT)
                            THEN o_totalprice END) AS p90
            FROM (
              SELECT o_orderpriority, o_totalprice,
                     ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice, o_orderkey) AS rn,
                     COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
              FROM orders)
            GROUP BY o_orderpriority
        """,
        "rollup_orders": """
            SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
            FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        """,
        "cube_lineitem": """
            SELECT l_returnflag, l_linestatus, COUNT(*) AS n
            FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        """,
        "union_distinct_actors": """
            SELECT DISTINCT user_id FROM (
              SELECT user_id FROM events WHERE event_type = 'error'
              UNION ALL
              SELECT user_id FROM events WHERE value > 150)
        """,
        "topk_customers": """
            SELECT o_custkey, spend FROM (
              SELECT o_custkey,
                     CAST(ROUND(SUM(o_totalprice), 0) AS BIGINT) AS spend
              FROM orders GROUP BY o_custkey
              ORDER BY spend DESC, o_custkey ASC LIMIT 10)
        """,
        "events_type_stats": """
            SELECT event_type, COUNT(*) AS n,
                   CAST(ROUND(SUM(value), 0) AS BIGINT) AS sum_value
            FROM events GROUP BY event_type
        """,
        "events_props_k": """
            SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
            FROM events GROUP BY event_type
        """,
        "events_sessionize": """
            SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions FROM (
              SELECT user_id,
                CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts))
                          > 1800 * 1000000
                     OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                THEN 1 ELSE 0 END AS new_sess
              FROM events)
            GROUP BY user_id
        """,
        "events_asof_join": """
            WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
                 rd AS (SELECT user_id, ts, MAX(event_id) AS event_id
                        FROM events WHERE event_type = 'error'
                        GROUP BY user_id, ts)
            SELECT l.user_id % 8 AS user_bucket,
                   COUNT(*) AS n_clicks,
                   COUNT(rd.event_id) AS n_matched,
                   CAST(SUM(epoch_us(l.ts) - epoch_us(rd.ts)) AS BIGINT) AS sum_lag_micros,
                   CAST(SUM(rd.event_id) AS BIGINT) AS sum_r_ids
            FROM l ASOF LEFT JOIN rd
              ON l.user_id = rd.user_id AND l.ts >= rd.ts
            GROUP BY 1
        """,
        # training-data ops
        "dedup_exact": """
            SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
            FROM documents
            GROUP BY md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
        """,
        # hash split/sample: identical salted md5-prefix hash + exact
        # integer thresholds -> every per-row assignment matches
        "hash_split_counts": _hash_split_oracle_sql(),
        "hash_sample": _hash_sample_oracle_sql(),
        "mixture_sample": _mixture_sample_oracle_sql(),
        "reservoir_sample": _reservoir_sample_oracle_sql(),
        "pack_sequences": _values_sql(
            _pack_oracle_rows(),
            [
                ("n_packs", "BIGINT"),
                ("n_docs", "BIGINT"),
                ("sum_tok", "BIGINT"),
                ("max_tok", "INTEGER"),
                ("n_truncated", "BIGINT"),
            ],
        ),
        # KMV sketch: same md5-prefix hash, same k smallest, same single
        # double division -> estimate matches Spark bit-for-bit
        "kmv_distinct": f"""
            WITH h AS (
              SELECT DISTINCT
                CAST(('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 12))
                     AS BIGINT) AS h
              FROM orders
            ), mins AS (
              SELECT h FROM h ORDER BY h LIMIT {KMV_K}
            )
            SELECT COUNT(*) AS n_used, MAX(h) AS kth_hash,
                   CASE WHEN COUNT(*) < {KMV_K}
                        THEN CAST(COUNT(*) AS DOUBLE)
                        ELSE CAST({(KMV_K - 1) * (1 << 48)} AS DOUBLE)
                             / CAST(MAX(h) AS DOUBLE) END AS estimate
            FROM mins
        """,
        # heavy hitters: the two-pass MG output is EXACT, so the oracle
        # is the full groupBy with the same strict integer threshold
        "heavy_hitters": f"""
            WITH toks AS (
              SELECT unnest({_LWORDS}) AS term
              FROM documents WHERE text IS NOT NULL),
            tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM toks)
            SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM toks CROSS JOIN tot
            GROUP BY term, tot.n
            HAVING COUNT(*) * 1000000 > tot.n * 33000
        """,
        "dedup_jaccard_pairs": _JACCARD_PAIRS_SQL,
        # MinHash+LSH with bands=64: recall at s>=0.5 is 1-(1-s^2)^64
        # >= 1-1e-8, and the verify step is exact, so the output equals
        # the exact-Jaccard baseline — same oracle.
        "dedup_minhash_lsh": _JACCARD_PAIRS_SQL,
        "dedup_incremental": f"""
            WITH d AS (
              SELECT doc_id AS id, text, doc_id % 10 = 0 AS is_new
              FROM documents
            ), g AS (
              SELECT id, is_new, {_BIGRAMS} AS grams FROM d
            ), x AS (
              SELECT id, is_new, len(grams) AS n, unnest(grams) AS gram FROM g
            ), s AS (
              SELECT a.id AS new_id, b.id AS corpus_id, a.n AS na,
                     b.n AS nb, COUNT(*) AS shared
              FROM x a JOIN x b ON a.gram = b.gram
              WHERE a.is_new AND NOT b.is_new
              GROUP BY 1, 2, 3, 4
            )
            SELECT new_id, corpus_id,
                   CAST(shared AS DOUBLE) / CAST(na + nb - shared AS DOUBLE) AS jaccard
            FROM s
            WHERE CAST(shared AS DOUBLE) / CAST(na + nb - shared AS DOUBLE) >= 0.5
        """,
        "dedup_embedding_pairs": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(a.embedding, b.embedding) >= 0.5
        """,
        "dedup_embedding_lsh": f"""
            WITH b AS (
              SELECT vec_id, embedding, {_lsh_bucket_sql(8)} AS bucket
              FROM embeddings
            )
            SELECT a.vec_id AS id_a, c.vec_id AS id_b
            FROM b a JOIN b c
              ON a.vec_id < c.vec_id
             AND bit_count(xor(a.bucket, c.bucket)) <= 2
            WHERE list_cosine_similarity(a.embedding, c.embedding) >= 0.5
        """,
        # DSIR: whole rule in SQL — same 48-bit md5 buckets, same
        # add-one smoothing, per-bucket micro-nat quantization, exact
        # integer per-doc sums, deterministic top-k
        "dsir_select": _dsir_weights_cte() + f"""
            SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
                   CAST(weight_micro AS BIGINT) AS weight_micro
            FROM w ORDER BY weight_micro DESC, doc_id ASC LIMIT {DSIR_K}
        """,
        # the paper's Gumbel-top-k resampling: same weights CTE plus
        # the seeded integer micro-nat Gumbel key
        "dsir_resample": _dsir_weights_cte() + f"""
            SELECT doc_id, CAST(weight_micro AS BIGINT) AS weight_micro,
                   CAST(weight_micro + CAST(round(1000000.0 * (
                     -ln(-ln((CAST(('0x' || substring(md5('gumbel:' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) + 0.5)
                              / 281474976710656.0))
                   )) AS BIGINT) AS BIGINT) AS key_micro
            FROM w
            ORDER BY key_micro DESC, doc_id ASC LIMIT {DSIR_K}
        """,
        "semdedup": _semdedup_oracle_sql(SEMDEDUP_CELLS, SEMDEDUP_THRESHOLD),
        "semdedup_lsh": f"""
            WITH cells AS (
              SELECT vec_id, embedding,
                     CAST({_lsh_bucket_sql(SEMDEDUP_LSH_PLANES)} AS INTEGER) AS cell
              FROM embeddings
            )
            SELECT x.vec_id, x.cell,
                   CAST(CASE WHEN EXISTS (
                     SELECT 1 FROM cells y
                     WHERE y.cell = x.cell AND y.vec_id < x.vec_id
                       AND list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                                  CAST(y.embedding AS DOUBLE[]))
                           >= {SEMDEDUP_THRESHOLD}
                   ) THEN 0 ELSE 1 END AS INTEGER) AS kept
            FROM cells x
        """,
        "ann_topk": """
            SELECT vec_id, label FROM (
              SELECT e.vec_id, e.label
              FROM embeddings e,
                   (SELECT embedding AS q FROM embeddings WHERE vec_id = 0)
              ORDER BY list_cosine_similarity(e.embedding, q) DESC, e.vec_id ASC
              LIMIT 10)
        """,
        # connected components over the exact-Jaccard pair graph via a
        # recursive CTE — the SQL twin of the iterative hash-min loop
        "dedup_clusters": f"""
            WITH RECURSIVE p AS (
              {_JACCARD_PAIRS_SQL}
            ), edges AS (
              SELECT id_a AS src, id_b AS dst FROM p
              UNION
              SELECT id_b, id_a FROM p
            ), reach(id, label) AS (
              SELECT src, src FROM edges
              UNION
              SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id
            )
            SELECT id AS doc_id, MIN(label) AS cluster_id
            FROM reach GROUP BY id
        """,
        "dedup_corpus": _DEDUP_CORPUS_SQL,
        "knn_join": f"""
            WITH b AS (
              SELECT vec_id, embedding, {_lsh_bucket_sql(8)} AS bucket
              FROM embeddings
            )
            SELECT vec_id, neighbor_id, rank FROM (
              SELECT q.vec_id AS vec_id, c.vec_id AS neighbor_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                                c.vec_id ASC) AS rank
              FROM b q JOIN b c
                ON bit_count(xor(q.bucket, c.bucket)) <= 1
               AND q.vec_id <> c.vec_id
            ) WHERE rank <= 3
        """,
        "simhash_pairs": _values_sql(
            _simhash_oracle_rows(),
            [("id_a", "VARCHAR"), ("id_b", "VARCHAR"), ("hamming", "INTEGER")],
        ),
        "ann_lsh_topk": _ann_lsh_oracle_sql(n_planes=8, probe_hamming=2, k=10),
        "ann_ivf_topk": _ann_ivf_oracle_sql(),
        "text_quality": f"""
            WITH scored AS (
              SELECT lang,
                CASE WHEN len({_WORDS}) >= 20
                      AND (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE
                           / length(text)::DOUBLE < 0.2
                      AND len(list_filter({_WORDS}, w -> list_contains({_STOPWORDS_SQL}, lower(w))))::DOUBLE
                           / len({_WORDS})::DOUBLE >= 0.03
                THEN 1 ELSE 0 END AS keep
              FROM documents)
            SELECT lang, COUNT(*) AS n_docs, CAST(SUM(keep) AS BIGINT) AS n_keep
            FROM scored GROUP BY lang
        """,
        "token_counts": f"""
            SELECT source,
              CAST(SUM(len({_WORDS})) AS BIGINT) AS sum_words,
              CAST(SUM(len(string_split_regex(trim(
                regexp_replace(text, '([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s])', '\\1 ', 'g')
              ), '\\s+'))) AS BIGINT) AS sum_pieces
            FROM documents GROUP BY source
        """,
        # exact quantiles: same integer cumsum/threshold rule as the
        # Spark value-histogram plan — bit-identical, no interpolation
        "quantiles_tokens": f"""
            WITH vals AS (
              SELECT CAST(len({_WORDS}) AS BIGINT) AS v
              FROM documents WHERE text IS NOT NULL),
            h AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM vals GROUP BY v),
            r AS (SELECT v, SUM(c) OVER (ORDER BY v) AS run,
                         SUM(c) OVER () AS n FROM h),
            q(q_ppm) AS (VALUES (250000), (500000), (750000), (900000), (990000))
            SELECT CAST(q_ppm AS BIGINT) AS q_ppm, MIN(v) AS value
            FROM r CROSS JOIN q
            WHERE run * 1000000 >= CAST(q_ppm AS BIGINT) * n
            GROUP BY 1
        """,
        "lang_id": f"""
            SELECT lang,
              CASE WHEN len(list_filter({_WORDS}, w -> list_contains({_STOPWORDS_SQL}, lower(w))))::DOUBLE
                        / len({_WORDS})::DOUBLE >= 0.05
                   THEN 'en' ELSE 'other' END AS lang_pred,
              COUNT(*) AS n
            FROM documents GROUP BY 1, 2
        """,
        # mode-bigram via explode+group+row_number (the ORACLE need not
        # mirror the Spark side's map-only sorted-run fold — only its
        # result: ties break to the lexicographically smallest gram)
        "repetition": f"""
            WITH w AS (
              SELECT doc_id, length(text) AS n_chars, {_LWORDS} AS ws
              FROM documents WHERE doc_id % 11 = 0),
            base AS (
              SELECT doc_id, n_chars, len(ws) AS n_words,
                     len(list_distinct(ws)) AS n_distinct,
                     CASE WHEN len(ws) >= 2
                       THEN [array_to_string(ws[i:i+1], ' ') for i in range(1, len(ws))]
                       ELSE [] END AS grams
              FROM w),
            e AS (SELECT doc_id, unnest(grams) AS g FROM base),
            c AS (SELECT doc_id, g, COUNT(*) AS cnt FROM e GROUP BY 1, 2),
            top AS (
              SELECT doc_id, g, cnt FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY doc_id ORDER BY cnt DESC, g ASC) AS rn
                FROM c) WHERE rn = 1)
            SELECT b.doc_id,
                   b.n_words,
                   (b.n_words - b.n_distinct)::DOUBLE / b.n_words::DOUBLE AS dup_word_ratio,
                   COALESCE(top.g, '') AS top_bigram,
                   COALESCE(top.cnt, 0) AS top_bigram_cnt,
                   CASE WHEN b.n_chars > 0
                     THEN (COALESCE(top.cnt, 0) * length(COALESCE(top.g, '')))::DOUBLE
                          / b.n_chars::DOUBLE
                     ELSE 0.0 END AS top_bigram_ratio,
                   CASE WHEN (b.n_words - b.n_distinct)::DOUBLE / b.n_words::DOUBLE <= 0.6
                         AND CASE WHEN b.n_chars > 0
                               THEN (COALESCE(top.cnt, 0) * length(COALESCE(top.g, '')))::DOUBLE
                                    / b.n_chars::DOUBLE
                               ELSE 0.0 END <= 0.12
                   THEN 1 ELSE 0 END AS repetition_keep
            FROM base b LEFT JOIN top USING (doc_id)
        """,
        # PII patterns are shared verbatim with textops.PII_PATTERNS
        # (the common Java-regex/RE2 dialect); DuckDB needs the 'g'
        # flag for replace-all and counts via regexp_extract_all
        "redact_pii": f"""
            WITH salted AS (
              SELECT doc_id,
                'contact u' || doc_id || '@ex.com or 10.' || (doc_id % 256)
                  || '.0.1 call 555-123-4567 ' || text AS text
              FROM documents WHERE doc_id % 11 = 0)
            SELECT doc_id,
              len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_email,
              len(regexp_extract_all(text, '{_PII_IPV4}')) AS n_ipv4,
              len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_phone,
              substring(regexp_replace(regexp_replace(regexp_replace(text,
                '{_PII_EMAIL}', '<EMAIL>', 'g'),
                '{_PII_IPV4}', '<IP>', 'g'),
                '{_PII_PHONE}', '<PHONE>', 'g'), 1, 64) AS redacted_head
            FROM salted
        """,
        # bigram LM: counts + V recomputed in SQL; per-bigram prob is
        # ONE exact-integer division, ln/sum ulps absorbed by the
        # micro-nat quantization (operators/ngram_lm.py module doc)
        "lm_perplexity": f"""
            WITH d AS (
              SELECT doc_id, {_LWORDS} AS ws
              FROM documents WHERE text IS NOT NULL),
            w AS (SELECT doc_id, unnest(ws) AS word FROM d),
            bg AS (
              SELECT doc_id,
                     unnest(ws[1:len(ws)-1]) AS w1,
                     unnest(ws[2:len(ws)]) AS w2
              FROM d WHERE len(ws) >= 2),
            uni AS (SELECT word AS w1, COUNT(*) AS cnt FROM w GROUP BY 1),
            bi AS (SELECT w1, w2, COUNT(*) AS cnt FROM bg GROUP BY 1, 2),
            v AS (SELECT COUNT(*) + 1 AS v FROM uni),
            scored AS (
              SELECT g.doc_id,
                ln(CAST(COALESCE(b.cnt, 0) + 1 AS DOUBLE)
                   / CAST(COALESCE(u.cnt, 0) + v.v AS DOUBLE)) AS lp
              FROM bg g
              LEFT JOIN bi b ON g.w1 = b.w1 AND g.w2 = b.w2
              LEFT JOIN uni u ON g.w1 = u.w1
              CROSS JOIN v
              WHERE g.doc_id % 7 = 0)
            SELECT doc_id,
              CAST(COUNT(*) AS BIGINT) AS n_bigrams,
              CAST(round((-SUM(lp)) / CAST(COUNT(*) AS DOUBLE)
                         * 1000000.0) AS BIGINT) AS ce_micro
            FROM scored GROUP BY doc_id
        """,
        "lm_familiarity": f"""
            WITH d AS (
              SELECT doc_id, {_LWORDS} AS ws
              FROM documents WHERE text IS NOT NULL),
            bg AS (
              SELECT doc_id,
                     unnest(ws[1:len(ws)-1]) AS w1,
                     unnest(ws[2:len(ws)]) AS w2
              FROM d WHERE len(ws) >= 2),
            bi AS (SELECT w1, w2, COUNT(*) AS cnt FROM bg GROUP BY 1, 2)
            SELECT g.doc_id,
              CAST(COUNT(*) AS BIGINT) AS n_bigrams,
              CAST(SUM(COALESCE(b.cnt, 0)) AS BIGINT) AS sum_cnt,
              CAST(SUM(COALESCE(b.cnt, 0)) AS BIGINT)::DOUBLE
                / CAST(COUNT(*) AS BIGINT)::DOUBLE AS mean_cnt
            FROM bg g
            LEFT JOIN bi b ON g.w1 = b.w1 AND g.w2 = b.w2
            WHERE g.doc_id % 5 = 0
            GROUP BY g.doc_id
        """,
        "decontaminate": f"""
            WITH w AS (
              SELECT doc_id, {_LWORDS} AS ws FROM documents),
            g AS (
              SELECT doc_id, CASE WHEN len(ws) >= 3
                THEN list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)])
                ELSE [array_to_string(ws, ' ')] END AS grams
              FROM w),
            e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
            bench AS (SELECT DISTINCT gram FROM e WHERE doc_id % 50 = 0)
            SELECT e.doc_id, COUNT(*) AS n_hits
            FROM e JOIN bench USING (gram)
            WHERE e.doc_id % 50 <> 0
            GROUP BY e.doc_id
        """,
        "fingerprint": """
            SELECT lang,
                   COUNT(DISTINCT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))) AS n_distinct_fp,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY lang
        """,
        "fingerprint_winnow": _values_sql(
            _winnow_oracle_rows(
                os.environ.get(ORACLE_SF_ENV, _DEFAULT_ORACLE_SF)
            )["per_lang"],
            [
                ("lang", "VARCHAR"),
                ("n_distinct_fp", "BIGINT"),
                ("n_doc_fps", "BIGINT"),
            ],
        ),
        "winnow_pairs": _values_sql(
            _winnow_oracle_rows(
                os.environ.get(ORACLE_SF_ENV, _DEFAULT_ORACLE_SF)
            )["pairs"],
            [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("n_shared", "BIGINT")],
        ),
        # BM25: k1/b/derived literals embedded via repr() so the SQL
        # parses the IDENTICAL doubles Spark's F.lit carries; avgdl is
        # the same single division on both sides
        "bm25_topk": f"""
            WITH d AS (
              SELECT doc_id, {_LWORDS} AS ws
              FROM documents WHERE text IS NOT NULL),
            toks AS (
              SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl,
                     unnest(ws) AS term
              FROM d),
            post AS (
              SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
              FROM toks GROUP BY 1, 2, 3),
            stats AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(len(ws)) AS BIGINT) AS sumdl
              FROM d),
            dfreq AS (
              SELECT term, CAST(COUNT(*) AS BIGINT) AS dft
              FROM post GROUP BY 1),
            q(query_id, qtext) AS (VALUES {_BM25_VALUES}),
            qt AS (
              SELECT query_id,
                     unnest(list_distinct(
                       string_split_regex(lower(trim(qtext)), '\\s+')
                     )) AS term
              FROM q),
            scored AS (
              SELECT qt.query_id, p.doc_id,
                SUM(
                  ln(1.0 + (CAST(s.n - f.dft AS DOUBLE) + 0.5)
                           / (CAST(f.dft AS DOUBLE) + 0.5))
                  * (CAST(p.tf AS DOUBLE) * {_BM25_K1P1})
                  / (CAST(p.tf AS DOUBLE)
                     + {_BM25_K1} * ({_BM25_OMB}
                                     + ({_BM25_B} * CAST(p.dl AS DOUBLE))
                                     / (CAST(s.sumdl AS DOUBLE)
                                        / CAST(s.n AS DOUBLE))))
                ) AS score
              FROM post p
              JOIN qt ON p.term = qt.term
              JOIN dfreq f ON p.term = f.term
              CROSS JOIN stats s
              GROUP BY 1, 2)
            SELECT query_id, rank, doc_id, score_micro FROM (
              SELECT query_id, doc_id,
                ROW_NUMBER() OVER (
                  PARTITION BY query_id ORDER BY score DESC, doc_id ASC
                ) AS rank,
                CAST(round(score * 1000000.0) AS BIGINT) AS score_micro
              FROM scored) t
            WHERE rank <= 10
        """,
        "c4_clean": _values_sql(
            _c4_oracle_rows(
                os.environ.get(ORACLE_SF_ENV, _DEFAULT_ORACLE_SF)
            ),
            [
                ("doc_id", "BIGINT"),
                ("n_lines_in", "BIGINT"),
                ("n_lines_kept", "BIGINT"),
                ("n_sentences", "BIGINT"),
                ("kept", "BOOLEAN"),
                ("clean_md5", "VARCHAR"),
            ],
        ),
        "span_dedup": _values_sql(
            _span_oracle_rows(
                os.environ.get(ORACLE_SF_ENV, _DEFAULT_ORACLE_SF)
            ),
            [
                ("doc_id", "BIGINT"),
                ("n_spans", "BIGINT"),
                ("n_removed_chars", "BIGINT"),
                ("clean_md5", "VARCHAR"),
            ],
        ),
        "bpe_tokenize": _values_sql(
            _bpe_oracle_rows(os.environ.get(ORACLE_SF_ENV, _DEFAULT_ORACLE_SF)),
            [
                ("lang", "VARCHAR"),
                ("n_docs", "BIGINT"),
                ("sum_tok", "BIGINT"),
                ("sum_ids", "BIGINT"),
            ],
        ),
        "corpus_prepare": _values_sql(
            _corpus_prepare_oracle_rows(
                os.environ.get(ORACLE_SF_ENV, _DEFAULT_ORACLE_SF)
            ),
            [
                ("split", "VARCHAR"),
                ("n_packs", "BIGINT"),
                ("n_docs", "BIGINT"),
                ("sum_tok", "BIGINT"),
                ("max_tok", "INTEGER"),
                ("n_truncated", "BIGINT"),
            ],
        ),
        # trained-centroid IVF: the oracle pins the recall OUTCOME (the
        # data-dependent k-means floats cannot be recomputed in SQL);
        # see q_ann_ivf_trained's docstring
        "ann_ivf_trained": _values_sql(
            [(i, True) for i in range(IVF_TRAINED_QUERIES)],
            [("query_id", "INTEGER"), ("recall_ok", "BOOLEAN")],
        ),
        "multimodal_features": _values_sql(
            _multimodal_oracle_rows(), _MM_COLS
        ),
        "audio_features": _values_sql(
            _audio_oracle_rows()["raw"], _AUDIO_COLS
        ),
        "audio_resample": _values_sql(
            _audio_oracle_rows()["resampled"], _AUDIO_COLS
        ),
        "multimodal_resize": _values_sql(_resize_oracle_rows(), _MM_COLS),
        "multimodal_jpeg": _values_sql(_jpeg_oracle_rows(), _MM_COLS),
        "video_frame_features": _values_sql(_video_oracle_rows(), _MM_COLS),
    }


def oracle_sql() -> dict[str, str]:
    out = _oracle_sql_base()
    # blocked kNN shares knn_join's oracle: identical candidate rule
    # and ranking (see q_knn_join_blocked's docstring for the FP-margin
    # argument)
    out["knn_join_blocked"] = out["knn_join"]
    # the JVM fast path shares the Python kernel's oracle (per-line
    # parity test-pinned; see q_grok_apache_verb_status_jvm)
    out["grok_apache_verb_status_jvm"] = out["grok_apache_verb_status"]
    return out
