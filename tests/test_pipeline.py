"""End-to-end pipeline tests: per-sink counts vs the pure-Python
reference semantics, routed-row token-array equality, resume, lineage."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from grokspark import GrokRegistry
from grokspark.datagen import SOURCES, iter_rows, line_for, routes_rows
from grokspark.pipeline import GrokPipeline, PipelineConfig, route_match_counts

N_ROWS = 600


@pytest.fixture(scope="module")
def corpus():
    return list(iter_rows(N_ROWS))


@pytest.fixture(scope="module")
def seq_df(spark, corpus):
    return spark.createDataFrame(
        corpus, schema="doc_id string, tokens array<int>, n_tok int, source string"
    ).cache()


@pytest.fixture(scope="module")
def oracle(corpus):
    """Pure-Python single-process reference run over the same rows —
    the stand-in for the Rust reference's semantics (FIXTURES.md §5)."""
    registry = GrokRegistry.with_default_patterns()
    compiled = {
        s: registry.compile(e, with_alias_only=True)
        for s, (_w, r, e) in SOURCES.items()
        if r
    }
    route_of = {s: r for s, (_w, r, _e) in SOURCES.items() if r}
    sink_counts: dict[str, dict[str, int]] = collections.defaultdict(
        lambda: {"matched": 0, "unmatched": 0}
    )
    unroutable = 0
    for row in corpus:
        src = row["source"]
        if src not in route_of:
            unroutable += 1
            continue
        line = bytes(row["tokens"]).decode("utf-8")
        m = compiled[src].match_against(line)
        sink_counts[route_of[src]]["matched" if m is not None else "unmatched"] += 1
    return {"sink_counts": dict(sink_counts), "unroutable": unroutable}


def test_route_match_counts_vs_oracle(spark, seq_df, oracle):
    got = {
        (r["route"], r["matched"]): r["n"]
        for r in route_match_counts(spark, seq_df).collect()
    }
    for route, counts in oracle["sink_counts"].items():
        assert got.get((route, True), 0) == counts["matched"], route
        assert got.get((route, False), 0) == counts["unmatched"], route


def test_full_pipeline_counts_and_invariants(spark, seq_df, corpus, oracle, tmp_path):
    out_dir = str(tmp_path / "out")
    pipe = GrokPipeline(spark, PipelineConfig(out_dir=out_dir, parse_partitions=8))
    result = pipe.run(seq_df)

    # per-sink aggregate counts == pure-Python reference
    assert result.sink_counts == oracle["sink_counts"]
    assert result.unroutable_count == oracle["unroutable"]
    assert result.rows_in == N_ROWS

    # routed-row token-array equality: every sink row's tokens must be
    # byte-identical to the input row with the same doc_id
    input_tokens = {row["doc_id"]: row["tokens"] for row in corpus}
    for route in result.sink_counts:
        sink = spark.read.option("mergeSchema", "true").parquet(
            f"{out_dir}/sinks/{route}/*"
        )
        rows = sink.select("doc_id", "tokens", "n_tok", "matched").collect()
        assert len(rows) == sum(result.sink_counts[route].values())
        for r in rows:
            assert r["tokens"] == input_tokens[r["doc_id"]], r["doc_id"]
            assert r["n_tok"] == len(r["tokens"])

    # lineage covers every routed row exactly once
    assert sum(li["rows_in"] for li in result.lineage) == N_ROWS - oracle["unroutable"]
    assert sum(li["rows_matched"] for li in result.lineage) == sum(
        c["matched"] for c in result.sink_counts.values()
    )

    # parsed fields present for matched rows on at least one sink
    web = spark.read.option("mergeSchema", "true").parquet(f"{out_dir}/sinks/web/*")
    sample = web.filter(F.col("matched")).select("fields").limit(5).collect()
    assert sample and all(r["fields"] for r in sample)


def test_resume_skips_completed_units(spark, seq_df, oracle, tmp_path):
    out_dir = str(tmp_path / "out")
    cfg = PipelineConfig(out_dir=out_dir, parse_partitions=4)
    first = GrokPipeline(spark, cfg).run(seq_df)
    assert not first.skipped_units

    second = GrokPipeline(spark, cfg).run(seq_df)
    # every unit skipped, identical counts, much cheaper
    assert sorted(second.skipped_units) == sorted(
        ["unroutable"] + [f"{r}/{p}" for (r, p) in first.unit_counts]
    )
    assert second.sink_counts == first.sink_counts == oracle["sink_counts"]
    assert second.unroutable_count == first.unroutable_count


def test_unroutable_dead_letter(spark, seq_df, oracle, tmp_path):
    out_dir = str(tmp_path / "out")
    GrokPipeline(spark, PipelineConfig(out_dir=out_dir, parse_partitions=4)).run(seq_df)
    dead = spark.read.parquet(f"{out_dir}/unroutable")
    assert dead.count() == oracle["unroutable"]
    assert set(
        r["source"] for r in dead.select("source").distinct().collect()
    ) == {"debug_feed"}


def test_typed_extract_columns_in_elb_sink(spark, seq_df, tmp_path):
    out_dir = str(tmp_path / "out")
    GrokPipeline(spark, PipelineConfig(out_dir=out_dir, parse_partitions=4)).run(seq_df)
    elb = spark.read.parquet(f"{out_dir}/sinks/web/pat_elb")
    schema = {f.name: f.dataType.simpleString() for f in elb.schema.fields}
    assert schema["clientport"] == "bigint"
    assert schema["request_processing_time"] == "double"
    ok = elb.filter(F.col("matched"))
    assert ok.filter(F.col("clientport").isNull()).count() == 0


def test_single_pass_mode_counts_match(spark, seq_df, corpus, oracle, tmp_path):
    """single_pass=True: one scan + dynamic-partition fan-out must
    produce identical per-sink counts, token equality, and resume."""
    out_dir = str(tmp_path / "sp")
    cfg = PipelineConfig(out_dir=out_dir, parse_partitions=8, single_pass=True)
    result = GrokPipeline(spark, cfg).run(seq_df)
    assert result.sink_counts == oracle["sink_counts"]
    assert result.unroutable_count == oracle["unroutable"]

    input_tokens = {row["doc_id"]: row["tokens"] for row in corpus}
    sinks = spark.read.parquet(f"{out_dir}/sinks")
    rows = sinks.select("doc_id", "tokens").collect()
    assert len(rows) == N_ROWS - oracle["unroutable"]
    for r in rows:
        assert r["tokens"] == input_tokens[r["doc_id"]]

    # partition pruning: reading one route dir only touches that route
    web = spark.read.parquet(f"{out_dir}/sinks/route=web")
    assert web.count() == sum(oracle["sink_counts"]["web"].values())

    second = GrokPipeline(spark, cfg).run(seq_df)
    assert "singlepass" in second.skipped_units
    assert second.sink_counts == result.sink_counts
