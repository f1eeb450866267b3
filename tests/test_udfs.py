"""Spark UDF kernels must agree exactly with the pure-Python matcher
(which itself is reference-parity-tested in test_compiler.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grokspark import GrokRegistry
from grokspark.datagen import SOURCES, iter_rows
from grokspark.udfs import (
    apply_extracts,
    detokenize_udf,
    grok_match_udf,
    grok_parse_map_udf,
    grok_parse_struct_udf,
)

N_ROWS = 400


@pytest.fixture(scope="module")
def corpus():
    return list(iter_rows(N_ROWS))


@pytest.fixture(scope="module")
def seq_df(spark, corpus):
    return spark.createDataFrame(
        corpus, schema="doc_id string, tokens array<int>, n_tok int, source string"
    ).cache()


@pytest.fixture(scope="module")
def registry():
    return GrokRegistry.with_default_patterns()


def test_detokenize_roundtrip(spark, seq_df, corpus):
    out = seq_df.withColumn("line", detokenize_udf()(F.col("tokens"))).select(
        "doc_id", "line"
    )
    got = {r["doc_id"]: r["line"] for r in out.collect()}
    for row in corpus:
        expected = bytes(row["tokens"]).decode("utf-8")
        assert got[row["doc_id"]] == expected


@pytest.mark.parametrize("source", [s for s, (_w, r, _e) in SOURCES.items() if r])
def test_parse_map_matches_pure_python(spark, seq_df, corpus, registry, source):
    expr = SOURCES[source][2]
    compiled = registry.compile(expr, with_alias_only=True)
    parse = grok_parse_map_udf(compiled, from_tokens=True)
    rows = (
        seq_df.filter(F.col("source") == source)
        .withColumn("fields", parse(F.col("tokens")))
        .select("doc_id", "tokens", "fields")
        .collect()
    )
    assert rows, f"no test rows for {source}"
    for r in rows:
        line = bytes(r["tokens"]).decode("utf-8")
        expected = compiled.match_against(line)
        assert r["fields"] == expected, f"{source}: {line!r}"


def test_parse_struct_matches_pure_python(spark, seq_df, registry):
    compiled = registry.compile(SOURCES["app_log"][2], with_alias_only=True)
    parse = grok_parse_struct_udf(compiled, from_tokens=True)
    rows = (
        seq_df.filter(F.col("source") == "app_log")
        .withColumn("parsed", parse(F.col("tokens")))
        .select("tokens", "parsed.*")
        .collect()
    )
    assert rows
    for r in rows:
        line = bytes(r["tokens"]).decode("utf-8")
        expected = compiled.match_against(line)
        if expected is None:
            assert r["_matched"] is False
            assert all(r[k] is None for k in compiled.capture_names)
        else:
            assert r["_matched"] is True
            for k in compiled.capture_names:
                assert r[k] == expected.get(k)


def test_match_udf(spark, seq_df, registry):
    compiled = registry.compile(SOURCES["syslog"][2], with_alias_only=True)
    rows = (
        seq_df.filter(F.col("source") == "syslog")
        .withColumn("m", grok_match_udf(compiled, from_tokens=True)(F.col("tokens")))
        .collect()
    )
    assert rows
    for r in rows:
        line = bytes(r["tokens"]).decode("utf-8")
        assert r["m"] == (compiled.match_against(line) is not None)


def test_typed_extract_casts(spark, registry):
    """ELB extract tags :int/:float must become long/double columns
    (/root/reference/patterns/aws.pattern:11)."""
    compiled = registry.compile("%{ELB_ACCESS_LOG}", with_alias_only=True)
    assert compiled.extracts["clientport"] == "int"
    line = (
        "2015-05-13T23:39:43.945958Z my-loadbalancer 192.168.131.39:2817 "
        "10.0.0.1:80 0.000073 0.001048 0.000057 200 200 0 29 "
        '"GET https://example.com:443/ HTTP/1.1"'
    )
    df = spark.createDataFrame([(list(line.encode()),)], "tokens array<int>")
    parse = grok_parse_map_udf(compiled, from_tokens=True)
    out = apply_extracts(df.withColumn("fields", parse("tokens")), compiled, "fields")
    schema = dict((f.name, f.dataType.simpleString()) for f in out.schema.fields)
    assert schema["clientport"] == "bigint"
    assert schema["request_processing_time"] == "double"
    row = out.collect()[0]
    assert row["clientport"] == 2817
    assert row["backendport"] == 80
    assert abs(row["request_processing_time"] - 0.000073) < 1e-12
