"""JVM-native grok fast path: per-line parity with the Python kernel
on the datagen corpus (match flags AND field values), numbering safety
under name-stripping, eligibility guards, and the plan property that
makes it worth having — no Python workers anywhere."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grokspark import GrokRegistry
from grokspark.jvmgrok import (
    detokenize_col,
    field_index_map,
    java_compatible,
    java_source,
    jvm_field_col,
    jvm_match_col,
)


@pytest.fixture(scope="module")
def registry():
    return GrokRegistry.with_default_patterns()


def test_eligibility_split_over_builtins(registry):
    """Every builtin compiles to either the JVM path or a documented
    reference-engine-only pattern (POSIX classes)."""
    from grokspark.patterns import default_patterns

    n_elig = n_posix = 0
    for name in default_patterns():
        try:
            p = registry.compile("%{" + name + "}")
        except Exception:
            continue  # patterns needing args are covered elsewhere
        if java_compatible(p.regex_src):
            n_elig += 1
            js = java_source(p)
            lb = js.replace("(?<=", "").replace("(?<!", "")
            assert "(?<" not in lb, name  # every name stripped
        else:
            n_posix += 1
            assert "[[:" in p.regex_src, name  # only POSIX-class rejects
    assert n_elig > 250 and n_posix > 0, (n_elig, n_posix)


def _corpus(spark, source):
    from grokspark.datagen import iter_rows

    rows = [
        (r["doc_id"], bytes(r["tokens"]).decode("utf-8"))
        for r in iter_rows(4000)
        if r["source"] == source
    ]
    assert rows
    return rows, spark.createDataFrame(rows, "doc_id string, line string")


@pytest.mark.parametrize(
    "source,fields",
    [
        ("apache_access", ["verb", "response", "clientip", "bytes", "agent"]),
        ("elb", ["backendport", "elb", "request", "response"]),
    ],
)
def test_jvm_matches_python_kernel(spark, registry, source, fields):
    from grokspark.datagen import SOURCES

    compiled = registry.compile(SOURCES[source][2], with_alias_only=True)
    rows, df = _corpus(spark, source)

    out = df.select(
        "doc_id",
        jvm_match_col(compiled, F.col("line")).alias("m"),
        *[
            jvm_field_col(compiled, F.col("line"), f).alias(f)
            for f in fields
        ],
    ).collect()
    got = {r["doc_id"]: r for r in out}

    n_matched = 0
    for doc_id, line in rows:
        py = compiled.match_against(line)
        r = got[doc_id]
        assert r["m"] == (py is not None), (doc_id, line)
        if py is None:
            continue
        n_matched += 1
        for f in fields:
            if f in py:
                assert r[f] == py[f], (doc_id, f, r[f], py[f])
            else:
                # documented delta: non-participating group -> ''
                assert r[f] == "", (doc_id, f)
    # corpus includes corrupt lines, so both outcomes are exercised
    assert 0 < n_matched < len(rows)


def test_jvm_detokenize_matches_bytes_decode(spark):
    from grokspark.datagen import iter_rows

    rows = [(r["doc_id"], r["tokens"]) for r in iter_rows(500)]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = {
        r["doc_id"]: r["line"]
        for r in df.select(
            "doc_id", detokenize_col(F.col("tokens")).alias("line")
        ).collect()
    }
    for doc_id, tokens in rows:
        assert got[doc_id] == bytes(tokens).decode("utf-8")


def test_jvm_plan_has_no_python_workers(spark, registry):
    from grokspark.datagen import SOURCES

    compiled = registry.compile(SOURCES["apache_access"][2], with_alias_only=True)
    df = spark.createDataFrame([("1", [104, 105])], "doc_id string, tokens array<int>")
    line = detokenize_col(F.col("tokens"))
    plan = (
        df.select(
            jvm_match_col(compiled, line).alias("m"),
            jvm_field_col(compiled, line, "verb").alias("v"),
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInArrow", "FlatMapsInPandas"):
        assert marker not in plan, plan


def test_ineligible_pattern_raises(registry):
    p = registry.compile("%{BACULA_LOGLINE}")
    with pytest.raises(ValueError):
        java_source(p)
    assert not java_compatible(p.regex_src)


def test_unknown_field_raises(spark, registry):
    p = registry.compile("%{HTTPD_COMBINEDLOG}", with_alias_only=True)
    with pytest.raises(KeyError):
        jvm_field_col(p, F.lit("x"), "nope")
    assert "verb" in field_index_map(p)
