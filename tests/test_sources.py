"""Source abstraction tests: parquet/table routing and the raw-text
log ingest adapter (reference users' entry path: plain *.log files)."""

from __future__ import annotations

import pytest

from grokspark.sources import is_table_identifier, read_raw_lines, read_sequences


def test_is_table_identifier():
    assert is_table_identifier("lake.db.sequences")
    assert is_table_identifier("db.sequences")
    assert not is_table_identifier("/data/sequences")
    assert not is_table_identifier("s3://bucket/sequences")
    assert not is_table_identifier("file:/tmp/x")


def test_read_sequences_parquet(spark, tmp_path):
    from grokspark.datagen import iter_rows

    rows = list(iter_rows(50))
    path = str(tmp_path / "seq")
    spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    ).write.parquet(path)
    got = read_sequences(spark, path)
    assert got.count() == 50
    assert got.columns == ["doc_id", "tokens", "n_tok", "source"]


def test_read_raw_lines_roundtrip_and_parse(spark, tmp_path):
    """Raw apache log file -> sequence shape -> the full parse pipeline,
    counts equal the pure-Python matcher over the same lines."""
    from grokspark import GrokRegistry
    from grokspark.datagen import line_for
    from grokspark.pipeline import route_match_counts

    lines = [line_for(i, "apache_access") for i in range(120)]
    log = tmp_path / "apache_access.log"
    log.write_text("\n".join(lines) + "\n", encoding="utf-8")

    seq = read_raw_lines(spark, str(tmp_path / "*.log"))
    rows = seq.collect()
    assert len(rows) == 120
    assert len({r["doc_id"] for r in rows}) == 120  # unique ids
    # tokens are the exact UTF-8 bytes of each line
    got_lines = sorted(bytes(r["tokens"]).decode("utf-8") for r in rows)
    assert got_lines == sorted(lines)
    assert {r["source"] for r in rows} == {"apache_access"}
    assert all(r["n_tok"] == len(r["tokens"]) for r in rows)

    counts = {
        (r["route"], r["matched"]): r["n"]
        for r in route_match_counts(spark, seq).collect()
    }
    compiled = GrokRegistry.with_default_patterns().compile(
        "%{HTTPD_COMBINEDLOG}", with_alias_only=True
    )
    want_matched = sum(1 for l in lines if compiled.match_against(l) is not None)
    assert counts.get(("web", True), 0) == want_matched
    assert counts.get(("web", False), 0) == 120 - want_matched


def test_read_raw_lines_fixed_source_label(spark, tmp_path):
    (tmp_path / "whatever.log").write_text("a line\n", encoding="utf-8")
    seq = read_raw_lines(spark, str(tmp_path / "*.log"), source="syslog")
    assert [r["source"] for r in seq.collect()] == ["syslog"]


def test_read_raw_lines_content_ids_survive_replans(spark, tmp_path):
    """content id_mode: re-ingesting the same files under a DIFFERENT
    split plan yields the same doc_ids (resume-safe), while split
    id_mode ids are positional and plan-dependent."""
    from grokspark.datagen import line_for

    lines = [line_for(i, "apache_access") for i in range(300)]
    (tmp_path / "a.log").write_text("\n".join(lines) + "\n", encoding="utf-8")
    glob = str(tmp_path / "*.log")

    def ids_with_split_bytes(nbytes, id_mode):
        old = spark.conf.get("spark.sql.files.maxPartitionBytes")
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(nbytes))
        try:
            df = read_raw_lines(spark, glob, id_mode=id_mode)
            assert df.rdd.getNumPartitions() >= 1
            return sorted(r["doc_id"] for r in df.collect())
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)

    a = ids_with_split_bytes(1 << 25, "content")
    b = ids_with_split_bytes(4096, "content")  # forces a multi-split plan
    assert a == b and len(a) == 300 and len(set(a)) == 300

    # the positional scheme documents its caveat: ids change with plan
    c = ids_with_split_bytes(1 << 25, "split")
    d = ids_with_split_bytes(4096, "split")
    assert len(c) == len(d) == 300
    assert c != d


def test_read_raw_lines_content_mode_coalesces_duplicate_lines(spark, tmp_path):
    (tmp_path / "x.log").write_text("same\nsame\nother\n", encoding="utf-8")
    glob = str(tmp_path / "*.log")
    content = read_raw_lines(spark, glob, id_mode="content").collect()
    assert len({r["doc_id"] for r in content}) == 2  # same content, one id
    split = read_raw_lines(spark, glob, id_mode="split").collect()
    assert len({r["doc_id"] for r in split}) == 3
