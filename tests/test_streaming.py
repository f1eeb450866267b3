"""Structured Streaming tests: windowed route counts equal the batch
pipeline; stateful first-seen dedup drops replays across micro-batches."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from grokspark.datagen import iter_rows

N_ROWS = 400


@pytest.fixture(scope="module")
def corpus():
    return list(iter_rows(N_ROWS))


@pytest.fixture()
def input_dir(spark, corpus, tmp_path):
    """Corpus split across two parquet files (two stream micro-batches
    with maxFilesPerTrigger=1)."""
    d = tmp_path / "stream_in"
    half = N_ROWS // 2
    schema = "doc_id string, tokens array<int>, n_tok int, source string"
    spark.createDataFrame(corpus[:half], schema).coalesce(1).write.parquet(
        str(d / "p0")
    )
    spark.createDataFrame(corpus[half:], schema).coalesce(1).write.parquet(
        str(d / "p1")
    )
    return str(d) + "/*/"


def test_stream_windowed_counts_match_batch(spark, corpus, input_dir, tmp_path):
    from grokspark.pipeline import route_match_counts
    from grokspark.streaming import read_sequence_stream, stream_windowed_route_counts

    stream = read_sequence_stream(spark, input_dir, max_files_per_trigger=1)
    counts = stream_windowed_route_counts(stream, window="1 minute", watermark="30 seconds")
    q = (
        counts.writeStream.format("memory")
        .queryName("route_counts_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql(
        "SELECT route, matched, SUM(n) AS n FROM route_counts_stream GROUP BY route, matched"
    ).collect()
    stream_totals = {(r["route"], r["matched"]): r["n"] for r in got}

    schema = "doc_id string, tokens array<int>, n_tok int, source string"
    batch = route_match_counts(spark, spark.createDataFrame(corpus, schema)).collect()
    batch_totals = {(r["route"], r["matched"]): r["n"] for r in batch}
    assert stream_totals == batch_totals

    # windows are deterministic (event time = t0 + index seconds):
    # N_ROWS=400 rows -> indices 0..399s -> windows 0..6 (1-minute)
    windows = spark.sql("SELECT DISTINCT win_start FROM route_counts_stream").collect()
    assert 1 <= len(windows) <= 7


def test_stream_first_seen_dedup(spark, corpus, tmp_path):
    """Replayed rows (same doc_id in both micro-batches) must be emitted
    exactly once."""
    from grokspark.streaming import read_sequence_stream, stream_first_seen

    d = tmp_path / "replay_in"
    half = N_ROWS // 2
    schema = "doc_id string, tokens array<int>, n_tok int, source string"
    # second file replays the last 50 rows of the first + 50 new ones
    spark.createDataFrame(corpus[:half], schema).coalesce(1).write.parquet(str(d / "p0"))
    spark.createDataFrame(corpus[half - 50 : half + 50], schema).coalesce(1).write.parquet(
        str(d / "p1")
    )

    stream = read_sequence_stream(spark, str(d) + "/*/", max_files_per_trigger=1)
    dedup = stream_first_seen(stream)
    q = (
        dedup.writeStream.format("memory")
        .queryName("first_seen_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("SELECT doc_id FROM first_seen_stream").collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids)), "duplicate emission"
    expected = {r["doc_id"] for r in corpus[: half + 50]}
    assert set(ids) == expected


def test_first_seen_state_is_bucketed_and_fixed_width(spark, corpus):
    """The first-seen state contract at scale: per-group state holds
    fixed-width 8-byte digests and is sharded over n_buckets groups, so
    no group's state is O(corpus) and replays add nothing."""
    import collections

    import pandas as pd
    from pyspark.sql import functions as F

    from grokspark.streaming import _FIRST_SEEN_STATE, first_seen_filter

    # state schema stores longs (8-byte digests), not id strings
    assert _FIRST_SEEN_STATE["seen"].dataType.elementType.typeName() == "long"

    # shard the corpus exactly as stream_first_seen does (JVM-side
    # xxhash64 + pmod) and replay every batch twice through the pure
    # per-group step
    n_buckets = 16
    schema = "doc_id string, tokens array<int>, n_tok int, source string"
    keyed = (
        spark.createDataFrame(corpus, schema)
        .withColumn("_digest", F.xxhash64("doc_id"))
        .withColumn("_bucket", F.pmod(F.col("_digest"), F.lit(n_buckets)).cast("int"))
        .select("doc_id", "source", "n_tok", "_digest", "_bucket")
        .collect()
    )
    groups: dict[tuple, list] = collections.defaultdict(list)
    for r in keyed:
        groups[(r["source"], r["_bucket"])].append(
            (r["doc_id"], r["source"], r["n_tok"], r["_digest"])
        )
    emitted = []
    state_sizes = {}
    for key, rows in groups.items():
        pdf = pd.DataFrame(rows, columns=["doc_id", "source", "n_tok", "_digest"])
        seen: set = set()
        out1 = first_seen_filter(seen, pdf)
        out2 = first_seen_filter(seen, pdf)  # full replay of the batch
        assert len(out2) == 0, "replayed rows re-emitted"
        # state grows with DISTINCT ids in this bucket only
        assert len(seen) == pdf["_digest"].nunique()
        emitted.extend(out1["doc_id"])
        state_sizes[key] = len(seen)

    assert sorted(emitted) == sorted({r["doc_id"] for r in corpus})
    # sharding: no group's state approaches the corpus; it stays near
    # ids_per_source / n_buckets (allow 3x headroom for hash variance)
    per_source = collections.Counter(r["source"] for r in corpus)
    for (source, _bucket), size in state_sizes.items():
        assert size <= max(8, 3 * per_source[source] / n_buckets), (
            source,
            size,
            per_source[source],
        )


def test_stream_route_sinks_match_batch_and_idempotent(spark, corpus, input_dir, tmp_path):
    """foreachBatch fan-out sinks: per-(route, matched) counts across
    all micro-batches equal the batch pipeline; restarting the finished
    stream from its checkpoint writes nothing new."""
    from grokspark.pipeline import route_match_counts
    from grokspark.streaming import read_sequence_stream, stream_route_sinks

    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    stream = read_sequence_stream(spark, input_dir, max_files_per_trigger=1)
    q = stream_route_sinks(stream, out, ckpt)
    q.awaitTermination(120)

    sinks = spark.read.parquet(f"{out}/sinks")
    assert {r["batch_id"] for r in sinks.select("batch_id").distinct().collect()} == {0, 1}
    routed = sinks.filter(F.col("route") != "_unroutable")
    got = {
        (r["route"], r["matched"]): r["n"]
        for r in routed.groupBy("route", "matched").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    schema = "doc_id string, tokens array<int>, n_tok int, source string"
    batch = {
        (r["route"], r["matched"]): r["n"]
        for r in route_match_counts(spark, spark.createDataFrame(corpus, schema)).collect()
    }
    assert got == batch

    # unroutable rows are dead-lettered, not dropped
    n_unroutable = sum(1 for r in corpus if r["source"] == "debug_feed")
    assert sinks.filter(F.col("route") == "_unroutable").count() == n_unroutable

    # token pass-through invariant holds in streaming sinks too
    input_tokens = {row["doc_id"]: row["tokens"] for row in corpus}
    for r in sinks.select("doc_id", "tokens").limit(50).collect():
        assert r["tokens"] == input_tokens[r["doc_id"]]

    # restart from the same checkpoint: no new batches, identical data
    before = sinks.count()
    q2 = stream_route_sinks(
        read_sequence_stream(spark, input_dir, max_files_per_trigger=1), out, ckpt
    )
    q2.awaitTermination(120)
    after = spark.read.parquet(f"{out}/sinks")
    assert after.count() == before
    assert {r["batch_id"] for r in after.select("batch_id").distinct().collect()} == {0, 1}


def test_stream_windowed_counts_append_finalization_and_state_eviction(spark, tmp_path):
    """Watermark semantics that Spark actually GUARANTEES for append-
    mode aggregation (and that we rely on at scale):

    - the watermark advances per micro-batch from observed event times;
    - every finalized (window, route, matched) group is emitted EXACTLY
      once, with the full cross-batch count;
    - closed-window state is EVICTED (state rows shrink once the
      watermark passes a window) — bounded state, not O(stream);
    - still-open windows are withheld from append output.

    Deliberately NOT asserted: that a row arriving behind the watermark
    is dropped. Spark documents the watermark as a *may*-drop bound —
    measured here, a late row into an already-closed window is
    aggregated and emitted immediately (numRowsDroppedByWatermark=0),
    so exactly-once sinks must be idempotent on (window, keys), which
    stream_route_sinks' batch_id-keyed publish is."""
    from grokspark.datagen import line_for
    from grokspark.streaming import read_sequence_stream, stream_windowed_route_counts

    def rows(indices):
        out = []
        for i in indices:
            line = line_for(i, "apache_access")
            toks = list(line.encode("utf-8"))
            out.append((f"apache_access-{i:08d}", toks, len(toks), "apache_access"))
        return out

    schema = "doc_id string, tokens array<int>, n_tok int, source string"
    d = tmp_path / "late_in"
    spark.createDataFrame(rows(range(1000, 1060)), schema).coalesce(1).write.parquet(
        str(d / "p0")
    )
    import time

    time.sleep(1.1)  # file-source ordering is by modification time
    # second batch pushes the watermark to 5004-300 s, closing batch-1's
    # windows; its own window (t0+5000s) stays open
    spark.createDataFrame(rows(range(5000, 5005)), schema).coalesce(1).write.parquet(
        str(d / "p1")
    )

    stream = read_sequence_stream(spark, str(d) + "/*/", max_files_per_trigger=1)
    counts = stream_windowed_route_counts(stream, window="1 minute", watermark="5 minutes")
    q = (
        counts.writeStream.format("memory")
        .queryName("late_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # watermark advanced across batches
    wms = [
        p["eventTime"].get("watermark")
        for p in q.recentProgress
        if p["eventTime"].get("watermark")
    ]
    assert wms == sorted(wms) and len(set(wms)) >= 2, wms

    rows_out = spark.sql(
        "SELECT win_start, route, matched, n FROM late_stream"
    ).collect()
    keys = [(r["win_start"], r["route"], r["matched"]) for r in rows_out]
    assert len(keys) == len(set(keys)), "finalized group emitted twice"
    by_start = {}
    for r in rows_out:
        by_start[r["win_start"].strftime("%H:%M:%S")] = (
            by_start.get(r["win_start"].strftime("%H:%M:%S"), 0) + r["n"]
        )
    # batch-1 windows finalized with their exact counts
    # (indices 1000..1019 -> [00:16,00:17), 1020..1059 -> [00:17,00:18))
    assert by_start.get("00:16:00") == 20, by_start
    assert by_start.get("00:17:00") == 40, by_start
    # batch-2's own window is still open at stream end -> withheld
    assert "01:23:00" not in by_start, by_start

    # eviction: final state holds only the still-open window's groups,
    # strictly fewer rows than the peak
    so = [p["stateOperators"][0] for p in q.recentProgress if p["stateOperators"]]
    state_rows = [s["numRowsTotal"] for s in so]
    assert state_rows[-1] < max(state_rows), state_rows


def test_stream_sessionize_native_session_windows(spark, tmp_path):
    """Native session windows: per-source sessions close after the gap,
    merge across micro-batches, and finalize exactly once with start =
    first event, end = last event + gap, n = row count."""
    from grokspark.datagen import line_for
    from grokspark.streaming import read_sequence_stream, stream_sessionize

    def rows(source, indices):
        out = []
        for i in indices:
            line = line_for(i, source)
            toks = list(line.encode("utf-8"))
            out.append((f"{source}-{i:08d}", toks, len(toks), source))
        return out

    schema = "doc_id string, tokens array<int>, n_tok int, source string"
    d = tmp_path / "sess_in"
    # batch 1: two apache sessions (gap 120 s) + one elb session
    spark.createDataFrame(
        rows("apache_access", [0, 30, 60, 500, 540]) + rows("elb", [10, 40]),
        schema,
    ).coalesce(1).write.parquet(str(d / "p0"))
    import time

    time.sleep(1.1)
    # batch 2: continues apache session B within the gap (merge across
    # batches), then a far-future row closes everything else
    spark.createDataFrame(
        rows("apache_access", [620]) + rows("apache_access", [5000]), schema
    ).coalesce(1).write.parquet(str(d / "p1"))

    stream = read_sequence_stream(spark, str(d) + "/*/", max_files_per_trigger=1)
    sess = stream_sessionize(stream, gap="2 minutes", watermark="5 minutes")
    q = (
        sess.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["source"], r["sess_start"].strftime("%H:%M:%S"),
         r["sess_end"].strftime("%H:%M:%S")): r["n_rows"]
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    }
    expected = {
        # apache A: events 0,30,60 -> [0, 60+120)
        ("apache_access", "00:00:00", "00:03:00"): 3,
        # apache B: 500,540 then 620 arrives NEXT batch within gap ->
        # one merged session [500, 620+120)
        ("apache_access", "00:08:20", "00:12:20"): 3,
        # elb: 10,40 -> [10, 160)
        ("elb", "00:00:10", "00:02:40"): 2,
    }
    assert got == expected, got


# -- publish rename-discipline crash windows (pure filesystem) ---------------


def _mkbatch(path, payload):
    import os

    os.makedirs(path, exist_ok=True)
    with open(f"{path}/part-0.parquet", "w") as f:
        f.write(payload)


def _read(path):
    with open(f"{path}/part-0.parquet") as f:
        return f.read()


def test_publish_recovery_every_crash_window(tmp_path):
    """Simulate each possible crash point of publish_batch and assert
    recover_batch_publish leaves readers with a complete batch dir:
    the OLD data until a fresh staged write republishes, never a
    missing/partial dir — including the window where the tombstone is
    the only surviving copy (ADVICE r4)."""
    import os

    from grokspark.streaming import publish_batch, recover_batch_publish

    root = str(tmp_path)
    staging = f"{root}/_staging/batch_id=0"
    final = f"{root}/sinks/batch_id=0"
    tombstone = f"{root}/_tombstone/batch_id=0"

    # clean first publish
    _mkbatch(staging, "v1")
    publish_batch(staging, final, tombstone)
    assert _read(final) == "v1" and not os.path.exists(tombstone)

    # window A: crash after staging written, before any rename
    _mkbatch(staging, "v2-partial")
    recover_batch_publish(staging, final, tombstone)
    assert _read(final) == "v1" and not os.path.exists(staging)

    # window B: crash between replace(final, tombstone) and
    # replace(staging, final) — final MISSING, tombstone holds the only
    # copy. Recovery must restore it, not delete it.
    _mkbatch(staging, "v2")
    os.makedirs(os.path.dirname(tombstone), exist_ok=True)
    os.replace(final, tombstone)
    assert not os.path.exists(final)
    recover_batch_publish(staging, final, tombstone)
    assert _read(final) == "v1", "tombstone-only window lost the batch"
    assert not os.path.exists(tombstone) and not os.path.exists(staging)

    # window C: crash after replace(staging, final), before tombstone rm
    _mkbatch(staging, "v2")
    os.replace(final, tombstone)
    os.replace(staging, final)
    recover_batch_publish(f"{root}/_staging/batch_id=0", final, tombstone)
    assert _read(final) == "v2" and not os.path.exists(tombstone)

    # full replay after recovery still swaps cleanly
    _mkbatch(staging, "v3")
    publish_batch(staging, final, tombstone)
    assert _read(final) == "v3" and not os.path.exists(tombstone)
