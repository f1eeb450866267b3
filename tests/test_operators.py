"""Training-data operator tests: approximate operators are checked
against their exact counterparts on the driver-provided testdata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_exact_dedup_counts(docs):
    from grokspark.operators import exact_dedup

    total = docs.count()
    deduped = exact_dedup(docs)
    agg = deduped.agg(
        F.count(F.lit(1)).alias("groups"), F.sum("n_copies").alias("rows")
    ).head()
    assert agg["rows"] == total
    assert agg["groups"] <= total


def test_minhash_lsh_recall_vs_exact(docs):
    """LSH candidates must recover the exact jaccard pairs (32 bands of
    4 at threshold 0.5 -> expected recall ~1 at this scale)."""
    from grokspark.operators import jaccard_pairs, minhash_lsh_pairs

    exact = {
        (r["id_a"], r["id_b"]) for r in jaccard_pairs(docs, 0.5, n=2).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs, 0.5, n=2).collect()
    }
    # verification makes LSH precise; recall is the approximate part
    assert lsh.issubset(exact)
    if exact:
        assert len(lsh) / len(exact) >= 0.9


def test_ann_lsh_recall_vs_brute_force(emb):
    from grokspark.operators import ann_brute_force_topk, lsh_bucketed_topk

    query = emb.filter(F.col("vec_id") == 1).head()["embedding"]
    exact = [r["vec_id"] for r in ann_brute_force_topk(emb, query, k=10).collect()]
    approx = [
        r["vec_id"]
        for r in lsh_bucketed_topk(emb, query, k=10, probe_hamming=2).collect()
    ]
    # the query's own vector must rank first in both
    assert exact[0] == 1 and approx[0] == 1
    assert len(set(exact) & set(approx)) >= 5  # recall@10 >= 0.5 with 2-bit probe


def test_simhash_near_duplicates(spark):
    from grokspark.operators import simhash_signatures

    rows = [
        ("a", "the quick brown fox jumps over the lazy dog"),
        ("b", "the quick brown fox jumps over the lazy cat"),
        ("c", "completely different words entirely unrelated content here"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(df).collect()}

    def hamming(x, y):
        return bin((x ^ y) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert hamming(sigs["a"], sigs["b"]) < hamming(sigs["a"], sigs["c"])
    # determinism across invocations
    sigs2 = {r["doc_id"]: r["simhash"] for r in simhash_signatures(df).collect()}
    assert sigs == sigs2


def test_multimodal_stub_and_plumbing(spark, docs):
    from grokspark.operators.multimodal import (
        decode_image,
        extract_image_features,
        payload_df_from_text,
    )

    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x01", fake=False)

    payloads = payload_df_from_text(docs.limit(50))
    feats = extract_image_features(payloads, fake=True)
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert 16 <= r["width"] <= 255 and 16 <= r["height"] <= 255
        assert 0.0 <= r["mean_luma"] <= 1.0
        assert len(r["sha1"]) == 40
    # deterministic across runs
    again = {r["item_id"]: r["sha1"] for r in extract_image_features(payloads, fake=True).collect()}
    assert all(again[r["item_id"]] == r["sha1"] for r in rows)


def test_quality_and_langid_columns(docs):
    from grokspark.operators import lang_id, quality_scores

    q = quality_scores(docs.limit(20)).collect()
    for r in q:
        assert r["n_words"] > 0
        assert 0.0 <= r["punct_ratio"] <= 1.0
        assert r["quality_keep"] in (0, 1)
    preds = lang_id(docs.limit(20)).select("lang_pred").distinct().collect()
    assert {r["lang_pred"] for r in preds} <= {"en", "other"}
