"""End-to-end training-corpus preparation — the composed job a
pipeline actually materializes, chaining the individually-verified
operators:

    quality filter  (textops.quality_scores keep rule)
 -> repetition filter (optional: textops.repetition_scores keep rule —
                     the Gopher-style second quality gate)
 -> decontamination (optional: decontam.decontaminate against a
                     benchmark table — contaminated docs dropped)
 -> near-dup dedup  (dedup.dedup_corpus: exact collapse + MinHash-LSH
                     + connected components; keep one rep per cluster)
 -> hash split      (sampling.hash_split train/val/test)
 -> BPE tokenize    (bpe.train_bpe on the TRAIN split only — the
                     leakage-safe convention: val/test must not shape
                     the vocab — then bpe.apply_bpe_ids corpus-wide)
 -> sequence pack   (one grouped pack over (split, bucket) — same
                     per-group packing as packing.pack_sequences)

Output: one packed training table ``(split, bucket, pack_id, n_docs,
n_tok, doc_ids, tokens, n_truncated)`` — a pure function of the corpus
content (every stage is deterministic and partition-independent), so
the whole composition is reproducible bit-for-bit by the single-process
``prepare_corpus_py`` twin that drives the driver oracle.

Scale shape: each stage keeps its own 100-TB discipline (one
hash-aggregate collapse, narrow LSH band shuffles, driver-bounded BPE
word table, md5-bucketed packing); the composition adds only narrow
id-joins between stages. The kept-document set is localCheckpoint-ed
once — dedup's decision table feeds the split, the tokenizer and the
packer, and without the checkpoint each consumer would re-run the
whole LSH+CC job (same rule as duplicate_clusters' edge set).
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grokspark.operators.bpe import (
    apply_bpe_ids,
    bpe_vocab,
    cap_word_counts,
    encode_word,
    pretokenize,
    train_bpe_py,
    word_counts_df,
)
from grokspark.operators.dedup import dedup_corpus
from grokspark.operators.packing import (
    _PACK_SCHEMA,
    pack_bucket_col,
    pack_bucket_of,
    pack_sequences_py,
)
from grokspark.operators.sampling import hash_split, split_thresholds
from grokspark.operators.textops import STOPWORDS_EN, quality_scores

__all__ = ["prepare_corpus", "prepare_corpus_py"]

DEFAULT_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


def prepare_corpus(
    df: DataFrame,
    *,
    split_weights: Optional[dict[str, float]] = None,
    max_len: int = 512,
    n_buckets: int = 32,
    n_merges: int = 200,
    max_words: Optional[int] = None,
    threshold: float = 0.5,
    n: int = 2,
    bands: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_clean: bool = False,
    repetition_filter: bool = False,
    bench_df: Optional[DataFrame] = None,
    decontam_n: int = 3,
    precomputed_pairs: Optional[DataFrame] = None,
) -> DataFrame:
    """Quality-filter, dedup, split, BPE-tokenize and pack a raw
    ``(id, text)`` corpus into training rows (module doc has the full
    contract). ``max_words`` caps the word-frequency table that rides
    to the driver for the BPE merge loop (deterministic top-N: count
    desc, word asc) — at corpus scale the distinct-word tail is
    Heaps-bounded but not driver-bounded without it.

    ``line_clean=True`` runs C4-style line-level cleaning FIRST
    (``clean.c4_clean``): non-kept documents drop and every surviving
    document's text is replaced by its cleaned lines before any other
    stage sees it (map-only, fuses into the quality scan).
    ``repetition_filter=True`` adds the Gopher-style repetition keep
    rule after the base quality gate (both are map-only, so they fuse
    into one scan). ``bench_df`` drops every document sharing a word
    ``decontam_n``-gram with the benchmark table BEFORE dedup (the
    cheap filters shrink what LSH chews). Domain-mixture downsampling
    (``sampling.mixture_sample``) composes upstream of this job — the
    packed output drops the group column, so mix first.

    ``precomputed_pairs`` forwards to ``dedup_corpus``: a sibling
    job's exact-recall pair graph over a SUPERSET of this corpus (same
    threshold/n recall contract) skips the whole LSH stage — the
    cross-job artifact-reuse pattern a real pipeline runs (compute the
    pair graph once, share it between the dedup report and corpus
    prep)."""
    from grokspark.operators.textops import repetition_scores

    weights = split_weights or DEFAULT_SPLITS
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")

    if line_clean:
        # C4-style line-level cleanup first (map-only, fuses into the
        # same scan as the quality gate): downstream stages see the
        # CLEANED text of surviving documents
        from grokspark.operators.clean import c4_clean

        df = (
            c4_clean(df, text_col=text_col, id_col=id_col)
            .filter(F.col("kept"))
            .select(F.col(id_col), F.col("text_clean").alias(text_col))
        )
    quality = quality_scores(df, text_col).filter(F.col("quality_keep") == 1)
    if repetition_filter:
        quality = repetition_scores(quality, text_col).filter(
            F.col("repetition_keep") == 1
        )
    if bench_df is not None:
        from grokspark.operators.decontam import decontaminate

        hits = decontaminate(quality, bench_df, decontam_n, text_col, id_col)
        quality = quality.join(hits, id_col, "left_anti")
    # the filtered set feeds dedup (fingerprints + LSH input), the
    # pair restriction, and the kept semi-join — materialize it once
    # so the map-only filter chain isn't re-scanned per consumer
    quality = quality.select(id_col, text_col).localCheckpoint()
    decisions = dedup_corpus(
        quality, threshold=threshold, n=n, bands=bands,
        text_col=text_col, id_col=id_col,
        precomputed_pairs=precomputed_pairs,
    )
    kept = quality.join(
        decisions.filter(F.col("keep")).select(id_col), id_col, "left_semi"
    ).select(id_col, text_col)
    kept = hash_split(kept, weights, id_col=id_col).localCheckpoint()

    train_docs = kept.filter(F.col("split") == "train")
    wc = word_counts_df(train_docs, text_col)
    if max_words is not None:
        wc = wc.orderBy(F.col("n").desc(), F.col("word").asc()).limit(max_words)
    counts = {r["word"]: r["n"] for r in wc.collect()}
    merges = train_bpe_py(counts, n_merges)
    vocab = bpe_vocab(counts, merges)

    # ONE grouped pack over (split, bucket) instead of a per-split
    # pack_sequences loop: packing is a per-(split, bucket)-group
    # function either way (same rows, same greedy-by-id order — the
    # packer sorts its group internally — same pack_id = "<bucket>#<i>"
    # numbering), so the output is bit-identical. BPE encoding happens
    # INSIDE the pack stage (one Python stage, one JVM<->Python Arrow
    # boundary) rather than as a separate Arrow tokenize stage: the
    # shuffle carries text (~the same bytes as the token ids) and the
    # merge table ships once per task via closure; per-word memoization
    # makes the encode itself negligible (token streams identical —
    # same merges, same vocab, deterministic encode_word).
    keyed = kept.select(
        "split",
        pack_bucket_col(id_col, n_buckets).alias("bucket"),
        F.col(id_col).cast("string").alias("_id"),
        F.col(text_col).alias("_text"),
    )

    import pandas as pd

    merges_local = list(merges)
    vocab_local = dict(vocab)

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ranks = {p: i for i, p in enumerate(merges_local)}
        memo: dict[str, list[int]] = {}

        def ids_of(t) -> list[int]:
            out: list[int] = []
            for w in pretokenize(t):
                if w not in memo:
                    memo[w] = [
                        vocab_local.get(s, 0) for s in encode_word(w, ranks)
                    ]
                out.extend(memo[w])
            return out

        split = pdf["split"].iloc[0]
        bucket = int(pdf["bucket"].iloc[0])
        packs = pack_sequences_py(
            ((i, ids_of(t)) for i, t in zip(pdf["_id"], pdf["_text"])),
            max_len,
        )
        return pd.DataFrame(
            {
                "split": split,
                "bucket": bucket,
                "pack_id": [f"{bucket}#{i}" for i in range(len(packs))],
                "n_docs": [p["n_docs"] for p in packs],
                "n_tok": [p["n_tok"] for p in packs],
                "doc_ids": [p["doc_ids"] for p in packs],
                "tokens": [p["tokens"] for p in packs],
                "n_truncated": [p["n_truncated"] for p in packs],
            }
        )

    out = keyed.groupBy("split", "bucket").applyInPandas(
        pack, schema="split string, " + _PACK_SCHEMA
    )
    return out.select(
        "split", "bucket", "pack_id", "n_docs", "n_tok",
        "doc_ids", "tokens", "n_truncated",
    )


# -- single-process reference twin (drives the driver oracle) ----------------

# Java \s and \w are ASCII — Python's are Unicode, so pin ASCII
# semantics in both twins (U+00A0 etc. must NOT count as whitespace)
_WS = re.compile(r"\s+", re.ASCII)
_PUNCT = re.compile(r"[^\w\s]", re.ASCII)


def _quality_keep_py(text: str) -> bool:
    """Mirror of textops.quality_scores' keep rule (same single
    divisions, same comparisons). NULL/empty text mirrors the Spark
    side's outcome: NaN ratios compare false -> not kept."""
    text = text or ""
    words = _WS.split(text.strip())
    n_words = len(words)
    n_chars = len(text)
    n_punct = n_chars - len(_PUNCT.sub("", text))
    if n_chars == 0 or n_words == 0:
        return False
    punct_ratio = n_punct / n_chars
    n_stop = sum(1 for w in words if w.lower() in _STOP)
    stop_ratio = n_stop / n_words
    return n_words >= 20 and punct_ratio < 0.2 and stop_ratio >= 0.03


_STOP = set(STOPWORDS_EN)


def _repetition_keep_py(text: str) -> bool:
    """Mirror of textops.repetition_scores' keep rule (same single
    divisions, same tie-break: most frequent bigram, ties to the
    lexicographically smallest)."""
    text = text or ""
    ws = _WS.split(text.strip().lower())
    n_words = len(ws)
    n_chars = len(text)
    dup = (n_words - len(set(ws))) / n_words
    grams = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    if grams and n_chars > 0:
        from collections import Counter

        counts = Counter(grams)
        best = max(counts.values())
        top = min(g for g, c in counts.items() if c == best)
        ratio = (best * len(top)) / n_chars
    else:
        ratio = 0.0
    return dup <= 0.6 and ratio <= 0.12


def _grams_py(text: str, n: int) -> set:
    """Mirror of dedup.ngrams: distinct lowercase word n-grams, whole
    text as one shingle when shorter than n words."""
    ws = _WS.split((text or "").strip().lower())
    if len(ws) < n:
        return {" ".join(ws)}
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


def _decontam_clean_py(
    docs: list[tuple[int, str]], bench_texts: list[str], n: int
) -> list[tuple[int, str]]:
    """Mirror of decontam.decontaminate + left_anti: keep docs sharing
    NO word n-gram with the benchmark set."""
    bench: set = set()
    for t in bench_texts:
        bench |= _grams_py(t, n)
    return [(i, t) for i, t in docs if not (_grams_py(t, n) & bench)]


def _norm_fp_py(text: str) -> str:
    return hashlib.md5(
        _WS.sub(" ", text.strip()).lower().encode("utf-8")
    ).hexdigest()


def _ngrams_py(text: str, n: int) -> list[str]:
    """Mirror of dedup.ngrams (distinct, first-seen order irrelevant —
    used as a set)."""
    w = _WS.split(text.strip().lower())
    if len(w) >= n:
        grams = [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]
    else:
        grams = [" ".join(w)]
    return list(dict.fromkeys(grams))


def _dedup_keep_py(docs: list[tuple[int, str]], threshold: float, n: int) -> set:
    """Mirror of dedup.dedup_corpus' keep set: exact collapse ->
    exact-Jaccard pairs over representatives (the LSH output at
    bands=64 — miss probability ~1e-8) -> connected components ->
    min-id representative per cluster."""
    reps: dict[str, int] = {}
    for i, t in docs:
        fp = _norm_fp_py(t)
        if fp not in reps or i < reps[fp]:
            reps[fp] = i
    rep_ids = set(reps.values())
    rep_docs = [(i, t) for i, t in docs if i in rep_ids]
    grams = {i: set(_ngrams_py(t, n)) for i, t in rep_docs}
    ids = sorted(grams)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    # inverted gram index: only pairs sharing >= 1 gram can reach any
    # positive Jaccard, so candidates come from per-gram posting lists
    # (same trick as the inverted-index oracle SQL) instead of all pairs
    inv: dict[str, list[int]] = {}
    for i in ids:
        for g in grams[i]:
            inv.setdefault(g, []).append(i)
    cands: set[tuple[int, int]] = set()
    for posting in inv.values():
        for a_pos in range(len(posting)):
            for b_pos in range(a_pos + 1, len(posting)):
                a, b = posting[a_pos], posting[b_pos]
                cands.add((a, b) if a < b else (b, a))
    for a, b in cands:
        ga, gb = grams[a], grams[b]
        inter = len(ga & gb)
        if inter / (len(ga) + len(gb) - inter) >= threshold:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    return {i for i in ids if find(i) == i}


def _split_of_py(doc_id, weights: dict[str, float]) -> str:
    h = int(
        hashlib.md5(f"split:{doc_id}".encode("utf-8")).hexdigest()[:12], 16
    )
    for label, bound in split_thresholds(weights):
        if h < bound:
            return label
    raise AssertionError("unreachable: thresholds cover the hash space")


def prepare_corpus_py(
    docs: Iterable[tuple[int, str]],
    *,
    split_weights: Optional[dict[str, float]] = None,
    max_len: int = 512,
    n_buckets: int = 32,
    n_merges: int = 200,
    max_words: Optional[int] = None,
    threshold: float = 0.5,
    n: int = 2,
    line_clean: bool = False,
    repetition_filter: bool = False,
    bench_texts: Optional[list[str]] = None,
    decontam_n: int = 3,
) -> list[dict]:
    """Single-process reference of ``prepare_corpus``: returns the
    packed rows as dicts with the same fields (pack ordering follows
    (split, bucket, index))."""
    docs = [(i, t) for i, t in docs]
    weights = split_weights or DEFAULT_SPLITS

    if line_clean:
        from grokspark.operators.clean import c4_clean_py

        docs = [
            (did, clean)
            for did, clean, _nin, _nk, _ns, kept in c4_clean_py(docs)
            if kept
        ]
    quality = [(i, t) for i, t in docs if _quality_keep_py(t)]
    if repetition_filter:
        quality = [(i, t) for i, t in quality if _repetition_keep_py(t)]
    if bench_texts is not None:
        quality = _decontam_clean_py(quality, bench_texts, decontam_n)
    keep_ids = _dedup_keep_py(quality, threshold, n)
    kept = [(i, t) for i, t in quality if i in keep_ids]
    split_of = {i: _split_of_py(i, weights) for i, _ in kept}

    counts: dict[str, int] = {}
    for i, t in kept:
        if split_of[i] == "train":
            for w in pretokenize(t):
                counts[w] = counts.get(w, 0) + 1
    counts = cap_word_counts(counts, max_words)
    merges = train_bpe_py(counts, n_merges)
    vocab = bpe_vocab(counts, merges)
    ranks = {p: j for j, p in enumerate(merges)}
    memo: dict[str, list[int]] = {}

    def ids_of(t: str) -> list[int]:
        out: list[int] = []
        for w in pretokenize(t):
            if w not in memo:
                memo[w] = [vocab.get(s, 0) for s in encode_word(w, ranks)]
            out.extend(memo[w])
        return out

    rows: list[dict] = []
    for label in weights:
        buckets: dict[int, list] = {}
        for i, t in kept:
            if split_of[i] != label:
                continue
            buckets.setdefault(pack_bucket_of(str(i), n_buckets), []).append(
                (str(i), ids_of(t))
            )
        for bucket in sorted(buckets):
            for j, p in enumerate(pack_sequences_py(buckets[bucket], max_len)):
                rows.append(
                    {
                        "split": label,
                        "bucket": bucket,
                        "pack_id": f"{bucket}#{j}",
                        **p,
                    }
                )
    return rows
