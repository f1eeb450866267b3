"""Text-analysis operators: token counting, quality scoring, language
ID, document fingerprinting. Pure built-in expressions — no Python in
the data path, so Catalyst fuses everything into the scan projection.

Each operator documents its exact formula so the DuckDB oracle in
__spark_entry__.py can reproduce it bit-for-bit (same IEEE ops in the
same order; integer outputs preferred at comparison points).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "words",
    "token_count",
    "quality_scores",
    "lang_id",
    "fingerprint",
    "STOPWORDS_EN",
]

# Tiny fixed stopword list for the language-ID heuristic. Deliberately
# small & frozen: the oracle SQL embeds the same list.
STOPWORDS_EN = ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"]


def words(text: Column) -> Column:
    """Whitespace tokenization; leading/trailing space safe."""
    return F.split(F.trim(text), r"\s+")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count plus a BPE-ish subword proxy count
    (word-boundary regex pieces: runs of letters, digits, or single
    punctuation — a deterministic stand-in for a tokenizer's piece
    count)."""
    w = words(F.col(text_col))
    pieces = F.split(F.trim(F.regexp_replace(F.col(text_col), r"([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s])", r"$1 ")), r"\s+")
    return df.withColumn("n_words", F.size(w)).withColumn("n_pieces", F.size(pieces))


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document-quality features:

    - n_chars_m  : length(text)
    - n_words    : whitespace token count
    - mean_word_len = n_chars_nospace / n_words
    - punct_ratio   = punct_chars / n_chars
    - stop_ratio    = stopword tokens / n_words
    - quality = 1 if 20 <= n_words and punct_ratio < 0.2
                and stop_ratio >= 0.03 else 0   (binary keep-flag)
    """
    text = F.col(text_col)
    w = words(text)
    n_words = F.size(w)
    n_chars = F.length(text)
    n_nospace = F.length(F.regexp_replace(text, r"\s", ""))
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, F.lower(x))))
    punct_ratio = n_punct.cast("double") / n_chars.cast("double")
    stop_ratio = n_stop.cast("double") / n_words.cast("double")
    keep = (
        (n_words >= 20) & (punct_ratio < F.lit(0.2)) & (stop_ratio >= F.lit(0.03))
    ).cast("int")
    return (
        df.withColumn("n_words", n_words)
        .withColumn("n_chars_m", n_chars)
        .withColumn("mean_word_len", n_nospace.cast("double") / n_words.cast("double"))
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stop_ratio", stop_ratio)
        .withColumn("quality_keep", keep)
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram-free heuristic language ID: predict ``en`` when the
    English-stopword token ratio is >= 0.05, else ``other``. (A real
    system plugs a char-n-gram model into the same shape; the operator
    contract — deterministic text -> label column, no UDF — is the
    point.)"""
    w = words(F.col(text_col))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, F.lower(x))))
    ratio = n_stop.cast("double") / F.size(w).cast("double")
    return df.withColumn(
        "lang_pred", F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("other"))
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized lowercase text.
    md5 (not xxhash) so any engine reproduces it."""
    normalized = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.withColumn("fp", F.md5(normalized))
