"""Text-analysis operators for training-data pipelines over `documents`.

Not in the reference (it has no text corpus ops); mandated as first-class
components of this engine: language ID (stopword heuristic), quality
scoring, token counting, document fingerprinting.  Everything is built-in
column functions — JVM-side, no Python on the hot path — so these sustain
100 TB scans at parquet-read speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword sets; deterministic and oracle-expressible
STOPWORDS = {
    "en": ("the", "of", "and", "a", "to", "in", "is", "at"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "den"),
}


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    """Whitespace token count (BPE-ish subtoken estimate = chars/4 is kept
    as a separate column in quality_features)."""
    return F.size(tokens(text))


def stopword_hits(text: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    # size(filter(words_arr, w -> w IN (...))) — JVM higher-order function
    return F.size(F.filter(tokens(text), lambda t: t.isin(*words)))


def lang_id(text: Column) -> Column:
    """Argmax of per-language stopword hits; 'und' (undetermined) when all
    zero. Deterministic tie-break: en > es > de (fixed comparison order)."""
    en, es, de = (stopword_hits(text, L) for L in ("en", "es", "de"))
    return (
        F.when((en >= es) & (en >= de) & (en > 0), F.lit("en"))
        .when((es >= de) & (es > 0), F.lit("es"))
        .when(de > 0, F.lit("de"))
        .otherwise(F.lit("und"))
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: lengths, token stats, punctuation and
    stopword ratios, plus a composite quality_ok gate."""
    t = F.col(text_col)
    n_tok = token_count(t)
    n_chars = F.length(t)
    punct = n_chars - F.length(F.regexp_replace(t, r"[\.,!\?;:]", ""))
    stop = stopword_hits(t, "en") + stopword_hits(t, "es") + stopword_hits(t, "de")
    return df.select(
        "doc_id",
        n_chars.alias("n_chars_calc"),
        n_tok.alias("n_tokens"),
        (n_chars.cast("double") / n_tok).alias("avg_token_len"),
        (punct.cast("double") / n_chars).alias("punct_ratio"),
        (stop.cast("double") / n_tok).alias("stopword_ratio"),
        F.ceil(n_chars / F.lit(4)).cast("bigint").alias("bpe_token_est"),
        ((n_tok >= 5) & (n_chars >= 20)).alias("quality_ok"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized text (exact-dup
    key). A rolling-hash variant lives in dedup.simhash for near-dups."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return df.select("doc_id", F.md5(norm).alias("fp"))
