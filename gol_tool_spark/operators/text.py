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


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition filters (Gopher-style, Rae et al. 2021):
    the standard pretraining-corpus gate against boilerplate/looping text.
    Per doc: duplicate-word fraction (1 - distinct/total), duplicate-bigram
    fraction, top-bigram fraction (share of all bigram occurrences taken by
    the most frequent one), and a composite repetition_ok gate
    (top_bigram <= 0.2 AND dup_bigram <= 0.5).

    Scale: word stats are per-row JVM higher-order functions (zero
    shuffle); bigram stats are one explode -> two map-side-combined
    groupBys keyed by doc_id — linear in corpus size, the same shuffle
    shape as shingling.  Docs with < 2 words get zero fractions and pass
    the gate."""
    t = F.col(text_col)
    ws = tokens(t)
    word_stats = df.select(
        "doc_id",
        F.size(ws).alias("n_words"),
        F.size(F.array_distinct(ws)).alias("n_distinct_words"),
    )
    bigrams = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - 2),
            lambda i: F.concat_ws(" ", F.element_at(ws, i + 1), F.element_at(ws, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg_counts = (
        df.select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bg"),
            F.max("c").alias("top_c"),
            F.count(F.lit(1)).alias("n_distinct_bg"),
        )
    )
    j = word_stats.join(bg_counts, "doc_id", "left")
    dup_word = 1.0 - F.col("n_distinct_words").cast("double") / F.col("n_words")
    dup_bg = F.when(
        F.col("n_bg") > 0,
        1.0 - F.col("n_distinct_bg").cast("double") / F.col("n_bg"),
    ).otherwise(F.lit(0.0))
    top_bg = F.when(
        F.col("n_bg") > 0, F.col("top_c").cast("double") / F.col("n_bg")
    ).otherwise(F.lit(0.0))
    return j.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.round(dup_word, 6).alias("dup_word_frac_r"),
        F.round(dup_bg, 6).alias("dup_bigram_frac_r"),
        F.round(top_bg, 6).alias("top_bigram_frac_r"),
        ((top_bg <= 0.2) & (dup_bg <= 0.5)).alias("repetition_ok"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized text (exact-dup
    key). A rolling-hash variant lives in dedup.simhash for near-dups."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return df.select("doc_id", F.md5(norm).alias("fp"))
