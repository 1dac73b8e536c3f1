"""Text-analysis operators for training-data pipelines over `documents`.

Not in the reference (it has no text corpus ops); mandated as first-class
components of this engine: language ID (stopword heuristic), quality
scoring, token counting, document fingerprinting.  Everything is built-in
column functions — JVM-side, no Python on the hot path — so these sustain
100 TB scans at parquet-read speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


def block_lines(df: DataFrame, text_col: str = "text", words_per_line: int = 8) -> DataFrame:
    """Rewrite `text_col` into newline-separated lines of `words_per_line`
    whitespace tokens each (the last line may be shorter).  Fixture texts
    carry no newlines; this derives a deterministic line structure so the
    line-level operators (line_dedup) have real work to do, identically
    reproducible in SQL.  Pure JVM higher-order functions — zero shuffle."""
    w = words_per_line
    words = F.split(F.col(text_col), " ")
    n_blocks = F.ceil(F.size(words) / F.lit(float(w))).cast("int")
    lined = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_blocks - 1),
            lambda i: F.array_join(F.slice(words, i * w + 1, w), " "),
        ),
        "\n",
    )
    return df.withColumn(text_col, lined)


def line_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus-global line-level exact deduplication (the C4 / RefinedWeb
    boilerplate stage, Raffel et al. 2020 §2.2): every distinct line keeps
    exactly ONE occurrence across the whole corpus — the one in the lowest
    (doc_id, line_no) — and every other occurrence is dropped; documents
    are reassembled from their surviving lines in original order.

    Returns (doc_id, n_lines, n_kept, text_dedup); n_kept = 0 docs come
    back with text_dedup = '' (every one of their lines appeared earlier
    elsewhere).

    Scale: one explode, then a groupBy(line) whose min-struct aggregate is
    map-side combined (hot boilerplate lines collapse to one row per input
    partition BEFORE the shuffle — the skew case this operator exists
    for), one shuffle join back on line (AQE skew-split handles residual
    hot keys), and one groupBy(doc) reassembly.  Linear in corpus size; no
    Python on any path."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias("line_no", "line"),
    )
    winners = lines.groupBy("line").agg(
        F.min(F.struct(id_col, "line_no")).alias("w")
    )
    kept = (
        lines.join(winners, "line")
        .filter(
            (F.col(id_col) == F.col(f"w.{id_col}"))
            & (F.col("line_no") == F.col("w.line_no"))
        )
        .select(id_col, "line_no", "line")
    )
    reassembled = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text_dedup"),
    )
    totals = df.select(
        id_col, F.size(F.split(F.col(text_col), "\n", -1)).cast("bigint").alias("n_lines")
    )
    return totals.join(reassembled, id_col, "left").select(
        id_col,
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    text_col: str = "text",
    salt: str = "",
) -> DataFrame:
    """Deterministic train/val/test assignment by content hash — the
    standard leakage-safe corpus split (same document always lands in the
    same split, independent of partitioning, ordering, or cluster size).

    The first 8 hex chars of md5(text || salt) are compared
    lexicographically against cumulative-weight thresholds; md5 hex is
    identical everywhere (JVM, DuckDB, Python), so the split is
    reproducible outside Spark.  Pure per-row JVM expressions — zero
    shuffle, scan-speed at any corpus size."""
    h8 = F.substring(F.md5(F.concat(F.col(text_col), F.lit(salt))), 1, 8)
    expr = None
    thresholds = split_thresholds(weights)
    for name, thr in thresholds[:-1]:
        cond = h8 < F.lit(thr)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = thresholds[-1][0]
    split = F.lit(last) if expr is None else expr.otherwise(last)
    return df.select("doc_id", h8.alias("h8"), split.alias("split"))


def split_thresholds(weights: dict[str, float] | None = None) -> list[tuple[str, str]]:
    """(name, upper-threshold-hex) pairs for hash_split, cumulative over
    the weight order; the last threshold is 'ffffffff' (catch-all).
    Shared by the operator and its SQL oracle so both compare against
    bit-identical literals."""
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    out: list[tuple[str, str]] = []
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        out.append((name, format(min(int(cum * (1 << 32)), (1 << 32) - 1), "08x")))
    out.append((names[-1], "ffffffff"))
    return out


# PII patterns: shared RE2/Java subset (no lookaround, ASCII \b and \d) so
# the Spark scrub and any SQL-engine twin replace byte-identically
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing for training corpora: emails -> <EMAIL>, IPv4 ->
    <IP>, US-style phone numbers -> <PHONE>, with per-category match
    counts.  Replacement is staged (emails first, then IPs, then phones)
    and each count is taken on the text AS THAT STAGE SEES IT, so an
    IP-shaped host inside an already-scrubbed email is not double-counted.
    Pure per-row JVM regex — zero shuffle, scan-speed."""
    t0 = F.col(text_col)
    n_emails = F.regexp_count(t0, F.lit(PII_EMAIL))
    t1 = F.regexp_replace(t0, PII_EMAIL, "<EMAIL>")
    n_ips = F.regexp_count(t1, F.lit(PII_IPV4))
    t2 = F.regexp_replace(t1, PII_IPV4, "<IP>")
    n_phones = F.regexp_count(t2, F.lit(PII_PHONE))
    t3 = F.regexp_replace(t2, PII_PHONE, "<PHONE>")
    return df.select(
        "doc_id",
        n_emails.cast("bigint").alias("n_emails"),
        n_ips.cast("bigint").alias("n_ips"),
        n_phones.cast("bigint").alias("n_phones"),
        t3.alias("text_scrubbed"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized text (exact-dup
    key). A rolling-hash variant lives in dedup.simhash for near-dups."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return df.select("doc_id", F.md5(norm).alias("fp"))


def ngram_span_dedup(
    df: DataFrame, n: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-global EXACT-SUBSTRING deduplication at n-token window
    granularity (the suffix-array dedup of Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", re-expressed as a
    distributed hash plan): every n-token window occurring more than once
    in the corpus keeps exactly ONE occurrence — the lowest (doc_id, pos)
    — and every other occurrence's token span is removed from its
    document.  Overlapping removal spans merge (gaps-and-islands) before
    tokens are dropped, so a long duplicated passage is excised once, not
    window-by-window.

    Returns (doc_id, n_tokens, n_removed, text_dedup); documents shorter
    than n tokens pass through untouched.

    Scale: windows ~= one row per token — the SAME order of magnitude a
    suffix array indexes, but here it is one explode + one map-combined
    groupBy(hash) (hot boilerplate windows collapse pre-shuffle) + one
    join back on the hash + one per-doc window for the island merge
    (bounded by that doc's duplicated-window count).  All JVM expressions;
    md5 window hashes are engine-portable so the SQL oracle reproduces
    the result bit-for-bit."""
    from pyspark.sql import Window

    toks = F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " ")
    base = df.select(F.col(id_col), toks.alias("w"))
    # (doc, pos, h) for every n-window; 1-based pos, inclusive span end
    wins = base.select(
        id_col,
        F.explode(
            F.when(
                F.size("w") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - (n - 1)),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.md5(F.concat_ws(" ", F.slice("w", i, n))).alias("h"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<pos:int,h:string>>"))
        ).alias("win"),
    ).select(id_col, "win.pos", "win.h")
    dup_keeper = (
        wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min(F.struct(id_col, "pos")).alias("k"))
        .filter(F.col("cnt") > 1)
        .select("h", f"k.{id_col}", F.col("k.pos").alias("kpos"))
        .withColumnRenamed(id_col, "kdoc")
    )
    removals = (
        wins.join(dup_keeper, "h")
        .filter(~((F.col(id_col) == F.col("kdoc")) & (F.col("pos") == F.col("kpos"))))
        .select(id_col, "pos", (F.col("pos") + (n - 1)).alias("fin"))
    )
    # gaps-and-islands: a window starts a new island iff it begins past
    # every previous island's end + 1 (adjacent spans merge too — they
    # remove a contiguous token run)
    byd = Window.partitionBy(id_col).orderBy("pos")
    prev_max = F.max("fin").over(byd.rowsBetween(Window.unboundedPreceding, -1))
    islands = (
        removals.withColumn(
            "step", F.when(F.col("pos") > prev_max + 1, 1).when(prev_max.isNull(), 1).otherwise(0)
        )
        .withColumn("grp", F.sum("step").over(byd))
        .groupBy(id_col, "grp")
        .agg(F.min("pos").alias("s"), F.max("fin").alias("e"))
        .groupBy(id_col)
        .agg(F.collect_list(F.struct("s", "e")).alias("ivs"))
    )
    out = base.join(islands, id_col, "left").select(
        id_col,
        F.size("w").cast("bigint").alias("n_tokens"),
        F.coalesce(
            F.aggregate("ivs", F.lit(0), lambda acc, iv: acc + iv["e"] - iv["s"] + 1),
            F.lit(0),
        ).cast("bigint").alias("n_removed"),
        F.when(F.col("ivs").isNull(), F.array_join("w", " ")).otherwise(
            F.array_join(
                F.transform(
                    F.filter(
                        F.transform(
                            "w", (lambda t, i: F.struct(t.alias("t"), (i + 1).alias("i")))
                        ),
                        lambda s: ~F.exists(
                            "ivs", lambda iv: (s["i"] >= iv["s"]) & (s["i"] <= iv["e"])
                        ),
                    ),
                    lambda s: s["t"],
                ),
                " ",
            )
        ).alias("text_dedup"),
    )
    return out


def mix_sample(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    text_col: str = "text",
    source_col: str = "source",
    salt: str = "",
) -> DataFrame:
    """Deterministic source-weighted subsampling — the data-MIXING stage of
    a training pipeline ("keep 30% of web, 100% of code"): a row survives
    iff the first 8 hex chars of md5(text || salt) fall below its source's
    rate threshold.  Content-hash gating (same discipline as hash_split)
    means the decision is reproducible anywhere, independent of
    partitioning, ordering, or cluster size, and a document duplicated
    across sources is kept/dropped consistently per source.

    Pure per-row JVM expressions — zero shuffle, scan-speed at any corpus
    size.  Returns the surviving rows + (h8, rate used)."""

    def _thr(rate: float) -> str:
        return format(min(int(rate * (1 << 32)), (1 << 32) - 1), "08x")

    h8 = F.substring(F.md5(F.concat(F.col(text_col), F.lit(salt))), 1, 8)
    rate_expr = None
    for src, r in rates.items():
        cond = F.col(source_col) == src
        rate_expr = (
            F.when(cond, F.lit(_thr(r)))
            if rate_expr is None
            else rate_expr.when(cond, F.lit(_thr(r)))
        )
    thr = (
        F.lit(_thr(default_rate))
        if rate_expr is None
        else rate_expr.otherwise(F.lit(_thr(default_rate)))
    )
    return (
        df.withColumn("h8", h8)
        .withColumn("thr", thr)
        .filter(F.col("h8") < F.col("thr"))
        .drop("thr")
    )

def group_sample(
    df: DataFrame,
    by: str = "source",
    k: int = 5,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic per-group sample: the k rows of each group with the
    smallest md5(id || salt) — the "show me a few docs per source"
    primitive every corpus-debugging loop needs at scale.  Hash-rank
    makes it a true uniform-without-replacement sample that is
    REPRODUCIBLE across runs, partitionings, and engines (md5 hex is
    identical in the JVM, DuckDB, and Python; change salt to redraw).

    ONE shuffle on the group key (window row_number over the hash
    order, id tiebreak for hash collisions); rows keep all columns.
    At planet scale prefer a selective projection first — the window
    carries whole rows.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(by).orderBy(h, F.col(id_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def fuzzy_pairs(vocab: DataFrame, word_col: str = "word") -> DataFrame:
    """All distinct vocabulary pairs within edit distance 1 (FastSS /
    deletion-neighborhood blocking, Bocek 2007) — the fuzzy-join
    primitive behind typo clustering, entity-name reconciliation and
    OCR cleanup, built so the exact Levenshtein only ever runs on
    blocked candidates, never all pairs.

    Two words with ed(a, b) <= 1 always share a key in
    N(w) = {w} ∪ {w with one character deleted}: substitutions share
    the deletion at the differing position, insert/delete pairs contain
    one another's full string.  The converse is false (shared deletions
    can hide transpositions, e.g. "ab"/"ba"), so candidates are verified
    with the built-in JVM levenshtein — the expensive check runs on the
    candidate set only.

    Returns (word_a, word_b) with word_a < word_b, each qualifying pair
    exactly once.

    Plan: one explode of |w|+1 keys per word (bounded by word length),
    ONE equi-join on the key, dropDuplicates, codegen levenshtein
    filter.  A hot key (a deletion shared by many words) is a real skew
    point — AQE skew-split applies; nothing is ever all-pairs.
    """
    w = F.col("w")
    variants = F.transform(
        F.sequence(F.lit(1), F.length(w)),
        lambda i: F.concat(
            F.substring(w, F.lit(1).cast("int"), (i - 1).cast("int")),
            w.substr(i + 1, F.length(w)),
        ),
    )
    # array_union already dedups the per-word key set (set semantics), and
    # w is distinct — (w, k) is unique by construction, so no
    # dropDuplicates exchange after the explode (guide §2.4: a `distinct`
    # on data that is already unique is an accidental shuffle)
    keys = (
        vocab.select(F.col(word_col).alias("w"))
        .where(F.length("w") > 0)
        .distinct()
        .select("w", F.explode(F.array_union(F.array(w), variants)).alias("k"))
    )
    a = keys.select(F.col("k"), F.col("w").alias("word_a"))
    b = keys.select(F.col("k"), F.col("w").alias("word_b"))
    # verify BEFORE deduping (guide §2.3: shuffle fewer bytes): the
    # levenshtein runs in codegen on each candidate copy (a pair shares
    # only a handful of deletion keys, so the duplicate evals are cheap)
    # and the dropDuplicates exchange then carries only qualifying
    # pairs instead of the whole candidate set — same result, the two
    # steps commute
    return (
        a.join(b, "k")
        .filter(F.col("word_a") < F.col("word_b"))
        .filter(F.levenshtein("word_a", "word_b") <= 1)
        .select("word_a", "word_b")
        .dropDuplicates(["word_a", "word_b"])
    )


def term_drift(df: DataFrame, text_col: str = "text", salt: str = "") -> DataFrame:
    """Per-term distribution drift between two deterministic halves of a
    corpus — the domain-shift / contamination-drift check a training-data
    pipeline runs before mixing sources: a term whose document frequency
    differs wildly between the content-hash halves marks a skewed or
    duplicated slice (on an i.i.d. corpus the halves agree).

    Per distinct term:  df_a, df_b (document frequencies), the half
    sizes n_a, n_b, and the EXACT cross-multiplied rate contrast
    delta = df_a * n_b - df_b * n_a  (zero iff the rates match exactly;
    its square over the margins is the chi-square numerator — the
    caller's rational).  DECIMAL string, counts multiply past int64 at
    corpus scale.

    Plan: the hash_split JVM expressions assign halves (zero shuffle),
    one distinct-word explode, ONE map-combined groupBy with two
    conditional sums, a broadcast of the 2-row totals.  Never all-pairs.
    """
    from gol_tool_spark.operators.dedup import normalized

    halves = hash_split(df, weights={"a": 0.5, "b": 0.5}, text_col=text_col, salt=salt)
    d = df.join(halves.select("doc_id", "split"), "doc_id")
    words = d.select(
        "split",
        F.explode(
            F.array_distinct(F.split(F.trim(normalized(text_col)), " "))
        ).alias("term"),
    ).filter(F.col("term") != "")
    tot = halves.groupBy().agg(
        F.sum(F.when(F.col("split") == "a", 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("split") == "b", 1).otherwise(0)).cast("bigint").alias("n_b"),
    )
    per = words.groupBy("term").agg(
        F.sum(F.when(F.col("split") == "a", 1).otherwise(0)).cast("bigint").alias("df_a"),
        F.sum(F.when(F.col("split") == "b", 1).otherwise(0)).cast("bigint").alias("df_b"),
    )
    dd = lambda c: c.cast("decimal(38,0)")
    return per.join(F.broadcast(tot)).select(
        "term", "df_a", "df_b", "n_a", "n_b",
        (dd(F.col("df_a")) * dd(F.col("n_b")) - dd(F.col("df_b")) * dd(F.col("n_a")))
        .cast("decimal(38,0)").cast("string").alias("delta"),
    )
