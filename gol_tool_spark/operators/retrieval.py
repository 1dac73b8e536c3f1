"""BM25 ranked retrieval over the documents corpus.

Not in the reference (no text corpus ops there); first-class for a
training-data engine: dataset curation ranks candidate documents against
benchmark/query strings (quality-by-relevance selection, contamination
triage, topic targeting) — at 100 TB that ranking must be a distributed
scan, not an external index build.

Shape (all built-in JVM expressions, no Python on the hot path):

  postings  = explode(tokens) -> groupBy(doc_id, term).count()    [1 shuffle,
              map-side combined; the only wide op over the corpus]
  doclen    = sum(tf) per doc — derived FROM the postings, no 2nd scan
  term df   = groupBy(term) over the postings (map-combined)
  queries   = tiny (query_id, term) table, BROADCAST to the postings
  score     = one groupBy(query_id, doc_id) over the ~|q| x matched rows

Scaling: the corpus-sized tables shuffle once each on natural keys
(doc_id, term); everything query-sided is broadcast.  Skewed hot terms
(stopwords) are exactly the rows the broadcast semi-join DROPS unless a
query asks for them, so the score shuffle carries only matched postings.

The Okapi idf is the Lucene/ATIRE non-negative variant
ln(1 + (N - df + 0.5)/(df + 0.5)); scores round to 6 decimals so the
DuckDB oracle (same arithmetic, same evaluation order) matches the repr
hash — the discipline every float oracle in this repo follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def _terms(text):
    """Whitespace tokens of the normalized text (same normalization as
    text.line_dedup: lower, collapse runs of whitespace)."""
    return F.split(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")), " ")


def postings(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term, tf) — the inverted-index rows.  Cache/persist this
    to amortize across query batches; at scale it is a bucketed table on
    `term`."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(_terms(F.col(text_col))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Score every (query, document) pair with a matching term.

    queries: (query_id, qtext).  Returns (query_id, doc_id, score_r)
    with score_r = round(BM25, 6), score descending deterministic."""
    post = postings(docs, text_col, id_col)
    doclen = post.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    # corpus totals as a 1-row broadcast (no driver-side collect)
    totals = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    dfreq = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = (
        queries.select("query_id", F.explode(_terms(F.col("qtext"))).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )
    matched = (
        post.join(F.broadcast(qterms), "term")
        .join(dfreq, "term")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(totals))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    return (
        matched.withColumn("contrib", idf * tf_part)
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score_r"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Per-query top-k by BM25 (rank ties broken by doc_id so the result
    is partitioning-independent).  The window partitions by query_id —
    bounded by the query batch, never by corpus size."""
    from pyspark.sql import Window

    scored = bm25(docs, queries, text_col, id_col, k1, b)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_r").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "doc_id", "score_r", "rnk")
    )


def distinctive_terms(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k distinguishing terms — the keyword-extraction /
    corpus-inspection primitive ("what is this doc about, relative to the
    corpus").  Rank key is the EXACT rational tf-idf order (tf DESC, df
    ASC, term ASC): for fixed tf any idf(df) monotone decreasing in df
    induces exactly this order, so the ranking is float-free and
    bit-reproducible (the float idf in bm25() is where scoring lives;
    this operator is the deterministic selection stage).

    Returns (doc_id, term, tf, df, rank), rank 1..k per doc.

    Plan: the postings explode + ONE map-combined (doc, term) groupBy,
    a term-keyed df aggregate JOINED back on term (AQE handles hot
    stopword terms; at 100 TB both sides are term-bucketable), and a
    WindowGroupLimit top-k per doc — the rank window prunes to k rows
    per group before the final sort, no global shuffle of full postings.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql import Window

    post = postings(docs, text_col=text_col, id_col=id_col)
    df_t = post.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        post.join(df_t, "term")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", F.col("rank").cast("int").alias("rank"))
    )


def collocations(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int = 1000,
    min_pair: int = 2,
) -> DataFrame:
    """Corpus collocation components — for every pair of terms that
    co-occur in >= min_pair documents, the EXACT integer inputs of
    PMI/lift: (n_ab, df_a, df_b, n_docs) plus the cross-multiplied lift
    numerator n_ab * n_docs - df_a * df_b (DECIMAL string; its sign IS
    the sign of PMI, so thresholding needs no float).  The phrase-mining
    / compound-term step of a training-data pipeline, float-free so the
    selection is bit-reproducible; the caller computes log-PMI from the
    returned integers where an actual score is wanted.

    Co-occurrence is presence-based (distinct terms per doc, the
    term_drift tokenization).  `max_df` drops corpus-hot terms BEFORE
    pairing — the ngram_jaccard hot-shingle discipline: it bounds the
    per-doc pair fan-out away from stopword blowup and is statistically
    right for PMI (pairs with near-ubiquitous terms carry no signal).
    n_docs counts documents with >= 1 nonempty term.

    Plan: distinct-term explode -> term-keyed df aggregate joined back
    (AQE handles hot terms) -> the kept postings PINNED (eager
    localCheckpoint) so the per-doc self-join reads materialized
    partitions instead of re-running the explode+join chain twice ->
    doc-keyed pair join (term_a < term_b; df rides along, no re-join)
    -> ONE map-combined pair groupBy -> broadcast 1-row total.
    Per-doc fan-out is (kept terms)^2 — bounded by max_df against
    stopwords; at 100 TB also cap kept terms per doc upstream.
    """
    if max_df < 1 or min_pair < 1:
        raise ValueError("max_df and min_pair must be >= 1")
    from gol_tool_spark.operators.dedup import normalized

    d38 = lambda c: c.cast("decimal(38,0)")
    words = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.array_distinct(F.split(F.trim(normalized(text_col)), " "))
            ).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    dfs = words.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    kept = words.join(dfs.filter(F.col("df") <= max_df), "term").localCheckpoint(
        eager=True
    )
    n_docs = words.agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs")
    )
    a = kept.select(
        "doc_id", F.col("term").alias("term_a"), F.col("df").alias("_dfa")
    )
    b = kept.select(
        "doc_id", F.col("term").alias("term_b"), F.col("df").alias("_dfb")
    )
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ab"),
            F.max("_dfa").alias("df_a"),
            F.max("_dfb").alias("df_b"),
        )
        .filter(F.col("n_ab") >= min_pair)
    )
    return pairs.crossJoin(F.broadcast(n_docs)).select(
        "term_a", "term_b", "n_ab", "df_a", "df_b", "n_docs",
        (d38(F.col("n_ab")) * d38(F.col("n_docs"))
         - d38(F.col("df_a")) * d38(F.col("df_b")))
        .cast("string").alias("lift_delta"),
    )
