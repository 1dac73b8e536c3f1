"""Sequence packing for training-data pipelines.

Turning a deduped, filtered corpus into fixed-capacity context windows is
the last stage of every LLM data pipeline.  Two standard disciplines,
both deterministic (same corpus -> same packing, independent of
partitioning or cluster size):

- ``pack_chunks`` — concat-and-chunk: documents are concatenated in a
  canonical order inside hash buckets and the stream is cut every
  ``capacity`` tokens (documents may straddle chunk boundaries).  This is
  the GPT-style packing; it is a pure window plan — one shuffle on the
  bucket key, then codegen — and therefore the 100-TB default.
- ``pack_greedy`` — greedy first-fit-in-order binning: a document never
  straddles a bin; a bin closes when the next document would overflow it.
  The running fill is inherently sequential per bucket, so it runs as an
  Arrow-batched applyInPandas per bucket; the BUCKET is the parallelism
  unit (size ``buckets`` to the cluster, each bucket's slice is bounded).
  Its oracle is a DuckDB recursive CTE over the same order.

Bucketing is by content-independent md5(doc_id) so both engines (and any
external tool) reproduce the assignment bit-identically; order within a
bucket is doc_id.  Token counts use the corpus-wide whitespace tokenizer
(operators/text.py) so packing composes with token_stats / span_dedup.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bucket(id_col: str, buckets: int) -> F.Column:
    # first md5 hex digit of the id -> int 0..15 -> % buckets; mirrored in
    # SQL as strpos('0123456789abcdef', substr(md5(..),1,1)) - 1
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 1), 16, 10).cast("int")
        % F.lit(int(buckets))
    )


def with_tokens(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", buckets: int = 8) -> DataFrame:
    """(id, bucket, n_tok) — whitespace token counts + md5 bucket."""
    return df.select(
        F.col(id_col),
        _bucket(id_col, buckets).alias("bucket"),
        F.size(F.split(F.col(text_col), " ")).alias("n_tok"),
    )


def pack_chunks(
    df: DataFrame,
    capacity: int = 512,
    buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk packing: within each md5 bucket, documents are
    laid out in doc_id order and the token stream is cut every
    ``capacity`` tokens.  Per document: the first chunk it lands in and
    how many chunks it spans (>= 2 when it straddles a cut).

    Pure window plan: cum_before = running token sum over the bucket,
    first_chunk = cum_before // C, last token index = cum_before +
    n_tok - 1.  One shuffle, zero Python.
    """
    c = int(capacity)
    toks = with_tokens(df, text_col, id_col, buckets)
    w = Window.partitionBy("bucket").orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
    cum_before = F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("bigint")
    out = toks.withColumn("_cum", cum_before)
    # exact integer floor division (values are non-negative) — stays exact
    # past 2^53 where a double division would not
    first_chunk = F.expr(f"_cum div {c}")
    last_chunk = F.expr(f"(_cum + n_tok - 1) div {c}")
    return out.select(
        id_col,
        "bucket",
        "n_tok",
        first_chunk.alias("first_chunk"),
        (last_chunk - first_chunk + F.lit(1)).cast("bigint").alias("n_chunks"),
    )


def pack_greedy(
    df: DataFrame,
    capacity: int = 512,
    buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy in-order bin packing: within each md5 bucket (doc_id
    order), a document joins the open bin if it fits, else closes it and
    opens a new one.  Documents longer than ``capacity`` get a bin of
    their own (fill > capacity on exactly those rows).

    The running fill is a sequential recurrence, not a window function —
    this is the applyInPandas seam the survey reserves for genuinely
    non-relational state.  Parallelism = buckets (size it to the
    cluster); per-bucket slices arrive as one Arrow batch each.
    """
    c = int(capacity)
    toks = with_tokens(df, text_col, id_col, buckets)
    schema = f"{id_col} bigint, bucket int, n_tok int, bin_idx bigint, fill_after bigint"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins, fills = [], []
        bin_idx, fill = 0, 0
        for n in pdf["n_tok"].astype(int):
            if fill > 0 and fill + n > c:
                bin_idx += 1
                fill = n
            else:
                fill += n
            bins.append(bin_idx)
            fills.append(fill)
        pdf["bin_idx"] = pd.Series(bins, dtype="int64")
        pdf["fill_after"] = pd.Series(fills, dtype="int64")
        return pdf[[id_col, "bucket", "n_tok", "bin_idx", "fill_after"]]

    return toks.groupBy("bucket").applyInPandas(pack, schema)
