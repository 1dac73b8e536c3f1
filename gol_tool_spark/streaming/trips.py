"""Custom stateful streaming operator: trip segmentation with timeouts.

The batch trajectory suite (operators/trajectory.py) answers "what were
the trips" after the fact; a fleet pipeline needs the same answer ON the
stream: close a trip when the entity goes quiet for gap_s seconds, and —
the part watermarked session windows cannot express — also close it by
PROCESSING-TIME timeout, so a vehicle that stops reporting entirely still
emits its final trip instead of holding state forever.

applyInPandasWithState with GroupStateTimeout.ProcessingTimeTimeout:
state = the open trip's (start_ws, last_ws, n_fixes, last_x, last_y,
l1_sum); every update re-arms the timeout.  Per-group Python work is
bounded by the group's fixes per microbatch (the itertuples loop is the
per-key state machine, not a data-plane scan).

Trip rows: (user_id, start_ws, end_ws, n_fixes, l1_sum, closed_by) with
closed_by in {'gap', 'timeout'}; l1_sum is the exact integer L1 odometer
over consecutive fixes inside the trip.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FIX_SCHEMA = "user_id long, event_id long, ws long, x long, y long"
TRIP_SCHEMA = (
    "user_id long, start_ws long, end_ws long, n_fixes long, l1_sum long, "
    "closed_by string"
)
STATE_SCHEMA = (
    "start_ws long, last_ws long, n_fixes long, last_x long, last_y long, "
    "l1_sum long"
)


def _make_trip_fn(gap_s: int, timeout_ms: int):
    def fn(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        cols = ["user_id", "start_ws", "end_ws", "n_fixes", "l1_sum", "closed_by"]
        if state.hasTimedOut:
            s0, sl, n, _, _, l1 = state.get
            state.remove()
            yield pd.DataFrame([(user_id, s0, sl, n, l1, "timeout")], columns=cols)
            return
        cur = list(state.get) if state.exists else None
        out = []
        fixes = []
        for pdf in pdf_iter:
            fixes.extend(pdf.itertuples(index=False))
        fixes.sort(key=lambda r: (r.ws, r.event_id))
        for r in fixes:
            if cur is not None and r.ws - cur[1] > gap_s:
                out.append((user_id, cur[0], cur[1], cur[2], cur[5], "gap"))
                cur = None
            if cur is None:
                cur = [int(r.ws), int(r.ws), 1, int(r.x), int(r.y), 0]
            else:
                cur[5] += abs(int(r.x) - cur[3]) + abs(int(r.y) - cur[4])
                cur[1], cur[2] = int(r.ws), cur[2] + 1
                cur[3], cur[4] = int(r.x), int(r.y)
        if cur is not None:
            state.update(tuple(cur))
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(out, columns=cols)

    return fn


def trip_stream(
    spark: SparkSession,
    path: str,
    gap_s: int = 900,
    timeout_ms: int = 60_000,
) -> DataFrame:
    """Streaming trip segmentation over a JSON file stream of fixes."""
    stream = spark.readStream.schema(FIX_SCHEMA).json(path)
    return stream.groupBy("user_id").applyInPandasWithState(
        _make_trip_fn(gap_s, timeout_ms),
        outputStructType=TRIP_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def run_trips(
    spark: SparkSession,
    path: str,
    ckpt: str,
    out_path: str,
    gap_s: int = 900,
    timeout_ms: int = 60_000,
):
    """Drain pending fix files into a parquet trip sink; restartable from
    the checkpoint (the restart is also what fires expired processing-time
    timeouts, flushing final trips of entities that went silent)."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("append").parquet(out_path)

    return (
        trip_stream(spark, path, gap_s=gap_s, timeout_ms=timeout_ms)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
