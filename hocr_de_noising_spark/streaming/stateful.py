"""ST custom stateful operator — applyInPandasWithState (brief item:
"applyInPandasWithState for custom stateful operators").

The built-in windows/session operators (incremental.py) cover ST2-ST4;
this module is the CUSTOM-state path: per-user running statistics kept
in an explicit GroupState across micro-batches — the shape any bespoke
streaming aggregate (per-document denoise telemetry, per-source quota
tracking, drift counters) takes on this engine.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
OUT_SCHEMA = "user_id long, n_events long, total_value double, n_batches int"
STATE_SCHEMA = "n_events long, total_value double, n_batches int"


def _update_user_state(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into running totals."""
    n, total, batches = state.get if state.exists else (0, 0.0, 0)
    batch_rows = 0
    for pdf in pdfs:
        batch_rows += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    n += batch_rows
    batches += 1
    state.update((n, total, batches))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 4)],
            "n_batches": [batches],
        }
    )


def stateful_user_totals_stream(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
):
    """Custom stateful streaming aggregate: per-user cumulative event
    count + value total maintained in explicit GroupState (Arrow-batched
    pandas per group), emitted once per user per micro-batch. State
    store, offset log and restart semantics come from the engine."""
    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .parquet(input_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",  # file sinks require append; each
            # micro-batch appends one running-total row per active user
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
