"""Custom stateful streaming operator via applyInPandasWithState.

The built-in windows/session-windows (streaming/events.py) cover time-bucket
state; this covers ARBITRARY per-key state — the escape hatch for operators
Spark lacks (running per-user lifetime profiles, custom decay counters,
cross-batch dedup...). Reference has no streaming at all (SURVEY §2.10).

Scale design: state lives in the state store partitioned by the grouping
key (one shuffle), each micro-batch touches only keys present in the batch,
and Arrow moves rows to Python in batches, not rows. State growth is the
failure mode at 100 TB/day — bound it with a timeout (evict idle users) or
key TTL; here NoTimeout is used because the driver check runs one
availableNow batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, "
    "first_seen timestamp, last_seen timestamp"
)
STATE_SCHEMA = "n bigint, total double, first timestamp, last timestamp"


def _update_user_stats(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate lifetime (count, sum, first/last seen) per user across
    micro-batches; emit the updated profile once per batch the key appears
    in. math.fsum keeps the running total exactly rounded, so results do
    not depend on batch arrival order."""
    import math

    n, total, first, last = (
        state.get if state.exists else (0, 0.0, None, None)
    )
    for pdf in batches:
        n += len(pdf)
        total = math.fsum([total] + pdf["value"].tolist())
        ts_min, ts_max = pdf["ts"].min(), pdf["ts"].max()
        first = ts_min if first is None or ts_min < first else first
        last = ts_max if last is None or ts_max > last else last
    state.update((n, total, first, last))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "first_seen": [first],
            "last_seen": [last],
        }
    )


def user_lifetime_stats(events: DataFrame) -> DataFrame:
    """Per-user lifetime profile as a stateful stream transform.

    Works on a streaming frame (state store) — the batch equivalent is a
    plain groupBy, which the oracle check exploits."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
