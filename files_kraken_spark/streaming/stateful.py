"""Custom stateful streaming operators (`applyInPandasWithState`).

The engine's micro-batch pipeline covers the reference's semantics via
`foreachBatch` + state table; this module adds arbitrary user state
ACROSS micro-batches — the Structured Streaming primitive for
operators the built-in windowed aggregations can't express
(running dedup, per-key counters with custom eviction, incremental
sketches). State lives in the checkpoint, partitioned by key, so it
scales horizontally with executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_COUNT_SCHEMA = "key string, batch_rows bigint, total_rows bigint"
SEEN_FILTER_SCHEMA = "key string, fresh_values array<string>"


def _running_count(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key running row count across micro-batches."""
    batch = sum(len(p) for p in pdfs)
    (total,) = state.get if state.exists else (0,)
    total += batch
    state.update((total,))
    yield pd.DataFrame({"key": [key[0]], "batch_rows": [batch], "total_rows": [total]})


def running_count(grouped, key_col: str = "key") -> DataFrame:
    """Streaming running counter per key: the canonical
    applyInPandasWithState shape (state schema declared, timeout off)."""
    return grouped.applyInPandasWithState(
        _running_count,
        outputStructType=RUNNING_COUNT_SCHEMA,
        stateStructType="total bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _seen_filter(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Streaming exact dedup: emit only values never seen for this key;
    remember everything seen (state = the seen-set)."""
    seen = set(state.get[0]) if state.exists else set()
    fresh: list[str] = []
    for p in pdfs:
        for v in p["value"]:
            if v not in seen:
                seen.add(v)
                fresh.append(v)
    state.update((list(seen),))
    yield pd.DataFrame({"key": [key[0]], "fresh_values": [fresh]})


def streaming_dedup(grouped) -> DataFrame:
    """Cross-batch exact dedup per key — the streaming counterpart of
    ``operators.dedup.exact_dedup`` (state carries the seen-set; at
    scale the set becomes a bloom filter or minhash sketch, same
    operator shape)."""
    return grouped.applyInPandasWithState(
        _seen_filter,
        outputStructType=SEEN_FILTER_SCHEMA,
        stateStructType="seen array<string>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
