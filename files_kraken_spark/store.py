"""Keyed entity state store (reference parity: S10-S14, A11).

The reference's TinyDB JSON table keyed by ``(blueprint, id)``
(``database/_database.py:26-47``) becomes one versioned parquet table
per blueprint, maintained by full-state overwrite-by-key — the
Delta-free MERGE emulation (write v=N+1, swap pointer; see
SnapshotStore). With Delta/Iceberg available this class swaps to a
real ``MERGE INTO`` without touching callers.

Note the documented-intent fix: lookups here honor BOTH key parts —
the reference's ``get_blueprint``/``remove_blueprint`` drop the
blueprint-name conjunct due to a Python ``and`` bug
(``database/_database.py:36-37,44``; SURVEY §1.4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .blueprint import Blueprint
from .operators.assemble import state_schema
from .sources.snapshot import SnapshotStore


def align_to_schema(df: DataFrame, bp: Blueprint) -> DataFrame:
    """Reconcile a stored state frame to the blueprint's CURRENT
    schema: missing columns become typed NULLs, extras (fields removed
    from the blueprint) are dropped, order normalized."""
    target = state_schema(bp)
    cols = []
    for f in target:
        if f.name in df.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


class StateStore:
    """All blueprint tables under one root directory."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _slot(self, blueprint_name: str) -> SnapshotStore:
        return SnapshotStore(os.path.join(self.root, blueprint_name))

    # ------------------------------------------------------------- reads

    def load(self, spark: SparkSession, bp: Blueprint) -> DataFrame:
        """S14 — full scan of one blueprint's table (empty if absent).

        Schema evolution: a table written before the blueprint gained a
        field comes back with the new columns as NULL (the reference's
        document store was schemaless, so old records simply lacked the
        key — NULL is the columnar equivalent)."""
        raw = self._slot(bp.name).load(spark, state_schema(bp))
        return align_to_schema(raw, bp)

    def get(self, spark: SparkSession, bp: Blueprint, entity_id: str) -> DataFrame:
        """S11 — point lookup by (blueprint, id)."""
        return self.load(spark, bp).filter(
            (F.col("blueprint") == bp.name) & (F.col("id") == entity_id)
        )

    # ------------------------------------------------------------ writes

    def overwrite(self, bp: Blueprint, df: DataFrame) -> int:
        """A11 — commit a new state version (single-writer)."""
        return self._slot(bp.name).save(df)

    def upsert_rows(self, spark: SparkSession, bp: Blueprint, rows: DataFrame) -> int:
        """S10/S12 — insert-or-replace whole rows by id (utility path;
        the pipeline itself uses assemble's merge)."""
        cur = self.load(spark, bp)
        kept = cur.join(rows.select("id"), "id", "left_anti")
        return self.overwrite(bp, kept.unionByName(rows))

    def delete(self, spark: SparkSession, bp: Blueprint, entity_id: str) -> int:
        """S13 — remove one entity."""
        cur = self.load(spark, bp)
        return self.overwrite(bp, cur.filter(F.col("id") != entity_id))

    def clear(self, bp: Blueprint) -> None:
        self._slot(bp.name).clear()
