"""Delta Lake state store — the production MERGE INTO backend.

``CowStateStore`` is the self-contained object-store-safe default
(homegrown manifest log, no extra deps). When ``delta-spark`` is on the
path, ``DeltaStateStore`` provides the same blueprint-keyed API on a
real Delta transaction log: ACID commits, ``MERGE INTO`` upserts,
time travel via ``versionAsOf``, and VACUUM-based retention — the
"with Delta available this swaps in without touching callers" path
promised in ``store.py``'s module docstring.

Reference parity (same contract as ``StateStore``):
  - S10/S12 insert + partial update -> ``upsert_rows`` (MERGE INTO)
  - S11 point lookup               -> ``get`` (Delta data skipping)
  - S13 delete                      -> ``delete`` (deletion vectors /
    file rewrite are Delta's concern, not ours)
  - S14 full scan                   -> ``load``
  - A11 batch upsert                -> ``overwrite`` / ``upsert_rows``
  - change feed                     -> ``changes`` (current vs previous
    version, two anti-joins — identical semantics to
    ``StateStore.changes`` and needs no CDF table property)

The module imports without delta-spark installed; instantiating
``DeltaStateStore`` raises a clear error instead. Build the session
with ``delta_builder()`` so the SQL extension + catalog are registered
(they cannot be retrofitted onto a running SparkSession).

Scale note: MERGE shuffles on the join key; Delta prunes the rewrite
to files whose min/max id range overlaps the batch (data skipping), so
a batch touching few entities rewrites few files — the same "only
touched buckets rewritten" property ``StateStore.overwrite`` gets from
manifest bucketing, achieved by the log instead.
"""

from __future__ import annotations

import shutil
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .blueprint import Blueprint
from .operators.assemble import state_schema
from .store import align_to_schema

try:  # optional dependency gate — mirrors the Pillow gate in multimodal
    from delta import configure_spark_with_delta_pip
    from delta.tables import DeltaTable

    HAS_DELTA = True
except ImportError:  # pragma: no cover - exercised only without delta
    configure_spark_with_delta_pip = None
    DeltaTable = None
    HAS_DELTA = False


def delta_builder(builder):
    """Wrap a SparkSession.Builder with the Delta extension + catalog.

    Must run BEFORE ``getOrCreate()`` — Spark SQL extensions are fixed
    at session construction.
    """
    if not HAS_DELTA:
        raise ImportError(
            "delta-spark is not installed; DeltaStateStore is unavailable "
            "(use StateStore/CowStateStore, or `pip install delta-spark`)"
        )
    builder = builder.config(
        "spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension"
    ).config(
        "spark.sql.catalog.spark_catalog",
        "org.apache.spark.sql.delta.catalog.DeltaCatalog",
    )
    return configure_spark_with_delta_pip(builder)


class DeltaStateStore:
    """Blueprint-keyed entity state on Delta tables (one per blueprint).

    Single-writer per blueprint, like the siblings — Delta would also
    arbitrate concurrent writers (optimistic concurrency), which the
    homegrown stores cannot; that is the main production win besides
    MERGE.
    """

    def __init__(self, root: str):
        if not HAS_DELTA:
            raise ImportError(
                "delta-spark is not installed; DeltaStateStore is "
                "unavailable (use StateStore/CowStateStore)"
            )
        self.root = root

    def _path(self, blueprint_name: str) -> str:
        return os.path.join(self.root, blueprint_name)

    def _table(self, spark: SparkSession, bp: Blueprint):
        p = self._path(bp.name)
        if not DeltaTable.isDeltaTable(spark, p):
            return None
        return DeltaTable.forPath(spark, p)

    # ------------------------------------------------------------- reads

    def load(self, spark: SparkSession, bp: Blueprint) -> DataFrame:
        """S14 — full scan (empty frame if the table doesn't exist).

        Schema evolution comes from the Delta log (adds are recorded
        there); ``align_to_schema`` still nulls in blueprint columns
        the table has never seen."""
        p = self._path(bp.name)
        if not DeltaTable.isDeltaTable(spark, p):
            raw = spark.createDataFrame([], state_schema(bp))
        else:
            raw = spark.read.format("delta").load(p)
        return align_to_schema(raw, bp)

    def get(self, spark: SparkSession, bp: Blueprint, entity_id: str) -> DataFrame:
        """S11 — point lookup; Delta file-level min/max stats on ``id``
        prune the scan (the log-side analog of manifest bucketing)."""
        return self.load(spark, bp).filter(
            (F.col("blueprint") == bp.name) & (F.col("id") == entity_id)
        )

    # ------------------------------------------------------------ writes

    def overwrite(self, spark: SparkSession, bp: Blueprint, df: DataFrame) -> int:
        """A11 bootstrap/reindex — replace the table in one commit."""
        (
            align_to_schema(df, bp)
            .write.format("delta")
            .mode("overwrite")
            .option("overwriteSchema", "true")
            .save(self._path(bp.name))
        )
        return self._version(spark, bp)

    def upsert_rows(self, spark: SparkSession, bp: Blueprint, rows: DataFrame) -> int:
        """S10/S12/A11 — real ``MERGE INTO`` keyed on id: matched rows
        are replaced whole, unmatched inserted (identical semantics to
        ``StateStore.upsert_rows``'s anti-join + union)."""
        tbl = self._table(spark, bp)
        rows = align_to_schema(rows, bp)
        if tbl is None:
            return self.overwrite(spark, bp, rows)
        (
            tbl.alias("t")
            .merge(rows.alias("s"), "t.id = s.id")
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return self._version(spark, bp)

    def delete(self, spark: SparkSession, bp: Blueprint, entity_id: str) -> int:
        """S13 — delete by id (deletion vectors make this metadata-only
        on recent Delta; either way no full-table rewrite)."""
        tbl = self._table(spark, bp)
        if tbl is not None:
            tbl.delete(F.col("id") == entity_id)
        return self._version(spark, bp)

    def clear(self, bp: Blueprint) -> None:
        shutil.rmtree(self._path(bp.name), ignore_errors=True)

    # ---------------------------------------------------------- history

    def _version(self, spark: SparkSession, bp: Blueprint) -> int:
        tbl = self._table(spark, bp)
        if tbl is None:
            return 0
        return int(tbl.history(1).select("version").first()[0])

    def versions(self, spark: SparkSession, bp: Blueprint) -> list[int]:
        """Commit versions, newest first (DESCRIBE HISTORY reduced to
        ids — same shape as ``CowStateStore.versions``)."""
        tbl = self._table(spark, bp)
        if tbl is None:
            return []
        return [
            int(r[0])
            for r in tbl.history().select("version")
            .orderBy(F.col("version").desc()).collect()
        ]

    def load_version(
        self, spark: SparkSession, bp: Blueprint, version: int
    ) -> DataFrame:
        """Time travel via the Delta log (``versionAsOf``)."""
        raw = (
            spark.read.format("delta")
            .option("versionAsOf", version)
            .load(self._path(bp.name))
        )
        return align_to_schema(raw, bp)

    def changes(self, spark: SparkSession, bp: Blueprint) -> DataFrame:
        """Change feed for the last commit: (id, change) with change ∈
        inserted|updated|deleted — current vs previous version diffed
        by (id, content-hash) anti-joins, exactly like
        ``StateStore.changes`` so consumers see one contract regardless
        of backend."""
        cur = self.load(spark, bp)
        vs = self.versions(spark, bp)
        if len(vs) < 2:
            return cur.select("id", F.lit("inserted").alias("change"))
        prev = self.load_version(spark, bp, vs[1])
        cols = [c for c in cur.columns]

        def keyed(df: DataFrame) -> DataFrame:
            return df.select(
                "id",
                F.xxhash64(*[F.col(c).cast("string") for c in cols]).alias("__h"),
            )

        c, p = keyed(cur), keyed(prev)
        inserted = c.join(p.select("id"), "id", "left_anti").select(
            "id", F.lit("inserted").alias("change")
        )
        deleted = p.join(c.select("id"), "id", "left_anti").select(
            "id", F.lit("deleted").alias("change")
        )
        updated = (
            c.join(p.withColumnRenamed("__h", "__hp"), "id")
            .filter(F.col("__h") != F.col("__hp"))
            .select("id", F.lit("updated").alias("change"))
        )
        return inserted.unionByName(updated).unionByName(deleted)
