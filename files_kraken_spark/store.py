"""Keyed entity state store (reference parity: S10-S14, A11).

The reference's TinyDB JSON table keyed by ``(blueprint, id)``
(``database/_database.py:26-47``) becomes one hash-bucketed parquet
table per blueprint. Commits are INCREMENTAL: only buckets whose ids
appear in the batch are rewritten (the reference updates only touched
entities, ``data_organizer/_data_organizer.py:43-47``) — a full-state
overwrite per micro-batch would be O(state) write amplification per
tick at 100 TB. Layout:

    <root>/<blueprint>/b=<k>/v=<n>/   parquet data for bucket k
    <root>/<blueprint>/manifest.json  {"version": n, "buckets": {"k": n}}

A commit stages touched buckets with one ``partitionBy`` write, moves
them into place, then atomically swaps the manifest — a crash before
the swap leaves the previous state fully intact (single-writer
discipline, same as SnapshotStore's pointer swap). Buckets untouched
by the batch keep their old version in the manifest and are never
read or written. With Delta/Iceberg available this class swaps to a
real ``MERGE INTO`` without touching callers.

Note the documented-intent fix: lookups here honor BOTH key parts —
the reference's ``get_blueprint``/``remove_blueprint`` drop the
blueprint-name conjunct due to a Python ``and`` bug
(``database/_database.py:36-37,44``; SURVEY §1.4).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .blueprint import Blueprint
from .operators.assemble import state_schema


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
    """All blueprint tables under one root directory.

    ``n_buckets`` fixes the hash-partition count of every table; at
    cluster scale size it so one bucket's rows fit an executor's write
    task (buckets are the unit of rewrite, not parallelism — each
    bucket dir may hold many files).
    """

    def __init__(self, root: str, n_buckets: int = 32):
        self.root = root
        self.n_buckets = n_buckets
        os.makedirs(root, exist_ok=True)

    # ---------------------------------------------------------- layout

    def _dir(self, blueprint_name: str) -> str:
        return os.path.join(self.root, blueprint_name)

    def _manifest_path(self, blueprint_name: str) -> str:
        return os.path.join(self._dir(blueprint_name), "manifest.json")

    def _read_manifest(self, blueprint_name: str) -> dict | None:
        try:
            with open(self._manifest_path(blueprint_name)) as f:
                return json.load(f)
        except (FileNotFoundError, ValueError):
            return None  # S8 semantics: missing/corrupt manifest → empty

    def _load_manifest_file(self, path: str) -> dict:
        """Parse one manifest file (subclasses add integrity checks)."""
        with open(path) as f:
            return json.load(f)

    def _bucket_path(self, blueprint_name: str, k, v) -> str:
        """Filesystem location of bucket ``k`` at version ``v``
        (subclasses override for copy-on-write layouts)."""
        return os.path.join(self._dir(blueprint_name), f"b={k}", f"v={v}")

    def _prev_version(self, blueprint_name: str, current: int) -> int | None:
        """The retained commit preceding ``current``, or None at v1.
        Versions are consecutive here; copy-on-write subclasses skip
        numbers past crashed commits and override this."""
        return current - 1 if current > 1 else None

    def _bucket_col(self):
        return F.pmod(F.xxhash64(F.col("id")), F.lit(self.n_buckets)).cast("int")

    # ------------------------------------------------------------- reads

    def load(self, spark: SparkSession, bp: Blueprint) -> DataFrame:
        """S14 — full scan of one blueprint's table (empty if absent).

        Schema evolution: a table written before the blueprint gained a
        field comes back with the new columns as NULL (the reference's
        document store was schemaless, so old records simply lacked the
        key — NULL is the columnar equivalent)."""
        man = self._read_manifest(bp.name)
        if not man or not man["buckets"]:
            raw = spark.createDataFrame([], state_schema(bp))
        else:
            paths = [
                self._bucket_path(bp.name, k, v)
                for k, v in man["buckets"].items()
            ]
            raw = spark.read.option("mergeSchema", "true").parquet(*paths)
        return align_to_schema(raw, bp)

    def get(self, spark: SparkSession, bp: Blueprint, entity_id: str) -> DataFrame:
        """S11 — point lookup by (blueprint, id). Only the id's bucket
        is scanned (manifest-level partition pruning)."""
        pred = (F.col("blueprint") == bp.name) & (F.col("id") == entity_id)
        man = self._read_manifest(bp.name)
        if not man or not man["buckets"]:
            return self.load(spark, bp).filter(pred)
        one = spark.createDataFrame([(entity_id,)], "id string")
        k = one.select(self._bucket_col().alias("__b")).first()[0]
        bv = man["buckets"].get(str(k))
        if bv is None:
            return spark.createDataFrame([], state_schema(bp)).filter(pred)
        raw = spark.read.parquet(self._bucket_path(bp.name, k, bv))
        return align_to_schema(raw, bp).filter(pred)

    # ------------------------------------------------------------ writes

    def overwrite(
        self, bp: Blueprint, df: DataFrame, touched_ids: DataFrame | None = None
    ) -> int:
        """A11 — commit a new state version (single-writer).

        With ``touched_ids`` (the batch's entity ids), only the buckets
        those ids hash into are rewritten — rows of ``df`` outside the
        touched buckets are identical to the stored state by
        construction (the merge only changes batch entities), so their
        buckets keep their old version. Without it, every bucket is
        rewritten (bootstrap / reindex path)."""
        man = self._read_manifest(bp.name) or {"version": 0, "buckets": {}}
        v = man["version"] + 1
        bdir = self._dir(bp.name)
        os.makedirs(bdir, exist_ok=True)

        touched: list[int] | None = None
        out = df.withColumn("__b", self._bucket_col())
        if touched_ids is not None and man["buckets"]:
            touched = sorted(
                r[0]
                for r in touched_ids.select(
                    self._bucket_col().alias("__b")
                ).distinct().collect()  # ≤ n_buckets small ints — driver-safe
            )
            if not touched:
                return man["version"]
            out = out.filter(F.col("__b").isin(touched))

        stage = os.path.join(bdir, f"_stage_v={v}")
        out.write.mode("overwrite").partitionBy("__b").parquet(stage)
        written: set[int] = set()
        for entry in os.listdir(stage):
            if entry.startswith("__b="):
                k = int(entry.split("=", 1)[1])
                tgt = os.path.join(bdir, f"b={k}", f"v={v}")
                os.makedirs(os.path.dirname(tgt), exist_ok=True)
                if os.path.exists(tgt):
                    shutil.rmtree(tgt)
                os.replace(os.path.join(stage, entry), tgt)
                written.add(k)
        shutil.rmtree(stage, ignore_errors=True)

        old_buckets = {int(k): int(bv) for k, bv in man["buckets"].items()}
        if touched is None:
            # full rewrite: buckets with no rows in df are now empty
            new_buckets = {k: v for k in written}
        else:
            new_buckets = dict(old_buckets)
            for k in touched:
                if k in written:
                    new_buckets[k] = v
                else:
                    new_buckets.pop(k, None)  # every row in the bucket deleted

        manifest = {
            "version": v,
            "buckets": {str(k): bv for k, bv in sorted(new_buckets.items())},
        }
        # time travel: keep a per-version manifest alongside — every
        # bucket version either retained manifest references survives
        # the prune below, so load_version(v-1) stays resolvable
        # (the reference's BackupManager kept restorable backups, S8).
        # Written BEFORE the commit point: a crash in between leaves an
        # orphan history file (harmless, overwritten on retry), whereas
        # the reverse order could commit a version whose history file
        # never lands — breaking the retained-previous invariant
        # changes()/_prev_version relies on after the NEXT commit.
        hist = os.path.join(self._dir(bp.name), f"manifest.v{v}.json")
        with open(hist, "w") as f:
            json.dump(manifest, f)
        tmp = self._manifest_path(bp.name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(bp.name))  # atomic commit point
        for entry in os.listdir(self._dir(bp.name)):
            if entry.startswith("manifest.v"):
                hv = int(entry[len("manifest.v"):-len(".json")])
                if hv < v - 1:
                    os.remove(os.path.join(self._dir(bp.name), entry))
        self._prune(bp.name, keep={(k, bv) for k, bv in new_buckets.items()}
                    | {(k, bv) for k, bv in old_buckets.items()})
        return v

    # ---------------------------------------------------------- history

    def load_version(self, spark: SparkSession, bp: Blueprint, version: int) -> DataFrame:
        """Time travel: read the state as of a retained commit
        (current or previous — older bucket data is pruned)."""
        path = os.path.join(self._dir(bp.name), f"manifest.v{version}.json")
        try:
            man = self._load_manifest_file(path)
        except (FileNotFoundError, ValueError):
            raise ValueError(
                f"version {version} of {bp.name} is not retained "
                "(only the current and previous commits are)"
            ) from None
        if not man["buckets"]:
            return align_to_schema(
                spark.createDataFrame([], state_schema(bp)), bp
            )
        paths = [
            self._bucket_path(bp.name, k, bv)
            for k, bv in man["buckets"].items()
        ]
        raw = spark.read.option("mergeSchema", "true").parquet(*paths)
        return align_to_schema(raw, bp)

    def upsert_rows(self, spark: SparkSession, bp: Blueprint, rows: DataFrame) -> int:
        """S10/S12 — insert-or-replace whole rows by id (utility path;
        the pipeline itself uses assemble's merge)."""
        cur = self.load(spark, bp)
        kept = cur.join(rows.select("id"), "id", "left_anti")
        return self.overwrite(
            bp, kept.unionByName(rows), touched_ids=rows.select("id")
        )

    def delete(self, spark: SparkSession, bp: Blueprint, entity_id: str) -> int:
        """S13 — remove one entity (rewrites only its bucket)."""
        cur = self.load(spark, bp)
        touched = cur.sparkSession.createDataFrame([(entity_id,)], "id string")
        return self.overwrite(
            bp, cur.filter(F.col("id") != entity_id), touched_ids=touched
        )

    def clear(self, bp: Blueprint) -> None:
        shutil.rmtree(self._dir(bp.name), ignore_errors=True)

    def changes(self, spark: SparkSession, bp: Blueprint) -> DataFrame:
        """Change-data-feed for the last commit: (id, change) rows with
        change ∈ inserted|updated|deleted, derived by diffing the
        current state against the retained previous version — the
        downstream-consumer hook the reference's change reports
        provide for files, applied to ENTITIES. One pass of two
        anti-joins on (id, row-content hash)."""
        man = self._read_manifest(bp.name)
        cur = self.load(spark, bp)
        prev_v = self._prev_version(bp.name, man["version"]) if man else None
        if prev_v is None:
            return cur.select("id", F.lit("inserted").alias("change"))
        prev = self.load_version(spark, bp, prev_v)
        cols = [c for c in cur.columns]
        fp = F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("\0")) for c in cols])
        c = cur.select("id", fp.alias("__fp"))
        p = prev.select("id", fp.alias("__fp"))
        inserted = (
            c.join(p.select("id"), "id", "left_anti")
            .select("id", F.lit("inserted").alias("change"))
        )
        deleted = (
            p.join(c.select("id"), "id", "left_anti")
            .select("id", F.lit("deleted").alias("change"))
        )
        updated = (
            c.join(p.withColumnRenamed("__fp", "__pfp"), "id")
            .filter(F.col("__fp") != F.col("__pfp"))
            .select("id", F.lit("updated").alias("change"))
        )
        return inserted.unionByName(updated).unionByName(deleted)

    # ------------------------------------------------------------ hygiene

    def _prune(self, blueprint_name: str, keep: set[tuple[int, int]]) -> None:
        """Drop bucket versions not referenced by the current or
        previous manifest (crash-recovery window of one commit)."""
        bdir = self._dir(blueprint_name)
        for entry in os.listdir(bdir):
            if not entry.startswith("b="):
                continue
            k = int(entry.split("=", 1)[1])
            vdir = os.path.join(bdir, entry)
            for ventry in os.listdir(vdir):
                if ventry.startswith("v="):
                    bv = int(ventry.split("=", 1)[1])
                    if (k, bv) not in keep:
                        shutil.rmtree(os.path.join(vdir, ventry), ignore_errors=True)
