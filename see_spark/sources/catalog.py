"""Snapshot catalog: Iceberg-style committed snapshots over parquet dirs.

Gives the crawl loop the storage contract SURVEY §1.3 maps from Mnesia
``disc_copies`` to Iceberg: atomic per-table commits, snapshot ids, round
metadata in the commit (=> resumable mid-frontier), and time travel for
tests. Production swaps this for real Iceberg via ``tables.iceberg_ddl``;
the pipeline code only touches this interface.

Commit protocol: write the new snapshot's parquet under
``{root}/{table}/snap-{n:06d}/`` then atomically rename a tmp meta file onto
``{root}/{table}/_meta.json`` holding {current, snapshots:[{id, meta}]}.
Readers resolve current from meta, so a crashed half-written snapshot dir is
simply never referenced (single-writer-per-round, like the reference's one
gen_server: apps/db/src/see_db_srv.erl:25-44).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from .tables import SCHEMAS


class SnapshotCatalog:
    def __init__(self, root: str, spark: SparkSession):
        self.root = root
        self.spark = spark
        os.makedirs(root, exist_ok=True)

    # ---- meta ----------------------------------------------------------
    def _meta_path(self, table: str) -> str:
        return os.path.join(self.root, table, "_meta.json")

    def _load_meta(self, table: str) -> dict:
        path = self._meta_path(table)
        if not os.path.exists(path):
            return {"current": None, "snapshots": []}
        with open(path) as fh:
            return json.load(fh)

    def _store_meta(self, table: str, meta: dict) -> None:
        path = self._meta_path(table)
        tmp = path + ".tmp"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, path)

    # ---- read ----------------------------------------------------------
    def read(self, table: str, snapshot: Optional[int] = None) -> DataFrame:
        meta = self._load_meta(table)
        snap = meta["current"] if snapshot is None else snapshot
        if snap is None:
            return self.spark.createDataFrame([], SCHEMAS[table])
        path = os.path.join(self.root, table, f"snap-{snap:06d}")
        return self.spark.read.schema(SCHEMAS[table]).parquet(path)

    def current_snapshot(self, table: str) -> Optional[int]:
        return self._load_meta(table)["current"]

    def snapshot_meta(self, table: str, snapshot: Optional[int] = None) -> dict:
        meta = self._load_meta(table)
        snap = meta["current"] if snapshot is None else snapshot
        for entry in meta["snapshots"]:
            if entry["id"] == snap:
                return entry.get("meta", {})
        return {}

    # ---- write ---------------------------------------------------------
    def commit(self, table: str, df: DataFrame, meta: Optional[dict] = None) -> int:
        """Write df as the table's next snapshot and publish it atomically."""
        table_meta = self._load_meta(table)
        snap = (table_meta["current"] or 0) + 1
        path = os.path.join(self.root, table, f"snap-{snap:06d}")
        if os.path.exists(path):  # leftover from a crashed commit
            shutil.rmtree(path)
        # enforce declared schema + column order on every commit
        cols = [f.name for f in SCHEMAS[table].fields]
        df.select(*cols).write.mode("overwrite").parquet(path)
        table_meta["snapshots"].append({"id": snap, "meta": meta or {}})
        table_meta["current"] = snap
        self._store_meta(table, table_meta)
        return snap

    def rollback(self, table: str, snapshot: int) -> None:
        meta = self._load_meta(table)
        meta["current"] = snapshot
        self._store_meta(table, meta)

    # ---- round checkpointing -------------------------------------------
    CHECKPOINT = "_checkpoint.json"

    def commit_round(self, round_no: int, extra: Optional[dict] = None) -> None:
        """Mark a crawl round fully committed (all table commits landed).
        Resume reads this: a crash between table commits replays the round
        from each table's last snapshot tagged <= last committed round."""
        payload = {"round": round_no}
        payload.update(extra or {})
        tmp = os.path.join(self.root, self.CHECKPOINT + ".tmp")
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
        os.replace(tmp, os.path.join(self.root, self.CHECKPOINT))

    def last_committed_round(self) -> int:
        path = os.path.join(self.root, self.CHECKPOINT)
        if not os.path.exists(path):
            return -1
        with open(path) as fh:
            return json.load(fh)["round"]

    def resume_point(self) -> int:
        """Round to run next; also rolls each table back to its snapshot at
        the last fully committed round (discarding torn partial commits)."""
        last = self.last_committed_round()
        for table in SCHEMAS:
            meta = self._load_meta(table)
            good = None
            for entry in meta["snapshots"]:
                if entry.get("meta", {}).get("round", -1) <= last:
                    good = entry["id"]
            if meta["current"] != good:
                self.rollback(table, good)
        return last + 1
