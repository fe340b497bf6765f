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

    def _snapshot_entry(self, table: str, snap: int) -> dict:
        for entry in self._load_meta(table)["snapshots"]:
            if entry["id"] == snap:
                return entry
        return {}

    @staticmethod
    def _publish(table_meta: dict, entry: dict) -> None:
        """Install a snapshot entry: any existing entries at or above its
        id are torn leftovers from a crash + rollback replay (the replayed
        round re-uses the rolled-back id) — they must be dropped, or
        manifest lookups would resolve the STALE first match and a
        crash-replay would read the torn snapshot's files."""
        table_meta["snapshots"] = [
            e for e in table_meta["snapshots"] if e["id"] < entry["id"]
        ]
        table_meta["snapshots"].append(entry)
        table_meta["current"] = entry["id"]

    def parts(self, table: str, snapshot: Optional[int] = None) -> dict:
        """Partition-value -> [relative data dirs] manifest for a snapshot.
        Flat (non-delta) snapshots resolve to {"__all__": [snap dir]}."""
        meta = self._load_meta(table)
        snap = meta["current"] if snapshot is None else snapshot
        if snap is None:
            return {}
        entry = self._snapshot_entry(table, snap)
        return entry.get("parts") or {"__all__": [f"snap-{snap:06d}"]}

    # ---- read ----------------------------------------------------------
    def read(self, table: str, snapshot: Optional[int] = None) -> DataFrame:
        parts = self.parts(table, snapshot)
        paths = [
            os.path.join(self.root, table, rel)
            for dirs in parts.values()
            for rel in dirs
        ]
        if not paths:
            return self.spark.createDataFrame([], SCHEMAS[table])
        return self.spark.read.schema(SCHEMAS[table]).parquet(*paths)

    def read_parts(
        self, table: str, part_col: str, values,
        snapshot: Optional[int] = None, compute_col=None,
    ) -> DataFrame:
        """Partition-pruned read: only the manifest dirs for the given
        ``part_col`` values are opened — the Iceberg partition-pruning
        analogue, resolved DRIVER-side from the manifest with zero file
        I/O for other partitions (the search path's way to read 5 word
        buckets of a 100-TB postings table instead of every file).

        Legacy dirs that predate partitioning ('__all__' flat snapshots,
        '__rows__' unpartitioned appends) can hold ANY value, so they are
        always included and a residual ``part_col`` filter keeps the
        result exact in that mixed case. Files written before the
        partition column existed read it as NULL, which a bare isin()
        would silently DROP — pass ``compute_col`` (a Column deriving
        the partition value from the row, e.g. the word-bucket hash) and
        the residual filter coalesces NULLs through it."""
        from pyspark.sql import functions as F

        wanted = {str(v) for v in values}
        parts = self.parts(table, snapshot)
        paths = []
        mixed = False
        for value, dirs in parts.items():
            if value in ("__all__", "__rows__"):
                mixed = True
            elif value not in wanted:
                continue
            paths.extend(os.path.join(self.root, table, rel) for rel in dirs)
        if not paths:
            return self.spark.createDataFrame([], SCHEMAS[table])
        df = self.spark.read.schema(SCHEMAS[table]).parquet(*paths)
        if mixed:
            col = F.col(part_col)
            if compute_col is not None:
                col = F.coalesce(col, compute_col)
            df = df.filter(col.isin(list(values)))
        return df

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
        self._publish(table_meta, {"id": snap, "meta": meta or {}})
        self._store_meta(table, table_meta)
        return snap

    # how many delta dirs a partition may accumulate before the commit
    # rewrites it into one dir (bounds read fan-in and small-file count)
    COMPACT_AFTER = 32

    def commit_delta(
        self,
        table: str,
        partition_col: Optional[str] = None,
        replaced: Optional[dict] = None,
        appended: Optional[DataFrame] = None,
        meta: Optional[dict] = None,
        compact_agg=None,
    ) -> int:
        """Partition-aware commit: write ONLY changed partitions; unchanged
        partitions carry forward as manifest references to earlier
        snapshots' files (zero I/O — the Iceberg MERGE INTO shape that
        ``tables.iceberg_ddl`` declares for production).

        ``replaced``: {partition value: full replacement DataFrame} — the
        partition's new complete contents (one write job per value; the
        crawl uses exactly one, the mutable 'unvisited' state).
        ``appended``: rows to add, any mix of partition values — written in
        ONE partitionBy job; the dirs that materialize are appended to
        their partitions' manifests (append-only terminal states).
        ``partition_col`` None = unpartitioned append-only table (docs,
        postings): appended rows land under the single '__rows__' part.

        Round-commit I/O is O(rows written), never O(table). A partition
        whose dir list exceeds COMPACT_AFTER is rewritten into one dir
        (amortized compaction, same contents).
        """
        table_meta = self._load_meta(table)
        snap = (table_meta["current"] or 0) + 1
        snap_rel = f"snap-{snap:06d}"
        snap_path = os.path.join(self.root, table, snap_rel)
        if os.path.exists(snap_path):  # leftover from a crashed commit
            shutil.rmtree(snap_path)
        prev_parts = self.parts(table) if table_meta["current"] else {}
        cols = [f.name for f in SCHEMAS[table].fields]
        replaced = replaced or {}

        new_parts = {k: list(v) for k, v in prev_parts.items()}
        if "__all__" in new_parts:
            # migrate a flat snapshot: split the carried-forward remainder
            # (everything outside the replaced partitions) by partition
            # value in one partitionBy job — paid once per catalog
            if partition_col is None:
                raise ValueError(
                    f"cannot delta-commit unpartitioned rows onto flat "
                    f"table {table!r} without replacing it; use commit()"
                )
            from pyspark.sql import functions as F

            del new_parts["__all__"]
            remainder = self.read(table)
            if replaced:
                remainder = remainder.filter(
                    ~F.col(partition_col).isin(list(replaced))
                )
            mig_rel = f"{snap_rel}/migrate"
            self._write_partitioned(
                remainder, cols, partition_col,
                os.path.join(self.root, table, mig_rel),
            )
            for value in self._list_part_dirs(table, mig_rel):
                new_parts[value] = [f"{mig_rel}/__part={value}"]

        for value, df in replaced.items():
            rel = f"{snap_rel}/replace-{value}"
            df.select(*cols).write.mode("overwrite").parquet(
                os.path.join(self.root, table, rel)
            )
            new_parts[value] = [rel]

        if appended is not None:
            if partition_col is None:
                rel = f"{snap_rel}/append"
                appended.select(*cols).write.mode("overwrite").parquet(
                    os.path.join(self.root, table, rel)
                )
                new_parts.setdefault("__rows__", []).append(rel)
            else:
                delta_rel = f"{snap_rel}/delta"
                self._write_partitioned(
                    appended, cols, partition_col,
                    os.path.join(self.root, table, delta_rel),
                )
                for value in self._list_part_dirs(table, delta_rel):
                    new_parts.setdefault(value, []).append(
                        f"{delta_rel}/__part={value}"
                    )

        for value, dirs in new_parts.items():
            if len(dirs) > self.COMPACT_AFTER:
                rel = f"{snap_rel}/compact-{value}"
                merged = self.spark.read.schema(SCHEMAS[table]).parquet(
                    *[os.path.join(self.root, table, d) for d in dirs]
                )
                # ``compact_agg``: optional row-merging transform applied
                # during compaction — for increment tables (hoststats,
                # word_stats) whose read path aggregates with DECOMPOSABLE
                # functions (max/sum), folding rows here keeps the table
                # O(keys) instead of O(keys x rounds) without changing the
                # aggregated read result (agg of agg == agg).
                if compact_agg is not None:
                    merged = compact_agg(merged)
                merged.select(*cols).write.mode("overwrite").parquet(
                    os.path.join(self.root, table, rel)
                )
                new_parts[value] = [rel]

        self._publish(
            table_meta, {"id": snap, "meta": meta or {}, "parts": new_parts}
        )
        self._store_meta(table, table_meta)
        return snap

    def _write_partitioned(
        self, df: DataFrame, cols: list, partition_col: str, path: str
    ) -> None:
        """partitionBy under a duplicated '__part' column so the data files
        keep the real partition column; reading a leaf '__part=x' dir
        directly therefore needs no partition-value recovery."""
        from pyspark.sql import functions as F

        df.select(*cols).withColumn(
            "__part", F.col(partition_col)
        ).write.partitionBy("__part").mode("overwrite").parquet(path)

    def _list_part_dirs(self, table: str, rel: str) -> list:
        base = os.path.join(self.root, table, rel)
        if not os.path.isdir(base):
            return []
        return sorted(
            d.split("=", 1)[1]
            for d in os.listdir(base)
            if d.startswith("__part=")
        )

    def rollback(self, table: str, snapshot: Optional[int]) -> None:
        """Set the table's current snapshot (None = empty/pre-first-commit).
        Raises if the target was expired by vacuum(): silently accepting it
        would leave ``current`` pointing at a trimmed manifest entry, and
        read() would fall back to a flat snap dir path vacuum deleted."""
        meta = self._load_meta(table)
        if snapshot is not None and not any(
            e["id"] == snapshot for e in meta["snapshots"]
        ):
            raise ValueError(
                f"cannot roll back {table!r} to snapshot {snapshot}: not in "
                f"the manifest (expired by vacuum?)"
            )
        meta["current"] = snapshot
        self._store_meta(table, meta)

    def diff(
        self,
        table: str,
        a: Optional[int],
        b: Optional[int],
        key_cols,
    ):
        """Time-travel diff between two snapshots of ``table``: one row
        per key whose presence or content changed, with ``change`` in
        {'added', 'removed', 'changed'} (b relative to a; None selects
        the current snapshot, read()'s convention). The crawl-ops
        question "what did round N do to this table" answered from
        snapshots alone — no lineage columns required.

        Non-key columns are compared via an md5 over their string casts
        (NULL as the sentinel '\x00'), so the diff is one full outer
        join on the key — no row-by-row driver work, scales with the
        table. Rows are distinct-ed per side first: multi-row keys
        compare as multisets of row hashes (order-free)."""
        from pyspark.sql import functions as F

        keys = list(key_cols)

        def _hashed(snap):
            df = self.read(table, snap)
            other = [c for c in df.columns if c not in keys]
            row_h = F.md5(
                F.concat_ws(
                    "\x1f",
                    *[
                        F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                        for c in other
                    ],
                )
            )
            per_key = (
                df.select(*keys, row_h.alias("__h"))
                .groupBy(*keys)
                .agg(
                    F.md5(
                        F.array_join(F.array_sort(F.collect_list("__h")), ",")
                    ).alias("__sig")
                )
            )
            return per_key

        da = _hashed(a).withColumnRenamed("__sig", "__sig_a")
        db = _hashed(b).withColumnRenamed("__sig", "__sig_b")
        j = da.join(db, keys, "full_outer")
        change = (
            F.when(F.col("__sig_a").isNull(), F.lit("added"))
            .when(F.col("__sig_b").isNull(), F.lit("removed"))
            .otherwise(F.lit("changed"))
        )
        return (
            j.filter(
                F.col("__sig_a").isNull()
                | F.col("__sig_b").isNull()
                | (F.col("__sig_a") != F.col("__sig_b"))
            )
            .select(*keys, change.alias("change"))
        )

    def vacuum(self, table: str, keep_snapshots: int = 2) -> list:
        """Expire old snapshots (Iceberg ``expire_snapshots`` analogue):
        keep the newest ``keep_snapshots`` manifest entries ending at
        ``current`` and delete every data dir no kept snapshot references.
        With delta commits, terminal-partition dirs are shared across many
        snapshots — reference counting via the kept manifests makes this
        safe. Returns the deleted relative dirs. Time travel to expired
        snapshots is gone afterwards (the point: bound disk growth)."""
        meta = self._load_meta(table)
        if meta["current"] is None:
            return []
        kept_entries = [
            e for e in meta["snapshots"] if e["id"] <= meta["current"]
        ][-keep_snapshots:]
        kept_ids = {e["id"] for e in kept_entries}
        referenced = set()
        for entry in kept_entries:
            parts = entry.get("parts") or {"__all__": [f"snap-{entry['id']:06d}"]}
            for dirs in parts.values():
                # a dir like snap-000003/delta/__part=visited is rooted at
                # its snapshot dir; keep the whole root referenced
                referenced.update(d.split("/", 1)[0] for d in dirs)
        # Publish the trimmed manifest BEFORE deleting data: a crash
        # mid-vacuum then leaves orphan dirs (collected by the next vacuum)
        # instead of manifest entries referencing deleted dirs.
        meta["snapshots"] = [e for e in meta["snapshots"] if e["id"] in kept_ids]
        self._store_meta(table, meta)
        deleted = []
        table_dir = os.path.join(self.root, table)
        for name in sorted(os.listdir(table_dir)):
            if not name.startswith("snap-"):
                continue
            if name in referenced:
                continue
            shutil.rmtree(os.path.join(table_dir, name))
            deleted.append(name)
        return deleted

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
