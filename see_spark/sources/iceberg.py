"""Real Apache Iceberg backing for the snapshot-catalog interface.

``IcebergCatalog`` implements the same contract as
``catalog.SnapshotCatalog`` (read / commit / commit_delta / snapshot_meta /
rollback / vacuum / round checkpointing) over genuine Iceberg tables in a
local ``hadoop``-type catalog, so every pipeline call site and the storage
contract test suite run unchanged against either backend.

SANDBOX STATUS: this container ships no iceberg-spark-runtime jar and has
no network route to Maven (probed: repo1.maven.org does not resolve), so
the adapter cannot execute here — ``iceberg_available()`` reports why and
the parametrized contract tests skip with that reason. On any machine with
the jar (``spark.jars.packages=org.apache.iceberg:iceberg-spark-runtime-
4.0_2.13:<ver>`` or a local jar on the classpath), ``iceberg_session()``
builds a session with the extension + catalog wired and the same suite
runs for real.

Acquisition attempts (round 4, all failed — hard environmental blocker):

- ``spark-shell --packages org.apache.iceberg:iceberg-spark-runtime-
  4.0_2.13:1.10.0``: ivy resolution fails with "Host repo1.maven.org not
  found" and "Host repos.spark-packages.org not found" (DNS does not
  resolve); no cached artifact under ``~/.ivy2`` or ``~/.m2``.
- direct ``curl`` of https://repo1.maven.org/maven2/org/apache/iceberg/
  iceberg-spark-runtime-4.0_2.13/1.10.0/iceberg-spark-runtime-4.0_2.13-
  1.10.0.jar: exit without HTTP status (no route).
- ``pip download pyiceberg`` (for a non-JVM write path): "no versions
  found" — the package index is unreachable too.
- filesystem sweep: ``find / -name 'iceberg*jar'`` returns nothing.

Nothing vendorable exists in the image, so the real-Iceberg legs of the
storage contract remain the ``SEE_ICEBERG=1`` opt-in documented in
``tests/conftest.py`` — runnable unchanged wherever the jar exists.

Mapping of the stand-in's semantics onto Iceberg:

- snapshot ids       -> Iceberg's own snapshot ids (``<t>.snapshots``)
- commit meta        -> snapshot summary properties
  (``snapshot-property.see-meta`` write option, JSON-encoded)
- time-travel read   -> ``VERSION AS OF`` / ``snapshot-id`` read option
- rollback           -> ``CALL <cat>.system.rollback_to_snapshot``
- vacuum             -> ``CALL <cat>.system.expire_snapshots``
- commit_delta       -> partition-scoped ``DELETE WHERE`` + append for
  replaced partitions, plain append for appended rows. Iceberg makes each
  statement one atomic snapshot; the pair is NOT one transaction, so a
  crash between them is a torn round — exactly the case the round
  checkpoint + ``resume_point`` replay already covers for the stand-in
  (both backends share that recovery model).
- round checkpoint   -> the same ``_checkpoint.json`` file protocol,
  rooted in the warehouse dir (it is catalog-level state, not table data).
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from .tables import SCHEMAS

META_PROP = "see-meta"


def iceberg_available(spark: SparkSession) -> Optional[str]:
    """None if the Iceberg Spark runtime is loadable, else the reason."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return None
    except Exception:
        return (
            "iceberg-spark-runtime not on the classpath (no jar in this "
            "container and no network route to Maven)"
        )


def iceberg_session(
    warehouse: str,
    cores: int = 4,
    catalog_name: str = "local",
    app_name: str = "see_iceberg",
) -> SparkSession:
    """Session with the Iceberg extension + a hadoop catalog at
    ``warehouse``. Only callable where the runtime jar is present."""
    from ..session import get_spark

    return get_spark(
        cores=cores,
        app_name=app_name,
        extra_conf={
            "spark.sql.extensions": (
                "org.apache.iceberg.spark.extensions."
                "IcebergSparkSessionExtensions"
            ),
            f"spark.sql.catalog.{catalog_name}":
                "org.apache.iceberg.spark.SparkCatalog",
            f"spark.sql.catalog.{catalog_name}.type": "hadoop",
            f"spark.sql.catalog.{catalog_name}.warehouse": warehouse,
        },
    )


class IcebergCatalog:
    """Drop-in for ``SnapshotCatalog`` over real Iceberg tables."""

    def __init__(
        self,
        root: str,
        spark: SparkSession,
        catalog_name: str = "local",
        db: str = "see",
    ):
        reason = iceberg_available(spark)
        if reason:
            raise RuntimeError(f"IcebergCatalog unavailable: {reason}")
        self.root = root
        self.spark = spark
        self.catalog = catalog_name
        self.db = db
        os.makedirs(root, exist_ok=True)
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog_name}.{db}")

    def _name(self, table: str) -> str:
        return f"{self.catalog}.{self.db}.{table}"

    def _ensure(self, table: str) -> None:
        if not self.spark.catalog.tableExists(self._name(table)):
            empty = self.spark.createDataFrame([], SCHEMAS[table])
            empty.writeTo(self._name(table)).create()

    # ---- snapshots -----------------------------------------------------
    def _snapshots(self, table: str) -> list:
        try:
            rows = self.spark.sql(
                f"SELECT snapshot_id, summary FROM "
                f"{self._name(table)}.snapshots ORDER BY committed_at"
            ).collect()
        except Exception:
            return []
        return [(r["snapshot_id"], dict(r["summary"] or {})) for r in rows]

    def current_snapshot(self, table: str) -> Optional[int]:
        snaps = self._snapshots(table)
        return snaps[-1][0] if snaps else None

    def snapshot_meta(self, table: str, snapshot: Optional[int] = None) -> dict:
        for sid, summary in reversed(self._snapshots(table)):
            if snapshot is None or sid == snapshot:
                raw = summary.get(META_PROP)
                return json.loads(raw) if raw else {}
        return {}

    # ---- read ----------------------------------------------------------
    def read(self, table: str, snapshot: Optional[int] = None) -> DataFrame:
        self._ensure(table)
        reader = self.spark.read
        if snapshot is not None:
            reader = reader.option("snapshot-id", str(snapshot))
        return reader.table(self._name(table))

    # ---- write ---------------------------------------------------------
    def commit(self, table: str, df: DataFrame, meta: Optional[dict] = None) -> int:
        self._ensure(table)
        cols = [f.name for f in SCHEMAS[table].fields]
        (
            df.select(*cols)
            .write.format("iceberg")
            .mode("overwrite")
            .option(f"snapshot-property.{META_PROP}", json.dumps(meta or {}))
            .save(self._name(table))
        )
        return self.current_snapshot(table)

    def commit_delta(
        self,
        table: str,
        partition_col: Optional[str] = None,
        replaced: Optional[dict] = None,
        appended: Optional[DataFrame] = None,
        meta: Optional[dict] = None,
    ) -> int:
        self._ensure(table)
        cols = [f.name for f in SCHEMAS[table].fields]
        name = self._name(table)
        meta_opt = (f"snapshot-property.{META_PROP}", json.dumps(meta or {}))
        to_append = None
        for value, df in (replaced or {}).items():
            self.spark.sql(
                f"DELETE FROM {name} WHERE {partition_col} = '{value}'"
            )
            to_append = (
                df.select(*cols)
                if to_append is None
                else to_append.unionByName(df.select(*cols))
            )
        if appended is not None:
            to_append = (
                appended.select(*cols)
                if to_append is None
                else to_append.unionByName(appended.select(*cols))
            )
        if to_append is not None:
            (
                to_append.write.format("iceberg")
                .mode("append")
                .option(*meta_opt)
                .save(name)
            )
        return self.current_snapshot(table)

    def rollback(self, table: str, snapshot: Optional[int]) -> None:
        if snapshot is None:
            # pre-first-commit: truncate (the stand-in's empty-read analog)
            self.spark.sql(f"DELETE FROM {self._name(table)} WHERE true")
            return
        self.spark.sql(
            f"CALL {self.catalog}.system.rollback_to_snapshot"
            f"('{self.db}.{table}', {snapshot})"
        )

    def vacuum(self, table: str, keep_snapshots: int = 2) -> list:
        self.spark.sql(
            f"CALL {self.catalog}.system.expire_snapshots"
            f"(table => '{self.db}.{table}', retain_last => {keep_snapshots})"
        )
        return []  # Iceberg reports file counts, not dir names

    # ---- round checkpointing (same file protocol as the stand-in) ------
    CHECKPOINT = "_checkpoint.json"

    def commit_round(self, round_no: int, extra: Optional[dict] = None) -> None:
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
        last = self.last_committed_round()
        for table in SCHEMAS:
            good = None
            for sid, summary in self._snapshots(table):
                raw = summary.get(META_PROP)
                m = json.loads(raw) if raw else {}
                if m.get("round", -1) <= last:
                    good = sid
            if good is not None and good != self.current_snapshot(table):
                self.rollback(table, good)
        return last + 1
