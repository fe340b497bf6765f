"""Partition-aware snapshot commits (SnapshotCatalog.commit_delta): the
sandbox stand-in for Iceberg MERGE INTO. Pins the scale property VERDICT
demanded: round-commit I/O is O(changed rows) — an unchanged partition's
data files are carried forward byte-identical (never rewritten), appends
write only the delta, and a flat snapshot migrates once."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from see_spark.sources.catalog import SnapshotCatalog


@pytest.fixture()
def catalog(spark):
    return SnapshotCatalog(tempfile.mkdtemp(prefix="see_delta_"), spark)


def _frontier_rows(spark, rows):
    """rows: [(url, state)] -> frontier-schema DF."""
    return spark.createDataFrame(
        [
            (u, hash(u), "h.test", 0, i, s, None, 0, None, None, None)
            for i, (u, s) in enumerate(rows)
        ],
        "url string, url_hash long, host string, depth int, seq long, "
        "state string, detail string, discovered_in_round int, "
        "fetched_in_round int, fetch_order long, checkout_round int",
    )


def _data_files(catalog, table):
    """{relative parquet file path: (size, mtime)} across the table dir."""
    out = {}
    base = os.path.join(catalog.root, table)
    for dirpath, _, files in os.walk(base):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                st = os.stat(p)
                out[os.path.relpath(p, base)] = (st.st_size, st.st_mtime_ns)
    return out


def test_replace_append_carry_forward(spark, catalog):
    catalog.commit_delta(
        "frontier", partition_col="state",
        replaced={"unvisited": _frontier_rows(spark, [("a", "unvisited"),
                                                      ("b", "unvisited")])},
    )
    catalog.commit_delta(
        "frontier", partition_col="state",
        replaced={"unvisited": _frontier_rows(spark, [("b", "unvisited")])},
        appended=_frontier_rows(spark, [("a", "visited")]),
    )
    got = {(r["url"], r["state"]) for r in catalog.read("frontier").collect()}
    assert got == {("a", "visited"), ("b", "unvisited")}


def test_unchanged_partition_files_untouched(spark, catalog):
    """The core O(changed) property: committing a round that only touches
    'unvisited' leaves the 'visited' partition's files byte-identical
    (same paths, sizes, mtimes — carried forward by manifest reference)."""
    catalog.commit_delta(
        "frontier", partition_col="state",
        replaced={"unvisited": _frontier_rows(spark, [("a", "unvisited")])},
        appended=_frontier_rows(spark, [("v1", "visited"), ("v2", "visited")]),
    )
    visited_dirs = catalog.parts("frontier")["visited"]
    before = {
        p: s for p, s in _data_files(catalog, "frontier").items()
        if any(p.startswith(d) for d in visited_dirs)
    }
    assert before  # the visited partition has real files

    catalog.commit_delta(
        "frontier", partition_col="state",
        replaced={"unvisited": _frontier_rows(spark, [("c", "unvisited")])},
    )
    assert catalog.parts("frontier")["visited"] == visited_dirs
    after = {
        p: s for p, s in _data_files(catalog, "frontier").items()
        if any(p.startswith(d) for d in visited_dirs)
    }
    assert after == before
    got = {(r["url"], r["state"]) for r in catalog.read("frontier").collect()}
    assert got == {("c", "unvisited"), ("v1", "visited"), ("v2", "visited")}


def test_flat_snapshot_migrates_once(spark, catalog):
    """A plain commit() snapshot (tests/bench bootstrap path) splits into
    per-state partitions on the first delta commit, preserving contents."""
    catalog.commit(
        "frontier",
        _frontier_rows(spark, [("a", "unvisited"), ("v", "visited"),
                               ("e", "error")]),
    )
    catalog.commit_delta(
        "frontier", partition_col="state",
        replaced={"unvisited": _frontier_rows(spark, [("b", "unvisited")])},
        appended=_frontier_rows(spark, [("a", "visited")]),
    )
    parts = catalog.parts("frontier")
    assert "__all__" not in parts
    assert set(parts) >= {"unvisited", "visited", "error"}
    got = {(r["url"], r["state"]) for r in catalog.read("frontier").collect()}
    assert got == {("b", "unvisited"), ("a", "visited"), ("v", "visited"),
                   ("e", "error")}


def test_empty_replacement_partition_reads_back_empty(spark, catalog):
    catalog.commit_delta(
        "frontier", partition_col="state",
        replaced={"unvisited": _frontier_rows(spark, [("a", "unvisited")])},
    )
    catalog.commit_delta(
        "frontier", partition_col="state",
        replaced={"unvisited": _frontier_rows(spark, []).limit(0)},
        appended=_frontier_rows(spark, [("a", "visited")]),
    )
    got = {(r["url"], r["state"]) for r in catalog.read("frontier").collect()}
    assert got == {("a", "visited")}


def test_append_only_table_without_partition_col(spark, catalog):
    d1 = spark.createDataFrame(
        [("u1", "t1", [], 0)],
        "doc_id string, title string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
        "fetched_in_round int",
    )
    d2 = d1.select(F.lit("u2").alias("doc_id"), "title", "spans",
                   "fetched_in_round")
    catalog.commit_delta("docs", appended=d1)
    files_after_first = _data_files(catalog, "docs")
    catalog.commit_delta("docs", appended=d2)
    assert {r["doc_id"] for r in catalog.read("docs").collect()} == {"u1", "u2"}
    # the first append's files are untouched by the second
    now = _data_files(catalog, "docs")
    assert all(now[p] == s for p, s in files_after_first.items())


def test_compaction_bounds_dir_count(spark, catalog, monkeypatch):
    monkeypatch.setattr(SnapshotCatalog, "COMPACT_AFTER", 3)
    for i in range(6):
        catalog.commit_delta(
            "frontier", partition_col="state",
            appended=_frontier_rows(spark, [(f"v{i}", "visited")]),
        )
    assert len(catalog.parts("frontier")["visited"]) <= 4
    got = {r["url"] for r in catalog.read("frontier").collect()}
    assert got == {f"v{i}" for i in range(6)}


def test_compact_agg_folds_increment_rows(spark, catalog, monkeypatch):
    """Increment tables (hoststats, word_stats) compact through an
    aggregation: row count drops to O(keys) while the decomposable
    aggregate view (max/sum) is unchanged."""
    from see_spark.operators.crawl import hoststats_agg

    monkeypatch.setattr(SnapshotCatalog, "COMPACT_AFTER", 3)
    for rnd in range(6):
        inc = spark.createDataFrame(
            [(f"h{i}", rnd, 2) for i in range(4)],
            "host string, last_fetch_round int, fetched_total long",
        )
        catalog.commit_delta(
            "hoststats", appended=inc, compact_agg=hoststats_agg
        )
    # compaction fired at least once -> far fewer than 6 rounds x 4 rows
    assert catalog.read("hoststats").count() < 24
    got = {
        (r["host"], r["last_fetch_round"], r["fetched_total"])
        for r in hoststats_agg(catalog.read("hoststats")).collect()
    }
    assert got == {(f"h{i}", 5, 12) for i in range(4)}


def test_vacuum_deletes_unreferenced_snapshots_only(spark, catalog):
    """vacuum keeps the newest N manifests and every data dir they
    reference (delta snapshots share dirs across manifests), deletes the
    rest, and the table still reads back exactly."""
    import os

    catalog.commit_delta(
        "frontier", partition_col="state",
        replaced={"unvisited": _frontier_rows(spark, [("a", "unvisited")])},
        appended=_frontier_rows(spark, [("v0", "visited")]),
    )
    for i in range(1, 4):
        catalog.commit_delta(
            "frontier", partition_col="state",
            replaced={"unvisited": _frontier_rows(spark, [(f"u{i}", "unvisited")])},
        )
    deleted = catalog.vacuum("frontier", keep_snapshots=2)
    # snaps 2,3 replaced unvisited and are expired; snap 1 holds the
    # still-referenced visited append and must survive
    assert "snap-000002" in deleted and "snap-000001" not in deleted
    table_dir = os.path.join(catalog.root, "frontier")
    assert not os.path.exists(os.path.join(table_dir, "snap-000002"))
    got = {(r["url"], r["state"]) for r in catalog.read("frontier").collect()}
    assert got == {("u3", "unvisited"), ("v0", "visited")}


def test_torn_commit_replay_reads_replayed_snapshot(spark, catalog):
    """Crash between table commits: the torn snapshot's manifest entry is
    superseded when the replayed round re-commits the same id — reads must
    resolve the REPLAYED files, not the stale first-match entry."""
    catalog.commit_delta(
        "frontier", partition_col="state",
        replaced={"unvisited": _frontier_rows(spark, [("good", "unvisited")])},
        meta={"round": 1},
    )
    good = catalog.current_snapshot("frontier")
    catalog.commit_delta(
        "frontier", partition_col="state",
        replaced={"unvisited": _frontier_rows(spark, [("torn", "unvisited")])},
        meta={"round": 2},
    )
    catalog.rollback("frontier", good)
    catalog.commit_delta(
        "frontier", partition_col="state",
        replaced={"unvisited": _frontier_rows(spark, [("replayed", "unvisited")])},
        meta={"round": 2},
    )
    got = {r["url"] for r in catalog.read("frontier").collect()}
    assert got == {"replayed"}


def test_rollback_restores_old_manifest(spark, catalog):
    catalog.commit_delta(
        "frontier", partition_col="state",
        replaced={"unvisited": _frontier_rows(spark, [("a", "unvisited")])},
    )
    snap1 = catalog.current_snapshot("frontier")
    catalog.commit_delta(
        "frontier", partition_col="state",
        replaced={"unvisited": _frontier_rows(spark, [("b", "unvisited")])},
        appended=_frontier_rows(spark, [("a", "visited")]),
    )
    catalog.rollback("frontier", snap1)
    got = {(r["url"], r["state"]) for r in catalog.read("frontier").collect()}
    assert got == {("a", "unvisited")}


def test_resume_rolls_back_torn_host_quality(spark, catalog):
    """host_quality participates in SCHEMAS-driven resume: an increment
    committed for a round past the checkpoint is discarded by
    resume_point(), so replayed rounds never double-count evidence."""

    def _inc(host, n, s, rnd):
        catalog.commit_delta(
            "host_quality",
            appended=spark.createDataFrame(
                [(host, n, s)], "host string, n_docs long, sum_q_milli long"
            ),
            meta={"round": rnd},
        )

    _inc("h.test", 2, 40, 0)
    catalog.commit_round(0, {})
    _inc("h.test", 3, 9, 1)  # torn: round 1 content landed, frontier didn't
    assert catalog.resume_point() == 1
    rows = {
        (r["host"], r["n_docs"], r["sum_q_milli"])
        for r in catalog.read("host_quality").collect()
    }
    assert rows == {("h.test", 2, 40)}


def test_snapshot_diff(spark, catalog):
    s1 = catalog.commit(
        "frontier",
        _frontier_rows(spark, [("a", "unvisited"), ("b", "unvisited"),
                               ("c", "visited")]),
    )
    s2 = catalog.commit(
        "frontier",
        _frontier_rows(spark, [("a", "unvisited"), ("b", "visited"),
                               ("d", "unvisited")]),
    )
    got = {r["url"]: r["change"]
           for r in catalog.diff("frontier", s1, s2, ["url"]).collect()}
    # a's row is positionally identical in both snapshots (same seq,
    # same state) -> silent
    assert "a" not in got
    assert got["d"] == "added"
    assert got["c"] == "removed"
    assert got["b"] == "changed"


def test_snapshot_diff_identical_rows_silent(spark, catalog):
    rows = _frontier_rows(spark, [("a", "unvisited"), ("b", "visited")])
    s1 = catalog.commit("frontier", rows)
    s2 = catalog.commit("frontier", rows)
    assert catalog.diff("frontier", s1, s2, ["url"]).count() == 0
    # None = current snapshot (read()'s convention)
    assert catalog.diff("frontier", s1, None, ["url"]).count() == 0


def test_snapshot_diff_multiset_keys(spark, catalog):
    # duplicate key rows compare as multisets of row hashes
    one = _frontier_rows(spark, [("a", "unvisited")])
    two = _frontier_rows(spark, [("a", "unvisited"), ("a", "unvisited")])
    s1 = catalog.commit("frontier", one)
    s2 = catalog.commit("frontier", two)
    got = [r["change"]
           for r in catalog.diff("frontier", s1, s2, ["url"]).collect()]
    assert got == ["changed"]
