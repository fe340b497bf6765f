"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry against its
``oracle_sql()`` DuckDB equivalent on the same parquet tables and compares
row count, column names, and the exact multiset of rows (STRICTER than the
driver's order-insensitive value hash: floats must match bit-for-bit, so
any cross-engine float divergence surfaces here first).

Usage: python scripts/check_correctness.py [sf_dir] [query_name ...]
       python scripts/check_correctness.py --json OUT.json [sf_dir] [...]

``--json`` writes the per-query results (rows, status) to OUT.json —
the per-round full-extras artifact (CORRECTNESS_EXTRA_r{N}.json).
"""

from __future__ import annotations

import json
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c] if not isinstance(row, tuple) else row[cols.index(c)]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
            if isinstance(v, list):
                v = tuple(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("usage: check_correctness.py [--json OUT.json] [sf_dir] [query ...]")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    import __spark_entry__ as entry
    from see_spark.session import get_spark

    spark = get_spark(cores=8, shuffle_partitions=8, app_name="correctness")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)

    queries = {**entry.queries(), **entry.extra_queries()}
    oracles = {**entry.oracle_sql(), **entry.extra_oracle_sql()}
    failures, passes, weak = [], [], []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [r.asDict() for r in sdf.collect()]
        except Exception as exc:
            failures.append((name, f"spark error: {exc}"))
            print(f"FAIL {name}: spark error: {exc}")
            continue
        if name not in oracles:
            weak.append((name, len(srows)))
            print(f"weak {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:
            failures.append((name, f"duckdb error: {exc}"))
            print(f"FAIL {name}: duckdb error: {exc}")
            continue
        if sorted(scols) != sorted(ocols):
            failures.append((name, f"cols {sorted(scols)} != {sorted(ocols)}"))
            print(f"FAIL {name}: columns {sorted(scols)} vs {sorted(ocols)}")
            continue
        if len(srows) != len(orows):
            failures.append((name, f"rowcount {len(srows)} != {len(orows)}"))
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(orows)}")
            continue
        cols = sorted(scols)
        s_norm = normalize(srows, cols)
        o_norm = normalize([dict(zip(ocols, r)) for r in orows], cols)
        if s_norm != o_norm:
            bad = next(
                (i for i, (a, b) in enumerate(zip(s_norm, o_norm)) if a != b), None
            )
            failures.append((name, f"values differ at sorted idx {bad}"))
            print(f"FAIL {name}: first diff at {bad}:")
            print("  spark:", s_norm[bad] if bad is not None else None)
            print("  duck :", o_norm[bad] if bad is not None else None)
            continue
        passes.append(name)
        print(f"PASS {name} ({len(srows)} rows)")

    print(f"\n{len(passes)} pass, {len(weak)} rows-only, {len(failures)} FAIL")
    if json_out:
        results = {}
        for name in passes:
            results[name] = {"status": "pass"}
        for name, n in weak:
            results[name] = {"status": "rows_only", "rows": n}
        for name, err in failures:
            results[name] = {"status": "FAIL", "err": err}
        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_pass": len(passes),
                    "n_rows_only": len(weak),
                    "n_fail": len(failures),
                    "queries": results,
                },
                fh,
                indent=1,
            )
        print(f"wrote {json_out}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
