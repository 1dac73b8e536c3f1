"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and, where an oracle
exists, the oracle SQL on DuckDB over the same parquet — compares row count,
column names, and an order-insensitive value multiset (stringified with
repr, doubles via exact repr so only bit-identical values match).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from gol_tool_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    out = []
    for r in rows:
        d = dict(zip(cols, r))
        out.append(tuple(repr(d[c]) for c in sorted(cols)))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    extra = {}
    if os.environ.get("SPARK_GRAFT_HOSTILE"):
        # driver-like hostile config: non-UTC session TZ — queries must be
        # timezone-independent to pass
        extra = {"spark.sql.session.timeZone": "America/New_York"}
    spark = get_spark("correctness-check", cpus=8, shuffle_partitions=16, extra_conf=extra)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {str(e).splitlines()[0][:200]}")
            continue
        if name not in oracles:
            print(f"ok~  {name}: rows={len(srows)} (rows-only, no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {str(e).splitlines()[0][:200]}")
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if not problems:
            sc, oc = canon(srows, scols), canon(orows, ocols)
            if sc != oc:
                diff = [i for i, (a, b) in enumerate(zip(sc, oc)) if a != b][:3]
                ex = [(sc[i], oc[i]) for i in diff]
                problems.append(f"values differ at {len([1 for a,b in zip(sc,oc) if a!=b])} rows, e.g. {ex[:1]}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"ok   {name}: rows={len(srows)} match [{time.time()-t0:.1f}s]")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL MATCH")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
