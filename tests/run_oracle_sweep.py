"""Ad-hoc oracle sweep: verify named gates (or all) against DuckDB at a
given SF dir, using the driver-equivalent compare.  Usage:

    python tests/run_oracle_sweep.py [sf_dir] [gate ...]

With no gates given, sweeps every registered gate.  Prints one line per
gate (ok/FAIL) and a summary; exit code 1 on any failure.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as m
    from oracle_compare import compare

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]

    spark = SparkSession.builder.master(
        "local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "32")
    ).getOrCreate()

    qs, oracles = m.queries(), m.oracle_sql()
    if not names:
        names = list(qs)

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "partsupp",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    n_ok = n_fail = 0
    fails = []
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not registered")
            continue
        t0 = time.perf_counter()
        try:
            compare(qs[name](spark, sf), con.sql(oracles[name]), name)
            dt = time.perf_counter() - t0
            print(f"ok   {name} ({dt:.1f}s)", flush=True)
            n_ok += 1
        except Exception as e:  # noqa: BLE001
            dt = time.perf_counter() - t0
            msg = str(e).splitlines()[0][:300]
            print(f"FAIL {name} ({dt:.1f}s): {msg}", flush=True)
            fails.append(name)
            n_fail += 1
    print(f"SUMMARY ok={n_ok} fail={n_fail} fails={fails}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
