"""Round-15 measurement harness (guide §1): per-query min-of-N timing via
the noop sink plus `.explain("formatted")` dumps.

    python tools/measure_r16.py <tag> [query ...]

Writes plans to plans/r16/<query>_<tag>.txt and timings to
/tmp/measure_r16_<tag>.json.  With no query list, measures every bench
HEADLINE query.  Warm-up mirrors bench.py (fixture builds and first-touch
scans excluded from the record).
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]

    from bench import HEADLINE
    from datafusion_iceberg_spark import registry
    from datafusion_iceberg_spark.session import get_spark

    registry.load_all_modules()
    if not names:
        names = list(HEADLINE)
    spark = get_spark("measure_r16")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    os.makedirs(os.path.join(REPO, "plans", "r16"), exist_ok=True)

    # Warm-up (mirrors bench.py): Python worker pool, JVM codegen, input
    # tables, fixture warehouses.
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from datafusion_iceberg_spark.session import cpus
    from datafusion_iceberg_spark.tables import TABLES, load_table

    @F.pandas_udf(T.LongType())
    def _warm(s):
        import numpy as np  # noqa: F401

        return s

    spark.range(cpus() * 4, numPartitions=cpus()).select(_warm("id")).write.format(
        "noop"
    ).mode("overwrite").save()
    registry.QUERIES["q6_revenue_forecast"](spark, sf_dir).collect()
    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    builds: dict[str, float] = {}
    for _pass in range(3):
        for name in names:
            fn = registry.QUERIES[name]
            spark.sparkContext.setJobDescription(f"r16[{tag}] {name}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            tb = time.perf_counter() - t0
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if _pass == 0:
                timings[name] = round(dt, 3)
                builds[name] = round(tb, 3)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                with open(
                    os.path.join(REPO, "plans", "r16", f"{name}_{tag}.txt"), "w"
                ) as fh:
                    fh.write(buf.getvalue())
            else:
                if dt < timings[name]:
                    timings[name] = round(dt, 3)
                builds[name] = round(min(builds[name], tb), 3)
            spark.sparkContext.setJobDescription(None)

    total = round(sum(timings.values()), 3)
    out = {
        "tag": tag,
        "sf_dir": sf_dir,
        "total": total,
        "timings": timings,
        "df_build_s": builds,
        "loadavg": list(os.getloadavg()),
    }
    path = f"/tmp/measure_r16_{tag}.json"
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    for name, dt in sorted(timings.items(), key=lambda kv: -kv[1]):
        print(f"{dt:8.3f}  (build {builds[name]:6.3f})  {name}")
    print(f"TOTAL {total:.3f}s over {len(timings)} queries -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
