"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q10_returned_items",
    "q18_large_volume_customer",
    "window_topk_per_group",
    "join_asof",
    "join_range_banded",
    "agg_cube",
    "dedup_exact_hash",
    "dedup_minhash_lsh",
    "sim_topk_bruteforce",
    "text_token_frequencies",
    "json_from_json_agg",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from datafusion_iceberg_spark import registry
    from datafusion_iceberg_spark.session import get_spark

    registry.load_all_modules()
    spark = get_spark("bench")

    # Warm the JVM/scan path once (excluded from timings).
    registry.QUERIES["q6_revenue_forecast"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        t0 = time.perf_counter()
        # noop sink: full execution (scan→shuffle→operators), no driver
        # materialization skewing the measurement
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
