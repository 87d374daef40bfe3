"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {"q01_events_daily": sec, ...}, "sf": 0.1}

Each query executes its full plan to completion; results are drained with
count() on a cached-free plan (no collect of wide rows so driver transfer
doesn't pollute the measurement).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_MASTER", f"local[{cpus}]")

    import __spark_entry__ as se
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.session import (
        get_spark,
    )

    spark = get_spark("bench", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    queries = se.queries()
    # warm the JVM/codegen once with the flagship query so q01's number is
    # not inflated by session startup
    queries["q01_events_daily"](spark, sf_dir).count()

    times: dict[str, float] = {}
    for name, fn in sorted(queries.items()):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        times[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {times[name]:.3f}s ({n} rows)", file=sys.stderr)

    import re

    m = re.search(r"sf([0-9.]+)", os.path.basename(sf_dir.rstrip("/")))
    sf = float(m.group(1)) if m else 0.0
    out = {
        "metric": "total_query_sec",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
