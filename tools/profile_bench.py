"""Build/exec split profiler for the headline bench set (guide §1).

For each headline query (or the names passed on argv), times
separately, with bench.py's exact isolation protocol:
  - build: the `fn(spark, sf_dir)` call — driver-side plan
    construction, including any eager localCheckpoint jobs;
  - exec: the noop-sink write of the returned DataFrame.

One untimed warm pass, then best-of-two timed passes (same
methodology as bench.py). Prints one line per query plus a
total. Diagnostic only — the driver contract stays bench.py.

Usage: python tools/profile_bench.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from airflow_scraping_etl_tutorial_spark.functions.caching import (  # noqa: E402
    release_session_checkpoints,
    release_session_intermediates,
)
from airflow_scraping_etl_tutorial_spark.plans import all_queries  # noqa: E402
from airflow_scraping_etl_tutorial_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_bench")
    specs = all_queries()
    names = sys.argv[1:] or list(bench.HEADLINE)

    def run(name: str) -> tuple[float, float]:
        release_session_intermediates(spark, blocking=True)
        release_session_checkpoints(spark, blocking=True)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = specs[name].fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        return t1 - t0, t2 - t1

    rows = []
    for name in names:
        run(name)  # warm
        b1, e1 = run(name)
        b2, e2 = run(name)
        build, ex = min(b1, b2), min(e1, e2)
        rows.append((name, build, ex))
        print(f"{name:45s} build={build:7.3f}  exec={ex:7.3f}  total={build + ex:7.3f}", flush=True)
    tb = sum(r[1] for r in rows)
    te = sum(r[2] for r in rows)
    print(f"{'TOTAL':45s} build={tb:7.3f}  exec={te:7.3f}  total={tb + te:7.3f}")


if __name__ == "__main__":
    main()
