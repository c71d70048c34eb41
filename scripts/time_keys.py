"""Time individual bench keys with the bench's methodology (untimed
sf0.001 warmup, N reps through the noop sink with clearCache between,
report min/median/all). For intra-round A/B measurements only — the
official numbers stay bench.py's.

Usage: python scripts/time_keys.py key1 key2 ... [--reps N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402
from capture_plans import all_bench_fns, build_variant_registry  # noqa: E402
from picoprobedataflow_spark.session import get_spark  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="time-keys")
    fns, _ = all_bench_fns(spark)
    fns.update(build_variant_registry())
    from picoprobedataflow_spark.plans.common import tbl
    for t in ("events", "lineitem", "orders", "documents", "embeddings"):
        B.run_query(tbl(spark, sf_dir, t).limit(1))
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in args:
        try:
            B.run_query(fns[name](spark, warm_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"warmup {name} failed: {exc!r}", file=sys.stderr)
    spark.catalog.clearCache()
    for name in args:
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            B.run_query(fns[name](spark, sf_dir))
            times.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        print(f"{name}: min={min(times)} all={times}")
    spark.stop()


if __name__ == "__main__":
    main()
