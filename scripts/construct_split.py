"""Split every bench key into plan-construction vs execution time.

Construction = the fn(spark, sf_dir) call (driver-side DataFrame
building: py4j traffic, collects inside driver loops, checkpoint
builds); execution = the noop save. Keys whose construction share is
high are py4j/driver-loop optimization targets.

Usage: python scripts/construct_split.py [key ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench as B  # noqa: E402
from capture_plans import all_bench_fns, build_variant_registry  # noqa: E402
from picoprobedataflow_spark.session import get_spark  # noqa: E402


def main() -> None:
    only = set(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="construct-split")
    fns, _ = all_bench_fns(spark)
    fns.update(build_variant_registry())
    from picoprobedataflow_spark.plans.common import tbl
    for t in ("events", "lineitem", "orders", "documents", "embeddings"):
        B.run_query(tbl(spark, sf_dir, t).limit(1))
    names = sorted(fns) if not only else [n for n in sorted(fns) if n in only]
    for name in names:
        try:
            B.run_query(fns[name](spark, "/root/testdata/sf0.001"))
        except Exception:
            pass
    spark.catalog.clearCache()
    rows = []
    for name in names:
        best = None
        for _ in range(3):
            try:
                t0 = time.perf_counter()
                df = fns[name](spark, sf_dir)
                t1 = time.perf_counter()
                B.run_query(df)
                t2 = time.perf_counter()
            except Exception as exc:  # noqa: BLE001
                print(f"SKIP {name}: {exc!r}", file=sys.stderr)
                break
            spark.catalog.clearCache()
            if best is None or (t2 - t0) < sum(best):
                best = (t1 - t0, t2 - t1)
        if best:
            rows.append((name, best[0], best[1]))
    rows.sort(key=lambda r: -r[1])
    print(f"{'key':35s} {'construct':>9s} {'exec':>7s} {'c%':>4s}")
    for name, c, e in rows:
        print(f"{name:35s} {c:9.3f} {e:7.3f} {100*c/(c+e):3.0f}%")
    spark.stop()


if __name__ == "__main__":
    main()
