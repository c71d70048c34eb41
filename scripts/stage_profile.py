"""Per-stage profile of one bench key via the UI REST API.

Runs the key once (after warmup) with spark.ui.enabled=true, then
dumps every stage: name, duration, task count, shuffle read/write,
input bytes — the empirical half of guide §1.1 without a browser.

Usage: python scripts/stage_profile.py <key> [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench as B  # noqa: E402
from capture_plans import all_bench_fns, build_variant_registry  # noqa: E402
from picoprobedataflow_spark.session import get_spark  # noqa: E402


def main() -> None:
    key = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="stage-profile",
                      extra_conf={"spark.ui.enabled": "true"})
    fns, _ = all_bench_fns(spark)
    fns.update(build_variant_registry())
    from picoprobedataflow_spark.plans.common import tbl
    for t in ("events", "lineitem", "orders", "documents", "embeddings"):
        B.run_query(tbl(spark, sf_dir, t).limit(1))
    try:
        B.run_query(fns[key](spark, "/root/testdata/sf0.001"))
    except Exception:
        pass
    spark.catalog.clearCache()

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4040/api/v1/applications/{app_id}"

    def stages():
        with urllib.request.urlopen(f"{base}/stages") as r:
            return json.loads(r.read())

    before_ids = {s["stageId"] for s in stages()}
    for _ in range(reps):
        t0 = time.perf_counter()
        B.run_query(fns[key](spark, sf_dir))
        wall = time.perf_counter() - t0
        spark.catalog.clearCache()
        print(f"== rep wall={wall:.3f}s")
    rows = [s for s in stages() if s["stageId"] not in before_ids
            and s["status"] == "COMPLETE"]
    rows.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    total_run = sum(s.get("executorRunTime") or 0 for s in rows)
    print(f"stages={len(rows)} total executorRunTime={total_run}ms")
    for s in rows[:40]:
        dur = None
        if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
            pass
        print(f"  stage {s['stageId']} run={s.get('executorRunTime')}ms "
              f"tasks={s.get('numCompleteTasks')} "
              f"in={s.get('inputBytes')} sr={s.get('shuffleReadBytes')} "
              f"sw={s.get('shuffleWriteBytes')} "
              f"| {s['name'].splitlines()[0][:90]}")
    # job timeline
    with urllib.request.urlopen(f"{base}/jobs") as r:
        jobs = json.loads(r.read())
    jobs = [j for j in jobs if j["status"] != "RUNNING"]
    jobs.sort(key=lambda j: j["jobId"])
    print(f"jobs={len(jobs)}")
    from datetime import datetime

    def ts(x):
        return datetime.strptime(x[:23], "%Y-%m-%dT%H:%M:%S.%f")

    for j in jobs[-60:]:
        d = (ts(j["completionTime"]) - ts(j["submissionTime"])
             ).total_seconds()
        print(f"  job {j['jobId']} {d*1000:.0f}ms stages={len(j['stageIds'])} "
              f"{j['name'][:70]}")
    spark.stop()


if __name__ == "__main__":
    main()
