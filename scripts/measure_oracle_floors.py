"""Measure the DuckDB memory floor of the two ``llm_curation_suite*``
oracles and of each member family — the table behind suite placement.

Round 12 learned (COVERAGE.md round-12 notes) that every family's
oracle passes alone at 100 MB but the UNION holds them concurrently,
so suite membership is a memory-budget decision: the driver sandbox's
DuckDB envelope is ~500 MB and the round-12 split left suite 1 at a
measured ~330 MB floor vs suite 2's ~150 MB. VERDICT r12 "Next round
#1" asks for the per-family floors to be MEASURED and recorded so
placing the next family is a table lookup, not a rediscovery. This
script is that measurement:

  python scripts/measure_oracle_floors.py [sf_dir] [--families]

For each target (both suite unions always; each family with
``--families``) it bisects DuckDB's ``memory_limit`` over a fixed
ladder and reports the lowest rung at which the oracle completes
(spilling disabled: ``temp_directory`` unset + in-memory connection
means DuckDB raises OutOfMemoryException instead of spilling, the
same behavior as the driver's sandbox cgroup kill, but recoverable).
Prints one JSON line::

    {"sf_dir": ..., "suites": {"llm_curation_suite": MB, ...},
     "families": {"bm25": MB, ...}, "ladder": [...], "sec": S}
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from picoprobedataflow_spark.plans import catalog  # noqa: E402
from picoprobedataflow_spark.plans import pipeline as P  # noqa: E402
from tests.conftest import TABLES  # noqa: E402

# Memory-limit rungs (MB). Floors are reported as the lowest rung
# that PASSES, so the resolution is the gap between adjacent rungs.
LADDER = [48, 64, 96, 128, 160, 200, 240, 280, 330, 360, 400, 450,
          500, 575, 650, 800]


def _connect(sf_dir: str, limit_mb: int) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()  # in-memory: no temp spill directory
    con.execute(f"SET memory_limit='{limit_mb}MB'")
    # Forbid disk spill so the floor means "peak working set", the
    # quantity the sandbox envelope constrains.
    con.execute("SET temp_directory=''")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def floor_mb(sql: str, sf_dir: str) -> int | None:
    """Lowest ladder rung at which ``sql`` completes, or None if even
    the top rung fails."""
    lo, hi = 0, len(LADDER) - 1
    # Quick check: does the top rung pass at all?
    if not _passes(sql, sf_dir, LADDER[hi]):
        return None
    while lo < hi:
        mid = (lo + hi) // 2
        if _passes(sql, sf_dir, LADDER[mid]):
            hi = mid
        else:
            lo = mid + 1
    return LADDER[lo]


def _passes(sql: str, sf_dir: str, limit_mb: int) -> bool:
    con = _connect(sf_dir, limit_mb)
    try:
        con.sql(sql).fetchall()
        return True
    except duckdb.OutOfMemoryException:
        return False
    # Any NON-memory error (binder error, broken new oracle, missing
    # table) must propagate, not masquerade as "exceeds every rung" —
    # a None floor from a typo would write a phantom memory number
    # into COVERAGE.md's placement table (round-13 review find).
    finally:
        con.close()


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    do_families = "--families" in sys.argv

    specs = catalog.specs()
    t0 = time.time()
    suites: dict[str, int | None] = {}
    for name in ("llm_curation_suite", "llm_curation_suite2",
                 "llm_curation_suite3"):
        suites[name] = floor_mb(specs[name].oracle, sf_dir)
        print(f"  suite {name}: {suites[name]} MB", file=sys.stderr)

    families: dict[str, int | None] = {}
    if do_families:
        for fam, sql in sorted(P.family_oracles().items()):
            families[fam] = floor_mb(sql, sf_dir)
            print(f"  family {fam}: {families[fam]} MB",
                  file=sys.stderr)

    print(json.dumps({
        "sf_dir": sf_dir, "suites": suites, "families": families,
        "ladder": LADDER, "sec": round(time.time() - t0, 1)}))


if __name__ == "__main__":
    main()
