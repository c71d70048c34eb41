"""Standing full-catalog correctness audit at sf0.1 — 10× the
driver's sf0.01 gate.

Round 7 ran this by hand and it caught two REAL scale-dependent bugs
the sf0.01 gate could never see (connected-components exiting before
the fixpoint past diameter 25; half-way 4-dp rounding splitting
between engines). This script codifies that audit so every round pays
the 10× check with one command: run every cataloged query on Spark
AND its DuckDB oracle at the given SF dir (default /root/testdata/
sf0.1), compare exactly the way the driver does (column names, row
count, order-insensitive normalized values), and print one JSON line::

    {"sf_dir": ..., "n": N, "green": G, "rows_only": R,
     "failed": {name: reason, ...}, "sec": total_wall}

Exit status 0 iff nothing failed. Oracle-less entries get the
driver's weaker rows>=0 check and are counted in ``rows_only``.

Usage: python scripts/audit_sf01.py [sf_dir]
Pytest twin: SPARK_GRAFT_SLOW=1 SPARK_GRAFT_ORACLE_SF_DIR=/root/testdata/sf0.1 \
    python -m pytest tests/test_catalog_oracle.py -q -m slow
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from picoprobedataflow_spark.plans import catalog  # noqa: E402
from picoprobedataflow_spark.session import get_spark  # noqa: E402
from tests.conftest import (  # noqa: E402
    assert_matches_oracle, make_duck)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="audit-sf01", master=f"local[{cpus}]",
                      extra_conf={"spark.sql.shuffle.partitions": cpus})
    con = make_duck(sf_dir)
    specs = catalog.specs()
    failed: dict[str, str] = {}
    green = rows_only = 0
    t0 = time.time()
    for name, spec in sorted(specs.items()):
        try:
            df = spec.fn(spark, sf_dir)
            if spec.oracle is None:
                assert df.count() >= 0
                rows_only += 1
            else:
                assert_matches_oracle(df, con, spec.oracle)
                green += 1
            print(f"  ok    {name}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — audit must finish
            failed[name] = f"{type(e).__name__}: {e}"[:400]
            print(f"  FAIL  {name}: {failed[name][:120]}",
                  file=sys.stderr)
            traceback.print_exc(limit=3, file=sys.stderr)
    out = {"sf_dir": sf_dir, "n": len(specs), "green": green,
           "rows_only": rows_only, "failed": failed,
           "sec": round(time.time() - t0, 1)}
    print(json.dumps(out))
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
