"""Round-14 optimization measurement harness (guide §1).

Times individual registry queries exactly the way bench.py does
(construct + execution through the JVM noop sink, best of N) and
optionally captures ``explain("formatted")`` for each — the isolation
tool behind OPTIMIZATION_r14.md's before/after figures.

Usage:
    python scripts/opt_measure.py all                 # every bench headline
    python scripts/opt_measure.py q1 q2 ...           # specific queries
    EXPLAIN_DIR=plans/r14 SUFFIX=_before python scripts/opt_measure.py q1
    REPS=3 python scripts/opt_measure.py q1

Prints one "name seconds" line per query (best-of-REPS) and a total.
Jobs are labelled (guide §1.5) so the UI/event logs stay readable.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from building_permissions_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("REPS", "2"))
EXPLAIN_DIR = os.environ.get("EXPLAIN_DIR")
SUFFIX = os.environ.get("SUFFIX", "")


def main() -> None:
    spark = get_spark(app_name="opt_measure", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")

    import bench
    import __spark_entry__ as entry_mod

    queries = dict(entry_mod.queries())
    for name, fn in bench._prod_twins().items():
        queries[name] = fn

    args = sys.argv[1:]
    if args == ["all"]:
        names = [n for n in bench.HEADLINE + bench.EXTENSION_HEADLINE
                 if n in queries] + list(bench._prod_twins())
    else:
        names = args

    # warmup (absorb JVM/codegen startup), same as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").write.format(
        "noop").mode("overwrite").save()

    timings: dict[str, float | None] = {}
    for name in names:
        if name not in queries:
            print(f"?? unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"opt_measure: {name}")
        best = None
        try:
            for _ in range(REPS):
                t0 = time.perf_counter()
                df = queries[name](spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
            timings[name] = round(best, 3)
            print(f"{name} {best:.3f}", flush=True)
            if EXPLAIN_DIR:
                os.makedirs(EXPLAIN_DIR, exist_ok=True)
                df = queries[name](spark, SF_DIR)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                with open(os.path.join(
                        EXPLAIN_DIR, f"{name}{SUFFIX}.txt"), "w") as f:
                    f.write(buf.getvalue())
        except Exception as exc:
            timings[name] = None
            print(f"{name} FAILED: {type(exc).__name__}: {str(exc)[:200]}",
                  file=sys.stderr, flush=True)
        finally:
            spark.sparkContext.setJobDescription(None)

    total = round(sum(t for t in timings.values() if t is not None), 3)
    print(json.dumps({"total": total,
                      "n": len([t for t in timings.values() if t is not None]),
                      "reps": REPS, "sf_dir": SF_DIR}))
    spark.stop()


if __name__ == "__main__":
    main()
