"""Time a list of queries at an arbitrary sf_dir (one JSON line + file).

The scale companion to bench.py: bench.py is the fixed per-round
headline at sf0.1; this tool measures the expensive tail at the
sf1-equivalent built by tools/make_sf.py, so the plan audit's
"near-linear at 10x" claim is observed, not argued.  Reference
discipline: measure, don't argue (reference test/Generator.hs:83-92).

Usage:
  python tools/scale_run.py <sf_dir> <q1,q2,...> [out_json]

Prints {"sf_dir": ..., "calib_sec": ..., "queries": {name: sec}} and
writes the same JSON to out_json (default /tmp/scale_run.json).  Same
methodology as bench.py: noop sink, Python-worker pre-spawn, full
untimed warm-up pass, median of 3, calibration probe first.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    out_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale_run.json"

    from bench import CPUS, calibration

    from mapreducehs_spark.queries import QUERIES
    from mapreducehs_spark.session import get_spark

    spark = get_spark(app_name="mapreducehs_scale_run", master=f"local[{CPUS}]")
    calib = calibration(spark)

    spark.range(0, 1024, 1, int(CPUS)).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in names:  # untimed warm-up (JIT, parquet footers)
        run(name)
    spark.catalog.clearCache()

    timings = {name: round(statistics.median(run(name) for _ in range(3)), 4) for name in names}
    out = {
        "sf_dir": sf_dir,
        **calib,
        "total": round(sum(timings.values()), 4),
        "queries": timings,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
