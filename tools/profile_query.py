"""Profile one declared query: formatted plan + steady-state timing.

    python tools/profile_query.py q01_pricing_summary [sf_dir] [runs]

Prints the physical plan (pushed filters, exchanges, codegen spans are
what to read), then warm-up + median/min/max of `runs` noop-sink
executions — the loop to run after changing any operator, before
trusting bench.py's single-pass number.
"""
from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from mapreducehs_spark.plans.inspect import (
        broadcast_join_count,
        codegen_stage_count,
        exchange_count,
        formatted_plan,
        sort_merge_join_count,
    )
    from mapreducehs_spark.queries import QUERIES
    from mapreducehs_spark.session import get_spark

    spark = get_spark(app_name=f"profile_{name}")
    df = QUERIES[name](spark, sf_dir)
    print(formatted_plan(df))
    print(
        f"exchanges={exchange_count(df)} broadcast_joins={broadcast_join_count(df)} "
        f"sort_merge_joins={sort_merge_join_count(df)} codegen_spans={codegen_stage_count(df)}"
    )

    def once() -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    warm = once()
    ts = [once() for _ in range(runs)]
    print(
        f"warmup={warm:.3f}s median={statistics.median(ts):.3f}s "
        f"min={min(ts):.3f}s max={max(ts):.3f}s over {runs} runs at {sf_dir}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
