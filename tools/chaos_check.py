"""Batch fault-tolerance differential check.

The reference proves its scheduler correct by re-running pipelines
under a task runner that aborts 50% of task attempts and asserting the
answer is unchanged (reference ``src/ImplWorker.hs:88-96`` ``Drop``
runner, ``test/Test.hs:63-70`` failure-injection group).  Spark owns
task retry (``spark.task.maxFailures``), but the *discipline* — same
answer under failure injection — is worth re-testing on the new
engine, since a non-idempotent or non-deterministic kernel would break
exactly here.

This script runs in its own JVM because local mode defaults to
maxFailures=1 (first failure is fatal): master ``local[4, 2]`` grants
every task two attempts.  An Arrow-batched kernel raises on EVERY
task's first attempt (``TaskContext.attemptNumber() == 0``) — a 100%
first-attempt abort rate, strictly harsher than the reference's 50% —
and the rerun result must hash-equal the clean run.  An accumulator
incremented only on retry attempts proves the injection actually fired
(a scheduler that silently skipped work would also "match").

Prints one JSON line: {"match": bool, "retries": int, "rows": int}.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pyspark import TaskContext
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[4, 2]")
        .appName("chaos_check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    retry_acc = spark.sparkContext.accumulator(0)

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_quantity"
    )

    def kernel(inject: bool):
        def fn(batches):
            tc = TaskContext.get()
            if inject and tc.attemptNumber() == 0:
                raise RuntimeError("injected failure: first attempt always aborts")
            if inject and tc.attemptNumber() > 0:
                retry_acc.add(1)
            for pdf in batches:
                yield pdf.groupby("l_orderkey", as_index=False)["l_quantity"].sum()

        return fn

    schema = "l_orderkey long, l_quantity double"

    def run(inject: bool):
        return (
            li.repartition(8, "l_orderkey")
            .mapInPandas(kernel(inject), schema)
            .groupBy("l_orderkey")
            .agg(F.round(F.sum("l_quantity"), 4).alias("qty"))
            .orderBy("l_orderkey")
            .collect()
        )

    injected = run(True)
    retries = retry_acc.value
    clean = run(False)
    match = injected == clean
    print(json.dumps({"match": match, "retries": retries, "rows": len(injected)}))
    spark.stop()
    return 0 if (match and retries > 0 and len(injected) > 0) else 1


if __name__ == "__main__":
    sys.exit(main())
