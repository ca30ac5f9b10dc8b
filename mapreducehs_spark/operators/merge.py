"""MERGE/upsert without a table format: the CDC-apply operator.

Lakehouse formats (Delta/Iceberg) expose this as ``MERGE INTO``; on
plain parquet the same semantics are one relational operator: updates
win over base per key, tombstones delete, new keys insert.  The
reference could express this as a Reducer over the tagged union of
base+updates (pick highest-priority row per key, reference
``src/Core/MapReduceC.hs:26``) — which is exactly the lowering used
here: union → per-key window → keep rank 1.

Scale shape: ONE shuffle keyed on the merge key (the window), linear in
|base| + |updates|.  At 100 TB write the base bucketed on the merge key
(``sources.catalog.write_bucketed``) so the nightly CDC apply reuses
the on-disk partitioning instead of re-shuffling the whole base; with a
lakehouse format the same logic gets file-level skipping on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    delete_col: str | None = None,
) -> DataFrame:
    """Apply ``updates`` onto ``base`` by ``keys``.

    - key in both            → the update row replaces the base row
    - key only in updates    → inserted
    - key only in base       → kept
    - update row with ``delete_col`` true → key removed (tombstone)

    ``updates`` must contain all of ``base``'s columns (plus the
    optional tombstone column); at most one update row per key.
    """
    cols = base.columns
    tagged_base = base.select(*cols).withColumn("__prio", F.lit(0)).withColumn(
        "__del", F.lit(False)
    )
    del_flag = (
        F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
        if delete_col is not None
        else F.lit(False)
    )
    tagged_updates = (
        updates.withColumn("__del", del_flag)
        .select(*cols, "__del")
        .withColumn("__prio", F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(F.col("__prio").desc())
    return (
        tagged_base.unionByName(tagged_updates)
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & ~F.col("__del"))
        .select(*cols)
    )
