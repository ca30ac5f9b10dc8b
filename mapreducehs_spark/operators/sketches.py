"""Mergeable frequency sketches (Misra-Gries heavy hitters).

The reference's Reducer (``src/Core/MapReduceC.hs:26``) materializes the
full per-key value list before reducing — a frequency count over 100 TB
of tokens would shuffle every token occurrence.  The scale-correct
design is a *mergeable summary*: each input partition compresses its
token stream into a bounded sketch (map-side), and only sketch entries
cross the shuffle.

Misra-Gries(c) guarantees: every term with true frequency
``> N / (c + 1)`` survives, and each reported count underestimates the
true count by at most ``N / (c + 1)`` (Misra & Gries 1982, "Finding
repeated elements"; merge rule from Agarwal et al. 2012, "Mergeable
summaries", PODS).  When ``c`` is at least the number of distinct terms
the sketch degenerates to an exact hash map and counts are exact — that
is the regime the DuckDB oracle checks; the bound itself is pinned in
unit tests with adversarial vocabularies.

Shuffle cost: O(partitions × groups × c) rows regardless of input size,
vs O(total tokens) for the naive explode→groupBy→count — at 100 TB with
c=64 this is the difference between a multi-TB shuffle and megabytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_add(sketch: dict[str, int], term: str, capacity: int) -> None:
    """Feed one occurrence (weight 1) into a Misra-Gries sketch, in place.

    Unit-weight only by design: the weighted variant must decrement by
    ``min(weight, min counter)`` and re-insert the remainder to keep
    the N/(c+1) bound, which the simple decrement-all step below does
    not do — so the parameter is not offered.
    """
    if term in sketch:
        sketch[term] += 1
    elif len(sketch) < capacity:
        sketch[term] = 1
    else:
        dead = []
        for t in sketch:
            sketch[t] -= 1
            if sketch[t] <= 0:
                dead.append(t)
        for t in dead:
            del sketch[t]


def _mg_merge(counts: pd.DataFrame, capacity: int) -> dict[str, int]:
    """Merge partial sketch entries (term, est) into one sketch.

    Summing entries then subtracting the (c+1)-th largest count from all
    (dropping non-positive) is the PODS'12 mergeable-summaries rule; it
    preserves the N/(c+1) error bound.
    """
    merged: dict[str, int] = {}
    for term, est in zip(counts["term"], counts["est"]):
        merged[term] = merged.get(term, 0) + int(est)
    if len(merged) > capacity:
        cut = sorted(merged.values(), reverse=True)[capacity]
        merged = {t: n - cut for t, n in merged.items() if n - cut > 0}
    return merged


def mg_topk_per_group(
    df: DataFrame,
    group_col: str,
    term_col: str,
    capacity: int = 64,
    k: int = 5,
) -> DataFrame:
    """Top-k frequent terms per group via partition-local Misra-Gries
    sketches + sketch merge — the bounded-shuffle heavy-hitters plan.

    Stage 1 (``mapInPandas``): one sketch per (input partition, group);
    emits ≤ capacity rows per pair.  Stage 2 (``applyInPandas`` per
    group): merge partial sketches, emit top-k by (est desc, term asc).
    Input need not be pre-partitioned by group.
    """
    cap = int(capacity)
    topk = int(k)

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sketches: dict[str, dict[str, int]] = {}
        for pdf in batches:
            for g, t in zip(pdf[group_col], pdf[term_col]):
                _mg_add(sketches.setdefault(g, {}), t, cap)
        rows = [
            (g, t, n) for g, sk in sketches.items() for t, n in sk.items()
        ]
        yield pd.DataFrame(rows, columns=[group_col, "term", "est"])

    partials = df.select(group_col, F.col(term_col).alias(term_col)).mapInPandas(
        partial, schema=f"{group_col} string, term string, est long"
    )

    def merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        sk = _mg_merge(pdf, cap)
        top = sorted(sk.items(), key=lambda kv: (-kv[1], kv[0]))[:topk]
        out = pd.DataFrame(top, columns=["term", "est"])
        out.insert(0, group_col, key[0])
        out["rank"] = range(1, len(out) + 1)
        return out

    return partials.groupBy(group_col).applyInPandas(
        merge, schema=f"{group_col} string, term string, est long, rank long"
    )
