"""Derive a deliberately SKEWED variant of an sf1 dataset (round 6).

The uniform generator cannot produce the adversarial distributions that
break plans at 100 TB, so the sf1 scale posture (SCALE.md) is measured
on benign data.  This tool plants the three classic hot spots VERDICT
r05 asked for, each targeting a specific mitigation already in the
plans:

- HOT USER (events): ~1% of all events re-assigned to user_id 0 —
  stresses sessionization / per-user windows / funnel state (q23, q52,
  q69, q115) and the salted-aggregation paths (q35, q85: AQE skew
  splitting + explicit salting).
- HOT TOKEN (documents): the token ``thehot`` prepended to every 8th
  document — stresses token aggregations (t01, t04, q71's Misra-Gries
  exact regime) and the df-ranked prefix-filter index (d18, whose
  max_shingle_df guard exists exactly for this).
- HOT DUPLICATE CLASS (documents): every 100th document's text replaced
  with document 0's text — one duplicate class with ~1% of the corpus,
  stressing LSH band buckets (d03/d11: bounded by candidates-then-
  verify), the drop-list composition (d07/d15), and the multimodal
  contraction (m11/m12: identical content → identical hash → the
  round-6 exact-dup contraction must absorb it without a quadratic
  pair stage).
- HOT SOURCE (documents, round 11): every 3rd document re-assigned to
  source 'src0', so one source holds ~1/3 of the corpus — stresses
  every per-source ranking/rollup (t34's terciles, t49's deciles,
  t55's curriculum, t31/t42's per-source sampling): a bare
  PARTITION BY source window would put a third of the corpus on ONE
  task, which is exactly what the grouped prefix-sum seam exists to
  avoid; the skew pair measures that claim instead of arguing it.

The orders-keyed lakehouse folds (q117/q123/q124/q125/st32) get NO
skew transform BY CONTRACT: their log law synthesizes at most one
version per (key, commit-seq) — the Kafka-compacted-topic guarantee
st32's replay asserts — so per-key multiplicity is bounded by the
number of commits, not by data skew; re-keying orders would fabricate
an input the CDC contract forbids.  They ARE swept on the skewed dir
(hard-linked orders) so their walls land in the same artifact.

Only ``events`` and ``documents`` are rewritten; all other tables are
hard-linked (content-identical).  Transforms are deterministic (keyed
on row ids), so reruns are reproducible and DuckDB oracles replay the
same skewed inputs — correctness stays checkable under skew, not just
timing.

Usage: python tools/make_skew.py [out_dir] [src_dir]
       (defaults: /tmp/sf1skew /tmp/sf1)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def skew_events(src: str, dst: str) -> None:
    t = pq.read_table(src)
    user = t.column("user_id").to_numpy(zero_copy_only=False).copy()
    n = len(user)
    hot = np.arange(n) % 100 == 7  # ~1% of events, deterministic
    user[hot] = 0
    cols = {name: t.column(name) for name in t.schema.names}
    cols["user_id"] = pa.array(user, type=t.schema.field("user_id").type)
    pq.write_table(pa.table(cols), dst)
    print(f"events: {n:,} rows, {int(hot.sum()):,} re-assigned to user 0")


def skew_documents(src: str, dst: str, dup_every: int = 100) -> None:
    t = pq.read_table(src)
    doc_id = t.column("doc_id").to_numpy(zero_copy_only=False)
    text = t.column("text").to_pylist()
    source = t.column("source").to_pylist()
    n = len(text)
    dmin = int(doc_id.min())
    base = text[int(np.argmin(doc_id))]  # document with the minimum id
    n_dup = n_hot = n_src = 0
    for i in range(n):
        if doc_id[i] != dmin and doc_id[i] % dup_every == 13 % dup_every:
            text[i] = base  # hot duplicate class (~1%)
            n_dup += 1
        elif doc_id[i] % 8 == 3:
            text[i] = "thehot " + text[i]  # hot token (~12.5% of docs)
            n_hot += 1
        if doc_id[i] % 3 == 1:
            source[i] = "src0"  # hot source (~1/3 of the corpus)
            n_src += 1
    cols = {name: t.column(name) for name in t.schema.names}
    cols["text"] = pa.array(text, type=pa.string())
    cols["source"] = pa.array(source, type=t.schema.field("source").type)
    cols["n_chars"] = pa.array(
        [len(s) for s in text], type=t.schema.field("n_chars").type
    )
    pq.write_table(pa.table(cols), dst)
    print(
        f"documents: {n:,} rows, {n_dup:,} hot-dup, {n_hot:,} hot-token, "
        f"{n_src:,} hot-source"
    )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1skew"
    src = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    # optional: hot-duplicate-class rate, 1-in-N docs (default the
    # round-6 1%).  Round 13 uses a denser class (e.g. N=10, one
    # LSH-band-SATURATING duplicate class at ~10% of the corpus) to
    # witness the d32 hot-bucket salting under real saturation; the
    # default transforms are unchanged so the standing skew-pair
    # artifacts stay comparable.
    dup_every = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    os.makedirs(out, exist_ok=True)
    for name in TABLES:
        s = os.path.join(src, f"{name}.parquet")
        d = os.path.join(out, f"{name}.parquet")
        if os.path.exists(d):
            os.remove(d)
        if name == "events":
            skew_events(s, d)
        elif name == "documents":
            skew_documents(s, d, dup_every=dup_every)
        else:
            os.link(s, d)  # content-identical, no copy
    print(f"skewed dataset at {out}")


if __name__ == "__main__":
    main()
