"""Generate a larger scale factor from the driver's sf0.1 testdata.

The driver provides sf0.001/0.01/0.1 only; the scale posture above that
is argued from plan shape.  This tool turns the argument into a
measurement: it builds an sf1-equivalent dataset (default 10x sf0.1) by
key-space replication — the same technique dbgen-style generators use
(rows grow, per-entity density stays constant) — so the expensive-tail
queries can be RUN at 10x and their observed scaling factors recorded
(SCALE.md).  Output is one single parquet file per table, exactly the
driver's layout, so both `catalog.load_table` and the DuckDB oracle
(`tools/driver_sim.py`) work against it unchanged.

Replication rules (replica i of FACTOR, all keys dense 0-based):

- region/nation: fixed dimensions, copied as-is (TPC-H does the same).
- customer/supplier/part/orders/documents/embeddings/events: every key
  column shifts by ``i * cardinality`` — referential integrity holds
  because the referenced dimension is replicated with the same shift.
- lineitem.l_suppkey additionally MIXES across replicas
  (``(i + l_orderkey) % FACTOR`` picks the supplier replica): without
  it the customer<->supplier trade graph (q96/q100/q108) would be
  FACTOR disconnected copies of the sf0.1 graph and frontier-expansion
  queries would not scale with the data.
- documents.text: replicas > 0 salt every token with ``r<i>``
  (n_chars recomputed).  This keeps within-replica duplicate structure
  identical to sf0.1 while making cross-replica docs fully dissimilar —
  otherwise every doc would gain FACTOR-1 exact twins and LSH bucket
  sizes would grow by FACTOR (candidate pairs by FACTOR^2): a data
  artifact, not the workload's scaling.
- events keep their timestamps: 10x traffic in the same window (more
  users, same per-user density) — the realistic growth axis for the
  sessionization/window queries.

Usage: python tools/make_sf.py [out_dir] [factor] [src_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb


def build(out_dir: str, factor: int = 10, src_dir: str = "/root/testdata/sf0.1") -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {max(4, os.cpu_count() or 4)}")

    def src(t: str) -> str:
        return f"read_parquet('{os.path.join(src_dir, t + '.parquet')}')"

    def emit(t: str, select_sql: str) -> None:
        out = os.path.join(out_dir, f"{t}.parquet")
        con.execute(f"COPY ({select_sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{t}: {n:,} rows", flush=True)

    # cardinalities drive the replica shifts
    card = {}
    for t, k in [
        ("customer", "c_custkey"),
        ("supplier", "s_suppkey"),
        ("part", "p_partkey"),
        ("orders", "o_orderkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]:
        card[t] = con.execute(f"SELECT max({k}) + 1 FROM {src(t)}").fetchone()[0]
    n_users = con.execute(f"SELECT max(user_id) + 1 FROM {src('events')}").fetchone()[0]

    rep = f"(SELECT unnest(range({factor})) AS i)"

    emit("region", f"SELECT * FROM {src('region')}")
    emit("nation", f"SELECT * FROM {src('nation')}")
    # identity-like name columns stay UNIQUE per entity (as a real
    # generator would make them): replica > 0 suffixes "_r<i>".  Without
    # this, queries that aggregate or join BY NAME (q65 groups the
    # answer by s_name) silently merge the replicas and diverge from
    # their per-key formulation.  Low-cardinality semantic columns
    # (brand, type, segment, nation) replicate as-is, like TPC-H.
    def uniq(col: str) -> str:
        return f"CASE WHEN i = 0 THEN {col} ELSE {col} || '_r' || i::VARCHAR END AS {col}"

    emit(
        "customer",
        f"""SELECT c_custkey + i * {card['customer']} AS c_custkey,
                   {uniq('c_name')}, c_nationkey, c_acctbal, c_mktsegment
            FROM {src('customer')}, {rep}""",
    )
    emit(
        "supplier",
        f"""SELECT s_suppkey + i * {card['supplier']} AS s_suppkey,
                   {uniq('s_name')}, s_nationkey, s_acctbal
            FROM {src('supplier')}, {rep}""",
    )
    emit(
        "part",
        f"""SELECT p_partkey + i * {card['part']} AS p_partkey,
                   {uniq('p_name')}, p_brand, p_type, p_size, p_retailprice
            FROM {src('part')}, {rep}""",
    )
    emit(
        "orders",
        f"""SELECT o_orderkey + i * {card['orders']} AS o_orderkey,
                   o_custkey + i * {card['customer']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {src('orders')}, {rep}""",
    )
    emit(
        "lineitem",
        f"""SELECT l_orderkey + i * {card['orders']} AS l_orderkey,
                   l_partkey + i * {card['part']} AS l_partkey,
                   l_suppkey + ((i + l_orderkey) % {factor}) * {card['supplier']}
                       AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {src('lineitem')}, {rep}""",
    )
    emit(
        "events",
        f"""SELECT event_id + i * {card['events']} AS event_id,
                   ts,
                   user_id + i * {n_users} AS user_id,
                   event_type, value, props
            FROM {src('events')}, {rep}""",
    )
    emit(
        "documents",
        f"""SELECT doc_id + i * {card['documents']} AS doc_id,
                   CASE WHEN i = 0 THEN text
                        ELSE array_to_string(
                               list_transform(str_split(text, ' '),
                                              x -> x || 'r' || i::VARCHAR),
                               ' ')
                   END AS text,
                   lang, source,
                   CAST(strlen(CASE WHEN i = 0 THEN text
                        ELSE array_to_string(
                               list_transform(str_split(text, ' '),
                                              x -> x || 'r' || i::VARCHAR),
                               ' ')
                   END) AS BIGINT) AS n_chars
            FROM {src('documents')}, {rep}""",
    )
    # Per-replica deterministic SIGN FLIPS on the embedding dimensions:
    # an orthogonal transform, so every within-replica dot product /
    # cosine / norm is EXACTLY preserved (the replica's similarity
    # structure is the original's), while cross-replica cosines
    # decorrelate.  Copying vectors verbatim instead makes every vector
    # 10 near-identical twins: ANN/dedup bucket sizes grow by FACTOR and
    # candidate pairs by FACTOR^2 — observed as a quadratic stall in
    # d16 at sf1 — which is a data artifact, not workload scaling.
    # sign = md5-derived bit of (i, j): linear-congruential mod-2
    # patterns degenerate to parity (replicas of equal parity would
    # share one pattern and stay identical); an md5 fold does not.
    dim = con.execute(f"SELECT len(embedding) FROM {src('embeddings')} LIMIT 1").fetchone()[0]
    emit(
        "embeddings",
        f"""WITH u AS (
              SELECT vec_id, label, i, j,
                     embedding[j + 1]
                       * (CASE WHEN i = 0
                               OR ('0x' || substr(md5(i::VARCHAR || '_' || j::VARCHAR), 1, 2))::INT % 2 = 0
                               THEN 1 ELSE -1 END) AS v
              FROM {src('embeddings')}, {rep}, unnest(range({dim})) t(j)
            )
            SELECT vec_id + i * {card['embeddings']} AS vec_id,
                   CAST(list(v ORDER BY j) AS FLOAT[]) AS embedding,
                   any_value(label) AS label
            FROM u
            GROUP BY vec_id, i""",
    )


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mapreducehs_sf1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    build(out, factor, src_dir)
