"""Similarity search over embedding columns (``array<float>``).

LLM-data-pipeline surface mandated by BASELINE.json (absent in the
reference, SURVEY §2.2 "LLM-pipeline: similarity search").  Two paths:

- ``cosine_topk``      — exact brute-force top-k: broadcast the query
  set, JVM-side dot products, window top-k.  The correctness baseline;
  O(|queries| × |corpus|) — fine when the query side is small enough to
  broadcast, which is the common "probe" shape even at 100 TB corpora.
- ``signed random projection LSH`` (``srp_signatures`` /
  ``cosine_pairs_lsh`` / ``cosine_topk_lsh``) — the scale path: bucket
  by sign-pattern of random hyperplane projections, compare only within
  buckets.  Candidate generation is linear; hyperplanes are seeded and
  shipped as literal arrays (a broadcast-sized constant).

An IVF variant (``ivf_topk``) clusters with seeded random centroids and
probes the nearest ``n_probe`` cells — the brute-force scan drops to
corpus/n_cells × n_probe per query.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mapreducehs_spark.functions.vector import cosine_similarity, dot_product, l2_normalize


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Returns (query_id, match_id, cosine, rank) with rank 1..k; ties
    broken by match id, so results are total-ordered and deterministic.
    """
    query_id_col = query_id_col or id_col
    # normalize each side ONCE (per row, in the scan projection) so the
    # per-pair work is a single dot product — at 100 TB this halves the
    # inner-loop arithmetic vs computing norms per pair.
    q = queries.select(
        F.col(query_id_col).alias("query_id"), l2_normalize(vec_col).alias("__qv")
    )
    c = corpus.select(F.col(id_col).alias("match_id"), l2_normalize(vec_col).alias("__cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("match_id"))
        .withColumn("cosine", F.round(dot_product("__qv", "__cv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("match_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(float).tolist()


def srp_signatures(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Signed-random-projection signature: bit i = sign(v · h_i).
    Hyperplanes are deterministic (seeded) literal arrays; the signature
    is one integer column — JVM-side end to end."""
    planes = _hyperplanes(dim, n_planes, seed)
    sig = sum(
        (
            F.when(
                dot_product(F.col(vec_col), F.array(*[F.lit(x) for x in h])) > 0,
                F.lit(2**i).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))
        )
        for i, h in enumerate(planes)
    )
    # vec is stored L2-normalized: sign(v·h) is norm-invariant, and the
    # downstream pair verification becomes a bare dot product.
    return df.select(
        F.col(id_col).alias("id"), l2_normalize(vec_col).alias("vec"), sig.alias("srp_sig")
    )


def cosine_pairs_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """All pairs with cosine ≥ threshold, via banded SRP-LSH candidates
    + exact verification.  Returns (id_a, id_b, cosine), id_a < id_b."""
    sigs = srp_signatures(df, dim, n_planes, id_col, vec_col, seed)
    bits_per_band = n_planes // bands
    mask = (1 << bits_per_band) - 1
    band_cols = [
        (
            F.shiftrightunsigned(F.col("srp_sig"), i * bits_per_band).bitwiseAND(F.lit(mask))
        ).alias(f"band{i}")
        for i in range(bands)
    ]
    banded = sigs.select("id", "vec", *band_cols)
    pairs = None
    for i in range(bands):
        l = banded.select(F.col("id").alias("id_a"), F.col("vec").alias("va"), F.col(f"band{i}").alias("bk"))
        r = banded.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"), F.col(f"band{i}").alias("bk"))
        p = l.join(r, "bk").filter(F.col("id_a") < F.col("id_b")).drop("bk")
        pairs = p if pairs is None else pairs.unionByName(p)
    cand = pairs.dropDuplicates(["id_a", "id_b"])
    return (
        cand.withColumn("cosine", F.round(dot_product("va", "vb"), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF-flat approximate top-k: assign corpus vectors to their
    nearest random centroid (seeded, broadcast as literals); each query
    probes its ``n_probe`` nearest cells and scans only those.

    Recall is approximate (a true IVF trains centroids with k-means —
    at 100 TB run a sampled k-means first and pass the centroids in).
    """
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_cells, dim))
    cents = (cents / np.linalg.norm(cents, axis=1, keepdims=True)).tolist()

    def cell_scores(vnorm_col):
        # centroids are unit vectors, inputs normalized → dot == cosine
        return F.array(
            *[dot_product(vnorm_col, F.array(*[F.lit(x) for x in c])) for c in cents]
        )

    # scores staged as a NAMED column before any argmax/sort references
    # it: expressions embedded in HOF lambdas re-evaluate per element,
    # which would multiply the 16-dot-product array by n_cells.
    c = corpus.select(
        F.col(id_col).alias("match_id"), l2_normalize(vec_col).alias("__cv")
    ).withColumn("__scores", cell_scores(F.col("__cv")))
    c = c.withColumn(
        "cell", (F.array_position("__scores", F.array_max("__scores")) - 1).cast("int")
    ).drop("__scores")

    q = queries.select(
        F.col(id_col).alias("query_id"), l2_normalize(vec_col).alias("__qv")
    ).withColumn("__scores", cell_scores(F.col("__qv")))
    probe_cells = F.slice(
        F.reverse(
            F.array_sort(
                F.zip_with(
                    F.col("__scores"),
                    F.sequence(F.lit(0), F.lit(n_cells - 1)),
                    lambda s, i: F.struct(s.alias("s"), i.alias("i")),
                )
            )
        ),
        1,
        n_probe,
    )
    q = q.withColumn(
        "cell", F.explode(F.transform(probe_cells, lambda st: st["i"].cast("int")))
    ).drop("__scores")

    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("match_id"))
        .withColumn("cosine", F.round(dot_product("__qv", "__cv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("match_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "cosine", "rank")
    )


def label_centroids(
    emb: DataFrame, label_col: str = "label", vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """Per-label centroid: mean of each vector component.

    posexplode + groupBy(label, pos) + avg — one shuffle keyed on
    (label, pos), perfectly partial-aggregatable at any scale.  Returns
    (label, pos, centroid_val).
    """
    return (
        emb.select(F.col(label_col).alias("label"), F.posexplode(vec_col).alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid_val"))
    )
