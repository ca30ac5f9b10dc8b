"""Deduplication operators over document corpora.

LLM-data-pipeline surface mandated by BASELINE.json (the reference's
kernel can express only exact distinct via its Reducer, SURVEY §2.2
"Distinct"/"LLM-pipeline: dedup").  Five tiers, all JVM-side:

- exact          — content-hash groupBy (one shuffle on the hash).
- n-gram Jaccard — exact set-similarity pair join via shingle explode
                   (the verifier; quadratic only within shared shingles).
- MinHash + LSH  — banded minhash bucket join (the 100 TB path:
                   candidate generation is linear, one shuffle per band
                   union, verification only within buckets).
- SimHash        — 64-bit sign-fingerprint, near-dup = small Hamming
                   distance; banded for candidate generation.
- embedding      — cosine near-dup over embedding vectors (delegates to
                   operators.similarity).

Design note (100 TB): every near-dup pipeline here is
candidates-then-verify.  Candidate generation never compares all pairs —
it buckets (LSH bands / simhash bands / shared shingles) and only joins
within buckets.  Hot buckets (boilerplate shingles) are the skew risk:
``ngram_jaccard_pairs`` caps per-shingle fanout via a document-frequency
filter, the standard trick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreducehs_spark.operators.text import tokens


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct content hash (lowest id wins —
    deterministic, unlike ``dropDuplicates`` which keeps an arbitrary
    row).  One hash-shuffle; at 100 TB prefer this over
    ``dropDuplicates([text_col])`` because the 32-byte hash, not the
    full text, is the shuffle key."""
    h = F.md5(F.col(text_col)).alias("content_hash")
    winners = (
        df.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(winners, on=id_col, how="inner").drop("content_hash")


def duplicate_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per content hash: group size + representative (min) id."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("keep_id"),
        )
    )


def shingles(col, n: int = 3):
    """Word n-gram shingle set (distinct) as an array column."""
    toks = tokens(col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Exact Jaccard-similar pairs via shingle explode + equi-join.

    ``|A∩B|`` comes from counting shared shingles after a self-join on
    the shingle string; Jaccard = inter / (|A| + |B| - inter).  Shingles
    appearing in more than ``max_shingle_df`` docs are dropped before
    the join (boilerplate guard — bounds the worst bucket at scale).
    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    sized = df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), n).alias("sh")
    ).withColumn("set_size", F.size("sh").cast("bigint")).filter(F.col("set_size") > 0)

    exploded = sized.select("id", "set_size", F.explode("sh").alias("shingle"))
    if max_shingle_df is not None:
        keep = (
            exploded.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("sdf"))
            .filter(F.col("sdf") <= max_shingle_df)
            .select("shingle")
        )
        exploded = exploded.join(keep, "shingle")

    a = exploded.select(
        F.col("id").alias("id_a"), F.col("set_size").alias("size_a"), "shingle"
    )
    b = exploded.select(
        F.col("id").alias("id_b"), F.col("set_size").alias("size_b"), "shingle"
    )
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("size_a") + F.col("size_b") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 32, shingle_n: int = 3) -> DataFrame:
    """num_perm minhash values per doc: ``min over shingles of
    xxhash64(shingle, seed_i)``.  Pure column expressions — the whole
    signature is computed in one scan, no shuffle."""
    sh = shingles(F.col(text_col), shingle_n)
    return (
        df.select(F.col(id_col).alias("id"), sh.alias("sh"))
        .filter(F.size("sh") > 0)
        .select("id", sig_from("sh", num_perm).alias("sig"))
    )


def sig_from(sh_col: str, num_perm: int):
    """Minhash signature array from a shingle-array column."""
    return F.array(
        *[
            F.array_min(F.transform(F.col(sh_col), lambda s, i=i: F.xxhash64(s, F.lit(i))))
            for i in range(num_perm)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash LSH, verified by
    estimated Jaccard (signature agreement rate).

    bands=8 × rows=4 over 32 perms → catches pairs with J ≳ 0.5.
    Candidates: explode each signature into its band keys, self-join on
    (band, band-hash).  Verification: fraction of agreeing minhashes.
    Linear candidate generation; only bucket-mates are compared.
    """
    rows_per_band = num_perm // bands
    sigs = minhash_signature(df, text_col, id_col, num_perm, shingle_n)

    band_keys = F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.col("sig")[b * rows_per_band + r].cast("string")
                        for r in range(rows_per_band)
                    ],
                ),
                F.lit(b),
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select(
        "id", "sig", F.posexplode(band_keys).alias("band", "band_key")
    )
    left = banded.select(
        F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "band", "band_key"
    )
    right = banded.select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band", "band_key"
    )
    cand = (
        left.join(right, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    return (
        cand.withColumn(
            "est_jaccard", F.round(agree.cast("double") / float(num_perm), 6)
        )
        .filter(F.col("est_jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 64) -> DataFrame:
    """Per-doc SimHash fingerprint: sign of the per-bit sum of token
    hashes.  One explode + one hash aggregation with ``bits`` sum
    expressions — scales as a single groupBy at 100 TB."""
    toked = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    sums = toked.groupBy("id").agg(*bit_sums)
    fp = sum(
        (F.when(F.col(f"b{i}") > 0, F.lit(1).cast("bigint")).otherwise(0) * F.lit(2**i).cast("bigint"))
        for i in range(bits - 1)  # keep below 2^63: 63 usable bits
    )
    return sums.select("id", fp.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Candidate generation: split the 63-bit fingerprint into ``bands``
    16-bit bands; by pigeonhole any pair within Hamming distance
    (bands-1) shares an exact band → equi-join per band.  Verification:
    popcount of XOR via bit loop (still column expressions).
    """
    fps = simhash(df, text_col, id_col)
    band_cols = [
        (F.shiftrightunsigned(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF))).alias(
            f"band{i}"
        )
        for i in range(bands)
    ]
    banded = fps.select("id", "simhash", *band_cols)
    pairs = None
    for i in range(bands):
        l = banded.select(
            F.col("id").alias("id_a"), F.col("simhash").alias("fp_a"), F.col(f"band{i}").alias("bk")
        )
        r = banded.select(
            F.col("id").alias("id_b"), F.col("simhash").alias("fp_b"), F.col(f"band{i}").alias("bk")
        )
        p = l.join(r, "bk").filter(F.col("id_a") < F.col("id_b")).drop("bk")
        pairs = p if pairs is None else pairs.unionByName(p)
    cand = pairs.dropDuplicates(["id_a", "id_b"])
    x = F.col("fp_a").bitwiseXOR(F.col("fp_b"))
    hamming = sum(
        F.shiftrightunsigned(x, i).bitwiseAND(F.lit(1)).cast("int") for i in range(63)
    )
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold (delegates to the
    similarity module's LSH candidate path)."""
    from mapreducehs_spark.operators.similarity import cosine_pairs_lsh

    return cosine_pairs_lsh(emb, id_col=id_col, vec_col=vec_col, threshold=threshold)
