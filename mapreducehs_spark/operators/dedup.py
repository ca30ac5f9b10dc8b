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


def shingles_of(tok_col, n: int = 3):
    """Word n-gram shingle set (distinct) from a *materialized* token
    array column.

    IMPORTANT: pass a named token-array column, not an inline
    ``split(...)`` expression — expressions referenced inside a
    higher-order-function lambda are re-evaluated per array element, so
    an inline split turns shingling O(len²) in string work.  Staging the
    tokens as a projection first keeps it linear (measured 20x on the
    documents table)."""
    tok_col = F.col(tok_col) if isinstance(tok_col, str) else tok_col
    idx = F.sequence(F.lit(1), F.greatest(F.size(tok_col) - (n - 1), F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tok_col, i, n)))
    )


def shingle_frame(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, sh) frame: tokens staged once, then shingled.

    Repartitions to the session's parallelism first: shingling is
    compute-bound, and a corpus that arrives as few files (one, in the
    testdata) would otherwise pin the whole stage to as many cores as
    there are input splits.  At 100 TB input splits already outnumber
    cores and AQE coalesces, so the repartition is a cheap no-op-ish
    rebalance; on small inputs it is the difference between 1 and all
    cores."""
    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text"))
        .repartition(par, "id")
        .select("id", tokens(F.col("__text")).alias("__toks"))
        .select("id", shingles_of("__toks", n).alias("sh"))
    )


def hashed_shingle_frame(
    df: DataFrame, text_col: str, id_col: str, n: int, fold_31bit: bool = False
) -> DataFrame:
    """(id, hs: array<bigint>) — distinct shingles as 64-bit hashes.

    The shingle string is never materialized: the n-token window feeds a
    multi-arg ``xxhash64`` directly (measured ~10x vs building 20-char
    shingle strings through interpreted concat/slice HOFs, and the
    downstream joins key on bigint instead of string).  Collision risk
    at 64 bits is birthday-bounded ≈ (#distinct shingles)²/2⁶⁵ —
    negligible below ~10⁸ shingles per comparison scope; pass
    ``fold_31bit`` only where an arithmetic bound needs hashes < 2³¹
    (minhash's universal-hash overflow bound).
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    staged = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text"))
        .repartition(par, "id")
        .select("id", tokens(F.col("__text")).alias("__toks"))
        # cheap pre-filter; filtering on size(hs) AFTER would re-evaluate
        # the whole interpreted HOF chain (no CSE; measured 7x)
        .filter(F.size("__toks") >= n)
    )
    toks = F.col("__toks")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))

    def shingle_hash(i):
        return F.xxhash64(*[F.element_at(toks, i + j) for j in range(n)])

    expr = F.transform(idx, lambda i: shingle_hash(i))
    if fold_31bit:
        expr = F.transform(idx, lambda i: F.pmod(shingle_hash(i), F.lit(_H31).cast("bigint")))
    return staged.select("id", F.array_distinct(expr).alias("hs"))


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
    # set_size = size(hs) is computed in the projection ABOVE the one
    # that builds hs, so hs stays an attribute reference (CollapseProject
    # declines to merge: hs is referenced twice and is expensive — the
    # interpreted-HOF double-evaluation trap only bites when a filter or
    # single-use alias lets the rule inline the expression).
    #
    # persist: both sides of the self-join and the doc-frequency guard
    # read this frame — without it the shingling lineage runs 3x.
    # explode_OUTER, deliberately: plain explode triggers
    # InferFiltersFromGenerate, which infers `size(hs) > 0` and pushes
    # it to the scan with the whole interpreted shingle-HOF chain
    # inlined — the hashing then runs twice (measured 7s of 9s on this
    # stage).  The token-count pre-filter in hashed_shingle_frame
    # already guarantees non-empty arrays, so outer explode emits no
    # null rows and needs no inferred guard.
    exploded = (
        hashed_shingle_frame(df, text_col, id_col, n)
        .select(
            "id",
            F.size("hs").cast("bigint").alias("set_size"),
            F.explode_outer("hs").alias("shingle"),
        )
        .persist()
    )
    if max_shingle_df is not None:
        keep = (
            exploded.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("sdf"))
            .filter(F.col("sdf") <= max_shingle_df)
            .select("shingle")
        )
        exploded = exploded.join(keep, "shingle")

    a = exploded.select(F.col("id").alias("id_a"), F.col("set_size").alias("size_a"), "shingle")
    b = exploded.select(F.col("id").alias("id_b"), F.col("set_size").alias("size_b"), "shingle")
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

#: Mersenne prime 2^61-1: with a,b < 2^31 and h folded below 2^31,
#: a*h+b < 2^62 — no bigint overflow under Spark 4's ANSI mode.
_MERSENNE61 = (1 << 61) - 1
_H31 = (1 << 31) - 1


def minhash_signature(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 32, shingle_n: int = 3) -> DataFrame:
    """num_perm minhash values per doc via universal hashing.

    Each shingle is string-hashed ONCE (multi-arg ``xxhash64`` over the
    token slice — no shingle string is ever materialized); the
    ``num_perm`` permutations are then derived with integer arithmetic
    ``(a_i * h + b_i) mod p`` over the staged hash array.  This is ~6x
    cheaper than hashing strings per permutation and is the layout that
    matters at 100 TB where signature computation is the dominant scan
    cost.  Pure column expressions — one scan, no shuffle.
    """
    import random

    rnd = random.Random(42)
    coefs = [(rnd.randrange(1, _H31), rnd.randrange(0, _H31)) for _ in range(num_perm)]

    hashed = hashed_shingle_frame(df, text_col, id_col, shingle_n, fold_31bit=True)
    hashed = hashed.withColumnRenamed("hs", "__hs")
    hs = F.col("__hs")

    # factory, not default-arg capture: PySpark counts the lambda's
    # parameters to pick the HOF arity, so `lambda h, a=a, b=b` would be
    # bound as a 3-arg lambda and fail analysis.
    def perm_min(a: int, b: int):
        return F.array_min(
            F.transform(
                hs,
                lambda h: F.pmod(
                    F.lit(a).cast("bigint") * h + F.lit(b),
                    F.lit(_MERSENNE61).cast("bigint"),
                ),
            )
        )

    sig = F.array(*[perm_min(a, b) for a, b in coefs])
    return hashed.select("id", sig.alias("sig"))


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
    # Band join carries ONLY (id, band_key): at scale the 32-long
    # signature arrays would otherwise ride through the explode-join
    # shuffle (~512 bytes/pair); instead candidates are deduped as bare
    # id pairs and signatures re-attached with two joins afterwards.
    sigs = sigs.persist()
    banded = sigs.select("id", F.posexplode(band_keys).alias("band", "band_key"))
    left = banded.select(F.col("id").alias("id_a"), "band", "band_key")
    right = banded.select(F.col("id").alias("id_b"), "band", "band_key")
    cand_ids = (
        left.join(right, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = cand_ids.join(
        sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")), "id_a"
    ).join(sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")), "id_b")
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
    # explode_outer + not-null filter: avoids the inferred size()>0
    # pushdown that would inline and re-run tokenization (see
    # ngram_jaccard_pairs).  The filter is on the generated attribute,
    # which cannot be pushed below the Generate.
    toked = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode_outer(tokens(F.col(text_col))).alias("tok"),
        )
        .filter(F.col("tok").isNotNull())
        .withColumn("h", F.xxhash64("tok"))
    )
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
    # persist: the fingerprint aggregation feeds 2×bands join sides —
    # without it the explode+64-bit-sum groupBy recomputes per side.
    fps = simhash(df, text_col, id_col).persist()
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
