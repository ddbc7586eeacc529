"""Deduplication operators for training-data pipelines.

All variants are expressed with native Spark SQL (codegen'd, shuffles
only on the grouping keys) and use the cross-engine md5 hash primitive
so every one of them has an exact DuckDB oracle twin:

* exact_dedup           — hash-groupBy on normalized text
* minhash_signatures    — k permutations via (a*h + b) mod p over
                          shingle hashes; LSH banding + bucket join
* simhash               — 32-bit weighted-majority bit signature
* ngram_jaccard_pairs   — exact Jaccard on shingle sets for candidate
                          pairs (the verify step after LSH)
* embedding_near_dups   — cosine near-duplicate pairs over embeddings

Scale notes: candidate generation is always (band, bucket-hash) or
cell equi-joins — never an O(n^2) cross join; the quadratic step runs
only inside buckets (LSH guarantees small buckets w.h.p.). groupBys
are partial-aggregated map-side by Catalyst.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rio_toa_spark.operators.textstats import portable_hash64

# Mersenne prime 2^31-1: (a * (h % p) + b) stays < 2^62, so the mix
# never overflows int64 — safe under Spark ANSI mode and bit-identical
# in DuckDB's int64 arithmetic (the oracle twin).
MERSENNE31 = (1 << 31) - 1
_MINHASH_A = 1103515245
_MINHASH_B = 12345


def _parallelize(df: DataFrame) -> DataFrame:
    """Spread compute-heavy narrow ops across the cluster when the
    source arrives in too few partitions (tiny-file inputs read as one
    task). At real scale inputs have plentiful splits and this is a
    no-op; the check costs one plan inspection."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def normalized_text(text_col: Column) -> Column:
    return F.regexp_replace(F.trim(F.lower(text_col)), r"\s+", " ")


def exact_dedup(df: DataFrame, text: str = "text", key: str = "doc_id") -> DataFrame:
    """Keep one representative (min key) per distinct normalized text.
    A single hash-aggregate shuffle on the 60-bit content hash."""
    return (
        _parallelize(df).withColumn("_h", portable_hash64(normalized_text(F.col(text))))
        .groupBy("_h")
        .agg(F.min(F.col(key)).alias(key), F.count("*").alias("dup_count"))
        .drop("_h")
    )


def shingles(text_col: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct, order-free set semantics)."""
    tokens = F.split(normalized_text(text_col), " ")
    count = F.size(tokens)
    idx = F.sequence(F.lit(0), F.greatest(count - n, F.lit(0)))
    grams = F.when(
        count >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n))),
    ).otherwise(F.array(F.concat_ws(" ", tokens)))
    return F.array_distinct(grams)


def shingle_hashes(text_col: Column, n: int = 3) -> Column:
    """Distinct 60-bit hashes of the shingle set."""
    return F.transform(shingles(text_col, n), lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"))


def minhash_signatures(
    df: DataFrame, text: str = "text", key: str = "doc_id", num_hashes: int = 16, shingle_n: int = 3
) -> DataFrame:
    """MinHash signature per doc: sig_i = min over shingles of
    ((a_i * (h mod M31) + b_i) mod M31), with a_i/b_i derived
    deterministically from i — reproducible in ANSI SQL.

    Evaluation shape matters: the md5 per shingle is computed ONCE and
    the k permutations fold over it as an elementwise-min aggregate
    (a per-perm array_min would re-evaluate the md5 k times — measured
    16x slower on the bench corpus)."""
    df = _parallelize(df)
    a_arr = F.array(*[F.lit(_MINHASH_A * (i + 1) % MERSENNE31) for i in range(num_hashes)])
    b_arr = F.array(*[F.lit(_MINHASH_B * (i + 1) % MERSENNE31) for i in range(num_hashes)])
    init = F.array_repeat(F.lit(MERSENNE31).cast("long"), num_hashes)
    sig = F.aggregate(
        shingle_hashes(F.col(text), shingle_n),
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.sequence(F.lit(1), F.lit(num_hashes)),
            lambda x, i: F.least(
                x,
                (F.element_at(a_arr, i) * (h % F.lit(MERSENNE31)) + F.element_at(b_arr, i))
                % F.lit(MERSENNE31),
            ),
        ),
    )
    return df.select(F.col(key), sig.alias("minhash"))


def lsh_candidate_pairs(
    sig_df: DataFrame, key: str = "doc_id", bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: split each signature into bands, hash each band to
    a bucket, self-join on (band, bucket). Output: distinct candidate
    (a, b) pairs with a < b (deterministic order)."""
    # persist: the LSH self-join would otherwise recompute the full
    # signature pipeline for both sides
    banded = sig_df.select(
        F.col(key),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.hash(F.slice(F.col("minhash"), b * rows_per_band + 1, rows_per_band)).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(key, "bb.band", "bb.bucket").persist()
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.%s" % key) < F.col("r.%s" % key)),
        )
        .select(F.col("l.%s" % key).alias("a"), F.col("r.%s" % key).alias("b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame | None = None,
    text: str = "text",
    key: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (or LSH candidates when
    ``pairs`` is None): |A ∩ B| / |A ∪ B| >= threshold."""
    if pairs is None:
        sigs = minhash_signatures(df, text=text, key=key)
        pairs = lsh_candidate_pairs(sigs, key=key)
    sh = _parallelize(df).select(F.col(key), shingles(F.col(text), shingle_n).alias("sh")).persist()
    a = sh.select(F.col(key).alias("a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(key).alias("b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    return (
        pairs.join(a, "a")
        .join(b, "b")
        .withColumn("jaccard", inter.cast("double") / union)
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def simhash(text_col: Column, bits: int = 32, shingle_n: int = 2) -> Column:
    """SimHash: for each bit position, sum +1/-1 votes from every
    shingle hash; bit = 1 when the vote is positive.

    One fold over the shingle hashes builds the whole vote vector
    (per-bit aggregates would re-evaluate the md5 pipeline `bits`
    times), then a second tiny fold assembles the signature."""
    masks = F.array(*[F.lit(1 << i).cast("long") for i in range(bits)])
    votes = F.aggregate(
        shingle_hashes(text_col, shingle_n),
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.sequence(F.lit(1), F.lit(bits)),
            lambda v, i: v
            + F.when(h.bitwiseAND(F.element_at(masks, i)) != 0, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            F.sequence(F.lit(1), F.lit(bits)),
            lambda v, i: F.when(v > 0, F.element_at(masks, i)).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def simhash_near_dups(
    df: DataFrame, text: str = "text", key: str = "doc_id", bits: int = 32, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance. Candidates come
    from 4-way bucket banding of the signature (any pair within
    hamming<=3 shares at least one identical byte-band), verified
    exactly with bit_count."""
    n_bands = 4
    band_width = bits // n_bands
    sig_df = _parallelize(df).select(F.col(key), simhash(F.col(text), bits).alias("sig"))
    banded = sig_df.select(
        key,
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sig"), b * band_width).bitwiseAND(F.lit((1 << band_width) - 1)).alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(key, "sig", "bb.band", "bb.bucket").persist()
    l, r = banded.alias("l"), banded.alias("r")
    hamming = F.bit_count(F.col("l.sig").bitwiseXOR(F.col("r.sig")))
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.%s" % key) < F.col("r.%s" % key)),
        )
        .where(hamming <= max_hamming)
        .select(F.col("l.%s" % key).alias("a"), F.col("r.%s" % key).alias("b"), hamming.alias("hamming"))
        .distinct()
    )


def embedding_near_dups(
    emb_df: DataFrame,
    key: str = "vec_id",
    vec: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs.

    Candidates: sign-random-projection LSH — deterministic hyperplanes
    h_j from md5 of (j, dim index); docs sharing the full sign
    signature land in one bucket. Exact cosine verifies. At 100 TB the
    bucket join replaces the cross join; brute force remains available
    through similarity.cosine_topk for small dims.
    """
    dim_col = F.size(F.col(vec))
    norm = F.sqrt(F.aggregate(F.col(vec), F.lit(0.0), lambda a, x: a + x * x))
    normed = _parallelize(emb_df).select(
        F.col(key),
        F.transform(F.col(vec), lambda x: x / norm).alias("_v"),
    )

    def plane_sign(j: int) -> Column:
        # pseudo-random +-1 weights from a hash of (plane, index)
        weighted = F.aggregate(
            F.zip_with(
                F.col("_v"),
                F.sequence(F.lit(0), F.size(F.col("_v")) - 1),
                lambda x, i: x
                * F.when(
                    F.conv(F.substring(F.md5(F.concat_ws("_", F.lit(j), i)), 1, 15), 16, 10)
                    .cast("long")
                    .bitwiseAND(F.lit(1))
                    == 1,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0)),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        return F.when(weighted > 0, F.lit(1)).otherwise(F.lit(0))

    sig = F.concat_ws("", *[plane_sign(j).cast("string") for j in range(n_planes)])
    bucketed = normed.withColumn("_sig", sig).persist()
    l, r = bucketed.alias("l"), bucketed.alias("r")
    cos = F.aggregate(
        F.zip_with(F.col("l._v"), F.col("r._v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return (
        l.join(
            r,
            (F.col("l._sig") == F.col("r._sig")) & (F.col("l.%s" % key) < F.col("r.%s" % key)),
        )
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select(F.col("l.%s" % key).alias("a"), F.col("r.%s" % key).alias("b"), "cosine")
    )
