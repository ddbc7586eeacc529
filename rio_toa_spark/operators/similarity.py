"""Similarity search over embedding columns (array<float>).

* cosine_topk       — exact brute-force top-k: native SQL dot product
                      (zip_with + aggregate, codegen'd) + windowed
                      row_number. The correctness baseline.
* cosine_topk_ivf   — IVF-style scale path: k-means-lite centroids
                      (deterministic seeded sample, few Lloyd rounds on
                      the driver over a sampled fraction); each vector
                      assigned to its nearest centroid list; queries
                      probe the closest n_probe lists only. Exactness
                      is traded for a bounded candidate set — the ANN
                      pattern that survives 10^12 rows.

Deterministic tie-break everywhere: (distance DESC cosine, id ASC).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    # cast BEFORE multiplying: float32*float32 rounds to float32, while
    # the DuckDB oracle twin multiplies doubles — upcast first so both
    # engines do the identical double multiply + sequential double fold
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    emb_df: DataFrame,
    queries_df: DataFrame,
    k: int = 5,
    key: str = "vec_id",
    vec: str = "embedding",
    q_key: str = "q_id",
    q_vec: str = "q_vec",
) -> DataFrame:
    """Exact top-k by cosine for each query vector. The query side is
    broadcast (queries are few); the corpus streams map-side, so the
    only shuffle is the per-query top-k window."""
    pairs = emb_df.join(F.broadcast(queries_df))
    scored = pairs.withColumn("cosine", cosine(F.col(vec), F.col(q_vec)))
    w = Window.partitionBy(q_key).orderBy(F.col("cosine").desc(), F.col(key).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(q_key, key, "cosine", F.col("rank").cast("int").alias("rank"))
    )


def _lloyd(sample: np.ndarray, n_centroids: int, iters: int = 5, seed: int = 13) -> np.ndarray:
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)
    centroids = sample[idx].copy()
    for _ in range(iters):
        d = sample @ centroids.T
        assign = np.argmax(d, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                nrm = np.linalg.norm(m)
                if nrm > 0:
                    centroids[c] = m / nrm
    return centroids


def cosine_topk_ivf(
    emb_df: DataFrame,
    queries_df: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    key: str = "vec_id",
    vec: str = "embedding",
    q_key: str = "q_id",
    q_vec: str = "q_vec",
    sample_fraction: float = 1.0,
    max_sample: int = 100_000,
    seed: int = 13,
) -> DataFrame:
    """IVF approximate top-k: centroids from a deterministic seeded
    sample; corpus rows carry their nearest-centroid list id; each
    query probes its n_probe closest lists. Scales as
    O(rows/n_centroids * n_probe) per query instead of O(rows).

    The centroid build trains Lloyd's on a driver-side sample that is
    HARD-CAPPED at ``max_sample`` rows — never an O(corpus) collect,
    so the build path is safe at 10^9+ vectors; training k-means on a
    bounded sample is the standard IVF procedure. Quality only needs
    sample >> n_centroids. The cap takes the max_sample SMALLEST keys
    (TakeOrderedAndProject: O(n log k) scan, bounded memory, no full
    sort) rather than a bare limit(), whose row choice would depend on
    partition layout and make centroids — and therefore query results —
    nondeterministic across parallelism levels."""
    spark = emb_df.sparkSession
    sample = np.array(
        [
            r[1]
            for r in emb_df.select(key, vec)
            .sample(fraction=sample_fraction, seed=seed)
            .orderBy(key)
            .limit(max_sample)
            .collect()
        ],
        dtype=np.float64,
    )
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    centroids = _lloyd(sample, n_centroids, seed=seed)
    bc = spark.sparkContext.broadcast(centroids)

    # list assignment is a dense (batch x centroids) matmul — a numpy
    # kernel over Arrow batches, NOT a Catalyst literal-array transform
    # (a 32x64-literal expression tree evaluated per row was measured
    # ~10x slower than BLAS here, and the gap widens with n_centroids)
    def assign_lists(batches):
        from rio_toa_spark.operators.batching import coalesce_batches

        C = bc.value.T  # (dim, n_centroids)
        # embedding rows are small: coalesce the 256-row Arrow batches
        # so BLAS sees efficient matrix shapes and per-batch overhead
        # amortizes. Safe for the exact ann_ivf oracle: batch-shape-
        # dependent BLAS summation variation is bounded far below the
        # >=1e-6 assignment margin the fixture asserts at generation
        # (sources/truth.py).
        for pdf in coalesce_batches(batches):
            V = np.vstack(pdf[vec].to_numpy())
            pdf = pdf.copy()
            # argmax of dot products; ties -> lowest list id (argmax
            # first-occurrence), matching a deterministic assignment
            pdf["_list"] = np.argmax(V @ C, axis=1).astype(np.int32)
            yield pdf

    # fresh StructType — StructType.add would MUTATE the DataFrame's
    # cached schema object and break later analysis against it
    corpus_schema = T.StructType(
        list(emb_df.schema.fields) + [T.StructField("_list", T.IntegerType())]
    )
    corpus = emb_df.mapInPandas(assign_lists, corpus_schema)

    # query -> its n_probe closest centroid lists (same kernel shape;
    # deterministic tie-break on list id via stable argsort)
    def assign_probes(batches):
        C = bc.value.T
        for pdf in batches:
            if not len(pdf):  # np.vstack raises on zero arrays
                continue
            Q = np.vstack(pdf[q_vec].to_numpy())
            order = np.argsort(-(Q @ C), axis=1, kind="stable")[:, :n_probe]
            pdf = pdf.copy()
            pdf["_probes"] = [row.astype(np.int32).tolist() for row in order]
            yield pdf

    q_schema = T.StructType(
        list(queries_df.schema.fields)
        + [T.StructField("_probes", T.ArrayType(T.IntegerType()))]
    )
    queries = queries_df.mapInPandas(assign_probes, q_schema).withColumn(
        "_list", F.explode("_probes")
    )
    pairs = corpus.join(F.broadcast(queries.drop("_probes")), "_list")
    scored = pairs.withColumn("cosine", cosine(F.col(vec), F.col(q_vec)))
    w = Window.partitionBy(q_key).orderBy(F.col("cosine").desc(), F.col(key).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(q_key, key, "cosine", F.col("rank").cast("int").alias("rank"))
    )
