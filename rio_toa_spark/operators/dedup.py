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

import os

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
    source arrives as too few input files (tiny-file inputs read as
    one task). Uses the plan's file listing — NOT df.rdd, which would
    force a full plan-to-RDD conversion on the driver per call. At
    real scale inputs have plentiful file splits and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    files = df.inputFiles()
    if files and len(files) >= max(2, target // 2):
        return df
    # few files, but parquet splits by byte range: a single large file
    # still fans out into ~size/maxPartitionBytes scan tasks. Only pay
    # the repartition shuffle when the splittable-size signal says the
    # scan really is under-parallel (exactly the big-input case where
    # an unconditional shuffle would hurt most).
    if files:
        try:
            max_pb = _parse_bytes(
                df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
            )
            # early-exit once enough splittable bytes are seen: the
            # stat loop does O(min(#files, threshold)) driver syscalls,
            # never O(#files) — though by the len() guard above this
            # branch only ever runs on a handful of files anyway
            # same boundary as ceil(total/max_pb) >= threshold
            need = (max(2, target // 2) - 1) * max_pb + 1
            total = 0
            for uri in files:
                path = uri[len("file:") :] if uri.startswith("file:") else uri
                total += os.path.getsize(path)
                if total >= need:
                    return df
        except OSError:
            pass  # non-local URIs: fall through to the conservative shuffle
    return df.repartition(target)


def _parse_bytes(v: str) -> int:
    v = v.strip().lower().rstrip("b")
    for suffix, mult in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("t", 1 << 40)):
        if v.endswith(suffix):
            return int(float(v[:-1]) * mult)
    return int(v)


def normalized_text(text_col: Column) -> Column:
    return F.regexp_replace(F.trim(F.lower(text_col)), r"\s+", " ")


def exact_dedup(df: DataFrame, text: str = "text", key: str = "doc_id") -> DataFrame:
    """Keep one representative (min key) per distinct normalized text.
    A single hash-aggregate shuffle on the 60-bit content hash.

    Deliberately NOT _parallelize()d: the md5 projection runs at scan
    parallelism and only (hash, key) reaches the shuffle; a
    pre-repartition would move the full text payload through an extra
    exchange to parallelize a projection that is cheap relative to it
    (measured 0.97 s -> 0.75 s at bench sf1.0 — parquet inputs large
    enough for the hash to matter split fine on their own)."""
    return (
        df.withColumn("_h", portable_hash64(normalized_text(F.col(text))))
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
    """Distinct 60-bit hashes of the shingle set (legacy one-expression
    form: builds the n-word strings then md5s each). The minhash/LSH
    pipelines use token_hash_expr + shingle_hashes_from_tokens instead
    — one md5 per TOKEN and pure int64 arithmetic per shingle, measured
    ~5x faster at bench scale with identical set semantics."""
    return F.transform(shingles(text_col, n), lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"))


# polynomial-combine base for token-hash shingles; weights are
# base^(j+1) mod M31 so the combine is order-sensitive and exactly
# reproducible in ANSI SQL (DuckDB twin embeds the same literals)
_SHINGLE_BASE = 1000003


def shingle_weights(n: int) -> list[int]:
    return [pow(_SHINGLE_BASE, j + 1, MERSENNE31) for j in range(n)]


def token_hash_expr(text_col: Column) -> Column:
    """Per-token 31-bit portable hashes (md5 of the token, folded into
    [0, M31)). One md5 per token — the only string hashing the minhash
    pipeline pays."""
    tokens = F.split(normalized_text(text_col), " ")
    return F.transform(tokens, lambda t: portable_hash64(t) % MERSENNE31)


def shingle_hashes_from_tokens(th: Column, n: int = 3) -> Column:
    """Distinct shingle-set hashes from a token-hash array column:
    shingle_i = sum_j(th[i+j] * w_j) mod M31 (all int64, no overflow:
    each product < 2^62, the running sum < n * M31).

    ``th`` MUST be a bound column (materialized by a previous
    projection), NOT the token_hash_expr expression itself — Spark
    higher-order-function lambdas re-evaluate expression inputs per
    outer element (the documented 16x pitfall; measured 11x slower
    here when inlined)."""
    w = shingle_weights(n)
    c = F.size(th)
    m = F.lit(MERSENNE31)

    def gram(i: Column) -> Column:
        acc = (F.element_at(th, i + 1) * F.lit(w[0])) % m
        for j in range(1, n):
            acc = acc + (F.element_at(th, i + j + 1) * F.lit(w[j])) % m
        return acc % m

    grams = F.transform(F.sequence(F.lit(0), c - n), gram)
    # short docs (< n tokens): one fold hash over every token
    fold = F.array(
        F.aggregate(
            th,
            F.lit(0).cast("long"),
            lambda acc, h: (acc * _SHINGLE_BASE + h) % m,
        )
    )
    return F.array_distinct(F.when(c >= n, grams).otherwise(fold))


def shingle_hash_sets(
    df: DataFrame, text: str = "text", key: str = "doc_id", n: int = 3
) -> DataFrame:
    """(key, sh) with sh = the doc's distinct shingle-hash set. Two
    projections on purpose: the token-hash array materializes first so
    the shingle combine reads it as a bound column (see
    shingle_hashes_from_tokens)."""
    th_df = _parallelize(df).select(F.col(key), token_hash_expr(F.col(text)).alias("_th"))
    return th_df.select(F.col(key), shingle_hashes_from_tokens(F.col("_th"), n).alias("sh"))


def minhash_from_hashes(hashes: Column, num_hashes: int = 16) -> Column:
    """MinHash signature from a shingle-hash array column: sig_i = min
    over shingles of ((a_i * (h mod M31) + b_i) mod M31), with a_i/b_i
    derived deterministically from i — reproducible in ANSI SQL.

    Evaluation shape matters — two pitfalls, both measured:
    * ``hashes`` must be a BOUND column (the md5 pipeline materialized
      by a previous projection); referencing the hash expression here
      would re-evaluate it per permutation (16x pitfall).
    * given a bound input, k independent transform+array_min passes of
      plain int arithmetic beat the single elementwise-min fold whose
      zip_with allocates a fresh k-array per shingle (measured 4.0 s
      -> 3.1 s on the sf1.0 bench corpus end-to-end).
    least(M31, ...) reproduces the fold's init exactly: an empty array
    yields array_min = NULL, which least skips, returning M31."""
    outs = []
    m = F.lit(MERSENNE31)
    for i in range(num_hashes):
        a = F.lit(_MINHASH_A * (i + 1) % MERSENNE31)
        b = F.lit(_MINHASH_B * (i + 1) % MERSENNE31)
        perm = F.array_min(F.transform(hashes, lambda h: (a * (h % m) + b) % m))
        outs.append(F.least(F.lit(MERSENNE31).cast("long"), perm))
    return F.array(*outs)


def minhash_signatures(
    df: DataFrame, text: str = "text", key: str = "doc_id", num_hashes: int = 16, shingle_n: int = 3
) -> DataFrame:
    """MinHash signature per doc (see minhash_from_hashes), over
    token-hash shingles (see shingle_hash_sets)."""
    sh = shingle_hash_sets(df, text, key, shingle_n)
    return sh.select(F.col(key), minhash_from_hashes(F.col("sh"), num_hashes).alias("minhash"))


def lsh_candidate_pairs(
    sig_df: DataFrame,
    key: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """LSH banding: split each signature into bands, hash each band to
    a bucket, then emit all intra-bucket pairs. Output: distinct
    candidate (a, b) pairs with a < b (deterministic order).

    The bucket hash is the portable md5-60bit hash of the band slice
    (comma-joined) — identical in DuckDB, so the whole candidate step
    has an exact SQL oracle twin.

    Shape: the signature pipeline runs ONCE — groupBy(band, bucket) +
    sorted collect_list + within-bucket pair expansion. A bucket
    self-join would either recompute the signatures for both sides
    (Spark's self-join attribute dedup defeats ReusedExchange) or
    require caching them; the group form needs neither, costs one
    shuffle, and the quadratic expansion stays inside buckets, which
    LSH keeps small w.h.p. (run exact_dedup first so identical docs
    don't form a degenerate giant bucket)."""

    banded = sig_df.select(
        F.col(key),
        F.explode(_band_buckets("minhash", bands, rows_per_band)).alias("bb"),
    ).select(key, "bb.band", "bb.bucket")
    return _bucket_pairs(
        banded, ["band", "bucket"], key, max_bucket=max_bucket
    ).distinct()


def _band_buckets(sig_col: str, bands: int, rows_per_band: int) -> Column:
    """Array of (band, bucket) structs for a signature column; bucket
    is the portable md5-60bit hash of the comma-joined band slice."""

    def band_bucket(b: int) -> Column:
        slice_str = F.array_join(
            F.transform(
                F.slice(F.col(sig_col), b * rows_per_band + 1, rows_per_band),
                lambda x: x.cast("string"),
            ),
            ",",
        )
        return F.struct(F.lit(b).alias("band"), portable_hash64(slice_str).alias("bucket"))

    return F.array(*[band_bucket(b) for b in range(bands)])


def _bucket_pairs(
    banded: DataFrame,
    group_cols: list[str],
    key: str,
    payload: str | None = None,
    payload_a: str = "pa",
    payload_b: str = "pb",
    max_bucket: int | None = None,
) -> DataFrame:
    """Shared candidate-pair expansion for every LSH family:
    groupBy(group_cols) -> sorted collect_list -> all within-bucket
    (a, b[, payload_a, payload_b]) pairs with a < b.

    One shuffle; the signature/payload pipeline feeding ``banded`` runs
    exactly once (no self-join, no cache). The explicit repartition
    pins parallelism for the quadratic expansion stage — AQE's
    size-based coalescing sees tiny bytes and would serialize the
    work-heavy stage to ~1 task (measured 4x end-to-end regression).

    ``max_bucket`` (optional) SKIPS buckets larger than the cap: a
    degenerate giant bucket (a huge exact-duplicate class) would
    otherwise collect into one row and expand O(n^2) pairs inside it —
    an executor-memory hazard. Run exact_dedup first so such classes
    never form; the cap is the belt-and-braces bound for callers that
    don't, at the documented cost of recall inside skipped buckets.
    """
    spark = banded.sparkSession
    item = (
        F.struct(F.col(key).alias("a"), F.col(payload).alias("s"))
        if payload
        else F.col(key)
    )
    buckets = (
        banded.groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list(item)).alias("_ms"))
        .where(F.size("_ms") >= 2)
    )
    if max_bucket is not None:
        buckets = buckets.where(F.size("_ms") <= max_bucket)
    buckets = buckets.repartition(spark.sparkContext.defaultParallelism)

    if payload:
        def pair(x, y):
            return F.struct(
                x["a"].alias("a"), y["a"].alias("b"),
                x["s"].alias(payload_a), y["s"].alias(payload_b),
            )
    else:
        def pair(x, y):
            return F.struct(x.alias("a"), y.alias("b"))

    pair_structs = F.flatten(
        F.transform(
            F.col("_ms"),
            lambda x, i: F.transform(
                F.slice(F.col("_ms"), i + 2, F.size(F.col("_ms"))),
                lambda y: pair(x, y),
            ),
        )
    )
    out_cols = ["p.a", "p.b"] + (["p.%s" % payload_a, "p.%s" % payload_b] if payload else [])
    return buckets.select(F.explode(pair_structs).alias("p")).select(*out_cols)


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame | None = None,
    text: str = "text",
    key: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_bucket: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (or LSH candidates when
    ``pairs`` is None): |A ∩ B| / |A ∪ B| >= threshold.

    When ``pairs`` is None the LSH candidate step and the verify step
    are FUSED: the shingle arrays ride through the bucket groupBy, so
    candidates emerge with both shingle sets attached and the Jaccard
    verifies in place. The corpus text is read and shingled exactly
    once (the join-back form re-shingles it twice more — measured 2x
    slower end-to-end at bench scale), and nothing is cached."""
    inter_ab = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union_ab = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    if pairs is None:
        return _lsh_jaccard_fused(df, text, key, shingle_n, threshold, max_bucket=max_bucket)
    sh = _parallelize(df).select(F.col(key), shingles(F.col(text), shingle_n).alias("sh"))
    a = sh.select(F.col(key).alias("a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(key).alias("b"), F.col("sh").alias("sh_b"))
    return (
        pairs.join(a, "a")
        .join(b, "b")
        .withColumn("jaccard", inter_ab.cast("double") / union_ab)
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def _lsh_jaccard_fused(
    df: DataFrame,
    text: str,
    key: str,
    shingle_n: int,
    threshold: float,
    num_hashes: int = 16,
    bands: int = 4,
    rows_per_band: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Single-pass MinHash-LSH near-dup pipeline: shingle-hash ->
    minhash -> band buckets (hash arrays carried along) -> within-
    bucket pairs with exact Jaccard verify. One text scan, two
    shuffles (bucket groupBy + final distinct), zero caching, zero
    joins.

    The verify intersects the DISTINCT token-hash shingle hashes, not
    the shingle strings: |hash(A) ∩ hash(B)| / |hash(A) ∪ hash(B)|
    equals the string-set Jaccard (31-bit collisions are ~n^2/2^32 per
    doc, negligible at these set sizes, and the hashes are IDENTICALLY
    computed by the DuckDB twin, so the cross-engine gate still holds
    exactly) while shuffling 8-byte longs instead of shingle text and
    comparing integers instead of strings.

    The within-bucket pair expansion + Jaccard verify run fused inside
    ONE vectorized numpy kernel over the collected buckets instead of
    the generic _bucket_pairs HOF expansion: on dup-heavy corpora a
    bucket of b members expands to b(b-1)/2 candidate rows each paying
    a JVM array_intersect + array_union hash-set build (25.4M
    candidates / ~21 s at bench sf1.0), while the kernel computes the
    same intersection counts with one factorize + 0/1-matrix matmul
    per bucket and never materializes non-passing pairs. Identical
    results: integer intersection counts are exact, |A∪B| =
    |A|+|B|-|A∩B| for distinct arrays, and the float64 division
    matches Spark's double division bit-for-bit."""
    from pyspark.sql import types as T

    # tokenize -> md5 token hash -> shingle combine -> distinct ->
    # minhash -> band bucket, all fused in one numpy/hashlib kernel
    # over the Spark-normalized text (normalization stays JVM-side so
    # Java regex/lowercase semantics are preserved). Arithmetic is the
    # exact integer pipeline of token_hash_expr /
    # shingle_hashes_from_tokens / minhash_from_hashes / _band_buckets
    # (md5 is md5, int64 mod arithmetic is engine-independent; shingle
    # sets are emitted SORTED, which no consumer observes: minhash and
    # Jaccard are order-free and the bucket sort key is the doc key).
    # A per-task token->hash cache exploits vocabulary repetition the
    # JVM expression path cannot see; measured 3.5 s -> 1.1 s for the
    # banded stage at bench sf1.0.
    #
    # When no max_bucket cap is set, each member additionally carries
    # its packed ALL-band bucket hashes ("hb", bands x int64 = 32 B on
    # top of the ~hundreds-of-bytes shingle payload) so the verify
    # kernel can emit each pair only from its FIRST shared band: a doc
    # sits in exactly one bucket per band and one bucket row exists
    # per (band, bucket), so first-shared-band emission makes the pair
    # stream globally unique and the trailing distinct() exchange is
    # dropped outright. With a max_bucket cap the invariant breaks (a
    # skipped band-0 bucket must not suppress the band-1 emission), so
    # that path keeps the generic emit + distinct().
    first_band_dedup = max_bucket is None
    nt = _parallelize(df).select(F.col(key), normalized_text(F.col(text)).alias("_nt"))
    key_dt = df.schema[key].dataType
    banded_fields = [
        T.StructField(key, key_dt),
        T.StructField("sh", T.BinaryType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("bucket", T.LongType()),
    ]
    if first_band_dedup:
        banded_fields.append(T.StructField("hb", T.BinaryType()))
    banded = nt.mapInPandas(
        _banded_signature_kernel(
            key, shingle_n, num_hashes, bands, rows_per_band, emit_hb=first_band_dedup
        ),
        T.StructType(banded_fields),
    )

    # same bucket-collect shape as _bucket_pairs: sort_array fixes the
    # deterministic a < b member order; key/set columns are extracted
    # from the SAME sorted struct array so they stay aligned (keys are
    # unique within a bucket — one bucket per doc per band — so the
    # extra struct fields never affect the sort order)
    item_fields = [F.col(key).alias("a"), F.col("sh").alias("s")]
    if first_band_dedup:
        item_fields.append(F.col("hb").alias("h"))
    buckets = (
        banded.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list(F.struct(*item_fields))).alias("_ms"))
        .where(F.size("_ms") >= 2)
    )
    if max_bucket is not None:
        buckets = buckets.where(F.size("_ms") <= max_bucket)
    # NO explicit repartition here (unlike _bucket_pairs): the bucket
    # rows carry the sh payloads, so a parallelism-pinning repartition
    # re-shuffles the full payload a second time (~340 MB / 0.4 s at
    # bench sf1.0). AQE's default parallelismFirst keeps the groupBy
    # output at full parallelism whenever the bucket table exceeds
    # ~minPartitionSize x parallelism (32 MB at defaults) — below
    # that, the kernel work a coalesced partition holds is small by
    # the same byte bound.
    bucket_out = [F.col("_ms.a").alias("ks"), F.col("_ms.s").alias("ss")]
    if first_band_dedup:
        bucket_out = [F.col("band")] + bucket_out + [F.col("_ms.h").alias("hs")]
    bucket_cols = buckets.select(*bucket_out)

    out_schema = T.StructType(
        [
            T.StructField("a", key_dt),
            T.StructField("b", key_dt),
            T.StructField("jaccard", T.DoubleType()),
        ]
    )
    out = bucket_cols.mapInPandas(
        _bucket_jaccard_verify(threshold, band_dedup=first_band_dedup), out_schema
    )
    # first-band dedup makes the pair stream provably unique (see
    # above), so distinct() would be an identity shuffle — skip it
    return out if first_band_dedup else out.distinct()


def _banded_signature_kernel(
    key: str,
    shingle_n: int,
    num_hashes: int,
    bands: int,
    rows_per_band: int,
    emit_hb: bool = False,
):
    """Kernel factory for the fused signature+banding stage: rows of
    (key, _nt normalized text) -> ``bands`` rows of (key, sh, band,
    bucket) per doc — plus, when ``emit_hb``, the doc's packed
    all-band bucket hashes (bands x native int64 bytes) for the verify
    kernel's first-shared-band pair dedup.

    Bit-exact replay of the SQL pipeline it replaces (see call site):
    * token hash = int64(md5(token)[:15 hex]) % M31, one md5 per
      DISTINCT token thanks to the per-task cache;
    * shingle_i = sum_j(th[i+j] * w_j % M31) % M31 over a flat
      segment-indexed array (short docs < n tokens take the exact
      sequential (acc * base + h) % M31 fold in python ints);
    * per-doc distinct via one flat sort of (doc_idx << 31 | gram);
    * minhash sig_i = min((a_i * h + b_i) % M31) via minimum.reduceat;
    * bucket = int64(md5(",".join(band slice as decimal))[:15]) —
      identical strings, identical md5.
    Docs with NULL text are skipped: the SQL form carries them to the
    verify step where every jaccard involving a NULL set is NULL and
    filtered — no output either way."""
    import hashlib

    import numpy as np
    import pandas as pd

    M = MERSENNE31
    W = [np.int64(w) for w in shingle_weights(shingle_n)]
    AS = [np.int64(_MINHASH_A * (i + 1) % M) for i in range(num_hashes)]
    BS = [np.int64(_MINHASH_B * (i + 1) % M) for i in range(num_hashes)]
    BFMT = ",".join(["%d"] * rows_per_band)

    def run(batches):
        from rio_toa_spark.operators.batching import coalesce_batches

        md5 = hashlib.md5
        cache: dict = {}
        bcache: dict = {}

        def tokh(t):
            h = cache.get(t)
            if h is None:
                h = int(md5(t.encode("utf-8")).hexdigest()[:15], 16) % M
                cache[t] = h
            return h

        import itertools

        for pdf in coalesce_batches(batches):
            keys_in = pdf[key].to_numpy()
            texts = pdf["_nt"].tolist()
            doc_keys = []
            tok_lists = []
            counts_l = []
            for ki, t in zip(keys_in, texts):
                if t is None:
                    continue
                toks = t.split(" ")
                doc_keys.append(ki)
                tok_lists.append(toks)
                counts_l.append(len(toks))
            n_docs = len(doc_keys)
            if not n_docs:
                continue
            counts = np.asarray(counts_l, np.int64)
            # factorize the whole batch's token stream in C, md5 only
            # the batch-unique tokens (plus the per-task cache): the
            # per-token python generator path measured ~2µs/token
            flat_tokens = np.asarray(
                list(itertools.chain.from_iterable(tok_lists)), dtype=object
            )
            codes, uniques = pd.factorize(flat_tokens)
            uh = np.fromiter((tokh(u) for u in uniques), np.int64, len(uniques))
            flat = uh[codes]
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))

            # shingle grams over the flat array: positions whose window
            # stays inside one doc (docs with < n tokens handled below)
            gcounts = np.maximum(counts - (shingle_n - 1), 0)
            gtotal = int(gcounts.sum())
            if gtotal:
                gdoc = np.repeat(np.arange(n_docs), gcounts)
                gstarts = np.concatenate(([0], np.cumsum(gcounts)[:-1]))
                gpos = np.repeat(starts, gcounts) + (
                    np.arange(gtotal) - np.repeat(gstarts, gcounts)
                )
                grams = (flat[gpos] * W[0]) % M
                for j in range(1, shingle_n):
                    grams = grams + (flat[gpos + j] * W[j]) % M
                grams %= M
            else:
                gdoc = np.empty(0, np.int64)
                grams = np.empty(0, np.int64)
            # short docs: exact sequential fold in python ints
            short = np.nonzero(counts < shingle_n)[0]
            if short.size:
                sdoc, sgram = [], []
                for d in short:
                    acc = 0
                    for h in flat[starts[d] : starts[d] + counts[d]]:
                        acc = (acc * _SHINGLE_BASE + int(h)) % M
                    sdoc.append(d)
                    sgram.append(acc)
                gdoc = np.concatenate([gdoc, np.asarray(sdoc, np.int64)])
                grams = np.concatenate([grams, np.asarray(sgram, np.int64)])
            # per-doc distinct (sorted; no consumer observes order)
            keyed = (gdoc << np.int64(31)) | grams
            keyed = np.sort(keyed)
            keep = np.concatenate(([True], keyed[1:] != keyed[:-1]))
            kept = keyed[keep]
            udoc = kept >> np.int64(31)
            uval = kept & np.int64((1 << 31) - 1)
            ucounts = np.bincount(udoc, minlength=n_docs)
            ustarts = np.concatenate(([0], np.cumsum(ucounts)[:-1]))

            # minhash: k permutation passes + segment mins
            sig = np.empty((num_hashes, n_docs), np.int64)
            for i in range(num_hashes):
                p = (AS[i] * uval + BS[i]) % M
                sig[i] = np.minimum.reduceat(p, ustarts)

            # band buckets: md5 of the comma-joined decimal band slice.
            # The per-doc string is built with one C-level %-format
            # over python ints (tolist) instead of a str() generator
            # per element (~1.6x), and a per-task slice-bytes cache
            # skips format+md5 entirely for repeated band slices —
            # near-dup corpora repeat slices heavily (that is exactly
            # what makes them candidates), and md5 of equal strings is
            # equal, so the cache is exact.
            bucket = np.empty((bands, n_docs), np.int64)
            for b in range(bands):
                rows = np.ascontiguousarray(
                    sig[b * rows_per_band : (b + 1) * rows_per_band].T
                )
                cols = rows.tolist()
                out_b = bucket[b]
                bget = bcache.get
                for d in range(n_docs):
                    kb = rows[d].tobytes()
                    v = bget(kb)
                    if v is None:
                        v = int(
                            md5((BFMT % tuple(cols[d])).encode()).hexdigest()[:15], 16
                        )
                        bcache[kb] = v
                    out_b[d] = v

            # pack each doc's sorted distinct shingle set as raw
            # little-endian int32 bytes: the payload crosses the band
            # shuffle as one binary cell instead of a nested int array
            # (smaller UnsafeRow, far cheaper Arrow->pandas on the
            # bucket side), and byte-equality class dedup gets its key
            # for free
            shb = uval.astype("<i4").tobytes()
            ends = ucounts.cumsum() * 4
            sh_arrays = [
                shb[int(e - c * 4) : int(e)] for c, e in zip(ucounts, ends)
            ]
            dk = np.asarray(doc_keys)
            out = {
                key: np.tile(dk, bands),
                "sh": pd.Series(
                    [sh_arrays[d] for _ in range(bands) for d in range(n_docs)],
                    dtype=object,
                ),
                "band": np.repeat(np.arange(bands, dtype=np.int32), n_docs),
                "bucket": bucket.reshape(-1),
            }
            if emit_hb:
                # packed per-doc all-band bucket hashes (native int64
                # bytes — produced and consumed python-side only)
                hrows = np.ascontiguousarray(bucket.T)
                hb_list = [hrows[d].tobytes() for d in range(n_docs)]
                out["hb"] = pd.Series(
                    [hb_list[d] for _ in range(bands) for d in range(n_docs)],
                    dtype=object,
                )
            yield pd.DataFrame(out)

    return run


def _bucket_jaccard_verify(threshold: float, band_dedup: bool = False):
    """Kernel factory: per bucket row (ks = member keys sorted, ss =
    aligned shingle-hash sets), emit every member pair (a, b, jaccard)
    with a before b in bucket order and jaccard >= threshold.

    Exactness: identical sets are collapsed to one representative
    class first (byte-equality — conservative: only arrays with equal
    element ORDER collapse, which is exactly the identical-text case),
    so the intersection matmul runs over R distinct sets, not b
    members; class-level jaccards are then fanned back out to member
    pairs by pure index arithmetic. J(A,A) = |A|/|A| = 1.0 exactly in
    both engines (0/0 -> NaN fails the threshold, also both engines).
    A null set (null text upstream) makes every jaccard involving it
    NULL in the SQL form, which the >= filter drops — the kernel skips
    such members for the same result.

    ``band_dedup``: bucket rows additionally carry (band, hs = packed
    per-member all-band bucket hashes); a passing pair is emitted ONLY
    when no band before this row's band is also shared by both members
    (equal band slice <=> equal bucket hash — the md5 is a pure
    function of the slice, and candidate grouping keys on that same
    hash). Each pair then leaves the kernel exactly once globally —
    from its first shared band — so the caller can drop its distinct()
    exchange. The jaccard value is band-independent, so WHICH band
    emits is unobservable in the result."""
    import numpy as np
    import pandas as pd

    # cached upper-triangle index pairs per bucket size (bucket sizes
    # repeat heavily; np.triu_indices is ~40% of the lean path's cost)
    _triu_cache: dict = {}

    def _triu(b):
        iu = _triu_cache.get(b)
        if iu is None:
            iu = np.triu_indices(b, 1)
            _triu_cache[b] = iu
        return iu

    def _emit_bucket_lean(n, ss, thr, out_i, out_x, out_j):
        """Fast path for ordinary buckets: no identical-set collapse
        (measured: 99.8% of bench buckets have zero byte-identical
        members, so the class machinery is pure per-bucket overhead),
        one factorize + one matmul + one vectorized triu emission.
        Arithmetic identical to the class path: exact integer
        intersection counts, float64 division. Emits POSITIONS (i < j
        in sorted bucket order); the caller maps them to keys."""
        arrs = [np.frombuffer(s, np.int32) for s in ss]
        lens = np.fromiter((a.size for a in arrs), np.int64, n)
        allv = np.concatenate(arrs)
        uniq, inv = np.unique(allv, return_inverse=True)
        M = np.zeros((n, uniq.size), np.float32)
        M[np.repeat(np.arange(n), lens), inv] = 1.0
        inter = (M @ M.T).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            jac = inter / (lens[:, None] + lens[None, :] - inter)
        iu, ju = _triu(n)
        jv = jac[iu, ju]
        keep = jv >= thr  # NaN (0/0) compares False, like SQL NULL/NaN
        if keep.any():
            out_i.append(iu[keep])
            out_x.append(ju[keep])
            out_j.append(jv[keep])

    def run(batches):
        from rio_toa_spark.operators.batching import coalesce_batches

        for pdf in coalesce_batches(batches):
            out_a: list = []
            out_b: list = []
            out_j: list = []
            ks_col = pdf["ks"].to_numpy()
            ss_col = pdf["ss"].to_numpy()
            if band_dedup:
                band_col = pdf["band"].to_numpy()
                hs_col = pdf["hs"].to_numpy()
            for r in range(len(ks_col)):
                ks = np.asarray(ks_col[r])
                ss = ss_col[r]
                idx_i: list = []
                idx_x: list = []
                jtmp: list = []
                # big buckets go through the identical-set-collapse
                # path (it bounds the matmul by R distinct sets — the
                # degenerate giant-bucket case it exists for); small
                # buckets take the lean path unless a NULL set needs
                # the guarded handling
                if len(ks) <= 64 and all(s is not None for s in ss):
                    _emit_bucket_lean(len(ks), ss, threshold, idx_i, idx_x, jtmp)
                else:
                    _emit_bucket(len(ks), ss, threshold, idx_i, idx_x, jtmp)
                if not idx_i:
                    continue
                hmat = None
                if band_dedup and band_col[r]:
                    hmat = np.frombuffer(
                        b"".join(hs_col[r]), np.int64
                    ).reshape(len(ks), -1)[:, : int(band_col[r])]
                # map positions to keys segment-by-segment (lean
                # buckets emit exactly one segment; class buckets may
                # emit many — per-segment mapping avoids a per-bucket
                # concatenate copy of the full emission)
                for s in range(len(idx_i)):
                    ia, ib, jv = idx_i[s], idx_x[s], jtmp[s]
                    if hmat is not None:
                        keep = ~(hmat[ia] == hmat[ib]).any(axis=1)
                        if not keep.all():
                            ia, ib, jv = ia[keep], ib[keep], jv[keep]
                            if not ia.size:
                                continue
                    out_a.append(ks[ia])
                    out_b.append(ks[ib])
                    out_j.append(jv)
            if out_a:
                yield pd.DataFrame(
                    {
                        "a": np.concatenate(out_a),
                        "b": np.concatenate(out_b),
                        "jaccard": np.concatenate(out_j),
                    }
                )
            else:
                yield pd.DataFrame(
                    {"a": pd.Series(dtype=object), "b": pd.Series(dtype=object),
                     "jaccard": pd.Series(dtype=np.float64)}
                )

    def _emit_bucket(n, ss, thr, out_i, out_x, out_j):
        # collapse byte-identical sets into classes; emits POSITIONS
        # like the lean path (the caller maps them to keys)
        class_of = {}
        reps: list = []
        cls_idx = np.empty(n, np.int64)
        for i, s in enumerate(ss):
            if s is None:
                cls_idx[i] = -1  # null set: every pair involving it drops
                continue
            kb = bytes(s)  # packed <i4 bytes ARE the class key
            c = class_of.get(kb)
            if c is None:
                c = len(reps)
                class_of[kb] = c
                reps.append(np.frombuffer(kb, np.int32).astype(np.int64))
            cls_idx[i] = c
        R = len(reps)
        if R == 0:
            return
        lens = np.array([r.size for r in reps], dtype=np.int64)
        if R == 1:
            inter = lens.reshape(1, 1).astype(np.float64)
        else:
            allv = np.concatenate(reps)
            uniq, inv = np.unique(allv, return_inverse=True)
            # 0/1 membership matrix; float32 matmul is exact for
            # integer counts < 2^24 (set sizes are far smaller)
            M = np.zeros((R, uniq.size), np.float32)
            M[np.repeat(np.arange(R), lens), inv] = 1.0
            inter = (M @ M.T).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            union = lens[:, None] + lens[None, :] - inter
            jacm = inter / union  # float64 / float64 of exact ints ==
            # Spark's int->double cast + double divide
        passing = jacm >= thr  # NaN (0/0) compares False, like SQL NULL/NaN
        # member positions per class, in sorted bucket order
        order = np.argsort(cls_idx, kind="stable")
        counts = np.bincount(cls_idx[cls_idx >= 0], minlength=R)
        n_null = int((cls_idx < 0).sum())
        starts = np.concatenate(([n_null], n_null + np.cumsum(counts)))
        members = [order[starts[c] : starts[c + 1]] for c in range(R)]
        singles = counts == 1
        # vectorized case: both classes singleton, p < q passing
        if R > 1:
            pp, qq = np.nonzero(np.triu(passing, 1) & np.outer(singles, singles))
            if pp.size:
                pos_single = np.full(R, -1, np.int64)
                pos_single[singles] = np.array(
                    [members[c][0] for c in np.nonzero(singles)[0]], np.int64
                )
                ai = pos_single[pp]
                bi = pos_single[qq]
                lo = np.minimum(ai, bi)
                hi = np.maximum(ai, bi)
                out_i.append(lo)
                out_x.append(hi)
                out_j.append(jacm[pp, qq])
        # loop cases: intra-class pairs and cross pairs with a multi class
        for p in range(R):
            mp = members[p]
            if counts[p] >= 2 and passing[p, p]:
                iu, ju = np.triu_indices(counts[p], 1)
                out_i.append(mp[iu])
                out_x.append(mp[ju])
                out_j.append(np.full(iu.size, jacm[p, p]))
            if counts[p] == 1:
                continue
            for q in range(p + 1, R):
                if not passing[p, q] or (counts[q] == 1 and counts[p] == 1):
                    continue
                mq = members[q]
                gi = np.repeat(mp, counts[q])
                gj = np.tile(mq, counts[p])
                lo = np.minimum(gi, gj)
                hi = np.maximum(gi, gj)
                out_i.append(lo)
                out_x.append(hi)
                out_j.append(np.full(gi.size, jacm[p, q]))
        # cross pairs where p is singleton but q is multi (skipped above
        # by the `continue`): handle symmetrically
        for p in range(R):
            if counts[p] != 1:
                continue
            mp = members[p]
            for q in range(p + 1, R):
                if counts[q] == 1 or not passing[p, q]:
                    continue
                mq = members[q]
                gi = np.repeat(mp, counts[q])
                gj = mq
                lo = np.minimum(gi, gj)
                hi = np.maximum(gi, gj)
                out_i.append(lo)
                out_x.append(hi)
                out_j.append(np.full(gj.size, jacm[p, q]))

    return run


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
    df: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    shingle_n: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs sharing at least one identical SimHash byte-band,
    verified exactly with bit_count(xor) <= max_hamming.

    Recall contract (pigeonhole over 4 bands): a pair is GUARANTEED to
    share a band only when hamming <= 3; for 3 < max_hamming the
    banding is a standard LSH recall/cost trade — pairs whose >= 4
    differing bits spread across all four bands are not candidates.
    Raise n_bands (narrower bands) for guaranteed recall at higher
    radii. The DuckDB oracle twin mirrors the identical candidate
    condition, so the correctness gate checks the implemented
    semantics, not full-radius recall.

    Same single-pass groupBy(bucket) + within-bucket expansion shape
    as lsh_candidate_pairs — one shuffle, no cache, no signature
    recompute."""
    n_bands = 4
    band_width = bits // n_bands
    sig_df = _parallelize(df).select(
        F.col(key), simhash(F.col(text), bits, shingle_n=shingle_n).alias("sig")
    )
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
    ).select(key, "sig", "bb.band", "bb.bucket")
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        _bucket_pairs(
            banded, ["band", "bucket"], key,
            payload="sig", payload_a="sa", payload_b="sb", max_bucket=max_bucket,
        )
        .where(hamming <= max_hamming)
        .select("a", "b", hamming.alias("hamming"))
        .distinct()
    )


def embedding_near_dups(
    emb_df: DataFrame,
    key: str = "vec_id",
    vec: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs.

    Candidates: sign-random-projection LSH — deterministic hyperplanes
    h_j from md5 of (j, dim index); docs sharing the full sign
    signature land in one bucket. Exact cosine verifies. At 100 TB the
    bucket join replaces the cross join; brute force remains available
    through similarity.cosine_topk for small dims.
    """
    # cast to double BEFORE the multiply: float32*float32 rounds to
    # float32 while the DuckDB oracle twin multiplies doubles — the
    # explicit cast makes both engines do the identical double ops
    norm = F.sqrt(
        F.aggregate(
            F.col(vec), F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
        )
    )
    # HOF rule (see CLAUDE.md): an expression referenced inside a
    # transform lambda is re-evaluated per element — embedding the
    # norm fold there would be O(d^2) per row. array_repeat evaluates
    # the fold ONCE per row and zip_with's lambda then touches only
    # bound values.
    norm_arr = F.array_repeat(norm, F.size(F.col(vec)))
    normed = _parallelize(emb_df).select(
        F.col(key),
        F.zip_with(F.col(vec), norm_arr, lambda x, n: x.cast("double") / n).alias("_v"),
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
    # groupBy(signature) + within-bucket expansion: the normalization
    # and 8-plane signature run once per vector (a bucket self-join
    # would run them twice); buckets are tiny because a full n_planes
    # sign match is required
    bucketed = normed.withColumn("_sig", sig)
    cos = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return (
        _bucket_pairs(
            bucketed, ["_sig"], key,
            payload="_v", payload_a="va", payload_b="vb", max_bucket=max_bucket,
        )
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def duplicate_clusters(
    pairs_df: DataFrame,
    a: str = "a",
    b: str = "b",
    max_iter: int = 25,
    on_max_iter: str = "raise",
    storage_level=None,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph:
    (node, cluster_id) with cluster_id = the minimum node id reachable
    through pair edges — the step that turns LSH/SimHash/embedding
    PAIRS into duplicate CLUSTERS a pipeline can act on.

    Min-label propagation with pointer-doubling: every node starts
    labeled with itself; each round a node (1) adopts the smallest
    label among itself and its neighbors (one hop), then (2) adopts
    its candidate label's OWN current label (the shortcut — a label is
    always a component node id, so this lookup is a self-join on the
    label table). The shortcut roughly doubles how far labels travel
    per round, so rounds needed = O(log diameter), not O(diameter) —
    the difference between 40+ rounds and ~7 on an adversarial
    million-node chain. Near-dup graphs are near-cliques anyway, and
    the label table is one row per node APPEARING IN PAIRS (orders of
    magnitude smaller than the corpus). Each round is two equi-joins +
    one hash-aggregate on that small table; ``localCheckpoint``
    truncates the growing lineage so round N's plan does not replay
    rounds 1..N-1 (the classic iterative-DataFrame trap). Raises if
    not converged by ``max_iter`` rather than returning a
    silently-partial clustering.

    Fixpoint = correct: edges are symmetrized, so at convergence both
    endpoints of every edge hold equal labels -> a component is
    uniformly labeled; labels only ever take component-node values and
    only decrease from each node's own id, so the uniform value is the
    component minimum.

    ``storage_level`` sets the StorageLevel of each round's
    localCheckpoint (default: Spark's MEMORY_AND_DISK) — pass e.g.
    StorageLevel.DISK_ONLY when executor memory is contended at scale;
    the checkpoint blocks are executor-local either way (lineage
    truncation, not fault tolerance — a lost executor fails the job,
    which resumable callers retry).

    ``on_max_iter``: 'raise' (default) refuses to return a clustering
    that may still be merging; 'partial' returns the current labels —
    a SAFE partial result for dedup (labels can only UNDER-merge: two
    nodes of one component may still hold different labels, so a
    downstream keep-one-per-cluster drops fewer rows, never a wrong
    row), for operators who prefer progress over an exception.
    """
    if on_max_iter not in ("raise", "partial"):
        raise ValueError("on_max_iter must be 'raise' or 'partial', got %r" % on_max_iter)
    ckpt = {"storageLevel": storage_level} if storage_level is not None else {}
    edges = pairs_df.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    edges = (
        edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False, **ckpt)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=False, **ckpt)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node2"))
            .agg(F.min("label").alias("nlabel"))
        )
        stepped = labels.join(
            neighbor_min, labels.node == neighbor_min.node2, "left"
        ).select(
            "node",
            "label",
            F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("cand"),
        )
        # pointer doubling: cand is a node id, so labels[cand] exists
        # and is <= cand; adopting it doubles the propagation distance
        lookup = labels.select(
            F.col("node").alias("lnode"), F.col("label").alias("llabel")
        )
        joined = stepped.join(lookup, stepped.cand == lookup.lnode, "left").select(
            "node",
            "label",
            F.least(F.col("cand"), F.coalesce("llabel", "cand")).alias("new_label"),
        )
        # one pass computes both the new labels and the changed count
        from pyspark.sql import Observation

        obs = Observation()
        labels = (
            joined.observe(
                obs, F.sum((F.col("new_label") < F.col("label")).cast("long")).alias("changed")
            )
            .select("node", F.col("new_label").alias("label"))
            .localCheckpoint(eager=True, **ckpt)  # materializes -> obs is filled
        )
        if obs.get["changed"] == 0:
            return labels
    if on_max_iter == "partial":
        import warnings

        warnings.warn(
            "duplicate_clusters: not converged after %d rounds; returning the "
            "partial (under-merged, never wrong-merged) labels" % max_iter,
            stacklevel=2,
        )
        return labels
    raise ValueError(
        "duplicate_clusters did not converge in %d rounds — component "
        "diameter exceeds the cap; raise max_iter" % max_iter
    )


def drop_duplicates_clustered(
    df: DataFrame,
    pairs_df: DataFrame,
    key: str = "doc_id",
    a: str = "a",
    b: str = "b",
) -> DataFrame:
    """Keep exactly one representative (the min key) of every duplicate
    cluster and every unpaired row: the end-to-end drop step after any
    candidate+verify pipeline. Non-representative members are removed
    with a broadcast-able anti-join on the (small) cluster table."""
    clusters = duplicate_clusters(pairs_df, a=a, b=b)
    losers = clusters.where(F.col("node") != F.col("label")).select(
        F.col("node").alias(key)
    )
    return df.join(losers, key, "left_anti")
