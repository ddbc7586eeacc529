"""Training-data pipeline operators over the driver-provided
documents/embeddings tables: text extraction invariant, quality/lang
features, dedup family, similarity search — each checked against an
independent Python/duckdb computation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rio_toa_spark.operators import dedup, similarity, textstats

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_extract_text_byte_identical(spark, pages_df):
    out = textstats.with_extracted_text(pages_df)
    bad = out.where(F.col("extracted_text") != F.col("text")).count()
    assert bad == 0
    # bytes, not just string equality
    rows = out.select("extracted_text", "text").limit(50).collect()
    for r in rows:
        assert r.extracted_text.encode("utf-8") == r.text.encode("utf-8")


def test_portable_hash_matches_duckdb(spark, docs):
    import duckdb

    got = {
        r.doc_id: r.h
        for r in docs.select("doc_id", textstats.portable_hash64(F.col("text")).alias("h")).collect()
    }
    con = duckdb.connect()
    expected = {
        d: h
        for d, h in con.sql(
            "SELECT doc_id, CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) "
            f"FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    }
    assert got == expected


def test_token_count_matches_python(spark, docs):
    import re

    rows = docs.select("doc_id", "text", textstats.token_count(F.col("text")).alias("n")).collect()
    for r in rows[:100]:
        assert r.n == len(re.findall(r"[A-Za-z0-9]+", r.text))


def test_quality_features_ranges(spark, docs):
    out = textstats.quality_features(docs).collect()
    for r in out:
        assert 0.0 <= r.punct_ratio <= 1.0
        assert 0.0 <= r.stopword_ratio <= 1.0
        assert r.n_tokens >= 0


def test_detect_language_returns_known_lang(spark, docs):
    out = textstats.detect_language(docs).select("lang_pred").distinct().collect()
    assert {r.lang_pred for r in out} <= set(textstats.LANG_PROFILES)


def test_exact_dedup_counts(spark, docs):
    """Representatives count == distinct normalized text count; dup
    counts sum to total rows."""
    out = dedup.exact_dedup(docs).collect()
    import re

    texts = [r.text for r in docs.select("text").collect()]
    normed = {re.sub(r"\s+", " ", t.strip().lower()) for t in texts}
    assert len(out) == len(normed)
    assert sum(r.dup_count for r in out) == len(texts)


def test_shingles_and_jaccard_exact(spark, docs):
    """ngram_jaccard on forced candidate pairs equals a python oracle."""
    rows = docs.limit(12).collect()
    pairs = [(a.doc_id, b.doc_id) for a in rows for b in rows if a.doc_id < b.doc_id][:30]
    pair_df = spark.createDataFrame(pairs, ["a", "b"])
    out = dedup.ngram_jaccard_pairs(docs, pairs=pair_df, threshold=0.0).collect()

    import re

    def sh(t, n=3):
        tokens = re.sub(r"\s+", " ", t.strip().lower()).split(" ")
        if len(tokens) < n:
            return {" ".join(tokens)}
        return {" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)}

    texts = {r.doc_id: r.text for r in rows}
    expected = {}
    for a, b in pairs:
        A, B = sh(texts[a]), sh(texts[b])
        expected[(a, b)] = len(A & B) / len(A | B)
    got = {(r.a, r.b): r.jaccard for r in out}
    assert set(got) == set(expected)
    for kk in expected:
        assert got[kk] == pytest.approx(expected[kk], abs=1e-12)


def test_minhash_lsh_finds_planted_dups(spark, docs):
    """Plant near-duplicates (append one word) and verify LSH+verify
    recovers them."""
    base = docs.limit(20)
    dups = base.withColumn("doc_id", F.col("doc_id") + 100000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" tail"))
    )
    corpus = base.unionByName(dups)
    verified = dedup.ngram_jaccard_pairs(corpus, threshold=0.7)
    got = {(r.a, r.b) for r in verified.collect()}
    planted = {(r.doc_id, r.doc_id + 100000) for r in base.collect()}
    # LSH is probabilistic but 16 hashes / 4 bands on ~0.9 jaccard
    # recovers nearly all planted pairs
    assert len(got & planted) >= int(len(planted) * 0.8)


def test_simhash_near_dups_planted(spark, docs):
    base = docs.limit(20)
    dups = base.withColumn("doc_id", F.col("doc_id") + 100000)  # identical text
    corpus = base.unionByName(dups)
    out = dedup.simhash_near_dups(corpus, max_hamming=0)
    got = {(r.a, r.b) for r in out.collect()}
    planted = {(r.doc_id, r.doc_id + 100000) for r in base.collect()}
    assert planted <= got


def test_cosine_topk_matches_numpy(spark, embs):
    corpus = embs.limit(200).cache()
    q_rows = corpus.limit(3).collect()
    queries = spark.createDataFrame(
        [(r.vec_id, r.embedding) for r in q_rows], ["q_id", "q_vec"]
    )
    out = similarity.cosine_topk(corpus, queries, k=5).collect()

    mat = np.array([r.embedding for r in corpus.collect()])
    ids = np.array([r.vec_id for r in corpus.collect()])
    for q in q_rows:
        qv = np.array(q.embedding)
        cos = mat @ qv / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qv))
        order = sorted(zip(-cos, ids))[:5]
        expected = [int(i) for _, i in order]
        got = [r.vec_id for r in sorted((r for r in out if r.q_id == q.vec_id), key=lambda r: r.rank)]
        assert got == expected


def test_ivf_recall_reasonable(spark, embs):
    corpus = embs.limit(300).cache()
    q_rows = corpus.limit(5).collect()
    queries = spark.createDataFrame(
        [(r.vec_id, r.embedding) for r in q_rows], ["q_id", "q_vec"]
    )
    exact = similarity.cosine_topk(corpus, queries, k=5).collect()
    approx = similarity.cosine_topk_ivf(corpus, queries, k=5, n_centroids=8, n_probe=3).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.q_id, set()).add(r.vec_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.q_id, set()).add(r.vec_id)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q]) for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.6


def test_embedding_near_dups_planted(spark, embs):
    base = embs.limit(30)
    dups = base.withColumn("vec_id", F.col("vec_id") + 100000)
    corpus = base.unionByName(dups)
    out = dedup.embedding_near_dups(corpus, threshold=0.999)
    got = {(r.a, r.b) for r in out.collect()}
    planted = {(r.vec_id, r.vec_id + 100000) for r in base.collect()}
    assert planted <= got


def test_lsh_max_bucket_skips_degenerate_buckets(spark, docs):
    """A giant exact-duplicate class would expand O(n^2) inside one
    bucket row; max_bucket skips it (recall trade documented)."""
    base = docs.limit(4)
    clones = base
    for i in range(1, 30):
        clones = clones.unionByName(base.withColumn("doc_id", F.col("doc_id") + 1000 * i))
    # 4 duplicate classes of size 30 -> capped run finds none of those
    # pairs, uncapped finds all C(30,2)*4
    capped = dedup.ngram_jaccard_pairs(clones, threshold=0.9, max_bucket=10)
    full = dedup.ngram_jaccard_pairs(clones, threshold=0.9)
    assert capped.count() == 0
    assert full.count() == 4 * (30 * 29) // 2


def test_lsh_first_band_dedup_equivalent(spark, docs):
    """The uncapped fused path emits each pair only from its FIRST
    shared band and drops the distinct() exchange; the capped path
    (max_bucket set, here effectively uncapped at 10^9) keeps the
    generic every-band emission + distinct. Both must produce the
    identical pair multiset, and the first-band stream must already be
    duplicate-free (that is the invariant that justified removing
    distinct())."""
    base = docs.limit(40)
    dups = base.withColumn("doc_id", F.col("doc_id") + 100000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" tail"))
    )
    corpus = base.unionByName(dups)
    fused = dedup.ngram_jaccard_pairs(corpus, threshold=0.5)
    generic = dedup.ngram_jaccard_pairs(corpus, threshold=0.5, max_bucket=10**9)
    got = sorted((r.a, r.b, r.jaccard) for r in fused.collect())
    ref = sorted((r.a, r.b, r.jaccard) for r in generic.collect())
    assert got == ref
    assert got, "planted near-dups must yield pairs"
    assert len(got) == len({(a, b) for a, b, _ in got})


def test_detect_language_known_snippets(spark):
    from rio_toa_spark.operators import textstats

    samples = [
        (1, "the cat sat on the mat and it was happy for the day", "en"),
        (2, "der hund ist nicht mit der katze auf das sofa", "de"),
        (3, "le chat est dans les jardins pour la nuit et les fleurs", "fr"),
        (4, "el perro es de los gatos que por una casa con para", "es"),
        (5, "che cosa sono per non con della anche come nel tempo", "it"),
        (6, "de casa que para com uma por mais como mas dos livros", "pt"),
        (7, "het huis is een van dat niet met voor zijn maar ook", "nl"),
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in samples], "doc_id int, text string")
    got = {r.doc_id: r.lang_pred for r in textstats.detect_language(df).collect()}
    assert got == {i: want for i, _, want in samples}


def test_detect_language_ngram_known_snippets(spark):
    # char-trigram profiles must classify morphology-bearing text even
    # where stopword lists are sparse; tie-break contract matches
    # detect_language (largest lang name wins on equal scores)
    from rio_toa_spark.operators import textstats

    samples = [
        (1, "the thing was standing there and the morning light was shining", "en"),
        (2, "der wanderer wandert durch die schoene landschaft und einsame strassen", "de"),
        (3, "le gouvernement que les quartiers aient entendu pendant le moment", "fr"),
        (4, "el gato pasado la semana el mercado de la ciudad que ha quedado", "es"),
        (5, "la stazione di polizia che la direzione della nazione ha scelto", "it"),
        (6, "os meninos do porto que moram da cidade falar de futebol do pais", "pt"),
        (7, "de ijsberen van een eiland eten er bij aan de rivier en de zee", "nl"),
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in samples], "doc_id int, text string")
    got = {r.doc_id: r.lang_pred for r in textstats.detect_language_ngram(df).collect()}
    assert got == {i: want for i, _, want in samples}


def test_char_trigram_scores_linear_formulation(spark):
    # the replace-length occurrence count must equal a brute-force
    # sliding-window trigram count (leftmost non-overlapping)
    from rio_toa_spark.operators import textstats

    text = "the theatre then thews the anthem then"
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    row = df.select(
        textstats.char_trigram_scores(F.col("text")).alias("s")
    ).collect()[0]

    def occurrences(t, g):
        n = i = 0
        while True:
            j = t.find(g, i)
            if j < 0:
                return n
            n += 1
            i = j + len(g)

    t = text.lower()
    for lang, grams in textstats.CHAR_TRIGRAM_PROFILES.items():
        exp = sum(occurrences(t, g) for g in grams) / (len(t) - 2)
        assert row.s[lang] == pytest.approx(exp, abs=1e-12), lang
