"""ext-topk-sim / ext-minhash-dedup / simhash / n-gram Jaccard / IVF / PQ.

Exact/SQL-expressible variants carry DuckDB oracles — including the
whole IVF/PQ ANN tier (init-derived or fixed-iteration-unrolled
constructions make train+assign+probe+search relational). The LSH
bucket-join flagships and the trained-PQ twin are rows-only and
self-verified against exact computations in tests/test_similarity.py
(planted-duplicate recovery, recall vs brute force) — per SURVEY.md §5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from k8e_fetch_spark.functions.rounding import round_fixed, sql_round
from k8e_fetch_spark.functions.vectors import cosine, cosine_arrow, l2_norm, sql_cosine
from k8e_fetch_spark.io import fan_out, load
from k8e_fetch_spark.operators.similarity import (
    ivf_assign,
    minhash_candidate_pairs,
)
from k8e_fetch_spark.queries.registry import register

_NORM_ORACLE = f"""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           {sql_round("sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))", 6)} AS l2
    FROM embeddings
"""


@register("sim_embedding_norms", oracle=_NORM_ORACLE, tags=("ext-topk-sim", "vector-fn"))
def sim_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector plumbing sanity: dimensionality + L2 norm as scan-local
    higher-order-function folds (no UDF, no shuffle)."""
    emb = load(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        round_fixed(l2_norm(F.col("embedding")), 6).alias("l2"),
    )


_TOPK_ORACLE = f"""
    SELECT q_id, n_id, rank, score FROM (
        SELECT q.vec_id AS q_id, c.vec_id AS n_id,
               {sql_round(sql_cosine('q.embedding', 'c.embedding'), 6)} AS score,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {sql_round(sql_cosine('q.embedding', 'c.embedding'), 6)} DESC, c.vec_id
               ) AS rank
        FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        WHERE q.vec_id < 8
    ) WHERE rank <= 5
"""


@register("sim_topk_cosine_exact", oracle=_TOPK_ORACLE, tags=("ext-topk-sim", "brute-force"))
def sim_topk_cosine_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for a query set: broadcast the
    (small) query side against the corpus, score JVM-side, take top-k
    per query with a window. This is the correctness baseline the
    LSH/IVF approximate paths are measured against; at 100 TB the
    brute-force form is only viable for small query batches — which is
    exactly how it is written (queries broadcast, corpus never
    shuffled)."""
    emb = load(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    corpus = emb.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_emb"))
    scored = (
        corpus.join(F.broadcast(queries_df), F.col("q_id") != F.col("n_id"))
        .withColumn("score", round_fixed(cosine_arrow(F.col("q_emb"), F.col("n_emb")), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", "n_id", "rank", "score")
    )


_PAIRS_ORACLE = f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS label,
           {sql_round(sql_cosine('a.embedding', 'b.embedding'), 6)} AS score
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {sql_round(sql_cosine('a.embedding', 'b.embedding'), 6)} > 0.3
"""


@register("sim_cosine_pairs_threshold", oracle=_PAIRS_ORACLE, tags=("ext-topk-sim", "near-dup"))
def sim_cosine_pairs_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs above a cosine threshold, blocked by
    label (the blocking key stands in for an LSH bucket: pair
    generation is a key-equality join, never an unblocked cross
    product)."""
    emb = fan_out(load(spark, sf_dir, "embeddings"))
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("label").alias("label"), F.col("embedding").alias("emb_a"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("label").alias("label"), F.col("embedding").alias("emb_b"))
    return (
        a.join(b, on="label")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("score", round_fixed(cosine_arrow(F.col("emb_a"), F.col("emb_b")), 6))
        .filter(F.col("score") > 0.3)
        .select("id_a", "id_b", "label", "score")
    )


_JACCARD_ORACLE = f"""
    WITH toks AS (SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS t FROM documents),
    shingles AS (
        SELECT DISTINCT doc_id, source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
        FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(i)
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM shingles a
        JOIN shingles b ON a.sh = b.sh AND a.source = b.source AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           {sql_round('inter * 1.0 / (sa.n + sb.n - inter)', 6)} AS jaccard
    FROM pairs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE inter * 1.0 / (sa.n + sb.n - inter) > 0.1
"""


def _hashed_gram_index(docs: DataFrame) -> DataFrame:
    """(doc_id, source, sh) inverted-index rows where ``sh`` is the
    64-bit identity of a distinct 3-word gram (multi-arg xxhash64 of
    the three tokens — no gram string is allocated, and the self-join
    shuffles 8-byte keys instead of ~30-byte strings; counts unchanged
    up to the 2^-64-per-pair collision bound discussed at
    operators.similarity.hashed_shingles — outputs verified identical
    to the string-gram form on this corpus).

    Guarded: sequence(1, n-2) runs DESCENDING [1, 0] when n < 3 and
    element_at(t, 0) is an ANSI error; short docs get no grams,
    matching the oracles' empty generate_series(1, n-2)."""
    toks = docs.select("doc_id", "source", F.split(F.trim("text"), r"\s+").alias("t"))
    idx = F.when(F.size("t") >= 3, F.sequence(F.lit(1), F.size("t") - 2)).otherwise(
        F.array().cast("array<int>")
    )
    return toks.select(
        "doc_id",
        "source",
        F.explode(
            F.array_distinct(
                F.transform(
                    idx,
                    lambda i: F.xxhash64(
                        F.element_at(F.col("t"), i),
                        F.element_at(F.col("t"), i + 1),
                        F.element_at(F.col("t"), i + 2),
                    ),
                )
            )
        ).alias("sh"),
    )


@register("dedup_ngram_jaccard", oracle=_JACCARD_ORACLE, tags=("ext-minhash-dedup", "ngram-jaccard"))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (3-word shingle) Jaccard near-dup pairs, blocked by
    source. The pair generator is an inverted-index self-join on the
    shingle (each shingle bucket yields its cofrequent doc pairs), then
    |A∩B|/|A|+|B|-|A∩B| from the per-doc shingle counts — no cross
    product, and the shingle join is exactly the exact-verification
    stage of the MinHash pipeline."""
    sh = _hashed_gram_index(fan_out(load(spark, sf_dir, "documents")))
    # NOT persisted, deliberately (measured 2.3s vs 2.9s at sf0.1 on
    # the string-gram form; still true for the cheaper long grams): the
    # three references re-run a cheap codegen'd scan+explode in parallel
    # branches, while materializing the exploded gram rows costs more
    # than recomputing them. (Contrast minhash_candidate_pairs, where
    # the persisted shingle table IS worth it — reuse there crosses a
    # shuffle boundary.)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "source", "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "source", "sh")
    pairs = (
        a.join(b, on=["source", "sh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jaccard = F.col("inter") * 1.0 / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        pairs.join(sa, on="doc_a")
        .join(sb, on="doc_b")
        .filter(jaccard > 0.1)
        .select("doc_a", "doc_b", round_fixed(jaccard, 6).alias("jaccard"))
    )


def _minhash_pairs_cte() -> str:
    """Shared CTE chain: the natural-corpus MinHash+LSH pipeline
    recomputed in DuckDB with the cross-engine md5_32 hashes — shingle
    identities, the 32 affine (a*h+b) mod p signature minima
    (coefficients inlined from the SAME _coefficients() the Spark side
    uses), 8 concat-key bands, the band-equality candidate join, and
    the exact Jaccard verify (> 0.1). Ends with ``jpairs(doc_a, doc_b,
    j)``; composed by the dedup_minhash_lsh oracle (pair output) and
    the dedup_clusters_minhash oracle (recursive connected
    components). All integer arithmetic until the final division of
    identical ints — exact, not statistical."""
    from k8e_fetch_spark.operators.similarity import MERSENNE_P, _coefficients

    coeffs = _coefficients(32)
    sig_cols = ",\n               ".join(
        f"min((h * {a} + {b}) % {MERSENNE_P}) AS s{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    band_selects = "\n        UNION ALL ".join(
        "SELECT doc_id, {bi} AS band_idx, {key} AS key FROM sig".format(
            bi=bi,
            key=" || ',' || ".join(
                f"CAST(s{bi * 4 + j} AS VARCHAR)" for j in range(4)
            ),
        )
        for bi in range(8)
    )
    return f"""
    toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc_id,
               CAST(('0x' || substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 8)) AS BIGINT) AS h
        FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(i)
        WHERE len(t) >= 3
        UNION
        SELECT doc_id, CAST(('0x' || substr(md5(trim(text)), 1, 8)) AS BIGINT) AS h
        FROM documents
        WHERE len(string_split_regex(trim(text), '\\s+')) < 3
    ),
    sig AS (
        SELECT doc_id,
               {sig_cols}
        FROM grams GROUP BY doc_id
    ),
    bands AS (
        {band_selects}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx AND a.key = b.key
                    AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
    inter AS (
        SELECT c.doc_a, c.doc_b, count(*) AS inter
        FROM cand c
        JOIN grams ga ON ga.doc_id = c.doc_a
        JOIN grams gb ON gb.doc_id = c.doc_b AND ga.h = gb.h
        GROUP BY 1, 2
    ),
    jpairs AS (
        SELECT doc_a, doc_b,
               inter * 1.0 / (sa.n + sb.n - inter) AS j
        FROM inter
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE inter * 1.0 / (sa.n + sb.n - inter) > 0.1
    )
"""


def _minhash_lsh_full_oracle() -> str:
    """See :func:`_minhash_pairs_cte` — this oracle is its pair
    output with the 6-dp output rounding."""
    return f"""
    WITH {_minhash_pairs_cte()}
    SELECT doc_a, doc_b, {sql_round('j', 6)} AS jaccard FROM jpairs
"""


@register(
    "dedup_minhash_lsh",
    oracle=_minhash_lsh_full_oracle(),
    tags=("ext-minhash-dedup", "lsh", "full-oracle"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates on the NATURAL corpus (32
    hashes, 8 bands), exact Jaccard verified on candidates only —
    hash-checked END TO END against a DuckDB recomputation of the
    same pipeline (r10 promotion, the winnowing pattern: switch the
    gram/band hashes to the cross-engine md5_32 + concat forms and the
    whole probabilistic pipeline becomes exactly recomputable —
    signature minima, band membership, candidate set, verified
    Jaccard; production swaps back to 64-bit xxhash64 identities and
    hashed band keys, hash_mode='xxhash64', identical plan). LSH
    recall against the exact shingle-join is additionally asserted in
    tests/test_similarity.py."""
    docs = load(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(docs, "doc_id", "text", hash_mode="md5_32")
    return pairs.filter(F.col("jaccard") > 0.1).select(
        "doc_a", "doc_b", round_fixed(F.col("jaccard"), 6).alias("jaccard")
    )


_LSH_PLANTED_ORACLE = """
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 25
    ),
    toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM corpus),
    -- mirrors hashed_shingles' short-doc fallback: a doc with < 3
    -- tokens contributes its whole trimmed text as its one shingle
    -- (a <3-token string can never equal a 3-token gram, so the two
    -- branches cannot cross-collide — same argument as the Spark
    -- side's 1-arg vs 3-arg xxhash64 domains)
    shingles AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
        FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(i)
        UNION
        SELECT doc_id, trim(text) AS sh FROM corpus
        WHERE len(string_split_regex(trim(text), '\\s+')) < 3
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM shingles a
        JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, 1.0 AS jaccard
    FROM pairs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE inter = sa.n AND inter = sb.n
"""


_INCREMENTAL_ORACLE = """
    WITH new_docs AS (
        SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 25
    ),
    toks_o AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
    toks_n AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM new_docs),
    -- both sides mirror hashed_shingles' short-doc fallback (see the
    -- planted-LSH oracle note): a <3-token doc's one shingle is its
    -- whole trimmed text, so an identical short doc re-arriving in
    -- the batch matches in BOTH the Spark plan and this oracle
    sh_o AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
        FROM toks_o, UNNEST(generate_series(1, len(t) - 2)) AS g(i)
        UNION
        SELECT doc_id, trim(text) AS sh FROM documents
        WHERE len(string_split_regex(trim(text), '\\s+')) < 3
    ),
    sh_n AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
        FROM toks_n, UNNEST(generate_series(1, len(t) - 2)) AS g(i)
        UNION
        SELECT doc_id, trim(text) AS sh FROM new_docs
        WHERE len(string_split_regex(trim(text), '\\s+')) < 3
    ),
    sz_o AS (SELECT doc_id, count(*) AS n FROM sh_o GROUP BY doc_id),
    sz_n AS (SELECT doc_id, count(*) AS n FROM sh_n GROUP BY doc_id),
    pairs AS (
        SELECT n.doc_id AS new_doc, o.doc_id AS old_doc, count(*) AS inter
        FROM sh_n n JOIN sh_o o ON n.sh = o.sh
        GROUP BY 1, 2
    )
    SELECT new_doc, old_doc, 1.0 AS jaccard
    FROM pairs
    JOIN sz_n ON new_doc = sz_n.doc_id
    JOIN sz_o ON old_doc = sz_o.doc_id
    WHERE inter = sz_n.n AND inter = sz_o.n
"""


@register(
    "dedup_incremental_minhash",
    oracle=_INCREMENTAL_ORACLE,
    tags=("ext-minhash-dedup", "lsh", "incremental", "planted-oracle"),
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup dedup, hash-checked against SQL ground
    truth: the first 25 docs re-arrive as a NEW batch (relabeled
    doc_id+100000) and are banded against the EXISTING corpus only —
    the daily-ingest pattern where a batch dedups against a petabyte
    store without an existing x existing re-band
    (operators/similarity.py:minhash_incremental_pairs has the
    candidate-restriction + mega-bucket-anchor design and the honest
    note on storing the existing side's signatures). Identical docs
    are guaranteed candidates (identical shingle sets -> identical
    signatures -> same key in every band), so LSH recall on the
    planted batch is structurally 1 and the oracle — a one-sided
    shingle-set-equality join — is exact, not probabilistic. The full
    incremental path (batch shingles -> signatures -> band join
    against corpus bands -> exact verify) executes for real."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    new = docs.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    from k8e_fetch_spark.operators.similarity import minhash_incremental_pairs

    pairs = minhash_incremental_pairs(docs, new)
    return pairs.filter(F.col("jaccard") == 1.0).select(
        "new_doc", "old_doc", F.lit(1.0).alias("jaccard")
    )


@register(
    "dedup_minhash_lsh_planted",
    oracle=_LSH_PLANTED_ORACLE,
    tags=("ext-minhash-dedup", "lsh", "planted-oracle"),
)
def dedup_minhash_lsh_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash+LSH pipeline hash-checked against SQL ground truth:
    the corpus is augmented with exact copies of the first 25 docs
    (relabeled doc_id+100000), and the declared output is the LSH
    candidates with exact Jaccard == 1. Identical shingle sets produce
    identical signatures, hence identical band keys, hence a guaranteed
    candidate pair — so LSH recall on this subset is structurally 1 and
    the oracle (shingle-set-equality join) is exact, not probabilistic.
    The full LSH path (shingle -> minhash fold -> band bucket join ->
    exact verify) executes for real on every row."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(planted)
    pairs = minhash_candidate_pairs(corpus, "doc_id", "text")
    return pairs.filter(F.col("jaccard") == 1.0).select(
        "doc_a", "doc_b", F.lit(1.0).alias("jaccard")
    )


_COSINE_LSH_PLANTED_ORACLE = f"""
    WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id < 25
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {sql_round(sql_cosine('a.embedding', 'b.embedding'), 6)} AS score
    FROM corpus a
    JOIN corpus b ON a.vec_id < b.vec_id
    WHERE {sql_round(sql_cosine('a.embedding', 'b.embedding'), 6)} > 0.99
"""


@register(
    "sim_cosine_lsh_planted",
    oracle=_COSINE_LSH_PLANTED_ORACLE,
    tags=("ext-topk-sim", "lsh", "planted-oracle"),
)
def sim_cosine_lsh_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane cosine LSH hash-checked against SQL ground truth:
    embeddings augmented with exact copies of the first 25 vectors;
    declared output = LSH candidate pairs with exact cosine > 0.99.
    The max natural cosine in this corpus is ~0.60, so only the planted
    identical pairs clear the threshold — and identical vectors produce
    identical signatures in every band, so LSH recall on them is
    structurally 1. Both sides are exact; the LSH path (signature ->
    band buckets -> candidate join -> exact verify) runs for real."""
    from k8e_fetch_spark.operators.similarity import cosine_lsh_pairs

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(planted)
    # explicit band geometry: the corpus size is fixed by the query
    # itself, so the N-sizing count job is pure overhead here. 10-bit
    # bands (vs the ~7 auto-sizing would pick) shrink buckets ~8x and
    # with them the exact-verify candidate volume; recall on the
    # planted EXACT copies is structurally 1 at any width (identical
    # vectors -> identical keys in every band). The LSH path (band keys
    # -> buckets -> candidate join -> exact verify) is identical to the
    # auto-sized one sim_cosine_lsh exercises.
    pairs = cosine_lsh_pairs(
        corpus, "vec_id", "embedding", dim=64, threshold=0.0, n_bits=40, n_bands=4
    )
    return (
        pairs.withColumn("score", round_fixed(F.col("score"), 6))
        .filter(F.col("score") > 0.99)
        .select("id_a", "id_b", "score")
    )


def _clusters_minhash_oracle() -> str:
    """Connected components over the md5_32 LSH pair set, recomputed in
    DuckDB with a RECURSIVE reachability CTE: a node's component is the
    MIN doc id among everything it can reach — exactly the fixpoint the
    Spark side's min-label propagation converges to (the iterative loop
    verifies changed == 0 before returning, so 'iterative' is a
    strategy, not a semantics: the converged answer is deterministic
    and SQL-expressible)."""
    return f"""
    WITH RECURSIVE {_minhash_pairs_cte()},
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM jpairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM jpairs
    ),
    cc AS (
        SELECT src AS node, src AS reach FROM edges
        UNION
        SELECT e.src AS node, c.reach
        FROM edges e JOIN cc c ON e.dst = c.node
    )
    SELECT node AS doc_id, min(reach) AS cluster_id FROM cc GROUP BY node
"""


@register(
    "dedup_clusters_minhash",
    oracle=_clusters_minhash_oracle(),
    tags=("ext-minhash-dedup", "connected-components", "full-oracle"),
)
def dedup_clusters_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete near-dup dedup flow: MinHash candidate pairs ->
    connected components (iterative min-label propagation run to a
    VERIFIED fixpoint) -> cluster assignment (component = min doc id).
    Promoted to a full oracle in r10: with the md5_32 cross-engine pair
    set (dedup_minhash_lsh's) the converged component labels are
    exactly recomputable in DuckDB via a recursive reachability CTE —
    iterative execution, deterministic answer. Component correctness on
    known graphs (paths, cycles, stars, isolates) stays pinned in
    tests/test_clustering.py; production keeps hash_mode='xxhash64'."""
    from k8e_fetch_spark.operators.clustering import connected_components

    docs = load(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(docs, "doc_id", "text", hash_mode="md5_32").filter(
        F.col("jaccard") > 0.1
    )
    return connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def _simhash_full_oracle() -> str:
    """DuckDB recomputation of the ENTIRE natural-corpus SimHash
    pipeline: per-token md5-derived 64 projection bits (two 32-bit
    halves — the exact ints Spark's md5_32x2 mode computes), per-bit
    weighted majority, two's-complement signature assembly (bit 63 =
    Long.MIN_VALUE, matching the JVM), 16-bit prefix blocking via the
    same arithmetic >> 48, and XOR-popcount Hamming <= 8. All integer
    arithmetic — the match is exact."""
    bit_sums = ",\n               ".join(
        f"sum(({'lo' if b < 32 else 'hi'} >> {b % 32}) & 1) AS c{b}"
        for b in range(64)
    )
    sig_terms = " + ".join(
        f"(CASE WHEN c{b} * 2 > n THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(63)
    )
    sig_expr = (
        f"({sig_terms})"
        f" + (CASE WHEN c63 * 2 > n THEN CAST(-9223372036854775808 AS BIGINT) ELSE 0 END)"
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents
    ),
    h AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS hi,
               CAST(('0x' || substr(md5(tok), 9, 8)) AS BIGINT) AS lo
        FROM toks
    ),
    cnt AS (
        SELECT doc_id, count(*) AS n,
               {bit_sums}
        FROM h GROUP BY doc_id
    ),
    sig AS (SELECT doc_id, {sig_expr} AS sig FROM cnt),
    blocks AS (SELECT doc_id, sig, sig >> 48 AS blk FROM sig)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
    FROM blocks a
    JOIN blocks b ON a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= 8
"""


@register(
    "dedup_simhash",
    oracle=_simhash_full_oracle(),
    tags=("ext-minhash-dedup", "simhash", "full-oracle"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs on the NATURAL corpus: 64-bit signatures
    (zero-shuffle projection), candidates blocked on the high 16
    signature bits, kept when Hamming distance <= 8 — hash-checked END
    TO END against a DuckDB recomputation (r10 promotion, the same
    cross-engine-hash pattern as dedup_minhash_lsh: per-token bits
    from two md5-derived 32-bit halves instead of xxhash64, identical
    majority/blocking/Hamming pipeline; production keeps
    hash_mode='xxhash64'). Identical-signature mega groups
    (boilerplate clusters) collapse to anchor + Hamming-0 stars above
    the operator's group cap — see simhash_candidate_pairs; the cap
    never triggers on the fixtures (largest natural group: 3), so the
    oracle's plain block join is the exact answer."""
    from k8e_fetch_spark.operators.similarity import simhash_candidate_pairs

    docs = load(spark, sf_dir, "documents")
    return simhash_candidate_pairs(
        docs, "doc_id", "text", max_hamming=8, hash_mode="md5_32x2"
    ).select("doc_a", "doc_b", F.col("hamming").cast("bigint").alias("hamming"))


_SIMHASH_PLANTED_ORACLE = """
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 25
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(0 AS BIGINT) AS hamming
    FROM corpus a
    JOIN corpus b ON a.text = b.text AND a.doc_id < b.doc_id
"""


@register(
    "dedup_simhash_planted",
    oracle=_SIMHASH_PLANTED_ORACLE,
    tags=("ext-minhash-dedup", "simhash", "planted-oracle"),
)
def dedup_simhash_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pipeline hash-checked against SQL ground truth
    (the planted-oracle pattern of dedup_minhash_lsh_planted): corpus
    augmented with exact copies of the first 25 docs (doc_id+100000);
    declared output = SimHash block-collision candidates at Hamming
    distance 0 whose texts are verified EXACTLY equal. Identical text
    produces an identical 64-bit signature, hence the same 16-bit block,
    hence a guaranteed candidate at Hamming 0 — recall on equal-text
    pairs is structural, and the exact-equality verify removes any
    signature-collision false positive, so both sides compute precisely
    the equal-text pair set. The full SimHash path (signature fold ->
    prefix block join -> Hamming filter -> verify) executes on every
    row."""
    from k8e_fetch_spark.operators.similarity import simhash_candidate_pairs

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(planted)
    cands = simhash_candidate_pairs(corpus, "doc_id", "text", max_hamming=0).select(
        "doc_a", "doc_b"
    )
    ta = corpus.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a"))
    tb = corpus.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b"))
    return (
        cands.join(ta, on="doc_a")
        .join(tb, on="doc_b")
        .filter(F.col("text_a") == F.col("text_b"))
        .select("doc_a", "doc_b", F.lit(0).cast("bigint").alias("hamming"))
    )


_IVF_PLANTED_ORACLE = f"""
    WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id < 25
    ),
    scored AS (
        SELECT q.vec_id AS q_id, c.vec_id AS n_id,
               {sql_round(sql_cosine('q.embedding', 'c.embedding'), 6)} AS score,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {sql_round(sql_cosine('q.embedding', 'c.embedding'), 6)} DESC, c.vec_id
               ) AS rn
        FROM embeddings q
        JOIN corpus c ON c.vec_id != q.vec_id
        WHERE q.vec_id < 8
    )
    SELECT q_id, n_id, score FROM scored WHERE rn = 1
"""


@register(
    "sim_topk_ivf_planted",
    oracle=_IVF_PLANTED_ORACLE,
    tags=("ext-topk-sim", "ivf", "ann", "planted-oracle"),
)
def sim_topk_ivf_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate search hash-checked against BRUTE-FORCE SQL
    ground truth: corpus augmented with exact copies of the first 25
    vectors; declared output = each query's IVF rank-1 neighbor, oracle
    = the exact argmax over the full corpus. The planted duplicate of
    query q scores cosine 1.0 (the natural max in this corpus is ~0.60),
    and an identical vector is assigned to the identical coarse cell —
    which is also the query's own top-probe cell — so IVF's candidate
    set provably contains the true argmax and the approximate result
    equals the exact one. Tie-breaks (rounded score desc, vec_id asc)
    are identical on both sides, so even natural exact duplicates
    resolve the same way. The full IVF path (coarse assign via broadcast
    centroids -> 4-cell probe -> candidate scoring -> rank) executes for
    real."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(planted)
    centroids = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid")
    )
    assigned = ivf_assign(corpus, centroids, "vec_id")

    queries_df = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    probe_w = Window.partitionBy("q_id").orderBy(F.desc("c_sim"), F.col("centroid_id"))
    probes = (
        queries_df.crossJoin(F.broadcast(centroids))
        .withColumn("c_sim", cosine_arrow(F.col("q_emb"), F.col("centroid")))
        .withColumn("_pr", F.row_number().over(probe_w))
        .filter(F.col("_pr") <= 4)
        .select("q_id", "q_emb", "centroid_id")
    )
    scored = (
        assigned.join(F.broadcast(probes), on="centroid_id")
        .filter(F.col("q_id") != F.col("vec_id"))
        .withColumn("score", round_fixed(cosine_arrow(F.col("q_emb"), F.col("embedding")), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
        .select("q_id", F.col("vec_id").alias("n_id"), "score")
    )


def _cosine_lsh_full_oracle(dim: int = 64, n_bands: int = 4, seed: int = 42) -> str:
    """DuckDB recomputation of the ENTIRE natural-corpus hyperplane-LSH
    pipeline, auto-sized geometry included: the per-band Rademacher
    planes are inlined FULL-WIDTH (62 bits x 64 dims per band, encoded
    as +/- strings from the SAME _rademacher_planes LCG — its rows are
    generated sequentially, so the first ``bits`` rows of the 62-bit
    table ARE the bits-bit table), the band width is computed from
    count(*) with the operator's own clamp rule, sign bits pack
    little-endian into band keys, buckets self-join into candidate
    cliques (the >4096 star guard cannot trigger on a <=4096-row
    fixture), and candidates are exact-cosine-verified at > 0.3.

    Float caveat, stated: the sign of dot(v, plane) is computed in
    different summation orders (numpy matmul vs SQL sum) — a flip needs
    |dot| within ~1e-12 of zero, and the fixtures are fixed data, so
    the outcome is deterministic per dataset (same argument as the
    hashed-shingle collision note)."""
    from k8e_fetch_spark.operators.similarity import _rademacher_planes

    rows = []
    for band in range(n_bands):
        planes = _rademacher_planes(dim, 62, seed=seed + band * 1000003)
        for bit, prow in enumerate(planes):
            s = "".join("+" if x > 0 else "-" for x in prow)
            rows.append(f"({band}, {bit}, '{s}')")
    values = ",\n        ".join(rows)
    return f"""
    WITH geom AS (
        SELECT CAST(LEAST(62, GREATEST(4,
                   CEIL(LOG2(GREATEST(count(*), 2) / 16.0)))) AS INT) AS bits
        FROM embeddings
    ),
    planes_raw(band, bit, s) AS (VALUES
        {values}
    ),
    planes AS (
        SELECT band, bit, d.i AS dimi,
               CASE substr(s, CAST(d.i AS INT), 1) WHEN '+' THEN 1.0 ELSE -1.0 END AS sgn
        FROM planes_raw, UNNEST(generate_series(1, {dim})) AS d(i)
        WHERE bit < (SELECT bits FROM geom)
    ),
    dots AS (
        SELECT e.vec_id, p.band, p.bit,
               sum(CAST(e.embedding[p.dimi] AS DOUBLE) * p.sgn) AS dot
        FROM embeddings e, planes p
        GROUP BY 1, 2, 3
    ),
    keys AS (
        SELECT vec_id, band,
               sum(CASE WHEN dot > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS key
        FROM dots GROUP BY 1, 2
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM keys a
        JOIN keys b ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
    )
    SELECT c.id_a, c.id_b,
           {sql_round(sql_cosine('va.embedding', 'vb.embedding'), 6)} AS score
    FROM cand c
    JOIN embeddings va ON va.vec_id = c.id_a
    JOIN embeddings vb ON vb.vec_id = c.id_b
    WHERE {sql_cosine('va.embedding', 'vb.embedding')} > 0.3
"""


@register(
    "sim_cosine_lsh",
    oracle=_cosine_lsh_full_oracle(),
    tags=("ext-topk-sim", "lsh", "near-dup", "full-oracle"),
)
def sim_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup via random-hyperplane LSH on the
    NATURAL corpus: candidates from band-bucket collisions, exact
    cosine verified on candidates only — hash-checked END TO END
    against a DuckDB recomputation (r10 promotion; the planes are the
    same deterministic LCG on both sides, so even the AUTO-SIZED band
    geometry is recomputed relationally from count(*)). Recall vs the
    exhaustive pair scan stays asserted in tests/test_similarity.py.

    Band width auto-sizes with the corpus row count, read from the
    parquet footer metadata (driver-side file stats, no Spark job) —
    the same number the operator's fallback ``df.count()`` would start
    a job to learn."""
    from k8e_fetch_spark.io import table_path
    from k8e_fetch_spark.operators.similarity import cosine_lsh_pairs

    emb = load(spark, sf_dir, "embeddings")
    try:
        import pyarrow.parquet as pq

        n_rows = pq.ParquetFile(table_path(sf_dir, "embeddings")).metadata.num_rows
    except Exception:  # multi-file layout or missing footer: operator sizes itself
        n_rows = None
    pairs = cosine_lsh_pairs(
        emb, "vec_id", "embedding", dim=64, threshold=0.3, n_rows=n_rows
    )
    return pairs.select(
        "id_a", "id_b", round_fixed(F.col("score"), 6).alias("score")
    )


_KMEANS_ASSIGN_ORACLE = f"""
    WITH cent AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding::DOUBLE[] AS c
        FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)
    ),
    scored AS (
        SELECT e.vec_id, cent.cid,
               list_sum(list_transform(list_zip(e.embedding::DOUBLE[], cent.c),
                        p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
        FROM embeddings e CROSS JOIN cent
    ),
    best AS (
        SELECT vec_id, cid, d2 FROM scored
        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
    )
    SELECT vec_id, CAST(cid AS INTEGER) AS centroid_id, {sql_round('d2', 6)} AS d2
    FROM best
"""


@register(
    "sim_kmeans_assign_oracle",
    oracle=_KMEANS_ASSIGN_ORACLE,
    tags=("ext-topk-sim", "kmeans", "planted-oracle"),
)
def sim_kmeans_assign_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration hash-checked against SQL ground truth: a
    single k-means step from the deterministic init (first k=8 vectors
    by vec_id) IS SQL-expressible — assignment is the argmin of squared
    L2 over k known centroids with the documented (d2, cid) tie-break.
    The REAL iterative path executes (kmeans with iterations=1; the
    zero-shuffle assign auto-selects literal-vs-Arrow by model size —
    k=8 x dim=64 sits at the crossover and runs the literal fold, and
    the rounded d2 column means the oracle hash pins the distances
    either way); the oracle
    recomputes the same argmin relationally in DuckDB. This covers the
    assignment math the rows-only sim_kmeans_assign (3 iterations,
    kept on the literal-expression twin for plan display) exercises at
    depth."""
    from k8e_fetch_spark.operators.clustering import kmeans

    emb = load(spark, sf_dir, "embeddings")
    assigned, _history = kmeans(emb, k=8, iterations=1)
    return assigned.select("vec_id", "centroid_id", round_fixed(F.col("d2"), 6).alias("d2"))


_CLUSTERS_PLANTED_ORACLE = """
    WITH planted AS (SELECT doc_id FROM documents WHERE doc_id < 25)
    SELECT doc_id, doc_id AS cluster_id FROM planted
    UNION ALL
    SELECT doc_id + 100000 AS doc_id, doc_id AS cluster_id FROM planted
"""


@register(
    "dedup_clusters_planted",
    oracle=_CLUSTERS_PLANTED_ORACLE,
    tags=("ext-minhash-dedup", "connected-components", "planted-oracle"),
)
def dedup_clusters_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pairs->clusters flow hash-checked against known ground truth:
    corpus augmented with exact copies of the first 25 docs
    (doc_id+100000), MinHash pairs restricted to the planted edges
    (doc_b - doc_a == 100000, which only an original/copy pair can
    satisfy: originals are far below 100000 and copy-copy gaps differ),
    then REAL iterative min-label connected components over that edge
    list. The expected component structure is exact — 25 two-node
    components labeled by the original doc_id — so the propagation
    output is hash-checkable even though the general algorithm is not
    SQL-expressible. Every planted edge is guaranteed: identical text
    -> identical shingle set -> identical MinHash signature in every
    band -> candidate pair with exact Jaccard 1."""
    from k8e_fetch_spark.operators.clustering import connected_components

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(planted)
    pairs = (
        minhash_candidate_pairs(corpus, "doc_id", "text")
        .filter(F.col("jaccard") == 1.0)
        .filter(F.col("doc_b") - F.col("doc_a") == 100000)
    )
    return connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def _lloyd_iter_sql(i: int, dim: int) -> str:
    """One Lloyd iteration as DuckDB CTEs: L2 argmin with the operator's
    (d2, cid) tie-break, per-dimension member means, empty clusters
    keeping the previous centroid (COALESCE) — mirroring
    operators/clustering.py kmeans() exactly."""
    return f"""
    a{i} AS (
        SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                       list_sum(list_transform(list_zip(e.v, c.c),
                                p -> (p[1] - p[2]) * (p[1] - p[2]))), c.cid) AS rn
            FROM e CROSS JOIN cent{i - 1} c
        ) WHERE rn = 1
    ),
    m{i} AS (
        SELECT cid, list(m ORDER BY pos) AS mc FROM (
            SELECT cid, pos, avg(v[pos]) AS m
            FROM a{i}, UNNEST(generate_series(1, {dim})) AS g(pos)
            GROUP BY cid, pos
        ) GROUP BY cid
    ),
    cent{i} AS (
        SELECT p.cid, COALESCE(m{i}.mc, p.c) AS c
        FROM cent{i - 1} p LEFT JOIN m{i} ON p.cid = m{i}.cid
    )"""


# Promoted from rows-only (late r9): 3 iterations = 2 unrolled Lloyd
# updates (the _lloyd_iter_sql builder ivf_trained/semdedup already
# use) + a final L2 argmin against cent2 — the "iteration is not
# SQL-expressible" caveat only ever applied to UNBOUNDED iteration.
_KMEANS_3ITER_ORACLE = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent0 AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS c
        FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)
    ),
    {_lloyd_iter_sql(1, 64)},
    {_lloyd_iter_sql(2, 64)},
    scored AS (
        SELECT e.vec_id, c.cid,
               list_sum(list_transform(list_zip(e.v, c.c),
                        p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
        FROM e CROSS JOIN cent2 c
    ),
    best AS (
        SELECT vec_id, cid, d2 FROM scored
        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
    )
    SELECT vec_id, CAST(cid AS INTEGER) AS centroid_id, {sql_round('d2', 6)} AS d2
    FROM best
"""


@register(
    "sim_kmeans_assign",
    oracle=_KMEANS_3ITER_ORACLE,
    tags=("ext-topk-sim", "kmeans", "iterative"),
)
def sim_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative Lloyd's k-means over the embeddings (3 iterations,
    deterministic init): the IVF centroid-training path, hash-checked
    END TO END — the oracle unrolls both Lloyd centroid updates into
    CTEs (the same builder the trained-IVF and SemDeDup oracles use)
    and recomputes the final L2 assignment with its rounded distances,
    so init, both mean updates, the empty-cluster carry, the (d2, cid)
    tie-break and the third assignment are all pinned. The Lloyd
    inertia invariant is additionally asserted in
    tests/test_clustering.py.

    This query deliberately pins the LITERAL-EXPRESSION assign twin
    (``use_arrow=False``) so the zero-shuffle inlined-argmin plan stays
    driver-visible in EXPLAIN.md — kmeans() otherwise auto-selects the
    path by model size (literal at k x dim <= 512, Arrow above — the
    measured crossover; SemDeDup and trained-IVF at k=16 take Arrow)
    and the two are pinned assignment-identical in
    tests/test_clustering.py."""
    from k8e_fetch_spark.operators.clustering import kmeans

    emb = load(spark, sf_dir, "embeddings")
    assigned, _history = kmeans(emb, k=8, iterations=3, use_arrow=False)
    return assigned.select("vec_id", "centroid_id", round_fixed(F.col("d2"), 6).alias("d2"))


# Promoted from rows-only (late r9): the probe restriction is itself
# deterministic relational logic (argmax cell assignment, 4-nearest
# probe cells, top-k within the probed union), so the APPROXIMATE
# result — including which neighbors the probe misses — is exactly
# recomputable in SQL. "Approximate" never meant "non-deterministic".
_IVF_FIXED_ORACLE = f"""
    WITH e AS (SELECT vec_id, embedding FROM embeddings),
    cents AS (SELECT vec_id AS cid, embedding AS c FROM e WHERE vec_id < 16),
    assigned AS (
        SELECT vec_id, embedding, cid FROM (
            SELECT e.vec_id, e.embedding, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY {sql_cosine('e.embedding', 'c.c')} DESC, c.cid) AS rn
            FROM e CROSS JOIN cents c) WHERE rn = 1
    ),
    probes AS (
        SELECT q_id, q_emb, cid FROM (
            SELECT q.vec_id AS q_id, q.embedding AS q_emb, c.cid,
                   row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY {sql_cosine('q.embedding', 'c.c')} DESC, c.cid) AS pr
            FROM e q CROSS JOIN cents c WHERE q.vec_id < 8) WHERE pr <= 4
    ),
    scored AS (
        SELECT p.q_id, a.vec_id AS n_id,
               {sql_round(sql_cosine('p.q_emb', 'a.embedding'), 6)} AS score
        FROM assigned a JOIN probes p ON a.cid = p.cid AND a.vec_id != p.q_id
    )
    SELECT q_id, n_id, CAST(rank AS INTEGER) AS rank, score FROM (
        SELECT q_id, n_id, score,
               row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS rank
        FROM scored)
    WHERE rank <= 5
"""


@register(
    "sim_topk_ivf",
    oracle=_IVF_FIXED_ORACLE,
    tags=("ext-topk-sim", "ivf", "ann"),
)
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-k: corpus coarse-quantized against a
    deterministic centroid table (first 16 vectors), queries probe the
    4 nearest cells only. Recall vs the exact top-k is asserted in
    tests/test_similarity.py.

    Hash-checked end to end (promoted from rows-only in late r9): the
    oracle recomputes the cell assignment, the 4-nearest probe
    selection AND the within-probe top-5 relationally, so the probe
    restriction itself — which neighbors the approximation sees and
    misses — is pinned, not just the scoring."""
    emb = load(spark, sf_dir, "embeddings")
    centroids = (
        emb.filter(F.col("vec_id") < 16)
        .select(F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid"))
    )
    assigned = ivf_assign(emb, centroids, "vec_id")  # (vec_id, embedding, label, centroid_id)

    queries_df = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    # probe: 4 nearest centroids per query
    probe_w = Window.partitionBy("q_id").orderBy(F.desc("c_sim"), F.col("centroid_id"))
    probes = (
        queries_df.crossJoin(F.broadcast(centroids))
        .withColumn("c_sim", cosine_arrow(F.col("q_emb"), F.col("centroid")))
        .withColumn("_pr", F.row_number().over(probe_w))
        .filter(F.col("_pr") <= 4)
        .select("q_id", "q_emb", "centroid_id")
    )
    scored = (
        assigned.join(F.broadcast(probes), on="centroid_id")
        .filter(F.col("q_id") != F.col("vec_id"))
        .withColumn("score", round_fixed(cosine_arrow(F.col("q_emb"), F.col("embedding")), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", F.col("vec_id").alias("n_id"), "rank", "score")
    )


@register(
    "array_funcs_embeddings",
    oracle=f"""
        SELECT vec_id,
               CAST(len(embedding) AS INTEGER) AS dim,
               {sql_round('list_min(embedding::DOUBLE[])', 6)} AS v_min,
               {sql_round('list_max(embedding::DOUBLE[])', 6)} AS v_max,
               {sql_round('embedding[1]::DOUBLE', 6)} AS first_val,
               {sql_round('list_sum(list_transform(embedding::DOUBLE[], x -> abs(x)))', 6)} AS l1,
               CAST(len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS INTEGER) AS n_positive
        FROM embeddings
    """,
    tags=("ext-typed-relational", "array-fns"),
)
def array_funcs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function breadth over array<float>: size, element min/max,
    indexing, lambda transform/filter folds — the building blocks every
    vector operator here composes, all scan-local."""
    emb = load(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    l1 = F.aggregate(
        F.transform(vec, lambda x: F.abs(x)), F.lit(0.0), lambda acc, x: acc + x
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        round_fixed(F.array_min(vec), 6).alias("v_min"),
        round_fixed(F.array_max(vec), 6).alias("v_max"),
        round_fixed(F.element_at(vec, 1), 6).alias("first_val"),
        round_fixed(l1, 6).alias("l1"),
        F.size(F.filter(vec, lambda x: x > 0)).cast("int").alias("n_positive"),
    )


_QUANTIZE_ORACLE = f"""
    WITH base AS (
        SELECT vec_id, embedding::DOUBLE[] AS e,
               list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS mx
        FROM embeddings
    ), quant AS (
        SELECT vec_id, e, mx,
               list_transform(e, x -> floor(x * 127.0 / mx + 0.5)) AS q
        FROM base WHERE mx > 0
    )
    SELECT vec_id,
           {sql_round('mx', 6)} AS scale,
           CAST(list_sum(q) AS BIGINT) AS q_sum,
           CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS q_l1,
           {sql_round(sql_cosine('e', 'q'), 6)} AS cos_recon
    FROM quant
"""


@register(
    "sim_quantize_int8",
    oracle=_QUANTIZE_ORACLE,
    tags=("ext-topk-sim", "quantization", "scale-path"),
)
def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding corpus — the
    ANN storage/bandwidth scale path (4x smaller vectors; cosine is
    scale-invariant, so candidate scoring runs on the quantized form).
    Declared output is scalar per vector (scale, quantized checksums,
    reconstruction cosine) so the driver can hash it; the quantized
    array itself stays typed inside the plan. Zero shuffles: one
    projection over the scan."""
    from k8e_fetch_spark.functions.vectors import max_abs, quantize_int8

    emb = load(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.col("embedding").alias("e"),
        max_abs(F.col("embedding")).alias("mx"),
    ).filter(F.col("mx") > 0)
    quant = base.withColumn("q", quantize_int8(F.col("e"), F.col("mx")))
    return quant.select(
        "vec_id",
        round_fixed(F.col("mx"), 6).alias("scale"),
        F.aggregate("q", F.lit(0.0), lambda acc, x: acc + x).cast("bigint").alias("q_sum"),
        F.aggregate("q", F.lit(0.0), lambda acc, x: acc + F.abs(x)).cast("bigint").alias("q_l1"),
        round_fixed(cosine(F.col("e"), F.col("q")), 6).alias("cos_recon"),
    )


_CONTAINMENT_ORACLE = f"""
    WITH toks AS (SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS t FROM documents),
    shingles AS (
        SELECT DISTINCT doc_id, source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
        FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(i)
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM shingles a
        JOIN shingles b ON a.sh = b.sh AND a.source = b.source AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           {sql_round('inter * 1.0 / least(sa.n, sb.n)', 6)} AS containment
    FROM pairs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE inter * 1.0 / least(sa.n, sb.n) > 0.5
"""


@register(
    "dedup_containment_ngram",
    oracle=_CONTAINMENT_ORACLE,
    tags=("ext-minhash-dedup", "containment"),
)
def dedup_containment_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle containment |A∩B| / min(|A|,|B|) — catches near-SUPERSET
    duplication (a doc embedded inside a longer one) that symmetric
    Jaccard misses: a 100-line doc fully contained in a 1000-line doc
    has Jaccard ~0.1 but containment 1.0. Same inverted-index self-join
    skeleton as dedup_ngram_jaccard (no cross product; the shingle
    bucket join IS the candidate generator)."""
    sh = _hashed_gram_index(fan_out(load(spark, sf_dir, "documents")))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "source", "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "source", "sh")
    pairs = (
        a.join(b, on=["source", "sh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    containment = F.col("inter") * 1.0 / F.least(F.col("na"), F.col("nb"))
    return (
        pairs.join(sa, on="doc_a")
        .join(sb, on="doc_b")
        .filter(containment > 0.5)
        .select("doc_a", "doc_b", round_fixed(containment, 6).alias("containment"))
    )


_HYBRID_ORACLE = f"""
    WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
    SELECT d.doc_id,
           {sql_round(sql_cosine('e.embedding', 'q.q_emb'), 6)} AS score
    FROM documents d
    JOIN embeddings e ON d.doc_id = e.vec_id
    CROSS JOIN q
    WHERE d.text LIKE '%dup%' AND d.text LIKE '%vector%'
    ORDER BY score DESC, d.doc_id
    LIMIT 20
"""


@register("sim_hybrid_search", oracle=_HYBRID_ORACLE, tags=("ext-topk-sim", "hybrid-retrieval"))
def sim_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: keyword predicate narrows the corpus, vector
    similarity ranks the survivors — the RAG query shape. The keyword
    filter pushes to the documents scan (cheap candidate generation);
    the embedding join is key-equality; the single query vector rides a
    broadcast; top-20 by (rounded score, doc_id) so the cutoff set is
    engine-stable. No shuffle touches the full corpus: filter -> join ->
    score -> TakeOrderedAndProject.

    The two-term conjunction is ~3-5% selective on the fixture corpus
    at every SF (17/20/192 candidates at sf0.001/0.01/0.1) — the
    filter provably narrows AND the ranked result is non-empty, so the
    driver's hash compare pins real scores (the r8 window's 0-row
    green was vacuous: the old keyword matched nothing)."""
    docs = load(spark, sf_dir, "documents").filter(
        F.col("text").contains("dup") & F.col("text").contains("vector")
    )
    emb = load(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    return (
        docs.select("doc_id")
        .join(emb, docs.doc_id == emb.vec_id)
        .crossJoin(F.broadcast(qv))
        .withColumn("score", round_fixed(cosine_arrow(F.col("embedding"), F.col("q_emb")), 6))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
        .select("doc_id", "score")
    )


# Expected retention under the keep-best policy on the planted clusters:
# each cluster is {original doc_id < 25, verbatim copy doc_id+100000};
# identical text -> identical quality, so the tie-break keeps the
# original (min id) and best_quality is the quality expression itself.
# (quality SQL lives with the text ops — same package, safe import.)
from k8e_fetch_spark.queries.text_ops import _QUALITY_SQL as _KB_QUALITY_SQL  # noqa: E402

_KEEP_BEST_ORACLE = f"""
    WITH planted AS (SELECT doc_id, text FROM documents WHERE doc_id < 25)
    SELECT doc_id AS cluster_id,
           doc_id AS keep_doc_id,
           {sql_round(_KB_QUALITY_SQL, 6)} AS best_quality,
           CAST(2 AS BIGINT) AS n_members
    FROM planted
"""


@register(
    "dedup_cluster_keep_best",
    oracle=_KEEP_BEST_ORACLE,
    tags=("ext-minhash-dedup", "retention-policy", "planted-oracle"),
)
def dedup_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention policy on top of the pairs->clusters flow: near-dup
    clusters (REAL MinHash LSH + connected components over the planted
    copies, exactly the dedup_clusters_planted construction) reduced to
    one kept doc each — the highest quality_score, ties to the smallest
    doc_id. Production dedup keeps the BEST copy, not an arbitrary one;
    this is that policy as a single struct-max aggregation (no window
    sort, one-struct buffer per cluster — mega-cluster safe)."""
    from k8e_fetch_spark.operators.clustering import connected_components
    from k8e_fetch_spark.operators.dedup import keep_best_per_cluster
    from k8e_fetch_spark.operators.text import quality_score

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(planted)
    pairs = (
        minhash_candidate_pairs(corpus, "doc_id", "text")
        .filter(F.col("jaccard") == 1.0)
        .filter(F.col("doc_b") - F.col("doc_a") == 100000)
    )
    clusters = connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    quality = corpus.select("doc_id", quality_score("text").alias("quality"))
    return keep_best_per_cluster(clusters, quality)



# Lloyd training is iterative, but TWO iterations from a deterministic
# init unroll into plain SQL — so the whole train->assign->probe->search
# pipeline is oracle-checkable, the same init-derived trick that made
# PQ-ADC and the one-step kmeans assign oracle-bearing. Promoted from
# rows-only in round 8 (VERDICT r7 next-round #6).
_IVF_TRAINED_ORACLE = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent0 AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS c
        FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)
    ),
    {_lloyd_iter_sql(1, 64)},
    {_lloyd_iter_sql(2, 64)},
    af AS (
        SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY {sql_cosine("e.v", "c.c")} DESC, c.cid) AS rn
            FROM e CROSS JOIN cent2 c
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT q_id, cid FROM (
            SELECT q.vec_id AS q_id, c.cid,
                   row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY {sql_cosine("q.v", "c.c")} DESC, c.cid) AS pr
            FROM e q CROSS JOIN cent2 c WHERE q.vec_id < 8
        ) WHERE pr <= 4
    ),
    scored AS (
        SELECT p.q_id, a.vec_id AS n_id,
               {sql_round(sql_cosine("q.v", "a.v"), 6)} AS score
        FROM probes p
        JOIN af a ON a.cid = p.cid
        JOIN e q ON q.vec_id = p.q_id
        WHERE a.vec_id <> p.q_id
    )
    SELECT q_id, n_id, CAST(rank AS INT) AS rank, score FROM (
        SELECT q_id, n_id, score,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY score DESC, n_id) AS rank
        FROM scored
    ) WHERE rank <= 5
"""


@register(
    "sim_topk_ivf_trained",
    oracle=_IVF_TRAINED_ORACLE,
    tags=("ext-topk-sim", "ivf", "kmeans", "ann", "train+search"),
)
def sim_topk_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production IVF path end to end: TRAIN the coarse quantizer
    (Lloyd's k-means, 2 iterations, deterministic init) and search with
    it — rather than the fixed first-16-vectors codebook sim_topk_ivf
    uses for its planted oracle. Training is the zero-shuffle-assign
    loop (one job per iteration); the trained k x dim centroids hand
    off to ivf_assign as driver state; search probes the 4 nearest
    cells per query. Deterministic end to end.

    FULL-oracle-bearing as of round 8: a fixed TWO-iteration Lloyd
    from the deterministic first-16 init unrolls into plain SQL
    (argmin with the (d2, cid) tie-break, per-dim member means,
    empty-cluster carry-forward), so DuckDB recomputes training,
    coarse assignment, probe selection and scoring relationally and
    the driver hash-compares the entire train+search pipeline. Engine
    float-fold differences (Spark avg/BLAS vs DuckDB sequential sums,
    ~1e-15 relative) sit far below the 1e-6 score rounding; only a
    near-exact tie in argmin/probe ordering could diverge, which
    random embeddings do not produce."""
    from k8e_fetch_spark.operators.clustering import kmeans

    emb = load(spark, sf_dir, "embeddings")
    _assigned, _hist, cent_rows = kmeans(emb, k=16, iterations=2, return_centroids=True)
    centroids = spark.createDataFrame(
        [(cid, vec) for cid, vec in cent_rows], "centroid_id int, centroid array<double>"
    )
    assigned = ivf_assign(emb, centroids, "vec_id")
    queries_df = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    probe_w = Window.partitionBy("q_id").orderBy(F.desc("c_sim"), F.col("centroid_id"))
    probes = (
        queries_df.crossJoin(F.broadcast(centroids))
        .withColumn("c_sim", cosine_arrow(F.col("q_emb"), F.col("centroid")))
        .withColumn("_pr", F.row_number().over(probe_w))
        .filter(F.col("_pr") <= 4)
        .select("q_id", "q_emb", "centroid_id")
    )
    scored = (
        assigned.join(F.broadcast(probes), on="centroid_id")
        .filter(F.col("q_id") != F.col("vec_id"))
        .withColumn("score", round_fixed(cosine_arrow(F.col("q_emb"), F.col("embedding")), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", F.col("vec_id").alias("n_id"), "rank", "score")
    )


@register(
    "dedup_clusters_star_planted",
    oracle=_CLUSTERS_PLANTED_ORACLE,
    tags=("ext-minhash-dedup", "connected-components", "large-star-small-star", "planted-oracle"),
)
def dedup_clusters_star_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup_clusters_planted construction executed through the
    log-rounds large-star/small-star contraction instead of min-label
    propagation — same planted ground truth, same oracle, so the scale
    variant for unbounded-diameter graphs carries its own hash-checked
    evidence (beyond the structural equivalence tests)."""
    from k8e_fetch_spark.operators.clustering import connected_components_star

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(planted)
    pairs = (
        minhash_candidate_pairs(corpus, "doc_id", "text")
        .filter(F.col("jaccard") == 1.0)
        .filter(F.col("doc_b") - F.col("doc_a") == 100000)
    )
    return connected_components_star(pairs).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


@register(
    "dedup_apply_retention",
    # applying keep-best retention to the planted corpus must return
    # EXACTLY the original documents: every planted copy sits in a
    # 2-node cluster whose original wins the quality tie on min id
    oracle="SELECT doc_id FROM documents",
    tags=("ext-minhash-dedup", "retention-policy", "end-to-end"),
)
def dedup_apply_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consumable artifact of near-dup dedup: the CLEANED corpus.
    Near-dup clusters (real MinHash LSH + connected components over the
    planted copies) reduce to their keep-best member; non-kept members
    anti-join out of the corpus. On the planted construction the result
    is provably the original document set — copies lose the min-id
    quality tie-break — which is the whole-flow oracle."""
    from k8e_fetch_spark.operators.clustering import connected_components
    from k8e_fetch_spark.operators.dedup import keep_best_per_cluster
    from k8e_fetch_spark.operators.text import quality_score

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(planted)
    pairs = (
        minhash_candidate_pairs(corpus, "doc_id", "text")
        .filter(F.col("jaccard") == 1.0)
        .filter(F.col("doc_b") - F.col("doc_a") == 100000)
    )
    clusters = connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    quality = corpus.select("doc_id", quality_score("text").alias("quality"))
    keep = keep_best_per_cluster(clusters, quality)
    dropped = clusters.join(
        keep.select(F.col("keep_doc_id").alias("doc_id")), on="doc_id", how="left_anti"
    )
    return corpus.join(dropped.select("doc_id"), on="doc_id", how="left_anti").select("doc_id")


_PQ_ORACLE = f"""
    WITH init AS (
        SELECT vec_id AS j, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 16
    ),
    cb AS (  -- codebook: subspace m (0..7), centroid j (0..15), 8-dim slice
        SELECT m, j, e[m*8+1 : m*8+8] AS c
        FROM init, UNNEST(generate_series(0, 7)) AS g(m)
    ),
    subv AS (  -- every vector's 8 subvectors
        SELECT vec_id, m, (embedding::DOUBLE[])[m*8+1 : m*8+8] AS v
        FROM embeddings, UNNEST(generate_series(0, 7)) AS g(m)
    ),
    d AS (  -- all (vector, subspace, centroid) squared distances
        SELECT s.vec_id, s.m, c.j,
               list_sum(list_transform(list_zip(s.v, c.c),
                        p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
        FROM subv s JOIN cb c ON s.m = c.m
    ),
    codes AS (  -- PQ code: per-subspace argmin with (d2, j) tie-break
        SELECT vec_id, m, j FROM d
        QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, j) = 1
    ),
    scores AS (  -- ADC: the query-side d2 rows ARE the lookup table
        SELECT ql.vec_id AS q_id, c.vec_id AS n_id, sum(ql.d2) AS score
        FROM codes c
        JOIN d ql ON ql.m = c.m AND ql.j = c.j AND ql.vec_id < 8
        WHERE ql.vec_id <> c.vec_id
        GROUP BY 1, 2
    )
    SELECT q_id, n_id, CAST(rank AS INT) AS rank, score FROM (
        SELECT q_id, n_id, {sql_round("score", 6)} AS score,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY {sql_round("score", 6)}, n_id) AS rank
        FROM scores
    ) WHERE rank <= 5
"""


@register(
    "sim_topk_pq_adc",
    oracle=_PQ_ORACLE,
    tags=("ext-topk-sim", "pq", "ann", "quantization"),
)
def sim_topk_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (ADC) — the memory-bound tier of the ANN stack (Jégou et al., "
    Product Quantization for Nearest Neighbor Search", TPAMI 2011):
    64-dim vectors compress to 8 nibble codes (16x smaller than
    float32), and queries score candidates through an 8x16 lookup
    table without ever touching the original vectors.

    Deterministic init-derived codebooks (subspace slices of the first
    16 vectors — the same pattern that makes sim_kmeans_assign_oracle
    and sim_topk_ivf SQL-expressible) keep the whole pipeline
    oracle-checkable: encode is a per-subspace argmin with the pinned
    (d2, j) tie-break, the ADC lookup table is the query-side slice of
    the same distance relation, and ranking is on ROUND(score, 6) with
    n_id tie-break so float fold-order differences between engines
    (~1e-15) cannot flip ranks.

    Recall honesty: on the synthetic STRUCTURELESS random embeddings
    (PQ's known worst case) with init-only codebooks (what keeps this
    SQL-oracle-checkable), recall@5 vs exact L2 measures 0.25 — ~10x
    chance, pinned as load-bearing in tests/test_similarity.py;
    production recall comes from trained codebooks on clustered
    real-world embeddings, the same train-vs-fixed split the IVF pair
    (sim_topk_ivf / sim_topk_ivf_trained) demonstrates.

    100 TB shape: the codebook (16 x 64 floats) and per-query LUTs
    (8 x 16 doubles each) are driver-built literals/broadcasts — the
    documented O(k) pull, same contract as the k-means centroid
    collect; corpus encode is a scan-local projection (each vector
    reads the broadcast codebook, emits 8 small ints — this is the 16x
    storage/shuffle compression that makes billion-vector ANN fit in
    memory); scoring shuffles only (q_id, n_id, score) triples into
    the per-query top-k. No stage ever holds or shuffles raw vectors
    after encode."""
    emb = load(spark, sf_dir, "embeddings")
    M, K, D = 8, 16, 8
    init = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 16).select("vec_id", "embedding").collect()
    }
    missing = [j for j in range(K) if j not in init]
    if missing:
        raise ValueError(
            f"corpus too small for PQ codebook init: vec_ids {missing} "
            f"absent (need contiguous 0..{K - 1})"
        )
    codebook = [
        [init[j][m * D : (m + 1) * D] for j in range(K)] for m in range(M)
    ]
    return _pq_adc_topk(spark, emb, codebook, M, K, D)


def _pq_code_col(codebook, M, K, D):
    """PQ encode as a scan-local column expression: per-subspace L2
    argmin over the broadcast-literal codebook, (d2, j) tie-break via
    array_position-of-min. Returns the array<int> code column."""
    code_cols = []
    for m in range(M):
        cb = F.array(*[F.array(*[F.lit(v) for v in codebook[m][j]]) for j in range(K)])
        sub = F.slice(F.col("embedding"), m * D + 1, D)
        # NB single-arg lambda: a second Python parameter would make
        # PySpark treat this as an (element, index) transform lambda.
        # `sub` binds immediately (transform invokes the lambda during
        # expression construction), so the loop closure is safe.
        d2s = F.transform(
            cb,
            lambda c: F.aggregate(
                F.zip_with(
                    sub, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        code_cols.append((F.array_position(d2s, F.array_min(d2s)) - 1).cast("int"))
    return F.array(*code_cols)


def _pq_query_luts(spark, emb, codebook, M, K, D):
    """Per-query ADC lookup tables (M x K squared distances between the
    query's subvectors and every codebook centroid), built on the
    driver from the 8 query rows — O(queries x M x K) doubles, the
    documented bounded pull — and returned as a broadcastable frame."""
    q_rows = emb.filter(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    lut_data = []
    for r in q_rows:
        q = [float(x) for x in r["embedding"]]
        lut = [
            [
                sum(
                    (q[m * D + i] - codebook[m][j][i]) * (q[m * D + i] - codebook[m][j][i])
                    for i in range(D)
                )
                for j in range(K)
            ]
            for m in range(M)
        ]
        lut_data.append((int(r["vec_id"]), lut))
    return spark.createDataFrame(lut_data, "q_id: bigint, lut: array<array<double>>")


def _pq_lut_score(M):
    """ADC score: sum over subspaces of lut[m][code[m]] — pure column
    arithmetic against the broadcast LUT, no Python in the loop."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(M - 1)),
        F.lit(0.0),
        lambda acc, m: acc
        + F.element_at(F.element_at("lut", (m + 1).cast("int")), F.element_at("code", (m + 1).cast("int")) + 1),
    )


def _pq_adc_topk(spark, emb, codebook, M, K, D):
    """Shared PQ encode + ADC scoring + per-query top-5 (see
    sim_topk_pq_adc for the design narrative). ``codebook`` is
    driver-state [M][K][D] floats — init-derived for the
    oracle-checkable query, Lloyd-trained for the _trained twin.

    Encode and scoring run on the Arrow/numpy fast path (r8): the
    HOF-fold twins (_pq_code_col / _pq_lut_score) cost ~0.6 ms/row
    interpreted plus ~0.8 s of literal-tree plan build — constants a
    billion-row encode cannot afford. Both forms are pinned equal on
    the fixtures (codes bit-identical, final outputs identical) in
    tests/test_similarity.py."""
    from k8e_fetch_spark.functions.vectors import pq_adc_score_arrow, pq_encode_arrow

    coded = emb.select(
        F.col("vec_id").alias("n_id"),
        pq_encode_arrow(codebook)(F.col("embedding")).alias("code"),
    )
    lut_df = _pq_query_luts(spark, emb, codebook, M, K, D)
    scored = (
        coded.crossJoin(F.broadcast(lut_df))
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            round_fixed(pq_adc_score_arrow(F.col("code"), F.col("lut")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").asc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("q_id", "n_id", "rank", "score")
    )


def _pq_lloyd_iter_sql(i: int) -> str:
    """One PQ-training Lloyd iteration across ALL 8 subspaces at once —
    the subspace index m is a data column, not unrolled code: assign =
    per-(m, vec) L2 argmin with the (d2, j) tie-break, update =
    per-(m, j, pos) member means, empty clusters keep the previous
    centroid. Mirrors the numpy loop in sim_topk_pq_trained exactly."""
    return f"""
    pa{i} AS MATERIALIZED (
        SELECT vec_id, m, v, j FROM (
            SELECT s.vec_id, s.m, s.v, c.j,
                   row_number() OVER (PARTITION BY s.m, s.vec_id ORDER BY
                       list_sum(list_transform(list_zip(s.v, c.c),
                                p -> (p[1] - p[2]) * (p[1] - p[2]))), c.j) AS rn
            FROM sv s JOIN pcent{i - 1} c ON s.m = c.m
        ) WHERE rn = 1
    ),
    pm{i} AS MATERIALIZED (
        SELECT m, j, list(mv ORDER BY pos) AS mc FROM (
            SELECT m, j, pos, avg(v[pos]) AS mv
            FROM pa{i}, UNNEST(generate_series(1, 8)) AS g(pos)
            GROUP BY m, j, pos
        ) GROUP BY m, j
    ),
    pcent{i} AS MATERIALIZED (
        SELECT p.m, p.j, COALESCE(pm{i}.mc, p.c) AS c
        FROM pcent{i - 1} p LEFT JOIN pm{i} ON p.m = pm{i}.m AND p.j = pm{i}.j
    )"""


def _pq_trained_oracle() -> str:
    """The _PQ_ORACLE pipeline with TRAINED codebooks: 8 Lloyd
    iterations per subspace unrolled into CTEs (subspace = data
    dimension, so one chain trains all 8 codebooks), then the identical
    encode / ADC / rounded-rank tail. Training sample and init mirror
    the Spark side bit-for-bit in structure: first-1024-by-id sample,
    first-16-by-id slices as init, numpy-vs-SQL mean drift absorbed by
    the 6-dp score rounding and the rounded-rank tie-break."""
    iters = ",".join(_pq_lloyd_iter_sql(i) for i in range(1, 9))
    return f"""
    WITH sample AS (
        SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 1024
    ),
    sv AS MATERIALIZED (
        SELECT vec_id, m, e[m*8+1 : m*8+8] AS v
        FROM sample, UNNEST(generate_series(0, 7)) AS g(m)
    ),
    pcent0 AS MATERIALIZED (
        SELECT m, row_number() OVER (PARTITION BY m ORDER BY vec_id) - 1 AS j, v AS c
        FROM sv
        QUALIFY row_number() OVER (PARTITION BY m ORDER BY vec_id) <= 16
    ),
    {iters},
    subv AS (
        SELECT vec_id, m, (embedding::DOUBLE[])[m*8+1 : m*8+8] AS v
        FROM embeddings, UNNEST(generate_series(0, 7)) AS g(m)
    ),
    d AS (
        SELECT s.vec_id, s.m, c.j,
               list_sum(list_transform(list_zip(s.v, c.c),
                        p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
        FROM subv s JOIN pcent8 c ON s.m = c.m
    ),
    codes AS (
        SELECT vec_id, m, j FROM d
        QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, j) = 1
    ),
    scores AS (
        SELECT ql.vec_id AS q_id, c.vec_id AS n_id, sum(ql.d2) AS score
        FROM codes c
        JOIN d ql ON ql.m = c.m AND ql.j = c.j AND ql.vec_id < 8
        WHERE ql.vec_id <> c.vec_id
        GROUP BY 1, 2
    )
    SELECT q_id, n_id, CAST(rank AS INT) AS rank, score FROM (
        SELECT q_id, n_id, {sql_round("score", 6)} AS score,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY {sql_round("score", 6)}, n_id) AS rank
        FROM scores
    ) WHERE rank <= 5
"""


@register(
    "sim_topk_pq_trained",
    # r10 promotion: the 8-iteration sampled training unrolls into SQL
    # the same way the 2-3-iteration IVF/kmeans oracles did — bounded
    # iteration was never "not SQL-expressible", just bigger
    oracle=_pq_trained_oracle(),
    tags=("ext-topk-sim", "pq", "ann", "quantization", "train+search", "full-oracle"),
)
def sim_topk_pq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production PQ path: per-subspace codebooks TRAINED with
    Lloyd's k-means (numpy, 8 iterations, deterministic first-K init)
    on a bounded driver sample — exactly how real PQ indexes are built
    (codebook training happens on a sample on one machine; FAISS does
    the same), then the identical encode/LUT/score pipeline as
    sim_topk_pq_adc. The sample pull is bounded at 1024 vectors
    (~512 KB) regardless of corpus size — the documented O(k)
    driver-state contract. Deterministic end to end (fixed sample
    order, fixed init, argmin ties to the lower index), so repeat runs
    hash identically for the driver's rows-only check.

    Recall honesty (measured, not assumed): on the STRUCTURELESS
    synthetic vectors, trained recall@5 matches the init-only
    codebooks (0.225 vs 0.25 — a 1-hit-in-40 difference, noise):
    isotropic random data has no cluster structure for Lloyd to
    learn, so training cannot beat data points as centroids here.
    The variant's value is exercising the production
    train->encode->search plumbing end to end (the same reason
    sim_topk_ivf_trained exists beside sim_topk_ivf); on clustered
    real-world embeddings training is where PQ recall comes from.
    Both floors pinned in tests/test_similarity.py.

    Oracle fragility note (ADVICE r10): the SQL twin recomputes the
    8-iteration Lloyd unroll with DuckDB ``list_sum`` (a sequential
    fold), while this side sums with numpy (pairwise summation). The
    final 6-dp score rounding absorbs fold-order drift in the OUTPUT,
    but each training iteration's argmin is DISCRETE: a d2 near-tie
    that flips an assignment diverges the codebooks outright, which
    rounding cannot repair. The current fixtures land no training
    assignment within float ulp of a tie (verified by the green hash),
    but REGENERATED fixtures could spuriously fail this oracle with
    both sides individually correct — if that happens, suspect a
    training-time tie before suspecting either engine."""
    import numpy as np

    emb = load(spark, sf_dir, "embeddings")
    M, K, D = 8, 16, 8
    sample = (
        emb.filter(F.col("vec_id") < 1024)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    X = np.array([r["embedding"] for r in sample], dtype=np.float64)
    if len(X) < K:
        raise ValueError(
            f"corpus too small for PQ codebook training: {len(X)} sample "
            f"vectors, need at least K={K}"
        )
    codebook = []
    for m in range(M):
        sub = X[:, m * D : (m + 1) * D]
        cents = sub[:K].copy()  # deterministic first-K init
        for _ in range(8):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # numpy argmin ties to lower index
            for j in range(K):
                members = sub[assign == j]
                if len(members):
                    cents[j] = members.mean(axis=0)
        codebook.append([[float(v) for v in cents[j]] for j in range(K)])
    return _pq_adc_topk(spark, emb, codebook, M, K, D)


# IVF + PQ composed: the FAISS IVFPQ architecture (Jégou et al. TPAMI
# 2011, §V) — coarse cells restrict WHICH candidates are scored, PQ
# codes compress HOW they are scored. Both constituents are init-
# derived here (first-16 coarse centroids = sim_topk_ivf's, first-16
# subspace slices = sim_topk_pq_adc's), so the composition stays fully
# SQL-oracle-checkable: the oracle below is the PQ oracle's
# cb/subv/d/codes CTEs joined through the coarse assignment and probe
# relations. (No residual encoding: codes quantize raw vectors, the
# same simplification the PQ-alone query documents — residual PQ is a
# trained-codebook concern and would drop the oracle.)
_IVFPQ_ORACLE = f"""
    WITH init AS (
        SELECT vec_id AS j, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 16
    ),
    cb AS (
        SELECT m, j, e[m*8+1 : m*8+8] AS c
        FROM init, UNNEST(generate_series(0, 7)) AS g(m)
    ),
    subv AS (
        SELECT vec_id, m, (embedding::DOUBLE[])[m*8+1 : m*8+8] AS v
        FROM embeddings, UNNEST(generate_series(0, 7)) AS g(m)
    ),
    d AS (
        SELECT s.vec_id, s.m, c.j,
               list_sum(list_transform(list_zip(s.v, c.c),
                        p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
        FROM subv s JOIN cb c ON s.m = c.m
    ),
    codes AS (
        SELECT vec_id, m, j FROM d
        QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, j) = 1
    ),
    cent AS (
        SELECT vec_id AS cid, embedding AS c FROM embeddings WHERE vec_id < 16
    ),
    af AS (  -- coarse assignment: cosine argmax, (sim desc, cid) tie
        SELECT vec_id, cid FROM (
            SELECT e.vec_id, cent.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY {sql_cosine("e.embedding", "cent.c")} DESC, cent.cid) AS rn
            FROM embeddings e CROSS JOIN cent
        ) WHERE rn = 1
    ),
    probes AS (  -- 4 nearest cells per query
        SELECT q_id, cid FROM (
            SELECT q.vec_id AS q_id, cent.cid,
                   row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY {sql_cosine("q.embedding", "cent.c")} DESC, cent.cid) AS pr
            FROM embeddings q CROSS JOIN cent WHERE q.vec_id < 8
        ) WHERE pr <= 4
    ),
    scores AS (  -- ADC over candidates in probed cells only
        SELECT p.q_id, c.vec_id AS n_id, sum(ql.d2) AS score
        FROM codes c
        JOIN af a ON a.vec_id = c.vec_id
        JOIN probes p ON p.cid = a.cid
        JOIN d ql ON ql.m = c.m AND ql.j = c.j AND ql.vec_id = p.q_id
        WHERE c.vec_id <> p.q_id
        GROUP BY 1, 2
    )
    SELECT q_id, n_id, CAST(rank AS INT) AS rank, score FROM (
        SELECT q_id, n_id, {sql_round("score", 6)} AS score,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY {sql_round("score", 6)}, n_id) AS rank
        FROM scores
    ) WHERE rank <= 5
"""


@register(
    "sim_topk_ivfpq_adc",
    oracle=_IVFPQ_ORACLE,
    tags=("ext-topk-sim", "ivf", "pq", "ann", "quantization"),
)
def sim_topk_ivfpq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ composed — the billion-vector ANN architecture (FAISS
    IVFPQ; Jégou et al. TPAMI 2011 §V): the coarse quantizer restricts
    scoring to the 4 probed cells per query (candidate-count cut),
    and candidates are scored through 8-nibble PQ codes against the
    query's broadcast LUT (16x memory/bandwidth cut). The two levers
    compose multiplicatively, which is exactly why the architecture
    scales to 10^9 vectors.

    100 TB shape: coarse assign and PQ encode are both scan-local
    column expressions over broadcast-literal codebooks (zero shuffle,
    whole-stage codegen); the probe restriction is a broadcast join on
    centroid_id that drops ~12/16 of the corpus before any scoring
    work; only (q_id, n_id, score) triples reach the per-query top-k
    window. Nothing ever shuffles a raw vector or a full LUT product.

    Init-derived constituents (first-16 coarse centroids, first-16
    subspace slices) keep the full composition SQL-oracle-checkable —
    the same determinism trick as sim_topk_ivf / sim_topk_pq_adc;
    production recall comes from trained centroids/codebooks, the
    split both _trained twins demonstrate."""
    emb = load(spark, sf_dir, "embeddings")
    M, K, D = 8, 16, 8
    init = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 16).select("vec_id", "embedding").collect()
    }
    missing = [j for j in range(K) if j not in init]
    if missing:
        raise ValueError(
            f"corpus too small for PQ codebook init: vec_ids {missing} "
            f"absent (need contiguous 0..{K - 1})"
        )
    codebook = [[init[j][m * D : (m + 1) * D] for j in range(K)] for m in range(M)]

    from k8e_fetch_spark.functions.vectors import pq_adc_score_arrow, pq_encode_arrow

    centroids = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid")
    )
    # coarse assign + PQ encode in ONE scan projection (Arrow encode —
    # see _pq_adc_topk; the HOF twin is pinned equal in tests)
    coded = ivf_assign(emb, centroids, "vec_id").select(
        F.col("vec_id").alias("n_id"),
        "centroid_id",
        pq_encode_arrow(codebook)(F.col("embedding")).alias("code"),
    )

    queries_df = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    probe_w = Window.partitionBy("q_id").orderBy(F.desc("c_sim"), F.col("centroid_id"))
    probes = (
        queries_df.crossJoin(F.broadcast(centroids))
        .withColumn("c_sim", cosine_arrow(F.col("q_emb"), F.col("centroid")))
        .withColumn("_pr", F.row_number().over(probe_w))
        .filter(F.col("_pr") <= 4)
        .select("q_id", "centroid_id")
    )
    lut_df = _pq_query_luts(spark, emb, codebook, M, K, D)
    probe_luts = probes.join(lut_df, on="q_id")  # queries x 4 cells, k-row frame
    scored = (
        coded.join(F.broadcast(probe_luts), on="centroid_id")
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            round_fixed(pq_adc_score_arrow(F.col("code"), F.col("lut")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").asc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("q_id", "n_id", "rank", "score")
    )


_SEMDEDUP_ORACLE = f"""
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    plant AS (SELECT vec_id + 100000 AS vec_id, v FROM base WHERE vec_id < 25),
    e AS (SELECT vec_id, v FROM base UNION ALL SELECT vec_id, v FROM plant),
    cent0 AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS c
        FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)
    ),
    {{lloyd1}},
    {{lloyd2}},
    af AS (
        SELECT vec_id, v, cid, csim FROM (
            SELECT e.vec_id, e.v, c.cid,
                   {sql_cosine("e.v", "c.c")} AS csim,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY {sql_cosine("e.v", "c.c")} DESC, c.cid) AS rn
            FROM e CROSS JOIN cent2 c
        ) WHERE rn = 1
    ),
    ranked AS (
        SELECT vec_id, v, cid, csim,
               row_number() OVER (PARTITION BY cid ORDER BY csim, vec_id) AS rn
        FROM af
    ),
    dropped AS (
        SELECT DISTINCT a.vec_id
        FROM ranked a JOIN ranked b ON a.cid = b.cid AND b.rn < a.rn
        WHERE {sql_round(sql_cosine("a.v", "b.v"), 6)} >= 0.95
    )
    SELECT r.vec_id, CAST(r.cid AS INT) AS cluster_id,
           {sql_round("r.csim", 6)} AS centroid_sim,
           CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS INT) AS kept
    FROM ranked r LEFT JOIN dropped d ON r.vec_id = d.vec_id
""".format(lloyd1=_lloyd_iter_sql(1, 64), lloyd2=_lloyd_iter_sql(2, 64))


@register(
    "dedup_semantic_semdedup",
    oracle=_SEMDEDUP_ORACLE,
    tags=("ext-minhash-dedup", "semdedup", "kmeans", "embedding-dedup", "planted-oracle"),
)
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication") — the embedding-space
    member of the dedup family (exact / substring / MinHash / SimHash /
    cosine-LSH cover the lexical tiers): k-means-cluster the embedding
    corpus, then WITHIN each cluster drop every item that has cosine
    >= eps to an already-ranked item, keeping the member with the
    LOWEST similarity to the centroid (the paper's retention rule —
    rank ascending by centroid similarity, tie to the smaller id;
    an item is dropped iff some earlier-ranked cluster-mate is within
    eps, dropped or not, exactly the released implementation's
    upper-triangular similarity-matrix test).

    Hash-checked end to end against SQL ground truth: training (the
    same deterministic 2-iteration Lloyd from the first-16 init that
    sim_topk_ivf_trained unrolls into DuckDB CTEs), cosine coarse
    assignment, centroid-similarity ranking, and the pairwise
    eps-filter are ALL recomputed relationally by the oracle. Planted
    exact copies (vec_id+100000 for the first 25 ids) land in their
    original's cluster with bitwise-equal centroid similarity, rank
    directly after it on the id tie-break, and MUST come back
    kept=0 — natural eps-neighbors among the random embeddings count
    too and are mirrored by the oracle.

    Scale (100 TB): the within-cluster pairwise stage is the paper's
    own O(n^2/k) — production sizes k ~ n/target so each cluster holds
    a bounded member count and the quadratic is per-task-bounded, not
    corpus-global; the self-join key is the cluster id, the pair
    cosines are one BLAS batch per Arrow partition (cosine_arrow), and
    everything upstream is the zero-shuffle trained-IVF assign path.
    The k-row centroid frame broadcasts; no all-pairs stage exists
    outside a cluster. operators/clustering.py:semdedup holds the
    construction; its ``train_sample`` path (bounded-sample numpy
    Lloyd) is the 100 TB form where k scales ~ n/target to keep the
    per-cluster pairwise stage task-bounded — measured in the 20x
    stress harness with k scaled to hold cluster size constant."""
    from k8e_fetch_spark.operators.clustering import semdedup

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(planted)
    out = semdedup(corpus, "vec_id", "embedding", k=16, eps=0.95, iterations=2)
    return out.select(
        "vec_id",
        "cluster_id",
        round_fixed(F.col("centroid_sim"), 6).alias("centroid_sim"),
        "kept",
    )


_RRF_K = 60  # the standard RRF constant (Cormack et al. 2009)

_HYBRID_RRF_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           t -> t <> '') AS ts
        FROM documents
    ),
    dl AS (SELECT doc_id, len(ts) AS dl, ts FROM toks),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    posting AS (SELECT doc_id, dl, unnest(ts) AS token FROM dl),
    tf AS (
        SELECT doc_id, dl, token, count(*) AS tf
        FROM posting
        WHERE token IN ('scan', 'merge', 'vector')
        GROUP BY 1, 2, 3
    ),
    dft AS (SELECT token, count(*) AS df_t FROM tf GROUP BY 1),
    bm AS (
        SELECT doc_id,
               floor(sum(ln(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
                         * (tf * 2.2)
                         / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) * 10000.0
                     + 0.5) / 10000.0 AS score
        FROM tf JOIN dft USING (token) CROSS JOIN stats
        GROUP BY doc_id, n_docs, avgdl
    ),
    lex AS (
        SELECT doc_id, CAST(rnk AS INTEGER) AS r_lex FROM (
            SELECT doc_id,
                   row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
            FROM bm
        ) WHERE rnk <= 20
    ),
    qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
    cos AS (
        SELECT c.vec_id AS doc_id,
               {sql_round(sql_cosine('c.embedding', 'q.q'), 6)} AS score
        FROM embeddings c CROSS JOIN qv q
        WHERE c.vec_id != 0
    ),
    vec AS (
        SELECT doc_id, CAST(rnk AS INTEGER) AS r_vec FROM (
            SELECT doc_id,
                   row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
            FROM cos
        ) WHERE rnk <= 20
    ),
    fused AS (
        SELECT doc_id,
               floor((COALESCE(1.0 / ({_RRF_K} + r_lex), 0.0)
                      + COALESCE(1.0 / ({_RRF_K} + r_vec), 0.0)) * 1000000.0
                     + 0.5) / 1000000.0 AS rrf,
               r_lex, r_vec
        FROM lex FULL OUTER JOIN vec USING (doc_id)
    )
    SELECT doc_id, rrf, r_lex, r_vec
    FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
"""


@register("sim_hybrid_rrf", oracle=_HYBRID_RRF_ORACLE, tags=("ext-topk-sim", "hybrid-retrieval", "rrf"))
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009, k=60 — the standard
    hybrid-retrieval combiner, e.g. Elasticsearch/OpenSearch hybrid
    mode) of the engine's two retrieval legs: BM25 lexical top-20
    (`operators/text.py:bm25_scores`, same 3-term query as
    text_bm25_search) and exact cosine top-20 against query vector
    vec_id=0. Completes the retrieval stack: lexical
    (text_bm25_search), dense (sim_topk_* tiers), filtered-dense
    (sim_hybrid_search), and now rank fusion.

    RRF inputs are INTEGER ranks — both legs rank on round-then-rank
    scores, so the rank lists (and therefore the fused scores, sums of
    two exact rationals) are engine-stable without float hazards.

    Scale shape: each leg ends in TakeOrderedAndProject (per-partition
    heaps, no global sort exchange); the rank window then runs over
    exactly 20 rows per leg, never corpus-sized data; fusion is a
    20x20 full outer join on ids. Corpus-sized stages are the two legs'
    scans, both already scale-audited (BM25 posting filter, broadcast
    query vector)."""
    from k8e_fetch_spark.operators.text import bm25_scores

    docs = fan_out(load(spark, sf_dir, "documents"))
    bm = bm25_scores(docs, ("scan", "merge", "vector"), k1=1.2, b=0.75).select(
        "doc_id", round_fixed(F.col("bm25"), 4).alias("score")
    )
    lex_top = bm.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    lex = lex_top.select(
        "doc_id", F.row_number().over(w).cast("int").alias("r_lex")
    )

    emb = load(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    cos = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            round_fixed(cosine_arrow(F.col("embedding"), F.col("q_emb")), 6).alias("score"),
        )
    )
    vec_top = cos.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)
    vec = vec_top.select(
        "doc_id", F.row_number().over(w).cast("int").alias("r_vec")
    )

    fused = lex.join(vec, on="doc_id", how="full_outer").select(
        "doc_id",
        round_fixed(
            F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("r_vec")), F.lit(0.0)),
            6,
        ).alias("rrf"),
        "r_lex",
        "r_vec",
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(10)


_HYBRID_RRF_MULTI_ORACLE = f"""
    WITH qterms(q_id, token) AS (
        VALUES (0, 'scan'), (0, 'merge'), (0, 'vector'),
               (1, 'vector'), (1, 'window'),
               (2, 'fast'), (2, 'key'), (2, 'merge')
    ),
    toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           t -> t <> '') AS ts
        FROM documents
    ),
    dl AS (SELECT doc_id, len(ts) AS dl, ts FROM toks),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    posting AS (SELECT doc_id, dl, unnest(ts) AS token FROM dl),
    tf AS (
        SELECT doc_id, dl, token, count(*) AS tf
        FROM posting
        WHERE token IN (SELECT DISTINCT token FROM qterms)
        GROUP BY 1, 2, 3
    ),
    dft AS (SELECT token, count(*) AS df_t FROM tf GROUP BY 1),
    scored AS (
        SELECT q.q_id, tf.doc_id,
               ln(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
                 * (tf * 2.2)
                 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS w
        FROM tf JOIN dft USING (token) JOIN qterms q USING (token)
        CROSS JOIN stats
    ),
    agg AS (
        SELECT q_id, doc_id,
               floor(sum(w) * 10000.0 + 0.5) / 10000.0 AS score
        FROM scored GROUP BY 1, 2
    ),
    lex AS (
        SELECT q_id, doc_id, CAST(rnk AS INTEGER) AS r_lex FROM (
            SELECT q_id, doc_id,
                   row_number() OVER (
                       PARTITION BY q_id ORDER BY score DESC, doc_id
                   ) AS rnk
            FROM agg
        ) WHERE rnk <= 20
    ),
    qv AS (
        SELECT vec_id AS q_id, embedding AS q
        FROM embeddings WHERE vec_id IN (0, 1, 2)
    ),
    cos AS (
        SELECT q.q_id, c.vec_id AS doc_id,
               {sql_round(sql_cosine('c.embedding', 'q.q'), 6)} AS score
        FROM embeddings c CROSS JOIN qv q
        WHERE c.vec_id != q.q_id
    ),
    vec AS (
        SELECT q_id, doc_id, CAST(rnk AS INTEGER) AS r_vec FROM (
            SELECT q_id, doc_id,
                   row_number() OVER (
                       PARTITION BY q_id ORDER BY score DESC, doc_id
                   ) AS rnk
            FROM cos
        ) WHERE rnk <= 20
    ),
    fused AS (
        SELECT q_id, doc_id,
               floor((COALESCE(1.0 / ({_RRF_K} + r_lex), 0.0)
                      + COALESCE(1.0 / ({_RRF_K} + r_vec), 0.0)) * 1000000.0
                     + 0.5) / 1000000.0 AS rrf,
               r_lex, r_vec
        FROM lex FULL OUTER JOIN vec USING (q_id, doc_id)
    )
    SELECT q_id, doc_id, rrf, r_lex, r_vec FROM (
        SELECT q_id, doc_id, rrf, r_lex, r_vec,
               row_number() OVER (
                   PARTITION BY q_id ORDER BY rrf DESC, doc_id
               ) AS rnk
        FROM fused
    ) WHERE rnk <= 10
"""


@register(
    "sim_hybrid_rrf_multi",
    oracle=_HYBRID_RRF_MULTI_ORACLE,
    tags=("ext-topk-sim", "hybrid-retrieval", "rrf", "multi-query"),
)
def sim_hybrid_rrf_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion for a BATCH of three hybrid queries in
    one pass per leg (VERDICT r13 #5) — the production retrieval
    workload shape of :func:`sim_hybrid_rrf`: the lexical leg serves
    every query from ONE corpus scan (operators/text.py:
    bm25_scores_multi — broadcast (q_id, token) posting filter inside
    the scan stage, df computed once over distinct terms), the dense
    leg broadcasts the 3-row query-vector table against one embeddings
    scan, and fusion joins the two 20-rows-per-query rank lists.

    q_id 0 is EXACTLY sim_hybrid_rrf's query (same 3 terms, query
    vector vec_id=0, same rounding at every stage), so the single-query
    form is pinned in pytest as this row's q_id=0 slice — bit
    equality, not approx (tests/test_clustering.py).

    Scale shape: both legs cut to 20 rows per query with a rank-window
    filter that compiles to WindowGroupLimit BELOW the exchange (each
    map partition ships <=20 survivors per q_id — never corpus-sized
    sort input); fusion is a (3x20)x(3x20) full outer join on
    (q_id, doc_id); the final per-query top-10 windows over <=40 rows
    per query. Corpus-sized work is exactly two scans, both
    scale-audited (posting filter, broadcast query vectors)."""
    from k8e_fetch_spark.operators.text import bm25_scores_multi

    docs = fan_out(load(spark, sf_dir, "documents"))
    qmap = {
        0: ("scan", "merge", "vector"),
        1: ("vector", "window"),
        2: ("fast", "key", "merge"),
    }
    bm = bm25_scores_multi(docs, qmap, k1=1.2, b=0.75).select(
        "q_id", "doc_id", round_fixed(F.col("bm25"), 4).alias("score")
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("doc_id"))
    lex = (
        bm.withColumn("r_lex", F.row_number().over(wq).cast("int"))
        .filter(F.col("r_lex") <= 20)
        .select("q_id", "doc_id", "r_lex")
    )

    emb = load(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id").isin([0, 1, 2])).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    cos = (
        emb.crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("doc_id"),
            round_fixed(cosine_arrow(F.col("embedding"), F.col("q_emb")), 6).alias(
                "score"
            ),
        )
    )
    vec = (
        cos.withColumn("r_vec", F.row_number().over(wq).cast("int"))
        .filter(F.col("r_vec") <= 20)
        .select("q_id", "doc_id", "r_vec")
    )

    fused = lex.join(vec, on=["q_id", "doc_id"], how="full_outer").select(
        "q_id",
        "doc_id",
        round_fixed(
            F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("r_vec")), F.lit(0.0)),
            6,
        ).alias("rrf"),
        "r_lex",
        "r_vec",
    )
    wf = Window.partitionBy("q_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rnk", F.row_number().over(wf))
        .filter(F.col("rnk") <= 10)
        .select("q_id", "doc_id", "rrf", "r_lex", "r_vec")
    )


_MMR_ORACLE = f"""
WITH RECURSIVE
cands AS (
    SELECT c.vec_id AS doc_id,
           {sql_round(sql_cosine('q.embedding', 'c.embedding'), 6)} AS rel,
           c.embedding AS emb
    FROM embeddings q JOIN embeddings c ON c.vec_id <> 0
    WHERE q.vec_id = 0
    ORDER BY rel DESC, doc_id
    LIMIT 30
),
sims AS (
    SELECT a.doc_id AS ad, b.doc_id AS bd,
           {sql_round(sql_cosine('a.emb', 'b.emb'), 6)} AS sim
    FROM cands a JOIN cands b ON a.doc_id <> b.doc_id
),
sel AS (
    SELECT 1 AS rank, doc_id, rel AS mmr, [doc_id] AS chosen
    FROM (SELECT doc_id, rel FROM cands ORDER BY rel DESC, doc_id LIMIT 1)
    UNION ALL
    SELECT sel.rank + 1, pick.doc_id, pick.mmr,
           list_append(sel.chosen, pick.doc_id)
    FROM sel, LATERAL (
        SELECT c.doc_id AS doc_id,
               0.7 * c.rel - 0.3 * max(s.sim) AS mmr
        FROM cands c JOIN sims s
          ON s.ad = c.doc_id AND list_contains(sel.chosen, s.bd)
        WHERE NOT list_contains(sel.chosen, c.doc_id)
        GROUP BY c.doc_id, c.rel
        ORDER BY mmr DESC, doc_id
        LIMIT 1
    ) pick
    WHERE sel.rank < 10
)
SELECT CAST(rank AS INT) AS rank, doc_id,
       {sql_round('mmr', 6)} AS mmr_score
FROM sel
"""


@register(
    "sim_topk_mmr",
    oracle=_MMR_ORACLE,
    tags=("ext-topk-sim", "mmr", "diversification"),
)
def sim_topk_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversification (operators/rerank.py) of the dense leg's
    top-30 pool for query vec_id=0: greedy top-10 by
    ``0.7*rel - 0.3*max-sim-to-chosen``, the re-rank that stops
    near-duplicate hits crowding the cut. Completes the retrieval
    stack's post-processing: fusion (sim_hybrid_rrf*) merges legs,
    MMR diversifies the merged pool.

    Scale shape: the corpus-sized stage is the candidate scan +
    TakeOrdered top-30 (same plan as sim_topk_cosine_exact's leg);
    pairwise sims are pool-bounded (30x30 broadcast self-join); the
    sequential greedy runs per-query inside applyInPandas — one
    bounded Arrow group per query, parallel ACROSS queries, nothing
    at the driver. Float parity with the recursive-CTE oracle per
    operators/rerank.py's contract (pre-rounded inputs, mu=0.3
    explicit, doc_id ties)."""
    from k8e_fetch_spark.functions.caching import persist_scoped
    from k8e_fetch_spark.operators.rerank import mmr_rerank

    emb = load(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    # persisted (r15): the pool feeds THREE consumers (both self-join
    # sides + rel) across broadcast boundaries exchange reuse cannot
    # cross — unpinned, each re-ran the corpus score + top-30 cut
    # (scan audit: embeddings x6; pinned x3). 30 rows + embeddings.
    pool = persist_scoped(
        "topk_mmr.pool",
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            round_fixed(cosine_arrow(F.col("embedding"), F.col("q_emb")), 6).alias(
                "rel"
            ),
            "embedding",
        )
        .orderBy(F.desc("rel"), F.asc("doc_id"))
        .limit(30),
    )
    a = pool.select(
        F.col("doc_id").alias("ad"), F.col("embedding").alias("emb_a")
    )
    b = pool.select(
        F.col("doc_id").alias("bd"), F.col("embedding").alias("emb_b")
    )
    sims = (
        a.join(F.broadcast(b), F.col("ad") != F.col("bd"))
        .select(
            F.lit(0).alias("q_id"),
            "ad",
            "bd",
            round_fixed(cosine_arrow(F.col("emb_a"), F.col("emb_b")), 6).alias("sim"),
        )
    )
    rel = pool.select(F.lit(0).alias("q_id"), "doc_id", "rel")
    out = mmr_rerank(
        rel, sims, k=10, lam=0.7, mu=0.3, require_complete_pool=True
    )
    return out.select(
        "rank", "doc_id", round_fixed(F.col("mmr"), 6).alias("mmr_score")
    )


_MMR_MULTI_ORACLE = f"""
WITH RECURSIVE
qv AS (SELECT vec_id AS q_id, embedding AS q FROM embeddings WHERE vec_id IN (0, 1, 2)),
scored AS (
    SELECT q.q_id, c.vec_id AS doc_id,
           {sql_round(sql_cosine('c.embedding', 'q.q'), 6)} AS rel,
           c.embedding AS emb
    FROM embeddings c CROSS JOIN qv q WHERE c.vec_id != q.q_id
),
cands AS (
    SELECT q_id, doc_id, rel, emb FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, doc_id) AS rnk
        FROM scored
    ) WHERE rnk <= 30
),
sims AS (
    SELECT a.q_id, a.doc_id AS ad, b.doc_id AS bd,
           {sql_round(sql_cosine('a.emb', 'b.emb'), 6)} AS sim
    FROM cands a JOIN cands b ON a.q_id = b.q_id AND a.doc_id <> b.doc_id
),
sel AS (
    SELECT q_id, 1 AS rank, doc_id, rel AS mmr, [doc_id] AS chosen FROM (
        SELECT q_id, doc_id, rel,
               row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, doc_id) AS rnk
        FROM cands
    ) WHERE rnk = 1
    UNION ALL
    SELECT sel.q_id, sel.rank + 1, pick.doc_id, pick.mmr,
           list_append(sel.chosen, pick.doc_id)
    FROM sel, LATERAL (
        SELECT c.doc_id AS doc_id, 0.7 * c.rel - 0.3 * max(s.sim) AS mmr
        FROM cands c JOIN sims s
          ON s.q_id = sel.q_id AND s.ad = c.doc_id AND list_contains(sel.chosen, s.bd)
        WHERE c.q_id = sel.q_id AND NOT list_contains(sel.chosen, c.doc_id)
        GROUP BY c.doc_id, c.rel
        ORDER BY mmr DESC, doc_id
        LIMIT 1
    ) pick
    WHERE sel.rank < 10
)
SELECT q_id, CAST(rank AS INT) AS rank, doc_id, {sql_round('mmr', 6)} AS mmr_score
FROM sel
"""


@register(
    "sim_topk_mmr_multi",
    oracle=_MMR_MULTI_ORACLE,
    tags=("ext-topk-sim", "mmr", "diversification", "multi-query"),
)
def sim_topk_mmr_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversification for a BATCH of three queries (vec_id 0/1/2)
    in one pass — the production shape of :func:`sim_topk_mmr`, and
    the batch symmetry the retrieval stack now keeps throughout
    (bm25_scores_multi, sim_hybrid_rrf_multi, this). ONE corpus scan
    scores every query against the broadcast 3-row query-vector table
    (per-query self-exclusion, same rule as sim_hybrid_rrf_multi);
    per-query top-30 pools cut by a WindowGroupLimit-compiling rank
    filter; pairwise sims and the sequential greedy are pool-bounded,
    with applyInPandas distributing one query's greedy per task.

    q_id 0 is EXACTLY sim_topk_mmr's query (same corpus exclusion,
    same rounding at every stage), so the single form is pinned in
    pytest as this row's q_id=0 slice — bit equality
    (tests/test_rerank.py)."""
    from k8e_fetch_spark.functions.caching import persist_scoped
    from k8e_fetch_spark.operators.rerank import mmr_rerank

    emb = load(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").cast("int").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        emb.crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("doc_id"),
            round_fixed(cosine_arrow(F.col("embedding"), F.col("q_emb")), 6).alias(
                "rel"
            ),
            "embedding",
        )
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("rel"), F.asc("doc_id"))
    # persisted (r15): same three-consumer shape as sim_topk_mmr —
    # unpinned, the corpus scoring pass ran once per consumer (scan
    # audit: embeddings x6; pinned x3). <=30 rows/query + embeddings.
    pool = persist_scoped(
        "topk_mmr_multi.pool",
        scored.withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= 30)
        .drop("rnk"),
    )
    a = pool.select("q_id", F.col("doc_id").alias("ad"), F.col("embedding").alias("emb_a"))
    b = pool.select(
        F.col("q_id").alias("q_id_b"),
        F.col("doc_id").alias("bd"),
        F.col("embedding").alias("emb_b"),
    )
    sims = (
        a.join(
            F.broadcast(b),
            (F.col("q_id") == F.col("q_id_b")) & (F.col("ad") != F.col("bd")),
        )
        .select(
            "q_id",
            "ad",
            "bd",
            round_fixed(cosine_arrow(F.col("emb_a"), F.col("emb_b")), 6).alias("sim"),
        )
    )
    rel = pool.select("q_id", "doc_id", "rel")
    out = mmr_rerank(
        rel, sims, k=10, lam=0.7, mu=0.3, require_complete_pool=True
    )
    return out.select(
        "q_id", "rank", "doc_id", round_fixed(F.col("mmr"), 6).alias("mmr_score")
    )


# ---------------------------------------------------------------------------
# r15: the retrieval stack composed END TO END as one declared query —
# BM25 lexical leg + dense cosine leg -> RRF fusion -> MMR diversified
# cut, for a batch of three queries in one pass. The components are
# individually proven (text_bm25_multi_topk, sim_hybrid_rrf_multi,
# sim_topk_mmr_multi); composition exposes seam bugs parity on parts
# cannot (the r5 split/sample salt precedent), so the oracle below is
# the composition of the three proven oracle CTE chains.
# ---------------------------------------------------------------------------

_RETRIEVAL_PIPELINE_ORACLE = f"""
WITH RECURSIVE
qterms(q_id, token) AS (
    VALUES (0, 'scan'), (0, 'merge'), (0, 'vector'),
           (1, 'vector'), (1, 'window'),
           (2, 'fast'), (2, 'key'), (2, 'merge')
),
toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                       t -> t <> '') AS ts
    FROM documents
),
dl AS (SELECT doc_id, len(ts) AS dl, ts FROM toks),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
posting AS (SELECT doc_id, dl, unnest(ts) AS token FROM dl),
tf AS (
    SELECT doc_id, dl, token, count(*) AS tf
    FROM posting
    WHERE token IN (SELECT DISTINCT token FROM qterms)
    GROUP BY 1, 2, 3
),
dft AS (SELECT token, count(*) AS df_t FROM tf GROUP BY 1),
scored AS (
    SELECT q.q_id, tf.doc_id,
           ln(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
             * (tf * 2.2)
             / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS w
    FROM tf JOIN dft USING (token) JOIN qterms q USING (token)
    CROSS JOIN stats
),
agg AS (
    SELECT q_id, doc_id,
           floor(sum(w) * 10000.0 + 0.5) / 10000.0 AS score
    FROM scored GROUP BY 1, 2
),
lex AS (
    SELECT q_id, doc_id, CAST(rnk AS INTEGER) AS r_lex FROM (
        SELECT q_id, doc_id,
               row_number() OVER (
                   PARTITION BY q_id ORDER BY score DESC, doc_id
               ) AS rnk
        FROM agg
    ) WHERE rnk <= 20
),
qv AS (
    SELECT vec_id AS q_id, embedding AS q
    FROM embeddings WHERE vec_id IN (0, 1, 2)
),
cos AS (
    SELECT q.q_id, c.vec_id AS doc_id,
           {sql_round(sql_cosine('c.embedding', 'q.q'), 6)} AS score
    FROM embeddings c CROSS JOIN qv q
    WHERE c.vec_id != q.q_id
),
vec AS (
    SELECT q_id, doc_id, CAST(rnk AS INTEGER) AS r_vec FROM (
        SELECT q_id, doc_id,
               row_number() OVER (
                   PARTITION BY q_id ORDER BY score DESC, doc_id
               ) AS rnk
        FROM cos
    ) WHERE rnk <= 20
),
fused AS (
    SELECT q_id, doc_id,
           floor((COALESCE(1.0 / ({_RRF_K} + r_lex), 0.0)
                  + COALESCE(1.0 / ({_RRF_K} + r_vec), 0.0)) * 1000000.0
                 + 0.5) / 1000000.0 AS rrf
    FROM lex FULL OUTER JOIN vec USING (q_id, doc_id)
),
-- MMR pool: the fused candidates we have vectors for (inner join —
-- identical rule on the Spark side; at sf0.1 the lexical leg can rank
-- docs with no embedding row), top-30 per query by fused score
cands AS (
    SELECT q_id, doc_id, rrf AS rel, emb FROM (
        SELECT f.q_id, f.doc_id, f.rrf, e.embedding AS emb,
               row_number() OVER (
                   PARTITION BY f.q_id ORDER BY f.rrf DESC, f.doc_id
               ) AS rnk
        FROM fused f JOIN embeddings e ON e.vec_id = f.doc_id
    ) WHERE rnk <= 30
),
sims AS (
    SELECT a.q_id, a.doc_id AS ad, b.doc_id AS bd,
           {sql_round(sql_cosine('a.emb', 'b.emb'), 6)} AS sim
    FROM cands a JOIN cands b ON a.q_id = b.q_id AND a.doc_id <> b.doc_id
),
sel AS (
    SELECT q_id, 1 AS rank, doc_id, rel AS mmr, [doc_id] AS chosen FROM (
        SELECT q_id, doc_id, rel,
               row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, doc_id) AS rnk
        FROM cands
    ) WHERE rnk = 1
    UNION ALL
    SELECT sel.q_id, sel.rank + 1, pick.doc_id, pick.mmr,
           list_append(sel.chosen, pick.doc_id)
    FROM sel, LATERAL (
        SELECT c.doc_id AS doc_id, 0.7 * c.rel - 0.3 * max(s.sim) AS mmr
        FROM cands c JOIN sims s
          ON s.q_id = sel.q_id AND s.ad = c.doc_id AND list_contains(sel.chosen, s.bd)
        WHERE c.q_id = sel.q_id AND NOT list_contains(sel.chosen, c.doc_id)
        GROUP BY c.doc_id, c.rel
        ORDER BY mmr DESC, doc_id
        LIMIT 1
    ) pick
    WHERE sel.rank < 10
)
SELECT q_id, CAST(rank AS INT) AS rank, doc_id, {sql_round('mmr', 6)} AS mmr_score
FROM sel
"""


def _retrieval_fused(
    spark: SparkSession, sf_dir: str, emb: DataFrame | None = None
) -> DataFrame:
    """The pipeline's fusion stage: BM25 leg + dense leg -> per-query
    RRF scores over the union of both top-20 rank lists. Kept as a
    separate stage so pytest can pin it against sim_hybrid_rrf_multi
    (its per-query top-10 must BIT-equal that row's output — the
    composed pipeline is the proven parts wired together, not a
    reimplementation). ``emb`` lets the caller hand in a shared
    (persisted) embeddings frame so the dense leg and the caller's
    own consumers ride ONE scan (r16 — the persist_tokens treatment
    applied to the dense side); None loads the table directly with
    identical values."""
    from k8e_fetch_spark.operators.text import bm25_scores_multi

    docs = fan_out(load(spark, sf_dir, "documents"))
    qmap = {
        0: ("scan", "merge", "vector"),
        1: ("vector", "window"),
        2: ("fast", "key", "merge"),
    }
    # persist_tokens (VERDICT r15 #4): ONE shared tokenize+project
    # scan feeds the BM25 leg's three corpus consumers — scan audit
    # documents x3 -> x1, results bit-identical (fusion stays
    # bit-equal to sim_hybrid_rrf_multi, pinned in
    # tests/test_retrieval_pipeline.py). Honest A/B at sf0.1: wall
    # NEUTRAL (paired same-session best-of-3 on the leg: 1.78/1.64 s
    # unpinned vs 1.81/1.65 s pinned — the 60k-doc corpus is OS-cached
    # and the re-scans cost ~nothing here); adopted for the SCAN-COUNT
    # structure, which is what dominates at 100 TB (two fewer full
    # corpus passes + two fewer tokenizations per run).
    bm = bm25_scores_multi(
        docs, qmap, k1=1.2, b=0.75, persist_tokens=True
    ).select(
        "q_id", "doc_id", round_fixed(F.col("bm25"), 4).alias("score")
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("doc_id"))
    lex = (
        bm.withColumn("r_lex", F.row_number().over(wq).cast("int"))
        .filter(F.col("r_lex") <= 20)
        .select("q_id", "doc_id", "r_lex")
    )

    if emb is None:
        emb = load(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id").isin([0, 1, 2])).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    cos = (
        emb.crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("doc_id"),
            round_fixed(cosine_arrow(F.col("embedding"), F.col("q_emb")), 6).alias(
                "score"
            ),
        )
    )
    vec = (
        cos.withColumn("r_vec", F.row_number().over(wq).cast("int"))
        .filter(F.col("r_vec") <= 20)
        .select("q_id", "doc_id", "r_vec")
    )

    return lex.join(vec, on=["q_id", "doc_id"], how="full_outer").select(
        "q_id",
        "doc_id",
        round_fixed(
            F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("r_vec")), F.lit(0.0)),
            6,
        ).alias("rrf"),
        "r_lex",
        "r_vec",
    )


@register(
    "sim_retrieval_pipeline_multi",
    oracle=_RETRIEVAL_PIPELINE_ORACLE,
    tags=("ext-topk-sim", "hybrid-retrieval", "rrf", "mmr", "pipeline", "multi-query"),
)
def sim_retrieval_pipeline_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retrieval stack END TO END for a batch of three queries
    (VERDICT r14 #4): ONE corpus pass per leg serves the whole query
    workload — BM25 lexical top-20 (operators/text.py:
    bm25_scores_multi, broadcast posting filter inside the scan) and
    dense cosine top-20 (broadcast 3-row query-vector table) — fused
    by reciprocal-rank (k=60), then the fused pool is MMR-diversified
    (operators/rerank.py, lam=0.7/mu=0.3) to the final top-10.

    The MMR pool is the fused candidates WITH embedding rows (inner
    join; at sf0.1 the lexical leg ranks docs outside the embeddings
    table — the absent-pair rule must be identical on both engines,
    per operators/rerank.py's direction contract), cut to top-30 per
    query by fused score.

    Component pins (tests/test_rerank.py): the fusion stage's
    per-query top-10 BIT-equals sim_hybrid_rrf_multi; the greedy is
    the same mmr_rerank operator sim_topk_mmr_multi runs. The oracle
    is the composition of those rows' proven CTE chains.

    Scale shape: corpus-sized work is exactly the two leg scans (both
    scale-audited); every later stage is rank-bounded — both legs cut
    to 20 rows/query below the exchange (WindowGroupLimit), fusion
    joins two 60-row lists, the pool join against embeddings is a
    <=40-rows/query probe of one table, pairwise sims are 30x30
    pool-bounded, and the sequential greedy runs per-query inside
    applyInPandas with <=N^2 numbers per task."""
    from k8e_fetch_spark.functions.caching import persist_scoped
    from k8e_fetch_spark.operators.rerank import mmr_rerank

    # shared embeddings scan (r16, same structure as the BM25 leg's
    # persist_tokens): the query-vector probe, the dense leg, and the
    # pool join all read ONE persisted frame — scan audit embeddings
    # x3 -> x1, results bit-identical
    emb = persist_scoped(
        "retrieval_pipeline.emb", load(spark, sf_dir, "embeddings")
    )
    fused = _retrieval_fused(spark, sf_dir, emb=emb)
    wq = Window.partitionBy("q_id").orderBy(F.desc("rel"), F.asc("doc_id"))
    # persisted: the pool feeds THREE consumers (both sides of the
    # pairwise-sim self-join and the rel input) and exchange reuse
    # does not cross their broadcast boundaries — unpinned, each
    # consumer re-executed the ENTIRE two-leg fusion (scan audit read
    # documents x9 / embeddings x9; pool pinned -> x3/x3; with the
    # r16 shared scans — persist_tokens on the BM25 leg + the shared
    # emb frame above — documents x1 / embeddings x1). The frame is
    # pool-sized: <=30 rows/query + embedding.
    # fused is rank-bounded (<=60 rows/query) — broadcast it explicitly
    # so the pool join probes the embeddings scan instead of relying on
    # the size estimate to pick a build side (r18, guide §3.1; at 100 TB
    # the estimate would flip this into a corpus shuffle). Rows unchanged.
    fused = F.broadcast(fused)
    pool = persist_scoped(
        "retrieval_pipeline.pool",
        fused.join(emb, fused["doc_id"] == emb["vec_id"])
        .select("q_id", "doc_id", F.col("rrf").alias("rel"), "embedding")
        .withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= 30)
        .drop("rnk"),
    )
    a = pool.select(
        "q_id", F.col("doc_id").alias("ad"), F.col("embedding").alias("emb_a")
    )
    b = pool.select(
        F.col("q_id").alias("q_id_b"),
        F.col("doc_id").alias("bd"),
        F.col("embedding").alias("emb_b"),
    )
    sims = a.join(
        F.broadcast(b),
        (F.col("q_id") == F.col("q_id_b")) & (F.col("ad") != F.col("bd")),
    ).select(
        "q_id",
        "ad",
        "bd",
        round_fixed(cosine_arrow(F.col("emb_a"), F.col("emb_b")), 6).alias("sim"),
    )
    rel = pool.select("q_id", "doc_id", "rel")
    out = mmr_rerank(
        rel, sims, k=10, lam=0.7, mu=0.3, require_complete_pool=True
    )
    return out.select(
        "q_id", "rank", "doc_id", round_fixed(F.col("mmr"), 6).alias("mmr_score")
    )


# ---------------------------------------------------------------------------
# r15: binary quantization + Hamming prefilter + exact rescore — the
# third member of the quantization family (int8 scalar, PQ nibble
# codes, and now 1-bit sign codes; 32x smaller vectors, the coarsest/
# cheapest tier). Published shape: sign-binarize embeddings, prefilter
# with XOR+popcount Hamming distance, rescore the survivors with the
# exact metric (e.g. BPR — Yamada et al. 2021; faiss LSH index family).
# The 64-dim fixture packs into TWO 32-bit halves carried in BIGINTs —
# deliberately NOT one 64-bit word: bit 63 would need 1<<63, which
# overflows signed BIGINT arithmetic on both engines.
# ---------------------------------------------------------------------------


def _binary_sig_spark(col_name: str, half: int):
    """Spark column: pack sign bits (embedding[i] > 0) of one 32-dim
    half into a BIGINT. Generated by the same loop as the SQL twin —
    rendered as ONE ``F.expr`` string (a single Py4J round trip) instead
    of a 32-term ``F.when`` reduce chain, which cost ~190 driver round
    trips per half (r18: ~0.9 s of the row's warm wall was DataFrame
    CONSTRUCTION). CASE WHEN is exactly ``F.when().otherwise()`` and the
    left-assoc ``+`` chain matches the old ``reduce(operator.add)``
    fold, so the analyzed plan — and the hash-checked output — is
    unchanged (element_at is 1-based on both forms)."""
    base = half * 32
    terms = " + ".join(
        f"(CASE WHEN element_at({col_name}, {base + i + 1}) > 0 "
        f"THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i in range(32)
    )
    return F.expr(terms)


def _binary_sig_sql(expr: str, half: int) -> str:
    """DuckDB rendering of :func:`_binary_sig_spark` — same loop, same
    weights, so the engines cannot drift."""
    base = half * 32
    terms = " + ".join(
        f"CASE WHEN {expr}[{base + i + 1}] > 0 THEN CAST({1 << i} AS BIGINT) "
        "ELSE CAST(0 AS BIGINT) END"
        for i in range(32)
    )
    return f"({terms})"


_BINARY_RESCORE_ORACLE = f"""
    WITH sigs AS (
        SELECT vec_id, embedding,
               {_binary_sig_sql('embedding', 0)} AS s_lo,
               {_binary_sig_sql('embedding', 1)} AS s_hi
        FROM embeddings
    ),
    qsig AS (
        SELECT vec_id AS q_id, embedding AS q, s_lo AS q_lo, s_hi AS q_hi
        FROM sigs WHERE vec_id IN (0, 1, 2)
    ),
    ham AS (
        SELECT q.q_id, s.vec_id AS doc_id,
               CAST(bit_count(xor(s.s_lo, q.q_lo))
                    + bit_count(xor(s.s_hi, q.q_hi)) AS INTEGER) AS hamming,
               s.embedding AS emb, q.q AS q_emb
        FROM sigs s CROSS JOIN qsig q
        WHERE s.vec_id != q.q_id
    ),
    cand AS (
        SELECT q_id, doc_id, hamming, emb, q_emb FROM (
            SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY hamming, doc_id
            ) AS rnk FROM ham
        ) WHERE rnk <= 100
    ),
    resc AS (
        SELECT q_id, doc_id, hamming,
               {sql_round(sql_cosine('emb', 'q_emb'), 6)} AS cos_score
        FROM cand
    )
    SELECT CAST(q_id AS INT) AS q_id, doc_id, hamming, cos_score FROM (
        SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY cos_score DESC, doc_id
        ) AS rnk FROM resc
    ) WHERE rnk <= 10
"""


@register(
    "sim_topk_binary_rescore",
    oracle=_BINARY_RESCORE_ORACLE,
    tags=("ext-topk-sim", "quantization", "binary", "scale-path", "multi-query"),
)
def sim_topk_binary_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized ANN with exact rescoring for a batch of three
    queries: sign-binarize every embedding into two 32-bit halves
    (ONE scan-local codegen sum chain per half — 32x smaller than the
    float vectors, the coarsest quantization tier alongside int8 and
    PQ), prefilter per query by XOR+popcount Hamming distance to the
    broadcast query signatures, keep the top-100, then rescore ONLY
    the survivors with exact cosine and cut to top-10.

    Engine parity: the packing expression is generated for BOTH
    engines from the same Python loop (weights 1<<i per half —
    deliberately two halves, bit 63 would overflow signed BIGINT);
    Hamming is all-integer, so the prefilter cut is engine-stable
    with no float hazard; only the final rescore rounds (6 dp).

    Scale shape: signatures and Hamming distances are scan-local
    codegen over ONE corpus pass (query signatures ride a 3-row
    broadcast); the top-100 cut is a rank window that compiles to
    WindowGroupLimit below the exchange, so each map partition ships
    <=100 survivors per query; the rescore joins 300 candidate ids
    back against embeddings (a bounded probe) and the final top-10
    windows over 100 rows per query. The full-precision vectors are
    only ever touched for candidates — the 32x-compressed signatures
    carry the corpus-sized stage, which is the entire point of the
    tier."""
    emb = load(spark, sf_dir, "embeddings")
    sigs = emb.select(
        "vec_id",
        "embedding",
        _binary_sig_spark("embedding", 0).alias("s_lo"),
        _binary_sig_spark("embedding", 1).alias("s_hi"),
    )
    qsig = sigs.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").cast("int").alias("q_id"),
        F.col("s_lo").alias("q_lo"),
        F.col("s_hi").alias("q_hi"),
    )
    # the corpus-sized stage carries ONLY (id, two signature longs) —
    # the full float vectors are joined back for candidates below
    ham = (
        sigs.drop("embedding")
        .crossJoin(F.broadcast(qsig))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("doc_id"),
            (
                F.bit_count(F.col("s_lo").bitwiseXOR(F.col("q_lo")))
                + F.bit_count(F.col("s_hi").bitwiseXOR(F.col("q_hi")))
            )
            .cast("int")
            .alias("hamming"),
        )
    )
    wq = Window.partitionBy("q_id").orderBy(F.asc("hamming"), F.asc("doc_id"))
    cand = (
        ham.withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= 100)
        .drop("rnk")
    )
    qv = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").cast("int").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    # the candidate side is rank-bounded (<=100/query = 300 rows) — mark
    # it broadcast EXPLICITLY so the corpus-sized embeddings side is
    # probe-only at any scale (r18, guide §3.1: the planner's size
    # estimate broadcast the CORPUS here at bench SF, which inverts at
    # 100 TB into a sort-merge shuffle of the full table; the hint pins
    # the build side to the bounded relation). Same inner join rows.
    cand = F.broadcast(cand)
    resc = (
        cand.join(emb, cand["doc_id"] == emb["vec_id"])
        .join(F.broadcast(qv), on="q_id")
        .select(
            "q_id",
            "doc_id",
            "hamming",
            round_fixed(cosine_arrow(F.col("embedding"), F.col("q_emb")), 6).alias(
                "cos_score"
            ),
        )
    )
    wr = Window.partitionBy("q_id").orderBy(F.desc("cos_score"), F.asc("doc_id"))
    return (
        resc.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= 10)
        .select("q_id", "doc_id", "hamming", "cos_score")
    )
