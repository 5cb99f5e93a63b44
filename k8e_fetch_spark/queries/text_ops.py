"""ext-text-stats / langid / quality / token-count / fingerprint / exact dedup.

Every query is a pure column-expression plan over ``documents`` — no
Python in the hot path, no shuffle except the final aggregate where one
exists. The DuckDB oracles express the identical semantics with RE2
regexes and list lambdas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k8e_fetch_spark.functions.rounding import round_fixed, sql_round
from k8e_fetch_spark.io import fan_out, load
from k8e_fetch_spark.operators.text import (
    BPE_TOKEN_PATTERN,
    LANG_MARKERS,
    bm25_scores,
    bm25_scores_multi,
    fingerprint,
    langid_scores,
    n_bpe_tokens,
    n_tokens,
    punct_ratio,
    quality_score,
    stopword_ratio,
)
from k8e_fetch_spark.queries.registry import register

_N_TOKENS_SQL = (
    "CASE WHEN length(trim(text)) = 0 THEN 0 "
    "ELSE CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) END"
)


# ---- shared hash-decision expressions ------------------------------------
# ONE definition each for the split bucket (owner of the raw-doc_id hash
# domain) and the 'mix:'-salted sampling fraction, used by every query
# AND its oracle below — the two decisions must stay independent AND
# each internally consistent across queries (see the salt rationale in
# sample_source_temperature; an edit in one copy silently desyncing
# another is exactly the coupled-hash bug class).
_SPLIT_TRAIN_CEIL, _SPLIT_VAL_CEIL = "cb", "e5"  # ~80 / ~10 / ~10


def _split_sql(doc: str = "doc_id") -> str:
    return (
        f"CASE WHEN substr(md5(CAST({doc} AS VARCHAR)), 1, 2) <= '{_SPLIT_TRAIN_CEIL}' THEN 'train' "
        f"WHEN substr(md5(CAST({doc} AS VARCHAR)), 1, 2) <= '{_SPLIT_VAL_CEIL}' THEN 'val' "
        "ELSE 'test' END"
    )


def _split_col() -> "F.Column":
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return (
        F.when(bucket <= _SPLIT_TRAIN_CEIL, "train")
        .when(bucket <= _SPLIT_VAL_CEIL, "val")
        .otherwise("test")
    )


def _mix_frac_sql(doc: str = "doc_id") -> str:
    return (
        f"CAST(('0x' || substr(md5('mix:' || CAST({doc} AS VARCHAR)), 1, 8)) AS BIGINT)"
        " / 4294967296.0"
    )


def _mix_frac_col() -> "F.Column":
    return F.conv(
        F.substring(F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 8), 16, 10
    ).cast("bigint") / F.lit(4294967296.0)


@register(
    "text_stats_per_lang",
    oracle=f"""
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(sum({_N_TOKENS_SQL}) AS BIGINT) AS total_tokens,
               {sql_round('avg(n_chars)', 4)} AS avg_chars,
               {sql_round(f'avg({_N_TOKENS_SQL})', 4)} AS avg_tokens
        FROM documents
        GROUP BY lang
    """,
    tags=("ext-text-stats",),
)
def text_stats_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics per language: doc counts, char/token totals and
    means. Token counting is a split-size expression inside the scan."""
    docs = load(spark, sf_dir, "documents")
    nt = n_tokens(F.col("text"))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum(nt).cast("bigint").alias("total_tokens"),
        round_fixed(F.avg("n_chars"), 4).alias("avg_chars"),
        round_fixed(F.avg(nt), 4).alias("avg_tokens"),
    )


_MARKER_SQL = {
    lang: "CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), "
    f"t -> list_contains({list(markers)}, t))) AS INTEGER)"
    for lang, markers in LANG_MARKERS.items()
}

_LANGID_ORACLE = f"""
    WITH scored AS (
        SELECT doc_id,
               {_MARKER_SQL['en']} AS score_en,
               {_MARKER_SQL['fr']} AS score_fr,
               {_MARKER_SQL['de']} AS score_de,
               {_MARKER_SQL['es']} AS score_es
        FROM documents
    )
    SELECT doc_id, score_en, score_fr, score_de, score_es,
           CASE WHEN score_en >= score_fr AND score_en >= score_de AND score_en >= score_es THEN 'en'
                WHEN score_fr >= score_de AND score_fr >= score_es THEN 'fr'
                WHEN score_de >= score_es THEN 'de'
                ELSE 'es' END AS predicted_lang
    FROM scored
"""


@register("text_language_id", oracle=_LANGID_ORACLE, tags=("ext-text-stats", "langid"))
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID: deterministic stopword-marker scoring with a fixed
    argmax tie-break (en > fr > de > es). A real deployment swaps the
    lexicon for a larger one; the plan shape (pure projection) holds."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    scored = docs.select("doc_id", *langid_scores(F.col("text")))
    s = {lang: F.col(f"score_{lang}") for lang in LANG_MARKERS}
    predicted = (
        F.when((s["en"] >= s["fr"]) & (s["en"] >= s["de"]) & (s["en"] >= s["es"]), F.lit("en"))
        .when((s["fr"] >= s["de"]) & (s["fr"] >= s["es"]), F.lit("fr"))
        .when(s["de"] >= s["es"], F.lit("de"))
        .otherwise(F.lit("es"))
    )
    return scored.withColumn("predicted_lang", predicted)


_PUNCT_RATIO_SQL = (
    "CASE WHEN length(text) = 0 THEN 0.0 "
    "ELSE length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) / length(text) END"
)
_STOPWORD_RATIO_SQL = (
    "CASE WHEN length(trim(text)) = 0 THEN 0.0 "
    "ELSE len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), "
    "t -> list_contains(['the','a','and','of','to','in'], t))) "
    "/ len(string_split_regex(lower(trim(text)), '\\s+')) END"
)
_QUALITY_SQL = (
    "0.4 * least(length(text) / 500.0, 1.0) "
    f"+ 0.3 * (1.0 - least(({_PUNCT_RATIO_SQL}) * 4, 1.0)) "
    f"+ 0.3 * least(({_STOPWORD_RATIO_SQL}) * 5, 1.0)"
)


@register(
    "text_quality_score",
    oracle=f"""
        SELECT doc_id,
               {sql_round(_PUNCT_RATIO_SQL, 6)} AS punct_ratio,
               {sql_round(_STOPWORD_RATIO_SQL, 6)} AS stopword_ratio,
               {sql_round(_QUALITY_SQL, 6)} AS quality
        FROM documents
    """,
    tags=("ext-text-stats", "quality"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / punctuation-density / stopword-ratio
    heuristic — the standard pre-training filter shape."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        round_fixed(punct_ratio("text"), 6).alias("punct_ratio"),
        round_fixed(stopword_ratio("text"), 6).alias("stopword_ratio"),
        quality_score("text").alias("quality"),
    )


@register(
    "text_token_count",
    oracle=f"""
        SELECT doc_id,
               {_N_TOKENS_SQL} AS ws_tokens,
               CAST(len(regexp_extract_all(text, '{BPE_TOKEN_PATTERN}')) AS INTEGER) AS bpe_tokens
        FROM documents
    """,
    tags=("ext-text-stats", "tokenize"),
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish pre-tokenizer regex
    tokens, both as scan-local expressions."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        n_tokens(F.col("text")).alias("ws_tokens"),
        n_bpe_tokens(F.col("text")).alias("bpe_tokens"),
    )


@register(
    "text_fingerprint",
    oracle="""
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
        FROM documents
    """,
    tags=("ext-text-stats", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 of normalized text — the join key
    for cross-snapshot exact dedup at scale (32 hex chars shuffle
    instead of full documents)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))


@register(
    "corpus_prep_pipeline",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   {sql_round(_QUALITY_SQL, 6)} AS quality,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
                   {_N_TOKENS_SQL} AS ws_tokens
            FROM documents
        ),
        kept AS (
            SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
            FROM scored WHERE quality > 0.5
        )
        SELECT doc_id, lang, quality, ws_tokens FROM kept WHERE rn = 1
    """,
    tags=("ext-text-stats", "ext-exact-dedup", "corpus-prep"),
)
def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data prep flow: quality-filter -> exact
    dedup on the normalized fingerprint (keep lowest doc_id) -> token
    accounting. One scan, one shuffle (the fingerprint window); the
    quality filter runs scan-local BEFORE the shuffle so discarded docs
    never move."""
    from pyspark.sql.window import Window

    docs = fan_out(load(spark, sf_dir, "documents"))
    scored = docs.select(
        "doc_id",
        "lang",
        quality_score("text").alias("quality"),
        fingerprint(F.col("text")).alias("fp"),
        n_tokens(F.col("text")).alias("ws_tokens"),
    ).filter(F.col("quality") > 0.5)
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "quality", "ws_tokens")
    )


_STRATA = {"en": "33", "fr": "19", "de": "19", "es": "0c"}  # hex byte ceilings
# domain-salted ('strata:') so stratified membership is independent of
# the split assignment's raw-doc_id hash — see sample_source_temperature
_STRATA_SQL = " ".join(
    f"WHEN lang = '{lang}' THEN substr(md5('strata:' || CAST(doc_id AS VARCHAR)), 1, 2) <= '{ceil}'"
    for lang, ceil in _STRATA.items()
)


@register(
    "sample_stratified_deterministic",
    oracle=f"""
        SELECT doc_id, lang FROM documents
        WHERE CASE {_STRATA_SQL} ELSE FALSE END
    """,
    tags=("ext-text-stats", "sampling"),
)
def sample_stratified_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-language rates (en ~20%, fr/de ~10%,
    es ~5%) — the training-mixture rebalancing op. Membership is a pure
    hash of the salted row key ('strata:'+doc_id — its own hash domain,
    independent of the split assignment; first md5 byte vs a
    per-stratum ceiling):
    deterministic, engine-independent, stable under repartitioning and
    reruns — properties ``df.sample(seed=)`` does NOT give you across
    engines or partitionings. Scan-local filter; no shuffle."""
    docs = load(spark, sf_dir, "documents")
    bucket = F.substring(
        F.md5(F.concat(F.lit("strata:"), F.col("doc_id").cast("string"))), 1, 2
    )
    keep = None
    for lang, ceil in _STRATA.items():
        cond = (F.col("lang") == lang) & (bucket <= ceil)
        keep = cond if keep is None else (keep | cond)
    return docs.filter(keep).select("doc_id", "lang")


@register(
    "text_winnowing_fingerprint",
    # Promoted from rows-only (r9): with the cross-engine md5_32 gram
    # hash, the WHOLE winnow — gram extraction, window minima, the
    # short-doc whole-gram fallback, distinctness — is recomputed
    # relationally (window-min over gram positions) and hash-checked.
    oracle=r"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
            FROM documents
        ),
        grams AS (
            SELECT doc_id, i AS pos,
                   CAST(('0x' || substr(md5(array_to_string(t[i:i+2], ' ')), 1, 8)) AS BIGINT) AS h,
                   greatest(len(t) - 3, 0) + 1 AS m
            FROM toks,
                 UNNEST(generate_series(1, greatest(len(t) - 3, 0) + 1)) AS s(i)
        ),
        wins AS (
            SELECT doc_id, pos, m,
                   min(h) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
                   min(h) OVER (PARTITION BY doc_id) AS gmin
            FROM grams
        )
        SELECT DISTINCT doc_id, CASE WHEN m >= 4 THEN wmin ELSE gmin END AS fp
        FROM wins WHERE m < 4 OR pos <= m - 3
    """,
    tags=("ext-text-stats", "fingerprint", "rolling-hash"),
)
def text_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash winnowing fingerprints (k-gram hash minima per
    sliding window): the edit-tolerant document fingerprint, as
    distinct (doc_id, fp) rows ready for dedup joins. Deterministic;
    overlap behavior verified in tests/test_clustering.py.

    The declared form uses the md5_32 cross-engine gram hash so the
    full winnow is oracle-checkable (promoted from rows-only in r9 —
    the DSIR feature-hash convention); ``hash_mode="xxhash64"`` is the
    production 64-bit swap with identical winnow semantics, and the
    Spark plan — zero-shuffle scan-local slice/array_min projection —
    is the same in both modes."""
    from k8e_fetch_spark.operators.text import winnowing_fingerprints

    docs = fan_out(load(spark, sf_dir, "documents"))
    return winnowing_fingerprints(docs, hash_mode="md5_32")


@register(
    "dedup_exact_documents",
    oracle="""
        SELECT text, CAST(min(doc_id) AS BIGINT) AS keep_doc_id, count(*) AS n_copies
        FROM documents
        GROUP BY text
    """,
    tags=("ext-exact-dedup",),
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext-exact-dedup: keep-first per distinct content. GroupBy+min
    instead of a window sort: one shuffle keyed on content (or its
    hash at scale), map-side combine collapses repeats early."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


_CHUNK_SIZE, _CHUNK_STRIDE = 50, 40


@register(
    "text_chunk_documents",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
            WHERE length(trim(text)) > 0
        )
        SELECT doc_id,
               CAST((s - 1) / {_CHUNK_STRIDE} AS INTEGER) AS chunk_id,
               array_to_string(t[s:least(s + {_CHUNK_SIZE} - 1, len(t))], ' ') AS chunk_text,
               CAST(least(s + {_CHUNK_SIZE} - 1, len(t)) - s + 1 AS INTEGER) AS n_tokens
        FROM toks, UNNEST(generate_series(1, len(t), {_CHUNK_STRIDE})) AS g(s)
        WHERE s <= len(t)
    """,
    tags=("ext-text-stats", "chunking"),
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking for training pipelines: overlapping
    {_CHUNK_SIZE}-token windows with stride {_CHUNK_STRIDE} (10-token
    overlap), one row per chunk. Pure column ops (sequence -> slice ->
    concat) + posexplode; chunking is scan-local, the explode fans out
    rows without shuffling."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    toks = docs.filter(F.length(F.trim("text")) > 0).select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("t")
    )
    n = F.size("t")
    starts = F.sequence(F.lit(1), n, F.lit(_CHUNK_STRIDE))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            ((s - 1) / _CHUNK_STRIDE).cast("int").alias("chunk_id"),
            F.concat_ws(" ", F.slice(F.col("t"), s, F.lit(_CHUNK_SIZE))).alias("chunk_text"),
            F.least(s + _CHUNK_SIZE - 1, F.size(F.col("t"))).alias("_end"),
            s.alias("_s"),
        ),
    )
    return (
        toks.select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").alias("chunk_id"),
            F.col("c.chunk_text").alias("chunk_text"),
            (F.col("c._end") - F.col("c._s") + 1).cast("int").alias("n_tokens"),
        )
    )


_EMAIL_PAT = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_PAT = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"


@register(
    "text_redact_patterns",
    oracle=f"""
        SELECT doc_id,
               regexp_replace(regexp_replace(text, '{_EMAIL_PAT}', '<EMAIL>', 'g'),
                              '{_PHONE_PAT}', '<PHONE>', 'g') AS redacted,
               CAST(len(regexp_extract_all(text, '{_EMAIL_PAT}')) AS INTEGER) AS n_emails,
               CAST(len(regexp_extract_all(text, '{_PHONE_PAT}')) AS INTEGER) AS n_phones
        FROM documents
    """,
    tags=("ext-text-stats", "redaction"),
)
def text_redact_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern redaction (the pre-training PII scrub shape): replace
    email-/phone-shaped spans with placeholder tokens and count the
    hits. Pure regexp_replace/extract_all — scan-local, codegen'd;
    patterns are in the Java-regex/RE2 common subset so the oracle
    evaluates identical semantics."""
    docs = load(spark, sf_dir, "documents")
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_PAT, "<EMAIL>"), _PHONE_PAT, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        redacted.alias("redacted"),
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_PAT), F.lit(0))).cast("int").alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_PHONE_PAT), F.lit(0))).cast("int").alias("n_phones"),
    )


_VOCAB_ORACLE = """
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
        FROM documents
    )
    SELECT token,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
           count(*) AS tf
    FROM tok WHERE token <> ''
    GROUP BY token HAVING count(*) >= 20
"""


@register("text_vocabulary", oracle=_VOCAB_ORACLE, tags=("ext-text-stats", "vocabulary"))
def text_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary builder: term frequency + document frequency
    per lowercased whitespace token, thresholded — the first step of
    tokenizer training and stopword mining over a training corpus.
    One explode + one map-side-combined aggregate; the token explode is
    scan-local, so the only shuffle carries (token, partial counts)."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    return (
        tok.groupBy("token")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("tf"),
        )
        .filter(F.col("tf") >= 20)
    )


_TFIDF_ORACLE = """
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
        FROM documents
    ), filtered AS (SELECT * FROM tok WHERE token <> ''),
    tf AS (SELECT doc_id, token, count(*) AS tf_dt FROM filtered GROUP BY 1, 2),
    df AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM filtered GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT doc_id, token,
               floor((tf_dt * ln((n_docs + 1.0) / (df_t + 1.0))) * 10000.0 + 0.5) / 10000.0 AS tfidf
        FROM tf JOIN df USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tfidf FROM (
        SELECT doc_id, token, tfidf,
               row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rnk
        FROM scored
    ) WHERE rnk <= 3
"""


@register("text_tfidf_topk", oracle=_TFIDF_ORACLE, tags=("ext-text-stats", "tfidf"))
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms (smoothed idf = ln((N+1)/(df+1))):
    keyword extraction over the corpus. The doc-count scalar joins in as
    a broadcast literal table; ranking is scored-then-windowed with the
    score rounded BEFORE ranking on both engines (ln() low-order bits
    differ across libm implementations; ranking on raw doubles would be
    tie-unstable). Shuffles: token aggregate, df aggregate, final
    per-doc window — all map-side combined."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf_dt"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df_t"))
    # corpus size as a broadcast 1-row aggregate, not a driver-side
    # .count() action: the scalar stays inside the plan (one job total)
    n = load(spark, sf_dir, "documents").agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, on="token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            round_fixed(
                F.col("tf_dt") * F.log((F.col("n_docs") + 1.0) / (F.col("df_t") + 1.0)), 4
            ),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "token", "tfidf")
    )


# Benchmark decontamination: the published convention is 13-gram overlap
# against the eval suites; the synthetic corpus's short word-soup docs
# only collide at 3-grams, so the DECLARED query uses k=3 (the operator
# takes k). Gram semantics mirror operators.similarity.shingles(): a doc
# shorter than k words contributes its whole trimmed text as one gram.
_DECONTAM_ORACLE = """
    WITH toks AS (
        SELECT doc_id, trim(text) AS tt,
               string_split_regex(trim(text), '\\s+') AS t
        FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc_id,
               CASE WHEN len(t) >= 3 THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                    ELSE tt END AS g
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 1))) AS s(i)
    ),
    eval_grams AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
    SELECT c.doc_id, CAST(count(DISTINCT c.g) AS BIGINT) AS hit_grams
    FROM grams c JOIN eval_grams e USING (g)
    WHERE c.doc_id % 97 <> 0
    GROUP BY c.doc_id
"""


@register(
    "text_decontaminate_ngram",
    oracle=_DECONTAM_ORACLE,
    tags=("ext-text-stats", "decontamination"),
)
def text_decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-set decontamination: flag every training document that
    shares a word n-gram with a held-out benchmark/eval set (here the
    deterministic slice doc_id % 97 == 0), reporting how many distinct
    grams leak. 100 TB shape: the eval side is benchmarks — millions of
    grams at most — so its distinct gram set is BROADCAST and the
    corpus side never shuffles text: grams explode inside the scan
    stage, the broadcast hash join filters them to the (rare) hits, and
    only (doc_id, gram) hit pairs reach the count-distinct aggregate."""
    from k8e_fetch_spark.operators.similarity import shingles

    docs = fan_out(load(spark, sf_dir, "documents"))
    grams = docs.select("doc_id", F.explode(shingles(F.col("text"), k=3)).alias("g"))
    eval_grams = grams.filter(F.col("doc_id") % 97 == 0).select("g").distinct()
    return (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(eval_grams), on="g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("hit_grams"))
    )


@register(
    "text_decontaminate_bloom",
    oracle=_DECONTAM_ORACLE,
    tags=("ext-text-stats", "decontamination", "bloom"),
)
def text_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination with a BLOOM-PREFILTERED probe side — the exact
    same answer as text_decontaminate_ngram (identical oracle SQL, so
    the driver hash-compares both against one ground truth), via the
    plan shape that survives eval sets too big to broadcast:

    1. the eval grams' Bloom bitmap is built distributively and
       collected bounded by the BITMAP size (operators/text.py:
       bloom_build_bitmap — m sized to 16 bits/gram, FP ~0.3% at k=3);
    2. the corpus gram stream probes the broadcast bitmap with pure
       column expressions inside the scan stage (bloom_member), so
       ~all clean grams drop scan-locally, never shuffling;
    3. only the bloom-positive survivors (true hits + ~0.3% FPs) meet
       the eval grams in an EXACT confirm join — left to Catalyst/AQE
       with no broadcast hint: at fixture scale it broadcasts, at eval
       sets beyond broadcast limits it shuffles only the tiny survivor
       set instead of the full corpus gram stream (the 100 TB point).

    False positives cannot leak into the answer (the confirm join is
    exact); false negatives cannot exist (Bloom property), so the
    result is bit-identical to the broadcast-join form at any FP rate."""
    from k8e_fetch_spark.functions.caching import persist_scoped
    from k8e_fetch_spark.operators.similarity import shingles
    from k8e_fetch_spark.operators.text import bloom_build_bitmap, bloom_member

    docs = fan_out(load(spark, sf_dir, "documents"))
    grams = docs.select("doc_id", F.explode(shingles(F.col("text"), k=3)).alias("g"))
    # persisted for the bitmap build AND the confirm join; scoped so
    # repeated executions don't accumulate cache entries (see caching.py)
    eval_grams = persist_scoped(
        "text_decontaminate_bloom.eval_grams",
        grams.filter(F.col("doc_id") % 97 == 0).select("g").distinct(),
    )
    n_eval = eval_grams.count()
    m_bits = 1 << max(10, (16 * max(n_eval, 1) - 1).bit_length())  # ~16 bits/gram
    bitmap = spark.createDataFrame(
        [(bloom_build_bitmap(eval_grams, "g", m_bits, k=3),)], "bitmap: array<bigint>"
    )
    candidates = (
        grams.filter(F.col("doc_id") % 97 != 0)
        .crossJoin(F.broadcast(bitmap))
        .filter(bloom_member(F.col("g"), F.col("bitmap"), m_bits, k=3))
        .select("doc_id", "g")
    )
    return (
        candidates.join(eval_grams, on="g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("hit_grams"))
    )


# PII scrubbing patterns — written in the COMMON Java-regex / RE2
# subset (no backrefs, no lookaround) so Spark and DuckDB evaluate
# identical semantics; \b is ASCII word-boundary in both.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\+\d{7,15}"

_PII_ORACLE = f"""
    WITH base AS (
        SELECT doc_id,
               text || CASE WHEN doc_id % 7 = 0 THEN
                   ' contact user' || doc_id::VARCHAR || '@mail.example.com on 10.'
                   || (doc_id % 200)::VARCHAR || '.0.' || (doc_id % 250)::VARCHAR
                   || ' tel +1415555' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
               ELSE '' END AS t
        FROM documents
    ),
    s1 AS (SELECT doc_id,
                  len(regexp_extract_all(t, '{_PII_EMAIL}')) AS n_emails,
                  regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>', 'g') AS t1
           FROM base),
    s2 AS (SELECT doc_id, n_emails,
                  len(regexp_extract_all(t1, '{_PII_IP}')) AS n_ips,
                  regexp_replace(t1, '{_PII_IP}', '<IP>', 'g') AS t2
           FROM s1),
    s3 AS (SELECT doc_id, n_emails, n_ips,
                  len(regexp_extract_all(t2, '{_PII_PHONE}')) AS n_phones,
                  regexp_replace(t2, '{_PII_PHONE}', '<PHONE>', 'g') AS t3
           FROM s2)
    SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails,
           CAST(n_ips AS BIGINT) AS n_ips,
           CAST(n_phones AS BIGINT) AS n_phones,
           md5(t3) AS scrub_md5
    FROM s3
"""


@register(
    "text_pii_scrub",
    oracle=_PII_ORACLE,
    tags=("ext-text-stats", "pii"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the RefinedWeb/Pile-style masking stage every
    production training pipeline runs: emails, IPv4 addresses and
    international phone numbers are replaced with typed mask tokens
    and counted per document. The synthetic corpus carries no PII, so
    a deterministic slice (doc_id % 7 == 0) gets a PLANTED suffix
    built identically on both engines — the regexes are exercised on
    real matches, not vacuously. 100 TB shape: three chained
    regexp_replace + regexp_count column expressions, all inside the
    scan projection (zero shuffles, whole-stage codegen); the output
    carries an md5 of the scrubbed text, not the text, so the result
    set stays narrow. Parity notes: patterns live in the common
    Java-regex/RE2 subset; DuckDB's regexp_replace needs the 'g' flag
    to match Spark's global-replace default; masking order
    (email -> ip -> phone) and count-after-previous-mask are pinned
    identically on both sides."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    did = F.col("doc_id")
    suffix = F.when(
        did % 7 == 0,
        F.concat(
            F.lit(" contact user"),
            did.cast("string"),
            F.lit("@mail.example.com on 10."),
            (did % 200).cast("string"),
            F.lit(".0."),
            (did % 250).cast("string"),
            F.lit(" tel +1415555"),
            F.lpad((did % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    t = F.concat(F.col("text"), suffix)
    t1 = F.regexp_replace(t, _PII_EMAIL, "<EMAIL>")
    t2 = F.regexp_replace(t1, _PII_IP, "<IP>")
    t3 = F.regexp_replace(t2, _PII_PHONE, "<PHONE>")
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(_PII_EMAIL)).cast("bigint").alias("n_emails"),
        F.regexp_count(t1, F.lit(_PII_IP)).cast("bigint").alias("n_ips"),
        F.regexp_count(t2, F.lit(_PII_PHONE)).cast("bigint").alias("n_phones"),
        F.md5(t3).alias("scrub_md5"),
    )


_PACKING_ORACLE = f"""
    WITH toks AS (
        SELECT source, doc_id, {_N_TOKENS_SQL} AS n_tok FROM documents
    ),
    c AS (
        SELECT source, doc_id, n_tok,
               COALESCE(SUM(n_tok) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
        FROM toks
    )
    SELECT source, CAST(FLOOR(start_tok / 2048.0) AS BIGINT) AS pack_id,
           count(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS pack_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM c GROUP BY 1, 2
"""


@register(
    "text_sequence_packing",
    oracle=_PACKING_ORACLE,
    tags=("ext-text-stats", "packing"),
)
def text_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (the standard LLM pre-training
    layout): documents are laid end-to-end in deterministic (source,
    doc_id) order and cut into fixed 2048-token packs; a doc belongs to
    the pack where its first token lands. Packing is keyed PER SOURCE
    shard on purpose — a single global pack order would funnel 100 TB
    through one sort, while per-shard packing is embarrassingly parallel
    (one window sort per shard partition, no cross-shard shuffle), which
    is exactly how real pipelines pack per input shard. Output is the
    per-pack manifest: doc count, token total, doc-id span."""
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    nt = n_tokens(F.col("text"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(nt).over(w), F.lit(0))
    packed = docs.select(
        "source",
        "doc_id",
        nt.alias("n_tok"),
        F.floor(start / F.lit(2048.0)).cast("bigint").alias("pack_id"),
    )
    return packed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# Gopher-style repetition thresholds: remove docs whose most frequent
# word 2-gram covers >20% of all 2-grams (the published top-2-gram rule)
# or whose duplicate-gram mass exceeds 90%. keep is computed from the
# ROUNDED fractions on both sides so boundary docs cannot disagree.
_REPETITION_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, trim(lower(text)) AS tt,
               string_split_regex(trim(lower(text)), '\\s+') AS t
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 2 THEN t[i] || ' ' || t[i+1] ELSE tt END AS g
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - 1, 1))) AS s(i)
    ),
    counts AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2),
    agg AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
               CAST(max(c) AS BIGINT) AS top_gram_count,
               CAST(count(*) AS BIGINT) AS distinct_grams
        FROM counts GROUP BY 1
    ),
    fr AS (
        SELECT doc_id, n_grams, top_gram_count,
               {sql_round('top_gram_count * 1.0 / n_grams', 6)} AS top_gram_frac,
               {sql_round('(n_grams - distinct_grams) * 1.0 / n_grams', 6)} AS dup_gram_frac
        FROM agg
    )
    SELECT doc_id, n_grams, top_gram_count, top_gram_frac, dup_gram_frac,
           CAST(CASE WHEN top_gram_frac <= 0.2 AND dup_gram_frac <= 0.9
                THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM fr
"""


@register(
    "text_repetition_filter",
    oracle=_REPETITION_ORACLE,
    tags=("ext-text-stats", "gopher-repetition"),
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition filter (the Gopher/MassiveText rule
    family): per doc, the total/top/distinct word-2-gram counts, the
    top-gram and duplicate-gram fractions, and the keep verdict
    (top-2-gram fraction <= 0.2 AND duplicate-gram mass <= 0.9).
    Zero-shuffle: repetition_stats sorts each doc's gram array and folds
    run-lengths inside the scan stage — no explode, no groupBy, so the
    filter is a pure map over the corpus at any scale."""
    from k8e_fetch_spark.operators.text import repetition_stats

    docs = fan_out(load(spark, sf_dir, "documents"))
    stats = docs.select("doc_id", repetition_stats(F.col("text"), n=2).alias("r"))
    fr = stats.select(
        "doc_id",
        F.col("r.n_grams").alias("n_grams"),
        F.col("r.top_gram_count").alias("top_gram_count"),
        round_fixed(F.col("r.top_gram_count") / F.col("r.n_grams"), 6).alias("top_gram_frac"),
        round_fixed(
            (F.col("r.n_grams") - F.col("r.distinct_grams")) / F.col("r.n_grams"), 6
        ).alias("dup_gram_frac"),
    )
    return fr.withColumn(
        "keep",
        F.when((F.col("top_gram_frac") <= 0.2) & (F.col("dup_gram_frac") <= 0.9), 1)
        .otherwise(0)
        .cast("bigint"),
    )


# CCNet-style LM quality filter, unigram flavor: score each doc by the
# mean log10 probability of its tokens under the corpus's own unigram
# distribution. Garbage/rare-token docs score low; the real pipeline
# swaps the corpus unigram table for a KenLM model — the Spark shape
# (broadcast LM table, scan-side scoring, per-doc mean) is identical.
_UNIGRAM_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
        FROM documents
    ), filtered AS (SELECT * FROM tok WHERE token <> ''),
    vocab AS (SELECT token, count(*) AS c FROM filtered GROUP BY 1),
    tot AS (SELECT sum(c) AS total FROM vocab),
    scored AS (
        SELECT f.doc_id, log10(v.c * 1.0 / t.total) AS lp
        FROM filtered f JOIN vocab v USING (token) CROSS JOIN tot t
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_scored_tokens,
           {sql_round('avg(lp)', 6)} AS avg_logprob
    FROM scored GROUP BY doc_id
"""


@register(
    "text_unigram_logprob",
    oracle=_UNIGRAM_ORACLE,
    tags=("ext-text-stats", "lm-quality"),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    token distribution — the CCNet/LM-filter quality signal shape.
    100 TB design: the unigram table is the aggregate of one token
    explode (map-side combined, shuffles (token, count) only); its
    top-of-Zipf mass makes it small relative to the corpus, so scoring
    is a BROADCAST join against the exploded tokens (the token stream
    never shuffles), and the per-doc mean shuffles (doc_id, partial
    sums). The corpus total is a map-side-combined SUM over the
    PERSISTED vocab, collected as one scalar and inlined as a literal:
    the persist keeps the explode chain single-execution (no exchange
    reuse across a broadcast boundary, so a broadcast-scalar subplan
    would re-run it), and unlike the unpartitioned-window form used
    through round 6, no stage ever holds the full vocabulary in one
    task — web-corpus vocabulary grows with corpus size, so that
    single-partition shuffle was the pipeline's one non-scalable
    stage. The driver-side collect is one Row of one long — the same
    documented k-bytes-to-driver contract as the k-means centroid
    pull."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    from k8e_fetch_spark.functions.caching import persist_scoped

    # persisted for the scalar-total collect AND the broadcast-lm join;
    # scoped so repeated executions don't accumulate cache entries
    vocab = persist_scoped(
        "text_unigram_logprob.vocab",
        tok.groupBy("token").agg(F.count(F.lit(1)).alias("c")),
    )
    total = vocab.agg(F.sum("c")).collect()[0][0] or 1  # empty corpus: lm is empty anyway
    lm = vocab.select("token", F.log10(F.col("c") / F.lit(float(total))).alias("lp"))
    return (
        tok.join(F.broadcast(lm), on="token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_scored_tokens"),
            round_fixed(F.avg("lp"), 6).alias("avg_logprob"),
        )
    )


_OVERLAP_ORACLE = """
    WITH toks AS (SELECT source, trim(text) AS tt,
                         string_split_regex(trim(text), '\\s+') AS t
                  FROM documents),
    shingles AS (
        SELECT DISTINCT source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
        FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(i)
        WHERE len(t) >= 3
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_shared_shingles
    FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.source < b.source
    GROUP BY 1, 2
"""


@register(
    "dedup_cross_source_overlap",
    oracle=_OVERLAP_ORACLE,
    tags=("ext-exact-dedup", "corpus-diagnostics"),
)
def dedup_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source n-gram overlap matrix — the dump-overlap diagnostic
    run before mixing crawl snapshots into a training set (how much of
    source B's content already appears in source A?). Counts distinct
    3-gram shingles shared per source pair via an inverted-index
    self-join on the shingle: a shingle present in k sources yields
    C(k,2) pairs, bounded by the source count, never by corpus size —
    no cross product at any scale. The shuffle carries (source, shingle)
    pairs only; document payloads never leave the scan stage."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    toks = docs.select("source", F.split(F.trim("text"), r"\s+").alias("t"))
    idx = F.when(F.size("t") >= 3, F.sequence(F.lit(1), F.size("t") - 2)).otherwise(
        F.array().cast("array<int>")
    )
    sh = toks.select(
        "source",
        F.explode(
            F.array_distinct(
                F.transform(
                    idx,
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(F.col("t"), i),
                        F.element_at(F.col("t"), i + 1),
                        F.element_at(F.col("t"), i + 2),
                    ),
                )
            )
        ).alias("sh"),
    ).distinct()
    a = sh.select(F.col("source").alias("source_a"), "sh")
    b = sh.select(F.col("source").alias("source_b"), "sh")
    return (
        a.join(b, on="sh")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_shingles"))
    )


_NOVELTY_ORACLE = f"""
    WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
    shingles AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
        FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(i)
        WHERE len(t) >= 3
    ),
    intro AS (SELECT sh, min(doc_id) AS first_doc FROM shingles GROUP BY sh)
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(count(*) FILTER (WHERE i.first_doc = s.doc_id) AS BIGINT) AS n_novel,
           {sql_round('count(*) FILTER (WHERE i.first_doc = s.doc_id) * 1.0 / count(*)', 6)} AS novelty
    FROM shingles s JOIN intro i USING (sh)
    GROUP BY s.doc_id
"""


@register(
    "text_shingle_novelty",
    oracle=_NOVELTY_ORACLE,
    tags=("ext-text-stats", "corpus-diagnostics"),
)
def text_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document shingle novelty: the fraction of a doc's distinct
    3-gram shingles it introduces to the corpus (first occurrence by
    doc_id order) — the freshness signal behind dedup-aware data
    curation (a doc whose grams all appeared earlier adds nothing).
    Plan: one explode to the distinct (doc, shingle) inverted index,
    one map-side-combined min aggregate per shingle, a join back on the
    SAME shingle key (exchange reuse, no second shuffle of the index),
    then the per-doc aggregate. No cross product; candidate volume is
    linear in corpus shingle count."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("t"))
    idx = F.when(F.size("t") >= 3, F.sequence(F.lit(1), F.size("t") - 2)).otherwise(
        F.array().cast("array<int>")
    )
    sh = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    idx,
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(F.col("t"), i),
                        F.element_at(F.col("t"), i + 1),
                        F.element_at(F.col("t"), i + 2),
                    ),
                )
            )
        ).alias("sh"),
    )
    intro = sh.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum((F.col("first_doc") == F.col("doc_id")).cast("long"))
    return (
        sh.join(intro, on="sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            novel.cast("bigint").alias("n_novel"),
            round_fixed(novel / F.count(F.lit(1)), 6).alias("novelty"),
        )
    )


@register(
    "corpus_split_assign",
    oracle=f"""
        SELECT doc_id, source, {_split_sql()} AS split
        FROM documents
    """,
    tags=("ext-text-stats", "split"),
)
def corpus_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (~80/10/10) by hashing
    the row key — the split every training pipeline needs to be STABLE:
    membership is a pure function of doc_id (first md5 byte vs fixed
    ceilings), so it survives reruns, repartitioning, corpus growth
    (old docs never switch splits) and engine changes. Scan-local
    projection; zero shuffle."""
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", "source", _split_col().alias("split"))


@register(
    "sample_token_budget",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, source, {_N_TOKENS_SQL} AS ws_tokens,
                   sum({_N_TOKENS_SQL}) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum_tokens
            FROM documents
        )
        SELECT doc_id, source, ws_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
        FROM t WHERE cum_tokens <= 800
    """,
    tags=("ext-text-stats", "sampling", "token-budget"),
)
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget subsampling: take docs per source in deterministic
    priority order (doc_id) until a fixed token budget is reached — the
    data-mixing primitive for hitting per-source token targets in a
    training mixture. One window pass per source partition (cumulative
    sum), budget applied as a filter; at 100 TB the per-source
    partitions stream through the window sort independently (no global
    ordering anywhere)."""
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    nt = n_tokens(F.col("text"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_cum = docs.select(
        "doc_id",
        "source",
        nt.alias("ws_tokens"),
        F.sum(nt).over(w).cast("bigint").alias("cum_tokens"),
    )
    return with_cum.filter(F.col("cum_tokens") <= 800)


@register(
    "text_compression_ratio",
    oracle=None,  # DEFLATE output size is not SQL-expressible; values
    # are pinned against direct zlib in tests/test_text_compression.py
    tags=("ext-text-stats", "quality", "compression", "mapInPandas"),
)
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality signal: per-doc zlib ratio via a REAL
    (non-stubbed) Arrow-batched Python stage — near-random text ~1.0,
    boilerplate near 0; both tails are filter targets in production
    corpora. Deterministic across runs."""
    from k8e_fetch_spark.operators.text import compression_ratio

    docs = fan_out(load(spark, sf_dir, "documents"))
    return compression_ratio(docs)


@register(
    "corpus_source_profile",
    oracle=f"""
        SELECT source,
               count(*) AS n_docs,
               CAST(sum({_N_TOKENS_SQL}) AS BIGINT) AS total_tokens,
               {sql_round(f"avg({sql_round(_QUALITY_SQL, 6)})", 6)} AS mean_quality,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        FROM documents
        GROUP BY source
    """,
    tags=("ext-text-stats", "profile"),
)
def corpus_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus profile — the mixture dashboard a data curator
    reads before setting sampling weights: volume (docs, tokens), mean
    quality, language spread. One map-side-combined aggregate on the
    source key; quality/token expressions fold into the scan."""
    docs = load(spark, sf_dir, "documents")
    nt = n_tokens(F.col("text"))
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(nt).cast("bigint").alias("total_tokens"),
        round_fixed(F.avg(quality_score("text")), 6).alias("mean_quality"),
        F.countDistinct("lang").alias("n_langs"),
    )


_PARA_W = 32  # words per pseudo-paragraph segment (delimiter-free corpus)

_PARA_DEDUP_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
        WHERE length(trim(text)) > 0
    ),
    segs AS (
        SELECT doc_id, CAST((s - 1) / {_PARA_W} AS INTEGER) AS seg_idx,
               array_to_string(t[s:least(s + {_PARA_W} - 1, len(t))], ' ') AS seg
        FROM toks, UNNEST(generate_series(1, len(t), {_PARA_W})) AS g(s)
        WHERE s <= len(t)
    ),
    kept AS (
        SELECT doc_id, seg_idx, seg FROM (
            SELECT doc_id, seg_idx, seg,
                   row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
            FROM segs) WHERE rn = 1
    )
    SELECT doc_id,
           array_to_string(list(seg ORDER BY seg_idx), ' ') AS cleaned_text,
           CAST(count(*) AS INTEGER) AS n_kept
    FROM kept GROUP BY doc_id
"""


def _word_segments(docs: DataFrame) -> DataFrame:
    """Scan-local pseudo-paragraph segmentation: fixed _PARA_W-word
    windows as (doc_id, seg_idx, seg) rows — sequence -> slice ->
    explode, no shuffle. Shared by dedup_paragraphs and the composed
    curation pipeline."""
    toks = docs.filter(F.length(F.trim("text")) > 0).select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("t")
    )
    starts = F.sequence(F.lit(1), F.size("t"), F.lit(_PARA_W))
    return toks.select(
        "doc_id",
        F.explode(
            F.transform(
                starts,
                lambda s: F.struct(
                    ((s - 1) / _PARA_W).cast("int").alias("seg_idx"),
                    F.concat_ws(" ", F.slice(F.col("t"), s, F.lit(_PARA_W))).alias("seg"),
                ),
            )
        ).alias("c"),
    ).select("doc_id", F.col("c.seg_idx").alias("seg_idx"), F.col("c.seg").alias("seg"))


@register("dedup_paragraphs", oracle=_PARA_DEDUP_ORACLE, tags=("ext-exact-dedup", "paragraph"))
def dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level exact dedup, keep-first (the C4/Dolma recipe):
    repeated paragraphs keep only their first (doc_id, position)
    occurrence corpus-wide and documents are reassembled from the
    survivors. This corpus has no newline delimiters, so paragraphs
    are fixed {_PARA_W}-word segments — the operator
    (operators/dedup.py:segment_dedup_keep_first) takes any
    segmentation. Segmentation is scan-local; then one groupBy on
    segment text with a one-struct min buffer, one bounded
    per-document reassembly. The oracle states keep-first with a
    window rank; the Spark side uses the shuffle-lean groupBy-min form
    — same semantics."""
    from k8e_fetch_spark.operators.dedup import segment_dedup_keep_first

    docs = fan_out(load(spark, sf_dir, "documents"))
    return segment_dedup_keep_first(_word_segments(docs))


_TEMP_RATE_SQL = (
    "least(1.0, "
    + sql_round(
        "(0.5 * CAST(total AS DOUBLE)) * (sqrt(CAST(n AS DOUBLE)) / z) / CAST(n AS DOUBLE)", 6
    )
    + ")"
)

_TEMP_SAMPLE_ORACLE = f"""
    WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total,
                   sum(sqrt(CAST(n AS DOUBLE))) AS z
            FROM counts),
    rates AS (SELECT source, {_TEMP_RATE_SQL} AS rate FROM counts, tot)
    SELECT d.doc_id, d.source, r.rate
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE {_mix_frac_sql('d.doc_id')} < r.rate
"""


@register(
    "sample_source_temperature",
    oracle=_TEMP_SAMPLE_ORACLE,
    tags=("ext-text-stats", "sampling", "mixing"),
)
def sample_source_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted source sampling (the GPT-3-style mixing
    rule, alpha = 0.5): each source's share of the output mixture is
    proportional to sqrt(its size) rather than its size, up-weighting
    small high-value sources against bulk web crawl; the overall
    target is half the corpus. Per-source keep rate = target *
    weight_i / n_i (capped at 1), membership a pure md5 hash-fraction
    of 'mix:'+doc_id — deterministic, stable under repartitioning,
    reruns and corpus growth. The hash is DOMAIN-SALTED ('mix:') so it
    is statistically independent of every other hash decision keyed on
    the raw doc_id (the train/val/test split bucket): un-salted, the
    same md5 drives both, and keep-rate < 0.5 forces first-hex < '8'
    which is always inside the 'train' bucket — a 100%-train selection
    bias caught by composing this op with corpus_split_assign.

    Scale shape: the per-source counts and rates are a dimension-sized
    aggregate broadcast back; the corpus side is ONE scan-local filter
    — no fact shuffle at any size. Cross-engine float discipline:
    alpha is expressed as sqrt (correctly rounded IEEE on both
    engines, unlike pow), and the rate is arithmetic-rounded to 6dp on
    both sides before the hash-fraction comparison, so the keep set is
    engine-exact. The rate math lives in
    operators/text.py:source_temperature_rates; its skew behavior
    (small sources up-weighted, caps) is pinned by a planted test —
    this corpus's sources are uniform-sized, so every rate here lands
    at the target fraction."""
    from k8e_fetch_spark.operators.text import source_temperature_rates

    docs = load(spark, sf_dir, "documents")
    rates = source_temperature_rates(docs, target_frac=0.5)
    return (
        docs.join(F.broadcast(rates), on="source")
        .filter(_mix_frac_col() < F.col("rate"))
        .select("doc_id", "source", "rate")
    )


def _punct_sql(c: str) -> str:
    return (
        f"CASE WHEN length({c}) = 0 THEN 0.0 "
        f"ELSE length(regexp_replace({c}, '[A-Za-z0-9 ]', '', 'g')) / length({c}) END"
    )


def _stop_sql(c: str) -> str:
    return (
        f"CASE WHEN length(trim({c})) = 0 THEN 0.0 "
        f"ELSE len(list_filter(string_split_regex(lower(trim({c})), '\\s+'), "
        f"t -> list_contains(['the','a','and','of','to','in'], t))) "
        f"/ len(string_split_regex(lower(trim({c})), '\\s+')) END"
    )


def _qual_sql(c: str) -> str:
    return (
        f"0.4 * least(length({c}) / 500.0, 1.0) "
        f"+ 0.3 * (1.0 - least(({_punct_sql(c)}) * 4, 1.0)) "
        f"+ 0.3 * least(({_stop_sql(c)}) * 5, 1.0)"
    )


_CLEAN_MIX_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
        WHERE length(trim(text)) > 0),
    segs AS (
        SELECT doc_id, CAST((s - 1) / {_PARA_W} AS INTEGER) AS seg_idx,
               array_to_string(t[s:least(s + {_PARA_W} - 1, len(t))], ' ') AS seg
        FROM toks, UNNEST(generate_series(1, len(t), {_PARA_W})) AS g(s)
        WHERE s <= len(t)),
    kept AS (
        SELECT doc_id, seg_idx, seg FROM (
            SELECT doc_id, seg_idx, seg,
                   row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
            FROM segs) WHERE rn = 1),
    cleaned AS (
        SELECT doc_id, array_to_string(list(seg ORDER BY seg_idx), ' ') AS ct,
               CAST(count(*) AS INTEGER) AS n_kept
        FROM kept GROUP BY doc_id),
    scored AS (
        SELECT c.doc_id AS doc_id, d.source AS source, n_kept,
               {sql_round(_qual_sql('ct'), 6)} AS quality
        FROM cleaned c JOIN documents d ON c.doc_id = d.doc_id
        WHERE {sql_round(_qual_sql('ct'), 6)} >= 0.5),
    counts AS (SELECT source, count(*) AS n FROM scored GROUP BY source),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total,
                   sum(sqrt(CAST(n AS DOUBLE))) AS z
            FROM counts),
    rates AS (SELECT source, {_TEMP_RATE_SQL} AS rate FROM counts, tot)
    SELECT s.doc_id, s.source, s.quality, s.n_kept,
           {_split_sql('s.doc_id')} AS split
    FROM scored s JOIN rates r ON s.source = r.source
    WHERE {_mix_frac_sql('s.doc_id')} < r.rate
"""


@register(
    "corpus_clean_mix_pipeline",
    oracle=_CLEAN_MIX_ORACLE,
    tags=("ext-text-stats", "pipeline", "mixing", "paragraph"),
)
def corpus_clean_mix_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round's ops composed as ONE plan — the full curation flow a
    training corpus goes through: paragraph-level exact dedup with
    keep-first reassembly -> quality re-score of the CLEANED text ->
    quality floor -> temperature-weighted source mixing (rates computed
    from post-filter counts) -> deterministic train/val/test split.

    Scale shape: segmentation is scan-local; dedup's two shuffles are
    buffer-bounded (one struct per distinct segment, one doc's own
    segments for reassembly); the source join-back co-keys on doc_id;
    quality is a pure projection of the reassembled text; rates are a
    dimension-sized broadcast; sampling + split are scan-local hash
    projections. No step's memory grows with corpus size.

    Cross-engine: quality is a per-row function of the string (identical
    bits both engines) rounded to 6dp BEFORE the floor comparison; the
    rate rounding follows sample_source_temperature, and the sampling
    hash is domain-salted ('mix:') so the split assignment on the raw
    doc_id hash stays independent — without the salt every sampled doc
    lands in 'train' (see sample_source_temperature)."""
    from k8e_fetch_spark.functions.caching import persist_scoped
    from k8e_fetch_spark.operators.dedup import segment_dedup_keep_first
    from k8e_fetch_spark.operators.text import source_temperature_rates

    docs = fan_out(load(spark, sf_dir, "documents"))
    cleaned = segment_dedup_keep_first(_word_segments(docs))
    # persist the post-floor frame: it is consumed TWICE — the rate
    # computation and the final mix join — and without the pin each
    # consumer re-executes the whole segmentation -> dedup -> rescore
    # chain from the scan (this was the one bench row >2x its oracle in
    # both r10 draws; solo best-of-6 min 1.64 -> 1.41 s with the pin,
    # and at real scale the saving is a full extra pass over the
    # corpus). The frame is doc-count-sized (4 narrow columns, no
    # text), so the cache cost is bounded.
    scored = persist_scoped(
        "clean_mix.scored",
        cleaned.join(docs.select("doc_id", "source"), on="doc_id")
        .select(
            "doc_id",
            "source",
            "n_kept",
            round_fixed(quality_score("cleaned_text"), 6).alias("quality"),
        )
        .filter(F.col("quality") >= 0.5),
    )
    # rates collect as O(#sources) driver state and join back as a
    # LITERAL frame (the DSIR lambda-inline lever): the rates broadcast
    # then has no upstream plan for a future to re-run. Same values as
    # the in-plan form (identical expression, 6-dp rounded).
    #
    # Deliberately NOT serialized behind a foreground materialization:
    # concurrent consumers can still race through partitions the cache
    # has not finished (Spark dedupes finished cache partitions, not
    # in-flight ones), but A/B'd r11, forcing a scored.count() first
    # made wall WORSE (solo best-of-6 min 1.41 -> 2.29 s) — at bench
    # scale the racing duplicates overlap on otherwise-idle cores while
    # the count lengthens the critical path. On a saturated cluster the
    # cache absorbs the duplicates anyway (consumers start after the
    # first job finishes minutes apart, not milliseconds).
    rate_rows = source_temperature_rates(scored, target_frac=0.5).collect()
    rates = spark.createDataFrame(
        [(r["source"], float(r["rate"])) for r in rate_rows],
        "source string, rate double",
    )
    return (
        scored.join(F.broadcast(rates), on="source")
        .filter(_mix_frac_col() < F.col("rate"))
        .select("doc_id", "source", "quality", "n_kept", _split_col().alias("split"))
    )


_INCR_DEDUP_ORACLE = """
    WITH old AS (
        SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
        FROM documents WHERE doc_id % 2 = 0
    ),
    new AS (
        SELECT doc_id, source,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
        FROM documents WHERE doc_id % 2 = 1
    )
    SELECT doc_id, source, fp FROM new
    WHERE fp NOT IN (SELECT fp FROM old)
"""


@register(
    "dedup_incremental_snapshot",
    oracle=_INCR_DEDUP_ORACLE,
    tags=("ext-exact-dedup", "incremental"),
)
def dedup_incremental_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental snapshot dedup — the daily/yearly-refresh shape (the
    reference re-fetches whole statewide snapshots each cycle,
    fetcher.bash VR_Snapshot handling; a Spark pipeline instead admits
    only NEW content): documents arriving in the new batch are dropped
    when their normalized fingerprint already exists in the ingested
    corpus. Split is modeled by doc_id parity here; in production the
    'old' side is the fingerprint column of the running store.

    Scale shape: a key-only LEFT ANTI join on the 32-char md5 — the
    historical side ships fingerprints, never text, and the join
    shuffles 32-byte keys; with the store bucketed on fp (see
    operators/scale.py:write_bucketed) the daily run needs no shuffle
    on the historical side at all."""
    docs = load(spark, sf_dir, "documents")
    fp = fingerprint(F.col("text")).alias("fp")
    old = docs.filter(F.col("doc_id") % 2 == 0).select(fp)
    new = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "source", fp)
    return new.join(old, on="fp", how="left_anti").select("doc_id", "source", "fp")


_SUBSTRING_ORACLE = """
    WITH planted AS (
        SELECT a.doc_id + 100000 AS doc_id, a.text || ' ' || b.text AS text
        FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        WHERE a.doc_id < 25
    ),
    corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id, text FROM planted
    ),
    toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM corpus),
    grams AS (
        SELECT doc_id, i AS pos, array_to_string(t[i : i+7], ' ') AS g
        FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS s(i)
    ),
    dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
    dpos AS (SELECT doc_id, pos FROM grams JOIN dup USING (g)),
    covered AS (
        SELECT DISTINCT d.doc_id, u.k AS j
        FROM dpos d, UNNEST(generate_series(d.pos, d.pos + 7)) AS u(k)
    ),
    tokidx AS (
        SELECT doc_id, i AS j, t[i] AS tok
        FROM toks, UNNEST(generate_series(1, len(t))) s(i)
    ),
    base AS (
        SELECT t.doc_id, len(t.t) AS n_tokens, coalesce(c.n_removed, 0) AS n_removed
        FROM toks t LEFT JOIN (
            SELECT doc_id, count(*) AS n_removed FROM covered GROUP BY doc_id
        ) c USING (doc_id)
    ),
    clean AS (
        SELECT tk.doc_id, string_agg(tk.tok, ' ' ORDER BY tk.j) AS cleaned
        FROM tokidx tk LEFT JOIN covered c ON c.doc_id = tk.doc_id AND c.j = tk.j
        WHERE c.j IS NULL
        GROUP BY tk.doc_id
    )
    SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
           CAST(b.n_removed AS BIGINT) AS n_removed,
           md5(coalesce(c.cleaned, '')) AS cleaned_md5
    FROM base b LEFT JOIN clean c USING (doc_id)
"""


@register(
    "dedup_substring_spans",
    oracle=_SUBSTRING_ORACLE,
    tags=("ext-exact-dedup", "substring", "planted-oracle"),
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring removal (Lee et al. 2022 ExactSubstr),
    hash-checked against SQL ground truth: any run of >= 8 tokens
    occurring twice anywhere in the corpus is removed from every
    document. The planting grafts composite docs (doc_id+100000 :=
    text_i || ' ' || text_{i+1} for the first 25 ids), so each
    composite's halves — and the source documents they duplicate — must
    come back covered; natural within-corpus 8-gram repeats count too
    and are mirrored by the oracle. The declared output carries the
    cleaned text as its md5 (the raw text would dominate the compare
    payload; the hash pins every surviving token and its order).

    operators/substring.py has the distributed construction: the
    suffix-array recipe re-expressed as one gram-hash window shuffle +
    a row-local interval-merge fold — three 8-byte-keyed shuffles
    total, nothing quadratic, nothing Python."""
    from k8e_fetch_spark.operators.substring import duplicated_span_removal

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    nxt = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("text_b")
    )
    planted = (
        docs.filter(F.col("doc_id") < 25)
        .join(nxt, on="doc_id")
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" "), F.col("text_b")).alias("text"),
        )
    )
    corpus = fan_out(docs.unionByName(planted))
    out = duplicated_span_removal(corpus, min_len=8)
    return out.select(
        "doc_id", "n_tokens", "n_removed", F.md5("cleaned_text").alias("cleaned_md5")
    )


def _domain_filter_oracle() -> str:
    from k8e_fetch_spark.operators.web import HOST_RE, sql_registered_domain_psl

    return f"""
    WITH urls AS (
        SELECT doc_id,
               'https://' ||
               CASE WHEN doc_id % 20 < 10 THEN
                        CASE WHEN doc_id % 2 = 0 THEN 'cdn.boilerplate.com'
                             ELSE 'img.boilerplate.com' END
                    WHEN doc_id % 20 < 13 THEN
                        CASE WHEN doc_id % 2 = 0 THEN 'shop.acme.co.uk'
                             ELSE 'blog.acme.co.uk' END
                    WHEN doc_id % 20 < 15 THEN 'news.example.org'
                    WHEN doc_id % 20 = 15 THEN 'tracker.spamlist.net'
                    WHEN doc_id % 20 = 16 THEN 'www.other.co.uk'
                    ELSE 'www.longtail' || CAST(doc_id % 20 AS VARCHAR) || '.org'
               END || '/doc/' || CAST(doc_id AS VARCHAR) AS url
        FROM documents
    ),
    parsed AS (
        SELECT doc_id,
               lower(regexp_extract(url, '{HOST_RE}', 1)) AS host
        FROM urls
    ),
    dom AS (
        SELECT doc_id, host,
               {sql_registered_domain_psl("host")} AS domain
        FROM parsed
    ),
    capped AS (
        SELECT doc_id, host, domain,
               row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rn
        FROM dom WHERE domain NOT IN ('spamlist.net')
    )
    SELECT doc_id, host, domain FROM capped WHERE rn <= 40
"""


_DOMAIN_FILTER_ORACLE = _domain_filter_oracle()


@register(
    "text_domain_filter",
    oracle=_DOMAIN_FILTER_ORACLE,
    tags=("ext-text-stats", "curation", "web", "planted-oracle"),
)
def text_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL/domain curation front door (the C4/RefinedWeb first filter),
    hash-checked against SQL ground truth: host extraction from the
    URL, PUBLIC-SUFFIX-aware registered-domain fold (longest matching
    suffix + one label — operators/web.py:registered_domain_psl, r10,
    replacing the naive last-two-labels rule), blocklist drop, and a
    40-docs-per-domain cap. URLs are planted deterministically from
    doc_id with a skewed distribution — one boilerplate domain owns
    50% of the corpus across two subdomains (the cap must count them
    together), one ``co.uk`` brand across two subdomains (folds to
    ``acme.co.uk``; the naive rule would fold it to ``co.uk`` and
    merge it with the OTHER planted UK brand, changing the cap
    counts, so the hash check distinguishes the rules), one
    blocklisted tracker domain, and a long tail — every mechanism
    provably fires.

    operators/web.py has the pieces: scan-local regex projection for
    host/domain, the suffix set inlined as a literal isin (the full
    PSL drops into the same tuples; broadcast lookup join is the
    outgrow path), literal isin for the small blocklist (broadcast
    anti-join is the big-list drop-in), and ONE row_number window on
    the domain whose <= cap filter WindowGroupLimit pushes below the
    exchange — a 10M-doc boilerplate domain ships cap survivors per
    map partition, not the cluster."""
    from k8e_fetch_spark.operators.web import (
        domain_blocklist_filter,
        domain_cap,
        host_of,
        registered_domain_psl,
    )

    # no fan_out: the per-row work here is one regex + a CASE — too
    # cheap to justify a widening exchange ahead of the cap window's
    # own shuffle (a real crawl has thousands of natural input
    # partitions; the widen-the-scan helper exists for CPU-heavy
    # stages over few-file bench fixtures)
    docs = load(spark, sf_dir, "documents").select("doc_id")
    bucket = F.col("doc_id") % 20
    host_planted = (
        F.when(
            bucket < 10,
            F.when(F.col("doc_id") % 2 == 0, F.lit("cdn.boilerplate.com")).otherwise(
                F.lit("img.boilerplate.com")
            ),
        )
        .when(
            bucket < 13,
            F.when(F.col("doc_id") % 2 == 0, F.lit("shop.acme.co.uk")).otherwise(
                F.lit("blog.acme.co.uk")
            ),
        )
        .when(bucket < 15, F.lit("news.example.org"))
        .when(bucket == 15, F.lit("tracker.spamlist.net"))
        .when(bucket == 16, F.lit("www.other.co.uk"))
        .otherwise(F.concat(F.lit("www.longtail"), bucket.cast("string"), F.lit(".org")))
    )
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"), host_planted, F.lit("/doc/"), F.col("doc_id").cast("string")
        ).alias("url"),
    )
    parsed = urls.select("doc_id", host_of(F.col("url")).alias("host"))
    dom = parsed.select(
        "doc_id", "host", registered_domain_psl("host").alias("domain")
    )
    kept = domain_blocklist_filter(dom, "domain", ["spamlist.net"])
    return domain_cap(kept, "domain", "doc_id", 40).select("doc_id", "host", "domain")


_DSIR_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, source,
               string_split_regex(lower(trim(text)), '\\s+') AS t
        FROM documents
    ),
    big AS (
        SELECT doc_id, source, t[i] || ' ' || t[i + 1] AS g
        FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS s(i)
    ),
    feat AS (
        SELECT doc_id, source,
               CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % 4096 AS f
        FROM big
    ),
    cnt AS (
        SELECT f, count(*) AS raw_c,
               sum(CASE WHEN source IN ('src0', 'src1') THEN 1 ELSE 0 END) AS tgt_c
        FROM feat GROUP BY f
    ),
    tot AS (SELECT sum(raw_c) AS r_tot, sum(tgt_c) AS t_tot FROM cnt),
    lam AS (
        SELECT f, ln((tgt_c + 1.0) / (t_tot + 4096.0))
                 - ln((raw_c + 1.0) / (r_tot + 4096.0)) AS lam
        FROM cnt, tot
    ),
    w AS (
        SELECT doc_id, {sql_round("sum(lam)", 6)} AS weight
        FROM feat JOIN lam USING (f) GROUP BY doc_id
    )
    SELECT doc_id, weight FROM w ORDER BY weight DESC, doc_id LIMIT 100
"""


@register(
    "sample_dsir_importance",
    oracle=_DSIR_ORACLE,
    tags=("ext-text-stats", "curation", "dsir", "selection"),
)
def sample_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"), hash-checked end to
    end: hashed word-bigram features (4096 buckets), bucket unigram
    models of the TARGET (the src0/src1 sources as the high-quality
    proxy) and the RAW corpus with +1 smoothing, per-document
    importance log-weight = sum over the doc's bigram occurrences of
    ln(p_target(f)/p_raw(f)), and the top-100 selection by
    (weight desc, doc_id). Deterministic rather than Gumbel-resampled
    — the paper's resampling adds noise to the same weights; top-k is
    its zero-temperature limit and the form an oracle can check.

    The feature hash must agree bit-for-bit across engines, so the
    bucket is the first 8 hex chars of md5 parsed as an integer — both
    engines compute the identical value (xxhash64 is the cheaper
    production swap; it is not available in the oracle engine).

    Scale (100 TB): two map-side-combined aggregate shuffles (bucket
    counts, per-doc weight sums) — both on bounded-cardinality or
    uniform keys; the lambda table is B=4096 rows and BROADCASTS; the
    totals are a 1-row broadcast crossJoin; selection compiles to
    TakeOrderedAndProject (per-partition top-100, no global sort
    exchange). State never exceeds O(B) anywhere.
    operators/text.py:dsir_importance_weights holds the construction."""
    from k8e_fetch_spark.operators.text import dsir_importance_weights

    docs = fan_out(load(spark, sf_dir, "documents")).select("doc_id", "source", "text")
    w = dsir_importance_weights(
        docs, target=F.col("source").isin("src0", "src1"), n_buckets=4096
    ).select("doc_id", round_fixed(F.col("weight"), 6).alias("weight"))
    return w.orderBy(F.desc("weight"), F.asc("doc_id")).limit(100).select("doc_id", "weight")


_LINE_CLEAN_ORACLE = r"""
    WITH nxt AS (
        SELECT doc_id - 1 AS doc_id, text AS text_b FROM documents
    ),
    planted AS (
        SELECT a.doc_id + 100000 AS doc_id,
               a.text || '.' || chr(10) ||
               'click here to subscribe now.' || chr(10) ||
               'lorem ipsum dolor sit amet consectetur.' || chr(10) ||
               array_to_string((string_split_regex(trim(b.text_b), '\s+'))[1:3], ' ') || '.' || chr(10) ||
               b.text_b || '!' || chr(10) ||
               'enable javascript to view this page properly.' AS text
        FROM documents a JOIN nxt b USING (doc_id)
        WHERE a.doc_id < 25
    ),
    corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id, text FROM planted
    ),
    lines AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM corpus),
    kept AS (
        SELECT doc_id, ls,
               list_filter(ls, x ->
                   regexp_matches(x, '[.!?"]$')
                   AND len(string_split_regex(trim(x), '\s+')) >= 5
                   AND NOT contains(lower(x), 'lorem ipsum')
                   AND NOT contains(lower(x), 'javascript')
                   AND NOT contains(lower(x), 'click here')
                   AND NOT contains(lower(x), '{')
               ) AS kl
        FROM lines
    )
    SELECT doc_id,
           CAST(len(ls) AS INT) AS n_lines,
           CAST(len(kl) AS INT) AS n_kept,
           md5(coalesce(array_to_string(kl, chr(10)), '')) AS cleaned_md5
    FROM kept
"""


@register(
    "text_line_cleaning",
    oracle=_LINE_CLEAN_ORACLE,
    tags=("ext-text-stats", "curation", "c4-line-rules", "planted-oracle"),
)
def text_line_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb LINE-level cleaning (Raffel et al. 2020 §2.2's
    line rules; RefinedWeb's line-wise correction), hash-checked
    against SQL ground truth — the curation tier between per-document
    quality gates and paragraph dedup: a line survives iff it ends in
    terminal punctuation, carries >= 5 words, and contains no
    boilerplate marker ('lorem ipsum', 'javascript', 'click here',
    '{'). The synthetic corpus is single-line and unpunctuated, so
    multi-line composites are PLANTED (doc_id+100000 for the first 25
    ids): each carries two keepable sentences interleaved with a
    subscribe nag, a lorem-ipsum stuffer, a 4-word fragment and a
    javascript notice — every rule provably fires, and the cleaned
    text (pinned by md5) must be exactly the two kept sentences.
    Natural docs come back n_kept=0 (no terminal punctuation), the
    correct C4 verdict for them.

    Scale: ZERO shuffle — line split, the four predicates, the rebuild
    and the md5 are all scan-local array expressions inside one
    projection; nothing leaves the input partition."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    nxt = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("text_b")
    )
    frag = F.concat_ws(
        " ", F.slice(F.split(F.trim(F.col("text_b")), r"\s+"), 1, 3)
    )
    planted = (
        docs.filter(F.col("doc_id") < 25)
        .join(nxt, on="doc_id")
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat_ws(
                "\n",
                F.concat(F.col("text"), F.lit(".")),
                F.lit("click here to subscribe now."),
                F.lit("lorem ipsum dolor sit amet consectetur."),
                F.concat(frag, F.lit(".")),
                F.concat(F.col("text_b"), F.lit("!")),
                F.lit("enable javascript to view this page properly."),
            ).alias("text"),
        )
    )
    corpus = fan_out(docs.unionByName(planted))
    ls = F.split(F.col("text"), "\n")
    low = lambda x: F.lower(x)  # noqa: E731
    keep = lambda x: (  # noqa: E731
        x.rlike('[.!?"]$')
        & (F.size(F.split(F.trim(x), r"\s+")) >= 5)
        & ~low(x).contains("lorem ipsum")
        & ~low(x).contains("javascript")
        & ~low(x).contains("click here")
        & ~low(x).contains("{")
    )
    kl = F.filter(ls, keep)
    return corpus.select(
        "doc_id",
        F.size(ls).cast("int").alias("n_lines"),
        F.size(kl).cast("int").alias("n_kept"),
        F.md5(F.concat_ws("\n", kl)).alias("cleaned_md5"),
    )


def _bpe_merge_ctes(i: int) -> str:
    """One BPE merge iteration as DuckDB CTEs — pair counts over the
    symbolized vocab v{i-1}, the (count desc, pair asc) argmax, and the
    greedy merge application as the IDENTICAL list_reduce fold the
    Spark operator uses (operators/bpe.py:_merge_fold)."""
    return f"""
    p{i} AS (
        SELECT t[j] || ' ' || t[j+1] AS p, freq
        FROM (SELECT string_split(sym, ' ') AS t, freq FROM v{i - 1}),
             UNNEST(generate_series(1, len(t) - 1)) AS u(j)
        WHERE len(t) >= 2
    ),
    top{i} AS (
        SELECT p, CAST(sum(freq) AS BIGINT) AS cnt
        FROM p{i} GROUP BY p ORDER BY sum(freq) DESC, p LIMIT 1
    ),
    v{i} AS (
        SELECT list_reduce(string_split(sym, ' '),
            (acc, x) -> CASE
                WHEN (acc = sp[1] OR right(acc, length(sp[1]) + 1) = ' ' || sp[1])
                     AND x = sp[2]
                THEN acc || x ELSE acc || ' ' || x END) AS sym, freq
        FROM v{i - 1}, (SELECT string_split(p, ' ') AS sp FROM top{i})
    )"""


_BPE_ORACLE = """
    WITH words AS (
        SELECT w, count(*) AS freq FROM (
            SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
            FROM documents)
        WHERE w <> '' GROUP BY w
    ),
    v0 AS (
        SELECT array_to_string(string_split(w, ''), ' ') AS sym, freq
        FROM words
    ),
    {m1}, {m2}, {m3},
    syms AS (
        SELECT t, CAST(sum(freq) AS BIGINT) AS cnt FROM (
            SELECT unnest(string_split(sym, ' ')) AS t, freq FROM v3)
        GROUP BY t
    )
    SELECT CAST(1 AS BIGINT) AS rank, 'merge' AS kind, p AS token, cnt AS freq FROM top1
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'merge', p, cnt FROM top2
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'merge', p, cnt FROM top3
    UNION ALL
    SELECT * FROM (
        SELECT CAST(row_number() OVER (ORDER BY cnt DESC, t) AS BIGINT) AS rank,
               'symbol' AS kind, t AS token, cnt AS freq
        FROM syms ORDER BY cnt DESC, t LIMIT 20
    )
""".format(m1=_bpe_merge_ctes(1), m2=_bpe_merge_ctes(2), m3=_bpe_merge_ctes(3))


@register(
    "text_bpe_learn_merges",
    oracle=_BPE_ORACLE,
    tags=("ext-text-stats", "tokenizer", "bpe"),
)
def text_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (Sennrich et al. 2016) — the vocabulary-
    induction modality of the LLM pipeline, hash-checked END TO END:
    the first 3 learned merges (pair + its frequency at merge time) and
    the top-20 post-merge symbol inventory. The ENTIRE training loop is
    recomputed relationally by the oracle — word-frequency vocab, three
    rounds of (pair count -> argmax -> greedy merge application), and
    the final symbol counts — with the greedy fold expressed as the
    byte-identical CASE in both engines, so any deviation anywhere in
    the loop (tie-break, run-merging, weighting) breaks the hash.

    Scale (100 TB): ONE corpus-wide shuffle total (the word-count
    aggregate, map-side combined on uniform keys); every merge
    iteration is vocab-local — pair counts aggregate the bounded
    vocabulary (Heaps-law sublinear in corpus size), the argmax pair is
    a one-row collect (O(1) driver state, the k-means-centroid
    contract), and the merge application is a row-local fold. The
    symbol-rank window at the end orders the symbol INVENTORY (a few
    hundred rows after 3 merges) — never corpus- or vocab-sized data.
    operators/bpe.py holds the construction and the greedy-semantics
    argument."""
    from k8e_fetch_spark.operators.bpe import learn_bpe_merges, symbol_counts
    from pyspark.sql.window import Window

    docs = fan_out(load(spark, sf_dir, "documents")).select("text")
    merges, vocab = learn_bpe_merges(docs, n_merges=3)
    mdf = spark.createDataFrame(
        [(r, "merge", p, c) for r, p, c in merges],
        "rank bigint, kind string, token string, freq bigint",
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("t"))
    syms = (
        symbol_counts(vocab)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 20)
        .select(
            "rank",
            F.lit("symbol").alias("kind"),
            F.col("t").alias("token"),
            F.col("cnt").cast("bigint").alias("freq"),
        )
    )
    return mdf.unionByName(syms)


def _bpe_fold_sql(i: int, inner: str) -> str:
    """The greedy merge fold as DuckDB SQL, applying learned pair
    s{i} = [p1, p2] to the space-joined symbol string ``inner`` — the
    verbatim relational twin of operators/bpe.py:apply_merges_to_word."""
    return (
        f"list_reduce(string_split({inner}, ' '), (a{i}, x{i}) -> "
        f"CASE WHEN (a{i} = s{i}[1] OR right(a{i}, length(s{i}[1]) + 1) = ' ' || s{i}[1]) "
        f"AND x{i} = s{i}[2] "
        f"THEN a{i} || x{i} ELSE a{i} || ' ' || x{i} END)"
    )


_BPE_APPLY_ORACLE = """
    WITH words AS (
        SELECT w, count(*) AS freq FROM (
            SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
            FROM documents)
        WHERE w <> '' GROUP BY w
    ),
    v0 AS (
        SELECT array_to_string(string_split(w, ''), ' ') AS sym, freq
        FROM words
    ),
    {m1}, {m2}, {m3},
    sp AS (
        SELECT (SELECT string_split(p, ' ') FROM top1) AS s1,
               (SELECT string_split(p, ' ') FROM top2) AS s2,
               (SELECT string_split(p, ' ') FROM top3) AS s3
    ),
    tok AS (
        SELECT doc_id,
               array_to_string(list_transform(
                   string_split_regex(trim(text), '\\s+'),
                   w -> CASE WHEN w = '' THEN '' ELSE {fold} END), ' ') AS t
        FROM documents, sp
    )
    SELECT doc_id,
           CAST(CASE WHEN t = '' THEN 0
                ELSE len(string_split(t, ' ')) END AS BIGINT) AS n_tokens,
           md5(t) AS tokens_md5
    FROM tok
""".format(
    m1=_bpe_merge_ctes(1),
    m2=_bpe_merge_ctes(2),
    m3=_bpe_merge_ctes(3),
    fold=_bpe_fold_sql(3, _bpe_fold_sql(2, _bpe_fold_sql(1, "array_to_string(string_split(w, ''), ' ')"))),
)


@register(
    "text_bpe_apply",
    oracle=_BPE_APPLY_ORACLE,
    tags=("ext-text-stats", "tokenizer", "bpe"),
)
def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenization — the INFERENCE half (text_bpe_learn_merges is
    the training half): learn the 3-merge table from the corpus, then
    tokenize every document with it. Output per doc: the token count
    and the md5 of the space-joined token stream (pinning every token
    and its order). The oracle re-learns the merges AND re-tokenizes
    relationally, so train and apply are BOTH hash-checked in one row.

    Scale (100 TB): training as in text_bpe_learn_merges (one
    corpus-wide word count, vocab-local iterations); the apply side is
    scan-local with ZERO additional shuffle — the Arrow batch
    tokenizer with a unique-word cache (operators/bpe.py:
    bpe_tokenize_arrow; Zipf makes the cache hit almost always — the
    production tokenizer shape), pinned output-identical to the
    pure-expression fold twin in tests/test_bpe.py. This is the
    token-count path a training-data pipeline runs before packing:
    the merge table is driver/closure state, never joined."""
    from k8e_fetch_spark.operators.bpe import (
        bpe_tokenize_arrow,
        learn_bpe_merges,
    )

    docs = fan_out(load(spark, sf_dir, "documents")).select("doc_id", "text")
    merges, _vocab = learn_bpe_merges(docs.select("text"), n_merges=3)
    pairs = [p for _r, p, _c in merges]
    tok = bpe_tokenize_arrow(pairs)(F.col("text"))
    return docs.withColumn("_t", tok).select(
        "doc_id",
        F.when(F.col("_t") == "", F.lit(0))
        .otherwise(F.size(F.split(F.col("_t"), " ")))
        .cast("bigint")
        .alias("n_tokens"),
        F.md5("_t").alias("tokens_md5"),
    )


_LM_PERPLEXITY_ORACLE = f"""
    WITH planted AS (
        SELECT doc_id + 100000 AS doc_id,
               array_to_string(list_transform(range(1, 13),
                   j -> 'zq' || CAST(doc_id * 7 + j AS VARCHAR)), ' ') AS text
        FROM documents WHERE doc_id < 25
    ),
    corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id, text FROM planted
    ),
    tgt AS (SELECT doc_id, text FROM documents WHERE source IN ('src0', 'src1')),
    tgt_toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM tgt
    ),
    uni AS (
        SELECT w, count(*) AS c1
        FROM (SELECT unnest(t) AS w FROM tgt_toks) GROUP BY w
    ),
    consts AS (SELECT sum(c1) AS n_tot, count(*) AS v FROM uni),
    tgt_big AS (
        SELECT w1, w2, count(*) AS c2 FROM (
            SELECT t[i] AS w1, t[i+1] AS w2
            FROM tgt_toks, UNNEST(generate_series(1, len(t) - 1)) AS s(i)
        ) GROUP BY 1, 2
    ),
    corpus_toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM corpus
    ),
    corpus_big AS (
        SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        FROM corpus_toks, UNNEST(generate_series(1, len(t) - 1)) AS s(i)
    ),
    scored AS (
        SELECT cb.doc_id,
               log10(
                   0.7 * (CASE WHEN u1.c1 IS NOT NULL AND b.c2 IS NOT NULL
                               THEN b.c2 / u1.c1 ELSE 0.0 END)
                   + 0.3 * ((COALESCE(u2.c1, 0) + 1.0) / (k.n_tot + k.v))
               ) AS lp
        FROM corpus_big cb
        LEFT JOIN tgt_big b ON cb.w1 = b.w1 AND cb.w2 = b.w2
        LEFT JOIN uni u1 ON cb.w1 = u1.w
        LEFT JOIN uni u2 ON cb.w2 = u2.w
        CROSS JOIN consts k
    ),
    agg AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               {sql_round('avg(lp)', 6)} AS avg_logprob
        FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams, avg_logprob,
           CAST(CASE WHEN avg_logprob >= -2.0 THEN 1 ELSE 0 END AS BIGINT) AS kept
    FROM agg
"""


@register(
    "text_lm_perplexity_filter",
    oracle=_LM_PERPLEXITY_ORACLE,
    tags=("ext-text-stats", "lm-quality", "ccnet", "planted-oracle"),
)
def text_lm_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality gate, bigram flavor (Wenzek et al. 2020:
    filter a crawl by perplexity under a model trained on a trusted
    reference; here the src0/src1 sources stand in for the reference,
    and the model is an interpolated bigram LM — the upgrade over
    text_unigram_logprob's context-free scorer). Every document is
    scored by mean log10 P(w2|w1) with lam=0.7 interpolation against a
    +1-smoothed unigram backoff; kept iff the ROUNDED score clears
    -2.0. Planted out-of-vocabulary token-soup docs (doc_id+100000 for
    the first 25 ids — 'zq<id*7+j>' tokens that cannot occur in the
    natural vocabulary) score ~-5.5 (pure smoothed backoff on every
    transition) and MUST come back kept=0, while every natural doc
    clears the gate — both filter outcomes provably fire, and the
    ENTIRE train->score->threshold pipeline is hash-checked against
    SQL ground truth (integer counts; identical interpolation term
    order; the per-doc log-sum's fold-order drift sits ~7 orders below
    the 6-dp rounding).

    Scale: operators/text.py:bigram_lm_scores — both model tables are
    Heaps-bounded TARGET aggregates that broadcast onto the corpus
    bigram stream (the corpus never shuffles for the joins); the only
    corpus-sized shuffle is the per-doc mean. N/V collect as two
    scalars (the k-bytes-to-driver contract). A production run swaps
    the bigram table for a KenLM binary on each executor — the plan
    shape (broadcast model, scan-side scoring, per-doc mean) is
    identical."""
    from k8e_fetch_spark.operators.text import bigram_lm_scores

    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    planted = docs.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.lit("planted").alias("source"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(12)),
                lambda j: F.concat(
                    F.lit("zq"), ((F.col("doc_id") * 7) + j).cast("string")
                ),
            ),
        ).alias("text"),
    )
    corpus = docs.unionByName(planted)
    scored = bigram_lm_scores(
        corpus, target=F.col("source").isin("src0", "src1"), lam=0.7
    )
    out = scored.select(
        "doc_id",
        "n_bigrams",
        round_fixed(F.col("avg_logprob"), 6).alias("avg_logprob"),
    )
    return out.withColumn(
        "kept",
        F.when(F.col("avg_logprob") >= -2.0, 1).otherwise(0).cast("bigint"),
    )


_BM25_ORACLE = """
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
    scored AS (
        SELECT doc_id,
               ln(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
                 * (tf * 2.2)
                 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS w
        FROM tf JOIN dft USING (token) CROSS JOIN stats
    ),
    agg AS (
        SELECT doc_id,
               floor(sum(w) * 10000.0 + 0.5) / 10000.0 AS score,
               count(*) AS n_terms
        FROM scored GROUP BY 1
    )
    SELECT doc_id, score, n_terms
    FROM agg ORDER BY score DESC, doc_id LIMIT 20
"""


@register("text_bm25_search", oracle=_BM25_ORACLE, tags=("ext-text-stats", "bm25", "retrieval"))
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 retrieval for a fixed 3-term query over the
    documents corpus (operator: ``operators/text.py:bm25_scores`` —
    Robertson & Zaragoza 2009; k1=1.2, b=0.75, the Lucene defaults).
    The lexical complement of the ANN stack: term-frequency saturation
    plus document-length normalization, which plain TF-IDF
    (`text_tfidf_topk`) lacks.

    Plan: tokenize + the posting filter are scan-local (only the query
    terms' posting rows ever shuffle); df and corpus stats are broadcast
    aggregates; the cutoff is TakeOrderedAndProject on (rounded score,
    doc_id) so the top-20 set is engine-stable (round-then-rank, the
    text_tfidf_topk convention). The oracle recomputes the identical
    IEEE expression sequence in DuckDB."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    scored = bm25_scores(docs, ("scan", "merge", "vector"), k1=1.2, b=0.75)
    return (
        scored.select(
            "doc_id",
            round_fixed(F.col("bm25"), 4).alias("score"),
            "n_terms",
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


_BM25_MULTI_ORACLE = """
    WITH qterms(q_id, token) AS (
        VALUES (0, 'scan'), (0, 'merge'),
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
    )
    SELECT q_id, doc_id, CAST(rnk AS INTEGER) AS rank, score FROM (
        SELECT q_id, doc_id, score,
               row_number() OVER (
                   PARTITION BY q_id ORDER BY score DESC, doc_id
               ) AS rnk
        FROM agg
    ) WHERE rnk <= 5
"""


@register(
    "text_bm25_multi_topk",
    oracle=_BM25_MULTI_ORACLE,
    tags=("ext-text-stats", "bm25", "retrieval", "multi-query"),
)
def text_bm25_multi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 for a BATCH of three queries in ONE corpus pass
    (operators/text.py:bm25_scores_multi) — the production retrieval
    workload shape: text_bm25_search scans the corpus once per query;
    this form broadcasts the (q_id, token) query table against the
    token stream so a single scan + one aggregate chain serves every
    query, and a term shared by two queries ('merge' here) costs one
    posting list. Top-5 per query, round-then-rank; the rank-<=5
    filter compiles to WindowGroupLimit BELOW the exchange (the
    text_domain_filter cap pattern), so each map partition ships at
    most 5 survivors per query — the cutoff never sorts corpus-sized
    data."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    queries_map = {
        0: ("scan", "merge"),
        1: ("vector", "window"),
        2: ("fast", "key", "merge"),
    }
    scored = bm25_scores_multi(docs, queries_map, k1=1.2, b=0.75).select(
        "q_id", "doc_id", round_fixed(F.col("bm25"), 4).alias("score")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("q_id", "doc_id", "rank", "score")
    )


def _url_canonical_oracle() -> str:
    from k8e_fetch_spark.operators.web import sql_canonical_url

    return f"""
    WITH urls AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'http' END)
               || '://'
               || (CASE WHEN doc_id % 3 = 0 THEN 'Example.COM' ELSE 'example.com' END)
               || (CASE WHEN doc_id % 4 = 0 THEN ':80' ELSE '' END)
               || '/doc/' || CAST(doc_id % 200 AS VARCHAR)
               || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
               || '?'
               || (CASE WHEN doc_id % 2 = 0
                        THEN 'utm_source=feed&utm_id=' || CAST(doc_id AS VARCHAR) || '&'
                        ELSE '' END)
               || (CASE WHEN doc_id % 3 = 0
                        THEN 'b=2&a=' || CAST((doc_id % 200) % 7 AS VARCHAR)
                        ELSE 'a=' || CAST((doc_id % 200) % 7 AS VARCHAR) || '&b=2' END)
               || (CASE WHEN doc_id % 7 = 0
                        THEN '#sec' || CAST(doc_id AS VARCHAR) ELSE '' END)
               AS url
        FROM documents
    )
    SELECT {sql_canonical_url("url")} AS canonical_url,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_dupes
    FROM urls
    GROUP BY canonical_url
    """


@register(
    "web_url_canonical_dedup",
    oracle=_url_canonical_oracle(),
    tags=("ext-text-stats", "web-curation", "dedup"),
)
def web_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup, the first cut of a crawl pipeline: canonicalize
    raw URLs (operators/web.py:canonical_url — case, default ports,
    fragments, tracking params, param order, trailing slash) and keep
    the first document per canonical key.

    The documents table carries no URL column, so raw URLs are planted
    deterministically from doc_id with every noise axis the
    canonicalizer must fold (mixed-case scheme/host, :80, utm_*
    click-ids that differ per doc inside one group, shuffled param
    order, fragments, trailing slashes); group-keyed ``a=`` params vary
    across groups so sorting is exercised, and distinct raw URLs
    collapse into exactly 200 canonical groups at every SF. Scale: canonicalization
    is a scan-local expression (no UDF); the dedup is ONE hash
    aggregate on the canonical key — same shape at 100 TB."""
    from k8e_fetch_spark.operators.web import canonical_url

    docs = load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    g = (d % 200).cast("string")
    url = F.concat(
        F.when(d % 2 == 0, F.lit("HTTP")).otherwise(F.lit("http")),
        F.lit("://"),
        F.when(d % 3 == 0, F.lit("Example.COM")).otherwise(F.lit("example.com")),
        F.when(d % 4 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/doc/"),
        g,
        F.when(d % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?"),
        F.when(
            d % 2 == 0,
            F.concat(F.lit("utm_source=feed&utm_id="), d.cast("string"), F.lit("&")),
        ).otherwise(F.lit("")),
        F.when(
            d % 3 == 0,
            F.concat(F.lit("b=2&a="), ((d % 200) % 7).cast("string")),
        ).otherwise(
            F.concat(F.lit("a="), ((d % 200) % 7).cast("string"), F.lit("&b=2"))
        ),
        F.when(d % 7 == 0, F.concat(F.lit("#sec"), d.cast("string"))).otherwise(
            F.lit("")
        ),
    )
    return (
        # two-step select: project the synthetic url once, then apply
        # the one-expr name form (r19) — CollapseProject folds the two
        # Projects back into one, so the physical plan is unchanged
        # while the canonicalization chain builds in a single parse
        docs.select(d.alias("doc_id"), url.alias("_url"))
        .select("doc_id", canonical_url("_url").alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
    )


@register(
    "quality_outlier_robust",
    oracle="""
        WITH m AS (
            SELECT doc_id, lang, source,
                   CAST(n_chars AS DOUBLE)
                       / len(string_split_regex(trim(text), '\\s+')) AS cpt
            FROM documents
        ),
        fences AS (
            SELECT lang, source,
                   floor(quantile_cont(cpt, 0.25) * 10000.0 + 0.5) / 10000.0 AS q1,
                   floor(quantile_cont(cpt, 0.75) * 10000.0 + 0.5) / 10000.0 AS q3
            FROM m GROUP BY lang, source
        )
        SELECT doc_id, lang, source,
               floor(cpt * 10000.0 + 0.5) / 10000.0 AS cpt,
               CASE WHEN cpt < q1 - 1.5 * (q3 - q1) THEN 'low'
                    ELSE 'high' END AS side
        FROM m JOIN fences USING (lang, source)
        WHERE cpt < q1 - 1.5 * (q3 - q1)
           OR cpt > q3 + 1.5 * (q3 - q1)
    """,
    tags=("ext-text-stats", "quality", "outlier"),
)
def quality_outlier_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (Tukey-fence) quality-outlier gate per (lang, source):
    docs whose chars-per-token ratio falls outside
    [q1 - 1.5*IQR, q3 + 1.5*IQR] — the distribution-free companion to
    the z-score gate (median/IQR shrug off the very outliers a
    mean/std gate lets drag its own threshold), on the mean-word-length
    signal the C4/Gopher-class filters use (too-long tokens: code/
    minified junk; too-short: character-soup).

    Parity: Spark ``percentile`` == DuckDB ``quantile_cont`` (the
    agg_percentiles pin); the ratio is the identical expression on
    both engines and quartiles round to 4 dp on BOTH sides before the
    fence arithmetic so an interpolation low-bit cannot flip a
    boundary doc. Scale: the ratio is scan-local; ONE group aggregate
    over (lang, source) — bounded cardinality — whose tiny fence table
    broadcasts back against the scan; at 100 TB swap percentile for
    approx_percentile and widen the fence rounding to the sketch's
    error bound — noted, not silently done."""
    docs = load(spark, sf_dir, "documents")
    cpt = F.col("n_chars").cast("double") / F.size(
        F.split(F.trim(F.col("text")), r"\s+")
    )
    m = docs.select("doc_id", "lang", "source", cpt.alias("cpt"))
    fences = m.groupBy("lang", "source").agg(
        round_fixed(F.percentile("cpt", F.lit(0.25)).cast("double"), 4).alias("q1"),
        round_fixed(F.percentile("cpt", F.lit(0.75)).cast("double"), 4).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    lo = F.col("q1") - 1.5 * iqr
    hi = F.col("q3") + 1.5 * iqr
    return (
        m.join(F.broadcast(fences), ["lang", "source"])
        .filter((F.col("cpt") < lo) | (F.col("cpt") > hi))
        .select(
            "doc_id",
            "lang",
            "source",
            round_fixed(F.col("cpt"), 4).alias("cpt"),
            F.when(F.col("cpt") < lo, F.lit("low"))
            .otherwise(F.lit("high"))
            .alias("side"),
        )
    )


_AES_ORACLE = f"""
    WITH scored AS (
        SELECT doc_id, n_chars,
               {sql_round(
                   "ln((CAST(('0x' || substr(md5('aes:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)"
                   " / 4294967296.0) / n_chars", 9)} AS s
        FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, n_chars, s AS aes_key
    FROM (
        SELECT *, row_number() OVER (ORDER BY s DESC, doc_id) AS rnk FROM scored
    ) WHERE rnk <= 200
"""


@register(
    "sample_weighted_aes",
    oracle=_AES_ORACLE,
    tags=("ext-text-stats", "sampling", "weighted"),
)
def sample_weighted_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis–
    Spirakis A-Res keys (Efraimidis & Spirakis 2006): each doc draws
    a deterministic uniform u from the cross-engine md5_32 convention
    (u = (h + 0.5) / 2^32 — never 0, so ln is finite) and the sample
    is the top-k by ln(u)/w, here weighting by document length
    (n_chars) — the quality/size-weighted subsample a mixing pipeline
    cuts before training. One pass, no replacement bookkeeping: the
    key transform IS the without-replacement semantics (the paper's
    point), and a weight-w doc displaces weight-1 docs exactly w
    times as often.

    Cross-engine float contract: u and w are identical values on both
    engines (md5_32 convention; integer n_chars), and the key rounds
    to 9 dp on BOTH engines BEFORE the rank cut (ADVICE r15: Spark's
    Math.log carries a 1-ulp allowance vs libm, so the unrounded key
    is not guaranteed bit-identical — a doc at the top-200 boundary
    could differ in membership across engines; the house round-before-
    compare rule applies to rank cuts too). doc_id breaks ties within
    a rounded key, so the cut is engine-stable.

    Scale shape: scoring is scan-local codegen (md5 + ln — no Python,
    no shuffle); the cut is TakeOrderedAndProject via the rank window
    over a single ordering — per-partition heaps ship k rows each, no
    corpus-sized sort. Weighted reservoir semantics with zero state:
    the same expression runs as a streaming filter by thresholding
    keys at deploy."""
    from k8e_fetch_spark.operators.similarity import md5_32

    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    h = md5_32(F.concat(F.lit("aes:"), F.col("doc_id").cast("string")))
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    s = round_fixed(F.log(u) / F.col("n_chars"), 9)
    scored = docs.select("doc_id", "n_chars", s.alias("s"))
    top = scored.orderBy(F.desc("s"), F.asc("doc_id")).limit(200)
    return top.select("doc_id", "n_chars", F.col("s").alias("aes_key"))
