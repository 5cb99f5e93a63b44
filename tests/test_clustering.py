"""Iterative k-means (Lloyd's) over embeddings: the engine's
iterative-algorithm pattern. Verifies the Lloyd's invariant (inertia
monotonically non-increasing), assignment completeness, and
winnowing fingerprint overlap semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k8e_fetch_spark.operators.clustering import kmeans
from tests.conftest import SF_DIR


def test_kmeans_inertia_monotone(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assigned, inertia = kmeans(emb, k=6, iterations=4)
    assert len(inertia) == 4
    for a, b in zip(inertia, inertia[1:]):
        assert b <= a * (1 + 1e-9), inertia  # Lloyd's never increases inertia
    assert inertia[-1] < inertia[0]  # and actually improves on this data
    n = emb.count()
    got = assigned.count()
    assert got == n  # every vector assigned exactly once
    assert assigned.select("centroid_id").distinct().count() <= 6


def test_winnowing_overlap_semantics(spark):
    from k8e_fetch_spark.operators.text import winnowing_fingerprints

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and keeps running far away"),
            (2, "the quick brown fox jumps over the lazy dog and keeps running far away"),
            (3, "the quick brown fox jumps over the lazy cat and keeps running far away"),
            (4, "entirely unrelated content with completely different words everywhere today"),
        ],
        ["doc_id", "text"],
    )
    fps: dict[int, set] = {}
    for r in winnowing_fingerprints(df).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[1] == fps[2]  # identical docs -> identical fingerprints
    j_edit = len(fps[1] & fps[3]) / len(fps[1] | fps[3])
    j_unrel = len(fps[1] & fps[4]) / len(fps[1] | fps[4])
    assert j_edit > 0.2  # one-word edit keeps substantial overlap
    assert j_unrel == 0.0


def test_winnowing_fold_matches_relational_form(spark):
    """The zero-shuffle aggregate-fold formulation must emit exactly the
    (id, fp) set of the windowed-min relational reference it replaced —
    including the short-doc (< window grams) whole-doc-min fallback."""
    from pyspark.sql.window import Window

    from k8e_fetch_spark.operators.text import winnowing_fingerprints

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j k l m n o p"),
            (2, "one two three"),  # exactly k tokens -> 1 gram, fallback path
            (3, "x y z w x y z w x y z w"),  # repeats -> duplicate window minima
            (4, "solo"),
            (5, "the quick brown fox jumps over the lazy dog"),
        ],
        ["doc_id", "text"],
    )
    k, window = 3, 4
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.try_element_at(toks, i + j + 1) for j in range(k)])
    )
    hashed = df.select(F.col("doc_id"), F.posexplode(grams).alias("pos", "gram")).select(
        "doc_id", "pos", F.xxhash64("gram").alias("h")
    )
    w_min = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, window - 1)
    w_all = Window.partitionBy("doc_id")
    reference = (
        hashed.withColumn("fp", F.min("h").over(w_min))
        .withColumn("_n", F.count(F.lit(1)).over(w_all))
        .filter((F.col("pos") <= F.col("_n") - window) | (F.col("pos") == 0))
        .select("doc_id", "fp")
        .distinct()
    )
    fold = winnowing_fingerprints(df, k=k, window=window)
    assert fold.exceptAll(reference).count() == 0
    assert reference.exceptAll(fold).count() == 0


def test_connected_components_known_graph(spark):
    from k8e_fetch_spark.operators.clustering import connected_components

    # components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["doc_a", "doc_b"],
    )
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_dedup_clusters_from_minhash(spark):
    """End-to-end: near-dup pairs -> components -> keep-one-per-cluster."""
    from k8e_fetch_spark.operators.clustering import connected_components
    from k8e_fetch_spark.operators.similarity import minhash_candidate_pairs

    base = "the quick brown fox jumps over the lazy dog while the cat watches from afar"
    docs = spark.createDataFrame(
        [
            # near-dups by APPENDING one word: 13 shared trigrams of 14
            # (jaccard ~0.93) — at 8 bands x 4 rows the per-pair LSH
            # candidate probability is 1-(1-0.93^4)^8 > 0.9998 for ANY
            # hash family. (A replaced-word variant at jaccard ~0.63
            # had only ~73% band-collision odds and silently depended
            # on the previous hash family getting lucky.)
            (1, base),
            (2, base + " today"),            # near-dup of 1
            (3, base + " tonight"),          # near-dup of 1 and 2
            (4, "completely different content about databases and distributed query engines"),
            (5, "completely different content about databases and distributed query engines"),
        ],
        ["doc_id", "text"],
    )
    pairs = minhash_candidate_pairs(docs, "doc_id", "text").filter(F.col("jaccard") > 0.5)
    comps = connected_components(pairs)
    comp_of = {r["node"]: r["component"] for r in comps.collect()}
    # 1,2,3 cluster together; 4,5 cluster together
    assert comp_of[1] == comp_of[2] == comp_of[3]
    assert comp_of[4] == comp_of[5]
    assert comp_of[1] != comp_of[4]


def test_redaction_on_planted_pii(spark):
    """Redaction semantics on planted spans (the synthetic corpus has
    none, so oracle parity alone would pass vacuously)."""
    from k8e_fetch_spark.queries.registry import REGISTRY
    from k8e_fetch_spark.queries import queries

    queries()
    # reuse the registered expressions through a small planted frame
    import k8e_fetch_spark.queries.text_ops as t

    df = spark.createDataFrame(
        [
            (1, "contact jane.doe@example.org or call 919-555-0101 now"),
            (2, "no sensitive content here"),
            (3, "two mails: a@b.io c.d@e.co.uk and 984.555.0199"),
        ],
        ["doc_id", "text"],
    )
    from pyspark.sql import functions as FF

    redacted = FF.regexp_replace(
        FF.regexp_replace(FF.col("text"), t._EMAIL_PAT, "<EMAIL>"), t._PHONE_PAT, "<PHONE>"
    )
    rows = {r["doc_id"]: r for r in df.select(
        "doc_id",
        redacted.alias("redacted"),
        FF.size(FF.regexp_extract_all("text", FF.lit(t._EMAIL_PAT), FF.lit(0))).alias("n_emails"),
        FF.size(FF.regexp_extract_all("text", FF.lit(t._PHONE_PAT), FF.lit(0))).alias("n_phones"),
    ).collect()}
    assert rows[1]["redacted"] == "contact <EMAIL> or call <PHONE> now"
    assert (rows[1]["n_emails"], rows[1]["n_phones"]) == (1, 1)
    assert rows[2]["redacted"] == "no sensitive content here"
    assert rows[3]["n_emails"] == 2 and rows[3]["n_phones"] == 1
    assert "<EMAIL>" in rows[3]["redacted"] and "<PHONE>" in rows[3]["redacted"]


def test_repetition_stats_known_counts(spark):
    """repetition_stats must report exact gram totals / max multiplicity
    / distinct counts on docs with hand-computable 2-gram structure."""
    from k8e_fetch_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [
            # grams: "a b","b a","a b","b a","a b" -> total 5, top 3 ("a b"), distinct 2
            (1, "a b a b a b"),
            # all distinct: "w x","x y","y z" -> total 3, top 1, distinct 3
            (2, "w x y z"),
            # single token -> whole-doc fallback gram
            (3, "solo"),
            # one repeated pair: "p q","q p","p q" -> total 3, top 2, distinct 2
            (4, "p q p q"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: (r["r"]["n_grams"], r["r"]["top_gram_count"], r["r"]["distinct_grams"])
        for r in df.select("doc_id", repetition_stats(F.col("text"), n=2).alias("r")).collect()
    }
    assert rows[1] == (5, 3, 2)
    assert rows[2] == (3, 1, 3)
    assert rows[3] == (1, 1, 1)
    assert rows[4] == (3, 2, 2)


def test_connected_components_local_path_reads_converged(spark):
    """The local union-find path is EXACT, so its reported rounds must
    satisfy the documented convergence check (rounds < max_iterations)
    even at max_iterations=1 — the ADVICE r10 contract fix. A caller
    applying the documented check to the exact answer must never
    misread it as unconverged."""
    from k8e_fetch_spark.operators.clustering import connected_components

    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "doc_a long, doc_b long"
    )
    labels, rounds = connected_components(
        pairs, max_iterations=1, return_rounds=True
    )
    assert rounds < 1  # converged by the documented check
    got = {r["node"]: r["component"] for r in labels.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5}


def test_connected_components_long_chain_diameter(spark):
    """The documented convergence bound, pinned: a planted path graph
    0-1-2-...-11 forces the min label to travel one hop per round, so
    min-label propagation needs diameter (=11) productive rounds (the
    final zero-change fixpoint-detection round is uncounted by the r12
    contract) — far beyond the 2-3 rounds shallow near-dup clusters
    take. Asserts full convergence AND the round count, so a silent
    change to the propagation step can't hide."""
    from k8e_fetch_spark.operators.clustering import connected_components

    n = 12
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    # local_threshold=0 forces the DISTRIBUTED propagation loop — this
    # test pins ITS convergence bound (the r10 local union-find path
    # would short-circuit the property under test)
    labels, rounds = connected_components(
        pairs, max_iterations=n + 3, return_rounds=True, local_threshold=0
    )
    got = {r["node"]: r["component"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    # diameter hops of productive propagation; > 3 proves this fixture
    # really exercises the deep-propagation path
    assert 3 < rounds <= n, rounds


def test_connected_components_distributed_boundary_convergence(spark):
    """ADVICE r11 contract fix, distributed path: when the zero-change
    fixpoint-detection round lands EXACTLY on the last allowed round,
    the run is still converged and must read so under the documented
    check (rounds < max_iterations). A 0-1-2 chain needs 2 productive
    min-label rounds + 1 detection round; max_iterations=3 previously
    returned rounds==3 (misread unconverged), now 2."""
    from k8e_fetch_spark.operators.clustering import connected_components

    pairs = spark.createDataFrame([(0, 1), (1, 2)], "doc_a long, doc_b long")
    labels, rounds = connected_components(
        pairs, max_iterations=3, return_rounds=True, local_threshold=0
    )
    assert rounds == 2  # productive rounds only
    assert rounds < 3  # the documented convergence check
    got = {r["node"]: r["component"] for r in labels.collect()}
    assert got == {0: 0, 1: 0, 2: 0}


def test_star_components_boundary_convergence(spark):
    """Same contract on the star-contraction path: a converged run
    never reports rounds == max_iterations. A single edge converges in
    one productive contraction; with max_iterations exactly at the
    detection round the check must still read converged."""
    from k8e_fetch_spark.operators.clustering import connected_components_star

    pairs = spark.createDataFrame([(0, 1), (1, 2), (7, 8)], "doc_a long, doc_b long")
    max_it = 8
    labels, rounds = connected_components_star(
        pairs, max_iterations=max_it, return_rounds=True
    )
    assert rounds < max_it
    got = {r["node"]: r["component"] for r in labels.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 7: 7, 8: 7}


def test_kmeans_assign_rejects_nonfinite_centroids(spark):
    """NaN/Inf centroid components would render as nanD/infD in the
    inlined SQL literal and fail with an opaque parse error; the assign
    step must refuse them with a descriptive message instead."""
    import pytest

    from k8e_fetch_spark.operators.clustering import _assign

    df = spark.createDataFrame([(1, [0.0, 1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="non-finite"):
        _assign(df, [(0, [float("nan"), 0.5])], "vec_id", "embedding")


def _cc_sets(labels):
    comps = {}
    for r in labels.collect():
        comps.setdefault(r["component"], set()).add(r["node"])
    return {frozenset(v) for v in comps.values()}


def test_star_components_match_min_label(spark):
    """large-star/small-star must produce exactly min-label's components
    on assorted graph shapes: disjoint cliques, a chain, a hub star,
    and a random (seeded) edge soup."""
    import random

    from k8e_fetch_spark.operators.clustering import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(42)
    edges = []
    # two cliques
    for base in (0, 10):
        ids = list(range(base, base + 5))
        edges += [(a, b) for a in ids for b in ids if a < b]
    # a chain
    edges += [(i, i + 1) for i in range(20, 30)]
    # a hub star
    edges += [(40, m) for m in range(41, 50)]
    # random soup over 60..90
    edges += [
        (rng.randint(60, 90), rng.randint(60, 90)) for _ in range(40)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    want = _cc_sets(connected_components(pairs, max_iterations=60))
    got = _cc_sets(connected_components_star(pairs))
    assert got == want


def test_star_components_log_rounds_on_chain(spark):
    """The documented upgrade-path property: a 40-hop chain needs ~40
    min-label rounds but only O(log n) star alternations."""
    from k8e_fetch_spark.operators.clustering import connected_components_star

    n = 40
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    labels, rounds = connected_components_star(pairs, return_rounds=True)
    got = {r["node"]: r["component"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    assert rounds <= 10, rounds  # log2(40) ~ 5.3 alternations + slack


def test_star_components_unconverged_one_label_per_node(spark):
    """max_iterations exhausted: the output must still be one row per
    node (residual non-star edges min-collapse) and must warn — silent
    multi-labeling was the failure mode before this guard."""
    import warnings

    from k8e_fetch_spark.operators.clustering import connected_components_star

    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        labels, rounds = connected_components_star(
            pairs, max_iterations=1, return_rounds=True
        )
        rows = labels.collect()
    assert rounds == 1
    assert any(
        issubclass(w.category, RuntimeWarning) and "did not converge" in str(w.message)
        for w in caught
    )
    nodes = [r["node"] for r in rows]
    assert len(nodes) == len(set(nodes)) == n  # exactly one label each


def test_segment_dedup_keep_first_planted(spark):
    """A boilerplate paragraph shared by three docs survives only in
    the earliest (doc, position); unique paragraphs all survive; a
    doc made entirely of claimed boilerplate drops out."""
    from k8e_fetch_spark.operators.dedup import segment_dedup_keep_first

    rows = [
        # doc 1: boiler at idx 0, unique at idx 1
        (1, 0, "the quick brown fox"),
        (1, 1, "alpha beta gamma"),
        # doc 2: unique, then the same boiler (later doc -> dropped)
        (2, 0, "delta epsilon zeta"),
        (2, 1, "the quick brown fox"),
        # doc 3: ONLY the boiler -> whole doc disappears
        (3, 0, "the quick brown fox"),
        # doc 4: internal repetition -> second copy dropped
        (4, 0, "eta theta iota"),
        (4, 1, "eta theta iota"),
        (4, 2, "kappa lambda mu"),
    ]
    segs = spark.createDataFrame(rows, ["doc_id", "seg_idx", "seg"])
    got = {
        r["doc_id"]: (r["cleaned_text"], r["n_kept"])
        for r in segment_dedup_keep_first(segs).collect()
    }
    assert got == {
        1: ("the quick brown fox alpha beta gamma", 2),
        2: ("delta epsilon zeta", 1),
        4: ("eta theta iota kappa lambda mu", 2),
    }


def test_source_temperature_rates_upweight_small(spark):
    """alpha=0.5 mixing: with sources 900/100 and target half the
    corpus, shares go 0.75/0.25 -> the small source's rate caps at 1.0
    while the big one samples at ~0.417 (exact 6dp arithmetic round)."""
    from k8e_fetch_spark.operators.text import source_temperature_rates

    docs = spark.createDataFrame(
        [(i, "big") for i in range(900)] + [(i, "small") for i in range(900, 1000)],
        ["doc_id", "source"],
    )
    rates = {r["source"]: r["rate"] for r in source_temperature_rates(docs).collect()}
    # big: 0.5*1000 * (30/40) / 900 = 0.416667 (rounded 6dp)
    assert rates["big"] == 0.416667
    # small: 0.5*1000 * (10/40) / 100 = 1.25 -> capped
    assert rates["small"] == 1.0


def test_segment_dedup_and_rates_on_empty_input(spark):
    """Empty corpora must flow through (a fresh pipeline's first run,
    a filter that removed everything): zero rows out, no crash."""
    from k8e_fetch_spark.operators.dedup import segment_dedup_keep_first
    from k8e_fetch_spark.operators.text import source_temperature_rates

    empty_segs = spark.createDataFrame([], "doc_id long, seg_idx int, seg string")
    assert segment_dedup_keep_first(empty_segs).count() == 0
    empty_docs = spark.createDataFrame([], "doc_id long, source string")
    assert source_temperature_rates(empty_docs).count() == 0


def test_keep_best_skips_null_quality(spark):
    """A NULL quality must sort as WORST, not win the struct-min: the
    0.9 doc is kept, NULL members still count."""
    from k8e_fetch_spark.operators.dedup import keep_best_per_cluster

    clusters = spark.createDataFrame(
        [(1, "c"), (2, "c"), (3, "c")], ["doc_id", "cluster_id"]
    )
    quality = spark.createDataFrame(
        [(1, 0.5), (2, None), (3, 0.9)], "doc_id long, quality double"
    )
    row = keep_best_per_cluster(clusters, quality).collect()[0]
    assert (row["keep_doc_id"], row["best_quality"], row["n_members"]) == (3, 0.9, 3)
    # all-null cluster still yields a deterministic (smallest-id) keeper
    q2 = spark.createDataFrame([(1, None), (2, None), (3, None)], "doc_id long, quality double")
    row2 = keep_best_per_cluster(clusters, q2).collect()[0]
    assert (row2["keep_doc_id"], row2["best_quality"]) == (1, None)


def test_segment_dedup_custom_joiner(spark):
    """Blank-line paragraph corpora reassemble with their own delimiter."""
    from k8e_fetch_spark.operators.dedup import segment_dedup_keep_first

    segs = spark.createDataFrame(
        [(1, 0, "para one"), (1, 1, "para two")], ["doc_id", "seg_idx", "seg"]
    )
    out = segment_dedup_keep_first(segs, joiner="\n\n").collect()[0]
    assert out["cleaned_text"] == "para one\n\npara two"


def test_bloom_membership_no_false_negatives_and_bounded_fp(spark):
    """Bloom operator contract: every inserted gram tests positive (no
    false negatives — what makes the exact-confirm composition sound),
    and the false-positive rate over disjoint probes sits near the
    analytic (1-e^(-kn/m))^k — not a degenerate all-positive bitmap."""
    from pyspark.sql import functions as F

    from k8e_fetch_spark.operators.text import bloom_build_bitmap, bloom_member

    inserted = [f"gram-{i}" for i in range(2000)]
    probes = [f"absent-{i}" for i in range(4000)]
    m_bits, k = 1 << 15, 3  # 16.4 bits/gram
    ev = spark.createDataFrame([(g,) for g in inserted], "g: string")
    bitmap = spark.createDataFrame(
        [(bloom_build_bitmap(ev, "g", m_bits, k),)], "bitmap: array<bigint>"
    )
    def positives(values):
        df = spark.createDataFrame([(v,) for v in values], "g: string")
        return (
            df.crossJoin(F.broadcast(bitmap))
            .filter(bloom_member(F.col("g"), F.col("bitmap"), m_bits, k))
            .count()
        )
    assert positives(inserted) == len(inserted)  # zero false negatives
    fp = positives(probes) / len(probes)
    # analytic FP at n=2000, m=32768, k=3 is ~0.45%; allow generous slack
    assert fp < 0.03, f"false-positive rate {fp:.3%} out of band"


def test_bloom_decontaminate_matches_exact_form(spark):
    """The bloom-prefiltered query is bit-identical to the broadcast
    exact-join query on the same data — FPs are removed by the confirm
    join, FNs are impossible."""
    from k8e_fetch_spark.queries.registry import REGISTRY
    from k8e_fetch_spark.queries import queries

    queries()
    from tests.conftest import SF_DIR

    exact = {
        (r["doc_id"], r["hit_grams"])
        for r in REGISTRY["text_decontaminate_ngram"].fn(spark, SF_DIR).collect()
    }
    bloom = {
        (r["doc_id"], r["hit_grams"])
        for r in REGISTRY["text_decontaminate_bloom"].fn(spark, SF_DIR).collect()
    }
    assert bloom == exact and len(exact) > 0


def test_pii_masking_semantics_on_handwritten_cases(spark):
    """The PII patterns against HAND-WRITTEN expectations — oracle
    parity alone can't catch a mistranslation encoded identically on
    both engines. Covers: plain email, subdomain email, IPv4 at word
    boundaries, versions that must NOT match (1.2.3 — only 3 octets),
    international phone, and a short digit run that must survive."""
    from pyspark.sql import functions as F

    from k8e_fetch_spark.queries.text_ops import _PII_EMAIL, _PII_IP, _PII_PHONE

    cases = [
        ("mail me at bob.smith+x@sub.example.co.uk today",
         "mail me at <EMAIL> today"),
        ("server 192.168.0.1 and 10.0.0.255 up", "server <IP> and <IP> up"),
        ("version 1.2.3 stays; 1.2.3.4 goes", "version 1.2.3 stays; <IP> goes"),
        ("call +442071234567 now", "call <PHONE> now"),
        ("+123 is too short to be a phone", "+123 is too short to be a phone"),
        ("no pii here", "no pii here"),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "s: string")
    t1 = F.regexp_replace(F.col("s"), _PII_EMAIL, "<EMAIL>")
    t2 = F.regexp_replace(t1, _PII_IP, "<IP>")
    t3 = F.regexp_replace(t2, _PII_PHONE, "<PHONE>")
    got = [r["out"] for r in df.select(t3.alias("out")).collect()]
    assert got == [want for _, want in cases]


def test_empty_input_guards(spark):
    """Driver-state builders fail loud with a descriptive error on
    empty inputs instead of IndexError deep in numpy/collect code."""
    import pytest

    from k8e_fetch_spark.operators.clustering import kmeans
    from k8e_fetch_spark.operators.similarity import ivf_assign

    empty_vecs = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no rows"):
        kmeans(empty_vecs, k=4, iterations=1)

    some = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    empty_cents = spark.createDataFrame([], "centroid_id int, centroid array<float>")
    with pytest.raises(ValueError, match="empty centroid"):
        ivf_assign(some, empty_cents, "vec_id")


def test_semdedup_sampled_training_path(spark):
    """The 100 TB semdedup form: bounded-sample numpy-Lloyd training
    instead of the full-corpus kmeans loop. Same pipeline downstream,
    so planted exact copies must still be dropped and their originals
    kept; repeat runs must be identical (fixed sample, fixed init)."""
    from k8e_fetch_spark.io import load
    from k8e_fetch_spark.operators.clustering import (
        semdedup,
        train_centroids_sampled,
    )
    from tests.conftest import SF_DIR

    emb = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(planted)
    out = semdedup(corpus, k=8, eps=0.95, iterations=4, train_sample=256)
    rows = {r["vec_id"]: r for r in out.collect()}
    for vid in range(10):
        assert rows[vid + 100000]["kept"] == 0
        assert rows[vid]["kept"] == 1
        assert rows[vid]["cluster_id"] == rows[vid + 100000]["cluster_id"]
    # deterministic training: same sample -> same centroids
    c1 = train_centroids_sampled(corpus, k=8, iterations=4, sample_size=256)
    c2 = train_centroids_sampled(corpus, k=8, iterations=4, sample_size=256)
    assert c1 == c2
    import pytest as _pytest

    with _pytest.raises(ValueError):
        train_centroids_sampled(corpus.limit(3), k=8, sample_size=256)


def test_dsir_weights_favor_target_like_docs(spark):
    """DSIR semantics on handwritten docs: a candidate whose bigrams
    match the target distribution must outweigh one that matches the
    off-target mass; identical docs get identical weights; a 1-token
    doc emits no bigrams and no weight row."""
    from k8e_fetch_spark.operators.text import dsir_importance_weights

    rows = [
        (1, 1, "alpha beta alpha beta alpha beta"),   # target
        (2, 1, "alpha beta gamma alpha beta gamma"),  # target
        (3, 0, "delta epsilon delta epsilon delta"),  # raw bulk
        (4, 0, "delta epsilon zeta delta epsilon"),   # raw bulk
        (5, 0, "alpha beta alpha beta"),              # target-like candidate
        (6, 0, "delta epsilon delta epsilon"),        # off-target candidate
        (7, 0, "alpha beta alpha beta"),              # twin of 5
        (8, 0, "solo"),                               # no bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id int, is_t int, text string")
    w = {
        r["doc_id"]: r["weight"]
        for r in dsir_importance_weights(
            df, target=F.col("is_t") == 1, n_buckets=64
        ).collect()
    }
    assert 8 not in w
    assert w[5] == w[7]
    assert w[5] > w[6], f"target-like {w[5]} must outweigh off-target {w[6]}"


def test_line_cleaning_rules_on_handwritten_lines(spark):
    """Pin the intended C4 line rules against handwritten expectations
    (guards the two-sided-wrong loophole: query and oracle share the
    predicates, so a mistranslated rule would still hash-match)."""
    cases = [
        ("this sentence has enough words and ends well.", True),
        ("this sentence has enough words and ends well", False),   # no punct
        ("too short ends fine.", False),                           # < 5 words
        ('a quoted sentence with five words ends here."', True),
        ("lorem ipsum filler with plenty of words here.", False),  # blocklist
        ("please enable JavaScript to continue reading this.", False),
        ("Click here to read the rest of the story.", False),
        ("function() { return a longer code fragment; }", False),  # brace
        ("does a question with five words count?", True),
    ]
    df = spark.createDataFrame(
        [(i, line) for i, (line, _) in enumerate(cases)], "doc_id int, text string"
    )
    from pyspark.sql import functions as F2

    ls = F2.split(F2.col("text"), "\n")
    keep = lambda x: (  # noqa: E731 — mirrors text_line_cleaning
        x.rlike('[.!?"]$')
        & (F2.size(F2.split(F2.trim(x), r"\s+")) >= 5)
        & ~F2.lower(x).contains("lorem ipsum")
        & ~F2.lower(x).contains("javascript")
        & ~F2.lower(x).contains("click here")
        & ~F2.lower(x).contains("{")
    )
    out = {r["doc_id"]: r["k"] for r in df.select("doc_id", F2.size(F2.filter(ls, keep)).alias("k")).collect()}
    for i, (line, want) in enumerate(cases):
        assert out[i] == (1 if want else 0), f"line {i!r}: {line!r} kept={out[i]} want={want}"


def test_kmeans_arrow_expression_twin_identical(spark):
    """The Arrow batch-distance assignment (use_arrow=True, default)
    and the literal-expression fold twin must produce IDENTICAL
    assignments and trained centroids on the fixture corpus — the same
    pinning discipline as ivf_assign / pq_encode (distances differ only
    in float summation order, ~1e-16; an argmin flip needs a
    near-exact tie the fixture does not contain)."""
    from k8e_fetch_spark.operators.clustering import kmeans
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    a_df, a_hist, a_cents = kmeans(
        emb, k=8, iterations=3, return_centroids=True, use_arrow=True
    )
    a = {r["vec_id"]: r["centroid_id"] for r in a_df.collect()}
    e_df, e_hist, e_cents = kmeans(
        emb, k=8, iterations=3, return_centroids=True, use_arrow=False
    )
    e = {r["vec_id"]: r["centroid_id"] for r in e_df.collect()}
    assert a == e
    # identical memberships -> identical member means (same Spark agg
    # computes them); pin the trained model bitwise
    assert a_cents == e_cents
    # inertia may differ only at float-order noise
    for x, y in zip(a_hist, e_hist):
        assert abs(x - y) <= 1e-9 * max(1.0, abs(y))


def test_connected_components_local_matches_distributed(spark):
    """The r10 local union-find path must produce the SAME labels as
    the distributed propagation loop (both: component = min node id)
    on a graph with a cycle, a path, and an isolate-pair."""
    from k8e_fetch_spark.operators.clustering import connected_components

    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (20, 21)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    local = {
        (r["node"], r["component"]) for r in connected_components(pairs).collect()
    }
    dist = {
        (r["node"], r["component"])
        for r in connected_components(pairs, local_threshold=0).collect()
    }
    assert local == dist
    assert local == {
        (1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (12, 10), (20, 20), (21, 20),
    }


def test_bigram_lm_scores_semantics(spark):
    """Hand-computed bigram LM scores: seen transitions beat unseen,
    <2-token docs are excluded, and the smoothed backoff keeps every
    probability positive (log is always finite)."""
    import math

    from pyspark.sql import functions as F

    from k8e_fetch_spark.operators.text import bigram_lm_scores

    rows = [
        (1, "ref", "a b a b"),   # target: bigrams ab, ba, ab
        (2, "ref", "a b"),       # target: ab
        (3, "raw", "a b"),       # seen transition
        (4, "raw", "z z"),       # fully unseen
        (5, "raw", "a"),         # single token: NO output row
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["doc_id"]: r
        for r in bigram_lm_scores(df, target=F.col("source") == "ref").collect()
    }
    assert 5 not in got
    # model: tokens a:3+1? -> target docs 1,2: tokens a b a b a b =>
    # c1: a=3, b=3; N=6, V=2; c2: (a,b)=3, (b,a)=1
    p_ab = 0.7 * (3 / 3) + 0.3 * ((3 + 1) / 8)
    p_zz = 0.3 * ((0 + 1) / 8)
    assert got[3]["n_bigrams"] == 1
    assert abs(got[3]["avg_logprob"] - math.log10(p_ab)) < 1e-9
    assert abs(got[4]["avg_logprob"] - math.log10(p_zz)) < 1e-9
    assert got[3]["avg_logprob"] > got[4]["avg_logprob"]


def test_bigram_lm_arrow_matches_relational_twin(spark):
    """The closure-shipped Arrow scorer and the relational join form
    must produce identical rounded outputs on the real fixture corpus
    (planted garbage included)."""
    from pyspark.sql import functions as F

    from k8e_fetch_spark.functions.rounding import round_fixed
    from k8e_fetch_spark.operators.text import bigram_lm_scores

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "source", "text"
    )

    def rounded(frame):
        return {
            (r["doc_id"], r["n_bigrams"], r["avg_logprob"])
            for r in frame.select(
                "doc_id", "n_bigrams", round_fixed(F.col("avg_logprob"), 6).alias("avg_logprob")
            ).collect()
        }

    tgt = F.col("source").isin("src0", "src1")
    a = rounded(bigram_lm_scores(docs, target=tgt, use_arrow=True))
    b = rounded(bigram_lm_scores(docs, target=tgt, use_arrow=False))
    assert a == b


def test_bigram_lm_vector_scorer_bit_identical_to_loop(spark):
    """The r11 vectorized scorer (searchsorted bigram gathers + a
    sequential builtin-sum fold over per-doc .tolist() slices) must
    match the per-token loop twin BIT FOR BIT — not just at the
    declared rounding — on the real fixture corpus: per-bigram
    probabilities use the identical flop sequence, and builtin sum()
    folds strictly left-to-right exactly like the loop's += (the
    implementation deliberately avoids np.add.reduceat/np.sum, which
    switch to pairwise summation above ~8 elements and drift by ulps —
    see operators/text.py). Unrounded equality is the strongest pin
    available and catches any silent reordering."""
    from pyspark.sql import functions as F

    from k8e_fetch_spark.operators.text import bigram_lm_scores

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "source", "text"
    )
    tgt = F.col("source").isin("src0", "src1")

    def exact(frame):
        return {
            (r["doc_id"], r["n_bigrams"], r["avg_logprob"]) for r in frame.collect()
        }

    vec = exact(
        bigram_lm_scores(docs, target=tgt, use_arrow=True, arrow_impl="vector")
    )
    loop = exact(
        bigram_lm_scores(docs, target=tgt, use_arrow=True, arrow_impl="loop")
    )
    assert vec == loop
    assert len(vec) > 100  # non-vacuous: the fixture scores real docs


def test_bm25_scores_match_hand_computation(spark):
    """Two-sided-wrong guard for text_bm25_search: the operator and its
    DuckDB oracle share the formula, so a mistranscription would pass
    the hash gate — pin the semantics against an independent pure-Python
    computation on a corpus small enough to verify by eye."""
    import math

    from k8e_fetch_spark.operators.text import bm25_scores

    texts = {
        1: "scan scan merge alpha beta",        # tf(scan)=2, tf(merge)=1, dl=5
        2: "vector gamma",                      # tf(vector)=1, dl=2
        3: "alpha beta gamma delta",            # no query terms, dl=4
        4: "scan merge vector scan merge",      # all three terms, dl=5
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    terms, k1, b = ("scan", "merge", "vector"), 1.2, 0.75
    got = {
        r.doc_id: (r.bm25, r.n_terms)
        for r in bm25_scores(docs, terms, k1=k1, b=b).collect()
    }

    n_docs = len(texts)
    toks = {i: t.split() for i, t in texts.items()}
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    df = {t: sum(t in v for v in toks.values()) for t in terms}

    def score(i):
        out, n = 0.0, 0
        for t in terms:
            tf = toks[i].count(t)
            if not tf:
                continue
            idf = math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
            out += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(toks[i]) / avgdl)
            )
            n += 1
        return out, n

    # doc 3 matches nothing -> absent from the score frame entirely
    assert set(got) == {1, 2, 4}
    for i in got:
        exp_s, exp_n = score(i)
        assert got[i][1] == exp_n
        assert got[i][0] == pytest.approx(exp_s, abs=1e-12)
    # saturation sanity: doc 4 (all three terms) outranks both partial hits
    assert got[4][0] > got[1][0] and got[4][0] > got[2][0]


def test_bm25_multi_single_query_twin(spark):
    """bm25_scores_multi with one query must equal bm25_scores exactly
    (same expression sequence — bit parity, not approx), and a term
    shared by two queries scores identically for both."""
    from k8e_fetch_spark.operators.text import bm25_scores, bm25_scores_multi

    docs = spark.createDataFrame(
        [(i, t) for i, t in {
            1: "scan scan merge alpha",
            2: "merge beta gamma",
            3: "alpha beta",
            4: "scan merge scan merge delta epsilon",
        }.items()],
        "doc_id long, text string",
    )
    single = {
        (r.doc_id,): (r.bm25, r.n_terms)
        for r in bm25_scores(docs, ("scan", "merge")).collect()
    }
    multi = bm25_scores_multi(docs, {0: ("scan", "merge"), 1: ("merge",)})
    got0 = {
        (r.doc_id,): (r.bm25, r.n_terms)
        for r in multi.filter("q_id = 0").collect()
    }
    assert got0 == single  # bit-identical, not approx
    # shared term: q1's per-doc 'merge' score equals the 'merge'
    # component computed by a dedicated single-query run
    merge_only = {
        (r.doc_id,): (r.bm25, r.n_terms)
        for r in bm25_scores(docs, ("merge",)).collect()
    }
    got1 = {
        (r.doc_id,): (r.bm25, r.n_terms)
        for r in multi.filter("q_id = 1").collect()
    }
    assert got1 == merge_only


def test_bm25_fuzz_against_pure_python(spark):
    """Seeded fuzz: bm25_scores over random word-soup corpora must
    match an independently-written pure-Python BM25 on every document
    (1e-9 abs — same formula, different evaluation order). Catches
    formula drift the 4-doc hand test is too small to see (df edge
    cases, dl spread, absent terms, duplicate-heavy docs)."""
    import math
    import random

    from k8e_fetch_spark.operators.text import bm25_scores

    rng = random.Random(29)
    vocab = [f"w{i}" for i in range(12)]
    k1, b = 1.2, 0.75
    for trial in range(3):
        docs = {
            i: " ".join(rng.choices(vocab, k=rng.randrange(1, 30)))
            for i in range(40)
        }
        terms = tuple(rng.sample(vocab, 3)) + ("neverpresent",)
        got = {
            r.doc_id: (r.bm25, r.n_terms)
            for r in bm25_scores(
                spark.createDataFrame(list(docs.items()), "doc_id long, text string"),
                terms, k1=k1, b=b,
            ).collect()
        }
        toks = {i: t.split() for i, t in docs.items()}
        n_docs = len(docs)
        avgdl = sum(map(len, toks.values())) / n_docs
        df = {t: sum(t in v for v in toks.values()) for t in terms}
        for i, tk in toks.items():
            exp, n = 0.0, 0
            for t in terms:
                tf = tk.count(t)
                if not tf:
                    continue
                idf = math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
                exp += idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * len(tk) / avgdl)
                )
                n += 1
            if n == 0:
                assert i not in got, (trial, i)
            else:
                assert got[i][1] == n, (trial, i)
                assert abs(got[i][0] - exp) < 1e-9, (trial, i, got[i][0], exp)


def test_bm25_multi_duplicate_term_weighs_once(spark):
    """ADVICE r13: a term listed twice in one query's term sequence
    must weigh ONCE — bit-identical to the deduped query and to
    bm25_scores (whose isin() filter is set-semantic by construction).
    A dup (q_id, token) row would fan the posting join out and double
    both that term's weight and n_terms."""
    from k8e_fetch_spark.operators.text import bm25_scores, bm25_scores_multi

    docs = spark.createDataFrame(
        [(1, "scan scan merge alpha"), (2, "merge beta"), (3, "scan delta")],
        "doc_id long, text string",
    )

    def _rows(df, q=None):
        if q is not None:
            df = df.filter(f"q_id = {q}")
        return {r.doc_id: (r.bm25, r.n_terms) for r in df.collect()}

    clean = bm25_scores_multi(docs, {0: ("scan", "merge")})
    dup = bm25_scores_multi(docs, {0: ("scan", "merge", "scan", "scan")})
    assert _rows(dup, 0) == _rows(clean, 0)
    single = {
        r.doc_id: (r.bm25, r.n_terms)
        for r in bm25_scores(docs, ("scan", "merge", "scan")).collect()
    }
    assert _rows(dup, 0) == single


def test_hybrid_rrf_multi_pins_single_query_slice(spark):
    """sim_hybrid_rrf_multi's q_id=0 slice must BIT-equal
    sim_hybrid_rrf (same terms, same query vector, same rounding at
    every stage) — the batched form is the production shape and the
    single form is pinned as its slice (VERDICT r13 #5)."""
    from k8e_fetch_spark.queries import REGISTRY, queries

    queries()  # force registration
    sf = "/root/testdata/sf0.001"
    single = {
        r.doc_id: (r.rrf, r.r_lex, r.r_vec)
        for r in REGISTRY["sim_hybrid_rrf"].fn(spark, sf).collect()
    }
    multi = REGISTRY["sim_hybrid_rrf_multi"].fn(spark, sf).collect()
    q0 = {r.doc_id: (r.rrf, r.r_lex, r.r_vec) for r in multi if r.q_id == 0}
    assert q0 == single  # bit-identical, not approx
    # all three queries produce full top-10 lists with sane rank fields
    by_q = {}
    for r in multi:
        by_q.setdefault(r.q_id, []).append(r)
    assert sorted(by_q) == [0, 1, 2]
    for q, rows in by_q.items():
        assert len(rows) == 10, q
        assert all(
            (r.r_lex is None or 1 <= r.r_lex <= 20)
            and (r.r_vec is None or 1 <= r.r_vec <= 20)
            and (r.r_lex is not None or r.r_vec is not None)
            for r in rows
        ), q
