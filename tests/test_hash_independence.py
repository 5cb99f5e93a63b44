"""Systematic pairwise-independence audit of every hash-based decision.

The engine makes several per-row decisions that are pure hash functions
of the same key (``doc_id``): train/val/test split, temperature-sampling
keep, stratified-sampling membership, shuffle/bucket placement
(Murmur3 ``hash``), shingle/MinHash identity (``xxhash64``), and the
content-fingerprint md5. If any two of these share an unsalted hash
domain, composing them silently biases the corpus (e.g. every sampled
doc landing in 'train') — a bug class that DuckDB oracle parity CANNOT
see, because both engines compute the same correlated formula. The
round-5 domain-salting fix (queries/text_ops.py `_mix_frac_col`) was
found exactly this way, by composing ops end-to-end; this test makes
the check systematic: every decision pair gets a chi-square
independence test on planted data, in one Spark job.

Deterministic: the decisions are pure hashes of 0..N-1, so the
statistics are fixed numbers — no flake. A correlated pair (the bug
class: two decisions reading the same hash bits) produces a statistic
on the order of N (thousands); the p=0.001 critical values used here
are two orders of magnitude below that, so the margin is enormous in
both directions.

Also pins the exact salt/formula of each engine-independent decision
against a pure-Python (hashlib) model — a third engine beyond
Spark/DuckDB — so a formula edit that desyncs query from oracle shows
up even where the oracle would drift in lockstep.
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from k8e_fetch_spark.queries.text_ops import (
    _mix_frac_col,
    _split_col,
    _SPLIT_TRAIN_CEIL,
    _SPLIT_VAL_CEIL,
)

N = 6000  # planted key universe; statistics are deterministic in N

# chi-square critical values at p = 0.001 (far above any honest pair,
# far below the ~N statistic of a correlated pair)
_CHI2_CRIT = {1: 10.83, 2: 13.82, 3: 16.27, 4: 18.47, 5: 20.52, 6: 22.46}


def _chi2(a: np.ndarray, b: np.ndarray) -> tuple[float, int]:
    """Pearson chi-square statistic + dof for two categorical columns."""
    la, lb = np.unique(a), np.unique(b)
    obs = np.zeros((len(la), len(lb)))
    for i, va in enumerate(la):
        for j, vb in enumerate(lb):
            obs[i, j] = np.sum((a == va) & (b == vb))
    expected = obs.sum(axis=1, keepdims=True) * obs.sum(axis=0, keepdims=True) / obs.sum()
    stat = float(((obs - expected) ** 2 / expected).sum())
    return stat, (len(la) - 1) * (len(lb) - 1)


@pytest.fixture(scope="module")
def decisions(spark):
    """All hash decisions for doc_id 0..N-1, one narrow Spark job."""
    df = spark.range(N).withColumnRenamed("id", "doc_id").withColumn(
        "text", F.concat(F.lit("doc text number "), F.col("doc_id").cast("string"))
    )
    out = df.select(
        "doc_id",
        # 1. split assignment — owner of the raw-doc_id md5 domain
        _split_col().alias("split"),
        # 2. temperature/budget sampling keep — 'mix:'-salted md5 fraction
        (_mix_frac_col() < F.lit(0.5)).alias("mix_keep"),
        # 3. stratified membership — 'strata:'-salted md5 byte (en rate ~0.2)
        (
            F.substring(
                F.md5(F.concat(F.lit("strata:"), F.col("doc_id").cast("string"))), 1, 2
            )
            <= "33"
        ).alias("strata_keep"),
        # 4. bucket/partition placement — Spark Murmur3 (bucketBy, repartition)
        F.pmod(F.hash("doc_id"), F.lit(4)).alias("bucket"),
        # 5. shingle/MinHash identity family — xxhash64
        F.pmod(F.xxhash64("doc_id"), F.lit(2)).alias("xx_bit"),
        # 6. content fingerprint — md5 of normalized text (dedup keep-first key)
        (
            F.substring(F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")), 1, 1)
            < "8"
        ).alias("fp_bit"),
    ).toPandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_DECISIONS = ("split", "mix_keep", "strata_keep", "bucket", "xx_bit", "fp_bit")


@pytest.mark.parametrize("pair", list(itertools.combinations(_DECISIONS, 2)))
def test_pairwise_independence(decisions, pair):
    a = decisions[pair[0]].to_numpy()
    b = decisions[pair[1]].to_numpy()
    stat, dof = _chi2(a, b)
    crit = _CHI2_CRIT[dof]
    assert stat < crit, (
        f"hash decisions {pair[0]} × {pair[1]} are correlated: "
        f"chi2={stat:.1f} > crit(p=0.001, dof={dof})={crit} — "
        "two decisions are reading the same hash bits; re-salt one "
        "(see queries/text_ops.py domain-salt rationale)"
    )


def test_marginal_rates(decisions):
    """Each decision's keep-rate matches its design target (a correlated
    pair can hide behind correct marginals, but a wrong marginal means
    the ceiling constants drifted)."""
    split_rates = decisions["split"].value_counts(normalize=True)
    assert abs(split_rates["train"] - 0.795) < 0.02  # ceil 'cb' = 204/256
    assert abs(split_rates["val"] - 0.102) < 0.02  # 'e5'-'cb' = 26/256
    assert abs(decisions["mix_keep"].mean() - 0.5) < 0.02
    assert abs(decisions["strata_keep"].mean() - 0.203) < 0.02  # '33' = 52/256
    assert abs(decisions["fp_bit"].mean() - 0.5) < 0.02


def test_formulas_match_python_model(decisions):
    """Pin the engine-independent decisions to a pure-hashlib model.

    Spark and the DuckDB oracle share the SQL formula, so a desync
    there drifts in lockstep and oracle parity stays green; this third
    implementation catches a salt or ceiling edit that changes the
    semantics of persisted splits/samples (which must be stable across
    releases — they define which rows a trained model has seen)."""
    ids = decisions["doc_id"].to_numpy()

    def md5hex(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    split_model = []
    for i in ids:
        b = md5hex(str(i))[:2]
        split_model.append(
            "train" if b <= _SPLIT_TRAIN_CEIL else ("val" if b <= _SPLIT_VAL_CEIL else "test")
        )
    assert decisions["split"].tolist() == split_model

    mix_model = [int(md5hex(f"mix:{i}")[:8], 16) / 4294967296.0 < 0.5 for i in ids]
    assert decisions["mix_keep"].tolist() == mix_model

    strata_model = [md5hex(f"strata:{i}")[:2] <= "33" for i in ids]
    assert decisions["strata_keep"].tolist() == strata_model
