#!/usr/bin/env python
"""Deep-vocabulary BPE training probe (SCALE.md evidence, r10).

The fixture corpus tops out at 31 unique words / 89 possible merges,
which cannot exercise a production-depth merge table. This probe
synthesizes a deterministic wide-vocab corpus IN SPARK (200k unique
base-36 words over a 2M-token corpus — Zipf-free worst case: every
word near-equally frequent, so the pair-stats stay dense), then trains
a 4096-merge table and reports wall time and Spark job count.

The claim under test: with the r10 local trainer, job count is
INDEPENDENT of n_merges (one bounded vocab CollectLimit + one
createDataFrame), so a 32k-merge production vocabulary costs the same
two jobs — vs ~3 jobs/merge (~100k driver round trips) for the
distributed per-iteration twin. Driver-side training cost scales with
unique-vocab size (Heaps-bounded), not corpus size.

    python scripts/bpe_scale_probe.py [n_words] [n_tokens] [n_merges]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from k8e_fetch_spark.operators.bpe import learn_bpe_merges  # noqa: E402
from k8e_fetch_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_words = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_tokens = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    n_merges = int(sys.argv[3]) if len(sys.argv) > 3 else 4096

    spark = get_spark(app_name="bpe-scale-probe")
    docs = spark.range(n_tokens).select(
        F.conv((F.col("id") % n_words).cast("string"), 10, 36).alias("text")
    )
    sc = spark.sparkContext
    sc.setJobGroup("bpe-probe", "bpe-probe")
    t0 = time.perf_counter()
    merges, vocab = learn_bpe_merges(docs, text_col="text", n_merges=n_merges)
    n_vocab = vocab.count()  # one extra job, OUTSIDE the trainer claim
    wall = time.perf_counter() - t0
    jobs = sc.statusTracker().getJobIdsForGroup("bpe-probe")
    print(
        f"words={n_words} tokens={n_tokens} merges_requested={n_merges} "
        f"merges_learned={len(merges)} vocab_rows={n_vocab} "
        f"wall={wall:.2f}s spark_jobs={len(jobs or [])} "
        f"(incl. 1 vocab-count job outside the trainer)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
