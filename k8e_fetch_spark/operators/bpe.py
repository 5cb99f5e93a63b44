"""BPE tokenizer-training kernel (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") — the
vocabulary-induction modality of the LLM-pipeline surface: learn the
first N byte-pair merges from a corpus, distributed.

Production trainers (the standard subword-tokenizer implementations)
all share one shape, and it is the shape this operator keeps:

  1. ONE corpus-wide pass builds the word-frequency table — a
     map-side-combined count aggregate on uniform word keys. This is
     the only shuffle that ever touches corpus-sized data.
  2. Every merge iteration runs on the BOUNDED vocabulary (unique
     words grow ~ corpus^beta, beta < 1 — Heaps' law; a 100 TB web
     corpus has a vocab in the tens of millions, a few GB), never on
     the corpus: adjacent-symbol pair counts are a vocab-local
     aggregate weighted by word frequency, the argmax pair is a
     ONE-row collect (O(1) driver state per merge, the same
     documented-collect contract as the k-means centroid loop), and
     applying the merge is a row-local fold over each vocab entry.

Greedy merge semantics: a word's symbol sequence is scanned left to
right; every non-overlapping (p1, p2) adjacency merges, and a symbol
just produced by this round's merge does NOT immediately re-merge as
a new p1 unless the merged string itself equals p1 (impossible while
p2 is non-empty). The fold encodes exactly that: the accumulator is
the space-joined symbol string, and an incoming x == p2 fuses onto the
accumulator iff the accumulator's LAST symbol is exactly p1 — which is
false for a symbol the merge just created, because p1 || p2 != p1.
The same fold is expressed verbatim in the DuckDB oracle
(``list_reduce`` with the identical CASE), so cross-engine agreement
is by construction, including the back-to-back run case ("aaaa" with
pair (a,a) -> [aa, aa]) where naive string replace under-merges.

Ties: the argmax pair breaks (count desc, pair asc) — ASCII-ordered on
both engines for this corpus's alphanumeric symbols.

Reference parity note: the k8e-fetch reference (bash/sed ingest
pipeline) has no tokenizer stage; this operator is part of the
mandated LLM-training-data extension surface (SURVEY.md §2.6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_frequency_vocab(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over whitespace tokens — the single corpus-wide
    shuffle of BPE training (map-side-combined count on uniform word
    keys)."""
    return (
        df.select(F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_fold(p1: str, p2: str) -> Column:
    """Row-local greedy application of merge (p1, p2) to the
    space-joined symbol string in column ``sym`` (see module docstring
    for the exact-semantics argument)."""
    n1 = len(p1)

    def step(acc: Column, x: Column) -> Column:
        last_is_p1 = (acc == F.lit(p1)) | (
            F.substring(acc, -(n1 + 1), n1 + 1) == F.lit(" " + p1)
        )
        return (
            F.when(acc == F.lit(""), x)
            .when(last_is_p1 & (x == F.lit(p2)), F.concat(acc, x))
            .otherwise(F.concat(acc, F.lit(" "), x))
        )

    return F.aggregate(F.split(F.col("sym"), " "), F.lit(""), step)


def _learn_merges_local(
    word_freqs: list[tuple[str, int]], n_merges: int
) -> tuple[list[tuple[int, str, int]], list[tuple[str, int]]]:
    """Driver-local BPE training over a collected (word, freq) vocab —
    the SAME algorithm the distributed loop runs, step for step:
    count every adjacent symbol pair weighted by word frequency
    (overlapping adjacencies included, exactly like the distributed
    ``transform`` enumeration), take the (count desc, "p1 p2" asc)
    argmax, apply the greedy left-to-right non-overlapping fold (the
    identical imperative loop :func:`bpe_tokenize_arrow` pins against
    the expression fold), repeat. Integer counts and byte-identical
    tie-breaks mean the merge list and final vocab match the
    distributed loop EXACTLY, not approximately (pinned in
    tests/test_bpe.py).

    Efficiency is the standard trainer's: a pair->count stats dict
    with a lazy max-heap (stale entries skipped on pop) and a
    pair->word index so each merge touches only the words containing
    the merged pair — per merge O(affected words x word length), not
    O(vocab).

    Symbolization parity note (ADVICE r10): ``list(w)`` yields Python
    code points. That matches the distributed twin because Spark's
    ``split(w, '')`` runs on UTF8String and ALSO yields whole code
    points outside the BMP (probed: 'a😀b' -> 3 units on this Spark
    version, not 4 UTF-16 code units), and tie-breaks agree because
    UTF-8 byte order (JVM string compare) equals code-point order
    (Python compare). Pinned end to end on a non-BMP corpus in
    tests/test_bpe.py::test_local_trainer_matches_distributed_on_non_bmp.

    Returns (merges, symbolized vocab as [(space-joined sym, freq)])."""
    import heapq

    words: list[list[str]] = [list(w) for w, _ in word_freqs]
    freqs: list[int] = [int(f) for _, f in word_freqs]
    stats: dict[str, int] = {}
    where: dict[str, set[int]] = {}

    def _pairs_of(syms: list[str]) -> list[str]:
        return [syms[i] + " " + syms[i + 1] for i in range(len(syms) - 1)]

    for idx, syms in enumerate(words):
        f = freqs[idx]
        for p in _pairs_of(syms):
            stats[p] = stats.get(p, 0) + f
            where.setdefault(p, set()).add(idx)

    heap: list[tuple[int, str]] = [(-c, p) for p, c in stats.items()]
    heapq.heapify(heap)
    merges: list[tuple[int, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = None
        while heap:
            negc, p = heap[0]
            cur = stats.get(p)
            if cur is None or -negc != cur:
                heapq.heappop(heap)  # stale entry
                continue
            best = (p, cur)
            break
        if best is None:
            break
        p, cnt = best
        p1, p2 = p.split(" ")
        merged = p1 + p2
        merges.append((rank, p, cnt))
        for idx in sorted(where.get(p, ())):
            syms, f = words[idx], freqs[idx]
            for old in _pairs_of(syms):
                stats[old] -= f
                if stats[old] <= 0:
                    del stats[old]
                else:
                    # DECREASED counts need a fresh heap entry too: the
                    # only existing entries carry the higher count and
                    # the lazy pop would discard them as stale, making
                    # the pair unselectable forever (a merge removes its
                    # neighbors' adjacencies, so decreases are routine —
                    # the classic lazy-heap decrease bug)
                    heapq.heappush(heap, (-stats[old], old))
                s = where.get(old)
                if s is not None:
                    s.discard(idx)
                    if not s:
                        del where[old]
            out: list[str] = []
            for s in syms:
                if out and out[-1] == p1 and s == p2:
                    out[-1] = merged
                else:
                    out.append(s)
            words[idx] = out
            for new in _pairs_of(out):
                stats[new] = stats.get(new, 0) + f
                where.setdefault(new, set()).add(idx)
                heapq.heappush(heap, (-stats[new], new))
        # dropped pairs leave stale heap entries; the lazy pop skips them
    final_vocab = [
        (" ".join(syms), freqs[i]) for i, syms in enumerate(words)
    ]
    return merges, final_vocab


def learn_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 3,
    local_vocab_threshold: int = 1 << 20,
) -> tuple[list[tuple[int, str, int]], DataFrame]:
    """Learn the first ``n_merges`` BPE merges from the corpus.

    Returns (merges, symbolized_vocab): ``merges`` is
    [(rank 1-based, "p1 p2", pair_frequency_at_merge_time)], and
    ``symbolized_vocab`` is the (sym, freq) DataFrame after all merges
    (``sym`` = space-joined symbols). Deterministic: pair argmax ties
    break (count desc, pair asc).

    Job-count scaling (r10): the per-iteration loop below is correct
    and vocab-bounded, but it costs ~3 Spark jobs PER MERGE — fine for
    a demo's 3 merges, a ~100k-driver-round-trip wall for a production
    32k-merge vocabulary. Heaps' law bounds the unique-word vocab far
    below corpus size (tens of millions of rows for a 100 TB web
    corpus), so the standard production shape is: ONE corpus-wide
    word-count shuffle, collect the vocab, train every merge locally
    (:func:`_learn_merges_local` — the identical algorithm, pinned
    merge-for-merge in tests/test_bpe.py). Below
    ``local_vocab_threshold`` unique words that is what this does —
    total jobs: one bounded CollectLimit probe + one createDataFrame,
    INDEPENDENT of n_merges. Above it (or with the threshold forced to
    0) the distributed per-iteration loop runs unchanged; a vocab too
    large to collect can also be frequency-floored first (standard
    practice) to fit.
    """
    from k8e_fetch_spark.functions.caching import persist_scoped

    if local_vocab_threshold > 0:
        probe = (
            word_frequency_vocab(df, text_col)
            .limit(local_vocab_threshold + 1)
            .collect()
        )
        if len(probe) <= local_vocab_threshold:
            word_freqs = sorted((r["w"], int(r["freq"])) for r in probe)
            merges, final_vocab = _learn_merges_local(word_freqs, n_merges)
            vocab_df = df.sparkSession.createDataFrame(
                final_vocab or [("", 0)], "sym string, freq bigint"
            )
            if not final_vocab:
                vocab_df = vocab_df.filter(F.lit(False))
            return merges, vocab_df

    # ALTERNATING scope keys: iteration i's vocab derives from
    # iteration i-1's cached frame, so evicting i-1 when persisting i
    # (single-key form) would force the whole lineage — including the
    # corpus-wide word count — to recompute at i's first action.
    # Alternating keys evict the GRANDPARENT instead, which is exactly
    # when it stops being referenced (measured 3.2 -> 1.1 s at sf0.1).
    vocab = persist_scoped(
        "bpe.vocab.even",
        word_frequency_vocab(df, text_col).select(
            F.concat_ws(" ", F.split(F.col("w"), "")).alias("sym"), "freq"
        ),
    )
    merges: list[tuple[int, str, int]] = []
    for rank in range(1, n_merges + 1):
        s = F.split(F.col("sym"), " ")
        pairs = F.transform(
            F.sequence(F.lit(0), F.size(s) - 2),
            lambda i: F.concat(
                F.element_at(s, i + 1), F.lit(" "), F.element_at(s, i + 2)
            ),
        )
        top = (
            vocab.filter(F.size(s) >= 2)
            .select(F.explode(pairs).alias("p"), "freq")
            .groupBy("p")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("p"))
            .limit(1)
            .collect()
        )
        if not top:  # no word has two symbols left — nothing to merge
            break
        p, cnt = top[0]["p"], int(top[0]["cnt"])
        p1, p2 = p.split(" ")
        merges.append((rank, p, cnt))
        vocab = persist_scoped(
            "bpe.vocab." + ("odd" if rank % 2 else "even"),
            vocab.select(_merge_fold(p1, p2).alias("sym"), "freq"),
        )
    return merges, vocab


def symbol_counts(vocab: DataFrame) -> DataFrame:
    """(symbol, count) over the symbolized vocab, frequency-weighted —
    the post-merge symbol inventory (vocab-local aggregate)."""
    return (
        vocab.select(F.explode(F.split(F.col("sym"), " ")).alias("t"), "freq")
        .groupBy("t")
        .agg(F.sum("freq").alias("cnt"))
    )


def apply_merges_to_word(word: Column, merges: list[str]) -> Column:
    """Tokenize one word with a learned merge table: symbolize to
    characters, then apply each merge's greedy fold in rank order.
    Returns the space-joined token string — a pure row-local
    expression (the inference half of BPE: scan-local at any corpus
    size once the merge table is learned).

    ``merges`` is the ordered ["p1 p2", ...] pair list from
    :func:`learn_bpe_merges`."""
    def make_step(p1: str, p2: str):
        # factory, not default args: pyspark's higher-order-function
        # introspection counts EVERY parameter of the lambda
        n1 = len(p1)

        def step(acc: Column, x: Column) -> Column:
            last_is_p1 = (acc == F.lit(p1)) | (
                F.substring(acc, -(n1 + 1), n1 + 1) == F.lit(" " + p1)
            )
            return (
                F.when(acc == F.lit(""), x)
                .when(last_is_p1 & (x == F.lit(p2)), F.concat(acc, x))
                .otherwise(F.concat(acc, F.lit(" "), x))
            )

        return step

    sym = F.concat_ws(" ", F.split(word, ""))
    for pair in merges:
        p1, p2 = pair.split(" ")
        sym = F.aggregate(F.split(sym, " "), F.lit(""), make_step(p1, p2))
    return sym


def bpe_tokenize_arrow(merges: list[str]) -> Column:
    """Arrow-batched BPE tokenization with a unique-word cache — the
    inference hot path (the expression twin,
    :func:`apply_merges_to_word` inside a per-word ``transform``, is
    an interpreted HOF fold per character: ~11 s for 5k docs at sf0.1;
    this path is ~20x that throughput and is how production tokenizers
    run — Zipf's law makes the word cache hit almost always).

    Semantics are the SAME greedy fold, written imperatively: per
    learned merge in rank order, scan the symbol list left to right
    and fuse s[i]==p1, s[i+1]==p2 non-overlapping (a symbol created by
    this round's merge never immediately re-fuses as p1, because
    p1+p2 != p1). Pinned output-identical to the expression twin in
    tests/test_bpe.py. Tokens join with single spaces; the word split
    is the same \\s+ rule as the training vocab.

    Returns a function of the text column -> space-joined token
    string ('' for all-whitespace text)."""
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    pairs = [tuple(p.split(" ")) for p in merges]
    ws = re.compile(r"\s+")

    def _tok(texts):
        cache: dict[str, str] = {}

        def tok_word(w: str) -> str:
            hit = cache.get(w)
            if hit is not None:
                return hit
            syms = list(w)
            for p1, p2 in pairs:
                out: list[str] = []
                for s in syms:
                    if out and out[-1] == p1 and s == p2:
                        out[-1] = p1 + p2
                    else:
                        out.append(s)
                syms = out
            r = " ".join(syms)
            cache[w] = r
            return r

        def tok_doc(t: str | None) -> str:
            # None -> '' matches the expression twin (concat_ws skips
            # the null transform result)
            if t is None:
                return ""
            t = t.strip()
            if not t:
                return ""
            return " ".join(tok_word(w) for w in ws.split(t))

        return texts.map(tok_doc)

    _tok.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(_tok, "string")
