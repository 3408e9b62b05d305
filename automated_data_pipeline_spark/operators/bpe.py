"""Distributed BPE tokenizer training (Sennrich et al. 2016) and
application — the learn-the-vocabulary half of the tokenizer story
(token_count_bpeish in functions/text.py is the apply-a-heuristic
half).

Industrial BPE trainers all share one shape: collapse the corpus to a
(distinct word, frequency) table — orders of magnitude smaller than the
corpus under Zipf's law — then iterate merges over that compact table.
Here BOTH halves are Spark-native:

- the corpus -> word-frequency collapse is one explode + groupBy
  (map-side partials; raw text never shuffles twice);
- each merge round is a pair-explode + count + take-1 over the word
  table, with the chosen merge applied by a pure-expression array fold
  (no Python in the loop). Lineage is truncated with localCheckpoint
  every few rounds, the same discipline as connected components.

Determinism: the winning pair each round is (max frequency, then
lexicographically smallest pair) — fully reproducible, and pinned
against a from-scratch pure-Python reference implementation in
tests/test_bpe.py.

At 100 TB: the word table for a multi-TB text corpus is typically
10^6-10^8 rows (fits one executor's shuffle partition comfortably);
rounds cost seconds each. If even that is too slow for a large merge
budget, the standard move is training the merges on a uniform sample —
the operator takes any DataFrame, so pass ``df.sample(...)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker (classic BPE)


def _py_words(text: str) -> list[str]:
    r"""Driver/Python twin of functions.text.tokens: lowercase + split
    on ASCII whitespace (Java regex \s is ASCII-only, so re.ASCII
    here keeps the reference implementation and the tokenize path on
    EXACTLY the word boundaries the distributed trainer used — a
    Unicode-aware str.split() would split on U+00A0 etc. and learned
    merges would never apply to those words)."""
    import re

    return [w for w in re.split(r"\s+", (text or "").lower(), flags=re.ASCII) if w]


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, freq) — the compact table BPE trains on.

    Round-robin spread before the explode: tokenize is the CPU-heavy
    step and a few-row-group corpus file would serialize it through a
    handful of scan tasks (AQE cannot split a scan's partitioning);
    the downstream word groupBy re-shuffles anyway, so the extra
    exchange costs only the narrow text rows."""
    from ..functions import text as TX

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartition(par)
        .select(F.explode(TX.tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(word_col) -> "F.Column":
    """Split a word into single-character symbols + the end marker.

    The explicit empty-string filter pins the contract independent of
    ``split(word, '')`` version behavior (whether it emits leading/
    trailing empty elements has varied across Spark releases); without
    it a drift would silently diverge from the DuckDB oracle's
    substring-based pairing."""
    chars = F.filter(F.split(word_col, ""), lambda x: x != F.lit(""))
    return F.concat(chars, F.array(F.lit(END)))


def _apply_merge(syms_col, a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) occurrences, as a
    pure-expression fold: walk the symbol array, replacing the last
    accumulated symbol when it is `a` and the incoming one is `b`.
    Matches the reference implementation's scan order (an 'a a a' run
    with merge (a,a) becomes ['aa','a'])."""
    merged = a + b

    def step(acc, x):
        can = (F.size(acc) > 0) & (F.element_at(acc, -1) == F.lit(a)) & (
            x == F.lit(b)
        )
        return F.when(
            can,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(
        syms_col, F.array().cast("array<string>"), step
    )


def initial_pair_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Round-0 adjacent-symbol pair counts over the word-frequency
    table — exactly the table ``bpe_train`` ranks to choose its FIRST
    merge (single chars + the end marker; counts weighted by word
    frequency). Exposed standalone because, unlike the iterative merge
    fold, this is plain relational algebra a SQL oracle can replay —
    the suite's driver-visible witness for the trainer's core pair-
    counting machinery (the fold itself stays pinned by
    tests/test_bpe.py against the pure-Python reference)."""
    words = word_frequencies(df, text_col).select(
        _initial_symbols(F.col("word")).alias("syms"), "freq"
    )
    pair_ix = F.explode(F.sequence(F.lit(1), F.size("syms") - 1)).alias("i")
    return (
        words.filter(F.size("syms") >= 2)
        .select("freq", "syms", pair_ix)
        .select(
            F.element_at("syms", F.col("i")).alias("left_sym"),
            F.element_at("syms", F.col("i") + 1).alias("right_sym"),
            "freq",
        )
        .groupBy("left_sym", "right_sym")
        .agg(F.sum("freq").cast("bigint").alias("pair_freq"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_freq: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the merge
    table [(left, right, pair_freq)] in training order. Stops early
    when the best pair's frequency falls below ``min_freq``."""
    words = word_frequencies(df, text_col).select(
        _initial_symbols(F.col("word")).alias("syms"), "freq"
    )
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    # only size>=2 rows reach the explode (filtered below); sequence(1, 0)
    # in Spark is DESCENDING [1, 0], not empty, so no expression-level
    # guard can substitute for that filter
    pair_ix = F.explode(F.sequence(F.lit(1), F.size("syms") - 1)).alias("i")
    for r in range(n_merges):
        pairs = (
            words.filter(F.size("syms") >= 2)
            .select("freq", "syms", pair_ix)
            .select(
                F.element_at("syms", F.col("i")).alias("a"),
                F.element_at("syms", F.col("i") + 1).alias("b"),
                "freq",
            )
            .groupBy("a", "b")
            .agg(F.sum("freq").alias("n"))
        )
        # single-aggregate argmin instead of a global sort + limit(1):
        # min over struct(-n, a, b) picks (max freq, then lexicographically
        # smallest pair) — the same winner with the same tie-break — as a
        # partial+final aggregation (32 partial rows cross the exchange)
        # rather than a full shuffle sort per round
        top = pairs.agg(
            F.min(
                F.struct(
                    (-F.col("n")).alias("_negn"), F.col("a"), F.col("b")
                )
            ).alias("t")
        ).first()["t"]
        if top is None or -top["_negn"] < min_freq:
            break
        a, b, n = top["a"], top["b"], int(-top["_negn"])
        merges.append((a, b, n))
        words = words.select(
            _apply_merge(F.col("syms"), a, b).alias("syms"), "freq"
        )
        # truncate the per-round fold lineage, or round R replays R
        # folds over the original table
        if (r + 1) % checkpoint_every == 0:
            words = words.localCheckpoint(eager=True)
    return merges


def bpe_train_py(texts, n_merges: int = 50, min_freq: int = 2):
    """From-scratch pure-Python reference (same semantics, same tie
    break) used by tests to pin the distributed trainer. O(vocab *
    merges) — fixture scale only."""
    from collections import Counter

    freqs = Counter()
    for t in texts:
        for w in _py_words(t):
            freqs[w] += 1
    words = {w: list(w) + [END] for w in freqs}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in words.items():
            f = freqs[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < min_freq:
            break
        merges.append((a, b, n))
        for w, syms in words.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            words[w] = out
    return merges


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge table to the corpus: per document, the BPE
    token array and count. Arrow-batched Pandas execution with the
    merge list broadcast in the closure — applying M merges as M nested
    column folds would generate an M-deep codegen tree, so past a few
    merges the batched-Python path is the faster AND clearer one (same
    trade-off as the PQ literal-vs-join encode)."""
    import pandas as pd

    ranked = {(a, b): i for i, (a, b, _) in enumerate(merges)}

    def tokenize_word(word: str) -> list[str]:
        syms = list(word) + [END]
        # classic BPE apply: repeatedly merge the lowest-rank pair
        while len(syms) >= 2:
            best, best_rank = None, None
            for i in range(len(syms) - 1):
                r = ranked.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = (syms[i], syms[i + 1]), r
            if best is None:
                break
            a, b = best
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            syms = out
        return syms

    def run(batches):
        cache: dict[str, list[str]] = {}

        def cached(w: str) -> list[str]:
            # Zipf: a few thousand distinct words cover most of the
            # stream — tokenize each distinct word once per task
            got = cache.get(w)
            if got is None:
                got = cache[w] = tokenize_word(w)
            return got

        for pdf in batches:
            toks = [
                [t for w in _py_words(txt) for t in cached(w)]
                for txt in pdf["text"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "bpe_tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    src = df.selectExpr(f"{id_col} as doc_id", f"{text_col} as text")
    return src.mapInPandas(
        run, schema="doc_id long, bpe_tokens array<string>, n_tokens long"
    )
