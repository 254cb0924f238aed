"""Distributed BPE vocabulary learning + subword encoding.

Byte-pair-encoding subword vocabularies (Sennrich et al. 2016,
arXiv:1508.07909) are the piece of a training-data pipeline that sits
between this repo's token counting (functions/text_quality.py — which
ESTIMATES token counts with a BPE-ish regex) and sequence packing
(operators/sampling.pack_sequences — which consumes real token budgets):
this module LEARNS the vocabulary and encodes with it. The reference
has no subword machinery at all (whitespace+punct tokenizer,
/root/reference/mwmbl/tokenizer.py).

Why this distributes cleanly: classic BPE never touches the corpus
after the first pass — it iterates on the WORD-FREQUENCY table. The
same economy is the scale story here:

- ``word_counts``: ONE corpus-wide shuffle (explode -> partial-agg'd
  count), output at vocabulary grain (~1e6-1e8 rows at 100 TB versus
  1e11+ token occurrences).
- ``learn_bpe``: every merge iteration touches only the word table —
  a JVM-side adjacent-pair explode + map-side-combined count, a
  deterministic top-1 (count desc, pair asc), and one Arrow-batched
  merge application. Lineage is cut with localCheckpoint every few
  rounds (the iterative-operator pattern shared with
  operators/pagerank.py and dedup.resolve_duplicate_groups).
  When the word table fits on the driver (it usually does even at
  large corpus scale — vocabulary grows ~sublinearly) an exact
  driver fast path runs the classic algorithm; both paths are
  tie-break-identical and parity-gated (tests/test_bpe.py).
- ``bpe_encode``: embarrassingly parallel — merge ranks broadcast,
  per-batch memoization over distinct tokens (Zipf makes the cache hit
  rate ~= 1), the standard lowest-rank-pair loop per novel token.

Determinism: the merge choice tie-breaks on (count desc, left asc,
right asc) in BOTH paths, so learned vocabularies are reproducible
run-to-run and cluster-size-independent (float-free integer counts).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mwmbl_spark.functions.tokenize import tokenize_pd

END_OF_WORD = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over the corpus — the only corpus-wide pass BPE needs.
    Same tokenizer as the index build (P1), so learned vocabularies
    describe exactly what the engine indexes."""
    return (
        docs.select(F.explode(tokenize_pd(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _merge_once(symbols: list, left: str, right: str, joined: str) -> list:
    """Greedy left-to-right single-pair merge (the classic semantics:
    'aaaa' under (a,a) -> ['aa','aa'], the leftmost pair wins and the
    scan resumes AFTER the merged symbol)."""
    out = []
    i = 0
    n = len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == left and symbols[i + 1] == right:
            out.append(joined)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def _pure_bpe(
    words: list[tuple[str, int]], n_merges: int, min_count: int
) -> list[tuple[str, str]]:
    """Classic driver-side BPE over a (word, count) list — the exact
    algorithm of Sennrich et al. 2016 fig. 1, with the deterministic
    (count desc, left asc, right asc) tie-break. Serves as the fast
    path of ``learn_bpe`` and the parity anchor for the distributed
    path."""
    seqs: list[tuple[list, int]] = [
        (list(w) + [END_OF_WORD], int(c)) for w, c in words
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in seqs:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (left, right), _ = best
        joined = left + right
        merges.append((left, right))
        seqs = [
            (_merge_once(s, left, right, joined) if left in s else s, c)
            for s, c in seqs
        ]
    return merges


def learn_bpe(
    words: DataFrame,
    n_merges: int = 200,
    min_count: int = 2,
    driver_threshold: int = 200_000,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a (word, n) table. Returns the
    ordered merge list.

    Path choice mirrors the upsert planner: when the word table is
    small enough to collect (``driver_threshold`` distinct words), the
    driver fast path avoids n_merges Spark jobs of pure scheduling
    overhead; above it, the distributed path keeps the table on
    executors — per iteration one adjacent-pair explode (JVM arrays_zip,
    weighted by word count, map-side combined) + a LIMIT-1 sort at the
    |pairs| grain + one Arrow-batched merge pass. Both paths produce
    IDENTICAL merges (integer counts, shared tie-break; parity-gated).
    """
    n_words = words.count()
    if n_words == 0:
        return []
    if n_words <= driver_threshold:
        rows = words.collect()
        return _pure_bpe(
            [(r["word"], int(r["n"])) for r in rows], n_merges, min_count
        )

    spark = words.sparkSession
    # split(word, "") can emit a trailing "" on some Spark/regex
    # combinations — filter defensively so no phantom symbol enters
    chars = F.filter(F.split(F.col("word"), ""), lambda x: x != F.lit(""))
    syms = words.select(
        F.concat(chars, F.array(F.lit(END_OF_WORD))).alias("symbols"),
        F.col("n").cast("long").alias("n"),
    ).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for it in range(n_merges):
        sz = F.size("symbols")
        pairs = (
            syms.where(sz >= 2)
            .select(
                F.slice("symbols", 1, sz - 1).alias("la"),
                F.slice("symbols", 2, sz - 1).alias("lb"),
                "n",
            )
            .select(F.explode(F.arrays_zip("la", "lb")).alias("p"), "n")
            .groupBy(F.col("p.la").alias("a"), F.col("p.lb").alias("b"))
            .agg(F.sum("n").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not top or int(top[0]["cnt"]) < min_count:
            break
        left, right = top[0]["a"], top[0]["b"]
        joined = left + right
        merges.append((left, right))

        def gen(batches, _l=left, _r=right, _j=joined):
            for pdf in batches:
                pdf["symbols"] = pdf["symbols"].map(
                    lambda s: _merge_once(list(s), _l, _r, _j)
                )
                yield pdf

        syms = syms.mapInPandas(gen, schema="symbols array<string>, n long")
        if (it + 1) % checkpoint_every == 0:
            syms = syms.localCheckpoint()  # cut the per-iteration lineage
    return merges


def merges_table(
    spark: SparkSession, merges: list[tuple[str, str]]
) -> DataFrame:
    """The learned vocabulary as a (rank, left, right) DataFrame — the
    persistable artifact (write it next to the index; ``bpe_encode``
    accepts the list form)."""
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank long, left string, right string",
    )


def _encode_token(tok: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """GPT-2-style encoding loop: repeatedly merge the LOWEST-RANK
    applicable pair — provably equivalent to replaying the merge list
    in order, but O(len * applicable-merges) instead of O(len * |V|)."""
    syms = list(tok) + [END_OF_WORD]
    while len(syms) >= 2:
        best_rank = None
        best_pair = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        syms = _merge_once(syms, best_pair[0], best_pair[1], best_pair[0] + best_pair[1])
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, subwords array<string>, n_subwords) — the EXACT token budget
    ``pack_sequences`` and context-length planning need (the regex
    estimator in text_quality stays for cheap filtering). Broadcast the
    rank map; per-batch memoization over distinct tokens makes the
    per-novel-token loop amortize to ~zero under Zipf.

    Each call creates one rank-map broadcast sized by |merges| (a batch
    op run once per corpus pass); a caller looping over many DataFrames
    with the SAME merges should hoist encoding into a single unioned
    pass rather than accumulate per-call broadcasts."""
    spark = docs.sparkSession
    b_ranks = spark.sparkContext.broadcast(
        {tuple(m): i for i, m in enumerate(merges)}
    )

    def gen(batches):
        ranks = b_ranks.value
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            subs = []
            for toks in pdf["__toks"]:
                row: list[str] = []
                for t in toks:
                    enc = cache.get(t)
                    if enc is None:
                        enc = _encode_token(t, ranks)
                        cache[t] = enc
                    row.extend(enc)
                subs.append(row)
            yield pd.DataFrame(
                {
                    "id": pdf["__id"],
                    "subwords": subs,
                    "n_subwords": [len(s) for s in subs],
                }
            )

    prepared = docs.select(
        F.col(id_col).alias("__id"), tokenize_pd(F.col(text_col)).alias("__toks")
    )
    out = prepared.mapInPandas(
        gen, schema="id long, subwords array<string>, n_subwords long"
    )
    return out.select(
        F.col("id").alias(id_col), "subwords", "n_subwords"
    )
