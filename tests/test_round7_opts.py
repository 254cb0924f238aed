"""Round-7 optimization internals.

The behavior of every touched operator is already pinned by the build/
serving/contract suites; these tests pin the NEW internal properties the
r7 optimizations introduced — the plan shapes (shuffle counts) and the
per-row sorted-run arithmetic — so a future refactor cannot silently
reintroduce the removed exchanges or break an edge case the fixtures
never exercise.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F

from mwmbl_spark.synth import synth_transcripts, with_doc_id


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_build_postings_is_shuffle_free(spark):
    from mwmbl_spark.operators.postings import (
        build_postings,
        build_postings_with_len,
    )

    t = with_doc_id(synth_transcripts(spark, n_conv=20, turns_per_conv=3, seed=9))
    assert "Exchange" not in _plan(build_postings(t))
    for inc in (False, True):
        df = build_postings_with_len(t, include_empty_docs=inc)
        assert "Exchange" not in _plan(df), inc
    # the POSITIONAL mode deliberately keeps the aggregation form (its
    # filters must push below the aggregation — see the r7 note in
    # build_postings_with_len); pin that so the trade stays conscious
    ppos = build_postings_with_len(t, positions=True)
    assert "Exchange" in _plan(ppos)


def test_per_row_postings_match_groupby_counts(spark):
    """The sorted-run tf/positions must equal the classic
    explode+groupBy aggregation, including multi-occurrence terms and
    an empty doc."""
    docs = spark.createDataFrame(
        [
            (1, "b a b a b"),
            (2, "a a a a"),
            (3, ""),
            (4, "solo"),
        ],
        "doc_id long, text string",
    )
    from mwmbl_spark.operators.postings import build_postings_with_len
    from mwmbl_spark.functions.tokenize import tokenize_expr

    got = {
        (r["term"], r["doc_id"]): (r["tf"], list(r["positions"]))
        for r in build_postings_with_len(docs, positions=True).collect()
    }
    want_rows = (
        docs.select("doc_id", F.posexplode(tokenize_expr(F.col("text"))).alias("p", "term"))
        .groupBy("term", "doc_id")
        .agg(F.sort_array(F.collect_list(F.col("p") + 1)).alias("positions"))
        .collect()
    )
    want = {
        (r["term"], r["doc_id"]): (len(r["positions"]), list(r["positions"]))
        for r in want_rows
    }
    assert got == want


def test_build_segments_single_exchange(spark):
    """The fused (bucket, salt) kernel must cluster raw postings with
    exactly ONE exchange — the former groupBy(term, salt) +
    repartition(bucket) pair moved every encoded row twice."""
    from mwmbl_spark.operators.postings import (
        build_postings_with_len,
        term_stats,
    )
    from mwmbl_spark.operators.segments import build_segments

    t = with_doc_id(synth_transcripts(spark, n_conv=20, turns_per_conv=3, seed=11))
    p = build_postings_with_len(t)
    segs = build_segments(p, None, term_stats(p), 60, 30.0, 16, 4)
    plan = _plan(segs)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "FlatMapGroupsInArrow" in plan, plan


def test_sorted_run_stats_edges(spark):
    """top/dup of the repetition fold on hand-checked arrays, including
    the all-equal and all-distinct extremes."""
    from mwmbl_spark.operators.repetition import _sorted_run_stats

    df = spark.createDataFrame(
        [(1, ["a", "a", "a"]), (2, ["a", "b", "c"]), (3, []),
         (4, ["a", "a", "b", "b", "c"])],
        "id long, g array<string>",
    )
    rows = {
        r["id"]: (r["s"]["top"], r["s"]["dup"])
        for r in df.select(
            "id", _sorted_run_stats(F.col("g")).alias("s")
        ).collect()
    }
    assert rows == {1: (3, 3), 2: (1, 0), 3: (0, 0), 4: (2, 4)}


def test_phrase_skip_decode_parity(spark):
    """ADVICE r6 #2: on tiny corpora the phrase kernel's block-skip
    branch never engages (cand*SKIP_FACTOR >= n_postings), so it was
    validated only at sf scale. skip_factor=0 forces the partial-decode
    path on ANY corpus; output must be identical to the full-decode
    default."""
    from mwmbl_spark.operators.positional import (
        phrase_topk,
        positional_postings,
    )
    from mwmbl_spark.operators.postings import (
        corpus_stats,
        doc_lengths,
        term_stats,
    )
    from mwmbl_spark.operators.segments import build_segments

    base = with_doc_id(
        synth_transcripts(spark, n_conv=30, turns_per_conv=3, seed=21)
    )
    # guarantee phrase occurrences: the synthetic token stream is
    # random, so inject the phrases into a slice of the docs
    t = base.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(" the spark data query extra")),
        ).otherwise(F.col("text")).alias("text"),
    )
    pp = positional_postings(t).localCheckpoint(eager=True)
    dl = doc_lengths(t)
    stats = term_stats(pp.select("term", "doc_id", "tf"))
    cs = corpus_stats(dl)
    segs = build_segments(
        pp, None, stats, cs.n_docs, cs.avg_doc_len,
        num_buckets=16, nsalt=2, positions_col="positions",
    ).localCheckpoint(eager=True)
    phrases = [(0, "the spark"), (1, "spark data query")]

    def rows(skip):
        out = phrase_topk(
            segs, stats, phrases, cs.n_docs, cs.avg_doc_len, k=10,
            num_buckets=16, skip_factor=skip,
        )
        return sorted(tuple(r) for r in out.collect())

    full = rows(10**9)   # always full decode
    skip = rows(0)       # always block-skip partial decode
    assert full == rows(4) == skip  # default factor included
    assert len(full) > 0


def test_bm25_tied_ranks_stable_across_partitionings(spark):
    """VERDICT r6 #1 (engine half): two documents with IDENTICAL text
    score exactly equal, and their tie-broken ranks must not depend on
    how the posting relation happens to be partitioned — the canonical
    ascending-term summation makes the unrounded float sum bit-stable,
    so the (score DESC, doc_id ASC) window resolves the tie identically
    under every layout."""
    from mwmbl_spark.operators.bm25 import bm25_topk
    from mwmbl_spark.operators.postings import (
        build_postings,
        corpus_stats,
        doc_lengths,
        term_stats,
    )

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon") for i in (7, 3, 11)]
        + [(5, "alpha beta unrelated filler words here"), (9, "gamma delta")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta epsilon")],
        "query_id long, query string",
    )
    base = None
    for n_part in (1, 2, 7, 31):
        p = build_postings(docs).repartition(n_part)
        dl = doc_lengths(docs)
        st = term_stats(p)
        cs = corpus_stats(dl)
        out = sorted(
            tuple(r)
            for r in bm25_topk(
                p, dl, st, q, cs.n_docs, cs.avg_doc_len, k=10
            ).collect()
        )
        if base is None:
            base = out
        assert out == base, n_part
    # the three identical docs are exact ties: ranks follow doc_id
    ranks = {
        r[1]: r[3] for r in base if r[0] == 0 and r[1] in (3, 7, 11)
    }
    assert ranks[3] < ranks[7] < ranks[11]


def test_bpe_regex_merge_matches_python_twin(spark):
    """Distributed (regexp-chain) batched BPE must stay merge-for-merge
    identical to the pure batched twin on a corpus engineered for
    overlapping/adjacent pair occurrences (the greedy resume-after
    semantics regression surface)."""
    from mwmbl_spark.operators.bpe import (
        _pure_bpe_batched,
        learn_bpe,
        word_counts,
    )

    docs = spark.createDataFrame(
        [(1, "aaaa aaab abab baba abba aab"), (2, "aaaa abab aaab aaab")],
        "doc_id long, text string",
    )
    wc = word_counts(docs)
    words = [(r["word"], int(r["n"])) for r in wc.collect()]
    want = _pure_bpe_batched(words, 12, 1, batch=3, candidates_per_round=64)
    got = learn_bpe(
        wc, n_merges=12, min_count=1, batch=3, driver_threshold=0,
        checkpoint_every=2,
    )
    assert got == want
