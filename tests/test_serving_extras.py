"""Round-6 serving extras: snippets, facets, passages, more-like-this.

Each test pins the operator's semantics on a hand-checkable corpus
(the sf-scale twin-oracle gate lives in the driver contracts; these
fix the edge cases a 60-row contract can miss)."""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F

from mwmbl_spark.operators.facets import facet_counts
from mwmbl_spark.operators.mlt import mlt_terms, more_like_this
from mwmbl_spark.operators.passages import build_passages
from mwmbl_spark.operators.snippets import best_window_snippets


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_snippet_picks_densest_window(spark):
    # doc 1: both terms cluster at the tail — the window must skip the
    # early lone hit and start at the covering position
    docs = _docs(
        spark,
        [
            (1, "alpha x x x x x x x x x alpha beta"),
            (2, "beta only here"),
        ],
    )
    queries = spark.createDataFrame(
        [(0, "alpha beta")], "query_id long, query string"
    )
    cands = spark.createDataFrame(
        [(0, 1), (0, 2)], "query_id long, doc_id long"
    )
    out = {
        r["doc_id"]: r
        for r in best_window_snippets(
            cands, docs, queries, window=4
        ).collect()
    }
    # doc 1: window [11,14] covers alpha(11), beta(12) -> 2 distinct
    assert out[1]["start"] == 11
    assert out[1]["n_distinct"] == 2
    assert out[1]["n_hits"] == 2
    assert out[1]["snippet"] == "alpha beta"
    # doc 2: single hit at 1
    assert out[2]["start"] == 1
    assert out[2]["n_distinct"] == 1
    assert out[2]["snippet"] == "beta only here"


def test_snippet_tie_breaks_earliest_start(spark):
    # two windows with identical (n_distinct, n_hits): earliest wins
    docs = _docs(spark, [(1, "alpha x x x x x x alpha")])
    queries = spark.createDataFrame(
        [(0, "alpha")], "query_id long, query string"
    )
    cands = spark.createDataFrame([(0, 1)], "query_id long, doc_id long")
    row = best_window_snippets(cands, docs, queries, window=3).collect()[0]
    assert row["start"] == 1 and row["n_hits"] == 1


def test_snippet_window_clamps_at_doc_end(spark):
    docs = _docs(spark, [(1, "x x alpha")])
    queries = spark.createDataFrame(
        [(0, "alpha")], "query_id long, query string"
    )
    cands = spark.createDataFrame([(0, 1)], "query_id long, doc_id long")
    row = best_window_snippets(cands, docs, queries, window=5).collect()[0]
    assert row["start"] == 3
    assert row["snippet"] == "alpha"  # slice clamps past the end


def test_facet_counts_dedupes_and_counts_nulls(spark):
    docs = spark.createDataFrame(
        [(1, "en", "web"), (2, "en", None), (3, "de", "web")],
        "doc_id long, lang string, source string",
    )
    # doc 1 appears twice in the candidate relation -> counts once
    cands = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 2), (0, 3)], "query_id long, doc_id long"
    ).distinct()
    got = {
        (r["facet"], r["value"]): r["n_docs"]
        for r in facet_counts(cands, docs, ["lang", "source"]).collect()
    }
    assert got[("lang", "en")] == 2
    assert got[("lang", "de")] == 1
    assert got[("source", "web")] == 2
    assert got[("source", None)] == 1


def test_facet_top_n_truncation(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i < 5 else "de") for i in range(7)],
        "doc_id long, lang string",
    )
    cands = spark.createDataFrame(
        [(0, i) for i in range(7)], "query_id long, doc_id long"
    )
    rows = facet_counts(cands, docs, ["lang"], top_n=1).collect()
    assert len(rows) == 1 and rows[0]["value"] == "en" and rows[0]["n_docs"] == 5


def test_build_passages_windows_and_empty_doc(spark):
    docs = _docs(spark, [(2, "a b c d e"), (3, "   ")])
    got = {
        r["doc_id"]: r["text"]
        for r in build_passages(
            docs, window=3, stride=2, pid_offset=100
        ).collect()
    }
    # doc 2, len 5 -> starts 1, 3, 5
    assert got[201] == "a b c"
    assert got[203] == "c d e"
    assert got[205] == "e"
    # whitespace-only doc still yields one empty passage at start 1
    assert got[301] == ""
    assert set(got) == {201, 203, 205, 301}


def test_passages_struct_ids_survive_hash_id_space(spark):
    # packed ids overflow for hash-shaped 64-bit doc ids (ANSI mode
    # aborts); the struct form must run the full BM25 stack unchanged
    from mwmbl_spark.operators import bm25 as bm25_ops
    from mwmbl_spark.operators import postings as post_ops

    big = 4341024887563878401  # a real xxhash-shaped id
    docs = _docs(
        spark, [(big, "alpha beta gamma delta"), (7, "alpha zeta")]
    )
    pas = build_passages(docs, window=2, stride=2, packed=False)
    p = post_ops.build_postings(pas)
    dl = post_ops.doc_lengths(pas)
    st = post_ops.term_stats(p)
    cs = post_ops.corpus_stats(dl)
    q = spark.createDataFrame([(0, "alpha")], "query_id long, query string")
    rows = bm25_ops.bm25_topk(
        p, dl, st, q, cs.n_docs, cs.avg_doc_len, k=5
    ).collect()
    got = {(r["doc_id"]["doc_id"], r["doc_id"]["start"]) for r in rows}
    assert got == {(big, 1), (7, 1)}
    # tie-break: struct asc == (doc_id, start) asc
    assert [r["doc_id"]["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])] == [7, big]


def test_passage_roundtrip_tokens(spark):
    # re-tokenizing a passage reproduces the token slice exactly
    from mwmbl_spark.functions.tokenize import tokenize_py

    docs = _docs(spark, [(1, "The  QUICK   brown fox jumps")])
    rows = build_passages(docs, window=2, stride=2, pid_offset=100).collect()
    toks = tokenize_py("The  QUICK   brown fox jumps")
    for r in rows:
        start = r["doc_id"] % 100
        assert tokenize_py(r["text"]) == toks[start - 1 : start + 1]


def test_serving_extras_plan_quality(spark):
    # scale guards: query-side tables broadcast, arg-max windows take
    # the map-side group limit, and the hit self-join stays an
    # equi-join on (query, doc) — never a cartesian/BNLJ
    from mwmbl_spark.operators import bm25 as bm25_ops
    from mwmbl_spark.operators import postings as post_ops
    from mwmbl_spark.synth import synth_transcripts, with_doc_id

    t = with_doc_id(synth_transcripts(spark, n_conv=30, turns_per_conv=4, seed=5))
    p = post_ops.build_postings(t)
    dl = post_ops.doc_lengths(t)
    st = post_ops.term_stats(p)
    cs = post_ops.corpus_stats(dl)
    q = spark.createDataFrame(
        [(0, "the spark data query")], "query_id long, query string"
    )
    top = bm25_ops.bm25_topk(
        p, dl, st, q, cs.n_docs, cs.avg_doc_len, k=10
    ).select("query_id", "doc_id", "score", "rank")

    splan = _explain(best_window_snippets(top, t, q, window=8))
    assert "BroadcastHashJoin" in splan
    assert "WindowGroupLimit" in splan  # best-window arg-max is rn==1
    assert "CartesianProduct" not in splan
    assert "BroadcastNestedLoopJoin" not in splan

    meta = t.select("doc_id", F.substring("text", 1, 1).alias("lang"))
    fplan = _explain(facet_counts(top.select("query_id", "doc_id"), meta, ["lang"]))
    assert "Generate" in fplan  # JVM explode melt, no UDF
    assert "BatchEvalPython" not in fplan and "ArrowEvalPython" not in fplan

    src = spark.createDataFrame([(1,)], "src_doc_id long")
    mplan = _explain(
        more_like_this(src, p, dl, st, cs.n_docs, cs.avg_doc_len, top_terms=5, k=10)
    )
    assert "BroadcastHashJoin" in mplan
    assert "WindowGroupLimit" in mplan
    assert "CartesianProduct" not in mplan
    assert "BroadcastNestedLoopJoin" not in mplan


def test_mlt_terms_prefers_rare_terms(spark):
    # 'rare' (df=1) outranks 'common' (df=3) at equal tf; idf=ln(N/df)
    docs = _docs(
        spark,
        [
            (1, "rare common extra1"),
            (2, "common extra2 extra3"),
            (3, "common extra4 extra5"),
        ],
    )
    from mwmbl_spark.operators import postings as post_ops

    p = post_ops.build_postings(docs)
    stats = post_ops.term_stats(p)
    src = spark.createDataFrame([(1,)], "src_doc_id long")
    terms = [
        r["term"]
        for r in mlt_terms(src, p, stats, n_docs=3, top_terms=2).collect()
    ]
    assert set(terms) == {"rare", "extra1"}  # both df=1, beat 'common'


def test_more_like_this_wand_matches_exhaustive(spark):
    # the index-served form must reproduce the exhaustive ranking
    # (scores to 1e-9 rank-by-rank; doc ids may swap only on exact
    # float ties — same convention as the WAND/bm25 identity gate)
    from mwmbl_spark.operators import bm25 as bm25_ops  # noqa: F401
    from mwmbl_spark.operators import postings as post_ops
    from mwmbl_spark.operators.mlt import more_like_this_wand
    from mwmbl_spark.operators.segments import build_segments
    from mwmbl_spark.synth import synth_transcripts, with_doc_id

    t = with_doc_id(synth_transcripts(spark, n_conv=40, turns_per_conv=4, seed=11))
    p = post_ops.build_postings(t)
    dl = post_ops.doc_lengths(t)
    st = post_ops.term_stats(p)
    cs = post_ops.corpus_stats(dl)
    segs = build_segments(p, dl, st, cs.n_docs, cs.avg_doc_len, 32, 4)
    seeds = [r["doc_id"] for r in dl.limit(3).collect()]
    src = spark.createDataFrame([(int(s),) for s in seeds], "src_doc_id long")

    ex = more_like_this(src, p, dl, st, cs.n_docs, cs.avg_doc_len, top_terms=4, k=10)
    iv = more_like_this_wand(
        src, segs, p, st, cs.n_docs, cs.avg_doc_len, top_terms=4, k=10,
        num_buckets=32,
    )
    a = sorted(
        (r["src_doc_id"], r["rank"], round(r["score"], 9)) for r in ex.collect()
    )
    b = sorted(
        (r["src_doc_id"], r["rank"], round(r["score"], 9)) for r in iv.collect()
    )
    assert a == b
    # and the source never leaks into its own page
    assert all(r["doc_id"] != r["src_doc_id"] for r in iv.collect())


def test_more_like_this_excludes_source_and_ranks(spark):
    docs = _docs(
        spark,
        [
            (1, "zeta yotta"),
            (2, "zeta yotta filler"),
            (3, "zeta other filler"),
            (4, "nothing shared here"),
        ],
    )
    from mwmbl_spark.operators import postings as post_ops

    p = post_ops.build_postings(docs)
    dl = post_ops.doc_lengths(docs)
    stats = post_ops.term_stats(p)
    cs = post_ops.corpus_stats(dl)
    src = spark.createDataFrame([(1,)], "src_doc_id long")
    rows = more_like_this(
        src, p, dl, stats, cs.n_docs, cs.avg_doc_len, top_terms=2, k=10
    ).collect()
    ids = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert 1 not in ids  # source excluded
    assert ids[0] == 2  # shares both top terms
    assert 4 not in ids  # shares none
