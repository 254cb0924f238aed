"""Round-5 query-capability features: term negation, conversation-
grained retrieval, source-capped diversification, spell correction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mwmbl_spark.operators import bm25 as bm25_ops
from mwmbl_spark.operators import postings as post_ops


@pytest.fixture(scope="module")
def tiny_index(spark):
    rows = [
        (0, "spark query engine fast"),
        (1, "spark query slow scan"),
        (2, "spark query fast join"),
        (3, "unrelated words entirely"),
        (4, "spark query slow table"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    p = post_ops.build_postings(docs)
    dl = post_ops.doc_lengths(docs)
    st = post_ops.term_stats(p)
    cs = post_ops.corpus_stats(dl)
    return docs, p, dl, st, cs


def _q(spark, s="spark query"):
    return spark.createDataFrame([(0, s)], "query_id long, query string")


def test_negation_removes_matching_docs(spark, tiny_index):
    _docs, p, dl, st, cs = tiny_index
    base = bm25_ops.bm25_topk(p, dl, st, _q(spark), cs.n_docs, cs.avg_doc_len, k=10)
    assert {r["doc_id"] for r in base.collect()} == {0, 1, 2, 4}
    excl = spark.createDataFrame([(0, "slow")], "query_id long, term string")
    neg = bm25_ops.bm25_topk(
        p, dl, st, _q(spark), cs.n_docs, cs.avg_doc_len, k=10, exclude=excl
    )
    got = {r["doc_id"] for r in neg.collect()}
    assert got == {0, 2}  # docs 1 and 4 contain 'slow'
    # exclusion is per-query: another query id keeps everything
    excl_other = spark.createDataFrame([(99, "slow")], "query_id long, term string")
    assert (
        bm25_ops.bm25_topk(
            p, dl, st, _q(spark), cs.n_docs, cs.avg_doc_len, k=10,
            exclude=excl_other,
        ).count()
        == 4
    )


def test_conversation_topk_best_turn(spark, tiny_index):
    from mwmbl_spark.operators.conversations import conversation_topk

    _docs, p, dl, st, cs = tiny_index
    scored = bm25_ops.bm25_scores(p, dl, st, _q(spark), cs.n_docs, cs.avg_doc_len)
    conv = spark.createDataFrame(
        [(0, "c0"), (1, "c0"), (2, "c1"), (3, "c1"), (4, "c2")],
        "doc_id long, conv_id string",
    )
    out = conversation_topk(scored, conv, k=10).orderBy("rank").collect()
    # one row per conversation that matched; best_doc belongs to it
    assert [r["conv_id"] for r in out] == sorted(
        {"c0", "c1", "c2"},
        key=lambda c: [r["rank"] for r in out if r["conv_id"] == c][0],
    )
    by_conv = {r["conv_id"]: r for r in out}
    assert by_conv["c1"]["best_doc_id"] == 2  # doc 3 never matches
    assert len(out) == 3
    # the conv score is its best turn's score exactly
    turn = {(r["query_id"], r["doc_id"]): r["score"] for r in scored.collect()}
    for r in out:
        member_scores = [
            v for (qid, d), v in turn.items()
            if qid == 0 and {"c0": {0, 1}, "c1": {2, 3}, "c2": {4}}[r["conv_id"]] >= {d}
        ]
        assert r["score"] == max(member_scores)


def test_diversify_topk_cap_binds(spark, tiny_index):
    from mwmbl_spark.operators.mmr import diversify_topk

    _docs, p, dl, st, cs = tiny_index
    scored = bm25_ops.bm25_scores(p, dl, st, _q(spark), cs.n_docs, cs.avg_doc_len)
    keys = spark.createDataFrame(
        [(0, "siteA"), (1, "siteA"), (2, "siteA"), (4, "siteB")],
        "doc_id long, group_key string",
    )
    out = diversify_topk(scored, keys, per_key=1, k=10).collect()
    per_key = {}
    for r in out:
        per_key[r["group_key"]] = per_key.get(r["group_key"], 0) + 1
    assert all(v <= 1 for v in per_key.values())
    assert len(out) == 2  # one siteA, one siteB (doc 3 matched nothing)
    # rank order is still global score order after the cap
    assert [r["rank"] for r in sorted(out, key=lambda r: -r["score"])] == [1, 2]


def test_spell_corrections_hand_case(spark):
    from mwmbl_spark.operators.spell import spell_corrections

    stats = spark.createDataFrame(
        [("spark", 50, 80), ("spars", 3, 3), ("sharp", 9, 9), ("query", 40, 60)],
        "term string, df long, cf long",
    )
    q = spark.createDataFrame([(0, "spar quer")], "query_id long, query string")
    out = spell_corrections(q, stats, n=3).collect()
    by_term = {}
    for r in out:
        by_term.setdefault(r["qterm"], []).append((r["rank"], r["suggestion"], r["df"]))
    # 'spar': spark (insert, df 50) ranks above spars (insert, df 3);
    # 'sharp' is distance 2 and must NOT appear
    assert [s for _, s, _ in sorted(by_term["spar"])] == ["spark", "spars"]
    assert [s for _, s, _ in sorted(by_term["quer"])] == ["query"]
    for r in out:
        assert r["distance"] == 1


def test_spell_skips_in_vocabulary_terms(spark):
    from mwmbl_spark.operators.spell import spell_corrections

    stats = spark.createDataFrame(
        [("spark", 50, 80), ("spars", 3, 3)], "term string, df long, cf long"
    )
    q = spark.createDataFrame([(0, "spark")], "query_id long, query string")
    # identical term excluded; 'spars' (distance 1) still suggested —
    # callers decide whether to surface suggestions for in-vocab terms
    out = spell_corrections(q, stats, n=3).collect()
    assert [(r["suggestion"], r["distance"]) for r in out] == [("spars", 1)]


# ---------------------------------------------------------------------------
# scoped serving (doc_filter through the WAND kernel)
# ---------------------------------------------------------------------------


def test_scoped_serving_matches_filtered_results(spark, tmp_path):
    from mwmbl_spark.plans.build_index import IndexBuilder, IndexConfig
    from mwmbl_spark.synth import synth_transcripts, with_doc_id

    t = with_doc_id(synth_transcripts(spark, n_conv=25, turns_per_conv=4, seed=9))
    cfg = IndexConfig(path=str(tmp_path / "idx"), num_buckets=16, nsalt=4,
                      n_src_partitions=2)
    b = IndexBuilder(spark, cfg)
    b.build(t)
    qdf = spark.createDataFrame(
        [(0, "the spark data"), (1, "fast query")], "query_id long, query string"
    )
    allowed = t.select("doc_id").where(F.col("doc_id") % 2 == 0)
    scoped = b.query_topk(qdf, k=10, doc_filter=allowed).collect()
    assert scoped and all(r["doc_id"] % 2 == 0 for r in scoped)
    # identical to filtering a big unscoped run: same docs, same scores
    # (global stats — the filter never re-weights idf)
    full = b.query_topk(qdf, k=1000).collect()
    want = {}
    for r in full:
        if r["doc_id"] % 2 == 0:
            want.setdefault(r["query_id"], []).append((r["doc_id"], round(r["score"], 9)))
    for qid in want:
        want[qid] = [
            d for d, _ in sorted(want[qid], key=lambda x: (-x[1], x[0]))
        ][:10]
    got = {}
    for r in sorted(scoped, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append(r["doc_id"])
    assert got == want


def test_scoped_serving_composes_with_upserts(spark, tmp_path):
    from mwmbl_spark.plans.build_index import IndexBuilder, IndexConfig
    from mwmbl_spark.synth import synth_transcripts, with_doc_id

    t = with_doc_id(synth_transcripts(spark, n_conv=20, turns_per_conv=3, seed=21))
    cfg = IndexConfig(path=str(tmp_path / "idx2"), num_buckets=8, nsalt=2,
                      n_src_partitions=2)
    b = IndexBuilder(spark, cfg)
    b.build(t)
    b.upsert(t.limit(6).select(
        "doc_id", F.concat("text", F.lit(" scoped spark v2")).alias("text")
    ))
    qdf = spark.createDataFrame([(0, "the spark")], "query_id long, query string")
    allowed = t.select("doc_id").where(F.col("doc_id") % 2 == 1)
    scoped = b.query_topk(qdf, k=10, doc_filter=allowed).collect()
    assert scoped and all(r["doc_id"] % 2 == 1 for r in scoped)
    # delete-vector masking still applies inside the scope: no doc twice
    seen = [r["doc_id"] for r in scoped]
    assert len(seen) == len(set(seen))


def test_scoped_serving_empty_scope_returns_nothing(spark, tmp_path):
    from mwmbl_spark.operators.wand import build_doc_filter
    from mwmbl_spark.plans.build_index import IndexBuilder, IndexConfig
    from mwmbl_spark.synth import synth_transcripts, with_doc_id

    t = with_doc_id(synth_transcripts(spark, n_conv=10, turns_per_conv=3, seed=2))
    cfg = IndexConfig(path=str(tmp_path / "idx3"), num_buckets=8, nsalt=2,
                      n_src_partitions=1)
    b = IndexBuilder(spark, cfg)
    b.build(t)
    qdf = spark.createDataFrame([(0, "the spark")], "query_id long, query string")
    empty = build_doc_filter(t.select("doc_id").where(F.lit(False)), nsalt=2)
    assert b.query_topk(qdf, k=10, doc_filter=empty).count() == 0


# ---------------------------------------------------------------------------
# exact phrase matching
# ---------------------------------------------------------------------------


def test_phrase_match_hand_cases(spark):
    from mwmbl_spark.operators.phrase import phrase_match

    docs = spark.createDataFrame(
        [
            (1, ["a", "b", "c", "a", "b"]),
            (2, ["b", "a", "c"]),       # tokens present, order wrong
            (3, ["a"]),                  # shorter than the phrase
            (4, ["a", "b"]),             # exact-length match
        ],
        "doc_id long, toks array<string>",
    )
    out = {
        (r["phrase_id"], r["doc_id"]): (r["n_matches"], r["first_pos"])
        for r in phrase_match(docs, [(0, "a b"), (1, "c a b")]).collect()
    }
    assert out[(0, 1)] == (2, 1)   # overlapping scan finds both runs
    assert out[(0, 4)] == (1, 1)
    assert out[(1, 1)] == (1, 3)
    assert (0, 2) not in out and (0, 3) not in out
    assert (1, 2) not in out


def test_phrase_match_uses_corpus_tokenizer(spark):
    from mwmbl_spark.functions.tokenize import tokenize_pd
    from mwmbl_spark.operators.phrase import phrase_match

    docs = spark.createDataFrame(
        [(7, "Hello, World! Hello world again")], "doc_id long, text string"
    ).select("doc_id", tokenize_pd(F.col("text")).alias("toks"))
    # the corpus (reference) tokenizer lowercases but KEEPS punctuation
    # attached: 'hello,' != 'hello', so only the clean second run hits
    out = phrase_match(docs, [(0, "HELLO world")]).collect()
    assert [(r["doc_id"], r["n_matches"], r["first_pos"]) for r in out] == [(7, 1, 3)]


def test_segment_compound_splits_and_ranks(spark):
    """'abc' with vocab {a, ab, b, bc, c}: two valid splits — a|bc and
    ab|c — ranked by df product; in-vocab and unsplittable terms emit
    nothing."""
    from mwmbl_spark.operators.spell import segment_compound

    # dfs: a=1, ab=3, b=1, bc=2, c=1 -> ab|c (3) beats a|bc (2)
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "ab bc"), (3, "ab"), (4, "ab bc")],
        "doc_id long, text string",
    )
    stats = post_ops.term_stats(post_ops.build_postings(docs))
    q = spark.createDataFrame(
        [(0, "abc zz ab")], "query_id long, query string"
    )
    out = sorted(
        (r["qterm"], r["rank"], r["left_term"], r["right_term"],
         r["df_left"], r["df_right"])
        for r in segment_compound(q, stats, n=2).collect()
    )
    # 'zz' unsplittable (z not in vocab), 'ab' in-vocab -> only 'abc'
    assert out == [
        ("abc", 1, "ab", "c", 3, 1),
        ("abc", 2, "a", "bc", 1, 2),
    ]


def test_segment_compound_tie_breaks_on_split_pos(spark):
    from mwmbl_spark.operators.spell import segment_compound

    # dfs all 1: a|bc and ab|c tie on product -> earlier split wins
    docs = spark.createDataFrame(
        [(1, "a ab b bc c")], "doc_id long, text string"
    )
    stats = post_ops.term_stats(post_ops.build_postings(docs))
    q = spark.createDataFrame([(0, "abc")], "query_id long, query string")
    out = segment_compound(q, stats, n=1).collect()
    assert [(r["split_pos"], r["left_term"], r["right_term"]) for r in out] == [
        (1, "a", "bc")
    ]


def test_segment_compound_plan_no_cartesian(spark):
    """Two broadcast joins at vocabulary grain — never a cartesian."""
    import contextlib
    import io

    from mwmbl_spark.operators.spell import segment_compound

    docs = spark.createDataFrame([(1, "a b ab")], "doc_id long, text string")
    stats = post_ops.term_stats(post_ops.build_postings(docs))
    q = spark.createDataFrame([(0, "ab cd")], "query_id long, query string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        segment_compound(q, stats).explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
