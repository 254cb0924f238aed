"""Eval-set decontamination by shared n-grams."""

from __future__ import annotations

from mwmbl_spark.operators.decontam import contaminated_ids, decontaminate


def _toks(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, toks array<string>")


def test_contamination_by_shared_ngram(spark):
    train = _toks(spark, [
        (0, ["the", "quick", "brown", "fox", "jumps"]),      # contains eval 3-gram
        (1, ["totally", "unrelated", "training", "text"]),
        (2, ["quick", "brown", "fox", "elsewhere", "too"]),  # same 3-gram again
        (3, ["quick", "brown", "wolf", "nope", "x"]),        # only a 2-gram overlap
    ])
    ev = _toks(spark, [(100, ["watch", "the", "quick", "brown", "fox"])])
    bad = {r.doc_id for r in contaminated_ids(train, ev, n=3).collect()}
    assert bad == {0, 2}
    kept = {r.doc_id for r in decontaminate(train, ev, n=3).collect()}
    assert kept == {1, 3}


def test_short_docs_never_match(spark):
    train = _toks(spark, [(0, ["a", "b"]), (1, [])])
    ev = _toks(spark, [(9, ["a", "b", "c"])])
    assert contaminated_ids(train, ev, n=3).count() == 0


def test_corpus_overlap_hand_computed(spark):
    """a: one doc with 9 tokens -> two 8-grams {t1..t8, t2..t9};
    b: one doc sharing exactly the first 8-gram plus one disjoint doc.
    n_common=1, union=2+2-1=3, jaccard=1/3, containment 1/2 each."""
    from mwmbl_spark.operators.decontam import corpus_overlap

    toks_a = [f"t{i}" for i in range(1, 10)]
    a = spark.createDataFrame([(1, toks_a)], "doc_id long, toks array<string>")
    b = spark.createDataFrame(
        [(2, toks_a[:8]), (3, [f"z{i}" for i in range(8)])],
        "doc_id long, toks array<string>",
    )
    r = corpus_overlap(a, b).collect()[0]
    assert (
        int(r["n_grams_a"]), int(r["n_grams_b"]), int(r["n_common"]),
        int(r["n_union"]),
    ) == (2, 2, 1, 3)
    assert float(r["jaccard"]) == round(1 / 3, 6)
    assert float(r["containment_a"]) == 0.5 == float(r["containment_b"])
    # disjoint corpora -> zero overlap, no division blow-ups
    r2 = corpus_overlap(a, b.where("doc_id = 3")).collect()[0]
    assert int(r2["n_common"]) == 0 and float(r2["jaccard"]) == 0.0
    # identical corpora -> jaccard 1
    r3 = corpus_overlap(a, a).collect()[0]
    assert float(r3["jaccard"]) == 1.0


def test_corpus_overlap_approx_error_envelope(spark):
    """HLL inclusion-exclusion tracks the exact report within a few
    percent on a corpus with substantial known overlap (deterministic:
    HLL++ sketches are hash-based, not RNG-based)."""
    from mwmbl_spark.operators.decontam import corpus_overlap, corpus_overlap_approx

    rows_a, rows_b = [], []
    for d in range(60):
        toks = [f"w{(d * 7 + i) % 300}" for i in range(40)]
        rows_a.append((d, toks))
        # half of b's docs are copies of a's (big true overlap)
        rows_b.append((1000 + d, toks if d % 2 == 0 else [f"v{d}_{i}" for i in range(40)]))
    a = spark.createDataFrame(rows_a, "doc_id long, toks array<string>")
    b = spark.createDataFrame(rows_b, "doc_id long, toks array<string>")
    exact = corpus_overlap(a, b).collect()[0]
    approx = corpus_overlap_approx(a, b, rsd=0.02).collect()[0]
    for col in ("n_grams_a", "n_grams_b", "n_union", "n_common"):
        e, g = int(exact[col]), int(approx[col])
        assert abs(g - e) <= max(8, 0.1 * e), (col, e, g)
    assert abs(float(approx["jaccard"]) - float(exact["jaccard"])) < 0.1
