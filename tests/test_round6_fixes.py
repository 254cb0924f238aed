"""Round-6 ADVICE regression pins: xgboost poisson-family base-score
link, empty-term deletion variants, learn_bpe stats_sink, and the
keep-first exemption in remove_duplicate_spans."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _toy_model_doc(objective: str, base_score: float) -> dict:
    return {
        "learner": {
            "objective": {"name": objective},
            "learner_model_param": {"base_score": str(base_score)},
            "gradient_booster": {
                "model": {
                    "trees": [
                        {
                            "split_indices": [0],
                            "split_conditions": [0.5],
                            "left_children": [-1],
                            "right_children": [-1],
                            "default_left": [0],
                        }
                    ]
                }
            },
            "feature_names": ["f0"],
        }
    }


@pytest.mark.parametrize(
    "objective,expected_link",
    [
        ("reg:gamma", "log"),
        ("reg:tweedie", "log"),
        ("count:poisson", "log"),
        ("reg:squarederror", "identity"),
        ("rank:pairwise", "identity"),
    ],
)
def test_xgb_base_score_link(objective, expected_link):
    from mwmbl_spark.functions.xgb_model import XgbTreesModel

    base = 0.7
    m = XgbTreesModel(_toy_model_doc(objective, base))
    if expected_link == "log":
        assert m.base_margin == pytest.approx(math.log(base))
    else:
        assert m.base_margin == pytest.approx(base)


def test_deletion_variants_empty_term(spark):
    from mwmbl_spark.operators.spell import deletion_variants

    df = spark.createDataFrame([("",), ("ab",)], "t string").select(
        "t", deletion_variants(F.col("t")).alias("v")
    )
    rows = {r["t"]: r["v"] for r in df.collect()}
    # empty term: just itself, no descending-sequence fabrications
    assert rows[""] == [""]
    assert sorted(rows["ab"]) == ["a", "ab", "b"]


def test_learn_bpe_stats_sink(spark):
    from mwmbl_spark.operators.bpe import LAST_LEARN_STATS, learn_bpe

    words = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
        "word string, n long",
    )
    sink: dict = {}
    merges = learn_bpe(words, n_merges=4, min_count=1, stats_sink=sink)
    assert len(merges) > 0
    assert sink["path"] == "driver"
    assert sink == LAST_LEARN_STATS  # global still mirrors for legacy readers


def test_remove_duplicate_spans_keep_first(spark):
    from mwmbl_spark.operators.repetition import remove_duplicate_spans

    # two docs share an identical 4-token span; d3 is unique filler
    span = "aa bb cc dd".split()
    docs = spark.createDataFrame(
        [
            ("d1", span + ["xx"]),
            ("d2", ["yy"] + span),
            ("d3", ["one", "two", "three", "four", "five"]),
        ],
        "doc_id string, toks array<string>",
    )
    strict = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(docs, n=4).collect()
    }
    keep = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(docs, n=4, keep_first=True).collect()
    }
    # default: every copy removed
    assert strict["d1"]["n_removed"] == 4 and strict["d2"]["n_removed"] == 4
    # keep_first: the lowest (doc_id, pos) occurrence (d1's) survives
    assert keep["d1"]["n_removed"] == 0
    assert keep["d1"]["text_clean"] == "aa bb cc dd xx"
    assert keep["d2"]["n_removed"] == 4
    assert keep["d2"]["text_clean"] == "yy"
    # untouched doc identical in both modes
    assert strict["d3"]["n_removed"] == 0 and keep["d3"]["n_removed"] == 0


# ---------------------------------------------------------------------------
# distributed scoped-WAND allowlist (round-6 verdict #2/#7)
# ---------------------------------------------------------------------------


def _scoped_fixture(spark, tmp_path):
    from mwmbl_spark.operators.postings import (
        build_postings, corpus_stats, doc_lengths, term_stats,
    )
    from mwmbl_spark.operators.segments import build_segments
    from mwmbl_spark.synth import synth_transcripts, with_doc_id

    t = with_doc_id(synth_transcripts(spark, n_conv=40, turns_per_conv=3, seed=61))
    p = build_postings(t)
    dl = doc_lengths(t)
    stats = term_stats(p)
    cs = corpus_stats(dl)
    segs = build_segments(
        p, dl, stats, cs.n_docs, cs.avg_doc_len, num_buckets=8, nsalt=4
    ).localCheckpoint()
    allowed = t.select("doc_id").where(F.col("doc_id") % 3 == 0)
    qdf = spark.createDataFrame(
        [(0, "the spark data"), (1, "query model")], "query_id long, query string"
    )
    return t, segs, stats, cs, allowed, qdf


def test_doc_filter_files_match_dict_path_without_collect(spark, tmp_path, monkeypatch):
    """The file-backed allowlist must (a) never touch DataFrame.collect
    while building or serving, (b) produce rank-identical results to
    the broadcast-dict path."""
    from pyspark.sql import DataFrame as SparkDF

    from mwmbl_spark.operators.wand import (
        build_doc_filter, wand_topk, write_doc_filter,
    )

    t, segs, stats, cs, allowed, qdf = _scoped_fixture(spark, tmp_path)
    filt_dict = build_doc_filter(allowed, nsalt=4)
    expect = sorted(
        map(tuple, wand_topk(
            segs, stats, qdf, cs.n_docs, cs.avg_doc_len, k=10,
            num_buckets=8, doc_filter=filt_dict,
        ).collect())
    )

    out_path = str(tmp_path / "scoped_out")
    real_collect = SparkDF.collect

    def no_collect(self_df):
        raise AssertionError("driver-side collect in the distributed scoped path")

    monkeypatch.setattr(SparkDF, "collect", no_collect)
    try:
        desc = write_doc_filter(allowed, str(tmp_path / "filter_files"), nsalt=4)
        wand_topk(
            segs, stats, qdf, cs.n_docs, cs.avg_doc_len, k=10,
            num_buckets=8, doc_filter=desc,
        ).write.mode("overwrite").parquet(out_path)
    finally:
        monkeypatch.setattr(SparkDF, "collect", real_collect)
    got = sorted(map(tuple, spark.read.parquet(out_path).collect()))
    assert got == expect and got


def test_build_doc_filter_refuses_or_spills_above_threshold(spark, tmp_path):
    from mwmbl_spark.operators.wand import DocFilterFiles, build_doc_filter

    allowed = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="max_collect"):
        build_doc_filter(allowed, nsalt=4, max_collect=10)
    desc = build_doc_filter(
        allowed, nsalt=4, max_collect=10, spill_path=str(tmp_path / "spill")
    )
    assert isinstance(desc, DocFilterFiles) and desc.nsalt == 4


def test_serving_loop_single_doc_filter_build(spark, tmp_path, monkeypatch):
    """Task-7 twin of the delete-map hygiene test: 50 scoped batches
    against one static allowlist build the filter ONCE (memoized on the
    plan's semanticHash), sharing one live broadcast."""
    from mwmbl_spark.operators import wand as wand_mod
    from mwmbl_spark.plans.build_index import IndexBuilder, IndexConfig
    from mwmbl_spark.synth import synth_transcripts, with_doc_id

    t = with_doc_id(synth_transcripts(spark, n_conv=20, turns_per_conv=3, seed=62))
    cfg = IndexConfig(
        path=str(tmp_path / "idx"), num_buckets=8, nsalt=2, n_src_partitions=2
    )
    b = IndexBuilder(spark, cfg)
    b.build(t)

    builds = []
    real_build = wand_mod.build_doc_filter

    def counting_build(*a, **kw):
        builds.append(1)
        return real_build(*a, **kw)

    monkeypatch.setattr(wand_mod, "build_doc_filter", counting_build)
    allowed = t.select("doc_id").where(F.col("doc_id") % 2 == 0)
    qdf = spark.createDataFrame([(0, "the spark")], "query_id long, query string")
    first_ref = None
    for _ in range(50):
        b.query_topk(qdf, k=5, doc_filter=allowed).collect()
        cached = next(iter(b._doc_filter_cache.values()))
        if first_ref is None:
            first_ref = cached
        assert cached is first_ref  # same live broadcast object
    assert sum(builds) == 1
