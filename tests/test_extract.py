"""jusText paragraph classification + content extraction — Spark vs the
exact Python twin (core.py:253-381 semantics)."""

from __future__ import annotations

import numpy as np
import pytest

from mwmbl_spark.operators.extract import (
    DEFAULT_STOPLIST,
    classify_paragraph_py,
    classify_paragraphs,
    extract_content,
    revise_paragraphs_py,
)

GOOD_TEXT = (
    "This is a long paragraph about the subject and it has many of the "
    "common words that a stopword list will match because it is written "
    "in plain natural language with the usual amount of filler and it "
    "keeps going for longer than two hundred characters in total length."
)
BAD_TEXT = "foo bar baz qux quux corge grault garply waldo fred plugh xyzzy thud " * 3


def test_context_free_bands():
    # link-dense -> bad
    assert classify_paragraph_py(GOOD_TEXT, int(len(GOOD_TEXT) * 0.5), "p")["cf_class"] == "bad"
    # copyright -> bad
    assert classify_paragraph_py("\xa9 2026 somebody " * 10, 0, "p")["cf_class"] == "bad"
    # select ancestry -> bad
    assert classify_paragraph_py(GOOD_TEXT, 0, "body.select.option")["cf_class"] == "bad"
    # short, no links -> short; short with links -> bad
    assert classify_paragraph_py("A short heading", 0, "h1")["cf_class"] == "short"
    assert classify_paragraph_py("A short link row", 5, "p")["cf_class"] == "bad"
    # long + stopword-dense -> good; stopword-free -> bad
    assert classify_paragraph_py(GOOD_TEXT, 0, "p")["cf_class"] == "good"
    assert classify_paragraph_py(BAD_TEXT, 0, "p")["cf_class"] == "bad"
    # heading flag from dom path
    assert classify_paragraph_py("x", 0, "html.body.h2.span")["heading"]


def test_revision_short_between_goods_promoted():
    ps = [
        {"text": GOOD_TEXT, "cf_class": "good", "heading": False},
        {"text": "short middle", "cf_class": "short", "heading": False},
        {"text": GOOD_TEXT, "cf_class": "good", "heading": False},
    ]
    assert revise_paragraphs_py(ps) == ["good", "good", "good"]


def test_revision_neargood_between_bads_demoted():
    ps = [
        {"text": BAD_TEXT, "cf_class": "bad", "heading": False},
        {"text": "x" * 80, "cf_class": "neargood", "heading": False},
        {"text": BAD_TEXT, "cf_class": "bad", "heading": False},
    ]
    assert revise_paragraphs_py(ps) == ["bad", "bad", "bad"]


def test_revision_heading_promotion():
    ps = [
        {"text": "Section title", "cf_class": "short", "heading": True},
        {"text": GOOD_TEXT, "cf_class": "good", "heading": False},
    ]
    # both modes converge here: the reference's lazy-copy quirk kills the
    # FIRST promotion pass, but the final 'more good headings' recovery
    # still lifts the demoted heading next to good content
    assert revise_paragraphs_py(ps) == ["good", "good"]
    assert revise_paragraphs_py(ps, upstream_good_headings=True) == ["good", "good"]


def test_revision_reference_lazy_copy_quirk():
    """A fixture where the two modes DIVERGE (the ~0.7% class): a short
    heading followed by a short paragraph then good content. Upstream
    jusText promotes the heading to neargood in pass 1, which lets the
    middle short paragraph classify good (bad-prev + neargood
    non-ignore neighbour); the reference's lazy class_type copy makes
    pass 1 a no-op (core.py:325-339 reads un-copied classes), so the
    middle paragraph sees only bad/boundary neighbours and demotes —
    the default replicates the reference exactly."""
    ps = [
        {"text": "Section title", "cf_class": "short", "heading": True},
        {"text": "tiny", "cf_class": "short", "heading": False},
        {"text": GOOD_TEXT, "cf_class": "good", "heading": False},
    ]
    assert revise_paragraphs_py(ps) == ["good", "bad", "good"]
    assert revise_paragraphs_py(ps, upstream_good_headings=True) == [
        "good", "good", "good",
    ]


def _synth_paragraphs(n_docs: int = 20, seed: int = 7):
    rng = np.random.default_rng(seed)
    stop = sorted(DEFAULT_STOPLIST)
    rows = []
    for d in range(n_docs):
        for pos in range(int(rng.integers(2, 9))):
            kind = rng.integers(0, 4)
            if kind == 0:
                words = [stop[int(i)] for i in rng.integers(0, len(stop), 40)]
                text = " ".join(words) + " content words here"
            elif kind == 1:
                text = " ".join(f"w{int(i)}" for i in rng.integers(0, 999, 40))
            elif kind == 2:
                text = "Short head " + str(int(rng.integers(0, 99)))
            else:
                words = [stop[int(i)] if rng.random() < 0.31 else f"t{int(i)}" for i in rng.integers(0, len(stop), 35)]
                text = " ".join(words)
            cil = int(rng.integers(0, 30)) if rng.random() < 0.3 else 0
            dom = "body.h2.p" if rng.random() < 0.2 else "body.div.p"
            rows.append((d, pos, text, cil, dom))
    return rows


def test_spark_matches_twin_on_random_corpus(spark):
    rows = _synth_paragraphs()
    df = spark.createDataFrame(
        rows, "doc_id long, pos int, text string, chars_in_links int, dom_path string"
    )
    got = {
        (r["doc_id"], r["pos"]): r["class"]
        for r in classify_paragraphs(df).collect()
    }
    by_doc: dict[int, list] = {}
    for d, pos, text, cil, dom in rows:
        by_doc.setdefault(d, []).append((pos, text, cil, dom))
    want = {}
    for d, plist in by_doc.items():
        plist.sort()
        cf = [
            {**classify_paragraph_py(t, c, dm), "text": t}
            for _, t, c, dm in plist
        ]
        for (pos, *_), cls in zip(plist, revise_paragraphs_py(cf)):
            want[(d, pos)] = cls
    assert got == want


def test_extract_content_joins_good_paragraphs(spark):
    rows = [
        (0, 0, GOOD_TEXT, 0, "p"),
        (0, 1, BAD_TEXT, 0, "p"),
        (0, 2, GOOD_TEXT + " More of the same prose as before it.", 0, "p"),
        (1, 0, BAD_TEXT, 0, "p"),  # doc 1 has no good content -> dropped
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, pos int, text string, chars_in_links int, dom_path string"
    )
    out = {r["doc_id"]: r["content"] for r in extract_content(df).collect()}
    assert set(out) == {0}
    assert out[0].startswith(GOOD_TEXT)
    assert "More of the same prose" in out[0]
    assert BAD_TEXT.strip() not in out[0]
