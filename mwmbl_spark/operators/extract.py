"""Content extraction — the justext paragraph classifier, Spark-first
(reference mwmbl/justext/core.py:253-381 + paragraph.py; the jusText
algorithm, Pomikálek 2011).

The reference walks an HTML DOM into paragraph blocks and then runs a
two-pass classifier; the DOM walk needs an HTML parser (lxml — crawl
infrastructure, not engine logic), so the OPERATOR input here is the
paragraph table the walk produces:

    paragraphs(doc_id, pos, text, chars_in_links, dom_path)

- Pass 1 (context-free, core.py:253-284) is PURE COLUMN EXPRESSIONS:
  link density, copyright mark, <select> ancestry, length bands,
  stopword-density bands -> {bad, short, neargood, good}.
- Pass 2 (context-sensitive revision, core.py:317-381) is inherently
  sequential WITHIN a document (neighbour propagation, heading
  promotion by forward char distance) and embarrassingly parallel
  ACROSS documents -> ``applyInPandas`` per doc_id running the exact
  Python twin over position-sorted paragraphs (bounded per-group work:
  a web page's paragraph count).
- ``extract_content`` keeps class == 'good' and joins their texts —
  justext's main-content output.

Word/stopword semantics follow paragraph.py: words = text.split(),
stopword iff word.lower() in the stoplist; length = len(text).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# core.py:27-35 defaults
MAX_LINK_DENSITY = 0.2
LENGTH_LOW = 70
LENGTH_HIGH = 200
STOPWORDS_LOW = 0.30
STOPWORDS_HIGH = 0.32
MAX_HEADING_DISTANCE = 200

_HEADINGS_RE = re.compile(r"\bh\d\b")

# a compact English stoplist (the reference ships full language
# stoplists as data files; the list is injected data, not engine logic)
DEFAULT_STOPLIST = frozenset(
    "a about above after again all am an and any are as at be because been "
    "before being below between both but by could did do does doing down "
    "during each few for from further had has have having he her here hers "
    "him his how i if in into is it its just me more most my no nor not of "
    "off on once only or other our out over own same she so some such than "
    "that the their them then there these they this those through to too "
    "under until up very was we were what when where which while who whom "
    "why will with you your".split()
)


# ---------------------------------------------------------------------------
# Python twins (exact core.py semantics)
# ---------------------------------------------------------------------------

def classify_paragraph_py(
    text: str,
    chars_in_links: int,
    dom_path: str,
    stoplist: frozenset[str] = DEFAULT_STOPLIST,
    no_headings: bool = False,
) -> dict:
    """Context-free class (core.py:253-284) + the heading flag."""
    words = text.split()
    length = len(text)
    sw_density = (
        sum(w.lower() in stoplist for w in words) / len(words) if words else 0
    )
    link_density = chars_in_links / length if length else 0
    heading = bool(not no_headings and _HEADINGS_RE.search(dom_path or ""))
    if link_density > MAX_LINK_DENSITY:
        cf = "bad"
    elif ("\xa9" in text) or ("&copy" in text):
        cf = "bad"
    elif "select" in (dom_path or ""):
        cf = "bad"
    elif length < LENGTH_LOW:
        cf = "bad" if chars_in_links > 0 else "short"
    elif sw_density >= STOPWORDS_HIGH:
        cf = "good" if length > LENGTH_HIGH else "neargood"
    elif sw_density >= STOPWORDS_LOW:
        cf = "neargood"
    else:
        cf = "bad"
    return {"cf_class": cf, "heading": heading}


def _neighbour(classes: list[str], i: int, ignore_neargood: bool, inc: int, boundary: int) -> str:
    while i + inc != boundary:
        i += inc
        c = classes[i]
        if c in ("good", "bad"):
            return c
        if c == "neargood" and not ignore_neargood:
            return c
    return "bad"


def revise_paragraphs_py(
    paragraphs: list[dict],
    max_heading_distance: int = MAX_HEADING_DISTANCE,
    upstream_good_headings: bool = False,
) -> list[str]:
    """Context-sensitive revision (core.py:317-381): paragraphs =
    [{text, cf_class, heading}] in document order -> final classes.

    Reference quirk, replicated by default: core.py:325-339 copies
    ``class_type = cf_class`` lazily INSIDE the first loop, so when
    paragraph i scans forward, ``paragraphs[j].class_type`` (j > i) is
    still the un-copied default — never 'good' — and the first
    short-heading -> neargood promotion NEVER fires. Published jusText
    copies classes up front and the promotion works;
    ``upstream_good_headings=True`` restores that behavior. (The final
    'more good headings' pass runs after all copies either way and is
    identical.) Fuzzing showed ~0.7% of documents differ between the
    two — the default pins reference parity."""
    n = len(paragraphs)
    cls = [p["cf_class"] for p in paragraphs]

    # good headings: short headings near a good paragraph become
    # neargood — upstream jusText only (no-op in the reference, see above)
    if upstream_good_headings:
        for i, p in enumerate(paragraphs):
            if not (p["heading"] and cls[i] == "short"):
                continue
            j, distance = i + 1, 0
            while j < n and distance <= max_heading_distance:
                if cls[j] == "good":
                    cls[i] = "neargood"
                    break
                distance += len(paragraphs[j]["text"])
                j += 1

    # classify short by good/bad neighbours
    new_classes = {}
    for i in range(n):
        if cls[i] != "short":
            continue
        prev_n = _neighbour(cls, i, True, -1, -1)
        next_n = _neighbour(cls, i, True, 1, n)
        if (prev_n, next_n) == ("good", "good"):
            new_classes[i] = "good"
        elif (prev_n, next_n) == ("bad", "bad"):
            new_classes[i] = "bad"
        elif (prev_n == "bad" and _neighbour(cls, i, False, -1, -1) == "neargood") or (
            next_n == "bad" and _neighbour(cls, i, False, 1, n) == "neargood"
        ):
            new_classes[i] = "good"
        else:
            new_classes[i] = "bad"
    for i, c in new_classes.items():
        cls[i] = c

    # revise neargood
    for i in range(n):
        if cls[i] != "neargood":
            continue
        prev_n = _neighbour(cls, i, True, -1, -1)
        next_n = _neighbour(cls, i, True, 1, n)
        cls[i] = "bad" if (prev_n, next_n) == ("bad", "bad") else "good"

    # more good headings: demoted headings near good content recover
    for i, p in enumerate(paragraphs):
        if not (p["heading"] and cls[i] == "bad" and p["cf_class"] != "bad"):
            continue
        j, distance = i + 1, 0
        while j < n and distance <= max_heading_distance:
            if cls[j] == "good":
                cls[i] = "good"
                break
            distance += len(paragraphs[j]["text"])
            j += 1
    return cls


# ---------------------------------------------------------------------------
# Spark path
# ---------------------------------------------------------------------------

def cf_class_expr(
    text: Column, chars_in_links: Column, dom_path: Column,
    stoplist: frozenset[str] = DEFAULT_STOPLIST,
) -> Column:
    """Pass 1 as one JVM expression (identical band logic; the oracle
    SQL can state the same computation)."""
    words = F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != F.lit(""))
    n_words = F.size(words)
    stop_arr = F.array(*[F.lit(w) for w in sorted(stoplist)])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w))))
    length = F.length(text)
    sw_density = F.when(n_words > 0, n_stop.cast("double") / n_words).otherwise(F.lit(0.0))
    link_density = F.when(length > 0, chars_in_links.cast("double") / length).otherwise(F.lit(0.0))
    return (
        F.when(link_density > MAX_LINK_DENSITY, F.lit("bad"))
        .when(text.contains("\xa9") | text.contains("&copy"), F.lit("bad"))
        .when(F.coalesce(dom_path, F.lit("")).contains("select"), F.lit("bad"))
        .when(length < LENGTH_LOW,
              F.when(chars_in_links > 0, F.lit("bad")).otherwise(F.lit("short")))
        .when(sw_density >= STOPWORDS_HIGH,
              F.when(length > LENGTH_HIGH, F.lit("good")).otherwise(F.lit("neargood")))
        .when(sw_density >= STOPWORDS_LOW, F.lit("neargood"))
        .otherwise(F.lit("bad"))
    )


def heading_expr(dom_path: Column) -> Column:
    return F.coalesce(dom_path, F.lit("")).rlike(r"\bh\d\b")


CLASSIFIED_SCHEMA = "doc_id long, pos int, class string"


def classify_paragraphs(
    paragraphs: DataFrame, stoplist: frozenset[str] = DEFAULT_STOPLIST
) -> DataFrame:
    """(doc_id, pos, text, chars_in_links, dom_path) -> (doc_id, pos,
    class): pass-1 expressions, then per-doc sequential revision in an
    Arrow batch (position-sorted)."""
    pass1 = paragraphs.select(
        "doc_id", "pos", "text",
        cf_class_expr(F.col("text"), F.col("chars_in_links"), F.col("dom_path"), stoplist).alias("cf_class"),
        heading_expr(F.col("dom_path")).alias("heading"),
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pos")
        plist = [
            {"text": t, "cf_class": c, "heading": bool(h)}
            for t, c, h in zip(pdf["text"], pdf["cf_class"], pdf["heading"])
        ]
        cls = revise_paragraphs_py(plist)
        return pd.DataFrame(
            {"doc_id": pdf["doc_id"].iloc[0], "pos": pdf["pos"], "class": cls}
        )

    return pass1.groupBy("doc_id").applyInPandas(kernel, schema=CLASSIFIED_SCHEMA)


def extract_content(
    paragraphs: DataFrame, stoplist: frozenset[str] = DEFAULT_STOPLIST
) -> DataFrame:
    """(doc_id, content): the 'good' paragraphs joined in order — the
    jusText main-content output (docs with no good paragraph drop)."""
    classed = classify_paragraphs(paragraphs, stoplist)
    good = classed.where(F.col("class") == "good").join(
        paragraphs.select("doc_id", "pos", "text"), ["doc_id", "pos"]
    )
    return good.groupBy("doc_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "text"))),
                lambda s: s["text"],
            ),
        ).alias("content")
    )
