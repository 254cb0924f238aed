"""HTML -> paragraph walk (stdlib twin of justext core.py
ParagraphMaker + Cleaner) and the full raw-HTML -> content pipeline."""

from __future__ import annotations

from mwmbl_spark.operators.htmlparse import (
    extract_content_from_html,
    html_paragraphs,
    html_to_paragraphs_py,
)

GOOD = (
    "This is a long and genuinely useful paragraph about the subject of "
    "the page and it has many common stopwords in it so that the "
    "classifier will see it as main content because it is over the "
    "length threshold and the stopword density is high enough for a "
    "good rating by the justext rules of the reference implementation."
)

PAGE = f"""<html><head><title>T</title><script>var x = 1;</script>
<style>p {{ color: red }}</style></head>
<body>
<h2>Title here</h2>
<p>{GOOD}</p>
<!-- a comment that must vanish -->
<div><a href="/nav1">nav link</a></div>
<form><input name="q"><button>go</button>search form text</form>
<p>one <b>two</b> three<br>four<br><br>five</p>
</body></html>"""


def test_segmentation_and_paths():
    paras = html_to_paragraphs_py(PAGE)
    texts = [p["text"] for p in paras]
    assert texts[0] == "Title here"
    assert paras[0]["dom_path"] == "html.body.h2"
    assert texts[1] == GOOD
    assert paras[1]["dom_path"] == "html.body.p"
    # killed subtrees: head/title/script/style/form content absent
    joined = " ".join(texts)
    assert "var x" not in joined and "color" not in joined
    assert "search form text" not in joined and "T " not in joined
    # comment dropped
    assert "comment" not in joined


def test_link_chars_and_br_splitting():
    paras = html_to_paragraphs_py(PAGE)
    nav = [p for p in paras if p["text"] == "nav link"]
    assert nav and nav[0]["chars_in_links"] == len("nav link")
    assert nav[0]["dom_path"] == "html.body.div"
    # single <br> = a space; <br><br> = a paragraph break
    texts = [p["text"] for p in paras]
    assert "one two three four" in texts
    assert "five" in texts


def test_triple_br_and_tag_soup():
    # <br><br><br>: a break per extra br (reference keeps the flag set)
    paras = html_to_paragraphs_py("<body>alpha<br><br><br>beta</body>")
    assert [p["text"] for p in paras] == ["alpha", "beta"]
    # unclosed/misnested tags never raise and text survives
    paras = html_to_paragraphs_py("<div><p>keep <b>this<p>and this</div>")
    assert "keep this" in [p["text"] for p in paras]
    assert "and this" in [p["text"] for p in paras]
    assert html_to_paragraphs_py("") == []
    assert html_to_paragraphs_py(None) == []


def test_spark_walk_and_full_pipeline(spark):
    docs = spark.createDataFrame(
        [(1, PAGE), (2, "<body><p>tiny</p></body>"), (3, None)],
        "doc_id long, html string",
    )
    paras = html_paragraphs(docs).orderBy("doc_id", "pos").collect()
    by_doc: dict = {}
    for r in paras:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # Spark rows match the single-node twin exactly
    twin = html_to_paragraphs_py(PAGE)
    assert [
        (r["text"], r["chars_in_links"], r["dom_path"]) for r in by_doc[1]
    ] == [(p["text"], p["chars_in_links"], p["dom_path"]) for p in twin]
    assert [r["text"] for r in by_doc[2]] == ["tiny"]
    assert 3 not in by_doc  # null html -> no rows

    # raw HTML -> main content end to end: the heading recovers next to
    # good content ('more good headings', core.py:360-381) and the good
    # paragraph follows; nav/boilerplate drops
    out = {r["doc_id"]: r["content"] for r in extract_content_from_html(docs).collect()}
    assert out.get(1) == "Title here\n" + GOOD
    assert 2 not in out  # 'tiny' classifies short -> bad (no neighbours)
