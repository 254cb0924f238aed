"""HTML -> paragraph table with ZERO native dependencies.

Closes the last scoping gap of the jusText port: the reference walks an
lxml DOM (justext/core.py ParagraphMaker over lxml.sax +
lxml.html.clean.Cleaner, core.py:113-215) to segment a page into
paragraphs before classification. This module re-expresses that walk on
the stdlib ``html.parser`` so the FULL pipeline — raw HTML -> paragraphs
-> context-free classes -> revision -> main content — runs anywhere
Spark runs, with the walk distributed as an Arrow-batched 1->N fan-out.

Ported semantics (cited against the reference):
- paragraph boundaries at PARAGRAPH_TAGS open/close and at <br><br>
  (core.py:36-41,170-194);
- text chunks whitespace-normalized per chunk on append; blank chunks
  skipped; a lone <br> contributes one space (core.py:178-180,197-204;
  utils.py:15-35);
- characters inside <a> accumulate chars_count_in_links using the
  NORMALIZED chunk length (core.py:199-203, paragraph.py:20);
- the dom_path is the open-tag chain at paragraph creation; headings
  are detected downstream by the reference's \\bh\\d\\b search
  (paragraph.py:11,26-27);
- the Cleaner pre-pass (core.py:113-134: scripts, style, comments,
  embedded, forms, kill_tags=head) maps to skipping those subtrees
  during the walk; comments are dropped by html.parser by default.

Documented divergences (cosmetic): void elements (br, img, ...) are not
pushed onto the dom_path (lxml's SAX pushes then immediately pops; the
only observable difference is a transient ".br" suffix on the dom_path
of <br><br>-separated paragraphs, which no classifier rule reads), and
malformed tag soup is repaired by html.parser's recovery rather than
libxml2's — both are lenient, neither raises.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame

# core.py:36-41
PARAGRAPH_TAGS = frozenset({
    "body", "blockquote", "caption", "center", "col", "colgroup", "dd",
    "div", "dl", "dt", "fieldset", "form", "legend", "optgroup", "option",
    "p", "pre", "table", "td", "textarea", "tfoot", "th", "thead", "tr",
    "ul", "li", "h1", "h2", "h3", "h4", "h5", "h6",
})
# Cleaner(scripts, style, embedded, forms, kill_tags=head) — subtrees
# removed before the reference's walk (core.py:113-134)
KILL_TAGS = frozenset({
    "script", "style", "head", "form", "object", "embed", "applet",
    "iframe", "noscript",
})
VOID_TAGS = frozenset({
    "br", "img", "hr", "input", "meta", "link", "area", "base", "col",
    "wbr", "source", "track", "param",
})

_WS = re.compile(r"\s+", re.UNICODE)


def _norm(text: str) -> str:
    """utils.py:15-27: runs of whitespace -> one space, or one LF if the
    run contains a newline."""
    return _WS.sub(lambda m: "\n" if ("\n" in m.group() or "\r" in m.group()) else " ", text)


class _ParagraphParser(HTMLParser):
    """ParagraphMaker twin over html.parser (core.py:139-215)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.path: list[str] = []
        self.kill: list[str] = []  # stack of open KILL_TAGS
        self.link = False
        self.br = False
        self.out: list[dict] = []
        self.cur: dict | None = None
        self._new_paragraph()

    def _new_paragraph(self) -> None:
        if self.cur and self.cur["nodes"]:
            text = _norm("".join(self.cur["nodes"]).strip())
            self.out.append(
                {
                    "text": text,
                    "chars_in_links": self.cur["cil"],
                    "dom_path": self.cur["dom_path"],
                }
            )
        self.cur = {"dom_path": ".".join(self.path), "nodes": [], "cil": 0}

    # -- tag events ----------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in KILL_TAGS:
            self.kill.append(tag)
            return
        if self.kill:
            return
        if tag not in VOID_TAGS:
            self.path.append(tag)
        if tag in PARAGRAPH_TAGS or (tag == "br" and self.br):
            # NB: self.br deliberately NOT reset here — <br><br><br>
            # produces a break per extra <br> (core.py:170-176 keeps
            # the flag set through the separator branch)
            self._new_paragraph()
        else:
            self.br = tag == "br"
            if self.br:
                self.cur["nodes"].append(" ")  # core.py:179-180
            elif tag == "a":
                self.link = True

    def handle_endtag(self, tag: str) -> None:
        if tag in KILL_TAGS:
            if self.kill and self.kill[-1] == tag:
                self.kill.pop()
            elif tag in self.kill:
                del self.kill[self.kill.index(tag)]
            return
        if self.kill:
            return
        if tag not in VOID_TAGS and tag in self.path:
            # pop to the most recent occurrence (tag-soup recovery)
            del self.path[len(self.path) - 1 - self.path[::-1].index(tag):]
        if tag in PARAGRAPH_TAGS:
            self._new_paragraph()
        if tag == "a":
            self.link = False

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)
        if tag not in VOID_TAGS:
            self.handle_endtag(tag)

    def handle_data(self, data: str) -> None:
        if self.kill or not data or data.isspace():
            return
        text = _norm(data)
        self.cur["nodes"].append(text)
        if self.link:
            self.cur["cil"] += len(text)
        self.br = False

    def close(self) -> list[dict]:  # endDocument (core.py:196-197)
        super().close()
        self._new_paragraph()
        return self.out


def html_to_paragraphs_py(html: str) -> list[dict]:
    """Single-doc twin: raw HTML -> [{text, chars_in_links, dom_path}]
    in document order (only text-bearing paragraphs, like the
    reference's contains_text gate)."""
    p = _ParagraphParser()
    p.feed(html or "")
    return p.close()


PARA_SCHEMA = (
    "doc_id long, pos int, text string, chars_in_links int, dom_path string"
)


def html_paragraphs(
    docs: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Distributed walk: (doc_id, html) -> one row per paragraph
    (doc_id, pos, text, chars_in_links, dom_path) — the exact input
    shape of operators/extract.py classify/revise/extract. Arrow-batched
    1->N fan-out; stdlib parser, no lxml. A document whose HTML the
    parser cannot process yields no rows (html.parser recovers from tag
    soup, so this is effectively only null input)."""

    def gen(batches):
        for pdf in batches:
            ids, poss, texts, cils, paths = [], [], [], [], []
            for doc_id, html in zip(pdf[id_col], pdf[html_col]):
                try:
                    paras = html_to_paragraphs_py(html)
                except Exception:  # noqa: BLE001 — skip undecodable docs
                    continue
                for i, p in enumerate(paras):
                    ids.append(doc_id)
                    poss.append(i)
                    texts.append(p["text"])
                    cils.append(p["chars_in_links"])
                    paths.append(p["dom_path"])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "pos": pd.Series(poss, dtype="int32"),
                    "text": pd.Series(texts, dtype="object"),
                    "chars_in_links": pd.Series(cils, dtype="int32"),
                    "dom_path": pd.Series(paths, dtype="object"),
                }
            )

    return docs.select(id_col, html_col).mapInPandas(gen, schema=PARA_SCHEMA)


def extract_content_from_html(
    docs: DataFrame, html_col: str = "html", id_col: str = "doc_id", **kwargs
) -> DataFrame:
    """Raw HTML -> (doc_id, content): the COMPLETE jusText pipeline —
    stdlib DOM walk + context-free classification + context-sensitive
    revision + good-paragraph extraction (operators/extract.py)."""
    from mwmbl_spark.operators.extract import extract_content

    return extract_content(html_paragraphs(docs, html_col, id_col), **kwargs)
