"""Result formatting & highlighting (reference P7,
/root/reference/mwmbl/format.py:40-115).

Exact twins of the reference semantics:
- highlight pattern = ``\\b``-bounded alternation of the query tokens
  minus HIGHLIGHT_STOPWORDS, is_complete=True (format.py:73-77);
- segments alternate plain/bold at regex match span boundaries
  (format.py:40-56);
- v2 merges consecutive bold segments across whitespace gaps into
  phrases, sorted by length desc (format.py:81-99), and scores
  ``1/position`` (format.py:102-115);
- document source labels from DocumentState (format.py:7-15,36-37).

Runs as ``mapInPandas`` over the FINAL top-k only (tiny), after all
heavy plan stages.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from mwmbl_spark.functions.tokenize import clean_unicode_py, tokenize_py
from mwmbl_spark.operators.heuristic import get_query_regex_py

HIGHLIGHT_STOPWORDS = {
    "a", "an", "the", "this", "that", "these", "those", "each", "every", "some", "any",
    "to", "in", "on", "at", "by", "for", "with", "about", "against", "between",
    "into", "through", "during", "before", "after", "above", "below", "from",
    "up", "down", "of", "off", "over", "under",
    "and", "but", "or", "nor", "yet", "so", "although", "because", "since", "unless",
    "is", "am", "are", "was", "were", "be", "been", "being", "have", "has", "had",
    "do", "does", "did", "i", "me", "my", "you", "your", "he", "him", "his",
    "she", "her", "it", "its", "we", "us", "our", "they", "them", "their",
    "how", "what", "which", "who", "whom", "where", "when", "why",
}

DOCUMENT_SOURCES = {
    3: "google", 2: "user", 4: "wikipedia",
    7: "mwmbl", 9: "google", 8: "user", 10: "wikipedia",
}


def get_document_source_py(state: int | None) -> str:
    return DOCUMENT_SOURCES.get(state, "mwmbl")


def highlight_pattern_py(query: str) -> str:
    tokens = [t for t in tokenize_py(query) if t not in HIGHLIGHT_STOPWORDS]
    return get_query_regex_py(tokens, True, True)


def highlight_segments_py(pattern: str, content: str) -> list[dict]:
    """format.py:40-56: split content at match span boundaries; odd
    segments are bold."""
    content = clean_unicode_py(content) if content else ""
    if not pattern:
        return [{"value": content, "is_bold": False}] if content else []
    matches = re.finditer(pattern, content, re.IGNORECASE)
    spans = [0] + sum((list(m.span()) for m in matches), []) + [len(content)]
    out = []
    for i in range(len(spans) - 1):
        if spans[i + 1] - spans[i] > 0:
            out.append({"value": content[spans[i]: spans[i + 1]], "is_bold": i % 2 == 1})
    return out


def extract_highlights_py(segments: list[dict]) -> list[str]:
    """format.py:81-99: merge consecutive bold segments across
    whitespace gaps, unique, sorted by length desc."""
    phrases, current = [], []
    for seg in segments:
        if seg["is_bold"]:
            current.append(seg["value"])
        elif current and not seg["value"].strip():
            current.append(seg["value"])
        else:
            if current:
                phrases.append("".join(current).strip())
                current = []
    if current:
        phrases.append("".join(current).strip())
    return sorted(set(phrases), key=len, reverse=True)


def format_result_v2_py(title: str, extract: str, url: str, state: int | None, position: int, query: str) -> dict:
    pattern = highlight_pattern_py(query)
    t_segs = highlight_segments_py(pattern, title or "")
    e_segs = highlight_segments_py(pattern, extract or "")
    return {
        "url": url,
        "title": "".join(s["value"] for s in t_segs),
        "title_highlights": extract_highlights_py(t_segs),
        "content": "".join(s["value"] for s in e_segs),
        "content_highlights": extract_highlights_py(e_segs),
        "engine": get_document_source_py(state),
        "score": 1.0 / position,
    }


FORMAT_OUT_SCHEMA = (
    "query_id long, rank int, url string, title string, "
    "title_highlights array<string>, content string, "
    "content_highlights array<string>, engine string, score double"
)


def format_results(topk: DataFrame, queries: dict[int, str]) -> DataFrame:
    """Format a final top-k DataFrame (query_id, rank, title, url,
    extract, state) — Arrow-batched over the tiny result set."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                state = None if pd.isna(getattr(r, "state", None)) else int(r.state)
                f = format_result_v2_py(
                    r.title, r.extract, r.url, state, int(r.rank), queries[int(r.query_id)]
                )
                rows.append(
                    (int(r.query_id), int(r.rank), f["url"], f["title"],
                     f["title_highlights"], f["content"], f["content_highlights"],
                     f["engine"], f["score"])
                )
            yield pd.DataFrame(
                rows,
                columns=["query_id", "rank", "url", "title", "title_highlights",
                         "content", "content_highlights", "engine", "score"],
            )

    return topk.mapInPandas(batches, schema=FORMAT_OUT_SCHEMA)
