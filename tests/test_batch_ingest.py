"""Crawl-batch ingest source (gzip JSON -> Documents)."""

from __future__ import annotations

import gzip
import json

from mwmbl_spark.sources.batches import documents_from_batches, read_batches


def test_batch_ingest_skips_link_only_and_converts_ts(spark, tmp_path):
    batch = {
        "user_id_hash": "abc",
        "timestamp": 1.0,
        "items": [
            {"url": "http://a.ex", "status": 200, "timestamp": 1700000000000.0,
             "content": {"title": "A", "extract": "text a", "links_only": False}},
            {"url": "http://links.ex", "status": 200, "timestamp": 1.0,
             "content": {"title": "L", "extract": "", "links_only": True}},
            {"url": "http://err.ex", "status": 404, "timestamp": 1.0,
             "content": None, "error": {"name": "AbortError", "message": "x"}},
            {"url": "http://b.ex", "status": 200, "timestamp": 1700000123456.0,
             "content": {"title": "B", "extract": "text b", "links_only": None}},
        ],
    }
    path = tmp_path / "batches"
    path.mkdir()
    with gzip.open(path / "b0.json.gz", "wt") as f:
        f.write(json.dumps(batch))

    docs = documents_from_batches(read_batches(spark, str(path))).collect()
    by_url = {r["url"]: r for r in docs}
    # link-only and content-less items skipped
    assert set(by_url) == {"http://a.ex", "http://b.ex"}
    # ms -> s conversion (index_batches.py:44)
    assert by_url["http://a.ex"]["last_crawled"] == 1700000000
    assert by_url["http://b.ex"]["last_crawled"] == 1700000123
    assert by_url["http://a.ex"]["title"] == "A"
