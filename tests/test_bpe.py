"""BPE vocabulary learning + subword encoding (operators/bpe.py).

Gates: (1) the learned merges on a hand-checkable corpus are exactly
the classic algorithm's output; (2) the DISTRIBUTED learning path is
merge-for-merge identical to the driver fast path; (3) encoding via
the lowest-rank loop equals an independent replay-the-merge-list
reference on every distinct token; (4) greedy-overlap and early-stop
semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mwmbl_spark.operators.bpe import (
    END_OF_WORD,
    _merge_once,
    bpe_encode,
    learn_bpe,
    merges_table,
    word_counts,
)
from mwmbl_spark.synth import synth_transcripts, with_doc_id


@pytest.fixture(scope="module")
def docs(spark):
    return (
        with_doc_id(synth_transcripts(spark, n_conv=40, turns_per_conv=4, seed=7))
        .select("doc_id", "text")
        .cache()
    )


def _wc(spark, pairs):
    return spark.createDataFrame(pairs, "word string, n long")


def test_hand_checked_merges(spark):
    """Sennrich's own illustrative corpus shape: {low:5, lower:2,
    newest:6, widest:3}. First merges are forced by the counts and the
    (count desc, pair asc) tie-break and can be verified by hand:
    'es' (9: newest+widest), then 'est' (9), then 'est</w>' (9),
    then 'lo' (7: low+lower)."""
    wc = _wc(spark, [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)])
    merges = learn_bpe(wc, n_merges=4, min_count=1)
    assert merges == [("e", "s"), ("es", "t"), ("est", END_OF_WORD), ("l", "o")]


def test_greedy_overlap():
    assert _merge_once(list("aaaa"), "a", "a", "aa") == ["aa", "aa"]
    assert _merge_once(list("aaa"), "a", "a", "aa") == ["aa", "a"]
    # scan resumes after the merged symbol (no re-read of its tail)
    assert _merge_once(["x", "a", "a", "a"], "a", "a", "aa") == ["x", "aa", "a"]


def test_min_count_early_stop(spark):
    wc = _wc(spark, [("ab", 1), ("cd", 1)])
    # every pair occurs once: with min_count=2 nothing merges
    assert learn_bpe(wc, n_merges=10, min_count=2) == []
    # with min_count=1 the tie-break picks the lexicographically first
    merges = learn_bpe(wc, n_merges=1, min_count=1)
    assert merges == [("a", "b")]


def test_distributed_path_parity(spark, docs):
    """driver_threshold=0 forces the Spark iteration loop; merges must
    be IDENTICAL to the classic driver algorithm (integer counts +
    shared tie-break make this exact, not approximate)."""
    wc = word_counts(docs).cache()
    want = learn_bpe(wc, n_merges=25, min_count=2)
    got = learn_bpe(wc, n_merges=25, min_count=2, driver_threshold=0,
                    checkpoint_every=5)
    assert got == want
    assert len(want) == 25  # synthetic corpus is rich enough


def _encode_replay(tok: str, merges) -> list[str]:
    """Independent reference: replay the merge list IN LEARNED ORDER
    (training-time semantics) instead of the lowest-rank loop."""
    syms = list(tok) + [END_OF_WORD]
    for left, right in merges:
        if left in syms:
            syms = _merge_once(syms, left, right, left + right)
    return syms


def test_encode_equals_replay_reference(spark, docs):
    merges = learn_bpe(word_counts(docs), n_merges=40, min_count=2)
    enc = bpe_encode(docs, merges)
    rows = enc.join(docs, "doc_id").select("doc_id", "text", "subwords").collect()
    from mwmbl_spark.functions.tokenize import tokenize_py

    assert rows
    for r in rows[:100]:
        want = [s for t in tokenize_py(r["text"]) for s in _encode_replay(t, merges)]
        assert list(r["subwords"]) == want, r["doc_id"]


def test_encode_roundtrip_and_budget(spark, docs):
    """Subwords re-concatenate to the original tokens (lossless), and
    n_subwords is the real token budget (== len(subwords))."""
    merges = learn_bpe(word_counts(docs), n_merges=30, min_count=2)
    enc = bpe_encode(docs, merges)
    joined = enc.join(docs, "doc_id")
    # n_subwords integrity checked corpus-wide (JVM expression)...
    assert joined.where(F.size("subwords") != F.col("n_subwords")).count() == 0
    # ...roundtrip row-wise (string surgery beats SQL here)
    rows = joined.select("text", "subwords").collect()
    from mwmbl_spark.functions.tokenize import tokenize_py

    for r in rows[:100]:
        glued = "".join(r["subwords"]).replace(END_OF_WORD, " ").split()
        assert glued == tokenize_py(r["text"])


from hypothesis import given, settings
from hypothesis import strategies as st

_WORD = st.text(alphabet="abc", min_size=1, max_size=12)


@settings(max_examples=200, deadline=None)
@given(
    corpus=st.lists(_WORD, min_size=1, max_size=30),
    token=_WORD,
    n_merges=st.integers(min_value=0, max_value=24),
)
def test_fuzz_encode_equals_replay(corpus, token, n_merges):
    """Property: the lowest-rank encoding loop == replaying the merge
    list in learned order, for ANY vocabulary learned from ANY corpus
    over a tiny alphabet (maximizing merge interactions/overlaps) and
    ANY token — plus losslessness of the encoding."""
    from mwmbl_spark.operators.bpe import _encode_token, _pure_bpe

    wc = {}
    for w in corpus:
        wc[w] = wc.get(w, 0) + 1
    merges = _pure_bpe(sorted(wc.items()), n_merges, min_count=1)
    ranks = {m: i for i, m in enumerate(merges)}
    got = _encode_token(token, ranks)
    assert got == _encode_replay(token, merges)
    assert "".join(got) == token + END_OF_WORD  # lossless


# ---------------------------------------------------------------------------
# batched learning (round-5: O(n_merges/batch) Spark jobs)
# ---------------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(
    corpus=st.lists(_WORD, min_size=1, max_size=30),
    n_merges=st.integers(min_value=0, max_value=24),
    cand=st.integers(min_value=1, max_value=64),
)
def test_fuzz_batched_at_one_equals_classic(corpus, n_merges, cand):
    """Property: batch=1 degenerates EXACTLY to classic serial BPE for
    any corpus and any candidate-window size (the top-1 candidate is
    always accepted, so the window never matters)."""
    from mwmbl_spark.operators.bpe import _pure_bpe, _pure_bpe_batched

    wc = {}
    for w in corpus:
        wc[w] = wc.get(w, 0) + 1
    words = sorted(wc.items())
    assert _pure_bpe_batched(words, n_merges, 1, 1, cand) == _pure_bpe(
        words, n_merges, 1
    )


def test_batch_selection_symbol_disjoint():
    from mwmbl_spark.operators.bpe import _select_batch

    cands = [
        (("t", "h"), 100),
        (("h", "e"), 90),   # shares 'h' with accepted (t,h) -> skipped
        (("e", "r"), 80),
        (("th", "e"), 70),  # 'th' == joined of (t,h) -> skipped
        (("o", "u"), 60),
        (("x", "y"), 1),    # below min_count -> stops the scan
        (("p", "q"), 1),
    ]
    got = _select_batch(cands, n_take=10, min_count=2)
    assert got == [("t", "h"), ("e", "r"), ("o", "u")]
    assert _select_batch(cands, n_take=2, min_count=2) == [("t", "h"), ("e", "r")]
    assert _select_batch([], 5, 1) == []


def test_batched_distributed_parity(spark, docs):
    """distributed batched path == driver batched twin, merge-for-merge
    (shared _select_batch + integer counts make it exact)."""
    wc = word_counts(docs).cache()
    want = learn_bpe(wc, n_merges=24, min_count=2, batch=8)
    from mwmbl_spark.operators.bpe import LAST_LEARN_STATS

    assert LAST_LEARN_STATS["path"] == "driver"
    got = learn_bpe(
        wc, n_merges=24, min_count=2, batch=8, driver_threshold=0,
        checkpoint_every=2,
    )
    stats = dict(LAST_LEARN_STATS)
    assert stats["path"] == "distributed"
    assert got == want
    assert len(got) == 24
    # the job economy IS the feature: 24 merges in <= ceil(24/8) rounds
    # + count + initial checkpoint + periodic checkpoints — far under
    # the one-job-per-merge regime
    assert stats["rounds"] <= 3
    assert stats["jobs"] <= 2 + stats["rounds"] * 2


def test_batched_vocab_overlap_with_serial(spark, docs):
    """Quality sanity (not a parity gate — batched BPE legitimately
    reorders near-tie merges): on the synthetic corpus, whose w0000-
    style words are maximally chain-heavy (serial BPE's favorite
    merges all share symbols, the batched path's worst case), the
    64-merge vocabularies still agree on >= 45% of merges (measured
    0.547; natural-text overlap is higher — recorded in
    BENCH/BASELINE.md)."""
    wc = word_counts(docs).cache()
    serial = learn_bpe(wc, n_merges=64, min_count=2)
    batched = learn_bpe(wc, n_merges=64, min_count=2, batch=8)
    overlap = len(set(batched) & set(serial)) / len(serial)
    assert overlap >= 0.45, overlap


def test_sampled_path(spark):
    from mwmbl_spark.operators.bpe import LAST_LEARN_STATS, _pure_bpe_batched

    rows = [(f"word{i:04d}", 1000 - i) for i in range(100)]
    wc = _wc(spark, rows)
    got = learn_bpe(wc, n_merges=10, min_count=1, sample_words=20)
    assert LAST_LEARN_STATS["path"] == "sampled"
    want = _pure_bpe_batched(rows[:20], 10, 1, 1, 64)
    assert got == want
    # sample >= vocab: falls through to the exact driver path
    got_all = learn_bpe(wc, n_merges=10, min_count=1, sample_words=1000)
    assert LAST_LEARN_STATS["path"] == "driver"
    assert got_all == learn_bpe(wc, n_merges=10, min_count=1)


def test_merges_table_artifact(spark):
    wc = _wc(spark, [("low", 5), ("newest", 6)])
    merges = learn_bpe(wc, n_merges=3, min_count=1)
    t = merges_table(spark, merges)
    got = [(int(r["rank"]), r["left"], r["right"]) for r in t.orderBy("rank").collect()]
    assert got == [(i, a, b) for i, (a, b) in enumerate(merges)]


def test_empty_corpus(spark):
    wc = _wc(spark, [])
    assert learn_bpe(wc, n_merges=5) == []
