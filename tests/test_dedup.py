

def test_incremental_equals_restricted_full(spark):
    """incremental_near_duplicates == the full pipeline's pairs
    restricted to those touching a changed doc (band_cap=None so no
    cap interaction clouds the equality), incl. changed-changed pairs
    counted once; empty change feed -> empty output."""
    from pyspark.sql import functions as F

    from mwmbl_spark.operators.dedup import (
        incremental_near_duplicates,
        minhash_near_duplicates,
    )
    from mwmbl_spark.synth import synth_transcripts, with_doc_id

    docs = with_doc_id(
        synth_transcripts(spark, n_conv=25, turns_per_conv=4, seed=13)
    ).select("doc_id", "text")
    # inject guaranteed near-dups across the changed/unchanged boundary
    clones = docs.where(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 5000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    corpus = docs.unionByName(clones)
    changed = corpus.where(
        (F.col("doc_id") >= 5000) | (F.col("doc_id") % 7 == 1)
    ).select("doc_id")
    full = minhash_near_duplicates(corpus, threshold=0.4, band_cap=None)
    ch_ids = {int(r["doc_id"]) for r in changed.collect()}
    want = sorted(
        (int(r["doc_a"]), int(r["doc_b"]), float(r["jaccard"]))
        for r in full.collect()
        if int(r["doc_a"]) in ch_ids or int(r["doc_b"]) in ch_ids
    )
    assert want  # the clone injection guarantees a non-trivial gate
    got = sorted(
        (int(r["doc_a"]), int(r["doc_b"]), float(r["jaccard"]))
        for r in incremental_near_duplicates(
            corpus, changed, threshold=0.4, band_cap=None
        ).collect()
    )
    assert got == want
    empty = changed.where(F.lit(False))
    assert incremental_near_duplicates(corpus, empty, threshold=0.4).count() == 0
