"""Gopher-style repetition signals for training-corpus curation.

The reference carries no repetition analytics (its only text analytics
are the stopword sets and tf-idf features,
/root/reference/mwmbl/tinysearchengine/rank.py:81-122); these implement
the standard repeated-n-gram quality filters of the public Gopher
(Rae et al. 2021, arXiv:2112.11446, appendix A1.1) / C4 lineage as
distributed aggregations over the documents table:

- ``top_{bi,tri}gram_frac`` — count of the document's most frequent
  n-gram over its total n-gram count. (Gopher weights by characters;
  the occurrence-count form keeps the DuckDB oracle exact and the
  filter semantics equivalent — both spike on boilerplate.)
- ``dup_{bi,tri}gram_frac`` — fraction of n-gram occurrences whose
  gram occurs more than once in the document.

Plan shape (the 100 TB lens): ONE explode of tagged n-grams, then two
hash aggregations — (doc_id, n, gram) then (doc_id) with conditional
aggregates instead of a pivot — both with map-side partial
aggregation. No window, no self-join, no Python at the Spark boundary.
The final left join (broadcast-eligible agg side only at toy scale;
co-partitioned on doc_id otherwise) restores gram-free docs with
zeroed signals so the output covers every input row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ngrams_expr(toks: Column, n: int) -> Column:
    """All order-``n`` token grams as space-joined strings.

    Guarded: ``sequence(1, size-n+1)`` DESCENDS when size < n (Spark
    auto-steps -1 for start > stop), which would fabricate grams from
    out-of-range ``element_at`` nulls — short docs return [] instead.
    """
    seq = F.sequence(F.lit(1), F.size(toks) - n + 1)
    gram = lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])  # noqa: E731
    return F.when(F.size(toks) >= n, F.transform(seq, gram)).otherwise(
        F.array().cast("array<string>")
    )


def _sorted_run_stats(g_sorted: Column) -> Column:
    """struct(top long, dup long) over a SORTED gram array in one
    ``aggregate`` pass: ``top`` = the longest equal run (= the count of
    the most frequent gram), ``dup`` = total length of runs longer than
    one (= occurrences of grams appearing more than once). Empty arrays
    yield (0, 0)."""
    zero = F.lit(0).cast("long")
    acc0 = F.struct(
        F.lit("").alias("prev"),
        zero.alias("run"),
        zero.alias("top"),
        zero.alias("dup"),
    )

    def step(acc, x):
        same = acc["prev"] == x
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + F.lit(1)).otherwise(F.lit(1))
            .cast("long")
            .alias("run"),
            F.when(same, acc["top"])
            .otherwise(F.greatest(acc["top"], acc["run"]))
            .cast("long")
            .alias("top"),
            F.when(~same & (acc["run"] > 1), acc["dup"] + acc["run"])
            .otherwise(acc["dup"])
            .cast("long")
            .alias("dup"),
        )

    def fin(acc):
        return F.struct(
            F.greatest(acc["top"], acc["run"]).alias("top"),
            F.when(acc["run"] > 1, acc["dup"] + acc["run"])
            .otherwise(acc["dup"])
            .alias("dup"),
        )

    return F.aggregate(g_sorted, acc0, step, fin)


def repetition_features(
    docs: DataFrame, id_col: str = "doc_id", toks_col: str = "toks"
) -> DataFrame:
    """(doc_id, n_bigrams, top_bigram_frac, dup_bigram_frac,
    n_trigrams, top_trigram_frac, dup_trigram_frac) per document.

    Fractions are 0.0 for documents with no grams of that order; all
    fractions rounded to 6 decimals (single-division float, stable
    across engines).

    Plan shape (r7): every signal is a function of the document's OWN
    gram multiset, so the former explode -> (doc, n, gram) count ->
    (doc) rollup -> join-back — two corpus-wide shuffles plus a join
    whose only purpose was re-attaching per-row math to its row — is
    now a PER-ROW expression: sort the gram array, fold it once with a
    run-length ``aggregate`` (the count of the most frequent gram is
    the longest equal run; duplicated occurrences are runs longer than
    one). ZERO exchanges at any corpus size, no skew surface, and the
    gram-count arithmetic — and therefore every rounded fraction — is
    identical by construction (plan-asserted shuffle-free in
    tests/test_plan_quality.py)."""
    toks = F.col(toks_col)

    def frac(num: Column, den: Column) -> Column:
        return F.round(
            F.coalesce(num.cast("double") / F.when(den > 0, den), F.lit(0.0)), 6
        )

    n2 = F.when(F.size(toks) >= 2, F.size(toks) - 1).otherwise(F.lit(0))
    n3 = F.when(F.size(toks) >= 3, F.size(toks) - 2).otherwise(F.lit(0))
    s2 = _sorted_run_stats(F.sort_array(ngrams_expr(toks, 2)))
    s3 = _sorted_run_stats(F.sort_array(ngrams_expr(toks, 3)))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n2.cast("long").alias("n_bigrams"),
        frac(s2["top"], n2).alias("top_bigram_frac"),
        frac(s2["dup"], n2).alias("dup_bigram_frac"),
        n3.cast("long").alias("n_trigrams"),
        frac(s3["top"], n3).alias("top_trigram_frac"),
        frac(s3["dup"], n3).alias("dup_trigram_frac"),
    )


def remove_duplicate_spans(
    docs: DataFrame,
    n: int = 50,
    id_col: str = "doc_id",
    toks_col: str = "toks",
    keep_first: bool = False,
) -> DataFrame:
    """The REMOVAL transform behind ``duplicated_span_stats`` (Lee et
    al. 2022, arXiv:2107.06499 §4 — exact substring dedup): drop every
    token covered by an order-``n`` window whose gram occurs MORE THAN
    ONCE in the corpus (within-doc repeats count, as in the stats
    twin). Returns (doc_id, n_tokens, n_removed, text_clean) for every
    input doc — text_clean is the surviving tokens re-joined; docs
    shorter than ``n`` tokens pass through untouched.

    DEVIATION from Lee et al. §4 when ``keep_first=False`` (the
    default, and the span_dedup contract's shape): ALL copies of a
    duplicated span are removed, including the first/original — a
    document whose full text is duplicated once elsewhere is emptied
    entirely. This matches ``duplicated_span_stats`` (which counts
    every occurrence) but is stricter than the paper, which keeps one
    copy. ``keep_first=True`` restores the paper's semantics: the
    lowest (doc_id, position) occurrence of each duplicated gram is
    exempt, so one copy of each span survives. The exemption costs no
    extra shuffle — the per-hash first occurrence rides the same
    groupBy(h) aggregate as the count.

    Plan shape (100 TB lens), LINEAR in every dimension: one posexplode
    of gram hashes (60-bit md5-derived — hashes shuffle, gram text
    never), a global hash count with map-side partials, a join back to
    occurrences, then coverage at EXPLODED (doc, position) grain — each
    duplicated window fans out to its n covered positions, tokens
    anti-join the covered set, and one per-doc aggregation reassembles
    survivors in position order. Total row volume is
    O(|corpus tokens| + n * |duplicated windows|); the per-doc state is
    never worse than the tokens column itself. (The first-cut HOF form
    evaluated `exists` over the start list PER TOKEN — O(len^2) on a
    boilerplate-saturated mega-doc, the exact single-doc-is-the-job
    hazard the per-doc PMI cap exists for — so the exploded plan is the
    right shape even though it pays two more hash shuffles at toy
    scale.)
    """
    from mwmbl_spark.operators.dedup import hash60

    toks = F.col(toks_col)
    occ = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(ngrams_expr(toks, n)).alias("p", "gram"),
    ).select(
        "doc_id",
        (F.col("p") + 1).cast("int").alias("s"),
        hash60(F.col("gram")).alias("h"),
    )
    freq = occ.groupBy("h").agg(
        F.count(F.lit(1)).alias("total"),
        F.min(F.struct("doc_id", "s")).alias("_first"),
    )
    dup_occ = occ.join(freq, "h").where(F.col("total") > 1)
    if keep_first:
        dup_occ = dup_occ.where(
            F.struct(F.col("doc_id"), F.col("s")) != F.col("_first")
        )
    covered = (
        dup_occ
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("s"), F.col("s") + F.lit(n - 1))).alias("j"),
        )
        .distinct()
    )
    toks_e = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(toks).alias("p", "tok"),
    ).select("doc_id", (F.col("p") + 1).cast("int").alias("j"), "tok")
    kept = toks_e.join(covered, ["doc_id", "j"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("_n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("_clean"),
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.size(toks).cast("long").alias("n_tokens")
    )
    return base.join(agg, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.coalesce("_n_kept", F.lit(0))).cast("long").alias(
            "n_removed"
        ),
        F.coalesce(F.col("_clean"), F.lit("")).alias("text_clean"),
    )


def duplicated_span_stats(
    docs: DataFrame, n: int = 50, id_col: str = "doc_id", toks_col: str = "toks"
) -> DataFrame:
    """(doc_id, n_windows, dup_window_frac): per document, the fraction
    of its order-``n`` token windows whose gram occurs anywhere else in
    the corpus — another position of the same document counts (the
    substring-duplication signal of Lee et al. 2022, arXiv:2107.06499
    §4: train-set quality drops with corpus-duplicated spans even when
    whole documents are distinct).

    Occurrences are NOT de-duplicated per doc: a window repeated twice
    inside one document is corpus-duplicated by definition. Plan: one
    gram explode (hashes only shuffle, never gram text), a global
    (hash) count with map-side partials, a shuffle join occurrences ⋈
    counts on the hash key — both sides hash-partitioned, no broadcast
    assumption since the hash table scales with the corpus — and a
    final per-doc aggregation. Fraction is a single division rounded
    to 6.
    """
    from mwmbl_spark.operators.dedup import hash60

    occ = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(ngrams_expr(F.col(toks_col), n)).alias("gram"),
    ).select("doc_id", hash60(F.col("gram")).alias("h"))
    freq = occ.groupBy("h").agg(F.count(F.lit(1)).alias("total"))
    per_doc = (
        occ.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum((F.col("total") > 1).cast("long")).alias("n_dup"),
        )
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    out = base.join(per_doc, "doc_id", "left")
    return out.select(
        "doc_id",
        F.coalesce(F.col("n_windows"), F.lit(0)).cast("long").alias("n_windows"),
        F.round(
            F.coalesce(
                F.col("n_dup").cast("double") / F.when(F.col("n_windows") > 0, F.col("n_windows")),
                F.lit(0.0),
            ),
            6,
        ).alias("dup_window_frac"),
    )
