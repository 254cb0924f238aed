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


def repetition_features(
    docs: DataFrame, id_col: str = "doc_id", toks_col: str = "toks"
) -> DataFrame:
    """(doc_id, n_bigrams, top_bigram_frac, dup_bigram_frac,
    n_trigrams, top_trigram_frac, dup_trigram_frac) per document.

    Fractions are 0.0 for documents with no grams of that order; all
    fractions rounded to 6 decimals (single-division float, stable
    across engines).
    """
    toks = F.col(toks_col)

    def _tag(n: int):
        # NB: a second lambda arg (even a default) makes F.transform pass
        # the element INDEX into it — capture n via closure instead
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    tagged = F.concat(*[F.transform(ngrams_expr(toks, n), _tag(n)) for n in (2, 3)])
    base = docs.select(F.col(id_col).alias("doc_id"))
    per = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tagged).alias("g"))
        .groupBy("doc_id", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n_col, cnt = F.col("n"), F.col("cnt")
    agg = per.groupBy("doc_id").agg(
        *[
            c
            for n in (2, 3)
            for c in (
                F.sum(F.when(n_col == n, cnt).otherwise(F.lit(0))).alias(f"n{n}"),
                F.max(F.when(n_col == n, cnt)).alias(f"t{n}"),
                F.sum(
                    F.when((n_col == n) & (cnt > 1), cnt).otherwise(F.lit(0))
                ).alias(f"d{n}"),
            )
        ]
    )

    def frac(num: Column, den: Column) -> Column:
        return F.round(
            F.coalesce(num.cast("double") / F.when(den > 0, den), F.lit(0.0)), 6
        )

    out = base.join(agg, "doc_id", "left")
    return out.select(
        "doc_id",
        F.coalesce(F.col("n2"), F.lit(0)).cast("long").alias("n_bigrams"),
        frac(F.col("t2"), F.col("n2")).alias("top_bigram_frac"),
        frac(F.col("d2"), F.col("n2")).alias("dup_bigram_frac"),
        F.coalesce(F.col("n3"), F.lit(0)).cast("long").alias("n_trigrams"),
        frac(F.col("t3"), F.col("n3")).alias("top_trigram_frac"),
        frac(F.col("d3"), F.col("n3")).alias("dup_trigram_frac"),
    )


def remove_duplicate_spans(
    docs: DataFrame, n: int = 50, id_col: str = "doc_id", toks_col: str = "toks"
) -> DataFrame:
    """The REMOVAL transform behind ``duplicated_span_stats`` (Lee et
    al. 2022, arXiv:2107.06499 §4 — exact substring dedup): drop every
    token covered by an order-``n`` window whose gram occurs MORE THAN
    ONCE in the corpus (within-doc repeats count, as in the stats
    twin). Returns (doc_id, n_tokens, n_removed, text_clean) for every
    input doc — text_clean is the surviving tokens re-joined; docs
    shorter than ``n`` tokens pass through untouched.

    Plan shape (100 TB lens): one posexplode of gram hashes (60-bit
    md5-derived — hashes shuffle, gram text never), a global hash
    count with map-side partials, a hash-partitioned join back to
    occurrences, then ONE per-doc aggregation collecting the (bounded
    by doc length) duplicated-window start list; the token mask and
    reassembly are pure JVM higher-order functions over the tokens
    array — no Python, no window function, no self-join. The collected
    start array is at most |doc| ints, the same grain as the tokens
    column itself.
    """
    from mwmbl_spark.operators.dedup import hash60

    toks = F.col(toks_col)
    occ = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(ngrams_expr(toks, n)).alias("p", "gram"),
    ).select("doc_id", (F.col("p") + 1).alias("s"), hash60(F.col("gram")).alias("h"))
    freq = occ.groupBy("h").agg(F.count(F.lit(1)).alias("total"))
    dup_starts = (
        occ.join(freq, "h")
        .where(F.col("total") > 1)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("s")).alias("starts"))
    )
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
    joined = base.join(dup_starts, "doc_id", "left").select(
        "doc_id",
        "_toks",
        F.coalesce(F.col("starts"), F.array().cast("array<int>")).alias("starts"),
    )
    j_covered = lambda j: F.exists(  # noqa: E731 — token j sits in some
        # duplicated window [s, s+n-1]  <=>  s in [j-n+1, j]
        F.col("starts"), lambda s: (s >= j - F.lit(n - 1)) & (s <= j)
    )
    # sequence(1, 0) DESCENDS for an empty tokens array (the ngrams_expr
    # guard note) — fabricating index 1 on a 0-element array; gate it
    kept = F.when(
        F.size("_toks") > 0,
        F.filter(F.sequence(F.lit(1), F.size("_toks")), lambda j: ~j_covered(j)),
    ).otherwise(F.array().cast("array<int>"))
    return joined.select(
        "doc_id",
        F.size("_toks").cast("long").alias("n_tokens"),
        (F.size("_toks") - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(
            F.transform(kept, lambda j: F.element_at(F.col("_toks"), j)), " "
        ).alias("text_clean"),
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
