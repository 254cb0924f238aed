"""Weighted domain PageRank over the crawl link graph.

The reference's domain prior is a STATIC external table
(/root/reference/mwmbl/tinysearchengine/hn_top_domains_filtered.py,
7,859 lines of baked-in scores) min-max normalized into the heuristic
(rank.py:168-179). A crawl already produces the signal that table
approximates: the domain link graph (operators/urls.domain_link_graph,
update_urls.record_urls). This operator derives the prior from the
crawl's own structure — weighted PageRank with a fixed iteration count:

    r_0(d)   = 1
    r_k+1(d) = (1 - damping) + damping * sum over in-edges (s -> d) of
               r_k(s) * n_links(s,d) / w_out(s)

(the classic power iteration on the weighted adjacency, dangling mass
dropped — the oracle states the identical recursion, so exactness is
against the stated definition, gated to 6 decimals like every float
aggregation contract).

Scale shape: each iteration is one join edges ⋈ ranks on src (domain
count is ~1e8 at web scale — a plain shuffled hash join; ranks fit
memory per partition) + one groupBy(dst) partial-agg. Lineage is cut
per iteration with an eager localCheckpoint (same pattern as
ivf_train); on a cluster this is a checkpoint/staging table. The
min-max normalization to feed ``score_heuristic(domain_scores=...)``
is ``normalized_domain_scores``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85


def domain_pagerank(
    edges: DataFrame, n_iter: int = 3, damping: float = DAMPING
) -> DataFrame:
    """edges: (src_domain, dst_domain, n_links) -> (domain, rank).
    Deterministic fixed-iteration weighted PageRank."""
    src = F.col("src_domain")
    dst = F.col("dst_domain")
    nodes = (
        edges.select(src.alias("domain"))
        .unionByName(edges.select(dst.alias("domain")))
        .distinct()
    )
    out_w = edges.groupBy("src_domain").agg(F.sum("n_links").alias("w_out"))
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(n_iter):
        contrib = (
            edges.join(ranks, edges["src_domain"] == ranks["domain"])
            .join(out_w, "src_domain")
            .select(
                dst.alias("domain"),
                (F.col("rank") * F.col("n_links") / F.col("w_out")).alias("c"),
            )
            .groupBy("domain")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.join(contrib, "domain", "left")
            .select(
                "domain",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)  # cut the per-iteration lineage
        )
    return ranks


def normalized_domain_scores(
    ranks: DataFrame, top_n: int | None = None
) -> dict[str, float]:
    """Min-max normalize (rank.py:168-179 semantics) and collect into
    the dict shape ``score_heuristic(domain_scores=...)`` and
    ``ltr_featurize`` consume. Driver-side by design: the heuristic
    broadcasts this dict exactly like the reference's DOMAINS table.
    ``top_n`` collects only the head (highest-ranked domains,
    deterministic domain tiebreak) — at web scale the full domain table
    is ~1e8 rows and only the head carries prior signal; normalization
    is then min-max over the COLLECTED head (the table the scorer sees),
    matching the reference's behavior of normalizing over whatever
    table it is given."""
    if top_n is not None:
        ranks = ranks.orderBy(F.desc("rank"), F.asc("domain")).limit(top_n)
    rows = ranks.collect()
    if not rows:
        return {}
    vals = [float(r["rank"]) for r in rows]
    lo, hi = min(vals), max(vals)
    if hi == lo:
        return {r["domain"]: 0.0 for r in rows}
    return {r["domain"]: (float(r["rank"]) - lo) / (hi - lo) for r in rows}
