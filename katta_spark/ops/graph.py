"""Graph traversal over an edge table — Solr's GraphQuery parser
(`{!graph from=f to=t maxDepth=N}seed`) re-expressed as distributed
frontier expansion.

Reference parity: the Solr graph qparser walks from seed documents
along from->to field links up to maxDepth, returning every reached
document.  The reference exposes it through its SolrQuery
pass-through (katta-client/.../solr/, LuceneClient.java:255-276).

Spark-first shape: BFS by levels — each hop is ONE semi-join of the
edge table against the (small) current frontier, and the frontier is
always broadcast when it fits.  ``max_hops`` bounds the driver loop
(Solr's maxDepth, default 1 hop), so there is no unbounded iteration;
the visited set stays distributed (a union of per-hop distinct
frontiers, deduplicated once at the end).  At 100 TB the edge table
is the only big side and it is scanned once per hop with the join key
pruned by the broadcast frontier — never an all-pairs expansion."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def graph_expand(edges: DataFrame, src_col: str, dst_col: str,
                 seeds: list, max_hops: int = 2) -> DataFrame:
    """(node, hops) — every node reachable from ``seeds`` in at most
    ``max_hops`` directed steps, with the MINIMUM hop distance
    (seeds report 0).  Deterministic: distance is a property of the
    graph, not the traversal order."""
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    seed_df = edges.sparkSession.createDataFrame(
        [(s,) for s in seeds], [src_col]
    ).select(F.col(src_col).cast("string").alias("node")).distinct()
    e = edges.select(
        F.col(src_col).cast("string").alias("_s"),
        F.col(dst_col).cast("string").alias("_d"),
    )
    levels = [seed_df.withColumn("hops", F.lit(0))]
    frontier, visited = seed_df, seed_df
    for hop in range(1, int(max_hops) + 1):
        nxt = (
            e.join(
                F.broadcast(frontier.withColumnRenamed("node", "_s")),
                "_s",
            )
            .select(F.col("_d").alias("node"))
            .distinct()
            # drop already-visited nodes so cycles never re-expand —
            # the frontier shrinks monotonically on cyclic graphs
            .join(F.broadcast(visited), "node", "left_anti")
        )
        levels.append(nxt.withColumn("hops", F.lit(hop)))
        visited = visited.unionByName(nxt).distinct()
        frontier = nxt
    u = levels[0]
    for lv in levels[1:]:
        u = u.unionByName(lv)
    return (
        u.groupBy("node")
        .agg(F.min("hops").alias("hops"))
        .orderBy("hops", "node")
    )
