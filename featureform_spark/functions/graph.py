"""Connected components over a pair/edge table — the clustering step
of a dedup pipeline (LSH/fingerprint pairs -> duplicate groups with a
canonical representative per group).

Algorithm: iterative min-label propagation with one hop of pointer
compression per round (label <- parent's label), which converges in
O(log(diameter)) rounds instead of O(diameter). Each round is two hash
joins + a partial-aggregated groupBy; lineage is truncated with
localCheckpoint so plans stay flat across iterations (the classic
iterative-Spark trap). Convergence is detected by counting rows whose
label changed this round (the old label rides along as a column, so
the check is a filter+count on the frame we just checkpointed — no
extra join, and it works for ANY node id type, unlike a numeric
label-sum which NULLs out on string ids).

At 100 TB scale the same loop holds (this is the alternating-star
family of MapReduce CC algorithms); the per-round shuffle is keyed by
node id, so AQE handles skewed super-nodes.

No reference parity: featureform has no graph surface; this backs the
beyond-reference dedup layer (SURVEY.md §8.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    materialize_edges: bool = False,
    small_graph_threshold: int = 500_000,
) -> DataFrame:
    """(id, cluster_id) for every node in ``edges``; cluster_id is the
    minimum node id in the component.

    **Small-graph fast path**: dedup pair graphs are usually tiny
    (bounded by near-duplicate count, not corpus size), and each
    distributed label-propagation round costs 2 joins + an action of
    fixed overhead. When the edge list fits under
    ``small_graph_threshold`` rows (probed with a bounded
    limit-collect, so the check never pulls more than threshold+1
    rows), CC runs as driver-side union-find — exact same min-label
    result, one job instead of O(log d) rounds. Bigger graphs take the
    distributed loop below, which holds at any scale.

    ``materialize_edges=True`` eagerly materializes the edge projection
    BEFORE symmetrizing: the union reads it from both branches, so an
    expensive edge lineage (an LSH candidate pipeline) would otherwise
    be evaluated twice. Callers with cheap edge plans (a scan + a join)
    should leave it off — the eager pass costs more than recomputing.
    """
    from pyspark.sql import types as T

    base = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))

    if small_graph_threshold > 0:
        # probe BEFORE materializing: the limit-collect evaluates the
        # edge lineage once, and on the (common) small-graph path the
        # checkpoint job would be pure overhead — the collected rows ARE
        # the materialization. Only the big-graph path below, whose loop
        # re-reads the edges O(log d) times, pays for a checkpoint.
        probe = base.limit(small_graph_threshold + 1).collect()
        if len(probe) <= small_graph_threshold:
            parent: dict = {}

            def find(x):
                r = x
                while parent.get(r, r) != r:
                    r = parent[r]
                while parent.get(x, x) != x:  # path compression
                    parent[x], x = r, parent[x]
                return r

            for row in probe:
                a, b = row["a"], row["b"]
                ra, rb = find(a), find(b)
                if ra != rb:
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo  # min id stays the root
            nodes = {v for row in probe for v in (row["a"], row["b"])}
            dtype = base.schema["a"].dataType
            out_schema = T.StructType(
                [
                    T.StructField("id", dtype),
                    T.StructField("cluster_id", dtype),
                ]
            )
            from featureform_spark.sources.local_df import local_df

            # LocalRelation, not a pickled-python LogicalRDD: the
            # result feeds a (broadcast) anti join, and every
            # evaluation of an RDD-backed frame launches a python
            # worker task just to re-deserialize these rows
            return local_df(
                edges.sparkSession,
                [(n, find(n)) for n in sorted(nodes)],
                out_schema,
            )
    base = base.localCheckpoint(eager=materialize_edges)
    sym = base.union(base.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.distinct().localCheckpoint(eager=False)

    labels = (
        sym.select(F.col("a").alias("id")).distinct().withColumn("label", F.col("id"))
    ).localCheckpoint(eager=False)

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy(sym["a"].alias("nid"))
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = (
            labels.join(nbr_min, labels["id"] == nbr_min["nid"], "left")
            .select(
                labels["id"],
                labels["label"].alias("_old"),
                F.least(
                    labels["label"], F.coalesce("nbr_label", labels["label"])
                ).alias("label"),
            )
        )
        # pointer compression: follow one parent hop (labels are node
        # ids, so the parent row always exists)
        parent = stepped.select(
            F.col("id").alias("pid"), F.col("label").alias("plabel")
        )
        labels = (
            stepped.join(parent, stepped["label"] == parent["pid"], "left")
            .select(
                stepped["id"],
                stepped["_old"],
                F.coalesce("plabel", stepped["label"]).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        changed = labels.filter(F.col("label") != F.col("_old")).count()
        labels = labels.drop("_old")
        if changed == 0:
            break
    return labels.select(F.col("id"), F.col("label").alias("cluster_id"))
