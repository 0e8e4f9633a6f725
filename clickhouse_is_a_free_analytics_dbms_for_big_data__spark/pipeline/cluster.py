"""Duplicate-group clustering: connected components over a near-dup
pair set, plus exact-recall candidate blocking via a shingle inverted
index.

A production dedup pipeline does not stop at pairs: to keep ONE
representative per duplicate *group* it must take the transitive
closure of the pair relation (a is-dup-of b, b is-dup-of c => {a,b,c}
is one group, even when a-c never met a candidate block).  The
reference ships the pairwise machinery (uniq/groupBy semantics); the
grouping step is the standard MapReduce connected-components
formulation (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC 2014 — we use the min-label-propagation variant, which
converges in graph-diameter rounds; dup graphs are shallow by
construction, so diameter is small).

Scale shape (100 TB):
- the edge set is the *pair* set — orders of magnitude smaller than
  the corpus (only near-dups appear);
- every iteration is ONE shuffle (join on node id + partial-agg min),
  `localCheckpoint` truncates lineage so round N does not replay
  rounds 1..N-1;
- convergence is detected with a cheap monotone metric (sum of
  labels strictly decreases until fixpoint), one tiny agg per round.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Node -> component label (the component's minimum node id).

    ``pairs`` is an undirected edge list; nodes that appear in no pair
    are absent from the output (callers union singletons back if they
    need total coverage).  Deterministic: labels are min node ids.
    """
    e = pairs.select(F.col(id_a).alias("s"), F.col(id_b).alias("d"))
    edges = (
        e.unionByName(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev: int | None = None
    for _ in range(max_iter):
        # candidate label per node: min over the neighbours' labels
        cand = (
            edges.join(
                labels.select(
                    F.col("node").alias("d"), F.col("label").alias("nbl")
                ),
                "d",
            )
            .groupBy("s")
            .agg(F.min("nbl").alias("cand"))
            .withColumnRenamed("s", "node")
        )
        labels = (
            labels.join(cand, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("cand"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        # DECIMAL sum: a BIGINT sum of ~1e12 64-bit node ids could
        # overflow to NULL, and NULL == NULL would fake convergence
        cur = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).first()[0]
        if prev is not None and cur == prev:
            break
        prev = cur
    return labels


def shingle_blocked_pairs(
    df: DataFrame,
    id_col: str,
    shingles_col: Column,
    threshold: float = 0.7,
    max_block: int = 200,
) -> DataFrame:
    """Exact-recall near-dup candidates via a shingle inverted index.

    Unlike MinHash banding (probabilistic recall), any two documents
    with Jaccard > 0 share at least one shingle, so an equi-join on
    the exploded shingle column has EXACT recall for every threshold.
    The cost model is sum(freq^2) over shingle blocks, so hot shingles
    (boilerplate) are capped at ``max_block`` — identical skew escape
    to the LSH banding path (dedup.py).  Candidates are then verified
    with the exact shingle-Jaccard, making the emitted pair set
    engine-independent and oracle-checkable.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded
    to 6 digits.
    """
    base = df.select(
        F.col(id_col).alias("nid"),
        F.array_distinct(shingles_col).alias("sh"),
    ).localCheckpoint(eager=True)
    posting = base.select(
        "nid", F.explode("sh").alias("tok")
    )
    hot = (
        posting.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") > max_block)
        .select("tok")
    )
    cold = posting.join(F.broadcast(hot), "tok", "left_anti")
    cand = (
        cold.alias("l")
        .join(cold.alias("r"), "tok")
        .filter(F.col("l.nid") < F.col("r.nid"))
        .select(
            F.col("l.nid").alias("id_a"), F.col("r.nid").alias("id_b")
        )
        .distinct()
    )
    verified = (
        cand.join(
            base.select(F.col("nid").alias("id_a"), F.col("sh").alias("sa")),
            "id_a",
        )
        .join(
            base.select(F.col("nid").alias("id_b"), F.col("sh").alias("sb")),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sa", "sb"))
                / F.greatest(
                    F.size(F.array_union("sa", "sb")), F.lit(1)
                ),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Cluster summary over the pair relation's transitive closure:
    (cluster_root = min node id, cluster_size)."""
    labels = connected_components(pairs, id_a, id_b, max_iter)
    return labels.groupBy(F.col("label").alias("cluster_root")).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
