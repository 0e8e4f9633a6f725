"""Similarity search over embedding columns (array<float>).

- ``cosine`` / ``dot``: expression-level vector math (zip_with +
  aggregate, computed in double) — no UDF, stays in codegen.
- ``topk_brute``: the exact baseline.  Plan = narrow projection +
  TakeOrderedAndProject: each partition keeps a local top-k heap, the
  driver merges k*partitions rows — the right 100 TB plan for one
  query vector (no shuffle of the corpus).
- ``IvfIndex``: inverted-file ANN.  Centroids are picked
  deterministically (hash-sampled) and refined with a few Lloyd
  iterations computed *distributed*; only the centroid table (tiny)
  is collected.  Queries probe the nearest n_probe partitions —
  bucket filter is a pushdown-able predicate on the cluster id.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["dot", "norm", "cosine", "cosine_to_literal", "topk_brute", "IvfIndex"]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _lit_vec(q: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in q])


def cosine_to_literal(vec: Column, q: Sequence[float]) -> Column:
    return cosine(vec, _lit_vec(q))


def topk_brute(
    df: DataFrame,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against one query vector.  Ranked on the raw
    similarity (rounded only for display) so ordering is engine-exact."""
    sim = cosine_to_literal(F.col(vec_col), query)
    return (
        df.select(F.col(id_col), sim.alias("__raw"))
        .orderBy(F.col("__raw").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("__raw", 9).alias("sim"))
    )


@dataclass
class IvfIndex:
    """Inverted-file ANN index: rows carry a cluster id; queries scan
    only the n_probe nearest clusters."""

    indexed: DataFrame        # original columns + __cluster
    centroids: list[list[float]]
    vec_col: str
    id_col: str

    @staticmethod
    def build(
        df: DataFrame,
        vec_col: str,
        id_col: str,
        n_clusters: int = 16,
        iters: int = 2,
    ) -> "IvfIndex":
        # Deterministic seed centroids: hash-sample n_clusters rows.
        # (xxhash64 of the id — no RNG, reproducible across runs.)
        seed_rows = (
            df.select(F.col(id_col), F.col(vec_col))
            .orderBy(F.xxhash64(F.col(id_col)))
            .limit(n_clusters)
            .collect()
        )
        centroids = [[float(x) for x in r[vec_col]] for r in seed_rows]

        for _ in range(iters):
            assigned = df.select(
                F.col(vec_col),
                _nearest_centroid(F.col(vec_col), centroids).alias("__cluster"),
            )
            # distributed mean per cluster; only k x dim floats collected
            dim = len(centroids[0])
            sums = assigned.groupBy("__cluster").agg(
                *[
                    F.sum(F.col(vec_col)[i].cast("double")).alias(f"s{i}")
                    for i in range(dim)
                ],
                F.count(F.lit(1)).alias("n"),
            )
            rows = sums.collect()
            new = list(centroids)
            for r in rows:
                c = r["__cluster"]
                new[c] = [r[f"s{i}"] / r["n"] for i in range(dim)]
            centroids = new

        indexed = df.withColumn(
            "__cluster", _nearest_centroid(F.col(vec_col), centroids)
        )
        return IvfIndex(indexed, centroids, vec_col, id_col)

    def search(
        self, query: Sequence[float], k: int = 10, n_probe: int = 4
    ) -> DataFrame:
        import math

        def cos_py(a, b):
            d = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            return d / (na * nb) if na and nb else 0.0

        ranked = sorted(
            range(len(self.centroids)),
            key=lambda c: -cos_py(query, self.centroids[c]),
        )
        probe = ranked[:n_probe]
        candidates = self.indexed.filter(F.col("__cluster").isin(probe))
        return topk_brute(candidates, self.vec_col, query, k, self.id_col)


def _nearest_centroid(
    vec: Column, centroids: Sequence[Sequence[float]]
) -> Column:
    """argmax cosine over centroid literals — one expression, no UDF."""
    pairs = F.array(
        *[
            F.struct(
                cosine(vec, _lit_vec(c)).alias("s"),
                F.lit(i).alias("c"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.array_max(pairs).getField("c")
