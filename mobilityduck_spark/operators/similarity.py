"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k. The dot product is a zip_with/
  aggregate expression (JVM-side); queries are broadcast; per-partition
  partial top-k via window row_number. The baseline.
- lsh_topk: random-hyperplane LSH. Signature = sign bits of projections
  onto R fixed hyperplanes (deterministic seed, broadcast literal
  planes); candidates share a signature prefix bucket; exact re-rank
  inside buckets. The scale path: no all-pairs shuffle — candidates are
  co-partitioned by bucket id.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.span import _c


def dot(a, b) -> Column:
    # cast each element to double BEFORE multiplying: float32 inputs would
    # otherwise round products to float32 (and diverge from any
    # double-precision oracle)
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_c(a), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b) -> Column:
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k by cosine for each (broadcast) query vector.

    Returns (query_id, vec_id, cos, rank). Ties break on vec_id for
    determinism.
    """
    joined = emb.crossJoin(F.broadcast(queries))
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6).alias("cos"),
    ).filter(F.col(id_col) != F.col(query_id_col))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_signature(vec, dim: int, n_planes: int = 16, seed: int = 42) -> Column:
    """Bit signature: sign of projection on each fixed hyperplane."""
    planes = _planes(dim, n_planes, seed)
    out = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = dot(_c(vec), F.array(*[F.lit(float(x)) for x in p]))
        out = out.bitwiseOR(
            F.shiftleft(F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0)), i)
        )
    return out


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: candidates share the full LSH bucket with the
    query; exact cosine re-rank inside buckets. Recall rises with fewer
    planes (bigger buckets) — n_planes tunes the recall/cost trade."""
    e = emb.withColumn("_sig", lsh_signature(F.col(vec_col), dim, n_planes))
    q = queries.withColumn("_qsig", lsh_signature(F.col(query_vec_col), dim, n_planes))
    cand = e.join(F.broadcast(q), F.col("_sig") == F.col("_qsig"))
    scored = cand.select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6).alias("cos"),
    ).filter(F.col(id_col) != F.col(query_id_col))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 10,
    min_cos: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing + exact
    verify — the embedding-space analog of minhash_lsh_pairs."""
    e = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        lsh_signature(F.col(vec_col), dim, n_planes).alias("sig"),
    )
    o = e.select(
        F.col("id").alias("id_b"), F.col("v").alias("v_b"), F.col("sig").alias("sig_b")
    )
    cand = e.join(o, (F.col("sig") == F.col("sig_b")) & (F.col("id") < F.col("id_b")))
    return (
        cand.select(
            F.col("id").alias("id_a"),
            F.col("id_b"),
            F.round(cosine(F.col("v"), F.col("v_b")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= min_cos)
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    partitions vectors into `n_centroids` cells; each query scans only
    its `n_probe` nearest cells with exact cosine re-rank.

    The index build is one MLlib KMeans fit (sampled at scale); search
    cost drops from O(N) to O(N·n_probe/n_centroids) per query, and the
    candidate join is an equi-join on cell id — partition-friendly at
    100 TB (cells are the shuffle keys; cell sizes are balanced by
    k-means). Recall is tuned by n_probe.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    train = emb.select(array_to_vector(F.col(vec_col)).alias("features"))
    model = KMeans(k=n_centroids, seed=seed, maxIter=20).fit(train)
    centroids = [c.tolist() for c in model.clusterCenters()]

    def nearest_cells(vec, n: int):
        """Array of the n nearest centroid ids (exact L2 on literals)."""
        dists = F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            _c(vec),
                            F.array(*[F.lit(float(x)) for x in c]),
                            lambda a, b: (a.cast("double") - b)
                            * (a.cast("double") - b),
                        ),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    ).alias("d"),
                    F.lit(i).alias("cell"),
                )
                for i, c in enumerate(centroids)
            ]
        )
        return F.slice(
            F.transform(F.array_sort(dists), lambda s: s["cell"]), 1, n
        )

    e = emb.withColumn("_cell", nearest_cells(F.col(vec_col), 1)[0])
    q = queries.withColumn(
        "_probe", F.explode(nearest_cells(F.col(query_vec_col), n_probe))
    )
    cand = e.join(F.broadcast(q), F.col("_cell") == F.col("_probe"))
    scored = cand.select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6).alias("cos"),
    ).filter(F.col(id_col) != F.col(query_id_col))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
