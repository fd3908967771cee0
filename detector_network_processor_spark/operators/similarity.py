"""Embedding similarity search (SURVEY.md §2.11): brute-force cosine top-k
baseline (plans/llm.py::cosine_topk, oracle-checked) and the scale paths
here — random-hyperplane LSH bucketing and IVF-style coarse quantization.

Scale rationale: brute force is O(queries x corpus) dot products — fine for
a broadcastable query set, not for corpus x corpus. LSH prunes the corpus
per query to matching buckets; multi-probe (hamming-adjacent buckets)
trades recall for fan-out. All projections are JVM column expressions;
the deterministic hyperplanes derive from xxhash64 so every executor
computes identical planes with no driver-side randomness.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _plane_component(p: int, d: int):
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5):
    xxhash64(p, d) scaled — identical on every executor, no RNG state."""
    return (F.xxhash64(F.lit(p), F.lit(d)) % 1_000_003) / 1_000_003.0 - 0.5


def lsh_bucket_expr(vec_col, dim: int, n_planes: int, plane_offset: int = 0):
    """Sign-bit bucket id from n_planes deterministic hyperplanes."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[_plane_component(plane_offset + p, d) for d in range(dim)]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket.bitwiseOR(F.shiftleft(F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")), p))
    return bucket


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k neighbors per query via multi-table hyperplane LSH.

    The corpus is indexed in ``n_tables`` independent tables (distinct
    deterministic hyperplane sets); queries probe their bucket in every
    table plus all buckets within ``multiprobe_bits`` bit flips. The join
    is an equi-join on (table, bucket) — hash-partitioned, no cross
    product; corpus storage is x n_tables (the classic LSH memory/recall
    trade). Returns (query_id, neighbor_id, rank, sim).

    Note: on uniform-random embeddings (the driver fixture) nearest
    neighbors are barely closer than random vectors, the adversarial case
    for LSH — defaults are tuned for recall ~0.8 at ~2x pruning there;
    clustered real-world embeddings prune far harder at the same recall.
    """
    c = corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("ce"))
    c = c.withColumn("cnorm", F.sqrt(dot(F.col("ce"), F.col("ce"))))
    c = c.withColumn(
        "tb",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table"),
                        lsh_bucket_expr(F.col("ce"), dim, n_planes, plane_offset=t * n_planes).alias("bucket"),
                    )
                    for t in range(n_tables)
                ]
            )
        ),
    ).select("neighbor_id", "ce", "cnorm", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket"))

    q = queries.select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qe"))
    q = q.withColumn("qnorm", F.sqrt(dot(F.col("qe"), F.col("qe"))))
    probes = []
    for t in range(n_tables):
        qb = lsh_bucket_expr(F.col("qe"), dim, n_planes, plane_offset=t * n_planes)
        probes.append(F.struct(F.lit(t).alias("table"), qb.alias("bucket")))
        if multiprobe_bits >= 1:
            probes += [
                F.struct(F.lit(t).alias("table"), qb.bitwiseXOR(F.lit(1 << p)).alias("bucket"))
                for p in range(n_planes)
            ]
    q = q.withColumn("tb", F.explode(F.array(*probes))).select(
        "query_id", "qe", "qnorm", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket")
    )

    scored = q.join(c, ["table", "bucket"]).select(
        "query_id",
        "neighbor_id",
        (dot(F.col("qe"), F.col("ce")) / (F.col("qnorm") * F.col("cnorm"))).alias("sim"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


def ivf_assign(corpus: DataFrame, centroids: DataFrame, dim: int,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF coarse assignment: nearest centroid per vector (broadcast the
    centroid table; at 100 TB this is the standard partition-pruned ANN
    layout — vectors co-partitioned by centroid id).

    centroids: (centroid_id, centroid array<double>).
    """
    c = corpus.select(F.col(id_col), _as_double(F.col(vec_col)).alias("e"))
    cent = centroids.select(
        F.col("centroid_id"), _as_double(F.col("centroid")).alias("ce")
    )
    joined = c.join(F.broadcast(cent))
    d2 = F.aggregate(
        F.zip_with("e", "ce", lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, x: acc + x
    )
    w = Window.partitionBy(id_col).orderBy(F.asc("d2"), F.asc("centroid_id"))
    return (
        joined.withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "centroid_id", F.col("e").alias("embedding"))
    )
