"""Embedding similarity search (SURVEY.md §2.11): brute-force cosine top-k
baseline (plans/llm.py::cosine_topk, oracle-checked) and the scale paths
here — multi-table random-hyperplane LSH and IVF-style coarse quantization.

Scale rationale: brute force is O(queries x corpus) dot products — fine for
a broadcastable query set, not for corpus x corpus. LSH prunes the corpus
per query to matching buckets; multi-probe (hamming-adjacent buckets)
trades recall for fan-out; multiple tables trade memory for recall.

Bucket projection runs as ONE Arrow-batched matrix multiply per batch
(pandas_udf + numpy) — a per-plane column-expression formulation compiles
48 aggregate expressions over 64-element literal arrays and is ~50x slower.
The hyperplanes derive from a fixed seed, so every executor computes
identical planes with no driver-side state. Candidate (query, neighbor)
pairs are deduplicated BEFORE scoring so each dot product is paid once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

LSH_SEED = 1234567


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def lcg_planes(n_rows: int, dim: int, seed: int = LSH_SEED) -> np.ndarray:
    """Deterministic hyperplanes in [-1, 1) from a Lehmer-style integer mix.

    Random-hyperplane LSH only needs directionally-spread planes, not
    Gaussian ones; integer-derived planes make the whole bucket assignment
    reproducible OUTSIDE this process — the DuckDB oracle recomputes the
    identical matrix from the same formula (plans/llm.py cosine_topk_lsh
    oracle), which a seeded RNG cannot offer cross-engine."""
    m = 2147483647
    idx = np.arange(n_rows * dim, dtype=np.int64) + 1 + seed
    h = (idx * 48271) % m
    h = (h * 16807) % m
    return ((h.astype(np.float64) / 2147483647.0) * 2.0 - 1.0).reshape(n_rows, dim)


def _bucket_udf(dim: int, n_planes: int, n_tables: int, seed: int = LSH_SEED):
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf(ArrayType(LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        planes = lcg_planes(n_tables * n_planes, dim, seed)
        v = np.stack([np.asarray(x, dtype=np.float64) for x in vecs])
        bits = (v @ planes.T) > 0  # (n, tables*planes)
        per_table = [
            bits[:, t * n_planes : (t + 1) * n_planes].astype(np.int64) @ weights
            for t in range(n_tables)
        ]
        arr = np.stack(per_table, axis=1)  # (n, tables)
        return pd.Series(list(arr))

    return buckets


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

    Returns (query_id, neighbor_id, rank, sim). Similarities are exact for
    every surfaced candidate — only the candidate set is approximate.

    Note: on uniform-random embeddings (the driver fixture) nearest
    neighbors are barely closer than random vectors — the adversarial case
    for LSH; defaults are tuned for recall ~0.8 at ~2x pruning there.
    Clustered real-world embeddings prune far harder at the same recall.
    """
    bucketer = _bucket_udf(dim, n_planes, n_tables)

    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    c_idx = c.select(
        "neighbor_id", F.posexplode(bucketer("cvec")).alias("table", "bucket")
    )

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    q_idx = q.select("query_id", F.posexplode(bucketer("qvec")).alias("table", "bucket"))
    if multiprobe_bits >= 1:
        flips = F.array(F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)])
        q_idx = q_idx.select("query_id", "table", F.explode(flips).alias("bucket"))

    candidates = q_idx.join(c_idx, ["table", "bucket"]).select("query_id", "neighbor_id").distinct()

    qe = q.select("query_id", _as_double(F.col("qvec")).alias("qe")).withColumn(
        "qnorm", F.sqrt(dot(F.col("qe"), F.col("qe")))
    )
    ce = c.select("neighbor_id", _as_double(F.col("cvec")).alias("ce")).withColumn(
        "cnorm", F.sqrt(dot(F.col("ce"), F.col("ce")))
    )
    scored = (
        candidates.join(F.broadcast(qe), "query_id")
        .join(ce, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qe"), F.col("ce")) / (F.col("qnorm") * F.col("cnorm"))).alias("sim"),
        )
    )
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
    return _nearest_centroids(corpus, centroids, 1, id_col, vec_col).select(
        id_col, "centroid_id", F.col("e").alias("embedding")
    )


def _nearest_centroids(
    vecs: DataFrame, centroids: DataFrame, n: int, id_col: str, vec_col: str
) -> DataFrame:
    """(id, centroid_id, e) for each vector's n nearest centroids
    (L2; ties broken by centroid_id). Centroid table is broadcast — the
    cross product never shuffles the big side."""
    c = vecs.select(F.col(id_col), _as_double(F.col(vec_col)).alias("e"))
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
        .filter(F.col("rn") <= n)
        .select(id_col, "centroid_id", "e")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    dim: int,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k: corpus vectors live in inverted lists
    keyed by nearest centroid; each query scores ONLY the lists of its
    ``nprobe`` nearest centroids. Returns (query_id, neighbor_id, rank,
    sim) with exact cosine similarity for every surfaced candidate.

    100 TB shape: the corpus is hash-partitioned (or directory-partitioned,
    io.py::write_partitioned) by centroid_id once at ingest; a query batch
    probes nprobe/n_lists of the data — the scan itself is pruned, which
    no LSH-over-full-scan variant achieves. The candidate join is a hash
    equi-join on centroid_id; the broadcast centroid table is tiny
    (n_lists x dim doubles)."""
    lists = _nearest_centroids(corpus, centroids, 1, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "centroid_id", F.col("e").alias("ce")
    )
    probes = _nearest_centroids(queries, centroids, nprobe, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), "centroid_id", F.col("e").alias("qe")
    )
    sim = dot(F.col("qe"), F.col("ce")) / (
        F.sqrt(dot(F.col("qe"), F.col("qe"))) * F.sqrt(dot(F.col("ce"), F.col("ce")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        probes.join(lists, "centroid_id")
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )
