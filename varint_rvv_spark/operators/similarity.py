"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exact baseline, JVM-side zip_with/
  aggregate arithmetic (no UDF), broadcast probe.
* sign-LSH bucketed top-k — the scale path: k random hyperplanes
  (deterministic, derived from a seed via a splitmix64 pandas-free
  construction in plain SQL functions), bucket = sign bit-vector;
  candidates share a bucket (multi-probe: exact bucket only here).
  At 10^12 docs the bucket join replaces the O(N) scan per probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _norm(col) -> F.Column:
    return F.sqrt(F.aggregate(F.transform(col, lambda x: x * x),
                              F.lit(0.0), lambda a, x: a + x))


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(df: DataFrame, probe_df: DataFrame, k: int = 10,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine for each probe row (probe is broadcast)."""
    from pyspark.sql.window import Window

    p = probe_df.select(F.col(id_col).alias("probe_id"),
                        F.col(vec_col).alias("probe_vec"))
    joined = df.crossJoin(F.broadcast(p)) \
        .filter(F.col(id_col) != F.col("probe_id"))
    cos = (_dot(F.col(vec_col), F.col("probe_vec"))
           / (_norm(F.col(vec_col)) * _norm(F.col("probe_vec"))))
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.asc(id_col))
    return (joined.select("probe_id", F.col(id_col),
                          F.round(cos, 5).alias("cosine"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k))


def hyperplane_signs(df: DataFrame, vec_col: str = "embedding",
                     n_planes: int = 8, seed: int = 7,
                     out_col: str = "bucket") -> DataFrame:
    """Sign-LSH bucket id from n deterministic pseudo-random planes.

    Plane p's weight for dimension d = centered hash of (p, d): uses
    only built-in xxhash64 → identical across runs and executors, no
    broadcast of plane matrices needed.
    """
    dims = F.transform(F.col(vec_col), lambda x, i: i)
    sign_bits = []
    for p in range(n_planes):
        w = F.zip_with(
            F.col(vec_col), dims,
            lambda x, i: x * (F.pmod(F.xxhash64(i.cast("string"),
                                                F.lit(f"plane{p}:{seed}")),
                                     F.lit(1000)).cast("double") - 499.5))
        proj = F.aggregate(w, F.lit(0.0), lambda a, x: a + x)
        sign_bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0))
                         * F.lit(1 << p))
    bucket = sign_bits[0]
    for s in sign_bits[1:]:
        bucket = bucket + s
    return df.withColumn(out_col, bucket.cast("int"))


def ivf_assign(df: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest centroid (IVF coarse quantizer).

    centroids is small → broadcast; argmin via window row_number.
    At write time this becomes the table's partition column, so probes
    scan one inverted list instead of the corpus.
    """
    from pyspark.sql.window import Window

    c = centroids.select(F.col(id_col).alias("centroid_id"),
                         F.col(vec_col).alias("centroid_vec"))
    joined = df.crossJoin(F.broadcast(c))
    # cosine distance to centroid (vectors need not be normalized)
    cos = (_dot(F.col(vec_col), F.col("centroid_vec"))
           / (_norm(F.col(vec_col)) * _norm(F.col("centroid_vec"))))
    w = Window.partitionBy(id_col).orderBy(F.desc("cos_c"),
                                           F.asc("centroid_id"))
    return (joined.select(id_col, vec_col,
                          F.round(cos, 9).alias("cos_c"), "centroid_id")
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(id_col, vec_col, "centroid_id"))


def ivf_topk(df: DataFrame, probe_df: DataFrame, centroids: DataFrame,
             k: int = 10, id_col: str = "vec_id",
             vec_col: str = "embedding", nprobe: int = 1) -> DataFrame:
    """IVF approximate top-k: exact cosine within the probe's nearest
    nprobe inverted lists.

    Scale shape: corpus assigned once (partition column), probes join
    on centroid_id — a broadcast join against a partition-pruned scan.
    """
    from pyspark.sql.window import Window

    corpus = ivf_assign(df, centroids, id_col, vec_col)
    c = centroids.select(F.col(id_col).alias("centroid_id"),
                         F.col(vec_col).alias("centroid_vec"))
    pj = probe_df.select(F.col(id_col).alias("probe_id"),
                         F.col(vec_col).alias("probe_vec")) \
        .crossJoin(F.broadcast(c))
    pcos = (_dot(F.col("probe_vec"), F.col("centroid_vec"))
            / (_norm(F.col("probe_vec")) * _norm(F.col("centroid_vec"))))
    wp = Window.partitionBy("probe_id").orderBy(F.desc("pcos"),
                                                F.asc("centroid_id"))
    probes = (pj.select("probe_id", "probe_vec",
                        F.round(pcos, 9).alias("pcos"), "centroid_id")
              .withColumn("prk", F.row_number().over(wp))
              .filter(F.col("prk") <= nprobe)
              .select("probe_id", "probe_vec", "centroid_id"))
    joined = corpus.join(F.broadcast(probes), "centroid_id") \
        .filter(F.col(id_col) != F.col("probe_id"))
    cos = (_dot(F.col(vec_col), F.col("probe_vec"))
           / (_norm(F.col(vec_col)) * _norm(F.col("probe_vec"))))
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"),
                                               F.asc(id_col))
    return (joined.select("probe_id", F.col(id_col),
                          F.round(cos, 5).alias("cosine"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k))


def lsh_cosine_topk(df: DataFrame, probe_df: DataFrame, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_planes: int = 8, seed: int = 7) -> DataFrame:
    """Approximate top-k: exact cosine within the probe's LSH bucket.

    Scale shape: corpus bucketed once (write-time partition column);
    probes join on bucket — a broadcast-hash-join on small probe sets,
    shuffle-free against a bucket-partitioned table.
    """
    from pyspark.sql.window import Window

    corpus = hyperplane_signs(df, vec_col, n_planes, seed)
    probes = hyperplane_signs(probe_df, vec_col, n_planes, seed) \
        .select(F.col(id_col).alias("probe_id"),
                F.col(vec_col).alias("probe_vec"), "bucket")
    joined = corpus.join(F.broadcast(probes), "bucket") \
        .filter(F.col(id_col) != F.col("probe_id"))
    cos = (_dot(F.col(vec_col), F.col("probe_vec"))
           / (_norm(F.col(vec_col)) * _norm(F.col("probe_vec"))))
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.asc(id_col))
    return (joined.select("probe_id", F.col(id_col),
                          F.round(cos, 5).alias("cosine"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k))
