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

from ..functions import vec_dot as _dot, vec_norm as _norm


def _local_topk_kernel(k: int):
    """Arrow-batch partial top-k: per probe, keep only the k best
    (cosine desc, id asc) rows seen in this partition stream.  Memory
    is O(probes × k + one batch); output is ≤ probes × k rows."""
    import numpy as np
    import pyarrow as pa

    def fn(batch_iter):
        best: dict = {}  # probe_id -> (cos f8[], id i8[]) sorted desc
        schema = None
        for batch in batch_iter:
            schema = batch.schema
            pid = batch.column(0).to_numpy(zero_copy_only=False)
            ids = batch.column(1).to_numpy(zero_copy_only=False)
            cos = batch.column(2).to_numpy(zero_copy_only=False)
            for p in np.unique(pid):
                m = pid == p
                c, i = cos[m], ids[m]
                if p in best:
                    c = np.concatenate((best[p][0], c))
                    i = np.concatenate((best[p][1], i))
                # total order (cosine desc, id asc) — the same order the
                # final window uses, so the global top-k is provably a
                # subset of the union of these local top-ks
                order = np.lexsort((i, -c))[:k]
                best[p] = (c[order], i[order])
        if schema is not None and best:
            probes = sorted(best)
            out_pid = np.concatenate(
                [np.full(best[p][0].shape[0], p) for p in probes])
            out_cos = np.concatenate([best[p][0] for p in probes])
            out_ids = np.concatenate([best[p][1] for p in probes])
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_pid).cast(schema.field(0).type),
                 pa.array(out_ids).cast(schema.field(1).type),
                 pa.array(out_cos).cast(schema.field(2).type)],
                schema=schema)

    return fn


def cosine_topk_partials(df: DataFrame, probe_df: DataFrame, k: int = 10,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Phase 1 of the exact scan: broadcast probes, score map-side,
    reduce each scan partition to its local top-k per probe.  Zero
    shuffle; the output is ≤ k × partitions rows per probe."""
    p = probe_df.select(F.col(id_col).alias("probe_id"),
                        F.col(vec_col).alias("probe_vec"))
    joined = df.crossJoin(F.broadcast(p)) \
        .filter(F.col(id_col) != F.col("probe_id"))
    cos = F.try_divide(
        _dot(F.col(vec_col), F.col("probe_vec")),
        _norm(F.col(vec_col)) * _norm(F.col("probe_vec")))
    id_t = dict(df.dtypes)[id_col]
    scored = joined.select("probe_id", F.col(id_col),
                           F.round(cos, 5).alias("cosine"))
    # NaN/NULL cosines (zero-norm or NULL embeddings — padding
    # artifacts) are excluded BEFORE ranking: Spark's window order
    # treats NaN as the greatest double, which would rank degenerate
    # vectors first and diverge from the numpy partial ordering
    scored = scored.filter(F.col("cosine").isNotNull()
                           & ~F.isnan("cosine"))
    return scored.mapInArrow(
        _local_topk_kernel(k),
        f"probe_id {id_t}, {id_col} {id_t}, cosine double")


def cosine_topk(df: DataFrame, probe_df: DataFrame, k: int = 10,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine for each probe row (probe is broadcast).

    Two-phase plan: a map-side partial top-k per scan partition
    (cosine_topk_partials — only k rows per probe per partition leave
    the scan stage), then the global window ranks the ≤ k × P
    survivors.  At 100 TB the shuffle carries O(k·P) rows instead of
    funneling the whole corpus through one reducer per probe.

    Rows whose cosine is NaN/NULL (zero-norm or NULL embeddings) are
    excluded — they carry no similarity signal and a naive
    NaN-sorts-greatest window would rank them first."""
    from pyspark.sql.window import Window

    part = cosine_topk_partials(df, probe_df, k, id_col, vec_col)
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.asc(id_col))
    return (part.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k))


def plane_weights(n_planes: int, dim: int,
                  seed: int = 7) -> list[list[float]]:
    """Deterministic hyperplane matrix from an md5 grid.

    Weight(p, d) = (int(md5(f"{seed}:{p}:{d}")[:8 hex], 16) % 4096)
    - 2047.5 — a centered pseudo-random value computable identically
    in Python (here), Spark SQL, and DuckDB (the oracle), and exactly
    representable in a double (x.5 grid).  The matrix is tiny
    (n_planes × dim doubles) and baked into the plan as literals, so
    executors pay zero per-row hashing and nothing is broadcast.
    """
    import hashlib

    return [[int(hashlib.md5(f"{seed}:{p}:{d}".encode())
                 .hexdigest()[:8], 16) % 4096 - 2047.5
             for d in range(dim)]
            for p in range(n_planes)]


def hyperplane_projections(df: DataFrame, vec_col: str = "embedding",
                           n_planes: int = 16, seed: int = 7,
                           dim: int = 64,
                           out_col: str = "projs") -> DataFrame:
    """Per-plane dot products as an array<double> column (map-side).

    `dim` must equal the embedding length — zip_with would otherwise
    null-pad, fold every projection to NULL and silently collapse all
    rows into bucket 0 (degenerating the LSH equi-join to a full
    single-bucket join), so a mismatched row raises loudly instead.
    """
    weights = plane_weights(n_planes, dim, seed)
    # NULL embeddings pass through (their projections fold to NULL and
    # the rows degrade harmlessly); only a present-but-wrong-length
    # vector raises
    df = df.withColumn(vec_col, F.when(
        F.col(vec_col).isNull() | (F.size(F.col(vec_col)) == dim),
        F.col(vec_col)).otherwise(
        F.raise_error(F.concat(
            F.lit(f"hyperplane_projections: embedding length != dim="
                  f"{dim}; got "),
            F.coalesce(F.size(F.col(vec_col)).cast("string"),
                       F.lit("NULL"))))))
    projs = [
        F.aggregate(
            F.zip_with(F.col(vec_col),
                       F.array(*[F.lit(w) for w in row]),
                       lambda x, w: x * w),
            F.lit(0.0), lambda a, x: a + x)
        for row in weights]
    return df.withColumn(out_col, F.array(*projs))


def _bucket_expr(n_planes: int, projs_col: str = "projs") -> F.Column:
    b = F.lit(0)
    for p in range(n_planes):
        b = b + F.when(F.element_at(projs_col, p + 1) >= 0,
                       F.lit(1 << p)).otherwise(F.lit(0))
    return b.cast("int")


def hyperplane_signs(df: DataFrame, vec_col: str = "embedding",
                     n_planes: int = 16, seed: int = 7, dim: int = 64,
                     out_col: str = "bucket",
                     keep_projs: bool = False) -> DataFrame:
    """Sign-LSH bucket id (int, one bit per plane) — pure map-side."""
    dfp = hyperplane_projections(df, vec_col, n_planes, seed, dim)
    dfp = dfp.withColumn(out_col, _bucket_expr(n_planes))
    return dfp if keep_projs else dfp.drop("projs")


def probe_bucket_set(n_planes: int, n_flip: int,
                     bucket_col: str = "bucket",
                     projs_col: str = "projs") -> F.Column:
    """Multi-probe candidate buckets: the exact bucket plus the
    `n_flip` buckets reached by flipping the lowest-|projection|
    planes one at a time (the classic multi-probe LSH recall boost —
    the weakest sign bits are the likeliest to differ on a true
    neighbor)."""
    ranked = F.array_sort(F.transform(
        F.col(projs_col),
        lambda x, i: F.struct(F.abs(x).alias("a"), i.alias("i"))))
    flips = F.transform(
        F.slice(ranked, 1, n_flip),
        lambda s: F.col(bucket_col).bitwiseXOR(
            F.pow(F.lit(2.0), s["i"]).cast("int")))
    return F.concat(F.array(F.col(bucket_col)), flips)


def train_centroids(df: DataFrame, k: int = 16,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    sample_n: int = 4096, iters: int = 10,
                    seed: int = 7) -> DataFrame:
    """Spherical k-means IVF coarse quantizer, trained on a sample.

    Scale shape: ONE sampled scan brings ≤ sample_n vectors to the
    driver (a few MB at any corpus size), numpy iterates k-means there
    (k·dim·iters flops — trivial), and the k unit-norm centroids go
    back as a tiny DataFrame that every ivf_* join broadcasts.  This is
    the standard IVF recipe: the quantizer is always trained on a
    sample; only assignment touches the full corpus.

    Deterministic: fixed seed, ties by lowest index; empty clusters are
    reseeded to the farthest-from-assigned-centroid sample point.
    """
    import numpy as np

    rows = df.select(vec_col).limit(sample_n).collect()
    X = np.asarray([r[0] for r in rows], dtype=np.float64)
    if X.shape[0] < k:
        raise ValueError(f"sample ({X.shape[0]}) smaller than k ({k})")
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(X.shape[0], size=k, replace=False)].copy()
    for _ in range(iters):
        sims = X @ C.T
        assign = np.argmax(sims, axis=1)
        best = sims[np.arange(X.shape[0]), assign]
        newC = np.zeros_like(C)
        for c in range(k):
            members = X[assign == c]
            if members.shape[0] == 0:
                newC[c] = X[int(np.argmin(best))]  # reseed: worst-fit
            else:
                m = members.sum(axis=0)
                newC[c] = m / max(np.linalg.norm(m), 1e-12)
        if np.allclose(newC, C):
            break
        C = newC
    spark = df.sparkSession
    data = [(i, [float(x) for x in np.asarray(C[i], dtype=np.float32)])
            for i in range(k)]
    return spark.createDataFrame(
        data, f"{id_col} long, {vec_col} array<float>")


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
    cos = F.try_divide(
        _dot(F.col(vec_col), F.col("centroid_vec")),
        _norm(F.col(vec_col)) * _norm(F.col("centroid_vec")))
    w = Window.partitionBy(id_col).orderBy(F.desc("cos_c"),
                                           F.asc("centroid_id"))
    return (joined.select(id_col, vec_col,
                          F.round(cos, 9).alias("cos_c"), "centroid_id")
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(id_col, vec_col, "centroid_id"))


def ivf_topk(df: DataFrame, probe_df: DataFrame, centroids: DataFrame,
             k: int = 10, id_col: str = "vec_id",
             vec_col: str = "embedding", nprobe: int = 2) -> DataFrame:
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
    pcos = F.try_divide(
        _dot(F.col("probe_vec"), F.col("centroid_vec")),
        _norm(F.col("probe_vec")) * _norm(F.col("centroid_vec")))
    wp = Window.partitionBy("probe_id").orderBy(F.desc("pcos"),
                                                F.asc("centroid_id"))
    probes = (pj.select("probe_id", "probe_vec",
                        F.round(pcos, 9).alias("pcos"), "centroid_id")
              .withColumn("prk", F.row_number().over(wp))
              .filter(F.col("prk") <= nprobe)
              .select("probe_id", "probe_vec", "centroid_id"))
    joined = corpus.join(F.broadcast(probes), "centroid_id") \
        .filter(F.col(id_col) != F.col("probe_id"))
    cos = F.try_divide(
        _dot(F.col(vec_col), F.col("probe_vec")),
        _norm(F.col(vec_col)) * _norm(F.col("probe_vec")))
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"),
                                               F.asc(id_col))
    return (joined.select("probe_id", F.col(id_col),
                          F.round(cos, 5).alias("cosine"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k))


def write_ivf_index(df: DataFrame, centroids: DataFrame, root: str,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    mode: str = "overwrite") -> None:
    """Materialize the IVF inverted lists, partitioned by centroid.

    This is the 100 TB ANN storage shape: assignment runs once
    (broadcast-centroid argmin), the corpus lands partitioned by
    `centroid_id`, and every probe afterwards scans only its nprobe
    list directories (partition pruning at the parquet scan — asserted
    in test_plans).  Centroids are persisted alongside so probes don't
    need the training set.
    """
    assigned = ivf_assign(df, centroids, id_col, vec_col)
    (assigned.write.mode(mode).partitionBy("centroid_id")
     .parquet(f"{root}/lists"))
    (centroids.select(F.col(id_col).alias("centroid_id"),
                      F.col(vec_col).alias("centroid_vec"))
     .write.mode(mode).parquet(f"{root}/centroids"))


def ivf_topk_from_index(spark, root: str, probe_df: DataFrame,
                        k: int = 10, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        nprobe: int = 2) -> DataFrame:
    """Probe a written IVF index: nearest nprobe centroids per probe,
    then exact cosine over ONLY those list partitions (the
    `centroid_id IN (...)` filter prunes at the scan)."""
    from pyspark.sql.window import Window

    cents = spark.read.parquet(f"{root}/centroids")
    pj = probe_df.select(F.col(id_col).alias("probe_id"),
                         F.col(vec_col).alias("probe_vec")) \
        .crossJoin(F.broadcast(cents))
    pcos = F.try_divide(
        _dot(F.col("probe_vec"), F.col("centroid_vec")),
        _norm(F.col("probe_vec")) * _norm(F.col("centroid_vec")))
    wp = Window.partitionBy("probe_id").orderBy(F.desc("pcos"),
                                                F.asc("centroid_id"))
    probes = (pj.select("probe_id", "probe_vec",
                        F.round(pcos, 9).alias("pcos"), "centroid_id")
              .withColumn("prk", F.row_number().over(wp))
              .filter(F.col("prk") <= nprobe)
              .select("probe_id", "probe_vec", "centroid_id"))
    wanted = [r["centroid_id"] for r in
              probes.select("centroid_id").distinct().collect()]
    lists = (spark.read.parquet(f"{root}/lists")
             .filter(F.col("centroid_id").isin(wanted)))
    joined = lists.join(F.broadcast(probes), "centroid_id") \
        .filter(F.col(id_col) != F.col("probe_id"))
    cos = F.try_divide(
        _dot(F.col(vec_col), F.col("probe_vec")),
        _norm(F.col(vec_col)) * _norm(F.col("probe_vec")))
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"),
                                               F.asc(id_col))
    return (joined.select("probe_id", F.col(id_col),
                          F.round(cos, 5).alias("cosine"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k))


def lsh_cosine_topk(df: DataFrame, probe_df: DataFrame, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_planes: int = 16, seed: int = 7, dim: int = 64,
                    n_flip: int = 2) -> DataFrame:
    """Approximate top-k: exact cosine within the probe's LSH buckets.

    Multi-probe: each probe scans 1 + n_flip buckets (exact bucket +
    weakest-bit flips), so recall scales without shrinking the bucket
    count.  A corpus vector lives in exactly one bucket and the
    candidate buckets of one probe are distinct, so no dedup is needed.

    Scale shape: corpus bucketed once (write-time partition column);
    probes join on bucket — a broadcast-hash-join on small probe sets,
    shuffle-free against a bucket-partitioned table; 2^n_planes sized
    to corpus/target-bucket-occupancy.
    """
    from pyspark.sql.window import Window

    corpus = hyperplane_signs(df, vec_col, n_planes, seed, dim)
    probes = (hyperplane_signs(probe_df, vec_col, n_planes, seed, dim,
                               keep_projs=True)
              .withColumn("bucket",
                          F.explode(probe_bucket_set(n_planes, n_flip)))
              .select(F.col(id_col).alias("probe_id"),
                      F.col(vec_col).alias("probe_vec"), "bucket"))
    joined = corpus.join(F.broadcast(probes), "bucket") \
        .filter(F.col(id_col) != F.col("probe_id"))
    cos = F.try_divide(
        _dot(F.col(vec_col), F.col("probe_vec")),
        _norm(F.col(vec_col)) * _norm(F.col("probe_vec")))
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.asc(id_col))
    return (joined.select("probe_id", F.col(id_col),
                          F.round(cos, 5).alias("cosine"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k))
