"""Similarity search over embedding columns (array<float>).

Two tiers:

* cosine_topk      — exact brute-force top-k: query set × corpus
  with a broadcast of the (small) query side; the dot product is a
  JVM ``aggregate(zip_with(...))`` expression — no Python, no UDF.
  At 100 TB this is the correct baseline when |queries| is small:
  the corpus streams through one scan, queries ride along broadcast.
* ivf_topk         — IVF-style pruned search: corpus pre-bucketed by
  a coarse quantizer (any int column — here a cluster/label id, in
  production a KMeans assignment); each query probes only its
  nearest ``n_probe`` centroid buckets. Turns the scan into a
  partition-pruned join keyed on bucket id.

Scores are computed in double precision sequentially over the vector
(deterministic) and rounded, so results are engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from umn_eda_kafka_stream_processing_spark.functions.scalar import round_half_up


def dot_product(a: str | Column, b: str | Column) -> Column:
    """Σ a_i * b_i in double precision, sequential over the array
    (deterministic): aggregate(zip_with(a, b, *), 0.0, +)."""
    ac = F.col(a) if isinstance(a, str) else a
    bc = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(ac, bc, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: str | Column) -> Column:
    ac = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(ac, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_similarity(a: str | Column, b: str | Column, precision: int = 6) -> Column:
    return round_half_up(
        dot_product(a, b) / (l2_norm(a) * l2_norm(b)), precision
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Broadcast the queries (small side) against the corpus scan, rank
    per query by (similarity DESC, neighbor id ASC — deterministic),
    keep k. Self-matches excluded.
    Output: (query_id, neighbor_id, sim, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("q_norm", l2_norm("q_vec"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).withColumn("c_norm", l2_norm("c_vec"))
    # norms precomputed per row (not per pair): corpus norms cost one
    # pass over the scan instead of one per query
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"), "inner")
        .withColumn(
            "sim",
            round_half_up(
                dot_product("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")), 6
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "bucket",
) -> DataFrame:
    """IVF-pruned approximate top-k.

    ``corpus`` carries ``bucket_col`` (coarse assignment);
    ``centroids`` is (bucket, centroid-vector). Each query scores
    all centroids (tiny), keeps its ``n_probe`` nearest buckets, and
    scans only those corpus buckets. The corpus-side join is a hash
    join on the bucket id, so Catalyst prunes everything else.
    Output: (query_id, neighbor_id, sim, rank).
    """
    cent = centroids.select(
        F.col(bucket_col), F.col(vec_col).alias("cent_vec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("q_norm", l2_norm("q_vec"))
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("cent_sim").desc(), F.col(bucket_col).asc()
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("cent_sim", cosine_similarity("q_vec", "cent_vec"))
        .withColumn("probe_rank", F.row_number().over(probe_w))
        .filter(F.col("probe_rank") <= n_probe)
        .select("query_id", "q_vec", "q_norm", bucket_col)
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"),
        F.col(bucket_col),
    ).withColumn("c_norm", l2_norm("c_vec"))
    scored = (
        c.join(F.broadcast(probes), bucket_col, "inner")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "sim",
            round_half_up(
                dot_product("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")), 6
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def kmeans_buckets(
    df: DataFrame,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Coarse quantizer for IVF: Lloyd's k-means entirely in
    DataFrame ops (no MLlib dependency; only the k seed vectors
    ever reach the driver).

    Deterministic init: the k rows with smallest ids. Per iteration:
    assign each vector to its max-cosine centroid (broadcast
    centroids, JVM dot products), then recompute centroids as
    positional means (posexplode → avg). Each round materializes via
    localCheckpoint — the standard way to cut exponentially growing
    lineage in iterative Spark jobs.

    Engine-portable determinism: assignment sims AND centroid
    components are rounded half-up to 6 dp each iteration, so an
    independent engine (the DuckDB oracle unrolls the same Lloyd
    steps in SQL) converges to bit-identical buckets — raw
    floating-point avg/dot results differ across engines in the last
    ulp, which would otherwise compound over iterations.

    Returns (assignments (id, bucket), centroids (bucket, vec)).
    Scale: per iteration one broadcast-join pass over the corpus and
    one aggregation keyed by (bucket, pos); centroids stay tiny.
    """
    base = df.select(F.col(id_col), F.col(vec_col)).withColumn(
        "nrm", l2_norm(vec_col)
    )
    # k smallest ids via distributed TakeOrderedAndProject — an
    # unpartitioned row_number window would sort the whole corpus
    # through one task
    init = base.orderBy(F.col(id_col).asc()).limit(k).collect()
    cent = (
        df.sparkSession.createDataFrame(
            [(i, row[vec_col]) for i, row in enumerate(init)],
            f"bucket int, cent_vec {df.schema[vec_col].dataType.simpleString()}",
        )
        .withColumn("c_nrm", l2_norm("cent_vec"))
        .localCheckpoint()
    )
    assign = None
    for _ in range(iters):
        # centroid norms precomputed on the tiny cent side — not
        # re-derived per (row x centroid) pair
        scored = base.crossJoin(F.broadcast(cent)).withColumn(
            "sim",
            round_half_up(
                dot_product(vec_col, "cent_vec") / (F.col("nrm") * F.col("c_nrm")), 6
            ),
        )
        w = Window.partitionBy(id_col).orderBy(
            F.col("sim").desc(), F.col("bucket").asc()
        )
        assign = (
            scored.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select(id_col, vec_col, "bucket")
        )
        cent = (
            assign.select("bucket", F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("bucket", "pos")
            .agg(F.avg("v").alias("m"))
            .groupBy("bucket")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: round_half_up(s.m, 6),
                ).alias("cent_vec")
            )
            .withColumn("c_nrm", l2_norm("cent_vec"))
            .localCheckpoint()
        )
    return assign.select(id_col, "bucket"), cent.select(
        "bucket", F.col("cent_vec").alias(vec_col)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a<b) pairs with
    cosine >= threshold, blocked on ``block_col`` (near-dups land in
    the same coarse bucket; drop the block for exact quadratic).

    Physical shape: pairs are generated on a lite (id, block)
    projection — a block column has few distinct values, so a join
    carrying vectors would put each whole block on one task — then
    repartitioned by id (uniform) before the vectors are attached
    (broadcast-sized side) and the cosine evaluated. Norms are
    precomputed per row, not per pair.
    Output: (id_a, id_b, sim)."""
    base = df.select(
        F.col(id_col), F.col(vec_col),
        *([F.col(block_col)] if block_col else []),
    ).withColumn("nrm", l2_norm(vec_col))
    lite = base.select(id_col, *([block_col] if block_col else []))
    a = lite.select(*[F.col(c).alias(f"a_{c}") for c in lite.columns])
    b = lite.select(*[F.col(c).alias(f"b_{c}") for c in lite.columns])
    cond = F.col(f"a_{id_col}") < F.col(f"b_{id_col}")
    if block_col:
        cond = (F.col(f"a_{block_col}") == F.col(f"b_{block_col}")) & cond
    pairs = a.join(b, cond, "inner").select(
        f"a_{id_col}", f"b_{id_col}"
    ).repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(f"a_{id_col}")
    )
    va = base.select(
        F.col(id_col).alias(f"a_{id_col}"),
        F.col(vec_col).alias("a_vec"), F.col("nrm").alias("a_nrm"),
    )
    vb = base.select(
        F.col(id_col).alias(f"b_{id_col}"),
        F.col(vec_col).alias("b_vec"), F.col("nrm").alias("b_nrm"),
    )
    return (
        pairs.join(va, f"a_{id_col}").join(vb, f"b_{id_col}")
        .withColumn(
            "sim",
            round_half_up(
                dot_product("a_vec", "b_vec") / (F.col("a_nrm") * F.col("b_nrm")), 6
            ),
        )
        .filter(F.col("sim") >= threshold)
        .select(
            F.col(f"a_{id_col}").alias(f"{id_col}_a"),
            F.col(f"b_{id_col}").alias(f"{id_col}_b"),
            "sim",
        )
    )


def cosine_topk_pandas(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 10_000,
) -> DataFrame:
    """Arrow/numpy twin of cosine_topk for high-dimensional vectors.

    The JVM higher-order-function dot product evaluates per element
    interpreted; at dim >= a few hundred the BLAS matmul inside a
    mapInPandas batch is 10-100x faster. Shape: the (small) query
    matrix is collected once to the driver and closed over; each
    corpus Arrow batch computes C @ Q.T and emits only its per-batch
    top-k candidates per query (a partial top-k — shuffle volume is
    batches x queries x k, not |corpus| x queries); the final exact
    rank runs on the rounded scores with the id tie-break, identical
    to cosine_topk.

    BLAS uses pairwise summation, so raw scores can differ from the
    sequential JVM fold in the last ulp; scores are rounded half-up
    to 6 dp like every similarity in this engine, which the
    equivalence test pins against cosine_topk.
    """
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    # ENFORCED contract, not just documented: the query matrix is
    # collected to the driver and broadcast inside the closure, so an
    # oversized query set would silently become a driver OOM. Count
    # first (cheap agg) and refuse loudly.
    n_q = queries.count()
    if n_q > max_queries:
        raise ValueError(
            f"cosine_topk_pandas: {n_q} query vectors exceeds "
            f"max_queries={max_queries}; the query side is collected "
            "to the driver — raise max_queries only if driver memory "
            "allows, or use cosine_topk / srp_lsh_pairs for large "
            "query sets"
        )
    q_rows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    if not q_rows:
        raise ValueError("cosine_topk_pandas: empty query set")
    if not all(isinstance(r[id_col], int) for r in q_rows):
        raise TypeError(
            "cosine_topk_pandas requires integer ids (LongType output); "
            "use cosine_topk for other id types"
        )
    q_ids = np.array([r[id_col] for r in q_rows])
    Q = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    out_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("sim", T.DoubleType()),
    ])

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            C = np.array(list(pdf[vec_col]), dtype=np.float64)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            sims = Cn @ Qn.T                      # (n, kq)
            out = []
            top = min(k + 1, len(ids))            # +1 absorbs self-match
            for qi in range(len(q_ids)):
                col = sims[:, qi]
                if len(ids) > top:
                    # tie-safe cutoff: keep everything within one
                    # rounding ulp (1e-6) of the top-th raw score, so
                    # a neighbor that ROUNDS equal to the k-th can't
                    # be pruned here and lose to the global
                    # (sim DESC, id ASC) tie-break
                    kth = np.partition(-col, top - 1)[top - 1]
                    cand = np.flatnonzero(-col <= kth + 1.5e-6)
                else:
                    cand = np.arange(len(ids))
                for ci in cand:
                    if ids[ci] == q_ids[qi]:
                        continue
                    s = math.floor(col[ci] * 1e6 + 0.5) / 1e6  # half-up 6dp
                    out.append((int(q_ids[qi]), int(ids[ci]), s))
            yield pd.DataFrame(out, columns=["query_id", "neighbor_id", "sim"])

    partial = corpus.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        score, out_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def srp_planes(dim: int, n_bits: int) -> list[list[int]]:
    """Deterministic signed-random-projection hyperplanes: component
    (p, j) is an md5-derived integer in [-1000, 1000]. md5 gives
    well-mixed, engine-independent planes that both the Spark
    expression and a DuckDB oracle can embed as literals."""
    import hashlib

    return [
        [
            int.from_bytes(hashlib.md5(f"srp|{p}|{j}".encode()).digest()[:4], "big")
            % 2001
            - 1000
            for j in range(dim)
        ]
        for p in range(n_bits)
    ]


def srp_band_keys(vec_col: str | Column, planes: list[list[int]], bands: int) -> list[Column]:
    """One integer bucket key per band: the band's sign bits packed
    big-endian. Each bit is sign(v · plane_p) computed by the JVM
    aggregate/zip_with dot product — no Python in the row path."""
    vc = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    n_bits = len(planes)
    r = n_bits // bands
    bits = [
        (dot_product(vc, F.array(*[F.lit(float(x)) for x in plane])) >= 0).cast("int")
        for plane in planes
    ]
    return [
        sum(
            (bits[b * r + i] * F.lit(1 << (r - 1 - i)) for i in range(r)),
            start=F.lit(0),
        ).alias(f"bkey_{b}")
        for b in range(bands)
    ]


def srp_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.45,
    dim: int = 64,
    n_bits: int = 24,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hot_bucket_cap: int | None = 10_000,
) -> DataFrame:
    """Embedding near-dup pairs via signed-random-projection LSH — the
    SCALE path for embedding dedup when no coarse block column exists
    (embedding_near_dup_pairs is quadratic within its block).

    Candidate pairs are vectors agreeing on ALL bits of at least one
    band (cosine-LSH: P[bit match] = 1 - θ/π, so a band of r bits
    collides with p^r — near-parallel vectors collide in some band
    w.h.p., random pairs almost never). Expected candidate volume is
    Σ_band Σ_bucket |bucket|²/2 ≈ n²·bands/2^(r+1): tune n_bits/bands
    so buckets stay small; defaults (4 bands × 6 bits) keep recall
    ≈ (1-(1-p^6)^4) ≈ 0.87 at sim 0.9 with 64 buckets per band.

    Physical shape mirrors minhash_lsh_pairs: band keys are computed
    once per row (JVM dot products), candidates are generated on a
    lite (id, band, key) projection via an equi-join — never a cross
    product — deduped, then vectors re-attached by id for the exact
    cosine verify. Output: (id_a, id_b, sim) with sim >= threshold.
    """
    planes = srp_planes(dim, n_bits)
    base = df.select(F.col(id_col), F.col(vec_col)).withColumn(
        "nrm", l2_norm(vec_col)
    )
    sig = base.select(
        id_col, F.posexplode(F.array(*srp_band_keys(vec_col, planes, bands))).alias(
            "band", "bkey"
        )
    )
    if hot_bucket_cap is not None:
        # same hazard + remedy as dedup.minhash_lsh_pairs: zero-vector
        # / degenerate embeddings all land in one band bucket and emit
        # B²/2 pairs; cap it before the self-join (window partitions
        # on the join's own shuffle key — no extra exchange). The
        # dedup.lsh_bucket_stats pattern applies for telemetry.
        from pyspark.sql.window import Window

        sig = sig.withColumn(
            "_bsz", F.count(F.lit(1)).over(Window.partitionBy("band", "bkey"))
        ).filter(F.col("_bsz") <= hot_bucket_cap).drop("_bsz")
    a = sig.select(F.col(id_col).alias(f"a_{id_col}"), "band", "bkey")
    b = sig.select(F.col(id_col).alias(f"b_{id_col}"), "band", "bkey")
    par = df.sparkSession.sparkContext.defaultParallelism
    pairs = (
        a.repartition(par, F.col(f"a_{id_col}"))
        .join(b, ["band", "bkey"], "inner")
        .filter(F.col(f"a_{id_col}") < F.col(f"b_{id_col}"))
        .select(f"a_{id_col}", f"b_{id_col}")
        .distinct()  # a pair may collide in several bands
        .repartition(par, F.col(f"a_{id_col}"))
    )
    va = base.select(
        F.col(id_col).alias(f"a_{id_col}"),
        F.col(vec_col).alias("a_vec"), F.col("nrm").alias("a_nrm"),
    )
    vb = base.select(
        F.col(id_col).alias(f"b_{id_col}"),
        F.col(vec_col).alias("b_vec"), F.col("nrm").alias("b_nrm"),
    )
    return (
        pairs.join(va, f"a_{id_col}").join(vb, f"b_{id_col}")
        .withColumn(
            "sim",
            round_half_up(
                dot_product("a_vec", "b_vec") / (F.col("a_nrm") * F.col("b_nrm")), 6
            ),
        )
        .filter(F.col("sim") >= threshold)
        .select(
            F.col(f"a_{id_col}").alias(f"{id_col}_a"),
            F.col(f"b_{id_col}").alias(f"{id_col}_b"),
            "sim",
        )
    )


def assign_ivf_bucket(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Assign each vector to its max-cosine centroid bucket.

    The per-iteration assignment step of ``kmeans_buckets`` exposed
    standalone, for INGEST time: new vectors pick a bucket against
    the frozen quantizer (one broadcast pass, JVM dot products,
    deterministic ties → lowest bucket). Output: input columns +
    ``bucket_col``.
    """
    cent = centroids.select(
        F.col(bucket_col).alias("_b"), F.col(vec_col).alias("_cv")
    ).withColumn("_cn", l2_norm("_cv"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("_sim").desc(), F.col("_b").asc()
    )
    return (
        df.withColumn("_n", l2_norm(vec_col))
        .crossJoin(F.broadcast(cent))
        .withColumn(
            "_sim",
            round_half_up(
                dot_product(vec_col, "_cv") / (F.col("_n") * F.col("_cn")), 6
            ),
        )
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .withColumn(bucket_col, F.col("_b"))
        .drop("_b", "_cv", "_cn", "_n", "_sim", "_rk")
    )


def upsert_ivf_index(
    spark,
    index_path: str,
    embeddings: DataFrame,
    centroids: DataFrame,
    order_col: str = "upd_seq",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "bucket",
) -> None:
    """Maintain a bucket-partitioned parquet IVF index incrementally.

    Each (micro)batch of new/updated vectors is bucket-assigned
    against the frozen quantizer and upserted by ``id_col`` into the
    index table, which is hive-partitioned by bucket so (a) only
    buckets receiving vectors are rewritten (dynamic partition
    overwrite — operators/compaction.py) and (b) ``ivf_topk`` probe
    reads become PARTITION-PRUNED directory scans, not row filters.
    Streaming: pass this as the foreachBatch body — the ANN index
    stays queryable and fresh without ever rebuilding the corpus.

    NOTE a vector UPDATE can move a key across buckets; compaction
    handles it because the key's old row only survives in a partition
    being rewritten if the key re-appears there — the merge is by
    key, then rows land in their (new) bucket partition. Stale-bucket
    leftovers are impossible within a touched partition and the
    untouched-partition case cannot hold the key's latest row anyway
    UNLESS the key moved OUT of an untouched partition — so the read
    side semi-joins on the CHANGED KEYS' old buckets too: we simply
    include every partition holding one of the batch's keys.
    """
    from pyspark.sql.utils import AnalysisException

    from umn_eda_kafka_stream_processing_spark.operators.compaction import (
        compact_changelog,
    )

    assigned = assign_ivf_bucket(
        embeddings, centroids, id_col, vec_col, bucket_col
    )
    try:
        old = spark.read.parquet(index_path)
    except AnalysisException:
        old = None

    emptied: set = set()
    if old is None:
        merged = compact_changelog(None, assigned, id_col, order_col)
    else:
        batch_keys = assigned.select(id_col).distinct()
        # partitions receiving new rows ∪ partitions holding an
        # updated key's OLD row (the key may change buckets).
        # Collected BEFORE the overwrite — bucket ids are tiny, and
        # any plan that still references `old` after the write would
        # re-list the deleted part files
        touched_buckets = {
            r[bucket_col]
            for r in (
                assigned.select(bucket_col)
                .unionByName(
                    old.join(F.broadcast(batch_keys), id_col, "left_semi")
                    .select(bucket_col)
                )
                .distinct()
                .collect()
            )
        }
        old_touched = old.filter(
            F.col(bucket_col).isin(*touched_buckets)
            if touched_buckets else F.lit(False)
        )
        merged = compact_changelog(
            old_touched, assigned, id_col, order_col
        ).localCheckpoint()
        # dynamic overwrite only replaces partitions the job WRITES: a
        # touched bucket whose last vector moved away produces no
        # output rows, so its stale directory would survive — drop it
        # explicitly (merged is checkpointed, so this collect is safe)
        written = {
            r[bucket_col]
            for r in merged.select(bucket_col).distinct().collect()
        }
        emptied = touched_buckets - written

    (
        merged.write.mode("overwrite")
        .partitionBy(bucket_col)
        .option("partitionOverwriteMode", "dynamic")
        .parquet(index_path)
    )

    if old is not None:
        if emptied:
            jvm = spark.sparkContext._jvm
            jsc = spark.sparkContext._jsc
            conf = jsc.hadoopConfiguration()
            for b in emptied:
                p = jvm.org.apache.hadoop.fs.Path(
                    f"{index_path}/{bucket_col}={b}"
                )
                fs = p.getFileSystem(conf)
                fs.delete(p, True)

    # the session's shared FileStatusCache still lists the replaced
    # files; without this, the next read of the index can hit
    # FILE_NOT_EXIST on the overwritten partitions
    spark.catalog.refreshByPath(index_path)
