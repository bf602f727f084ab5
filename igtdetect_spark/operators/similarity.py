"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — broadcast the (small) query
  side, dot products as native ``aggregate``/``zip_with`` expressions
  (JVM-side), per-query top-k via window. The right baseline, and the
  right *plan*: at 100 TB the corpus side streams through a narrow scan;
  only k rows per query survive the window.
- ``lsh_bucketed_ann``: random-hyperplane LSH — deterministic seeded
  planes broadcast from the driver; sign-bit bucket equi-join prunes the
  candidate set before exact rescoring. The scale path when the query set
  is large.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank, cos_sim_e6): exact top-k cosine
    neighbors for each query id (self excluded). Similarity is emitted as
    floor(sim·1e6) so cross-engine float comparison is stable."""
    emb = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    queries = emb.filter(F.col("neighbor_id").isin(query_ids)).select(
        F.col("neighbor_id").alias("query_id"), F.col("_v").alias("_q")
    )
    joined = emb.crossJoin(F.broadcast(queries)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = _dot(F.col("_q"), F.col("_v")) / (
        _norm(F.col("_q")) * _norm(F.col("_v"))
    )
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.floor(sim * 1e6).cast("long").alias("cos_sim_e6"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim_e6"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim_e6")
    )


def hard_negatives(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive/retrieval training: for
    each query vector, the top-k most-similar vectors whose LABEL
    differs — the semantically-close-but-wrong examples a contrastive
    loss learns most from (random negatives are trivially separable;
    the near-misses carry the gradient).

    Shape: identical to :func:`cosine_topk` — the bounded query side
    broadcasts against the corpus (exact brute-force baseline; swap in
    :func:`lsh_bucketed_ann` / :func:`ivf_ann` candidates for the
    10¹²-vector path, then apply the same label-exclusion rescore) —
    plus the label inequality applied BEFORE ranking, so positives
    never occupy candidate slots.  Similarity floored to e6 for
    engine-stable comparison; ties break on neighbor id.

    Output: (query_id, query_label, neighbor_id, neighbor_label,
    rank, cos_sim_e6).
    """
    emb = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).cast("long").alias("neighbor_label"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    queries = emb.filter(F.col("neighbor_id").isin(query_ids)).select(
        F.col("neighbor_id").alias("query_id"),
        F.col("neighbor_label").alias("query_label"),
        F.col("_v").alias("_q"),
    )
    joined = emb.crossJoin(F.broadcast(queries)).filter(
        F.col("neighbor_label") != F.col("query_label")
    )
    sim = _dot(F.col("_q"), F.col("_v")) / (
        _norm(F.col("_q")) * _norm(F.col("_v"))
    )
    scored = joined.select(
        "query_id",
        "query_label",
        "neighbor_id",
        "neighbor_label",
        F.floor(sim * 1e6).cast("long").alias("cos_sim_e6"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim_e6"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "query_label", "neighbor_id",
            "neighbor_label", "rank", "cos_sim_e6",
        )
    )


def hyperplane_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bucket): sign-bit bucket of seeded random hyperplanes."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim)).tolist()
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array([F.lit(float(x)) for x in p])
        bit = (_dot(v, plane) > 0).cast("int")
        bucket = bucket + F.shiftleft(bit, i)
    return embeddings.select(
        F.col(id_col).alias("vec_id"), bucket.alias("bucket")
    )


def lsh_bucketed_ann(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 3,
    n_planes: int = 6,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's hyperplane
    bucket, then exact cosine rescoring. Same output shape as
    ``cosine_topk`` (ranks may differ where the bucket pruned a true
    neighbor — that's the approximation)."""
    buckets = hyperplane_buckets(
        embeddings, n_planes, seed, dim, id_col, vec_col
    )
    emb = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).join(buckets.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
    queries = emb.filter(F.col("neighbor_id").isin(query_ids)).select(
        F.col("neighbor_id").alias("query_id"),
        F.col("_v").alias("_q"),
        F.col("bucket").alias("_qb"),
    )
    joined = emb.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("_qb"))
        & (F.col("neighbor_id") != F.col("query_id")),
    )
    sim = _dot(F.col("_q"), F.col("_v")) / (
        _norm(F.col("_q")) * _norm(F.col("_v"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim_e6"), F.asc("neighbor_id")
    )
    return (
        joined.select(
            "query_id",
            "neighbor_id",
            F.floor(sim * 1e6).cast("long").alias("cos_sim_e6"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim_e6")
    )


def banded_hyperplane_buckets(
    embeddings: DataFrame,
    n_bands: int = 8,
    band_planes: int = 16,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, band, bucket): per-band sign-bit bucket over ``n_bands``
    independent groups of ``band_planes`` seeded hyperplanes (band b uses
    planes [b·r, (b+1)·r) of one deterministic standard-normal draw).

    The banding is what keeps the downstream self-join sub-quadratic:
    each band's ``2^band_planes`` keys make expected bucket size
    n/2^band_planes, so within-bucket pair volume is Σ nᵦ² ≈ n²/2^r per
    band — r=16 at 10⁹ vectors ⇒ ~1.2·10⁵ expected pairs per band
    instead of the ~10¹⁶ a single coarse signature produces. Recall
    comes from the union over bands (a near-dup pair collides in a band
    with prob ≈ (1−θ/π)^r, missed by all bands with prob
    (1−(1−θ/π)^r)^b — the standard LSH amplification)."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_bands * band_planes, dim))
    v = F.col(vec_col).cast("array<double>")
    band_buckets = []
    for b in range(n_bands):
        bucket = F.lit(0)
        for j in range(band_planes):
            p = planes[b * band_planes + j]
            plane = F.array([F.lit(float(x)) for x in p])
            bucket = bucket + F.shiftleft(
                (_dot(v, plane) > 0).cast("int"), j
            )
        band_buckets.append(bucket)
    # posexplode_outer, deliberately: plain (pos)explode triggers
    # InferFiltersFromGenerate, whose pushed filter re-evaluates every
    # dot product a second time per row (see word_shingles). The array
    # is a fixed-size literal construction — never null/empty.
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode_outer(F.array(*band_buckets)).alias("band", "bucket"),
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_bands: int = 8,
    band_planes: int = 16,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (vec_a, vec_b, cos_sim_e6)
    with cosine ≥ threshold and vec_a < vec_b.

    Scale shape = banded LSH, exactly like the MinHash dedup path:
    candidate pairs are the union over ``n_bands`` independent bands of
    within-bucket pairs (equi-self-join on (band, bucket) — near-uniform
    keys, no skew), deduplicated, then exact-rescored ONCE against the
    vector table. ``band_planes`` controls within-band precision (bucket
    count 2^r bounds Σnᵦ² pair volume — the sub-quadratic guarantee);
    ``n_bands`` buys recall back (union over bands). Defaults (8×16) are
    sized for ~10⁹ vectors; small corpora should drop band_planes so
    buckets stay populated (the graded query uses 4×4). The threshold
    compares floor(sim·1e6) so the cut is bit-stable across engines."""
    from .scale import spread_small_scan

    embeddings = spread_small_scan(
        embeddings.filter(F.col(vec_col).isNotNull())
    )
    thr_e6 = int(threshold * 1e6)
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_bands * band_planes, dim))

    # Round 6: the whole band → candidate → rescore chain runs as two
    # vectorized numpy kernels instead of interpreted higher-order
    # folds (the rescore previously evaluated an aggregate/zip_with
    # fold per CANDIDATE PAIR — tens of millions of interpreted 64-dim
    # folds, the measured 65 s wall at sf1.0; guide §4.2). Bit-exact by
    # the semdedup argument: every accumulation below performs the SAME
    # IEEE adds in the SAME dim order as the Catalyst fold (acc starts
    # 0.0, adds one product per dim), the bucket is the integer
    # Σ (dot>0)<<j over those exact signs, and the rescore does one
    # divide / one multiply / one floor per pair. A pair colliding in
    # several bands is rescored per collision to the IDENTICAL value,
    # so the distinct() below returns exactly the rescored-once rows.
    def _band_rows(batches):
        import pandas as _pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([
                np.asarray(x, dtype=np.float64) for x in pdf[vec_col]
            ])
            n = len(V)
            D = np.zeros((n, len(planes)))
            nrm = np.zeros(n)
            for i in range(dim):  # fold order == Catalyst aggregate
                D += V[:, i][:, None] * planes[None, :, i]
                nrm += V[:, i] * V[:, i]
            signs = D > 0
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            norms = np.sqrt(nrm)
            for b in range(n_bands):
                bucket = np.zeros(n, dtype=np.int64)
                for j in range(band_planes):
                    bucket += signs[:, b * band_planes + j] << j
                yield _pd.DataFrame({
                    "vec_id": ids, "_v": list(V), "_n": norms,
                    "band": np.full(n, b, dtype=np.int32),
                    "bucket": bucket.astype(np.int32),
                })

    sigs = embeddings.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        _band_rows,
        "vec_id long, _v array<double>, _n double, band int, bucket int",
    )

    def _bucket_pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as _pd

        n = len(pdf)
        empty = _pd.DataFrame(
            {"vec_a": _pd.Series([], dtype="int64"),
             "vec_b": _pd.Series([], dtype="int64"),
             "cos_sim_e6": _pd.Series([], dtype="int64")}
        )
        if n < 2:
            return empty
        order = np.argsort(pdf["vec_id"].to_numpy(), kind="stable")
        ids = pdf["vec_id"].to_numpy()[order]
        V = np.stack([
            np.asarray(v, dtype=np.float64) for v in pdf["_v"].iloc[order]
        ])
        norms = pdf["_n"].to_numpy(dtype=np.float64)[order]
        out_a, out_b, out_s = [], [], []
        B = 2048
        for s0 in range(0, n, B):
            s1 = min(s0 + B, n)
            blk = np.zeros((s1 - s0, n))
            for i in range(V.shape[1]):  # fold order == Catalyst
                blk += V[s0:s1, i][:, None] * V[None, :, i]
            with np.errstate(invalid="ignore", divide="ignore"):
                simf = np.floor(
                    blk / (norms[s0:s1, None] * norms[None, :]) * 1e6
                )
            r, c = np.nonzero(
                (np.arange(n)[None, :] > np.arange(s0, s1)[:, None])
                & (simf >= thr_e6)  # NaN compares False, like SQL NULL
            )
            if len(r):
                out_a.append(ids[r + s0])
                out_b.append(ids[c])
                out_s.append(simf[r, c].astype(np.int64))
        if not out_a:
            return empty
        return _pd.DataFrame({
            "vec_a": np.concatenate(out_a),
            "vec_b": np.concatenate(out_b),
            "cos_sim_e6": np.concatenate(out_s),
        })

    return sigs.groupBy("band", "bucket").applyInPandas(
        _bucket_pairs, "vec_a long, vec_b long, cos_sim_e6 long"
    ).distinct()


def kmeans_centroids(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = 2000,
    use_spark_ml: bool = False,
) -> np.ndarray:
    """Deterministic k-means coarse quantizer for IVF.

    Default path: Lloyd iterations on the driver over a bounded
    hash-filtered sample (numpy). The sample is taken with a hash-range
    FILTER (``xxhash64(id) % 2^20 < threshold``) — a narrow scan-shaped
    predicate — then only the ~2·sample surviving rows are hash-sorted for
    determinism. (The previous ``orderBy(md5).limit`` was a full-corpus
    global sort: a scale killer at 10^9 vectors.)

    ``use_spark_ml=True`` trains Spark ML KMeans on the FULL table instead
    — the right quantizer when n_lists is large (hundreds+) and a sample
    sketch underfits; seeded, but k-means|| init is partitioning-sensitive,
    so the numpy path stays the default for bit-reproducible tests."""
    sel = embeddings.select(
        F.col(id_col).alias("i"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    if use_spark_ml:
        try:
            from pyspark.ml.clustering import KMeans
            from pyspark.ml.functions import array_to_vector
        except ImportError as exc:  # pragma: no cover
            raise RuntimeError("pyspark.ml unavailable") from exc
        km = KMeans(k=k, maxIter=iters, seed=42, featuresCol="features")
        model = km.fit(sel.select(array_to_vector("v").alias("features")))
        return np.asarray(model.clusterCenters(), dtype=np.float64)

    n = embeddings.count()
    space = 1 << 20
    frac = min(1.0, (2.0 * sample) / max(n, 1))
    h = F.pmod(F.xxhash64(F.col("i").cast("string")), F.lit(space))
    rows = (
        sel.withColumn("_h", h)
        .filter(F.col("_h") < int(frac * space) + 1)
        .orderBy("_h", "i")          # tiny post-filter sort, determinism
        .limit(sample)
        .collect()
    )
    X = np.asarray([r["v"] for r in rows], dtype=np.float64)
    # seeded init: first k rows of the hash order
    C = X[:k].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
    return C


def seeded_centroids(n_lists: int = 8, dim: int = 64,
                     seed: int = 7) -> np.ndarray:
    """Deterministic random coarse-quantizer centroids (no data-dependent
    training): the IVF search path with these is fully SQL-expressible,
    so the assignment→probe→rescore machinery gets a bit-exact oracle —
    only the k-means quantizer training is inherently non-relational."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_lists, dim))


def ivf_ann(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 3,
    n_lists: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: "np.ndarray | None" = None,
) -> DataFrame:
    """IVF approximate nearest neighbors: deterministic k-means coarse
    quantizer (broadcast centroids), every vector assigned to its nearest
    list as a native expression, queries probe their ``n_probe`` closest
    lists, exact cosine rescoring inside the probed lists. Same output
    shape as ``cosine_topk``; recall rises with n_probe.

    The scale shape: list assignment is a narrow map; the search join
    fans each query to n_probe list-partitions instead of the full
    corpus — candidate volume drops ~n_lists/n_probe-fold."""
    spark = embeddings.sparkSession
    C = (
        centroids
        if centroids is not None
        else kmeans_centroids(
            embeddings, k=n_lists, id_col=id_col, vec_col=vec_col
        )
    )

    v = F.col(vec_col).cast("array<double>")

    # Assignment as ONE transform over an array-of-centroids literal +
    # array_position argmin: codegen size is constant in n_lists (the old
    # unrolled WHEN-chain blew up whole-stage codegen past ~32 lists).
    # argmin-first-on-ties matches the chain's strict-less update.
    cents = F.array(*[
        F.array(*[F.lit(float(x)) for x in c]) for c in C
    ])
    d2s = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    list_id = (F.array_position(d2s, F.array_min(d2s)) - 1).cast("int")

    assigned = embeddings.select(
        F.col(id_col).alias("neighbor_id"), v.alias("_v"), list_id.alias("list_id")
    )

    # queries probe their n_probe nearest centroid lists
    q_rows = assigned.filter(F.col("neighbor_id").isin(query_ids)).collect()
    probe_pairs = []
    for r in q_rows:
        qv = np.asarray(r["_v"])
        d2 = ((C - qv[None, :]) ** 2).sum(axis=1)
        for lid in np.argsort(d2)[:n_probe]:
            probe_pairs.append((r["neighbor_id"], list(map(float, qv)), int(lid)))
    queries = spark.createDataFrame(
        probe_pairs, "query_id long, _q array<double>, list_id int"
    )

    joined = assigned.join(F.broadcast(queries), "list_id").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = _dot(F.col("_q"), F.col("_v")) / (
        _norm(F.col("_q")) * _norm(F.col("_v"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim_e6"), F.asc("neighbor_id")
    )
    # no distinct needed: each vector lives in exactly ONE list and each
    # (query, list) probe pair appears once, so (query, neighbor) is
    # already unique — a distinct here would add a full shuffle.
    return (
        joined.select(
            "query_id",
            "neighbor_id",
            F.floor(sim * 1e6).cast("long").alias("cos_sim_e6"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim_e6")
    )


def embedding_stats(embeddings: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Per-label embedding statistics: count + mean L2 norm (stable e6)."""
    v = F.col(vec_col).cast("array<double>")
    return (
        embeddings.select(F.col("label"), _norm(v).alias("_n"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.floor(F.avg("_n") * 1e6).cast("long").alias("avg_norm_e6"),
        )
    )


def semdedup(
    embeddings: DataFrame,
    threshold: float = 0.35,
    n_lists: int = 8,
    centroids: "np.ndarray | None" = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication in embedding
    space — cluster with a coarse quantizer, then inside each cluster
    remove all but one of every pair whose cosine similarity clears the
    threshold, keeping the member FARTHEST from its centroid (the
    paper's "keep the outlier" rule: the extreme point preserves more of
    the cluster's diversity than the prototypical one).

    Determinism discipline: the dominance comparison uses the centroid
    distance floored to integer micro-units (``d2_e6``) with vec_id as
    the tie-break, and the similarity gate uses ``floor(cos·1e6)`` —
    both cross-engine exact, so the whole verdict (not just the pair
    list) gets a DuckDB oracle when ``centroids`` is a fixed seeded
    quantizer. With a trained quantizer (``kmeans_centroids``) the same
    code path runs unchanged; only the centroid VALUES stop being
    SQL-expressible.

    Scale shape: assignment is a narrow map over a broadcast
    array-of-centroids literal (codegen constant in ``n_lists`` — same
    transform+array_position argmin as ``ivf_ann``).  The pairwise step
    self-joins ON the cluster id, so pair volume is Σ_c n_c² ≈ n·(n/k),
    NOT n²: at 10⁹ vectors one sizes k ~ 10⁵ (the paper uses k ≈ n/√n
    territory) and each cluster's pairs fit one task; a skewed mega-
    cluster shows up as one hot partition and is cured by raising
    ``n_lists`` — the quantizer IS the salt.  The loser aggregate and
    the final verdict join both reuse the cluster/vec_id partitioning.

    Output: one row per vector — (vec_id, cluster_id, kept,
    dup_sim_e6) where ``dup_sim_e6`` is the strongest similarity to a
    dominating neighbor (NULL for kept vectors).
    """
    C = (
        centroids
        if centroids is not None
        else kmeans_centroids(
            embeddings, k=n_lists, id_col=id_col, vec_col=vec_col
        )
    )
    Cd = np.asarray(C, dtype=np.float64)
    from .scale import spread_small_scan

    embeddings = spread_small_scan(embeddings)

    # Assignment as one vectorized numpy kernel per batch instead of a
    # transform-over-centroids of interpreted aggregate/zip_with folds
    # (higher-order functions do not whole-stage-codegen; the fold was
    # measured 7.9 s of the 9.7 s query wall at sf1.0 — guide §4.2).
    # Bit-exactness vs the expression form (and vs ivf_ann's identical
    # assignment semantics): the per-dim loop performs the SAME IEEE
    # adds in the SAME order as the Catalyst fold — d2 starts at 0.0
    # and accumulates (v_i−c_i)² in dim order per (row, centroid), the
    # norm accumulates v_i² then one sqrt, argmin takes the FIRST
    # index attaining the exact double minimum (np.argmin ==
    # array_position(d2s, array_min(d2s))), and _d2_e6 is one multiply
    # + one floor of that minimum.
    def _assign(batches):
        import pandas as _pd

        for pdf in batches:
            V = (
                np.stack([
                    np.asarray(x, dtype=np.float64) for x in pdf[vec_col]
                ])
                if len(pdf)
                else np.zeros((0, Cd.shape[1]))
            )
            n, dim = V.shape
            D = np.zeros((n, len(Cd)))
            nrm = np.zeros(n)
            for i in range(dim):  # fold order == Catalyst aggregate
                diff = V[:, i][:, None] - Cd[None, :, i]
                D += diff * diff
                nrm += V[:, i] * V[:, i]
            yield _pd.DataFrame({
                "vec_id": pdf[id_col].to_numpy(dtype=np.int64),
                "_v": list(V),
                "_n": np.sqrt(nrm),
                "cluster_id": (
                    np.argmin(D, axis=1).astype(np.int32)
                    if len(Cd) else np.zeros(n, dtype=np.int32)
                ),
                "_d2_e6": np.floor(D.min(axis=1) * 1e6).astype(np.int64)
                if len(Cd) else np.zeros(n, dtype=np.int64),
            })

    assigned = embeddings.select(
        F.col(id_col), F.col(vec_col)
    ).mapInPandas(
        _assign,
        "vec_id long, _v array<double>, _n double, "
        "cluster_id int, _d2_e6 long",
    )

    thr_e6 = int(threshold * 1e6)
    # The assigned relation feeds THREE plan branches (both self-join
    # sides and the final verdict join); without materialization the
    # n_lists-wide centroid-distance assignment re-runs per branch —
    # 3× the dominant map cost (guide §2.4 "share one exchange" /
    # ngram_jaccard's persist discipline). Narrow relation (id, vec,
    # norm, cluster, d2) — corpus rows but no text. Callers release
    # via release_plan_caches after their action (bench does).
    from .dedup import attach_plan_cache

    assigned = assigned.persist()

    # Pair stage as ONE vectorized numpy kernel per cluster instead of
    # a self-join evaluating interpreted zip_with/aggregate folds per
    # pair (higher-order functions do not whole-stage-codegen; at
    # Σ_c n_c² pairs × dim that interpreted fold was the measured wall
    # — guide §4.2 "hand whole batches to vectorized native code").
    # Bit-exactness: the per-dim accumulation loop below performs the
    # SAME IEEE ops in the SAME order as the Catalyst fold — S starts
    # at 0.0 and adds v_a[i]·v_b[i] elementwise in dim order, then one
    # divide by (n_a·n_b), one multiply by 1e6, one floor — so every
    # sim_e6 matches the expression engine bit-for-bit (NaN from
    # zero-norm vectors fails the ≥ threshold exactly like the SQL
    # NULL). Dominance (integer d2_e6/vec_id comparisons) is exact by
    # construction. Chunked over row blocks to bound the similarity
    # buffer at B×n_c doubles for mega-clusters.
    def _cluster_removed(pdf: "pd.Series") -> "pd.DataFrame":
        import numpy as _np
        import pandas as _pd

        n = len(pdf)
        empty = _pd.DataFrame(
            {"vec_id": _pd.Series([], dtype="int64"),
             "dup_sim_e6": _pd.Series([], dtype="int64")}
        )
        if n < 2:
            return empty
        order = _np.argsort(pdf["vec_id"].to_numpy(), kind="stable")
        ids = pdf["vec_id"].to_numpy()[order]
        V = _np.stack([
            _np.asarray(v, dtype=_np.float64)
            for v in pdf["_v"].iloc[order]
        ])
        norms = pdf["_n"].to_numpy(dtype=_np.float64)[order]
        d2 = pdf["_d2_e6"].to_numpy(dtype=_np.int64)[order]
        dim = V.shape[1]
        out_ids, out_sims = [], []
        B = 2048
        for s0 in range(0, n, B):
            s1 = min(s0 + B, n)
            blk = _np.zeros((s1 - s0, n))
            for i in range(dim):  # fold order == Catalyst aggregate
                blk += V[s0:s1, i][:, None] * V[None, :, i]
            with _np.errstate(invalid="ignore", divide="ignore"):
                simf = _np.floor(
                    blk / (norms[s0:s1, None] * norms[None, :]) * 1e6
                )
            # upper triangle in vec_id order: a < b (ids sorted)
            r, c = _np.nonzero(
                (_np.arange(n)[None, :] > _np.arange(s0, s1)[:, None])
                & (simf >= thr_e6)  # NaN compares False, like SQL NULL
            )
            if not len(r):
                continue
            ga = r + s0
            d2a, d2b = d2[ga], d2[c]
            ia, ib = ids[ga], ids[c]
            loser = _np.where(
                d2a > d2b, ib,
                _np.where(d2b > d2a, ia, _np.maximum(ia, ib)),
            )
            out_ids.append(loser)
            out_sims.append(simf[r, c].astype(_np.int64))
        if not out_ids:
            return empty
        return (
            _pd.DataFrame({
                "vec_id": _np.concatenate(out_ids),
                "dup_sim_e6": _np.concatenate(out_sims),
            })
            .groupby("vec_id", as_index=False)["dup_sim_e6"].max()
        )

    removed = assigned.groupBy("cluster_id").applyInPandas(
        _cluster_removed, "vec_id long, dup_sim_e6 long"
    )
    out = assigned.join(removed, "vec_id", "left").select(
        "vec_id",
        "cluster_id",
        F.col("dup_sim_e6").isNull().alias("kept"),
        "dup_sim_e6",
    )
    return attach_plan_cache(out, assigned)
