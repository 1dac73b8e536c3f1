"""Similarity search over embedding columns: brute-force cosine top-k
(baseline/oracle) and an LSH-bucketed approximate variant (scale path).

Scale design: brute force is O(N*Q) — fine when the query side broadcasts
(Q small) but not for all-pairs at 10^12 rows.  The scale path is
sign-random-projection LSH: 16 hyperplane signs -> 64Ki buckets; probing a
query's own bucket plus single-bit-flip neighbors bounds candidates to
~N/65536 * 17 per query.  Both paths share the quantized-integer cosine
(exact, engine-independent) used by the correctness oracle; the float
variant keeps full precision for production use.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantize(emb: DataFrame, scale: int = 1000, col: str = "embedding") -> DataFrame:
    q = F.transform(col, lambda v: F.round(v.cast("double") * scale).cast("bigint"))
    out = emb.withColumn("q", q)
    return out.withColumn(
        "n2", F.aggregate("q", F.lit(0).cast("bigint"), lambda acc, x: acc + x * x)
    )


def _cos(qa: str, qb: str, na: str, nb: str) -> F.Column:
    dot = F.aggregate(
        F.zip_with(F.col(qa), F.col(qb), lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return dot.cast("double") / (F.sqrt(F.col(na).cast("double")) * F.sqrt(F.col(nb).cast("double")))


def cosine_topk(emb: DataFrame, query_ids: list[int], k: int = 10) -> DataFrame:
    """Exact cosine top-k: broadcast the query vectors against all rows,
    rank per query. Ties broken by neighbor id; self excluded."""
    q = quantize(emb)
    queries = q.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qq"), F.col("n2").alias("qn2")
    )
    pairs = q.crossJoin(F.broadcast(queries)).filter(F.col("vec_id") != F.col("qid"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        pairs.withColumn("cos", _cos("qq", "q", "qn2", "n2"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("vec_id").alias("nid"), "rank", F.round("cos", 6).alias("cos_r"))
    )


def srp_bucket(emb: DataFrame, nbits: int = 16, dim: int = 64, seed: int = 23) -> DataFrame:
    """Sign-random-projection bucket id per vector (JVM-side: the hyperplane
    matrix rides as literal arrays into an aggregate expression).

    `dim` must equal the embedding length: zip_with against a wrong-length
    hyperplane null-pads, nulling every dot product and collapsing all
    buckets to 0 (LSH silently degenerates to a cross join) — so a
    per-row guard raises instead."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((nbits, dim))
    bucket = None
    for i in range(nbits):
        lits = F.array(*[F.lit(float(v)) for v in planes[i]])
        dot = F.aggregate(
            F.zip_with(F.col("embedding"), lits, lambda x, p: x.cast("double") * p),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    guarded = F.when(F.size("embedding") == dim, bucket.cast("bigint")).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"srp_bucket: dim={dim} but embedding has "),
                F.size("embedding").cast("string"),
                F.lit(" elements — pass dim explicitly"),
            ).cast("string")
        ).cast("bigint")
    )
    return emb.withColumn("bucket", guarded)


def ann_topk_lsh(
    emb: DataFrame, query_ids: list[int], k: int = 10, nbits: int = 12,
    two_bit_probe: bool = True, dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's SRP bucket and
    its bit-flip neighbor buckets (multi-probe LSH: all 1-bit flips, plus
    2-bit flips when two_bit_probe — nbits*(nbits-1)/2 extra probes buys
    recall on tight clusters), exact rerank inside the probed buckets.
    `dim` is the embedding dimensionality (a parameter, not inferred — plan
    construction must run zero Spark jobs)."""
    b = srp_bucket(emb, nbits, dim)
    q = quantize(b)
    queries = q.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qq"),
        F.col("n2").alias("qn2"), F.col("bucket").alias("qbucket"),
    )
    flips = [0] + [1 << i for i in range(nbits)]
    if two_bit_probe:
        flips += [(1 << i) | (1 << j) for i in range(nbits) for j in range(i + 1, nbits)]
    probes = queries.select(
        "qid", "qq", "qn2",
        F.explode(
            F.array(*[F.col("qbucket").bitwiseXOR(F.lit(m)) for m in flips])
        ).alias("bucket"),
    )
    cand = q.join(F.broadcast(probes), "bucket").filter(F.col("vec_id") != F.col("qid"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("cos", _cos("qq", "q", "qn2", "n2"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("vec_id").alias("nid"), "rank", F.round("cos", 6).alias("cos_r"))
    )


def ivf_assign(emb: DataFrame, n_centroids: int = 64, stride: int | None = None) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: centroids = a deterministic sample of the
    vectors themselves (vec_id-stride sampling — seeded, training-free; a
    Lloyd refinement can replace it without changing the plan shape).
    Returns (centroids(cid, cq, cn2), assigned(vec_id, q, n2, cid)) where
    each vector joins its nearest centroid — broadcast cross join + window
    min, the classic IVF list assignment."""
    q = quantize(emb)
    if stride is None:
        # fallback only: sizing the stride needs the row count (a driver
        # action during plan construction) — pass stride explicitly in
        # pipelines that must stay job-free until the terminal action
        total = q.count()
        stride = max(total // n_centroids, 1)
    cents = (
        q.filter(F.col("vec_id") % stride == 0)
        .limit(n_centroids)
        .select(F.col("vec_id").alias("cid"), F.col("q").alias("cq"), F.col("n2").alias("cn2"))
    )
    assigned = _assign_to(q.select("vec_id", "q", "n2"), cents)
    return cents, assigned


def _assign_to(q: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast cross join + window min."""
    pairs = q.crossJoin(F.broadcast(cents))
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        pairs.withColumn("cos", _cos("q", "cq", "n2", "cn2"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("vec_id", "q", "n2", "cid")
    )


def lloyd_refine(
    assigned: DataFrame, dim: int, iters: int = 2
) -> tuple[DataFrame, DataFrame]:
    """Lloyd's k-means refinement of the IVF coarse quantizer: each pass
    recomputes every centroid as the elementwise mean of its list, then
    reassigns.  The mean is `dim` map-side-combined AVG aggregates in ONE
    groupBy (no explode: 10^12 x 64-dim would be a 6.4e13-row explode; this
    is a single shuffle of n_centroids*dim partial sums), the reassignment
    is the same broadcast cross join as ivf_assign — plan shape unchanged,
    so refined IVF swaps in transparently (ivf_assign docstring).
    Returns (refined centroids, reassignment).  localCheckpoint per pass
    keeps the iteration's lineage flat (the C5 fixed-point trick)."""
    for _ in range(iters):
        means = assigned.groupBy("cid").agg(
            F.array(*[F.avg(F.element_at("q", i + 1)) for i in range(dim)]).alias("m")
        )
        cents = means.select(
            "cid",
            F.transform("m", lambda v: F.round(v).cast("bigint")).alias("cq"),
        ).withColumn(
            "cn2",
            F.aggregate("cq", F.lit(0).cast("bigint"), lambda a, x: a + x * x),
        )
        cents = cents.localCheckpoint()
        assigned = _assign_to(assigned.select("vec_id", "q", "n2"), cents)
    return cents, assigned


def ann_topk_ivf(
    emb: DataFrame, query_ids: list[int], k: int = 10,
    n_centroids: int = 64, nprobe: int = 8, stride: int | None = None,
    lloyd_iters: int = 2, dim: int = 64,
) -> DataFrame:
    """IVF ANN: probe the nprobe nearest centroid lists per query, exact
    rerank inside. Candidates ~ N * nprobe / n_centroids per query.
    Pass `stride` (centroid sampling stride) to avoid the row-count job in
    the coarse assignment (None falls back to a count); note the Lloyd
    default below runs bounded refinement jobs during construction — for
    a FULLY job-free plan build pass lloyd_iters=0 AND a stride.
    lloyd_iters refines the sampled
    centroids with Lloyd passes (better-balanced lists -> higher recall at
    the same nprobe).  Default 2 from the round-3 sweep (nprobe x
    lloyd_iters x 3 seeds on embeddings_synth, 64 overlapping clusters,
    spread=3): avg recall@10 at nprobe=8 was 0.73 (lloyd 0), 0.85 (1),
    0.90 (2) — lloyd_iters=2 crosses the 0.9 bar; on well-separated
    clusters (spread=1) every config scores 1.0, and in the near-random
    regime (spread=6) no refinement helps (~0.5 at nprobe=8), so 2 is the
    right spend exactly where refinement pays."""
    cents, assigned = ivf_assign(emb, n_centroids, stride=stride)
    if lloyd_iters > 0:
        cents, assigned = lloyd_refine(assigned, dim=dim, iters=lloyd_iters)
    queries = assigned.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qq"), F.col("n2").alias("qn2")
    )
    qc = queries.crossJoin(F.broadcast(cents))
    wq = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    probes = (
        qc.withColumn("cos", _cos("qq", "cq", "qn2", "cn2"))
        .withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= nprobe)
        .select("qid", "qq", "qn2", "cid")
    )
    cand = assigned.join(F.broadcast(probes), "cid").filter(F.col("vec_id") != F.col("qid"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("cos", _cos("qq", "q", "qn2", "n2"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("vec_id").alias("nid"), "rank", F.round("cos", 6).alias("cos_r"))
    )


# ---------------------------------------------------------------- PQ / ADC

def pq_train(
    emb: DataFrame, m: int = 8, dim: int = 64, k: int = 16,
    sample: int = 2048, seed: int = 29, iters: int = 8, col: str = "embedding",
) -> np.ndarray:
    """Train product-quantization codebooks (Jegou et al. 2011): split the
    dim into `m` subspaces, k-means each on a BOUNDED deterministic sample
    (vec_id order, <= sample*dim*8 bytes on the driver — the one permitted
    collect; at 10^12 rows you train once on a sample and reuse the
    codebooks, exactly like a real IVF-PQ index build).
    Returns (m, k, dim//m) float64 codebooks."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    rows = emb.select("vec_id", col).orderBy("vec_id").limit(sample).collect()
    X = np.array([list(r[1]) for r in rows], dtype=np.float64)
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.zeros((m, k, dsub))
    for j in range(m):
        sub = X[:, j * dsub : (j + 1) * dsub]
        C = sub[rng.choice(len(sub), size=k, replace=False)].copy()
        for _ in range(iters):
            d = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            a = d.argmin(1)
            for c in range(k):
                pts = sub[a == c]
                if len(pts):
                    C[c] = pts.mean(0)
        books[j] = C
    return books


def pq_encode(emb: DataFrame, books: np.ndarray, col: str = "embedding") -> DataFrame:
    """Attach `codes` (array<int>, one code per subspace): nearest-centroid
    argmin per subspace with the codebooks riding as LITERAL arrays into
    the expression tree — pure JVM codegen, no Python on the encode path
    (m*k bounded subvector distances per row; m=8,k=16 -> 128 eight-term
    sums, well inside codegen limits).  First-occurrence argmin ties make
    the encoding deterministic."""
    m, k, dsub = books.shape
    codes = []
    for j in range(m):
        sub = F.slice(F.col(col), j * dsub + 1, dsub)
        dists = F.array(*[
            F.aggregate(
                F.zip_with(
                    sub,
                    F.array(*[F.lit(float(v)) for v in books[j][c]]),
                    lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for c in range(k)
        ])
        codes.append((F.array_position(dists, F.array_min(dists)) - 1).cast("int"))
    return emb.withColumn("codes", F.array(*codes))


def pq_luts(qvecs: np.ndarray, books: np.ndarray) -> np.ndarray:
    """ADC lookup tables: (nq, m*k) squared distances from each query
    subvector to every centroid — numpy twin used by pq_search and tests."""
    m, k, dsub = books.shape
    nq = qvecs.shape[0]
    luts = np.zeros((nq, m * k))
    for j in range(m):
        qs = qvecs[:, j * dsub : (j + 1) * dsub]
        d = ((qs[:, None, :] - books[j][None, :, :]) ** 2).sum(-1)  # (nq, k)
        luts[:, j * k : (j + 1) * k] = d
    return luts


def pq_search(
    encoded: DataFrame, query_ids: list[int], books: np.ndarray,
    k: int = 10, shortlist: int = 100, col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance PQ search with exact rerank: ADC distance =
    sum_j lut[j, code_j] (a transform-with-index + aggregate, all JVM over
    the broadcast per-query LUT), shortlist per query by ADC, then exact
    float L2 rerank of the shortlist against the raw vectors — the
    standard IVF-PQ serving shape (codes scan fast, exact math only on
    candidates).  Candidates per query = shortlist, so the rerank join is
    broadcastable at any corpus size."""
    m, kc, dsub = books.shape
    qrows = (
        encoded.filter(F.col("vec_id").isin(query_ids))
        .select("vec_id", col).orderBy("vec_id").collect()
    )
    qvecs = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    luts = pq_luts(qvecs, books)
    spark = encoded.sparkSession
    queries = spark.createDataFrame(
        [
            (int(r[0]), [float(v) for v in luts[i]], [float(v) for v in qvecs[i]])
            for i, r in enumerate(qrows)
        ],
        "qid long, lut array<double>, qvec array<double>",
    )
    adc = F.aggregate(
        F.transform(
            "codes", lambda c, i: F.element_at("lut", (i * kc + c + 1).cast("int"))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = encoded.select("vec_id", "codes", col).crossJoin(F.broadcast(queries))
    pairs = pairs.filter(F.col("vec_id") != F.col("qid")).withColumn("adc", adc)
    ws = Window.partitionBy("qid").orderBy(F.col("adc").asc(), F.col("vec_id").asc())
    cand = pairs.withColumn("srnk", F.row_number().over(ws)).filter(
        F.col("srnk") <= shortlist
    )
    l2 = F.aggregate(
        F.zip_with(
            F.col(col), F.col("qvec"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("qid").orderBy(F.col("l2").asc(), F.col("vec_id").asc())
    return (
        cand.withColumn("l2", l2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("vec_id").alias("nid"), "rank", F.round("l2", 6).alias("l2_r"))
    )


def phash_topk(
    df: DataFrame,
    queries: list[tuple[int, int]],
    k: int = 5,
    id_col: str = "image_id",
    hash_col: str = "phash",
) -> DataFrame:
    """Exact Hamming top-k retrieval over a 64-bit perceptual-hash
    column — the image-similarity lookup the BASELINE input schema
    (image_id, ..., phash int64) exists for: "find the k most visually
    similar images to this one" without touching a pixel.

    queries: small literal batch [(qid, qhash), ...] (the broadcast-
    small-side pattern; for bulk all-vs-all near-dup use the banded
    dedup.phash_near_dups instead — this is the LOOKUP shape).
    Distance = bit_count(a XOR b), ties by id ascending.  Exact — the
    oracle path; the banded variant is the recall-bounded scale path.

    Returns (qid, rank, id, hamming).

    Plan: broadcast crossJoin against the tiny query batch, XOR +
    bit_count in codegen, one window rank per qid — the knn_bruteforce
    discipline applied to Hamming space.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    q = spark.createDataFrame(queries, "qid long, qhash long")
    ham = F.bit_count(F.col(hash_col).bitwiseXOR(F.col("qhash")))
    w = Window.partitionBy("qid").orderBy(F.col("hamming").asc(), F.col("id").asc())
    return (
        df.select(F.col(id_col).alias("id"), F.col(hash_col))
        .crossJoin(F.broadcast(q))
        .withColumn("hamming", ham.cast("int"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "id", "hamming")
    )
