"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute-force cosine top-k — the exact baseline; a broadcast of the query
    set against a full scan of candidates (narrow, no shuffle of the
    candidate side; per-partition top-k then global merge);
  * LSH-bucketed ANN — random-hyperplane signatures restrict candidates to
    same-bucket vectors: at 100 TB the candidate scan drops by the bucket
    fan-out factor, trading recall for cost (standard sign-LSH).

Both are deterministic (hyperplanes derived from a seeded hash, not RNG).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pulsar_ingestion_spark.functions.vectors import cosine_rounded, cosine_rounded_kernel, dot


def knn_bruteforce(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query side should be small → broadcast; candidates stream through.
    Ordering ties broken by candidate id (deterministic output set).
    """
    from pulsar_ingestion_spark.functions.vectors import dot, norm

    # Norms precomputed per side → one dot per (query, candidate) pair.
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    c = candidates.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("cand_id"))
        .withColumn("cos_sim", F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def _hyperplane(dim: int, plane_idx: int, seed: int = 42) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane from a hash chain —
    reproducible across runs/engines without RNG state."""
    import hashlib
    import struct

    vals = []
    for j in range(dim):
        h = hashlib.md5(f"{seed}:{plane_idx}:{j}".encode()).digest()
        (u,) = struct.unpack(">q", h[:8])
        vals.append((u / float(1 << 63)))
    return vals


def auto_num_planes(n_rows: int, target_block: int = 4096, lo: int = 4, hi: int = 20) -> int:
    """Pick the sign-LSH plane count so the EXPECTED bucket holds about
    ``target_block`` vectors: ``2^planes ≈ n / target_block``.

    The two costs both scale with bucket size: the intra-block matmul is
    block²·dim flops and the Arrow group transfer is block·dim·8 bytes —
    4096×1024 doubles ≈ 32 MB/block, well inside an executor task.  Fewer
    planes → bigger blocks but HIGHER recall (a pair at cosine s collides
    with probability p^planes, p = 1 - acos(s)/π), so the tuner picks the
    smallest plane count whose blocks still fit: recall is maximized
    subject to the memory/compute envelope.  Clamped to [lo, hi]; at
    n = 10^10 (100 TB of 1 KB docs) this lands at ~21 planes → 2M buckets,
    which a 1000-executor cluster hash-partitions evenly.
    """
    import math

    if n_rows <= target_block:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(n_rows / target_block))))


def signlsh_buckets(
    df: DataFrame,
    dim: int,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane signature: bucket = bit-string of sign(v·h_i).
    Cosine-similar vectors collide with high probability.

    Computed by a vectorized Arrow kernel: each plane's dot product is
    accumulated column-by-column in float64 (``acc += V[:, j] * w[j]``) —
    the SAME IEEE add sequence as the ordered ``F.aggregate`` fold and the
    DuckDB oracle's ``list_reduce``, so buckets are bit-identical across
    all three forms (pinned by ``test_signlsh_kernel_matches_hof_fold``).
    The two expression forms were measured and rejected at the 100× scale
    point (SCALE.md §6n): the HOF fold dispatches ~2·dim interpreted
    lambdas per row (the signature pass dominated the whole LSH family),
    and an unrolled codegen tree (dim·planes·4 nodes per side) moves the
    cost into seconds of per-run analysis/codegen.  The kernel is ~3×
    faster than HOF at base and ~3.5× at 100×, with one Arrow transfer of
    the vector column per side."""
    from pyspark.sql.functions import pandas_udf

    planes = [
        np.array(_hyperplane(dim, i, seed), dtype=np.float64) for i in range(num_planes)
    ]

    @pandas_udf("long")
    def _bucket(v: pd.Series) -> pd.Series:
        n = len(v)
        if n == 0:
            return pd.Series([], dtype="Int64")
        vs = v.to_numpy()
        # NULL/wrong-dim guard (ADVICE r9): emit a NULL bucket per bad row
        # (downstream bucket equi-joins drop it — a NULL embedding has no
        # candidates) instead of np.vstack aborting the whole batch.
        valid = np.fromiter(
            (e is not None and len(e) == dim for e in vs), dtype=bool, count=n
        )
        res = pd.Series([pd.NA] * n, dtype="Int64")
        if valid.any():
            mat = np.vstack(vs[valid]).astype(np.float64)  # n_valid × dim
            out = np.zeros(len(mat), dtype=np.int64)
            for p, w in enumerate(planes):
                acc = np.zeros(len(mat), dtype=np.float64)
                for j in range(dim):
                    acc += mat[:, j] * w[j]
                out |= (acc > 0).astype(np.int64) << p
            res[valid] = out
        return res

    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        _bucket(F.col(vec_col)).alias("bucket"),
    )


def signlsh_buckets_multi(
    df: DataFrame,
    dim: int,
    num_planes: int,
    seeds: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-tables sign-LSH signatures in ONE Arrow pass (round 13): the
    per-table kernel of :func:`signlsh_buckets` ran once per hash table —
    T scans of the source and T JVM↔Python crossings of the vector
    column, unioned.  This kernel computes every table's bucket in one
    crossing and returns ``(id, vec, buckets array<long>)``; callers
    ``posexplode`` to ``(tbl, bucket)``.  Per-plane accumulation order is
    IDENTICAL to the single-table kernel (column-by-column float64
    adds), so bucket values are bit-equal table by table; invalid rows
    (NULL / wrong dim) yield a NULL per table, matching the per-table
    NULL-bucket guard."""
    from pyspark.sql.functions import pandas_udf

    all_planes = [
        [
            np.array(_hyperplane(dim, i, s), dtype=np.float64)
            for i in range(num_planes)
        ]
        for s in seeds
    ]
    ntab = len(seeds)

    @pandas_udf("array<long>")
    def _buckets(v: pd.Series) -> pd.Series:
        n = len(v)
        if n == 0:
            return pd.Series([], dtype="object")
        vs = v.to_numpy()
        valid = np.fromiter(
            (e is not None and len(e) == dim for e in vs), dtype=bool, count=n
        )
        out = [[None] * ntab] * n
        if valid.any():
            mat = np.vstack(vs[valid]).astype(np.float64)
            codes = np.zeros((len(mat), ntab), dtype=np.int64)
            for t, planes in enumerate(all_planes):
                for p, w in enumerate(planes):
                    acc = np.zeros(len(mat), dtype=np.float64)
                    for j in range(dim):
                        acc += mat[:, j] * w[j]
                    codes[:, t] |= (acc > 0).astype(np.int64) << p
            it = iter(codes.tolist())
            out = [next(it) if ok else [None] * ntab for ok in valid]
        return pd.Series(out, dtype="object")

    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        _buckets(F.col(vec_col)).alias("buckets"),
    )


def pq_encode_kernel(
    df: DataFrame,
    cents: list[tuple[int, list[float]]],
    subspaces: int,
    subdim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization encode as one vectorized Arrow pass: per
    subspace, the nearest codebook entry by L2 — returns
    ``(id, vec, enc struct<codes: array<bigint>, dists: array<double>>)``
    (vec carried through for rerank-style consumers; Catalyst prunes it
    where unused).  With ``subspaces=1, subdim=dim`` this is plain
    nearest-centroid assignment (the IVF coarse quantizer).

    ``cents`` is the codebook as driver-held rows (model-sized: K × dim
    floats — same stance as :func:`knn_ivf`'s centroids).  Replaces the
    relational encode (corpus ×K crossJoin + per-subspace HOF d2 +
    ``min(struct(d2, cid))`` groupBy): that plan shuffles the full
    corpus on vec_id, while this one is a narrow map — the right encode
    shape at 100 TB — and drops the interpreted-lambda d2 evaluation
    (SCALE.md §6n mechanism).

    Parity contract (pinned by ``test_pq_encode_kernel_matches_relational``):
    each subspace distance accumulates column-by-column in float64 —
    ``acc += (V[:, t] - c[t])²`` in element order, the same IEEE sequence
    as the ordered ``F.aggregate`` fold and the oracle's ``list_reduce``
    — and the codebook is scanned in ascending cid with strict-less
    updates, reproducing ``min(struct(d2, cid))``'s smallest-cid
    tie-break exactly."""
    from pyspark.sql.functions import pandas_udf

    cents_sorted = sorted(
        ((int(cid), np.asarray(cv, dtype=np.float64)) for cid, cv in cents),
        key=lambda x: x[0],
    )

    @pandas_udf("codes array<bigint>, dists array<double>")
    def _enc(v: pd.Series) -> pd.DataFrame:
        n_in = len(v)
        if n_in == 0:
            return pd.DataFrame({"codes": [], "dists": []})
        vs = v.to_numpy()
        need = subspaces * subdim
        # NULL/short-vector guard (ADVICE r9): NULL enc struct per bad
        # row instead of np.vstack aborting the whole batch.
        valid = np.fromiter(
            (e is not None and len(e) >= need for e in vs), dtype=bool, count=n_in
        )
        if not valid.any():
            return pd.DataFrame(
                {"codes": [None] * n_in, "dists": [None] * n_in}, dtype=object
            )
        # slice each valid vector to the encoded prefix: the kernel only
        # reads dims [0, need), and valid rows may carry DIFFERENT
        # lengths >= need — unsliced, np.vstack would abort the batch
        mat = np.vstack([np.asarray(e)[:need] for e in vs[valid]]).astype(np.float64)
        n = len(mat)
        codes = np.empty((n, subspaces), dtype=np.int64)
        dists = np.empty((n, subspaces), dtype=np.float64)
        for j in range(subspaces):
            off = j * subdim
            best_d = None
            best_c = None
            for cid, cv in cents_sorted:
                acc = np.zeros(n, dtype=np.float64)
                for t in range(subdim):
                    d = mat[:, off + t] - cv[off + t]
                    acc = acc + d * d
                if best_d is None:
                    best_d, best_c = acc, np.full(n, cid, dtype=np.int64)
                else:
                    upd = acc < best_d
                    best_d = np.where(upd, acc, best_d)
                    best_c = np.where(upd, cid, best_c)
            codes[:, j] = best_c
            dists[:, j] = best_d
        if valid.all():
            return pd.DataFrame({"codes": list(codes), "dists": list(dists)})
        out_codes: list = [None] * n_in
        out_dists: list = [None] * n_in
        for row, i in enumerate(np.nonzero(valid)[0]):
            out_codes[i] = codes[row]
            out_dists[i] = dists[row]
        return pd.DataFrame({"codes": out_codes, "dists": out_dists})

    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        _enc(F.col(vec_col)).alias("enc"),
    )


def knn_ivf(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer → probe the
    nprobe nearest cells → exact cosine rerank within them.

    The 100 TB plan: candidates live partitioned by cell id; each query
    touches nprobe/n_clusters of the data.  Centroids are a tiny model
    (n_clusters × dim floats) — driver-side math, broadcast join back.
    Deterministic for a fixed seed; recall grows with nprobe.
    """
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = candidates.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=n_clusters, seed=seed, featuresCol="features").fit(feats)
    assigned = model.transform(feats).select("id", "vec", F.col("prediction").alias("cell"))

    centroids = np.vstack([np.asarray(c) for c in model.clusterCenters()])

    spark = candidates.sparkSession
    cent_rows = [(int(i), [float(x) for x in centroids[i]]) for i in range(len(centroids))]
    cent_df = spark.createDataFrame(cent_rows, "cell int, cvec array<double>")

    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    # nprobe nearest cells per query: tiny cross join against the centroid
    # table (n_clusters rows, broadcast), top-nprobe by L2 distance.
    qc = (
        F.broadcast(cent_df)
        .crossJoin(q)
        .withColumn(
            "dist2",
            F.aggregate(
                F.zip_with(F.col("qv"), F.col("cvec"), lambda a, b: (a.cast("double") - b) ** 2),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    )
    wq = Window.partitionBy("qid").orderBy(F.asc("dist2"), F.asc("cell"))
    probes = qc.withColumn("pr", F.row_number().over(wq)).filter(F.col("pr") <= nprobe).select(
        "qid", "qv", "cell"
    )

    scored = (
        probes.join(assigned, "cell")
        .filter(F.col("qid") != F.col("id"))
        .withColumn("cos_sim", cosine_rounded(F.col("qv"), F.col("vec"), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"), F.col("id").alias("cand_id"), "cos_sim", "rank")
    )


def knn_lsh_multiprobe(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Multiprobe sign-LSH ANN: each query probes its own bucket PLUS the
    ``num_planes`` buckets at Hamming distance 1 (one plane bit flipped) —
    the standard recall boost that costs probe-count, not extra hash
    tables (no duplicate signatures/storage like multi-table LSH).

    Scale shape: the candidate side is bucketed ONCE; the query side
    explodes ×(num_planes+1) (queries are the small side), then the same
    hash equi-join as :func:`knn_lsh`.  A candidate lives in exactly one
    bucket and probe buckets are distinct, so no pair dedup is needed.
    Deterministic md5 hyperplanes → DuckDB-oracle-checkable.
    """
    qb = signlsh_buckets(queries, dim, num_planes, id_col, vec_col, seed)
    cb = signlsh_buckets(candidates, dim, num_planes, id_col, vec_col, seed)
    probe_buckets = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << i).cast("long")) for i in range(num_planes)],
    )
    probes = qb.select(
        F.col("id").alias("qid"),
        F.col("vec").alias("qv"),
        F.explode(probe_buckets).alias("bucket"),
    )
    scored = (
        probes.join(cb, "bucket")
        .filter(F.col("qid") != F.col("id"))
        .withColumn("cos_sim", cosine_rounded(F.col("qv"), F.col("vec"), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"), F.col("id").alias("cand_id"), "cos_sim", "rank")
    )


def _dist2(a, b):
    """Ordered-fold squared L2 distance (deterministic summation order —
    DuckDB list_reduce over the same zip order is bit-identical)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def knn_ivf_seeded(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN with an engine-portable coarse quantizer (VERDICT r2 item 2).

    Instead of k-means (engine-internal, not oracle-recomputable) the
    ``n_cells`` cell centroids are the candidate vectors whose
    ``md5(cast(id as string))`` sorts lowest — a deterministic uniform
    subsample any engine reproduces; cell id = the centroid's own id.
    Same IVF plan shape as :func:`knn_ivf`: the centroid table is a tiny
    model (n_cells × dim) collected once and re-broadcast as literals, so
    cell assignment and query probing are NARROW column expressions
    (array_min / array_sort over an n_cells-element struct array — no
    shuffle, no window); only the probe-cell rerank join shuffles.
    Distances/cosines are ordered folds → bit-exact vs a DuckDB oracle.
    """
    cents = (
        candidates.select(F.col(id_col).alias("cell"), F.col(vec_col).alias("cvec"))
        .orderBy(F.md5(F.col("cell").cast("string")))
        .limit(n_cells)
        .collect()
    )
    return knn_ivf_pinned(
        queries, candidates,
        [(r["cell"], [float(x) for x in r["cvec"]]) for r in cents],
        k=k, nprobe=nprobe, id_col=id_col, vec_col=vec_col,
    )


def ivf_assign_cells(
    df: DataFrame,
    cents: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector its nearest PINNED cell: ``(id, vec, cell)``.

    Assignment via the Arrow argmin kernel (1 subspace × full dim) —
    bit-identical to array_min over the (d2, cell) structs (same ordered
    fold per d2, same smallest-cell tie-break) but without
    ~2·dim·n_cells interpreted lambda dispatches per row, which
    dominated the 100× point (22.2 s; SCALE.md §6n cont.).  Shared by
    the batch IVF (:func:`knn_ivf_pinned`) and the streaming index
    maintainer (streaming/ann_index.stream_ivf_index) so both bucket
    identically by construction."""
    dim = len(cents[0][1])
    enc = pq_encode_kernel(df, list(cents), 1, dim, id_col=id_col, vec_col=vec_col)
    return enc.select("id", "vec", F.element_at("enc.codes", 1).alias("cell"))


def ivf_probe_cells(
    queries: DataFrame,
    cents: list[tuple[int, list[float]]],
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-query nprobe nearest pinned cells: ``(qid, qv, cell)`` — a
    NARROW column expression over the literal centroid table (no
    shuffle, no window)."""

    def cell_structs(vec):
        return F.array(*[
            F.struct(
                _dist2(vec, F.array(*[F.lit(float(x)) for x in cvec])).alias("d2"),
                F.lit(cell).cast("long").alias("cell"),
            )
            for cell, cvec in cents
        ])

    return (
        queries.select(
            F.col(id_col).alias("qid"),
            F.col(vec_col).alias("qv"),
            F.slice(F.array_sort(cell_structs(F.col(vec_col))), 1, nprobe).alias("pc"),
        )
        .select("qid", "qv", F.explode(F.col("pc")["cell"]).alias("cell"))
    )


def ivf_rerank(probes: DataFrame, assigned: DataFrame, k: int) -> DataFrame:
    """Exact-cosine rerank of probed cells — the shared tail of the batch
    and streaming IVF searches.  Cosine via the pair-dot Arrow kernel:
    the rerank volume is queries × probed-cell occupancy (~750k pairs at
    the 100× point) and the three HOF dot folds per pair dominated the
    wall — bit-identical finish (divide/sqrt/round stay JVM-side), see
    cosine_rounded_kernel."""
    scored = (
        probes.join(assigned, "cell")
        .filter(F.col("qid") != F.col("id"))
        .withColumn("cos_sim", cosine_rounded_kernel(F.col("qv"), F.col("vec"), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"), F.col("id").alias("cand_id"), "cos_sim", "rank")
    )


def knn_ivf_pinned(
    queries: DataFrame,
    candidates: DataFrame,
    cents: list[tuple[int, list[float]]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN under an EXPLICIT pinned centroid list — the core
    :func:`knn_ivf_seeded` delegates to after deriving its seeded
    centroids, and the batch-equivalence reference for the streaming
    index (streaming/ann_index.ivf_search)."""
    assigned = ivf_assign_cells(candidates, cents, id_col, vec_col)
    probes = ivf_probe_cells(queries, cents, nprobe, id_col, vec_col)
    return ivf_rerank(probes, assigned, k)


def knn_lsh(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int | None = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: exact rerank within the query's LSH bucket.

    The bucket equi-join replaces the cross join — this is the 100 TB plan
    (candidates partitioned by bucket; each query probes one partition).
    Recall < 1.0 by design; verify against knn_bruteforce on samples.
    ``num_planes=None`` → :func:`auto_num_planes` from the candidate count
    (one count() job against the scan, then sized buckets).
    """
    if num_planes is None:
        num_planes = auto_num_planes(candidates.count())
    qb = signlsh_buckets(queries, dim, num_planes, id_col, vec_col)
    cb = signlsh_buckets(candidates, dim, num_planes, id_col, vec_col)
    scored = (
        qb.alias("q")
        .join(cb.alias("c"), (F.col("q.bucket") == F.col("c.bucket")) & (F.col("q.id") != F.col("c.id")))
        .withColumn("cos_sim", cosine_rounded(F.col("q.vec"), F.col("c.vec"), 6))
    )
    w = Window.partitionBy(F.col("q.id")).orderBy(F.desc("cos_sim"), F.asc(F.col("c.id")))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("q.id").alias("query_id"), F.col("c.id").alias("cand_id"), "cos_sim", "rank")
    )

def ivf_probe_cells_ranked(
    queries: DataFrame,
    cents: list[tuple[int, list[float]]],
    max_nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-query probed cells WITH their probe rank: ``(qid, qv, cell,
    probe_rank)`` (1 = nearest centroid).  The rank-keeping twin of
    :func:`ivf_probe_cells` — lets one probing pass serve every nprobe
    <= max_nprobe (the recall-vs-nprobe sweep scores candidates once
    and derives each probe budget's candidate set by ``probe_rank <=
    nprobe``), same narrow no-shuffle shape."""

    def cell_structs(vec):
        return F.array(*[
            F.struct(
                _dist2(vec, F.array(*[F.lit(float(x)) for x in cvec])).alias("d2"),
                F.lit(cell).cast("long").alias("cell"),
            )
            for cell, cvec in cents
        ])

    return (
        queries.select(
            F.col(id_col).alias("qid"),
            F.col(vec_col).alias("qv"),
            F.slice(F.array_sort(cell_structs(F.col(vec_col))), 1, max_nprobe).alias("pc"),
        )
        .select(
            "qid", "qv",
            F.posexplode(F.col("pc")["cell"]).alias("pos", "cell"),
        )
        .select("qid", "qv", "cell", (F.col("pos") + 1).alias("probe_rank"))
    )
