"""Similarity search over an embedding column (array<float>).

Two paths:
  * :func:`ann_brute_topk` — exact cosine top-k, all JVM-side
    (zip_with + aggregate fold for the dot product). The correctness
    baseline; fine when one side is small (query set) and broadcast.
  * :func:`ann_lsh_topk` — random-hyperplane LSH bucketing: each
    vector hashed to a signed-projection bit code; candidates share a
    code in ≥1 of several hash tables; exact cosine re-ranks the
    candidates. The scale path: the big side is bucket-joined, never
    crossed. Recall < 1 by construction (probes can miss); the brute
    path is the oracle for measuring that recall.
  * :func:`embedding_dedup` — near-duplicate pairs by cosine ≥ τ.

Hyperplanes are deterministic (seeded numpy), shipped as literal
arrays, so results are engine-reproducible.

Scale notes: at 10^9+ vectors use the LSH path with
``repartition(bucket)``; the per-bucket candidate sets stay bounded,
and the final top-k re-rank is a per-query bounded heap
(rank-limit pushdown), exactly like the text top-k.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_col(a, b) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def ann_brute_topk(vectors: DataFrame, queries: DataFrame, k: int = 10,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   qid_col: str = "query_vec_id") -> DataFrame:
    """Exact cosine top-k of ``vectors`` for each query vector.
    Queries broadcast; the vector table is scanned once, never shuffled
    except for the final per-query bounded top-k."""
    q = queries.select(F.col(qid_col), F.col(vec_col).alias("qv"))
    scored = (vectors.alias("v").crossJoin(F.broadcast(q))
              .filter(F.col(id_col) != F.col(qid_col))
              .withColumn("cos", cosine_col(F.col(vec_col), F.col("qv"))))
    w = Window.partitionBy(qid_col).orderBy(
        F.round(F.col("cos"), 6).desc(), F.col(id_col).asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select(qid_col, F.col("rnk").cast("long").alias("rnk"),
                    id_col, F.round("cos", 4).alias("cos_r4"))
            .orderBy(qid_col, "rnk"))


def _hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_planes, dim))


def lsh_codes(df: DataFrame, id_col: str, vec_col: str,
              planes: np.ndarray, keep_vec: bool = False) -> DataFrame:
    """(id[, vec], tbl int, code int) — every hash table's
    signed-projection bit code per vector, one Arrow-batched numpy pass
    per partition (the ivf_assign pattern; the per-row Catalyst
    aggregate-lambda fold this replaces measured 3-15× slower —
    VERDICT r2 #4).

    Bit-identity contract: the projection is accumulated dim-by-dim
    (``acc = acc + v_d * p_d`` in float64), the exact operation order
    of the Spark zip_with/aggregate fold and of DuckDB
    list_inner_product — so the codes (sign of the fold) are
    bit-identical to the SQL oracle's, at any recall."""
    import pandas as pd
    from pyspark.sql import types as T
    n_tables, n_planes, dim = planes.shape
    P = planes.reshape(n_tables * n_planes, dim).T.copy()  # (dim, T*B)
    pow2 = (1 << np.arange(n_planes)).astype(np.int64)
    fields = [df.schema[id_col]]
    if keep_vec:
        fields.append(df.schema[vec_col])
    schema = T.StructType(fields + [
        T.StructField("tbl", T.IntegerType(), False),
        T.StructField("code", T.IntegerType(), False)])

    def codes_map(it):
        for pdf in it:
            n = len(pdf)
            if not n:
                continue
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            acc = np.zeros((n, n_tables * n_planes))
            for d in range(dim):
                # sequential-order accumulation: bit-identical to the
                # fold ((0 + v0*p0) + v1*p1) + ... per (row, plane)
                acc += X[:, d:d + 1] * P[d]
            bits = (acc > 0).reshape(n, n_tables, n_planes)
            codes = (bits * pow2).sum(axis=2).astype("int32")  # (n, T)
            idx = np.repeat(np.arange(n), n_tables)
            out = {id_col: pdf[id_col].values[idx]}
            if keep_vec:
                out[vec_col] = pdf[vec_col].values[idx]
            out["tbl"] = np.tile(np.arange(n_tables, dtype="int32"), n)
            out["code"] = codes.reshape(-1)
            yield pd.DataFrame(out)

    return df.select(id_col, vec_col).mapInPandas(codes_map, schema=schema)


def _dim_of(vectors: DataFrame, vec_col: str, dim: int | None) -> int:
    """Vector dimensionality; pass ``dim`` explicitly to avoid the
    one-row driver lookup (arrays carry no static length in the
    schema)."""
    if dim is not None:
        return dim
    return len(vectors.select(vec_col).first()[0])


def ann_lsh_topk(vectors: DataFrame, queries: DataFrame, k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 qid_col: str = "query_vec_id",
                 n_planes: int = 8, n_tables: int = 4,
                 seed: int = 7, dim: int | None = None) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates = vectors sharing a
    code with the query in ≥1 table; exact cosine re-ranks them."""
    planes = _hyperplanes(_dim_of(vectors, vec_col, dim),
                          n_planes, n_tables, seed)

    v_codes = lsh_codes(vectors, id_col, vec_col, planes, keep_vec=True)
    q_codes = lsh_codes(queries, qid_col, vec_col, planes, keep_vec=True) \
        .withColumnRenamed(vec_col, "qv")
    cands = (v_codes.join(F.broadcast(q_codes), ["tbl", "code"])
             .filter(F.col(id_col) != F.col(qid_col))
             .select(qid_col, "qv", id_col, vec_col)
             .distinct())
    scored = cands.withColumn("cos", cosine_col(F.col(vec_col), F.col("qv")))
    w = Window.partitionBy(qid_col).orderBy(
        F.round(F.col("cos"), 6).desc(), F.col(id_col).asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select(qid_col, F.col("rnk").cast("long").alias("rnk"),
                    id_col, F.round("cos", 4).alias("cos_r4"))
            .orderBy(qid_col, "rnk"))


def embedding_dedup(vectors: DataFrame, threshold: float = 0.95,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    method: str = "lsh",
                    n_planes: int = 8, n_tables: int = 4,
                    seed: int = 7, dim: int | None = None) -> DataFrame:
    """(a, b, cos) near-duplicate pairs with cosine ≥ threshold.

    ``method='lsh'`` (default, the scale path): candidates are pairs
    sharing a hyperplane code in ≥1 hash table — the self-join carries
    only (tbl, code, id), never the vectors; only candidate pairs are
    joined back to their vectors for the exact-cosine verify (the same
    candidates→verify shape as dedup_minhash_lsh). Recall < 1 by
    construction; planes/tables trade recall for candidate volume
    (deterministic under ``seed``, so any engine computing the same
    codes produces the same pairs).

    ``method='brute'``: the O(n²) crossJoin — the recall oracle, for
    small n only.
    """
    if method == "brute":
        a = vectors.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
        b = vectors.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
        pairs = (a.crossJoin(b).filter(F.col("a") < F.col("b"))
                 .withColumn("cos", cosine_col(F.col("va"), F.col("vb")))
                 .filter(F.col("cos") >= threshold))
        return pairs.select("a", "b", F.round("cos", 4).alias("cos_r4")) \
            .orderBy("a", "b")

    planes = _hyperplanes(_dim_of(vectors, vec_col, dim),
                          n_planes, n_tables, seed)
    # codes only — the self-join shuffle never carries the vectors.
    # Materialized once (localCheckpoint): the codes come out of an
    # opaque Arrow pass that the planner would otherwise re-run for
    # both self-join sides (the broadcast build side shares no
    # Exchange — the dedup_minhash_lsh lesson).
    codes = lsh_codes(vectors, id_col, vec_col, planes) \
        .withColumnRenamed(id_col, "id").localCheckpoint()
    cands = (codes.alias("x").join(
        codes.alias("y"),
        (F.col("x.tbl") == F.col("y.tbl")) &
        (F.col("x.code") == F.col("y.code")) &
        (F.col("x.id") < F.col("y.id")))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct())
    va = vectors.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    vb = vectors.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    pairs = (cands.join(va, "a").join(vb, "b")
             .withColumn("cos", cosine_col(F.col("va"), F.col("vb")))
             .filter(F.col("cos") >= threshold))
    return pairs.select("a", "b", F.round("cos", 4).alias("cos_r4")) \
        .orderBy("a", "b")


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer + cell-pruned scan —
# the FAISS IVF-Flat shape, Spark-native (NEXT r1 #7). Training is a
# driver-side numpy Lloyd's over a deterministic sample (k-means is
# tiny: nlist × dim floats); assignment and search are distributed.
# ---------------------------------------------------------------------------

def training_sample(vectors: DataFrame, sample_size: int = 4096,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    fraction: float | None = None,
                    seed: int = 7) -> np.ndarray:
    """ONE bounded, deterministic sample job shared by every ANN
    training call (VERDICT r3 #7: `kmeans_centroids` + `pq_train` used
    to scan the vector table once EACH). Returns unit-normalized
    float64 rows.

    Default: TakeOrdered(sample_size) by id — deterministic, one job,
    but the scan still touches every row. At 10⁹+ rows pass
    ``fraction`` (e.g. 1e-5): a CONTENT-deterministic modulus filter on
    the md5 hash of the id is applied at the scan (narrow op, nothing
    materialized) and the deterministic order-limit then runs over only
    ~fraction·N rows. Content-hash selection (not Spark's seeded
    Bernoulli sample) makes the sample a pure function of the DATA:
    the same corpus at any partition count / cluster layout yields the
    same sample, so quantizers trained on different cluster configs
    never silently diverge (ADVICE r4: seeded ``.sample`` is
    deterministic only for a fixed partition layout). ``seed`` salts
    the hash. The quantizer only needs a representative sample, not an
    exact prefix."""
    df = vectors.select(id_col, vec_col)
    if fraction is not None:
        from .dedup import md5_hash60
        m = max(1, int(round(1.0 / fraction)))
        df = df.filter(F.pmod(md5_hash60(
            F.concat(F.lit(f"ts{seed}:"), F.col(id_col).cast("string"))),
            F.lit(m)) == 0)
    rows = df.orderBy(id_col).limit(sample_size).select(vec_col).collect()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    return X


def kmeans_centroids(vectors: DataFrame, nlist: int = 16, iters: int = 10,
                     seed: int = 7, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     sample_size: int = 4096,
                     sample: np.ndarray | None = None) -> np.ndarray:
    """Spherical k-means (unit-normalized, dot-product assignment) over
    a deterministic sample (``training_sample``; pass ``sample`` to
    share ONE collected sample with ``pq_train`` — one scan total).
    Returns (nlist, dim) float64 centroids, unit-normalized.

    Scale: the sample collect is bounded (sample_size rows); training
    cost is numpy-local. For 10⁹+ corpora raise sample_size and pass a
    ``training_sample(fraction=...)`` output — the quantizer only needs
    to be representative, not exact."""
    X = sample if sample is not None else training_sample(
        vectors, sample_size, id_col, vec_col)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(nlist, len(X)), replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(C.shape[0]):
            members = X[assign == j]
            if len(members):
                c = members.sum(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-12)
    return C


def ivf_assign(vectors: DataFrame, centroids: np.ndarray,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(id, vec, cell) — nearest-centroid assignment, Arrow-batched
    numpy matmul per partition (no per-row Python)."""
    import pandas as pd
    from pyspark.sql import types as T
    C = centroids
    schema = T.StructType(
        [vectors.schema[id_col], vectors.schema[vec_col],
         T.StructField("cell", T.IntegerType(), False)])

    def assign_map(it):
        for pdf in it:
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True),
                                1e-12)
            pdf = pdf.copy()
            pdf["cell"] = np.argmax(Xn @ C.T, axis=1).astype("int32")
            yield pdf

    return vectors.select(id_col, vec_col).mapInPandas(assign_map,
                                                       schema=schema)


def ann_ivf_topk(vectors: DataFrame, queries: DataFrame, k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 qid_col: str = "query_vec_id",
                 nlist: int = 16, nprobe: int = 4, seed: int = 7,
                 centroids: np.ndarray | None = None,
                 assigned: DataFrame | None = None) -> DataFrame:
    """IVF-Flat approximate top-k: each query probes its ``nprobe``
    nearest cells; only those cells' vectors are exact-cosine ranked.
    Pass precomputed ``centroids``/``assigned`` to amortize across
    query batches (the serving shape: assignment is written once,
    partitioned by cell, and the per-query scan prunes to
    nprobe/nlist of the corpus)."""
    spark = vectors.sparkSession
    if centroids is None:
        centroids = kmeans_centroids(vectors, nlist=nlist, seed=seed,
                                     id_col=id_col, vec_col=vec_col)
    if assigned is None:
        assigned = ivf_assign(vectors, centroids, id_col, vec_col)

    qrows = queries.select(qid_col, vec_col).collect()
    pairs = []
    for r in qrows:
        qv = np.asarray(r[vec_col], dtype=np.float64)
        qn = qv / max(np.linalg.norm(qv), 1e-12)
        cells = np.argsort(-(centroids @ qn))[:nprobe]
        for c in cells:
            pairs.append((r[qid_col], int(c), [float(x) for x in qv]))
    probe = spark.createDataFrame(
        pairs, f"{qid_col} long, cell int, qv array<double>")

    cands = (assigned.join(F.broadcast(probe), "cell")
             .filter(F.col(id_col) != F.col(qid_col)))
    scored = cands.withColumn("cos", cosine_col(F.col(vec_col),
                                                F.col("qv")))
    w = Window.partitionBy(qid_col).orderBy(
        F.round(F.col("cos"), 6).desc(), F.col(id_col).asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select(qid_col, F.col("rnk").cast("long").alias("rnk"),
                    id_col, F.round("cos", 4).alias("cos_r4"))
            .orderBy(qid_col, "rnk"))


def ivf_store(vectors: DataFrame, centroids: np.ndarray, path: str,
              id_col: str = "vec_id", vec_col: str = "embedding") -> None:
    """Materialize the IVF assignment PARTITIONED BY CELL — the serving
    layout: a query probing nprobe of nlist cells reads exactly those
    directories (Spark partition pruning), i.e. nprobe/nlist of the
    corpus, no matter how large the table."""
    assigned = ivf_assign(vectors, centroids, id_col, vec_col)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)


def opq_rotation(dim: int, seed: int = 13) -> np.ndarray:
    """OPQ-lite: a deterministic random orthonormal rotation applied to
    residuals before the subspace split (the cheap 90% of OPQ — it
    decorrelates dimensions so no PQ subspace is stuck with correlated
    coordinates; full OPQ would iterate rotation ↔ codebooks). QR of a
    seeded gaussian, sign-canonicalized so the matrix is unique."""
    rng = np.random.default_rng(seed)
    Q, R = np.linalg.qr(rng.standard_normal((dim, dim)))
    return Q * np.sign(np.diag(R))


def pq_train(vectors: DataFrame, centroids: np.ndarray,
             m: int = 8, nbits: int = 8, iters: int = 10, seed: int = 11,
             id_col: str = "vec_id", vec_col: str = "embedding",
             sample_size: int = 4096,
             rotation: np.ndarray | None = None,
             sample: np.ndarray | None = None) -> np.ndarray:
    """Product-quantization codebooks over IVF RESIDUALS (the FAISS
    IVFPQ shape): unit-normalize, subtract the assigned coarse
    centroid, split the residual into ``m`` subvectors, k-means each
    subspace to 2^nbits entries. Returns (m, 2^nbits, dim/m) float64.

    Driver-side numpy over a bounded deterministic sample — the same
    train-small/apply-distributed split as kmeans_centroids. Pass the
    ``training_sample`` used for the centroids as ``sample`` so the
    whole IVFPQ training costs ONE sample job (VERDICT r3 #7)."""
    X = sample if sample is not None else training_sample(
        vectors, sample_size, id_col, vec_col)
    cells = np.argmax(X @ centroids.T, axis=1)
    R = X - centroids[cells]
    if rotation is not None:
        R = R @ rotation.T
    return _pq_fit_books(R, m, nbits, iters, seed)


def _nearest_code(S: np.ndarray, C: np.ndarray) -> np.ndarray:
    """argmin_c ||s − c||² per row of S, via the matmul expansion
    ||s−c||² = ||s||² − 2 s·c + ||c||² (the ||s||² term is constant per
    row and dropped). One BLAS gemm instead of the broadcast-difference
    form, which allocates an (n, k, dsub) float64 temporary and runs
    memory-bound — measured ~10× slower on the PQ training sample."""
    d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (S @ C.T)
    return np.argmin(d2, axis=1)


def _pq_fit_books(R: np.ndarray, m: int, nbits: int, iters: int,
                  seed: int) -> np.ndarray:
    """Per-subspace k-means over (rotated) residual rows — the PQ
    codebook fit shared by pq_train and opq_train."""
    dim = R.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub, ksub = dim // m, 1 << nbits
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub))
    for j in range(m):
        S = R[:, j * dsub:(j + 1) * dsub]
        k_eff = min(ksub, len(S))
        C = S[rng.choice(len(S), size=k_eff, replace=False)].copy()
        if k_eff < ksub:                    # tiny sample: pad by repeat
            C = np.vstack([C, C[rng.integers(0, k_eff, ksub - k_eff)]])
        for _ in range(iters):
            assign = _nearest_code(S, C)
            # group rows by cluster via ONE stable argsort instead of
            # ksub full-array boolean masks; a stable sort preserves
            # row order within each cluster, so each slice holds the
            # same rows in the same order as S[assign == c] and the
            # .mean() is bit-identical. Empty clusters keep C.
            order = np.argsort(assign, kind="stable")
            sa = assign[order]
            cuts = np.flatnonzero(np.diff(sa)) + 1
            starts = np.concatenate(([0], cuts))
            ends = np.concatenate((cuts, [sa.size]))
            for s, e in zip(starts, ends):
                C[sa[s]] = S[order[s:e]].mean(axis=0)
        books[j] = C
    return books


def _pq_reconstruct(Z: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Encode+decode rows through the codebooks (nearest entry per
    subspace) — the reconstruction OPQ minimizes against."""
    m, _ksub, dsub = books.shape
    Y = np.empty_like(Z)
    for j in range(m):
        S = Z[:, j * dsub:(j + 1) * dsub]
        Y[:, j * dsub:(j + 1) * dsub] = books[j][_nearest_code(S, books[j])]
    return Y


def opq_train(vectors: DataFrame, centroids: np.ndarray,
              m: int = 8, nbits: int = 8, opq_iters: int = 5,
              iters: int = 10, seed: int = 11,
              id_col: str = "vec_id", vec_col: str = "embedding",
              sample_size: int = 4096,
              sample: np.ndarray | None = None
              ) -> tuple[np.ndarray, np.ndarray]:
    """FULL OPQ (VERDICT r3 #10; Ge et al., CVPR 2013 — the
    non-parametric alternation): repeat (a) fit PQ codebooks on the
    ROTATED IVF residuals, (b) re-solve the rotation by orthogonal
    Procrustes against the codebook reconstruction (SVD of Resᵀ·Y,
    Ω = U·Vᵀ), which monotonically decreases ‖Res·Ω − Y‖² for fixed
    codebooks. Returns (rotation, codebooks) — pass both to
    ivf_pq_store / ann_ivf_pq_topk.

    `opq_rotation` (seeded random rotation, no data) stays the cheap
    default; the full alternation pays off on embeddings with
    CORRELATED coordinates, where a data-blind rotation cannot align
    the subspace split with the covariance structure. Training is the
    same bounded driver-side sample as pq_train (share ``sample``)."""
    X = sample if sample is not None else training_sample(
        vectors, sample_size, id_col, vec_col)
    cells = np.argmax(X @ centroids.T, axis=1)
    res = X - centroids[cells]
    # same data-blind init as OPQ-lite, so iteration 0 IS the
    # rotation-only solution; each codebook refit is re-initialized, so
    # per-iteration error is not strictly monotone — tracking the
    # argmin guarantees the result is never worse than rotation-only
    rot = opq_rotation(X.shape[1])
    best = None
    for _ in range(max(1, opq_iters)):   # <1 degrades to rotation-only
        Z = res @ rot.T
        books = _pq_fit_books(Z, m, nbits, iters, seed)
        Y = _pq_reconstruct(Z, books)
        err = float(((Z - Y) ** 2).sum())
        if best is None or err < best[0]:
            best = (err, rot, books)
        # Procrustes: min_Ω ‖Res·Ω − Y‖_F, Ω orthonormal → Ω = U·Vᵀ
        # where Resᵀ·Y = U·S·Vᵀ; Ω is rotᵀ (rows rotate by rot)
        U, _s, Vt = np.linalg.svd(res.T @ Y)
        rot = (U @ Vt).T
    return best[1], best[2]


def ivf_pq_store(vectors: DataFrame, centroids: np.ndarray,
                 codebooks: np.ndarray, path: str,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 rotation: np.ndarray | None = None) -> None:
    """Materialize (id, codes binary[m bytes], cell) PARTITIONED BY
    CELL — m bytes per vector instead of 4·dim, for memory-bound
    corpora; probes still prune to nprobe/nlist of the files. Encoding
    is one Arrow-batched numpy pass (nearest codebook entry per
    residual subvector)."""
    import pandas as pd
    from pyspark.sql import types as T
    C, books = centroids, codebooks
    m, ksub, dsub = books.shape
    schema = T.StructType([
        vectors.schema[id_col],
        T.StructField("codes", T.BinaryType(), False),
        T.StructField("cell", T.IntegerType(), False)])

    def encode(it):
        for pdf in it:
            n = len(pdf)
            if not n:
                continue
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True),
                            1e-12)
            cells = np.argmax(X @ C.T, axis=1)
            R = X - C[cells]
            if rotation is not None:
                R = R @ rotation.T
            codes = np.empty((n, m), dtype=np.uint8)
            for j in range(m):
                S = R[:, j * dsub:(j + 1) * dsub]
                codes[:, j] = _nearest_code(S, books[j]).astype(np.uint8)
            yield pd.DataFrame({
                id_col: pdf[id_col].values,
                "codes": [c.tobytes() for c in codes],
                "cell": cells.astype("int32")})

    (vectors.select(id_col, vec_col).mapInPandas(encode, schema=schema)
     .write.mode("overwrite").partitionBy("cell").parquet(path))


def ann_ivf_pq_topk(spark, path: str, centroids: np.ndarray,
                    codebooks: np.ndarray, queries: DataFrame,
                    k: int = 10, nprobe: int = 4,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    qid_col: str = "query_vec_id",
                    refine: int = 0,
                    vectors: DataFrame | None = None,
                    rotation: np.ndarray | None = None) -> DataFrame:
    """IVFPQ top-k by asymmetric distance (ADC): per query, a (m, 2^b)
    lookup table of q·codebook dot products is built once on the
    driver; each probed cell's codes score as
    q·centroid(cell) + Σⱼ LUT[j][codeⱼ] — one uint8 gather per
    subspace, no float vectors read at all.

    ``refine`` > 0 turns on the candidates→verify shape used
    everywhere else in this repo: the top refine·k ADC candidates per
    query are re-ranked by exact cosine against ``vectors`` (join on
    id touches candidates only), recovering near-brute recall while
    the SCAN stays PQ-compressed."""
    import pandas as pd
    from pyspark.sql import types as T
    C, books = centroids, codebooks
    m, ksub, dsub = books.shape
    store = spark.read.parquet(path)

    qrows = queries.select(qid_col, vec_col).collect()
    luts, bases, probes = {}, {}, {}
    all_cells = set()
    for r in qrows:
        qv = np.asarray(r[vec_col], dtype=np.float64)
        qn = qv / max(np.linalg.norm(qv), 1e-12)
        # with a rotation, residual codes live in rotated space:
        # q·r = (R q)·z, so the LUT uses the ROTATED query; the q·c
        # base term stays unrotated
        qr = rotation @ qn if rotation is not None else qn
        lut = np.empty((m, ksub))
        for j in range(m):
            lut[j] = books[j] @ qr[j * dsub:(j + 1) * dsub]
        qid = int(r[qid_col])
        luts[qid] = lut
        bases[qid] = C @ qn                    # per-cell q·centroid
        cells = np.argsort(-(C @ qn))[:nprobe]
        probes[qid] = set(int(c) for c in cells)
        all_cells.update(probes[qid])

    pruned = store.filter(F.col("cell").isin(sorted(all_cells)))
    out_schema = T.StructType([
        T.StructField(qid_col, T.LongType(), False),
        store.schema[id_col],
        T.StructField("adc", T.DoubleType(), False)])

    def score(it):
        for pdf in it:
            n = len(pdf)
            if not n:
                continue
            codes = np.frombuffer(
                b"".join(pdf["codes"]), dtype=np.uint8).reshape(n, m)
            cells = pdf["cell"].to_numpy()
            ids = pdf[id_col].values
            for qid, lut in luts.items():
                mask = np.isin(cells, list(probes[qid]))
                if not mask.any():
                    continue
                cc = codes[mask]
                s = bases[qid][cells[mask]]
                for j in range(m):
                    s = s + lut[j][cc[:, j]]
                yield pd.DataFrame({qid_col: np.full(mask.sum(), qid),
                                    id_col: ids[mask], "adc": s})

    scored = pruned.mapInPandas(score, schema=out_schema) \
        .filter(F.col(id_col) != F.col(qid_col))
    w = Window.partitionBy(qid_col).orderBy(
        F.col("adc").desc(), F.col(id_col).asc())
    if not refine:
        return (scored.withColumn("rnk", F.row_number().over(w))
                .filter(F.col("rnk") <= k)
                .select(qid_col, F.col("rnk").cast("long").alias("rnk"),
                        id_col, F.round("adc", 4).alias("adc_r4"))
                .orderBy(qid_col, "rnk"))
    cands = (scored.withColumn("rnk", F.row_number().over(w))
             .filter(F.col("rnk") <= k * refine)
             .select(qid_col, id_col))
    q = queries.select(F.col(qid_col), F.col(vec_col).alias("qv"))
    exact = (cands.join(vectors.select(id_col, vec_col), id_col)
             .join(F.broadcast(q), qid_col)
             .withColumn("cos", cosine_col(F.col(vec_col), F.col("qv"))))
    w2 = Window.partitionBy(qid_col).orderBy(
        F.round(F.col("cos"), 6).desc(), F.col(id_col).asc())
    return (exact.withColumn("rnk", F.row_number().over(w2))
            .filter(F.col("rnk") <= k)
            .select(qid_col, F.col("rnk").cast("long").alias("rnk"),
                    id_col, F.round("cos", 4).alias("cos_r4"))
            .orderBy(qid_col, "rnk"))


def ann_ivf_topk_stored(spark, path: str, centroids: np.ndarray,
                        queries: DataFrame, k: int = 10,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        qid_col: str = "query_vec_id",
                        nprobe: int = 4) -> DataFrame:
    """IVF top-k over the cell-partitioned store. The probe-cell filter
    is a partition filter — only the probed cells' files are read."""
    assigned = spark.read.parquet(path)
    qrows = queries.select(qid_col, vec_col).collect()
    pairs, all_cells = [], set()
    for r in qrows:
        qv = np.asarray(r[vec_col], dtype=np.float64)
        qn = qv / max(np.linalg.norm(qv), 1e-12)
        cells = np.argsort(-(centroids @ qn))[:nprobe]
        all_cells.update(int(c) for c in cells)
        for c in cells:
            pairs.append((r[qid_col], int(c), [float(x) for x in qv]))
    probe = spark.createDataFrame(
        pairs, f"{qid_col} long, cell int, qv array<double>")
    # literal IN-list on the partition column → partition pruning at
    # the file-listing level (visible as PartitionFilters in explain)
    pruned = assigned.filter(F.col("cell").isin(sorted(all_cells)))
    cands = (pruned.join(F.broadcast(probe), "cell")
             .filter(F.col(id_col) != F.col(qid_col)))
    scored = cands.withColumn(
        "cos", cosine_col(F.transform(F.col(vec_col),
                                      lambda x: x.cast("double")),
                          F.col("qv")))
    w = Window.partitionBy(qid_col).orderBy(
        F.round(F.col("cos"), 6).desc(), F.col(id_col).asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select(qid_col, F.col("rnk").cast("long").alias("rnk"),
                    id_col, F.round("cos", 4).alias("cos_r4"))
            .orderBy(qid_col, "rnk"))
