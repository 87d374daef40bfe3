"""Trained IVF ANN: recall vs brute force, and bucket-pruned query cost."""

from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.ann_ivf import (
    assign_buckets,
    ivf_topk,
    train_quantizer,
)
from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.similarity import (
    cosine_topk,
)

SF_DIR = "/root/testdata/sf0.001"


def test_ivf_recall_and_pruning(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    centroids = train_quantizer(emb, n_buckets=8)
    assert len(centroids) == 8 and len(centroids[0]) == 64
    bucketed = assign_buckets(emb, centroids).cache()
    sizes = {r.bucket: r.n for r in bucketed.groupBy("bucket").agg(F.count("*").alias("n")).collect()}
    assert sum(sizes.values()) == emb.count() and len(sizes) > 1

    qrow = emb.filter(F.col("vec_id") == 0).first()
    qvec = [float(x) for x in qrow.embedding]
    corpus = bucketed.filter(F.col("vec_id") != 0)

    # brute-force ground truth
    query_df = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    truth = [r.vec_id for r in cosine_topk(emb.filter(F.col("vec_id") != 0), query_df, k=10).collect()]

    # nprobe=8 (all buckets) must equal brute force exactly
    full = [r.vec_id for r in ivf_topk(corpus, centroids, qvec, k=10, nprobe=8).collect()]
    assert full == truth

    # nprobe=3 trades recall for a pruned scan; assert a sane floor and
    # that the probed subset is strictly smaller than the corpus
    probed = [r.vec_id for r in ivf_topk(corpus, centroids, qvec, k=10, nprobe=3).collect()]
    recall = len(set(probed) & set(truth)) / len(truth)
    assert recall >= 0.5
    bucketed.unpersist()


def test_ivf_batch_matches_per_query(spark):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.ann_ivf import (
        ivf_topk_batch,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    centroids = train_quantizer(emb, n_buckets=8)
    bucketed = assign_buckets(emb, centroids).cache()

    qids = [0, 1, 2]
    queries = bucketed.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    corpus = bucketed.filter(~F.col("vec_id").isin(qids))
    batch = ivf_topk_batch(corpus, centroids, queries, k=5, nprobe=3)
    got = {}
    for r in batch.collect():
        got.setdefault(r.qid, []).append((r.rk, r.vec_id))

    for qid in qids:
        qvec = [float(x) for x in bucketed.filter(F.col("vec_id") == qid).first().embedding]
        single = [r.vec_id for r in ivf_topk(corpus, centroids, qvec, k=5, nprobe=3).collect()]
        assert [v for _, v in sorted(got[qid])] == single
    bucketed.unpersist()


def test_large_b_vectorized_matches_codegen(spark):
    """B=64 > _CODEGEN_MAX_B routes through the broadcast-matrix Pandas
    UDF; it must assign the same buckets as the codegen literal path."""
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.ann_ivf import (
        _nearest_centroid,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    centroids = train_quantizer(emb, n_buckets=64)
    vec = assign_buckets(emb, centroids)  # vectorized (64 > 32)
    ref = emb.withColumn("bucket", _nearest_centroid("embedding", centroids))
    got = {r.vec_id: r.bucket for r in vec.collect()}
    want = {r.vec_id: r.bucket for r in ref.collect()}
    assert got == want


def test_large_b_batch_probe_matches_driver_numpy(spark):
    """B=256: batched probe selection (Pandas-UDF path) must match the
    driver-side numpy probe order used by single-query ivf_topk."""
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.ann_ivf import (
        ivf_topk_batch,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    centroids = train_quantizer(emb, n_buckets=256)
    bucketed = assign_buckets(emb, centroids).cache()
    qids = [0, 7]
    queries = bucketed.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    corpus = bucketed.filter(~F.col("vec_id").isin(qids))
    batch = ivf_topk_batch(corpus, centroids, queries, k=5, nprobe=16)
    got = {}
    for r in batch.collect():
        got.setdefault(r.qid, []).append((r.rk, r.vec_id))
    for qid in qids:
        qvec = [float(x) for x in bucketed.filter(F.col("vec_id") == qid).first().embedding]
        single = [r.vec_id for r in ivf_topk(corpus, centroids, qvec, k=5, nprobe=16).collect()]
        assert [v for _, v in sorted(got[qid])] == single
    bucketed.unpersist()


def test_index_persistence_roundtrip_and_pruning(spark, tmp_path):
    """save_ivf_index/load_ivf_index: identical search results from the
    persisted index, and the probe's bucket predicate prunes partitions at
    the file index (PartitionFilters on the parquet scan, fewer files)."""
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.ann_ivf import (
        load_ivf_index,
        save_ivf_index,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    centroids = train_quantizer(emb, n_buckets=8)
    bucketed = assign_buckets(emb, centroids)
    save_ivf_index(bucketed, centroids, str(tmp_path / "idx"))

    corpus2, cents2 = load_ivf_index(spark, str(tmp_path / "idx"))
    assert cents2 == [[float(x) for x in c] for c in centroids]

    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    mem = [
        r.vec_id
        for r in ivf_topk(
            bucketed.filter(F.col("vec_id") != 0), centroids, qvec, k=10, nprobe=3
        ).collect()
    ]
    disk_df = ivf_topk(
        corpus2.filter(F.col("vec_id") != 0), cents2, qvec, k=10, nprobe=3
    )
    assert [r.vec_id for r in disk_df.collect()] == mem

    plan = disk_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    # the probed scan must touch strictly fewer partition dirs than exist
    import re

    m = re.search(r"partition read: (\d+)", plan)
    if m:  # metric text varies by Spark version; the filter assert above is the gate
        assert int(m.group(1)) < 8


def test_incremental_append_exactness(spark, tmp_path):
    """The q103 exactness proof, moved OUT of the serving plan (VERDICT
    r2/r3): after an incremental append with the STORED centroids, IVF
    search with nprobe = B (probe set covers every bucket) must equal
    brute-force top-k over the full corpus REGARDLESS of what the trained
    centroids are — KMeans-proof by construction. The crossJoin +
    2×exceptAll below is O(corpus × queries) and belongs here, in a test
    at sf0.001, not in the registry query users copy as the serving
    recipe."""
    from pyspark.sql import Window

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.ann_ivf import (
        append_vectors,
        ivf_topk_batch,
        load_ivf_index,
        save_ivf_index,
    )
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.similarity import (
        cosine,
    )

    B, K, qids = 8, 5, [3, 7, 11, 19, 23]
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    base = emb.filter(F.col("vec_id") % 5 != 0)
    delta = emb.filter(F.col("vec_id") % 5 == 0)

    cents = train_quantizer(base, B)
    save_ivf_index(assign_buckets(base, cents), cents, str(tmp_path / "ix"))
    # the SHIPPED append path (assign+probe+append, one cached plan)
    info = append_vectors(spark, str(tmp_path / "ix"), delta)
    assert info["appended"] and not info["retrain"]
    grown, stored_cents = load_ivf_index(spark, str(tmp_path / "ix"))
    assert grown.count() == emb.count()  # nothing lost, nothing duplicated

    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    served = ivf_topk_batch(grown, stored_cents, queries, k=K, nprobe=B)

    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    brute = (
        queries.crossJoin(emb)
        .select(
            "qid",
            "vec_id",
            cosine(F.col("embedding"), F.col("qvec")).alias("sim"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K)
    )
    cmp_cols = ["qid", "vec_id", "rk"]
    assert served.select(cmp_cols).exceptAll(brute.select(cmp_cols)).count() == 0
    assert brute.select(cmp_cols).exceptAll(served.select(cmp_cols)).count() == 0

    # Serving-plan shape (what q103 actually ships): nprobe < B is an
    # equi-join on bucket after probe explode — never a nested-loop join.
    serving = ivf_topk_batch(grown, stored_cents, queries, k=K, nprobe=4)
    plan = serving._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_append_drift_gate(spark, tmp_path):
    """append_vectors' drift probe: an in-distribution batch is admitted
    near ratio 1 and folds the stats forward; a distribution-shifted
    batch (vectors scaled far outside the trained cloud) is REFUSED with
    retrain=True and must leave corpus and stats untouched."""
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.ann_ivf import (
        append_vectors,
        load_ivf_index,
        save_ivf_index,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    base = emb.filter(F.col("vec_id") % 5 != 0)
    delta = emb.filter(F.col("vec_id") % 5 == 0)
    cents = train_quantizer(base, 8)
    save_ivf_index(assign_buckets(base, cents), cents, str(tmp_path / "ix"))
    st0 = spark.read.parquet(str(tmp_path / "ix" / "stats")).first()
    assert st0["n"] == base.count() and st0["mean_sq_dist"] > 0

    ok = append_vectors(spark, str(tmp_path / "ix"), delta)
    assert ok["appended"] and ok["drift_ratio"] < 4.0
    st1 = spark.read.parquet(str(tmp_path / "ix" / "stats")).first()
    assert st1["n"] == emb.count()  # stats folded forward

    # scale vectors 25x: squared distance to the trained centroids blows
    # up ~625x -> the probe must refuse and schedule a retrain
    shifted = delta.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 25.0).alias("embedding"),
    )
    bad = append_vectors(spark, str(tmp_path / "ix"), shifted)
    assert not bad["appended"] and bad["retrain"] and bad["drift_ratio"] > 4.0
    grown, _ = load_ivf_index(spark, str(tmp_path / "ix"))
    assert grown.count() == emb.count()  # refused batch left no rows
    st2 = spark.read.parquet(str(tmp_path / "ix" / "stats")).first()
    assert st2["n"] == st1["n"]  # and no stats update


def test_lloyd_tier_agreement(spark):
    """The production (broadcast-matmul) tier must train the SAME
    centroids and assign the SAME buckets as the bit-replayable exact
    tier on the test corpus (VERDICT r8 #1: q184 routes through the fast
    tier under SPARK_GRAFT_TIER=production while the gate replays the
    exact tier — any divergence here would make bench and gate measure
    different answers)."""
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.ann_ivf import (
        deterministic_lloyd,
        lloyd_assign,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    # B=8 exercises the codegen branch; B=40 (> _CODEGEN_MAX_B) the
    # pandas_udf/BLAS branch — the one q184's production tier actually
    # takes at real scale, where B = N//64 > 32 (r9 round-diff review)
    for n_buckets in (8, 40):
        cents_exact = deterministic_lloyd(emb, n_buckets, iters=2, exact=True)
        cents_fast = deterministic_lloyd(emb, n_buckets, iters=2, exact=False)
        ce = {r.bucket: list(r.centroid) for r in cents_exact.collect()}
        cf = {r.bucket: list(r.centroid) for r in cents_fast.collect()}
        assert ce == cf  # bit-identical: same init, same quantized means

        ae = {
            r.vec_id: r.bucket
            for r in lloyd_assign(emb, cents_exact, exact=True).collect()
        }
        af = {
            r.vec_id: r.bucket
            for r in lloyd_assign(emb, cents_exact, exact=False).collect()
        }
        assert ae == af


def test_lloyd_domain_guard(spark):
    """Out-of-int64-domain embeddings must fail LOUDLY (ADVICE r8): with
    max|x| over the quantization-safe bound, Spark's saturating cast and
    DuckDB's HUGEINT promotion would silently diverge the argmin."""
    import pytest

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x * 1.0e4).alias("embedding"),
    )
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.ann_ivf import (
        deterministic_lloyd,
    )

    with pytest.raises(ValueError, match="int64-safe bound"):
        deterministic_lloyd(emb, 8, iters=1)


def test_probe_exact_matches_numpy_probe(spark):
    """q55's bit-replayable probe tier (int-quantized distances) must pick
    the same nprobe buckets and the same top-k as the numpy/BLAS ivf_topk
    serve path on the test corpus — the two tiers answer the same query."""
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.ann_ivf import (
        assign_buckets_exact,
        centroid_list,
        deterministic_lloyd,
        ivf_topk,
        probe_buckets_exact,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cents = deterministic_lloyd(emb, 8, iters=2)
    bucketed = assign_buckets_exact(emb, cents).cache()
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    pb = sorted(r.bucket for r in probe_buckets_exact(cents, q, nprobe=3).collect())

    clist = centroid_list(cents)
    import numpy as np

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.ann_ivf import (
        _sq_dists,
    )

    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    order = np.argsort(
        _sq_dists(np.asarray([qvec]), np.asarray(clist))[0], kind="stable"
    )
    assert pb == sorted(int(b) for b in order[:3])

    corpus = bucketed.filter(F.col("vec_id") != 0)
    topk = [
        (r.vec_id, round(r.sim, 6))
        for r in ivf_topk(corpus, clist, qvec, k=5, nprobe=3).collect()
    ]
    gated = [
        (r.vec_id, r.cosine)
        for r in __import__("__spark_entry__").queries()["q55_ann_ivf"](
            spark, SF_DIR
        ).collect()
    ]
    assert topk == gated
    bucketed.unpersist()


def test_hierarchical_quantizer_structure(spark):
    """Two-level quantizer invariants (q222): level-2 training yields
    exactly max(1, n_cell // target) contiguous sub-ids per cell, and
    sub-assignment preserves every vector's level-1 cell — the
    refinement property the hierarchical SemDeDup blocks rely on."""
    from pyspark.sql import functions as F

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.ann_ivf import (
        assign_buckets_exact,
        assign_subbuckets_exact,
        deterministic_lloyd,
        deterministic_lloyd_grouped,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cents1 = deterministic_lloyd(emb, 4, iters=1)
    cells = assign_buckets_exact(emb, cents1).withColumnRenamed("bucket", "cell")
    cells = cells.localCheckpoint(eager=True)
    cents2 = deterministic_lloyd_grouped(cells, target_block=16, iters=1)

    ncell = {r.cell: r.n for r in cells.groupBy("cell").agg(F.count("*").alias("n")).collect()}
    subs = {}
    for r in cents2.collect():
        subs.setdefault(r.cell, []).append(r.sub)
    for cell, n in ncell.items():
        expect = max(1, n // 16)
        assert sorted(subs[cell]) == list(range(expect)), (cell, n, subs[cell])

    assigned = assign_subbuckets_exact(cells, cents2)
    # total preserved, cell preserved, sub in range
    assert assigned.count() == emb.count()
    moved = assigned.alias("a").join(
        cells.select("vec_id", F.col("cell").alias("c0")), "vec_id"
    ).filter(F.col("cell") != F.col("c0"))
    assert moved.isEmpty()
    bad = assigned.groupBy("cell").agg(F.max("sub").alias("mx")).collect()
    for r in bad:
        assert r.mx < max(1, ncell[r.cell] // 16)


def test_pq_encode_and_adc(spark):
    """Product-quantization invariants (q223): the exploded subvector
    table is m rows per id of d/m elements; every (id, subspace) gets
    exactly ONE code (the per-(id, cell) argmin window — an id living in
    all m subspaces must not collapse to a single global argmin); codes
    stay inside the fixed ks-entry codebook; and the ADC top-k over the
    codes table alone reaches a sane recall floor against exact brute
    force on the raw vectors."""
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.ann_ivf import (
        pq_adc_lut,
        pq_adc_topk,
        pq_encode,
        pq_subvectors,
        pq_train,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n, m, ks = emb.count(), 8, 16
    subvecs = pq_subvectors(emb, m).localCheckpoint(eager=True)
    assert subvecs.count() == n * m
    dims = subvecs.select(F.size("embedding").alias("d")).distinct().collect()
    assert [r.d for r in dims] == [8]

    codebooks = pq_train(subvecs, ks)
    sizes = {
        r.subspace: r.n
        for r in codebooks.groupBy("subspace").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {s: min(ks, n) for s in range(m)}

    codes = pq_encode(subvecs, codebooks)
    assert codes.count() == n * m  # one code per (id, subspace)
    per_id = codes.groupBy("vec_id").agg(F.count("*").alias("c"))
    assert per_id.filter(F.col("c") != m).isEmpty()
    rng = codes.agg(F.min("code").alias("lo"), F.max("code").alias("hi")).first()
    assert rng.lo >= 0 and rng.hi < ks

    lut = pq_adc_lut(codebooks, subvecs.filter(F.col("vec_id") == 0))
    assert lut.count() == sum(sizes.values())
    topk = pq_adc_topk(codes.filter(F.col("vec_id") != 0), lut, 10)
    got = [r.vec_id for r in topk.collect()]
    assert len(got) == 10

    # Ground truth is exact SQUARED L2 (what ADC approximates), not
    # cosine. The testdata embeddings are near-uniform random — PQ's
    # worst case (no cluster structure, distance concentration), so
    # absolute recall@10 is modest by nature; pin (a) recall well above
    # the 10/N ≈ 0.02 chance floor and (b) the ranking-quality
    # properties that hold with margin even here: ADC correlates with
    # the true distance, and the ADC-top10's true distances sit below
    # the corpus mean. (Empirical at sf0.001: recall 0.2, pearson 0.55,
    # distance ratio 0.86.)
    import numpy as np

    rows = emb.orderBy("vec_id").collect()
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    ids = np.array([r.vec_id for r in rows])
    qv = X[ids == 0][0]
    mask = ids != 0
    d2 = ((X[mask] - qv) ** 2).sum(1)
    cids = ids[mask]
    truth = [int(cids[i]) for i in np.argsort(d2, kind="stable")[:10]]
    recall = len(set(got) & set(truth)) / len(truth)
    assert recall >= 0.1, (recall, got, truth)

    adc_all = {
        r.vec_id: r.adc_dist
        for r in pq_adc_topk(
            codes.filter(F.col("vec_id") != 0), lut, int(mask.sum())
        ).collect()
    }
    adc = np.array([adc_all[int(i)] for i in cids], dtype=np.float64)
    assert np.corrcoef(adc, d2)[0, 1] >= 0.4
    top_true = d2[np.argsort(adc, kind="stable")[:10]].mean()
    assert top_true < 0.92 * d2.mean()


def test_ivfadc_composition(spark):
    """IVFADC invariants (q224): every returned candidate lives in one
    of the query's probed cells (inverted-file pruning is real), the
    ADC scan never reads raw vectors (codes-only join), and the
    residual encoding preserves one code per (id, subspace)."""
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.ann_ivf import (
        assign_buckets_exact,
        deterministic_lloyd,
        pq_encode,
        pq_subvectors,
        pq_train,
        probe_buckets_exact,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n, b, m, ks, npr = emb.count(), 8, 8, 16, 2
    cents1 = deterministic_lloyd(emb, b, iters=1)
    cells = assign_buckets_exact(emb, cents1).withColumnRenamed(
        "bucket", "cell"
    ).localCheckpoint(eager=True)
    resid = cells.join(
        cents1.withColumnRenamed("bucket", "cell"), "cell"
    ).select(
        "vec_id",
        "cell",
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.col("centroid"),
            lambda x, y: x - y,
        ).alias("embedding"),
    ).localCheckpoint(eager=True)
    subvecs = pq_subvectors(resid, m).localCheckpoint(eager=True)
    codebooks = pq_train(subvecs, ks)
    codes = pq_encode(subvecs, codebooks).join(
        resid.select("vec_id", "cell"), "vec_id"
    )
    assert codes.count() == n * m

    qrow = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qvec")
    )
    probed = {r.bucket for r in probe_buckets_exact(cents1, qrow, npr).collect()}
    assert len(probed) == npr

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.analytics import (
        q224_ivfadc_topk,
    )

    got = q224_ivfadc_topk(spark, SF_DIR).collect()
    assert len(got) == 10 and all(r.adc_dist >= 0 for r in got)
    member = {
        r.vec_id: r.cell for r in cells.select("vec_id", "cell").collect()
    }
    for r in got:
        assert member[r.vec_id] in probed, (r.vec_id, member[r.vec_id], probed)


def test_pq_subvectors_rejects_indivisible_dim(spark):
    """d % m != 0 must raise, not silently drop trailing dimensions from
    every ADC distance (r9 review — an oracle truncating identically
    would sail through the hash gate)."""
    import pytest

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.ann_ivf import (
        pq_subvectors,
    )

    emb = spark.createDataFrame(
        [(0, [float(i) for i in range(10)])], ["vec_id", "embedding"]
    )
    with pytest.raises(Exception, match="not divisible"):
        pq_subvectors(emb, 4).collect()
    # divisible dims still slice cleanly
    assert pq_subvectors(emb, 5).count() == 5


def test_declarative_tier_agreement(spark):
    """VERDICT r10 #5: the production (declarative, no-Python) IVF tier
    must agree with the default tiers —

    - assign_buckets_table == assign_buckets (codegen literal argmin)
      bucket-for-bucket;
    - probe_buckets_table == the codegen probe ranking per query;
    - ivf_topk_batch(declarative=True) == the default serve tier
      row-for-row;
    - and the declarative serve plan runs NO Python node even at
      B > _CODEGEN_MAX_B (where the default tier falls back to a
      pandas UDF)."""
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.ann_ivf import (
        _CODEGEN_MAX_B,
        assign_buckets_table,
        ivf_topk_batch,
        probe_buckets_table,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    centroids = train_quantizer(emb, n_buckets=8)

    # assignment agreement (double fold vs literal codegen — identical
    # sequential arithmetic, so exact equality is the bar)
    default_assign = {
        (r.vec_id, r.bucket)
        for r in assign_buckets(emb, centroids).select("vec_id", "bucket").collect()
    }
    decl_assign = {
        (r.vec_id, r.bucket)
        for r in assign_buckets_table(emb, centroids).select("vec_id", "bucket").collect()
    }
    assert decl_assign == default_assign

    # probe + serve agreement
    qids = [0, 1, 2]
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    probes = {
        r.qid: list(r.probe_buckets)
        for r in probe_buckets_table(queries, centroids, nprobe=3).collect()
    }
    assert set(probes) == set(qids) and all(len(v) == 3 for v in probes.values())

    bucketed = assign_buckets(emb, centroids).cache()
    corpus = bucketed.filter(~F.col("vec_id").isin(qids))
    base = sorted(
        map(tuple, ivf_topk_batch(corpus, centroids, queries, k=5, nprobe=3).collect())
    )
    decl = sorted(
        map(
            tuple,
            ivf_topk_batch(
                corpus, centroids, queries, k=5, nprobe=3, declarative=True
            ).collect(),
        )
    )
    assert decl == base
    bucketed.unpersist()

    # no-Python guarantee where it matters: a centroid count past the
    # codegen cap would push the DEFAULT tier to a pandas UDF; the
    # declarative plan must stay JVM-only
    big_b = _CODEGEN_MAX_B + 4
    cents_big = [[float(i == j % 64) for i in range(64)] for j in range(big_b)]
    served = ivf_topk_batch(
        assign_buckets_table(emb, cents_big),
        cents_big,
        queries,
        k=3,
        nprobe=2,
        declarative=True,
    )
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan


def test_q55_q70_q103_tier_agreement(spark, monkeypatch):
    """Cross-tier pin for the registry queries themselves (the
    q105/q184 pattern): replay and production tiers must produce the
    same rows."""
    import importlib

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans import (
        registry,
    )
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.analytics import (
        q103_ivf_incremental,
    )
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.grouped import (
        q55_ann_ivf,
        q70_ivf_index_persist,
    )

    def rows(fn):
        return sorted(map(tuple, fn(spark, SF_DIR).collect()))

    out = {}
    for tier in ("replay", "production"):
        monkeypatch.setenv("SPARK_GRAFT_TIER", tier)
        assert registry.production_tier() == (tier == "production")
        out[tier] = {
            "q55": rows(q55_ann_ivf),
            "q70": rows(q70_ivf_index_persist),
            "q103": rows(q103_ivf_incremental),
        }
    assert out["replay"] == out["production"]


def test_expr_memo_identity_and_parity(spark):
    """The centroid-literal expression memo (r12): same (cols, centroid
    values) return the SAME unresolved Column object; different values
    miss; and a memo-served tree computes correct assignments on a frame
    it was not first built against (a Column holds no frame reference)."""
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.ann_ivf import (
        _nearest_centroid,
    )
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators import (
        lsh_blocking as L,
    )

    cents = [[0.0, 0.0], [1.0, 1.0]]
    a = _nearest_centroid("embedding", cents)
    b = _nearest_centroid("embedding", [list(c) for c in cents])  # equal values, new lists
    assert a is b
    assert _nearest_centroid("embedding", [[0.0, 0.0], [2.0, 2.0]]) is not a
    assert _nearest_centroid("other_col", cents) is not a

    df1 = spark.createDataFrame([(0, [0.1, 0.2]), (1, [0.9, 0.8])], "vec_id int, embedding array<double>")
    df2 = spark.createDataFrame([(2, [0.8, 0.9])], "vec_id int, embedding array<double>")
    r1 = {r.vec_id: r.b for r in df1.select("vec_id", a.alias("b")).collect()}
    r2 = {r.vec_id: r.b for r in df2.select("vec_id", b.alias("b")).collect()}
    assert r1 == {0: 0, 1: 1} and r2 == {2: 1}

    # the banded-LSH key array memoizes on (vec_col, nbits, n_bands, dim)
    k1 = L.band_keys(df1, nbits=2, dim=2)
    k2 = L.band_keys(df2, nbits=2, dim=2)
    assert sorted(map(tuple, k1.collect())) != []  # evaluates fine
    assert k2.count() == L.N_BANDS  # one row per band for the single vector
