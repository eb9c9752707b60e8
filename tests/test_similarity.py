"""Similarity search vs a numpy oracle."""
import numpy as np
from pyspark.sql import functions as F

from database_delta_plugins_spark.operators.similarity import (
    cosine_neardup_pairs,
    cosine_topk,
    ivf_topk,
    lsh_bucket_topk,
)


def _emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return df.withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))


def _numpy_topk(pdf, qv, k):
    m = np.vstack(pdf["embedding"].to_numpy())
    q = np.asarray(qv)
    cos = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    order = np.lexsort((pdf["vec_id"].to_numpy(), -cos))
    return [int(pdf["vec_id"].iloc[i]) for i in order[:k]]


def test_brute_force_topk_matches_numpy(spark, sf_dir):
    df = _emb(spark, sf_dir)
    pdf = df.toPandas()
    qv = list(pdf.loc[pdf.vec_id == 0, "embedding"].iloc[0])
    got = [r["vec_id"] for r in cosine_topk(df, qv, k=10).collect()]
    assert got == _numpy_topk(pdf, qv, 10)


def test_lsh_topk_recall(spark, sf_dir):
    """LSH is approximate; the query's own vector (cos=1) must always be
    found, and results must be a subset of brute-force top-50."""
    df = _emb(spark, sf_dir)
    pdf = df.toPandas()
    qv = list(pdf.loc[pdf.vec_id == 0, "embedding"].iloc[0])
    approx = [r["vec_id"] for r in lsh_bucket_topk(df, qv, k=10, bits=6).collect()]
    assert approx[0] == 0
    exact50 = set(_numpy_topk(pdf, qv, 50))
    assert len(set(approx) & exact50) >= 3


def test_ivf_topk_recall(spark, sf_dir):
    df = _emb(spark, sf_dir)
    pdf = df.toPandas()
    qv = list(pdf.loc[pdf.vec_id == 0, "embedding"].iloc[0])
    got = [r["vec_id"] for r in ivf_topk(df, qv, k=10, n_cells=8, nprobe=3).collect()]
    assert got[0] == 0  # the query's own vector is always found
    exact = set(_numpy_topk(pdf, qv, 10))
    assert len(set(got) & exact) >= 5  # decent recall with 3/8 cells probed
    # deterministic: same result twice (seeded KMeans)
    again = [r["vec_id"] for r in ivf_topk(df, qv, k=10, n_cells=8, nprobe=3).collect()]
    assert got == again


def test_neardup_finds_planted_duplicate(spark):
    base = [float(x) for x in np.arange(8)]
    near = [x + (0.01 if i == 0 else 0.0) for i, x in enumerate(base)]
    far = [float(8 - x) for x in np.arange(8)]
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], ["vec_id", "embedding"]
    )
    pairs = {(r["id_a"], r["id_b"]) for r in
             cosine_neardup_pairs(df, dim=8, threshold=0.999, bits=4).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs


def test_ivf_build_query_split(spark):
    """IVF build-once/query-many: the query path fits no model, reuses
    the persisted cell assignment, and scans only nprobe cells."""
    import numpy as np
    from pyspark.sql import functions as F

    from database_delta_plugins_spark.operators.similarity import (
        cosine_topk,
        ivf_build,
        ivf_probe_cells,
        ivf_topk,
    )

    rng = np.random.RandomState(7)
    vecs = rng.randn(400, 16).astype(float)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    assigned, centroids = ivf_build(df, n_cells=8)
    assigned = assigned.persist()
    try:
        assert len(centroids) == 8
        q = [float(x) for x in vecs[5]]
        probes = ivf_probe_cells(centroids, q, nprobe=3)
        assert len(probes) == 3
        # query path scans only the probed cells
        cand_n = assigned.filter(F.col("_cell").isin(probes)).count()
        assert 0 < cand_n < 400
        got = ivf_topk(df, q, k=5, nprobe=3, assigned=assigned, centroids=centroids)
        rows = got.collect()
        assert rows[0]["vec_id"] == 5  # the query vector itself wins
        # recall vs exact for the probed fraction is sane: top-1 exact
        exact = cosine_topk(df, q, k=5).collect()
        assert rows[0]["vec_id"] == exact[0]["vec_id"]
    finally:
        assigned.unpersist()


def test_neardup_bucket_cap_bounds_candidates(spark):
    """Adversarial near-constant embedding cluster (r3 directive #5):
    every vector lands in ONE LSH bucket. The DEFAULT cap (200) bounds
    the within-bucket join; max_bucket=m bounds pairs at m(m-1)/2; the
    dropped_postings audit exposes the over-cap bucket; None opts out
    (oracle-parity mode only)."""
    from database_delta_plugins_spark.operators.dedup import dropped_postings
    from database_delta_plugins_spark.operators.similarity import lsh_signature

    n, dim = 300, 8
    base = [1.0] + [0.001] * (dim - 1)
    rows = [(i, [x + (i % 7) * 1e-6 for x in base]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    # default cap (200) engages without being asked for
    dflt = cosine_neardup_pairs(df, dim=dim, threshold=0.0, bits=4)
    assert dflt.count() == 200 * 199 / 2
    capped = cosine_neardup_pairs(df, dim=dim, threshold=0.0, bits=4,
                                  max_bucket=10)
    assert capped.count() <= 45  # 10*9/2
    uncapped = cosine_neardup_pairs(df, dim=dim, threshold=0.0, bits=4,
                                    max_bucket=None)
    assert uncapped.count() == n * (n - 1) / 2
    # audit: the one constant-cluster bucket shows up with its size
    sig = lsh_signature(df, dim, bits=4).select(
        F.col("vec_id").alias("id"), "sig")
    audit = dropped_postings(sig, ["sig"], cap=200).collect()
    assert len(audit) == 1 and audit[0]["postings"] == n


def test_batch_topk_matches_per_query(spark, sf_dir):
    """Batch multi-query top-k equals running cosine_topk per query."""
    from database_delta_plugins_spark.operators.similarity import cosine_topk_batch

    df = _emb(spark, sf_dir)
    pdf = df.toPandas()
    qs = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    got = cosine_topk_batch(df, qs, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["q_id"], []).append(r["vec_id"])
    for qid in (0, 1, 2):
        qv = list(pdf.loc[pdf.vec_id == qid, "embedding"].iloc[0])
        assert by_q[qid] == _numpy_topk(pdf, qv, 5)


def test_ivf_persisted_index_partition_prunes(spark, sf_dir, tmp_path):
    """The 100-TB IVF claim: persist the build output partitioned by
    _cell, and a query's cell filter becomes PARTITION pruning at the
    scan — only nprobe cell directories are read."""
    import io
    import re
    from contextlib import redirect_stdout

    from database_delta_plugins_spark.operators.similarity import (
        cosine_topk,
        ivf_build,
        ivf_probe_cells,
    )

    emb = _emb(spark, sf_dir)
    assigned, cents = ivf_build(emb, n_cells=8)
    idx = str(tmp_path / "ivf_idx")
    assigned.write.partitionBy("_cell").parquet(idx)
    stored = spark.read.parquet(idx)
    pdf = emb.toPandas()
    qv = list(pdf.loc[pdf.vec_id == 0, "embedding"].iloc[0])
    probes = ivf_probe_cells(cents, qv, nprobe=3)
    cand = stored.filter(F.col("_cell").isin(probes))
    buf = io.StringIO()
    with redirect_stdout(buf):
        cand.explain("formatted")
    plan = buf.getvalue()
    m = re.search(r"PartitionFilters: \[.*_cell.*\]", plan)
    assert m, plan[:1500]
    # and the pruned query still returns the same answer as the
    # in-memory build/query path
    got = [r["vec_id"] for r in
           cosine_topk(cand.drop("_cell"), qv, k=10).collect()]
    base = [r["vec_id"] for r in
            cosine_topk(assigned.filter(F.col("_cell").isin(probes)).drop("_cell"),
                        qv, k=10).collect()]
    assert got == base


def test_lsh_persisted_index_partition_prunes(spark, sf_dir, tmp_path):
    """r3 directive #6: the LSH signature index gets the same
    persist-and-prune treatment as IVF — build once, write partitioned
    by sig, and a query's probe filter becomes PARTITION pruning at the
    scan (no hyperplane recompute over the corpus)."""
    import io
    import re
    from contextlib import redirect_stdout

    from database_delta_plugins_spark.operators.similarity import (
        lsh_bucket_topk,
        lsh_build,
        lsh_probes,
        lsh_topk,
    )

    emb = _emb(spark, sf_dir)
    dim = len(emb.head()["embedding"])
    idx = str(tmp_path / "lsh_idx")
    lsh_build(emb, dim, bits=4).write.partitionBy("sig").parquet(idx)
    stored = spark.read.parquet(idx)
    pdf = emb.toPandas()
    qv = [float(x) for x in pdf.loc[pdf.vec_id == 0, "embedding"].iloc[0]]
    got_df = lsh_topk(stored, qv, k=5, bits=4)
    buf = io.StringIO()
    with redirect_stdout(buf):
        got_df.explain("formatted")
    plan = buf.getvalue()
    assert re.search(r"PartitionFilters: \[.*sig.*\]", plan), plan[:1500]
    # no signature recompute in the query plan: sig packing is a
    # shiftleft sum — absent here (the one zip_with/aggregate left is
    # the final cosine against the query literal, which is the point)
    assert "shiftleft" not in plan.lower()
    # pruned query == inline-build query
    got = [r["vec_id"] for r in got_df.collect()]
    base = [r["vec_id"] for r in lsh_bucket_topk(emb, qv, k=5, bits=4).collect()]
    assert got == base and got[0] == 0
    assert lsh_probes(qv, bits=4) == lsh_probes(qv, bits=4)


def test_neardup_gemm_matches_catalyst(spark, sf_dir):
    """Bucket-local GEMM scorer (applyInPandas) emits the same pair set
    as the per-pair Catalyst folds, cosines within float-reassociation
    tolerance; the bucket cap engages identically."""
    from database_delta_plugins_spark.operators.similarity import (
        cosine_neardup_pairs,
        cosine_neardup_pairs_arrow,
    )

    emb = _emb(spark, sf_dir)
    dim = len(emb.head()["embedding"])
    a = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in
         cosine_neardup_pairs(emb, dim=dim, threshold=0.4, bits=4,
                              max_bucket=None).collect()}
    b = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in
         cosine_neardup_pairs_arrow(emb, dim=dim, threshold=0.4, bits=4,
                                    max_bucket=None).collect()}
    assert set(a) == set(b) and a
    assert max(abs(a[k] - b[k]) for k in a) < 1e-5
    # cap engages the same way
    capped = cosine_neardup_pairs_arrow(emb, dim=dim, threshold=0.0,
                                        bits=4, max_bucket=10)
    assert capped.count() <= (2 ** 4) * 45


def test_zero_norm_embeddings_excluded(spark):
    """review r3: a zero vector must not win top-k via NaN ordering nor
    emit NaN near-dup pairs; catalyst and GEMM variants agree."""
    from database_delta_plugins_spark.operators.similarity import (
        cosine_neardup_pairs_arrow,
    )

    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.9, 0.1, 0.0, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    top = cosine_topk(df, [1.0, 0.0, 0.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in top] == [0, 1]     # zero vector excluded
    assert all(r["cos_sim"] == r["cos_sim"] for r in top)  # no NaN
    pairs = cosine_neardup_pairs(df, dim=4, threshold=0.5, bits=2,
                                 max_bucket=None).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 1)}
    pairs2 = cosine_neardup_pairs_arrow(df, dim=4, threshold=0.5, bits=2,
                                        max_bucket=None).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs2} == {(0, 1)}


def test_neardup_gemm_string_ids(spark):
    """review r3: the GEMM scorer's output schema follows the id dtype."""
    from database_delta_plugins_spark.operators.similarity import (
        cosine_neardup_pairs_arrow,
    )

    rows = [("u/a", [1.0, 0.0]), ("u/b", [0.99, 0.01]), ("u/c", [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id: string, embedding: array<double>")
    pairs = {(r["id_a"], r["id_b"]) for r in
             cosine_neardup_pairs_arrow(df, dim=2, threshold=0.9, bits=1,
                                        max_bucket=None).collect()}
    assert pairs == {("u/a", "u/b")}


def _mk_emb_table(spark, tmp_path, name="embt"):
    from pyspark.sql import types as T

    from database_delta_plugins_spark.lake.table import LakeTable

    schema = T.StructType([
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
    ])
    return LakeTable.create(spark, str(tmp_path / name), schema,
                            key="vec_id", num_buckets=2, write_mode="mor")


def _vecs(spark, rows):
    """rows: [(vec_id, embedding_list_or_None, op, lsn)]"""
    from pyspark.sql import types as T

    return spark.createDataFrame(
        [(int(i), [float(x) for x in v] if v is not None else None,
          op, int(lsn), 0, 0) for i, v, op, lsn in rows],
        schema=T.StructType([
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
            T.StructField("op_type", T.StringType(), False),
            T.StructField("lsn", T.LongType(), False),
            T.StructField("seq", T.LongType(), False),
            T.StructField("ts_ms", T.LongType(), False),
        ]))


def test_incremental_index_upsert_equals_rebuild(spark, sf_dir, tmp_path):
    """r4 directive #6: CDC apply -> LakeTable.changes() -> incremental
    LSH/IVF index refresh. The refreshed persisted index must be
    row-identical to a full rebuild over the post-window table, and ANN
    queries over both must agree — including updated vectors that MOVE
    partitions and deleted vectors that leave buckets empty."""
    import numpy as np

    from database_delta_plugins_spark.operators.similarity import (
        index_read,
        index_write,
        ivf_assign,
        ivf_build,
        ivf_index_upsert,
        lsh_build,
        lsh_index_upsert,
        lsh_topk,
    )

    rng = np.random.RandomState(3)
    dim, n = 8, 40
    base = [(i, rng.randn(dim).tolist(), "I", i + 1) for i in range(n)]
    t = _mk_emb_table(spark, tmp_path)
    t.merge(_vecs(spark, base), epoch_id=1)
    t = t.refresh()
    v1 = t.version

    lsh_idx = str(tmp_path / "lsh_idx")
    ivf_idx = str(tmp_path / "ivf_idx")
    index_write(lsh_build(t.read().select("vec_id", "embedding"),
                          dim, bits=3), lsh_idx, "sig")
    assigned, cents = ivf_build(
        t.read().select("vec_id", "embedding"), n_cells=4)
    index_write(assigned, ivf_idx, "_cell")

    # window: updates that flip signatures (negated vectors), fresh
    # inserts, deletes, and a multi-change key (update then delete)
    upd = [(i, (-np.asarray(base[i][1])).tolist(), "U", 100 + i)
           for i in range(0, 10)]
    ins = [(n + i, rng.randn(dim).tolist(), "I", 200 + i) for i in range(5)]
    dels = [(i, None, "D", 300 + i) for i in range(10, 18)]
    multi = [(20, rng.randn(dim).tolist(), "U", 400), (20, None, "D", 401)]
    t.merge(_vecs(spark, upd + ins + dels + multi), epoch_id=2)
    t = t.refresh()

    ch = t.changes(v1)
    r1 = lsh_index_upsert(spark, lsh_idx, ch, dim, bits=3)
    r2 = ivf_index_upsert(spark, ivf_idx, ch, cents)
    assert r1["upserts"] == 15 and r1["deletes"] == 9
    assert r2["upserts"] == 15 and r2["deletes"] == 9

    final = t.read().select("vec_id", "embedding")
    want_lsh = {(r["vec_id"], r["sig"], tuple(np.round(r["embedding"], 9)))
                for r in lsh_build(final, dim, bits=3).collect()}
    got_lsh = {(r["vec_id"], r["sig"], tuple(np.round(r["embedding"], 9)))
               for r in index_read(spark, lsh_idx)
               .select("vec_id", "embedding", "sig").collect()}
    assert got_lsh == want_lsh

    want_ivf = {(r["vec_id"], r["_cell"]) for r in
                ivf_assign(final, cents).select("vec_id", "_cell").collect()}
    got_ivf = {(r["vec_id"], r["_cell"]) for r in
               index_read(spark, ivf_idx).select("vec_id", "_cell").collect()}
    assert got_ivf == want_ivf

    # ANN answers agree between incrementally-refreshed and rebuilt index
    qv = [float(x) for x in ins[0][1]]
    got = [r["vec_id"] for r in
           lsh_topk(index_read(spark, lsh_idx), qv, k=5, bits=3).collect()]
    want = [r["vec_id"] for r in
            lsh_topk(lsh_build(final, dim, bits=3), qv, k=5, bits=3).collect()]
    assert got == want

    # idempotence: re-running the same window changes nothing
    lsh_index_upsert(spark, lsh_idx, ch, dim, bits=3)
    again = {(r["vec_id"], r["sig"]) for r in
             index_read(spark, lsh_idx).select("vec_id", "sig").collect()}
    assert again == {(a, b) for a, b, _ in got_lsh}


def test_index_upsert_stage_and_swap_reader_isolation(spark, tmp_path):
    """r5 directive #6: a reader concurrent with an upsert sees the OLD
    index or the NEW one, never a mix. index_read binds to the version
    directory the _current pointer named at open time; the upsert writes
    a NEW version dir and swaps the pointer atomically, retaining the
    previous version's files — so the pre-swap DataFrame keeps scanning
    immutable old files (re-collected AFTER the swap), and a fresh
    index_read sees exactly the refreshed index."""
    import numpy as np

    from database_delta_plugins_spark.operators.similarity import (
        index_read,
        index_write,
        lsh_build,
        lsh_index_upsert,
    )

    rng = np.random.RandomState(7)
    dim, n = 8, 30
    base = [(i, rng.randn(dim).tolist(), "I", i + 1) for i in range(n)]
    t = _mk_emb_table(spark, tmp_path)
    t.merge(_vecs(spark, base), epoch_id=1)
    t = t.refresh()
    v1 = t.version
    idx = str(tmp_path / "lsh_swap")
    index_write(lsh_build(t.read().select("vec_id", "embedding"),
                          dim, bits=3), idx, "sig")

    old_reader = index_read(spark, idx)          # binds to _v1 files
    before = {(r["vec_id"], r["sig"]) for r in
              old_reader.select("vec_id", "sig").collect()}

    upd = [(i, (-np.asarray(base[i][1])).tolist(), "U", 100 + i)
           for i in range(0, 8)]
    dels = [(i, None, "D", 200 + i) for i in range(8, 12)]
    t.merge(_vecs(spark, upd + dels), epoch_id=2)
    t = t.refresh()
    rec = lsh_index_upsert(spark, idx, t.changes(v1), dim, bits=3)
    assert rec["version"] == 2

    # the pre-swap handle still reads the complete OLD index
    after_old = {(r["vec_id"], r["sig"]) for r in
                 old_reader.select("vec_id", "sig").collect()}
    assert after_old == before, "pre-swap reader saw a torn/partial index"

    # a fresh open reads exactly the refreshed index == full rebuild
    final = t.read().select("vec_id", "embedding")
    want = {(r["vec_id"], r["sig"]) for r in
            lsh_build(final, dim, bits=3).collect()}
    got = {(r["vec_id"], r["sig"]) for r in
           index_read(spark, idx).select("vec_id", "sig").collect()}
    assert got == want and got != before


def test_index_upsert_migrates_legacy_flat_layout(spark, tmp_path):
    """A pre-r5 flat index (bare partitionBy output, no _current
    pointer) upserts correctly: first upsert stages _v1, swaps the
    pointer in, and removes the flat partition dirs; index_read resolves
    both layouts."""
    import os

    import numpy as np

    from database_delta_plugins_spark.operators.similarity import (
        index_read,
        lsh_build,
        lsh_index_upsert,
    )

    rng = np.random.RandomState(11)
    dim, n = 8, 20
    base = [(i, rng.randn(dim).tolist(), "I", i + 1) for i in range(n)]
    t = _mk_emb_table(spark, tmp_path)
    t.merge(_vecs(spark, base), epoch_id=1)
    t = t.refresh()
    v1 = t.version
    idx = str(tmp_path / "lsh_legacy")
    lsh_build(t.read().select("vec_id", "embedding"), dim, bits=3) \
        .write.partitionBy("sig").parquet(idx)

    ins = [(n + i, rng.randn(dim).tolist(), "I", 100 + i) for i in range(5)]
    t.merge(_vecs(spark, ins), epoch_id=2)
    t = t.refresh()
    rec = lsh_index_upsert(spark, idx, t.changes(v1), dim, bits=3)
    assert rec["version"] == 1
    assert os.path.exists(os.path.join(idx, "_current"))
    assert not [d for d in os.listdir(idx)
                if "=" in d], "legacy flat partition dirs not cleaned"
    final = t.read().select("vec_id", "embedding")
    want = {(r["vec_id"], r["sig"]) for r in
            lsh_build(final, dim, bits=3).collect()}
    got = {(r["vec_id"], r["sig"]) for r in
           index_read(spark, idx).select("vec_id", "sig").collect()}
    assert got == want


def test_ivf_upsert_drift_audit_and_rebuild_signal(spark, tmp_path):
    """r5 directive #7: every upsert returns the frozen-quantizer drift
    audit — per-cell posting counts maintained INCREMENTALLY in the
    version's _stats.json (untouched cells carried forward, only
    affected cells recounted), surfaced as max/mean imbalance and a
    rebuild recommendation against the documented threshold (4.0).
    Construction: 8 orthogonal one-hot clusters (ids 0-7 are the seed
    anchors, so ivf_build's quantizer is exactly the cluster centers);
    a small balanced window keeps rebuild_recommended False, then a
    60-vector pile-up on cluster 0 drives imbalance past 4.0."""
    import numpy as np

    from database_delta_plugins_spark.operators.similarity import (
        INDEX_REBUILD_IMBALANCE,
        index_read,
        index_write,
        ivf_build,
        ivf_index_upsert,
    )

    dim = 8
    rng = np.random.RandomState(3)

    def clustered(i, cluster):
        v = rng.randn(dim) * 0.01
        v[cluster] += 10.0
        return v.tolist()

    base = [(i, clustered(i, i % dim), "I", i + 1) for i in range(48)]
    t = _mk_emb_table(spark, tmp_path)
    t.merge(_vecs(spark, base), epoch_id=1)
    t = t.refresh()
    v1 = t.version
    idx = str(tmp_path / "ivf_drift")
    assigned, cents = ivf_build(
        t.read().select("vec_id", "embedding"), n_cells=8)
    index_write(assigned, idx, "_cell")

    def truth():
        return {r["_cell"]: r["count"] for r in
                index_read(spark, idx).groupBy("_cell").count().collect()}

    # window 1: small balanced drift into cluster 1 -> no rebuild signal
    ins1 = [(100 + i, clustered(100 + i, 1), "I", 100 + i)
            for i in range(4)]
    t.merge(_vecs(spark, ins1), epoch_id=2)
    t = t.refresh()
    rec1 = ivf_index_upsert(spark, idx, t.changes(v1), cents)
    counts = truth()
    assert rec1["cells"] == len(counts) == 8
    assert rec1["max_cell"] == max(counts.values()) == 10
    assert rec1["mean_cell"] == round(sum(counts.values()) / 8, 2) == 6.5
    assert rec1["imbalance"] == round(10 / 6.5, 3)
    assert rec1["rebuild_recommended"] is False
    v2 = t.version

    # window 2: 60 inserts all in cluster 0 -> only cell 0 is rewritten,
    # every other cell's count must carry forward (incremental half),
    # and the imbalance crosses the rebuild threshold
    ins2 = [(200 + i, clustered(200 + i, 0), "I", 200 + i)
            for i in range(60)]
    t.merge(_vecs(spark, ins2), epoch_id=3)
    t = t.refresh()
    rec2 = ivf_index_upsert(spark, idx, t.changes(v2), cents)
    counts = truth()
    assert rec2["partitions_rewritten"] == 1
    assert rec2["cells"] == 8
    assert rec2["max_cell"] == max(counts.values()) == 66
    assert rec2["mean_cell"] == round(sum(counts.values()) / 8, 2) == 14.0
    assert rec2["imbalance"] == round(66 / 14.0, 3)
    assert rec2["imbalance"] > INDEX_REBUILD_IMBALANCE
    assert rec2["rebuild_recommended"] is True
