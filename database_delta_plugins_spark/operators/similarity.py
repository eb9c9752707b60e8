"""Similarity search over embedding columns (array<float>).

* ``cosine_topk``      — brute-force exact top-k against a query vector:
  native ``zip_with``/``aggregate`` dot product (JVM-side, codegen'd),
  one narrow pass + a top-k sort. The correctness baseline.
* ``lsh_bucket_topk``  — random-hyperplane LSH: sign-bit signature from
  deterministic pseudo-hyperplanes, bucket on the signature prefix,
  search only matching buckets (multi-probe over Hamming-1 neighbors).
  The 100 TB path: candidate set ~ n / 2^bits per probe instead of n.
* ``cosine_neardup_pairs`` — embedding near-duplicate detection via the
  same LSH buckets.

Hyperplanes are derived from xxhash64(i, dim) — no RNG state, fully
deterministic and reproducible across runs/executors.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type-hint resolution
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a, b) -> F.Column:
    """Cosine similarity, null for zero-norm inputs. The guard matters:
    0/0 is NaN, and Spark ranks NaN ABOVE every real number — an
    all-zero embedding (failed encode, padding) would otherwise win
    every top-k and pass `>= threshold` filters. NULL instead sorts
    last under desc and fails every threshold, so zero vectors are
    excluded everywhere (matching the numpy/GEMM variant, where NaN
    comparisons are False)."""
    na, nb = _norm(a), _norm(b)
    return F.when((na > 0) & (nb > 0), _dot(a, b) / (na * nb))


def cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine vs a constant query vector. The query is a
    literal array (broadcast as part of the plan, no shuffle of the big
    side; the global top-k is a TakeOrdered, not a full sort)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    # rank on the RAW cosine (round only in the projection): rank-k ties
    # introduced by rounding would diverge from an exact-SQL oracle.
    # Null scores (zero-norm vectors) are EXCLUDED, not ranked last —
    # they must never pad the top-k.
    scored = df.select(F.col(id_col), cosine(F.col(vec_col), q).alias("_c"))
    scored = scored.filter(F.col("_c").isNotNull())
    return (
        scored.orderBy(F.desc("_c"), F.col(id_col)).limit(k)
        .select(id_col, F.round("_c", 6).alias("cos_sim"))
    )


def cosine_topk_batch(df: DataFrame, queries: DataFrame, k: int = 10,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      q_id_col: str = "q_id", q_vec_col: str = "q_vec") -> DataFrame:
    """Exact top-k for a BATCH of query vectors in one pass: broadcast
    the (small) query set, score every (vector, query) pair map-side —
    the corpus is read ONCE for all queries, never shuffled — then a
    per-query top-k via window rank over the scored pairs (shuffle is
    O(|corpus| × |queries|) narrow scored rows, not payload). The
    offline-serving shape: N probe queries against a 10^9-vector corpus
    amortize the scan across the whole batch."""
    from pyspark.sql.window import Window

    q = F.broadcast(queries.select(
        F.col(q_id_col).alias("_qid"), F.col(q_vec_col).alias("_qv")))
    scored = (
        df.select(id_col, vec_col).crossJoin(q)
        .select("_qid", id_col,
                cosine(F.col(vec_col), F.col("_qv")).alias("_c"))
        .filter(F.col("_c").isNotNull())   # zero-norm vectors excluded
    )
    w = Window.partitionBy("_qid").orderBy(F.desc("_c"), F.col(id_col))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(F.col("_qid").alias(q_id_col), id_col,
                F.round("_c", 6).alias("cos_sim"),
                F.col("_rk").alias("rank"))
    )


def _hyperplane(i: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane i (hash-derived,
    values in [-1, 1))."""
    import numpy as np
    # splitmix64-style scramble — pure arithmetic, reproducible
    out = []
    for d in range(dim):
        x = (i * 0x9E3779B97F4A7C15 + d * 0xC2B2AE3D27D4EB4F + 0xD6E8FEB86659FD93) % (1 << 64)
        x ^= x >> 33
        x = (x * 0xFF51AFD7ED558CCD) % (1 << 64)
        x ^= x >> 33
        out.append((x / float(1 << 63)) - 1.0)
    return list(np.asarray(out, dtype=float))


def lsh_signature(df: DataFrame, dim: int, bits: int = 8,
                  vec_col: str = "embedding", out: str = "sig") -> DataFrame:
    """Random-hyperplane signature: bit i = sign(v · h_i). Native exprs
    (sequential-fold dots — exactly mirrorable by a SQL oracle; gate
    queries use this). For the throughput path see
    ``lsh_signature_arrow``."""
    sig = F.lit(0).cast("long")
    for i in range(bits):
        h = F.array(*[F.lit(x) for x in _hyperplane(i, dim)])
        bit = (_dot(F.col(vec_col), h) > 0).cast("long")
        sig = sig + F.shiftleft(bit, i)
    return df.withColumn(out, sig)


def lsh_signature_arrow(df: DataFrame, dim: int, bits: int = 8,
                        vec_col: str = "embedding",
                        out: str = "sig") -> DataFrame:
    """Random-hyperplane signature as ONE numpy GEMM per Arrow batch:
    X (batch×dim) @ H.T (dim×bits) → sign bits → packed int64. The
    Catalyst version evaluates ``bits`` interpreted higher-order-function
    folds per row (zip_with + aggregate are not codegen'd) — measured r4
    at 64k×64-dim vectors it was the whole embed_neardup bottleneck
    (~10× slower than this kernel). Same hyperplane family; signs can
    differ from the sequential fold only when |dot| is within float-sum
    reordering error (~1e-15 relative — vanishing probability), so the
    oracle-parity gate queries keep the Catalyst path and the scale
    paths use this one (the minhash/simhash split, applied to
    embeddings)."""
    from pyspark.sql.functions import pandas_udf

    H = None  # built lazily executor-side from the deterministic family

    @pandas_udf("long")
    def _sig(v: pd.Series) -> pd.Series:
        import numpy as np

        nonlocal H
        if H is None:
            H = np.stack([_hyperplane(i, dim) for i in range(bits)])
        valid = v.map(lambda a: a is not None).to_numpy()
        res = np.empty(len(v), dtype=object)
        if valid.any():
            X = np.stack([np.asarray(a, dtype=np.float64)
                          for a in v[valid]])
            B = (X @ H.T) > 0
            packed = np.zeros(B.shape[0], dtype=np.int64)
            for i in range(bits):
                packed |= B[:, i].astype(np.int64) << i
            vi = np.flatnonzero(valid)
            for j, i in enumerate(vi):
                res[i] = int(packed[j])
        return pd.Series(res)

    return df.withColumn(out, _sig(F.col(vec_col)))


def lsh_build(df: DataFrame, dim: int, bits: int = 8,
              vec_col: str = "embedding") -> DataFrame:
    """LSH index BUILD (r3 directive #6 — the persist-and-prune split
    IVF already has): compute signatures ONCE over the corpus; persist
    the result partitioned by ``sig``
    (``.write.partitionBy('sig').parquet(idx)``). Queries then never
    recompute the 2^bits hyperplane dots over the corpus — they
    partition-prune to the ≤ bits+1 probe buckets at the scan and
    brute-force within (see ``lsh_topk``)."""
    return lsh_signature(df, dim, bits=bits, vec_col=vec_col)


def lsh_probes(query_vec: list[float], bits: int = 8,
               multiprobe: bool = True) -> list[int]:
    """Query-side bucket selection: the query's own signature plus (with
    multiprobe) every Hamming-1 neighbor — driver-side arithmetic only."""
    dim = len(query_vec)
    qsig = 0
    for i in range(bits):
        d = sum(float(a) * b for a, b in zip(query_vec, _hyperplane(i, dim)))
        qsig |= int(d > 0) << i
    return [qsig] + ([qsig ^ (1 << i) for i in range(bits)] if multiprobe else [])


def lsh_topk(sigged: DataFrame, query_vec: list[float], k: int = 10,
             bits: int = 8, id_col: str = "vec_id",
             vec_col: str = "embedding", multiprobe: bool = True) -> DataFrame:
    """LSH ANN query against a built (ideally persisted-partitioned)
    signature index: filter to probe buckets — partition pruning when
    ``sigged`` was read back from a ``partitionBy('sig')`` layout — then
    exact cosine top-k within."""
    probes = lsh_probes(query_vec, bits=bits, multiprobe=multiprobe)
    cand = sigged.filter(F.col("sig").isin(probes))
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def lsh_bucket_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                    bits: int = 8, id_col: str = "vec_id",
                    vec_col: str = "embedding", multiprobe: bool = True,
                    sigged: DataFrame | None = None) -> DataFrame:
    """Approximate top-k: score only vectors whose LSH bucket matches the
    query's bucket (or differs by one bit with multiprobe). Pass
    ``sigged`` from a prior ``lsh_build`` to hit the build-once path;
    otherwise signatures are computed inline (one-shot convenience)."""
    if sigged is None:
        sigged = lsh_build(df, len(query_vec), bits=bits, vec_col=vec_col)
    return lsh_topk(sigged, query_vec, k=k, bits=bits, id_col=id_col,
                    vec_col=vec_col, multiprobe=multiprobe)


def _cap_sig_bucket(s: DataFrame, id_col: str,
                    max_bucket: int | None) -> DataFrame:
    """The per-sig-bucket postings cap (operators/dedup.py::_cap_postings
    contract, specialized to the signature relation) — ONE definition so
    the catalyst and GEMM near-dup variants, and the dropped_postings
    audit, can never diverge."""
    if max_bucket is None:
        return s
    from pyspark.sql.window import Window

    rk = F.row_number().over(Window.partitionBy("sig").orderBy(id_col))
    return s.withColumn("_rk", rk).filter(F.col("_rk") <= max_bucket).drop("_rk")


def _py_cosine(a: list[float], b: list[float]) -> float:
    """Pure-python sequential-fold cosine — bit-matches the Catalyst
    aggregate() fold and DuckDB's list_dot_product loop, so driver-side
    probe selection agrees with engine- and oracle-side scoring."""
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
        na += x * x
        nb += y * y
    return dot / ((na ** 0.5) * (nb ** 0.5))


def ivf_build(df: DataFrame, n_cells: int = 16, id_col: str = "vec_id",
              vec_col: str = "embedding",
              seed_ids: list[int] | None = None
              ) -> tuple[DataFrame, list[list[float]]]:
    """IVF (inverted-file) index BUILD: deterministic coarse quantizer —
    centroids are the vectors of ``n_cells`` seed rows (lowest ids by
    default); every vector is assigned the argmax-cosine cell as a pure
    Catalyst expression (no MLlib fit, no iteration-order float drift).

    The 100 TB shape: run once, persist the output partitioned by
    ``_cell`` (``.write.partitionBy('_cell')``); queries never touch this
    again — they prune to nprobe cells at the scan (partition pruning)
    and brute-force within. Returns (assigned_df, centroids).
    """
    if seed_ids is not None:
        rows = df.filter(F.col(id_col).isin(seed_ids)) \
            .select(id_col, vec_col).collect()
    else:
        # default seeds: the n_cells LOWEST ids actually present (not
        # range(n_cells) — ids need not start at 0 or be dense);
        # deterministic TakeOrdered, identical on the dense-id testdata
        rows = df.select(id_col, vec_col).orderBy(id_col).limit(n_cells).collect()
    rows = sorted(rows, key=lambda r: r[id_col])
    centroids = [[float(x) for x in r[vec_col]] for r in rows]
    return ivf_assign(df, centroids, vec_col=vec_col), centroids


def ivf_assign(df: DataFrame, centroids: list[list[float]],
               vec_col: str = "embedding") -> DataFrame:
    """Assign every vector its argmax-cosine cell under a FIXED centroid
    set (pure Catalyst expression). Split out of ivf_build (r4) so
    incremental maintenance can assign new vectors under the frozen
    quantizer — the standard IVF practice: centroids stay fixed between
    periodic re-trainings, only the postings move."""
    scores = F.array(*[
        cosine(F.col(vec_col), F.array(*[F.lit(x) for x in c]))
        for c in centroids
    ])
    cell = (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
    return df.withColumn("_cell", cell)


def ivf_probe_cells(centroids: list[list[float]], query_vec: list[float],
                    nprobe: int) -> list[int]:
    """Query-side cell selection: the ``nprobe`` cells whose centroids
    are nearest the query (cosine; ties broken by cell id)."""
    sims = [_py_cosine(c, [float(x) for x in query_vec]) for c in centroids]
    return sorted(range(len(centroids)), key=lambda i: (-sims[i], i))[:nprobe]


def ivf_topk(df: DataFrame, query_vec: list[float], k: int = 10,
             n_cells: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             assigned: DataFrame | None = None,
             centroids: list[list[float]] | None = None) -> DataFrame:
    """IVF ANN query. Pass ``assigned``/``centroids`` from a prior
    ivf_build to hit the build-once/query-many path (no fit, no
    reassignment — just cell pruning + in-cell brute force); otherwise
    builds inline (convenience for one-shot use).
    Candidate count ~ n * nprobe / n_cells."""
    if assigned is None or centroids is None:
        assigned, centroids = ivf_build(df, n_cells, id_col, vec_col)
    probes = ivf_probe_cells(centroids, query_vec, nprobe)
    cand = assigned.filter(F.col("_cell").isin(probes)).drop("_cell")
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def ivf_topk_kmeans(df: DataFrame, query_vec: list[float], k: int = 10,
                    n_cells: int = 16, nprobe: int = 4,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """KMeans-quantized IVF variant (MLlib KMeans||, seeded): better cell
    balance than seed-based quantization at the cost of an iterative fit
    whose float reduction order is partition-dependent — use for quality,
    seed-based ivf_build for reproducibility-critical paths."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.withColumn("_v", array_to_vector(F.col(vec_col)))
    model = KMeans(k=n_cells, seed=42, featuresCol="_v", predictionCol="_cell").fit(feat)
    assigned = model.transform(feat)

    q = np.asarray(query_vec, dtype=float)
    centers = model.clusterCenters()
    sims = [
        float(np.dot(c, q) / (np.linalg.norm(c) * np.linalg.norm(q) + 1e-12))
        for c in centers
    ]
    probes = sorted(range(len(centers)), key=lambda i: -sims[i])[:nprobe]

    cand = assigned.filter(F.col("_cell").isin(probes)).drop("_v", "_cell")
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def cosine_neardup_pairs_arrow(df: DataFrame, dim: int,
                               threshold: float = 0.95, bits: int = 8,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding",
                               max_bucket: int | None = 200) -> DataFrame:
    """Embedding near-dup pairs with the in-bucket scoring as a numpy
    GEMM (``applyInPandas`` per LSH bucket): normalize the bucket's
    vectors once, X @ X.T, emit upper-triangle pairs ≥ threshold.

    The 100-TB compute shape — Spark distributes buckets, BLAS does the
    math: a capped bucket is at most max_bucket×dim floats (≈100 KB), so
    each group task is one small dense matmul instead of per-pair
    expression-tree folds (measured ~5× faster at sf0.1 uncapped).
    Same candidate semantics as ``cosine_neardup_pairs``; cosines can
    differ from the sequential fold by float-summation order (~1e-7),
    so oracle-parity gate queries keep the Catalyst scorer."""

    # arrow signature kernel: this is the declared scale path (float-
    # order caveats already documented above) — the GEMM signature
    # removes the interpreted per-row fold that dominated the profile
    s = lsh_signature_arrow(df.select(id_col, vec_col), dim, bits=bits,
                            vec_col=vec_col)
    s = _cap_sig_bucket(s, id_col, max_bucket)
    # output id type follows the input id column (string/uuid ids work
    # like the catalyst variant, not just longs)
    id_t = df.schema[id_col].dataType.simpleString()
    id_dtype = object if id_t == "string" else "int64"

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype=id_dtype),
                                 "id_b": pd.Series([], dtype=id_dtype),
                                 "cos_sim": pd.Series([], dtype="float64")})
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in pdf[vec_col].iloc[order]])
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        sim = X @ X.T
        ia, ib = np.triu_indices(n, k=1)
        keep = sim[ia, ib] >= threshold
        return pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]],
                             "cos_sim": np.round(sim[ia, ib][keep], 6)})

    return (
        s.groupBy("sig")
        .applyInPandas(score, f"id_a {id_t}, id_b {id_t}, cos_sim double")
        .dropDuplicates(["id_a", "id_b"])
    )


def cosine_neardup_pairs(df: DataFrame, dim: int, threshold: float = 0.95,
                         bits: int = 8, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         max_bucket: int | None = 200) -> DataFrame:
    """Embedding near-dup pairs: exact cosine verified within LSH buckets
    only — O(sum of bucket²) candidates, never a full cross join.

    ``max_bucket`` (default ON at 200 — the production posture, same
    contract as every text-dedup candidate generator,
    operators/dedup.py::_cap_postings) is the skew guard: a bucket
    holding more than ``max_bucket`` vectors — a near-constant embedding
    cluster, or bits sized too small for n — contributes at most
    max_bucket² candidate pairs instead of going quadratic in the
    cluster size. Affects candidate RECALL only (emitted pairs are exact
    cosine). Size ``bits ≈ log2(n / target_bucket)`` so average buckets
    sit near target_bucket (≤ max_bucket), leaving the cap as the
    backstop for pathological clusters; audit what it discarded with
    operators.dedup.dropped_postings over the signature relation.
    Pass ``max_bucket=None`` ONLY for small oracle-checked corpora where
    a SQL mirror must see the identical candidate set."""
    s = lsh_signature(df.select(id_col, vec_col), dim, bits=bits, vec_col=vec_col)
    # per-VECTOR norm computed once into the checkpointed signature
    # relation (r6): the in-bucket pair scorer used to re-fold norm(a)
    # and norm(b) for EVERY pair — 2/3 of the per-pair interpreted
    # higher-order-function work for vectors that appear in many pairs.
    # Float semantics are IDENTICAL (same sqrt(aggregate(x*x)) fold per
    # vector, same _dot/(na*nb) division order), so the SQL-mirrored
    # oracle parity is untouched.
    s = s.withColumn("_nrm", _norm(F.col(vec_col)))
    # the bucket self-join consumes the signature relation TWICE (a and
    # b sides); checkpoint so the `bits` hyperplane-dot chains run once
    # over the corpus, not twice (r4 — same pattern as minhash bandrows)
    s = _cap_sig_bucket(s, id_col, max_bucket).localCheckpoint(eager=False)
    a = s.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"),
                 F.col("_nrm").alias("_na"), "sig")
    b = s.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"),
                 F.col("_nrm").alias("_nb"), "sig")
    # (r6: an unrolled 64-term GetArrayItem sum — float-order-identical
    # — was measured SLOWER than this fold end-to-end, 2.62 s vs
    # 1.96 s: the 128-node codegen expression costs more per plan than
    # the interpreted lambda costs per pair at these bucket sizes.)
    cos = F.when((F.col("_na") > 0) & (F.col("_nb") > 0),
                 _dot(F.col("v_a"), F.col("v_b"))
                 / (F.col("_na") * F.col("_nb")))
    return (
        a.join(b, "sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("_c", cos)
        .filter(F.col("_c") >= threshold)
        .select("id_a", "id_b", F.round("_c", 6).alias("cos_sim"))
        .dropDuplicates(["id_a", "id_b"])
    )


# --------------------------------------------------------------------------
# Incremental index maintenance off the change feed (r4 directive #6).
# Composes the two halves of the engine: LakeTable.changes() (the CDF the
# CDC apply produces) drives partition-local updates of a persisted ANN
# index — the hourly job a real 100 TB pipeline runs instead of a full
# index rebuild per ingest window.


def _latest_changes(changes: DataFrame, id_col: str,
                    cols: list[str]) -> DataFrame:
    """Collapse a CDF window to ONE row per key — the max-(_lsn, _seq)
    change decides whether the key ends the window upserted or deleted
    (a key can appear in several epochs of the window)."""
    pick = F.max(F.struct(
        F.col("_lsn"), F.col("_seq"), F.col("_change_type").alias("_ct"),
        *[F.col(c).alias(f"_p_{c}") for c in cols],
    )).alias("_w")
    return (
        changes.groupBy(id_col).agg(pick)
        .select(id_col, F.col("_w._ct").alias("_change_type"),
                *[F.col(f"_w._p_{c}").alias(c) for c in cols])
    )


def _part_dirname(part_col: str, value) -> str:
    """Hive partition directory name for a value — including the NULL
    partition (``__HIVE_DEFAULT_PARTITION__``), which a naive f-string
    cannot address (ADVICE r4)."""
    return (f"{part_col}=__HIVE_DEFAULT_PARTITION__" if value is None
            else f"{part_col}={value}")


def _index_version(index_path: str) -> int | None:
    """Current version number from the ``_current`` pointer, or None for
    a legacy flat layout (bare ``partitionBy`` output, no pointer)."""
    import os

    ptr = os.path.join(index_path, "_current")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return int(f.read().strip().lstrip("_v"))


def _index_root(index_path: str) -> str:
    """Resolve the data root a reader should scan: the pointed-to
    version directory, or the path itself for a legacy flat layout."""
    import os

    v = _index_version(index_path)
    return index_path if v is None else os.path.join(index_path, f"_v{v}")


def index_read(spark, index_path: str) -> DataFrame:
    """Open a persisted ANN index for reading. Resolves the ``_current``
    version pointer (stage-and-swap layout, see ``index_write``) so a
    reader binds to ONE immutable version directory — an upsert swapping
    the pointer mid-query never mixes old and new files into one scan.
    Legacy flat layouts (no pointer) read as-is."""
    return spark.read.parquet(_index_root(index_path))


def index_write(df: DataFrame, index_path: str, part_col: str,
                config: dict | None = None,
                cursor: int | None = None) -> str:
    """Initial build of a versioned ANN index: the partitioned parquet
    lands under ``index_path/_v1`` and ``_current`` points at it —
    the LakeTable manifest pattern applied to index storage. Per-
    partition posting counts are recorded in ``_v1/_stats.json`` (one
    column-pruned pass over the fresh parquet — row counts come from
    footers) so upserts can maintain them incrementally (r5 drift
    audit). ``config`` (the index's hash-family parameters) is written
    into the VERSION directory before the pointer swap, so it becomes
    visible atomically with the rows it describes — a root-level config
    next to an atomic swap leaves a crash window where config and rows
    disagree and a guard green-lights the corrupting call it exists to
    block. Upserts carry it forward; readers resolve it through
    ``_index_root``. Returns the version directory written."""
    import json
    import os

    root = os.path.join(index_path, "_v1")
    df.write.partitionBy(part_col).parquet(root)
    spark = df.sparkSession
    counts = {
        _part_dirname(part_col, r[0]): r[1]
        for r in spark.read.parquet(root)
        .groupBy(part_col).count().collect()
    }
    _write_stats(root, counts)
    if config is not None:
        with open(os.path.join(root, "_config.json"), "w") as f:
            json.dump(config, f)
    if cursor is not None:
        # the refresh cursor (source-table version this index reflects)
        # rides the version directory like config/stats: visible
        # atomically with the rows, so a crashed refresh replays its
        # window instead of skipping it (upserts are window-idempotent)
        _write_cursor(root, cursor)
    _swap_pointer(index_path, 1)
    return root


def _write_cursor(version_dir: str, table_version: int) -> None:
    """Persist the refresh cursor (the source-table version this index
    reflects) into a version directory — atomic tmp+replace so a reader
    never sees a torn file. One writer, three call sites (build, staged
    rewrite, empty-window in-place advance)."""
    import json
    import os

    tmp = os.path.join(version_dir, f"_cursor.tmp.{table_version}")
    with open(tmp, "w") as f:
        json.dump({"table_version": int(table_version)}, f)
    os.replace(tmp, os.path.join(version_dir, "_cursor.json"))


def index_cursor(index_path: str) -> int | None:
    """The source-table version this index reflects (None when the
    index was built without one). Read from the CURRENT version
    directory — always consistent with the rows the pointer resolves
    to."""
    import json
    import os

    p = os.path.join(_index_root(index_path), "_cursor.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(json.load(f)["table_version"])


def _write_stats(version_dir: str, counts: dict[str, int]) -> None:
    """Persist per-partition posting counts inside the version directory
    (underscore-prefixed: invisible to Spark's parquet listing; GC'd
    with its version). Bounded driver-side state: one int per live
    partition — IVF cell counts and 2^bits LSH buckets, not rows."""
    import json
    import os

    with open(os.path.join(version_dir, "_stats.json"), "w") as f:
        json.dump(counts, f)


def _read_stats(version_dir: str) -> dict[str, int] | None:
    import json
    import os

    p = os.path.join(version_dir, "_stats.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


#: Documented rebuild threshold for the frozen-quantizer drift audit:
#: when the largest partition exceeds the mean by this factor, the
#: distribution has shifted enough that partition pruning degrades —
#: schedule a re-train/rebuild (a re-train is a rebuild by definition).
INDEX_REBUILD_IMBALANCE = 4.0


def _imbalance_stats(counts: dict[str, int]) -> dict:
    """max/mean posting-count imbalance + rebuild recommendation from a
    per-partition count map (the IVF drift audit, r5 — also meaningful
    for LSH buckets)."""
    live = [c for c in counts.values() if c > 0]
    if not live:
        return {"cells": 0, "max_cell": 0, "mean_cell": 0.0,
                "imbalance": None, "rebuild_recommended": False}
    mx, mean = max(live), sum(live) / len(live)
    imb = round(mx / mean, 3)
    return {"cells": len(live), "max_cell": mx,
            "mean_cell": round(mean, 2), "imbalance": imb,
            "rebuild_recommended": imb > INDEX_REBUILD_IMBALANCE}


def _swap_pointer(index_path: str, version: int) -> None:
    """Atomically (os.replace) point ``_current`` at ``_v{version}``."""
    import os

    tmp = os.path.join(index_path, f"_current.tmp.{version}")
    with open(tmp, "w") as f:
        f.write(f"_v{version}")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(index_path, "_current"))


def _link_tree(src: str, dst: str) -> None:
    """Mirror a partition directory into the staged version via
    hardlinks (O(files) metadata ops, zero data copy — the local-FS
    analogue of an object-store manifest referencing unchanged data
    files). Falls back to copy where links cross devices."""
    import os
    import shutil

    os.makedirs(dst, exist_ok=True)
    for name in os.listdir(src):
        s, d = os.path.join(src, name), os.path.join(dst, name)
        if os.path.isdir(s):
            _link_tree(s, d)
        else:
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)


def _index_upsert(spark, index_path: str, changes: DataFrame,
                  assign, part_col: str, id_col: str,
                  vec_col: str,
                  source_cols: list[str] | None = None,
                  cursor: int | None = None) -> dict:
    """Partition-local upsert of a persisted ANN index (parquet laid out
    ``partitionBy(part_col)``) from a CDF window — STAGE-AND-SWAP (r5):
    the rewrite lands in a NEW version directory and becomes visible
    only through one atomic pointer replace, so a concurrent reader
    sees the old index or the new one, never a mix.

    Shape, built for scale:
      1. collapse the window to one final change per key (narrow agg);
      2. locate the keys' OLD partitions with one column-pruned scan of
         the index ((id, part) only — the vectors never leave the scan)
         semi-joined to the broadcast changed-key set;
      3. assign new/updated vectors their partition under the index's
         own (frozen) hash/quantizer;
      4. stage version N+1: hardlink every UNTOUCHED partition directory
         from version N (metadata-only, no data copy — on an object
         store this is a manifest referencing the same data files), and
         write only the affected partitions' new contents into the
         staged directory; partitions left empty by deletes are simply
         not linked or written;
      5. atomically swap the ``_current`` pointer (os.replace); version
         N is RETAINED so readers that resolved it before the swap
         finish their scan on immutable files, and versions older than
         N are garbage-collected.

    A crash mid-stage leaves a dangling ``_v{N+1}`` directory that the
    pointer never references — re-running the upsert (idempotent for
    the same CDF window) or rebuilding repairs it. Legacy flat layouts
    (no ``_current``) are migrated in place: their first upsert stages
    ``_v1`` and removes the flat partition directories after the swap
    (the one non-transactional step, unavoidable for a layout that
    was never versioned — build with ``index_write`` to avoid it)."""
    import os
    import shutil

    cur_version = _index_version(index_path)
    cur_root = _index_root(index_path)
    idx = spark.read.parquet(cur_root)
    data_cols = [c for c in idx.columns if c != part_col]
    # ``source_cols``: what the changes feed must carry and ``assign``
    # consumes. Defaults to the index's own data columns (the ANN case,
    # where vectors are stored verbatim); a DERIVED index (r5 minhash
    # band rows: many index rows per source row, none of them source
    # columns) names its true inputs instead.
    req = source_cols if source_cols is not None else data_cols
    if id_col not in req:
        raise ValueError(f"source_cols must include {id_col!r}")
    missing = [c for c in req if c not in changes.columns]
    if missing:
        raise ValueError(f"changes feed lacks index source columns {missing}")
    # drift audit (r5): per-partition posting counts are maintained
    # incrementally — carried forward for untouched partitions, refreshed
    # only for affected ones. A legacy/pre-stats index pays one full
    # column-pruned count (footer row counts) to bootstrap the map.
    prev_counts = _read_stats(cur_root)
    if prev_counts is None:
        prev_counts = {
            _part_dirname(part_col, r[0]): r[1]
            for r in idx.groupBy(part_col).count().collect()
        }
    latest = _latest_changes(
        changes, id_col, [c for c in req if c != id_col]
    ).localCheckpoint(eager=False)
    ids = latest.select(id_col)
    ups = assign(
        latest.filter(F.col("_change_type") != "delete").select(*req))
    old_parts = (idx.select(id_col, part_col)
                 .join(F.broadcast(ids), id_col, "semi")
                 .select(part_col).distinct())
    new_parts = ups.select(part_col).distinct()
    parts = [r[0] for r in old_parts.union(new_parts).distinct().collect()]
    if not parts:
        # no-op window: the pointer is untouched — report the CURRENT
        # version so the return contract matches the rewrite path
        # (r5 review: the missing key broke stats["version"] callers;
        # a legacy flat layout has no version yet — 0, an int, keeps
        # numeric callers working and below any real version). The
        # refresh cursor still advances (atomic in-place replace —
        # metadata-only and monotonic, readers never consult it
        # mid-scan) or a streaming refresher would re-collapse the same
        # empty window every epoch.
        if cursor is not None:
            _write_cursor(cur_root, cursor)
        return {"partitions_rewritten": 0, "partitions_cleared": 0,
                "upserts": 0, "deletes": 0,
                "version": cur_version if cur_version is not None else 0,
                **_imbalance_stats(prev_counts)}
    affected_dirs = {_part_dirname(part_col, p) for p in parts}
    # affected partitions' new contents: surviving old rows + upserts.
    # Reads ONLY version N files and writes ONLY the staged _v{N+1}
    # dir — no read-overwrite hazard, so no checkpoint is needed for
    # safety; the lazy one just shares the compute between the
    # live-partition probe and the write.
    affected_vals = [p for p in parts if p is not None]
    sel = F.col(part_col).isin(affected_vals)
    if any(p is None for p in parts):
        sel = sel | F.col(part_col).isNull()
    content = (
        idx.filter(sel)
        .join(F.broadcast(ids), id_col, "left_anti")
        .select(*data_cols, part_col)
        .unionByName(ups.select(*data_cols, part_col))
    ).localCheckpoint(eager=False)
    # ONE job yields both the live-partition set and the refreshed
    # posting counts for the affected partitions (the drift audit's
    # incremental half)
    live_counts = {r[0]: r[1]
                   for r in content.groupBy(part_col).count().collect()}
    live_parts = set(live_counts)

    new_version = (cur_version or 0) + 1
    staged = os.path.join(index_path, f"_v{new_version}")
    if os.path.exists(staged):          # dangling crash leftover
        shutil.rmtree(staged)
    os.makedirs(staged)
    for name in os.listdir(cur_root):
        src = os.path.join(cur_root, name)
        if (os.path.isdir(src) and "=" in name
                and name not in affected_dirs):
            _link_tree(src, os.path.join(staged, name))
    if live_parts:
        (
            content.repartition(len(live_parts), part_col)
            .write.partitionBy(part_col)
            .mode("append")
            .parquet(staged)
        )
    new_counts = {k: v for k, v in prev_counts.items()
                  if k not in affected_dirs}
    new_counts.update({_part_dirname(part_col, p): c
                       for p, c in live_counts.items()})
    _write_stats(staged, new_counts)
    cfg_src = os.path.join(cur_root, "_config.json")
    if os.path.exists(cfg_src):   # hash-family config rides the version
        shutil.copy2(cfg_src, os.path.join(staged, "_config.json"))
    cur_src = os.path.join(cur_root, "_cursor.json")
    if cursor is not None:        # refresh cursor advances with the swap
        _write_cursor(staged, cursor)
    elif os.path.exists(cur_src):
        shutil.copy2(cur_src, os.path.join(staged, "_cursor.json"))
    _swap_pointer(index_path, new_version)
    # retain version N for in-flight readers; GC anything older
    for name in os.listdir(index_path):
        if name.startswith("_v") and name[2:].isdigit():
            if int(name[2:]) < (cur_version or new_version) \
                    and int(name[2:]) != new_version:
                shutil.rmtree(os.path.join(index_path, name),
                              ignore_errors=True)
    if cur_version is None:
        # legacy flat layout: the flat partition dirs ARE the old
        # version; remove them now that _v1 is live (migration step)
        for name in os.listdir(index_path):
            p = os.path.join(index_path, name)
            if os.path.isdir(p) and "=" in name:
                shutil.rmtree(p, ignore_errors=True)
    n_del = latest.filter(F.col("_change_type") == "delete").count()
    n_ups = latest.count() - n_del
    return {"partitions_rewritten": len(live_parts & set(parts)),
            "partitions_cleared": len(set(parts) - live_parts),
            "upserts": n_ups, "deletes": n_del,
            "version": new_version,
            **_imbalance_stats(new_counts)}


def lsh_index_upsert(spark, index_path: str, changes: DataFrame,
                     dim: int, bits: int = 8, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     cursor: int | None = None) -> dict:
    """Incrementally refresh a persisted LSH signature index (built
    with ``index_write(lsh_build(...), path, 'sig')``; legacy bare
    ``partitionBy('sig')`` layouts migrate on first upsert) from a
    ``LakeTable.changes()`` window. The hyperplane family is a pure
    function of (bits, dim), so new vectors hash into the existing
    layout with no retraining; the refreshed index is row-identical to
    a full rebuild over the post-window table (pytest-proven), and the
    swap is atomic — concurrent ``index_read`` sees old-or-new, never
    a mix."""
    return _index_upsert(
        spark, index_path, changes,
        lambda d: lsh_signature(d, dim, bits=bits, vec_col=vec_col),
        "sig", id_col, vec_col, cursor=cursor)


def ivf_index_upsert(spark, index_path: str, changes: DataFrame,
                     centroids: list[list[float]],
                     id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     cursor: int | None = None) -> dict:
    """Incrementally refresh a persisted IVF index (built with
    ``index_write(ivf_build(...)[0], path, '_cell')``; legacy bare
    ``partitionBy('_cell')`` layouts migrate on first upsert) from a
    ``LakeTable.changes()`` window, under the FROZEN centroid set the
    index was built with (re-train centroids on your own schedule; a
    re-train is a rebuild by definition). Stage-and-swap like the LSH
    variant: readers never see a torn index.

    Drift audit (r5): under a frozen quantizer, cell imbalance grows as
    the vector distribution shifts. The return dict carries
    ``cells / max_cell / mean_cell / imbalance`` (max/mean posting
    counts, maintained incrementally in the version's ``_stats.json``)
    and ``rebuild_recommended`` — True once imbalance exceeds
    ``INDEX_REBUILD_IMBALANCE`` (4.0): pruning quality has degraded
    enough that the caller should schedule a centroid re-train."""
    return _index_upsert(
        spark, index_path, changes,
        lambda d: ivf_assign(d, centroids, vec_col=vec_col),
        "_cell", id_col, vec_col, cursor=cursor)
