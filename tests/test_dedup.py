"""Dedup operators against planted ground truth."""
from pyspark.sql import functions as F

from database_delta_plugins_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_candidates,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill in the afternoon sun light"
)


def _corpus(spark):
    rows = [
        (0, BASE),
        (1, BASE),                                    # exact dup of 0
        (2, BASE.replace("afternoon", "morning")),    # near dup of 0
        (3, "completely different words about spark shuffles and parquet files"),
        (4, "another unrelated document mentioning iceberg tables and merges"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(spark):
    out = exact_dedup(_corpus(spark)).collect()
    groups = {r["keep_id"]: r["dup_count"] for r in out}
    assert groups[0] == 2          # docs 0,1 collapse
    assert len(out) == 4


def test_ngram_jaccard_finds_near_dup(spark):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(_corpus(spark), threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.5
    assert (0, 3) not in pairs


def test_minhash_lsh_finds_near_dup(spark):
    pairs = {(r["id_a"], r["id_b"]) for r in
             minhash_lsh_pairs(_corpus(spark), threshold=0.5).collect()}
    assert (0, 1) in pairs
    assert (0, 2) in pairs
    assert (0, 3) not in pairs and (3, 4) not in pairs


def test_simhash_near_dup(spark):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             simhash_candidates(_corpus(spark), max_hamming=10).collect()}
    assert pairs[(0, 1)] == 0                     # identical -> same fingerprint
    assert (0, 2) in pairs and pairs[(0, 2)] <= 10
    assert (0, 3) not in pairs


def test_minhash_deterministic(spark):
    a = sorted(map(tuple, minhash_lsh_pairs(_corpus(spark), threshold=0.5).collect()))
    b = sorted(map(tuple, minhash_lsh_pairs(_corpus(spark).repartition(5), threshold=0.5).collect()))
    assert a == b


def test_hot_bucket_caps_bound_candidates(spark):
    """Adversarial boilerplate corpus: every doc shares one hot shingle.
    Uncapped, the inverted-index self-join is quadratic; with max_df the
    candidate count is bounded and dropped_postings reports the bucket."""
    from database_delta_plugins_spark.operators.dedup import (
        _cap_postings,
        dropped_postings,
        ngram_jaccard_pairs,
        shingles,
    )
    from pyspark.sql import functions as F

    n = 200
    rows = [(i, f"common boilerplate header unique{i} tail{i} word{i}") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # every doc contains the shingle "common boilerplate header"
    pairs = ngram_jaccard_pairs(df, threshold=0.01, max_df=10)
    # candidates bounded by cap^2/2 (45), not n^2/2 (19900)
    assert pairs.count() <= 45
    base = shingles(df.select("doc_id", "text")).select(
        F.col("doc_id").alias("id"), F.explode("shingles").alias("sh"))
    hot = dropped_postings(base, ["sh"], cap=10).collect()
    assert any(r["postings"] == n for r in hot)  # the boilerplate shingle


def test_simhash_neardup_pairs_exact_verified(spark):
    from database_delta_plugins_spark.operators.dedup import simhash_neardup_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again today"),
        (2, "the quick brown fox jumps over the lazy dog again and again tonight"),
        (3, "completely different content about spark engines and parquet files"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = simhash_neardup_pairs(df, max_hamming=16, threshold=0.5).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(1, 2)]
    assert 0.5 <= got[0]["jaccard"] < 1.0


def test_connected_components_chain_and_clusters(spark):
    """Min-label components: a 2-cluster graph incl. a chain (worst-case
    diameter) resolves to min-id labels; keep-one per cluster."""
    from database_delta_plugins_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),        # chain 1-2-3-4
         (10, 11), (11, 12), (10, 12)], # triangle
        "id_a: long, id_b: long")
    want = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}
    # driver union-find fast path (default below DRIVER_CC_MAX_EDGES)
    got = {r["node"]: r["comp"] for r in connected_components(pairs).collect()}
    assert got == want
    # distributed pointer-jumping path (forced) — identical semantics
    got_d = {r["node"]: r["comp"] for r in
             connected_components(pairs, driver_max_edges=0).collect()}
    assert got_d == want


def test_connected_components_long_path_pointer_jumping(spark):
    """ADVICE r2: chain-shaped near-dup graphs (low thresholds) have
    diameter ~ n, and plain min-label propagation needed n rounds —
    max_iter=25 then silently returned a multi-labelled component.
    Pointer jumping must converge a 1000-node path in <= 12 rounds."""
    import pytest

    from database_delta_plugins_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(999)], "id_a long, id_b long")
    got = connected_components(pairs, max_iter=12,
                               driver_max_edges=0).collect()
    assert len(got) == 1000
    assert all(r["comp"] == 0 for r in got)

    # and non-convergence is now a signal, not silence
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2, driver_max_edges=0)

    # the driver union-find path (the default at this size) is exact on
    # the same worst-case chain, with no iteration cap to trip
    got_drv = connected_components(pairs).collect()
    assert len(got_drv) == 1000 and all(r["comp"] == 0 for r in got_drv)

    # r5 review: the fast path is generic over the id type — string-
    # keyed graphs (url dedup pairs) resolve with string min-labels and
    # the output schema carries the input type
    spark = pairs.sparkSession
    spairs = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "id_a string, id_b string")
    got_s = {r["node"]: r["comp"]
             for r in connected_components(spairs).collect()}
    assert got_s == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_simhash_arrow_impl_matches_catalyst(spark, sf_dir):
    """The Arrow (numpy-batch) fingerprint kernel is bit-identical to
    the pure-Catalyst expression — same candidates, same hamming."""
    from database_delta_plugins_spark.operators.dedup import (
        simhash64,
        simhash64_arrow,
        simhash_candidates,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    both = docs.select(
        "doc_id",
        simhash64(F.col("text")).alias("fp_c"),
        simhash64_arrow(F.col("text")).alias("fp_a"),
    )
    assert both.filter(~F.col("fp_c").eqNullSafe(F.col("fp_a"))).count() == 0
    a = {tuple(r) for r in simhash_candidates(docs, impl="arrow").collect()}
    c = {tuple(r) for r in simhash_candidates(docs, impl="catalyst").collect()}
    assert a == c and a


def test_minhash_arrow_impl_matches_catalyst(spark, sf_dir):
    """Arrow signature kernel == Catalyst exprs (exact modular math),
    and the full pair pipeline agrees across impls."""
    from database_delta_plugins_spark.operators.dedup import (
        _shingle_base,
        minhash_lsh_pairs,
        minhash_signature,
        minhash_signature_arrow,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = _shingle_base(docs, "doc_id", "text", 3)
    both = (
        minhash_signature(base).select("id", F.col("minhash").alias("mc"))
        .join(minhash_signature_arrow(base)
              .select("id", F.col("minhash").alias("ma")), "id")
    )
    assert both.filter(F.col("mc") != F.col("ma")).count() == 0
    a = {tuple(r) for r in
         minhash_lsh_pairs(docs, threshold=0.3, impl="arrow").collect()}
    c = {tuple(r) for r in
         minhash_lsh_pairs(docs, threshold=0.3, impl="catalyst").collect()}
    assert a == c and a


def test_decontaminate_flags_planted_overlap(spark):
    """A corpus doc embedding a benchmark 5-gram is flagged with the
    right count; clean docs are not; benchmark broadcast is map-side."""
    from database_delta_plugins_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta")], "doc_id: long, text: string")
    corpus = spark.createDataFrame([
        (10, "x alpha beta gamma delta epsilon y"),   # 1 shared 5-gram
        (11, "totally different words entirely here now"),
    ], "doc_id: long, text: string")
    out = {r["doc_id"]: r["n_hits"]
           for r in decontaminate(corpus, bench, n=5).collect()}
    assert out == {10: 1}


def test_sample_by_source_deterministic(spark):
    """Same salt => identical sample; rate ordering holds; salt redraws."""
    from database_delta_plugins_spark.operators.dedup import sample_by_source

    rows = [(i, f"src{i % 4}") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id: long, source: string")
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.1}
    a = {r["doc_id"] for r in sample_by_source(df, rates, default_rate=0.0).collect()}
    b = {r["doc_id"] for r in sample_by_source(df, rates, default_rate=0.0).collect()}
    assert a == b
    by_src = {s: sum(1 for i in a if i % 4 == int(s[-1])) for s in ("src0", "src1", "src2", "src3")}
    assert by_src["src0"] == 500            # rate 1.0 keeps all
    assert 150 < by_src["src1"] < 350       # ~0.5
    assert 10 < by_src["src2"] < 110        # ~0.1
    assert by_src["src3"] == 0              # default 0.0
    c = {r["doc_id"] for r in sample_by_source(df, rates, salt=7, default_rate=0.0).collect()}
    assert c != a


def test_sample_by_source_string_ids(spark):
    """review r3: non-numeric ids (urls) must sample, not silently
    vanish via a NULL cast."""
    from database_delta_plugins_spark.operators.dedup import sample_by_source

    rows = [(f"https://ex.com/p{i}", f"src{i % 2}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id: string, source: string")
    a = {r["doc_id"] for r in sample_by_source(
        df, {"src0": 1.0, "src1": 0.5}).collect()}
    assert sum(1 for u in a if u.endswith(("0", "2", "4", "6", "8"))) > 0
    n0 = sum(1 for i, u in enumerate(rows) if u[0] in a and i % 2 == 0)
    assert n0 == 200                      # rate 1.0 keeps every src0 row
    n1 = sum(1 for i, u in enumerate(rows) if u[0] in a and i % 2 == 1)
    assert 50 < n1 < 150                  # ~0.5
    b = {r["doc_id"] for r in sample_by_source(
        df, {"src0": 1.0, "src1": 0.5}).collect()}
    assert a == b                         # deterministic


def test_minhash_bands_must_divide(spark, sf_dir):
    import pytest

    from database_delta_plugins_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError, match="bands"):
        minhash_lsh_pairs(docs, bands=128)
    with pytest.raises(ValueError, match="bands"):
        minhash_lsh_pairs(docs, bands=24)


def test_sample_by_source_large_salt_no_overflow(spark):
    from database_delta_plugins_spark.operators.dedup import sample_by_source

    df = spark.createDataFrame([(i, "s") for i in range(100)],
                               "doc_id: long, source: string")
    n = sample_by_source(df, {"s": 0.5}, salt=1_700_000_000).count()
    assert 20 < n < 80


def test_shingles_arrow_matches_catalyst(spark, sf_dir):
    """Arrow shingle kernel emits the identical arrays (content AND
    first-occurrence order) as the Catalyst expression — incl. the
    short-doc single-shingle case."""
    from database_delta_plugins_spark.operators.dedup import shingles

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").unionByName(
        spark.createDataFrame([(10**9, "one two")],
                              "doc_id: long, text: string")
        .withColumn("lang", F.lit("en")).withColumn("source", F.lit("x"))
        .withColumn("n_chars", F.lit(7)))
    for n in (3, 5):
        a = shingles(docs.select("doc_id", "text"), "text", n=n,
                     impl="arrow").select("doc_id", F.col("shingles").alias("sa"))
        c = shingles(docs.select("doc_id", "text"), "text", n=n,
                     impl="catalyst").select("doc_id", F.col("shingles").alias("sc"))
        assert a.join(c, "doc_id").filter(F.col("sa") != F.col("sc")).count() == 0


def test_minhash_index_upsert_equals_rebuild(spark, tmp_path):
    """r5: CDC-driven incremental maintenance of the persisted banded-
    minhash dedup index — refresh from a LakeTable.changes() window is
    row-identical to a full rebuild over the post-window table, across
    text mutations (band rows move buckets), inserts and deletes;
    re-running the same window is idempotent; and probing the index
    with an incoming batch finds a planted duplicate but not a novel
    document."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from database_delta_plugins_spark.lake.table import LakeTable
    from database_delta_plugins_spark.operators.dedup import (
        _minhash_index_rows,
        minhash_index_build,
        minhash_index_candidates,
        minhash_index_upsert,
    )
    from database_delta_plugins_spark.operators.similarity import index_read

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text").filter(F.col("doc_id") < 120))
    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True)])
    t = LakeTable.create(spark, str(tmp_path / "t"), schema, key="doc_id",
                         num_buckets=2, write_mode="mor")

    def ops(df, op, lsn0):
        return df.select(
            "doc_id", "text", F.lit(op).alias("op_type"),
            (F.lit(lsn0) + F.col("doc_id")).alias("lsn"),
            F.lit(0).alias("seq"), F.lit(0).alias("ts_ms"))

    first = docs.filter(F.col("doc_id") < 60)
    t.merge(ops(first, "I", 1_000), epoch_id=1)
    t = t.refresh()
    v1 = t.version
    idx = str(tmp_path / "mh")
    minhash_index_build(t.read().select("doc_id", "text"), idx, bands=8)

    upd = first.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id", F.concat("text", F.lit(" mutated tail")).alias("text"))
    ins = docs.filter(F.col("doc_id") >= 60)
    dels = first.filter(F.col("doc_id") % 6 == 1).select(
        "doc_id", F.lit(None).cast("string").alias("text"))
    t.merge(ops(upd, "U", 10_000).unionByName(ops(ins, "I", 20_000))
            .unionByName(ops(dels, "D", 30_000)), epoch_id=2)
    t = t.refresh()

    stats = minhash_index_upsert(spark, idx, t.changes(v1), bands=8)
    assert stats["deletes"] == first.filter(F.col("doc_id") % 6 == 1).count()
    assert stats["version"] == 2

    final = t.read().select("doc_id", "text")
    want = _minhash_index_rows(final, "doc_id", "text", 3, 8, 64)
    got = index_read(spark, idx).select("doc_id", "band", "band_hash", "_bk")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # idempotent: same window again -> same rows, bumped version
    minhash_index_upsert(spark, idx, t.changes(v1), bands=8)
    got2 = index_read(spark, idx).select("doc_id", "band", "band_hash", "_bk")
    assert got2.exceptAll(want).count() == 0
    assert want.exceptAll(got2).count() == 0

    # probe: planted exact dup is found + verified; novel doc is not
    src = final.orderBy("doc_id").limit(1)
    src_id = src.head()["doc_id"]
    batch = src.select((F.col("doc_id") + 10_000).alias("doc_id"), "text") \
        .unionByName(spark.createDataFrame(
            [(20_000, "totally novel words qqq www eee rrr ttt yyy uuu")],
            "doc_id long, text string"))
    # config guard (r5 review): a mismatched hash family fails loudly
    # instead of silently corrupting the index / colliding with nothing
    import pytest as _pt
    with _pt.raises(ValueError, match="built with"):
        minhash_index_upsert(spark, idx, t.changes(v1), bands=16)
    with _pt.raises(ValueError, match="built with"):
        minhash_index_candidates(spark, idx, final.limit(1), bands=16)

    ver = minhash_index_candidates(spark, idx, batch, corpus_docs=final,
                                   threshold=0.8, bands=8).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in ver}
    # the planted copy is found (the corpus has its own exact dups of
    # src_id's text, so other >=0.8 pairs with the copy are legitimate)
    assert (src_id, src_id + 10_000) in pairs
    # every verified pair involves the planted copy; the novel doc
    # (20000) near-duplicates nothing
    assert all(b == src_id + 10_000 for _, b in pairs)

    # ADVICE r5 fix: the empty-batch candidate relation carries the
    # CALLER's id type (was hardcoded long — a string-keyed caller got
    # a wrong-typed empty relation that broke downstream unionByName)
    empty = spark.createDataFrame([], "doc_id string, text string")
    out = minhash_index_candidates(spark, idx, empty, bands=8)
    assert out.schema["id_a"].dataType.simpleString() == "string"
    strs = spark.createDataFrame([("a", "b")], "id_a string, id_b string")
    assert strs.unionByName(out).count() == 1


def test_minhash_index_upsert_cost_tracks_changes_not_corpus(spark, tmp_path):
    """r5 scale property, structurally asserted (no timing): the same
    change window against a 4x larger corpus rewrites the SAME bucket
    partitions — upsert cost is O(changed docs x bands), not O(corpus).
    Also: a dangling staged version directory left by a crash mid-stage
    is repaired (removed and restaged) by the next upsert."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from database_delta_plugins_spark.lake.table import LakeTable
    from database_delta_plugins_spark.operators.dedup import (
        _minhash_index_rows,
        minhash_index_build,
        minhash_index_upsert,
    )
    from database_delta_plugins_spark.operators.similarity import index_read

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True)])

    def ops(df, op, lsn0):
        return df.select(
            "doc_id", "text", F.lit(op).alias("op_type"),
            (F.lit(lsn0) + F.col("doc_id")).alias("lsn"),
            F.lit(0).alias("seq"), F.lit(0).alias("ts_ms"))

    # identical change window (2 docs mutated) on a 100-doc and a
    # 400-doc corpus
    win = docs.filter(F.col("doc_id").isin([3, 7])).select(
        "doc_id", F.concat("text", F.lit(" tail")).alias("text"))
    stats_by_size = {}
    for size in (100, 400):
        base = docs.filter(F.col("doc_id") < size)
        t = LakeTable.create(spark, str(tmp_path / f"t{size}"), schema,
                             key="doc_id", num_buckets=2, write_mode="mor")
        t.merge(ops(base, "I", 1_000), epoch_id=1)
        t = t.refresh()
        v1 = t.version
        idx = str(tmp_path / f"mh{size}")
        minhash_index_build(t.read().select("doc_id", "text"), idx, bands=8)
        t.merge(ops(win, "U", 10_000), epoch_id=2)
        t = t.refresh()
        stats_by_size[size] = (
            minhash_index_upsert(spark, idx, t.changes(v1), bands=8), idx, t)

    s100, s400 = stats_by_size[100][0], stats_by_size[400][0]
    # same changed docs -> same band rows -> same touched buckets,
    # regardless of corpus size (<= 2 docs x 8 bands x 2 = 32 buckets)
    assert s100["partitions_rewritten"] == s400["partitions_rewritten"]
    assert s100["upserts"] == s400["upserts"] == 2
    assert s400["partitions_rewritten"] <= 32

    # crash repair: plant a dangling staged _v3 with junk, re-upsert
    _, idx400, t400 = stats_by_size[400]
    dangling = os.path.join(idx400, "_v3")
    os.makedirs(os.path.join(dangling, "_bk=999"))
    with open(os.path.join(dangling, "_bk=999", "junk"), "w") as f:
        f.write("crash leftover")
    minhash_index_upsert(spark, idx400, t400.changes(1), bands=8)
    final = t400.read().select("doc_id", "text")
    want = _minhash_index_rows(final, "doc_id", "text", 3, 8, 64)
    got = index_read(spark, idx400).select(
        "doc_id", "band", "band_hash", "_bk")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_mixture_rates_budget_and_waterfilling(spark):
    """r5: the token-budget mixture planner — expected contribution per
    source ~ budget * weight in the unsaturated case; a source too
    small for its share saturates at rate 1.0 and the shortfall
    redistributes over the rest by renormalized weight; absent sources
    are excluded; unknown targets fail loudly."""
    import pytest as _pt

    from database_delta_plugins_spark.operators.dedup import (
        mixture_rates,
        sample_by_source,
    )

    # srcA: 1000 tokens, srcB: 1000, srcC (tiny): 10, srcD: untargeted
    rows = []
    did = 0
    for src, ndoc, tok in [("srcA", 100, 10), ("srcB", 100, 10),
                           ("srcC", 1, 10), ("srcD", 5, 10)]:
        for _ in range(ndoc):
            rows.append((did, src, " ".join(["w"] * tok)))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    # unsaturated: budget 400, weights .5/.25/.25 -> rates .2/.1/10.0?
    # srcC's share is 100 tokens but it only has 10 -> saturates at 1.0,
    # shortfall (90) redistributes .5/.25 renormalized over A/B
    rates, audit = mixture_rates(
        df, {"srcA": 0.5, "srcB": 0.25, "srcC": 0.25}, 400)
    assert rates["srcC"] == 1.0 and audit["saturated"] == ["srcC"]
    assert rates["srcD"] == 0.0
    # remaining 390 split 2:1 -> A 260/1000, B 130/1000
    assert abs(rates["srcA"] - 0.26) < 1e-12
    assert abs(rates["srcB"] - 0.13) < 1e-12
    assert audit["planned_tokens"]["srcC"] == 10
    # the sample respects exclusions and keeps all of the saturated src
    got = sample_by_source(df, rates, default_rate=0.0)
    assert got.filter("source = 'srcD'").count() == 0
    assert got.filter("source = 'srcC'").count() == 1

    # no saturation: exact (budget * w) / toks
    r2, a2 = mixture_rates(df, {"srcA": 0.5, "srcB": 0.5}, 200)
    assert r2["srcA"] == (200 * 0.5) / 1000 and r2["srcB"] == 0.1
    assert a2["saturated"] == []

    with _pt.raises(ValueError, match="absent sources"):
        mixture_rates(df, {"srcZ": 1.0}, 100)


def test_cc_paths_agree_on_random_graphs(spark):
    """r5 property: on seeded random graphs, the driver union-find fast
    path and the distributed pointer-jumping loop both equal an
    independent BFS oracle (min reachable id labels every node) —
    the two-path split can never diverge silently."""
    import random
    from collections import defaultdict, deque

    from database_delta_plugins_spark.operators.dedup import (
        connected_components,
    )

    for trial in range(4):
        rng = random.Random(7 + trial)
        n = rng.randint(3, 40)
        edges = [(rng.randrange(n), rng.randrange(n))
                 for _ in range(rng.randint(2, 80))]
        edges = [(a, b) for a, b in edges if a != b] or [(0, 1)]

        adj = defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        oracle, seen = {}, set()
        for start in sorted(adj):
            if start in seen:
                continue
            q, comp = deque([start]), [start]
            seen.add(start)
            while q:
                u = q.popleft()
                for v in adj[u]:
                    if v not in seen:
                        seen.add(v)
                        comp.append(v)
                        q.append(v)
            m = min(comp)
            for u in comp:
                oracle[u] = m

        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        drv = {r["node"]: r["comp"]
               for r in connected_components(pairs).collect()}
        dist = {r["node"]: r["comp"]
                for r in connected_components(
                    pairs, driver_max_edges=0).collect()}
        assert drv == oracle, f"driver path diverged (trial {trial})"
        assert dist == oracle, f"distributed path diverged (trial {trial})"
