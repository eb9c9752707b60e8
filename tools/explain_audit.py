"""Plan-quality audit: captures .explain('formatted') for the hot paths
and checks the properties that matter at 100 TB — filter/column pushdown
reaching the parquet scan, whole-stage codegen coverage, no cartesian
products, broadcast where expected. Writes EXPLAIN.md."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from database_delta_plugins_spark.session import get_spark
from database_delta_plugins_spark.operators import decode
from database_delta_plugins_spark.operators.lww import lww_reduce_salted
from database_delta_plugins_spark.operators.dedup import minhash_lsh_pairs
from database_delta_plugins_spark.sources.generator import cdc_events_df

SF = "/root/testdata/sf0.01"
REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    sections = []
    checks = []

    # 1. decode + replay filter over a parquet event log: the lsn filter
    # and column pruning must reach the scan.
    log = "/tmp/audit_log"
    ev = cdc_events_df(spark, SF)
    ev.write.mode("overwrite").parquet(log)
    raw = spark.read.parquet(log)
    q1 = decode.filter_replayed(raw, 2000).select("url", "lsn")
    p1 = plan_of(q1)
    sections.append(("decode: replay filter + projection pushdown", q1, p1))
    checks.append(("lsn filter pushed to scan", "PushedFilters: [IsNotNull(lsn), GreaterThan(lsn," in p1))
    checks.append(("column pruning (ReadSchema only url,lsn)",
                   bool(re.search(r"ReadSchema:.*struct<lsn:bigint,url:string>", p1))))

    # 2. salted LWW reduce: two hash aggregates with partial combine; no sort.
    q2 = lww_reduce_salted(
        raw.select("url", "lsn", "seq", "after_text"), key="url")
    p2 = plan_of(q2)
    sections.append(("salted two-stage LWW reduce", q2, p2))
    checks.append(("partial aggregation (map-side combine)", "partial_max_by" in p2 or "HashAggregate" in p2))
    checks.append(("no global sort in LWW path", "Sort [" not in p2 or "SortAggregate" not in p2))
    # formatted explain marks codegen'd operators with a '*' prefix.
    # NOTE: max_by/max(struct) aggregates fall back to SortAggregate
    # (struct has no mutable hash-agg buffer); that is why the merge path
    # uses lww_reduce_late — the sort-based agg only ever sees 24-byte
    # (key,lsn,seq) rows, never the payload.
    checks.append(("whole-stage codegen present", "* Project" in p1 or "* Filter" in p1))

    # 3. minhash LSH: band join must be a hash/sortmerge join on band keys,
    # never a cartesian product.
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q3 = minhash_lsh_pairs(docs, threshold=0.8)
    p3 = plan_of(q3)
    sections.append(("minhash LSH band join", q3, p3))
    checks.append(("no cartesian product in LSH join", "CartesianProduct" not in p3))

    # 4. broadcast: small dim side should broadcast automatically.
    small = spark.createDataFrame([("en",), ("de",)], ["lang"])
    q4 = docs.join(small, "lang")
    p4 = plan_of(q4)
    sections.append(("small-side broadcast join", q4, p4))
    checks.append(("broadcast hash join chosen", "BroadcastHashJoin" in p4))

    # 5. the STREAMING APPLY path (rich nested log): before-image pruning
    # must drop before.html/text from the scan; the LWW winner join must
    # be a broadcast; the pandas UDF (ArrowEvalPython) must evaluate on
    # the post-join winner rows, not the full batch.
    from database_delta_plugins_spark.functions.udfs import extract_text
    from database_delta_plugins_spark.operators.lww import lww_reduce_late
    from database_delta_plugins_spark.sources.generator import rich_events_df

    rlog = "/tmp/audit_richlog"
    rich_events_df(spark, SF, revs=3, with_html=True).write.mode("overwrite").parquet(rlog)
    rraw = spark.read.parquet(rlog)
    d5 = decode.decode_events(rraw, before_key_only="url")
    w5 = lww_reduce_late(d5, key="url")
    q5 = w5.withColumn("text", extract_text(F.col("html")))
    p5 = plan_of(q5)
    sections.append(("apply path: pruned decode -> late LWW -> winner-only UDF", q5, p5))
    checks.append(("before image pruned to key (no before.html in ReadSchema)",
                   "before:struct<url:string>" in p5.replace(" ", "")
                   or not re.search(r"before:struct<[^>]*html", p5)))
    checks.append(("LWW winner join is broadcast", "BroadcastHashJoin" in p5))
    checks.append(("pandas UDF after the winner join (ArrowEvalPython above BroadcastHashJoin)",
                   "ArrowEvalPython" in p5
                   and p5.index("ArrowEvalPython") < p5.index("BroadcastHashJoin")))
    # formatted explain lists operators top-down: the UDF node printing
    # BEFORE the join node means it consumes the join's output.

    # 6. IVF query path: cell filter must prune before the cosine scan.
    from database_delta_plugins_spark.operators.similarity import ivf_build

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double")))
    assigned, cents = ivf_build(emb, n_cells=8)
    q6 = assigned.filter(F.col("_cell").isin([0, 1]))
    p6 = plan_of(q6)
    sections.append(("IVF query: cell pruning filter", q6, p6))
    checks.append(("IVF query fits no KMeans (no MLlib stage)",
                   "KMeans" not in p6 and "TreeAggregate" not in p6))

    # 7. "sort" LWW merge shape: ONE payload exchange total (the bucket
    # repartition), winner selection + dedup riding it as Window+Sort.
    from pyspark.sql.window import Window

    d7 = decode.decode_events(rraw, before_key_only="url").filter(
        F.col("op_type").isNotNull())
    d7 = d7.withColumn("_bucket", F.pmod(F.xxhash64("url"), F.lit(8)).cast("int"))
    d7 = d7.repartition(8, "_bucket")
    w7 = Window.partitionBy("_bucket").orderBy(F.col("url"), F.desc("lsn"), F.desc("seq"))
    prev7 = F.lag(F.col("url")).over(w7)
    q7 = d7.withColumn("_k", prev7.isNull() | (prev7 != F.col("url"))).filter("_k").drop("_k")
    p7 = plan_of(q7)
    sections.append(("sort-strategy merge: single exchange + window LWW", q7, p7))
    checks.append(("sort LWW: exactly one Exchange (window reuses the bucket repartition)",
                   p7.count("Exchange") - p7.count("ReusedExchange") * 2 == 1
                   or len(re.findall(r"\(\d+\) Exchange", p7)) == 1))

    # 8. connected-components iteration: label pull joins shuffle ONLY
    # narrow (node, comp) longs — no payload columns in the exchanges.
    from database_delta_plugins_spark.operators.dedup import connected_components

    pairs8 = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a: long, id_b: long")
    e8 = pairs8.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges8 = e8.unionByName(e8.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels8 = edges8.select(F.col("src").alias("node")).dropDuplicates(["node"]) \
        .withColumn("comp", F.col("node"))
    q8 = edges8.join(labels8, edges8.dst == labels8.node) \
        .groupBy("src").agg(F.min("comp").alias("n_comp"))
    p8 = plan_of(q8)
    sections.append(("connected-components label pull (one iteration)", q8, p8))
    checks.append(("components iteration shuffles narrow longs only",
                   not re.search(r"Exchange hashpartitioning[^\n]*(text|html)", p8)))

    # 9. mor scan late-materialized resolve: with a multi-segment stack,
    # payload never enters the reduce exchange — every Exchange carries
    # only narrow (key,_lsn,_seq); resolve joins are broadcast.
    import shutil as _sh
    import tempfile as _tf

    from pyspark.sql import types as T

    from database_delta_plugins_spark.lake.table import LakeTable

    mordir = _tf.mkdtemp(prefix="audit_mor_")
    _sh.rmtree(mordir)
    mschema = T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
    ])
    mt = LakeTable.create(spark, mordir, mschema, key="url", num_buckets=4,
                          write_mode="mor")
    mupd = T.StructType(list(mschema.fields) + [
        T.StructField("op_type", T.StringType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("seq", T.LongType(), False)])
    for e, rows in enumerate([
            [("a", "v1", "I", 1, 0), ("b", "w1", "I", 2, 0)],
            [("a", "v2", "U", 3, 0)],
            [("b", None, "D", 4, 0)]]):
        mt.merge(spark.createDataFrame(rows, mupd), epoch_id=e + 1,
                 lww_strategy="sort")
        mt = mt.refresh()
    q9 = mt.scan()
    p9 = plan_of(q9)
    lines9 = p9.splitlines()
    exch9 = []
    for i, ln in enumerate(lines9):
        if re.match(r"\(\d+\) (Broadcast)?Exchange", ln.strip()):
            for j in range(i + 1, min(i + 5, len(lines9))):
                if lines9[j].strip().startswith("Input"):
                    exch9.append(lines9[j])
                    break
    sections.append(("mor scan: late-materialized LWW resolve", q9, p9))
    checks.append(("mor scan: payload never enters the reduce exchange",
                   bool(exch9) and not any("text#" in ln for ln in exch9)))
    checks.append(("mor scan: resolve joins are broadcast",
                   "BroadcastHashJoin" in p9))
    _sh.rmtree(mordir, ignore_errors=True)

    # 10. cow merge: untouched target rows ride a broadcast ANTI join
    # (map-side) — only touched rows meet the updates in the merge join.
    cowdir = _tf.mkdtemp(prefix="audit_cow_")
    _sh.rmtree(cowdir)
    ct = LakeTable.create(spark, cowdir, mschema, key="url", num_buckets=4)
    ct.merge(spark.createDataFrame(
        [(f"k{i}", f"v{i}", "I", i + 1, 0) for i in range(20)], mupd),
        epoch_id=1)
    ct = ct.refresh()
    upd10 = spark.createDataFrame(
        [("k0", "V0", "U", 100, 0)], mupd).select(
        "url", "text",
        F.col("lsn").alias("_u_lsn"), F.col("seq").alias("_u_seq"),
        (F.col("op_type") == "D").alias("_u_deleted"),
        F.lit(None).cast("long").alias("_u_ingest_ms"),
    ).withColumn("_bucket", ct.bucket_expr(F.col("url")))
    q10 = ct._cow_merge_result(
        upd10, ct.scan().withColumnRenamed("url", "_t_key"),
        "url", ["url", "text"], broadcast_keys=True)
    p10 = plan_of(q10)
    sections.append(("cow merge: broadcast-anti untouched rows", q10, p10))
    checks.append(("cow merge: untouched rows broadcast-anti (no join shuffle)",
                   "BroadcastHashJoin" in p10 and "LeftAnti" in p10))
    _sh.rmtree(cowdir, ignore_errors=True)

    # 11. C4 line dedup (r4 directive #5): the corpus-wide frequency agg
    # and the join back must key their exchanges on xxhash64(line)
    # (8 B), never on the raw line string.
    from database_delta_plugins_spark.operators.text import (
        remove_boilerplate_lines,
    )

    q11 = remove_boilerplate_lines(docs.select("doc_id", "text"))
    p11 = plan_of(q11)
    # formatted explain puts partitioning on an Arguments: line; grab the
    # first key of every hashpartitioning spec
    det11 = re.findall(r"hashpartitioning\(([A-Za-z0-9_]+#)", p11)
    sections.append(("C4 line dedup: hashed line key in exchanges", q11, p11))
    checks.append(("line-dedup exchanges key on _lh hash, not the line string",
                   bool(det11) and not any(k.startswith("line#") for k in det11)
                   and any(k.startswith("_lh#") for k in det11)))
    # sanity: the regex actually saw partitioning specs
    assert det11, "explain format changed: no hashpartitioning specs parsed"

    # 12. sequence packing (r5): the greedy fold is one JVM-side
    # F.aggregate over a per-doc regroup — exactly ONE exchange, and no
    # Python evaluator anywhere in the plan.
    from database_delta_plugins_spark.operators.text import (
        chunk_documents,
        pack_sequences,
    )

    q12 = pack_sequences(chunk_documents(docs.select("doc_id", "text"),
                                         chunk_tokens=16, overlap=8),
                         capacity=40)
    p12 = plan_of(q12)
    sections.append(("sequence packing: one regroup exchange, no Python",
                     q12, p12))
    # formatted explain names each node once in the detail section as
    # "(N) Exchange" — count those, not raw substring hits (every node
    # also appears in the tree rendering)
    checks.append(("pack_sequences: exactly one Exchange, zero Python stages",
                   len(re.findall(r"\(\d+\) Exchange", p12)) == 1
                   and "EvalPython" not in p12))

    # 13. repetition stats (r5): every exchange is keyed by doc_id first
    # (doc-parallel at any corpus size) and aggregation is partial
    # (map-side combine) — nothing corpus-global.
    from database_delta_plugins_spark.operators.text import repetition_stats

    q13 = repetition_stats(docs.select("doc_id", "text"))
    p13 = plan_of(q13)
    det13 = re.findall(r"hashpartitioning\(([A-Za-z0-9_]+#)", p13)
    sections.append(("repetition stats: doc-keyed exchanges", q13, p13))
    checks.append(("repetition_stats: all exchanges keyed by doc_id, partial agg",
                   bool(det13)
                   and all(k.startswith("doc_id#") for k in det13)
                   and "partial_count" in p13))

    # 14. minhash index probe (r5): the persisted-index scan must carry a
    # STATIC PartitionFilters prune on _bk (the probe batch's bucket
    # list), and the (band, band_hash) narrowing must be broadcast —
    # the probe reads touched buckets, never the corpus index.
    import tempfile as _tf

    from database_delta_plugins_spark.operators.dedup import (
        minhash_index_build,
        minhash_index_candidates,
    )

    mhdir = _tf.mkdtemp(prefix="audit_mhidx_")
    _sh.rmtree(mhdir)
    minhash_index_build(docs.select("doc_id", "text").limit(200), mhdir,
                        bands=8)
    batch = docs.select("doc_id", "text").limit(3).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text")
    q14 = minhash_index_candidates(spark, mhdir, batch, bands=8)
    p14 = plan_of(q14)
    sections.append(("minhash index probe: static _bk partition prune",
                     q14, p14))
    checks.append(("index probe: PartitionFilters prune on _bk + broadcast semi",
                   bool(re.search(r"PartitionFilters: \[[^\]]*_bk", p14))
                   and "BroadcastHashJoin" in p14))
    _sh.rmtree(mhdir, ignore_errors=True)

    with open(_os.path.join(REPO, "EXPLAIN.md"), "w") as f:
        f.write("# EXPLAIN audit — hot-path physical plans\n\n")
        f.write("Checks:\n\n")
        for name, ok in checks:
            f.write(f"- [{'x' if ok else ' '}] {name}\n")
        for title, _df, plan in sections:
            f.write(f"\n## {title}\n\n```\n{plan}\n```\n")

    print("CHECKS:")
    bad = 0
    for name, ok in checks:
        print(("PASS " if ok else "FAIL ") + name)
        bad += (not ok)
    spark.stop()
    _sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
