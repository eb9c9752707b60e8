"""Phase-level timing of the heavy headline queries (r6 measurement,
guide §1.4: noop-sink isolation). Times each sub-stage of simhash /
minhash_lsh / ngram_jaccard / training_corpus / cdc_merge_upsert /
cdc_mor_deep_read so optimization targets the real cost, not a guess.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from pyspark.sql import functions as F  # noqa: E402


def noop(df, label):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"  {label}: {dt:.2f}s")
    return dt


def main():
    import __spark_entry__ as em
    from database_delta_plugins_spark.operators import dedup as dd
    from database_delta_plugins_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", app_name="profile-r06",
                      shuffle_partitions=CPUS)
    em.queries()["cdc_apply_lww"](spark, SF_DIR).count()
    em.queries()["dedup_exact"](spark, SF_DIR).count()

    which = set(sys.argv[1:]) or {"simhash", "minhash", "ngram", "tc",
                                  "merge", "deep"}
    docs = em._docs(spark, SF_DIR)

    if "simhash" in which:
        print("== simhash phases ==")
        fp = docs.select(F.col("doc_id").alias("id"),
                         dd.simhash64_arrow(F.col("text")).alias("fp"))
        noop(fp, "fingerprint kernel (arrow)")
        cand = dd.simhash_candidates(docs, max_hamming=7, max_bucket=200,
                                     n_chunks=8)
        noop(cand, "candidates e2e (fp + cap + join + dedup + ham)")
        t0 = time.time()
        em.queries()["simhash"](spark, SF_DIR).count()
        print(f"  full simhash query: {time.time() - t0:.2f}s")

    if "minhash" in which:
        print("== minhash phases ==")
        base = dd._shingle_base(docs, "doc_id", "text", 3)
        noop(base, "shingle base (arrow)")
        sigs = dd.minhash_signature_arrow(base)
        noop(sigs.select("id", "minhash"), "shingles + signature kernel")
        t0 = time.time()
        em.queries()["minhash_lsh"](spark, SF_DIR).count()
        print(f"  full minhash query: {time.time() - t0:.2f}s")

    if "ngram" in which:
        print("== ngram_jaccard phases ==")
        base = dd._shingle_base(docs, "doc_id", "text", 3)
        noop(base.select("id", F.explode("shingles").alias("sh")),
             "shingle base + explode")
        t0 = time.time()
        em.queries()["ngram_jaccard"](spark, SF_DIR).count()
        print(f"  full ngram query: {time.time() - t0:.2f}s")

    if "tc" in which:
        print("== training_corpus phases ==")
        t0 = time.time()
        d, feats = em._doc_features(spark, SF_DIR)
        feats.count()
        print(f"  doc_features materialize: {time.time() - t0:.2f}s")
        t0 = time.time()
        dd.ngram_jaccard_pairs(d, threshold=0.05).count()
        print(f"  ngram pairs over d: {time.time() - t0:.2f}s")
        t0 = time.time()
        em.queries()["dedup_clusters"](spark, SF_DIR).count()
        print(f"  dedup_clusters query: {time.time() - t0:.2f}s")
        t0 = time.time()
        bench = d.filter(F.col("doc_id") < 20)
        corpus = d.filter(F.col("doc_id") >= 20)
        dd.decontaminate(corpus, bench, n=5).count()
        print(f"  decontaminate: {time.time() - t0:.2f}s")
        t0 = time.time()
        em.queries()["training_corpus"](spark, SF_DIR).count()
        print(f"  full training_corpus: {time.time() - t0:.2f}s")
        t0 = time.time()
        em.queries()["corpus_select"](spark, SF_DIR).count()
        print(f"  corpus_select: {time.time() - t0:.2f}s")

    if "merge" in which:
        print("== cdc_merge_upsert phases ==")
        from database_delta_plugins_spark.operators import decode
        from database_delta_plugins_spark.sources.generator import cdc_events_df
        ev = cdc_events_df(spark, SF_DIR)
        upd = decode.map_opcode(ev).select(
            "url", "warc_ts", F.col("after_text").alias("text"), "lang",
            "op_type", "lsn", "seq")
        noop(upd, "event gen + decode (one pass)")
        t0 = time.time()
        em.queries()["cdc_merge_upsert"](spark, SF_DIR).count()
        print(f"  full cdc_merge_upsert: {time.time() - t0:.2f}s")

    if "deep" in which:
        print("== cdc_mor_deep_read ==")
        t0 = time.time()
        em.queries()["cdc_mor_deep_read"](spark, SF_DIR).count()
        print(f"  full cdc_mor_deep_read: {time.time() - t0:.2f}s")

    spark.stop()


if __name__ == "__main__":
    main()
