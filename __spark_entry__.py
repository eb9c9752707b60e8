"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an implemented operator from SURVEY.md §2
(CDC dataflow stages) or a driver-mandated training-data-pipeline op;
``oracle_sql()`` carries the DuckDB-equivalent SQL run side-by-side at
sf=0.01. Streaming-only semantics (exactly-once fencing, restart
replay-equivalence, DDL-before-DML ordering) are covered by
``tests/`` (python -m pytest -x -q) — they are not batch-SQL-expressible.

The synthetic CDC change-event log is derived *deterministically* from
the driver-provided documents table (sources/generator.py) with the
identical relation expressed in DuckDB SQL, so Spark engine results and
oracle results are compared over the same input with no side channels.
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from database_delta_plugins_spark.operators import decode
from database_delta_plugins_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_candidates,
)
from database_delta_plugins_spark.operators.lww import lww_reduce_salted
from database_delta_plugins_spark.operators.multimodal import decode_media, synth_media_df
from database_delta_plugins_spark.operators.similarity import (
    cosine_neardup_pairs,
    cosine_topk,
    ivf_topk,
    lsh_bucket_topk,
)
from database_delta_plugins_spark.operators.text import (
    LANG_MARKERS,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from database_delta_plugins_spark.sources.generator import (
    cdc_events_df,
    cdc_events_duckdb_sql,
)

_CDC = cdc_events_duckdb_sql()
_FLAT_COLS = ["url", "warc_ts", "after_text", "lang", "op", "lsn", "seq"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")


# ---------------------------------------------------------------- CDC core

def q_cdc_apply_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: final visible table state after LWW apply of the change
    log — salted two-stage reduce (A2), delete suppression (A1)."""
    ev = cdc_events_df(spark, sf_dir).select(*_FLAT_COLS)
    w = lww_reduce_salted(ev, key="url")
    return (
        w.filter(F.col("op") != "d")
        .select(
            "url", "warc_ts",
            F.col("after_text").alias("text"),
            "lang",
            F.col("lsn").alias("last_lsn"),
        )
    )


def q_cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A3 through the REAL engine: two-epoch key-bucketed
    copy-on-write MERGE into a LakeTable, then read back final state.
    Incremental apply must equal the one-shot LWW oracle."""
    from pyspark.sql import types as T

    from database_delta_plugins_spark.lake.table import LakeTable

    ev = cdc_events_df(spark, sf_dir)
    upd = decode.map_opcode(ev).select(
        "url", "warc_ts", F.col("after_text").alias("text"), "lang",
        "op_type", "lsn", "seq",
    )
    schema = T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ])
    tmp = tempfile.mkdtemp(prefix="lake_q_")
    shutil.rmtree(tmp)
    t = LakeTable.create(spark, tmp, schema, key="url", num_buckets=8)
    mid = upd.agg(F.expr("percentile_approx(lsn, 0.5)")).collect()[0][0]
    t.merge(upd.filter(F.col("lsn") <= mid), epoch_id=1)
    t = t.refresh()
    t.merge(upd.filter(F.col("lsn") > mid), epoch_id=2)
    t = t.refresh()
    return (
        t.scan()
        .filter(~F.col("_is_deleted"))
        .select("url", "warc_ts", "text", "lang", F.col("_lsn").alias("last_lsn"))
    )


def q_d2_opcode_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = cdc_events_df(spark, sf_dir)
    return decode.map_opcode(ev).groupBy("op_type").agg(F.count(F.lit(1)).alias("n"))


def q_d3_row_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = cdc_events_df(spark, sf_dir)
    return ev.select(
        "url", "lsn",
        F.coalesce(F.col("after_text"), F.col("before_text")).alias("row_text"),
    )


def q_d7_dml_blacklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = decode.map_opcode(cdc_events_df(spark, sf_dir))
    out = decode.filter_dml_blacklist(ev, {"D"})
    return out.groupBy("op_type").agg(F.count(F.lit(1)).alias("n"))


def q_d9_txn_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = cdc_events_df(spark, sf_dir)
    return decode.synth_txn_id(ev).select("url", "lsn", "txn_id")


def q_d11_replay_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = decode.filter_replayed(cdc_events_df(spark, sf_dir), last_committed_lsn=2000)
    return ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("lsn").alias("min_lsn"),
        F.max("lsn").alias("max_lsn"),
    )


def q_d12_snapshot_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = cdc_events_df(spark, sf_dir)
    return ev.groupBy("is_snapshot").agg(F.count(F.lit(1)).alias("n"))


def q_s1_snapshot_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = cdc_events_df(spark, sf_dir)
    return ev.filter(F.col("op") == "r").select("url", F.col("after_text").alias("text"))


# ------------------------------------------------------- stream analytics

def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    ns = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        e.withColumn("_ns", ns)
        .groupBy("user_id")
        .agg(
            F.sum("_ns").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# -------------------------------------------------- training-data pipeline

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(_docs(spark, sf_dir))


def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = token_count(_docs(spark, sf_dir))
    return d.select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"))


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = quality_score(_docs(spark, sf_dir))
    return d.select(
        "doc_id", "n_chars", "n_tokens",
        F.round("alpha_ratio", 4).alias("alpha_ratio"),
        F.round("mean_word_len", 4).alias("mean_word_len"),
        F.round("quality", 4).alias("quality"),
    )


def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(_docs(spark, sf_dir)).select("doc_id", "lang_pred")


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(_docs(spark, sf_dir)).select("doc_id", "fp")


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.05)


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.3)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_candidates(_docs(spark, sf_dir), max_hamming=6)


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    dbl = emb.withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
    qv = [float(x) for x in dbl.filter(F.col("vec_id") == 0).head()["embedding"]]
    out = cosine_topk(dbl, qv, k=10)
    return out.select("vec_id", F.round("cos_sim", 4).alias("cos_sim"))


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    dbl = emb.withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
    qv = [float(x) for x in dbl.filter(F.col("vec_id") == 0).head()["embedding"]]
    return lsh_bucket_topk(dbl, qv, k=10, bits=6)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    dbl = emb.withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
    qv = [float(x) for x in dbl.filter(F.col("vec_id") == 0).head()["embedding"]]
    return ivf_topk(dbl, qv, k=10, n_cells=8, nprobe=3)


def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    dbl = emb.withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
    dim = len(dbl.head()["embedding"])
    return cosine_neardup_pairs(dbl, dim=dim, threshold=0.5, bits=6)


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media_df(spark, n=200)
    return decode_media(media, fake=True)


def q_extract_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-identity invariant: extract_text(synth_html(text)) == text.
    Returns violations — must be empty (rows-only check + pytest)."""
    from database_delta_plugins_spark.functions.udfs import extract_text, synth_html

    d = _docs(spark, sf_dir).select("doc_id", "text", "lang")
    rt = d.withColumn("rt", extract_text(synth_html(F.col("text"), F.col("lang"))))
    return rt.filter(~(F.col("rt").eqNullSafe(F.col("text")))).select("doc_id", "text", "rt")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: real-engine CDC apply (merge upsert)."""
    return q_cdc_merge_upsert(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cdc_apply_lww": q_cdc_apply_lww,
        "cdc_merge_upsert": q_cdc_merge_upsert,
        "d2_opcode_map": q_d2_opcode_map,
        "d3_row_image": q_d3_row_image,
        "d7_dml_blacklist": q_d7_dml_blacklist,
        "d9_txn_id": q_d9_txn_id,
        "d11_replay_filter": q_d11_replay_filter,
        "d12_snapshot_flag": q_d12_snapshot_flag,
        "s1_snapshot_read": q_s1_snapshot_read,
        "events_hourly": q_events_hourly,
        "events_sessions": q_events_sessions,
        "dedup_exact": q_dedup_exact,
        "text_token_count": q_text_token_count,
        "text_quality": q_text_quality,
        "text_lang_id": q_text_lang_id,
        "text_fingerprint": q_text_fingerprint,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_lsh": q_minhash_lsh,
        "simhash": q_simhash,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "embed_neardup": q_embed_neardup,
        "multimodal_decode": q_multimodal_decode,
        "extract_text_roundtrip": q_extract_text_roundtrip,
    }


def _lang_hits_sql(padded: str, words: list[str]) -> str:
    return " + ".join(
        f"(len(string_split({padded}, ' {w} ')) - 1)" for w in words
    )


def _lang_case_sql() -> str:
    padded = "(' ' || lower(text) || ' ')"
    branches = "\n".join(
        f"WHEN {_lang_hits_sql(padded, words)} >= 2 THEN '{lang}'"
        for lang, words in LANG_MARKERS
    )
    return f"CASE {branches} ELSE 'und' END"


def oracle_sql() -> dict[str, str]:
    lww = f"""
      WITH cdc_events AS ({_CDC}),
      w AS (
        SELECT *, row_number() OVER (PARTITION BY url ORDER BY lsn DESC, seq DESC) rn
        FROM cdc_events
      )
      SELECT url, warc_ts, after_text AS text, lang, lsn AS last_lsn
      FROM w WHERE rn = 1 AND op <> 'd'
    """
    quality = """
      WITH f AS (
        SELECT doc_id,
               length(text)::BIGINT AS n_chars,
               len(regexp_extract_all(text, '[A-Za-z0-9]+'))::BIGINT AS n_tokens,
               length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS alpha_chars
        FROM documents
      ), g AS (
        SELECT doc_id, n_chars, n_tokens,
               CASE WHEN n_chars > 0 THEN alpha_chars / n_chars ELSE 0.0 END AS alpha_ratio,
               CASE WHEN n_tokens > 0 THEN alpha_chars / n_tokens ELSE 0.0 END AS mean_word_len
        FROM f
      )
      SELECT doc_id, n_chars, n_tokens,
             round(alpha_ratio, 4) AS alpha_ratio,
             round(mean_word_len, 4) AS mean_word_len,
             round(least(n_tokens / 50.0, 1.0) * 0.4 + alpha_ratio * 0.4
                   + least(mean_word_len / 8.0, 1.0) * 0.2, 4) AS quality
      FROM g
    """
    jaccard = r"""
      WITH base AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') ws FROM documents
      ),
      tok AS (SELECT doc_id, ws, unnest(range(greatest(len(ws) - 2, 1))) AS i FROM base),
      sh0 AS (
        SELECT doc_id,
               CASE WHEN len(ws) >= 3 THEN ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
                    ELSE array_to_string(ws, ' ') END AS sh
        FROM tok
      ),
      sh AS (SELECT DISTINCT doc_id, sh FROM sh0),
      sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
      shared AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        FROM sh a JOIN sh b USING (sh) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
      )
      SELECT id_a, id_b,
             round(shared / (sa.n_sh + sb.n_sh - shared), 6) AS jaccard
      FROM shared
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE shared / (sa.n_sh + sb.n_sh - shared) >= 0.05
    """
    cosine = """
      WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      ex AS (
        SELECT e.vec_id, unnest(range(len(e.embedding))) AS i, e.embedding AS em
        FROM embeddings e
      ),
      dots AS (
        SELECT ex.vec_id,
               sum(CAST(em[i+1] AS DOUBLE) * CAST(q.qe[i+1] AS DOUBLE)) AS d,
               sum(CAST(em[i+1] AS DOUBLE) * CAST(em[i+1] AS DOUBLE)) AS aa,
               sum(CAST(q.qe[i+1] AS DOUBLE) * CAST(q.qe[i+1] AS DOUBLE)) AS qq
        FROM ex, q GROUP BY ex.vec_id
      )
      SELECT vec_id, round(d / (sqrt(aa) * sqrt(qq)), 4) AS cos_sim
      FROM dots ORDER BY d / (sqrt(aa) * sqrt(qq)) DESC, vec_id LIMIT 10
    """
    return {
        "cdc_apply_lww": lww,
        "cdc_merge_upsert": lww,
        "d2_opcode_map": f"""
          WITH cdc_events AS ({_CDC})
          SELECT CASE WHEN op IN ('c','r') THEN 'I' WHEN op = 'u' THEN 'U' ELSE 'D' END AS op_type,
                 count(*) AS n
          FROM cdc_events GROUP BY 1
        """,
        "d3_row_image": f"""
          WITH cdc_events AS ({_CDC})
          SELECT url, lsn, coalesce(after_text, before_text) AS row_text FROM cdc_events
        """,
        "d7_dml_blacklist": f"""
          WITH cdc_events AS ({_CDC}),
          m AS (SELECT CASE WHEN op IN ('c','r') THEN 'I' WHEN op = 'u' THEN 'U' ELSE 'D' END AS op_type
                FROM cdc_events)
          SELECT op_type, count(*) AS n FROM m WHERE op_type <> 'D' GROUP BY 1
        """,
        "d9_txn_id": f"""
          WITH cdc_events AS ({_CDC})
          SELECT url, lsn,
                 coalesce(gtid, binlog_file || ':' || CAST(binlog_pos AS VARCHAR)) AS txn_id
          FROM cdc_events
        """,
        "d11_replay_filter": f"""
          WITH cdc_events AS ({_CDC})
          SELECT count(*) AS n, min(lsn) AS min_lsn, max(lsn) AS max_lsn
          FROM cdc_events WHERE lsn > 2000
        """,
        "d12_snapshot_flag": f"""
          WITH cdc_events AS ({_CDC})
          SELECT is_snapshot, count(*) AS n FROM cdc_events GROUP BY 1
        """,
        "s1_snapshot_read": f"""
          WITH cdc_events AS ({_CDC})
          SELECT url, after_text AS text FROM cdc_events WHERE op = 'r'
        """,
        "events_hourly": """
          SELECT date_trunc('hour', ts) AS hour, event_type,
                 count(*) AS n, round(sum(value), 4) AS total_value
          FROM events GROUP BY 1, 2
        """,
        "events_sessions": """
          WITH g AS (
            SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
            FROM events
          ),
          s AS (
            SELECT user_id,
                   CASE WHEN pts IS NULL OR epoch(ts - pts) > 1800 THEN 1 ELSE 0 END AS ns
            FROM g
          )
          SELECT user_id, CAST(sum(ns) AS BIGINT) AS n_sessions, count(*) AS n_events
          FROM s GROUP BY user_id
        """,
        "dedup_exact": """
          SELECT md5(lower(trim(text))) AS fp, min(doc_id) AS keep_id, count(*) AS dup_count
          FROM documents GROUP BY 1
        """,
        "text_token_count": """
          SELECT doc_id, len(regexp_extract_all(text, '[A-Za-z0-9]+'))::BIGINT AS n_tokens
          FROM documents
        """,
        "text_quality": quality,
        "text_lang_id": f"SELECT doc_id, {_lang_case_sql()} AS lang_pred FROM documents",
        "text_fingerprint": "SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents",
        "ngram_jaccard": jaccard,
        "ann_cosine_topk": cosine,
        # minhash_lsh / simhash / ann_lsh_topk / embed_neardup /
        # multimodal_decode / extract_text_roundtrip: hash-function- or
        # UDF-dependent -> rows-only check; verified in tests/ against
        # ground truth instead.
    }
