"""Deterministic CDC change-event generators.

The reference's integration tests seed a source table and assert the
exact event sequence the CDC source emits (mysql-delta-plugins/src/test/
java/io/cdap/delta/mysql/MySqlEventReaderIntegrationTest.java:117-245).
We have no live database, so we synthesize the *output* of that stage —
a binlog/WAL-shaped change-event log over Common-Crawl-style web pages —
deterministically from the driver-provided ``documents.parquet``.

Two generators:

1. ``cdc_events_df`` / ``cdc_events_duckdb_sql`` — a *flat* event log
   expressible identically in Spark and DuckDB SQL (pure arithmetic, no
   hashing, no RNG). This is what the driver's correctness gate compares.

2. ``write_event_log`` — the *rich* nested-envelope log (before/after
   structs, binary html payload, optional DDL control events, Zipf-style
   hot-url skew, chunked files) used by the streaming pipeline, replay
   tests and the bench harness. Deterministic: every field is a pure
   function of (doc_id, rev); html is synthesized by a vectorized UDF.

Event envelope mirrors the reference's Debezium record layout
(mysql/MySqlRecordConsumer.java:79-113): op c|u|d|r, before/after row
images, source offset (binlog file/pos or LSN), ts_ms, snapshot flag,
transaction id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_delta_plugins_spark.functions.udfs import make_synth_html

EPOCH_TS = "2024-01-01 00:00:00"
EPOCH_MS = 1704067200000

# Max revisions per doc in the flat (oracle-checked) log: doc_id % 4 -> 1..4
_REV_MOD = 4
_LSN_STRIDE = 8  # lsn = doc_id * stride + rev; stride > max revs


def cdc_events_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat deterministic change-event log derived from documents.parquet.

    One row per (doc, revision). Every column is a pure arithmetic /
    string function of (doc_id, text, lang, source) so an identical
    relation is expressible in DuckDB SQL (see cdc_events_duckdb_sql).

    Columns:
      lsn, seq           — total order (source offset; cf. SqlServerConnection.java:74-79)
      op                 — c|u|d|r (r = snapshot read; MySqlRecordConsumer.java:170-183)
      table_name         — logical source table
      url                — primary key; doc_id % 50 == 0 collapses onto a
                           per-source hot url (skew case)
      warc_ts            — payload event time
      before_text/after_text — row images (D3 semantics: DELETE carries before)
      lang, is_snapshot, ts_ms, binlog_file, binlog_pos, gtid
    """
    docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    revs = spark.range(_REV_MOD).withColumnRenamed("id", "rev")
    e = (
        docs.crossJoin(revs)
        .filter(F.col("rev") <= F.col("doc_id") % _REV_MOD)
        .withColumn("lsn", F.col("doc_id") * _LSN_STRIDE + F.col("rev"))
        .withColumn("seq", F.col("rev"))
        .withColumn("is_last", F.col("rev") == F.col("doc_id") % _REV_MOD)
        .withColumn(
            "op",
            F.when(F.col("rev") == 0, F.when(F.col("doc_id") % 2 == 0, F.lit("r")).otherwise(F.lit("c")))
            .when(F.col("is_last") & (F.col("doc_id") % 7 == 3), F.lit("d"))
            .otherwise(F.lit("u")),
        )
        .withColumn("is_snapshot", (F.col("rev") == 0) & (F.col("doc_id") % 2 == 0))
        .withColumn(
            "url",
            F.concat(
                F.lit("https://"),
                F.col("source"),
                F.lit(".example.com/"),
                F.when(F.col("doc_id") % 50 == 0, F.lit("hot")).otherwise(
                    F.concat(F.lit("doc-"), F.col("doc_id").cast("string"))
                ),
            ),
        )
        .withColumn(
            "warc_ts",
            F.expr(f"timestamp'{EPOCH_TS}' + make_interval(0, 0, 0, 0, 0, 0, lsn)"),
        )
        .withColumn(
            "after_text",
            F.when(F.col("op") == "d", F.lit(None).cast("string"))
            .when(F.col("rev") == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" rev "), F.col("rev").cast("string"))),
        )
        .withColumn(
            "before_text",
            F.when(F.col("rev") == 0, F.lit(None).cast("string"))
            .when(F.col("rev") == 1, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" rev "), (F.col("rev") - 1).cast("string"))),
        )
        .withColumn("ts_ms", F.lit(EPOCH_MS) + F.col("lsn") * 1000)
        .withColumn("binlog_file", F.lit("binlog.000001"))
        .withColumn("binlog_pos", F.col("lsn"))
        .withColumn(
            "gtid",
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit("gtid-src:"), F.col("lsn").cast("string")),
            ).otherwise(F.lit(None).cast("string")),
        )
        .withColumn("table_name", F.lit("pages"))
    )
    return e.select(
        "lsn", "seq", "op", "table_name", "url", "warc_ts",
        "before_text", "after_text", "lang", "is_snapshot", "ts_ms",
        "binlog_file", "binlog_pos", "gtid",
    )


def cdc_events_duckdb_sql() -> str:
    """DuckDB CTE producing the identical relation to cdc_events_df.

    Returns a fragment usable as: ``WITH cdc_events AS (<this>) SELECT …``.
    """
    return f"""
    SELECT
      d.doc_id * {_LSN_STRIDE} + r.rev AS lsn,
      r.rev AS seq,
      CASE
        WHEN r.rev = 0 THEN (CASE WHEN d.doc_id % 2 = 0 THEN 'r' ELSE 'c' END)
        WHEN r.rev = d.doc_id % {_REV_MOD} AND d.doc_id % 7 = 3 THEN 'd'
        ELSE 'u'
      END AS op,
      'pages' AS table_name,
      'https://' || d.source || '.example.com/' ||
        (CASE WHEN d.doc_id % 50 = 0 THEN 'hot' ELSE 'doc-' || CAST(d.doc_id AS VARCHAR) END) AS url,
      TIMESTAMP '{EPOCH_TS}' + INTERVAL 1 SECOND * (d.doc_id * {_LSN_STRIDE} + r.rev) AS warc_ts,
      CASE
        WHEN r.rev = 0 THEN NULL
        WHEN r.rev = 1 THEN d.text
        ELSE d.text || ' rev ' || CAST(r.rev - 1 AS VARCHAR)
      END AS before_text,
      CASE
        WHEN r.rev = d.doc_id % {_REV_MOD} AND d.doc_id % 7 = 3 AND r.rev > 0 THEN NULL
        WHEN r.rev = 0 THEN d.text
        ELSE d.text || ' rev ' || CAST(r.rev AS VARCHAR)
      END AS after_text,
      d.lang AS lang,
      (r.rev = 0 AND d.doc_id % 2 = 0) AS is_snapshot,
      {EPOCH_MS} + (d.doc_id * {_LSN_STRIDE} + r.rev) * 1000 AS ts_ms,
      'binlog.000001' AS binlog_file,
      d.doc_id * {_LSN_STRIDE} + r.rev AS binlog_pos,
      CASE WHEN d.doc_id % 3 = 0
           THEN 'gtid-src:' || CAST(d.doc_id * {_LSN_STRIDE} + r.rev AS VARCHAR)
           ELSE NULL END AS gtid
    FROM documents d
    CROSS JOIN (SELECT UNNEST(range({_REV_MOD})) AS rev) r
    WHERE r.rev <= d.doc_id % {_REV_MOD}
    """


# ---------------------------------------------------------------------------
# Rich nested-envelope event log for the streaming engine / bench
# ---------------------------------------------------------------------------

PAYLOAD_COLS = ["url", "warc_ts", "html", "text", "lang"]


def rich_events_df(
    spark: SparkSession,
    sf_dir: str,
    revs: int = 4,
    hot_url_pct: int = 10,
    n_hot_urls: int = 5,
    with_html: bool = True,
    html_pad_bytes: int = 0,
    url_copies: int = 1,
) -> DataFrame:
    """Nested-envelope change-event log: (lsn, seq, op, table_name,
    before:struct, after:struct, ts_ms, is_snapshot, txn_id, ddl).

    ``revs`` multiplies volume: each doc emits 1 + (doc_id % revs)
    events. ``url_copies`` multiplies the KEY space: each doc fans out to
    ``url_copies`` distinct urls (suffix -c{i}); this sets the dedup
    ratio independently of volume — a 10^10-event Common-Crawl ingest
    sees ~2-10 events per url, not hundreds, and the engine's
    winners-only transform cost scales with distinct urls, so benchmarks
    must control this ratio. ``hot_url_pct`` percent of non-initial
    events are redirected onto ``n_hot_urls`` shared hot urls (Zipf-ish
    skew for the salting path). All fields are pure functions of
    (doc_id, copy, rev) — xxhash64 is deterministic — so the log is
    reproducible.
    """
    docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    stride = revs + 1
    revs_df = spark.range(revs).withColumnRenamed("id", "rev")
    if url_copies > 1:
        copies = spark.range(url_copies).withColumnRenamed("id", "copy")
        docs = (
            docs.crossJoin(copies)
            .withColumn("doc_id", F.col("doc_id") * url_copies + F.col("copy"))
        )
    e = (
        docs.crossJoin(revs_df)
        .filter(F.col("rev") <= F.col("doc_id") % revs)
        .withColumn("lsn", F.col("doc_id") * stride + F.col("rev"))
        .withColumn("seq", F.col("rev"))
        .withColumn("h", F.abs(F.xxhash64(F.col("doc_id"), F.col("rev"))))
        .withColumn("is_last", F.col("rev") == F.col("doc_id") % revs)
        .withColumn(
            "op",
            F.when(F.col("rev") == 0, F.when(F.col("doc_id") % 2 == 0, F.lit("r")).otherwise(F.lit("c")))
            .when(F.col("is_last") & (F.col("h") % 9 == 0), F.lit("d"))
            .otherwise(F.lit("u")),
        )
        .withColumn("is_snapshot", (F.col("rev") == 0) & (F.col("doc_id") % 2 == 0))
        .withColumn(
            "url",
            F.when(
                (F.col("rev") > 0) & (F.col("h") % 100 < hot_url_pct),
                F.concat(F.lit("https://hot.example.com/h"), (F.col("h") % n_hot_urls).cast("string")),
            ).otherwise(
                F.concat(
                    F.lit("https://"), F.col("source"), F.lit(".example.com/doc-"),
                    F.col("doc_id").cast("string"),
                )
            ),
        )
        .withColumn("warc_ts", F.expr(f"timestamp'{EPOCH_TS}' + make_interval(0,0,0,0,0,0,lsn)"))
        .withColumn(
            "cur_text",
            F.when(F.col("rev") == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" rev "), F.col("rev").cast("string"))
            ),
        )
        .withColumn(
            "prev_text",
            F.when(F.col("rev") == 0, F.lit(None).cast("string"))
            .when(F.col("rev") == 1, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" rev "), (F.col("rev") - 1).cast("string"))),
        )
        .withColumn("ts_ms", F.lit(EPOCH_MS) + F.col("lsn") * 1000)
        .withColumn(
            "txn_id",
            F.when(
                F.col("doc_id") % 3 == 0, F.concat(F.lit("gtid-src:"), F.col("lsn").cast("string"))
            ).otherwise(F.concat(F.lit("binlog.000001:"), F.col("lsn").cast("string"))),
        )
    )
    if with_html:
        synth = make_synth_html(html_pad_bytes)
        e = (
            e.withColumn("cur_html", synth(F.col("cur_text"), F.col("lang")))
            .withColumn("prev_html", synth(F.col("prev_text"), F.col("lang")))
        )
    else:
        e = (
            e.withColumn("cur_html", F.lit(None).cast("binary"))
            .withColumn("prev_html", F.lit(None).cast("binary"))
        )

    def image(text_col: str, html_col: str):
        return F.struct(
            F.col("url").alias("url"),
            F.col("warc_ts").alias("warc_ts"),
            F.col(html_col).alias("html"),
            F.col(text_col).alias("text"),
            F.col("lang").alias("lang"),
        )

    e = (
        e.withColumn(
            "after",
            F.when(F.col("op") == "d", F.lit(None)).otherwise(image("cur_text", "cur_html")),
        )
        .withColumn(
            "before",
            F.when(F.col("rev") == 0, F.lit(None)).otherwise(image("prev_text", "prev_html")),
        )
        .withColumn("table_name", F.lit("pages"))
        .withColumn("ddl", F.lit(None).cast("string"))
    )
    return e.select(
        "lsn", "seq", "op", "table_name", "before", "after",
        "ts_ms", "is_snapshot", "txn_id", "ddl",
    )


def ddl_events_df(spark: SparkSession, ddls: list[tuple[int, str]]) -> DataFrame:
    """Structured DDL control events (op='ddl'). ``ddls`` = [(lsn, ddl_json)].

    The reference parses raw SQL DDL text with ANTLR (mysql-dbz/antlr/
    MySqlAntlrDdlParser.java); our log carries structured JSON descriptors
    instead, e.g. {"action":"add_column","name":"fetch_status","type":"int"}.
    """
    from database_delta_plugins_spark.streaming.pipeline import (
        event_envelope_schema,
    )

    rows = [(lsn, 0, "ddl", "pages", None, None, EPOCH_MS + lsn * 1000, False, f"ddl:{lsn}", ddl)
            for lsn, ddl in ddls]
    # the envelope schema is static — no fixture read needed to get it
    return spark.createDataFrame(rows, schema=event_envelope_schema())


def write_event_log(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    revs: int = 4,
    n_files: int = 8,
    ddls: list[tuple[int, str]] | None = None,
    hot_url_pct: int = 10,
    html_pad_bytes: int = 0,
    with_html: bool = True,
    url_copies: int = 1,
) -> int:
    """Materialize the rich event log as ``n_files`` lsn-range-ordered
    parquet chunks (the binlog-file analogue) for file-based streaming.
    Returns event count.

    html synthesis happens AFTER the range-sort (struct withField on the
    sorted rows): sorting html-free rows keeps the exchange tiny; the
    heavy page bytes are generated map-side on the way into the writer."""
    e = rich_events_df(spark, sf_dir, revs=revs, hot_url_pct=hot_url_pct,
                       with_html=False, url_copies=url_copies)
    if ddls:
        e = e.unionByName(ddl_events_df(spark, ddls))
    e = e.repartitionByRange(n_files, "lsn").sortWithinPartitions("lsn", "seq")
    if with_html:
        synth = make_synth_html(html_pad_bytes)

        def inject(col_name: str):
            st = F.col(col_name)
            return F.when(
                st.isNotNull(),
                st.withField("html", synth(st.getField("text"), st.getField("lang"))),
            )

        e = e.withColumn("after", inject("after")).withColumn("before", inject("before"))
    e.write.mode("overwrite").parquet(out_dir)
    return spark.read.parquet(out_dir).count()
