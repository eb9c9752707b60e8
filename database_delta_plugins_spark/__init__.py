"""database_delta_plugins_spark — a from-scratch PySpark-native CDC /
incremental-ingest engine.

Re-expresses the semantics of CDAP database-delta-plugins (reference at
/root/reference: MySQL/SQL Server Debezium-based CDC sources feeding a
key-upsert replication target) as an idiomatic Spark engine:

  change-event log (binlog/WAL-shaped)  -> Structured Streaming read
  decode / normalize (op map, images)   -> column expressions (Catalyst)
  per-record transforms                 -> vectorized pandas/Arrow UDFs
  last-writer-wins per key              -> salted two-stage max_by reduce
  apply                                 -> key-bucketed copy-on-write MERGE
                                           into an ACID snapshot table
  exactly-once                          -> epoch-fenced commits recorded
                                           atomically in the table snapshot

The lake layer (`lake/`) is a minimal from-scratch ACID parquet table
format (Iceberg-style snapshots + atomic metadata swap) because no
Iceberg/Delta jars ship in this environment; semantics match what the
reference's apply contract needs (PK upsert, soft delete, sequence-number
LWW — cf. mysql-delta-plugins/src/e2e-test/java/io/cdap/plugin/
BQValidation.java:86-87 target columns _row_id/_source_timestamp/
_is_deleted/_sequence_num).
"""

__version__ = "0.1.0"
