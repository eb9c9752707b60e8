"""Object-store-ready commit protocol: the MetaIO abstraction.

The snapshot commit must work against a store that offers ONLY
conditional put (no rename, no append) — MemoryMetaIO simulates that.
Data files still go through Spark's filesystem layer (local here,
s3a/gs/abfs on a cluster)."""
import json

import pytest
from pyspark.sql import types as T

from database_delta_plugins_spark.lake.metaio import (
    AlreadyExists,
    LocalMetaIO,
    MemoryMetaIO,
)
from database_delta_plugins_spark.lake.table import LakeTable

SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("text", T.StringType(), True),
])


def _upd(spark, rows):
    return spark.createDataFrame(
        rows, "url: string, text: string, op_type: string, lsn: long, seq: long")


def test_full_merge_cycle_on_object_store_semantics(spark, tmp_path):
    """Create → merge → refresh → read with ALL metadata going through a
    store that has no rename: proves the commit protocol needs only
    put-if-absent."""
    io = MemoryMetaIO()
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, key="url",
                         num_buckets=2, write_mode="mor", io=io)
    t.merge(_upd(spark, [("a", "v1", "I", 1, 0), ("b", "w1", "I", 2, 0)]),
            epoch_id=1)
    t = t.refresh()
    t.merge(_upd(spark, [("a", "v2", "U", 3, 0)]), epoch_id=2)
    t = t.refresh()
    got = {r["url"]: r["text"] for r in t.read().collect()}
    assert got == {"a": "v2", "b": "w1"}
    # nothing metadata-ish leaked onto the POSIX filesystem
    assert not (tmp_path / "t" / "_meta").exists()
    # fencing state survives the in-memory store round trip
    assert set(t.committed_epochs()) == {"1", "2"}


def test_commit_survives_lost_current_hint(spark, tmp_path):
    """The put of v{N}.json IS the commit: if the CURRENT hint update is
    lost (crash right after the conditional put), load() still finds the
    committed snapshot by listing."""
    io = MemoryMetaIO()
    t = LakeTable.create(spark, str(tmp_path / "t2"), SCHEMA, key="url",
                         num_buckets=2, io=io)
    t.merge(_upd(spark, [("a", "v1", "I", 1, 0)]), epoch_id=1)
    t = t.refresh()
    committed = t.version
    # simulate the crash: rewind the hint to the previous version
    io.put(f"{t.path}/_meta/CURRENT", str(committed - 1))
    t2 = LakeTable.load(spark, t.path, io=io)
    assert t2.version == committed
    assert {r["url"] for r in t2.read().collect()} == {"a"}


def test_concurrent_commit_loses_conditional_put(spark, tmp_path):
    """Two writers loaded at the same version: the second conditional
    put fails with AlreadyExists (never silently overwrites)."""
    io = MemoryMetaIO()
    t = LakeTable.create(spark, str(tmp_path / "t3"), SCHEMA, key="url",
                         num_buckets=2, io=io)
    a = LakeTable.load(spark, t.path, io=io)
    b = LakeTable.load(spark, t.path, io=io)
    a.merge(_upd(spark, [("a", "v1", "I", 1, 0)]), epoch_id=1)
    with pytest.raises(AlreadyExists):
        b.merge(_upd(spark, [("x", "y", "I", 9, 0)]), epoch_id=99)


def test_local_put_if_absent_is_atomic_and_exclusive(tmp_path):
    io = LocalMetaIO()
    p = str(tmp_path / "v1.json")
    io.put_if_absent(p, json.dumps({"ok": 1}))
    with pytest.raises(AlreadyExists):
        io.put_if_absent(p, "other")
    assert json.loads(io.read_text(p)) == {"ok": 1}
    # no tmp residue from either attempt
    assert [f for f in io.list(str(tmp_path)) if f.endswith(".tmp")] == []


def test_strict_occ_never_deletes_competing_artifact(spark, tmp_path):
    """ADVICE r2: the unparseable-artifact delete+retry recovery is only
    sound single-writer (a racing writer could delete the OTHER writer's
    just-committed snapshot). With properties.strict_occ the writer must
    surface AlreadyExists instead of recovering."""
    import json

    import pytest
    from pyspark.sql import types as T

    from database_delta_plugins_spark.lake.metaio import AlreadyExists
    from database_delta_plugins_spark.lake.table import LakeTable

    schema = T.StructType([T.StructField("url", T.StringType(), False),
                           T.StructField("text", T.StringType(), True)])
    io = MemoryMetaIO()
    tp = str(tmp_path / "t_strict")
    t = LakeTable.create(spark, tp, schema, key="url", num_buckets=2,
                         write_mode="mor", io=io,
                         properties={"strict_occ": True})
    # plant an unparseable artifact at the next version
    io.put(f"{tp}/_meta/v1.json", "{half-written")
    upd = spark.createDataFrame(
        [("a", "v1", "I", 1, 0)],
        "url string, text string, op_type string, lsn long, seq long")
    with pytest.raises(AlreadyExists):
        t.merge(upd, epoch_id=1)
    # the artifact was NOT deleted (no recovery attempted)
    assert io.read_text(f"{tp}/_meta/v1.json") == "{half-written"
    # default (single-writer) mode recovers from its own prior crash
    io2 = MemoryMetaIO()
    tp2 = str(tmp_path / "t_single")
    t2 = LakeTable.create(spark, tp2, schema, key="url", num_buckets=2,
                          write_mode="mor", io=io2)
    io2.put(f"{tp2}/_meta/v1.json", "{half-written")
    t2.merge(upd, epoch_id=1)
    assert json.loads(io2.read_text(f"{tp2}/_meta/v1.json"))["version"] == 1
