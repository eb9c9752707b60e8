"""Drive the engine end-to-end through its public surface:
event log on disk -> streaming CDCPipeline -> LakeTable state,
with a mid-stream kill/restart and a DuckDB sequential-apply oracle."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import shutil, time, json
import duckdb
from pyspark.sql import functions as F
from database_delta_plugins_spark.session import get_spark
from database_delta_plugins_spark.sources.generator import write_event_log
from database_delta_plugins_spark.streaming.pipeline import CDCPipeline
from database_delta_plugins_spark.lake.table import LakeTable

SF = "/root/testdata/sf0.001"
BASE = "/tmp/verify_e2e"
shutil.rmtree(BASE, ignore_errors=True)
spark = get_spark(master="local[8]", shuffle_partitions=8)

LOG = f"{BASE}/eventlog"
n = write_event_log(spark, SF, LOG, revs=4, n_files=6,
                    ddls=[(1500, json.dumps({"action": "add_column", "name": "fetch_status", "type": "int"}))])
print("events written:", n)

# --- run A: single uninterrupted streaming run ---
pA = CDCPipeline(spark, LOG, f"{BASE}/tableA", f"{BASE}/ckptA", num_buckets=8, max_files_per_trigger=2)
pA.bootstrap(replicate_existing_data=False)
tA = pA.run_to_completion()
stateA = tA.read().orderBy("url").toPandas()
print("run A: final rows", len(stateA), "version", tA.version, "epochs", len(tA.committed_epochs()))
print("run A schema:", [f.name for f in tA.schema().fields])

# --- run B: kill after first micro-batch, then restart to completion ---
pB = CDCPipeline(spark, LOG, f"{BASE}/tableB", f"{BASE}/ckptB", num_buckets=8, max_files_per_trigger=2)
pB.bootstrap(replicate_existing_data=False)
q = pB.start(available_now=True)
while not pB.epoch_lineage:
    time.sleep(0.3)
q.stop()  # kill mid-stream
q.awaitTermination(30)
tB_mid = LakeTable.load(spark, f"{BASE}/tableB")
print("run B killed after", len(tB_mid.committed_epochs()), "epochs, version", tB_mid.version)
tB = pB.run_to_completion()  # restart from checkpoint
stateB = tB.read().orderBy("url").toPandas()
print("run B: final rows", len(stateB), "version", tB.version)
print("REPLAY EQUIVALENCE:", stateA.equals(stateB))

# --- probe: re-run completed stream again (full replay) => all fenced, state unchanged ---
v_before = tB.version
tB2 = pB.run_to_completion()
print("re-run after completion: version", v_before, "->", tB2.version,
      "state equal:", tB2.read().orderBy("url").toPandas().equals(stateB))

# --- oracle: DuckDB sequential apply of the same event log ---
con = duckdb.connect()
con.sql(f"create view ev as select * from '{LOG}/*.parquet'")
oracle = con.sql("""
  with dml as (select * from ev where op != 'ddl'),
  winner as (
    select *, row_number() over (partition by coalesce(after.url, before.url)
                                 order by lsn desc, seq desc) rn
    from dml
  )
  select coalesce(after.url, before.url) as url, after.text as text
  from winner where rn = 1 and op != 'd' order by url
""").df()
print("oracle rows", len(oracle))
sA = stateA[["url", "text"]].reset_index(drop=True)
print("ORACLE PARITY:", sA.equals(oracle.reset_index(drop=True)))

# --- probe: lineage recorded per epoch ---
# snapshot carries compact fencing records; full per-partition lineage
# lives in the append-only sidecar (lineage_log)
eps = tA.committed_epochs()
k0 = sorted(eps)[0]
print("sample fence keys:", sorted(eps[k0].keys()))
full = [r for r in tA.lineage_log() if r.get("partition_lineage")]
assert full, "sidecar lineage must carry per-partition records"
print("sample lineage keys:", sorted(full[0].keys()))
print("partition lineage sample:", full[0]["partition_lineage"][:2])

# --- probe: empty event log dir ---
import os
os.makedirs(f"{BASE}/emptylog", exist_ok=True)
spark.createDataFrame([], spark.read.parquet(LOG).schema).write.mode("overwrite").parquet(f"{BASE}/emptylog")
pE = CDCPipeline(spark, f"{BASE}/emptylog", f"{BASE}/tableE", f"{BASE}/ckptE", num_buckets=4)
pE.bootstrap(replicate_existing_data=False)
tE = pE.run_to_completion()
print("empty log: rows", tE.read().count(), "version", tE.version)

spark.stop()
print("DONE")
