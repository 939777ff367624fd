"""Targeted N-times scale probe for the persisted-artifact families
(round-11 drift monitors, round-12 Bloom/extent probes, round-13
partitioned file-skip + CUSUM probe): synthesize the N-times orders and
events tables (the two bases these queries touch), then time each query
twice — first call charges prep, second is the artifact-only design
point that must stay ~flat in N (monitors/probes) or track the
candidate fraction instead of N (the partitioned file skip — contrast
with round 12's unpartitioned row-filter prune, which grew with N)."""
import os
import shutil
import sys
import time

sys.path.insert(0, __import__("os").path.join(
    __import__("os").path.dirname(__file__), ".."))
from pyspark.sql import functions as F

from building_permissions_etl_spark.session import get_spark

n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
out = f"/tmp/persist_{n}x"
spark = get_spark(app_name="persist_scale")
spark.sparkContext.setLogLevel("ERROR")
shutil.rmtree(out, ignore_errors=True)
os.makedirs(out)
od = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
shift = od.agg(F.max("o_orderkey")).first()[0] + 1
big = od
for i in range(1, n):
    big = big.unionByName(
        od.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * shift)))
big.repartition(16).write.mode("overwrite").parquet(f"{out}/orders.parquet")

ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
eshift = ev.agg(F.max("event_id")).first()[0] + 1
bigev = ev
for i in range(1, n):
    bigev = bigev.unionByName(
        ev.withColumn("event_id", F.col("event_id") + F.lit(i * eshift)))
bigev.repartition(16).write.mode("overwrite").parquet(
    f"{out}/events.parquet")

from building_permissions_etl_spark.plans import (round11_queries,
                                                  round12_queries,
                                                  round13_queries,
                                                  round14_queries)

q = {}
round11_queries.contribute(lambda name, fn, sql: q.__setitem__(name, fn))
round12_queries.contribute(lambda name, fn, sql: q.__setitem__(name, fn))
round13_queries.contribute(lambda name, fn, sql: q.__setitem__(name, fn))
round14_queries.contribute(lambda name, fn, sql: q.__setitem__(name, fn))
for name in ("psi_drift_persisted", "histogram_persisted_delta_update",
             "bloom_register_persisted_probe",
             "zorder_extent_persisted_prune",
             "zorder_partitioned_file_skip",
             "zorder_layout_incremental_skip",
             "zorder_layout_compacted_skip",
             "zorder_layout_lifecycle_skip",
             "cusum_state_persisted_probe"):
    for tag in ("first call (incl. any prep)", "artifact-only"):
        t0 = time.time()
        q[name](spark, out).write.format("noop").mode("overwrite").save()
        print(f"{n}x {name} [{tag}]: {round(time.time() - t0, 2)} s",
              flush=True)
shutil.rmtree(out, ignore_errors=True)
