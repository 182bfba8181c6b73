"""Simulate the driver's verify: a PLAIN SparkSession (none of the engine's
conf baked in at build time), entry() smoke, then every queries() entry at
sf0.01 compared against oracle_sql() via DuckDB — order-insensitive,
column-name-sorted value compare, like CORRECTNESS_r{N}.json."""
import math
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

import duckdb

import __spark_entry__ as e

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

df = e.entry(spark)
n = df.count()
print(f"entry(): {n} rows, schema={df.schema.simpleString()[:120]}")
assert n > 0

qs = e.queries()
oq = e.oracle_sql()
print(f"queries: {len(qs)}, with oracle: {len(oq)}")

# Lazy localCheckpoints pin blocks until GC + ContextCleaner; the catalog
# must not ACCUMULATE them across queries. Baseline after entry(), free
# each query's residue once its result is collected, and assert the
# registry returns to baseline — the flat-registry guarantee the r6
# verdict asked for (VERDICT r6 "What's wrong" #3).
from logistics_data_pipeline_project_spark.operators.checkpoints import (  # noqa: E402
    persistent_rdd_ids,
    release_residual_checkpoints,
)

ckpt_baseline = persistent_rdd_ids(spark)
residual_total = 0


def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if hasattr(v, "isoformat"):
        return str(v)
    return v


fails = []
for name, fn in qs.items():
    sdf = fn(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    residual_total += len(release_residual_checkpoints(spark, ckpt_baseline))
    assert persistent_rdd_ids(spark) == ckpt_baseline, (
        f"{name}: persistent-RDD registry not flat after release"
    )
    if name not in oq:
        print(f"  {name}: rows-only, {len(srows)} rows OK")
        continue
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    cur = con.execute(oq[name])
    dcols = [d[0].lower() for d in cur.description]
    drows = cur.fetchall()
    con.close()
    scols = [c.lower() for c in sdf.columns]
    if sorted(scols) != sorted(dcols):
        fails.append((name, f"cols spark={scols} duck={dcols}"))
        continue
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    do = sorted(range(len(dcols)), key=lambda i: dcols[i])
    ss = sorted([tuple(norm(r[i]) for i in so) for r in srows], key=repr)
    ds = sorted([tuple(norm(r[i]) for i in do) for r in drows], key=repr)
    if len(ss) != len(ds):
        fails.append((name, f"rowcount spark={len(ss)} duck={len(ds)}"))
    elif ss != ds:
        bad = [(a, b) for a, b in zip(ss, ds) if a != b][:2]
        fails.append((name, f"values {bad}"))
    else:
        print(f"  {name}: MATCH ({len(ss)} rows)")

print(
    f"checkpoint residue freed between queries: {residual_total} RDDs"
    f" (registry flat at {len(ckpt_baseline)} baseline ids)"
)
if fails:
    print("FAILURES:")
    for f in fails:
        print(" ", f)
    sys.exit(1)
print("ALL MATCH")
