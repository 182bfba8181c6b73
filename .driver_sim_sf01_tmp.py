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

SF = "/root/testdata/sf0.1"
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

if fails:
    print("FAILURES:")
    for f in fails:
        print(" ", f)
    sys.exit(1)
print("ALL MATCH")
