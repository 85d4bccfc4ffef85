import sys, duckdb
sys.path.insert(0, ".")
import __spark_entry__ as e
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]").appName("dtype")
         .config("spark.ui.enabled","false").config("spark.driver.memory","8g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.001"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
qs = e.queries(); oracles = e.oracle_sql()
names = list(qs)
mismatch = {}
for n in names:
    if n not in oracles: continue
    try:
        sdf = qs[n](spark, sf)
        sspec = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
        oschema = con.execute(f"SELECT * FROM ({oracles[n]}) LIMIT 0").arrow().schema
        ospec = {f.name: str(f.type) for f in oschema}
    except Exception as ex:
        print("ERR", n, str(ex)[:100]); continue
    MAP = {"bigint":"int64","int":"int32","double":"double","float":"float","string":"string",
           "boolean":"bool","binary":"binary","timestamp":"timestamp[us, tz=UTC]","date":"date32[day]"}
    diffs = []
    for c in sspec:
        if c not in ospec: continue
        s_t, o_t = sspec[c], ospec[c]
        if MAP.get(s_t, s_t) != o_t:
            diffs.append((c, s_t, o_t))
    if diffs: mismatch[n] = diffs
for k, v in mismatch.items(): print(k, v)
print(len(names), "entries audited,", len(mismatch), "with dtype diffs")
# Provenance: round-5 hardening sweep. The driver's value hash is
# dtype-sensitive (r04: sim_kmeans red on DuckDB HUGEINT->Decimal d2), so
# every entry/oracle column pair should agree on dtype, not just compare
# equal under Python ==. Run: python tools/dtype_audit.py
