"""Driver-contract simulation: entry() + every queries()/oracle_sql() pair
at sf0.01, compared row-count + order-insensitive value hash vs DuckDB."""
import hashlib
import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as E

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "24g")
    .getOrCreate()
)
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{round(v, 9):.9f}"
            vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    return hashlib.sha256("\x1e".join(out).encode()).hexdigest()


n = E.entry(spark).count()
assert n > 0, "entry() returned no rows"
print(f"entry(): {n} rows ok", flush=True)

qs, oracles = E.queries(), E.oracle_sql()

# local_only registry entries (inputs the external driver doesn't ship,
# e.g. the generated partsupp supplement) are driven too, against the same
# compare — they're part of the engine surface even though the driver
# can't sample them. Their DuckDB views register here.
from canvas_data_aws_spark.plans.registry import all_queries  # noqa: E402
from canvas_data_aws_spark.sources.tpch_supplement import SUPPLEMENTS  # noqa: E402

for _view, _ensure in SUPPLEMENTS.items():
    _path = _ensure(spark, SF)
    con.execute(
        f"CREATE VIEW {_view} AS SELECT * FROM read_parquet('{_path}/*.parquet')"
    )
for _name, _q in all_queries().items():
    if _q.local_only and _name not in qs:
        qs[_name] = _q.fn
        if _q.oracle is not None:
            oracles[_name] = _q.oracle

only = sys.argv[1:]
ok = mismatch = rows_only = err = 0
for name in sorted(qs):
    if only and name not in only:
        continue
    try:
        df = qs[name](spark, SF)
        srows = [tuple(r) for r in df.collect()]
        scols = df.columns
        if name not in oracles:
            rows_only += 1
            print(f"ROWSONLY {name}: {len(srows)} rows", flush=True)
            continue
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        if len(srows) != len(orows):
            mismatch += 1
            print(f"MISMATCH {name}: rows {len(srows)} vs {len(orows)}", flush=True)
        elif sorted(scols) != sorted(ocols):
            mismatch += 1
            print(f"MISMATCH {name}: cols {sorted(scols)} vs {sorted(ocols)}", flush=True)
        elif canon(srows, scols) != canon(orows, ocols):
            mismatch += 1
            print(f"MISMATCH {name}: value hash", flush=True)
        else:
            ok += 1
    except Exception as e:  # noqa: BLE001
        err += 1
        print(f"ERROR {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)

print(f"RESULT: {ok} ok, {mismatch} mismatch, {rows_only} rows-only, {err} error")
