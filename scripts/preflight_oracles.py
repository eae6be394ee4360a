#!/usr/bin/env python
"""Pre-flight: run every entry query vs its DuckDB oracle at sf0.01 (the
driver's correctness scale) and demand exact value equality. Run before
every round-end commit."""
import sys, duckdb, pandas as pd
sys.path.insert(0, "/root/repo")
import __spark_entry__ as em
from company_name_matching_spark.session import get_spark

SF = "/root/testdata/sf0.01"
TABLES = ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]
spark = get_spark(cpus=32); spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def canon(pdf):
    cols = sorted(pdf.columns)
    out = pdf[cols].copy()
    for c in cols:
        if pd.api.types.is_datetime64_any_dtype(out[c]): out[c] = out[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(out[c]): out[c] = out[c].astype("float64")
        elif pd.api.types.is_integer_dtype(out[c]): out[c] = out[c].astype("int64")
    return out.sort_values(cols, kind="mergesort").reset_index(drop=True)

Q, O = em.queries(), em.oracle_sql()
fails = []
for name in sorted(Q):
    try:
        got = canon(Q[name](spark, SF).toPandas())
        if name in O:
            want = canon(con.sql(O[name]).df())
            gk = [d.kind for d in got.dtypes]; wk = [d.kind for d in want.dtypes]
            assert gk == wk, f"dtype-class mismatch (driver hash is type-sensitive): {list(zip(got.columns, gk, wk))}"
            pd.testing.assert_frame_equal(got, want, check_exact=True, check_dtype=False)
            print(f"OK   {name}: {len(got)} rows (oracle exact)")
        else:
            print(f"OK   {name}: {len(got)} rows (rows-only)")
    except Exception as e:
        fails.append(name)
        print(f"FAIL {name}: {str(e)[:200]}")
print("FAILURES:", fails if fails else "none")
spark.stop()
