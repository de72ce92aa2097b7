"""Standalone parity check at an arbitrary scale factor (default sf0.01,
the driver's correctness scale). Mirrors tests/test_oracle_parity.py."""
import datetime as dt
import math
import sys

import duckdb

sys.path.insert(0, ".")
import __spark_entry__ as entrymod
from end_to_end_azure_databricks_data_engineering_project_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    import decimal
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    return v


spark = get_spark("parity", cpus=16, shuffle_partitions=16,
                  extra_conf={"spark.driver.memory": "16g"})
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

oracles = entrymod.oracle_sql()
qs = entrymod.queries()
fail = 0
for name in sorted(qs):
    try:
        sdf = qs[name](spark, SF_DIR)
        srows = sdf.collect()
        scols = sorted(sdf.columns)
        if name not in oracles:
            print(f"{name:28s} rows-only  n={len(srows)}")
            continue
        res = con.execute(oracles[name])
        dnames = [d[0] for d in res.description]
        drows = res.fetchall()
        ok_schema = scols == sorted(dnames)
        ok_count = len(srows) == len(drows)
        sset = sorted(tuple(str(norm(r[c])) for c in scols) for r in srows)
        dset = sorted(tuple(str(norm(v)) for _, v in sorted(zip(dnames, r))) for r in drows)
        ok_vals = sset == dset
        status = "OK" if (ok_schema and ok_count and ok_vals) else "FAIL"
        if status == "FAIL":
            fail += 1
            detail = f" schema={ok_schema} count={ok_count}({len(srows)}/{len(drows)}) vals={ok_vals}"
            if ok_count and not ok_vals:
                for a, b in zip(sset, dset):
                    if a != b:
                        detail += f" first: spark={a} duck={b}"
                        break
        else:
            detail = f" n={len(srows)}"
        print(f"{name:28s} {status}{detail}")
    except Exception as e:
        fail += 1
        print(f"{name:28s} ERROR {str(e)[:200]}")
print(f"\n{'PASS' if fail == 0 else 'FAIL'}: {len(qs) - fail}/{len(qs)}")
sys.exit(1 if fail else 0)
