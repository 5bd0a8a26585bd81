"""Pre-flight the suite: run every (Spark query, DuckDB oracle) pair and
compare row count, column names, and order-insensitive values — a local
emulation of the driver's correctness gate.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, ".")

import duckdb

from southpaw_spark import suite  # noqa: E402  (package import path)
from southpaw_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def rowset(rows, cols):
    out = []
    for r in rows:
        d = dict(zip(cols, r))
        out.append(tuple(canon(d[c]) for c in sorted(cols)))
    return sorted(out, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-oracles")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):  # Spark-written dataset directory
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    failures = 0
    all_queries = {**suite.QUERIES, **suite.EXTRA_QUERIES}
    all_oracles = {**suite.ORACLES, **suite.EXTRA_ORACLES}
    for name, fn in all_queries.items():
        if only and name not in only:
            continue
        sql = all_oracles.get(name)
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if sql is None:
            print(f"ok(rows-only)  {name}: {len(srows)} rows")
            continue
        try:
            cur = con.execute(sql)
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: columns differ spark={scols} duck={dcols}")
            failures += 1
            continue
        # dtype alignment (emulating a strict driver schema check)
        spark_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
        duck_types = {d[0]: str(d[1]) for d in cur.description}
        TYPE_MAP = {
            "NUMBER": {"bigint", "int", "smallint", "tinyint", "double", "float"},
            "STRING": {"string"},
            "bool": {"boolean"},
            "list": None,  # element types checked via values
        }
        for cname, dt in duck_types.items():
            st = spark_types[cname]
            ok_ = (
                (dt == "NUMBER" and st in TYPE_MAP["NUMBER"])
                or (dt == "STRING" and st == "string")
                or (dt == "bool" and st == "boolean")
                or (dt == "list" and st.startswith("array"))
                or (dt == "TIMESTAMP" and st.startswith("timestamp"))
            )
            if not ok_:
                print(
                    f"WARN  {name}: column {cname} spark={st} duck={dt}"
                )
        if len(srows) != len(drows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} duck={len(drows)}")
            failures += 1
            continue
        s_set = rowset(srows, scols)
        d_set = rowset(drows, dcols)
        if s_set != d_set:
            diffs = [
                (a, b) for a, b in zip(s_set, d_set) if a != b
            ][:3]
            print(f"FAIL  {name}: values differ; first diffs:")
            for a, b in diffs:
                print(f"      spark={a}\n      duck ={b}")
            failures += 1
            continue
        print(f"ok    {name}: {len(srows)} rows match")
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
