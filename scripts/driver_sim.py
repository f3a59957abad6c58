#!/usr/bin/env python3
"""Simulate the driver's verify pass: plain SparkSession (driver-like, no
tuned configs), import __spark_entry__ through the repo root, run entry()
plus every queries() entry at the given sf, and compare against oracle_sql()
via DuckDB exactly like CORRECTNESS_r{N}: row count + sorted-column schema +
order-insensitive values."""

from __future__ import annotations

import datetime
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
from pyspark.sql import SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_value(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, (np.floating, float)):
        return round(float(v), 9)
    if isinstance(v, (np.datetime64, datetime.datetime, datetime.date)):
        return str(v)
    return v


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(canon_value(v) for v in r) for r in df.itertuples(index=False, name=None)]
    dtypes = [str(t) for t in df.dtypes]
    return list(df.columns), dtypes, sorted(rows, key=lambda r: tuple(map(str, r)))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # deliberately plain session — the driver builds its own
    spark = SparkSession.builder.master("local[*]").appName("driver_sim").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    t0 = time.time()
    n = E.entry(spark).count()
    print(f"entry(): {n} rows in {time.time()-t0:.1f}s")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries, oracles = E.queries(), E.oracle_sql()
    ok = bad = 0
    for name in sorted(queries):
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"  FAIL {name}: spark error {type(ex).__name__}: {ex}")
            bad += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"  rows-only {name}: {len(sdf)} rows [{dt:.1f}s]")
            ok += 1
            continue
        odf = con.execute(oracles[name]).df()
        sc, sdt, sr = canon(sdf)
        oc, odt, orows = canon(odf)
        if sc != oc:
            print(f"  FAIL {name}: schema {sc} vs {oc}")
            bad += 1
        elif sdt != odt:
            print(f"  FAIL {name}: dtypes {list(zip(sc, sdt))} vs {list(zip(oc, odt))}")
            bad += 1
        elif len(sr) != len(orows):
            print(f"  FAIL {name}: rows {len(sr)} vs {len(orows)}")
            bad += 1
        elif sr != orows:
            diff = [(a, b) for a, b in zip(sr, orows) if a != b][:3]
            print(f"  FAIL {name}: values differ, e.g. {diff}")
            bad += 1
        else:
            print(f"  PASS {name}: {len(sr)} rows [{dt:.1f}s]")
            ok += 1
    print(f"== {ok} ok, {bad} failed @ {sf_dir}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
