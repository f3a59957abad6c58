#!/usr/bin/env python3
"""driver_sim for a named subset of registry entries (same canon/compare
path as scripts/driver_sim.py — import it) — the fast oracle gate while
iterating on one operator family.

Usage: python scripts/driver_sim_subset.py SF_DIR name [name...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

import duckdb
from pyspark.sql import SparkSession

from driver_sim import TABLES, canon


def main():
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = SparkSession.builder.master("local[*]").appName("driver_sim_subset").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries, oracles = E.queries(), E.oracle_sql()
    ok = bad = 0
    for name in names:
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
        if (sc, sdt) != (oc, odt) or sr != orows:
            print(f"  FAIL {name}")
            bad += 1
        else:
            print(f"  PASS {name}: {len(sr)} rows [{dt:.1f}s]")
            ok += 1
    print(f"== {ok} ok, {bad} failed @ {sf_dir}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
