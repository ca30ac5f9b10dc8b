"""Simulate the round driver: vanilla SparkSession + DuckDB oracle compare.

Run with cwd=/root/repo:  python /tmp/driver_sim.py [sf_dir]
"""
import hashlib
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver_sim")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E

rows = E.entry(spark).count()
assert rows > 0, "entry() returned 0 rows"
print(f"entry: {rows} rows OK", flush=True)

def fresh_oracle():
    """A clean DuckDB connection with spill + views.

    An in-memory DuckDB has NO temp directory, so a big oracle (m14's
    recursive closure, m16's banding at sf1) cannot spill and dies
    with OutOfMemory/IOException instead — the spill dir + explicit
    limit keep oracle-side capacity from masquerading as a mismatch.
    Rebuilt AFTER any oracle error: a connection that just hit an
    IO/OOM failure keeps leaked buffer-manager blocks, and every
    subsequent non-trivial oracle then dies on kilobyte allocations —
    the sf1 cascade where one genuine disk-capacity failure (m14)
    turned six healthy oracles into phantom OOMs."""
    c = duckdb.connect()
    c.execute("SET temp_directory='/tmp/duckdb_spill'")
    c.execute(f"SET memory_limit='{os.environ.get('DRIVER_SIM_MEM', '95GB')}'")
    # Bound the spill: a capacity-infeasible MONOLITHIC oracle (m14,
    # d32 at sf1) should raise promptly and fall back to its STAGED
    # replay, not fill the box's disk first — 32 GiB is far above any
    # legitimately-green oracle's observed spill.
    c.execute(
        "SET max_temp_directory_size="
        f"'{os.environ.get('DRIVER_SIM_SPILL', '32GiB')}'"
    )
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


con = fresh_oracle()


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(4)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("Int64")
        elif df[c].dtype.kind == "b":
            df[c] = df[c].astype("boolean")
        elif df[c].dtype.kind == "O":
            try:
                num = pd.to_numeric(df[c], errors="raise")
                df[c] = num.round(4) if num.dtype.kind == "f" else num.astype("Int64")
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


Q = E.queries()
O = E.oracle_sql()
# Staged (multi-statement TEMP TABLE) replays for oracles whose
# monolithic form is memory-infeasible at sf1 — value-identical by
# construction; see queries/_registry.py STAGED_ORACLE.
try:
    from mapreducehs_spark.queries import STAGED_ORACLE as STAGED
except ImportError:
    STAGED = {}
fails = []
records = {}
for name, fn in Q.items():
    if ONLY and name not in ONLY:
        continue
    t0 = time.perf_counter()
    try:
        sp = fn(spark, SF_DIR).toPandas()
    except Exception as ex:
        fails.append(name)
        records[name] = {"rows_match": None, "schema_match": None, "hash_match": None,
                         "spark_rows": None, "oracle_rows": None,
                         "err": f"spark:{type(ex).__name__}"}
        print(f"{name}: SPARK ERROR {type(ex).__name__}: {str(ex)[:200]}", flush=True)
        continue
    dt = time.perf_counter() - t0
    if name not in O:
        status = f"rows_only rows={len(sp)}" + (" EMPTY!" if len(sp) == 0 else "")
        if len(sp) == 0:
            fails.append(name)
        records[name] = {"rows_match": None, "schema_match": None, "hash_match": None,
                         "spark_rows": len(sp), "oracle_rows": None, "err": "no_oracle"}
        print(f"{name}: {status} ({dt:.1f}s)", flush=True)
        continue
    # Canonical (monolithic) oracle first so small-SF runs keep
    # exercising it; fall back to the STAGED (TEMP-TABLE) replay only
    # when the monolithic form raises (e.g. m14/m16 capacity at sf1) —
    # keeps the two forms from drifting apart undetected.
    oracle_form = None  # set when the staged replay substitutes
    try:
        ora = con.execute(O[name]).fetchdf()
    except Exception as ex:
        try:
            con.close()
        except Exception:
            pass
        con = fresh_oracle()  # don't let one capacity failure cascade
        if name in STAGED:
            try:
                ora = con.execute(STAGED[name]).fetchdf()
                # surface the substitution in the JSON artifact, not
                # just stdout — a NEW monolithic regression must show
                # up in CORRECTNESS_* diffs, not pass as a normal green
                oracle_form = {"oracle_form": "staged",
                               "monolithic_err": type(ex).__name__}
                print(f"{name}: monolithic oracle raised "
                      f"{type(ex).__name__}; staged replay used", flush=True)
            except Exception as ex2:
                fails.append(name)
                records[name] = {"rows_match": None, "schema_match": None,
                                 "hash_match": None, "spark_rows": len(sp),
                                 "oracle_rows": None,
                                 "err": f"oracle:{type(ex2).__name__}"}
                print(f"{name}: ORACLE ERROR (staged) {type(ex2).__name__}: "
                      f"{str(ex2)[:200]}", flush=True)
                try:
                    con.close()
                except Exception:
                    pass
                con = fresh_oracle()
                continue
        else:
            fails.append(name)
            records[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": len(sp),
                             "oracle_rows": None,
                             "err": f"oracle:{type(ex).__name__}"}
            print(f"{name}: ORACLE ERROR {type(ex).__name__}: "
                  f"{str(ex)[:200]}", flush=True)
            continue
    rows_m = len(sp) == len(ora)
    schema_m = sorted(map(str, sp.columns)) == sorted(map(str, ora.columns))
    hash_m = schema_m and canon(sp) == canon(ora)
    ok = rows_m and schema_m and hash_m
    records[name] = {"rows_match": rows_m, "schema_match": schema_m, "hash_match": hash_m,
                     "spark_rows": len(sp), "oracle_rows": len(ora), "err": None}
    if oracle_form:
        records[name].update(oracle_form)
    if not ok:
        fails.append(name)
        print(f"{name}: MISMATCH rows={len(sp)}/{len(ora)} schema={schema_m} "
              f"cols_spark={sorted(sp.columns)} cols_ora={sorted(ora.columns)}", flush=True)
    else:
        print(f"{name}: MATCH rows={len(sp)} ({dt:.1f}s)", flush=True)

if os.environ.get("DRIVER_SIM_JSON"):
    import json

    with open(os.environ["DRIVER_SIM_JSON"], "w") as f:
        json.dump(records, f, indent=2)

print(f"\n{'FAILURES: ' + ', '.join(fails) if fails else 'ALL PASS'}", flush=True)
spark.stop()
sys.exit(1 if fails else 0)
