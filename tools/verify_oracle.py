"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted, values
canonicalized).  Usage:

    python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from garmadon_spark.session import TPCH_TABLES, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _canon(v):
    """Driver-strict canonicalization: full float repr (no rounding), and
    int / float / Decimal stay DISTINCT.  DuckDB's SUM(integer) yields
    HUGEINT -> Arrow decimal128, which the driver's fetch path reprs
    differently from Spark's bigint; oracle SQL must CAST such sums to
    BIGINT.  Keeping the distinction here makes the local gate predict the
    driver's verdict (round-1 lesson: 9-decimal pre-rounding + int-collapse
    masked 4 driver hash mismatches)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return "DEC:" + str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else SF_DIR
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    import __spark_entry__ as ent

    qs = ent.queries()
    oracles = ent.oracle_sql()

    con = duckdb.connect()
    for t in TPCH_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    spark = get_spark("verify-oracle")
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.sql(oracles[name])
            dcols = [c.lower() for c in res.columns]
            # Arrow fetch (not fetchall): surfaces HUGEINT as Decimal the
            # way the driver's fetch path does, so dtype drift fails HERE.
            tbl = res.arrow()
            dcol_values = [c.to_pylist() for c in tbl.columns]
            drows = list(zip(*dcol_values)) if dcol_values else []
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok_cols = sorted(c.lower() for c in scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        sh = table_hash([c.lower() for c in scols], srows)
        dh = table_hash(dcols, drows)
        ok_hash = sh == dh
        status = "OK  " if (ok_cols and ok_count and ok_hash) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{status}  {name}: rows {len(srows)}/{len(drows)}"
            f" cols={'ok' if ok_cols else f'{sorted(scols)} vs {sorted(dcols)}'}"
            f" hash={'ok' if ok_hash else 'MISMATCH'}  ({time.time()-t0:.1f}s)"
        )
        if not ok_hash and ok_cols and ok_count:
            order = sorted(range(len(scols)), key=lambda i: scols[i].lower())
            sset = sorted("|".join(_canon(r[i]) for i in order) for r in srows)
            order2 = sorted(range(len(dcols)), key=lambda i: dcols[i])
            dset = sorted("|".join(_canon(r[i]) for i in order2) for r in drows)
            for a, b in zip(sset, dset):
                if a != b:
                    print(f"    spark: {a}\n    duck : {b}")
                    break
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
