"""Emulate the driver's correctness gate: run every queries() entry on
Spark at sf0.01 and its oracle_sql() twin on DuckDB, compare row count,
column names, and order-insensitive value multisets.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from collections import Counter
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm(v):
    """Type-preserving normalization. The driver's value hash is
    type-strict: DuckDB HUGEINT sums reach pandas as float64 and hash
    differently from Spark's BIGINT even when numerically equal. Round 2
    shipped four red rows because this function collapsed 5697.0 and
    5697 to the same string — so the prefix encodes the type class
    (int/float/bool/str) and the local gate is at least as strict as
    the driver's."""
    import numpy as np

    if v is None:
        return ""
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "f:nan"
        return f"f:{float(v):.9g}"
    return "s:" + str(v)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from golden_horse_spark.config import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf)
            scols = sorted(sdf.columns)
            srows = [tuple(norm(r[c]) for c in scols) for r in sdf.collect()]
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {ex}")
            continue
        ocols = sorted(odf.columns)
        orows = [
            tuple(norm(v) for v in row)
            for row in odf[ocols].itertuples(index=False, name=None)
        ]
        ok_cols = scols == ocols
        ok_count = len(srows) == len(orows)
        ok_vals = Counter(srows) == Counter(orows)
        status = "OK   " if (ok_cols and ok_count and ok_vals) else "FAIL "
        print(
            f"{status}{name}: spark={len(srows)} duck={len(orows)} "
            f"cols={'=' if ok_cols else f'{scols} vs {ocols}'} "
            f"vals={'=' if ok_vals else 'MISMATCH'} [{time.time()-t0:.1f}s]"
        )
        if not (ok_cols and ok_count and ok_vals):
            failures.append(name)
            sset, oset = Counter(srows), Counter(orows)
            s_only = list((sset - oset).items())[:3]
            o_only = list((oset - sset).items())[:3]
            print("   spark-only:", s_only)
            print("   duck-only :", o_only)
    print("\nFAILURES:", failures or "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
