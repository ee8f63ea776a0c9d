"""Mimic the driver's correctness gate: run each __spark_entry__.queries()
entry on Spark and its oracle_sql() twin on DuckDB at the given sf dir,
compare row count, column names, and an order-insensitive value hash.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon = sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for row in canon:
        h.update(repr(row).encode())
    return h.hexdigest()[:16]


def _norm(v):
    if isinstance(v, float):
        return round(v, 9)
    # pandas Timestamp vs datetime.datetime: same value, different repr.
    # The driver gate treats them as equal (events_hourly was green in r2),
    # so normalize to datetime here.
    if hasattr(v, "to_pydatetime"):
        return v.to_pydatetime()
    return v


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from lsh_project_spark.session import get_spark

    spark = get_spark(app="check_correctness", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t1 = time.time()
        if name not in oracles:
            print(f"  {name}: rows={len(srows)} (rows-only check) spark={t1-t0:.1f}s")
            continue
        cur = con.execute(oracles[name])
        # Faithful to the driver's canonicalizer: materialize DuckDB results
        # through pandas, so dtype artifacts (e.g. HUGEINT -> float64) show
        # up HERE, not only in the driver gate.  Series.tolist() yields the
        # Python type the pandas dtype implies (int64 -> int, float64 ->
        # float), exactly the divergence class that made event_sessions red
        # in round 2 while fetchall()-based local checks stayed green.
        ddf = cur.fetchdf()
        dcols = list(ddf.columns)
        dcol_lists = [ddf[c].tolist() for c in dcols]
        drows = [tuple(vals) for vals in zip(*dcol_lists)] if dcols else []
        t2 = time.time()
        ok_n = len(srows) == len(drows)
        ok_c = sorted(scols) == sorted(dcols)
        ok_v = ok_n and ok_c and value_hash(srows, scols) == value_hash(drows, dcols)
        status = "OK" if (ok_n and ok_c and ok_v) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"  {name}: {status} rows={len(srows)}/{len(drows)} cols={ok_c} "
            f"hash={ok_v} spark={t1-t0:.1f}s duck={t2-t1:.1f}s"
        )
        if not ok_c:
            print(f"    spark cols: {scols}\n    duck cols:  {dcols}")
        if ok_n and ok_c and not ok_v:
            # show first divergent row for debugging
            ss = sorted(srows)
            dd = sorted(drows)
            for a, b in zip(ss, dd):
                if a != b:
                    print(f"    spark: {a}\n    duck:  {b}")
                    break
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
