"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, compare row count + column names + order-insensitive value
hash.  Catches contract drift before the driver does."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from tests.conftest import SF_CORRECT, SF_SMOKE

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _norm(v):
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def duck_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cur.fetchall(), cols


def spark_run(fn, spark, sf_dir):
    df = fn(spark, sf_dir)
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return rows, cols


@pytest.mark.spark
def test_all_queries_match_oracle(spark):
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    missing_oracle = [k for k in qs if k not in osql]
    failures = []
    for name, fn in qs.items():
        srows, scols = spark_run(fn, spark, SF_CORRECT)
        if name not in osql:
            if len(srows) == 0:
                failures.append(f"{name}: rows-only check, 0 rows")
            continue
        drows, dcols = duck_run(osql[name], SF_CORRECT)
        if sorted(scols) != sorted(dcols):
            failures.append(f"{name}: cols {sorted(scols)} != {sorted(dcols)}")
            continue
        if len(srows) != len(drows):
            failures.append(f"{name}: rowcount {len(srows)} != {len(drows)}")
            continue
        if value_hash(srows, scols) != value_hash(drows, dcols):
            sset = {tuple(_norm(v) for v in r) for r in srows}
            dset = {tuple(_norm(v) for v in r) for r in drows}
            diff = list(sset ^ dset)[:4]
            failures.append(f"{name}: value hash mismatch; e.g. {diff}")
    assert not failures, "\n".join(failures)
    # informational: queries relying on the weaker rows-only check
    print("rows-only (no oracle):", missing_oracle)


@pytest.mark.spark
def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"wave", "seq", "page_id", "host", "url"} <= set(df.columns)
