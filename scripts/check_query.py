"""Run one (or more) contract queries against their DuckDB oracles at
sf0.01 — the same compare the driver and tests/test_driver_contract.py
apply — without paying the full-suite wall clock.

Usage: python scripts/check_query.py name [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_driver_contract import duck_run, spark_run, value_hash, _norm  # noqa: E402
from tests.conftest import SF_CORRECT  # noqa: E402


def main() -> int:
    import __spark_entry__ as e
    from web_graph_spark.session import get_spark

    names = sys.argv[1:]
    qs, osql = e.queries(), e.oracle_sql()
    spark = get_spark(app="check-query", cores=8, shuffle_partitions=8)
    rc = 0
    for name in names:
        srows, scols = spark_run(qs[name], spark, SF_CORRECT)
        if name not in osql:
            print(f"{name}: rows-only, spark={len(srows)} rows")
            continue
        drows, dcols = duck_run(osql[name], SF_CORRECT)
        ok_cols = sorted(scols) == sorted(dcols)
        ok_rows = len(srows) == len(drows)
        ok_hash = (ok_cols and ok_rows
                   and value_hash(srows, scols) == value_hash(drows, dcols))
        print(f"{name}: spark={len(srows)} oracle={len(drows)} "
              f"cols={'OK' if ok_cols else (sorted(scols), sorted(dcols))} "
              f"hash={'OK' if ok_hash else 'MISMATCH'}")
        if not ok_hash:
            rc = 1
            if ok_cols:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = {tuple(_norm(r[i]) for i in order) for r in srows}
                dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
                dset = {tuple(_norm(r[i]) for i in dorder) for r in drows}
                for side, rows in (("spark-only", sset - dset),
                                   ("oracle-only", dset - sset)):
                    for r in list(rows)[:4]:
                        print(f"  {side}: {r}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
