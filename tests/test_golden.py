"""Golden-parquet drift guard.

The contract queries whose semantics DuckDB SQL cannot express
(xxhash64/decimal-iteration families: pagerank, hits, minhash ×2,
simhash, ann lsh/pq/ivfpq, media ×2 — see the parametrize list
below) are oracle-checked against golden parquet files frozen
by scripts/make_golden.py from the independently test-pinned paths.
These tests re-run each query at sf0.01 and assert exact row-set
equality with its golden — so any semantic change fails HERE first and
the fix is an explicit, reviewed regeneration (re-run make_golden.py),
never a silently stale oracle.  Passing twice across sessions is also
the determinism evidence the goldens rely on (hash-derived randomness,
per-row float math, exact decimal aggregation).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_CORRECT

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rowset(tbl) -> set[tuple]:
    cols = sorted(tbl.column_names)
    pdf = tbl.select(cols).to_pandas()
    return set(map(tuple, pdf.itertuples(index=False, name=None)))


@pytest.mark.spark
@pytest.mark.parametrize("name", ["graph_pagerank", "graph_hits",
                                  "dedup_minhash",
                                  "dedup_minhash_incremental",
                                  "dedup_simhash", "ann_lsh_topk",
                                  "ann_pq_topk", "ann_ivfpq_topk",
                                  "media_features", "media_decode",
                                  "media_phash", "media_frames",
                                  "media_resize", "media_aphash"])
def test_query_matches_golden(spark, name):
    import __spark_entry__ as entry

    golden_path = os.path.join(REPO, "golden", f"{name}.parquet")
    golden = pq.read_table(golden_path)
    got = entry.queries()[name](spark, SF_CORRECT).toArrow()
    assert sorted(got.column_names) == sorted(golden.column_names)
    for c in golden.column_names:
        assert got.schema.field(c).type == golden.schema.field(c).type, c
    assert got.num_rows == golden.num_rows
    assert _rowset(got) == _rowset(golden)
