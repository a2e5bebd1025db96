"""Iceberg backend (web_graph_spark/iceberg_store.py): the DDL/call
generators are pure functions unit-tested without the runtime jar, and
construction without a configured Iceberg catalog fails with a clear
actionable error (the sandbox ships no Iceberg jar — deploy-only)."""

from __future__ import annotations

import pytest

from web_graph_spark.iceberg_store import (compact_call, ddl,
                                           sort_order_ddl)
from web_graph_spark.storage import BUCKET_KEYS, SCHEMAS


def test_ddl_bucketed_tables_carry_bucket_transform_and_sort():
    for name, key in BUCKET_KEYS.items():
        sql = ddl("crawl", "wg", name, n_buckets=32)
        assert f"CREATE TABLE IF NOT EXISTS crawl.wg.{name}" in sql
        assert "USING iceberg" in sql
        # identity wave partition first, bucket transform on the join key
        assert f"PARTITIONED BY (wave, bucket(32, {key}))" in sql
        so = sort_order_ddl("crawl", "wg", name)
        assert so == (f"ALTER TABLE crawl.wg.{name} "
                      f"WRITE ORDERED BY ({key})")


def test_ddl_small_tables_identity_partition_only():
    for name in SCHEMAS:
        if name in BUCKET_KEYS:
            continue
        sql = ddl("crawl", "wg", name)
        assert "PARTITIONED BY (wave)" in sql, name
        assert "bucket(" not in sql, name
        assert sort_order_ddl("crawl", "wg", name) is None


def test_ddl_declares_every_store_table_schema():
    for name, schema in SCHEMAS.items():
        sql = ddl("c", "n", name)
        assert f"({schema}, wave int)" in sql, name


def test_compact_call_shape():
    sql = compact_call("crawl", "wg", "seen", target_mb=128)
    assert sql.startswith("CALL crawl.system.rewrite_data_files(")
    assert "table => 'wg.seen'" in sql
    assert str(128 * 1024 * 1024) in sql


@pytest.mark.spark
def test_constructor_requires_iceberg_catalog(spark, tmp_path):
    from web_graph_spark.iceberg_store import IcebergWaveStore

    with pytest.raises(RuntimeError, match="Iceberg catalog"):
        IcebergWaveStore(spark, catalog="nope", namespace="wg",
                         manifest_dir=str(tmp_path / "m"))


def test_store_interface_complete_for_crawler():
    """Every store method/attr the crawler touches must exist on BOTH
    backends — the SparkCrawler(store=...) seam is only real if the
    interfaces actually match (the cuckoo GC calls prune_waves every
    wave)."""
    from web_graph_spark.iceberg_store import IcebergWaveStore
    from web_graph_spark.storage import WaveStore

    needed = ["read", "write", "discard", "commit", "manifest",
              "committed_wave", "compact", "prune_waves"]
    for m in needed:
        assert callable(getattr(IcebergWaveStore, m)), m
        assert callable(getattr(WaveStore, m)), m
