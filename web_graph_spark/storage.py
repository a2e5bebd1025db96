"""Wave-partitioned table store with manifest commits.

Iceberg-lite: every engine table is a directory of parquet files
partitioned by the wave that produced them (``<root>/<table>/wave=N/``),
and a wave is visible only after its JSON manifest is written to
``<root>/_checkpoints/wave-N.json``.  This gives us, with plain parquet:

* atomic-enough wave commits (manifest written last);
* crash recovery: on open, partition dirs beyond the last manifest are
  deleted (a re-run of a half-finished wave is a no-op overwrite);
* partition pruning on ``wave`` for resume / incremental reads;
* snapshot-style time travel (``read(name, max_wave=k)``).

``bucketed=True`` additionally stores the BIG immutable sides —
``seen``, ``frontier_log``, ``pages``, ``edges`` — as catalog tables
partitioned by wave AND bucketed+sorted by their join key
(``CLUSTERED BY (key) SORTED BY (key) INTO n BUCKETS``).  The per-wave
anti-joins those tables feed are the one stage whose shuffle volume
grows with accumulated state (10^10 rows at target scale;
BENCH/BASELINE.md identifies that shuffle as the single-box scaling
ceiling).  With both sides bucket-aligned the planner emits a
SortMergeJoin with ZERO Exchange on the stored side(s) — per-wave
shuffle cost becomes proportional to the wave, not to |state|.  On a
real deployment this is the Iceberg partition/sort spec
``bucket(N, page_id)`` (SURVEY.md §4); locally it is parquet
``bucketBy`` through ``saveAsTable`` (bucketed scans require catalog
tables — plain ``.parquet(path)`` reads discard bucket metadata).
Table data still lives under the store root (``option("path")``), the
catalog entry is re-created on open (fresh session resume), and wave
partitions are dropped via ``ALTER TABLE .. DROP PARTITION`` during
crash cleanup — manifest semantics are identical in both layouts.

Keys are sha1 hex (uniform by construction): no bucket skew.
Reference analog: goque LevelDB queue persistence + Postgres
idempotent inserts + indexes
(/root/reference/pkg/linkqueue/linkqueue.go:26,
/root/reference/pkg/linkstorage/linkstorage.go:119-131,412,493).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCHEMAS = {
    "frontier_log": ("page_id string, url string, host string, path string, "
                     "depth int, seq long, parent_page_id string"),
    "seen": "page_id string",
    "pages": "page_id string, host string, path string, url string",
    "edges": ("from_page_id string, to_page_id string, text string, "
              "edge_id string"),
    "crawl_order": "seq long, page_id string",
    "docs_out": ("doc_id string, spans array<struct<kind:string,text:string,"
                 "media_ref:string,offset:int>>"),
    "metrics": ("scope string, partition_id int, key string, value double"),
    # partitioned-cuckoo seen tier: full shard-blob state set per wave
    # (replacement, not delta) — the per-partition checkpoint payload
    "cuckoo_state": "shard int, n_keys long, state binary",
}

# join key each big table is bucketed on (edge_id = from||to — the
# composite anti-join key stored as one column so the bucketed scan's
# partitioning matches the join exactly; concat of fixed-width sha1
# hex is injective).
BUCKET_KEYS = {
    "seen": "page_id",
    "frontier_log": "page_id",
    "pages": "page_id",
    "edges": "edge_id",
}


def _schema_columns(schema: str) -> list[str]:
    """Column names of a DDL schema string (commas inside angle
    brackets — nested struct/array types — don't split)."""
    cols, depth, start = [], 0, 0
    for i, ch in enumerate(schema + ","):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            cols.append(schema[start:i].strip().split()[0])
            start = i + 1
    return cols


class WaveStore:
    def __init__(self, spark: SparkSession, root: str,
                 bucketed: bool = False, n_buckets: int = 32):
        self.spark = spark
        self.root = root
        self.bucketed = bucketed
        self.n_buckets = n_buckets
        digest = hashlib.md5(os.path.abspath(root).encode()).hexdigest()[:10]
        self._tbl_prefix = f"wgs_{digest}_"
        os.makedirs(self._ckpt_dir, exist_ok=True)
        self.cleanup_uncommitted()

    # -- checkpoints -----------------------------------------------------

    @property
    def _ckpt_dir(self) -> str:
        return os.path.join(self.root, "_checkpoints")

    def committed_wave(self) -> int:
        """Highest wave with a manifest; -2 if none (fresh store).
        Wave -1 is the seed-init commit; crawl waves are 0-based."""
        waves = [int(f[5:-5]) for f in os.listdir(self._ckpt_dir)
                 if f.startswith("wave-") and f.endswith(".json")]
        return max(waves, default=-2)

    def manifest(self, wave: int) -> Optional[dict]:
        p = os.path.join(self._ckpt_dir, f"wave-{wave}.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def commit(self, wave: int, **extra) -> None:
        tmp = os.path.join(self._ckpt_dir, f".wave-{wave}.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"wave": wave, **extra}, f)
        os.replace(tmp, os.path.join(self._ckpt_dir, f"wave-{wave}.json"))

    def cleanup_uncommitted(self) -> None:
        """Drop partition dirs past the last manifest (crash leftovers).
        Readers must therefore never scan paths directly without the
        wave filter; mid-session an uncommitted wave=N dir MAY exist
        between a write and its commit (read() always bounds by the
        committed wave unless told otherwise)."""
        committed = self.committed_wave()
        for t in SCHEMAS:
            d = os.path.join(self.root, t)
            if not os.path.isdir(d):
                continue
            for sub in os.listdir(d):
                if sub.startswith("wave="):
                    w = int(sub.split("=", 1)[1])
                    if w > committed:
                        self._drop_partition(t, w)

    # -- bucketed-catalog plumbing ----------------------------------------

    def _table_name(self, name: str) -> str:
        return self._tbl_prefix + name

    def _is_bucketed(self, name: str) -> bool:
        return self.bucketed and name in BUCKET_KEYS

    def _ensure_registered(self, name: str) -> bool:
        """Make sure the catalog entry for a bucketed table exists and
        points at live files; returns False if the table has no data
        yet.  Handles fresh-session resume (re-create + repair) and
        stale entries left by a deleted store root."""
        tbl = self._table_name(name)
        loc = self._dir(name)
        has_data = os.path.isdir(loc) and any(
            s.startswith("wave=") for s in os.listdir(loc))
        if self.spark.catalog.tableExists(tbl):
            if has_data:
                return True
            self.spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            return False
        if not has_data:
            return False
        key = BUCKET_KEYS[name]
        self.spark.sql(
            f"CREATE TABLE {tbl} ({SCHEMAS[name]}) USING PARQUET "
            f"PARTITIONED BY (wave int) "
            f"CLUSTERED BY ({key}) SORTED BY ({key}) "
            f"INTO {self.n_buckets} BUCKETS "
            f"LOCATION '{loc}'")
        self.spark.sql(f"MSCK REPAIR TABLE {tbl}")
        return True

    def _drop_partition(self, name: str, wave: int) -> None:
        """Remove one wave partition: catalog metadata (if bucketed and
        registered) AND the files."""
        if self._is_bucketed(name) and self.spark.catalog.tableExists(
                self._table_name(name)):
            self.spark.sql(
                f"ALTER TABLE {self._table_name(name)} "
                f"DROP IF EXISTS PARTITION (wave={wave})")
        out = os.path.join(self._dir(name), f"wave={wave}")
        if os.path.isdir(out):
            shutil.rmtree(out)

    # -- table io --------------------------------------------------------

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def write(self, name: str, df: DataFrame, wave: int) -> None:
        """(Over)write one wave partition of a table — idempotent, so a
        crashed wave can simply be re-run."""
        if self._is_bucketed(name):
            key = BUCKET_KEYS[name]
            self._ensure_registered(name)
            self._drop_partition(name, wave)  # idempotent re-run
            # repartition on the bucket key first: each task then owns
            # whole buckets, so a wave adds n_buckets files, not
            # n_tasks × n_buckets (v1 bucketed writes don't shuffle on
            # their own).
            (df.withColumn("wave", F.lit(wave))
               .repartition(self.n_buckets, key)
               .write.partitionBy("wave")
               .bucketBy(self.n_buckets, key).sortBy(key)
               .option("path", self._dir(name))
               .mode("append").format("parquet")
               .saveAsTable(self._table_name(name)))
            return
        out = os.path.join(self._dir(name), f"wave={wave}")
        df.write.mode("overwrite").parquet(out)

    def discard(self, name: str, wave: int) -> None:
        """Drop one (uncommitted) wave partition — used when a wave
        aborts after its first write (e.g. nothing scheduled)."""
        self._drop_partition(name, wave)

    def read(self, name: str, max_wave: Optional[int] = None) -> DataFrame:
        """Read a table across committed waves (with `wave` column) in
        the canonical SCHEMAS column order — writers may reorder (e.g.
        a USING join moves its key first) and a re-registered catalog
        table uses the declared order, so readers get one stable
        contract.  Empty DataFrame with the declared schema if nothing
        written."""
        cols = _schema_columns(SCHEMAS[name]) + ["wave"]
        if max_wave is None:
            max_wave = self.committed_wave()
        if self._is_bucketed(name):
            if self._ensure_registered(name):
                t = self.spark.table(self._table_name(name))
                return t.filter(t["wave"] <= max_wave).select(*cols)
            return (self.spark.createDataFrame([], SCHEMAS[name])
                    .withColumn("wave", F.lit(None).cast("int")))
        d = self._dir(name)
        if not os.path.isdir(d) or not any(
                s.startswith("wave=") for s in os.listdir(d)):
            return (self.spark.createDataFrame([], SCHEMAS[name])
                    .withColumn("wave", F.lit(None).cast("int")))
        df = self.spark.read.option("basePath", d).parquet(d)
        return df.filter(df["wave"] <= max_wave).select(*cols)
