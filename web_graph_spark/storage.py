"""Wave-partitioned parquet table store with manifest commits.

Iceberg-lite: every engine table is a directory of parquet files
partitioned by the wave that produced them (``<root>/<table>/wave=N/``),
and a wave is visible only after its JSON manifest is written to
``<root>/_checkpoints/wave-N.json``.  This gives us, with plain parquet:

* atomic-enough wave commits (manifest written last);
* crash recovery: on open, partition dirs beyond the last manifest are
  deleted (a re-run of a half-finished wave is a no-op overwrite);
* partition pruning on ``wave`` for resume / incremental reads;
* snapshot-style time travel (``read(name, max_wave=k)``).

On a real cluster this maps 1:1 onto an Iceberg catalog (append +
snapshot per wave, ``write.target-file-size-bytes`` for file sizing);
the jars are not in this image, so the layout is implemented directly.
Design per SURVEY.md §1.5 / §4 (reference analog: goque LevelDB queue
persistence + Postgres idempotent inserts,
/root/reference/pkg/linkqueue/linkqueue.go:26,
/root/reference/pkg/linkstorage/linkstorage.go:412,493).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

SCHEMAS = {
    "frontier_log": ("page_id string, url string, host string, path string, "
                     "depth int, seq long, parent_page_id string"),
    "seen": "page_id string",
    "pages": "page_id string, host string, path string, url string",
    "edges": "from_page_id string, to_page_id string, text string",
    "crawl_order": "seq long, page_id string",
    "docs_out": ("doc_id string, spans array<struct<kind:string,text:string,"
                 "media_ref:string,offset:int>>"),
    "metrics": ("scope string, partition_id int, key string, value double"),
}


class WaveStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
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
        """Drop partition dirs past the last manifest (crash leftovers)."""
        committed = self.committed_wave()
        for t in SCHEMAS:
            d = os.path.join(self.root, t)
            if not os.path.isdir(d):
                continue
            for sub in os.listdir(d):
                if sub.startswith("wave="):
                    if int(sub.split("=", 1)[1]) > committed:
                        shutil.rmtree(os.path.join(d, sub))

    # -- table io --------------------------------------------------------

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def write(self, name: str, df: DataFrame, wave: int) -> None:
        """(Over)write one wave partition of a table — idempotent, so a
        crashed wave can simply be re-run."""
        out = os.path.join(self._dir(name), f"wave={wave}")
        df.write.mode("overwrite").parquet(out)

    def discard(self, name: str, wave: int) -> None:
        """Drop one (uncommitted) wave partition — used when a wave
        aborts after its first write (e.g. nothing scheduled)."""
        out = os.path.join(self._dir(name), f"wave={wave}")
        if os.path.isdir(out):
            shutil.rmtree(out)

    def read(self, name: str, max_wave: Optional[int] = None) -> DataFrame:
        """Read a table across committed waves (with `wave` column).
        Empty DataFrame with the declared schema if nothing written."""
        d = self._dir(name)
        if max_wave is None:
            max_wave = self.committed_wave()
        if not os.path.isdir(d) or not any(
                s.startswith("wave=") for s in os.listdir(d)):
            from pyspark.sql import functions as F
            return (self.spark.createDataFrame([], SCHEMAS[name])
                    .withColumn("wave", F.lit(None).cast("int")))
        df = self.spark.read.option("basePath", d).parquet(d)
        return df.filter(df["wave"] <= max_wave)
