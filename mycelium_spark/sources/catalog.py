"""Snapshot-table catalog — the engine's Iceberg stand-in.

The production design targets Iceberg tables (append-only, snapshot
isolation, MERGE for the docs upsert). This sandbox has no Iceberg runtime
jar, so the same contract is provided over parquet directories with
manifest-file snapshots:

* every commit writes data under ``<root>/<table>/s<k>/`` then atomically
  publishes ``manifest-<k>.json`` (file list) and flips the ``_latest``
  pointer with ``os.replace`` — readers only ever see fully-committed
  snapshots, giving the checkpoint/resume semantics the north rule requires;
* ``append`` snapshots reference the previous snapshot's directories plus
  the new one — O(1) metadata, no rewrite (Iceberg-style);
* the crawl round loop commits one snapshot per table per round; resuming
  reads ``_latest`` and continues from the last committed round.

Replaces the reference's MongoDB doc store (Doc::save upsert,
/root/reference/src/common/Doc.cc:15-81) and its filesystem KV store
(bighash.cc). At 100 TB these tables are Iceberg on object storage,
partitioned as noted per table in plans/crawl.py.
"""

from __future__ import annotations

import json
import os
import time
from pyspark.sql import DataFrame, SparkSession


class Catalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # --- snapshot plumbing ---
    def _tdir(self, table: str) -> str:
        d = os.path.join(self.root, table)
        os.makedirs(d, exist_ok=True)
        return d

    def latest_snapshot(self, table: str) -> int:
        p = os.path.join(self.root, table, "_latest")
        try:
            with open(p) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return -1

    def _manifest(self, table: str, snap: int) -> dict:
        with open(os.path.join(self.root, table, f"manifest-{snap}.json")) as f:
            return json.load(f)

    def _publish(self, table: str, snap: int, dirs: list[str], meta: dict | None) -> None:
        tdir = self._tdir(table)
        manifest = {"snapshot": snap, "dirs": dirs, "meta": meta or {}, "ts": time.time()}
        mpath = os.path.join(tdir, f"manifest-{snap}.json")
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)
        lpath = os.path.join(tdir, "_latest")
        tmp = lpath + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(snap))
        os.replace(tmp, lpath)  # atomic commit point

    def commit(
        self,
        table: str,
        df: DataFrame | None,
        mode: str = "append",
        meta: dict | None = None,
    ) -> int:
        """Write ``df`` as a new snapshot; returns the snapshot id.

        ``df=None`` commits a metadata-only snapshot (same data as before).
        """
        tdir = self._tdir(table)
        prev = self.latest_snapshot(table)
        snap = prev + 1
        dirs: list[str] = []
        if mode == "append" and prev >= 0:
            dirs = list(self._manifest(table, prev)["dirs"])
        if df is not None:
            data_dir = os.path.join(tdir, f"s{snap}")
            df.write.mode("overwrite").parquet(data_dir)
            dirs.append(data_dir)
        self._publish(table, snap, dirs, meta)
        return snap

    def read(self, table: str) -> DataFrame | None:
        """Latest committed snapshot as a DataFrame; None if table absent/empty."""
        snap = self.latest_snapshot(table)
        if snap < 0:
            return None
        dirs = self._manifest(table, snap)["dirs"]
        if not dirs:
            return None
        return self.spark.read.parquet(*dirs)

    def meta(self, table: str) -> dict:
        snap = self.latest_snapshot(table)
        if snap < 0:
            return {}
        return self._manifest(table, snap)["meta"]

    def exists(self, table: str) -> bool:
        return self.latest_snapshot(table) >= 0
