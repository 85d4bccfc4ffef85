"""Versioned table catalog: parquet directories with atomic snapshot swap.

The reference finishes an index build with an atomic switch to the new files
(``StatefulIndex.switchIndex()``, observed in its integration smoke test).
In production this engine targets Iceberg, whose snapshot commit is atomic by
design; this sandbox has no Iceberg jars, so the catalog reproduces the same
contract over parquet: each write lands in a fresh ``v=<n>`` directory and a
``_CURRENT`` pointer file is swapped with ``os.replace`` (atomic on POSIX).
Readers always see a complete, committed snapshot; a killed build never
corrupts the current index.

Swapping to Iceberg later = replacing ``write``/``read`` bodies with
``df.writeTo(name).createOrReplace()`` / ``spark.read.table(name)``; every
caller is already table-name based.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _table_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _pointer(self, name: str) -> str:
        return os.path.join(self._table_dir(name), "_CURRENT")

    def current_version(self, name: str) -> int | None:
        try:
            with open(self._pointer(name)) as f:
                return json.load(f)["version"]
        except (FileNotFoundError, json.JSONDecodeError, KeyError):
            return None

    def exists(self, name: str) -> bool:
        return self.current_version(name) is not None

    def data_path(self, name: str, version: int | None = None) -> str:
        v = self.current_version(name) if version is None else version
        if v is None:
            raise FileNotFoundError(f"table {name!r} has no committed snapshot")
        return os.path.join(self._table_dir(name), f"v={v}")

    def write(
        self,
        df: DataFrame,
        name: str,
        partition_by: list[str] | None = None,
        meta: dict | None = None,
    ) -> int:
        """Write df as the next snapshot of ``name`` and atomically commit it."""
        tdir = self._table_dir(name)
        os.makedirs(tdir, exist_ok=True)
        cur = self.current_version(name)
        nxt = 0 if cur is None else cur + 1
        path = os.path.join(tdir, f"v={nxt}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        self._commit_pointer(name, nxt, meta)
        if cur is not None:  # retain only the previous snapshot
            for stale in range(cur):
                shutil.rmtree(os.path.join(tdir, f"v={stale}"), ignore_errors=True)
        return nxt

    def _commit_pointer(self, name: str, version: int, meta: dict | None = None):
        tdir = self._table_dir(name)
        payload = {"version": version, "committed_at": time.time(), **(meta or {})}
        fd, tmp = tempfile.mkstemp(dir=tdir, prefix="_current_tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, self._pointer(name))  # the atomic snapshot swap

    def read(self, spark: SparkSession, name: str, version: int | None = None) -> DataFrame:
        return spark.read.parquet(self.data_path(name, version))

    def drop(self, name: str):
        shutil.rmtree(self._table_dir(name), ignore_errors=True)
