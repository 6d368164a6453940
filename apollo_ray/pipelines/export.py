"""Training-shard export: the last step of a curation flow.

Writes a docs Dataset as ``n_shards`` hash-partitioned Parquet
directories (``shard=K/``) in ONE streaming pass — the layout a
training loader consumes (deterministic shard membership, any shard
readable independently).  Shard assignment is ``splitmix64(key) %
n_shards``: vectorized, seed-free, and stable across runs/machines, so
re-exporting an updated corpus moves only rows whose ids changed.  A
``_MANIFEST.json`` records per-shard row counts + the export config;
re-running with the same config and input count is a no-op (coarse
resumability — the write itself is a single atomic-enough pass; for
per-stage resume use the dedup checkpoints upstream).

The reference's closest analog is the ``bow*.asdf`` batch splitter
(2 GB chunks, ``doc/101.md:16``, ``apollo/hasher.py:137``) — a
size-based local split; this is its distributed, key-deterministic
replacement.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import pyarrow as pa

import ray.data

from apollo_ray.hashing import splitmix64

MANIFEST = "_MANIFEST.json"


def shard_of(ids: np.ndarray, n_shards: int) -> np.ndarray:
    """Deterministic shard id per key (int32)."""
    x = splitmix64(np.asarray(ids).astype(np.uint64))
    return (x % np.uint64(n_shards)).astype(np.int32)


def export_shards(docs: "ray.data.Dataset", out_dir: str, n_shards: int,
                  key: str = "doc_id",
                  columns: list[str] | None = None) -> dict[str, Any]:
    """Write ``docs`` as hash-sharded Parquet; returns the manifest
    (``{"n_shards", "rows", "per_shard": {shard: rows}}``).

    Skips the write entirely when an existing manifest matches
    (same n_shards/key/total rows)."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if columns is not None:
        docs = docs.select_columns(columns)
    elif "shard" in docs.schema().names:
        # re-sharding a previous export: the stale assignment (file
        # column or hive-path field) must not collide with the new one
        docs = docs.drop_columns(["shard"])

    def add_shard(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(key), dtype=np.int64)
        return batch.append_column(
            "shard", pa.array(shard_of(ids, n_shards), type=pa.int32()))

    # cheap pre-count for the resume check (metadata-only on a plain
    # parquet read; one pass otherwise)
    n_rows = docs.count()
    man_path = os.path.join(out_dir, MANIFEST)
    if os.path.exists(man_path):
        with open(man_path) as f:
            old = json.load(f)
        if (old.get("n_shards") == n_shards and old.get("key") == key
                and old.get("rows") == n_rows):
            old["cached"] = True
            return old

    manifest: dict[str, Any] = {"n_shards": n_shards, "key": key,
                                "rows": n_rows, "per_shard": {}}
    if n_rows > 0:
        # ONE streaming pass writes everything; per-shard counts come
        # from the written parquet footers (metadata-only), never a
        # second compute of the input
        docs.map_batches(add_shard, batch_format="pyarrow") \
            .write_parquet(out_dir, partition_cols=["shard"])
        import pyarrow.parquet as pq
        per: dict[int, int] = {}
        for name in sorted(os.listdir(out_dir)):
            if not name.startswith("shard="):
                continue
            sid = int(name.split("=", 1)[1])
            sdir = os.path.join(out_dir, name)
            per[sid] = sum(
                pq.ParquetFile(os.path.join(sdir, fn)).metadata.num_rows
                for fn in os.listdir(sdir) if fn.endswith(".parquet"))
        manifest["per_shard"] = {str(k): v for k, v in sorted(per.items())}
    os.makedirs(out_dir, exist_ok=True)
    with open(man_path, "w") as f:
        json.dump(manifest, f)
    return manifest


def read_shard(out_dir: str, shard: int) -> "ray.data.Dataset":
    """One shard back as a Dataset (hive-partitioned path), with the
    synthetic ``shard`` column dropped — callers get the original
    schema back."""
    ds = ray.data.read_parquet(os.path.join(out_dir, "shard=%d" % shard))
    if "shard" in ds.schema().names:
        ds = ds.drop_columns(["shard"])
    return ds
