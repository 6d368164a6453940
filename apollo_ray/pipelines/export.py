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


def pack_sequences(docs: "ray.data.Dataset", seq_len: int = 128,
                   n_shards: int = 16) -> "ray.data.Dataset":
    """(doc_id, shard, n_tokens, first_seq, last_seq) — the
    sequence-packing manifest of a training export: within each hash
    shard, documents concatenate in doc_id order into one continuous
    token stream cut into fixed ``seq_len`` sequences (documents may
    straddle a cut — the standard packed-pretraining layout); the
    manifest records which sequences each document occupies, so a
    loader can materialize any sequence range independently.

    Empty documents occupy no sequence (first_seq = last_seq = -1).
    One shuffle on the shard id (shards = partitions, each shard's
    docs co-located by construction); within a partition the running
    token offset is one sort + ``np.cumsum`` — integer-exact, matching
    the SQL window ``sum() OVER (PARTITION BY shard ORDER BY doc_id)``.
    At web scale a shard is sized to a worker (n_shards grows with the
    corpus; the per-shard state is one cumsum, never the corpus).

    Shard rule: ``md5(doc_id) % n_shards`` (the ``hash_sample`` /
    decontam row-hash bridge — exactly ``md5_number_lower`` in the
    SQL oracle; ``export_shards`` keeps the faster splitmix64 rule,
    which has no overflow-free SQL form).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from apollo_ray.functions.textstats import _split_tokens
    from apollo_ray.kernels.text import _md5_u64

    def tag(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_tok = pc.list_value_length(_split_tokens(text)).cast(pa.int64())
        sh = np.fromiter((_md5_u64(str(i)) % n_shards for i in ids),
                         dtype=np.int64, count=len(ids)).astype(np.int32)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_tokens": n_tok,
            "shard": pa.array(sh, type=pa.int32()),
        })

    def pack_part(group: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "shard": pa.array([], type=pa.int32()),
                          "n_tokens": pa.array([], type=pa.int64()),
                          "first_seq": pa.array([], type=pa.int64()),
                          "last_seq": pa.array([], type=pa.int64())})
        if group.num_rows == 0:
            return empty
        ids = np.asarray(group.column("doc_id"), dtype=np.int64)
        n = np.asarray(group.column("n_tokens"), dtype=np.int64)
        sh = np.asarray(group.column("shard"), dtype=np.int32)
        order = np.lexsort((ids, sh))
        ids, n, sh = ids[order], n[order], sh[order]
        # running offset restarts at each shard boundary (a partition
        # may hold several shards)
        cum = np.cumsum(n)
        first_of_shard = np.empty(len(sh), dtype=bool)
        first_of_shard[0] = True
        first_of_shard[1:] = sh[1:] != sh[:-1]
        base = np.zeros(len(sh), dtype=np.int64)
        starts = np.flatnonzero(first_of_shard)
        offs = np.concatenate(([0], cum[starts[1:] - 1])) \
            if len(starts) > 1 else np.zeros(1, dtype=np.int64)
        base = np.repeat(offs, np.diff(np.append(starts, len(sh))))
        end = cum - base
        start = end - n
        first_seq = np.where(n > 0, start // seq_len, -1)
        last_seq = np.where(n > 0, (end - 1) // seq_len, -1)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "shard": pa.array(sh, type=pa.int32()),
            "n_tokens": pa.array(n, type=pa.int64()),
            "first_seq": pa.array(first_seq, type=pa.int64()),
            "last_seq": pa.array(last_seq, type=pa.int64()),
        })

    return docs.map_batches(tag, batch_format="pyarrow") \
        .groupby("shard").map_groups(pack_part, batch_format="pyarrow")


def export_packed(docs: "ray.data.Dataset", out_dir: str,
                  seq_len: int = 128, n_shards: int = 16) -> dict:
    """Write the ready-to-train packed artifact: per hash shard, the
    doc_id-ordered token stream cut into exact ``seq_len`` windows of
    uint32 token ids (vocab-free hash ids — swap in a learned
    tokenizer's ids upstream if needed), one hive-partitioned parquet
    dir per shard (``shard=K/``), rows (seq_id, token_ids).

    The tail remainder of each shard (< seq_len tokens) is dropped —
    the standard packed-pretraining convention; the
    :func:`pack_sequences` manifest documents exactly which docs feed
    which window.  Same sharding rule as the manifest (md5 of
    doc_id), so the two artifacts line up row-for-row.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from apollo_ray.functions.textstats import _split_tokens
    from apollo_ray.hashing import hash_utf8
    from apollo_ray.kernels.text import _md5_u64

    def tag(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = _split_tokens(text)
        flat = toks.flatten()
        # per-batch-distinct token hashing via dictionary codes
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dict_ids = np.fromiter(
            (hash_utf8(t) & 0xFFFFFFFF for t in
             enc.dictionary.to_pylist()),
            dtype=np.uint32, count=len(enc.dictionary))
        tok_ids = dict_ids[codes] if len(codes) else \
            np.zeros(0, dtype=np.uint32)
        n_tok = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int32)
        sh = np.fromiter((_md5_u64(str(i)) % n_shards for i in ids),
                         dtype=np.int64, count=len(ids)).astype(np.int32)
        offs = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(n_tok, out=offs[1:])
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "shard": pa.array(sh, type=pa.int32()),
            "token_ids": pa.ListArray.from_arrays(
                pa.array(offs, type=pa.int32()),
                pa.array(tok_ids, type=pa.uint32())),
        })

    def pack_shard(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "shard": pa.array([], type=pa.int32()),
            "seq_id": pa.array([], type=pa.int64()),
            "token_ids": pa.array([], type=pa.list_(pa.uint32()))})
        if group.num_rows == 0:
            return empty
        ids = np.asarray(group.column("doc_id"), dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        tl = group.column("token_ids").combine_chunks().take(
            pa.array(order))
        flat = tl.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.uint32)
        n_seq = len(flat) // seq_len
        if n_seq == 0:
            return empty
        kept = flat[:n_seq * seq_len]
        offs = np.arange(n_seq + 1, dtype=np.int32) * seq_len
        sh = int(group.column("shard")[0].as_py())
        return pa.table({
            "shard": pa.array(np.full(n_seq, sh, dtype=np.int32)),
            "seq_id": pa.array(np.arange(n_seq, dtype=np.int64)),
            "token_ids": pa.ListArray.from_arrays(
                pa.array(offs), pa.array(kept, type=pa.uint32())),
        })

    packed = docs.map_batches(tag, batch_format="pyarrow") \
        .groupby("shard").map_groups(pack_shard, batch_format="pyarrow")
    packed.write_parquet(out_dir, partition_cols=["shard"])
    import ray.data as _rd
    written = _rd.read_parquet(out_dir)
    return {"out_dir": out_dir, "n_sequences": written.count(),
            "seq_len": seq_len, "n_shards": n_shards}
