"""Checkpointed Parquet stage boundaries.

The reference persists every stage into Cassandra tables + asdf models
(``apollo/cassandra_utils.py:74-86``, ``doc/GLOSSARY.md``); here each
stage boundary is a Parquet directory under one checkpoint root:

    <ckpt>/<stage>/part-*.parquet    the data (many files => resumable,
                                     parallel read, never one giant file)
    <ckpt>/<stage>/_SUCCESS.json     lineage manifest: config hash,
                                     input fingerprint, row count,
                                     wall time, stage metrics

``run``-style orchestration re-executes a stage only when its manifest
is missing or its (config_hash, input fingerprint) differs — the
explicit resumability the north rule asks for.  ``reset`` is the
analog of apollo's ``resetdb`` (``apollo/cassandra_utils.py:59-86``).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any

import ray.data


def stage_dir(ckpt_root: str, stage: str) -> str:
    return os.path.join(ckpt_root, stage)


def manifest_path(ckpt_root: str, stage: str) -> str:
    return os.path.join(ckpt_root, stage, "_SUCCESS.json")


def is_complete(ckpt_root: str, stage: str, config_hash: str,
                input_fingerprint: str = "") -> bool:
    try:
        with open(manifest_path(ckpt_root, stage)) as f:
            m = json.load(f)
        return (m.get("config_hash") == config_hash
                and m.get("input_fingerprint", "") == input_fingerprint)
    except (OSError, ValueError):
        return False


def write_stage(ds: "ray.data.Dataset", ckpt_root: str, stage: str,
                config_hash: str, input_fingerprint: str = "",
                metrics: dict[str, Any] | None = None) -> "ray.data.Dataset":
    """Write a stage checkpoint atomically and return a reader Dataset.

    Writes into ``<stage>.tmp`` then renames, so a crashed run never
    leaves a half-written directory that looks complete.
    """
    out = stage_dir(ckpt_root, stage)
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    t0 = time.monotonic()
    ds.write_parquet(tmp)
    wall = time.monotonic() - t0
    n_files = len([f for f in os.listdir(tmp) if f.endswith(".parquet")])
    man = {
        "stage": stage,
        "config_hash": config_hash,
        "input_fingerprint": input_fingerprint,
        "wall_sec": round(wall, 3),
        "n_files": n_files,
        "metrics": metrics or {},
        "ts": time.time(),
    }
    with open(os.path.join(tmp, "_SUCCESS.json"), "w") as f:
        json.dump(man, f, indent=1)
    shutil.rmtree(out, ignore_errors=True)
    os.replace(tmp, out)
    return read_stage(ckpt_root, stage)


class StageWrite:
    """Handle for an in-flight background checkpoint write (see
    :func:`write_stage_async`).  ``wait()`` blocks until the Parquet
    files and manifest are durable, re-raising any write error."""

    def __init__(self, thread, err: list):
        self._thread = thread
        self._err = err

    def wait(self) -> None:
        self._thread.join()
        if self._err:
            raise self._err[0]


def write_stage_async(ds: "ray.data.Dataset", ckpt_root: str, stage: str,
                      config_hash: str, input_fingerprint: str = "",
                      metrics: dict[str, Any] | None = None
                      ) -> tuple["ray.data.Dataset", StageWrite]:
    """Write-through checkpointing: materialize the stage once, hand
    the materialized dataset straight to the next stage, and persist
    the Parquet copy in a BACKGROUND thread (writing a materialized
    dataset only re-reads object-store blocks — no recompute, no race
    with downstream consumers).  The manifest lands after the files,
    so a crash mid-write never looks complete; callers must ``wait()``
    every returned handle before declaring the run finished (the
    write-then-read serial barrier this replaces was a measured part
    of the pipeline's Amdahl floor)."""
    import threading

    mat = ds.materialize()
    err: list = []

    def _persist():
        try:
            write_stage(mat, ckpt_root, stage, config_hash,
                        input_fingerprint, metrics)
        except BaseException as e:  # surfaced by wait()
            err.append(e)

    th = threading.Thread(target=_persist, daemon=True,
                          name="ckpt-write-%s" % stage)
    th.start()
    return mat, StageWrite(th, err)


def read_stage(ckpt_root: str, stage: str, columns: list[str] | None = None
               ) -> "ray.data.Dataset":
    """Read a stage: its top-level part files plus any appended
    ``shard-*/`` subdirectories (see :func:`append_stage`)."""
    d = stage_dir(ckpt_root, stage)
    if not os.path.isdir(d):
        raise FileNotFoundError(
            "checkpoint stage '%s' not found under %s — run "
            "`apollo_ray.cli run --ckpt %s ...` first (stages present: %s)"
            % (stage, ckpt_root, ckpt_root,
               sorted(os.listdir(ckpt_root))
               if os.path.isdir(ckpt_root) else "none"))
    files = [os.path.join(d, f) for f in sorted(os.listdir(d))
             if f.endswith(".parquet")]
    for sub in sorted(os.listdir(d)):
        subd = os.path.join(d, sub)
        if sub.startswith("shard-") and os.path.isdir(subd):
            files += [os.path.join(subd, f) for f in sorted(os.listdir(subd))
                      if f.endswith(".parquet")]
    return ray.data.read_parquet(files, columns=columns)


def has_shard(ckpt_root: str, stage: str, shard_fp: str) -> bool:
    return os.path.isdir(os.path.join(stage_dir(ckpt_root, stage),
                                      "shard-" + shard_fp))


def append_stage(ds: "ray.data.Dataset", ckpt_root: str, stage: str,
                 shard_fp: str) -> None:
    """Append one shard's rows to an existing stage checkpoint as an
    atomically-renamed ``shard-<fp>/`` subdirectory (the analog of the
    reference appending rows to its Cassandra tables — new corpus
    increments extend ``bags``/``hashes``/``hashtables`` in place,
    ``apollo/bags.py:20-25``, ``apollo/hasher.py:181-203``).

    Idempotent per (stage, shard_fp): an existing shard dir is left
    untouched.  The manifest gains the shard fp in a ``shards`` list;
    a crash between rename and manifest update leaves readable data
    whose next append attempt is a no-op, so re-running the append is
    always safe.
    """
    out = os.path.join(stage_dir(ckpt_root, stage), "shard-" + shard_fp)
    if os.path.isdir(out):
        return
    if not os.path.isdir(stage_dir(ckpt_root, stage)):
        raise FileNotFoundError(
            "cannot append to missing stage '%s' under %s" % (stage, ckpt_root))
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    ds.write_parquet(tmp)
    os.replace(tmp, out)
    try:
        man = read_manifest(ckpt_root, stage)
    except (OSError, ValueError):
        man = {"stage": stage}
    man.setdefault("shards", []).append(shard_fp)
    with open(manifest_path(ckpt_root, stage), "w") as f:
        json.dump(man, f, indent=1)


def read_manifest(ckpt_root: str, stage: str) -> dict[str, Any]:
    with open(manifest_path(ckpt_root, stage)) as f:
        return json.load(f)


def reset(ckpt_root: str, stages: list[str] | None = None) -> None:
    """Drop stage checkpoints (all, or a subset — the ``--hashes-only``
    analog of ``apollo/cassandra_utils.py:66-73``)."""
    if stages is None:
        shutil.rmtree(ckpt_root, ignore_errors=True)
        return
    for s in stages:
        shutil.rmtree(stage_dir(ckpt_root, s), ignore_errors=True)


def read_pages(path: str, columns: list[str] | None = None,
               lang_filter: list[str] | None = None,
               num_blocks: int | None = None) -> "ray.data.Dataset":
    """Read a Common-Crawl-style ``pages`` Parquet table.

    Column pruning happens at the read; the language filter (the M1
    analog of apollo's ``-l`` flag, ``doc/cmd/bags.md:8``) is pushed
    down as a row filter so non-matching row groups never leave storage.

    For local many-file corpora the read defaults to ONE task per
    file: letting Ray split files into sub-file read tasks made each
    split task decode the whole file again (measured 3x slower on a
    2M-row 16-file extract at 32 CPUs) — read parallelism should come
    from the physical file layout, which is how a 100 TB corpus is
    shaped anyway.  Pass ``num_blocks`` to override.
    """
    import pyarrow.compute as pc
    # JSONL dumps route through the normalizing reader (auto-detected
    # by extension so `cli run --input dump.jsonl` just works)
    if isinstance(path, str) and (
            path.endswith((".jsonl", ".json"))
            or (os.path.isdir(path)
                and any(f.endswith((".jsonl", ".json"))
                        for f in os.listdir(path))
                and not any(f.endswith(".parquet")
                            for f in os.listdir(path)))):
        ds = read_pages_jsonl(path, lang_filter=lang_filter)
        return ds.select_columns(columns) if columns else ds
    kwargs: dict[str, Any] = {}
    if columns:
        kwargs["columns"] = columns
    if lang_filter:
        kwargs["filter"] = pc.field("lang").isin(lang_filter)
    if num_blocks is None and isinstance(path, str) and os.path.isdir(path):
        n = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
        num_blocks = n or None
    if num_blocks:
        kwargs["override_num_blocks"] = num_blocks
    return ray.data.read_parquet(path, **kwargs)


def read_pages_jsonl(path: str,
                     lang_filter: list[str] | None = None
                     ) -> "ray.data.Dataset":
    """Read a JSONL crawl dump (one object per line with at least
    ``url`` and ``text``; optional ``warc_ts`` (ISO-8601 or epoch
    seconds), ``html``, ``lang``) and normalize it to the ``pages``
    schema the pipeline expects — WET-style ingestion for corpora that
    arrive as JSON lines instead of Parquet.

    Missing fields are synthesized deterministically: html wraps text
    (the fixture rule), warc_ts defaults to epoch 0, lang to 'und'.
    The language filter applies AFTER normalization (JSONL has no
    row-group pushdown).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    import numpy as np

    ds = ray.data.read_json(path)

    def normalize(batch: pa.Table) -> pa.Table:
        cols = set(batch.column_names)
        if "url" not in cols or "text" not in cols:
            raise ValueError("pages JSONL needs url and text fields")
        n = batch.num_rows
        url = batch.column("url").cast(pa.string())
        text = batch.column("text").cast(pa.string())
        if "warc_ts" in cols:
            ts_col = batch.column("warc_ts")
            if pa.types.is_timestamp(ts_col.type):
                ts = ts_col.cast(pa.timestamp("us"))
            elif pa.types.is_integer(ts_col.type) or \
                    pa.types.is_floating(ts_col.type):
                us = (np.asarray(ts_col.cast(pa.float64()))
                      * 1_000_000).astype(np.int64)
                ts = pa.array(us, type=pa.int64()).cast(pa.timestamp("us"))
            else:
                ts = pc.strptime(ts_col.cast(pa.string()),
                                 format="%Y-%m-%dT%H:%M:%S",
                                 unit="us")
        else:
            ts = pa.array(np.zeros(n, dtype=np.int64),
                          type=pa.int64()).cast(pa.timestamp("us"))
        if "html" in cols and pa.types.is_binary(batch.column("html").type):
            html = batch.column("html")
        elif "html" in cols:
            html = batch.column("html").cast(pa.string()).cast(pa.binary())
        else:
            from apollo_ray.fixtures import _wrap_html
            html = pa.array([_wrap_html(t, i) for i, t in
                             enumerate(text.to_pylist())],
                            type=pa.binary())
        lang = (batch.column("lang").cast(pa.string()) if "lang" in cols
                else pa.array(["und"] * n, type=pa.string()))
        out = pa.table({"url": url, "warc_ts": ts, "html": html,
                        "text": text, "lang": lang})
        if lang_filter:
            out = out.filter(pc.is_in(out.column("lang"),
                                      value_set=pa.array(lang_filter)))
        return out

    return ds.map_batches(normalize, batch_format="pyarrow")
