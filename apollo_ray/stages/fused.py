"""Fused hashing stage: reps -> (band_id, bucket, doc_id) in one pass.

The staged path (bags -> wmh -> bands) exists for checkpointing and for
the verify tier (which needs the bags as a standalone dataset).  When
neither is required, running all three per-doc transforms in one fused
stage removes two stage boundaries and all intermediate block traffic.
The math is byte-identical: the same ``doc_to_bag`` -> ``wmh_batch_t``
-> ``bucket_keys`` kernels in the same order (asserted by
tests/test_fused.py against the staged path).

Execution model: **stateless tasks with per-worker-process cached
state**, not an actor pool.  Ray reuses its long-lived worker processes
across tasks, so the first task on each worker builds the state once
(params via zero-copy ``ray.get`` of the broadcast ObjectRef, token
memo, kernel work buffers) and every later task on that worker reuses
it — the same amortization an actor pool gives, WITHOUT spawning a new
process per actor.  On hosts where process creation + first-touch
memory faults are expensive (virtualized nodes), a 31-actor pool spends
more wall time warming up than hashing; tasks scale elastically to
exactly the CPUs available at each moment.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from apollo_ray.config import DedupConfig
from apollo_ray.hashing import TokenHasher
from apollo_ray.kernels.text import (bag_from_token_hashes,
                                     batch_token_hashes, tokenize)
from apollo_ray.kernels.minhash import make_minhash_buffers
from apollo_ray.kernels.wmh import make_work_buffers, wmh_batch_t
from apollo_ray.stages.bands import band_params, bucket_keys

# per-worker-process state cache: {config_hash: state dict}
_WORKER_STATE: dict = {}
_FUSED_NNZ_BUDGET = 1 << 14  # small buffers: cheap first-touch per worker


def _get_state(cfg: DedupConfig, params_ref, df_ref=None) -> dict:
    key = cfg.config_hash()
    st = _WORKER_STATE.get(key)
    if st is None:
        import ray
        from apollo_ray.stages.bags import effective_min_df
        df = ray.get(df_ref) if df_ref is not None else None
        st = {
            "hasher": TokenHasher(seed=cfg.seed),
            "dparams": ray.get(params_ref),   # zero-copy plasma read
            "df": df,
            "min_df": (effective_min_df(df, cfg) if df is not None
                       else cfg.min_docfreq),
            "bufs": make_work_buffers(cfg.size, _FUSED_NNZ_BUDGET),
            "mh_bufs": (make_minhash_buffers()
                        if cfg.minhash_mode == "unweighted" else None),
            "band": band_params(cfg),
        }
        _WORKER_STATE.clear()                 # one config per worker
        _WORKER_STATE[key] = st
    return st


def fused_hash_batch(batch: pa.Table, cfg: DedupConfig, params_ref,
                     df_ref=None, ndocs: int = 0,
                     pkey_partitions: int = 0,
                     pkey_salt: int = 1,
                     emit_band_id: bool = True) -> pa.Table:
    """``pkey_partitions > 0`` additionally emits the salted bucket
    partition key (identical math to ``edges._add_salted_pkey``) so the
    downstream bucket groupby needs no extra pass over the band table.

    ``emit_band_id=False`` drops the ``band_id`` column from the
    emitted rows: the band index is already folded into the bucket key
    (``bands.bucket_keys`` leading lane), so the edge/CC/communities
    consumers never read it — only ``bucket_stats`` (per-hashtable
    gates) does.  On the checkpoint-free flagship path that removes
    4 of 24 bytes/row from the corpus-wide bucket shuffle."""
    st = _get_state(cfg, params_ref, df_ref)
    hasher = st["hasher"]
    htnum, band_size = st["band"]
    doc_ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
    bag_kwargs = dict(cfg.bag_kwargs)
    tokenizer = bag_kwargs.pop("tokenizer")
    if (tokenizer in ("whitespace", "bpe_ish")
            and not bag_kwargs.get("extra_ks")):
        # single-family fast path: whole-batch vectorized shingling +
        # one np.unique (kernels/text.batch_bags_from_token_hashes,
        # elementwise identical to the per-doc loop below)
        from apollo_ray.kernels.text import batch_bags_from_token_hashes
        th_flat, offs = batch_token_hashes(batch.column("text"), hasher,
                                           tokenizer=tokenizer)
        fw = bag_kwargs.get("family_weights")
        counts, all_idx, all_w = batch_bags_from_token_hashes(
            th_flat, offs, cfg.shingle_k, cfg.feature_dim_log2,
            weighting=bag_kwargs.get("weighting", "logtf"),
            fam_w=(fw[0] if fw else 1.0),
            df=st["df"], ndocs=ndocs, min_df=st["min_df"])
        keep_rows = np.flatnonzero(counts > 0)
        indptr_np = np.zeros(len(keep_rows) + 1, dtype=np.int64)
        np.cumsum(counts[keep_rows], out=indptr_np[1:])
        idx_flat, w_flat = all_idx, all_w
    else:
        if tokenizer in ("whitespace", "bpe_ish"):
            th_flat, offs = batch_token_hashes(batch.column("text"), hasher,
                                               tokenizer=tokenizer)
            th_of = [th_flat[offs[i]:offs[i + 1]]
                     for i in range(batch.num_rows)]
        else:
            texts = batch.column("text").to_pylist()
            th_of = [hasher.hash_tokens(tokenize(t, tokenizer))
                     for t in texts]
        indptr = [0]
        idx_parts: list[np.ndarray] = []
        w_parts: list[np.ndarray] = []
        keep_list: list[int] = []
        for i in range(batch.num_rows):
            idx, w = bag_from_token_hashes(
                th_of[i], cfg.shingle_k, cfg.feature_dim_log2,
                df=st["df"], ndocs=ndocs, min_df=st["min_df"], **bag_kwargs)
            if len(idx) == 0:
                continue  # empty docs cannot be hashed (apollo/hasher.py:245)
            keep_list.append(i)
            idx_parts.append(idx)
            w_parts.append(w)
            indptr.append(indptr[-1] + len(idx))
        keep_rows = np.asarray(keep_list, dtype=np.int64)
        indptr_np = np.asarray(indptr, dtype=np.int64)
        if len(keep_rows):
            idx_flat = np.concatenate(idx_parts)
            w_flat = np.concatenate(w_parts)
    if len(keep_rows) == 0:
        empty = {}
        if emit_band_id:
            empty["band_id"] = pa.array([], type=pa.int32())
        empty["bucket"] = pa.array([], type=pa.int64())
        empty["doc_id"] = pa.array([], type=pa.int64())
        if pkey_partitions > 0:
            empty["pkey"] = pa.array([], type=pa.int32())
        return pa.table(empty)
    if cfg.minhash_mode == "unweighted":
        from apollo_ray.kernels.minhash import minhash_batch, sig_to_u32_lanes
        flat = sig_to_u32_lanes(minhash_batch(
            indptr_np, idx_flat, st["dparams"]["a"], st["dparams"]["b"],
            work_bufs=st["mh_bufs"]))
    else:
        sigs = wmh_batch_t(indptr_np, idx_flat, w_flat,
                           st["dparams"], nnz_budget=_FUSED_NNZ_BUDGET,
                           work_bufs=st["bufs"])
        flat = sigs.reshape(len(keep_rows), -1)
    buckets = bucket_keys(flat, htnum, band_size)
    ids = doc_ids[keep_rows]
    n = len(ids)
    bucket_flat = buckets.T.ravel()
    id_flat = np.tile(ids, htnum)
    cols = {}
    if emit_band_id:
        cols["band_id"] = pa.array(
            np.repeat(np.arange(htnum, dtype=np.int32), n))
    cols["bucket"] = pa.array(bucket_flat, type=pa.int64())
    cols["doc_id"] = pa.array(id_flat, type=pa.int64())
    if pkey_partitions > 0:
        from apollo_ray.hashing import mix_to_partition, splitmix64
        if pkey_salt > 1:
            key = (bucket_flat.astype(np.uint64)
                   ^ splitmix64((id_flat % pkey_salt).astype(np.uint64))
                   ).astype(np.int64)
        else:
            key = bucket_flat
        cols["pkey"] = pa.array(mix_to_partition(key, pkey_partitions),
                                type=pa.int32())
    return pa.table(cols)


def fused_bands(reps: "ray.data.Dataset", cfg: DedupConfig,
                df=None, ndocs: int = 0,
                pkey: tuple[int, int] | None = None,
                emit_band_id: bool = True) -> "ray.data.Dataset":
    """``df``/``ndocs``: pass a precomputed docfreq array to avoid a
    second full-corpus scan when the caller already ran one (the
    pipeline computes it once and shares it with ``build_bags``).
    ``pkey=(num_partitions, salt)``: emit the salted bucket partition
    key inline; ``emit_band_id=False`` drops the redundant band index
    column (see :func:`fused_hash_batch`)."""
    from apollo_ray.stages.wmh_stage import params_object_ref
    params_ref = params_object_ref(cfg)
    df_ref = None
    if cfg.needs_docfreq:
        import ray
        if df is None:
            from apollo_ray.stages.bags import compute_feature_docfreq
            df, ndocs = compute_feature_docfreq(reps, cfg)
        df_ref = ray.put(df)
    kw = {"cfg": cfg, "params_ref": params_ref,
          "df_ref": df_ref, "ndocs": ndocs,
          "emit_band_id": emit_band_id}
    if pkey is not None:
        kw["pkey_partitions"], kw["pkey_salt"] = pkey
    return reps.map_batches(
        fused_hash_batch, batch_format="pyarrow", batch_size=cfg.batch_size,
        fn_kwargs=kw)
