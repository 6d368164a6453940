"""Weighted MinHash stage: bags -> signatures.

The reference computes signatures on the driver's GPU batch-by-batch
("does not work in Spark Cluster mode", ``doc/cmd/hash.md:3``,
``apollo/hasher.py:155-179``) — the central single-process choke point.
Here it is an actor pool: ``map_batches(WmhHasher, concurrency=N,
batch_size=B, batch_format="pyarrow")`` where each actor materializes
the seeded (rs, ln_cs, betas) matrices once in ``__init__`` (the reuse
rule of ``doc/model/wmh.md:12-14``: same (dim, size, seed) => identical
params on every actor, equivalent to reloading the saved model,
``apollo/hasher.py:159-166``) and runs the vectorized Ioffe kernel per
batch.

Output ``signatures``: ``doc_id:int64, sig:list<uint32>[2*size]``
(flattened (k, t_k) pairs — the same 2*size*4-byte payload the
reference stores as a blob, ``apollo/cassandra_utils.py:82``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from apollo_ray.config import DedupConfig
from apollo_ray.kernels.wmh import generate_params


def list_columns_to_csr(batch: pa.Table, idx_name: str, w_name: str
                        ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """View two parallel Arrow list columns as CSR (indptr, indices, data).

    ``flatten()`` is slice/offset-safe (a sliced ListArray's raw
    ``values`` buffer still covers the unsliced parent).
    """
    idx_col = batch.column(idx_name)
    w_col = batch.column(w_name)
    if isinstance(idx_col, pa.ChunkedArray):
        idx_col = idx_col.combine_chunks()
    if isinstance(w_col, pa.ChunkedArray):
        w_col = w_col.combine_chunks()
    lengths = np.asarray(pc.list_value_length(idx_col), dtype=np.int64)
    indptr = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=indptr[1:])
    indices = np.asarray(idx_col.flatten(), dtype=np.uint32)
    data = np.asarray(w_col.flatten(), dtype=np.float32)
    return indptr, indices, data


class WmhHasher:
    def __init__(self, cfg: DedupConfig, params_ref=None):
        self.cfg = cfg
        if params_ref is not None:
            # broadcast path: one ray.put on the driver, zero-copy
            # plasma read per actor (shipped once per node, not per
            # batch — the small-side broadcast rule)
            import ray
            self.dparams = ray.get(params_ref)
        else:
            # regenerating from the seed is byte-identical to loading
            # the params checkpoint (doc/model/wmh.md:12-14 reuse rule)
            from apollo_ray.kernels.wmh import derive_params
            p = generate_params(cfg.feature_dim, cfg.size, cfg.seed)
            self.dparams = derive_params(p["rs"], p["ln_cs"], p["betas"])
        from apollo_ray.kernels.wmh import make_work_buffers
        self.work_bufs = make_work_buffers(cfg.size)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from apollo_ray.kernels.wmh import wmh_batch_t
        indptr, indices, data = list_columns_to_csr(batch, "indices", "weights")
        keep = np.flatnonzero(np.diff(indptr) > 0)
        if len(keep) < batch.num_rows:  # drop empty bags (all-zero input
            # is an error in the reference, apollo/hasher.py:245-246)
            batch = batch.take(pa.array(keep))
            indptr, indices, data = list_columns_to_csr(batch, "indices", "weights")
        sigs = wmh_batch_t(indptr, indices, data, self.dparams,
                           work_bufs=self.work_bufs)
        flat = sigs.reshape(len(sigs), -1)  # (n, 2*size) uint32
        sig_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(flat.ravel(), type=pa.uint32()), flat.shape[1])
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "sig": sig_arr,
        })


class MinHasher:
    """Actor-pool hasher for ``minhash_mode="unweighted"``: classic
    k-permutation MinHash over the bag's distinct feature indices
    (weights ignored — binary Jaccard semantics).  Parameters are
    2 × ``size`` uint64 coefficients regenerated from the seed in
    ``__init__`` (no broadcast needed at that size); output uses the
    same ``sig: list<uint32>[2*size]`` layout as WMH so the band
    exploder and checkpoints are shared."""

    def __init__(self, cfg: DedupConfig):
        from apollo_ray.kernels.minhash import (generate_minhash_params,
                                                make_minhash_buffers)
        self.params = generate_minhash_params(cfg.size, cfg.seed)
        self.work_bufs = make_minhash_buffers()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from apollo_ray.kernels.minhash import minhash_batch, sig_to_u32_lanes
        indptr, indices, _ = list_columns_to_csr(batch, "indices", "weights")
        keep = np.flatnonzero(np.diff(indptr) > 0)
        if len(keep) < batch.num_rows:
            batch = batch.take(pa.array(keep))
            indptr, indices, _ = list_columns_to_csr(batch, "indices", "weights")
        sigs = minhash_batch(indptr, indices, self.params["a"],
                             self.params["b"], work_bufs=self.work_bufs)
        flat = sig_to_u32_lanes(sigs)
        sig_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(flat.ravel(), type=pa.uint32()), flat.shape[1])
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "sig": sig_arr,
        })


_PARAMS_REF_CACHE: dict = {}


def params_object_ref(cfg: DedupConfig):
    """Generate + ray.put the derived hashing params once per process
    (the wmhparams model-reuse rule, ``doc/model/wmh.md:12-14``)."""
    import ray
    key = (cfg.minhash_mode, cfg.feature_dim, cfg.size, cfg.seed)
    ref = _PARAMS_REF_CACHE.get(key)
    if ref is None:
        if cfg.minhash_mode == "unweighted":
            from apollo_ray.kernels.minhash import generate_minhash_params
            ref = ray.put(generate_minhash_params(cfg.size, cfg.seed))
        else:
            from apollo_ray.kernels.wmh import derive_params
            p = generate_params(cfg.feature_dim, cfg.size, cfg.seed)
            ref = ray.put(derive_params(p["rs"], p["ln_cs"], p["betas"]))
        _PARAMS_REF_CACHE[key] = ref
    return ref


def compute_signatures(bags: "ray.data.Dataset", cfg: DedupConfig
                       ) -> "ray.data.Dataset":
    if cfg.minhash_mode == "unweighted":
        return bags.map_batches(
            MinHasher, fn_constructor_args=(cfg,),
            batch_format="pyarrow",
            batch_size=cfg.batch_size, concurrency=(1, cfg.wmh_concurrency),
            num_cpus=0.5)
    params_ref = params_object_ref(cfg)
    return bags.map_batches(
        WmhHasher, fn_constructor_args=(cfg, params_ref),
        batch_format="pyarrow",
        batch_size=cfg.batch_size, concurrency=(1, cfg.wmh_concurrency),
        num_cpus=0.5)
