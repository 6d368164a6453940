"""Fused hashing stage: reps -> (band_id, bucket, doc_id) in ONE actor pool.

The staged path (bags -> wmh -> bands) exists for checkpointing and for
the verify tier (which needs the bags as a standalone dataset).  When
neither is required, running all three per-doc transforms inside one
``__call__`` removes two actor pools and two stage boundaries — on a
32-CPU node that is ~32 fewer worker processes to spawn and warm, and
zero intermediate block traffic.  The math is byte-identical: the same
``doc_to_bag`` -> ``wmh_batch_t`` -> ``bucket_keys`` kernels in the
same order (asserted by tests/test_fused.py against the staged path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from apollo_ray.config import DedupConfig
from apollo_ray.hashing import TokenHasher
from apollo_ray.kernels.text import doc_to_bag
from apollo_ray.kernels.wmh import make_work_buffers, wmh_batch_t
from apollo_ray.stages.bands import band_params, bucket_keys


class FusedHasher:
    """text -> shingle bag -> WMH signature -> band rows, per batch."""

    def __init__(self, cfg: DedupConfig, params_ref):
        import ray
        self.cfg = cfg
        self.hasher = TokenHasher(seed=cfg.seed)
        self.dparams = ray.get(params_ref)
        self.work_bufs = make_work_buffers(cfg.size)
        self.htnum, self.band_size = band_params(cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        texts = batch.column("text").to_pylist()
        doc_ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        indptr = [0]
        idx_parts: list[np.ndarray] = []
        w_parts: list[np.ndarray] = []
        keep_rows: list[int] = []
        for i, t in enumerate(texts):
            idx, w = doc_to_bag(t, self.hasher, cfg.shingle_k,
                                cfg.feature_dim_log2, cfg.tokenizer,
                                cfg.weighting)
            if len(idx) == 0:
                continue  # empty docs cannot be hashed (apollo/hasher.py:245)
            keep_rows.append(i)
            idx_parts.append(idx)
            w_parts.append(w)
            indptr.append(indptr[-1] + len(idx))
        if not keep_rows:
            return pa.table({"band_id": pa.array([], type=pa.int32()),
                             "bucket": pa.array([], type=pa.int64()),
                             "doc_id": pa.array([], type=pa.int64())})
        sigs = wmh_batch_t(np.asarray(indptr, dtype=np.int64),
                           np.concatenate(idx_parts),
                           np.concatenate(w_parts),
                           self.dparams, work_bufs=self.work_bufs)
        flat = sigs.reshape(len(keep_rows), -1)
        buckets = bucket_keys(flat, self.htnum, self.band_size)
        ids = doc_ids[keep_rows]
        n, htnum = len(ids), self.htnum
        return pa.table({
            "band_id": pa.array(np.repeat(np.arange(htnum, dtype=np.int32), n)),
            "bucket": pa.array(buckets.T.ravel(), type=pa.int64()),
            "doc_id": pa.array(np.tile(ids, htnum), type=pa.int64()),
        })


def fused_bands(reps: "ray.data.Dataset", cfg: DedupConfig
                ) -> "ray.data.Dataset":
    import ray
    from apollo_ray.stages.wmh_stage import params_object_ref
    params_ref = params_object_ref(cfg)
    cpus = ray.cluster_resources().get("CPU", 8.0) if ray.is_initialized() else 8.0
    pool_max = max(2, min(cfg.wmh_concurrency * 2, int(cpus) - 1))
    return reps.map_batches(
        FusedHasher, fn_constructor_args=(cfg, params_ref),
        batch_format="pyarrow", batch_size=cfg.batch_size,
        concurrency=(1, pool_max), num_cpus=1)
