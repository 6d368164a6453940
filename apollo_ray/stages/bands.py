"""Band explode stage: signatures -> (band_id, bucket, doc_id) rows.

Vectorized ``map_batches`` replacement for the reference's
``HashExploder`` (``apollo/hasher.py:90-99``): the signature's
``htnum * band_size`` sample prefix is reshaped into ``htnum`` bands of
``band_size`` (k, t) pairs; the raw band lanes are folded into a uint64
``bucket`` key (the reference uses the raw band bytes as the Cassandra
clustering key, ``apollo/cassandra_utils.py:83-84``; a 64-bit mix keyed
by band_id is the fixed-width shuffle-key equivalent).  Two documents
share a bucket iff their band slices are identical — exact-match
semantics, no second-level hashing ambiguity at realistic scales.

(htnum, band_size) come from the ``calc_hashtable_params`` optimization
at the configured threshold, exactly as ``apollo/hasher.py:144-145``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from apollo_ray.config import DedupConfig
from apollo_ray.hashing import fold_u32_rows
from apollo_ray.kernels.lsh import calc_hashtable_params


def band_params(cfg: DedupConfig) -> tuple[int, int]:
    if cfg.band_mode == "recall":
        from apollo_ray.kernels.lsh import calc_recall_params
        return calc_recall_params(cfg.threshold, cfg.size,
                                  cfg.recall_target)
    return calc_hashtable_params(cfg.threshold, cfg.size,
                                 cfg.false_positive_weight,
                                 cfg.false_negative_weight)


def bucket_keys(sig: np.ndarray, htnum: int, band_size: int) -> np.ndarray:
    """(n, 2*size) uint32 signatures -> (n, htnum) int64 bucket keys.

    The band_id is folded in as an extra leading lane, so buckets of
    different bands can never merge (the reference partitions by
    ``hashtable``, ``apollo/cassandra_utils.py:83``).
    """
    n = sig.shape[0]
    w = band_size * 2
    bands = sig[:, :htnum * w].reshape(n, htnum, w)
    out = np.empty((n, htnum), dtype=np.int64)
    lanes = np.empty((n, w + 1), dtype=np.uint32)
    for b in range(htnum):
        lanes[:, 0] = b
        lanes[:, 1:] = bands[:, b, :]
        out[:, b] = fold_u32_rows(lanes)
    return out


class BandExploder:
    def __init__(self, cfg: DedupConfig):
        self.htnum, self.band_size = band_params(cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig_col = batch.column("sig")
        if isinstance(sig_col, pa.ChunkedArray):
            sig_col = sig_col.combine_chunks()
        n = batch.num_rows
        width = sig_col.type.list_size
        sig = np.asarray(sig_col.flatten(), dtype=np.uint32).reshape(n, width)
        htnum = self.htnum
        buckets = bucket_keys(sig, htnum, self.band_size)
        doc_ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        return pa.table({
            "band_id": pa.array(np.repeat(np.arange(htnum, dtype=np.int32), n)),
            "bucket": pa.array(buckets.T.ravel(), type=pa.int64()),
            "doc_id": pa.array(np.tile(doc_ids, htnum), type=pa.int64()),
        })


def explode_bands(signatures: "ray.data.Dataset", cfg: DedupConfig
                  ) -> "ray.data.Dataset":
    return signatures.map_batches(BandExploder, fn_constructor_args=(cfg,),
                                  batch_format="pyarrow",
                                  batch_size=cfg.batch_size,
                                  concurrency=(1, cfg.wmh_concurrency),
                                  num_cpus=0.5)
