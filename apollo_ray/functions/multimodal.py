"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video are opaque ``binary`` columns processed by actor-pool
``map_batches`` stages.  The decode libraries (PIL/ffmpeg/torchaudio)
are NOT in this container, so the decoder kernels are stubbed — but the
Ray-side plumbing is real and tested: schema contracts, small batch
sizes for large payloads, actor ``__init__`` model loading, and output
layout (fixed-size feature vectors as list columns).

Stub policy: ``mode="fake"`` (default) produces a deterministic
byte-statistics feature vector (histogram moments) so downstream
pipelines are exercised end-to-end; ``mode="strict"`` raises
NotImplementedError exactly where a real decoder would plug in.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

FEATURE_DIM = 16


class BinaryFeatureExtractor:
    """Actor-pool stage: binary payload -> feature vector + metadata.

    A real implementation would load the decoder/model here in
    ``__init__`` (once per actor) and decode in ``__call__`` per batch;
    the deterministic fake computes byte-histogram statistics, which
    keeps schemas, batch sizing and actor plumbing fully realistic.
    """

    def __init__(self, payload_col: str = "payload", mode: str = "fake"):
        if mode not in ("fake", "strict"):
            raise ValueError("mode must be 'fake' or 'strict'")
        self.payload_col = payload_col
        self.mode = mode
        # model-load placeholder: a real decoder would initialize here

    def _decode(self, blob: bytes) -> np.ndarray:
        if self.mode == "strict":
            raise NotImplementedError(
                "real image/audio decode requires PIL/ffmpeg, not present "
                "in this environment; plug the decoder in here")
        if not blob:
            return np.zeros(FEATURE_DIM, dtype=np.float32)
        arr = np.frombuffer(blob, dtype=np.uint8)
        hist = np.bincount(arr >> 4, minlength=16).astype(np.float32)
        return (hist / max(1, len(arr))).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column(self.payload_col).to_pylist()
        feats = np.stack([self._decode(b) for b in blobs])
        sizes = np.array([len(b) if b else 0 for b in blobs], dtype=np.int64)
        feat_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), type=pa.float32()), FEATURE_DIM)
        out = pa.table({
            "payload_bytes": pa.array(sizes, type=pa.int64()),
            "features": feat_arr,
        })
        for name in batch.column_names:
            if name != self.payload_col:
                out = out.append_column(name, batch.column(name))
        return out


def extract_binary_features(ds: "ray.data.Dataset", payload_col: str = "payload",
                            mode: str = "fake", batch_size: int = 64,
                            concurrency: int = 4) -> "ray.data.Dataset":
    """Large binary rows => small ``batch_size`` so a batch x pool fits
    worker heaps; blocks stay in the object store and spill if needed."""
    return ds.map_batches(
        BinaryFeatureExtractor,
        fn_constructor_args=(payload_col, mode),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency))
