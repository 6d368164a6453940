"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video are opaque ``binary`` columns processed by actor-pool
``map_batches`` stages.  PNG, WAV and baseline JPEG are decoded for
real with the pure-stdlib codecs in ``kernels/codecs.py`` /
``kernels/jpeg.py`` (struct + zlib + numpy); formats that genuinely
need external decoders (progressive JPEG, MP3, video) fall back to a
deterministic byte-statistics vector in ``mode="fake"`` and raise
exactly at the plug-in point in ``mode="strict"``.

The Ray-side plumbing is the part that matters at scale and is fully
real either way: schema contracts, small batch sizes for large
payloads, actor ``__init__`` decoder setup, and output layout
(fixed-size feature vectors as list columns).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

import ray.data

from apollo_ray.kernels.codecs import (decode_png, decode_wav, parse_avi,
                                       parse_mp3, parse_mp4, parse_png,
                                       parse_wav, sniff)
from apollo_ray.kernels.jpeg import decode_jpeg, parse_jpeg

FEATURE_DIM = 16


def _byte_hist(blob: bytes) -> np.ndarray:
    if not blob:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    arr = np.frombuffer(blob, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=16).astype(np.float32)
    return (hist / max(1, len(arr))).astype(np.float32)


def _image_features(px: np.ndarray, kind_code: float) -> np.ndarray:
    px = px.astype(np.float32)
    if px.ndim == 2:
        px = px[:, :, None]
    lum = px.mean(axis=2).ravel() / 255.0
    hist = np.histogram(lum, bins=10, range=(0.0, 1.0))[0].astype(np.float32)
    hist /= max(1, lum.size)
    h, w, ch = px.shape
    head = np.array([kind_code, w, h, ch, float(px.mean() / 255.0),
                     float(px.std() / 255.0)], dtype=np.float32)
    return np.concatenate([head, hist])


def _png_features(blob: bytes) -> np.ndarray:
    return _image_features(decode_png(blob), 1.0)


def _jpeg_features(blob: bytes) -> np.ndarray:
    return _image_features(decode_jpeg(blob), 3.0)


def _wav_features(blob: bytes) -> np.ndarray:
    x, rate = decode_wav(blob)
    mono = x.mean(axis=1)
    rms = float(np.sqrt(np.mean(mono ** 2))) if len(mono) else 0.0
    zcr = (float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
           if len(mono) > 1 else 0.0)
    hist = np.histogram(np.abs(mono), bins=10,
                        range=(0.0, 1.0))[0].astype(np.float32)
    hist /= max(1, len(mono))
    head = np.array([2.0, rate / 1e5, len(mono) / max(1, rate),
                     x.shape[1], rms, zcr], dtype=np.float32)
    return np.concatenate([head, hist])


class BinaryFeatureExtractor:
    """Actor-pool stage: binary payload -> feature vector + metadata.

    ``mode="auto"``: real PNG/WAV decode + modality features, byte
    histogram for unknown formats.  ``mode="fake"``: byte histogram
    for everything (the old deterministic behavior).
    ``mode="strict"``: real decode, NotImplementedError for formats
    that would need external decoders — the plug-in point.
    """

    def __init__(self, payload_col: str = "payload", mode: str = "auto"):
        if mode not in ("auto", "fake", "strict"):
            raise ValueError("mode must be 'auto', 'fake' or 'strict'")
        self.payload_col = payload_col
        self.mode = mode
        # a learned model would load here, once per actor

    def _decode(self, blob: bytes) -> np.ndarray:
        blob = blob or b""
        kind = sniff(blob) if self.mode != "fake" else "unknown"
        if kind == "png":
            return _png_features(blob)
        if kind == "wav":
            return _wav_features(blob)
        if kind == "jpeg":
            try:
                return _jpeg_features(blob)
            except NotImplementedError:
                # progressive / arithmetic JPEG — beyond the pure-
                # stdlib decoder
                if self.mode == "strict":
                    raise
                return _byte_hist(blob)
        if self.mode == "strict":
            raise NotImplementedError(
                "payload is not PNG/WAV/baseline-JPEG; decoding it needs "
                "an external library (PIL/ffmpeg) — plug the decoder in "
                "here")
        return _byte_hist(blob)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column(self.payload_col).to_pylist()
        feats = np.stack([self._decode(b) for b in blobs]) \
            if blobs else np.zeros((0, FEATURE_DIM), dtype=np.float32)
        sizes = np.array([len(b) if b else 0 for b in blobs], dtype=np.int64)
        feat_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.astype(np.float32).ravel(), type=pa.float32()),
            FEATURE_DIM)
        out = pa.table({
            "payload_bytes": pa.array(sizes, type=pa.int64()),
            "features": feat_arr,
        })
        for name in batch.column_names:
            if name != self.payload_col:
                out = out.append_column(name, batch.column(name))
        return out


class MediaMetadata:
    """Actor-pool stage: binary payload -> typed metadata row
    (kind, width/height/channels for images, sample_rate/duration for
    audio) — header parsing only, no pixel/sample decode."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"kind": [], "width": [], "height": [], "channels": [],
                "sample_rate": [], "duration_s": []}
        for blob in batch.column(self.payload_col).to_pylist():
            blob = blob or b""
            kind = sniff(blob)
            w = h = ch = rate = 0
            dur = 0.0
            try:
                w, h, ch, rate, dur = self._parse(kind, blob)
            except (ValueError, NotImplementedError, struct.error,
                    IndexError):
                # truncated/corrupt header on a sniffed format: a
                # metadata sweep over a dirty corpus must not die
                kind = "corrupt_" + kind
            rows["kind"].append(kind)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["channels"].append(ch)
            rows["sample_rate"].append(rate)
            rows["duration_s"].append(dur)
        out = pa.table({
            "kind": pa.array(rows["kind"], type=pa.string()),
            "width": pa.array(rows["width"], type=pa.int64()),
            "height": pa.array(rows["height"], type=pa.int64()),
            "channels": pa.array(rows["channels"], type=pa.int64()),
            "sample_rate": pa.array(rows["sample_rate"], type=pa.int64()),
            "duration_s": pa.array(rows["duration_s"], type=pa.float64()),
        })
        for name in batch.column_names:
            if name != self.payload_col:
                out = out.append_column(name, batch.column(name))
        return out

    @staticmethod
    def _parse(kind: str, blob: bytes):
        w = h = ch = rate = 0
        dur = 0.0
        if kind == "png":
            m = parse_png(blob)
            w, h, ch = m["width"], m["height"], m["n_channels"]
        elif kind == "jpeg":
            m = parse_jpeg(blob)
            w, h, ch = m["width"], m["height"], m["n_components"]
        elif kind == "wav":
            m = parse_wav(blob)
            rate, ch = m["sample_rate"], m["n_channels"]
            dur = m["duration_s"]
        elif kind == "mp3":
            m = parse_mp3(blob)
            rate, ch = m["sample_rate"], m["n_channels"]
            dur = m["duration_s"]
        elif kind == "mp4":
            m = parse_mp4(blob)
            w, h = m["width"], m["height"]
            ch = m["n_tracks"]
            dur = m["duration_s"]
        elif kind == "avi":
            m = parse_avi(blob)
            w, h = m["width"], m["height"]
            dur = m["duration_s"]
        return w, h, ch, rate, dur


def extract_binary_features(ds: "ray.data.Dataset", payload_col: str = "payload",
                            mode: str = "auto", batch_size: int = 64,
                            concurrency: int = 4) -> "ray.data.Dataset":
    """Large binary rows => small ``batch_size`` so a batch x pool fits
    worker heaps; blocks stay in the object store and spill if needed."""
    return ds.map_batches(
        BinaryFeatureExtractor,
        fn_constructor_args=(payload_col, mode),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency))


def media_metadata(ds: "ray.data.Dataset", payload_col: str = "payload",
                   batch_size: int = 256, concurrency: int = 4
                   ) -> "ray.data.Dataset":
    """Header-only media metadata extraction (no pixel/sample decode)."""
    return ds.map_batches(
        MediaMetadata, fn_constructor_args=(payload_col,),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency))
