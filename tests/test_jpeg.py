"""Baseline JPEG codec (kernels/jpeg.py) + multimodal integration.

Round-trip error bounds are against the known quantization loss: the
encoder and decoder are independent T.81 implementations (tables ride
in the file's own DQT/DHT segments), so agreement within those bounds
exercises both directions of the spec.
"""

import numpy as np
import pytest

from apollo_ray.kernels.jpeg import decode_jpeg, encode_jpeg, parse_jpeg
from apollo_ray.kernels.codecs import sniff


def _smooth(h, w, seed=0):
    """JPEG-friendly test image: low-frequency gradients + mild noise."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 80 * np.sin(xx / 9.0) + 40 * np.cos(yy / 7.0)
    return np.clip(base + rng.normal(0, 4, (h, w)), 0, 255).astype(np.uint8)


def _smooth_rgb(h, w, seed=0):
    g = _smooth(h, w, seed).astype(np.float64)
    rng = np.random.default_rng(seed + 1)
    rgb = np.stack([g, np.roll(g, 5, axis=0), 255 - g], axis=-1)
    return np.clip(rgb + rng.normal(0, 3, rgb.shape), 0, 255
                   ).astype(np.uint8)


def test_flat_block_lossless_at_q100():
    flat = np.full((8, 8), 77, np.uint8)
    dec = decode_jpeg(encode_jpeg(flat, quality=100))
    np.testing.assert_array_equal(dec, flat)


def test_grey_round_trip_quality_bounds():
    img = _smooth(40, 56)
    for q, bound in ((100, 1.0), (90, 4.0), (50, 8.0)):
        dec = decode_jpeg(encode_jpeg(img, quality=q))
        assert dec.shape == img.shape and dec.dtype == np.uint8
        err = np.abs(dec.astype(float) - img.astype(float))
        assert err.mean() < bound, (q, err.mean())


def test_rgb_444_and_420_round_trip():
    img = _smooth_rgb(33, 41)   # odd dims exercise edge padding/crop
    for kw, bound in (({}, 5.0), ({"subsample": True}, 8.0)):
        blob = encode_jpeg(img, quality=90, **kw)
        assert sniff(blob) == "jpeg"
        meta = parse_jpeg(blob)
        assert (meta["width"], meta["height"]) == (41, 33)
        assert meta["n_components"] == 3 and not meta["progressive"]
        dec = decode_jpeg(blob)
        assert dec.shape == img.shape
        err = np.abs(dec.astype(float) - img.astype(float))
        assert err.mean() < bound, (kw, err.mean())


def test_restart_markers_do_not_change_pixels():
    grey = _smooth(24, 40, seed=3)
    rgb = _smooth_rgb(24, 40, seed=3)
    for img, kw in ((grey, {}), (rgb, {}), (rgb, {"subsample": True})):
        plain = decode_jpeg(encode_jpeg(img, quality=80, **kw))
        rst = encode_jpeg(img, quality=80, restart_interval=2, **kw)
        assert b"\xff\xdd" in rst                       # DRI present
        assert b"\xff\xd0" in rst or b"\xff\xd1" in rst  # RSTn emitted
        np.testing.assert_array_equal(decode_jpeg(rst), plain)


def test_progressive_detected_and_rejected():
    blob = encode_jpeg(_smooth(16, 16), quality=85)
    prog = blob.replace(b"\xff\xc0", b"\xff\xc2", 1)  # SOF0 -> SOF2
    assert parse_jpeg(prog)["progressive"]
    with pytest.raises(NotImplementedError):
        decode_jpeg(prog)


def test_corrupt_inputs_raise():
    with pytest.raises(ValueError):
        parse_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no SOF/SOS


def test_multimodal_jpeg_features_and_metadata(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from apollo_ray.functions.multimodal import (extract_binary_features,
                                                 media_metadata)
    img = _smooth_rgb(12, 20, seed=5)
    ds = rd.from_arrow(pa.table({
        "item_id": pa.array([1], type=pa.int64()),
        "payload": pa.array([encode_jpeg(img, quality=90)],
                            type=pa.binary()),
    }))
    meta = media_metadata(ds).to_pandas().iloc[0]
    assert meta["kind"] == "jpeg"
    assert (meta["width"], meta["height"], meta["channels"]) == (20, 12, 3)
    feats = np.asarray(
        extract_binary_features(ds, mode="strict").to_pandas()
        .iloc[0]["features"])
    assert feats[0] == 3.0                       # jpeg marker
    assert (feats[1], feats[2], feats[3]) == (20, 12, 3)
    # luminance stats should be close to the source image's
    assert abs(feats[4] - img.mean() / 255.0) < 0.05
