"""Pure-stdlib PNG/WAV codecs + the multimodal stages that use them."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from apollo_ray.kernels.codecs import (PNG_MAGIC, decode_png, decode_wav,
                                       encode_png, encode_wav, parse_png,
                                       parse_wav, sniff)


def test_wav_round_trip():
    rng = np.random.default_rng(1)
    x = (rng.random((500, 2)).astype(np.float32) - 0.5) * 1.5
    blob = encode_wav(x, 16000)
    assert sniff(blob) == "wav"
    meta = parse_wav(blob)
    assert meta["sample_rate"] == 16000
    assert meta["n_channels"] == 2 and meta["bits"] == 16
    assert meta["n_frames"] == 500
    y, rate = decode_wav(blob)
    assert rate == 16000 and y.shape == (500, 2)
    np.testing.assert_allclose(y, np.clip(x, -1, 32767 / 32768),
                               atol=2.0 / 32767)


def test_png_round_trip_rgb_rgba_grey():
    rng = np.random.default_rng(2)
    for ch in (1, 3, 4):
        img = rng.integers(0, 256, (7, 9, ch), dtype=np.uint8)
        blob = encode_png(img)
        assert sniff(blob) == "png"
        meta = parse_png(blob)
        assert (meta["width"], meta["height"]) == (9, 7)
        assert meta["n_channels"] == ch
        np.testing.assert_array_equal(decode_png(blob), img)


def _encode_png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Reference encoder applying a given filter type per row (spec §9)
    so the decoder's unfiltering of types 1-4 is exercised."""
    h, w, ch = img.shape
    bpp = ch
    raws = []
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        cur = img[y].ravel().astype(np.int64)
        ft = filters[y % len(filters)]
        enc = np.zeros_like(cur)
        for x in range(len(cur)):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
            enc[x] = (cur[x] - pred) & 0xFF
        raws.append(bytes([ft]) + enc.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2, 4: 6}[ch], 0, 0, 0)
    idat = zlib.compress(b"".join(raws))

    def chunk(cid, body):
        return (struct.pack(">I", len(body)) + cid + body
                + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF))

    return (PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def test_png_all_filter_types_decode():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (10, 6, 3), dtype=np.uint8)
    for filters in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        blob = _encode_png_with_filters(img, filters)
        np.testing.assert_array_equal(decode_png(blob), img)


def test_sniff_unknown():
    assert sniff(b"\xff\xd8\xff") == "jpeg"
    assert sniff(b"\xff\xd8zz") == "unknown"        # SOI but no marker
    assert sniff(b"") == "unknown"
    with pytest.raises(ValueError):
        parse_png(b"nope")
    with pytest.raises(ValueError):
        parse_wav(b"nope")


@pytest.fixture
def media_ds(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    wav = (rng.random((400, 1)).astype(np.float32) - 0.5)
    payloads = [encode_png(img), encode_wav(wav, 8000), b"\xff\xd8raw"]
    return rd.from_arrow(pa.table({
        "item_id": pa.array([1, 2, 3], type=pa.int64()),
        "payload": pa.array(payloads, type=pa.binary()),
    }))


def test_media_metadata_stage(media_ds):
    from apollo_ray.functions.multimodal import media_metadata
    df = media_metadata(media_ds).to_pandas().set_index("item_id")
    assert df.loc[1, "kind"] == "png"
    assert (df.loc[1, "width"], df.loc[1, "height"]) == (8, 8)
    assert df.loc[2, "kind"] == "wav"
    assert df.loc[2, "sample_rate"] == 8000
    assert abs(df.loc[2, "duration_s"] - 400 / 8000) < 1e-9
    assert df.loc[3, "kind"] == "unknown"


def test_binary_features_auto_mode(media_ds):
    from apollo_ray.functions.multimodal import (FEATURE_DIM,
                                                 extract_binary_features)
    df = extract_binary_features(media_ds).to_pandas().set_index("item_id")
    f1 = np.asarray(df.loc[1, "features"])
    f2 = np.asarray(df.loc[2, "features"])
    assert len(f1) == FEATURE_DIM
    assert f1[0] == 1.0 and f1[1] == 8 and f1[2] == 8   # image, w, h
    assert f2[0] == 2.0                                  # audio marker
    assert abs(f2[2] - 0.05) < 1e-6                      # duration 400/8000


def test_strict_mode_raises_only_for_unknown(media_ds):
    import ray
    from apollo_ray.functions.multimodal import extract_binary_features
    ds = extract_binary_features(media_ds, mode="strict")
    with pytest.raises(Exception) as ei:
        ds.to_pandas()
    assert "NotImplementedError" in str(ei.value) or \
        isinstance(ei.value, NotImplementedError)


# --- MP3 / MP4 / AVI header metadata (no sample decode) ------------------

def _mp3_frames(n_frames=10, xing_frames=0, id3_pad=0):
    """Hand-built MPEG1 Layer III 128 kbps 44.1 kHz stereo frames."""
    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])   # sync, V1 L3, 128k/44.1, stereo
    flen = (144 * 128000) // 44100          # 417 bytes, no padding
    frame = bytearray(hdr + b"\x00" * (flen - 4))
    if xing_frames:
        p = 4 + 32                           # after MPEG1-stereo side info
        frame[p:p + 4] = b"Xing"
        frame[p + 4:p + 12] = struct.pack(">II", 1, xing_frames)
    blob = bytes(frame) * n_frames
    if id3_pad:
        tag = (b"ID3" + b"\x04\x00\x00"
               + bytes([(id3_pad >> 21) & 0x7F, (id3_pad >> 14) & 0x7F,
                        (id3_pad >> 7) & 0x7F, id3_pad & 0x7F])
               + b"\x00" * id3_pad)
        blob = tag + blob
    return blob


def test_mp3_header_cbr_and_xing():
    from apollo_ray.kernels.codecs import parse_mp3
    blob = _mp3_frames(10)
    assert sniff(blob) == "mp3"
    m = parse_mp3(blob)
    assert m["mpeg_version"] == 1 and m["layer"] == 3
    assert m["bitrate_kbps"] == 128 and m["sample_rate"] == 44100
    assert m["n_channels"] == 2 and not m["vbr"]
    assert abs(m["duration_s"] - len(blob) * 8 / 128000) < 1e-9

    vbr = parse_mp3(_mp3_frames(10, xing_frames=500))
    assert vbr["vbr"]
    assert abs(vbr["duration_s"] - 500 * 1152 / 44100) < 1e-9

    tagged = _mp3_frames(4, id3_pad=200)
    assert sniff(tagged) == "mp3"
    assert parse_mp3(tagged)["bitrate_kbps"] == 128


def _box(btype, body):
    return struct.pack(">I", 8 + len(body)) + btype + body


def _mp4_blob(timescale=1000, duration=5000, w=640, h=360):
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    mvhd = _box(b"mvhd", struct.pack(">B3xII", 0, 0, 0)
                + struct.pack(">II", timescale, duration)
                + b"\x00" * 80)
    tkhd = _box(b"tkhd", b"\x00" * 76
                + struct.pack(">II", w << 16, h << 16))
    hdlr = _box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)
    trak = _box(b"trak", tkhd + _box(b"mdia", hdlr))
    return ftyp + _box(b"moov", mvhd + trak)


def test_mp4_box_walk():
    from apollo_ray.kernels.codecs import parse_mp4
    blob = _mp4_blob()
    assert sniff(blob) == "mp4"
    m = parse_mp4(blob)
    assert m["major_brand"] == "isom"
    assert abs(m["duration_s"] - 5.0) < 1e-9
    assert (m["width"], m["height"]) == (640, 360)
    assert m["n_tracks"] == 1 and m["has_video"] and not m["has_audio"]


def _avi_blob(us_pf=33333, frames=90, w=320, h=240):
    avih_body = struct.pack("<IIIIIIII", us_pf, 0, 0, 0, frames, 0, 1, 0) \
        + struct.pack("<II", w, h) + b"\x00" * 16
    avih = b"avih" + struct.pack("<I", len(avih_body)) + avih_body
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih)) + b"hdrl" + avih
    return b"RIFF" + struct.pack("<I", 4 + len(hdrl)) + b"AVI " + hdrl


def test_avi_header():
    from apollo_ray.kernels.codecs import parse_avi
    blob = _avi_blob()
    assert sniff(blob) == "avi"
    m = parse_avi(blob)
    assert (m["width"], m["height"], m["n_frames"]) == (320, 240, 90)
    assert abs(m["fps"] - 1e6 / 33333) < 1e-6
    assert abs(m["duration_s"] - 90 * 33333 / 1e6) < 1e-3


def test_media_metadata_containers(ray_session):
    import ray.data as rd
    from apollo_ray.functions.multimodal import media_metadata
    ds = rd.from_arrow(pa.table({
        "item_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "payload": pa.array(
            [_mp3_frames(6), _mp4_blob(), _avi_blob(),
             _mp3_frames(1)[:3]],        # truncated: sniffs mp3, parse fails
            type=pa.binary()),
    }))
    df = media_metadata(ds).to_pandas().set_index("item_id")
    assert df.loc[1, "kind"] == "mp3" and df.loc[1, "sample_rate"] == 44100
    assert df.loc[2, "kind"] == "mp4"
    assert (df.loc[2, "width"], df.loc[2, "height"]) == (640, 360)
    assert df.loc[3, "kind"] == "avi" and df.loc[3, "width"] == 320
    assert df.loc[4, "kind"] == "corrupt_mp3"
