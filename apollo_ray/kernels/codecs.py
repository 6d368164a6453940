"""Pure-stdlib media codecs: real PNG and WAV parsing/decoding with
``struct`` + ``zlib`` + numpy only (no PIL/ffmpeg in this container).

Covers the formats a dependency-free engine can own outright:

- WAV (RIFF PCM): header metadata + full sample decode (int16/uint8).
- PNG: IHDR metadata for any PNG; full pixel decode for 8-bit
  greyscale/RGB/RGBA non-interlaced images (zlib inflate + all five
  scanline filters per the PNG spec §9).

- JPEG (baseline sequential, via ``kernels/jpeg.py``): metadata for
  any JPEG; full decode for SOF0 greyscale/YCbCr up to 2x2 sampling
  (4:4:4 / 4:2:2 / 4:2:0) with restart markers.

Encoders exist for round-trip tests.  Formats beyond these
(progressive JPEG, MP3, video) still need external decoders — that
boundary is where ``functions/multimodal.py`` raises in strict mode.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color_type -> channels


def sniff(blob: bytes) -> str:
    """'png' | 'wav' | 'jpeg' | 'unknown' by magic bytes."""
    if blob[:8] == PNG_MAGIC:
        return "png"
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "wav"
    if blob[:3] == b"\xff\xd8\xff":
        return "jpeg"
    return "unknown"


# --- WAV -----------------------------------------------------------------

def parse_wav(blob: bytes) -> dict:
    """RIFF/WAVE header -> {sample_rate, n_channels, bits, n_frames}."""
    if sniff(blob) != "wav":
        raise ValueError("not a RIFF/WAVE blob")
    pos = 12
    fmt = None
    data_len = 0
    while pos + 8 <= len(blob):
        cid, clen = struct.unpack_from("<4sI", blob, pos)
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", blob, pos + 8)
        elif cid == b"data":
            data_len = clen
        pos += 8 + clen + (clen & 1)
    if fmt is None:
        raise ValueError("WAV without fmt chunk")
    _, n_ch, rate, _, block_align, bits = fmt
    n_frames = data_len // block_align if block_align else 0
    return {"sample_rate": rate, "n_channels": n_ch, "bits": bits,
            "n_frames": n_frames,
            "duration_s": n_frames / rate if rate else 0.0}


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """-> (samples float32 in [-1, 1] of shape (n_frames, n_channels),
    sample_rate).  Supports PCM int16 and uint8."""
    meta = parse_wav(blob)
    pos = 12
    while pos + 8 <= len(blob):
        cid, clen = struct.unpack_from("<4sI", blob, pos)
        if cid == b"data":
            raw = blob[pos + 8:pos + 8 + clen]
            break
        pos += 8 + clen + (clen & 1)
    else:
        raise ValueError("WAV without data chunk")
    if meta["bits"] == 16:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif meta["bits"] == 8:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
             - 128.0) / 128.0
    else:
        raise NotImplementedError("only 8/16-bit PCM WAV supported")
    n_ch = meta["n_channels"]
    return x.reshape(-1, n_ch), meta["sample_rate"]


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n_frames, n_channels) float32 in [-1, 1] -> 16-bit PCM WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    n_ch = samples.shape[1]
    block = n_ch * 2
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * block, block, 16)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# --- PNG -----------------------------------------------------------------

def parse_png(blob: bytes) -> dict:
    """IHDR -> {width, height, bit_depth, color_type, n_channels,
    interlace}."""
    if sniff(blob) != "png":
        raise ValueError("not a PNG blob")
    if blob[12:16] != b"IHDR":
        raise ValueError("PNG without leading IHDR")
    w, h, depth, ctype, _, _, interlace = struct.unpack_from(
        ">IIBBBBB", blob, 16)
    return {"width": w, "height": h, "bit_depth": depth,
            "color_type": ctype,
            "n_channels": _PNG_CHANNELS.get(ctype, 0),
            "interlace": interlace}


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """PNG spec §9 scanline unfiltering -> (h, stride) uint8."""
    out = np.zeros((h, stride), dtype=np.uint8)
    row_len = stride + 1
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = raw[y * row_len]
        cur = np.frombuffer(raw, np.uint8, stride,
                            offset=y * row_len + 1).copy()
        if ft == 0:
            pass
        elif ft == 1:    # Sub: prefix sum per bpp lane (uint8 wraps)
            for o in range(bpp):
                np.add.accumulate(cur[o::bpp], out=cur[o::bpp])
        elif ft == 2:    # Up
            cur += prev
        elif ft == 3:    # Average — left-dependency, sequential in x
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (int(cur[x]) + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:    # Paeth
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError("bad PNG filter type %d" % ft)
        out[y] = cur
        prev = cur
    return out


def decode_png(blob: bytes) -> np.ndarray:
    """-> (h, w, channels) uint8 (channels axis kept even for grey).
    8-bit, non-interlaced, color types 0/2/4/6."""
    meta = parse_png(blob)
    if meta["bit_depth"] != 8 or meta["interlace"] != 0:
        raise NotImplementedError("only 8-bit non-interlaced PNG supported")
    ch = meta["n_channels"]
    if ch == 0:
        raise NotImplementedError("palette PNG not supported")
    idat = []
    pos = 8
    while pos + 8 <= len(blob):
        clen, cid = struct.unpack_from(">I4s", blob, pos)
        if cid == b"IDAT":
            idat.append(blob[pos + 8:pos + 8 + clen])
        elif cid == b"IEND":
            break
        pos += 12 + clen
    raw = zlib.decompress(b"".join(idat))
    w, h = meta["width"], meta["height"]
    px = _unfilter(raw, h, w * ch, ch)
    return px.reshape(h, w, ch)


def encode_png(img: np.ndarray) -> bytes:
    """(h, w[, channels]) uint8 -> PNG (filter 0 rows)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    idat = zlib.compress(raw)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + cid + body
                + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF))

    return (PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))
