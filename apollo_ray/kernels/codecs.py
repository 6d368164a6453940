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
- MP3 / MP4 (ISO BMFF) / AVI: header metadata only (frame header +
  Xing/VBRI, box walk, avih) — sample/frame decode for these needs
  external libraries.

Encoders exist for round-trip tests.  Sample/pixel decode beyond the
formats above (progressive JPEG, MP3 audio, video frames) still needs
external decoders — that boundary is where ``functions/multimodal.py``
raises in strict mode.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color_type -> channels


def sniff(blob: bytes) -> str:
    """'png' | 'wav' | 'jpeg' | 'mp3' | 'mp4' | 'avi' | 'unknown'
    by magic bytes."""
    if blob[:8] == PNG_MAGIC:
        return "png"
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "wav"
    if blob[:4] == b"RIFF" and blob[8:12] == b"AVI ":
        return "avi"
    if blob[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if blob[4:8] == b"ftyp":
        return "mp4"
    if blob[:3] == b"ID3" or (len(blob) >= 2
                              and blob[0] == 0xFF
                              and (blob[1] & 0xE0) == 0xE0
                              and (blob[1] & 0x18) != 0x08   # valid version
                              and (blob[1] & 0x06) != 0x00):  # valid layer
        return "mp3"
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


# --- MP3 (frame-header metadata only; no sample decode) ------------------

# bitrate tables in kbit/s, indexed [version_group][layer][bitrate_index];
# version_group 0 = MPEG1, 1 = MPEG2/2.5 (ISO 11172-3 / 13818-3)
_MP3_BITRATES = {
    (0, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
             416, 448],
    (0, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384],
    (0, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320],
    (1, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256],
    (1, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160],
    (1, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160],
}
_MP3_RATES = {3: [44100, 48000, 32000],      # version bits -> Hz table
              2: [22050, 24000, 16000],
              0: [11025, 12000, 8000]}


def _id3v2_size(blob: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if none)."""
    if blob[:3] != b"ID3" or len(blob) < 10:
        return 0
    sz = ((blob[6] & 0x7F) << 21 | (blob[7] & 0x7F) << 14
          | (blob[8] & 0x7F) << 7 | (blob[9] & 0x7F))
    return 10 + sz


def parse_mp3(blob: bytes) -> dict:
    """First MPEG audio frame header (+ Xing/VBRI if present) ->
    {mpeg_version, layer, bitrate_kbps, sample_rate, n_channels,
    duration_s, vbr}.  Header parsing only — sample decode needs an
    external library."""
    off = _id3v2_size(blob)
    # find frame sync: 11 set bits, valid version/layer fields
    end = min(len(blob) - 3, off + 65536)
    while off < end:
        b1, b2 = blob[off], blob[off + 1]
        if (b1 == 0xFF and (b2 & 0xE0) == 0xE0
                and (b2 >> 3) & 3 != 1 and (b2 >> 1) & 3 != 0):
            break
        off += 1
    else:
        raise ValueError("no MPEG audio frame sync found")
    b2, b3, b4 = blob[off + 1], blob[off + 2], blob[off + 3]
    vbits = (b2 >> 3) & 3             # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = 4 - ((b2 >> 1) & 3)       # 1..3
    vgroup = 0 if vbits == 3 else 1
    br_idx = (b3 >> 4) & 0xF
    sr_idx = (b3 >> 2) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        raise ValueError("free-format or invalid MP3 header")
    bitrate = _MP3_BITRATES[(vgroup, layer)][br_idx]
    rate = _MP3_RATES[vbits][sr_idx]
    mono = ((b4 >> 6) & 3) == 3
    spf = (384 if layer == 1
           else 1152 if layer == 2
           else (1152 if vgroup == 0 else 576))

    # VBR headers live in the first frame: Xing/Info after the Layer-III
    # side info, VBRI at a fixed 32-byte offset
    n_frames = 0
    vbr = False
    if layer == 3:
        side = (17 if mono else 32) if vgroup == 0 else (9 if mono else 17)
        p = off + 4 + side
        tag = blob[p:p + 4]
        if tag in (b"Xing", b"Info"):
            flags = struct.unpack_from(">I", blob, p + 4)[0]
            if flags & 1:
                n_frames = struct.unpack_from(">I", blob, p + 8)[0]
                vbr = tag == b"Xing"
        elif blob[off + 4 + 32:off + 4 + 36] == b"VBRI":
            n_frames = struct.unpack_from(">I", blob, off + 4 + 32 + 14)[0]
            vbr = True
    if n_frames:
        dur = n_frames * spf / rate
    else:
        dur = max(0, len(blob) - off) * 8.0 / (bitrate * 1000.0)
    return {"mpeg_version": {3: 1, 2: 2, 0: 2.5}[vbits], "layer": layer,
            "bitrate_kbps": bitrate, "sample_rate": rate,
            "n_channels": 1 if mono else 2, "duration_s": dur, "vbr": vbr}


# --- MP4 / ISO BMFF (box metadata only) ----------------------------------

def _iter_boxes(blob: bytes, start: int, stop: int):
    """Yield (type, body_start, body_stop) for ISO BMFF boxes."""
    pos = start
    while pos + 8 <= stop:
        size = struct.unpack_from(">I", blob, pos)[0]
        btype = blob[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            size = struct.unpack_from(">Q", blob, pos + 8)[0]
            body = pos + 16
        elif size == 0:
            size = stop - pos
        if size < 8 or pos + size > stop:
            break
        yield btype, body, pos + size
        pos += size


def parse_mp4(blob: bytes) -> dict:
    """ISO BMFF (MP4/MOV) container metadata -> {major_brand,
    duration_s, width, height, n_tracks, has_video, has_audio}.
    Box walking only — frame decode needs an external library."""
    if blob[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF file (no ftyp)")
    out = {"major_brand": blob[8:12].decode("latin1").strip(),
           "duration_s": 0.0, "width": 0, "height": 0, "n_tracks": 0,
           "has_video": False, "has_audio": False}

    def walk(start: int, stop: int) -> None:
        for btype, body, bend in _iter_boxes(blob, start, stop):
            if btype in (b"moov", b"trak", b"mdia"):
                if btype == b"trak":
                    out["n_tracks"] += 1
                walk(body, bend)
            elif btype == b"mvhd":
                ver = blob[body]
                if ver == 1:
                    ts = struct.unpack_from(">I", blob, body + 20)[0]
                    dur = struct.unpack_from(">Q", blob, body + 24)[0]
                else:
                    ts = struct.unpack_from(">I", blob, body + 12)[0]
                    dur = struct.unpack_from(">I", blob, body + 16)[0]
                if ts:
                    out["duration_s"] = dur / ts
            elif btype == b"tkhd":
                ver = blob[body]
                p = body + (88 if ver == 1 else 76)
                w16 = struct.unpack_from(">I", blob, p)[0] / 65536.0
                h16 = struct.unpack_from(">I", blob, p + 4)[0] / 65536.0
                if w16 and h16:
                    out["width"] = int(round(w16))
                    out["height"] = int(round(h16))
            elif btype == b"hdlr":
                handler = blob[body + 8:body + 12]
                if handler == b"vide":
                    out["has_video"] = True
                elif handler == b"soun":
                    out["has_audio"] = True

    walk(0, len(blob))
    return out


# --- AVI (RIFF header metadata only) -------------------------------------

def parse_avi(blob: bytes) -> dict:
    """RIFF AVI main header -> {width, height, n_frames, fps,
    duration_s}."""
    if sniff(blob) != "avi":
        raise ValueError("not a RIFF/AVI blob")
    pos = 12
    while pos + 8 <= len(blob):
        cid, clen = struct.unpack_from("<4sI", blob, pos)
        if cid == b"LIST" and blob[pos + 8:pos + 12] == b"hdrl":
            inner = pos + 12
            while inner + 8 <= pos + 8 + clen:
                icid, iclen = struct.unpack_from("<4sI", blob, inner)
                if icid == b"avih":
                    us_pf, _, _, _, frames = struct.unpack_from(
                        "<IIIII", blob, inner + 8)
                    w, h = struct.unpack_from("<II", blob, inner + 8 + 32)
                    fps = 1e6 / us_pf if us_pf else 0.0
                    return {"width": w, "height": h, "n_frames": frames,
                            "fps": fps,
                            "duration_s": frames / fps if fps else 0.0}
                inner += 8 + iclen + (iclen & 1)
        pos += 8 + clen + (clen & 1)
    raise ValueError("AVI without avih header")
