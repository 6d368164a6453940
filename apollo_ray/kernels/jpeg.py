"""Baseline JPEG (ITU-T T.81, SOF0) decoder + encoder in pure
stdlib + numpy — no PIL/libjpeg in this container.

Decoder scope: baseline sequential Huffman-coded 8-bit JPEGs,
greyscale or YCbCr with any h/v sampling factors up to 2 (covers
4:4:4, 4:2:2 and 4:2:0), restart markers, 8/16-bit DQT.  Progressive
(SOF2) and arithmetic coding raise ``NotImplementedError`` — that is
the remaining strict-mode boundary in ``functions/multimodal.py``.

Encoder scope: greyscale / RGB input, 4:4:4 or 4:2:0, IJG quality
scaling, standard-style Huffman tables.  All tables ride in the
file's own DQT/DHT segments (as the spec requires), so encoder and
decoder are independently spec-conformant; round-trip tests assert
reconstruction error bounds against the known quantization loss.

Performance: entropy decoding is an inherently serial bit loop —
pure Python here, ~1 s/megapixel.  In the engine it runs inside the
multimodal actor pool (one image per task row, embarrassingly
parallel across the corpus); a production deployment would swap a
C-backed decoder into the same ``MediaFeatures._decode`` plug point
without touching any Ray plumbing.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg", "parse_jpeg"]


def _zigzag() -> np.ndarray:
    """Scan-position -> (row*8+col) block index, generated (not
    transcribed) from the diagonal traversal rule."""
    out = []
    for s in range(15):
        rng = range(s + 1) if s % 2 else range(s, -1, -1)
        for r in rng:
            c = s - r
            if r < 8 and c < 8:
                out.append(r * 8 + c)
    return np.array(out, dtype=np.int64)


_ZZ = _zigzag()

# Orthonormal 8-point DCT-II basis: spatial = C.T @ freq @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = (np.sqrt(0.125 if _k == 0 else 0.25)
                      * np.cos((2 * _n + 1) * _k * np.pi / 16.0))


def _idct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) frequency -> spatial, vectorized."""
    return np.einsum("kx,nky,yj->nxj", _C, blocks, _C, optimize=True)


def _dct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial -> frequency, vectorized."""
    return np.einsum("kx,nxy,yj->nkj", _C, blocks, _C.T, optimize=True)


# Base quantization tables (T.81 Annex K.1/K.2, the IJG defaults).
_QL_BASE = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QC_BASE = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Standard-style Huffman specs (bits-per-length, symbol order).  These
# are written into DHT and read back by any decoder, so exactness vs
# Annex K is not load-bearing — validity and completeness are.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
assert sum(_AC_BITS) == len(_AC_VALS) == 162


def _canonical_codes(bits: list[int], vals: list[int]) -> dict:
    """(length, code) -> symbol, per T.81 Annex C code assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _encode_codes(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code, length), inverse orientation for the encoder."""
    return {sym: (code, length)
            for (length, code), sym in _canonical_codes(bits, vals).items()}


class _BitReader:
    """MSB-first bit reader over unstuffed entropy-coded bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.cnt = 0

    def read_bit(self) -> int:
        if self.cnt == 0:
            if self.pos >= len(self.data):
                return 0  # spec: pad past end with 1s/0s; 0 is harmless
            self.buf = self.data[self.pos]
            self.pos += 1
            self.cnt = 8
        self.cnt -= 1
        return (self.buf >> self.cnt) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("corrupt JPEG: no Huffman code matched in 16 bits")


def _extend(v: int, t: int) -> int:
    """DIFF/AC value extension (T.81 F.2.2.1): t-bit magnitude v."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def parse_jpeg(blob: bytes) -> dict:
    """Metadata only: {width, height, n_components, progressive}."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            pos += 1
            continue
        marker = blob[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seglen = struct.unpack_from(">H", blob, pos + 2)[0]
        if marker in (0xC0, 0xC1, 0xC2):
            _, h, w, nc = struct.unpack_from(">BHHB", blob, pos + 4)
            return {"width": w, "height": h, "n_components": nc,
                    "progressive": marker == 0xC2}
        pos += 2 + seglen
    raise ValueError("corrupt JPEG: no SOF marker")


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Decode a baseline JPEG to uint8 (h, w) grey or (h, w, 3) RGB."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}   # (class, id) -> code table
    comps = None  # list of dicts: id, h, v, tq, td, ta
    w = h = 0
    restart_interval = 0
    pos = 2
    scan_comps = None
    while pos + 2 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker at %d" % pos)
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack_from(">H", blob, pos)[0]
        seg = blob[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:
                    tbl = np.frombuffer(seg[p:p + 128], dtype=">u2"
                                        ).astype(np.int64)
                    p += 128
                else:
                    tbl = np.frombuffer(seg[p:p + 64], dtype=np.uint8
                                        ).astype(np.int64)
                    p += 64
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                huff[(tc, th)] = _canonical_codes(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            _prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 1 + 5 + i * 3)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG supported (SOF%d found)"
                % (marker - 0xC0))
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tdta = seg[1 + i * 2], seg[2 + i * 2]
                comp = next(c for c in comps if c["id"] == cs)
                comp["td"], comp["ta"] = tdta >> 4, tdta & 0xF
                scan_comps.append(comp)
            break
        # APPn/COM/others: skipped via seglen
    if comps is None or scan_comps is None:
        raise ValueError("corrupt JPEG: missing SOF/SOS")

    # entropy-coded segment: up to the next non-RST marker; unstuff
    data = blob[pos:]
    out_chunks = []
    i = 0
    while i < len(data):
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < len(data) else 0xD9
            if nxt == 0x00:
                out_chunks.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RST: boundary byte-aligns the reader
                out_chunks.append(-1)
                i += 2
                continue
            break
        out_chunks.append(b)
        i += 1

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors > 2 unsupported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]   # blocks across
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 8, 8), dtype=np.float64)
        c["pred"] = 0

    # split unstuffed stream at RST boundaries (-1 sentinels)
    arr = out_chunks
    segments = []
    cur: list[int] = []
    for x in arr:
        if x == -1:
            segments.append(bytes(cur))
            cur = []
        else:
            cur.append(x)
    segments.append(bytes(cur))

    reader = _BitReader(segments[0])
    seg_idx = 0
    mcu_count = 0
    n_mcus = mcux * mcuy
    for my in range(mcuy):
        for mx in range(mcux):
            if (restart_interval and mcu_count
                    and mcu_count % restart_interval == 0):
                seg_idx += 1
                if seg_idx < len(segments):
                    reader = _BitReader(segments[seg_idx])
                for c in comps:
                    c["pred"] = 0
            for c in scan_comps:
                dc_tbl = huff[(0, c["td"])]
                ac_tbl = huff[(1, c["ta"])]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = reader.decode_huff(dc_tbl)
                        diff = _extend(reader.read_bits(t), t)
                        c["pred"] += diff
                        zz[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(ac_tbl)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("corrupt JPEG: AC overrun")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZZ] = zz * q
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["coef"][row * c["bw"] + col] = block.reshape(8, 8)
            mcu_count += 1
    assert mcu_count == n_mcus

    planes = []
    for c in comps:
        spat = _idct_blocks(c["coef"]) + 128.0
        bh, bw = c["bh"], c["bw"]
        plane = spat.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(bh * 8, bw * 8)
        # upsample to full image resolution (nearest), crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.cnt = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> i) & 1)
            self.cnt += 1
            if self.cnt == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.buf = 0
                self.cnt = 0

    def flush(self) -> None:
        while self.cnt:
            self.write(1, 1)  # pad with 1s per spec


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((_QL_BASE * scale + 50) // 100, 1, 255)
    qc = np.clip((_QC_BASE * scale + 50) // 100, 1, 255)
    return ql, qc


def _mag_cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_component_blocks(blocks_zz: np.ndarray, dc_codes: dict,
                             ac_codes: dict, bw_: _BitWriter,
                             pred: int) -> int:
    for zz in blocks_zz:
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        t = _mag_cat(diff)
        code, length = dc_codes[t]
        bw_.write(code, length)
        if t:
            bw_.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]
                bw_.write(code, length)
                run -= 16
            s = _mag_cat(v)
            code, length = ac_codes[(run << 4) | s]
            bw_.write(code, length)
            bw_.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            code, length = ac_codes[0x00]
            bw_.write(code, length)
    return pred


def _plane_to_zz(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Pad to 8-multiples (edge replicate), DCT, quantize, zigzag."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane.astype(np.float64) - 128.0,
                    ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, 8, 8)
    freq = _dct_blocks(blocks).reshape(-1, 64)
    zz = freq[:, _ZZ]
    return np.round(zz / q[_ZZ].astype(np.float64)).astype(np.int64)


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Encode uint8 (h, w) grey or (h, w, 3) RGB as baseline JPEG
    (4:2:0 when ``subsample``, else 4:4:4).  ``restart_interval`` > 0
    emits DRI + RSTn markers every that many MCUs."""
    img = np.asarray(img)
    grey = img.ndim == 2
    h, w = img.shape[:2]
    ql, qc = _quality_tables(quality)
    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    seg(0xDB, bytes([0]) + bytes(ql[_ZZ].astype(np.uint8)))
    if not grey:
        seg(0xDB, bytes([1]) + bytes(qc[_ZZ].astype(np.uint8)))
    sh, sv = (2, 2) if (subsample and not grey) else (1, 1)
    if grey:
        sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    else:
        sof = struct.pack(">BHHB", 8, h, w, 3) + bytes(
            [1, (sh << 4) | sv, 0, 2, 0x11, 1, 3, 0x11, 1])
    seg(0xC0, sof)
    for tc, th, bits, vals in ((0, 0, _DC_BITS, _DC_VALS),
                               (1, 0, _AC_BITS, _AC_VALS)):
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    if not grey:
        for tc in (0, 1):
            bits, vals = (_DC_BITS, _DC_VALS) if tc == 0 else (_AC_BITS,
                                                               _AC_VALS)
            seg(0xC4, bytes([(tc << 4) | 1]) + bytes(bits) + bytes(vals))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    if grey:
        seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    else:
        seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    dc0, ac0 = _encode_codes(_DC_BITS, _DC_VALS), _encode_codes(_AC_BITS,
                                                                _AC_VALS)
    bw_ = _BitWriter()
    rst_n = 0

    def maybe_rst(mcu_idx: int, preds: list) -> None:
        """RST boundary: byte-align, emit marker raw (markers are
        never stuffed), reset DC predictors."""
        nonlocal rst_n
        if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
            bw_.flush()
            bw_.out.extend((0xFF, 0xD0 + (rst_n & 7)))
            rst_n += 1
            for i in range(len(preds)):
                preds[i] = 0

    if grey:
        zz = _plane_to_zz(img, ql)
        if not restart_interval:
            _encode_component_blocks(zz, dc0, ac0, bw_, 0)
        else:
            preds = [0]
            for i in range(len(zz)):
                maybe_rst(i, preds)
                preds[0] = _encode_component_blocks(
                    zz[i:i + 1], dc0, ac0, bw_, preds[0])
    else:
        rgb = img.astype(np.float64)
        y = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
             + 0.114 * rgb[..., 2])
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
            + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
            - 0.081312 * rgb[..., 2]
        if subsample:
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        # Interleave per MCU: with 4:4:4 every component is one block
        # per MCU; with 4:2:0 Y contributes a 2x2 block quad.
        yzz = _plane_to_zz(y, ql)
        cbzz = _plane_to_zz(cb, qc)
        crzz = _plane_to_zz(cr, qc)
        ybw = -(-w // 8) if not subsample else -(-w // 16) * 2
        if subsample:
            # pad Y to an even number of blocks in both axes
            ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
            ypad = np.pad(y, ((0, ph - h), (0, pw - w)), mode="edge")
            yzz = _plane_to_zz(ypad, ql)
            ybw = pw // 8
        cbw = -(-cb.shape[1] // 8)
        preds = [0, 0, 0]
        n_mcux = -(-w // (16 if subsample else 8))
        n_mcuy = -(-h // (16 if subsample else 8))
        for my in range(n_mcuy):
            for mx in range(n_mcux):
                maybe_rst(my * n_mcux + mx, preds)
                if subsample:
                    quad = [yzz[(2 * my + by) * ybw + 2 * mx + bx]
                            for by in range(2) for bx in range(2)]
                    preds[0] = _encode_component_blocks(
                        np.array(quad), dc0, ac0, bw_, preds[0])
                else:
                    preds[0] = _encode_component_blocks(
                        yzz[my * ybw + mx:my * ybw + mx + 1],
                        dc0, ac0, bw_, preds[0])
                ci = my * cbw + mx
                preds[1] = _encode_component_blocks(
                    cbzz[ci:ci + 1], dc0, ac0, bw_, preds[1])
                preds[2] = _encode_component_blocks(
                    crzz[ci:ci + 1], dc0, ac0, bw_, preds[2])
    bw_.flush()
    out.extend(bw_.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
