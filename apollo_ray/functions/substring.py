"""Duplicated-substring detection (the suffix-array-substring dedup
family of Lee et al. 2021, "Deduplicating Training Data Makes Language
Models Better") re-expressed Ray-Data-first.

A global suffix array is inherently one giant sorted structure; the
distributed equivalent is window fingerprinting: every length-``L``
character window of every doc is hashed, windows whose fingerprint
occurs >= 2 times anywhere in the corpus are duplicate marks, and the
per-doc union of overlapping marks is exactly the set of maximal
duplicated regions of length >= L.  Two modes:

- **exact** (stride 1, default): every window position is emitted —
  O(total_chars) shuffle rows.  Result is exact and SQL-oracle-able
  (the ``substring_dup_spans`` driver query); right at small/medium
  scale, too heavy for 100 TB.
- **winnowed** (``winnow_w`` set): per position-window of ``w``
  consecutive fingerprints only the minimum is emitted (the MOSS
  winnowing scheme, Schleimer et al. 2003) — expected density
  2/(w+1), with the guarantee that every duplicated region of length
  >= L + w - 1 still shares at least one selected fingerprint in all
  its occurrences.  Output spans are the selected anchor windows
  (a subset of the exact spans); recall of *regions* is tested
  against exact mode in tests/test_substring.py.

Window hashes are double 31-bit polynomial rolling hashes over unicode
codepoints (utf-32), combined to 62 bits — vectorized numpy, O(n) per
doc, no per-window string materialization.  Shuffles use the repo's
pkey pattern (hash-partition + one vectorized reduction per
partition), never a per-key ``map_groups``.

Scale notes (100 TB): the fingerprint exchange is the dominant cost;
winnowing divides it by ~(w+1)/2, and the partition key is the
fingerprint itself so hot windows (boilerplate) concentrate — a
``max_post`` cap drops fingerprints whose posting list exceeds the
cap (boilerplate that common is better handled by the line-level
C4-style filters anyway), mirroring ``max_posting`` in
``ngram_jaccard_pairs``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from apollo_ray.hashing import mix_to_partition

_P1 = np.uint64(2147483647)   # 2^31 - 1
_P2 = np.uint64(2147483629)
_B1 = 1000003
_B2 = 999979


class _PowCache:
    """Per-process cache of B^j and B^-j mod p tables (grown on
    demand, doubling)."""

    def __init__(self, base: int, p: int):
        self.base, self.p = base, p
        self.inv = pow(base, p - 2, p)
        self.pw = np.array([1, base], dtype=np.uint64)
        self.ipw = np.array([1, self.inv], dtype=np.uint64)

    def grow(self, n: int) -> None:
        m = len(self.pw)
        if m > n:
            return
        new_len = max(n + 1, 2 * m)
        pw = np.empty(new_len, dtype=np.uint64)
        ipw = np.empty(new_len, dtype=np.uint64)
        pw[:m], ipw[:m] = self.pw, self.ipw
        p = self.p
        b, ib = self.base, self.inv
        x, y = int(pw[m - 1]), int(ipw[m - 1])
        for j in range(m, new_len):
            x = (x * b) % p
            y = (y * ib) % p
            pw[j] = x
            ipw[j] = y
        self.pw, self.ipw = pw, ipw


_POWS: dict[tuple[int, int], _PowCache] = {}


def _pows(base: int, p: np.uint64) -> _PowCache:
    key = (base, int(p))
    c = _POWS.get(key)
    if c is None:
        c = _POWS[key] = _PowCache(base, int(p))
    return c


def _window_hashes_one(cp: np.ndarray, L: int, base: int, p: np.uint64
                       ) -> np.ndarray:
    """Polynomial hashes of every length-L window of codepoint array
    ``cp``: h(i) = sum_t cp[i+t] * B^(L-1-t) mod p, vectorized via
    inverse-power prefix sums (raw uint64 cumsum stays < 2^52 for docs
    up to 2^20 chars; longer docs are hashed in segments)."""
    n = len(cp)
    c = _pows(base, p)
    c.grow(n + L)
    nw = n - L + 1
    out = np.empty(nw, dtype=np.uint64)
    seg = 1 << 20
    start = 0
    while start < nw:
        stop = min(nw, start + seg)
        hi = stop + L - 1  # rows of cp needed: [start, hi)
        terms = (cp[start:hi] % p) * c.ipw[:hi - start] % p
        R = np.zeros(hi - start + 1, dtype=np.uint64)
        np.cumsum(terms, out=R[1:])
        diff = (R[L:] - R[:stop - start]) % p
        out[start:stop] = diff * c.pw[L - 1:hi - start] % p
        start = stop
    return out


def window_fingerprints(text: str, L: int) -> np.ndarray:
    """62-bit combined double-hash fingerprints (int64, non-negative)
    of every length-L codepoint window; empty for len(text) < L."""
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32
                       ).astype(np.uint64)
    if len(cp) < L:
        return np.empty(0, dtype=np.int64)
    h1 = _window_hashes_one(cp, L, _B1, _P1)
    h2 = _window_hashes_one(cp, L, _B2, _P2)
    return ((h1 << np.uint64(31)) ^ h2).astype(np.int64)


def winnow_positions(h: np.ndarray, w: int) -> np.ndarray:
    """Robust-winnowing selection: the positions of the minimum hash in
    each window of ``w`` consecutive window-hashes (first-min; dedup'd).
    Guarantees every shared run of >= w consecutive equal hashes keeps
    at least one selected position."""
    n = len(h)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n <= w:
        return np.array([int(np.argmin(h))], dtype=np.int64)
    win = np.lib.stride_tricks.sliding_window_view(h, w)
    sel = np.argmin(win, axis=1) + np.arange(n - w + 1, dtype=np.int64)
    return np.unique(sel)


class WindowHashStage:
    """map_batches callable: (fp, doc_id, pos) rows for every
    (winnowed) window.  Power tables build once per actor."""

    def __init__(self, L: int, winnow_w: int | None = None):
        self.L = int(L)
        self.w = winnow_w
        _pows(_B1, _P1).grow(1 << 12)
        _pows(_B2, _P2).grow(1 << 12)

    def __call__(self, batch: pa.Table) -> pa.Table:
        fp_out: list[np.ndarray] = []
        doc_out: list[np.ndarray] = []
        pos_out: list[np.ndarray] = []
        for did, t in zip(batch.column("doc_id").to_pylist(),
                          batch.column("text").to_pylist()):
            fps = window_fingerprints(t, self.L)
            if len(fps) == 0:
                continue
            if self.w:
                pos = winnow_positions(fps, self.w)
                fps = fps[pos]
            else:
                pos = np.arange(len(fps), dtype=np.int64)
            fp_out.append(fps)
            doc_out.append(np.full(len(fps), did, dtype=np.int64))
            pos_out.append(pos)
        if not fp_out:
            return pa.table({"fp": pa.array([], type=pa.int64()),
                             "doc_id": pa.array([], type=pa.int64()),
                             "pos": pa.array([], type=pa.int64())})
        return pa.table({
            "fp": pa.array(np.concatenate(fp_out), type=pa.int64()),
            "doc_id": pa.array(np.concatenate(doc_out), type=pa.int64()),
            "pos": pa.array(np.concatenate(pos_out), type=pa.int64()),
        })


def _dup_marks(windows: "ray.data.Dataset", num_partitions: int,
               max_post: int) -> "ray.data.Dataset":
    """Keep (doc_id, pos) of windows whose fingerprint occurs >= 2
    times corpus-wide (pkey pattern: partition by fp, one vectorized
    sort + segment count per partition)."""

    def add_pkey(batch: pa.Table) -> pa.Table:
        fp = np.asarray(batch.column("fp"), dtype=np.int64)
        return batch.append_column(
            "pkey", pa.array(mix_to_partition(fp, num_partitions),
                             type=pa.int32()))

    def reduce_part(group: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "pos": pa.array([], type=pa.int64())})
        fp = np.asarray(group.column("fp"), dtype=np.int64)
        if len(fp) == 0:
            return empty
        d = np.asarray(group.column("doc_id"), dtype=np.int64)
        pos = np.asarray(group.column("pos"), dtype=np.int64)
        order = np.argsort(fp, kind="stable")
        fp_s = fp[order]
        first = np.empty(len(fp_s), dtype=bool)
        first[0] = True
        first[1:] = fp_s[1:] != fp_s[:-1]
        gid = np.cumsum(first) - 1
        counts = np.bincount(gid)
        keep = (counts[gid] >= 2) & (counts[gid] <= max_post)
        if not keep.any():
            return empty
        sel = order[keep]
        return pa.table({"doc_id": pa.array(d[sel], type=pa.int64()),
                         "pos": pa.array(pos[sel], type=pa.int64())})

    return windows.map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(reduce_part, batch_format="pyarrow")


def _merge_spans(marks: "ray.data.Dataset", L: int,
                 num_partitions: int) -> "ray.data.Dataset":
    """(doc_id, start_pos, end_pos, span_len) maximal merged spans.
    Marks all have length L and sorted starts give sorted ends, so the
    island break test is simply start > previous end."""

    def add_pkey(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch.column("doc_id"), dtype=np.int64)
        return batch.append_column(
            "pkey", pa.array(mix_to_partition(d, num_partitions),
                             type=pa.int32()))

    def reduce_part(group: pa.Table) -> pa.Table:
        d = np.asarray(group.column("doc_id"), dtype=np.int64)
        if len(d) == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "start_pos": pa.array([], type=pa.int64()),
                             "end_pos": pa.array([], type=pa.int64()),
                             "span_len": pa.array([], type=pa.int64())})
        s = np.asarray(group.column("pos"), dtype=np.int64)
        order = np.lexsort((s, d))
        d_s, s_s = d[order], s[order]
        e_s = s_s + L
        brk = np.empty(len(d_s), dtype=bool)
        brk[0] = True
        brk[1:] = (d_s[1:] != d_s[:-1]) | (s_s[1:] > e_s[:-1])
        starts = np.flatnonzero(brk)
        last = np.append(starts[1:], len(d_s)) - 1
        return pa.table({
            "doc_id": pa.array(d_s[starts], type=pa.int64()),
            "start_pos": pa.array(s_s[starts], type=pa.int64()),
            "end_pos": pa.array(e_s[last], type=pa.int64()),
            "span_len": pa.array(e_s[last] - s_s[starts], type=pa.int64()),
        })

    return marks.map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(reduce_part, batch_format="pyarrow")


def substring_dup_spans(docs: "ray.data.Dataset", min_len: int = 40,
                        winnow_w: int | None = None,
                        num_partitions: int = 64,
                        max_post: int = 100_000,
                        concurrency: int = 8) -> "ray.data.Dataset":
    """Maximal duplicated character spans of length >= ``min_len``
    across (and within) documents — see module docstring for modes.

    Returns (doc_id, start_pos, end_pos, span_len); ``end_pos`` is
    exclusive, positions are 0-based codepoint offsets."""
    windows = docs.map_batches(
        WindowHashStage, fn_constructor_kwargs={"L": min_len,
                                                "winnow_w": winnow_w},
        batch_format="pyarrow", concurrency=(1, concurrency))
    marks = _dup_marks(windows, num_partitions, max_post)
    return _merge_spans(marks, min_len, num_partitions)


def _spans_per_doc(spans: "ray.data.Dataset", num_partitions: int
                   ) -> "ray.data.Dataset":
    """(doc_id, starts: binary, ends: binary) — one row per doc with
    the sorted span offsets packed as int64 blobs, so the docs join
    below never replicates text per span (and stays Acero-joinable)."""

    def add_pkey(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch.column("doc_id"), dtype=np.int64)
        return batch.append_column(
            "pkey", pa.array(mix_to_partition(d, num_partitions),
                             type=pa.int32()))

    def reduce_part(group: pa.Table) -> pa.Table:
        d = np.asarray(group.column("doc_id"), dtype=np.int64)
        if len(d) == 0:
            return pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "starts": pa.array([], type=pa.binary()),
                "ends": pa.array([], type=pa.binary())})
        s = np.asarray(group.column("start_pos"), dtype=np.int64)
        e = np.asarray(group.column("end_pos"), dtype=np.int64)
        order = np.lexsort((s, d))
        d_s, s_s, e_s = d[order], s[order], e[order]
        first = np.empty(len(d_s), dtype=bool)
        first[0] = True
        first[1:] = d_s[1:] != d_s[:-1]
        off = np.append(np.flatnonzero(first), len(d_s))
        # packed little-endian int64 blobs: Acero joins do not accept
        # list-typed non-key columns, binary passes through fine
        starts = [s_s[a:b].tobytes() for a, b in zip(off[:-1], off[1:])]
        ends = [e_s[a:b].tobytes() for a, b in zip(off[:-1], off[1:])]
        return pa.table({
            "doc_id": pa.array(d_s[off[:-1]], type=pa.int64()),
            "starts": pa.array(starts, type=pa.binary()),
            "ends": pa.array(ends, type=pa.binary()),
        })

    return spans.map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(reduce_part, batch_format="pyarrow")


def cut_dup_spans(docs: "ray.data.Dataset", spans: "ray.data.Dataset",
                  num_partitions: int = 64) -> "ray.data.Dataset":
    """Remove every span in ``spans`` (e.g. the
    :func:`substring_dup_spans` output) from its document's text —
    the dedup ACTION of Lee et al. 2021 (their released tool likewise
    cuts all occurrences of duplicated substrings).

    Spans are aggregated to one list row per doc before the join, so
    document text is never replicated per span; docs without spans
    pass through unchanged (left outer join).  Returns the docs
    schema with ``text`` rewritten, ``text_hash`` recomputed and an
    added ``n_cut_chars``."""
    from apollo_ray.hashing import hash_utf8
    from apollo_ray.util import hash_join
    span_lists = _spans_per_doc(spans, num_partitions)
    joined = hash_join(docs, span_lists, on=("doc_id",),
                       join_type="left_outer",
                       num_partitions=num_partitions)

    def cut(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        starts = batch.column("starts").to_pylist()
        ends = batch.column("ends").to_pylist()
        out_t: list[str] = []
        n_cut = np.zeros(len(texts), dtype=np.int64)
        for i, (t, sb, eb) in enumerate(zip(texts, starts, ends)):
            if not sb:
                out_t.append(t)
                continue
            ss = np.frombuffer(sb, dtype=np.int64)
            ee = np.frombuffer(eb, dtype=np.int64)
            # spans are sorted, already merged (non-overlapping);
            # cut in codepoint space to match span offsets
            parts = []
            pos = 0
            for s, e in zip(ss, ee):
                parts.append(t[pos:s])
                n_cut[i] += e - s
                pos = e
            parts.append(t[pos:])
            out_t.append("".join(parts))
        keep_cols = [c for c in batch.column_names
                     if c not in ("text", "text_hash", "starts", "ends")]
        out = {c: batch.column(c) for c in keep_cols}
        out["text"] = pa.array(out_t, type=pa.string())
        out["text_hash"] = pa.array([hash_utf8(t) for t in out_t],
                                    type=pa.int64())
        out["n_cut_chars"] = pa.array(n_cut, type=pa.int64())
        return pa.table(out)

    return joined.map_batches(cut, batch_format="pyarrow")
