"""Vectorized ragged-segment index kernels shared by the pair-emitting
group reducers (``urls.mirror_hosts``, ``dedup_extras.
bbit_minhash_pairs``; the left-x-right variant lives inline in
``dedup_extras.jaccard_join.emit_cross``)."""

from __future__ import annotations

import numpy as np


def ragged_triangle_pairs(starts: np.ndarray, n: np.ndarray,
                          ok: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All within-segment index pairs ``(i_idx, j_idx)`` with
    ``i < j``, for the segments selected by ``ok``.

    ``starts``/``n`` describe consecutive segments of a sorted array
    (start offset and length); ``ok`` is a bool mask choosing which
    segments emit (the caller's size band / skew cap).  Fully
    vectorized: each live segment contributes its n*n grid via one
    repeat + div/mod, masked to the upper triangle — peak scratch is
    ``sum(n[ok]**2)`` int64 rows, so callers must cap segment sizes.
    Returns absolute row indices into the caller's sorted arrays.
    """
    n = np.asarray(n, dtype=np.int64)
    grid = np.where(ok, n * n, 0)
    total = int(grid.sum())
    empty = np.empty(0, dtype=np.int64)
    if total == 0:
        return empty, empty
    out_start = np.concatenate(([0], np.cumsum(grid)[:-1]))
    live = np.flatnonzero(grid)
    seg_row = np.repeat(live, grid[live])
    pos = np.arange(total, dtype=np.int64) - out_start[seg_row]
    i = pos // n[seg_row]
    j = pos % n[seg_row]
    tri = i < j
    sel = seg_row[tri]
    return starts[sel] + i[tri], starts[sel] + j[tri]
