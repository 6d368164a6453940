"""Mergeable distinct-count sketches — KMV and HyperLogLog.

At 100 TB an exact ``count(DISTINCT text)`` is a full-corpus shuffle
of the key column; these sketches answer the same question with one
map pass emitting O(k) / O(m) rows per batch and a tiny max/min merge
— the sketch state is map-side mergeable by construction, which is
exactly the property that lets a 256-node cluster tree-reduce it.

- :func:`distinct_count_kmv` — K-Minimum-Values (Bar-Yossef et al.
  2002): track the k smallest distinct 64-bit hashes; the k-th
  smallest value h_(k) estimates n ≈ (k-1) * 2^64 / h_(k).  Relative
  error ~ 1/sqrt(k-2).  Exact (not estimated) whenever fewer than k
  distinct keys exist.
- :func:`distinct_count_hll` — HyperLogLog (Flajolet et al. 2007):
  m registers keyed by ``md5_number_lower % m``, each holding the max
  rank (1 + leading zeros) of ``md5_number_upper``; raw estimate
  alpha_m * m^2 / sum(2^-reg).  Relative error ~ 1.04/sqrt(m).  The
  small-range linear-counting correction (E <= 2.5m) is NOT applied
  inside the operator — ``n_seen`` (non-empty registers) is returned
  so callers can; keeping the output a pure integer function of the
  registers is what makes it SQL-oracle-able.

Both sketches hash with md5 (DuckDB ``md5_number_lower`` /
``md5_number_upper`` semantics) and do all estimate arithmetic in
exact integers — register contributions 2^-r are scaled by 2^65 and
alpha_m is snapped to micro-units — so the DuckDB oracle (HUGEINT
shifts and ``//``) reproduces every output bit.  Duplicate keys are
absorbed by construction (same hash -> same register/min-set), so
neither sketch needs a distinct pass first.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from apollo_ray.hashing import mix_to_partition

TWO64 = 1 << 64
TWO65 = 1 << 65


def _md5_pairs(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    from apollo_ray.functions.bloom import _md5_halves
    return _md5_halves(texts)


def _rank64(u: np.ndarray) -> np.ndarray:
    """1 + count-of-leading-zeros for uint64 (u == 0 -> 65), exact
    (no float log), via branchless binary-search clz."""
    out = np.full(u.shape, 65, dtype=np.int64)
    nz = u != 0
    y = u[nz].copy()
    lz = np.zeros(y.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        top = y >> np.uint64(64 - s)
        zero = top == 0
        lz[zero] += s
        y[zero] = y[zero] << np.uint64(s)
    out[nz] = lz + 1
    return out


def distinct_count_kmv(ds: "ray.data.Dataset", key: str = "text",
                       k: int = 256, num_partitions: int = 64
                       ) -> pa.Table:
    """One-row table (k, n_seen, kth_view, est): KMV distinct-count of
    ``ds[key]``.  ``n_seen`` = min(k, true distinct count of hashes);
    ``kth_view`` = the largest tracked hash reinterpreted as int64;
    ``est`` = exact count when n_seen < k, else (k-1)*2^64 // h_(k).

    Shape: per batch at most k (hash, pkey) rows (the batch's k
    smallest distinct), one pkey shuffle co-locating equal hashes, per
    partition again the k smallest distinct, and a driver merge of
    <= k * num_partitions already-globally-distinct values."""
    empty = pa.table({"h": pa.array([], type=pa.int64()),
                      "pkey": pa.array([], type=pa.int32())})

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(key).to_pylist()
        if not texts:
            return empty
        lo, _ = _md5_pairs([str(t) for t in texts])
        h = np.unique(lo)[:k]
        return pa.table({
            "h": pa.array(h.view(np.int64), type=pa.int64()),
            "pkey": pa.array(mix_to_partition(h.view(np.int64),
                                              num_partitions),
                             type=pa.int32()),
        })

    def merge_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty.drop_columns(["pkey"])
        h = np.unique(np.asarray(group.column("h"),
                                 dtype=np.int64).view(np.uint64))[:k]
        return pa.table({"h": pa.array(h.view(np.int64), type=pa.int64())})

    rows = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("pkey").map_groups(merge_part, batch_format="pyarrow") \
        .take_all()
    hs = np.sort(np.asarray([r["h"] for r in rows],
                            dtype=np.int64).view(np.uint64))[:k]
    n_seen = len(hs)
    if n_seen == 0:
        kth_view, est = 0, 0
    elif n_seen < k:
        kth_view, est = int(hs[-1].view(np.int64)), n_seen
    else:
        kth_view = int(hs[-1].view(np.int64))
        est = (k - 1) * TWO64 // int(hs[-1])
    return pa.table({
        "k": pa.array([k], type=pa.int64()),
        "n_seen": pa.array([n_seen], type=pa.int64()),
        "kth_view": pa.array([kth_view], type=pa.int64()),
        "est": pa.array([est], type=pa.int64()),
    })


def distinct_count_kmv_sql(k: int = 256, table: str = "documents",
                           key: str = "text") -> str:
    """DuckDB oracle for :func:`distinct_count_kmv` (same hash, same
    uint64 ordering, same exact-below-k rule, HUGEINT estimate)."""
    return f"""
    WITH h AS (SELECT DISTINCT md5_number_lower(CAST({key} AS VARCHAR))
                   AS h FROM {table}),
    kmin AS (SELECT h FROM h ORDER BY h LIMIT {k}),
    agg AS (SELECT count(*) AS n, max(h) AS mx FROM kmin)
    SELECT CAST({k} AS BIGINT) AS k,
           CAST(n AS BIGINT) AS n_seen,
           CAST(CASE WHEN n = 0 THEN 0
                WHEN CAST(mx AS HUGEINT) >= (1::HUGEINT << 63)
                THEN CAST(mx AS HUGEINT) - (1::HUGEINT << 64)
                ELSE CAST(mx AS HUGEINT) END AS BIGINT) AS kth_view,
           CAST(CASE WHEN n < {k} THEN n
                ELSE ({k} - 1)::HUGEINT * (1::HUGEINT << 64)
                     // CAST(mx AS HUGEINT) END AS BIGINT) AS est
    FROM agg
"""


# alpha_m in micro-units: round(1e6 * 0.7213 / (1 + 1.079 / m))
def _alpha_micro(m: int) -> int:
    if m == 16:
        a = 0.673
    elif m == 32:
        a = 0.697
    elif m == 64:
        a = 0.709
    else:
        a = 0.7213 / (1 + 1.079 / m)
    return round(a * 1_000_000)


def distinct_count_hll(ds: "ray.data.Dataset", key: str = "text",
                       log2_m: int = 8, num_partitions: int = 64
                       ) -> pa.Table:
    """One-row table (m, n_seen, est_raw): HyperLogLog distinct-count
    of ``ds[key]``.  ``est_raw`` is the uncorrected HLL estimate
    computed entirely in integers:
    ``alpha_micro * m^2 * 2^65 // (S * 1e6)`` with
    ``S = sum_b 2^(65 - reg_b)`` (empty registers contribute 2^65).

    Shape: per batch at most m (bucket, max_rank) partial rows, one
    pkey max-merge, driver folds <= m rows into the estimate."""
    m = 1 << log2_m
    empty = pa.table({"b": pa.array([], type=pa.int64()),
                      "r": pa.array([], type=pa.int64()),
                      "pkey": pa.array([], type=pa.int32())})

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(key).to_pylist()
        if not texts:
            return empty
        lo, hi = _md5_pairs([str(t) for t in texts])
        b = (lo % np.uint64(m)).astype(np.int64)
        r = _rank64(hi)
        reg = np.zeros(m, dtype=np.int64)
        np.maximum.at(reg, b, r)
        nz = np.flatnonzero(reg)
        return pa.table({
            "b": pa.array(nz, type=pa.int64()),
            "r": pa.array(reg[nz], type=pa.int64()),
            "pkey": pa.array(mix_to_partition(nz, num_partitions),
                             type=pa.int32()),
        })

    def max_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty.drop_columns(["pkey"])
        b = np.asarray(group.column("b"), dtype=np.int64)
        r = np.asarray(group.column("r"), dtype=np.int64)
        ub, inv = np.unique(b, return_inverse=True)
        mx = np.zeros(len(ub), dtype=np.int64)
        np.maximum.at(mx, inv, r)
        return pa.table({"b": pa.array(ub, type=pa.int64()),
                         "r": pa.array(mx, type=pa.int64())})

    rows = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("pkey").map_groups(max_part, batch_format="pyarrow") \
        .take_all()
    n_seen = len(rows)
    s = (m - n_seen) * TWO65 + sum((TWO65 >> r["r"]) for r in rows)
    est = _alpha_micro(m) * m * m * TWO65 // (s * 1_000_000)
    return pa.table({
        "m": pa.array([m], type=pa.int64()),
        "n_seen": pa.array([n_seen], type=pa.int64()),
        "est_raw": pa.array([est], type=pa.int64()),
    })


def distinct_count_hll_sql(log2_m: int = 8, table: str = "documents",
                           key: str = "text") -> str:
    """DuckDB oracle for :func:`distinct_count_hll`: identical
    bucket/rank derivation (rank via the smallest r in 1..64 with
    upper >= 2^(64-r); upper = 0 -> 65) and the same all-integer
    HUGEINT estimate."""
    m = 1 << log2_m
    a = _alpha_micro(m)
    return f"""
    WITH hsh AS (
      SELECT DISTINCT
             CAST(md5_number_lower(CAST({key} AS VARCHAR)) % {m}
                  AS BIGINT) AS b,
             CAST(md5_number_upper(CAST({key} AS VARCHAR)) AS HUGEINT) AS u
      FROM {table}),
    rk AS (
      SELECT b, coalesce((SELECT min(t.r) FROM range(1, 65) t(r)
                          WHERE u >= (1::HUGEINT << (64 - t.r))), 65) AS r
      FROM hsh),
    reg AS (SELECT b, max(r) AS mr FROM rk GROUP BY b),
    s AS (SELECT count(*) AS n_seen,
                 sum(1::HUGEINT << (65 - mr)) AS s_seen FROM reg)
    SELECT CAST({m} AS BIGINT) AS m,
           CAST(n_seen AS BIGINT) AS n_seen,
           CAST({a}::HUGEINT * {m} * {m} * (1::HUGEINT << 65)
                // ((coalesce(s_seen, 0::HUGEINT)
                     + ({m} - n_seen) * (1::HUGEINT << 65)) * 1000000)
                AS BIGINT) AS est_raw
    FROM s
"""
