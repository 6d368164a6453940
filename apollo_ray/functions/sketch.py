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


def cms_token_counts(docs: "ray.data.Dataset", depth: int = 4,
                     log2_w: int = 12, n_probe: int = 20,
                     num_partitions: int = 64) -> pa.Table:
    """Count-Min Sketch term-frequency estimation (Cormode &
    Muthukrishnan 2005): build a depth × w counter table over all
    token occurrences, then report, for a deterministic probe set
    (the ``n_probe`` distinct tokens with smallest md5), the CMS
    estimate next to the exact count — (token, est, exact).  CMS
    guarantees est >= exact, with overcount <= 2N/w at probability
    1 - 2^-depth; counters merge by ADDITION, so at 100 TB each node
    folds its local d × w table and one tree-reduce yields the
    corpus sketch — no token-keyed shuffle.

    Row hashes are ``md5(j || ':' || token) % w`` (DuckDB
    ``md5_number_lower`` semantics), everything is integer counts, so
    the whole output is SQL-oracle-exact.  The exact side reuses the
    :func:`lm.token_term_freqs` shuffle; the probe set is a
    distributed sort+limit over the (small) distinct-token table.

    The sketch build emits at most depth × batch-distinct-token
    partial rows per batch, pkey-merged to <= depth * w total rows
    and folded on the driver (d*w is a design constant — 4 x 4096
    counters = 128 KB here)."""
    from apollo_ray.functions.lm import token_term_freqs

    w = 1 << log2_w
    tf = token_term_freqs(docs, num_partitions)

    def add_h(batch: pa.Table) -> pa.Table:
        """Probe sort key: md5 XOR 2^63 viewed as int64 — a monotone
        map of uint64 order into int64 order, so ``sort`` ranks by the
        raw md5 like the SQL twin's ``ORDER BY md5_number_lower``."""
        toks = batch.column("token").to_pylist()
        h = np.fromiter((_md5_str_u64(t) for t in toks),
                        dtype=np.uint64, count=len(toks))
        h = (h ^ np.uint64(1 << 63)).view(np.int64)
        return batch.append_column("h", pa.array(h, type=pa.int64()))

    # probe rows carry their exact counts for free
    probe_rows = tf.map_batches(add_h, batch_format="pyarrow") \
        .sort("h").limit(n_probe).take_all()

    empty = pa.table({"j": pa.array([], type=pa.int64()),
                      "b": pa.array([], type=pa.int64()),
                      "c": pa.array([], type=pa.int64()),
                      "pkey": pa.array([], type=pa.int32())})

    def partial(batch: pa.Table) -> pa.Table:
        """Per batch: d partial counter rows per batch-distinct token
        (weights = that token's occurrence count in the batch)."""
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        from apollo_ray.functions.textstats import _split_tokens
        flat = _split_tokens(text).flatten()
        if len(flat) == 0:
            return empty
        vc = flat.value_counts()
        toks = vc.field("values").to_pylist()
        cnt = np.asarray(vc.field("counts"), dtype=np.int64)
        js, bs, cs = [], [], []
        for j in range(depth):
            pre = "%d:" % j
            hb = np.fromiter((_md5_str_u64(pre + t) for t in toks),
                             dtype=np.uint64, count=len(toks))
            b = (hb % np.uint64(w)).astype(np.int64)
            acc = np.zeros(w, dtype=np.int64)
            np.add.at(acc, b, cnt)
            nz = np.flatnonzero(acc)
            js.append(np.full(len(nz), j, dtype=np.int64))
            bs.append(nz)
            cs.append(acc[nz])
        j_a, b_a, c_a = (np.concatenate(x) for x in (js, bs, cs))
        key = j_a * w + b_a
        return pa.table({
            "j": pa.array(j_a, type=pa.int64()),
            "b": pa.array(b_a, type=pa.int64()),
            "c": pa.array(c_a, type=pa.int64()),
            "pkey": pa.array(mix_to_partition(key, num_partitions),
                             type=pa.int32()),
        })

    def sum_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty.drop_columns(["pkey"])
        j = np.asarray(group.column("j"), dtype=np.int64)
        b = np.asarray(group.column("b"), dtype=np.int64)
        c = np.asarray(group.column("c"), dtype=np.int64)
        key = j * w + b
        uk, inv = np.unique(key, return_inverse=True)
        tot = np.bincount(inv, weights=c).astype(np.int64)
        return pa.table({"j": pa.array(uk // w, type=pa.int64()),
                         "b": pa.array(uk % w, type=pa.int64()),
                         "c": pa.array(tot, type=pa.int64())})

    cms_rows = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("pkey").map_groups(sum_part, batch_format="pyarrow") \
        .take_all()
    cms = np.zeros((depth, w), dtype=np.int64)
    for r in cms_rows:
        cms[r["j"], r["b"]] = r["c"]

    out_tok, out_est, out_exact = [], [], []
    for r in sorted(probe_rows, key=lambda r: r["h"]):
        t = r["token"]
        est = min(int(cms[j, _md5_str_u64("%d:%s" % (j, t)) % w])
                  for j in range(depth))
        out_tok.append(t)
        out_est.append(est)
        out_exact.append(int(r["n"]))
    return pa.table({
        "token": pa.array(out_tok, type=pa.string()),
        "est": pa.array(out_est, type=pa.int64()),
        "exact": pa.array(out_exact, type=pa.int64()),
    })


def _md5_str_u64(s: str) -> int:
    from apollo_ray.kernels.text import _md5_u64
    return _md5_u64(s)


def cms_token_counts_sql(depth: int = 4, log2_w: int = 12,
                         n_probe: int = 20) -> str:
    """DuckDB oracle for :func:`cms_token_counts`: identical row
    hashes, counter sums, probe selection (smallest md5 of the
    distinct tokens), and min-over-rows estimate."""
    w = 1 << log2_w
    return rf"""
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS t
      FROM documents WHERE length(trim(text)) > 0),
    cms AS (
      SELECT s.j AS j,
             CAST(md5_number_lower(CAST(s.j AS VARCHAR) || ':' || t)
                  % {w} AS BIGINT) AS b,
             CAST(count(*) AS BIGINT) AS c
      FROM tok, range({depth}) s(j) GROUP BY j, b),
    probe AS (
      SELECT t, CAST(count(*) AS BIGINT) AS exact
      FROM tok GROUP BY t
      ORDER BY md5_number_lower(t), t LIMIT {n_probe}),
    pe AS (
      SELECT p.t AS token, p.exact, s.j AS j,
             CAST(md5_number_lower(CAST(s.j AS VARCHAR) || ':' || p.t)
                  % {w} AS BIGINT) AS b
      FROM probe p, range({depth}) s(j))
    SELECT pe.token, CAST(min(cms.c) AS BIGINT) AS est,
           pe.exact AS exact
    FROM pe JOIN cms ON cms.j = pe.j AND cms.b = pe.b
    GROUP BY pe.token, pe.exact
"""


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


def heavy_hitters(docs: "ray.data.Dataset", phi_ppm: int = 5000,
                  summary_k: int | None = None,
                  num_partitions: int = 16) -> "ray.data.Dataset":
    """Frequent tokens via mergeable Misra-Gries summaries — every
    token whose corpus occurrence count exceeds ``phi_ppm`` parts per
    million of all token occurrences, with its EXACT count:
    (token, n).

    The 100-TB alternative to ``GROUP BY token HAVING count(*) > T``:
    the full group-by shuffles the entire vocabulary, while this
    operator's intermediate state is bounded by construction.  Pass 1
    builds a size-``summary_k`` Misra-Gries summary per batch
    (exact per-batch counts truncated by subtracting the (k+1)-th
    largest — the merge operation of Agarwal et al. 2012, "Mergeable
    Summaries", whose key theorem is that truncation at every merge
    level still keeps the TOTAL undercount <= N/(k+1)); summaries
    tree-merge through ``num_partitions`` groups, so no stage holds
    more than ``num_partitions * (summary_k + 1)`` rows.  Any token
    with true count > N/(k+1) survives to the final summary, so with
    ``(summary_k + 1) * phi_ppm > 1e6`` the candidate set — final
    estimates within N//(k+1) of the threshold — is a guaranteed
    SUPERSET of the true answer and at most ~2e6/phi_ppm tokens.
    Pass 2 re-scans the corpus counting ONLY the broadcast candidates
    (batch-distinct membership tests, pkey fold bounded by the
    candidate count) and applies the exact threshold, so the output
    is value-identical to the SQL it replaces — estimates never leak
    into the result.

    Driver state: the final summary (<= num_partitions * (k+1) rows)
    and the candidate set (<= ~2e6/phi_ppm tokens).  The corpus is
    scanned twice, both map-only — the classic 2-pass heavy-hitters
    trade.
    """
    import ray

    from apollo_ray.functions.textstats import _split_tokens
    from apollo_ray.hashing import hash_utf8, mix_to_partition

    if summary_k is None:
        summary_k = max(8, -(-2_000_000 // phi_ppm))
    k = int(summary_k)
    if (k + 1) * phi_ppm <= 1_000_000:
        raise ValueError(
            "summary_k=%d too small for phi_ppm=%d: the Misra-Gries "
            "superset guarantee needs (summary_k + 1) * phi_ppm > 1e6"
            % (k, phi_ppm))

    _EMPTY_SUM = pa.table({
        "token": pa.array([], type=pa.string()),
        "n": pa.array([], type=pa.int64()),
        "side": pa.array([], type=pa.int8()),
        "gkey": pa.array([], type=pa.int32())})
    _EMPTY_OUT = pa.table({"token": pa.array([], type=pa.string()),
                           "n": pa.array([], type=pa.int64())})

    def _truncate(tok: np.ndarray, cnt: np.ndarray
                  ) -> tuple[np.ndarray, np.ndarray]:
        """Misra-Gries truncation to k items: subtract the (k+1)-th
        largest count from everything, keep what stays positive."""
        if len(cnt) <= k:
            return tok, cnt
        pivot = np.partition(cnt, len(cnt) - k - 1)[len(cnt) - k - 1]
        keep = cnt > pivot
        return tok[keep], cnt[keep] - pivot

    def _summary_rows(tok: np.ndarray, cnt: np.ndarray, total: int,
                      gkey: int) -> pa.Table:
        m = len(tok)
        return pa.table({
            "token": pa.array(list(tok) + [""], type=pa.string()),
            "n": pa.array(np.append(cnt, total), type=pa.int64()),
            "side": pa.array(np.append(np.zeros(m, dtype=np.int8), 1),
                             type=pa.int8()),
            "gkey": pa.array(np.full(m + 1, gkey, dtype=np.int32),
                             type=pa.int32())})

    def summarize(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat = _split_tokens(text).flatten()
        if len(flat) == 0:
            return _EMPTY_SUM
        vc = flat.value_counts()
        tok = np.asarray(vc.field("values").to_pylist(), dtype=object)
        cnt = np.asarray(vc.field("counts"), dtype=np.int64)
        total = int(cnt.sum())
        tok, cnt = _truncate(tok, cnt)
        # deterministic content-derived merge group (truncation can
        # empty the summary when every count ties the pivot — the
        # total row still has to reach a merge group)
        seed = hash_utf8(str(tok[0])) ^ total if len(tok) else total
        gkey = int(mix_to_partition(
            np.array([seed], dtype=np.int64), num_partitions)[0])
        return _summary_rows(tok, cnt, total, gkey)

    def merge_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _EMPTY_SUM
        side = np.asarray(group.column("side"), dtype=np.int8)
        n = np.asarray(group.column("n"), dtype=np.int64)
        total = int(n[side == 1].sum())
        tmask = side == 0
        if not tmask.any():
            return _summary_rows(np.empty(0, dtype=object),
                                 np.empty(0, dtype=np.int64), total, 0)
        enc = group.column("token").combine_chunks() \
            .filter(pa.array(tmask)).dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # counts < 2^53: exact in the f64 bincount accumulator
        est = np.bincount(codes, weights=n[tmask].astype(np.float64),
                          minlength=len(enc.dictionary)).astype(np.int64)
        tok = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        tok, est = _truncate(tok, est)
        return _summary_rows(tok, est, total, 0)

    merged = docs.map_batches(summarize, batch_format="pyarrow") \
        .groupby("gkey").map_groups(merge_group, batch_format="pyarrow")
    # bounded collect: <= num_partitions * (k + 1) rows
    parts = [b for b in merged.iter_batches(batch_format="pyarrow")
             if b.num_rows]
    final = merge_group(pa.concat_tables(parts) if parts else _EMPTY_SUM)
    side = np.asarray(final.column("side"), dtype=np.int8)
    n_total = int(np.asarray(final.column("n"), dtype=np.int64)
                  [side == 1].sum())
    if n_total == 0:
        return ray.data.from_arrow(_EMPTY_OUT)
    est = np.asarray(final.column("n"), dtype=np.int64)[side == 0]
    toks = np.asarray(final.column("token").to_pylist(),
                      dtype=object)[side == 0]
    err = n_total // (k + 1)
    cand = {str(t) for t, e in zip(toks, est)
            if (int(e) + err) * 1_000_000 > phi_ppm * n_total}
    if not cand:
        return ray.data.from_arrow(_EMPTY_OUT)
    cand_ref = ray.put(cand)

    def exact_partial(batch: pa.Table) -> pa.Table:
        cs = ray.get(cand_ref)
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat = _split_tokens(text).flatten()
        if len(flat) == 0:
            return _EMPTY_OUT
        vc = flat.value_counts()
        tok = vc.field("values").to_pylist()
        cnt = np.asarray(vc.field("counts"), dtype=np.int64)
        keep = np.fromiter((t in cs for t in tok), dtype=bool,
                           count=len(tok))
        return pa.table({
            "token": pa.array([t for t, m in zip(tok, keep) if m],
                              type=pa.string()),
            "n": pa.array(cnt[keep], type=pa.int64())})

    def fold(group: pa.Table) -> pa.Table:
        n = int(np.asarray(group.column("n"), dtype=np.int64).sum())
        if n * 1_000_000 <= phi_ppm * n_total:
            return _EMPTY_OUT
        return pa.table({"token": group.column("token").slice(0, 1),
                         "n": pa.array([n], type=pa.int64())})

    return docs.map_batches(exact_partial, batch_format="pyarrow") \
        .groupby("token").map_groups(fold, batch_format="pyarrow")


def heavy_hitters_sql(phi_ppm: int = 5000, table: str = "documents"
                      ) -> str:
    """DuckDB oracle for :func:`heavy_hitters`: the exact group-by the
    two-pass Misra-Gries plan replaces, same whitespace tokenizer and
    integer-ppm threshold."""
    return rf"""
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS t
      FROM {table} WHERE length(trim(text)) > 0),
    tot AS (SELECT count(*) AS n FROM tok)
    SELECT t AS token, CAST(count(*) AS BIGINT) AS n
    FROM tok GROUP BY t
    HAVING count(*) * 1000000 > (SELECT n FROM tot) * {phi_ppm}
"""
