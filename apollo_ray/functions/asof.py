"""Distributed AS-OF join — the canonical time-series operator Ray
Data lacks natively: attach to every event the latest right-side row
(here: an event of a given type) with ``ts <= event.ts`` for the same
key.

Ray-Data-first formulation: ONE pass tags each event as a left row
(always) and additionally emits a right copy for rows of the probe
type; rows hash-partition by ``user_id`` (pkey pattern), and each
partition resolves every left row with one vectorized sweep — sort by
(user, ts, right-before-left, event_id), then a running
``maximum.accumulate`` of right-row indices with per-user segment
validation.  No per-key loop, no per-row search: O(n log n) per
partition, one shuffle total.

Determinism: among right rows sharing (user, ts) the one with the
largest event_id wins (both here and in the DuckDB oracle, which
pre-dedupes with row_number before its native ASOF JOIN); a right-type
event matches itself (ts <= ts), matching SQL ``l.ts >= r.ts``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from apollo_ray.hashing import mix_to_partition


def asof_latest_event(events: "ray.data.Dataset",
                      right_type: str = "purchase",
                      num_partitions: int = 64) -> "ray.data.Dataset":
    """(event_id, user_id, ts_us, prior_ts_us, prior_event_id,
    prior_value) — for every event, the latest ``right_type`` event of
    the same user at or before it (-1 sentinels when none)."""

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        u = np.asarray(batch.column("user_id"), dtype=np.int64)
        t = np.asarray(batch.column("ts").cast(pa.int64()))
        eid = np.asarray(batch.column("event_id"), dtype=np.int64)
        val = np.asarray(batch.column("value"), dtype=np.float64)
        is_rt = np.asarray(pc.equal(batch.column("event_type"), right_type)
                           .combine_chunks(), dtype=bool)
        # left copy of every row + right copy of probe-type rows
        r = np.flatnonzero(is_rt)
        uu = np.concatenate([u, u[r]])
        return pa.table({
            "user_id": pa.array(uu, type=pa.int64()),
            "ts_us": pa.array(np.concatenate([t, t[r]]), type=pa.int64()),
            "event_id": pa.array(np.concatenate([eid, eid[r]]),
                                 type=pa.int64()),
            "value": pa.array(np.concatenate([val, val[r]]),
                              type=pa.float64()),
            "is_right": pa.array(
                np.concatenate([np.zeros(len(u), dtype=bool),
                                np.ones(len(r), dtype=bool)])),
            "pkey": pa.array(mix_to_partition(uu, num_partitions),
                             type=pa.int32()),
        })

    def match(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "event_id": pa.array([], type=pa.int64()),
            "user_id": pa.array([], type=pa.int64()),
            "ts_us": pa.array([], type=pa.int64()),
            "prior_ts_us": pa.array([], type=pa.int64()),
            "prior_event_id": pa.array([], type=pa.int64()),
            "prior_value": pa.array([], type=pa.float64()),
        })
        n = group.num_rows
        if n == 0:
            return empty
        u = np.asarray(group.column("user_id"), dtype=np.int64)
        t = np.asarray(group.column("ts_us"), dtype=np.int64)
        eid = np.asarray(group.column("event_id"), dtype=np.int64)
        val = np.asarray(group.column("value"), dtype=np.float64)
        is_r = np.asarray(group.column("is_right"), dtype=bool)
        # rights sort BEFORE lefts at equal (u, t) so ts<=ts matches;
        # among equal rights the largest event_id lands last and wins
        order = np.lexsort((eid, (~is_r).astype(np.int8), t, u))
        u_s, t_s = u[order], t[order]
        eid_s, val_s, isr_s = eid[order], val[order], is_r[order]
        idx = np.arange(n)
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = u_s[1:] != u_s[:-1]
        seg_start = np.maximum.accumulate(np.where(first, idx, 0))
        last_r = np.maximum.accumulate(np.where(isr_s, idx, -1))
        left = ~isr_s
        matched = last_r[left] >= seg_start[left]
        li = np.flatnonzero(left)
        ri = last_r[li]
        prior_t = np.where(matched, t_s[np.clip(ri, 0, n - 1)], -1)
        prior_e = np.where(matched, eid_s[np.clip(ri, 0, n - 1)], -1)
        prior_v = np.where(matched, val_s[np.clip(ri, 0, n - 1)], -1.0)
        return pa.table({
            "event_id": pa.array(eid_s[li], type=pa.int64()),
            "user_id": pa.array(u_s[li], type=pa.int64()),
            "ts_us": pa.array(t_s[li], type=pa.int64()),
            "prior_ts_us": pa.array(prior_t, type=pa.int64()),
            "prior_event_id": pa.array(prior_e, type=pa.int64()),
            "prior_value": pa.array(prior_v, type=pa.float64()),
        })

    return events.map_batches(prep, batch_format="pyarrow") \
        .groupby("pkey").map_groups(match, batch_format="pyarrow")


def range_window_stats(events: "ray.data.Dataset",
                       anchor_type: str = "purchase",
                       window_us: int = 600_000_000,
                       num_partitions: int = 64) -> "ray.data.Dataset":
    """Distributed RANGE JOIN: for every ``anchor_type`` event, count
    and max-aggregate the same user's OTHER events with
    ``ts in [anchor.ts - window, anchor.ts]``.

    Same one-shuffle tagged-sweep shape as :func:`asof_latest_event`,
    with the range resolved by a rank trick instead of per-row
    bisection: the window's two boundaries are injected as query rows
    into the (user, ts)-sorted stream (low boundary sorting BEFORE
    equal-ts events, high boundary AFTER), so one lexsort gives every
    anchor's [lo, hi) data-rank range — counts are rank differences,
    fully vectorized.  The max aggregate runs on a prefix-max over the
    sorted events (order-independent, so float-exact vs the SQL
    oracle, unlike a sum).

    Returns (event_id, user_id, ts_us, n_win_events, max_value) with
    max_value = -1.0 when the window holds no other event."""

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        u = np.asarray(batch.column("user_id"), dtype=np.int64)
        t = np.asarray(batch.column("ts").cast(pa.int64()))
        eid = np.asarray(batch.column("event_id"), dtype=np.int64)
        val = np.asarray(batch.column("value"), dtype=np.float64)
        is_a = np.asarray(pc.equal(batch.column("event_type"), anchor_type)
                          .combine_chunks(), dtype=bool)
        return pa.table({
            "user_id": pa.array(u, type=pa.int64()),
            "ts_us": pa.array(t, type=pa.int64()),
            "event_id": pa.array(eid, type=pa.int64()),
            "value": pa.array(val, type=pa.float64()),
            "is_anchor": pa.array(is_a),
            "pkey": pa.array(mix_to_partition(u, num_partitions),
                             type=pa.int32()),
        })

    def sweep(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "event_id": pa.array([], type=pa.int64()),
            "user_id": pa.array([], type=pa.int64()),
            "ts_us": pa.array([], type=pa.int64()),
            "n_win_events": pa.array([], type=pa.int64()),
            "max_value": pa.array([], type=pa.float64()),
        })
        n = group.num_rows
        if n == 0:
            return empty
        u = np.asarray(group.column("user_id"), dtype=np.int64)
        t = np.asarray(group.column("ts_us"), dtype=np.int64)
        eid = np.asarray(group.column("event_id"), dtype=np.int64)
        val = np.asarray(group.column("value"), dtype=np.float64)
        is_a = np.asarray(group.column("is_anchor"), dtype=bool)
        ai = np.flatnonzero(is_a)
        if len(ai) == 0:
            return empty
        # merged stream: data rows + per-anchor window boundaries.
        # tag order at equal (u, ts): lo-boundary(0) < data(1) <
        # hi-boundary(2)  =>  inclusive [ts-W, ts] window
        nq = len(ai)
        mu = np.concatenate([u, u[ai], u[ai]])
        mt = np.concatenate([t, t[ai] - window_us, t[ai]])
        tag = np.concatenate([np.ones(n, dtype=np.int8),
                              np.zeros(nq, dtype=np.int8),
                              np.full(nq, 2, dtype=np.int8)])
        # boundary id: which anchor a query row belongs to
        qid = np.concatenate([np.full(n, -1, dtype=np.int64),
                              np.arange(nq), np.arange(nq)])
        order = np.lexsort((tag, mt, mu))
        tag_s, qid_s = tag[order], qid[order]
        is_data = tag_s == 1
        # rank = number of data rows strictly before each position
        rank = np.cumsum(is_data) - is_data
        lo = np.empty(nq, dtype=np.int64)
        hi = np.empty(nq, dtype=np.int64)
        lo[qid_s[tag_s == 0]] = rank[tag_s == 0]
        hi[qid_s[tag_s == 2]] = rank[tag_s == 2]
        # user-boundary guard: clamp lo to the anchor's user segment
        # (the lo boundary could sort into the previous user)
        data_pos = np.flatnonzero(is_data)
        du = mu[order][data_pos]
        seg_lo = np.searchsorted(du, u[ai], side="left")
        lo = np.maximum(lo, seg_lo)
        counts = hi - lo - 1                      # exclude the anchor
        # exact max over the window EXCLUDING the anchor row: two
        # reduceat sub-ranges [lo, a_rank) and [a_rank+1, hi) over the
        # (user, ts, event_id)-sorted value array, -inf sentinel pad
        # so end == m stays a valid reduceat index
        didx = np.lexsort((eid, t, u))
        dval = val[didx]
        m = len(dval)
        rank_of = np.empty(m, dtype=np.int64)
        rank_of[didx] = np.arange(m)
        a_rank = rank_of[ai]
        dval_p = np.append(dval, -np.inf)

        def seg_max(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
            length = ends - starts
            st = np.minimum(starts, m)
            en = np.maximum(np.minimum(ends, m), st)
            idxs = np.empty(2 * len(st), dtype=np.int64)
            idxs[0::2] = st
            idxs[1::2] = np.maximum(en, st + (length > 0))
            red = np.maximum.reduceat(dval_p, idxs)[0::2]
            return np.where(length > 0, red, -np.inf)

        left_max = seg_max(lo, a_rank)
        right_max = seg_max(a_rank + 1, hi)
        max_val = np.maximum(left_max, right_max)
        out_max = np.where(np.isfinite(max_val), max_val, -1.0)
        return pa.table({
            "event_id": pa.array(eid[ai], type=pa.int64()),
            "user_id": pa.array(u[ai], type=pa.int64()),
            "ts_us": pa.array(t[ai], type=pa.int64()),
            "n_win_events": pa.array(counts, type=pa.int64()),
            "max_value": pa.array(out_max, type=pa.float64()),
        })

    return events.map_batches(prep, batch_format="pyarrow") \
        .groupby("pkey").map_groups(sweep, batch_format="pyarrow")


def sliding_window_stats(events: "ray.data.Dataset",
                         window_us: int = 3_600_000_000,
                         slide_us: int = 900_000_000,
                         num_partitions: int = 64) -> "ray.data.Dataset":
    """(event_type, win_us, n, sum_cents) — SLIDING-window aggregate
    (hop < width, so each event lands in window_us/slide_us
    overlapping windows; the tumbling case is
    :func:`textstats.events_hourly`).  Window starts are aligned to
    slide boundaries; ``window_us`` must be a multiple of
    ``slide_us``.

    Streaming shape: the per-event window fan-out (k = width/hop
    copies) is absorbed MAP-SIDE — each batch pre-aggregates to one
    partial row per (event_type, window) before the shuffle, so the
    exchange moves O(types x windows x batches) rows, not k x |events|.
    Values snap to exact integer cents (``rint(value*100)`` — the
    analytics money-unit rule), so sums are int64-exact and the
    DuckDB oracle matches bit-for-bit."""
    if window_us % slide_us:
        raise ValueError("window_us must be a multiple of slide_us")
    k = window_us // slide_us
    from apollo_ray.hashing import mix_to_partition, pair_mix

    empty = pa.table({"event_type": pa.array([], type=pa.string()),
                      "win_us": pa.array([], type=pa.int64()),
                      "n": pa.array([], type=pa.int64()),
                      "sum_cents": pa.array([], type=pa.int64()),
                      "pkey": pa.array([], type=pa.int32())})

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        ts = np.asarray(batch.column("ts").cast(pa.int64()))
        cents = np.rint(
            np.asarray(batch.column("value"), dtype=np.float64) * 100
        ).astype(np.int64)
        et = batch.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_dict = len(enc.dictionary)
        base = (ts // slide_us) * slide_us
        # fan out to k windows, then collapse to per-(type, win) partials
        win = (base[None, :] - (np.arange(k, dtype=np.int64)[:, None]
                                * slide_us)).ravel()
        code_k = np.tile(codes, k)
        cents_k = np.tile(cents, k)
        # composite key: window slot * n_dict + type code (windows are
        # slide-aligned so win // slide_us is a compact slot id)
        key = (win // slide_us) * n_dict + code_k
        uk, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        s = np.bincount(inv, weights=cents_k).astype(np.int64)
        u_win = (uk // n_dict) * slide_us
        u_code = uk % n_dict
        # pkey must hash the type STRING (batch-local dictionary codes
        # differ between batches and would split a group across pkeys)
        from apollo_ray.hashing import hash_utf8
        dict_hash = np.fromiter(
            (hash_utf8(t) for t in enc.dictionary.to_pylist()),
            dtype=np.int64, count=n_dict)
        pk = mix_to_partition(
            pair_mix(u_win, dict_hash[u_code]).astype(np.int64) >> 1,
            num_partitions)
        return pa.table({
            "event_type": enc.dictionary.take(pa.array(u_code)),
            "win_us": pa.array(u_win, type=pa.int64()),
            "n": pa.array(n, type=pa.int64()),
            "sum_cents": pa.array(s, type=pa.int64()),
            "pkey": pa.array(pk, type=pa.int32()),
        })

    def reduce_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty.drop_columns(["pkey"])
        et = group.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        win = np.asarray(group.column("win_us"), dtype=np.int64)
        n = np.asarray(group.column("n"), dtype=np.int64)
        s = np.asarray(group.column("sum_cents"), dtype=np.int64)
        key = (win // slide_us) * len(enc.dictionary) + codes
        uk, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "event_type": enc.dictionary.take(
                pa.array(uk % len(enc.dictionary))),
            "win_us": pa.array((uk // len(enc.dictionary)) * slide_us,
                               type=pa.int64()),
            "n": pa.array(np.bincount(inv, weights=n).astype(np.int64),
                          type=pa.int64()),
            "sum_cents": pa.array(np.bincount(inv, weights=s)
                                  .astype(np.int64), type=pa.int64()),
        })

    return events.map_batches(partial, batch_format="pyarrow") \
        .groupby("pkey").map_groups(reduce_part, batch_format="pyarrow")


def sliding_window_stats_sql(window_us: int = 3_600_000_000,
                             slide_us: int = 900_000_000) -> str:
    """DuckDB oracle for :func:`sliding_window_stats` (same
    slide-aligned fan-out via range(k), same integer cents)."""
    k = window_us // slide_us
    return f"""
    WITH e AS (
      SELECT event_type, CAST(epoch_us(ts) AS BIGINT) AS us,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    w AS (
      SELECT event_type,
             (us // {slide_us}) * {slide_us} - j * {slide_us} AS win_us,
             cents
      FROM e, range({k}) t(j))
    SELECT event_type, win_us, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM w GROUP BY event_type, win_us
"""


def funnel_counts(events: "ray.data.Dataset",
                  steps: tuple[str, ...] = ("signup", "view", "purchase"),
                  num_partitions: int = 32) -> "ray.data.Dataset":
    """(step_idx, step, n_users) — classic ordered-funnel analysis:
    how many users completed step 1, then step 2 STRICTLY AFTER their
    first step 1, then step 3 strictly after that, etc. (earliest-
    qualifying-event semantics at every step, strict ``>`` on ts).

    One hash shuffle on user_id (pkey pattern) co-locates each user's
    events; inside a partition each funnel step is one vectorized pass
    (boolean mask + first-qualifying-row-per-user via ``np.unique`` on
    the (ts-sorted) user column — no per-user loop).  Per-partition
    per-step user counts are complete partials (users never straddle
    partitions); the fold sees <= steps x partitions rows.
    """
    import pyarrow as pa

    from apollo_ray.hashing import mix_to_partition

    def add_pkey(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch.column("user_id"), dtype=np.int64)
        t = batch.select(["user_id", "ts", "event_type"])
        return t.append_column(
            "pkey", pa.array(mix_to_partition(u, num_partitions),
                             type=pa.int32()))

    def count_part(group: pa.Table) -> pa.Table:
        empty = pa.table({"step_idx": pa.array([], type=pa.int64()),
                          "n_users": pa.array([], type=pa.int64())})
        if group.num_rows == 0:
            return empty
        u = np.asarray(group.column("user_id"), dtype=np.int64)
        ts = np.asarray(group.column("ts").cast(pa.int64()),
                        dtype=np.int64)
        et = group.column("event_type").combine_chunks()
        order = np.lexsort((ts, u))
        u_s, ts_s = u[order], ts[order]
        et_codes = et.dictionary_encode()
        codes_s = et_codes.indices.to_numpy(
            zero_copy_only=False).astype(np.int64)[order]
        step_code = {s: i for i, s in
                     enumerate(et_codes.dictionary.to_pylist())}
        # compact per-partition user ids
        uniq_u, u_code = np.unique(u_s, return_inverse=True)
        n_u = len(uniq_u)
        # prev_t[user] = ts of the user's earliest qualifying event of
        # the previous step; -inf means "step 0 trivially reached"
        prev_t = np.full(n_u, np.iinfo(np.int64).min, dtype=np.int64)
        alive = np.ones(n_u, dtype=bool)
        out_idx, out_n = [], []
        for i, s in enumerate(steps):
            c = step_code.get(s, -1)
            qual = (codes_s == c) & alive[u_code] & (ts_s > prev_t[u_code])
            idx = np.flatnonzero(qual)
            # rows are ts-sorted within user: first qualifying row per
            # user is the earliest
            first_u, first_pos = np.unique(u_code[idx], return_index=True)
            alive = np.zeros(n_u, dtype=bool)
            alive[first_u] = True
            prev_t[first_u] = ts_s[idx[first_pos]]
            out_idx.append(i + 1)
            out_n.append(len(first_u))
        return pa.table({"step_idx": pa.array(out_idx, type=pa.int64()),
                         "n_users": pa.array(out_n, type=pa.int64())})

    def fold(group: pa.Table) -> pa.Table:
        si = int(group.column("step_idx")[0].as_py())
        n = int(np.asarray(group.column("n_users"),
                           dtype=np.int64).sum())
        return pa.table({"step_idx": pa.array([si], type=pa.int64()),
                         "step": pa.array([steps[si - 1]],
                                          type=pa.string()),
                         "n_users": pa.array([n], type=pa.int64())})

    parts = events.map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(count_part, batch_format="pyarrow")
    # bounded cardinality: one group per funnel step
    return parts.groupby("step_idx").map_groups(fold,
                                                batch_format="pyarrow")


def retention_cohorts(events: "ray.data.Dataset",
                      num_partitions: int = 32) -> "ray.data.Dataset":
    """(cohort_day, day_offset, n_users) — classic retention matrix:
    users grouped by the UTC day of their first event (cohort), and
    for each later day offset, how many of them were active (any
    event) that day.  Offset 0 is the cohort day itself, so
    n_users(cohort, 0) is the cohort size.

    One user-hash shuffle; per partition the first-event day per user
    and the distinct (user, day) activity pairs come from one lexsort
    (no per-user loop), and per-(cohort, offset) counts are complete
    partials because users never straddle partitions; the fold sees
    <= cohorts x offsets x partitions rows.
    """
    import pyarrow as pa

    from apollo_ray.hashing import mix_to_partition

    US_PER_DAY = 86_400_000_000

    def add_pkey(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch.column("user_id"), dtype=np.int64)
        ts = np.asarray(batch.column("ts").cast(pa.int64()),
                        dtype=np.int64)
        return pa.table({
            "user_id": pa.array(u, type=pa.int64()),
            "day": pa.array(ts // US_PER_DAY, type=pa.int64()),
            "pkey": pa.array(mix_to_partition(u, num_partitions),
                             type=pa.int32())})

    def count_part(group: pa.Table) -> pa.Table:
        empty = pa.table({"cohort_day": pa.array([], type=pa.int64()),
                          "day_offset": pa.array([], type=pa.int64()),
                          "n_users": pa.array([], type=pa.int64())})
        if group.num_rows == 0:
            return empty
        u = np.asarray(group.column("user_id"), dtype=np.int64)
        d = np.asarray(group.column("day"), dtype=np.int64)
        order = np.lexsort((d, u))
        u_s, d_s = u[order], d[order]
        # distinct (user, day) activity pairs
        first = np.empty(len(u_s), dtype=bool)
        first[0] = True
        first[1:] = (u_s[1:] != u_s[:-1]) | (d_s[1:] != d_s[:-1])
        u_a, d_a = u_s[first], d_s[first]
        # cohort day = each user's first (minimal) day; rows are
        # sorted, so the first row of each user segment carries it
        u_first = np.empty(len(u_a), dtype=bool)
        u_first[0] = True
        u_first[1:] = u_a[1:] != u_a[:-1]
        seg = np.cumsum(u_first) - 1
        cohort = d_a[np.flatnonzero(u_first)][seg]
        offset = d_a - cohort
        key = cohort * 1_000_000 + offset   # offsets < 1e6 days
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "cohort_day": pa.array(uniq // 1_000_000, type=pa.int64()),
            "day_offset": pa.array(uniq % 1_000_000, type=pa.int64()),
            "n_users": pa.array(cnt, type=pa.int64())})

    def fold(group: pa.Table) -> pa.Table:
        c = np.asarray(group.column("cohort_day"), dtype=np.int64)
        o = np.asarray(group.column("day_offset"), dtype=np.int64)
        n = np.asarray(group.column("n_users"), dtype=np.int64)
        key = c * 1_000_000 + o
        uniq, inv = np.unique(key, return_inverse=True)
        tot = np.bincount(inv, weights=n.astype(np.float64)) \
            .astype(np.int64)
        return pa.table({
            "cohort_day": pa.array(uniq // 1_000_000, type=pa.int64()),
            "day_offset": pa.array(uniq % 1_000_000, type=pa.int64()),
            "n_users": pa.array(tot, type=pa.int64())})

    parts = events.map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(count_part, batch_format="pyarrow")

    def add_fold_pkey(batch: pa.Table) -> pa.Table:
        c = np.asarray(batch.column("cohort_day"), dtype=np.int64)
        return batch.append_column(
            "pkey2", pa.array(mix_to_partition(c, 8), type=pa.int32()))

    return parts.map_batches(add_fold_pkey, batch_format="pyarrow") \
        .groupby("pkey2").map_groups(
            lambda g: fold(g.select(["cohort_day", "day_offset",
                                     "n_users"])),
            batch_format="pyarrow")


def user_cumulative_spend(events: "ray.data.Dataset",
                          event_type: str = "purchase",
                          num_partitions: int = 32
                          ) -> "ray.data.Dataset":
    """(event_id, user_id, cum_spend_c) — per-row ORDERED WINDOW scan:
    each ``event_type`` event's running total of the user's spend up
    to and including it (``sum(value) OVER (PARTITION BY user
    ORDER BY ts, event_id)``), in exact integer cents.

    One user-hash shuffle co-locates each user's events; the running
    sum is one lexsort + ``np.cumsum`` with per-user segment
    subtraction — per-ROW output (unlike the aggregate windows), no
    per-user loop.  Ties on ts break by event_id, matching the SQL
    ORDER BY exactly.
    """
    import pyarrow.compute as pc

    def prep(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch.column("event_type"), event_type)
        sub = batch.filter(m)
        u = np.asarray(sub.column("user_id"), dtype=np.int64)
        cents = np.rint(np.asarray(sub.column("value"),
                                   dtype=np.float64) * 100).astype(np.int64)
        return pa.table({
            "event_id": sub.column("event_id").cast(pa.int64()),
            "user_id": pa.array(u, type=pa.int64()),
            "ts_us": sub.column("ts").cast(pa.int64()),
            "cents": pa.array(cents, type=pa.int64()),
            "pkey": pa.array(mix_to_partition(u, num_partitions),
                             type=pa.int32())})

    def scan(group: pa.Table) -> pa.Table:
        empty = pa.table({"event_id": pa.array([], type=pa.int64()),
                          "user_id": pa.array([], type=pa.int64()),
                          "cum_spend_c": pa.array([], type=pa.int64())})
        if group.num_rows == 0:
            return empty
        u = np.asarray(group.column("user_id"), dtype=np.int64)
        t = np.asarray(group.column("ts_us"), dtype=np.int64)
        e = np.asarray(group.column("event_id"), dtype=np.int64)
        c = np.asarray(group.column("cents"), dtype=np.int64)
        order = np.lexsort((e, t, u))
        u_s, e_s, c_s = u[order], e[order], c[order]
        cum = np.cumsum(c_s)
        first = np.empty(len(u_s), dtype=bool)
        first[0] = True
        first[1:] = u_s[1:] != u_s[:-1]
        starts = np.flatnonzero(first)
        base = np.repeat(
            np.concatenate(([0], cum[starts[1:] - 1]))
            if len(starts) > 1 else np.zeros(1, dtype=np.int64),
            np.diff(np.append(starts, len(u_s))))
        return pa.table({
            "event_id": pa.array(e_s, type=pa.int64()),
            "user_id": pa.array(u_s, type=pa.int64()),
            "cum_spend_c": pa.array(cum - base, type=pa.int64())})

    return events.map_batches(prep, batch_format="pyarrow") \
        .groupby("pkey").map_groups(scan, batch_format="pyarrow")
