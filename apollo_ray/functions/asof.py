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
