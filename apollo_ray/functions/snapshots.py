"""Cross-snapshot corpus diffing — the crawl-refresh bookkeeping step.

A recrawled corpus arrives as a new snapshot of keyed pages; before
reprocessing everything, a pipeline diffs it against the previous
snapshot to route work: ``added`` pages enter the full pipeline,
``changed`` pages invalidate their old signatures (the incremental
path `pipelines/dedup.py:run_dedup_incremental` consumes exactly
this), ``removed`` pages retire, ``unchanged`` pages are skipped
entirely — at recrawl rates of a few percent, the diff saves the
other ~95% of the work.  (The reference's ``--dzhigurda`` history
depth, /root/reference/apollo/cassandra_utils.py:94-115, is the
within-snapshot version-election analog; the diff is the
cross-snapshot step upstream of it.)

Semantics: per side, the LIVE version of a key is the row with the
highest id (latest-version-wins, matching the history-depth rule);
a key present only in ``new`` is ``added``, only in ``old`` is
``removed``, in both with equal text is ``unchanged``, else
``changed``.

Scale shape: each side contributes only (key, id, text-hash) 24-byte
metadata rows to ONE pkey exchange on hash(key) — document payloads
never move; the per-partition compare is vectorized (lexsort +
boundary masks).  Content equality is judged by the 63-bit text hash
(the engine-wide exact-dedup precedent: equal text <=> equal hash up
to astronomically unlikely collisions; the SQL oracle compares the
text itself, so a collision would surface as an oracle mismatch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from apollo_ray.hashing import hash_utf8, mix_to_partition


def snapshot_diff(old: "ray.data.Dataset", new: "ray.data.Dataset",
                  key_col: str = "page_key", id_col: str = "doc_id",
                  text_col: str = "text", num_partitions: int = 64
                  ) -> "ray.data.Dataset":
    """(page_key, status, old_id, new_id) — diff two keyed snapshots;
    ``status`` in added | removed | changed | unchanged; the absent
    side's id is NULL."""

    def meta(side: int):
        def f(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({
                    "k": pa.array([], type=pa.int64()),
                    "i": pa.array([], type=pa.int64()),
                    "th": pa.array([], type=pa.int64()),
                    "side": pa.array([], type=pa.int8()),
                    "pkey": pa.array([], type=pa.int32())})
            k = batch.column(key_col).cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            i = batch.column(id_col).cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            from apollo_ray.hashing import hash_utf8_batch
            th = hash_utf8_batch(batch.column(text_col))
            return pa.table({
                "k": pa.array(k, type=pa.int64()),
                "i": pa.array(i, type=pa.int64()),
                "th": pa.array(th, type=pa.int64()),
                "side": pa.array(np.full(len(k), side, dtype=np.int8)),
                "pkey": pa.array(mix_to_partition(k, num_partitions),
                                 type=pa.int32())})
        return f

    both = old.map_batches(meta(0), batch_format="pyarrow").union(
        new.map_batches(meta(1), batch_format="pyarrow"))

    def diff_part(group: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], type=pa.int64()),
                          "status": pa.array([], type=pa.string()),
                          "old_id": pa.array([], type=pa.int64()),
                          "new_id": pa.array([], type=pa.int64())})
        if group.num_rows == 0:
            return empty
        k = np.asarray(group.column("k"), dtype=np.int64)
        i = np.asarray(group.column("i"), dtype=np.int64)
        th = np.asarray(group.column("th"), dtype=np.int64)
        side = np.asarray(group.column("side"), dtype=np.int64)
        # latest id wins per (key, side): sort so the live row is the
        # LAST of its (key, side) run
        order = np.lexsort((i, side, k))
        k, i, th, side = k[order], i[order], th[order], side[order]
        last = np.empty(len(k), dtype=bool)
        last[-1] = True
        last[:-1] = (k[1:] != k[:-1]) | (side[1:] != side[:-1])
        k, i, th, side = k[last], i[last], th[last], side[last]
        # now <= 2 rows per key (old first, then new)
        two = np.empty(len(k), dtype=bool)     # row has a successor twin
        two[:-1] = k[1:] == k[:-1]
        two[-1] = False
        first = np.ones(len(k), dtype=bool)
        first[1:] = k[1:] != k[:-1]
        out_k, out_s, out_o, out_n = [], [], [], []
        pair = first & two                      # key on both sides
        if pair.any():
            a = np.flatnonzero(pair)
            same = th[a] == th[a + 1]
            out_k.append(k[a])
            out_s.append(np.where(same, "unchanged", "changed"))
            out_o.append(i[a])
            out_n.append(i[a + 1])
        solo = first & ~two                     # single-side key
        if solo.any():
            a = np.flatnonzero(solo)
            is_new = side[a] == 1
            out_k.append(k[a])
            out_s.append(np.where(is_new, "added", "removed"))
            out_o.append(np.where(is_new, -1, i[a]))
            out_n.append(np.where(is_new, i[a], -1))
        if not out_k:
            return empty
        ko = np.concatenate(out_k)
        so = np.concatenate(out_s)
        oo = np.concatenate(out_o).astype(object)
        no = np.concatenate(out_n).astype(object)
        oo[oo == -1] = None
        no[no == -1] = None
        return pa.table({key_col: pa.array(ko, type=pa.int64()),
                         "status": pa.array(so.tolist(), type=pa.string()),
                         "old_id": pa.array(oo.tolist(), type=pa.int64()),
                         "new_id": pa.array(no.tolist(), type=pa.int64())})

    return both.groupby("pkey").map_groups(diff_part,
                                           batch_format="pyarrow")


def snapshot_diff_sql(old_where: str, new_where: str,
                      key_expr: str, table: str = "documents") -> str:
    """DuckDB oracle for :func:`snapshot_diff` over one table split
    into two snapshots by WHERE clauses, keyed by ``key_expr``
    (latest-id-wins via arg_max; the engine compares text hashes,
    the oracle the text itself)."""
    return f"""
        WITH a AS (
          SELECT {key_expr} AS page_key,
                 arg_max(text, doc_id) AS text,
                 max(doc_id) AS old_id
          FROM {table} WHERE {old_where} GROUP BY 1),
        b AS (
          SELECT {key_expr} AS page_key,
                 arg_max(text, doc_id) AS text,
                 max(doc_id) AS new_id
          FROM {table} WHERE {new_where} GROUP BY 1)
        SELECT coalesce(a.page_key, b.page_key) AS page_key,
               CASE WHEN a.page_key IS NULL THEN 'added'
                    WHEN b.page_key IS NULL THEN 'removed'
                    WHEN a.text = b.text THEN 'unchanged'
                    ELSE 'changed' END AS status,
               a.old_id, b.new_id
        FROM a FULL OUTER JOIN b ON a.page_key = b.page_key
    """
