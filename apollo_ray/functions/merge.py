"""Multi-source corpus merging: priority dedup + normalized dedup.

Two exact-dedup variants a multi-source training-corpus merge needs
beyond plain min-id election (``dedup_extras.exact_dedup_groups``):

- :func:`priority_dedup` — when the same content arrives from several
  SOURCES (curated dump vs crawl vs mirror), keep the copy from the
  highest-priority source (then min doc_id), the standard
  "best-provenance wins" merge rule.
- :func:`normalized_exact_dedup` — exact dedup over CANONICALIZED text
  (the ccnet-style normalize-then-hash tier: NFC, line endings,
  control strip, whitespace collapse — ``clean.normalize_text_array``),
  catching byte-level variants of identical content that raw-hash
  dedup misses.

Both follow the house scale shape: per-batch maps emit fixed-width
metadata rows (content hash + small ints — the payload never moves),
one pkey exchange co-locates each content group, and a vectorized
lexsort/segment reduction elects winners per partition.  Both are
value-exact in DuckDB (md5 content keys / shared normalization regexes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from apollo_ray.hashing import mix_to_partition


def priority_dedup(docs: "ray.data.Dataset",
                   priority: tuple[str, ...] = (),
                   num_partitions: int = 64) -> "ray.data.Dataset":
    """(doc_id, source, n_members) — one winner per distinct raw text.

    Winner election per content group: lowest source rank first, then
    lowest doc_id.  ``priority`` lists source names best-first; sources
    not listed rank after every listed one, ordered among themselves by
    source string (so the rule is total and deterministic without
    requiring a complete list).  SQL twin: :func:`priority_dedup_sql`.

    Hash-key parity caveat (the repo-wide convention documented on
    ``hash_utf8``): content groups key on the 64-bit view of
    ``md5(text)`` while the SQL twin partitions by the raw text — a
    64-bit collision between two distinct texts would merge their
    groups and drop a document the oracle keeps (~1e-10 probability
    at 1M distinct texts; the production upgrade path is the 128-bit
    split-key described in ``hashing.hash_utf8``).
    """
    from apollo_ray.kernels.text import _md5_u64
    prio = {s: i for i, s in enumerate(priority)}
    n_listed = len(prio)

    def meta(batch: pa.Table) -> pa.Table:
        th = np.fromiter(
            (_md5_u64(t) for t in batch.column("text").to_pylist()),
            dtype=np.uint64, count=batch.num_rows).view(np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "source": batch.column("source"),
            "srank": pa.array(
                [prio.get(s, n_listed)
                 for s in batch.column("source").to_pylist()],
                type=pa.int32()),
            "text_hash": pa.array(th, type=pa.int64()),
            "pkey": pa.array(mix_to_partition(th, num_partitions),
                             type=pa.int32())})

    _EMPTY = pa.table({"doc_id": pa.array([], type=pa.int64()),
                       "source": pa.array([], type=pa.string()),
                       "n_members": pa.array([], type=pa.int64())})

    def elect(group: pa.Table) -> pa.Table:
        th = np.asarray(group.column("text_hash"), dtype=np.int64)
        if len(th) == 0:
            return _EMPTY
        d = np.asarray(group.column("doc_id"), dtype=np.int64)
        r = np.asarray(group.column("srank"), dtype=np.int64)
        src = group.column("source")
        # unlisted sources tie on rank; break by source STRING then
        # doc_id — factorize source lexicographically for the sort key
        import pandas as pd
        codes, uniq = pd.factorize(
            pd.Series(np.asarray(src.to_pandas(), dtype=object)),
            sort=True)
        order = np.lexsort((d, codes, r, th))
        th_s, d_s = th[order], d[order]
        first = np.empty(len(th_s), dtype=bool)
        first[0] = True
        first[1:] = th_s[1:] != th_s[:-1]
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, len(th_s)))
        sel = order[starts]
        return pa.table({
            "doc_id": pa.array(d_s[first], type=pa.int64()),
            "source": src.take(pa.array(sel)),
            "n_members": pa.array(counts, type=pa.int64())})

    return docs.map_batches(meta, batch_format="pyarrow") \
        .groupby("pkey").map_groups(elect, batch_format="pyarrow")


def priority_dedup_sql(priority: tuple[str, ...] = (),
                       table: str = "documents") -> str:
    """DuckDB oracle for :func:`priority_dedup` (same rank rule:
    listed sources by position, unlisted after them ordered by source
    string; same (rank, source, doc_id) tiebreak)."""
    if priority:
        cases = " ".join("WHEN '%s' THEN %d" % (s.replace("'", "''"), i)
                         for i, s in enumerate(priority))
        rank = "CASE source %s ELSE %d END" % (cases, len(priority))
    else:
        rank = "0"
    return f"""
        WITH ranked AS (
          SELECT doc_id, source,
                 count(*) OVER (PARTITION BY text) AS n_members,
                 row_number() OVER (
                   PARTITION BY text
                   ORDER BY {rank}, source, doc_id) AS rn
          FROM {table})
        SELECT doc_id, source, CAST(n_members AS BIGINT) AS n_members
        FROM ranked WHERE rn = 1
    """


def normalized_exact_dedup(docs: "ray.data.Dataset",
                           num_partitions: int = 64
                           ) -> "ray.data.Dataset":
    """(rep_id, n_members, n_raw_variants) — exact dedup over
    NORMALIZED text: groups by the md5 of
    ``clean.normalize_text_array`` output, keeps min doc_id, and
    reports how many distinct RAW byte-strings each normalized group
    merged (``n_raw_variants > 1`` rows are exactly the catches that
    raw-hash dedup misses)."""
    from apollo_ray.functions.clean import normalize_text_array
    from apollo_ray.kernels.text import _md5_u64

    def meta(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        norm = normalize_text_array(text)
        nh = np.fromiter((_md5_u64(t) for t in norm.to_pylist()),
                         dtype=np.uint64, count=batch.num_rows) \
            .view(np.int64)
        rh = np.fromiter((_md5_u64(t) for t in text.to_pylist()),
                         dtype=np.uint64, count=batch.num_rows) \
            .view(np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "norm_hash": pa.array(nh, type=pa.int64()),
            "raw_hash": pa.array(rh, type=pa.int64()),
            "pkey": pa.array(mix_to_partition(nh, num_partitions),
                             type=pa.int32())})

    _EMPTY = pa.table({"rep_id": pa.array([], type=pa.int64()),
                       "n_members": pa.array([], type=pa.int64()),
                       "n_raw_variants": pa.array([], type=pa.int64())})

    def reduce_part(group: pa.Table) -> pa.Table:
        nh = np.asarray(group.column("norm_hash"), dtype=np.int64)
        if len(nh) == 0:
            return _EMPTY
        d = np.asarray(group.column("doc_id"), dtype=np.int64)
        rh = np.asarray(group.column("raw_hash"), dtype=np.int64)
        order = np.lexsort((d, nh))
        nh_s, d_s = nh[order], d[order]
        first = np.empty(len(nh_s), dtype=bool)
        first[0] = True
        first[1:] = nh_s[1:] != nh_s[:-1]
        seg = np.cumsum(first) - 1
        counts = np.bincount(seg)
        # distinct raw hashes per segment: sort (norm, raw), count runs
        o2 = np.lexsort((rh, nh))
        r2 = rh[o2]
        nh2 = nh[o2]
        f2 = np.empty(len(nh2), dtype=bool)
        f2[0] = True
        f2[1:] = nh2[1:] != nh2[:-1]
        seg2 = np.cumsum(f2) - 1
        newraw = np.empty(len(r2), dtype=np.int64)
        newraw[0] = 1
        newraw[1:] = ((seg2[1:] != seg2[:-1])
                      | (r2[1:] != r2[:-1])).astype(np.int64)
        nraw = np.bincount(seg2, weights=newraw).astype(np.int64)
        return pa.table({
            "rep_id": pa.array(d_s[first], type=pa.int64()),
            "n_members": pa.array(counts, type=pa.int64()),
            "n_raw_variants": pa.array(nraw, type=pa.int64())})

    return docs.map_batches(meta, batch_format="pyarrow") \
        .groupby("pkey").map_groups(reduce_part, batch_format="pyarrow")


def normalized_exact_dedup_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`normalized_exact_dedup` — the
    normalization expression comes from
    :func:`clean.normalize_expr_sql` (single source of truth),
    grouped by the normalized string itself (equivalent to grouping
    by its md5)."""
    from apollo_ray.functions.clean import normalize_expr_sql
    norm = normalize_expr_sql("text")
    return f"""
        SELECT min(doc_id) AS rep_id,
               CAST(count(*) AS BIGINT) AS n_members,
               CAST(count(DISTINCT text) AS BIGINT) AS n_raw_variants
        FROM {table}
        GROUP BY {norm}
    """
