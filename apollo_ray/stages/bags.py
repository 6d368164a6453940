"""Bags stage: docs -> exact-dup collapse -> weighted shingle bags.

Two sub-stages:

1. **Exact collapse (D2)** — the reference keys documents by content
   sha1 so byte-identical files collapse upstream (``apollo/bags.py:15``,
   ``doc/cmd/query.md:14``).  Here: one ``groupby(text_hash)`` shuffle;
   each group keeps the min-``doc_id`` row as representative and emits
   (doc_id, rep_id) membership rows.  Members join their representative's
   cluster later via (member -> rep) edges fed into the CC stage — no
   join needed.  At webtext scale ~30% of pages are exact dups, so this
   multiplies the throughput of every downstream stage.

2. **Bag building (M3+M4)** — representative text -> token k-shingles ->
   64-bit feature hash into ``2**feature_dim_log2`` columns -> log-TF
   weights.  Stateful actor pool: the memoizing ``TokenHasher`` lives in
   ``__init__`` (once per actor), replacing the reference's global
   vocabulary + docfreq model (``apollo/hasher.py:116-117``) with
   feature hashing (no global state at 10^12-doc scale).

Output ``bags`` schema: ``doc_id:int64, indices:list<uint32>,
weights:list<float32>, n_members:int64`` (sparse vector as Arrow lists,
the columnar replacement for the per-(doc,feature) row explosion of the
Cassandra ``bags`` table, ``apollo/cassandra_utils.py:74-75``).
"""

from __future__ import annotations

import numpy as np

import pyarrow as pa

import ray.data

from apollo_ray.config import DedupConfig
from apollo_ray.hashing import TokenHasher
from apollo_ray.kernels.text import doc_to_bag


def exact_membership(docs: "ray.data.Dataset",
                     num_partitions: int = 64) -> "ray.data.Dataset":
    """(rep_id, member_id) rows for every NON-representative doc — the
    metadata-only half of the exact collapse.  Only 16 bytes/row move
    through the shuffle (vs the full text payload), which was the
    single largest stage at the 500k-row stress scale."""
    from apollo_ray.hashing import mix_to_partition

    def ids_only(batch: pa.Table) -> pa.Table:
        th = np.asarray(batch.column("text_hash"), dtype=np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "text_hash": pa.array(th, type=pa.int64()),
            "pkey": pa.array(mix_to_partition(th, num_partitions),
                             type=pa.int32()),
        })

    def members_part(group: pa.Table) -> pa.Table:
        th = np.asarray(group.column("text_hash"), dtype=np.int64)
        ids = np.asarray(group.column("doc_id"), dtype=np.int64)
        if len(th) == 0:
            return pa.table({"rep_id": pa.array([], type=pa.int64()),
                             "member_id": pa.array([], type=pa.int64())})
        order = np.lexsort((ids, th))
        th_s, ids_s = th[order], ids[order]
        first = np.empty(len(th_s), dtype=bool)
        first[0] = True
        first[1:] = th_s[1:] != th_s[:-1]
        seg_id = np.cumsum(first) - 1
        reps = ids_s[first]                      # min doc_id per text
        return pa.table({
            "rep_id": pa.array(reps[seg_id[~first]], type=pa.int64()),
            "member_id": pa.array(ids_s[~first], type=pa.int64()),
        })

    return docs.map_batches(ids_only, batch_format="pyarrow") \
        .groupby("pkey").map_groups(members_part, batch_format="pyarrow")


# Below this many metadata rows the representative election runs on the
# driver (16 B/row -> ~800 MB at the cap) instead of paying a shuffle
# whose data volume is trivial but whose fixed task/exchange cost is
# not (measured ~1.6 s at 8 CPUs for a 40 MB exchange).  Above it, the
# distributed ``exact_membership`` groupby is the path.
DRIVER_MEMBERSHIP_MAX_ROWS = 50_000_000


def exact_membership_arrays(th: np.ndarray, ids: np.ndarray) -> pa.Table:
    """The membership election core over driver-resident arrays: one
    lexsort + segment cut -> (rep_id, member_id) table."""
    if len(th) == 0:
        return pa.table({"rep_id": pa.array([], type=pa.int64()),
                         "member_id": pa.array([], type=pa.int64())})
    order = np.lexsort((ids, th))
    th_s, ids_s = th[order], ids[order]
    first = np.empty(len(th_s), dtype=bool)
    first[0] = True
    first[1:] = th_s[1:] != th_s[:-1]
    seg_id = np.cumsum(first) - 1
    reps = ids_s[first]
    return pa.table({
        "rep_id": pa.array(reps[seg_id[~first]], type=pa.int64()),
        "member_id": pa.array(ids_s[~first], type=pa.int64())})


def exact_membership_arrays_parallel(th: np.ndarray, ids: np.ndarray,
                                     n_shards: int = 8,
                                     min_rows: int = 1_000_000) -> pa.Table:
    """:func:`exact_membership_arrays` sharded by high text-hash bits
    and elected in a thread pool — numpy's sorts release the GIL, so
    the driver-serial lexsort (the dominant election term at weak-
    scaling sizes: 1.33 s -> 0.31 s at 4M rows) parallelizes ~4x.
    Groups never span shards (the shard is a pure function of the
    hash), so the (rep_id, member_id) PAIR SET is identical to the
    single global lexsort; only row order differs (shard-major)."""
    if len(th) < min_rows:
        return exact_membership_arrays(th, ids)
    from concurrent.futures import ThreadPoolExecutor
    sh = ((th.astype(np.uint64) >> np.uint64(60))
          % np.uint64(n_shards)).astype(np.int64)

    def one(s: int) -> pa.Table:
        sel = np.flatnonzero(sh == s)
        return exact_membership_arrays(th[sel], ids[sel])

    with ThreadPoolExecutor(n_shards) as ex:
        parts = list(ex.map(one, range(n_shards)))
    return pa.concat_tables(parts)


def exact_membership_driver(meta: "ray.data.Dataset") -> "ray.data.Dataset":
    """Driver-side (rep_id, member_id) election over a MATERIALIZED
    metadata table of (doc_id, text_hash) — one lexsort + segment cut,
    no exchange.  Caller gates on ``DRIVER_MEMBERSHIP_MAX_ROWS``."""
    import ray.data as rd

    # an empty Dataset's to_pandas() drops columns (NOTES_r3) — return
    # the typed empty table without touching pandas
    if meta.count() == 0:
        return rd.from_arrow(exact_membership_arrays(
            np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)))
    df = meta.to_pandas()
    return rd.from_arrow(exact_membership_arrays(
        df["text_hash"].to_numpy(dtype=np.int64),
        df["doc_id"].to_numpy(dtype=np.int64)))


# Above this many duplicate docs the dup-id broadcast no longer fits a
# worker heap (8 B/id -> ~1.6 GB at the cap) and the collapse falls
# back to the full-payload shuffle; on a real cluster the next step up
# is a partitioned semi-join, not a bigger broadcast (doc/SCALE.md).
BROADCAST_COLLAPSE_MAX_DUPS = 200_000_000


def collapse_exact(docs: "ray.data.Dataset",
                   num_partitions: int = 64,
                   method: str = "auto",
                   with_membership: bool = False):
    """One row per distinct text: representative (min doc_id) rows
    carrying ``text`` plus ``member_ids:list<int64>`` (the other
    doc_ids, usually empty).

    Default path (``method="auto"`` / ``"broadcast"``): shuffle ONLY
    ``(text_hash, doc_id)`` (16 B/row) to elect representatives, then
    broadcast the duplicate-id set once (``ray.put`` of a sorted int64
    array + rep->members map) and drop non-reps with a vectorized
    ``np.isin`` inside a streaming ``map_batches`` — the text payload
    NEVER moves; bag building reads rep texts from the original
    blocks.  Falls back to the one-full-payload-shuffle path
    (``method="shuffle"``) above ``BROADCAST_COLLAPSE_MAX_DUPS``
    duplicates.

    ``with_membership=True`` returns ``(reps, membership)`` where
    membership is the materialized (rep_id, member_id) table (None on
    the shuffle fallback) — callers needing member->rep edges can use
    it directly instead of re-exploding ``member_ids``.
    """
    if method not in ("auto", "broadcast", "shuffle"):
        raise ValueError("unknown collapse method %r" % method)
    if method != "shuffle":
        membership = exact_membership(docs, num_partitions).materialize()
        reps = rep_filter_from_membership(docs, membership)
        if reps is not None:
            return (reps, membership) if with_membership else reps

    reps = _collapse_exact_shuffle(docs, num_partitions)
    return (reps, None) if with_membership else reps


def rep_filter_from_membership(docs: "ray.data.Dataset",
                               membership: "ray.data.Dataset",
                               force: bool = False
                               ) -> "ray.data.Dataset | None":
    """The broadcast half of the collapse: given the materialized
    (rep_id, member_id) table, drop non-representative rows from
    ``docs`` with one streaming ``map_batches`` (sorted dup-id array +
    ``np.searchsorted``; the text payload never moves).  ``docs`` may
    be fully lazy — the filter fuses into whatever consumes the reps.
    Returns None above ``BROADCAST_COLLAPSE_MAX_DUPS`` unless ``force``
    (callers fall back to the full-payload shuffle)."""
    n_dups = membership.count()
    if force or n_dups <= BROADCAST_COLLAPSE_MAX_DUPS:
            import ray
            if n_dups:
                mdf = membership.to_pandas()
                rep_arr = mdf["rep_id"].to_numpy(dtype=np.int64)
                mem_arr = mdf["member_id"].to_numpy(dtype=np.int64)
                member_sorted = np.sort(mem_arr)
                # grouped (rep -> members) as three arrays: sorted rep
                # keys + CSR offsets into the member values — built and
                # looked up fully vectorized, no Python dict
                order = np.argsort(rep_arr, kind="stable")
                rep_s = rep_arr[order]
                mem_grouped = mem_arr[order]
                first = np.empty(len(rep_s), dtype=bool)
                if len(rep_s):
                    first[0] = True
                    first[1:] = rep_s[1:] != rep_s[:-1]
                rep_keys = rep_s[first]
                grp_off = np.append(np.flatnonzero(first), len(rep_s)) \
                    .astype(np.int64)
            else:
                member_sorted = np.empty(0, dtype=np.int64)
                rep_keys = np.empty(0, dtype=np.int64)
                mem_grouped = np.empty(0, dtype=np.int64)
                grp_off = np.zeros(1, dtype=np.int64)
            ref = ray.put((member_sorted, rep_keys, grp_off, mem_grouped))

            def keep_reps(batch: pa.Table) -> pa.Table:
                import ray as _ray
                dup_sorted, r_keys, g_off, g_mem = _ray.get(ref)
                ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
                if len(dup_sorted):
                    pos = np.searchsorted(dup_sorted, ids)
                    is_dup = (pos < len(dup_sorted)) & \
                        (dup_sorted[np.minimum(pos, len(dup_sorted) - 1)]
                         == ids)
                else:
                    is_dup = np.zeros(len(ids), dtype=bool)
                sub = batch.filter(pa.array(~is_dup))
                kept = np.asarray(sub.column("doc_id"), dtype=np.int64)
                counts = np.zeros(len(kept), dtype=np.int64)
                starts = np.zeros(len(kept), dtype=np.int64)
                if len(r_keys) and len(kept):
                    p = np.searchsorted(r_keys, kept)
                    hit = (p < len(r_keys)) & \
                        (r_keys[np.minimum(p, len(r_keys) - 1)] == kept)
                    counts[hit] = (g_off[p[hit] + 1] - g_off[p[hit]])
                    starts[hit] = g_off[p[hit]]
                total = int(counts.sum())
                if total:
                    cum0 = np.zeros(len(counts), dtype=np.int64)
                    np.cumsum(counts[:-1], out=cum0[1:])
                    gather = (np.repeat(starts, counts)
                              + np.arange(total, dtype=np.int64)
                              - np.repeat(cum0, counts))
                    flat_members = g_mem[gather]
                else:
                    flat_members = np.empty(0, dtype=np.int64)
                offs = np.zeros(len(counts) + 1, dtype=np.int64)
                np.cumsum(counts, out=offs[1:])
                member_col = pa.ListArray.from_arrays(
                    pa.array(offs, type=pa.int32()),
                    pa.array(flat_members, type=pa.int64()))
                return pa.table({
                    "doc_id": sub.column("doc_id").cast(pa.int64()),
                    "text": sub.column("text"),
                    "lang": sub.column("lang"),
                    "member_ids": member_col,
                })

            return docs.map_batches(keep_reps, batch_format="pyarrow")
    return None


def _collapse_exact_shuffle(docs: "ray.data.Dataset",
                            num_partitions: int = 64) -> "ray.data.Dataset":
    """Full-payload-shuffle collapse (the scale fallback): partitioned
    by ``hash(text_hash) % P`` (all rows of a text land in one
    partition) with a fully vectorized per-partition body — lexsort +
    segment-cut + ``ListArray.from_arrays`` — so there is no
    per-distinct-text Python call (at webtext scale that would be
    billions of them).
    """
    from apollo_ray.hashing import mix_to_partition

    def add_pkey(batch: pa.Table) -> pa.Table:
        th = np.asarray(batch.column("text_hash"), dtype=np.int64)
        pkey = mix_to_partition(th, num_partitions)
        return batch.append_column("pkey", pa.array(pkey, type=pa.int32()))

    def reduce_partition(group: pa.Table) -> pa.Table:
        th = np.asarray(group.column("text_hash"), dtype=np.int64)
        ids = np.asarray(group.column("doc_id"), dtype=np.int64)
        order = np.lexsort((ids, th))
        th_s, ids_s = th[order], ids[order]
        new_seg = np.empty(len(th_s), dtype=bool)
        if len(th_s) == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "text": pa.array([], type=pa.string()),
                             "lang": pa.array([], type=pa.string()),
                             "member_ids": pa.array([], type=pa.list_(pa.int64()))})
        new_seg[0] = True
        new_seg[1:] = th_s[1:] != th_s[:-1]
        first_pos = np.flatnonzero(new_seg)
        rep_rows = group.take(pa.array(order[first_pos]))
        members = ids_s[~new_seg]
        seg_sizes = np.diff(np.append(first_pos, len(th_s))) - 1
        offsets = np.zeros(len(first_pos) + 1, dtype=np.int64)
        np.cumsum(seg_sizes, out=offsets[1:])
        member_arr = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int64()),
            pa.array(members, type=pa.int64()))
        return pa.table({
            "doc_id": rep_rows.column("doc_id").cast(pa.int64()),
            "text": rep_rows.column("text"),
            "lang": rep_rows.column("lang"),
            "member_ids": member_arr,
        })

    keyed = docs.map_batches(add_pkey, batch_format="pyarrow")
    return keyed.groupby("pkey").map_groups(reduce_partition,
                                            batch_format="pyarrow")


def exact_member_edges(reps: "ray.data.Dataset") -> "ray.data.Dataset":
    """(member -> rep) edges from the collapse, for the CC stage."""
    def explode(batch: pa.Table) -> pa.Table:
        col = batch.column("member_ids")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        import pyarrow.compute as pc
        lengths = np.asarray(pc.list_value_length(col), dtype=np.int64)
        members = np.asarray(col.flatten(), dtype=np.int64)
        reps_ids = np.repeat(np.asarray(batch.column("doc_id"),
                                        dtype=np.int64), lengths)
        return pa.table({"u": pa.array(members, type=pa.int64()),
                         "v": pa.array(reps_ids, type=pa.int64())})

    return reps.map_batches(explode, batch_format="pyarrow")


def compute_feature_docfreq(reps: "ray.data.Dataset", cfg: DedupConfig
                            ) -> tuple[np.ndarray, int]:
    """Global document frequency over the hashed feature space (A1 —
    the ``OrderedDocumentFrequencies`` pass, ``apollo/bags.py:48-49``).

    Because features are hashed into a fixed dimension D, the docfreq
    "model" is a dense int64 array of size D: each batch emits a
    partial histogram (features counted once per doc), the driver sums
    the ~0.5 MB partials — a tree-reduce at real cluster scale, never a
    per-feature shuffle.  Returns (df array, n_docs).
    """
    dim = cfg.feature_dim

    def hist(batch: pa.Table) -> pa.Table:
        hasher = TokenHasher(seed=cfg.seed)
        h = np.zeros(dim, dtype=np.int64)
        n = 0
        for t in batch.column("text").to_pylist():
            idx, _ = doc_to_bag(t, hasher, cfg.shingle_k,
                                cfg.feature_dim_log2, **cfg.bag_kwargs)
            if len(idx):
                h[idx] += 1
            n += 1
        return pa.table({"df": pa.array([h], type=pa.list_(pa.int64())),
                         "n": pa.array([n], type=pa.int64())})

    total = np.zeros(dim, dtype=np.int64)
    ndocs = 0
    for b in reps.map_batches(hist, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for row, n in zip(b.column("df").to_pylist(), b.column("n").to_pylist()):
            total += np.asarray(row, dtype=np.int64)
            ndocs += int(n)
    return total, ndocs


from apollo_ray.kernels.text import effective_min_df  # noqa: F401


class BagBuilder:
    """Actor-pool callable: text -> sparse weighted bag.

    State (compiled hasher + memo + broadcast docfreq array) built once
    per actor; per-batch work is C-speed splits + numpy shingle mixing.
    """

    def __init__(self, cfg: DedupConfig, df_ref=None, ndocs: int = 0):
        self.cfg = cfg
        self.hasher = TokenHasher(seed=cfg.seed)
        self.ndocs = ndocs
        if df_ref is not None:
            import ray
            self.df = ray.get(df_ref)
            self.min_df = effective_min_df(self.df, cfg)
        else:
            self.df = None
            self.min_df = cfg.min_docfreq

    def __call__(self, batch: pa.Table) -> pa.Table:
        from apollo_ray.kernels.text import (bag_from_token_hashes,
                                             batch_bags_from_token_hashes,
                                             batch_token_hashes, tokenize)
        cfg = self.cfg
        bag_kwargs = dict(cfg.bag_kwargs)
        tokenizer = bag_kwargs.pop("tokenizer")
        if (tokenizer in ("whitespace", "bpe_ish")
            and not bag_kwargs.get("extra_ks")):
            # single-family fast path: whole-batch vectorized bags
            # (elementwise identical to the per-doc loop; empty docs
            # keep their empty-list rows, dropped later by WmhHasher)
            th_flat, offs = batch_token_hashes(batch.column("text"),
                                               self.hasher,
                                               tokenizer=tokenizer)
            fw = bag_kwargs.get("family_weights")
            counts, all_idx, all_w = batch_bags_from_token_hashes(
                th_flat, offs, cfg.shingle_k, cfg.feature_dim_log2,
                weighting=bag_kwargs.get("weighting", "logtf"),
                fam_w=(fw[0] if fw else 1.0),
                df=self.df, ndocs=self.ndocs, min_df=self.min_df)
            offsets = np.zeros(len(counts) + 1, dtype=np.int32)
            np.cumsum(counts, out=offsets[1:])
            idx_col = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                pa.array(all_idx, type=pa.uint32()))
            w_col = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                pa.array(all_w, type=pa.float32()))
        else:
            if tokenizer in ("whitespace", "bpe_ish"):
                th_flat, offs = batch_token_hashes(batch.column("text"),
                                                   self.hasher,
                                                   tokenizer=tokenizer)
                th_of = [th_flat[offs[i]:offs[i + 1]]
                         for i in range(batch.num_rows)]
            else:
                th_of = [self.hasher.hash_tokens(tokenize(t, tokenizer))
                         for t in batch.column("text").to_pylist()]
            indices: list[np.ndarray] = []
            weights: list[np.ndarray] = []
            for i in range(batch.num_rows):
                idx, w = bag_from_token_hashes(
                    th_of[i], cfg.shingle_k, cfg.feature_dim_log2,
                    df=self.df, ndocs=self.ndocs, min_df=self.min_df,
                    **bag_kwargs)
                indices.append(idx)
                weights.append(w)
            idx_col = pa.array(indices, type=pa.list_(pa.uint32()))
            w_col = pa.array(weights, type=pa.list_(pa.float32()))
        n_members = (
            pa.array([len(m) + 1 for m in batch.column("member_ids").to_pylist()],
                     type=pa.int64())
            if "member_ids" in batch.column_names
            else pa.array([1] * batch.num_rows, type=pa.int64()))
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "indices": idx_col,
            "weights": w_col,
            "n_members": n_members,
        })


def build_bags(reps: "ray.data.Dataset", cfg: DedupConfig,
               df: np.ndarray | None = None, ndocs: int = 0
               ) -> "ray.data.Dataset":
    if cfg.needs_docfreq and df is None:
        df, ndocs = compute_feature_docfreq(reps, cfg)
    df_ref = None
    if df is not None:
        import ray
        df_ref = ray.put(df)
    # fractional CPUs: three chained actor pools must never pin every
    # core, or downstream shuffle tasks starve (observed deadlock at 4
    # CPUs); 0.5 leaves task slots free at any pool scale
    return reps.map_batches(
        BagBuilder, fn_constructor_args=(cfg, df_ref, ndocs),
        batch_format="pyarrow",
        batch_size=cfg.batch_size, concurrency=(1, cfg.wmh_concurrency),
        num_cpus=0.5)
