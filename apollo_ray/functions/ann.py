"""Similarity search over an embedding column (``list<float>``).

- ``cosine_close_pairs`` / ``cosine_topk``: brute-force cosine against
  a broadcast query matrix — one ``ray.put`` of the (small) query side,
  one numpy matmul per batch; the exact baseline.
- ``lsh_ann_topk``: random-hyperplane LSH bucketing — the scale path:
  sign-pattern buckets shrink the candidate set, then exact re-scoring
  inside buckets.  Recall vs brute force is tested, not assumed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _batch_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    dim = len(arr[0])
    return np.asarray(arr.flatten(), dtype=np.float64).reshape(-1, dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def cosine_close_pairs(embeddings: "ray.data.Dataset",
                       query_ids: list[int], threshold: float,
                       id_col: str = "vec_id") -> "ray.data.Dataset":
    """(query_id, vec_id, cos_r3) for all vectors with
    round(cosine, 3) >= threshold against each query vector.

    The query side is collected once (it is tiny), broadcast via
    ``ray.put``, and every batch does one (B x d) @ (d x Q) matmul —
    no shuffle at all; the corpus streams.
    """
    qset = set(int(q) for q in query_ids)

    def pick(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        mask = np.isin(ids, np.fromiter(qset, dtype=np.int64))
        return batch.filter(pa.array(mask))

    q_tab = pa.concat_tables(
        ray.get(r) for r in embeddings.map_batches(
            pick, batch_format="pyarrow").to_arrow_refs())
    q_ids = np.asarray(q_tab.column(id_col), dtype=np.int64)
    q_mat = _normalize(_batch_matrix(q_tab))
    ref = ray.put((q_ids, q_mat))

    def score(batch: pa.Table) -> pa.Table:
        qi, qm = ray.get(ref)
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        m = _normalize(_batch_matrix(batch))
        cos = m @ qm.T                        # (B, Q)
        cos_r = np.round(cos, 3)
        vi, qj = np.nonzero(cos_r >= threshold)
        keep = ids[vi] != qi[qj]              # self-exclusion (J4 analog)
        return pa.table({
            "query_id": pa.array(qi[qj][keep], type=pa.int64()),
            "vec_id": pa.array(ids[vi][keep], type=pa.int64()),
            "cos_r3": pa.array(cos_r[vi, qj][keep], type=pa.float64()),
        })

    return embeddings.map_batches(score, batch_format="pyarrow")


def cosine_topk(embeddings: "ray.data.Dataset", query_ids: list[int],
                k: int = 10, id_col: str = "vec_id") -> "ray.data.Dataset":
    """Top-k by cosine per query — per-batch PARTIAL top-k: each batch
    emits at most Q*k rows (argpartition per query inside map_batches),
    so the global merge sees only Q*k*num_blocks rows instead of the
    full Q*N score matrix.  Final order/tie-break: (-cos_r3, vec_id).
    """
    qset = set(int(q) for q in query_ids)

    def pick(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        mask = np.isin(ids, np.fromiter(qset, dtype=np.int64))
        return batch.filter(pa.array(mask))

    q_tab = pa.concat_tables(
        ray.get(r) for r in embeddings.map_batches(
            pick, batch_format="pyarrow").to_arrow_refs())
    q_ids = np.asarray(q_tab.column(id_col), dtype=np.int64)
    q_mat = _normalize(_batch_matrix(q_tab))
    ref = ray.put((q_ids, q_mat))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qi, qm = ray.get(ref)
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        m = _normalize(_batch_matrix(batch))
        cos = np.round(qm @ m.T, 3)               # (Q, B)
        out_q, out_v, out_c = [], [], []
        for j in range(len(qi)):
            row = cos[j]
            valid = ids != qi[j]                  # self-exclusion
            vi = np.flatnonzero(valid)
            if len(vi) == 0:
                continue
            if len(vi) > k:
                # partial top-k with the final (-cos, vec_id) order so
                # batch-level pruning can never drop a global winner
                o = np.lexsort((ids[vi], -row[vi]))[:k]
                vi = vi[o]
            out_q.append(np.full(len(vi), qi[j], dtype=np.int64))
            out_v.append(ids[vi])
            out_c.append(row[vi])
        if not out_q:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "cos_r3": pa.array([], type=pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
            "cos_r3": pa.array(np.concatenate(out_c), type=pa.float64()),
        })

    import pandas as pd

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["cos_r3", "vec_id"],
                             ascending=[False, True]).head(k)

    # global merge is tiny (<= Q*k*num_blocks rows), bounded key count
    return embeddings.map_batches(partial_topk, batch_format="pyarrow") \
        .groupby("query_id").map_groups(merge_topk, batch_format="pandas")


class HyperplaneLsh:
    """Actor-pool stage: random-hyperplane bucket keys per vector.

    ``n_planes`` sign bits -> one int bucket key; vectors in the same
    bucket are ANN candidates.  Plane matrix generated from the seed in
    ``__init__`` (once per actor, identical everywhere)."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))
        self.weights = (1 << np.arange(n_planes)).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch)
        bits = (m @ self.planes) > 0
        key = bits.astype(np.int64) @ self.weights
        return batch.append_column("bucket", pa.array(key, type=pa.int64()))


def lsh_buckets(embeddings: "ray.data.Dataset", dim: int,
                n_planes: int = 12, seed: int = 42,
                concurrency: int = 4) -> "ray.data.Dataset":
    return embeddings.map_batches(
        HyperplaneLsh, fn_constructor_args=(dim, n_planes, seed),
        batch_format="pyarrow", concurrency=(1, concurrency))


@ray.remote
def _score_block_pair(ta: pa.Table, tb: pa.Table, threshold: float,
                      id_col: str, col: str) -> pa.Table:
    """Exact cosine pairs between two corpus blocks (u < v keeps each
    unordered pair exactly once across the block-pair grid)."""
    ia = np.asarray(ta.column(id_col), dtype=np.int64)
    ib = np.asarray(tb.column(id_col), dtype=np.int64)
    ma = _normalize(_batch_matrix(ta, col))
    mb = _normalize(_batch_matrix(tb, col))
    cos = np.round(ma @ mb.T, 3)
    ai, bi = np.nonzero(cos >= threshold)
    u, v = ia[ai], ib[bi]
    keep = u < v
    return pa.table({
        "u": pa.array(u[keep], type=pa.int64()),
        "v": pa.array(v[keep], type=pa.int64()),
        "cos_r3": pa.array(cos[ai, bi][keep], type=pa.float64()),
    })


EXACT_DUP_PAIRS_MAX_ROWS = 2_000_000


def embedding_dup_pairs(embeddings: "ray.data.Dataset", threshold: float,
                        id_col: str = "vec_id", col: str = "embedding",
                        block_rows: int = 65_536,
                        exact_max_rows: int | None = None
                        ) -> "ray.data.Dataset":
    """(u, v, cos_r3) pairs with round(cosine, 3) >= threshold —
    embedding-cosine near-duplicate detection, exact.

    Blocked pairwise scheme, driver-free: the corpus is split into
    object-store blocks of <= ``block_rows`` vectors; one Ray task per
    block pair (i <= j) does a (Bi x d) @ (d x Bj) matmul and emits
    only the passing pairs.  The driver holds ONLY block references
    (O(B^2) refs, no vector data); peak task memory is two blocks +
    one (Bi x Bj) score tile.  Compute is O(N^2) but spread over the
    cluster and embarrassingly parallel — raw Ray tasks are used here
    because a block cross-join is the one shape ``Dataset`` can't
    express (SURVEY §2 custom-operator rule (c)).

    Guard rail (cost-ordered routing, same discipline as
    ``tiers.py``): above ``exact_max_rows`` (default
    ``EXACT_DUP_PAIRS_MAX_ROWS``) the corpus auto-routes to the
    sub-quadratic ``embedding_dup_pairs_lsh`` (hyperplane-bucketed,
    recall measured in tests), so the O(N^2) exact path cannot be
    invoked accidentally at scale; the exact path is the small-N
    fallback only.
    """
    if exact_max_rows is None:
        exact_max_rows = EXACT_DUP_PAIRS_MAX_ROWS
    n = embeddings.count()
    if n > exact_max_rows:
        first = embeddings.select_columns([col]).limit(1).take(1)
        dim = len(first[0][col])
        return embedding_dup_pairs_lsh(embeddings, threshold, dim,
                                       id_col=id_col, col=col)
    num_blocks = max(1, -(-n // block_rows))
    mat = embeddings.select_columns([id_col, col]) \
        .repartition(num_blocks).materialize()
    block_refs = [r for bundle in mat.iter_internal_ref_bundles()
                  for r in bundle.block_refs]
    out_refs = []
    for i in range(len(block_refs)):
        for j in range(i, len(block_refs)):
            out_refs.append(_score_block_pair.remote(
                block_refs[i], block_refs[j], threshold, id_col, col))
    return ray.data.from_arrow_refs(out_refs)


def lsh_tables_for_recall(threshold: float, n_planes: int,
                          recall_target: float = 0.95,
                          max_tables: int = 64) -> int:
    """Number of OR-amplified hyperplane tables needed so a pair at
    exactly ``threshold`` cosine is caught with prob >= recall_target:
    per-table collision prob p1 = (1 - theta/pi)^n_planes, catch prob
    over T tables = 1 - (1 - p1)^T.  Pairs above threshold do better.
    """
    import math
    theta = math.acos(max(-1.0, min(1.0, threshold)))
    p1 = (1.0 - theta / math.pi) ** n_planes
    if p1 >= 1.0:
        return 1
    if p1 <= 0.0:
        return max_tables
    t = math.log(1.0 - recall_target) / math.log(1.0 - p1)
    return max(1, min(max_tables, math.ceil(t)))


def embedding_dup_pairs_lsh(embeddings: "ray.data.Dataset", threshold: float,
                            dim: int, id_col: str = "vec_id",
                            col: str = "embedding",
                            n_tables: int | None = None,
                            n_planes: int = 8, seed: int = 42,
                            num_partitions: int = 32,
                            max_bucket: int = 10_000) -> "ray.data.Dataset":
    """Sub-quadratic near-dup pairs: ``n_tables`` independent
    random-hyperplane signatures (OR-amplified: a pair is a candidate
    if it collides in ANY table), exact cosine rescoring inside each
    bucket, global pair dedup.  Candidate work is sum of bucket^2 per
    table instead of N^2; recall vs the exact path is measured in
    tests.

    This is the HIGH-similarity scale path (cos >= ~0.8, the actual
    near-dup regime): per-table collision prob for a pair at cosine t
    is (1 - acos(t)/pi)^n_planes, so low thresholds would need an
    impractical table count — ``n_tables=None`` auto-sizes via
    :func:`lsh_tables_for_recall` (target 0.95 at the threshold;
    fall back to the exact blocked path for permissive thresholds).

    Each vector is replicated ``n_tables`` times through ONE shuffle
    (the standard LSH join layout); buckets larger than ``max_bucket``
    are skipped per table (skew cap, same discipline as
    ``simhash_pairs``).
    """
    if n_tables is None:
        n_tables = lsh_tables_for_recall(threshold, n_planes)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, dim, n_planes))
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    planes_ref = ray.put(planes)
    from apollo_ray.hashing import (distinct_pair_idx, mix_to_partition,
                                    pair_mix, splitmix64)

    def explode_tables(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        m = _normalize(_batch_matrix(batch, col))
        n_rows = len(ids)
        keys = np.empty((n_tables, n_rows), dtype=np.int64)
        for t in range(n_tables):
            bits = (m @ pl[t]) > 0
            raw = bits.astype(np.int64) @ weights
            # mix the table id into the key so tables never collide
            salt = np.uint64((t * 0x9E3779B97F4A7C15)
                             & 0xFFFFFFFFFFFFFFFF)
            keys[t] = (splitmix64(raw.astype(np.uint64) ^ salt)
                       >> np.uint64(1)).astype(np.int64)
        flat_keys = keys.ravel()
        rep_ids = np.tile(ids, n_tables)
        emb = batch.column(col)
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        rep_emb = pa.concat_arrays([emb] * n_tables)
        return pa.table({
            "bucket": pa.array(flat_keys, type=pa.int64()),
            id_col: pa.array(rep_ids, type=pa.int64()),
            col: rep_emb,
            "pkey": pa.array(mix_to_partition(flat_keys, num_partitions),
                             type=pa.int32()),
        })

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table({"u": pa.array([], type=pa.int64()),
                          "v": pa.array([], type=pa.int64()),
                          "cos_r3": pa.array([], type=pa.float64())})
        if group.num_rows == 0:
            return empty
        b = np.asarray(group.column("bucket"), dtype=np.int64)
        ids = np.asarray(group.column(id_col), dtype=np.int64)
        m = _normalize(_batch_matrix(group, col))
        order = np.lexsort((ids, b))
        b, ids, m = b[order], ids[order], m[order]
        first = np.empty(len(b), dtype=bool)
        first[0] = True
        first[1:] = b[1:] != b[:-1]
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, len(b)))
        us, vs, cs = [], [], []
        for st, c in zip(starts[counts > 1], counts[counts > 1]):
            if c > max_bucket:
                continue
            sub_m = m[st:st + c]
            sub_i = ids[st:st + c]
            cos = np.round(sub_m @ sub_m.T, 3)
            ai, bi = np.nonzero(cos >= threshold)
            keep = sub_i[ai] < sub_i[bi]
            us.append(sub_i[ai][keep])
            vs.append(sub_i[bi][keep])
            cs.append(cos[ai, bi][keep])
        if not us:
            return empty
        u = np.concatenate(us)
        v = np.concatenate(vs)
        c = np.concatenate(cs)
        # dedup within the partition (same pair from several buckets;
        # value-exact — see hashing.distinct_pair_idx)
        idx = distinct_pair_idx(u, v)
        return pa.table({"u": pa.array(u[idx], type=pa.int64()),
                         "v": pa.array(v[idx], type=pa.int64()),
                         "cos_r3": pa.array(c[idx], type=pa.float64())})

    pairs = embeddings.map_batches(explode_tables, batch_format="pyarrow") \
        .groupby("pkey").map_groups(bucket_pairs, batch_format="pyarrow")

    # cross-partition dedup (pair found via tables in different pkeys)
    def add_pair_pkey(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch.column("u"), dtype=np.int64)
        v = np.asarray(batch.column("v"), dtype=np.int64)
        key = pair_mix(u, v).astype(np.int64) >> 1
        return batch.append_column(
            "pkey", pa.array(mix_to_partition(key, num_partitions),
                             type=pa.int32()))

    def distinct_pairs(group: pa.Table) -> pa.Table:
        u = np.asarray(group.column("u"), dtype=np.int64)
        v = np.asarray(group.column("v"), dtype=np.int64)
        c = np.asarray(group.column("cos_r3"), dtype=np.float64)
        if len(u) == 0:
            return group.select(["u", "v", "cos_r3"])
        idx = distinct_pair_idx(u, v)
        return pa.table({"u": pa.array(u[idx], type=pa.int64()),
                         "v": pa.array(v[idx], type=pa.int64()),
                         "cos_r3": pa.array(c[idx], type=pa.float64())})

    return pairs.map_batches(add_pair_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(distinct_pairs, batch_format="pyarrow")


class IvfAssigner:
    """Actor-pool stage: assign each vector to its nearest of
    ``n_centroids`` sampled centroids (one coarse-quantizer pass — the
    IVF scale path; centroids drawn deterministically from the seed so
    every actor builds the same table)."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = _normalize(np.asarray(centroids, dtype=np.float64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch))
        cid = np.argmax(m @ self.centroids.T, axis=1).astype(np.int32)
        return batch.append_column("centroid_id", pa.array(cid, type=pa.int32()))


def sample_centroids(embeddings: "ray.data.Dataset", n_centroids: int,
                     seed: int = 42, col: str = "embedding") -> np.ndarray:
    """Deterministic centroid sample (a k-means-free coarse quantizer:
    random data points, the classic IVF-flat baseline)."""
    n = embeddings.count()
    take = embeddings.random_sample(min(1.0, (4 * n_centroids) / max(1, n)),
                                    seed=seed).take(4 * n_centroids)
    rng = np.random.default_rng(seed)
    rows = [take[i][col] for i in rng.permutation(len(take))[:n_centroids]]
    return np.asarray(rows, dtype=np.float64)


def ivf_topk(embeddings: "ray.data.Dataset", query_vecs: np.ndarray,
             query_ids: list[int], k: int = 10, n_centroids: int = 16,
             nprobe: int = 4, seed: int = 42, id_col: str = "vec_id"
             ) -> "ray.data.Dataset":
    """IVF-flat approximate top-k: corpus bucketed by nearest centroid;
    each query scores only vectors in its ``nprobe`` closest centroid
    buckets.  Recall vs brute force is measured in tests, not assumed.
    """
    import pandas as pd
    import ray as _ray
    centroids = sample_centroids(embeddings, n_centroids, seed)
    cn = _normalize(centroids)
    assigned = embeddings.map_batches(
        IvfAssigner, fn_constructor_args=(centroids,),
        batch_format="pyarrow", concurrency=(1, 4))
    qm = _normalize(np.asarray(query_vecs, dtype=np.float64))
    q_probe = np.argsort(-(qm @ cn.T), axis=1)[:, :nprobe]   # (Q, nprobe)
    probe_ref = _ray.put((np.asarray(query_ids, dtype=np.int64), qm, q_probe))

    def score(batch: pa.Table) -> pa.Table:
        q_ids, qmat, probes = _ray.get(probe_ref)
        cid = np.asarray(batch.column("centroid_id"), dtype=np.int32)
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        m = _normalize(_batch_matrix(batch))
        out_q, out_v, out_c = [], [], []
        for qi in range(len(q_ids)):
            mask = np.isin(cid, probes[qi]) & (ids != q_ids[qi])
            if not mask.any():
                continue
            cos = m[mask] @ qmat[qi]
            out_q.append(np.full(mask.sum(), q_ids[qi], dtype=np.int64))
            out_v.append(ids[mask])
            out_c.append(np.round(cos, 3))
        if not out_q:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "cos_r3": pa.array([], type=pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
            "cos_r3": pa.array(np.concatenate(out_c), type=pa.float64()),
        })

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["cos_r3", "vec_id"],
                             ascending=[False, True]).head(k)

    return assigned.map_batches(score, batch_format="pyarrow") \
        .groupby("query_id").map_groups(topk, batch_format="pandas")


def lsh_topk(embeddings: "ray.data.Dataset", query_ids: list[int],
             k: int = 10, n_planes: int = 10, n_tables: int = 8,
             seed: int = 42, id_col: str = "vec_id") -> "ray.data.Dataset":
    """LSH-bucketed top-k: the scale path of :func:`cosine_topk`.

    The Q queries' bucket keys across ``n_tables`` OR-amplified
    hyperplane tables are broadcast once; each corpus batch computes
    its own keys with the same (seeded) planes and exact-rescoring runs
    ONLY on rows that co-bucket with a query in >= 1 table — per batch
    O(B * n_tables) key work + O(candidates * d) scoring instead of
    the brute-force O(Q * B * d) matmul.  Candidate recall follows the
    OR-amplified collision probability (1 - (1 - p^planes)^tables,
    p = 1 - theta/pi); near-duplicate neighbors are caught with high
    probability, far ones may be missed — that asymmetry is the point.

    Output schema matches :func:`cosine_topk` (query_id, vec_id,
    cos_r3) so results are directly comparable."""
    q_arr = np.asarray(sorted(int(q) for q in query_ids), dtype=np.int64)

    def pick(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        return batch.filter(pa.array(np.isin(ids, q_arr)))

    q_tab = pa.concat_tables(
        ray.get(r) for r in embeddings.map_batches(
            pick, batch_format="pyarrow").to_arrow_refs())
    q_ids = np.asarray(q_tab.column(id_col), dtype=np.int64)
    q_mat = _normalize(_batch_matrix(q_tab))
    dim = q_mat.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, dim, n_planes))
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    # (T, Q) query bucket keys; sorted per table for searchsorted match
    q_keys = np.stack([((q_mat @ planes[t]) > 0).astype(np.int64) @ weights
                       for t in range(n_tables)])
    q_order = np.argsort(q_keys, axis=1, kind="stable")
    ref = ray.put((q_ids, q_mat, planes, weights, q_keys, q_order))

    def bucket_partial_topk(batch: pa.Table) -> pa.Table:
        qi, qm, pl, w, qk, qo = ray.get(ref)
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        m = _normalize(_batch_matrix(batch))
        # candidate (corpus_row, query_row) pairs across tables
        rows, qrows = [], []
        for t in range(len(pl)):
            ck = ((m @ pl[t]) > 0).astype(np.int64) @ w       # (B,)
            qk_s = qk[t][qo[t]]
            lo = np.searchsorted(qk_s, ck, side="left")
            hi = np.searchsorted(qk_s, ck, side="right")
            n_hits = hi - lo
            hit = np.flatnonzero(n_hits)
            if len(hit) == 0:
                continue
            rows.append(np.repeat(hit, n_hits[hit]))
            # flatten the query ranges for the hit rows
            qrows.append(qo[t][np.concatenate(
                [np.arange(lo[i], hi[i]) for i in hit])])
        empty = pa.table({"query_id": pa.array([], type=pa.int64()),
                          "vec_id": pa.array([], type=pa.int64()),
                          "cos_r3": pa.array([], type=pa.float64())})
        if not rows:
            return empty
        cr = np.concatenate(rows)
        qr = np.concatenate(qrows)
        # dedup (corpus_row, query_row) across tables
        pair = np.unique(cr * np.int64(len(qi)) + qr)
        cr, qr = pair // len(qi), pair % len(qi)
        keep = ids[cr] != qi[qr]                  # self-exclusion
        cr, qr = cr[keep], qr[keep]
        if len(cr) == 0:
            return empty
        cos = np.round(np.einsum("ij,ij->i", qm[qr], m[cr]), 3)
        # per-query partial top-k within the batch
        order = np.lexsort((ids[cr], -cos, qr))
        qr_s, cr_s, cos_s = qr[order], cr[order], cos[order]
        first = np.empty(len(qr_s), dtype=bool)
        first[0] = True
        first[1:] = qr_s[1:] != qr_s[:-1]
        rank = np.arange(len(qr_s)) - np.maximum.accumulate(
            np.where(first, np.arange(len(qr_s)), 0))
        sel = rank < k
        return pa.table({
            "query_id": pa.array(qi[qr_s[sel]], type=pa.int64()),
            "vec_id": pa.array(ids[cr_s[sel]], type=pa.int64()),
            "cos_r3": pa.array(cos_s[sel], type=pa.float64()),
        })

    import pandas as pd

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["cos_r3", "vec_id"],
                             ascending=[False, True]).head(k)

    return embeddings.map_batches(bucket_partial_topk,
                                  batch_format="pyarrow") \
        .groupby("query_id").map_groups(merge_topk, batch_format="pandas")


def embedding_quantize(embeddings: "ray.data.Dataset",
                       col: str = "embedding") -> "ray.data.Dataset":
    """(vec_id, dim, q) — per-dimension int8 scalar quantization of an
    embedding column (the standard 4x ANN-index compression step):
    q = floor((x - mn_d) * (255 / (mx_d - mn_d)) + 0.5) with mn/mx the
    GLOBAL per-dimension min/max; constant dimensions quantize to 0.

    Determinism: min/max are selections (exact in float32 on both
    sides); the quantization expression is evaluated in float64 with
    every operand explicitly widened, in the same order as the SQL
    oracle, and round-half-up is the explicit floor(x+0.5).  Output is
    FLAT (one row per (vec, dim)) so the driver compare is hash-exact
    without list-ordering concerns.

    Scale shape: pass 1 is a map-side per-batch (min, max) partial —
    one dim-length pair of lists per BLOCK reaches the driver (the df
    array-reduction pattern; tree-reduce at extreme block counts);
    the (mn, mx) vectors broadcast once via ``ray.put``; pass 2 is
    map-only.  No shuffle anywhere.
    """

    def part_minmax(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"mn": pa.array([], type=pa.list_(
                pa.float32())), "mx": pa.array([], type=pa.list_(
                    pa.float32()))})
        m = _batch_matrix(batch, col).astype(np.float32)
        return pa.table({
            "mn": pa.array([m.min(axis=0).tolist()],
                           type=pa.list_(pa.float32())),
            "mx": pa.array([m.max(axis=0).tolist()],
                           type=pa.list_(pa.float32()))})

    parts = embeddings.map_batches(part_minmax,
                                   batch_format="pyarrow").take_all()
    if not parts:
        return ray.data.from_arrow(pa.table({
            "vec_id": pa.array([], type=pa.int64()),
            "dim": pa.array([], type=pa.int64()),
            "q": pa.array([], type=pa.int64())}))
    mn = np.min(np.asarray([p["mn"] for p in parts], dtype=np.float32),
                axis=0)
    mx = np.max(np.asarray([p["mx"] for p in parts], dtype=np.float32),
                axis=0)
    ref = ray.put((mn, mx))

    def quant(batch: pa.Table) -> pa.Table:
        import ray as _ray
        mn32, mx32 = _ray.get(ref)
        x = _batch_matrix(batch, col)            # float64 already
        mn64 = mn32.astype(np.float64)
        mx64 = mx32.astype(np.float64)
        span = mx64 - mn64
        fac = np.where(span == 0, 0.0,
                       255.0 / np.where(span == 0, 1.0, span))
        q = np.floor((x - mn64) * fac + 0.5).astype(np.int64)
        q[:, span == 0] = 0
        n, dim = x.shape
        ids = batch.column("vec_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, dim), type=pa.int64()),
            "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), n),
                            type=pa.int64()),
            "q": pa.array(q.ravel(), type=pa.int64())})

    return embeddings.map_batches(quant, batch_format="pyarrow")


def embedding_quantize_sql(table: str = "embeddings") -> str:
    """DuckDB oracle for :func:`embedding_quantize` — identical
    float64 expression with explicit casts (DuckDB would otherwise do
    FLOAT32 arithmetic on FLOAT columns)."""
    return f"""
        WITH e AS (
          SELECT vec_id, unnest(embedding) AS x,
                 generate_subscripts(embedding, 1) - 1 AS dim
          FROM {table}),
        s AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM e GROUP BY dim)
        SELECT e.vec_id,
               CAST(e.dim AS BIGINT) AS dim,
               CAST(CASE WHEN s.mx = s.mn THEN 0
                    ELSE floor((CAST(e.x AS DOUBLE) - CAST(s.mn AS DOUBLE))
                               * (255.0 / (CAST(s.mx AS DOUBLE)
                                           - CAST(s.mn AS DOUBLE)))
                               + 0.5)
                    END AS BIGINT) AS q
        FROM e JOIN s USING (dim)
    """


# ---------------------------------------------------------------------------
# embedding column statistics + integer-exact k-means assignment
# ---------------------------------------------------------------------------

def embedding_stats(embeddings: "ray.data.Dataset",
                    col: str = "embedding") -> "ray.data.Dataset":
    """(dim, n, sum_mu, sumsq_mu) — per-dimension first and second
    moments of an embedding column in integer MILLI-units
    (q = floor(x*1000 + 0.5) on the float64-widened value), the
    whitening / drift-monitoring statistics an embedding pipeline
    tracks.  Integer sums are order-independent, so the distributed
    fold is value-exact vs SQL regardless of block boundaries.

    Scale shape: map-side per-batch integer partials — ONE row of
    dim-length list columns per block reaches the driver (the df
    array-reduction pattern, same as embedding_quantize's min/max
    pass); no shuffle.  The int64 partials hold to ~1e6-row blocks at
    |x| <= 5e3 milli-units; the driver folds in Python ints (unbounded),
    and emits BIGINT — at corpus scales where sumsq would overflow
    int64 the fold shards per dimension instead (documented boundary,
    not reachable at bench scales).
    """

    def part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "n": pa.array([], type=pa.int64()),
                "s": pa.array([], type=pa.list_(pa.int64())),
                "s2": pa.array([], type=pa.list_(pa.int64()))})
        x = _batch_matrix(batch, col)
        q = np.floor(x * 1000.0 + 0.5).astype(np.int64)
        return pa.table({
            "n": pa.array([q.shape[0]], type=pa.int64()),
            "s": pa.array([q.sum(axis=0).tolist()],
                          type=pa.list_(pa.int64())),
            "s2": pa.array([(q * q).sum(axis=0).tolist()],
                           type=pa.list_(pa.int64()))})

    parts = embeddings.map_batches(part, batch_format="pyarrow").take_all()
    empty = pa.table({"dim": pa.array([], type=pa.int64()),
                      "n": pa.array([], type=pa.int64()),
                      "sum_mu": pa.array([], type=pa.int64()),
                      "sumsq_mu": pa.array([], type=pa.int64())})
    if not parts:
        return ray.data.from_arrow(empty)
    dim = len(parts[0]["s"])
    n = 0
    s = [0] * dim
    s2 = [0] * dim
    for p in parts:
        n += int(p["n"])
        for d_i, (a, b) in enumerate(zip(p["s"], p["s2"])):
            s[d_i] += int(a)
            s2[d_i] += int(b)
    return ray.data.from_arrow(pa.table({
        "dim": pa.array(range(dim), type=pa.int64()),
        "n": pa.array([n] * dim, type=pa.int64()),
        "sum_mu": pa.array(s, type=pa.int64()),
        "sumsq_mu": pa.array(s2, type=pa.int64())}))


def embedding_stats_sql(table: str = "embeddings") -> str:
    """DuckDB oracle for :func:`embedding_stats` (same milli-unit
    round-half-up floor on the DOUBLE-widened value; sums grouped per
    dimension)."""
    return f"""
        WITH e AS (
          SELECT unnest(embedding) AS x,
                 generate_subscripts(embedding, 1) - 1 AS dim
          FROM {table}),
        q AS (SELECT dim, CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5)
                               AS BIGINT) AS v FROM e)
        SELECT CAST(dim AS BIGINT) AS dim,
               count(*) AS n,
               CAST(sum(v) AS BIGINT) AS sum_mu,
               CAST(sum(v * v) AS BIGINT) AS sumsq_mu
        FROM q GROUP BY dim
    """


def kmeans_assign(embeddings: "ray.data.Dataset", k: int = 8,
                  col: str = "embedding",
                  id_col: str = "vec_id") -> "ray.data.Dataset":
    """(vec_id, cluster_id, dist_mu2) — one exact k-means assignment
    step: squared L2 distance to the k seed centroids (the vectors
    with the k smallest ids), argmin with lowest-centroid-id
    tie-break.  This is the SQL-oracled twin of the float32 Lloyd
    assignment inside :mod:`apollo_ray.functions.semdedup` — same
    broadcast-centroids + per-batch blocked distance argmin shape,
    but in integer milli-units (q = floor(x*1000+0.5) on the
    float64-widened value) so every distance is exact on both sides.

    Scale shape: the k seed rows are one tiny driver pull broadcast
    via ``ray.put``; assignment is a pure map pass (int64
    ||q||^2 + ||s||^2 - 2 q.s per batch).  No shuffle.
    """
    def seed_rows(batch: pa.Table) -> pa.Table:
        mask = pc.less(batch.column(id_col).cast(pa.int64()),
                       pa.scalar(k, type=pa.int64()))
        return batch.filter(mask)

    seed_rows_list = embeddings.map_batches(
        seed_rows, batch_format="pyarrow").take_all()
    empty = pa.table({id_col: pa.array([], type=pa.int64()),
                      "cluster_id": pa.array([], type=pa.int64()),
                      "dist_mu2": pa.array([], type=pa.int64())})
    if not seed_rows_list:
        return ray.data.from_arrow(empty)
    seed_rows_list.sort(key=lambda r: r[id_col])
    smat = np.floor(np.asarray(
        [np.asarray(r[col], dtype=np.float64) for r in seed_rows_list])
        * 1000.0 + 0.5).astype(np.int64)
    sids = np.asarray([r[id_col] for r in seed_rows_list],
                      dtype=np.int64)
    ref = ray.put((sids, smat))

    def assign(batch: pa.Table) -> pa.Table:
        import ray as _ray
        sids_, smat_ = _ray.get(ref)
        if batch.num_rows == 0:
            return empty
        x = _batch_matrix(batch, col)
        q = np.floor(x * 1000.0 + 0.5).astype(np.int64)
        # exact int64 expansion: ||q||^2 + ||s||^2 - 2 q.s
        d2 = ((q * q).sum(axis=1, keepdims=True)
              + (smat_ * smat_).sum(axis=1)[None, :]
              - 2 * (q @ smat_.T))
        best = d2.argmin(axis=1)           # first min == lowest seed id
        ids = batch.column(id_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            "cluster_id": pa.array(sids_[best], type=pa.int64()),
            "dist_mu2": pa.array(d2[np.arange(len(best)), best],
                                 type=pa.int64())})

    return embeddings.map_batches(assign, batch_format="pyarrow")


def kmeans_assign_sql(k: int = 8, table: str = "embeddings") -> str:
    """DuckDB oracle for :func:`kmeans_assign` (same milli-unit
    quantization, exact integer distances, dist-then-id ordering)."""
    return f"""
        WITH e AS (
          SELECT vec_id, unnest(embedding) AS x,
                 generate_subscripts(embedding, 1) - 1 AS dim
          FROM {table}),
        q AS (SELECT vec_id, dim,
                     CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5)
                          AS BIGINT) AS v
              FROM e),
        s AS (SELECT vec_id AS cid, dim, v FROM q WHERE vec_id < {k}),
        d AS (SELECT q.vec_id, s.cid,
                     sum((q.v - s.v) * (q.v - s.v)) AS dist
              FROM q JOIN s USING (dim) GROUP BY q.vec_id, s.cid),
        b AS (SELECT vec_id, cid, dist,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY dist, cid) AS rn
              FROM d)
        SELECT vec_id, cid AS cluster_id,
               CAST(dist AS BIGINT) AS dist_mu2
        FROM b WHERE rn = 1
    """


def feature_hash_embed(docs: "ray.data.Dataset", dim: int = 16
                       ) -> "ray.data.Dataset":
    """(doc_id, dim, v, n_terms) — hashing-trick document vectors
    (Weinberger et al. 2009): every token occurrence lands in bucket
    ``md5(token) % dim`` with sign ``+1/-1`` from a second hash
    (``md5('#' || token) % 2``); ``v`` is the signed occurrence sum,
    ``n_terms`` the occurrence count.  The no-model text→vector
    bridge: deterministic, vocabulary-free, and — because everything
    is integer arithmetic on the md5_number_lower bridge — value-exact
    in SQL.  Output is flat and SPARSE (only touched buckets emit a
    row; a bucket whose signs cancel still emits v=0, matching SQL's
    GROUP BY semantics).

    Scale shape: pure map, no shuffle; per-batch tokens are
    dictionary-encoded so the md5 C-loop touches each batch-distinct
    token once (the lang-fingerprint precedent), then two bincounts.
    """
    from apollo_ray.functions.textstats import _split_tokens
    from apollo_ray.kernels.text import _md5_u64

    def f(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "dim": pa.array([], type=pa.int64()),
                          "v": pa.array([], type=pa.int64()),
                          "n_terms": pa.array([], type=pa.int64())})
        if batch.num_rows == 0:
            return empty
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = _split_tokens(text)
        n_tok = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = toks.flatten()
        if len(flat) == 0:
            return empty
        enc = flat.dictionary_encode()
        dwords = enc.dictionary.to_pylist()
        bucket_d = np.fromiter((_md5_u64(w) % dim for w in dwords),
                               dtype=np.int64, count=len(dwords))
        sign_d = np.fromiter(
            (1 if _md5_u64("#" + w) % 2 == 0 else -1 for w in dwords),
            dtype=np.int64, count=len(dwords))
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        parent = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_tok)
        combo = parent * dim + bucket_d[codes]
        minlength = len(n_tok) * dim
        n_occ = np.bincount(combo, minlength=minlength)
        vsum = np.bincount(combo, weights=sign_d[codes].astype(np.float64),
                           minlength=minlength).astype(np.int64)
        nz = np.flatnonzero(n_occ)
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[nz // dim], type=pa.int64()),
            "dim": pa.array(nz % dim, type=pa.int64()),
            "v": pa.array(vsum[nz], type=pa.int64()),
            "n_terms": pa.array(n_occ[nz], type=pa.int64())})

    return docs.map_batches(f, batch_format="pyarrow")


def feature_hash_embed_sql(dim: int = 16, table: str = "documents"
                           ) -> str:
    """DuckDB oracle for :func:`feature_hash_embed`."""
    return f"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(CASE WHEN length(trim(text)) = 0
                        THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(text), '\\s+')
                        END) AS t
          FROM {table}),
        h AS (SELECT doc_id,
                     CAST(md5_number_lower(t) % {dim} AS BIGINT) AS dim,
                     CASE WHEN md5_number_lower('#' || t) % 2 = 0
                          THEN 1 ELSE -1 END AS s
              FROM tok)
        SELECT doc_id, dim, CAST(sum(s) AS BIGINT) AS v,
               count(*) AS n_terms
        FROM h GROUP BY doc_id, dim
    """


def _trunc_div(s: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Integer division truncating toward zero — DuckDB ``//``
    semantics (numpy ``//`` floors, which differs on negatives)."""
    return np.sign(s) * (np.abs(s) // np.maximum(n, 1))


def _pq_assign_sub(q: np.ndarray, cent: np.ndarray) -> tuple:
    """Integer squared-L2 argmin of subvectors vs one codebook;
    first min == lowest code (ties)."""
    d2 = ((q * q).sum(axis=1, keepdims=True)
          + (cent * cent).sum(axis=1)[None, :]
          - 2 * (q @ cent.T))
    best = d2.argmin(axis=1)
    return best, d2[np.arange(len(best)), best]


def _pq_train(embeddings: "ray.data.Dataset", m: int, k: int, iters: int,
              col: str = "embedding", id_col: str = "vec_id"):
    """Train the product-quantization codebooks (shared by
    :func:`pq_encode` and :func:`ivfpq_topk`): seeds = the k globally
    SMALLEST vec_ids (per-batch partial min-k, then the global min-k
    over the <= k-per-block survivors — works for any id domain),
    then ``iters`` integer Lloyd rounds (per-batch partial sums,
    truncating-division update, empty codewords keep their centroid).
    Returns ``(cids, cents, ds)`` or None on an empty input."""
    def seed_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows > k:
            ids = np.asarray(batch.column(id_col).cast(pa.int64()))
            batch = batch.take(pa.array(np.argsort(ids)[:k]))
        return batch

    seeds = embeddings.map_batches(seed_rows,
                                   batch_format="pyarrow").take_all()
    if not seeds:
        return None
    seeds.sort(key=lambda r: r[id_col])
    seeds = seeds[:k]
    smat = np.floor(np.asarray(
        [np.asarray(r[col], dtype=np.float64) for r in seeds])
        * 1000.0 + 0.5).astype(np.int64)
    cids = np.asarray([r[id_col] for r in seeds], dtype=np.int64)
    d = smat.shape[1]
    if d % m != 0:
        raise ValueError("m must divide the embedding dim")
    ds = d // m
    # cents[j]: (k, ds) codebook of subspace j
    cents = np.stack([smat[:, j * ds:(j + 1) * ds] for j in range(m)])

    for _ in range(iters):
        ref = ray.put(cents)

        def partial(batch: pa.Table) -> pa.Table:
            import ray as _ray
            c = _ray.get(ref)
            cols = {"sub": [], "cid": [], "sdim": [], "s": [], "n": []}
            if batch.num_rows:
                x = _batch_matrix(batch, col)
                q = np.floor(x * 1000.0 + 0.5).astype(np.int64)
                for j in range(m):
                    qj = q[:, j * ds:(j + 1) * ds]
                    best, _d = _pq_assign_sub(qj, c[j])
                    for ci in range(k):
                        rows = qj[best == ci]
                        if not len(rows):
                            continue
                        cols["sub"].extend([j] * ds)
                        cols["cid"].extend([ci] * ds)
                        cols["sdim"].extend(range(ds))
                        cols["s"].extend(rows.sum(axis=0).tolist())
                        cols["n"].extend([len(rows)] * ds)
            return pa.table({
                "sub": pa.array(cols["sub"], type=pa.int64()),
                "cid": pa.array(cols["cid"], type=pa.int64()),
                "sdim": pa.array(cols["sdim"], type=pa.int64()),
                "s": pa.array(cols["s"], type=pa.int64()),
                "n": pa.array(cols["n"], type=pa.int64())})

        pr = embeddings.map_batches(partial,
                                    batch_format="pyarrow").to_pandas()
        new = cents.copy()
        if len(pr):
            agg = pr.groupby(["sub", "cid", "sdim"], sort=False) \
                .agg(s=("s", "sum"), n=("n", "sum")).reset_index()
            # n is constant across sdim within (sub, cid); trunc-div
            v = _trunc_div(agg["s"].to_numpy(dtype=np.int64),
                           agg["n"].to_numpy(dtype=np.int64))
            new[agg["sub"].to_numpy(), agg["cid"].to_numpy(),
                agg["sdim"].to_numpy()] = v
        cents = new
    return cids, cents, ds


def pq_encode(embeddings: "ray.data.Dataset", m: int = 4, k: int = 8,
              iters: int = 2, col: str = "embedding",
              id_col: str = "vec_id") -> "ray.data.Dataset":
    """(vec_id, subspace, code, dist_mu2) — product-quantization
    codes (Jegou et al. 2011, "Product Quantization for Nearest
    Neighbor Search"): the vector is split into ``m`` contiguous
    subspaces, each trained with its own ``k``-codeword Lloyd
    codebook, and every (vector, subspace) pair is encoded as the id
    of its nearest codeword — the memory-flat index format behind
    IVF-PQ ANN at corpus scale (64-dim float vector -> m bytes).

    Everything is integer-exact and SQL-reproducible: inputs quantize
    to milli-units (``floor(x*1000+0.5)`` on the float64-widened
    value, the ``kmeans_assign`` rule), codebooks start from the
    ``k`` globally-smallest-id vectors' subvectors (a distributed
    partial min-k, so non-contiguous / non-zero-based id domains
    seed the full k codewords), assignment is int64
    squared-L2 argmin with lowest-code tie-break, and the Lloyd
    update is truncating integer division (DuckDB ``//`` semantics;
    empty codewords keep their previous centroid).  ``iters`` update
    rounds run before the final encode; the oracle
    (:func:`pq_encode_sql`) unrolls the identical rounds over
    MATERIALIZED CTEs.

    Scale shape: codebook state is O(m*k*ds) — a tiny broadcast via
    ``ray.put``; each Lloyd round is one map pass emitting per-batch
    partial sums (m*k*ds rows per BLOCK, never per vector) folded on
    the driver exactly like ``semdedup``'s streaming float32 Lloyd;
    the final encode is a pure map.
    """
    trained = _pq_train(embeddings, m, k, iters, col=col, id_col=id_col)
    empty = pa.table({id_col: pa.array([], type=pa.int64()),
                      "subspace": pa.array([], type=pa.int64()),
                      "code": pa.array([], type=pa.int64()),
                      "dist_mu2": pa.array([], type=pa.int64())})
    if trained is None:
        return ray.data.from_arrow(empty)
    cids, cents, ds = trained
    ref = ray.put(cents)

    def encode(batch: pa.Table) -> pa.Table:
        import ray as _ray
        c = _ray.get(ref)
        if batch.num_rows == 0:
            return empty
        x = _batch_matrix(batch, col)
        q = np.floor(x * 1000.0 + 0.5).astype(np.int64)
        ids = batch.column(id_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        parts = []
        for j in range(m):
            best, dist = _pq_assign_sub(q[:, j * ds:(j + 1) * ds], c[j])
            parts.append(pa.table({
                id_col: pa.array(ids, type=pa.int64()),
                "subspace": pa.array(np.full(len(ids), j, np.int64),
                                     type=pa.int64()),
                "code": pa.array(cids[best], type=pa.int64()),
                "dist_mu2": pa.array(dist, type=pa.int64())}))
        return pa.concat_tables(parts)

    return embeddings.map_batches(encode, batch_format="pyarrow")


def pq_encode_sql(m: int = 4, k: int = 8, iters: int = 2,
                  dim: int = 64, table: str = "embeddings") -> str:
    """DuckDB oracle for :func:`pq_encode`: milli-unit quantization,
    per-subspace integer distances, ``iters`` unrolled Lloyd rounds
    (assignment rn=1 ordered by (dist, cid); update ``sum // count``
    — DuckDB truncating division, matched by the engine's
    :func:`_trunc_div` — with empty codewords keeping the previous
    centroid via LEFT JOIN + coalesce), then the final encode.  All
    multiply-referenced CTEs are MATERIALIZED (DuckDB inlines plain
    CTEs — unrolled fixpoints explode exponentially otherwise).
    ``dim`` is the embedding width (the engine reads it off the
    batch; SQL needs it literal to compute the subspace split)."""
    pieces = _pq_sql_pieces(m, k, iters, dim, table)
    fin = """
    df AS MATERIALIZED (
      SELECT t.vec_id, t.sub, c.cid,
             sum((t.v - c.v) * (t.v - c.v)) AS dist
      FROM q t JOIN c%d c ON c.sub = t.sub AND c.sdim = t.sdim
      GROUP BY t.vec_id, t.sub, c.cid)
    SELECT vec_id, sub AS subspace, cid AS code,
           CAST(dist AS BIGINT) AS dist_mu2
    FROM (SELECT vec_id, sub, cid, dist,
                 row_number() OVER (PARTITION BY vec_id, sub
                                    ORDER BY dist, cid) AS rn
          FROM df) WHERE rn = 1""" % iters
    return "WITH " + ",".join(pieces) + "," + fin


def _pq_sql_pieces(m: int, k: int, iters: int, dim: int,
                   table: str) -> list:
    """The shared PQ WITH-body pieces (milli-unit ``q``, seed ``c0``,
    Lloyd rounds up to ``c{iters}``) used by :func:`pq_encode_sql`
    and :func:`ivfpq_topk_sql` — single source of truth for the
    oracle text."""
    if dim % m != 0:
        raise ValueError("m must divide dim")
    ds = dim // m
    pieces = ["""q AS MATERIALIZED (
      SELECT vec_id, d.dim // %d AS sub, d.dim %% %d AS sdim,
             CAST(floor(CAST(d.x AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
      FROM (SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) - 1 AS dim
            FROM %s) d),
    c0 AS MATERIALIZED (
      SELECT sub, vec_id AS cid, sdim, v FROM q
      WHERE vec_id IN (SELECT DISTINCT vec_id FROM q
                       ORDER BY vec_id LIMIT %d))"""
              % (ds, ds, table, k)]
    step = """
    d%(i)d AS MATERIALIZED (
      SELECT t.vec_id, t.sub, c.cid,
             sum((t.v - c.v) * (t.v - c.v)) AS dist
      FROM q t JOIN c%(p)d c ON c.sub = t.sub AND c.sdim = t.sdim
      GROUP BY t.vec_id, t.sub, c.cid),
    a%(i)d AS MATERIALIZED (
      SELECT vec_id, sub, cid FROM (
        SELECT vec_id, sub, cid,
               row_number() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dist, cid) AS rn
        FROM d%(i)d) WHERE rn = 1),
    c%(i)d AS MATERIALIZED (
      SELECT c.sub, c.cid, c.sdim,
             CAST(coalesce(u.nv, c.v) AS BIGINT) AS v
      FROM c%(p)d c LEFT JOIN (
        SELECT a.sub, a.cid, t.sdim, sum(t.v) // count(*) AS nv
        FROM a%(i)d a JOIN q t ON t.vec_id = a.vec_id AND t.sub = a.sub
        GROUP BY a.sub, a.cid, t.sdim) u
      ON u.sub = c.sub AND u.cid = c.cid AND u.sdim = c.sdim)"""
    for i in range(1, iters + 1):
        pieces.append(step % {"i": i, "p": i - 1})
    return pieces


def ivfpq_topk(embeddings: "ray.data.Dataset", query_ids: list[int],
               k_out: int = 5, n_coarse: int = 8, m: int = 4,
               k_pq: int = 8, iters: int = 1, nprobe: int = 2,
               col: str = "embedding", id_col: str = "vec_id"
               ) -> "ray.data.Dataset":
    """(query_id, vec_id, adc_mu2, rank) — IVF-PQ approximate top-k
    (Jegou et al. 2011): coarse quantizer buckets the corpus, each
    query scans only its ``nprobe`` closest cells, and candidate
    distances are Asymmetric Distance Computation (ADC) lookups into
    the query's precomputed (m x k_pq) squared-L2 table against the
    trained PQ codebooks — the memory-flat billion-scale ANN index
    layout (m bytes + 1 coarse id per vector).

    Simplification vs the paper, documented: codes quantize RAW
    vectors, not residuals (residual encoding needs per-cell
    codebooks or a shared rotation; the raw variant keeps every
    quantity integer-exact in SQL).  Coarse centroids follow the
    ``kmeans_assign`` seed rule (the ``n_coarse`` smallest-id
    vectors, one exact assignment step); PQ codebooks are
    :func:`_pq_train`'s integer Lloyd.  Everything is int64
    milli-unit arithmetic, so :func:`ivfpq_topk_sql` reproduces the
    result value-exactly (rank ties broken by vec_id).

    Scale shape: coarse cents + codebooks + per-query LUTs are one
    tiny ``ray.put`` broadcast; the scan is a single map pass
    emitting per-batch partial top-k rows per query (<= Q*k_out per
    BLOCK); one Q-group exchange finishes the exact global top-k.
    """
    import ray as _ray
    coarse = _pq_train(embeddings, 1, n_coarse, 0, col=col, id_col=id_col)
    pq = _pq_train(embeddings, m, k_pq, iters, col=col, id_col=id_col)
    empty = pa.table({"query_id": pa.array([], type=pa.int64()),
                      "vec_id": pa.array([], type=pa.int64()),
                      "adc_mu2": pa.array([], type=pa.int64()),
                      "rank": pa.array([], type=pa.int64())})
    if coarse is None or pq is None or not query_ids:
        return ray.data.from_arrow(empty)
    ccids, ccents, _d = coarse          # ccents: (1, n_coarse, dim)
    cmat = ccents[0]                    # (n_coarse, dim)
    pqids, pqcents, ds = pq             # pqcents: (m, k_pq, ds)

    qwant = np.asarray(sorted(int(q) for q in query_ids), dtype=np.int64)

    def pick(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col).cast(pa.int64()))
        return batch.filter(pa.array(np.isin(ids, qwant)))

    qrows = embeddings.map_batches(pick, batch_format="pyarrow").take_all()
    qrows.sort(key=lambda r: r[id_col])
    if not qrows:
        return ray.data.from_arrow(empty)
    qmat = np.floor(np.asarray(
        [np.asarray(r[col], dtype=np.float64) for r in qrows])
        * 1000.0 + 0.5).astype(np.int64)
    qid_arr = np.asarray([r[id_col] for r in qrows], dtype=np.int64)
    nq = len(qid_arr)
    # probe cells per query: top-nprobe coarse centroids by (d2, cid)
    qd2 = ((qmat * qmat).sum(axis=1, keepdims=True)
           + (cmat * cmat).sum(axis=1)[None, :] - 2 * (qmat @ cmat.T))
    probes = np.empty((nq, min(nprobe, len(ccids))), dtype=np.int64)
    for qi in range(nq):
        o = sorted(range(len(ccids)), key=lambda c: (qd2[qi, c], ccids[c]))
        probes[qi] = [o[i] for i in range(probes.shape[1])]
    # ADC lookup tables: lut[qi, j, ci] = d2(q_sub_j, pqcents[j, ci])
    lut = np.empty((nq, m, pqcents.shape[1]), dtype=np.int64)
    for j in range(m):
        qj = qmat[:, j * ds:(j + 1) * ds]
        cj = pqcents[j]
        lut[:, j, :] = ((qj * qj).sum(axis=1, keepdims=True)
                        + (cj * cj).sum(axis=1)[None, :]
                        - 2 * (qj @ cj.T))
    ref = _ray.put((qid_arr, probes, lut, cmat, ccids, pqcents))

    def scan(batch: pa.Table) -> pa.Table:
        qids_, probes_, lut_, cmat_, ccids_, cents_ = _ray.get(ref)
        if batch.num_rows == 0:
            return empty
        x = _batch_matrix(batch, col)
        v = np.floor(x * 1000.0 + 0.5).astype(np.int64)
        ids = batch.column(id_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        # coarse cell index per vector (argmin d2, lowest cid ties —
        # ccids ascending so argmin index == lowest-cid tie-break)
        cd2 = ((v * v).sum(axis=1, keepdims=True)
               + (cmat_ * cmat_).sum(axis=1)[None, :] - 2 * (v @ cmat_.T))
        cell = cd2.argmin(axis=1)
        # PQ code index per (vector, subspace)
        codes = np.empty((len(ids), lut_.shape[1]), dtype=np.int64)
        for j in range(lut_.shape[1]):
            codes[:, j], _ = _pq_assign_sub(
                v[:, j * ds:(j + 1) * ds], cents_[j])
        out_q, out_v, out_a = [], [], []
        for qi in range(len(qids_)):
            cand = np.isin(cell, probes_[qi]) & (ids != qids_[qi])
            if not cand.any():
                continue
            adc = lut_[qi][np.arange(lut_.shape[1])[None, :],
                           codes[cand]].sum(axis=1)
            cid_c = ids[cand]
            top = np.lexsort((cid_c, adc))[:k_out]    # partial top-k
            out_q.append(np.full(len(top), qids_[qi], dtype=np.int64))
            out_v.append(cid_c[top])
            out_a.append(adc[top])
        if not out_q:
            return empty
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
            "adc_mu2": pa.array(np.concatenate(out_a), type=pa.int64()),
            "rank": pa.array(np.zeros(sum(len(o) for o in out_q),
                                      dtype=np.int64), type=pa.int64())})

    def finish(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        q = np.asarray(group.column("query_id"), dtype=np.int64)
        vid = np.asarray(group.column("vec_id"), dtype=np.int64)
        adc = np.asarray(group.column("adc_mu2"), dtype=np.int64)
        top = np.lexsort((vid, adc))[:k_out]
        return pa.table({
            "query_id": pa.array(q[top], type=pa.int64()),
            "vec_id": pa.array(vid[top], type=pa.int64()),
            "adc_mu2": pa.array(adc[top], type=pa.int64()),
            "rank": pa.array(np.arange(1, len(top) + 1), type=pa.int64())})

    return embeddings.map_batches(scan, batch_format="pyarrow") \
        .groupby("query_id").map_groups(finish, batch_format="pyarrow")


def ivfpq_topk_sql(query_ids: list[int], k_out: int = 5,
                   n_coarse: int = 8, m: int = 4, k_pq: int = 8,
                   iters: int = 1, nprobe: int = 2, dim: int = 64,
                   table: str = "embeddings") -> str:
    """DuckDB oracle for :func:`ivfpq_topk`: shared PQ CTE pieces
    (:func:`_pq_sql_pieces` — single source of truth), a coarse
    seed-assignment CTE chain (the ``kmeans_assign_sql`` rule over
    full vectors), per-query probe sets and ADC lookup tables, and
    the identical (adc, vec_id) rank."""
    # "IN (NULL)" matches no rows — keeps an empty query list a valid
    # empty-result query, mirroring the engine twin
    qids = (", ".join(str(int(q)) for q in sorted(query_ids))
            if query_ids else "NULL")
    pieces = _pq_sql_pieces(m, k_pq, iters, dim, table)
    extra = f"""
    cs AS MATERIALIZED (
      SELECT vec_id AS ccid, sub, sdim, v FROM q
      WHERE vec_id IN (SELECT DISTINCT vec_id FROM q
                       ORDER BY vec_id LIMIT {n_coarse})),
    celld AS MATERIALIZED (
      SELECT t.vec_id, s.ccid,
             sum((t.v - s.v) * (t.v - s.v)) AS dist
      FROM q t JOIN cs s ON s.sub = t.sub AND s.sdim = t.sdim
      GROUP BY t.vec_id, s.ccid),
    cell AS MATERIALIZED (
      SELECT vec_id, ccid FROM (
        SELECT vec_id, ccid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, ccid) AS rn
        FROM celld) WHERE rn = 1),
    probe AS MATERIALIZED (
      SELECT vec_id AS query_id, ccid FROM (
        SELECT vec_id, ccid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, ccid) AS rn
        FROM celld WHERE vec_id IN ({qids}))
      WHERE rn <= {nprobe}),
    pcode AS MATERIALIZED (
      SELECT vec_id, sub, cid FROM (
        SELECT t.vec_id, t.sub, c.cid,
               row_number() OVER (PARTITION BY t.vec_id, t.sub
                                  ORDER BY sum((t.v - c.v) * (t.v - c.v)),
                                           c.cid) AS rn
        FROM q t JOIN c{iters} c ON c.sub = t.sub AND c.sdim = t.sdim
        GROUP BY t.vec_id, t.sub, c.cid) WHERE rn = 1),
    lut AS MATERIALIZED (
      SELECT t.vec_id AS query_id, c.sub, c.cid,
             sum((t.v - c.v) * (t.v - c.v)) AS d
      FROM q t JOIN c{iters} c ON c.sub = t.sub AND c.sdim = t.sdim
      WHERE t.vec_id IN ({qids})
      GROUP BY t.vec_id, c.sub, c.cid),
    adc AS MATERIALIZED (
      SELECT l.query_id, pc.vec_id, sum(l.d) AS adc
      FROM pcode pc
      JOIN lut l ON l.sub = pc.sub AND l.cid = pc.cid
      JOIN cell ce ON ce.vec_id = pc.vec_id
      JOIN probe pr ON pr.query_id = l.query_id AND pr.ccid = ce.ccid
      WHERE pc.vec_id <> l.query_id
      GROUP BY l.query_id, pc.vec_id)
    SELECT query_id, vec_id, CAST(adc AS BIGINT) AS adc_mu2,
           CAST(rn AS BIGINT) AS rank
    FROM (SELECT query_id, vec_id, adc,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY adc, vec_id) AS rn
          FROM adc)
    WHERE rn <= {k_out}"""
    return "WITH " + ",".join(pieces) + "," + extra
