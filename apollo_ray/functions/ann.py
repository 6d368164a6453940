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
    """Top-k by cosine per query: per-batch partial top-k (vectorized
    argpartition) -> tiny global sort+limit per query."""
    pairs = cosine_close_pairs(embeddings, query_ids, threshold=-1.0,
                               id_col=id_col)

    import pandas as pd

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["cos_r3", "vec_id"],
                             ascending=[False, True]).head(k)

    return pairs.groupby("query_id").map_groups(topk, batch_format="pandas")


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


def embedding_dup_pairs(embeddings: "ray.data.Dataset", threshold: float,
                        id_col: str = "vec_id", col: str = "embedding"
                        ) -> "ray.data.Dataset":
    """(u, v, cos_r3) pairs with round(cosine, 3) >= threshold —
    embedding-cosine near-duplicate detection.

    Baseline implementation: the normalized corpus matrix is broadcast
    once (``ray.put``) and each batch does one (B x d) @ (d x N)
    matmul — exact, zero shuffles, O(N^2) compute spread over the
    cluster.  The LSH-bucketed variant (``lsh_buckets`` + per-bucket
    rescoring) is the sub-quadratic scale path when N^2 is infeasible.
    """
    import ray as _ray

    mats = []
    ids = []
    for t in embeddings.map_batches(lambda b: b, batch_format="pyarrow") \
            .to_arrow_refs():
        tab = _ray.get(t)
        mats.append(_batch_matrix(tab, col))
        ids.append(np.asarray(tab.column(id_col), dtype=np.int64))
    full = _normalize(np.vstack(mats))
    full_ids = np.concatenate(ids)
    ref = _ray.put((full_ids, full))

    def score(batch: pa.Table) -> pa.Table:
        all_ids, all_m = _ray.get(ref)
        ids_b = np.asarray(batch.column(id_col), dtype=np.int64)
        m = _normalize(_batch_matrix(batch, col))
        cos = np.round(m @ all_m.T, 3)
        bi, ci = np.nonzero(cos >= threshold)
        u = ids_b[bi]
        v = all_ids[ci]
        keep = u < v                   # each unordered pair once, no self
        return pa.table({
            "u": pa.array(u[keep], type=pa.int64()),
            "v": pa.array(v[keep], type=pa.int64()),
            "cos_r3": pa.array(cos[bi, ci][keep], type=pa.float64()),
        })

    return embeddings.map_batches(score, batch_format="pyarrow")


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
