"""Semantic deduplication over an embedding column (SemDeDup-style).

Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", arXiv:2303.09540): cluster the
corpus embeddings with k-means, then inside each cluster drop every
point whose cosine similarity to a higher-priority cluster member
exceeds a threshold — semantic near-duplicates that exact/MinHash text
dedup cannot see.  The reference system has no embedding operators at
all (its unit of similarity is the weighted bag, ``apollo/hasher.py``);
this is one of the training-data extras the engine adds on top of the
reference inventory.

Scale shape (the 100-TB argument):

- :func:`kmeans_fit` is Lloyd's algorithm as ``iters`` streaming
  passes: each ``map_batches`` task emits one (k x d) partial-sum
  matrix + k counts, the driver folds the tiny partials — driver state
  is O(k*d) floats, never O(N).  Init is the k vectors with the
  smallest md5 rank of their id: a per-batch partial top-k followed by
  a driver merge of <= k rows per block (no sort shuffle, no
  ``take_all``).
- assignment is one broadcast matmul per batch (centroids via
  ``ray.put``), the standard small-side broadcast.
- the within-cluster O(c^2) pair scan runs under the pkey pattern: one
  shuffle on ``cluster_id % num_partitions``, vectorized per-partition
  segmentation, buckets above ``max_cluster`` skipped with a logged
  count (the simhash/ngram skew-cap discipline).  At web scale k is
  chosen ~sqrt(N) (paper: 50k clusters for LAION-440M) so c ~ sqrt(N)
  keeps c^2 per task bounded.

Determinism / oracle bridge: every cross-engine float boundary is
rounded — centroids to 6 decimals after each Lloyd update, cosines to
6 (assignment) / 3 (dedup) decimals — so DuckDB reproduces the FULL
output value-for-value (md5 init rank via ``md5_number_lower``,
``list_cosine_similarity`` on DOUBLE lists, window-EXISTS drop rule);
the oracle SQL is generated in ``__ray_entry__.py``.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

import ray
import ray.data

from apollo_ray.functions.ann import _batch_matrix
from apollo_ray.hashing import mix_to_partition
from apollo_ray.kernels.text import _md5_u64

log = logging.getLogger("apollo_ray.semdedup")


def _id_rank_u64(ids: np.ndarray) -> np.ndarray:
    """md5 rank of each id: ``md5_number_lower(CAST(id AS VARCHAR))``
    masked to 63 bits (the engine-wide int64 key rule)."""
    mask = (1 << 63) - 1
    return np.fromiter((_md5_u64(str(int(i))) & mask for i in ids),
                       dtype=np.int64, count=len(ids))


def kmeans_fit(embeddings: "ray.data.Dataset", k: int, iters: int = 2,
               id_col: str = "vec_id", col: str = "embedding",
               decimals: int = 6) -> np.ndarray:
    """Fit k-means centroids with ``iters`` Lloyd passes; returns a
    (k, d) float64 array, each coordinate rounded to ``decimals``.

    Init: the embeddings of the k ids with the smallest
    (md5_rank(id), id) — deterministic, order-independent, and
    SQL-reproducible (``ORDER BY md5_number_lower(...) LIMIT k``).
    Assignment metric is cosine (rounded to 6 decimals, ties to the
    lowest centroid index); the update is the arithmetic mean of the
    raw (unnormalized) float64-cast members; empty clusters keep their
    previous centroid.
    """

    def pick_init(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "rank": pa.array([], type=pa.int64()),
                             col: batch.column(col)})
        rank = _id_rank_u64(ids)
        order = np.lexsort((ids, rank))[:k]
        return pa.table({
            id_col: pa.array(ids[order], type=pa.int64()),
            "rank": pa.array(rank[order], type=pa.int64()),
            col: batch.column(col).take(pa.array(order)),
        })

    # skip zero-row candidate tables: Ray emits schema-LESS empty
    # blocks for filtered-out input blocks (they would fail the concat)
    tabs = [t for t in (ray.get(r) for r in embeddings.map_batches(
        pick_init, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows > 0]
    if not tabs:
        raise ValueError("kmeans_fit: corpus has fewer than k=%d vectors"
                         % k)
    cand = pa.concat_tables(tabs)
    ids = np.asarray(cand.column(id_col), dtype=np.int64)
    rank = np.asarray(cand.column("rank"), dtype=np.int64)
    order = np.lexsort((ids, rank))[:k]
    if len(order) < k:
        raise ValueError("kmeans_fit: corpus has fewer than k=%d vectors"
                         % k)
    centroids = _batch_matrix(cand, col)[order]
    centroids = np.round(centroids, decimals)

    for _ in range(iters):
        ref = ray.put(centroids)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = _batch_matrix(batch, col)
            cid = _assign(m, c)
            d = m.shape[1]
            sums = np.zeros((k, d), dtype=np.float64)
            np.add.at(sums, cid, m)
            counts = np.bincount(cid, minlength=k).astype(np.int64)
            return pa.table({
                "cid": pa.array(np.arange(k, dtype=np.int64)),
                "s": pa.array(list(sums), type=pa.list_(pa.float64())),
                "n": pa.array(counts, type=pa.int64()),
            })

        parts = pa.concat_tables(
            t for t in (ray.get(r) for r in embeddings.map_batches(
                partial, batch_format="pyarrow").to_arrow_refs())
            if t.num_rows > 0)          # schema-less empty blocks
        d = centroids.shape[1]
        sums = np.asarray(parts.column("s").combine_chunks().flatten(),
                          dtype=np.float64).reshape(-1, k, d).sum(axis=0)
        counts = np.asarray(parts.column("n"), dtype=np.int64) \
            .reshape(-1, k).sum(axis=0)
        nonzero = counts > 0
        centroids = centroids.copy()
        centroids[nonzero] = np.round(
            sums[nonzero] / counts[nonzero, None], decimals)
    return centroids


def _assign(m: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Nearest-centroid assignment by cosine rounded to 6 decimals,
    ties broken toward the LOWEST centroid index (so DuckDB's
    ``row_number() ... ORDER BY cos DESC, cid`` agrees exactly)."""
    mn = np.linalg.norm(m, axis=1, keepdims=True)
    mn[mn == 0] = 1.0
    cn = np.linalg.norm(centroids, axis=1, keepdims=True)
    cn[cn == 0] = 1.0
    cos = np.round((m / mn) @ (centroids / cn).T, 6)
    return np.argmax(cos, axis=1)      # argmax takes the first max = lowest cid


def semdedup(embeddings: "ray.data.Dataset", k: int = 8,
             threshold: float = 0.95, iters: int = 2,
             id_col: str = "vec_id", col: str = "embedding",
             num_partitions: int = 16, max_cluster: int = 100_000,
             centroids: np.ndarray | None = None) -> "ray.data.Dataset":
    """Per-vector semantic-dedup verdicts:
    ``(vec_id, cluster_id, cos_c6, keep)``.

    ``cos_c6`` is the vector's cosine to its cluster centroid (6
    decimals).  Priority within a cluster is ``(cos_c6 DESC, vec_id
    ASC)`` — most-central first; a vector is dropped (``keep=false``)
    iff SOME strictly-higher-priority member of its cluster has
    ``round(cos, 3) >= threshold`` to it.  The rule looks at all
    earlier members, kept or not (the triangular-max formulation of
    the SemDeDup reference implementation), which makes it
    order-parallel and expressible as a windowed EXISTS in SQL.

    Clusters larger than ``max_cluster`` skip the pair scan and keep
    everything (logged) — the skew cap.
    """
    if centroids is None:
        centroids = kmeans_fit(embeddings, k, iters=iters,
                               id_col=id_col, col=col)
    ref = ray.put(centroids)

    def tag(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        m = _batch_matrix(batch, col)
        cid = _assign(m, c)
        mn = np.linalg.norm(m, axis=1)
        mn[mn == 0] = 1.0
        cn = np.linalg.norm(c, axis=1)
        cn[cn == 0] = 1.0
        cosc = np.round(
            np.einsum("ij,ij->i", m / mn[:, None], (c / cn[:, None])[cid]), 6)
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            "cluster_id": pa.array(cid, type=pa.int64()),
            "cos_c6": pa.array(cosc, type=pa.float64()),
            col: batch.column(col),
            "pkey": pa.array(mix_to_partition(cid, num_partitions),
                             type=pa.int32()),
        })

    def dedup_partition(group: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], type=pa.int64()),
                          "cluster_id": pa.array([], type=pa.int64()),
                          "cos_c6": pa.array([], type=pa.float64()),
                          "keep": pa.array([], type=pa.bool_())})
        if group.num_rows == 0:
            return empty
        ids = np.asarray(group.column(id_col), dtype=np.int64)
        cid = np.asarray(group.column("cluster_id"), dtype=np.int64)
        cosc = np.asarray(group.column("cos_c6"), dtype=np.float64)
        m = _batch_matrix(group, col)
        mn = np.linalg.norm(m, axis=1, keepdims=True)
        mn[mn == 0] = 1.0
        m = m / mn
        # priority order inside each cluster: (cos_c6 desc, id asc)
        order = np.lexsort((ids, -cosc, cid))
        ids, cid, cosc, m = ids[order], cid[order], cosc[order], m[order]
        first = np.empty(len(cid), dtype=bool)
        first[0] = True
        first[1:] = cid[1:] != cid[:-1]
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, len(cid)))
        keep = np.ones(len(cid), dtype=bool)
        skipped = 0
        for st, c in zip(starts, counts):
            if c <= 1:
                continue
            if c > max_cluster:
                skipped += 1
                continue
            sub = m[st:st + c]
            cos = np.round(sub @ sub.T, 3)
            # dropped iff any strictly-earlier member is >= threshold
            hit = np.triu(cos >= threshold, 1)
            keep[st:st + c] = ~hit.any(axis=0)
        if skipped:
            log.warning("semdedup: %d clusters over max_cluster=%d kept "
                        "whole (pair scan skipped)", skipped, max_cluster)
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            "cluster_id": pa.array(cid, type=pa.int64()),
            "cos_c6": pa.array(cosc, type=pa.float64()),
            "keep": pa.array(keep, type=pa.bool_()),
        })

    return embeddings.map_batches(tag, batch_format="pyarrow") \
        .groupby("pkey").map_groups(dedup_partition, batch_format="pyarrow")


def semdedup_sql(k: int = 8, iters: int = 2, dim: int = 64,
                 threshold: float = 0.3, table: str = "embeddings",
                 id_col: str = "vec_id", col: str = "embedding") -> str:
    """DuckDB SQL reproducing :func:`semdedup` value-for-value — the
    generated oracle for the driver contract.  Mirrors each stage:
    md5-ranked init, ``iters`` Lloyd rounds (round-6 centroids,
    assignment by round-6 cosine with lowest-cid tie-break, empty
    clusters keep the previous centroid), and the windowed-EXISTS
    triangular drop rule at round-3 cosine."""
    mask = "CAST(9223372036854775807 AS UBIGINT)"
    rank = ("md5_number_lower(CAST(%s AS VARCHAR)) & %s" % (id_col, mask))
    sql = [
        "WITH emb AS (SELECT %s AS vec_id, CAST(%s AS DOUBLE[]) AS e "
        "FROM %s)," % (id_col, col, table),
        "c0 AS (SELECT CAST(rn - 1 AS BIGINT) AS cid,"
        " list_transform(e, x -> round(x, 6)) AS c"
        " FROM (SELECT e, row_number() OVER (ORDER BY %s, %s) AS rn"
        " FROM emb) WHERE rn <= %d)," % (rank, id_col, k),
    ]
    prev = "c0"
    for i in range(1, iters + 1):
        sql.append(
            "a%d AS (SELECT vec_id, e, cid FROM ("
            "SELECT emb.vec_id, emb.e, p.cid,"
            " row_number() OVER (PARTITION BY emb.vec_id ORDER BY"
            " round(list_cosine_similarity(emb.e, p.c), 6) DESC, p.cid)"
            " AS rn FROM emb CROSS JOIN %s p) WHERE rn = 1)," % (i, prev))
        sql.append(
            "c%d AS (SELECT p.cid, COALESCE(n.c, p.c) AS c FROM %s p"
            " LEFT JOIN (SELECT cid, list(v ORDER BY di) AS c FROM"
            " (SELECT cid, t.i AS di, round(avg(e[t.i]), 6) AS v"
            " FROM a%d, range(1, %d) AS t(i) GROUP BY cid, t.i)"
            " GROUP BY cid) n ON p.cid = n.cid)," % (i, prev, i, dim + 1))
        prev = "c%d" % i
    sql.append(
        "asg AS (SELECT vec_id, e, cid, cosr FROM ("
        "SELECT emb.vec_id, emb.e, p.cid,"
        " round(list_cosine_similarity(emb.e, p.c), 6) AS cosr,"
        " row_number() OVER (PARTITION BY emb.vec_id ORDER BY"
        " round(list_cosine_similarity(emb.e, p.c), 6) DESC, p.cid) AS rn"
        " FROM emb CROSS JOIN %s p) WHERE rn = 1)" % prev)
    sql.append(
        "SELECT a.vec_id, a.cid AS cluster_id, a.cosr AS cos_c6,"
        " NOT EXISTS (SELECT 1 FROM asg b WHERE b.cid = a.cid"
        " AND (b.cosr > a.cosr OR (b.cosr = a.cosr AND b.vec_id < a.vec_id))"
        " AND round(list_cosine_similarity(a.e, b.e), 3) >= %s) AS keep"
        " FROM asg a" % repr(threshold))
    return "\n".join(sql)
