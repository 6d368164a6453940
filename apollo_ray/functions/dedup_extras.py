"""Dedup operator family over a ``documents``-shaped table:

- exact dedup by content hash (D2),
- per-doc distinct k-shingle counts (the bag cardinalities of M3),
- n-gram Jaccard candidate pairs (shingle-inverted-index join),
- SimHash near-dup candidate pairs (band rotation).

Each is a standalone ``queries()`` entry; the MinHash+LSH family is the
flagship pipeline in ``apollo_ray.pipelines.dedup``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from apollo_ray.hashing import (TokenHasher, distinct_pair_idx,
                                hash_utf8, mix_to_partition,
                                pair_mix)


def add_text_hash(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    def f(batch: pa.Table) -> pa.Table:
        from apollo_ray.hashing import hash_utf8_batch
        th = hash_utf8_batch(batch.column("text"))
        return pa.table({"doc_id": batch.column("doc_id").cast(pa.int64()),
                         "text_hash": pa.array(th, type=pa.int64())})
    return docs.map_batches(f, batch_format="pyarrow")


def exact_dedup_groups(docs: "ray.data.Dataset",
                       num_partitions: int = 64) -> "ray.data.Dataset":
    """(rep_id, n_members) per distinct text — group by content hash,
    keep the min doc_id (D2 semantics, ``apollo/bags.py:15``).

    Vectorized pkey grouping (one np.lexsort per partition) instead of
    ``groupby().aggregate()`` — Ray's sort-based aggregate pays
    per-group overhead, fatal at one-group-per-distinct-text scale."""
    hashed = add_text_hash(docs)

    def add_pkey(batch: pa.Table) -> pa.Table:
        th = np.asarray(batch.column("text_hash"), dtype=np.int64)
        return batch.append_column(
            "pkey", pa.array(mix_to_partition(th, num_partitions),
                             type=pa.int32()))

    def reduce_part(group: pa.Table) -> pa.Table:
        th = np.asarray(group.column("text_hash"), dtype=np.int64)
        d = np.asarray(group.column("doc_id"), dtype=np.int64)
        if len(th) == 0:
            return pa.table({"rep_id": pa.array([], type=pa.int64()),
                             "n_members": pa.array([], type=pa.int64())})
        order = np.lexsort((d, th))
        th_s, d_s = th[order], d[order]
        first = np.empty(len(th_s), dtype=bool)
        first[0] = True
        first[1:] = th_s[1:] != th_s[:-1]
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, len(th_s)))
        return pa.table({"rep_id": pa.array(d_s[first], type=pa.int64()),
                         "n_members": pa.array(counts, type=pa.int64())})

    return hashed.map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(reduce_part, batch_format="pyarrow")


def shingle_counts(docs: "ray.data.Dataset", k: int = 3,
                   seed: int = 42) -> "ray.data.Dataset":
    """(doc_id, n_shingles) — distinct k-shingles per doc, 64-bit
    shingle hashes (full width, pre-feature-hashing, so counts equal
    string-distinct counts).  Docs with < k tokens count 0 (the SQL
    oracle contract).  Whole-batch vectorized (the same recurrence as
    :func:`_explode_shingles`)."""
    def f(batch: pa.Table) -> pa.Table:
        from apollo_ray.hashing import _MASK64, splitmix64
        from apollo_ray.kernels.text import batch_token_hashes
        hasher = TokenHasher(seed=seed)
        n_rows = batch.num_rows
        zero = pa.table({"doc_id": batch.column("doc_id").cast(pa.int64()),
                         "n_shingles": pa.array(np.zeros(n_rows,
                                                         dtype=np.int64))})
        if n_rows == 0:
            return zero
        th_flat, offs = batch_token_hashes(batch.column("text"), hasher)
        lens = np.diff(offs)
        flat_n = len(th_flat)
        if flat_n < k:
            return zero
        m = flat_n - k + 1
        acc = np.zeros(m, dtype=np.uint64)
        for j in range(k):
            mult = splitmix64(np.array([j + 1], dtype=np.uint64))[0] \
                | np.uint64(1)
            acc = (acc + th_flat[j:j + m] * mult) & _MASK64
            acc = splitmix64(acc)
        pos_doc = np.repeat(np.arange(n_rows, dtype=np.int64), lens)[:m]
        valid = (np.arange(m, dtype=np.int64) + k - 1) < offs[pos_doc + 1]
        sh, d_of = acc[valid], pos_doc[valid]
        counts = np.zeros(n_rows, dtype=np.int64)
        if len(sh):
            order = np.lexsort((sh, d_of))
            sh_s, d_s = sh[order], d_of[order]
            first = np.empty(len(sh_s), dtype=bool)
            first[0] = True
            first[1:] = (d_s[1:] != d_s[:-1]) | (sh_s[1:] != sh_s[:-1])
            counts = np.bincount(d_s[first], minlength=n_rows)
        return pa.table({"doc_id": batch.column("doc_id").cast(pa.int64()),
                         "n_shingles": pa.array(counts.astype(np.int64))})
    return docs.map_batches(f, batch_format="pyarrow")


_EXPLODE_EMPTY = pa.table({"shingle": pa.array([], type=pa.int64()),
                           "doc_id": pa.array([], type=pa.int64()),
                           "n_sh": pa.array([], type=pa.int64())})


def _explode_shingles(batch: pa.Table, k: int, seed: int) -> pa.Table:
    """Rows (shingle, doc_id, n_sh) — the doc's distinct-shingle count
    rides along on every row, so downstream Jaccard needs NO join back
    to a per-doc sizes table (8 extra bytes/row buys two hash joins).

    Whole-batch vectorized (the fused-bags recurrence): one k-step
    numpy pass shingles the batch's flat token-hash stream, boundary-
    crossing windows are masked, and per-doc dedup is one lexsort —
    elementwise identical to the per-doc path (parity-pinned by
    ``test_explode_shingles_batch_parity``).  Docs with fewer than k
    tokens are dropped (they have no k-shingles; same contract as the
    SQL oracles)."""
    from apollo_ray.hashing import _MASK64, splitmix64
    from apollo_ray.kernels.text import batch_token_hashes
    hasher = TokenHasher(seed=seed)
    if batch.num_rows == 0:
        return _EXPLODE_EMPTY
    th_flat, offs = batch_token_hashes(batch.column("text"), hasher)
    doc_ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
    n_docs = len(offs) - 1
    lens = np.diff(offs)
    flat_n = len(th_flat)
    if flat_n < k:
        return _EXPLODE_EMPTY
    m = flat_n - k + 1
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        mult = splitmix64(np.array([j + 1], dtype=np.uint64))[0] \
            | np.uint64(1)
        acc = (acc + th_flat[j:j + m] * mult) & _MASK64
        acc = splitmix64(acc)
    pos_doc = np.repeat(np.arange(n_docs, dtype=np.int64), lens)[:m]
    valid = (np.arange(m, dtype=np.int64) + k - 1) < offs[pos_doc + 1]
    sh = acc[valid]
    d_of = pos_doc[valid]
    if len(sh) == 0:
        return _EXPLODE_EMPTY
    order = np.lexsort((sh, d_of))
    sh_s, d_s = sh[order], d_of[order]
    first = np.empty(len(sh_s), dtype=bool)
    first[0] = True
    first[1:] = (d_s[1:] != d_s[:-1]) | (sh_s[1:] != sh_s[:-1])
    sh_u, d_u = sh_s[first], d_s[first]
    n_sh = np.bincount(d_u, minlength=n_docs)[d_u]
    return pa.table({
        "shingle": pa.array(sh_u.astype(np.int64) >> 1, type=pa.int64()),
        "doc_id": pa.array(doc_ids[d_u], type=pa.int64()),
        "n_sh": pa.array(n_sh.astype(np.int64), type=pa.int64())})


def _explode_shingles_per_doc(batch: pa.Table, k: int,
                              seed: int) -> pa.Table:
    """Per-doc reference implementation of :func:`_explode_shingles`,
    kept for the parity test."""
    from apollo_ray.hashing import shingle_hashes
    hasher = TokenHasher(seed=seed)
    doc_out: list[np.ndarray] = []
    sh_out: list[np.ndarray] = []
    n_out: list[np.ndarray] = []
    for did, t in zip(batch.column("doc_id").to_pylist(),
                      batch.column("text").to_pylist()):
        toks = t.split()
        if len(toks) < k:
            continue
        h = np.unique(shingle_hashes(hasher.hash_tokens(toks), k))
        sh_out.append(h.astype(np.int64) >> 1)
        doc_out.append(np.full(len(h), did, dtype=np.int64))
        n_out.append(np.full(len(h), len(h), dtype=np.int64))
    if not doc_out:
        return _EXPLODE_EMPTY
    return pa.table({"shingle": pa.array(np.concatenate(sh_out), type=pa.int64()),
                     "doc_id": pa.array(np.concatenate(doc_out), type=pa.int64()),
                     "n_sh": pa.array(np.concatenate(n_out), type=pa.int64())})


_NOVELTY_EMPTY = pa.table({
    "doc_id": pa.array([], type=pa.int64()),
    "n_sh_part": pa.array([], type=pa.int64()),
    "n_uni_part": pa.array([], type=pa.int64()),
    "dkey": pa.array([], type=pa.int32())})


def shingle_novelty(docs: "ray.data.Dataset", k: int = 3, seed: int = 42,
                    num_partitions: int = 64) -> "ray.data.Dataset":
    """(doc_id, n_shingles, n_unique, novelty_ppm) — per-doc novelty:
    the fraction of the doc's DISTINCT k-shingles that occur in NO
    other document (corpus document-frequency 1), in integer ppm
    (round-half-up).  A document-fingerprinting curation signal: low
    novelty flags boilerplate/templated pages that near-dedup's
    threshold may still keep; high novelty marks content worth
    protecting from aggressive filtering.

    Scale shape: two metadata exchanges, the payload never moves.
    (1) per-doc-distinct (shingle, doc_id) rows partition by shingle
    hash — each shingle lands whole in one partition, so its corpus
    df is complete there and the partition folds to per-(partition,
    doc) partial sums (<= n_docs x num_partitions rows); (2) the
    partials union a zero row per doc (docs with < k tokens must
    still report 0) and fold per doc.  Both sides of the ppm are
    integer arithmetic so the DuckDB oracle is value-exact."""
    def pairs(batch: pa.Table) -> pa.Table:
        t = _explode_shingles(batch, k, seed)
        sh = np.asarray(t.column("shingle"), dtype=np.int64)
        return pa.table({
            "shingle": t.column("shingle"),
            "doc_id": t.column("doc_id"),
            "pkey": pa.array(mix_to_partition(sh, num_partitions),
                             type=pa.int32())})

    def per_shingle_part(group: pa.Table) -> pa.Table:
        sh = np.asarray(group.column("shingle"), dtype=np.int64)
        d = np.asarray(group.column("doc_id"), dtype=np.int64)
        if len(sh) == 0:
            return _NOVELTY_EMPTY
        order = np.lexsort((d, sh))
        sh_s, d_s = sh[order], d[order]
        first = np.empty(len(sh_s), dtype=bool)
        first[0] = True
        first[1:] = sh_s[1:] != sh_s[:-1]
        starts = np.flatnonzero(first)
        df = np.repeat(np.diff(np.append(starts, len(sh_s))),
                       np.diff(np.append(starts, len(sh_s))))
        docs_u, inv = np.unique(d_s, return_inverse=True)
        n_pairs = np.bincount(inv).astype(np.int64)
        n_unique = np.bincount(inv, weights=(df == 1)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(docs_u, type=pa.int64()),
            "n_sh_part": pa.array(n_pairs, type=pa.int64()),
            "n_uni_part": pa.array(n_unique, type=pa.int64()),
            "dkey": pa.array(mix_to_partition(docs_u, num_partitions),
                             type=pa.int32())})

    def doc_zero(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch.column("doc_id"), dtype=np.int64)
        z = np.zeros(len(d), dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(d, type=pa.int64()),
            "n_sh_part": pa.array(z), "n_uni_part": pa.array(z),
            "dkey": pa.array(mix_to_partition(d, num_partitions),
                             type=pa.int32())})

    def fold(group: pa.Table) -> pa.Table:
        d = np.asarray(group.column("doc_id"), dtype=np.int64)
        if len(d) == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "n_shingles": pa.array([], type=pa.int64()),
                             "n_unique": pa.array([], type=pa.int64()),
                             "novelty_ppm": pa.array([], type=pa.int64())})
        docs_u, inv = np.unique(d, return_inverse=True)
        ns = np.bincount(inv, weights=np.asarray(
            group.column("n_sh_part"), dtype=np.int64)).astype(np.int64)
        nu = np.bincount(inv, weights=np.asarray(
            group.column("n_uni_part"), dtype=np.int64)).astype(np.int64)
        ppm = np.zeros(len(ns), dtype=np.int64)
        nz = ns > 0
        # round-half-up in pure integers: floor((2e6*nu + ns) / (2*ns))
        ppm[nz] = (2_000_000 * nu[nz] + ns[nz]) // (2 * ns[nz])
        return pa.table({"doc_id": pa.array(docs_u, type=pa.int64()),
                         "n_shingles": pa.array(ns),
                         "n_unique": pa.array(nu),
                         "novelty_ppm": pa.array(ppm)})

    partials = docs.map_batches(pairs, batch_format="pyarrow") \
        .groupby("pkey").map_groups(per_shingle_part,
                                    batch_format="pyarrow")
    base = docs.select_columns(["doc_id"]).map_batches(
        doc_zero, batch_format="pyarrow")
    return partials.union(base) \
        .groupby("dkey").map_groups(fold, batch_format="pyarrow")


def shingle_novelty_sql(k: int = 3, table: str = "documents") -> str:
    """DuckDB oracle for :func:`shingle_novelty` — same whitespace
    tokenization / k-window construction as the ``shingle_counts``
    oracle, string-distinct df standing in for the engine's 64-bit
    hash-distinct (collision-free at test scale), integer-exact ppm."""
    return f"""
        WITH tok AS (
          SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\\s+')
                 END AS toks
          FROM {table}),
        sh AS (
          SELECT DISTINCT doc_id,
                 array_to_string(toks[i:i+{k - 1}], ' ') AS s
          FROM tok,
               LATERAL (SELECT unnest(range(1,
                 greatest(len(toks) - {k - 1}, 0) + 1)) AS i)),
        df AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
        agg AS (
          SELECT sh.doc_id, count(*) AS ns,
                 sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS nu
          FROM sh JOIN df USING (s) GROUP BY sh.doc_id)
        SELECT t.doc_id,
               CAST(coalesce(a.ns, 0) AS BIGINT) AS n_shingles,
               CAST(coalesce(a.nu, 0) AS BIGINT) AS n_unique,
               CAST(CASE WHEN coalesce(a.ns, 0) = 0 THEN 0
                    ELSE (2000000 * a.nu + a.ns) // (2 * a.ns)
               END AS BIGINT) AS novelty_ppm
        FROM tok t LEFT JOIN agg a ON a.doc_id = t.doc_id
    """


def ngram_jaccard_pairs(docs: "ray.data.Dataset", k: int = 3,
                        threshold: float = 0.5, seed: int = 42,
                        num_partitions: int | None = None,
                        max_posting: int = 10_000) -> "ray.data.Dataset":
    """(u, v) doc pairs with k-shingle set Jaccard >= threshold.

    Inverted-index join: explode per-doc-distinct shingles, partition
    by shingle hash, emit co-occurring pairs per partition
    (vectorized), count shared shingles per pair, then filter by
    |A∩B| / (|A| + |B| - |A∩B|).  Doc sizes are attached by a hash
    join — no broadcast, scales with the corpus.

    Skew cap: a shingle shared by more than ``max_posting`` docs emits
    no pairs (quadratic blowup; such shingles are stopword-like and
    contribute almost nothing to Jaccard >= 0.5 decisions).  The cap
    never fires at oracle-comparison scale.
    """
    if num_partitions is None:
        num_partitions = 32
    shingles = docs.map_batches(_explode_shingles, batch_format="pyarrow",
                                fn_kwargs={"k": k, "seed": seed})

    def add_pkey(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("shingle"), dtype=np.int64)
        return batch.append_column(
            "pkey", pa.array(mix_to_partition(s, num_partitions), type=pa.int32()))

    def emit_pairs(group: pa.Table) -> pa.Table:
        s = np.asarray(group.column("shingle"), dtype=np.int64)
        d = np.asarray(group.column("doc_id"), dtype=np.int64)
        nsh = np.asarray(group.column("n_sh"), dtype=np.int64)
        order = np.lexsort((d, s))
        s_s, d_s, n_s = s[order], d[order], nsh[order]
        empty = pa.table({"u": pa.array([], type=pa.int64()),
                          "v": pa.array([], type=pa.int64()),
                          "n_u": pa.array([], type=pa.int64()),
                          "n_v": pa.array([], type=pa.int64())})
        if len(s_s) == 0:
            return empty
        new_seg = np.empty(len(s_s), dtype=bool)
        new_seg[0] = True
        new_seg[1:] = s_s[1:] != s_s[:-1]
        starts = np.flatnonzero(new_seg)
        counts = np.diff(np.append(starts, len(s_s)))
        us, vs, nus, nvs = [], [], [], []
        # size-2 posting lists dominate; emit them in one vectorized shot
        m2 = counts == 2
        if m2.any():
            s2 = starts[m2]
            us.append(d_s[s2]); vs.append(d_s[s2 + 1])
            nus.append(n_s[s2]); nvs.append(n_s[s2 + 1])
        for st, c in zip(starts[counts > 2], counts[counts > 2]):
            if c > max_posting:
                continue
            iu, iv = np.triu_indices(c, k=1)
            us.append(d_s[st:st + c][iu]); vs.append(d_s[st:st + c][iv])
            nus.append(n_s[st:st + c][iu]); nvs.append(n_s[st:st + c][iv])
        if not us:
            return empty
        u = np.concatenate(us); v = np.concatenate(vs)
        nu = np.concatenate(nus); nv = np.concatenate(nvs)
        swap = u > v
        u2 = np.where(swap, v, u); v2 = np.where(swap, u, v)
        nu2 = np.where(swap, nv, nu); nv2 = np.where(swap, nu, nv)
        return pa.table({"u": pa.array(u2, type=pa.int64()),
                         "v": pa.array(v2, type=pa.int64()),
                         "n_u": pa.array(nu2, type=pa.int64()),
                         "n_v": pa.array(nv2, type=pa.int64())})

    pairs = shingles.map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(emit_pairs, batch_format="pyarrow")

    # count shared shingles per (u, v) with the same pkey trick —
    # Ray's sort-based multi-key groupby().aggregate() is orders of
    # magnitude slower than one vectorized np.unique per partition
    def add_pair_pkey(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch.column("u"), dtype=np.int64)
        v = np.asarray(batch.column("v"), dtype=np.int64)
        key = pair_mix(u, v).astype(np.int64) >> 1
        return batch.append_column(
            "pkey", pa.array(mix_to_partition(key, num_partitions),
                             type=pa.int32()))

    def count_and_filter(group: pa.Table) -> pa.Table:
        u = np.asarray(group.column("u"), dtype=np.int64)
        v = np.asarray(group.column("v"), dtype=np.int64)
        nu = np.asarray(group.column("n_u"), dtype=np.int64)
        nv = np.asarray(group.column("n_v"), dtype=np.int64)
        if len(u) == 0:
            return pa.table({"u": pa.array([], type=pa.int64()),
                             "v": pa.array([], type=pa.int64())})
        key = pair_mix(u, v)
        uniq, first, c = np.unique(key, return_index=True,
                                   return_counts=True)
        fu, fv = u[first], v[first]
        fnu, fnv = nu[first].astype(np.float64), nv[first].astype(np.float64)
        keep = c / (fnu + fnv - c) >= threshold
        return pa.table({"u": pa.array(fu[keep], type=pa.int64()),
                         "v": pa.array(fv[keep], type=pa.int64())})

    return pairs.map_batches(add_pair_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(count_and_filter, batch_format="pyarrow")


def _batch_minhash_sigs(batch: pa.Table, k: int, params: dict
                        ) -> tuple:
    """Per-batch unweighted-MinHash workhorse shared by
    :func:`minhash_signatures` (flat rows) and
    :func:`minhash_lsh_clusters` (band rows): distinct k-shingle
    strings -> md5 lower-32 values -> ``minhash_batch``.

    Returns ``(ids, sigs)`` — ``ids`` int64 array of doc_ids with
    >= k tokens, ``sigs`` the (len(ids), n_perm) uint64 signature
    matrix — or ``(None, None)`` when no doc in the batch qualifies.
    """
    from apollo_ray.kernels.minhash import minhash_batch
    from apollo_ray.kernels.text import _md5_u64
    a, b = params["a"], params["b"]
    memo: dict = {}
    ids: list[int] = []
    sets: list[np.ndarray] = []
    for did, t in zip(batch.column("doc_id").to_pylist(),
                      batch.column("text").to_pylist()):
        toks = t.split()
        if len(toks) < k:
            continue
        shingles = {" ".join(toks[i:i + k])
                    for i in range(len(toks) - k + 1)}
        vals = []
        for s in shingles:
            v = memo.get(s)
            if v is None:
                v = _md5_u64(s) & 0xFFFFFFFF
                memo[s] = v
            vals.append(v)
        ids.append(did)
        sets.append(np.unique(np.asarray(vals, dtype=np.uint64)))
    if not ids:
        return None, None
    indptr = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in sets], out=indptr[1:])
    sigs = minhash_batch(indptr, np.concatenate(sets), a, b)
    return np.asarray(ids, dtype=np.int64), sigs


def minhash_signatures(docs: "ray.data.Dataset", k: int = 3,
                       n_perm: int = 16, seed: int = 42
                       ) -> "ray.data.Dataset":
    """(doc_id, j, sig) — classic unweighted k-permutation MinHash
    signatures over the doc's DISTINCT k-shingle strings, md5-hashed
    to 32 bits (DuckDB ``md5_number_lower % 2**32`` semantics), then
    permuted with the seeded coefficients of
    ``kernels.minhash.generate_minhash_params`` (the same model the
    ``minhash_mode="unweighted"`` pipeline regenerates per worker).

    Everything is exact uint64 arithmetic, so the full signature table
    is value-reproducible in SQL — the driver hash-checks all
    ``n_docs_with_shingles * n_perm`` rows.  Docs with < k tokens have
    no shingles and emit no rows (mirrors the oracle).  Map-only
    stage: streams at any corpus size.
    """
    from apollo_ray.kernels.minhash import generate_minhash_params
    params = generate_minhash_params(n_perm, seed)

    def f(batch: pa.Table) -> pa.Table:
        ids, sigs = _batch_minhash_sigs(batch, k, params)
        if ids is None:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "j": pa.array([], type=pa.int64()),
                             "sig": pa.array([], type=pa.int64())})
        n = len(ids)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, n_perm), type=pa.int64()),
            "j": pa.array(np.tile(np.arange(n_perm, dtype=np.int64), n),
                          type=pa.int64()),
            "sig": pa.array(sigs.astype(np.int64).ravel(), type=pa.int64()),
        })

    return docs.map_batches(f, batch_format="pyarrow")


def _minhash_sig_ctes(k: int, n_perm: int, seed: int) -> str:
    """Shared WITH-body prefix ending in a ``sig(doc_id, j, sig)``
    CTE — the SQL twin of :func:`_batch_minhash_sigs`, generated from
    the kernel's own seeded coefficients (single source of truth).
    Used by both :func:`minhash_signatures_sql` and
    :func:`minhash_lsh_clusters_sql`."""
    from apollo_ray.kernels.minhash import P_MINHASH, generate_minhash_params
    params = generate_minhash_params(n_perm, seed)
    values = ", ".join("(%d, %d::UBIGINT, %d::UBIGINT)" % (j, a, b)
                       for j, (a, b) in enumerate(zip(params["a"],
                                                      params["b"])))
    return r"""par(j, a, b) AS (VALUES %s),
            tok AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
              FROM documents WHERE length(trim(text)) > 0),
            sh AS (
              SELECT DISTINCT doc_id,
                     md5_number_lower(array_to_string(toks[i:i+%d], ' '))
                       %% 4294967296::UBIGINT AS u
              FROM tok,
                   LATERAL (SELECT unnest(range(1, greatest(len(toks) - %d, 0) + 1)) AS i)
              WHERE len(toks) >= %d),
            sig AS (
              SELECT doc_id, j,
                     CAST(min((u * a + b) %% %d::UBIGINT) AS BIGINT) AS sig
              FROM sh CROSS JOIN par
              GROUP BY doc_id, j)""" % (values, k - 1, k - 1, k, P_MINHASH)


def minhash_signatures_sql(k: int = 3, n_perm: int = 16,
                           seed: int = 42) -> str:
    """DuckDB oracle for :func:`minhash_signatures`."""
    return "WITH %s SELECT doc_id, j, sig FROM sig" % (
        _minhash_sig_ctes(k, n_perm, seed),)


def minhash_lsh_clusters(docs: "ray.data.Dataset", k: int = 3,
                         n_perm: int = 16, band_r: int = 4,
                         seed: int = 42, num_partitions: int = 64,
                         label_broadcast_max: int = 5_000_000,
                         method: str = "auto") -> "ray.data.Dataset":
    """(doc_id, cluster_id) — the COMPLETE unweighted MinHash-LSH
    dedup chain, end-to-end value-exact against SQL: signatures
    (:func:`_batch_minhash_sigs`) -> band rows (``n_perm / band_r``
    bands of ``band_r`` consecutive samples) -> bucket formation on
    the EXACT signature tuple -> star edges to each bucket's minimum
    member -> connected components -> ``cluster_id`` = the minimum
    doc_id of the component (docs with < k tokens, or with no
    co-bucketed partner, are their own singleton cluster).

    This is the oracle-exact sibling of the flagship WMH pipeline
    (``apollo_ray.pipelines.dedup``): same bucket/star/CC topology,
    but classic Broder MinHash whose integer arithmetic DuckDB can
    reproduce bit-for-bit, so the driver hash-checks the FULL cluster
    assignment — not just invariants (cf. ``minhash_dedup_invariants``).

    Scale notes: the band exchange is keyed by a 64-bit mix of the
    band's signature tuple (collisions only co-locate — bucket
    equality inside each partition is on the exact tuple via lexsort
    run detection, never the hash).  Star edges keep |E| linear in
    bucket mass; CC reuses ``stages.cc_stage.connected_components``
    (driver union-find below ``DRIVER_CC_MAX_EDGES``, alternating
    large/small-star rounds above).  Label attach follows the house
    two-path rule: broadcast the (node -> root) table below
    ``label_broadcast_max`` labels, pkey hash join above
    (``method="hashjoin"`` forces it; tests pin both paths equal).
    """
    from apollo_ray.kernels.minhash import generate_minhash_params
    from apollo_ray.stages.cc_stage import connected_components
    if n_perm % band_r != 0:
        raise ValueError("band_r must divide n_perm")
    n_bands = n_perm // band_r
    params = generate_minhash_params(n_perm, seed)
    sig_cols = ["s%d" % i for i in range(band_r)]
    key_cols = ["band"] + sig_cols

    def emit_bands(batch: pa.Table) -> pa.Table:
        ids, sigs = _batch_minhash_sigs(batch, k, params)
        if ids is None:
            cols = {"doc_id": pa.array([], type=pa.int64()),
                    "band": pa.array([], type=pa.int32())}
            for c in sig_cols:
                cols[c] = pa.array([], type=pa.int64())
            cols["pkey"] = pa.array([], type=pa.int32())
            return pa.table(cols)
        n = len(ids)
        parts = []
        for b in range(n_bands):
            cols = {"doc_id": pa.array(ids, type=pa.int64()),
                    "band": pa.array(np.full(n, b, dtype=np.int32),
                                     type=pa.int32())}
            mix = np.full(n, b, dtype=np.uint64)
            for i, c in enumerate(sig_cols):
                s = sigs[:, b * band_r + i]
                cols[c] = pa.array(s.astype(np.int64), type=pa.int64())
                mix = pair_mix(mix, s)
            cols["pkey"] = pa.array(
                mix_to_partition(mix, num_partitions), type=pa.int32())
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    def emit_star_edges(group: pa.Table) -> pa.Table:
        keys = [group.column(c).to_numpy() for c in key_cols]
        doc = group.column("doc_id").to_numpy()
        order = np.lexsort(tuple(reversed(keys)))
        ks = [a[order] for a in keys]
        ds = doc[order]
        new = np.zeros(len(ds), dtype=bool)
        new[0] = True
        for a in ks:
            new[1:] |= a[1:] != a[:-1]
        starts = np.flatnonzero(new)
        hubs = np.minimum.reduceat(ds, starts)
        lens = np.diff(np.append(starts, len(ds)))
        hub_per_row = np.repeat(hubs, lens)
        mask = ds != hub_per_row
        return pa.table({"u": pa.array(ds[mask], type=pa.int64()),
                         "v": pa.array(hub_per_row[mask], type=pa.int64())})

    bands = docs.map_batches(emit_bands, batch_format="pyarrow")
    edges = bands.groupby("pkey").map_groups(emit_star_edges,
                                             batch_format="pyarrow")
    # cc_stage emits star edges (u=node, v=cc_root)
    cc = connected_components(edges, num_partitions=num_partitions) \
        .map_batches(lambda t: t.rename_columns(["node", "cc_root"]),
                     batch_format="pyarrow")
    ids_only = docs.select_columns(["doc_id"])

    # n_labels is only consulted on the broadcast/auto branch; forcing
    # method="hashjoin" must not pay an extra execution of the CC
    # pipeline just to count a number it never reads
    n_labels = cc.count() if method != "hashjoin" else None
    if method == "broadcast" or (method == "auto"
                                 and n_labels <= label_broadcast_max):
        if n_labels > label_broadcast_max:
            raise ValueError(
                "label table (%d rows) exceeds label_broadcast_max=%d; "
                "use method='hashjoin'" % (n_labels, label_broadcast_max))
        if n_labels == 0:
            nodes = np.array([], dtype=np.int64)
            roots = np.array([], dtype=np.int64)
        else:
            ldf = cc.to_pandas()
            nodes = ldf["node"].to_numpy(dtype=np.int64)
            roots = ldf["cc_root"].to_numpy(dtype=np.int64)
            order = np.argsort(nodes, kind="mergesort")
            nodes, roots = nodes[order], roots[order]
        ref = ray.put((nodes, roots))

        def attach(batch: pa.Table) -> pa.Table:
            nd, rt = ray.get(ref)
            d = batch.column("doc_id").to_numpy().astype(np.int64)
            lab = d.copy()
            if len(nd):
                pos = np.searchsorted(nd, d)
                pos[pos >= len(nd)] = 0
                hit = nd[pos] == d
                lab[hit] = rt[pos[hit]]
            return pa.table({"doc_id": pa.array(d, type=pa.int64()),
                             "cluster_id": pa.array(lab, type=pa.int64())})

        return ids_only.map_batches(attach, batch_format="pyarrow")

    from apollo_ray.util import hash_join
    joined = hash_join(ids_only, cc, on=("doc_id",), right_on=("node",),
                       join_type="left_outer",
                       num_partitions=num_partitions)

    def coalesce(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        d = batch.column("doc_id")
        r = batch.column("cc_root")
        return pa.table({"doc_id": d.cast(pa.int64()),
                         "cluster_id": pc.coalesce(
                             r.cast(pa.int64()), d.cast(pa.int64()))})

    return joined.map_batches(coalesce, batch_format="pyarrow")


def minhash_lsh_clusters_sql(k: int = 3, n_perm: int = 16,
                             band_r: int = 4, seed: int = 42,
                             iters: int = 10) -> str:
    """DuckDB oracle for :func:`minhash_lsh_clusters`: the shared
    signature CTEs, band tuples via ``string_agg`` ordered by sample
    index (grouping on the exact tuple, like the engine's lexsort),
    star edges to each bucket's ``min(doc_id)``, then ``iters``
    unrolled rounds of min-label propagation WITH pointer jumping
    (Shiloach-Vishkin style, the same recurrence as
    ``cc_stage._driver_union_find``) — each round takes the min over
    {self, neighbors' labels, label-of-label}, so the converged
    horizon at least doubles per round and ``iters=10`` covers any
    component of diameter < 2**10.  tests/test_minhash_clusters.py
    property-tests the recurrence against union-find on random graphs
    and chains.
    """
    # Every multiply-referenced CTE is MATERIALIZED: DuckDB 1.0
    # inlines plain CTEs, and each unrolled round references the
    # previous labels three times — un-materialized, the expansion is
    # 3**iters copies of the whole signature pipeline (measured: fd
    # exhaustion on parquet views, hour-long plans on registered
    # tables).  Materialized, the chain is linear in ``iters``.
    body = _minhash_sig_ctes(k, n_perm, seed)
    parts = [body, """
            bnd AS MATERIALIZED (
              SELECT doc_id, j // %d AS band,
                     string_agg(CAST(sig AS VARCHAR), ',' ORDER BY j) AS key
              FROM sig GROUP BY doc_id, j // %d),
            bkt AS MATERIALIZED (
              SELECT band, key, min(doc_id) AS hub, count(*) AS n
              FROM bnd GROUP BY band, key),
            edge AS MATERIALIZED (
              SELECT DISTINCT b.doc_id AS u, t.hub AS v
              FROM bnd b JOIN bkt t ON b.band = t.band AND b.key = t.key
              WHERE t.n >= 2 AND b.doc_id <> t.hub),
            sym AS MATERIALIZED (
              SELECT u, v FROM edge UNION SELECT v AS u, u AS v FROM edge),
            l0 AS MATERIALIZED (
              SELECT u AS node, min(least(u, v)) AS comp
              FROM sym GROUP BY u)""" % (band_r, band_r)]
    for i in range(1, iters + 1):
        parts.append("""
            l%d AS MATERIALIZED (
              SELECT n.node,
                     least(n.comp, coalesce(nb.mn, n.comp),
                           coalesce(pj.comp, n.comp)) AS comp
              FROM l%d n
              LEFT JOIN (SELECT s.u AS node, min(p.comp) AS mn
                         FROM sym s JOIN l%d p ON p.node = s.v
                         GROUP BY s.u) nb ON nb.node = n.node
              LEFT JOIN l%d pj ON pj.node = n.comp)""" % (i, i - 1,
                                                          i - 1, i - 1))
    # convergence guard: the unrolled horizon covers diameter < 2**iters;
    # on a (hypothetical) wider component the last round would still be
    # moving labels and the oracle would silently mislabel — make that
    # loud instead: error() unless the final round was a fixpoint.
    # iters=0 has no previous round to compare against (the guard
    # would reference l-1) — emit a constant-true guard there.
    if iters >= 1:
        parts.append("""
            conv AS MATERIALIZED (
              SELECT CASE WHEN (SELECT count(*) FROM l%d a
                                JOIN l%d b ON a.node = b.node
                                WHERE a.comp <> b.comp) = 0
                     THEN 1 ELSE CAST(error(
                       'minhash_lsh_clusters oracle: label propagation '
                       'not converged after %d rounds; raise iters')
                       AS INT) END AS ok)""" % (iters, iters - 1, iters))
    else:
        parts.append("\n            conv AS (SELECT 1 AS ok)")
    return ("WITH %s SELECT d.doc_id, coalesce(l.comp, d.doc_id) AS "
            "cluster_id FROM documents d LEFT JOIN l%d l ON "
            "l.node = d.doc_id CROSS JOIN conv WHERE conv.ok = 1" % (
                ",".join(parts), iters))


def md5_simhash_sig(text: str, k: int = 3,
                    memo: dict | None = None) -> int | None:
    """64-bit unweighted SimHash over the doc's DISTINCT k-shingle
    strings, hashed with md5 (lower-64, DuckDB ``md5_number_lower``
    semantics — see ``kernels.text._md5_u64``): bit j of the signature
    is 1 iff strictly more shingle hashes set bit j than clear it.
    Docs with fewer than k tokens have no signature (None) — mirrors
    the SQL oracle, which emits no shingle rows for them.

    The unweighted+md5 form (vs the weighted TokenHasher variant in
    ``kernels.simhash``, kept for the kernel tests) makes the whole
    operator exactly reproducible in SQL, so the driver can hash-check
    it instead of a rows-only pass.
    """
    from apollo_ray.kernels.text import _md5_u64
    toks = text.split()
    if len(toks) < k:
        return None
    shingles = {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}
    if memo is None:
        hs = np.fromiter((_md5_u64(s) for s in shingles), dtype=np.uint64,
                         count=len(shingles))
    else:
        # near-dup-heavy batches share most shingles; the memo turns
        # repeat md5 calls into dict hits (bounded per batch)
        vals = []
        for s in shingles:
            v = memo.get(s)
            if v is None:
                v = _md5_u64(s)
                memo[s] = v
            vals.append(v)
        hs = np.asarray(vals, dtype=np.uint64)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) &
            np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    sig = np.uint64(0)
    for j in np.flatnonzero(votes > 0):
        sig |= np.uint64(1) << np.uint64(j)
    return int(sig)


def simhash_pairs(docs: "ray.data.Dataset", k: int = 3, bands: int = 4,
                  max_hamming: int = 3, seed: int = 42,
                  num_partitions: int = 32,
                  max_bucket: int = 2000) -> "ray.data.Dataset":
    """(u, v, hamming) SimHash near-dup pairs: 64-bit md5 SimHash over
    distinct k-shingles, banded into ``bands`` 16-bit chunks
    (pigeonhole: with ``max_hamming < bands`` every qualifying pair
    shares at least one chunk, so the banded result EQUALS the
    all-pairs Hamming join — the property the DuckDB oracle checks),
    verified by exact Hamming distance.

    Signatures are carried as ``uint64.view(int64)`` — a bit-exact
    reinterpretation, so no signature bit is lost to the int64 sign
    (band keys are 16-bit chunks tagged with the band index and never
    need masking either).

    Skew cap: band buckets larger than ``max_bucket`` are skipped
    (quadratic candidate blowup from correlated-vocabulary corpora);
    pairs inside an over-full bucket are still found via their other
    ``bands-1`` band keys unless every one overflows."""
    from apollo_ray.kernels.simhash import hamming64
    if 64 % bands != 0:
        raise ValueError("bands must divide 64")
    chunk_bits = 64 // bands
    chunk_mask = np.uint64((1 << chunk_bits) - 1)

    def sig_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64()).to_pylist()
        out_ids, out_sigs = [], []
        memo: dict = {}
        for did, t in zip(ids, batch.column("text").to_pylist()):
            s = md5_simhash_sig(t, k, memo)
            if s is None:
                continue
            out_ids.append(did)
            out_sigs.append(s)
        sigs = np.asarray(out_sigs, dtype=np.uint64)
        n = len(out_ids)
        id_arr = np.asarray(out_ids, dtype=np.int64)
        # band_key = (band index tag << chunk_bits) | 16-bit chunk —
        # always positive, no bits dropped
        keys = np.empty((bands, n), dtype=np.int64)
        for b in range(bands):
            chunk = (sigs >> np.uint64(b * chunk_bits)) & chunk_mask
            keys[b] = (chunk.astype(np.int64)
                       | (np.int64(b + 1) << np.int64(chunk_bits)))
        return pa.table({
            "doc_id": pa.array(np.tile(id_arr, bands), type=pa.int64()),
            "sig": pa.array(np.tile(sigs.view(np.int64), bands),
                            type=pa.int64()),
            "band_key": pa.array(keys.ravel(), type=pa.int64()),
        })

    sigs = docs.map_batches(sig_batch, batch_format="pyarrow")

    def add_pkey(batch: pa.Table) -> pa.Table:
        b = np.asarray(batch.column("band_key"), dtype=np.int64)
        return batch.append_column(
            "pkey", pa.array(mix_to_partition(b, num_partitions), type=pa.int32()))

    def emit(group: pa.Table) -> pa.Table:
        bk = np.asarray(group.column("band_key"), dtype=np.int64)
        d = np.asarray(group.column("doc_id"), dtype=np.int64)
        sg = np.asarray(group.column("sig"), dtype=np.int64)
        order = np.lexsort((d, bk))
        bk, d, sg = bk[order], d[order], sg[order]
        if len(bk) == 0:
            return pa.table({"u": pa.array([], type=pa.int64()),
                             "v": pa.array([], type=pa.int64()),
                             "hamming": pa.array([], type=pa.int64())})
        new_seg = np.empty(len(bk), dtype=bool)
        new_seg[0] = True
        new_seg[1:] = bk[1:] != bk[:-1]
        starts = np.flatnonzero(new_seg)
        counts = np.diff(np.append(starts, len(bk)))
        us, vs, su, sv = [], [], [], []
        m2 = counts == 2
        if m2.any():
            s2 = starts[m2]
            us.append(d[s2]); vs.append(d[s2 + 1])
            su.append(sg[s2]); sv.append(sg[s2 + 1])
        for st, c in zip(starts[counts > 2], counts[counts > 2]):
            if c > max_bucket:
                continue
            iu, iv = np.triu_indices(c, k=1)
            us.append(d[st:st + c][iu])
            vs.append(d[st:st + c][iv])
            su.append(sg[st:st + c][iu])
            sv.append(sg[st:st + c][iv])
        if not us:
            return pa.table({"u": pa.array([], type=pa.int64()),
                             "v": pa.array([], type=pa.int64()),
                             "hamming": pa.array([], type=pa.int64())})
        u = np.concatenate(us); v = np.concatenate(vs)
        a = np.ascontiguousarray(np.concatenate(su)).view(np.uint64)
        b = np.ascontiguousarray(np.concatenate(sv)).view(np.uint64)
        hd = hamming64(a, b)
        keep = (hd <= max_hamming) & (u != v)
        lo = np.minimum(u[keep], v[keep]); hi = np.maximum(u[keep], v[keep])
        # dedup pairs found via multiple bands (value-exact, not by
        # the 64-bit mix — see hashing.distinct_pair_idx)
        idx = distinct_pair_idx(lo, hi)
        return pa.table({"u": pa.array(lo[idx], type=pa.int64()),
                         "v": pa.array(hi[idx], type=pa.int64()),
                         "hamming": pa.array(hd[keep][idx], type=pa.int64())})

    keyed = sigs.map_batches(add_pkey, batch_format="pyarrow")
    pairs = keyed.groupby("pkey").map_groups(emit, batch_format="pyarrow")

    # a pair can still appear in two partitions (different bands) ->
    # final distinct, vectorized per pair-hash partition
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
        h = np.asarray(group.column("hamming"), dtype=np.int64)
        if len(u) == 0:
            return group.select(["u", "v", "hamming"])
        key = pair_mix(u, v)
        order = np.lexsort((h, key))
        k_s = key[order]
        first = np.empty(len(k_s), dtype=bool)
        first[0] = True
        first[1:] = k_s[1:] != k_s[:-1]
        sel = order[first]
        return pa.table({"u": pa.array(u[sel], type=pa.int64()),
                         "v": pa.array(v[sel], type=pa.int64()),
                         "hamming": pa.array(h[sel], type=pa.int64())})

    return pairs.map_batches(add_pair_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(distinct_pairs, batch_format="pyarrow")


def jaccard_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
                 k: int = 3, threshold: float = 0.5, seed: int = 42,
                 num_partitions: int | None = None,
                 max_posting: int = 10_000,
                 metric: str = "jaccard") -> "ray.data.Dataset":
    """Cross-table near-duplicate join: (l_id, r_id, shared, jacc_ppm)
    for every left/right doc pair with k-shingle set Jaccard >=
    ``threshold`` — the "dedup a new crawl shard against an existing
    corpus" workflow (incremental analog of the single-table
    ``ngram_jaccard_pairs``; the reference's closest surface is the
    probe-time bucket lookup, ``apollo/query.py:25-43``, which joins
    one probe at a time — this joins whole tables).

    ``metric="containment"`` switches the score and filter to
    |A∩B| / |B| — how much of the RIGHT doc appears in the left — the
    decontamination shape ("is this benchmark item contained in a
    training document", Brown et al. 2020 App. C / Lee et al. 2021);
    output column becomes ``cont_ppm``.  Same shuffles, same caps.

    Shape: explode per-doc-distinct shingle hashes on both sides with
    a side tag, union, hash-partition by shingle, emit left x right
    cross pairs per shingle segment (fully vectorized ragged cross
    product — per-output-row div/mod against segment starts, no Python
    loop over segments), then count shared shingles per pair on a
    second pkey shuffle and filter.  Only (shingle, id, n_sh, side)
    rows ever move — texts never shuffle.

    Exactness: the Jaccard filter and the reported similarity are
    integer-exact (ppm = round-half-up of 10^6 * |A∩B| / |A∪B| done in
    int64), so a SQL oracle reproduces both bit-for-bit.

    Skew cap: a shingle with more than ``max_posting`` postings on
    EITHER side emits no pairs (stopword-like; quadratic blowup).  At
    100 TB this cap plus the shingle hash partitioning is what bounds
    per-task memory: each task sees ~1/num_partitions of the posting
    lists and no segment contributes more than max_posting^2 pairs.
    """
    if metric not in ("jaccard", "containment"):
        raise ValueError(f"unknown metric {metric!r}")
    if num_partitions is None:
        num_partitions = 32
    thr_ppm = int(round(threshold * 1_000_000))
    score_col = "jacc_ppm" if metric == "jaccard" else "cont_ppm"

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            t = _explode_shingles(batch, k=k, seed=seed)
            return t.append_column(
                "side", pa.array(np.full(t.num_rows, side, dtype=np.int8)))
        return f

    sh = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow"))

    def add_pkey(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("shingle"), dtype=np.int64)
        return batch.append_column(
            "pkey", pa.array(mix_to_partition(s, num_partitions),
                             type=pa.int32()))

    _EMPTY = pa.table({"l_id": pa.array([], type=pa.int64()),
                       "r_id": pa.array([], type=pa.int64()),
                       "n_l": pa.array([], type=pa.int64()),
                       "n_r": pa.array([], type=pa.int64())})

    def emit_cross(group: pa.Table) -> pa.Table:
        s = np.asarray(group.column("shingle"), dtype=np.int64)
        if len(s) == 0:
            return _EMPTY
        d = np.asarray(group.column("doc_id"), dtype=np.int64)
        nsh = np.asarray(group.column("n_sh"), dtype=np.int64)
        side = np.asarray(group.column("side"), dtype=np.int8)
        order = np.lexsort((d, side, s))
        s_s, d_s, n_s, t_s = s[order], d[order], nsh[order], side[order]
        new_seg = np.empty(len(s_s), dtype=bool)
        new_seg[0] = True
        new_seg[1:] = s_s[1:] != s_s[:-1]
        seg_of = np.cumsum(new_seg) - 1
        nseg = seg_of[-1] + 1
        starts = np.flatnonzero(new_seg)
        ends = np.append(starts[1:], len(s_s))
        # within each segment, side-0 rows form a prefix (lexsort key)
        cl = np.bincount(seg_of[t_s == 0], minlength=nseg)
        cr = (ends - starts) - cl
        capped = (cl > max_posting) | (cr > max_posting)
        cl = np.where(capped, 0, cl)
        cr = np.where(capped, 0, cr)
        npairs = cl * cr
        total = int(npairs.sum())
        if total == 0:
            return _EMPTY
        out_start = np.concatenate(([0], np.cumsum(npairs)[:-1]))
        live = np.flatnonzero(npairs)
        # per-output-row segment id, then div/mod into (left, right) offsets
        seg_row = np.repeat(live, npairs[live])
        pos = np.arange(total, dtype=np.int64) - out_start[seg_row]
        l_idx = starts[seg_row] + pos // cr[seg_row]
        r_idx = starts[seg_row] + cl[seg_row] + pos % cr[seg_row]
        return pa.table({"l_id": pa.array(d_s[l_idx], type=pa.int64()),
                         "r_id": pa.array(d_s[r_idx], type=pa.int64()),
                         "n_l": pa.array(n_s[l_idx], type=pa.int64()),
                         "n_r": pa.array(n_s[r_idx], type=pa.int64())})

    pairs = sh.map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(emit_cross, batch_format="pyarrow")

    def add_pair_pkey(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch.column("l_id"), dtype=np.int64)
        v = np.asarray(batch.column("r_id"), dtype=np.int64)
        key = pair_mix(u, v).astype(np.int64) >> 1
        return batch.append_column(
            "pkey", pa.array(mix_to_partition(key, num_partitions),
                             type=pa.int32()))

    def count_and_filter(group: pa.Table) -> pa.Table:
        u = np.asarray(group.column("l_id"), dtype=np.int64)
        v = np.asarray(group.column("r_id"), dtype=np.int64)
        nu = np.asarray(group.column("n_l"), dtype=np.int64)
        nv = np.asarray(group.column("n_r"), dtype=np.int64)
        empty = pa.table({"l_id": pa.array([], type=pa.int64()),
                          "r_id": pa.array([], type=pa.int64()),
                          "shared": pa.array([], type=pa.int64()),
                          score_col: pa.array([], type=pa.int64())})
        if len(u) == 0:
            return empty
        key = (pair_mix(u, v).astype(np.int64) >> 1)
        order = np.argsort(key, kind="stable")
        k_s = key[order]
        first = np.empty(len(k_s), dtype=bool)
        first[0] = True
        first[1:] = k_s[1:] != k_s[:-1]
        starts = np.flatnonzero(first)
        c = np.diff(np.append(starts, len(k_s))).astype(np.int64)
        sel = order[starts]
        fu, fv, fnu, fnv = u[sel], v[sel], nu[sel], nv[sel]
        denom = fnu + fnv - c if metric == "jaccard" else fnv
        keep = c * 1_000_000 >= thr_ppm * denom
        # round-half-up ppm in exact int64 (denom <= 2*max shingles/doc,
        # c <= denom, so 2*10^6*c never overflows)
        ppm = (2_000_000 * c[keep] + denom[keep]) // (2 * denom[keep])
        return pa.table({"l_id": pa.array(fu[keep], type=pa.int64()),
                         "r_id": pa.array(fv[keep], type=pa.int64()),
                         "shared": pa.array(c[keep], type=pa.int64()),
                         score_col: pa.array(ppm, type=pa.int64())})

    return pairs.map_batches(add_pair_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(count_and_filter, batch_format="pyarrow")


def cc_size_hist(clusters: "ray.data.Dataset",
                 num_partitions: int = 64) -> "ray.data.Dataset":
    """(n_members, n_clusters) — histogram of connected-component sizes
    over a (doc_id, cc_id) cluster assignment (the LSH analog of
    :func:`dup_size_hist`).  One pkey shuffle of (cc_id) rows, then
    only ≤num_partitions-row histogram partials reach the fold."""
    from apollo_ray.hashing import mix_to_partition

    def add_pkey(batch: pa.Table) -> pa.Table:
        cc = np.asarray(batch.column("cc_id"), dtype=np.int64)
        return pa.table({
            "cc_id": pa.array(cc, type=pa.int64()),
            "pkey": pa.array(mix_to_partition(cc, num_partitions),
                             type=pa.int32())})

    def sizes_part(group: pa.Table) -> pa.Table:
        cc = np.asarray(group.column("cc_id"), dtype=np.int64)
        if len(cc) == 0:
            return pa.table({"n_members": pa.array([], type=pa.int64()),
                             "n_clusters": pa.array([], type=pa.int64())})
        _, counts = np.unique(cc, return_counts=True)
        size, n = np.unique(counts, return_counts=True)
        return pa.table({"n_members": pa.array(size.astype(np.int64),
                                               type=pa.int64()),
                         "n_clusters": pa.array(n.astype(np.int64),
                                                type=pa.int64())})

    def fold(group: pa.Table) -> pa.Table:
        s = np.asarray(group.column("n_members"), dtype=np.int64)
        c = np.asarray(group.column("n_clusters"), dtype=np.int64)
        return pa.table({"n_members": pa.array(s[:1], type=pa.int64()),
                         "n_clusters": pa.array([int(c.sum())],
                                                type=pa.int64())})

    return clusters.map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(sizes_part, batch_format="pyarrow") \
        .groupby("n_members").map_groups(fold, batch_format="pyarrow")


def dup_size_hist(docs: "ray.data.Dataset",
                  num_partitions: int = 64) -> "ray.data.Dataset":
    """(n_members, n_groups) — histogram of exact-duplicate group
    sizes (how much of the corpus is 1x, 2x, 1000x duplicated): the
    one-line dedup-savings estimate.  Rides on
    :func:`exact_dedup_groups`; only ≤64-row histogram partials reach
    the fold."""
    groups = exact_dedup_groups(docs, num_partitions)

    def partial(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch.column("n_members"), dtype=np.int64)
        uniq, cnt = np.unique(n, return_counts=True)
        return pa.table({"n_members": pa.array(uniq, type=pa.int64()),
                         "n_groups": pa.array(cnt, type=pa.int64())})

    def fold(group: pa.Table) -> pa.Table:
        n = np.asarray(group.column("n_members"), dtype=np.int64)
        c = np.asarray(group.column("n_groups"), dtype=np.int64)
        return pa.table({"n_members": pa.array(n[:1], type=pa.int64()),
                         "n_groups": pa.array([int(c.sum())],
                                              type=pa.int64())})

    return groups.map_batches(partial, batch_format="pyarrow") \
        .groupby("n_members").map_groups(fold, batch_format="pyarrow")


def source_overlap(docs: "ray.data.Dataset", k: int = 3, seed: int = 42,
                   group_col: str = "source", num_partitions: int = 64
                   ) -> "ray.data.Dataset":
    """(source_a, source_b, n_shared) — the cross-source contamination
    matrix: how many DISTINCT k-shingles each pair of sources shares
    (``source_a <= source_b`` lexicographically; the diagonal rows are
    each source's own distinct-shingle count, so containment ratios
    read straight off the output).  High off-diagonal mass flags
    sources that mirror each other (syndication, re-crawls) before
    any pairwise doc dedup is attempted.

    Scale shape: one metadata exchange of per-batch-distinct
    (shingle, source) rows partitioned by shingle hash — each
    shingle's source set completes in one partition; there, a
    boolean (n_shingles x S) membership matrix turns the pair count
    into ONE integer matmul (no per-shingle loop), and only <= S^2
    (source_a, source_b, n) partial rows leave each partition for the
    small pair-keyed fold.  S is the group-column cardinality
    (sources / languages / snapshots — tens to hundreds by
    construction; the B-matrix is n_shingles x S bools per task).
    Distinct-by-64-bit-hash stands in for distinct-by-string in the
    oracle, the same collision-free-at-test-scale bridge as
    shingle_novelty."""

    def pairs(batch: pa.Table) -> pa.Table:
        t = _explode_shingles(batch, k, seed)
        empty = pa.table({
            "shingle": pa.array([], type=pa.int64()),
            "src": pa.array([], type=pa.string()),
            "pkey": pa.array([], type=pa.int32())})
        if t.num_rows == 0:
            return empty
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        srcs = np.asarray(batch.column(group_col).to_pylist(),
                          dtype=object)[order]
        d = np.asarray(t.column("doc_id"), dtype=np.int64)
        src_per_row = srcs[np.searchsorted(ids[order], d)]
        sh = np.asarray(t.column("shingle"), dtype=np.int64)
        # batch-local distinct (shingle, source): cuts exchange
        # volume.  lexsort + first-mask, NOT an arithmetic composite
        # (sh * S overflows int64 for 63-bit shingle hashes)
        names, codes = np.unique(src_per_row, return_inverse=True)
        order = np.lexsort((codes, sh))
        sh_s, c_s = sh[order], codes[order]
        first = np.empty(len(sh_s), dtype=bool)
        first[0] = True
        first[1:] = (sh_s[1:] != sh_s[:-1]) | (c_s[1:] != c_s[:-1])
        sh_k, code_k = sh_s[first], c_s[first]
        return pa.table({
            "shingle": pa.array(sh_k, type=pa.int64()),
            "src": pa.array([names[c] for c in code_k],
                            type=pa.string()),
            "pkey": pa.array(mix_to_partition(sh_k, num_partitions),
                             type=pa.int32())})

    def per_partition(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "source_a": pa.array([], type=pa.string()),
            "source_b": pa.array([], type=pa.string()),
            "n_part": pa.array([], type=pa.int64()),
            "qkey": pa.array([], type=pa.int32())})
        if group.num_rows == 0:
            return empty
        sh = np.asarray(group.column("shingle"), dtype=np.int64)
        names, codes = np.unique(
            np.asarray(group.column("src").to_pylist(), dtype=object),
            return_inverse=True)
        S = len(names)
        # partition-global distinct (shingle, source): lexsort +
        # first-mask (no arithmetic composite — overflow, see above)
        order = np.lexsort((codes, sh))
        sh_s, c_s = sh[order], codes[order]
        first = np.empty(len(sh_s), dtype=bool)
        first[0] = True
        first[1:] = (sh_s[1:] != sh_s[:-1]) | (c_s[1:] != c_s[:-1])
        u_sh, u_code = sh_s[first], c_s[first]
        sh_u, sh_idx = np.unique(u_sh, return_inverse=True)
        B = np.zeros((len(sh_u), S), dtype=np.int64)
        B[sh_idx, u_code] = 1
        counts = B.T @ B                    # shared-shingle matrix
        iu, iv = np.triu_indices(S, k=0)    # k=0 keeps the diagonal
        n = counts[iu, iv]
        nz = n > 0
        iu, iv, n = iu[nz], iv[nz], n[nz]
        a = [str(names[i]) for i in iu]
        b = [str(names[j]) for j in iv]
        qh = np.fromiter(
            (hash_utf8(x + "\x00" + y) for x, y in zip(a, b)),
            dtype=np.int64, count=len(a))
        return pa.table({
            "source_a": pa.array(a, type=pa.string()),
            "source_b": pa.array(b, type=pa.string()),
            "n_part": pa.array(n, type=pa.int64()),
            "qkey": pa.array(mix_to_partition(qh, num_partitions),
                             type=pa.int32())})

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({
                "source_a": pa.array([], type=pa.string()),
                "source_b": pa.array([], type=pa.string()),
                "n_shared": pa.array([], type=pa.int64())})
        tg = group.group_by(["source_a", "source_b"]).aggregate(
            [("n_part", "sum")])
        return pa.table({
            "source_a": tg.column("source_a"),
            "source_b": tg.column("source_b"),
            "n_shared": tg.column("n_part_sum").cast(pa.int64())})

    return docs.map_batches(pairs, batch_format="pyarrow") \
        .groupby("pkey").map_groups(per_partition,
                                    batch_format="pyarrow") \
        .groupby("qkey").map_groups(fold, batch_format="pyarrow")


def source_overlap_sql(k: int = 3, group_col: str = "source",
                       table: str = "documents") -> str:
    """DuckDB oracle for :func:`source_overlap` — same window
    construction as the shingle_novelty oracle, self-join on the
    shingle string with ``a <= b`` keeping the diagonal."""
    return f"""
        WITH tok AS (
          SELECT doc_id, {group_col} AS src,
                 CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\\s+')
                 END AS toks
          FROM {table}),
        sh AS (
          SELECT DISTINCT src,
                 array_to_string(toks[i:i+{k - 1}], ' ') AS s
          FROM tok,
               LATERAL (SELECT unnest(range(1,
                 greatest(len(toks) - {k - 1}, 0) + 1)) AS i))
        SELECT a.src AS source_a, b.src AS source_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM sh a JOIN sh b ON a.s = b.s AND a.src <= b.src
        GROUP BY a.src, b.src
    """


def bbit_minhash_pairs(docs: "ray.data.Dataset", k: int = 3,
                       n_perm: int = 16, band_r: int = 4, seed: int = 42,
                       max_bucket: int = 64, num_partitions: int = 32
                       ) -> "ray.data.Dataset":
    """(doc_a, doc_b, n_agree, est_ppm) — 1-bit MinHash similarity
    estimates (Li & Koenig 2010, "b-Bit Minwise Hashing") for every
    LSH-co-bucketed candidate pair: keep only the LOWEST bit of each
    of the ``n_perm`` MinHash samples (a 32x signature compression at
    sketch-storage scale) and estimate Jaccard from the bit-agreement
    rate, ``est_ppm = max(0, (2*n_agree - n_perm) * 1e6 // n_perm)``
    (the b=1 estimator with the C-correction dropped — negligible at a
    2^32 hash universe).  Candidates come from the same exact-tuple
    banding as :func:`minhash_lsh_clusters`; buckets larger than
    ``max_bucket`` are skipped on both sides (skew rule).

    Scale shape: the doc's packed ``n_perm``-bit mask rides each band
    row (8 bytes), so pair emission computes the estimate LOCALLY from
    the two masks — no second join against a signature table; one
    pair-keyed exchange dedups pairs found by multiple bands.
    All-integer, value-exact in SQL (:func:`bbit_minhash_pairs_sql`).
    """
    from apollo_ray.kernels.minhash import generate_minhash_params
    if n_perm % band_r != 0:
        raise ValueError("band_r must divide n_perm")
    if n_perm > 63:
        raise ValueError("n_perm must fit a packed int64 mask")
    n_bands = n_perm // band_r
    params = generate_minhash_params(n_perm, seed)
    sig_cols = ["s%d" % i for i in range(band_r)]

    def emit_bands(batch: pa.Table) -> pa.Table:
        ids, sigs = _batch_minhash_sigs(batch, k, params)
        if ids is None:
            cols = {"doc_id": pa.array([], type=pa.int64()),
                    "band": pa.array([], type=pa.int32()),
                    "mask": pa.array([], type=pa.int64())}
            for c in sig_cols:
                cols[c] = pa.array([], type=pa.int64())
            cols["pkey"] = pa.array([], type=pa.int32())
            return pa.table(cols)
        n = len(ids)
        bits = (sigs & 1).astype(np.int64)
        mask = (bits << np.arange(n_perm, dtype=np.int64)[None, :]) \
            .sum(axis=1)
        parts = []
        for b in range(n_bands):
            cols = {"doc_id": pa.array(ids, type=pa.int64()),
                    "band": pa.array(np.full(n, b, dtype=np.int32),
                                     type=pa.int32()),
                    "mask": pa.array(mask, type=pa.int64())}
            mix = np.full(n, b, dtype=np.uint64)
            for i, c in enumerate(sig_cols):
                s = sigs[:, b * band_r + i]
                cols[c] = pa.array(s.astype(np.int64), type=pa.int64())
                mix = pair_mix(mix, s)
            cols["pkey"] = pa.array(
                mix_to_partition(mix, num_partitions), type=pa.int32())
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    _POP = np.unpackbits(
        np.arange(256, dtype=np.uint8)[:, None].view(np.uint8),
        axis=1).sum(axis=1).astype(np.int64)

    def _popcount64(x: np.ndarray) -> np.ndarray:
        v = x.view(np.uint64)
        out = np.zeros(len(x), dtype=np.int64)
        for sh in range(0, 64, 8):
            out += _POP[((v >> np.uint64(sh)) & np.uint64(0xFF))
                        .astype(np.int64)]
        return out

    _EMPTY = pa.table({"doc_a": pa.array([], type=pa.int64()),
                       "doc_b": pa.array([], type=pa.int64()),
                       "n_agree": pa.array([], type=pa.int64()),
                       "est_ppm": pa.array([], type=pa.int64()),
                       "qkey": pa.array([], type=pa.int32())})

    def emit_pairs(group: pa.Table) -> pa.Table:
        cols = [np.asarray(group.column(c), dtype=np.int64)
                for c in ["band"] + sig_cols]
        d = np.asarray(group.column("doc_id"), dtype=np.int64)
        if len(d) == 0:
            return _EMPTY
        m = np.asarray(group.column("mask"), dtype=np.int64)
        order = np.lexsort((d,) + tuple(reversed(cols)))
        cs = [c[order] for c in cols]
        ds, ms = d[order], m[order]
        new = np.zeros(len(ds), dtype=bool)
        new[0] = True
        for c in cs:
            new[1:] |= c[1:] != c[:-1]
        starts = np.flatnonzero(new)
        n = np.diff(np.append(starts, len(ds)))
        from apollo_ray.kernels.segments import ragged_triangle_pairs
        ai, bi = ragged_triangle_pairs(starts, n,
                                       (n >= 2) & (n <= max_bucket))
        if len(ai) == 0:
            return _EMPTY
        u, v = ds[ai], ds[bi]
        # doc ids within a bucket are sorted (lexsort tiebreak) -> u < v
        agree = n_perm - _popcount64(ms[ai] ^ ms[bi])
        est = np.maximum(0, (2 * agree - n_perm) * 1_000_000 // n_perm)
        # same pair from different bands carries identical values;
        # dedup locally then globally ON THE (doc_a, doc_b) VALUE PAIR
        # (lexsort + adjacent-equal mask, matching the SQL oracle's
        # exact DISTINCT — a 64-bit pair_mix collision between two
        # distinct pairs must not drop one); pair_mix is kept for
        # qkey ROUTING only, where a collision just co-partitions
        idx = distinct_pair_idx(u, v)
        key = pair_mix(u[idx], v[idx]).astype(np.int64)
        return pa.table({
            "doc_a": pa.array(u[idx], type=pa.int64()),
            "doc_b": pa.array(v[idx], type=pa.int64()),
            "n_agree": pa.array(agree[idx], type=pa.int64()),
            "est_ppm": pa.array(est[idx], type=pa.int64()),
            "qkey": pa.array(mix_to_partition(key, num_partitions),
                             type=pa.int32())})

    def dedup_pairs(group: pa.Table) -> pa.Table:
        u = np.asarray(group.column("doc_a"), dtype=np.int64)
        if len(u) == 0:
            return _EMPTY.drop_columns(["qkey"])
        v = np.asarray(group.column("doc_b"), dtype=np.int64)
        a = np.asarray(group.column("n_agree"), dtype=np.int64)
        e = np.asarray(group.column("est_ppm"), dtype=np.int64)
        idx = distinct_pair_idx(u, v)
        return pa.table({"doc_a": pa.array(u[idx], type=pa.int64()),
                         "doc_b": pa.array(v[idx], type=pa.int64()),
                         "n_agree": pa.array(a[idx], type=pa.int64()),
                         "est_ppm": pa.array(e[idx], type=pa.int64())})

    return docs.map_batches(emit_bands, batch_format="pyarrow") \
        .groupby("pkey").map_groups(emit_pairs, batch_format="pyarrow") \
        .groupby("qkey").map_groups(dedup_pairs, batch_format="pyarrow")


def bbit_minhash_pairs_sql(k: int = 3, n_perm: int = 16, band_r: int = 4,
                           seed: int = 42, max_bucket: int = 64) -> str:
    """DuckDB oracle for :func:`bbit_minhash_pairs`: shared signature
    CTEs, exact-tuple banding via ordered ``string_agg``, co-bucket
    pairs in the [2, max_bucket] band, then bit-agreement counts and
    the identical integer estimator."""
    body = _minhash_sig_ctes(k, n_perm, seed)
    return f"""WITH {body},
        bnd AS MATERIALIZED (
          SELECT doc_id, j // {band_r} AS band,
                 string_agg(CAST(sig AS VARCHAR), ',' ORDER BY j) AS key
          FROM sig GROUP BY doc_id, j // {band_r}),
        sized AS MATERIALIZED (
          SELECT band, key, count(*) AS n FROM bnd GROUP BY band, key),
        pr AS MATERIALIZED (
          SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
          FROM bnd a JOIN bnd b ON a.band = b.band AND a.key = b.key
                     AND a.doc_id < b.doc_id
          JOIN sized s ON s.band = a.band AND s.key = a.key
          WHERE s.n BETWEEN 2 AND {max_bucket})
        SELECT p.u AS doc_a, p.v AS doc_b,
               CAST(sum(CASE WHEN sa.sig % 2 = sb.sig % 2
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
               CAST(greatest(0,
                 (2 * sum(CASE WHEN sa.sig % 2 = sb.sig % 2
                               THEN 1 ELSE 0 END) - {n_perm})
                 * 1000000 // {n_perm}) AS BIGINT) AS est_ppm
        FROM pr p
        JOIN sig sa ON sa.doc_id = p.u
        JOIN sig sb ON sb.doc_id = p.v AND sb.j = sa.j
        GROUP BY p.u, p.v
    """


def oph_signatures(docs: "ray.data.Dataset", k: int = 3,
                   n_bins: int = 16,
                   dense_c: int = 1_000_003) -> "ray.data.Dataset":
    """(doc_id, j, sig, densified) — One-Permutation Hashing MinHash
    (Li, Owen & Zhang 2012) with rotation densification (Shrivastava
    & Li 2014, "Improved Densification of One Permutation Hashing"):
    ONE md5 hash per shingle instead of ``n_bins`` permutations — the
    sketch that makes 10^12-doc signature computation hash-bound
    rather than permutation-bound (classic k-permutation MinHash does
    ``n_perm`` multiply-mod passes per shingle;
    cf. :func:`minhash_signatures`).

    Semantics, fully integer and SQL-exact
    (:func:`oph_signatures_sql`):

    - each DISTINCT k-shingle hashes once to ``u = md5 % 2**32``;
    - bin ``j = u * n_bins // 2**32`` (range partitioning keeps the
      within-bin min uniform);
    - ``sig[j] = min(u in bin j)`` for non-empty bins;
    - an EMPTY bin borrows clockwise: ``sig[j] = sig[j'] + s *
      dense_c`` where ``j' = (j + s) % n_bins`` is the nearest
      non-empty bin at distance ``s >= 1`` (the rotation rule; the
      ``s * dense_c`` offset breaks ties between bins borrowing from
      the same donor).  ``densified`` flags borrowed bins.

    Docs with < k tokens emit no rows.  Map-only: streams at any
    corpus size, no shuffle, no state.
    """
    from apollo_ray.kernels.text import _md5_u64

    _E = pa.table({"doc_id": pa.array([], type=pa.int64()),
                   "j": pa.array([], type=pa.int64()),
                   "sig": pa.array([], type=pa.int64()),
                   "densified": pa.array([], type=pa.int64())})

    def f(batch: pa.Table) -> pa.Table:
        memo: dict = {}
        rows_d: list[np.ndarray] = []
        rows_sig: list[np.ndarray] = []
        rows_dense: list[np.ndarray] = []
        SENT = np.int64(1 << 62)
        for did, t in zip(batch.column("doc_id").to_pylist(),
                          batch.column("text").to_pylist()):
            toks = t.split()
            if len(toks) < k:
                continue
            shingles = {" ".join(toks[i:i + k])
                        for i in range(len(toks) - k + 1)}
            us = np.empty(len(shingles), dtype=np.int64)
            for i, s in enumerate(shingles):
                v = memo.get(s)
                if v is None:
                    v = _md5_u64(s) & 0xFFFFFFFF
                    memo[s] = v
                us[i] = v
            bins = (us * n_bins) >> 32
            sig = np.full(n_bins, SENT, dtype=np.int64)
            np.minimum.at(sig, bins, us)
            empty = sig == SENT
            if empty.any():
                # clockwise borrow, vectorized: over the doubled bin
                # axis, distance to the nearest non-empty bin at or
                # after each position
                order = np.concatenate([np.arange(n_bins),
                                        np.arange(n_bins)])
                nonempty2 = ~empty[order]
                idx2 = np.arange(2 * n_bins)
                # last non-empty at-or-before each doubled position of
                # the REVERSED axis == next non-empty at-or-after
                nxt = np.where(nonempty2, idx2, 2 * n_bins)
                nxt = np.minimum.accumulate(nxt[::-1])[::-1]
                take = nxt[:n_bins]          # donor doubled-index per bin
                s_dist = (take - np.arange(n_bins)).astype(np.int64)
                donor = sig[order[take]]
                sig = np.where(empty, donor + s_dist * dense_c, sig)
            rows_d.append(np.full(n_bins, did, dtype=np.int64))
            rows_sig.append(sig)
            rows_dense.append(empty.astype(np.int64))
        if not rows_d:
            return _E
        nd = len(rows_d)
        return pa.table({
            "doc_id": pa.array(np.concatenate(rows_d), type=pa.int64()),
            "j": pa.array(np.tile(np.arange(n_bins, dtype=np.int64), nd),
                          type=pa.int64()),
            "sig": pa.array(np.concatenate(rows_sig), type=pa.int64()),
            "densified": pa.array(np.concatenate(rows_dense),
                                  type=pa.int64())})

    return docs.map_batches(f, batch_format="pyarrow")


def oph_signatures_sql(k: int = 3, n_bins: int = 16,
                       dense_c: int = 1_000_003,
                       table: str = "documents") -> str:
    """DuckDB oracle for :func:`oph_signatures`: same md5 shingle
    hash, same range binning, same min-per-bin, and the identical
    clockwise rotation densification (nearest non-empty bin at
    distance s, borrowed value + s*dense_c)."""
    return f"""
        WITH tok AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM {table} WHERE length(trim(text)) > 0),
        sh AS (
          SELECT DISTINCT doc_id,
                 md5_number_lower(array_to_string(toks[i:i+{k - 1}], ' '))
                   % 4294967296::UBIGINT AS u
          FROM tok,
               LATERAL (SELECT unnest(range(1,
                   greatest(len(toks) - {k - 1}, 0) + 1)) AS i)
          WHERE len(toks) >= {k}),
        bm AS MATERIALIZED (
          SELECT doc_id,
                 CAST(u * {n_bins} // 4294967296::UBIGINT AS BIGINT) AS j,
                 CAST(min(u) AS BIGINT) AS v
          FROM sh GROUP BY doc_id, j),
        grid AS (
          SELECT d.doc_id, g.j
          FROM (SELECT DISTINCT doc_id FROM bm) d,
               (SELECT unnest(range(0, {n_bins})) AS j) g)
        SELECT g.doc_id, g.j,
               CASE WHEN bm.v IS NOT NULL THEN bm.v ELSE (
                 SELECT b2.v + s.s * {dense_c}
                 FROM (SELECT unnest(range(1, {n_bins})) AS s) s
                 JOIN bm b2 ON b2.doc_id = g.doc_id
                           AND b2.j = (g.j + s.s) % {n_bins}
                 ORDER BY s.s LIMIT 1) END AS sig,
               CAST(bm.v IS NULL AS BIGINT) AS densified
        FROM grid g LEFT JOIN bm ON bm.doc_id = g.doc_id AND bm.j = g.j
    """
