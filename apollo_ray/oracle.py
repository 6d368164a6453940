"""Local single-process oracle — the reference-equivalent pipeline.

A deliberately *independent* (dict + BFS, no Ray, no shuffles)
implementation of the same semantics the distributed pipeline computes,
mirroring the reference's local code paths:

- bags via the same ``doc_to_bag`` feature space,
- signatures via the batch WMH kernel (itself pinned elementwise to the
  scalar port of ``apollo/hasher.py:237-256`` in tests/test_wmh.py),
- banding by raw slice bytes into a Python dict — the literal
  "identical band bytes => same bucket" of ``apollo/hasher.py:97-99``
  and the scan-and-cut of ``apollo/graph.py:103-119``,
- components via the union-find kernel (tested against the translated
  reference BFS tests).

Used by the e2e golden test and the recall measurement: the
distributed pipeline must reproduce this oracle's cluster assignments
(dup-pair recall >= 0.99 — with identical seeded params it is exactly
1.0), and secondarily we report recall against the brute-force
weighted-Jaccard pair oracle (the ``--precise`` analog,
``apollo/query.py:45-66``).
"""

from __future__ import annotations

import numpy as np

from apollo_ray.config import DedupConfig
from apollo_ray.hashing import TokenHasher, hash_utf8
from apollo_ray.kernels.cc import find_connected_components
from apollo_ray.kernels.jaccard import weighted_jaccard_sparse
from apollo_ray.kernels.lsh import calc_hashtable_params
from apollo_ray.kernels.text import doc_to_bag, extract_text
from apollo_ray.kernels.wmh import generate_params, weighted_minhash_batch


def oracle_clusters(urls: list[str], htmls: list[bytes], cfg: DedupConfig
                    ) -> dict[str, int]:
    """pages -> {url: cluster_label}; labels are min doc_id per cluster."""
    texts = [extract_text(h) for h in htmls]
    doc_ids = [hash_utf8(u) for u in urls]

    # exact collapse by text (rep = min doc_id per distinct text)
    rep_of_text: dict[str, int] = {}
    members: dict[int, list[int]] = {}
    for did, t in zip(doc_ids, texts):
        if t not in rep_of_text or did < rep_of_text[t]:
            rep_of_text[t] = did
    for did, t in zip(doc_ids, texts):
        members.setdefault(rep_of_text[t], []).append(did)

    reps = sorted(members)
    rep_texts = {rep_of_text[t]: t for t in rep_of_text}

    # bags + signatures for representatives
    hasher = TokenHasher(seed=cfg.seed)
    indptr = [0]
    indices: list[np.ndarray] = []
    weights: list[np.ndarray] = []
    df = ndocs = None
    if cfg.needs_docfreq:
        dim = cfg.feature_dim
        df = np.zeros(dim, dtype=np.int64)
        for r in reps:
            idx, _ = doc_to_bag(rep_texts[r], hasher, cfg.shingle_k,
                                cfg.feature_dim_log2, **cfg.bag_kwargs)
            df[idx] += 1
        ndocs = len(reps)
    min_df = cfg.min_docfreq
    if df is not None:
        from apollo_ray.kernels.text import effective_min_df
        min_df = effective_min_df(df, cfg)
    for r in reps:
        idx, w = doc_to_bag(rep_texts[r], hasher, cfg.shingle_k,
                            cfg.feature_dim_log2, df=df, ndocs=ndocs or 0,
                            min_df=min_df, **cfg.bag_kwargs)
        indices.append(idx)
        weights.append(w)
        indptr.append(indptr[-1] + len(idx))
    if cfg.minhash_mode == "unweighted":
        from apollo_ray.kernels.minhash import (generate_minhash_params,
                                                minhash_batch,
                                                sig_to_u32_lanes)
        mp = generate_minhash_params(cfg.size, cfg.seed)
        sigs = sig_to_u32_lanes(minhash_batch(
            np.asarray(indptr, dtype=np.int64),
            np.concatenate(indices) if indices else np.empty(0, np.uint32),
            mp["a"], mp["b"]))
    else:
        p = generate_params(cfg.feature_dim, cfg.size, cfg.seed)
        sigs = weighted_minhash_batch(
            np.asarray(indptr, dtype=np.int64),
            np.concatenate(indices) if indices else np.empty(0, np.uint32),
            np.concatenate(weights) if weights else np.empty(0, np.float32),
            p["rs"], p["ln_cs"], p["betas"])

    # banding into dict buckets keyed by raw band bytes
    from apollo_ray.stages.bands import band_params
    htnum, band_size = band_params(cfg)
    buckets: dict[tuple[int, bytes], list[int]] = {}
    flat = sigs.reshape(len(reps), -1)
    for i, r in enumerate(reps):
        for b in range(htnum):
            key = (b, flat[i, b * band_size * 2:(b + 1) * band_size * 2]
                   .tobytes())
            buckets.setdefault(key, []).append(r)

    # transitive closure (reference BFS semantics) incl. member edges
    bucket_lists = list(buckets.values())
    bucket_lists.extend(members.values())
    ccs = find_connected_components(bucket_lists)
    label: dict[int, int] = {}
    for root, els in ccs.items():
        for e in els:
            label[e] = root
    out: dict[str, int] = {}
    for u, did, t in zip(urls, doc_ids, texts):
        rep = rep_of_text[t]
        out[u] = label.get(rep, rep)
    return out


def brute_force_dup_pairs(texts: list[str], cfg: DedupConfig
                          ) -> set[tuple[int, int]]:
    """All index pairs (i < j) of distinct texts with weighted Jaccard
    >= threshold — the ``--precise`` exact-similarity oracle."""
    hasher = TokenHasher(seed=cfg.seed)
    bags = [doc_to_bag(t, hasher, cfg.shingle_k, cfg.feature_dim_log2,
                       cfg.tokenizer, cfg.weighting) for t in texts]
    out: set[tuple[int, int]] = set()
    for i in range(len(bags)):
        ii, wi = bags[i]
        for j in range(i + 1, len(bags)):
            jj, wj = bags[j]
            if weighted_jaccard_sparse(ii, wi, jj, wj) >= cfg.threshold:
                out.add((i, j))
    return out


def same_cluster_pairs(labels: dict[str, int]) -> set[tuple[str, str]]:
    by_label: dict[int, list[str]] = {}
    for k, v in labels.items():
        by_label.setdefault(v, []).append(k)
    pairs: set[tuple[str, str]] = set()
    for mem in by_label.values():
        mem = sorted(mem)
        for i in range(len(mem)):
            for j in range(i + 1, len(mem)):
                pairs.add((mem[i], mem[j]))
    return pairs
