"""Measure the north-rule recall metrics on the synthetic webtext
fixture and write BENCH/RECALL.json.

Two metrics (BASELINE.md):
1. dup-pair recall/precision of the distributed pipeline vs the local
   reference-equivalent oracle (same seeded params + banding => must
   be 1.0; the criterion is >= 0.99);
2. recall vs the brute-force weighted-Jaccard pair oracle (pairs with
   J >= threshold) — this measures the LSH S-curve itself, identically
   for our pipeline and the reference at the same (b, r).

Usage: python tools/measure_recall.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    import ray
    ray.init(address="local", num_cpus=16, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import numpy as np
    import ray.data as rd
    from apollo_ray.config import DedupConfig
    from apollo_ray.fixtures import generate_pages
    from apollo_ray.hashing import TokenHasher
    from apollo_ray.kernels.jaccard import weighted_jaccard_sparse
    from apollo_ray.kernels.text import doc_to_bag
    from apollo_ray.oracle import oracle_clusters, same_cluster_pairs
    from apollo_ray.pipelines.dedup import run_dedup
    from apollo_ray.stages.bands import band_params

    pages_t, truth_t = generate_pages(n_rows)
    cfg = DedupConfig(feature_dim_log2=14)
    out = run_dedup(rd.from_arrow(pages_t), cfg)
    docs = out["docs"].to_pandas()
    cl = out["clusters"].to_pandas()
    url_of = dict(zip(docs.doc_id, docs.url))
    ours = {url_of[d]: int(c) for d, c in zip(cl.doc_id, cl.cc_id)}

    orc = oracle_clusters(pages_t.column("url").to_pylist(),
                          pages_t.column("html").to_pylist(), cfg)
    p_ours = same_cluster_pairs(ours)
    p_orc = same_cluster_pairs(orc)
    inter = len(p_ours & p_orc)
    vs_reference = {
        "pairs_pipeline": len(p_ours),
        "pairs_oracle": len(p_orc),
        "recall": inter / max(1, len(p_orc)),
        "precision": inter / max(1, len(p_ours)),
    }

    # brute-force Jaccard oracle restricted to planted same-cluster
    # pairs (the full O(n^2) sweep is a test-scale luxury; planted
    # pairs cover the entire positive spectrum by construction)
    truth = truth_t.to_pandas()
    text_of = dict(zip(pages_t.column("url").to_pylist(),
                       pages_t.column("text").to_pylist()))
    th = TokenHasher(seed=cfg.seed)
    b, r = band_params(cfg)
    cache: dict = {}

    def bag(u):
        if u not in cache:
            cache[u] = doc_to_bag(text_of[u], th, cfg.shingle_k,
                                  cfg.feature_dim_log2)
        return cache[u]

    sims, caught = [], []
    for _, g in truth.groupby("cluster_id"):
        urls = list(g.url)
        for i in range(len(urls)):
            for j in range(i + 1, len(urls)):
                i1, w1 = bag(urls[i])
                i2, w2 = bag(urls[j])
                s = weighted_jaccard_sparse(i1, w1, i2, w2)
                if s < cfg.threshold:
                    continue
                sims.append(s)
                caught.append(ours[urls[i]] == ours[urls[j]])
    sims = np.asarray(sims)
    caught = np.asarray(caught, dtype=float)
    predicted = 1 - (1 - sims ** r) ** b
    vs_jaccard = {
        "n_pairs_above_threshold": int(len(sims)),
        "recall": float(caught.mean()) if len(sims) else None,
        "s_curve_predicted_recall": float(predicted.mean()) if len(sims) else None,
        "recall_at_sim_ge_0.9": float(caught[sims >= 0.9].mean())
        if (sims >= 0.9).any() else None,
        "band_config": {"htnum": b, "band_size": r,
                        "threshold": cfg.threshold, "size": cfg.size},
    }

    result = {"n_rows": n_rows, "config_hash": cfg.config_hash(),
              "vs_reference_equivalent_oracle": vs_reference,
              "vs_bruteforce_jaccard_oracle": vs_jaccard,
              "ts": time.time()}
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/RECALL.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    ray.shutdown()


if __name__ == "__main__":
    main()
