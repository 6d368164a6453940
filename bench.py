"""Benchmark harness.

Plain run: one fresh Ray session at ``RAY_GRAFT_CPUS`` (default 32)
CPUs; times the flagship MinHash-LSH dedup pipeline on a cached
deterministic webtext fixture (``GRAFT_BENCH_ROWS`` docs, default
50k) plus representative operator queries over ``GRAFT_SF_DIR``
(default /root/testdata/sf0.1).  Prints ONE JSON line.

``--scaling``: runs the plain bench twice in fresh subprocesses at
num_cpus=8 and num_cpus=32 on the same inputs and reports both
throughputs and the scaling efficiency (the sandbox substitute for the
north rule's N vs 4N node criterion; see BASELINE.md).

``--weak-scaling``: N rows at 8 CPUs vs 4N rows at 32 CPUs
(``GRAFT_WEAK_ROWS`` base, default 1M); ideal is equal wall time.
Models adding nodes with per-node data held constant — the actual
100 TB growth scenario.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# 500k default: at 50k the 32-CPU pipeline finishes in ~3.7s and
# startup/barrier constants dominate the docs/s headline (13k vs the
# sustained 44k at 500k); the fixture is generated once and cached
BENCH_ROWS = int(os.environ.get("GRAFT_BENCH_ROWS", "500000"))
FIXTURE_DIR = "/tmp/apollo_ray_bench"


def ensure_fixture(n_rows: int) -> str:
    """Generate (once) and cache the deterministic webtext fixture.

    Written with small row groups (8k rows) so ``read_parquet`` can
    split each file into many blocks: one row group per file caps the
    whole pipeline's parallelism at the file count (measured: the
    extract stage stopped scaling past 16 workers at 1M rows)."""
    import pyarrow.parquet as pq
    path = os.path.join(FIXTURE_DIR, "pages_%d_rg8k_f64" % n_rows)
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    from apollo_ray.fixtures import generate_pages
    os.makedirs(path, exist_ok=True)
    pages, truth = generate_pages(n_rows)
    # one read task per FILE: asking read_parquet for more blocks than
    # files makes each split task decode the whole file again
    # (measured 3x on the 2M extract at 32 CPUs), so parallelism must
    # come from physical file count, not override_num_blocks
    n_files = 64
    step = (pages.num_rows + n_files - 1) // n_files
    for i in range(0, pages.num_rows, step):
        pq.write_table(pages.slice(i, step),
                       os.path.join(path, "part-%05d.parquet" % i),
                       row_group_size=8192)
    pq.write_table(truth, os.path.join(path, "truth.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return path


def _maybe_force_distributed() -> bool:
    """``GRAFT_FORCE_DISTRIBUTED=1``: zero every driver-side fast-path
    cap so the pipeline runs the same all-distributed code it would on
    a corpus too large for any driver-resident state — the membership
    election becomes a groupby exchange, exact-collapse falls to the
    full-payload shuffle, connected components runs the star rounds,
    and cluster labeling goes through the union+groupby path.  Used to
    measure the weak-scaling ratio WITHOUT the driver-serial metadata
    Amdahl term (BENCH/BASELINE.md round-4 table)."""
    if not os.environ.get("GRAFT_FORCE_DISTRIBUTED"):
        return False
    import apollo_ray.stages.bags as bags_mod
    import apollo_ray.stages.cc_stage as cc_mod
    import apollo_ray.stages.communities_stage as comm_mod
    bags_mod.DRIVER_MEMBERSHIP_MAX_ROWS = 0
    bags_mod.BROADCAST_COLLAPSE_MAX_DUPS = 0
    cc_mod.DRIVER_CC_MAX_EDGES = 0
    cc_mod.LABEL_BROADCAST_MAX = 0
    comm_mod.LABEL_BROADCAST_MAX = 0
    return True


def bench_once() -> dict:
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    forced = _maybe_force_distributed()
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd
    from apollo_ray.config import DedupConfig
    from apollo_ray.pipelines.dedup import run_dedup

    fixture = ensure_fixture(BENCH_ROWS)
    part_files = [os.path.join(fixture, f) for f in sorted(os.listdir(fixture))
                  if f.startswith("part-")]
    # warm the OS page cache (untimed) so we measure compute + shuffle
    rd.read_parquet(part_files).count()

    cfg = DedupConfig(wmh_concurrency=max(4, NUM_CPUS // 2),
                      batch_size=2048,
                      minhash_mode=os.environ.get("GRAFT_MINHASH_MODE",
                                                  "weighted"))
    queries: dict[str, float] = {}

    # GRAFT_WITH_COMMUNITIES=1: fold the communities tier INTO the
    # timed headline (run_dedup(with_communities=True) + count) so the
    # --scaling/--weak-scaling ratios cover the 100 TB communities
    # path — combine with GRAFT_FORCE_DISTRIBUTED=1 for the above-cap
    # hash-join attach route (VERDICT r4 task 3 evidence).
    with_comms = bool(os.environ.get("GRAFT_WITH_COMMUNITIES"))

    from apollo_ray.stages.wmh_stage import params_object_ref
    params_object_ref(cfg)   # one-time model artifact, built untimed
    t0 = time.monotonic()
    # exactly one read task per file (see ensure_fixture): block-split
    # read tasks each decode the whole file again — 20.5s vs 6.7s for
    # the 2M extract at 32 CPUs when asking for 2 blocks per file
    pages_ds = rd.read_parquet(part_files,
                               override_num_blocks=len(part_files))
    out = run_dedup(pages_ds, cfg, num_partitions=max(16, NUM_CPUS * 2),
                    with_communities=with_comms)
    n_rows = out["clusters"].count()
    if with_comms:
        out["communities"].count()
    headline = time.monotonic() - t0
    n_clusters = out["clusters"].to_pandas()["cc_id"].nunique()
    queries["dedup_pipeline"] = round(headline, 3)

    # steady-state run: identical pipeline immediately re-run on warm
    # worker processes (per-worker state caches populated, imports
    # done).  The headline above keeps the cold-ish series recorded
    # since round 2; this entry is what a resident service measures —
    # ~0.7-1.0 s faster (worker spawn + first-touch state).  Scaling
    # legs skip it (GRAFT_SKIP_WARM): their ratio reads the cold
    # headline, so the second run would only double leg wall time.
    if not os.environ.get("GRAFT_SKIP_WARM"):
        t0 = time.monotonic()
        out2 = run_dedup(rd.read_parquet(part_files,
                                         override_num_blocks=len(part_files)),
                         cfg, num_partitions=max(16, NUM_CPUS * 2))
        out2["clusters"].count()
        queries["dedup_pipeline_warm"] = round(time.monotonic() - t0, 3)

    # communities tier over the flagship output (untimed by the
    # headline: with_communities changes the e2e number series kept
    # since round 2, so it gets its own entry).  Skipped when the
    # tier is already folded into the headline (GRAFT_WITH_COMMUNITIES).
    if with_comms:
        communities_sec = out["metrics"].get("communities_sec", 0.0)
    else:
        from apollo_ray.stages.communities_stage import detect_communities
        t0 = time.monotonic()
        comms = detect_communities(
            out["clusters"],
            out["bands"].select_columns(["doc_id", "bucket"]),
            cfg, algorithm=cfg.community_algorithm,
            num_partitions=max(16, NUM_CPUS * 2))
        comms.count()
        communities_sec = round(time.monotonic() - t0, 3)
    queries["communities"] = communities_sec

    # representative operator queries over the driver testdata
    import __ray_entry__ as entrymod
    qs = entrymod.queries()
    qnames = () if os.environ.get("GRAFT_SKIP_QUERIES") else (
        "exact_dedup_groups", "docfreq", "ngram_jaccard_pairs",
        "events_hourly", "ann_close_pairs", "simhash_pairs",
        "asof_purchase", "substring_dup_spans",
        "line_dedup", "bigram_score", "regional_revenue",
        "ppl_buckets", "bloom_dedup", "dsir_logweights",
        "jaccard_join", "token_freq_hist",
        "retention_cohorts", "customer_order_dist",
        "heavy_hitters", "url_host_stats", "dedup_tier_rollup",
        "per_host_topk", "shingle_novelty", "normalize_text",
        "hostlist_filter", "nb_classify_cap64", "dedup_tier_rollup_sem",
        "encoding_quality", "readability", "chunk_documents",
        "word_pmi_pairs", "extract_links", "link_host_counts",
        "code_detect", "embedding_stats", "kmeans_assign_k8",
        "paragraph_dedup", "lang_budget_sample", "html_tag_stats",
        "quantile_filter", "term_blocklist", "feature_hash_embed",
        "snapshot_diff", "anchor_texts", "minhash_lsh_clusters",
        "host_pagerank", "mirror_hosts", "pq_codes",
        "priority_dedup", "normalized_exact_dedup", "bbit_minhash_pairs",
        "ivfpq_topk", "oph_signatures")
    for name in qnames:
        t0 = time.monotonic()
        res = qs[name](SF_DIR)
        import ray.data as rdm
        if isinstance(res, rdm.Dataset):
            res.count()
        queries[name] = round(time.monotonic() - t0, 3)

    result = {
        "metric": "dedup_e2e_seconds",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "bench_rows": BENCH_ROWS,
        "docs_per_sec": round(BENCH_ROWS / headline, 1),
        "n_clusters": int(n_clusters),
        "stage_sec": dict(
            {k: v for k, v in out["metrics"].items()
             if k.endswith("_sec")}, communities_sec=communities_sec),
    }
    if forced:
        result["force_distributed"] = True
    if with_comms:
        result["with_communities"] = True
    ray.shutdown()
    return result


def _run_leg(ncpu: int, rows: int | None = None) -> dict:
    """Best-of-``GRAFT_SCALING_REPEATS`` fresh-process runs: this host
    shows multi-minute noise episodes up to 3x (BENCH/BASELINE.md), so
    a single sample per level can invert the ratio entirely."""
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "1"))
    best = None
    for _ in range(repeats):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_SKIP_QUERIES="1", GRAFT_SKIP_WARM="1")
        if rows is not None:
            env["GRAFT_BENCH_ROWS"] = str(rows)
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True,
                             cwd=os.path.dirname(os.path.abspath(__file__)))
        r = json.loads(out.stdout.strip().splitlines()[-1])
        if best is None or r["value"] < best["value"]:
            best = r
    return best


def run_weak_scaling() -> dict:
    """Weak scaling (Gustafson): grow the input WITH the parallelism —
    N rows at 8 CPUs vs 4N rows at 32 CPUs; ideal is equal wall time
    (efficiency t_lo/t_hi = 1.0).  This models the real cluster
    scenario the north rule targets — adding nodes to hold per-node
    data constant — more directly than strong scaling does, because a
    fixed-size input at 32 CPUs is exchange-fixed-cost-bound long
    before a 100 TB corpus would be."""
    base_rows = int(os.environ.get("GRAFT_WEAK_ROWS", "1000000"))
    levels = os.environ.get("GRAFT_SCALING_LEVELS", "8,32")
    lo, hi = (int(x) for x in levels.split(","))
    factor = hi // lo
    ensure_fixture(base_rows)
    ensure_fixture(base_rows * factor)
    r_lo = _run_leg(lo, base_rows)
    r_hi = _run_leg(hi, base_rows * factor)
    eff = r_lo["value"] / r_hi["value"]
    return {
        "metric": "weak_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "num_cpus_lo": lo, "num_cpus_hi": hi,
        "rows_lo": base_rows, "rows_hi": base_rows * factor,
        "sec_lo": r_lo["value"], "sec_hi": r_hi["value"],
        "docs_per_sec_lo": r_lo["docs_per_sec"],
        "docs_per_sec_hi": r_hi["docs_per_sec"],
        "stage_sec_lo": r_lo.get("stage_sec", {}),
        "stage_sec_hi": r_hi.get("stage_sec", {}),
    }


def run_scaling() -> dict:
    run = _run_leg

    # 2M rows: small fixtures finish in seconds at 32 CPUs and fixed
    # startup/barrier constants dominate the ratio (Amdahl), reading
    # as poor scaling that vanishes at realistic input sizes
    scaling_rows = int(os.environ.get("GRAFT_SCALING_ROWS", "2000000"))
    os.environ["GRAFT_BENCH_ROWS"] = str(scaling_rows)
    ensure_fixture(scaling_rows)        # shared, generated once
    levels = os.environ.get("GRAFT_SCALING_LEVELS", "8,32")
    lo, hi = (int(x) for x in levels.split(","))
    r_lo = run(lo)
    r_hi = run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "num_cpus_lo": lo, "num_cpus_hi": hi,
        "sec_lo": r_lo["value"], "sec_hi": r_hi["value"],
        "docs_per_sec_lo": r_lo["docs_per_sec"],
        "docs_per_sec_hi": r_hi["docs_per_sec"],
        "bench_rows": scaling_rows,
        # per-stage wall split of each leg: a stage whose time does NOT
        # shrink lo->hi is the serial/barrier floor — keep the evidence
        # attached to every sample
        "stage_sec_lo": r_lo.get("stage_sec", {}),
        "stage_sec_hi": r_hi.get("stage_sec", {}),
    }


if __name__ == "__main__":
    if "--weak-scaling" in sys.argv:
        print(json.dumps(run_weak_scaling()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(bench_once()))
