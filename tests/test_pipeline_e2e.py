"""End-to-end golden test (SURVEY §5.3): planted near-dup clusters ->
pipeline cluster assignments == the local reference-equivalent oracle;
extraction invariant holds; exact-dup collapse counts match."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def fixture_run(ray_session):
    import ray.data as rd
    from apollo_ray.config import DedupConfig
    from apollo_ray.fixtures import generate_pages
    from apollo_ray.pipelines.dedup import run_dedup

    pages_t, truth_t = generate_pages(600)
    cfg = DedupConfig(feature_dim_log2=14)
    out = run_dedup(rd.from_arrow(pages_t), cfg, with_stats=True)
    return pages_t, truth_t, cfg, out


def test_extraction_invariant(fixture_run, ray_session):
    import ray.data as rd
    from apollo_ray.stages.extract import check_extraction_invariant
    pages_t, *_ = fixture_run
    assert check_extraction_invariant(rd.from_arrow(pages_t)) == 0


def test_row_coverage(fixture_run):
    pages_t, _, _, out = fixture_run
    cl = out["clusters"].to_pandas()
    assert len(cl) == pages_t.num_rows           # every doc labeled
    assert cl["doc_id"].is_unique


def test_exact_collapse_counts(fixture_run):
    pages_t, _, _, out = fixture_run
    n_distinct = len(set(pages_t.column("text").to_pylist()))
    reps = out["reps"].to_pandas()
    assert len(reps) == n_distinct
    assert reps["doc_id"].is_unique
    # member multiplicities sum back to the corpus size
    assert int(reps["member_ids"].map(len).sum()) + len(reps) == pages_t.num_rows


def test_bucket_stats_gates(fixture_run):
    # the reference logs these as sanity gates (apollo/graph.py:129-138)
    from apollo_ray.stages.bands import band_params
    _, _, cfg, out = fixture_run
    htnum, _ = band_params(cfg)
    bs = out["metrics"]["bucket_stats"]
    assert bs["min_buckets_per_doc"] == htnum
    assert bs["max_buckets_per_doc"] == htnum
    assert bs["mean_elements_per_bucket"] >= 1.0


def test_matches_reference_oracle(fixture_run):
    """Dup-pair recall AND precision vs the reference-equivalent local
    oracle must be 1.0 (same seeded params => same assignments; the
    north-rule criterion is >= 0.99)."""
    from apollo_ray.oracle import oracle_clusters, same_cluster_pairs
    pages_t, _, cfg, out = fixture_run
    docs = out["docs"].to_pandas()
    cl = out["clusters"].to_pandas()
    url_of = dict(zip(docs.doc_id, docs.url))
    ours = {url_of[d]: int(c) for d, c in zip(cl.doc_id, cl.cc_id)}

    orc = oracle_clusters(pages_t.column("url").to_pylist(),
                          pages_t.column("html").to_pylist(), cfg)
    p_ours = same_cluster_pairs(ours)
    p_orc = same_cluster_pairs(orc)
    assert p_ours == p_orc
    # labels agree too (cc label = min doc_id of the component)
    assert ours == orc


def test_exact_dup_pairs_always_clustered(fixture_run):
    """Byte-identical texts must always land in one cluster (D2)."""
    pages_t, _, _, out = fixture_run
    docs = out["docs"].to_pandas()
    cl = out["clusters"].to_pandas().set_index("doc_id")["cc_id"]
    by_text = {}
    for did, th in zip(docs.doc_id, docs.text_hash):
        by_text.setdefault(th, []).append(did)
    for ids in by_text.values():
        labs = {int(cl.loc[d]) for d in ids}
        assert len(labs) == 1


def test_planted_pair_catch_rate_matches_s_curve(fixture_run):
    """Pair-level detection rate tracks the LSH S-curve.

    A pair at true weighted Jaccard s collides in some band with
    p(s) = 1 - (1 - s^r)^b (this is the reference's own behavior at the
    same (b, r); boundary pairs at s ~= threshold are caught ~50% BY
    DESIGN).  We assert: (a) high-similarity pairs (s >= 0.93) are
    nearly always clustered, (b) the observed catch rate over all
    planted above-threshold pairs is not materially below the S-curve
    prediction (transitivity can only raise it).
    """
    import numpy as np
    from apollo_ray.hashing import TokenHasher
    from apollo_ray.kernels.jaccard import weighted_jaccard_sparse
    from apollo_ray.kernels.text import doc_to_bag
    from apollo_ray.stages.bands import band_params

    pages_t, truth_t, cfg, out = fixture_run
    docs = out["docs"].to_pandas()
    cl = out["clusters"].to_pandas().set_index("doc_id")["cc_id"]
    url2doc = dict(zip(docs.url, docs.doc_id))
    text_of = dict(zip(pages_t.column("url").to_pylist(),
                       pages_t.column("text").to_pylist()))
    truth = truth_t.to_pandas()
    b, r = band_params(cfg)
    th = TokenHasher(seed=cfg.seed)
    bag_cache = {}

    def bag(u):
        if u not in bag_cache:
            bag_cache[u] = doc_to_bag(text_of[u], th, cfg.shingle_k,
                                      cfg.feature_dim_log2)
        return bag_cache[u]

    sims, caught = [], []
    for cid, g in truth.groupby("cluster_id"):
        base = g[g.edit_rate == 0.0]
        if len(base) == 0 or len(g) < 2:
            continue
        bu = base.url.iloc[0]
        for u in g.url:
            if u == bu:
                continue
            i1, w1 = bag(bu)
            i2, w2 = bag(u)
            s = weighted_jaccard_sparse(i1, w1, i2, w2)
            if s < cfg.threshold:
                continue
            sims.append(s)
            caught.append(int(cl.loc[url2doc[bu]]) == int(cl.loc[url2doc[u]]))
    sims = np.asarray(sims)
    caught = np.asarray(caught, dtype=float)
    assert len(sims) > 20
    hi = sims >= 0.93
    if hi.sum() >= 5:
        assert caught[hi].mean() >= 0.8
    predicted = 1 - (1 - sims ** r) ** b
    assert caught.mean() >= predicted.mean() - 0.10


def test_recall_band_mode_catches_boundary_pairs(ray_session):
    """band_mode="recall" must catch nearly all pairs with true
    J >= threshold (the balanced-optimum banding catches ~40% at the
    boundary by design)."""
    import numpy as np
    import ray.data as rd
    from apollo_ray.config import DedupConfig
    from apollo_ray.fixtures import generate_pages
    from apollo_ray.hashing import TokenHasher
    from apollo_ray.kernels.jaccard import weighted_jaccard_sparse
    from apollo_ray.kernels.text import doc_to_bag
    from apollo_ray.oracle import oracle_clusters, same_cluster_pairs
    from apollo_ray.pipelines.dedup import run_dedup

    pages_t, truth_t = generate_pages(400)
    cfg = DedupConfig(feature_dim_log2=12, band_mode="recall")
    out = run_dedup(rd.from_arrow(pages_t), cfg)
    docs = out["docs"].to_pandas()
    cl = out["clusters"].to_pandas()
    url_of = dict(zip(docs.doc_id, docs.url))
    ours = {url_of[d]: int(c) for d, c in zip(cl.doc_id, cl.cc_id)}
    # still exactly equal to the oracle under the same config
    orc = oracle_clusters(pages_t.column("url").to_pylist(),
                          pages_t.column("html").to_pylist(), cfg)
    assert same_cluster_pairs(ours) == same_cluster_pairs(orc)
    # and boundary-pair recall is high
    text_of = dict(zip(pages_t.column("url").to_pylist(),
                       pages_t.column("text").to_pylist()))
    th = TokenHasher(seed=cfg.seed)
    cache = {}

    def bag(u):
        if u not in cache:
            cache[u] = doc_to_bag(text_of[u], th, cfg.shingle_k,
                                  cfg.feature_dim_log2)
        return cache[u]

    caught = total = 0
    for _, g in truth_t.to_pandas().groupby("cluster_id"):
        urls = list(g.url)
        for i in range(len(urls)):
            for j in range(i + 1, len(urls)):
                i1, w1 = bag(urls[i])
                i2, w2 = bag(urls[j])
                if weighted_jaccard_sparse(i1, w1, i2, w2) < cfg.threshold:
                    continue
                total += 1
                caught += (ours[urls[i]] == ours[urls[j]])
    assert total > 20
    assert caught / total >= 0.95


def test_collapse_broadcast_equals_shuffle(ray_session):
    """The metadata-shuffle + dup-broadcast collapse produces exactly
    the same reps/membership as the full-payload-shuffle fallback."""
    import ray.data as rd
    from apollo_ray.config import DedupConfig
    from apollo_ray.fixtures import generate_pages
    from apollo_ray.stages.bags import collapse_exact
    from apollo_ray.stages.extract import extract_docs
    pages_t, _ = generate_pages(400)
    docs = extract_docs(rd.from_arrow(pages_t),
                        DedupConfig(feature_dim_log2=12)).materialize()

    def canon(ds):
        df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
        df["member_ids"] = df["member_ids"].map(lambda m: tuple(sorted(m)))
        return df[["doc_id", "text", "lang", "member_ids"]]

    a = canon(collapse_exact(docs, method="broadcast"))
    b = canon(collapse_exact(docs, method="shuffle"))
    assert a.equals(b)


def test_fold_path_above_cap_shuffle_fallback(ray_session, monkeypatch):
    """Checkpoint-free fold-extract path above the dup-broadcast cap:
    rep_filter_from_membership returns None and run_dedup falls back
    to the full-payload shuffle collapse — clusters must be identical
    to the broadcast path's."""
    import ray.data as rd
    from apollo_ray import stages
    from apollo_ray.config import DedupConfig
    from apollo_ray.fixtures import generate_pages
    from apollo_ray.pipelines.dedup import run_dedup
    pages_t, _ = generate_pages(300)
    cfg = DedupConfig(feature_dim_log2=12)

    def clusters(df):
        return sorted(map(tuple, df[["doc_id", "cc_id"]].to_numpy()))

    base = run_dedup(rd.from_arrow(pages_t), cfg,
                     num_partitions=8)["clusters"].to_pandas()
    monkeypatch.setattr(stages.bags, "BROADCAST_COLLAPSE_MAX_DUPS", 0)
    forced = run_dedup(rd.from_arrow(pages_t), cfg,
                       num_partitions=8)["clusters"].to_pandas()
    assert clusters(base) == clusters(forced)
    assert base["cc_id"].nunique() < len(base)  # fixture has dups


def test_fold_path_streaming_overflow_fallback(ray_session, monkeypatch):
    """When the metadata stream overflows DRIVER_MEMBERSHIP_MAX_ROWS
    mid-iteration, run_dedup abandons the driver pull, re-materializes
    the metadata pass, and runs the distributed election + labeling —
    clusters must be identical to the driver path's."""
    import ray.data as rd
    from apollo_ray import stages
    from apollo_ray.config import DedupConfig
    from apollo_ray.fixtures import generate_pages
    from apollo_ray.pipelines.dedup import run_dedup
    pages_t, _ = generate_pages(300)
    cfg = DedupConfig(feature_dim_log2=12)

    def clusters(df):
        return sorted(map(tuple, df[["doc_id", "cc_id"]].to_numpy()))

    base = run_dedup(rd.from_arrow(pages_t), cfg,
                     num_partitions=8)["clusters"].to_pandas()
    # cap > 0 (so streaming starts) but far below 300 rows (overflow)
    monkeypatch.setattr(stages.bags, "DRIVER_MEMBERSHIP_MAX_ROWS", 10)
    over = run_dedup(rd.from_arrow(pages_t), cfg,
                     num_partitions=8)["clusters"].to_pandas()
    assert clusters(base) == clusters(over)
    assert base["cc_id"].nunique() < len(base)


def test_cluster_count_pinned_on_5k_fixture(ray_session):
    """Absolute pin of the flagship output on the deterministic 5k
    fixture at default config: 5000 labeled docs, exactly 3230
    clusters.  Catches any silent semantic drift (hashing, shingling,
    banding, collapse, CC) that the relative invariant tests might
    individually tolerate — the bench-series analog of this pin is
    n_clusters 320,057 at 500k (BENCH/BASELINE.md)."""
    import ray.data as rd
    from apollo_ray.config import DedupConfig
    from apollo_ray.fixtures import generate_pages
    from apollo_ray.pipelines.dedup import run_dedup
    pages, _ = generate_pages(5000)
    out = run_dedup(rd.from_arrow(pages), DedupConfig(), num_partitions=16)
    df = out["clusters"].to_pandas()
    assert len(df) == 5000
    assert df["cc_id"].nunique() == 3230


def test_sharded_election_matches_global_lexsort():
    """exact_membership_arrays_parallel (thread-sharded by hash bits,
    the >=1M-row driver election) must produce the exact pair SET of
    the single global lexsort — forced below the row threshold."""
    import numpy as np
    from apollo_ray.stages.bags import (exact_membership_arrays,
                                        exact_membership_arrays_parallel)
    rng = np.random.default_rng(4)
    for trial in range(20):
        n = int(rng.integers(0, 5000))
        n_groups = max(1, n // 3)
        th = rng.integers(0, 1 << 62, n_groups)[
            rng.integers(0, n_groups, n)]
        ids = rng.integers(0, 1 << 62, n)
        g = exact_membership_arrays(th, ids)
        p = exact_membership_arrays_parallel(th, ids, min_rows=0)
        a = set(zip(g.column("rep_id").to_pylist(),
                    g.column("member_id").to_pylist()))
        b = set(zip(p.column("rep_id").to_pylist(),
                    p.column("member_id").to_pylist()))
        assert a == b, trial
