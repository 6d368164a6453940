"""Stage-level tests: verification (A4), communities, report, query."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def small_run(ray_session):
    import ray.data as rd
    from apollo_ray.config import DedupConfig
    from apollo_ray.fixtures import generate_pages
    from apollo_ray.pipelines.dedup import run_dedup

    pages_t, truth_t = generate_pages(300)
    cfg = DedupConfig(feature_dim_log2=12)
    out = run_dedup(rd.from_arrow(pages_t), cfg, with_communities=True)
    return pages_t, cfg, out


def test_verify_edges_filters_below_threshold(small_run):
    from apollo_ray.stages.edges import bucket_star_edges
    from apollo_ray.stages.verify import verify_edges
    pages_t, cfg, out = small_run
    edges = bucket_star_edges(out["bands"], cfg, num_partitions=8)
    verified = verify_edges(edges, out["bags"], cfg).to_pandas()
    if len(verified):
        assert (verified["similarity"] >= cfg.threshold).all()
    # verification can only remove edges
    assert len(verified) <= edges.count()


def test_verified_pipeline_subset_of_unverified(ray_session):
    import ray.data as rd
    from apollo_ray.config import DedupConfig
    from apollo_ray.fixtures import generate_pages
    from apollo_ray.oracle import same_cluster_pairs
    from apollo_ray.pipelines.dedup import run_dedup
    pages_t, _ = generate_pages(300)
    base_cfg = DedupConfig(feature_dim_log2=12)
    loose = run_dedup(rd.from_arrow(pages_t), base_cfg)
    strict = run_dedup(rd.from_arrow(pages_t), base_cfg.with_(verify=True))
    lab_l = dict(zip(*[loose["clusters"].to_pandas()[c] for c in ("doc_id", "cc_id")]))
    lab_s = dict(zip(*[strict["clusters"].to_pandas()[c] for c in ("doc_id", "cc_id")]))
    p_l = same_cluster_pairs({str(k): int(v) for k, v in lab_l.items()})
    p_s = same_cluster_pairs({str(k): int(v) for k, v in lab_s.items()})
    assert p_s <= p_l                        # precision tier only removes pairs


def test_communities_cover_fat_components(small_run):
    """Communities run over exact-dedup representatives (the reference
    collapses identical contents to one sha1 upstream, apollo/bags.py:15;
    members inherit their representative's community).  Every CC with
    >= 2 representatives must be processed and fully covered."""
    pages_t, cfg, out = small_run
    comms = out["communities"].to_pandas()
    cl = out["clusters"].to_pandas()
    rep_ids = set(out["reps"].to_pandas().doc_id)
    cl_reps = cl[cl.doc_id.isin(rep_ids)]
    sizes = cl_reps.groupby("cc_id").size()
    fat = set(sizes[sizes >= 2].index)
    covered = set(comms["cc_id"].unique())
    assert covered == fat
    for cc in fat:
        members = set(cl_reps[cl_reps.cc_id == cc].doc_id)
        assert set(comms[comms.cc_id == cc].doc_id) == members


def test_community_size_stats(small_run):
    from apollo_ray.stages.communities_stage import community_size_stats
    _, _, out = small_run
    stats = community_size_stats(out["communities"])
    if stats["n_communities"]:
        assert stats["max_size"] >= stats["median_size"] >= 1


def test_cluster_report_and_render(small_run):
    from apollo_ray.stages.report import cluster_report, render_markdown
    _, _, out = small_run
    rep = cluster_report(out["clusters"], out["docs"]).to_pandas()
    # only clusters of size >= 2, sorted deterministically
    sizes = rep.groupby("cc_id").size()
    assert (sizes >= 2).all()
    assert list(rep.cc_id) == sorted(rep.cc_id)
    md = render_markdown(rep)
    assert md.startswith("# Duplicate clusters")
    assert md.count("## cluster") == len(sizes)


def test_query_similar_finds_duplicate(small_run):
    from apollo_ray.stages.report import query_similar
    pages_t, cfg, out = small_run
    docs = out["docs"].to_pandas()
    # probe with the exact text of some doc that has a duplicate
    cl = out["clusters"].to_pandas()
    sizes = cl.groupby("cc_id").size()
    fat_cc = sizes[sizes >= 2].index
    assert len(fat_cc) > 0
    target_doc = cl[cl.cc_id == fat_cc[0]].doc_id.iloc[0]
    text = docs[docs.doc_id == target_doc].text.iloc[0]
    hits = query_similar(text, out["bands"], out["bags"], cfg, precise=False)
    assert int(target_doc) in hits or len(hits) > 0
    hits_precise = query_similar(text, out["bands"], out["bags"], cfg,
                                 precise=True)
    assert set(hits_precise) <= set(hits)
    assert int(target_doc) in hits_precise   # identical text -> J = 1


def test_latest_per_url(ray_session):
    import ray.data as rd
    from apollo_ray.config import DedupConfig
    from apollo_ray.stages.extract import extract_docs
    ts = np.array([0, 100, 50], dtype="datetime64[s]").astype("datetime64[us]")
    pages = rd.from_arrow(pa.table({
        "url": pa.array(["u1", "u1", "u2"]),
        "warc_ts": pa.array(ts, type=pa.timestamp("us")),
        "html": pa.array([b"<body><p>a</p></body>", b"<body><p>b</p></body>",
                          b"<body><p>c</p></body>"], type=pa.binary()),
        "lang": pa.array(["en"] * 3),
    }))
    cfg = DedupConfig()
    docs = extract_docs(pages, cfg, latest_per_url=True).to_pandas()
    assert len(docs) == 2
    assert set(docs[docs.url == "u1"].text) == {"b"}   # newest snapshot wins


def test_history_depth_n(ray_session):
    """--dzhigurda analog: keep the newest N snapshots per url."""
    import ray.data as rd
    from apollo_ray.config import DedupConfig
    from apollo_ray.stages.extract import extract_docs
    ts = np.array([0, 100, 50, 10], dtype="datetime64[s]") \
        .astype("datetime64[us]")
    pages = rd.from_arrow(pa.table({
        "url": pa.array(["u1", "u1", "u1", "u2"]),
        "warc_ts": pa.array(ts, type=pa.timestamp("us")),
        "html": pa.array([b"<body><p>a</p></body>", b"<body><p>b</p></body>",
                          b"<body><p>c</p></body>", b"<body><p>d</p></body>"],
                         type=pa.binary()),
        "lang": pa.array(["en"] * 4),
    }))
    docs = extract_docs(pages, DedupConfig(), latest_per_url=True,
                        history_depth=2).to_pandas()
    assert set(docs[docs.url == "u1"].text) == {"b", "c"}  # newest 2
    assert set(docs[docs.url == "u2"].text) == {"d"}


def test_quadratic_edge_mode(small_run):
    from apollo_ray.stages.communities_stage import detect_communities
    pages_t, cfg, out = small_run
    comms_q = detect_communities(
        out["clusters"].materialize(),
        out["bands"].select_columns(["doc_id", "bucket"]).materialize(),
        cfg, edges="quadratic").to_pandas()
    comms_l = out["communities"].to_pandas()
    # both modes cover the same fat components and the same docs
    assert set(comms_q.cc_id.unique()) == set(comms_l.cc_id.unique())
    assert set(comms_q.doc_id) == set(comms_l.doc_id)


def test_query_similar_by_id_matches_text_probe(small_run):
    """An indexed doc queried by id (stored signature, the hashtables2
    reverse-index analog) returns the same result set as probing with
    its own text, minus the doc itself (J4 self-exclusion)."""
    from apollo_ray.stages.report import query_similar, query_similar_by_id
    pages_t, cfg, out = small_run
    docs = out["docs"].to_pandas()
    cl = out["clusters"].to_pandas()
    sizes = cl.groupby("cc_id").size()
    fat_cc = sizes[sizes >= 2].index
    target = int(cl[cl.cc_id == fat_cc[0]].doc_id.iloc[0])
    text = docs[docs.doc_id == target].text.iloc[0]
    by_text = query_similar(text, out["bands"], out["bags"], cfg,
                            precise=False)
    by_id = query_similar_by_id(target, out["signatures"], out["bands"],
                                out["bags"], cfg, precise=False)
    assert set(by_id) == set(by_text) - {target}
    by_id_precise = query_similar_by_id(target, out["signatures"],
                                        out["bands"], out["bags"], cfg,
                                        precise=True)
    assert set(by_id_precise) <= set(by_id)


def test_query_by_unknown_id_raises(small_run):
    from apollo_ray.stages.report import query_similar_by_id
    pages_t, cfg, out = small_run
    with pytest.raises(KeyError):
        query_similar_by_id(-12345, out["signatures"], out["bands"],
                            out["bags"], cfg)


def test_bucket_pair_edges_all_pairs_and_cap(ray_session):
    """Verify-tier edges: full co-bucket pairs below the cap; star
    fallback (connectivity-preserving) above it."""
    import ray.data as rd
    from apollo_ray.config import DedupConfig
    from apollo_ray.stages.edges import bucket_pair_edges
    bands = rd.from_arrow(pa.table({
        "band_id": pa.array([0] * 5, type=pa.int32()),
        "bucket": pa.array([7, 7, 7, 9, 9], type=pa.int64()),
        "doc_id": pa.array([3, 1, 2, 5, 4], type=pa.int64()),
    }))
    cfg = DedupConfig()
    df = bucket_pair_edges(bands, cfg, num_partitions=4).to_pandas()
    pairs = set(map(tuple, np.sort(df[["u", "v"]].values, axis=1).tolist()))
    assert pairs == {(1, 2), (1, 3), (2, 3), (4, 5)}
    # cap: bucket of 4 docs => 6 pairs > max_bucket_pairs=3 -> star (3 edges)
    bands2 = rd.from_arrow(pa.table({
        "band_id": pa.array([0] * 4, type=pa.int32()),
        "bucket": pa.array([7] * 4, type=pa.int64()),
        "doc_id": pa.array([4, 2, 3, 1], type=pa.int64()),
    }))
    cfg2 = DedupConfig(max_bucket_pairs=3)
    df2 = bucket_pair_edges(bands2, cfg2, num_partitions=4).to_pandas()
    pairs2 = set(map(tuple, np.sort(df2[["u", "v"]].values, axis=1).tolist()))
    assert pairs2 == {(1, 2), (1, 3), (1, 4)}   # star around the minimum


def test_verify_tier_keeps_mutual_pairs(ray_session):
    """Two docs >= threshold to each other stay connected under
    verify=True even when neither is the bucket minimum's neighbor —
    the recall property all-pairs verification restores."""
    import ray.data as rd
    from apollo_ray.config import DedupConfig
    from apollo_ray.fixtures import generate_pages
    from apollo_ray.pipelines.dedup import run_dedup
    pages_t, _ = generate_pages(300)
    cfg = DedupConfig(feature_dim_log2=12, verify=True)
    out = run_dedup(rd.from_arrow(pages_t), cfg)
    cl = out["clusters"].to_pandas()
    assert len(cl) == out["docs"].count()


def test_query_similar_batch_parity(ray_session):
    """Batch probe join returns exactly the per-probe query_similar
    candidate sets (estimate mode) for every probe."""
    import pyarrow as pa
    import ray.data

    from apollo_ray.config import DedupConfig
    from apollo_ray.fixtures import generate_pages
    from apollo_ray.pipelines.dedup import run_dedup
    from apollo_ray.stages.report import query_similar, query_similar_batch

    cfg = DedupConfig(feature_dim_log2=12)
    pages, _ = generate_pages(300)
    out = run_dedup(ray.data.from_arrow(pages), cfg, num_partitions=8)
    bands, bags = out["bands"], out["bags"]

    texts = pages.column("text").to_pylist()[:12]
    probes = ray.data.from_arrow(pa.table({
        "probe_id": pa.array(range(12), type=pa.int64()),
        "text": pa.array(texts)}))
    got = query_similar_batch(probes, bands, cfg).to_pandas()
    got_sets = {pid: set(g["doc_id"]) for pid, g in got.groupby("probe_id")}
    n_nonempty = 0
    for pid, text in enumerate(texts):
        want = set(query_similar(text, bands, bags, cfg, precise=False))
        assert got_sets.get(pid, set()) == want, f"probe {pid}"
        n_nonempty += bool(want)
    assert n_nonempty > 0   # probes copied from the corpus match it


def test_query_similar_batch_empty_and_cap(ray_session):
    import pyarrow as pa
    import ray.data

    from apollo_ray.config import DedupConfig
    from apollo_ray.fixtures import generate_pages
    from apollo_ray.pipelines.dedup import run_dedup
    from apollo_ray.stages.report import query_similar_batch

    cfg = DedupConfig(feature_dim_log2=12)
    pages, _ = generate_pages(120)
    out = run_dedup(ray.data.from_arrow(pages), cfg, num_partitions=4)
    probes = ray.data.from_arrow(pa.table({
        "probe_id": pa.array([0], type=pa.int64()),
        "text": pa.array([pages.column("text")[0].as_py()])}))
    # max_bucket=0 caps every bucket -> no pairs at all
    got = query_similar_batch(probes, out["bands"], cfg,
                              max_bucket=0).to_pandas()
    assert len(got) == 0


def test_query_similar_batch_precise_parity(ray_session):
    """Precise batch tier == per-probe query_similar(precise=True)."""
    import pyarrow as pa
    import ray.data

    from apollo_ray.config import DedupConfig
    from apollo_ray.fixtures import generate_pages
    from apollo_ray.pipelines.dedup import run_dedup
    from apollo_ray.stages.report import query_similar, query_similar_batch

    cfg = DedupConfig(feature_dim_log2=12)
    pages, _ = generate_pages(250)
    out = run_dedup(ray.data.from_arrow(pages), cfg, num_partitions=8)
    texts = pages.column("text").to_pylist()[:8]
    probes = ray.data.from_arrow(pa.table({
        "probe_id": pa.array(range(8), type=pa.int64()),
        "text": pa.array(texts)}))
    got = query_similar_batch(probes, out["bands"], cfg, precise=True,
                              bags_ds=out["bags"]).to_pandas()
    assert "similarity" in got.columns
    got_sets = {pid: set(g["doc_id"]) for pid, g in got.groupby("probe_id")}
    n_nonempty = 0
    for pid, text in enumerate(texts):
        want = set(query_similar(text, out["bands"], out["bags"], cfg,
                                 precise=True))
        assert got_sets.get(pid, set()) == want, f"probe {pid}"
        n_nonempty += bool(want)
    assert n_nonempty > 0


def test_read_pages_jsonl(tmp_path, ray_session):
    import json as _json

    from apollo_ray.config import DedupConfig
    from apollo_ray.sources.io import read_pages_jsonl
    from apollo_ray.stages.extract import extract_docs

    p = tmp_path / "dump.jsonl"
    rows = [
        {"url": "https://a.example/1", "text": "hello world one two",
         "lang": "en", "warc_ts": 1700000000},
        {"url": "https://b.example/2", "text": "bonjour le monde",
         "lang": "fr"},
        {"url": "https://c.example/3", "text": "hello world one two",
         "lang": "en"},
    ]
    p.write_text("\n".join(_json.dumps(r) for r in rows))

    pages = read_pages_jsonl(str(p))
    t = pages.to_pandas()
    assert set(t.columns) == {"url", "warc_ts", "html", "text", "lang"}
    assert len(t) == 3
    # the synthesized html round-trips byte-identically through extract
    docs = extract_docs(pages, DedupConfig(feature_dim_log2=12)) \
        .to_pandas()
    assert sorted(docs["text"]) == sorted(r["text"] for r in rows)

    only_en = read_pages_jsonl(str(p), lang_filter=["en"]).to_pandas()
    assert len(only_en) == 2 and (only_en["lang"] == "en").all()


def test_salted_bucket_edges_connectivity_equivalent(ray_session):
    """bucket_salt=8 (two-level salted exchange) must produce the same
    final clustering as the default single-level salt=1 path — the salt
    changes partitioning and intermediate edge shape only (star-of-
    stars = star), never connectivity.  Keeps the mega-bucket skew path
    exercised now that salt=1 is the default."""
    import ray.data as rd
    from apollo_ray.config import DedupConfig
    from apollo_ray.fixtures import generate_pages
    from apollo_ray.pipelines.dedup import run_dedup

    pages_t, _ = generate_pages(400)
    base = DedupConfig(feature_dim_log2=12)
    assert base.bucket_salt == 1
    flat = run_dedup(rd.from_arrow(pages_t), base)
    salted = run_dedup(rd.from_arrow(pages_t),
                       base.with_(bucket_salt=8))
    a = flat["clusters"].to_pandas().sort_values("doc_id")
    b = salted["clusters"].to_pandas().sort_values("doc_id")
    assert (a["doc_id"].to_numpy() == b["doc_id"].to_numpy()).all()
    assert (a["cc_id"].to_numpy() == b["cc_id"].to_numpy()).all()


def test_biclique_shortcut_equals_full_detection(small_run):
    """The complete-biclique fast path must not change any community
    assignment: run detect_communities with the shortcut on and off
    over the real fixture (mixed tight/loose CC topologies) and
    compare row-for-row."""
    from apollo_ray.stages.communities_stage import detect_communities
    pages_t, cfg, out = small_run
    kw = dict(algorithm=cfg.community_algorithm)
    on = detect_communities(
        out["clusters"].materialize(),
        out["bands"].select_columns(["doc_id", "bucket"]).materialize(),
        cfg, biclique_shortcut=True, **kw).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    off = detect_communities(
        out["clusters"].materialize(),
        out["bands"].select_columns(["doc_id", "bucket"]).materialize(),
        cfg, biclique_shortcut=False, **kw).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert on.equals(off)
    assert len(on) > 0


def test_communities_broadcast_equals_hashjoin(small_run):
    """The broadcast label-attach fast path (one ray.put + fused
    attach/filter/pkey map, singletons pre-filtered) must emit exactly
    the hash-join route's communities."""
    from apollo_ray.stages.communities_stage import detect_communities
    pages_t, cfg, out = small_run
    kw = dict(algorithm=cfg.community_algorithm)
    bc = detect_communities(
        out["clusters"].materialize(),
        out["bands"].select_columns(["doc_id", "bucket"]).materialize(),
        cfg, **kw).to_pandas().sort_values("doc_id").reset_index(drop=True)
    hj = detect_communities(
        out["clusters"].materialize(),
        out["bands"].select_columns(["doc_id", "bucket"]).materialize(),
        cfg, label_broadcast_max=0, **kw).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert bc.equals(hj)
    assert len(bc) > 0


def test_communities_routes_agree_on_foreign_membership_docs(ray_session):
    """Membership rows whose doc_id is absent from ``clusters`` must be
    DROPPED by both attach routes (the hash-join inner join does this
    naturally; the broadcast path requires a lookup hit before keeping
    a row).  Adversarial input: a foreign doc whose id equals a fat
    cc_id — the old broadcast path self-labeled it cc=doc_id and kept
    it."""
    import pandas as pd
    import ray.data as rd
    from apollo_ray.config import DedupConfig
    from apollo_ray.stages.communities_stage import detect_communities

    cfg = DedupConfig()
    # fat cc 100 with docs {100, 101, 102}; foreign doc 100 appears in
    # memberships only via a doc id NOT in clusters: use id 300 == no
    # cluster row, and id 100 itself is clustered (normal).  Also a
    # foreign doc whose id equals the fat cc_id: id 100 is in clusters,
    # so use cc_id 500 with members {500, 501} and foreign doc 500?
    # -> foreign means NOT in clusters; so clusters omit 500 while a
    # membership row for 500 exists, and 500 is also a cc label of the
    # fat cc {501, 502} (min-labeled 501? labels are arbitrary ints
    # here — use explicit cc ids).
    clusters = rd.from_pandas(pd.DataFrame({
        "doc_id": [100, 101, 102, 501, 502],
        "cc_id":  [100, 100, 100, 500, 500]}))
    memberships = rd.from_pandas(pd.DataFrame({
        "doc_id": [100, 101, 102, 501, 502, 500, 300],
        "bucket": [7,   7,   7,   8,   8,   8,   7]}))
    # doc 500: NOT in clusters, but its id equals fat cc label 500
    # doc 300: NOT in clusters, plain foreign row
    kw = dict(algorithm="label_propagation")
    bc = detect_communities(clusters, memberships, cfg, **kw) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    hj = detect_communities(clusters, memberships, cfg,
                            label_broadcast_max=0, **kw) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert bc.equals(hj), (bc, hj)
    assert 500 not in set(bc["doc_id"])
    assert 300 not in set(bc["doc_id"])


def test_mega_cc_bound_emits_single_community(ray_session):
    """CCs above fat_cc_max_docs skip detection and come back as one
    min-doc-labeled community (the documented mega-CC scale boundary);
    in-bound CCs are unaffected."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from apollo_ray.config import DedupConfig
    from apollo_ray.stages.communities_stage import detect_communities

    cfg = DedupConfig()
    # fat CC 1: 40 docs across two disjoint bucket groups (would split
    # into 2 communities when detection runs); CC 2: small control
    docs1 = np.arange(100, 140, dtype=np.int64)
    rows = []
    for d in docs1[:20]:
        rows.append((int(d), 7))
    for d in docs1[20:]:
        rows.append((int(d), 8))
    rows += [(500, 20), (501, 20)]
    mem = pd.DataFrame(rows, columns=["doc_id", "bucket"])
    clusters = pd.DataFrame({
        "doc_id": list(docs1) + [500, 501],
        "cc_id": [100] * 40 + [500, 500]})
    kw = dict(algorithm="label_propagation", biclique_shortcut=False)
    bounded = detect_communities(rd.from_pandas(clusters),
                                 rd.from_pandas(mem), cfg,
                                 fat_cc_max_docs=30, **kw).to_pandas()
    fat = bounded[bounded["cc_id"] == 100]
    assert len(fat) == 40 and set(fat["community_id"]) == {100}
    unbounded = detect_communities(rd.from_pandas(clusters),
                                   rd.from_pandas(mem), cfg,
                                   **kw).to_pandas()
    fat_u = unbounded[unbounded["cc_id"] == 100]
    assert set(fat_u["community_id"]) == {100, 120}
    # the small CC is identical under both
    small_b = bounded[bounded["cc_id"] == 500].sort_values("doc_id")
    small_u = unbounded[unbounded["cc_id"] == 500].sort_values("doc_id")
    assert small_b.reset_index(drop=True).equals(
        small_u.reset_index(drop=True))
