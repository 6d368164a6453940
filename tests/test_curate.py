"""End-to-end corpus-curation pipeline (clean -> filter -> dedup ->
representatives)."""

import numpy as np
import pyarrow as pa
import pytest

from apollo_ray.config import DedupConfig
from apollo_ray.pipelines.curate import (CurateConfig, clean_filter_docs,
                                         cluster_representatives,
                                         curate_corpus)


def _pages(texts):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "url": pa.array([f"http://x/{i}" for i in range(len(texts))]),
        "lang": pa.array(["en"] * len(texts)),
        "text": pa.array(texts),
    }))


@pytest.fixture
def corpus():
    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "theta", "iota", "kappa", "lam"]

    def sent(n):
        return " ".join(rng.choice(words, n)) + "."

    base = "\n".join(sent(12) for _ in range(6))
    near = base.replace("alpha", "omega", 3)       # near-dup of base
    texts = [
        base,                                      # 0: keeper (rep)
        near,                                      # 1: near-dup of 0
        "tiny doc.",                               # 2: too few tokens
        "\n".join([sent(12)] * 8),                 # 3: one line repeated
        "\n".join(sent(12) for _ in range(5)),     # 4: independent keeper
    ]
    return texts


def test_clean_filter_docs(ray_session, corpus):
    from apollo_ray.stages.extract import extract_docs
    cfg = DedupConfig(feature_dim_log2=12)
    docs = extract_docs(_pages(corpus), cfg)
    kept = clean_filter_docs(docs, CurateConfig()).to_pandas()
    urls = set(kept["url"])
    assert "http://x/2" not in urls        # min_tokens
    assert "http://x/3" not in urls        # dup-line fraction
    assert {"http://x/0", "http://x/1", "http://x/4"} <= urls
    # cleaning must keep text_hash consistent with the rewritten text
    from apollo_ray.hashing import hash_utf8
    for _, r in kept.iterrows():
        assert r["text_hash"] == hash_utf8(r["text"])


def test_curate_corpus_end_to_end(ray_session, corpus):
    cfg = DedupConfig(feature_dim_log2=12, threshold=0.7)
    out = curate_corpus(_pages(corpus), cfg,
                        CurateConfig(), num_partitions=4)
    cur = out["curated"].to_pandas()
    # docs 0/1 are near-dups -> one representative; doc 4 survives
    assert len(cur) == 2
    assert set(cur["url"]) < {"http://x/0", "http://x/1", "http://x/4"}
    assert "http://x/4" in set(cur["url"])
    clusters = out["clusters"].to_pandas()
    cc = clusters.set_index("doc_id")["cc_id"]
    from apollo_ray.hashing import hash_utf8
    assert cc[hash_utf8("http://x/0")] == cc[hash_utf8("http://x/1")]


def test_cluster_representatives(ray_session):
    import ray.data as rd
    clusters = rd.from_arrow(pa.table({
        "doc_id": pa.array([5, 3, 9, 7, 1], type=pa.int64()),
        "cc_id": pa.array([1, 1, 2, 2, 3], type=pa.int64()),
    }))
    reps = cluster_representatives(clusters, num_partitions=2).to_pandas()
    assert sorted(reps["doc_id"]) == [1, 3, 7]


def test_curate_with_substring_cutting(ray_session, corpus):
    cfg = DedupConfig(feature_dim_log2=12, threshold=0.7)
    out = curate_corpus(_pages(corpus), cfg,
                        CurateConfig(cut_substrings_min_len=24),
                        num_partitions=4)
    cur = out["curated"].to_pandas()
    # the near-dup share between docs 0/1 was cut before dedup, so
    # they are no longer near-dups: both survive as representatives
    assert len(cur) == 3
    # no curated text still contains a >=24-char cross-doc substring
    from apollo_ray.functions.substring import substring_dup_spans
    import ray.data as rd
    import pyarrow as pa3
    redocs = rd.from_arrow(pa3.table({
        "doc_id": pa3.array(range(len(cur)), type=pa3.int64()),
        "text": pa3.array(list(cur["text"])),
    }))
    assert substring_dup_spans(redocs, min_len=24,
                               num_partitions=4).count() == 0


def test_curate_with_line_dedup(ray_session):
    # two long docs sharing several exact lines + one independent doc;
    # line dedup strips the shared lines from the later doc BEFORE
    # near-dedup, so both survive as representatives
    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "theta", "iota", "kappa", "lam"]

    def sent(n):
        return " ".join(rng.choice(words, n)) + "."

    shared = [sent(12) for _ in range(5)]
    own_a = [sent(12) for _ in range(4)]
    own_b = [sent(12) for _ in range(4)]
    texts = [
        "\n".join(shared + own_a),     # 0: keeps the shared lines
        "\n".join(shared + own_b),     # 1: shared lines stripped
        "\n".join(sent(12) for _ in range(5)),   # 2: independent
    ]
    cfg = DedupConfig(feature_dim_log2=12, threshold=0.7)
    out = curate_corpus(_pages(texts), cfg,
                        CurateConfig(dedup_lines=True),
                        num_partitions=4)
    cur = out["curated"].to_pandas().sort_values("url")
    assert len(cur) == 3
    t0, t1 = cur.iloc[0]["text"], cur.iloc[1]["text"]
    # first-occurrence owner is min doc_id (= url hash), so exactly ONE
    # of docs 0/1 keeps the shared lines; each keeps its own lines
    for ln in shared:
        assert (ln in t0) != (ln in t1)
    for ln in own_a:
        assert ln in t0
    for ln in own_b:
        assert ln in t1


def test_curate_redact_pii(ray_session):
    import pyarrow as pa
    import ray.data

    from apollo_ray.config import DedupConfig
    from apollo_ray.pipelines.curate import CurateConfig, curate_corpus
    from apollo_ray.fixtures import generate_pages

    from apollo_ray.fixtures import pages_from_documents
    base, _ = generate_pages(80)
    # plant an email into every doc (rebuilding pages so the HTML the
    # extractor reads carries it) — whichever cluster reps win, the
    # curated output must carry redactions
    docs_t = pa.table({
        "doc_id": pa.array(range(80), type=pa.int64()),
        "text": pa.array([t + " contact alice@example.com now"
                          for t in base.column("text").to_pylist()]),
        "lang": pa.array(["en"] * 80),
    })
    pages = pages_from_documents(docs_t)
    cfg = DedupConfig(feature_dim_log2=12)
    out = curate_corpus(ray.data.from_arrow(pages), cfg,
                        CurateConfig(clean_lines=False, min_tokens=1,
                                     redact_pii=True),
                        num_partitions=4)
    cur = out["curated"].to_pandas()
    joined = " ".join(cur["text"])
    assert "alice@example.com" not in joined
    assert "<EMAIL>" in joined or "EMAIL" in joined


def test_cluster_representatives_scored(ray_session):
    import ray.data as rd
    clusters = rd.from_arrow(pa.table({
        "doc_id": pa.array([5, 3, 9, 7, 1], type=pa.int64()),
        "cc_id": pa.array([1, 1, 2, 2, 3], type=pa.int64()),
    }))
    scores = rd.from_arrow(pa.table({
        "doc_id": pa.array([5, 3, 9, 7, 1], type=pa.int64()),
        "score": pa.array([10, 2, 4, 4, 1], type=pa.int64()),
    }))
    reps = cluster_representatives(clusters, num_partitions=2,
                                   scores=scores).to_pandas()
    # cc 1: doc 5 wins on score; cc 2: 4 == 4, min doc_id 7; cc 3: 1
    assert sorted(reps["doc_id"]) == [1, 5, 7]


def test_curate_keep_longest(ray_session, corpus):
    from apollo_ray.hashing import hash_utf8
    texts = list(corpus)
    # make the near-dup strictly longer than its cluster-mate
    texts[1] = texts[1] + "\nomega omega beta gamma delta epsilon zeta."
    cfg = DedupConfig(feature_dim_log2=12, threshold=0.5)
    out = curate_corpus(_pages(texts), cfg,
                        CurateConfig(keep_rule="longest"),
                        num_partitions=4)
    cur = out["curated"].to_pandas()
    clusters = out["clusters"].to_pandas()
    cc = clusters.set_index("doc_id")["cc_id"]
    assert cc[hash_utf8("http://x/0")] == cc[hash_utf8("http://x/1")]
    # the LONGER member of the 0/1 near-dup cluster is the keeper
    assert "http://x/1" in set(cur["url"])
    assert "http://x/0" not in set(cur["url"])
    assert "http://x/4" in set(cur["url"])


def test_curate_keep_rule_validation(ray_session, corpus):
    cfg = DedupConfig(feature_dim_log2=12, threshold=0.7)
    with pytest.raises(ValueError, match="keep_rule"):
        curate_corpus(_pages(corpus), cfg,
                      CurateConfig(keep_rule="bogus"), num_partitions=4)


def test_curate_strip_boilerplate_host_scope(ray_session):
    # two siteA pages share a nav line (df=2 within host -> stripped
    # from BOTH); siteB's single copy of the same line survives
    import ray.data as rd
    from apollo_ray.hashing import hash_utf8
    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "theta", "iota", "kappa", "lam"]

    def sent(n):
        return " ".join(rng.choice(words, n)) + "."

    nav = "Home | About | Contact"
    bodies = ["\n".join(sent(12) for _ in range(4)) for _ in range(3)]
    pages = rd.from_arrow(pa.table({
        "url": pa.array(["http://siteA/p0", "http://siteA/p1",
                         "http://siteB/p0"]),
        "lang": pa.array(["en"] * 3),
        "text": pa.array([f"{nav}\n{bodies[0]}", f"{nav}\n{bodies[1]}",
                          f"{nav}\n{bodies[2]}"]),
    }))
    cfg = DedupConfig(feature_dim_log2=12, threshold=0.9)
    out = curate_corpus(pages, cfg,
                        CurateConfig(clean_lines=False, min_tokens=1,
                                     strip_boiler_min_df=2),
                        num_partitions=4)
    cur = out["curated"].to_pandas().set_index("url")
    assert len(cur) == 3
    assert nav not in cur.loc["http://siteA/p0", "text"]
    assert nav not in cur.loc["http://siteA/p1", "text"]
    assert cur.loc["http://siteB/p0", "text"].startswith(nav)
    # helper columns dropped, text_hash refreshed after the rewrite
    assert "host" not in cur.columns and "n_boiler_lines" not in cur.columns
    for u, r in cur.iterrows():
        assert r["text_hash"] == hash_utf8(r["text"])


def test_curate_drop_code(ray_session):
    import pyarrow as pa
    import ray.data
    from apollo_ray.pipelines.curate import CurateConfig, clean_filter_docs
    docs = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": [
            "def f(x):\n    return x + 1;\nvar y = {a: 1};",
            "plain varied prose with distinct words in every clause "
            "so neither repetition cap trips on this document",
        ],
        "text_hash": pa.array([11, 22], type=pa.int64()),
        "lang": pa.array(["en", "en"]),
    })
    ccfg = CurateConfig(clean_lines=False, min_tokens=1, drop_code=True)
    out = clean_filter_docs(ray.data.from_arrow(docs), ccfg).to_pandas()
    assert out.doc_id.tolist() == [2]
    # without the flag the code doc survives the same thresholds
    ccfg2 = CurateConfig(clean_lines=False, min_tokens=1)
    out2 = clean_filter_docs(ray.data.from_arrow(docs), ccfg2).to_pandas()
    assert sorted(out2.doc_id.tolist()) == [1, 2]


def test_priority_keep_rule(ray_session):
    """keep_rule='priority': the near-dup cluster representative is
    the doc from the best-ranked HOST (listed best-first), not the
    min doc_id."""
    import ray.data as rd
    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    base = " ".join(rng.choice(words, 80))
    pages = rd.from_arrow(pa.table({
        # same content on a mirror host and on the curated host; the
        # mirror's url hashes to whatever doc_id — priority must win
        # regardless of id order
        "url": pa.array(["http://mirror.example/a",
                         "http://curated.example/a",
                         "http://other.example/b"]),
        "lang": pa.array(["en"] * 3),
        "text": pa.array([base, base, " ".join(rng.choice(words, 60))]),
    }))
    cfg = DedupConfig(feature_dim_log2=12)
    ccfg = CurateConfig(clean_lines=False, min_tokens=5,
                        keep_rule="priority",
                        priority_hosts=("curated.example",))
    out = curate_corpus(pages, cfg, ccfg)
    kept = out["curated"].to_pandas()
    assert len(kept) == 2
    hosts = {u.split("/")[2] for u in kept["url"]}
    assert hosts == {"curated.example", "other.example"}
