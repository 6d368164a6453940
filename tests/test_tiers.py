"""Tiered dedup cascade (functions/tiers.py): exact -> url -> minhash."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from apollo_ray.config import DedupConfig
from apollo_ray.functions.tiers import tiered_dedup, tiered_dedup_sql


def _mk_docs():
    base = ("the quick brown fox jumps over the lazy dog while seventeen "
            "green bottles stand on the wall and the rain in spain falls "
            "mainly on the plain near the old stone bridge by the river ")
    near_a = base * 4
    near_b = (base * 4).replace("seventeen", "eighteen", 1)
    texts = [
        base + "unique tail zero",            # 0
        base + "unique tail zero",            # 1 exact dup of 0
        "completely different text about gardening tools and seeds "
        "planted in early spring rows of carrots and onions",      # 2
        "another unrelated document discussing medieval castles "
        "their moats drawbridges and defensive architecture",      # 3
        near_a,                               # 4
        near_b,                               # 5 near dup of 4
        "standalone document six about astronomy telescopes",      # 6
        "standalone document seven about deep sea creatures",      # 7
    ]
    urls = [
        "http://u0.com/p", "http://u1.com/p",
        "http://a.com/x",                     # 2
        "HTTP://A.com:80/x/",                 # 3 same canonical as 2
        "http://u4.com/p", "http://u5.com/p",
        "http://u6.com/p", "http://u7.com/p",
    ]
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(8)), type=pa.int64()),
        "url": pa.array(urls, type=pa.string()),
        "text": pa.array(texts, type=pa.string()),
    }))


def test_tiered_dedup_cascade(ray_session):
    out = tiered_dedup(_mk_docs(), DedupConfig(feature_dim_log2=12),
                       num_partitions=4)
    st = out["stats"].to_pandas().set_index("tier")
    # tier 1: doc 1 is an exact dup of doc 0
    assert st.loc["exact", "n_in"] == 8
    assert st.loc["exact", "n_removed"] == 1
    assert st.loc["exact", "n_out"] == 7
    # tier 2: doc 3 spells doc 2's canonical url differently
    assert st.loc["url", "n_in"] == 7
    assert st.loc["url", "n_removed"] == 1
    assert st.loc["url", "n_out"] == 6
    # tier 3: sentinels in the rollup, real counts in metrics
    assert st.loc["minhash", "n_in"] == 6
    assert st.loc["minhash", "n_removed"] == -1
    assert (st["ok"] == 1).all()
    m = out["metrics"]
    assert m["n_minhash"] == 5          # docs 4,5 merged
    surv = sorted(out["survivors"].to_pandas()["doc_id"].tolist())
    assert surv == [0, 2, 4, 6, 7]      # min doc_id wins every tier
    # clusters label exactly the tier-2 survivors
    cl = out["clusters"].to_pandas()
    assert len(cl) == 6 and cl["cc_id"].nunique() == 5


def test_tiered_rollup_matches_oracle_shape(ray_session):
    """The stats schema must equal the oracle's column set/types."""
    import duckdb
    out = tiered_dedup(_mk_docs(), DedupConfig(feature_dim_log2=12),
                       num_partitions=4)
    eng = out["stats"].to_pandas().sort_values("tier_ord")
    con = duckdb.connect()
    con.register("documents", pa.table({
        "doc_id": pa.array(list(range(4)), type=pa.int64()),
        "text": pa.array(["a b c", "a b c", "d e f", "g h i"],
                         type=pa.string())}))
    orc = con.execute(tiered_dedup_sql()).fetchdf()
    assert sorted(orc.columns) == sorted(eng.columns)
    # oracle on its own toy table: 4 docs, 1 exact dup, synthetic urls
    o = orc.set_index("tier")
    assert o.loc["exact", "n_in"] == 4 and o.loc["exact", "n_out"] == 3
    assert o.loc["minhash", "n_out"] == -1


def test_tiered_dedup_forced_hashjoin(ray_session):
    """rep_broadcast_max=0 forces the above-cap survivor chaining
    (pkey hash join instead of id broadcast) — same result."""
    out = tiered_dedup(_mk_docs(), DedupConfig(feature_dim_log2=12),
                       num_partitions=4, rep_broadcast_max=0)
    surv = sorted(out["survivors"].to_pandas()["doc_id"].tolist())
    assert surv == [0, 2, 4, 6, 7]
    st = out["stats"].to_pandas().set_index("tier")
    assert st.loc["url", "n_out"] == 6 and (st["ok"] == 1).all()


def test_tiered_dedup_no_dups(ray_session):
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([10, 20], type=pa.int64()),
        "url": pa.array(["http://x.com/1", "http://x.com/2"]),
        "text": pa.array(["first unique document text here",
                          "second entirely different text body"]),
    }))
    out = tiered_dedup(docs, DedupConfig(feature_dim_log2=12),
                       num_partitions=2)
    st = out["stats"].to_pandas()
    assert (st[st.tier != "minhash"]["n_removed"] == 0).all()
    assert out["metrics"]["n_minhash"] == 2
    assert sorted(out["survivors"].to_pandas()["doc_id"]) == [10, 20]


def test_tiered_dedup_semantic_tier(ray_session):
    """Tier 4: SemDeDup over the tier-3 survivors' embeddings.
    Docs 6 and 7 (both tier-3 survivors) get IDENTICAL embeddings ->
    cos 1.0 >= threshold, the higher-id one drops; doc 4 has no
    embedding row and passes through unjudged."""
    emb = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([0, 2, 6, 7], type=pa.int64()),
        "embedding": pa.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                               [0.0, 0.0, 1.0], [0.0, 0.0, 1.0]],
                              type=pa.list_(pa.float32())),
    }))
    out = tiered_dedup(_mk_docs(), DedupConfig(feature_dim_log2=12),
                       num_partitions=4, embeddings=emb,
                       semantic_k=1, semantic_threshold=0.95)
    st = out["stats"].to_pandas().set_index("tier")
    assert list(st.index) == ["exact", "url", "minhash", "semantic"]
    assert st.loc["semantic", "n_in"] == -1          # sentinel
    assert (st["ok"] == 1).all()
    assert out["metrics"]["n_minhash"] == 5
    assert out["metrics"]["n_semantic"] == 4
    surv = sorted(out["survivors"].to_pandas()["doc_id"].tolist())
    assert surv == [0, 2, 4, 6]


def test_tiered_semantic_oracle_shape(ray_session):
    import duckdb
    con = duckdb.connect()
    con.register("documents", pa.table({
        "doc_id": pa.array(list(range(4)), type=pa.int64()),
        "text": pa.array(["a b c", "a b c", "d e f", "g h i"],
                         type=pa.string())}))
    orc = con.execute(tiered_dedup_sql(semantic=True)).fetchdf()
    o = orc.set_index("tier")
    assert list(o.index) == ["exact", "url", "minhash", "semantic"]
    assert o.loc["semantic", "n_in"] == -1
    assert (o["ok"] == 1).all()
