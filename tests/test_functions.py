"""Tests for the training-data operator modules (textstats,
dedup_extras, ann, multimodal) against small in-memory fixtures."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture()
def docs_ds(ray_session):
    import ray.data as rd
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "text": pa.array([
            "the cat sat on the mat",
            "the cat sat on the mat",          # exact dup of doc 1
            "a dog ran in the park today",
            "the cat sat on the red mat",      # near dup of doc 1
            "",                                 # empty doc
        ]),
        "lang": pa.array(["en", "en", "en", "de", "en"]),
        "n_chars": pa.array([22, 22, 27, 26, 0], type=pa.int64()),
    })
    return rd.from_arrow(t)


def test_exact_dedup_groups(docs_ds):
    from apollo_ray.functions.dedup_extras import exact_dedup_groups
    df = exact_dedup_groups(docs_ds).to_pandas().sort_values("rep_id")
    assert len(df) == 4                       # 5 docs, 1 exact dup
    row = df[df.rep_id == 1].iloc[0]
    assert row.n_members == 2


def test_token_and_shingle_counts(docs_ds):
    from apollo_ray.functions.dedup_extras import shingle_counts
    from apollo_ray.functions.textstats import token_counts
    tc = token_counts(docs_ds).to_pandas().set_index("doc_id")["n_tokens"]
    assert tc.loc[1] == 6 and tc.loc[5] == 0
    sc = shingle_counts(docs_ds, k=3).to_pandas().set_index("doc_id")["n_shingles"]
    assert sc.loc[1] == 4                      # 6 tokens -> 4 3-shingles
    assert sc.loc[5] == 0


def test_docfreq(docs_ds):
    from apollo_ray.functions.textstats import docfreq
    df = docfreq(docs_ds).to_pandas().set_index("token")["df"]
    assert df.loc["the"] == 4                  # docs 1, 2, 3, 4
    assert df.loc["dog"] == 1


def test_quality_stats(docs_ds):
    from apollo_ray.functions.textstats import quality_stats_table
    q = quality_stats_table(docs_ds).to_pandas().set_index("doc_id")
    assert q.loc[1, "n_tokens"] == 6
    assert q.loc[1, "n_stopwords"] == 3        # the, on, the
    assert q.loc[5, "n_chars"] == 0


def test_ngram_jaccard_pairs(docs_ds):
    from apollo_ray.functions.dedup_extras import ngram_jaccard_pairs
    df = ngram_jaccard_pairs(docs_ds, k=3, threshold=0.99).to_pandas()
    # only the exact dup pair has Jaccard 1.0 at threshold ~1
    assert set(map(tuple, df[["u", "v"]].values.tolist())) == {(1, 2)}
    df2 = ngram_jaccard_pairs(docs_ds, k=3, threshold=0.3).to_pandas()
    pairs = set(map(tuple, df2[["u", "v"]].values.tolist()))
    assert (1, 2) in pairs and (1, 4) in pairs


def test_simhash_pairs(docs_ds):
    from apollo_ray.functions.dedup_extras import simhash_pairs
    df = simhash_pairs(docs_ds, max_hamming=0).to_pandas()
    assert (df[["u", "v"]].values == [1, 2]).all(axis=1).any()


def test_lang_id_fingerprint(docs_ds):
    from apollo_ray.functions.textstats import lang_id
    df = lang_id(docs_ds).to_pandas().set_index("doc_id")
    # exact dup docs share a fingerprint
    assert df.loc[1, "fingerprint"] == df.loc[2, "fingerprint"]
    assert df.loc[1, "lang_pred"] == "en"


def test_events_hourly(ray_session):
    import ray.data as rd
    from apollo_ray.functions.textstats import events_hourly, user_last_event
    ts = pa.array(np.array([0, 1800, 3600, 7200], dtype="datetime64[s]")
                  .astype("datetime64[us]"), type=pa.timestamp("us"))
    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2], type=pa.int64()),
        "ts": ts,
        "value": pa.array([1.0, 2.0, 3.0, 4.0]),
    }))
    df = events_hourly(ev).to_pandas()
    assert len(df) == 3                        # u1: hours 0, 1; u2: hour 2
    h0 = df[(df.user_id == 1) & (df.hour_us == 0)].iloc[0]
    assert h0.n == 2 and h0.sum_value_r4 == 3.0
    last = user_last_event(ev).to_pandas().set_index("user_id")
    assert last.loc[1, "n_events"] == 3
    assert last.loc[1, "last_ts_us"] == 3_600_000_000


def test_ann_brute_force_and_lsh(ray_session):
    import ray.data as rd
    from apollo_ray.functions.ann import (cosine_close_pairs, cosine_topk,
                                          lsh_buckets)
    rng = np.random.default_rng(4)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    base[1] = base[0] + 0.01 * rng.standard_normal(16)   # near-dup of 0
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(40), type=pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in base],
                              type=pa.list_(pa.float32())),
    }))
    close = cosine_close_pairs(emb, query_ids=[0], threshold=0.9).to_pandas()
    assert 1 in set(close.vec_id)
    topk = cosine_topk(emb, query_ids=[0], k=3).to_pandas()
    assert list(topk.sort_values("cos_r3", ascending=False).vec_id)[0] == 1
    # LSH buckets put the near-dup pair together (few planes => certain)
    b = lsh_buckets(emb, dim=16, n_planes=4).to_pandas().set_index("vec_id")
    assert b.loc[0, "bucket"] == b.loc[1, "bucket"]


def test_multimodal_plumbing(ray_session):
    import ray.data as rd
    from apollo_ray.functions.multimodal import (FEATURE_DIM,
                                                 extract_binary_features)
    t = pa.table({
        "item_id": pa.array([1, 2], type=pa.int64()),
        "payload": pa.array([b"\x00\x10\x20\x30" * 100, b""], type=pa.binary()),
    })
    out = extract_binary_features(rd.from_arrow(t), batch_size=1).to_pandas()
    assert len(out) == 2
    assert out.loc[out.item_id == 1, "payload_bytes"].iloc[0] == 400
    feats = out["features"].iloc[0]
    assert len(feats) == FEATURE_DIM
    # deterministic fake: histogram sums to 1
    assert abs(sum(feats) - 1.0) < 1e-5


def test_multimodal_strict_raises(ray_session):
    from apollo_ray.functions.multimodal import BinaryFeatureExtractor
    ex = BinaryFeatureExtractor(mode="strict")
    t = pa.table({"payload": pa.array([b"xx"], type=pa.binary())})
    with pytest.raises(NotImplementedError):
        ex(t)


def test_ivf_topk_recall_vs_bruteforce(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from apollo_ray.functions.ann import cosine_topk, ivf_topk
    rng = np.random.default_rng(7)
    base = rng.standard_normal((300, 16)).astype(np.float32)
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(300), type=pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in base],
                              type=pa.list_(pa.float32())),
    }))
    qids = [0, 1, 2]
    bf = cosine_topk(emb, query_ids=qids, k=5).to_pandas()
    ivf = ivf_topk(emb, base[qids], qids, k=5, n_centroids=8,
                   nprobe=6).to_pandas()
    # high nprobe (6 of 8 buckets) => recall vs brute force near 1
    hits = 0
    for q in qids:
        want = set(bf[bf.query_id == q].vec_id)
        got = set(ivf[ivf.query_id == q].vec_id)
        hits += len(want & got) / max(1, len(want))
    assert hits / len(qids) >= 0.6


def test_vocabulary_cap():
    from apollo_ray.config import DedupConfig
    from apollo_ray.kernels.text import effective_min_df
    df = np.array([0, 5, 3, 9, 1, 1], dtype=np.int64)
    cfg = DedupConfig(vocabulary_size=2)
    # top-2 dfs are 9 and 5 -> cutoff 5
    assert effective_min_df(df, cfg) == 5
    assert effective_min_df(df, DedupConfig()) == 1
    assert effective_min_df(df, DedupConfig(vocabulary_size=100)) == 1


def test_render_template(ray_session):
    import pandas as pd
    from apollo_ray.stages.report import render_template
    df = pd.DataFrame({"cc_id": [1, 1, 7], "doc_id": [1, 2, 7],
                       "url": ["u1", "u2", "u7"]})
    out = render_template(df)
    assert "cluster 1 (2 docs)" in out and "- u2" in out
    custom = render_template(df, "{% for c, rows in clusters %}{{ c }};{% endfor %}")
    assert custom == "1;7;"


def _rand_emb_ds(n=120, dim=24, n_dup=40, seed=11, noise=0.2):
    import ray.data as rd
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim))
    pert = base[:n_dup] + noise * rng.standard_normal((n_dup, dim))
    m = np.vstack([base, pert]).astype(np.float32)
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(m)), type=pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in m],
                              type=pa.list_(pa.float32())),
    })), m


def _brute_pairs(m, threshold):
    mn = m.astype(np.float64)
    mn = mn / np.linalg.norm(mn, axis=1, keepdims=True)
    cos = np.round(mn @ mn.T, 3)
    ai, bi = np.nonzero(cos >= threshold)
    return {(int(a), int(b)) for a, b in zip(ai, bi) if a < b}


def test_embedding_dup_pairs_blocked_exact(ray_session):
    """The blocked block-pair scheme equals driver-side brute force
    exactly (every pair counted once) and never collects the corpus."""
    from apollo_ray.functions.ann import embedding_dup_pairs
    emb, m = _rand_emb_ds()
    got = embedding_dup_pairs(emb, threshold=0.5, block_rows=37).to_pandas()
    pairs = set(zip(got.u.astype(int), got.v.astype(int)))
    assert pairs == _brute_pairs(m, 0.5)
    assert len(pairs) == len(got)              # no duplicate emission


def test_embedding_dup_pairs_lsh_recall(ray_session):
    """Auto-tuned OR-amplified hyperplane LSH catches >= 95% of the
    exact pairs in the near-dup regime (threshold 0.85)."""
    from apollo_ray.functions.ann import (embedding_dup_pairs,
                                          embedding_dup_pairs_lsh,
                                          lsh_tables_for_recall)
    assert lsh_tables_for_recall(0.9, 8) < lsh_tables_for_recall(0.8, 8)
    emb, m = _rand_emb_ds(n=150, dim=32, n_dup=60, seed=3, noise=0.22)
    exact = _brute_pairs(m, 0.85)
    assert len(exact) >= 30                    # fixture sanity
    got = embedding_dup_pairs_lsh(emb, threshold=0.85, dim=32).to_pandas()
    pairs = set(zip(got.u.astype(int), got.v.astype(int)))
    assert pairs <= _brute_pairs(m, 0.85) | exact  # rescore: no false pos
    assert len(pairs & exact) / len(exact) >= 0.95


def test_cosine_topk_partial_equals_global(ray_session):
    """Per-batch partial top-k equals a full-sort global top-k."""
    from apollo_ray.functions.ann import cosine_topk
    emb, m = _rand_emb_ds(n=80, dim=16, n_dup=20, seed=9)
    got = cosine_topk(emb, query_ids=[0, 5, 7], k=4).to_pandas()
    mn = m.astype(np.float64)
    mn = mn / np.linalg.norm(mn, axis=1, keepdims=True)
    cos = np.round(mn @ mn.T, 3)
    for q in (0, 5, 7):
        mine = got[got.query_id == q].sort_values(
            ["cos_r3", "vec_id"], ascending=[False, True])
        order = sorted((i for i in range(len(m)) if i != q),
                       key=lambda i: (-cos[q, i], i))[:4]
        assert list(mine.vec_id) == order
        assert np.allclose(list(mine.cos_r3), [cos[q, i] for i in order])


def test_repetition_stats(ray_session):
    import ray.data as rd
    from apollo_ray.functions.textstats import repetition_stats
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array([
            "aa bb\naa bb\ncc",       # dup line "aa bb" x2
            "x y x y x z",            # dup 2-gram "x y" x2
            "",                       # single empty line
        ]),
    })
    df = repetition_stats(rd.from_arrow(t)).to_pandas().set_index("doc_id")
    r1 = df.loc[1]
    assert r1.n_lines == 3 and r1.n_dup_lines == 1
    assert r1.dup_line_chars == 10 and r1.line_chars == 12
    # tokens: aa bb aa bb cc -> 2-grams: (aa,bb)x2 (bb,aa) (bb,cc) -> 1 dup
    assert r1.n_2grams == 4 and r1.n_dup_2grams == 1
    assert r1.n_3grams == 3 and r1.n_dup_3grams == 0
    r2 = df.loc[2]
    assert r2.n_lines == 1 and r2.n_dup_lines == 0
    # x y x y x z: 2-grams (x,y)x2 (y,x)x2... -> total 5
    assert r2.n_2grams == 5 and r2.n_dup_2grams == 2
    # 3-grams: xyx yxy xyx yxz -> (x y x) x2
    assert r2.n_3grams == 4 and r2.n_dup_3grams == 1
    r3 = df.loc[3]
    assert r3.n_lines == 1 and r3.n_dup_lines == 0
    assert r3.line_chars == 0 and r3.n_2grams == 0 and r3.n_3grams == 0


def test_c4_clean(ray_session):
    import ray.data as rd
    from apollo_ray.functions.clean import c4_clean
    t = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array([
            "Good line with punctuation.\nshort\n"
            "Another fine line mentions Cookie settings.\n"
            "This line is long enough and fine!",
            "no terminal punctuation here\n\nLorem Ipsum filler text.",
        ]),
    })
    df = c4_clean(rd.from_arrow(t)).to_pandas().set_index("doc_id")
    assert df.loc[1, "n_kept"] == 2 and df.loc[1, "n_dropped"] == 2
    assert df.loc[1, "clean_text"] == ("Good line with punctuation.\n"
                                       "This line is long enough and fine!")
    assert df.loc[2, "n_kept"] == 0 and df.loc[2, "clean_text"] == ""


def test_lsh_topk_finds_near_duplicates(ray_session):
    """The bucketed top-k must recover each query's planted near-dup
    (cos >= ~0.95) and return a subset of the brute-force candidates
    with identical scores."""
    from apollo_ray.functions.ann import cosine_topk, lsh_topk
    emb, m = _rand_emb_ds(n=100, dim=24, n_dup=30, seed=7, noise=0.1)
    qids = list(range(10))                 # each has near-dup at n+q
    got = lsh_topk(emb, qids, k=5, n_planes=8, n_tables=12,
                   seed=1).to_pandas()
    brute = cosine_topk(emb, qids, k=5).to_pandas()
    bt = {(r.query_id, r.vec_id): r.cos_r3 for r in brute.itertuples()}
    for r in got.itertuples():
        # every returned (query, vec) score matches exact cosine
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        assert abs(r.cos_r3 - round(float(mn[r.query_id] @ mn[r.vec_id]), 3)) < 1e-9
    for q in qids:
        mine = got[got.query_id == q]
        # the planted near-duplicate (vec_id = 100 + q) is found
        assert (100 + q) in set(mine.vec_id)
        # and the top hit agrees with brute force
        top_b = brute[brute.query_id == q].iloc[0]
        top_m = mine.sort_values(["cos_r3", "vec_id"],
                                 ascending=[False, True]).iloc[0]
        assert (top_m.vec_id, top_m.cos_r3) == (top_b.vec_id, top_b.cos_r3)


def test_asof_latest_event(ray_session):
    import ray.data as rd
    from apollo_ray.functions.asof import asof_latest_event
    us = 1_000_000
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6, 7], type=pa.int64()),
        "ts": pa.array([1 * us, 2 * us, 3 * us, 2 * us, 1 * us,
                        2 * us, 2 * us], type=pa.timestamp("us")),
        "user_id": pa.array([10, 10, 10, 10, 20, 20, 20], type=pa.int64()),
        "event_type": pa.array(["click", "purchase", "view", "view",
                                "click", "purchase", "purchase"]),
        "value": pa.array([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7]),
        "props": pa.array([""] * 7),
    })
    df = asof_latest_event(rd.from_arrow(t), num_partitions=2) \
        .to_pandas().set_index("event_id")
    assert df.loc[1, "prior_event_id"] == -1          # before any purchase
    assert df.loc[2, "prior_event_id"] == 2           # self-match at ts<=ts
    assert df.loc[3, "prior_event_id"] == 2           # latest prior
    assert df.loc[4, "prior_event_id"] == 2           # equal ts matches
    assert df.loc[5, "prior_event_id"] == -1          # other user, earlier
    # two purchases at the same (user, ts): max event_id wins
    assert df.loc[6, "prior_event_id"] == 7
    assert df.loc[7, "prior_event_id"] == 7
    assert df.loc[7, "prior_value"] == 0.7


def test_range_window_stats(ray_session):
    import ray.data as rd
    from apollo_ray.functions.asof import range_window_stats
    us = 1_000_000
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
        "ts": pa.array([0, 5 * us, 9 * us, 10 * us, 20 * us, 9 * us],
                       type=pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 1, 1, 2], type=pa.int64()),
        "event_type": pa.array(["click", "view", "click", "purchase",
                                "view", "purchase"]),
        "value": pa.array([9.0, 2.0, 3.0, 1.0, 5.0, 7.0]),
        "props": pa.array([""] * 6),
    })
    df = range_window_stats(rd.from_arrow(t), window_us=10 * us,
                            num_partitions=2).to_pandas() \
        .set_index("event_id")
    # purchase id 4 at t=10s, window [0s, 10s]: events 1,2,3 (not 5)
    assert df.loc[4, "n_win_events"] == 3
    assert df.loc[4, "max_value"] == 9.0
    # purchase id 6 (user 2): no other events in window
    assert df.loc[6, "n_win_events"] == 0
    assert df.loc[6, "max_value"] == -1.0
    assert set(df.index) == {4, 6}


def test_range_window_stats_vs_brute(ray_session):
    import ray.data as rd
    from apollo_ray.functions.asof import range_window_stats
    rng = np.random.default_rng(5)
    n = 400
    us = 1_000_000
    t_us = np.sort(rng.integers(0, 3600 * us, n))
    users = rng.integers(0, 12, n)
    types = rng.choice(["click", "view", "purchase"], n, p=[.5, .3, .2])
    vals = np.round(rng.random(n) * 10, 2)
    tab = pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "ts": pa.array(t_us, type=pa.timestamp("us")),
        "user_id": pa.array(users, type=pa.int64()),
        "event_type": pa.array(types),
        "value": pa.array(vals, type=pa.float64()),
        "props": pa.array([""] * n),
    })
    W = 300 * us
    df = range_window_stats(rd.from_arrow(tab), window_us=W,
                            num_partitions=4).to_pandas() \
        .set_index("event_id")
    for i in np.flatnonzero(types == "purchase"):
        in_win = [(j, vals[j]) for j in range(n)
                  if j != i and users[j] == users[i]
                  and t_us[i] - W <= t_us[j] <= t_us[i]]
        assert df.loc[i, "n_win_events"] == len(in_win), i
        expect = max((v for _, v in in_win), default=-1.0)
        assert df.loc[i, "max_value"] == expect, i


def test_shingle_novelty(docs_ds):
    """Hand-checkable novelty on the 5-doc fixture + brute-force parity."""
    from apollo_ray.functions.dedup_extras import shingle_novelty
    df = shingle_novelty(docs_ds, k=3, num_partitions=4).to_pandas() \
        .set_index("doc_id").sort_index()
    assert len(df) == 5                       # empty doc still reported
    # docs 1 and 2 are exact dups: every shingle has df >= 2 -> novelty 0
    assert df.loc[1, "novelty_ppm"] == 0 and df.loc[2, "novelty_ppm"] == 0
    assert df.loc[1, "n_shingles"] == 4 and df.loc[1, "n_unique"] == 0
    # doc 3 shares no 3-shingle with anyone -> fully novel
    assert df.loc[3, "novelty_ppm"] == 1_000_000
    assert df.loc[3, "n_unique"] == df.loc[3, "n_shingles"] == 5
    # doc 4 (near dup): "the cat sat" / "cat sat on" also occur in
    # docs 1-2; "sat on the" occurs in 1-2 as well; the 2 shingles
    # through "red" are unique -> 2/5
    assert df.loc[4, "n_shingles"] == 5 and df.loc[4, "n_unique"] == 2
    assert df.loc[4, "novelty_ppm"] == 400_000
    # empty doc: all zero
    assert df.loc[5, "n_shingles"] == 0 and df.loc[5, "novelty_ppm"] == 0


def test_shingle_novelty_split_invariant(ray_session):
    import ray.data as rd
    from apollo_ray.functions.dedup_extras import shingle_novelty
    rng = np.random.default_rng(7)
    words = ["w%d" % i for i in range(30)]
    texts = [" ".join(rng.choice(words, size=int(rng.integers(0, 12))))
             for _ in range(200)]
    t = pa.table({"doc_id": pa.array(np.arange(200), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    a = shingle_novelty(rd.from_arrow(t).repartition(1),
                        num_partitions=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = shingle_novelty(rd.from_arrow(t).repartition(16),
                        num_partitions=16).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
