"""Property-based tests (hypothesis) for the numeric kernels — beyond
the reference's test surface (SURVEY §5: the reference has no
property-based tests)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from apollo_ray.kernels.cc import find_connected_components
from apollo_ray.kernels.jaccard import (weighted_jaccard,
                                        weighted_jaccard_sparse)
from apollo_ray.kernels.lsh import calc_hashtable_params


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 50)),
                max_size=60))
def test_cc_partition_properties(edges):
    buckets = [list(e) for e in edges]
    res = find_connected_components(buckets)
    seen = set()
    for label, members in res.items():
        assert label == min(members)          # label = component minimum
        assert not (seen & members)           # components are disjoint
        seen |= members
    assert seen == {x for e in edges for x in e}
    # every edge's endpoints share a component
    lab = {x: l for l, mem in res.items() for x in mem}
    for a, b in edges:
        assert lab[a] == lab[b]


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2 ** 31), st.integers(1, 200), st.integers(1, 200))
def test_sparse_jaccard_equals_dense(seed, n1, n2):
    rng = np.random.default_rng(seed)
    dim = 300
    v1 = np.zeros(dim, dtype=np.float32)
    v2 = np.zeros(dim, dtype=np.float32)
    v1[rng.choice(dim, min(n1, dim), replace=False)] = \
        rng.random(min(n1, dim)).astype(np.float32) + 0.01
    v2[rng.choice(dim, min(n2, dim), replace=False)] = \
        rng.random(min(n2, dim)).astype(np.float32) + 0.01
    i1 = np.flatnonzero(v1).astype(np.uint32)
    i2 = np.flatnonzero(v2).astype(np.uint32)
    s = weighted_jaccard_sparse(i1, v1[i1], i2, v2[i2])
    d = weighted_jaccard(v1, v2)
    assert abs(s - d) < 1e-5
    assert 0.0 <= s <= 1.0


@settings(max_examples=10, deadline=None)
@given(st.floats(0.3, 0.95), st.sampled_from([32, 64, 128]))
def test_lsh_params_valid(threshold, size):
    b, r = calc_hashtable_params(round(threshold, 2), size)
    assert 1 <= b and 1 <= r and b * r <= size


def test_empty_pipeline(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from apollo_ray.config import DedupConfig
    from apollo_ray.pipelines.dedup import run_dedup
    empty = pa.table({"url": pa.array([], type=pa.string()),
                      "warc_ts": pa.array([], type=pa.timestamp("us")),
                      "html": pa.array([], type=pa.binary()),
                      "text": pa.array([], type=pa.string()),
                      "lang": pa.array([], type=pa.string())})
    out = run_dedup(rd.from_arrow(empty), DedupConfig(feature_dim_log2=12))
    assert out["clusters"].count() == 0


@settings(max_examples=8, deadline=None)
@given(st.integers(0, 10_000))
def test_substring_spans_match_brute_no_ray(seed):
    """Exact-mode mark+merge kernels equal the brute-force string
    implementation on random small-alphabet corpora (no Ray — pure
    kernel composition, so hypothesis can drive many cases)."""
    import numpy as np
    from collections import Counter
    from apollo_ray.functions.substring import window_fingerprints
    from tests.test_substring import brute_spans
    rng = np.random.default_rng(seed)
    L = 6
    texts = {i: "".join(rng.choice(list("abc "), rng.integers(0, 60)))
             for i in range(4)}
    # fingerprint marks (what the pipeline shuffles), merged per doc
    counts = Counter()
    fps = {}
    for did, t in texts.items():
        fps[did] = window_fingerprints(t, L)
        for f in fps[did]:
            counts[f] += 1
    got = set()
    for did, t in texts.items():
        marks = [i for i, f in enumerate(fps[did]) if counts[f] >= 2]
        if not marks:
            continue
        start, end = marks[0], marks[0] + L
        for i in marks[1:]:
            if i > end:
                got.add((did, start, end, end - start))
                start = i
            end = i + L
        got.add((did, start, end, end - start))
    assert got == brute_spans(texts, L)


@given(st.lists(st.tuples(st.text(alphabet="ab", min_size=1, max_size=6),
                          st.integers(min_value=1, max_value=9)),
                min_size=1, max_size=8),
       st.integers(min_value=1, max_value=4))
@settings(max_examples=60, deadline=None)
def test_bpe_train_replace_semantics_property(words_counts, num_merges):
    """The trainer's replace-semantics loop: every learned merge's
    recorded count equals the adjacency count at selection time, and
    re-encoding any training word with the learned merges yields the
    same symbol count as the trainer's final representation."""
    from apollo_ray.functions.bpe import (_encode_n_subwords,
                                          _train_from_word_counts)
    seen = {}
    for w, n in words_counts:
        seen[w] = seen.get(w, 0) + n
    words, counts = list(seen), [seen[w] for w in seen]
    merges = _train_from_word_counts(words, counts, num_merges)
    # ranks are 1..m and counts are positive non-increasing-ish (each
    # merge count is the max at its step, but later maxima can exceed
    # earlier ones only if created by merging; equality ties allowed)
    assert [m[0] for m in merges] == list(range(1, len(merges) + 1))
    assert all(m[3] >= 1 for m in merges)
    # final reprs from the trainer == re-encoding through the chain
    reprs = [" " + " ".join(list(w)) + " " for w in words]
    for _, l, r, _ in merges:
        reprs = [x.replace(f" {l} {r} ", f" {l}{r} ") for x in reprs]
    for w, rep in zip(words, reprs):
        assert _encode_n_subwords(w, merges) == len(rep.split())


@given(st.lists(st.integers(min_value=0, max_value=5), min_size=1,
                max_size=30),
       st.lists(st.integers(min_value=0, max_value=5), min_size=1,
                max_size=30))
@settings(max_examples=40, deadline=None)
def test_ragged_cross_product_property(left_segs, right_segs):
    """The div/mod ragged cross product used by jaccard_join /
    query_similar_batch enumerates exactly the left x right pairs of
    every segment."""
    import numpy as np
    n = min(len(left_segs), len(right_segs))
    cl = np.asarray(left_segs[:n], dtype=np.int64)
    cr = np.asarray(right_segs[:n], dtype=np.int64)
    npairs = cl * cr
    total = int(npairs.sum())
    starts = np.zeros(n, dtype=np.int64)  # per-seg left block start
    # emulate the operator's index math over abstract ids
    out_start = np.concatenate(([0], np.cumsum(npairs)[:-1]))
    live = np.flatnonzero(npairs)
    got = set()
    if total:
        seg_row = np.repeat(live, npairs[live])
        pos = np.arange(total, dtype=np.int64) - out_start[seg_row]
        l_off = pos // cr[seg_row]
        r_off = pos % cr[seg_row]
        got = set(zip(seg_row.tolist(), l_off.tolist(), r_off.tolist()))
    want = {(s, i, j) for s in range(n)
            for i in range(int(cl[s])) for j in range(int(cr[s]))}
    assert got == want
