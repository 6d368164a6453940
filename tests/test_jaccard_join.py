"""Cross-table near-duplicate join (jaccard_join): brute-force parity,
ragged-cross-product vectorization, posting-cap semantics."""

import numpy as np
import pyarrow as pa
import pytest


def _shset(txt, k=3):
    toks = txt.split()
    if len(toks) < k:
        return set()
    return {tuple(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def _brute(left_rows, right_rows, thr_ppm, k=3):
    out = []
    for ld, lt in left_rows:
        ls = _shset(lt, k)
        if not ls:
            continue
        for rd, rt in right_rows:
            rs = _shset(rt, k)
            if not rs:
                continue
            c = len(ls & rs)
            denom = len(ls) + len(rs) - c
            if c and c * 1_000_000 >= thr_ppm * denom:
                out.append((ld, rd, c,
                            (2_000_000 * c + denom) // (2 * denom)))
    return sorted(out)


def _join_df(left_rows, right_rows, **kw):
    import ray.data as rd
    from apollo_ray.functions.dedup_extras import jaccard_join

    def tbl(rows):
        return pa.table({
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows]),
        })

    out = jaccard_join(rd.from_arrow(tbl(left_rows)),
                       rd.from_arrow(tbl(right_rows)), **kw).to_pandas()
    if len(out) == 0:  # empty Ray datasets lose their schema via to_pandas
        return []
    score = "cont_ppm" if kw.get("metric") == "containment" else "jacc_ppm"
    return sorted(map(tuple, out[["l_id", "r_id", "shared",
                                  score]].itertuples(index=False)))


def test_jaccard_join_brute_force_parity(ray_session):
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]

    def doc():
        return " ".join(rng.choice(vocab, size=rng.integers(2, 14)))

    left = [(2 * i, doc()) for i in range(25)]
    right = [(2 * i + 1, doc()) for i in range(25)]
    # plant a near-dup pair and an exact cross-table dup
    right[0] = (1, left[0][1] + " zeta")
    right[1] = (3, left[1][1])
    got = _join_df(left, right, k=3, threshold=0.3)
    exp = _brute(left, right, thr_ppm=300_000)
    assert got == exp
    assert len(exp) > 0


def test_jaccard_join_multi_posting_segments(ray_session):
    # many docs sharing one shingle on both sides exercises the ragged
    # cross-product path (cl > 1 and cr > 1 in one segment)
    base = "x y z"
    left = [(i * 2, base + f" l{i}") for i in range(6)]
    right = [(i * 2 + 1, base + f" r{i}") for i in range(6)]
    got = _join_df(left, right, k=3, threshold=0.2)
    exp = _brute(left, right, thr_ppm=200_000)
    assert got == exp
    assert len(exp) == 36  # every cross pair shares 'x y z' at J=1/3


def test_jaccard_join_posting_cap(ray_session):
    base = "x y z"
    left = [(i * 2, base) for i in range(5)]
    right = [(i * 2 + 1, base) for i in range(5)]
    # cap below the posting size on either side -> no pairs at all
    assert _join_df(left, right, k=3, threshold=0.5, max_posting=3) == []
    # above the cap the full 25 exact-dup cross pairs appear
    got = _join_df(left, right, k=3, threshold=0.5, max_posting=10)
    assert len(got) == 25
    assert all(p[3] == 1_000_000 for p in got)


def test_jaccard_join_short_docs_excluded(ray_session):
    left = [(0, "a b"), (2, "p q r s")]
    right = [(1, "p q r s"), (3, "a b")]
    got = _join_df(left, right, k=3, threshold=0.5)
    assert got == [(2, 1, 2, 1_000_000)]


def test_containment_join(ray_session):
    import ray.data as rd
    from apollo_ray.functions.dedup_extras import jaccard_join
    # right doc 1 fully contained in left doc 0; doc 3 only partially
    left = [(0, "a b c d e f g h"), (2, "z z z")]
    right = [(1, "c d e f g"), (3, "a b c q r s t u")]
    tbl = lambda rows: pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows])})
    out = jaccard_join(rd.from_arrow(tbl(left)), rd.from_arrow(tbl(right)),
                       k=3, threshold=0.5, metric="containment").to_pandas()
    got = sorted(map(tuple, out[["l_id", "r_id", "shared",
                                 "cont_ppm"]].itertuples(index=False)))
    # right doc 1: 3 shingles, all in left doc 0 -> cont 1.0
    # right doc 3: 6 shingles, 1 shared ('a b c') -> cont 1/6 < 0.5
    assert got == [(0, 1, 3, 1_000_000)]


def test_containment_vs_brute(ray_session):
    rng = np.random.default_rng(11)
    vocab = ["u", "v", "w", "x", "y"]

    def doc():
        return " ".join(rng.choice(vocab, size=rng.integers(3, 12)))

    left = [(2 * i, doc()) for i in range(20)]
    right = [(2 * i + 1, doc()) for i in range(20)]
    got = _join_df(left, right, k=3, threshold=0.4, metric="containment")
    exp = []
    for ld, lt in left:
        ls = _shset(lt)
        for rd_, rt in right:
            rs = _shset(rt)
            if not ls or not rs:
                continue
            c = len(ls & rs)
            if c and c * 1_000_000 >= 400_000 * len(rs):
                exp.append((ld, rd_, c,
                            (2_000_000 * c + len(rs)) // (2 * len(rs))))
    assert got == sorted(exp)
    assert len(exp) > 0


def test_explode_shingles_batch_parity(ray_session):
    """Batched whole-stream shingle explode == the per-doc reference,
    including short docs, empties and duplicate shingles."""
    import numpy as np
    from apollo_ray.functions.dedup_extras import (
        _explode_shingles, _explode_shingles_per_doc)
    rng = np.random.default_rng(3)
    vocab = ["a", "b", "c", "d", "e"]
    texts = ["", "a", "a b", "a b c",
             "a b a b a b",            # duplicate shingles
             *(" ".join(rng.choice(vocab, size=rng.integers(1, 20)))
               for _ in range(40))]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
    })
    for k in (2, 3, 5):
        got = _explode_shingles(t, k=k, seed=42).to_pandas() \
            .sort_values(["doc_id", "shingle"]).reset_index(drop=True)
        want = _explode_shingles_per_doc(t, k=k, seed=42).to_pandas() \
            .sort_values(["doc_id", "shingle"]).reset_index(drop=True)
        assert got.equals(want), f"k={k}"
