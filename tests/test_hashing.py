"""Deterministic hashing tests: stability across calls/processes and
the shingle/fold kernels."""

import subprocess
import sys

import numpy as np

from apollo_ray.hashing import (TokenHasher, fold_u32_rows, hash_utf8,
                                mix_to_partition, pair_mix, shingle_hashes,
                                splitmix64)


def test_hash_utf8_stable_across_processes():
    val = hash_utf8("hello world", seed=42)
    out = subprocess.run(
        [sys.executable, "-c",
         "from apollo_ray.hashing import hash_utf8;"
         "print(hash_utf8('hello world', seed=42))"],
        capture_output=True, text=True, cwd="/root/repo")
    assert int(out.stdout.strip()) == val
    assert 0 <= val < 2 ** 63


def test_seed_changes_hash():
    assert hash_utf8("x", 0) != hash_utf8("x", 1)


def test_token_hasher_memo_consistent():
    th = TokenHasher(seed=1)
    a = th.hash_tokens(["a", "b", "a"])
    b = TokenHasher(seed=1).hash_tokens(["a", "b", "a"])
    np.testing.assert_array_equal(a, b)
    assert a[0] == a[2] != a[1]


def test_shingle_hashes_shift_sensitivity():
    th = TokenHasher()
    h = th.hash_tokens(["w%d" % i for i in range(10)])
    s3 = shingle_hashes(h, 3)
    assert len(s3) == 8
    # order matters
    h_rev = h[::-1].copy()
    assert not np.array_equal(shingle_hashes(h_rev, 3), s3)
    # shorter than k: one shingle of the whole doc
    assert len(shingle_hashes(h[:2], 5)) == 1
    assert len(shingle_hashes(np.empty(0, dtype=np.uint64), 5)) == 0


def test_fold_rows_int63():
    rows = np.arange(24, dtype=np.uint32).reshape(4, 6)
    out = fold_u32_rows(rows)
    assert out.dtype == np.int64
    assert (out >= 0).all()
    assert len(set(out.tolist())) == 4
    np.testing.assert_array_equal(out, fold_u32_rows(rows))
    # differs if any lane differs
    rows2 = rows.copy()
    rows2[0, 0] += 1
    assert fold_u32_rows(rows2)[0] != out[0]


def test_partition_and_pair_mix():
    ids = np.array([1, 2, 3, 2 ** 62], dtype=np.int64)
    pk = mix_to_partition(ids, 8)
    assert pk.dtype == np.int32 and ((pk >= 0) & (pk < 8)).all()
    pm = pair_mix(ids, ids[::-1].copy())
    assert pm.dtype == np.uint64
    # order-sensitive: (u, v) != (v, u)
    assert pair_mix(np.array([1]), np.array([2]))[0] != \
        pair_mix(np.array([2]), np.array([1]))[0]


def test_splitmix_accepts_int64():
    a = splitmix64(np.array([5, 6], dtype=np.int64))
    b = splitmix64(np.array([5, 6], dtype=np.uint64))
    np.testing.assert_array_equal(a, b)


def test_distinct_pair_idx_first_occurrence():
    """Value-exact pair dedup helper: same selection as
    np.unique(pair_mix) on collision-free input (first occurrence of
    each distinct (u, v)), by construction collision-immune."""
    import numpy as np
    from apollo_ray.hashing import distinct_pair_idx, pair_mix
    rng = np.random.default_rng(3)
    for _ in range(50):
        n = int(rng.integers(0, 200))
        u = rng.integers(0, 12, n)
        v = rng.integers(0, 12, n)
        idx = distinct_pair_idx(u, v)
        # distinct pairs, each at its first position
        seen = {}
        expect = []
        for i, (a, b) in enumerate(zip(u.tolist(), v.tolist())):
            if (a, b) not in seen:
                seen[(a, b)] = i
                expect.append(i)
        assert sorted(idx.tolist()) == sorted(expect)
        _, ref = np.unique(pair_mix(u, v), return_index=True)
        assert set(idx.tolist()) == set(ref.tolist())


def test_hash_utf8_batch_matches_per_row():
    """The Arrow-buffer batch hasher must be byte-identical to
    hash_utf8 per row — unicode, empty strings, long strings, sliced
    arrays, binary columns, and the null rejection contract."""
    import numpy as np
    import pyarrow as pa
    import pytest
    from apollo_ray.hashing import hash_utf8, hash_utf8_batch
    vals = ["", "héllo wörld", "日本語テキスト", "a" * 10000, "x",
            "tab\tand\nnewline", " nbsp", "mixed日本abc42"]
    arr = pa.array(vals, type=pa.string())
    assert hash_utf8_batch(arr).tolist() == [hash_utf8(s) for s in vals]
    sl = arr.slice(2, 4)
    assert hash_utf8_batch(sl).tolist() == [hash_utf8(s)
                                            for s in vals[2:6]]
    # seeded
    assert hash_utf8_batch(arr, seed=7).tolist() == \
        [hash_utf8(s, seed=7) for s in vals]
    # large_string + chunked
    la = pa.array(vals, type=pa.large_string())
    assert hash_utf8_batch(la).tolist() == [hash_utf8(s) for s in vals]
    ch = pa.chunked_array([arr.slice(0, 3), arr.slice(3)])
    assert hash_utf8_batch(ch).tolist() == [hash_utf8(s) for s in vals]
    # empty column and null rejection
    assert len(hash_utf8_batch(pa.array([], type=pa.string()))) == 0
    with pytest.raises(ValueError):
        hash_utf8_batch(pa.array(["a", None], type=pa.string()))
