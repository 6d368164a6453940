"""Bloom dedup tier: brute-force parity, exact-dup recall, FP
behavior at tiny m, and the DuckDB md5 double-hash bridge."""

import hashlib
import struct

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from apollo_ray.functions.bloom import bloom_dedup, doc_positions


def _brute(texts, ids, k, m):
    """Reference: sequential test-then-insert bloom over doc_id order."""
    order = np.argsort(ids, kind="stable")
    bits = set()
    out = {}
    for i in order:
        d = hashlib.md5(texts[i].encode()).digest()
        hi, lo = struct.unpack("<2Q", d)
        pos = sorted({(lo + j * hi) % (2 ** 64) % m for j in range(k)})
        n_set = sum(1 for p in pos if p in bits)
        out[ids[i]] = (len(pos), n_set, n_set == len(pos))
        bits.update(pos)
    return out


def _mk_docs(texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))


def test_bloom_matches_bruteforce_tiny_m(ray_session):
    # m=64 on 40 distinct docs forces false positives; semantics must
    # still match the sequential reference exactly.
    rng = np.random.default_rng(7)
    texts = ["w%d x%d" % (rng.integers(30), rng.integers(30))
             for _ in range(40)]
    texts += [texts[3], texts[3], texts[10]]  # true dups
    ds = bloom_dedup(_mk_docs(texts), k=3, log2_m=6, num_partitions=8)
    got = {r["doc_id"]: (r["n_pos"], r["n_set"], r["flagged"])
           for r in ds.take_all()}
    want = _brute(texts, list(range(len(texts))), k=3, m=64)
    assert got == want
    flagged = sum(1 for v in got.values() if v[2])
    assert flagged >= 3  # at least every non-first true dup


def test_bloom_exact_dups_always_flagged(ray_session):
    texts = ["doc %d body" % i for i in range(50)] + \
            ["doc 7 body", "doc 7 body", "doc 21 body"]
    ds = bloom_dedup(_mk_docs(texts), k=4, log2_m=20)
    rows = {r["doc_id"]: r for r in ds.take_all()}
    # big filter, tiny corpus: no FP flags, exactly the 3 re-occurrences
    assert [d for d, r in sorted(rows.items()) if r["flagged"]] == [50, 51, 52]
    # full parity with the sequential reference (doc 21 deterministically
    # shares ONE position with an earlier doc — a partial hit, not a flag)
    want = _brute(texts, list(range(len(texts))), k=4, m=2 ** 20)
    assert {d: (r["n_pos"], r["n_set"], r["flagged"])
            for d, r in rows.items()} == want


def test_doc_positions_distinct_and_sorted():
    flat, n = doc_positions(["aaa", "bbb", "aaa"], k=8, m=16)
    assert len(flat) == n.sum()
    # per-doc slices sorted + distinct; identical texts share positions
    s = np.split(flat, np.cumsum(n)[:-1])
    for part in s:
        assert (np.diff(part) > 0).all()
    assert (s[0] == s[2]).all()


def test_bloom_duckdb_bridge(ray_session):
    duckdb = pytest.importorskip("duckdb")
    texts = ["alpha beta", "gamma", "alpha beta", "delta epsilon zeta",
             "gamma", "eta"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts)})
    got = bloom_dedup(ray.data.from_arrow(tbl), k=4, log2_m=10) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", tbl)
    want = con.execute("""
        WITH pos AS (
          SELECT DISTINCT doc_id,
            CAST((CAST(md5_number_lower(text) AS HUGEINT)
                + j * CAST(md5_number_upper(text) AS HUGEINT)) % 1024
                 AS BIGINT) AS pos
          FROM documents, range(4) t(j)),
        fs AS (SELECT pos, min(doc_id) AS first_doc FROM pos GROUP BY pos)
        SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_pos,
               CAST(sum(CASE WHEN f.first_doc < p.doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_set,
               count(*) = sum(CASE WHEN f.first_doc < p.doc_id
                              THEN 1 ELSE 0 END) AS flagged
        FROM pos p JOIN fs f USING (pos)
        GROUP BY p.doc_id ORDER BY p.doc_id
    """).df()
    assert (got["n_pos"].values == want["n_pos"].values).all()
    assert (got["n_set"].values == want["n_set"].values).all()
    assert (got["flagged"].values == want["flagged"].values).all()
