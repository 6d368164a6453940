"""minhash_lsh_clusters — the full unweighted MinHash-LSH dedup chain
(signatures -> bands -> buckets -> star edges -> CC): engine == SQL
oracle value parity, both label-attach paths, degenerate corpora, and
a property test that the oracle's unrolled label-propagation
recurrence (min over self / neighbors / label-of-label) reaches the
true union-find components within the unrolled round budget.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from apollo_ray.functions.dedup_extras import (minhash_lsh_clusters,
                                               minhash_lsh_clusters_sql)
from apollo_ray.kernels.cc import UnionFind


def _corpus(n=150, seed=3):
    """Deterministic webtext-ish corpus with planted exact-dup groups
    (identical texts share every band -> non-trivial CC merging),
    near-dup mutations, and shingle-less short docs."""
    rng = np.random.default_rng(seed)
    vocab = ["w%d" % i for i in range(300)]
    texts = []
    for _ in range(n):
        length = int(rng.integers(5, 30))
        texts.append(" ".join(rng.choice(vocab, size=length)))
    for i in range(0, n, 7):          # exact dup partner
        texts[i] = texts[(i + 13) % n]
    for i in range(3, n, 11):         # near dup: one token swapped
        toks = texts[(i + 5) % n].split()
        toks[len(toks) // 2] = "w0"
        texts[i] = " ".join(toks)
    texts[1] = "one two"              # < k tokens: no shingles
    texts[2] = ""                     # empty
    return pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                     "text": pa.array(texts)})


def _oracle(t: pa.Table, **kw) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    df = con.execute(minhash_lsh_clusters_sql(**kw)).fetchdf()
    con.close()
    return df.astype("int64").sort_values("doc_id").reset_index(drop=True)


def _run(t: pa.Table, **kw) -> pd.DataFrame:
    import ray.data
    res = minhash_lsh_clusters(ray.data.from_arrow(t), **kw).to_pandas()
    return res.astype("int64").sort_values("doc_id").reset_index(drop=True)


def test_clusters_match_oracle(ray_session):
    t = _corpus()
    got = _run(t)
    exp = _oracle(t)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["cluster_id"].tolist() == exp["cluster_id"].tolist()
    # planted exact dups must co-cluster; the corpus must be non-trivial
    lab = dict(zip(got["doc_id"], got["cluster_id"]))
    texts = t.column("text").to_pylist()
    assert lab[0] == lab[13] and texts[0] == texts[13]
    sizes = got.groupby("cluster_id").size()
    assert (sizes > 1).sum() >= 5


def test_hashjoin_attach_equals_broadcast(ray_session):
    t = _corpus(n=80, seed=9)
    a = _run(t, method="broadcast")
    b = _run(t, method="hashjoin")
    assert a.equals(b)


def test_short_and_unique_docs_are_singletons(ray_session):
    t = pa.table({"doc_id": pa.array([10, 11, 12], type=pa.int64()),
                  "text": pa.array(["one two",  # < k tokens
                                    "completely different words here now",
                                    "another unrelated document text body"])})
    got = _run(t)
    assert got["cluster_id"].tolist() == [10, 11, 12]
    exp = _oracle(t)
    assert got.equals(exp)


def _sql_rounds(edges, nodes, iters=10):
    """Simulate the oracle's exact recurrence: l0 = min(self, nbrs);
    each round comp' = min(comp, min nbr comp, comp[comp])."""
    nbrs = {n: [] for n in nodes}
    for u, v in edges:
        nbrs[u].append(v)
        nbrs[v].append(u)
    comp = {n: min([n] + nbrs[n]) for n in nodes if nbrs[n]}
    for _ in range(iters):
        comp = {n: min(c,
                       min((comp[m] for m in nbrs[n]), default=c),
                       comp.get(c, c))
                for n, c in comp.items()}
    return comp


def test_label_propagation_matches_union_find_property():
    """The unrolled SQL recurrence must reach true union-find labels
    within 10 rounds on adversarial graphs: long chains (both id
    orders — descending ids make the min propagate the far way) and
    random sparse graphs."""
    rng = np.random.default_rng(42)
    cases = []
    chain = [(i, i + 1) for i in range(500)]
    cases.append((chain, list(range(501))))
    rev = [(500 - i, 500 - i - 1) for i in range(500)]
    cases.append((rev, list(range(501))))
    for _ in range(5):
        n = int(rng.integers(20, 200))
        m = int(rng.integers(n // 2, 2 * n))
        e = [(int(rng.integers(0, n)), int(rng.integers(0, n)))
             for _ in range(m)]
        e = [(u, v) for u, v in e if u != v]
        cases.append((e, list(range(n))))
    for edges, nodes in cases:
        uf = UnionFind()
        for u, v in edges:
            uf.union(u, v)
        truth = {n: uf.find(n) for n in nodes}
        got = _sql_rounds(edges, nodes, iters=10)
        for n in nodes:
            assert got.get(n, n) == truth.get(n, n), (n, len(edges))


def test_oracle_sql_matches_engine_on_fixture_pages(ray_session):
    """Engine == oracle on the house synthetic webtext fixture (real
    mutated near-dup families, not just planted exact copies)."""
    from apollo_ray.fixtures import generate_pages
    pages, _truth = generate_pages(300, seed=11)
    t = pa.table({
        "doc_id": pa.array(np.arange(pages.num_rows, dtype=np.int64)),
        "text": pages.column("text"),
    })
    got = _run(t)
    exp = _oracle(t)
    assert got.equals(exp)
    sizes = got.groupby("cluster_id").size()
    assert (sizes > 1).sum() >= 3
