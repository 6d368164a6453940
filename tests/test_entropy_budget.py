"""char_entropy (character-unigram Shannon entropy, integer nano-bits)
and token_budget_sample (per-group md5-ordered token-budget mixing)."""

import duckdb
import numpy as np
import pyarrow as pa


def _docs(texts, sources=None, ids=None):
    t = {
        "doc_id": pa.array(
            np.asarray(ids, dtype=np.int64) if ids is not None
            else np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    }
    if sources is not None:
        t["source"] = pa.array(sources)
    return pa.table(t)


def test_char_entropy_values(ray_session):
    import ray
    from apollo_ray.functions.textstats import char_entropy
    out = {r["doc_id"]: r for r in char_entropy(ray.data.from_arrow(
        _docs(["aaaa", "ab", "", "abcd", "é e"]))).take_all()}
    assert out[0]["ent_nano"] == 0          # single symbol -> 0 bits
    assert out[1]["ent_nano"] == 1_000_000_000   # two equiprobable -> 1 bit
    assert out[2]["n_chars"] == 0 and out[2]["ent_nano"] == 0
    assert out[3]["ent_nano"] == 2_000_000_000   # four equiprobable -> 2
    assert out[4]["n_chars"] == 3           # é counts as one codepoint


def test_char_entropy_oracle_parity(ray_session):
    import ray
    from apollo_ray.functions.textstats import (char_entropy,
                                                char_entropy_sql)
    texts = ["the quick brown fox", "aaaabbbbcccc", "", "zz",
             "mixed Unicode é Å text", "x" * 100 + "y"]
    t = _docs(texts)
    got = {r["doc_id"]: (r["n_chars"], r["ent_nano"])
           for r in char_entropy(ray.data.from_arrow(t)).take_all()}
    con = duckdb.connect()
    con.register("documents", t)
    want = {r[0]: (r[1], r[2])
            for r in con.execute(char_entropy_sql()).fetchall()}
    assert got == want


def test_token_budget_sample_order_and_cut(ray_session):
    import ray
    from apollo_ray.functions.sampling import (token_budget_sample,
                                               token_budget_sample_sql)
    # two groups; group A has 4 docs x 3 tokens, budget 6 -> 2 kept
    texts = ["a b c", "d e f", "g h i", "j k l",
             "one two", "three four five six"]
    srcs = ["A", "A", "A", "A", "B", "B"]
    t = _docs(texts, srcs)
    got = token_budget_sample(ray.data.from_arrow(t), 6,
                              num_partitions=4).take_all()
    got = {r["doc_id"]: (r["grp"], r["n_tokens"], r["cum_tokens"],
                         r["keep"]) for r in got}
    con = duckdb.connect()
    con.register("documents", t)
    want = {r[0]: (r[1], r[2], r[3], r[4])
            for r in con.execute(token_budget_sample_sql(6)).fetchall()}
    assert got == want
    kept_a = [k for k, v in got.items() if v[0] == "A" and v[3]]
    assert len(kept_a) == 2                 # 6-token budget = 2 of 4 docs
    # monotone: raising the budget only ADDS docs
    got12 = token_budget_sample(ray.data.from_arrow(t), 12,
                                num_partitions=4).take_all()
    kept12 = {r["doc_id"] for r in got12 if r["keep"]}
    assert set(kept_a) <= kept12


def test_token_budget_empty_and_zero_token_docs(ray_session):
    import ray
    from apollo_ray.functions.sampling import (token_budget_sample,
                                               token_budget_sample_sql)
    t = _docs(["", "   ", "w"], ["s", "s", "s"])
    out = {r["doc_id"]: r for r in token_budget_sample(
        ray.data.from_arrow(t), 0, num_partitions=2).take_all()}
    # zero-token docs add nothing: keep iff their PREFIX fits (a
    # zero-token doc ranked after the 1-token doc inherits cum=1)
    assert all(r["keep"] == (r["cum_tokens"] <= 0) for r in out.values())
    assert not out[2]["keep"]               # the 1-token doc never fits
    assert sum(r["n_tokens"] for r in out.values()) == 1
    import duckdb
    con = duckdb.connect()
    con.register("documents", t)
    want = {r[0]: (r[3], r[4]) for r in con.execute(
        token_budget_sample_sql(0)).fetchall()}
    assert {k: (r["cum_tokens"], r["keep"]) for k, r in out.items()} == want


def test_source_overlap_hand_computed(ray_session):
    import ray
    from apollo_ray.functions.dedup_extras import source_overlap
    # k=3 shingles; 'a b c d' -> {'a b c','b c d'}; sources A and B
    # share exactly one shingle ('b c d'), C shares nothing
    t = _docs(["a b c d", "b c d e", "x y z"], ["A", "B", "C"])
    got = {(r["source_a"], r["source_b"]): r["n_shared"]
           for r in source_overlap(ray.data.from_arrow(t), k=3,
                                   num_partitions=4).take_all()}
    assert got[("A", "A")] == 2 and got[("B", "B")] == 2
    assert got[("C", "C")] == 1
    assert got[("A", "B")] == 1
    assert ("A", "C") not in got and ("B", "C") not in got


def test_source_overlap_oracle_parity(ray_session):
    import ray
    from apollo_ray.functions.dedup_extras import (source_overlap,
                                                   source_overlap_sql)
    texts = ["the cat sat on the mat", "the cat sat on a rug",
             "dogs bark at the cat sat on", "entirely different words here",
             "the cat sat on the mat"]        # exact dup across sources
    srcs = ["s1", "s2", "s1", "s3", "s2"]
    t = _docs(texts, srcs)
    got = {(r["source_a"], r["source_b"]): r["n_shared"]
           for r in source_overlap(ray.data.from_arrow(t), k=3,
                                   num_partitions=4).take_all()}
    con = duckdb.connect()
    con.register("documents", t)
    want = {(r[0], r[1]): r[2]
            for r in con.execute(source_overlap_sql(k=3)).fetchall()}
    assert got == want
