"""BPE trainer/encoder: pinned merges on a hand corpus, replace-
semantics determinism, vocab_cap path, empty docs."""

import pyarrow as pa
import pytest

from apollo_ray.functions.bpe import (_encode_n_subwords,
                                      _train_from_word_counts)


def test_train_pinned_merges():
    # corpus: 'low' x5, 'lower' x2, 'new' x3
    words = ["low", "lower", "new"]
    counts = [5, 2, 3]
    m = _train_from_word_counts(words, counts, num_merges=3)
    # pair counts round 1: (l,o)=7, (o,w)=7, (w,e)=2+3(new? no: n-e-w
    # has (n,e),(e,w)) -> (l,o) ties (o,w) at 7; 'l o' < 'o w'
    assert m[0][1:3] == ("l", "o")
    # round 2: reprs 'lo w', 'lo w e r', 'n e w' -> (lo,w)=7 wins
    assert m[1][1:3] == ("lo", "w")
    # round 3: 'low', 'low e r', 'n e w' -> (low,e)=2, (e,r)=2,
    # (n,e)=3, (e,w)=3 -> tie 3: 'e w' < 'n e'
    assert m[2][1:3] == ("e", "w")
    assert [x[0] for x in m] == [1, 2, 3]


def test_train_early_stop_single_chars():
    m = _train_from_word_counts(["a", "b"], [5, 3], num_merges=4)
    assert m == []


def test_encode_replace_semantics():
    # declared variant: run of the same pair merges non-overlapping
    # with consumed delimiter (see module docstring)
    merges = [(1, "a", "a", 99)]
    assert _encode_n_subwords("aaaa", merges) == 3   # [aa, a, a]? no:
    # ' a a a a ' -> replace ' a a ' leftmost, resume after match:
    # ' aa a a ' -> one more match found in the same pass at 'a a'
    # needs leading space which was NOT consumed there -> total 3 syms


def test_encode_chain():
    merges = [(1, "l", "o", 0), (2, "lo", "w", 0)]
    assert _encode_n_subwords("lower", merges) == 3  # low, e, r
    assert _encode_n_subwords("low", merges) == 1
    assert _encode_n_subwords("x", merges) == 1


def test_bpe_end_to_end(ray_session):
    import ray.data as rd
    from apollo_ray.functions.bpe import bpe_encode_counts, bpe_train
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["low low low low low lower lower",
                          "new new new", ""]),
    })
    ds = rd.from_arrow(t)
    m = bpe_train(ds, num_merges=2).to_pandas()
    assert list(m["left_sym"]) == ["l", "lo"]
    assert list(m["right_sym"]) == ["o", "w"]
    e = bpe_encode_counts(ds, num_merges=2).to_pandas() \
        .set_index("doc_id")["n_bpe_tokens"]
    # doc 0: low->1 (x5), lower->3 (x2) = 11; doc 1: n,e,w -> 9; doc 2: 0
    assert e.to_dict() == {0: 11, 1: 9, 2: 0}


def test_bpe_vocab_cap(ray_session):
    import ray.data as rd
    from apollo_ray.functions.bpe import bpe_train
    t = pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "text": pa.array(["aa aa aa zz qq"]),
    })
    # cap keeps only the most frequent word 'aa' -> merge (a,a)
    m = bpe_train(rd.from_arrow(t), num_merges=1, vocab_cap=1).to_pandas()
    assert list(m["left_sym"]) == ["a"]
    assert m["n"].iloc[0] == 3


def test_bpe_oracle_exhausted_merges(ray_session):
    # ADVICE r2: with num_merges > available pairs, the oracle's empty
    # b{i} used to cross-join w{i} empty and report n_bpe_tokens=0 for
    # every doc while the engine (early loop exit) reported real
    # counts.  Both sides must agree on the exhausted corpus.
    import duckdb
    import ray.data as rd
    from apollo_ray.functions.bpe import (bpe_encode_counts,
                                          bpe_encode_sql, bpe_train,
                                          bpe_train_sql)
    t = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["aa aa b", "b b"]),
    })
    ds = rd.from_arrow(t)
    got = bpe_encode_counts(ds, num_merges=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    exp = con.execute(bpe_encode_sql(num_merges=3)).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["n_bpe_tokens"].astype(int).tolist() == \
        exp["n_bpe_tokens"].astype(int).tolist()
    assert got["n_bpe_tokens"].astype(int).tolist() == [3, 2]
    # train oracle emits exactly the engine's (shorter) merge list
    m = bpe_train(ds, num_merges=3).to_pandas()
    em = con.execute(bpe_train_sql(num_merges=3)).df()
    assert len(m) == len(em) == 1
    assert em["left_sym"].tolist() == m["left_sym"].tolist() == ["a"]
