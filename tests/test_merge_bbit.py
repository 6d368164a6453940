"""Round-4 merge/sketch operators: priority_dedup,
normalized_exact_dedup, bbit_minhash_pairs — engine == DuckDB oracle
on synthetic corpora that actually exercise the election / merge /
estimation rules (the driver testdata has no exact dups)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), kind="mergesort") \
        .reset_index(drop=True)


def _oracle(t: pa.Table, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    df = con.execute(sql).fetchdf()
    con.close()
    return _canon(df)


def _docs_table():
    # the same text from several sources + unique fillers
    rows = [
        (0, "alpha beta gamma", "src9"),
        (1, "alpha beta gamma", "src3"),     # listed (rank 1) -> wins
        (2, "alpha beta gamma", "src7"),     # listed (rank 0)... but
        (3, "alpha beta gamma", "src10"),    # doc 2 beats doc 1
        (4, "delta epsilon", "src2"),
        (5, "delta epsilon", "src10"),       # unlisted: 'src10' < 'src2'
        (6, "unique text one", "src0"),
        (7, "zeta eta theta", "src5"),
        (8, "zeta eta theta", "src5"),       # same source: min doc_id
    ]
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows]),
        "source": pa.array([r[2] for r in rows]),
    })


def test_priority_dedup_election(ray_session):
    import ray.data as rd
    from apollo_ray.functions.merge import priority_dedup, priority_dedup_sql
    t = _docs_table()
    got = _canon(priority_dedup(rd.from_arrow(t),
                                priority=("src7", "src3"),
                                num_partitions=4).to_pandas())
    exp = _oracle(t, priority_dedup_sql(priority=("src7", "src3")))
    assert got.astype(str).equals(exp.astype(str))
    by_text = {2: "src7",   # listed rank 0 wins the 4-way group
               5: "src10",  # unlisted tie: 'src10' < 'src2' wins
               6: "src0", 7: "src5"}
    winners = dict(zip(got["doc_id"], got["source"]))
    assert winners == by_text


def test_priority_dedup_empty_priority_is_source_order(ray_session):
    import ray.data as rd
    from apollo_ray.functions.merge import priority_dedup, priority_dedup_sql
    t = _docs_table()
    got = _canon(priority_dedup(rd.from_arrow(t), priority=(),
                                num_partitions=2).to_pandas())
    exp = _oracle(t, priority_dedup_sql(priority=()))
    assert got.astype(str).equals(exp.astype(str))


def test_normalized_exact_dedup_merges_variants(ray_session):
    import ray.data as rd
    from apollo_ray.functions.merge import (normalized_exact_dedup,
                                            normalized_exact_dedup_sql)
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "text": pa.array(["hello  world", "hello world",     # space run
                          "hello world\r\n",                 # CRLF + trim
                          "different doc", "different doc"]),  # raw dup
        "source": pa.array(["a"] * 5),
    })
    got = _canon(normalized_exact_dedup(
        rd.from_arrow(t), num_partitions=2).to_pandas())
    exp = _oracle(t, normalized_exact_dedup_sql())
    assert got.astype(str).equals(exp.astype(str))
    groups = {int(r.rep_id): (int(r.n_members), int(r.n_raw_variants))
              for r in got.itertuples()}
    assert groups[0] == (3, 3)   # three byte-variants of one content
    assert groups[3] == (2, 1)   # raw dup: one variant


def test_bbit_minhash_pairs_oracle_and_estimator(ray_session):
    import ray.data as rd
    from apollo_ray.functions.dedup_extras import (bbit_minhash_pairs,
                                                   bbit_minhash_pairs_sql)
    rng = np.random.default_rng(7)
    vocab = ["w%d" % i for i in range(50)]
    texts = []
    for i in range(30):
        toks = list(rng.choice(vocab, size=30))
        texts.append(" ".join(toks))
    texts += texts[:6]            # exact dups -> guaranteed co-bucket
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
        "source": pa.array(["s"] * len(texts)),
    })
    got = _canon(bbit_minhash_pairs(rd.from_arrow(t),
                                    num_partitions=4).to_pandas())
    exp = _oracle(t, bbit_minhash_pairs_sql())
    assert len(got) >= 6
    assert got.astype(str).equals(exp.astype(str))
    # identical docs agree on every bit -> estimate 1.0
    ident = got[(got.doc_a + 30) == got.doc_b]
    assert len(ident) == 6
    assert (ident.n_agree == 16).all()
    assert (ident.est_ppm == 1_000_000).all()
    # estimator formula holds row-wise
    est = np.maximum(0, (2 * got.n_agree.to_numpy() - 16) * 1_000_000 // 16)
    assert (got.est_ppm.to_numpy() == est).all()


def test_bbit_bucket_cap_applies_both_sides(ray_session):
    """A text shared by > max_bucket docs is skipped in engine AND
    SQL (same HAVING band)."""
    import ray.data as rd
    from apollo_ray.functions.dedup_extras import (bbit_minhash_pairs,
                                                   bbit_minhash_pairs_sql)
    texts = ["same same same words here"] * 10 + ["other words entirely x"] * 2
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
        "source": pa.array(["s"] * len(texts)),
    })
    got = _canon(bbit_minhash_pairs(rd.from_arrow(t), max_bucket=4,
                                    num_partitions=2).to_pandas())
    exp = _oracle(t, bbit_minhash_pairs_sql(max_bucket=4))
    assert got.astype(str).equals(exp.astype(str))
    # the 10-doc bucket is skipped; only the 2-doc bucket pairs remain
    assert set(zip(got.doc_a, got.doc_b)) == {(10, 11)}


def test_oph_signatures_oracle_and_properties(ray_session):
    """OPH + rotation densification == SQL oracle, including
    wrap-around borrows; non-densified bins equal the true per-bin
    minima; identical docs share identical signatures."""
    import ray.data as rd
    from apollo_ray.functions.dedup_extras import (oph_signatures,
                                                   oph_signatures_sql)
    rng = np.random.default_rng(6)
    vocab = ["w%d" % i for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=n))
             for n in (3, 4, 6, 10, 30, 80, 2, 0)]
    texts += [texts[4]]                     # exact dup of doc 4
    t = pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                  "text": pa.array(texts), "source": pa.array(["s"] * 9)})
    got = oph_signatures(rd.from_arrow(t)).to_pandas() \
        .sort_values(["doc_id", "j"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    exp = con.execute(oph_signatures_sql()).fetchdf() \
        .sort_values(["doc_id", "j"]).reset_index(drop=True)
    con.close()
    assert got.astype("int64").equals(exp[got.columns.tolist()]
                                      .astype("int64"))
    # docs with < 3 tokens emit nothing
    assert not set(got.doc_id) & {6, 7}
    # each emitting doc has exactly n_bins rows
    assert (got.groupby("doc_id").size() == 16).all()
    # exact dup -> identical signature vector
    a = got[got.doc_id == 4].sig.to_numpy()
    b = got[got.doc_id == 8].sig.to_numpy()
    assert (a == b).all()
    # the short docs force empty bins -> densification exercised
    assert got.densified.sum() > 0
