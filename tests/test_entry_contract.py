"""Driver-contract smoke: entry() runs; a fast subset of queries()
matches its oracle_sql() twin via DuckDB at sf0.001."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"
FAST_QUERIES = ["exact_dedup_groups", "lang_stats", "token_counts",
                "quality_stats", "docfreq", "shingle_counts",
                "emb_label_counts", "ann_close_pairs", "emb_dup_pairs",
                "communities_invariants"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "events", "embeddings"):
        c.execute("CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')"
                  % (t, SF, t))
    return c


def test_entry_smoke(ray_session):
    import __ray_entry__ as e
    ds = e.entry()
    assert ds.count() > 0
    assert set(ds.schema().names) == {"doc_id", "cc_id"}


def test_query_oracle_keys_consistent():
    import __ray_entry__ as e
    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 15


@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_oracle(name, con, ray_session):
    import __ray_entry__ as e
    mine = e.queries()[name](SF)
    import pyarrow as pa
    import ray.data as rd
    if isinstance(mine, rd.Dataset):
        mine = mine.to_pandas()
    elif isinstance(mine, pa.Table):
        mine = mine.to_pandas()
    mine = canon(mine)
    theirs = canon(con.execute(e.oracle_sql()[name]).fetchdf())
    assert list(mine.columns) == list(theirs.columns)
    assert len(mine) == len(theirs)
    for c in mine.columns:
        a, b = mine[c], theirs[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            assert ((a.astype(float) - b.astype(float)).abs() < 1e-9).all()
        else:
            assert (a.astype(str).values == b.astype(str).values).all()
