"""Global-rank ntile bucketing vs DuckDB's ntile window function."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _ntile_df(t, n, order):
    return duckdb.sql(
        "SELECT doc_id, s, CAST(ntile(%d) OVER (ORDER BY s %s, doc_id)"
        " AS BIGINT) AS bucket FROM t" % (n, order)
    ).df().sort_values("doc_id").reset_index(drop=True)


@pytest.mark.parametrize("n,desc", [(3, False), (3, True), (10, False),
                                    (7, True)])
def test_ntile_matches_duckdb_heavy_ties(ray_session, n, desc):
    import ray.data
    from apollo_ray.functions.ranking import ntile_buckets
    rng = np.random.default_rng(7)
    N = 5000
    t = pa.table({
        "doc_id": pa.array(rng.permutation(N).astype(np.int64)),
        "s": pa.array(rng.integers(0, 23, N).astype(np.int64)),
    })
    got = ntile_buckets(ray.data.from_arrow(t), n, score_col="s",
                        id_col="doc_id", descending=desc, num_partitions=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = _ntile_df(t, n, "DESC" if desc else "ASC")
    assert got.equals(want)


def test_ntile_float_quanta(ray_session):
    import ray.data
    from apollo_ray.functions.ranking import ntile_buckets
    rng = np.random.default_rng(3)
    N = 3000
    t = pa.table({
        "doc_id": pa.array(np.arange(N, dtype=np.int64)),
        "s": pa.array(np.round(rng.normal(-3, 1, N), 4)),
    })
    got = ntile_buckets(ray.data.from_arrow(t), 3, score_col="s",
                        id_col="doc_id", descending=True, num_partitions=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got.equals(_ntile_df(t, 3, "DESC"))


def test_ntile_fewer_rows_than_buckets(ray_session):
    import ray.data
    from apollo_ray.functions.ranking import ntile_buckets
    t = pa.table({"doc_id": pa.array(np.arange(4, dtype=np.int64)),
                  "s": pa.array(np.array([5, 5, 5, 2], dtype=np.int64))})
    got = ntile_buckets(ray.data.from_arrow(t), 7, score_col="s",
                        id_col="doc_id", num_partitions=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got.equals(_ntile_df(t, 7, "ASC"))


def test_ntile_single_value_all_ties(ray_session):
    """One distinct value spanning every bucket: the whole dataset is
    one boundary group, ranked purely by id."""
    import ray.data
    from apollo_ray.functions.ranking import ntile_buckets
    N = 100
    t = pa.table({"doc_id": pa.array(np.arange(N, dtype=np.int64)[::-1]),
                  "s": pa.array(np.full(N, 9, dtype=np.int64))})
    got = ntile_buckets(ray.data.from_arrow(t), 4, score_col="s",
                        id_col="doc_id", num_partitions=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got.equals(_ntile_df(t, 4, "ASC"))


def test_ntile_empty(ray_session):
    import ray.data
    from apollo_ray.functions.ranking import ntile_buckets
    t = pa.table({"doc_id": pa.array([], type=pa.int64()),
                  "s": pa.array([], type=pa.int64())})
    out = ntile_buckets(ray.data.from_arrow(t), 3, score_col="s",
                        id_col="doc_id")
    assert out.count() == 0
    # NB: empty datasets lose their schema through to_pandas() (known
    # Ray gotcha) — assert on the Dataset schema instead
    assert sorted(out.schema().names) == ["bucket", "doc_id", "s"]


def test_ntile_hist_cap_raises(ray_session):
    # mode="exact" keeps the declared above-cap boundary; the default
    # "auto" switches to sampled cuts instead (tested below)
    import ray.data
    from apollo_ray.functions.ranking import ntile_buckets
    t = pa.table({"doc_id": pa.array(np.arange(50, dtype=np.int64)),
                  "s": pa.array(np.arange(50, dtype=np.int64))})
    with pytest.raises(NotImplementedError):
        ntile_buckets(ray.data.from_arrow(t), 3, score_col="s",
                      id_col="doc_id", hist_cap=10, mode="exact")


def test_ppl_buckets_tiers(ray_session):
    """head = best (highest avg_lp_r4), tail = worst; tier labels
    consistent with bucket ids; verified against a DuckDB ntile over
    the engine's own scores."""
    import ray.data
    from apollo_ray.functions.lm import unigram_score
    from apollo_ray.functions.ranking import ppl_buckets
    texts = ["a a a a", "a a b b", "b c d e", "a b", "z z q q w",
             "a a a b", "c c c c", "q w e r t y"]
    docs = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    })
    ds = ray.data.from_arrow(docs)
    out = ppl_buckets(ds, n=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    scores = unigram_score(ray.data.from_arrow(docs)).to_pandas()
    want = duckdb.sql(
        "SELECT doc_id, CAST(ntile(3) OVER (ORDER BY avg_lp_r4 DESC,"
        " doc_id) AS BIGINT) AS bucket FROM scores"
    ).df().sort_values("doc_id").reset_index(drop=True)
    assert out["bucket"].tolist() == want["bucket"].tolist()
    assert (out.loc[out.bucket == 1, "tier"] == "head").all()
    assert (out.loc[out.bucket == 2, "tier"] == "middle").all()
    assert (out.loc[out.bucket == 3, "tier"] == "tail").all()
    # head really has the best mean log-prob
    assert out.loc[out.bucket == 1, "avg_lp_r4"].min() >= \
        out.loc[out.bucket == 3, "avg_lp_r4"].max()


def test_sliding_window_matches_duckdb(ray_session):
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data
    from apollo_ray.functions.asof import (sliding_window_stats,
                                           sliding_window_stats_sql)
    duckdb = pytest.importorskip("duckdb")
    rng = np.random.default_rng(9)
    n = 500
    base = 1_700_000_000_000_000  # us epoch
    ts = base + np.sort(rng.integers(0, 6 * 3_600_000_000, n))
    tbl = pa.table({
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "event_type": pa.array([["click", "view", "buy"][i % 3]
                                for i in range(n)]),
        "value": pa.array(np.round(rng.uniform(0, 50, n), 2)),
    })
    got = sliding_window_stats(ray.data.from_arrow(tbl).repartition(4)) \
        .to_pandas().sort_values(["event_type", "win_us"]) \
        .reset_index(drop=True)
    # every event contributes to exactly 4 windows
    assert got["n"].sum() == 4 * n
    con = duckdb.connect()
    con.register("events", tbl)
    want = con.execute(sliding_window_stats_sql()
                       + " ORDER BY event_type, win_us").df()
    assert (got["win_us"].values == want["win_us"].values).all()
    assert (got["n"].values == want["n"].values).all()
    assert (got["sum_cents"].values == want["sum_cents"].values).all()


@pytest.mark.parametrize("desc", [False, True])
def test_ntile_sampled_full_rate_exact(ray_session, desc):
    # sample_rate=1.0 with all-distinct values reproduces ANSI ntile
    # exactly (the sampled cuts follow the ANSI fill rule)
    import ray.data
    from apollo_ray.functions.ranking import ntile_buckets
    rng = np.random.default_rng(11)
    N = 2003
    t = pa.table({
        "doc_id": pa.array(np.arange(N, dtype=np.int64)),
        "s": pa.array(rng.permutation(N * 3)[:N].astype(np.int64)),
    })
    got = ntile_buckets(ray.data.from_arrow(t), 7, score_col="s",
                        id_col="doc_id", descending=desc,
                        mode="sample", sample_rate=1.0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got.equals(_ntile_df(t, 7, "DESC" if desc else "ASC"))


def test_ntile_auto_switches_to_sampled_above_cap(ray_session):
    # hist_cap=10 forces the sampled path mid-collect; the result must
    # stay monotone in score and approximately balanced
    import ray.data
    from apollo_ray.functions.ranking import ntile_buckets
    rng = np.random.default_rng(13)
    N = 4000
    t = pa.table({
        "doc_id": pa.array(np.arange(N, dtype=np.int64)),
        "s": pa.array(rng.permutation(N).astype(np.int64)),
    })
    got = ntile_buckets(ray.data.from_arrow(t), 4, score_col="s",
                        id_col="doc_id", hist_cap=10, mode="auto",
                        sample_target=1000) \
        .to_pandas().sort_values("s").reset_index(drop=True)
    assert len(got) == N
    b = got["bucket"].to_numpy()
    assert (np.diff(b) >= 0).all()          # monotone in score
    assert set(b) == {1, 2, 3, 4}
    sizes = got.groupby("bucket").size()
    # DKW bound at m=1000, delta=1e-3: ~6.2% of N per cut
    assert (np.abs(sizes - N / 4) < 0.1 * N).all()

    # mode="exact" keeps the declared boundary above the cap
    with pytest.raises(NotImplementedError):
        ntile_buckets(ray.data.from_arrow(t), 4, score_col="s",
                      id_col="doc_id", hist_cap=10,
                      mode="exact").to_pandas()
