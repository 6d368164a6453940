"""strip_boilerplate (frequent-line removal, all occurrences) and
soft_dedup_weights (duplication-aware sampling weights)."""

import numpy as np
import pyarrow as pa


def _docs(texts, sources=None):
    t = {
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    }
    if sources is not None:
        t["source"] = pa.array(sources)
    return pa.table(t)


def _run_sb(texts, ray_mod, sources=None, **kw):
    from apollo_ray.functions.clean import strip_boilerplate
    out = strip_boilerplate(ray_mod.data.from_arrow(_docs(texts, sources)),
                            **kw).to_pandas().set_index("doc_id").sort_index()
    return out


def test_all_occurrences_dropped_global(ray_session):
    import ray
    texts = [
        "nav\nalpha\nfooter",
        "nav\nbeta\nfooter",
        "gamma\nnav",
    ]
    out = _run_sb(texts, ray, min_df=3)
    # 'nav' occurs 3x -> every copy dropped (including the first,
    # unlike line_dedup); 'footer' occurs only 2x -> kept
    assert out.loc[0, "text"] == "alpha\nfooter"
    assert out.loc[0, "n_boiler_lines"] == 1
    assert out.loc[1, "text"] == "beta\nfooter"
    assert out.loc[2, "text"] == "gamma"
    assert out.loc[2, "n_boiler_lines"] == 1


def test_scope_isolates_sources(ray_session):
    import ray
    texts = ["nav\na1", "nav\na2", "nav\nb1"]
    srcs = ["siteA", "siteA", "siteB"]
    out = _run_sb(texts, ray, sources=srcs, min_df=2, scope_col="source")
    # 'nav' repeats within siteA only; siteB's single copy survives
    assert out.loc[0, "text"] == "a1"
    assert out.loc[1, "text"] == "a2"
    assert out.loc[2, "text"] == "nav\nb1"
    assert out.loc[2, "n_boiler_lines"] == 0


def test_within_doc_repetition_counts(ray_session):
    import ray
    # the same line twice in ONE doc reaches min_df=2 by itself
    out = _run_sb(["spam\nx\nspam", "y"], ray, min_df=2)
    assert out.loc[0, "text"] == "x"
    assert out.loc[0, "n_boiler_lines"] == 2
    assert out.loc[1, "text"] == "y"


def test_min_len_exempts_short_lines(ray_session):
    import ray
    # empty separator lines repeat everywhere but are exempt below
    # min_len (the line_dedup convention)
    out = _run_sb(["aa\n\nbb", "cc\n\ndd"], ray, min_df=2, min_len=1)
    assert out.loc[0, "text"] == "aa\n\nbb"
    assert out.loc[1, "text"] == "cc\n\ndd"


def test_no_boilerplate_passthrough_keeps_schema(ray_session):
    import ray
    out = _run_sb(["unique1", "unique2"], ray, min_df=2)
    assert list(out.loc[0].index) >= ["n_boiler_lines", "text"]
    assert out["n_boiler_lines"].sum() == 0
    assert out.loc[0, "text"] == "unique1"


def test_oracle_parity_sql(ray_session, tmp_path):
    """Engine == DuckDB oracle byte-for-byte on a small scoped corpus."""
    import duckdb
    import ray
    from apollo_ray.functions.clean import (strip_boilerplate,
                                            strip_boilerplate_sql)
    texts = ["nav\nalpha\nnav", "nav\nbeta", "nav\ngamma", "solo"]
    srcs = ["s1", "s1", "s2", "s2"]
    tbl = _docs(texts, srcs)
    eng = strip_boilerplate(ray.data.from_arrow(tbl), min_df=2,
                            scope_col="source") \
        .select_columns(["doc_id", "text", "n_boiler_lines"]) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", tbl)
    ora = con.execute(strip_boilerplate_sql(min_df=2, scope_sql="source")) \
        .fetchdf().sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "text", "n_boiler_lines"):
        assert (eng[c].values == ora[c].values).all(), c


def test_soft_dedup_weights_values(ray_session):
    import ray
    from apollo_ray.functions.sampling import soft_dedup_weights
    texts = ["t1", "t1", "t1", "t2", "t3", "t3"]
    out = soft_dedup_weights(ray.data.from_arrow(_docs(texts)),
                             num_partitions=4) \
        .to_pandas().set_index("doc_id").sort_index()
    assert len(out) == 6
    assert (out.loc[[0, 1, 2], "n_copies"] == 3).all()
    assert (out.loc[[0, 1, 2], "weight_ppm"] == 333333).all()
    assert out.loc[3, "n_copies"] == 1
    assert out.loc[3, "weight_ppm"] == 1_000_000
    assert (out.loc[[4, 5], "weight_ppm"] == 500_000).all()
    # total mass == number of distinct texts (up to ppm rounding)
    assert abs(out["weight_ppm"].sum() - 3_000_000) < 3


def test_soft_dedup_weights_oracle_parity(ray_session):
    import duckdb
    import ray
    from apollo_ray.functions.sampling import (soft_dedup_weights,
                                               soft_dedup_weights_sql)
    texts = ["a", "b", "a", "c", "c", "c", "c"]
    tbl = _docs(texts)
    eng = soft_dedup_weights(ray.data.from_arrow(tbl), num_partitions=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", tbl)
    ora = con.execute(soft_dedup_weights_sql()).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "n_copies", "weight_ppm"):
        assert (eng[c].values == ora[c].values).all(), c


def test_cluster_soft_weights(ray_session):
    import ray.data as rd
    from apollo_ray.functions.sampling import cluster_soft_weights
    clusters = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "cc_id": pa.array([10, 10, 10, 20, 30], type=pa.int64()),
    }))
    out = cluster_soft_weights(clusters, num_partitions=2) \
        .to_pandas().set_index("doc_id").sort_index()
    assert len(out) == 5
    assert (out.loc[[1, 2, 3], "n_members"] == 3).all()
    assert (out.loc[[1, 2, 3], "weight_ppm"] == 333333).all()
    assert out.loc[4, "weight_ppm"] == 1_000_000
    assert out.loc[5, "weight_ppm"] == 1_000_000
    # per-cluster mass within the round-half-up bound
    g = out.groupby("cc_id").agg(n=("n_members", "first"),
                                 mass=("weight_ppm", "sum"))
    assert (2 * (g["mass"] - 1_000_000).abs() <= g["n"]).all()
