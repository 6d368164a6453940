"""token_freq_hist (Zipf histogram) and source_dup_stats (per-source
duplication rate) against hand-computed fixtures."""

import pyarrow as pa
import pytest


@pytest.fixture()
def corpus(ray_session):
    import ray.data as rd
    t = pa.table({
        "doc_id": pa.array(range(6), type=pa.int64()),
        "text": pa.array([
            "a a a a b",        # a x4, b x1
            "a b c",            # a x1, b x1, c x1
            "a b c",            # exact dup in srcY
            "d",                # singleton
            "",                 # empty
            "e e e",            # e x3
        ]),
        "source": pa.array(["srcX", "srcY", "srcY", "srcX", "srcX",
                            "srcY"]),
    })
    return rd.from_arrow(t)


def test_token_freq_hist(corpus):
    from apollo_ray.functions.textstats import token_freq_hist
    df = token_freq_hist(corpus).to_pandas().set_index("bucket")[
        "n_tokens"].sort_index()
    # totals: a=6, b=3, c=2, d=1, e=3 -> buckets floor(log2):
    # a->2, b->1, c->1, d->0, e->1
    assert df.to_dict() == {0: 1, 1: 3, 2: 1}


def test_token_freq_hist_power_of_two_boundary(ray_session):
    import ray.data as rd
    from apollo_ray.functions.textstats import token_freq_hist
    # c=4 must land in bucket 2 exactly (frexp path, no log2 rounding)
    t = pa.table({"doc_id": pa.array([0], type=pa.int64()),
                  "text": pa.array(["w w w w"])})
    df = token_freq_hist(rd.from_arrow(t)).to_pandas()
    assert df.to_dict("records") == [{"bucket": 2, "n_tokens": 1}]


def test_source_dup_stats(corpus):
    from apollo_ray.functions.textstats import source_dup_stats
    df = source_dup_stats(corpus).to_pandas().set_index("source")
    assert df.loc["srcX", "n_docs"] == 3
    assert df.loc["srcX", "n_distinct"] == 3
    assert df.loc["srcX", "dup_ppm"] == 0
    assert df.loc["srcY", "n_docs"] == 3
    assert df.loc["srcY", "n_distinct"] == 2     # one exact dup
    assert df.loc["srcY", "dup_ppm"] == 333333   # round-half-up(1/3 ppm)


def test_funnel_counts(ray_session):
    import ray.data as rd
    from apollo_ray.functions.asof import funnel_counts

    def ev(eid, ts_us, uid, typ):
        return {"event_id": eid, "ts": ts_us, "user_id": uid,
                "event_type": typ}

    rows = [
        # user 1: full funnel in order
        ev(0, 100, 1, "signup"), ev(1, 200, 1, "view"),
        ev(2, 300, 1, "purchase"),
        # user 2: view BEFORE signup doesn't count; no view after
        ev(3, 100, 2, "view"), ev(4, 200, 2, "signup"),
        ev(5, 300, 2, "purchase"),
        # user 3: signup+view, purchase before view -> stops at view
        ev(6, 100, 3, "signup"), ev(7, 300, 3, "view"),
        ev(8, 200, 3, "purchase"),
        # user 4: never signs up
        ev(9, 100, 4, "view"), ev(10, 200, 4, "purchase"),
        # user 5: same-ts view as signup is NOT strictly after
        ev(11, 100, 5, "signup"), ev(12, 100, 5, "view"),
    ]
    t = pa.table({
        "event_id": pa.array([r["event_id"] for r in rows],
                             type=pa.int64()),
        "ts": pa.array([r["ts"] for r in rows],
                       type=pa.timestamp("us")),
        "user_id": pa.array([r["user_id"] for r in rows],
                            type=pa.int64()),
        "event_type": pa.array([r["event_type"] for r in rows]),
    })
    df = funnel_counts(rd.from_arrow(t)).to_pandas() \
        .set_index("step_idx").sort_index()
    assert df.loc[1, "n_users"] == 4     # users 1, 2, 3, 5 signed up
    assert df.loc[2, "n_users"] == 2     # users 1, 3 viewed after signup
    assert df.loc[3, "n_users"] == 1     # only user 1 completed
    assert list(df["step"]) == ["signup", "view", "purchase"]


def test_value_quantiles(ray_session):
    import ray.data as rd
    from apollo_ray.functions.textstats import value_quantiles
    vals = [1.00, 2.00, 3.00, 4.00]          # typeA: ranks 1..4
    t = pa.table({
        "event_type": pa.array(["A"] * 4 + ["B"]),
        "value": pa.array(vals + [9.99], type=pa.float64()),
    })
    df = value_quantiles(rd.from_arrow(t)).to_pandas() \
        .set_index("event_type")
    # quantile_disc rank = ceil(q*n): n=4 -> p25 rank 1, p50 rank 2,
    # p75 rank 3
    assert df.loc["A", ["n_events", "p25_c", "p50_c", "p75_c"]] \
        .tolist() == [4, 100, 200, 300]
    assert df.loc["B", ["n_events", "p25_c", "p50_c", "p75_c"]] \
        .tolist() == [1, 999, 999, 999]


def test_retention_cohorts(ray_session):
    import ray.data as rd
    from apollo_ray.functions.asof import retention_cohorts
    DAY = 86_400_000_000
    rows = [
        (1, 0),            # user 1: first day 0
        (1, 0),            # same day again -> still one active day
        (1, 2 * DAY),      # active on day 2
        (2, DAY),          # user 2: cohort day 1
        (2, DAY + 1),      # same day
        (3, 0),            # user 3: cohort day 0, never returns
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
    })
    df = retention_cohorts(rd.from_arrow(t)).to_pandas()
    got = {(r.cohort_day, r.day_offset): r.n_users
           for r in df.itertuples(index=False)}
    assert got == {(0, 0): 2, (0, 2): 1, (1, 0): 1}


def test_props_key_stats(ray_session):
    import ray.data as rd
    from apollo_ray.functions.textstats import props_key_stats
    t = pa.table({
        "event_type": pa.array(["a", "a", "a", "b"]),
        "props": pa.array(['{"k": 5}', '{"k": -3}', '{}', '{"k": 10}']),
    })
    df = props_key_stats(rd.from_arrow(t)).to_pandas() \
        .set_index("event_type")
    assert df.loc["a", ["n_with_key", "sum_v", "min_v", "max_v"]] \
        .tolist() == [2, 2, -3, 5]
    assert df.loc["b", ["n_with_key", "sum_v", "min_v", "max_v"]] \
        .tolist() == [1, 10, 10, 10]


def test_user_cumulative_spend(ray_session):
    import ray.data as rd
    from apollo_ray.functions.asof import user_cumulative_spend
    t = pa.table({
        "event_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "ts": pa.array([10, 20, 20, 5, 30], type=pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
        "event_type": pa.array(["purchase"] * 4 + ["view"]),
        "value": pa.array([1.50, 2.25, 0.25, 9.99, 100.0],
                          type=pa.float64()),
    })
    df = user_cumulative_spend(rd.from_arrow(t)).to_pandas() \
        .set_index("event_id")["cum_spend_c"]
    # user 1: ts order 10,20,20 (tie by event_id 1<2): 150, 375, 400
    # user 2: only event 3 counts (event 4 is a view)
    assert df.to_dict() == {0: 150, 1: 375, 2: 400, 3: 999}


def test_dup_size_hist(ray_session):
    import ray.data as rd
    from apollo_ray.functions.dedup_extras import dup_size_hist
    t = pa.table({
        "doc_id": pa.array(range(6), type=pa.int64()),
        "text": pa.array(["x", "x", "x", "y", "y", "z"]),
    })
    df = dup_size_hist(rd.from_arrow(t)).to_pandas() \
        .set_index("n_members")["n_groups"]
    assert df.to_dict() == {1: 1, 2: 1, 3: 1}


# ---------------------------------------------------------------------------
# html_tag_stats
# ---------------------------------------------------------------------------

def test_html_tag_stats_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from apollo_ray.functions.textstats import (html_tag_stats,
                                                html_tag_stats_sql)
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": [
            "<div class=x><p>Hello</p><script src=s.js></script>"
            "<a href=u>y</a></div>",
            "plain prose, no markup at all",
            "",
            "broken <tag and a lone < sign plus 3 < 4 math",
        ]})
    eng = (html_tag_stats(ray.data.from_arrow(docs)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect(); con.register("documents", docs)
    ora = (con.sql(html_tag_stats_sql()).df()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    r1 = eng[eng.doc_id == 1].iloc[0]
    assert (r1.n_tags, r1.n_scripts, r1.n_anchors) == (8, 1, 1)
    assert r1.text_chars == len("Helloy")
    # empty doc: NULL ratio
    assert pd.isna(eng[eng.doc_id == 3].text_ratio_ppm.iloc[0])
    # prose doc: ratio exactly 1e6
    assert eng[eng.doc_id == 2].text_ratio_ppm.iloc[0] == 1_000_000


def test_quantile_filter_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from apollo_ray.functions.textstats import (quantile_filter,
                                                quantile_filter_sql)
    docs = pa.table({
        "doc_id": pa.array(range(12), type=pa.int64()),
        "lang": pa.array(["en"] * 6 + ["de"] * 6),
        "text": ["w " * (i + 1) for i in range(6)]
                + ["x " * (10 * (i + 1)) for i in range(6)],
    })
    eng = (quantile_filter(ray.data.from_arrow(docs).repartition(3),
                           pct="p50")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect(); con.register("documents", docs)
    ora = (con.sql(quantile_filter_sql("p50")).df()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    # each language keeps only rows at/above its OWN median: the short
    # 'en' docs survive against the en bar, not the global one
    assert (eng.lang == "en").sum() > 0 and (eng.lang == "de").sum() > 0
