"""Stratified / temperature sampling: rate math, determinism, and
DuckDB parity of the generated SQL twins."""

import numpy as np
import pyarrow as pa
import pytest

from apollo_ray.functions.sampling import temperature_rates


def _docs_table(n=400, seed=5):
    rng = np.random.default_rng(seed)
    langs = rng.choice(["en", "de", "zh"], size=n, p=[0.7, 0.2, 0.1])
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "lang": pa.array(langs.tolist()),
        "text": pa.array(["w%d" % i for i in range(n)]),
    })


def test_temperature_rates_alpha_edges():
    counts = {"en": 1000, "de": 100, "zh": 10}
    # alpha=1: natural proportions — every group keeps the base rate
    assert temperature_rates(counts, 1.0, 400) == \
        {"en": 400, "de": 400, "zh": 400}
    # alpha=0: equal quota — integer rule, capped at 1000
    r0 = temperature_rates(counts, 0.0, 300)
    assert r0 == {"en": 300, "de": 1000, "zh": 1000}
    assert temperature_rates({}, 0.0) == {}
    assert temperature_rates({"a": 0}, 0.0)["a"] == 0


def test_stratified_deterministic_and_partition_independent(ray_session):
    import ray.data
    from apollo_ray.functions.sampling import stratified_sample
    tab = _docs_table()
    rates = {"en": 200, "de": 700, "zh": 1000}
    a = stratified_sample(ray.data.from_arrow(tab), rates) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = stratified_sample(ray.data.from_arrow(tab).repartition(7), rates) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    # zh rate 1000 keeps every zh row; unknown default drops nothing here
    n_zh = (tab.column("lang").to_pandas() == "zh").sum()
    assert (a["lang"] == "zh").sum() == n_zh
    # en down-sampled to roughly 20%
    n_en = (tab.column("lang").to_pandas() == "en").sum()
    kept_en = (a["lang"] == "en").sum()
    assert 0.1 * n_en < kept_en < 0.35 * n_en


def test_stratified_bad_rate_raises(ray_session):
    import ray.data
    from apollo_ray.functions.sampling import stratified_sample
    with pytest.raises(ValueError):
        stratified_sample(ray.data.from_arrow(_docs_table()), {"en": 1001})


def test_sql_parity(ray_session):
    import duckdb
    import ray.data
    from apollo_ray.functions.sampling import (stratified_sample,
                                               stratified_sample_sql,
                                               temperature_sample,
                                               temperature_sample_sql)
    tab = _docs_table()
    con = duckdb.connect()
    con.register("documents", tab)
    rates = {"en": 150, "de": 650}          # zh falls to default 0
    eng = stratified_sample(ray.data.from_arrow(tab), rates) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    ora = con.execute(stratified_sample_sql(rates)
                      + " ORDER BY doc_id").fetchdf()
    assert list(eng["doc_id"]) == list(ora["doc_id"])
    assert (eng["lang"] != "zh").all()

    eng_t = temperature_sample(ray.data.from_arrow(tab), alpha=0.0,
                               base_permille=250) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    ora_t = con.execute(temperature_sample_sql(base_permille=250)
                        + " ORDER BY doc_id").fetchdf()
    assert list(eng_t["doc_id"]) == list(ora_t["doc_id"])
    # flattening: the dominant group's kept share is ~25%, the smallest
    # group keeps (capped) everything its quota allows
    kept = eng_t.groupby("lang")["doc_id"].count()
    total = tab.to_pandas().groupby("lang")["doc_id"].count()
    assert kept["en"] / total["en"] < 0.4
    assert kept["zh"] / total["zh"] > 0.8


def test_leakage_safe_splits(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    import pytest
    from apollo_ray.functions.sampling import (leakage_safe_splits,
                                               leakage_safe_splits_sql)
    duckdb = pytest.importorskip("duckdb")
    texts = ["body %d" % (i % 40) for i in range(200)]  # 5 dups each
    tbl = pa.table({"doc_id": pa.array(range(200), type=pa.int64()),
                    "text": pa.array(texts)})
    got = leakage_safe_splits(ray.data.from_arrow(tbl).repartition(4)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # no leakage: every duplicate group lands in exactly one split
    for _, grp in got.groupby("rep_id"):
        assert grp["split"].nunique() == 1
    # all three splits appear and train dominates
    counts = got["split"].value_counts()
    assert set(counts.index) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] + counts["test"]
    con = duckdb.connect()
    con.register("documents", tbl)
    want = con.execute(leakage_safe_splits_sql()
                       + " ORDER BY doc_id").df()
    assert (got["rep_id"].values == want["rep_id"].values).all()
    assert (got["split"].values == want["split"].values).all()


# ---------------------------------------------------------------------------
# lang_budget_sample
# ---------------------------------------------------------------------------

def test_lang_budget_sample_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from apollo_ray.functions.sampling import (lang_budget_sample,
                                               lang_budget_sample_sql)
    docs = pa.table({
        "doc_id": pa.array(range(100), type=pa.int64()),
        "lang": pa.array([["en", "de", "fr"][i % 3] for i in range(100)]),
        "text": pa.array(["t%d" % i for i in range(100)]),
    })
    # multiple blocks: the partial top-k per (group, block) must
    # compose to the same global selection
    eng = (lang_budget_sample(ray.data.from_arrow(docs).repartition(4),
                              budget=7)
           .to_pandas().sort_values(["lang", "doc_id"])
           .reset_index(drop=True))
    con = duckdb.connect(); con.register("documents", docs)
    ora = (con.sql(lang_budget_sample_sql(7)).df()
           .sort_values(["lang", "doc_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    assert eng.groupby("lang").size().tolist() == [7, 7, 7]


def test_lang_budget_sample_budget_exceeds_group(ray_session):
    import pyarrow as pa
    import ray.data
    from apollo_ray.functions.sampling import lang_budget_sample
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "lang": pa.array(["en", "en", "de"]),
    })
    out = lang_budget_sample(ray.data.from_arrow(docs), budget=10) \
        .to_pandas()
    # a group smaller than the budget survives whole
    assert sorted(out.doc_id.tolist()) == [1, 2, 3]
