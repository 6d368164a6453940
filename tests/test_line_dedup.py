"""Cross-document line dedup: first occurrence wins, rebuild exact."""

import numpy as np
import pyarrow as pa


def _docs(texts):
    return pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    })


def _run(texts, ray_mod, **kw):
    from apollo_ray.functions.clean import line_dedup
    out = line_dedup(ray_mod.data.from_arrow(_docs(texts)), **kw) \
        .to_pandas().set_index("doc_id").sort_index()
    return out


def test_first_occurrence_wins(ray_session):
    import ray
    texts = [
        "alpha\nbeta\ngamma",      # doc 0: all first occurrences
        "beta\ndelta",             # doc 1: beta dropped
        "gamma\nbeta\nepsilon",    # doc 2: gamma+beta dropped
    ]
    out = _run(texts, ray)
    assert out.loc[0, "text"] == "alpha\nbeta\ngamma"
    assert out.loc[0, "n_dup_lines"] == 0
    assert out.loc[1, "text"] == "delta"
    assert out.loc[1, "n_dup_lines"] == 1
    assert out.loc[2, "text"] == "epsilon"
    assert out.loc[2, "n_dup_lines"] == 2


def test_within_doc_duplicates_and_empty_lines(ray_session):
    import ray
    texts = [
        "x\n\nx\n\ny",   # second 'x' dropped; empty lines ineligible, kept
        "\n\n",          # all-empty doc: unchanged
    ]
    out = _run(texts, ray)
    assert out.loc[0, "text"] == "x\n\n\ny"
    assert out.loc[0, "n_dup_lines"] == 1
    assert out.loc[1, "text"] == "\n\n"
    assert out.loc[1, "n_dup_lines"] == 0


def test_doc_fully_dropped_becomes_empty(ray_session):
    import ray
    texts = ["a\nb", "a\nb"]
    out = _run(texts, ray)
    assert out.loc[0, "text"] == "a\nb"
    assert out.loc[1, "text"] == ""
    assert out.loc[1, "n_dup_lines"] == 2


def test_min_len_exempts_short_lines(ray_session):
    import ray
    texts = ["ab\ncd", "ab\ncd\nef"]
    out = _run(texts, ray, min_len=3)   # every line ineligible -> kept
    assert out.loc[1, "text"] == "ab\ncd\nef"
    assert out["n_dup_lines"].sum() == 0


def test_matches_duckdb_oracle(ray_session):
    import duckdb
    import ray
    rng = np.random.default_rng(7)
    pool = ["the quick fox", "lorem", "", "a b c", "jumped over", "zzz",
            "shared line one", "shared line two"]
    texts = ["\n".join(rng.choice(pool, size=rng.integers(1, 6)))
             for _ in range(60)]
    out = _run(texts, ray).reset_index()
    from apollo_ray.functions.clean import line_dedup_sql
    con = duckdb.connect()
    con.register("documents", _docs(texts).to_pandas())
    exp = con.execute(line_dedup_sql(min_len=1)).df() \
        .sort_values("doc_id").reset_index(drop=True)
    got = out.sort_values("doc_id").reset_index(drop=True)
    assert got["text"].tolist() == exp["text"].tolist()
    assert got["n_dup_lines"].astype(int).tolist() == \
        exp["n_dup_lines"].astype(int).tolist()


def test_join_fallback_path(ray_session, monkeypatch):
    import apollo_ray.functions.clean as clean_mod
    import ray
    monkeypatch.setattr(clean_mod, "DROP_LISTS_BROADCAST_MAX", 0)
    texts = ["a\nb", "a\nb", "c"]
    out = _run(texts, ray)
    assert out.loc[1, "text"] == ""
    assert out.loc[1, "n_dup_lines"] == 2
    assert out.loc[0, "text"] == "a\nb"
    assert out.loc[2, "text"] == "c"


def test_paragraph_granularity(ray_session):
    import duckdb
    import ray
    # paragraphs (\n\n) dedup as units; single \n lines inside a
    # paragraph are NOT touched
    texts = ["intro here\n\nshared para\nline two\n\nown tail",
             "other intro\n\nshared para\nline two",
             "shared para\nline two"]     # whole doc == the dup para
    out = _run(texts, ray, sep="\n\n")
    assert out.loc[0, "text"] == texts[0]            # first occurrence
    assert out.loc[1, "text"] == "other intro"
    assert out.loc[1, "n_dup_lines"] == 1
    assert out.loc[2, "text"] == ""
    from apollo_ray.functions.clean import line_dedup_sql
    con = duckdb.connect()
    con.register("documents", _docs(texts).to_pandas())
    exp = con.execute(line_dedup_sql(
        min_len=1, sep_sql="chr(10)||chr(10)")).df() \
        .sort_values("doc_id").reset_index(drop=True)
    got = out.reset_index().sort_values("doc_id").reset_index(drop=True)
    assert got["text"].tolist() == exp["text"].tolist()
    assert got["n_dup_lines"].astype(int).tolist() == \
        exp["n_dup_lines"].astype(int).tolist()
