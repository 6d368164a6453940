"""URL canonicalization: rule-by-rule kernel checks, batch-split
invariance, and DuckDB oracle parity over the synthetic construction."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from apollo_ray.functions.urls import (canonical_urls, canonical_urls_sql,
                                       per_host_topk, per_host_topk_sql,
                                       canonicalize_url_array,
                                       synthetic_crawl_urls, url_host_stats,
                                       url_host_stats_sql)


def test_canonicalize_rules():
    urls = pa.array([
        "HTTPS://Site.Example.COM:443/p/1/?utm_source=x&b=2&a=1#frag",
        "http://a.com:80/x//",
        "http://a.com:8080/x",          # non-default port kept
        "https://user@B.com/path?z=1&utm_campaign=c&a=2&",
        "https://c.com",                # empty path -> /
        "http://d.com/?utm_source=o",   # all params tracking -> no ?
        "not a url#frag",               # no authority: fragment strip only
        None,
    ])
    canon, host = canonicalize_url_array(urls)
    assert canon.to_pylist() == [
        "https://site.example.com/p/1?a=1&b=2",
        "http://a.com/x",
        "http://a.com:8080/x",
        "https://user@b.com/path?a=2&z=1",
        "https://c.com/",
        "http://d.com/",
        "not a url",
        None,
    ]
    assert host.to_pylist() == [
        "site.example.com", "a.com", "a.com:8080", "b.com", "c.com",
        "d.com", "", None]


def _pages(n=400, parallelism=4):
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "url": pa.array(synthetic_crawl_urls(ids),
                                  type=pa.string())})
    return ray.data.from_arrow(t).repartition(parallelism), t


def test_canonical_urls_match_duckdb(ray_session):
    duckdb = pytest.importorskip("duckdb")
    pages, t = _pages(400)
    con = duckdb.connect()
    con.register("documents", t.select(["doc_id"]))
    got = canonical_urls(pages).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = con.execute(canonical_urls_sql()).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.equals(want)
    # planted collision: i and i+350 (i % 4 == 0) share a canonical url
    by_id = got.set_index("doc_id")["url_canon"]
    assert by_id[0] == by_id[350]
    assert by_id[1] != by_id[351]       # :8080 spelling stays distinct


def test_url_host_stats_match_duckdb(ray_session):
    duckdb = pytest.importorskip("duckdb")
    pages, t = _pages(400, parallelism=8)
    con = duckdb.connect()
    con.register("documents", t.select(["doc_id"]))
    got = url_host_stats(pages).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    want = con.execute(url_host_stats_sql()).df() \
        .sort_values("host").reset_index(drop=True)
    assert got["host"].tolist() == want["host"].tolist()
    assert got["n_urls"].tolist() == [int(x) for x in want["n_urls"]]
    assert got["n_canonical"].tolist() == [
        int(x) for x in want["n_canonical"]]
    # dedup actually found something
    assert (got["n_canonical"] < got["n_urls"]).any()


def test_canonical_batch_split_invariant(ray_session):
    a, _ = _pages(300, parallelism=2)
    b, _ = _pages(300, parallelism=16)
    ga = canonical_urls(a).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    gb = canonical_urls(b).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert ga.equals(gb)


def _scored_pages(n=400, parallelism=4):
    """Pages with doc_id, url, text whose char length varies and ties
    across docs of the same host (exercises the doc_id tiebreak); a
    multibyte char checks utf8_length vs DuckDB length() parity."""
    ids = np.arange(n, dtype=np.int64)
    text = [("é" * (int(i) % 3)) + "x" * ((int(i) * 37) % 50)
            for i in ids]
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "url": pa.array(synthetic_crawl_urls(ids),
                                  type=pa.string()),
                  "text": pa.array(text, type=pa.string())})
    return ray.data.from_arrow(t).repartition(parallelism), t


def test_per_host_topk_matches_bruteforce(ray_session):
    import pandas as pd
    pages, t = _scored_pages(400, parallelism=8)
    got = per_host_topk(pages, k=5, num_partitions=8).to_pandas() \
        .sort_values(["host", "host_rank"]).reset_index(drop=True)
    canon, host = canonicalize_url_array(t.column("url"))
    df = pd.DataFrame({"host": host.to_pylist(),
                       "doc_id": t.column("doc_id").to_pylist(),
                       "score": [len(s) for s in t.column(
                           "text").to_pylist()]})
    df = df.sort_values(["host", "score", "doc_id"],
                        ascending=[True, False, True])
    df["host_rank"] = df.groupby("host").cumcount() + 1
    want = df[df["host_rank"] <= 5].reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["score"].tolist() == want["score"].tolist()
    assert got["host_rank"].tolist() == want["host_rank"].tolist()
    # quota actually binds: every host had > 5 docs
    assert len(got) == got["host"].nunique() * 5


def test_per_host_topk_matches_duckdb(ray_session):
    duckdb = pytest.importorskip("duckdb")
    pages, t = _scored_pages(400, parallelism=8)
    con = duckdb.connect()
    con.register("documents", t.select(["doc_id", "text"]))
    got = per_host_topk(pages, k=10, num_partitions=8).to_pandas() \
        .sort_values(["host", "host_rank"]).reset_index(drop=True)
    want = con.execute(per_host_topk_sql(k=10)).df() \
        .sort_values(["host", "host_rank"]).reset_index(drop=True)
    for c in ("host", "doc_id", "score", "host_rank"):
        assert got[c].tolist() == want[c].tolist(), c


def test_per_host_topk_split_invariant(ray_session):
    a, _ = _scored_pages(300, parallelism=1)
    b, _ = _scored_pages(300, parallelism=16)
    ga = per_host_topk(a, k=3, num_partitions=4).to_pandas() \
        .sort_values(["host", "host_rank"]).reset_index(drop=True)
    gb = per_host_topk(b, k=3, num_partitions=16).to_pandas() \
        .sort_values(["host", "host_rank"]).reset_index(drop=True)
    assert ga.equals(gb)


# ---------------------------------------------------------------------------
# extract_links / link_host_counts
# ---------------------------------------------------------------------------

_LINK_DOCS = pa.table({
    "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
    "text": [
        'a <a href="https://A.example.com:80/x">one</a> and '
        '<a href="/rel">two</a>',
        'no links at all',
        'mid <a href="https://b.example.com/y">y</a> tail <a href="oops',
        '<a href="HTTPS://b.Example.com:8080/z?q=1#f">z</a>',
        '',
    ]})


def _links_oracle(sql):
    import duckdb
    con = duckdb.connect()
    con.register("documents", _LINK_DOCS)
    return con.sql(sql).df()


def test_extract_links_matches_duckdb(ray_session):
    from apollo_ray.functions.urls import extract_links, extract_links_sql
    eng = (extract_links(ray.data.from_arrow(_LINK_DOCS))
           .to_pandas().sort_values(["doc_id", "link_no"])
           .reset_index(drop=True))
    ora = (_links_oracle(extract_links_sql())
           .sort_values(["doc_id", "link_no"]).reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    # the unterminated href on doc 3 is dropped, doc order preserved
    assert eng[eng.doc_id == 3].url.tolist() == ["https://b.example.com/y"]
    assert eng[eng.doc_id == 1].link_no.tolist() == [1, 2]


def test_link_host_counts_matches_duckdb(ray_session):
    from apollo_ray.functions.urls import (link_host_counts,
                                           link_host_counts_sql)
    eng = (link_host_counts(ray.data.from_arrow(_LINK_DOCS),
                            num_partitions=4)
           .to_pandas().sort_values("host").reset_index(drop=True))
    ora = (_links_oracle(link_host_counts_sql())
           .sort_values("host").reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    # relative + unterminated links never reach the host counts;
    # ports are stripped, case folded
    assert dict(zip(eng.host, eng.n_links)) == {
        "a.example.com": 1, "b.example.com": 2}


def test_extract_links_empty_and_linkless(ray_session):
    from apollo_ray.functions.urls import extract_links
    docs = pa.table({"doc_id": pa.array([9], type=pa.int64()),
                     "text": ["plain prose only"]})
    out = extract_links(ray.data.from_arrow(docs))
    assert out.count() == 0
    assert out.schema().names == ["doc_id", "link_no", "url"]


def test_anchor_texts_matches_duckdb(ray_session):
    import pandas as pd
    from apollo_ray.functions.urls import anchor_texts, anchor_texts_sql
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": [
            'x <a href="https://a.example/p" class=big>First Link</a> '
            'then <a href="/rel">second</a> done',
            # no text node (href not followed by >...<): dropped
            'busted <a href="https://b.example/q"',
            # empty anchor text is still a match ([^<]* can be empty)
            '<a href="u"></a>',
        ]})
    eng = (anchor_texts(ray.data.from_arrow(docs))
           .to_pandas().sort_values(["doc_id", "pair_no"])
           .reset_index(drop=True))
    import duckdb
    con = duckdb.connect(); con.register("documents", docs)
    ora = (con.sql(anchor_texts_sql()).df()
           .sort_values(["doc_id", "pair_no"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    assert eng[eng.doc_id == 1].anchor.tolist() == ["First Link",
                                                    "second"]
    assert (eng.doc_id == 2).sum() == 0
    assert eng[eng.doc_id == 3].anchor.tolist() == [""]
