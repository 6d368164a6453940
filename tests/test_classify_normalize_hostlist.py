"""normalize_text (NFC/control/whitespace canonicalization),
hostlist_filter (domain blocklist matching) and nb_classify
(multinomial Naive Bayes train+score) — rule checks plus DuckDB
oracle parity."""

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


# ---------------------------------------------------------------- normalize

def test_normalize_rules():
    from apollo_ray.functions.clean import normalize_text_array
    got = normalize_text_array(pa.array([
        "a  b\tc",                    # space/tab runs collapse
        "crlf\r\nlone\rend",          # \r\n and lone \r -> \n
        "ctrl\x07\x01z",              # C0 controls stripped
        " lead trail \t",             # outer whitespace trimmed
        "éclair Å Å",  # NFC: combining + singleton
        "",
        None,
    ])).to_pylist()
    assert got == [
        "a b c", "crlf\nlone\nend", "ctrlz", "lead trail",
        "éclair Å Å", "", None]


def test_normalize_keeps_newlines_and_tabs_inside():
    from apollo_ray.functions.clean import normalize_text_array
    # \n survives (not collapsed into the space run on either side)
    got = normalize_text_array(pa.array(["l1  x\nl2"])).to_pylist()
    assert got == ["l1 x\nl2"]


def test_normalize_oracle_parity(ray_session):
    import ray
    from apollo_ray.functions.clean import normalize_text, normalize_text_sql
    texts = ["plain ascii", "a  b\tc ", "x\r\ny\rz", "ctl\x07q",
             "é café  ", "", "  ", "multi\n\n line \n"]
    t = _docs(texts)
    got = normalize_text(ray.data.from_arrow(t)).to_pandas() \
        .set_index("doc_id").sort_index()
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(normalize_text_sql()
                       + " ORDER BY doc_id").fetchall()
    for doc_id, norm, changed in want:
        assert got.loc[doc_id, "norm_text"] == norm
        assert bool(got.loc[doc_id, "changed"]) == changed


# ----------------------------------------------------------------- hostlist

def _mask(hosts, domains):
    import pyarrow.compute as pc
    from apollo_ray.functions.urls import _suffix_masks
    by = {}
    for d in sorted({d.lower().strip(".") for d in domains if d.strip(".")}):
        by.setdefault(d.count(".") + 1, []).append(d)
    hostname = pc.replace_substring_regex(
        pa.array(hosts, type=pa.string()), r":[0-9]+$", "")
    return _suffix_masks(hostname, by).tolist()


def test_hostlist_rules():
    domains = ["Bad.com", "ads.example.com"]
    assert _mask(
        ["bad.com",            # exact
         "sub.bad.com",        # subdomain
         "deep.a.bad.com",     # deeper subdomain
         "notbad.com",         # partial label must NOT match
         "bad.com:8080",       # port stripped before matching
         "ads.example.com",
         "x.ads.example.com",
         "example.com",        # parent of an entry is NOT blocked
         ""],
        domains) == [True, True, True, False, True, True, True,
                     False, False]


def test_hostlist_filter_oracle_parity(ray_session):
    import ray
    from apollo_ray.functions.urls import (hostlist_filter,
                                           hostlist_filter_sql,
                                           synthetic_crawl_urls)
    ids = np.arange(90, dtype=np.int64)
    pages = pa.table({
        "doc_id": pa.array(ids),
        "url": pa.array(synthetic_crawl_urls(ids), type=pa.string())})
    domains = ["site2.example.com", "Site5.Example.COM.", "example.org"]
    got = hostlist_filter(ray.data.from_arrow(pages), domains) \
        .to_pandas().set_index("doc_id").sort_index()
    assert bool(got["blocked"].any()) and not bool(got["blocked"].all())
    con = duckdb.connect()
    con.register("documents", _docs([""] * len(ids), ids=ids))
    want = con.execute(hostlist_filter_sql(domains)
                       + " ORDER BY doc_id").fetchall()
    for doc_id, host, blocked in want:
        assert got.loc[doc_id, "host"] == host
        assert bool(got.loc[doc_id, "blocked"]) == blocked


# ----------------------------------------------------------------------- nb

def _nb_parity(ray_mod, table, cap, label_col="source"):
    from apollo_ray.functions.classify import nb_classify, nb_classify_sql
    got = nb_classify(ray_mod.data.from_arrow(table), label_col=label_col,
                      vocab_cap=cap, num_partitions=4).take_all()
    got = {r["doc_id"]: (r["n_vocab_tokens"], r["label_pred"],
                         r["best_lpu"]) for r in got}
    con = duckdb.connect()
    con.register("documents", table)
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(
        nb_classify_sql(label_col, cap)).fetchall()}
    assert got == want
    return got


def test_nb_classify_oracle_parity(ray_session):
    import ray
    texts = ["spam buy now buy", "buy cheap spam spam", "the quick fox",
             "fox jumps the dog", "spam fox", "", "   "]
    srcs = ["ad", "ad", "news", "news", "ad", "news", "ad"]
    t = _docs(texts, srcs)
    full = _nb_parity(ray, t, None)
    capped = _nb_parity(ray, t, 3)
    # label recovery on the separable rows
    assert full[0][1] == "ad" and full[2][1] == "news"
    # empty docs score on priors alone: n_vocab_tokens == 0
    assert full[5][0] == 0 and full[6][0] == 0
    assert capped[5] == full[5]


def test_nb_tie_breaks_label_asc(ray_session):
    import ray
    # perfectly symmetric classes: every doc ties -> smallest label wins
    t = _docs(["w", "w"], ["b", "a"])
    from apollo_ray.functions.classify import nb_classify
    out = nb_classify(ray.data.from_arrow(t), vocab_cap=None,
                      num_partitions=2).take_all()
    assert {r["label_pred"] for r in out} == {"a"}


# ---------------------------------------------------------------------------
# code_detect
# ---------------------------------------------------------------------------

def test_code_detect_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from apollo_ray.functions.classify import code_detect, code_detect_sql

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "text": [
            "def f(x):\n    return x + 1;\nvar y = {a: 1};",
            "plain english prose with no code markers in it at all "
            "beyond this one stray semicolon; which is not enough",
            "",
            "\tint g() { printf(hello); return 0; }",
            # keyword-lookalikes inside words must NOT match (\b)
            "redefine definition importance variance confunction",
        ]})
    eng = (code_detect(ray.data.from_arrow(docs)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", docs)
    ora = (con.sql(code_detect_sql()).df()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    assert eng.is_code.tolist() == [True, False, False, True, False]
    # \b guard: no keyword hits from lookalike words
    assert eng.loc[eng.doc_id == 5, "n_keywords"].item() == 0


def test_term_blocklist_filter_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from apollo_ray.functions.classify import (term_blocklist_filter,
                                               term_blocklist_filter_sql)
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": [
            "the Bad word appears here",
            "superstring badge badland must NOT match blocklist entries",
            "BAD bad bAd three hits",
            "",
        ]})
    terms = ["bad", "awful"]
    eng = (term_blocklist_filter(ray.data.from_arrow(docs), terms)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect(); con.register("documents", docs)
    ora = (con.sql(term_blocklist_filter_sql(terms)).df()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    assert eng.n_blocked_hits.tolist() == [1, 0, 3, 0]
    assert eng.blocked.tolist() == [True, False, True, False]
