"""Value-bearing tests for the decontamination / PII / hash-sampling
operators (the sf corpus is PII-free, so the contract exercise of
pii_stats/redact_pii is degenerate — these tests plant real values
and also cross-check regex semantics against DuckDB's RE2)."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(rows):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    }))


PII_TEXTS = [
    (0, "contact me at alice.smith+spam@example.co.uk or bob@x.io today"),
    (1, "server at 10.0.254.3 and backup 192.168.1.1; port is 8080"),
    (2, "call +4915123456789 or 555-867-5309 x2"),
    (3, "no pii here, just words and numbers 12345"),
    (4, "mixed: c@d.org on 127.0.0.1 phone 333.444.5555 end"),
    (5, ""),
]


def test_pii_stats_values(ray_session):
    from apollo_ray.functions.pii import pii_stats
    out = pii_stats(_docs_ds(PII_TEXTS)).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_email"] == 2
    assert out.loc[0, "n_ipv4"] == 0
    assert out.loc[1, "n_ipv4"] == 2
    assert out.loc[2, "n_phone"] == 2
    assert out.loc[3].tolist() == [0, 0, 0]
    assert out.loc[4].tolist() == [1, 1, 1]
    assert out.loc[5].tolist() == [0, 0, 0]


def test_redact_pii_values(ray_session):
    from apollo_ray.functions.pii import redact_pii
    out = redact_pii(_docs_ds(PII_TEXTS)).to_pandas().set_index("doc_id")
    assert out.loc[0, "clean_text"] == \
        "contact me at <EMAIL> or <EMAIL> today"
    assert out.loc[1, "clean_text"] == \
        "server at <IP> and backup <IP>; port is 8080"
    assert out.loc[2, "clean_text"] == "call <PHONE> or <PHONE> x2"
    assert out.loc[4, "clean_text"] == "mixed: <EMAIL> on <IP> phone <PHONE> end"
    assert out.loc[4, "n_redacted"] == 3
    assert out.loc[3, "clean_text"] == PII_TEXTS[3][1]


def test_pii_matches_duckdb_re2(ray_session):
    """Engine (Arrow RE2) vs DuckDB (also RE2) on the planted texts —
    the property the sf-scale oracle can't exercise."""
    import duckdb
    from apollo_ray.functions.pii import PII_PATTERNS, pii_stats, redact_pii
    con = duckdb.connect()
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in PII_TEXTS], type=pa.int64()),
        "text": pa.array([r[1] for r in PII_TEXTS], type=pa.string()),
    })
    con.register("documents", tbl)
    stats = pii_stats(_docs_ds(PII_TEXTS)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for name, pat, _ in PII_PATTERNS:
        want = con.sql(
            "SELECT CAST(len(regexp_extract_all(text, '%s')) AS BIGINT) "
            "FROM documents ORDER BY doc_id" % pat).fetchnumpy()
        got = stats["n_" + name].to_numpy()
        assert np.array_equal(got, list(want.values())[0]), name
    red = redact_pii(_docs_ds(PII_TEXTS)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    expr = "text"
    for _, pat, repl in PII_PATTERNS:
        expr = "regexp_replace(%s, '%s', '%s', 'g')" % (expr, pat, repl)
    want_txt = [r[0] for r in con.sql(
        "SELECT %s FROM documents ORDER BY doc_id" % expr).fetchall()]
    assert red["clean_text"].tolist() == want_txt


def test_decontaminate_vs_bruteforce(ray_session):
    from apollo_ray.functions.decontam import decontaminate
    rng = np.random.default_rng(7)
    vocab = ["w%d" % i for i in range(50)]
    bench_rows = [(100 + i, " ".join(rng.choice(vocab, 30))) for i in range(3)]
    corpus_rows = [(i, " ".join(rng.choice(vocab, 40))) for i in range(20)]
    # plant: doc 0 copies a bench 13-gram; doc 1 is bench doc verbatim
    toks = bench_rows[0][1].split()
    corpus_rows[0] = (0, "x y z " + " ".join(toks[5:18]) + " q r")
    corpus_rows[1] = (1, bench_rows[1][1])
    corpus_rows[2] = (2, "tiny doc")  # < k tokens -> clean
    k = 13

    def shingles(text):
        t = text.split()
        return {" ".join(t[i:i + k]) for i in range(len(t) - k + 1)}

    bench_set = set().union(*(shingles(t) for _, t in bench_rows))
    out = decontaminate(_docs_ds(corpus_rows), _docs_ds(bench_rows),
                        k=k).to_pandas().set_index("doc_id")
    assert len(out) == len(corpus_rows)
    for did, text in corpus_rows:
        sh = shingles(text)
        assert out.loc[did, "n_shingles"] == len(sh)
        assert out.loc[did, "n_bench_hits"] == len(sh & bench_set)
        assert bool(out.loc[did, "contaminated"]) == bool(sh & bench_set)
    assert out.loc[0, "contaminated"]
    assert out.loc[1, "contaminated"]
    assert not out.loc[2, "contaminated"]


def test_decontaminate_bench_size_guard(ray_session, monkeypatch):
    from apollo_ray.functions import decontam
    monkeypatch.setattr(decontam, "MAX_BENCH_SHINGLES", 2)
    rows = [(0, "a b c d e f g h")]
    with pytest.raises(ValueError, match="too large"):
        decontam.decontaminate(_docs_ds(rows), _docs_ds(rows), k=3)


def test_hash_sample_matches_duckdb_and_is_deterministic(ray_session):
    import duckdb
    from apollo_ray.functions.decontam import hash_sample
    rows = [(i, "doc %d" % i) for i in range(200)]
    ds = _docs_ds(rows)
    got = sorted(hash_sample(ds, 300).to_pandas()["doc_id"])
    got2 = sorted(hash_sample(_docs_ds(rows), 300).to_pandas()["doc_id"])
    assert got == got2
    con = duckdb.connect()
    want = [r[0] for r in con.sql(
        "SELECT i FROM range(200) t(i) WHERE "
        "md5_number_lower(CAST(i AS VARCHAR)) % 1000 < 300 "
        "ORDER BY i").fetchall()]
    assert got == want
    assert 0 < len(got) < 200
    assert hash_sample(_docs_ds(rows), 0).count() == 0
    assert hash_sample(_docs_ds(rows), 1000).count() == 200
    with pytest.raises(ValueError):
        hash_sample(ds, 1001)
