"""corpus_stats rollup and unigram pseudo-perplexity scoring."""

import numpy as np
import pyarrow as pa


def _docs():
    texts = ["a a b", "a b c", "", "a a a a", "b c", "a a b"]
    return pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en", "en", "de", "de", "en", "en"]),
        "source": pa.array(["s0", "s0", "s0", "s1", "s1", "s0"]),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    })


def test_corpus_stats_values(ray_session):
    import ray.data
    from apollo_ray.functions.textstats import corpus_stats
    out = corpus_stats(ray.data.from_arrow(_docs())) \
        .to_pandas().set_index(["source", "lang"]).sort_index()
    assert out.loc[("s0", "en")].tolist() == [3, 2, 15, 9]   # docs 0,1,5; 0==5
    assert out.loc[("s0", "de")].tolist() == [1, 1, 0, 0]    # empty text
    assert out.loc[("s1", "de")].tolist() == [1, 1, 7, 4]
    assert out.loc[("s1", "en")].tolist() == [1, 1, 3, 2]


def test_token_term_freqs(ray_session):
    import ray.data
    from apollo_ray.functions.lm import token_term_freqs
    tf = token_term_freqs(ray.data.from_arrow(_docs())) \
        .to_pandas().set_index("token")["n"]
    assert tf["a"] == 9 and tf["b"] == 4 and tf["c"] == 2


def test_unigram_score_math_and_order(ray_session):
    import ray.data
    from apollo_ray.functions.lm import unigram_score
    out = unigram_score(ray.data.from_arrow(_docs())) \
        .to_pandas().set_index("doc_id").sort_index()
    # empty doc dropped
    assert 2 not in out.index and len(out) == 5
    total = 15
    lp = {t: round(float(np.log10(n / total)), 6)
          for t, n in {"a": 9, "b": 4, "c": 2}.items()}
    exp0 = round((2 * lp["a"] + lp["b"]) / 3, 4)
    assert out.loc[0, "avg_lp_r4"] == exp0
    assert out.loc[0, "n_tokens"] == 3
    # the all-'a' doc is the most "typical" (highest mean logprob)
    assert out["avg_lp_r4"].idxmax() == 3
    # rare-token doc scores lower than common-token doc
    assert out.loc[4, "avg_lp_r4"] < out.loc[3, "avg_lp_r4"]


def test_unigram_vocab_cap_oov(ray_session):
    import ray.data
    from apollo_ray.functions.lm import unigram_score
    out = unigram_score(ray.data.from_arrow(_docs()), vocab_cap=1) \
        .to_pandas().set_index("doc_id")
    total = 15
    oov = round(float(np.log10(0.5 / total)), 6)
    lp_a = round(float(np.log10(9 / total)), 6)
    # doc 4 = "b c": both OOV at cap 1 (only 'a' survives)
    assert out.loc[4, "avg_lp_r4"] == round(oov, 4)
    assert out.loc[3, "avg_lp_r4"] == round(lp_a, 4)


def test_unigram_empty_corpus(ray_session):
    import ray.data
    from apollo_ray.functions.lm import unigram_score
    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "text": pa.array([], type=pa.string())})
    out = unigram_score(ray.data.from_arrow(empty))
    assert out.count() == 0


def test_top_terms_exact_and_ties(ray_session):
    import ray.data
    from apollo_ray.functions.textstats import top_terms
    out = top_terms(ray.data.from_arrow(_docs()), k=2) \
        .to_pandas().sort_values(["lang", "token"]).reset_index(drop=True)
    # en: a=5 ('a a b','a b c','b c','a a b'), b=4, c=2 -> top2 a,b
    en = out[out["lang"] == "en"]
    assert dict(zip(en["token"], en["n"])) == {"a": 5, "b": 4}
    # de: only 'a a a a' (empty doc has no tokens) -> a=4
    de = out[out["lang"] == "de"]
    assert dict(zip(de["token"], de["n"])) == {"a": 4}


def test_top_terms_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data
    from apollo_ray.functions.textstats import top_terms
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 40)))
             for _ in range(80)]
    langs = rng.choice(["en", "de", "fr"], size=80).tolist()
    t = pa.table({"doc_id": pa.array(np.arange(80, dtype=np.int64)),
                  "text": pa.array(texts), "lang": pa.array(langs)})
    got = top_terms(ray.data.from_arrow(t), k=5, num_partitions=7) \
        .to_pandas().sort_values(["lang", "token"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    exp = con.execute(r"""
        WITH tok AS (SELECT lang,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS token
             FROM documents WHERE length(trim(text)) > 0),
        tf AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS n
               FROM tok GROUP BY lang, token),
        r AS (SELECT lang, token, n, row_number()
                 OVER (PARTITION BY lang ORDER BY n DESC, token) AS rk
              FROM tf)
        SELECT lang, token, n FROM r WHERE rk <= 5
    """).df().sort_values(["lang", "token"]).reset_index(drop=True)
    assert got[["lang", "token"]].values.tolist() == \
        exp[["lang", "token"]].values.tolist()
    assert got["n"].astype(int).tolist() == exp["n"].astype(int).tolist()


def test_tfidf_top_terms_values(ray_session):
    import ray.data
    from apollo_ray.functions.lm import tfidf_top_terms
    out = tfidf_top_terms(ray.data.from_arrow(_docs()), k=1) \
        .to_pandas().set_index("doc_id")
    # doc 1 = "a b c": c is rarest (df: a=4, b=4, c=2) -> top keyword c
    assert out.loc[1, "token"] == "c"
    n, tf = 6, 1
    exp = round(tf * np.log10((n + 1) / (2 + 1)), 6)
    assert out.loc[1, "tfidf_r6"] == exp
    # doc 3 = "a a a a": only token a
    assert out.loc[3, "token"] == "a"


def test_tfidf_matches_duckdb_with_cap(ray_session):
    import duckdb
    import ray.data
    from apollo_ray.functions.lm import tfidf_top_terms, tfidf_top_terms_sql
    rng = np.random.default_rng(9)
    vocab = [f"w{i:02d}" for i in range(25)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 30)))
             for _ in range(70)] + [""]
    t = pa.table({"doc_id": pa.array(np.arange(71, dtype=np.int64)),
                  "text": pa.array(texts)})
    for cap in (None, 10):
        got = tfidf_top_terms(ray.data.from_arrow(t), k=3, vocab_cap=cap) \
            .to_pandas().sort_values(["doc_id", "token"]) \
            .reset_index(drop=True)
        con = duckdb.connect()
        con.register("documents", t.to_pandas())
        exp = con.execute(tfidf_top_terms_sql(k=3, vocab_cap=cap)).df() \
            .sort_values(["doc_id", "token"]).reset_index(drop=True)
        assert got[["doc_id", "token"]].values.tolist() == \
            exp[["doc_id", "token"]].values.tolist(), f"cap={cap}"
        assert np.allclose(got["tfidf_r6"], exp["tfidf_r6"], atol=0), \
            f"cap={cap}"


def test_bigram_score_math(ray_session):
    import ray.data
    from apollo_ray.functions.lm import bigram_score
    texts = ["a b", "a b", "a c", "b"]
    t = pa.table({"doc_id": pa.array(np.arange(4, dtype=np.int64)),
                  "text": pa.array(texts)})
    out = bigram_score(ray.data.from_arrow(t)) \
        .to_pandas().set_index("doc_id").sort_index()
    # counts: a=3, b=3, c=1, T=7; bigrams: (a,b)=2, (a,c)=1
    T = 7
    lp_a = round(float(np.log10(3 / T)), 6)
    lp_ab = round(float(np.log10(2 / 3)), 6)
    assert out.loc[0, "avg_lp_r4"] == round((lp_a + lp_ab) / 2, 4)
    # doc 3 "b": single token -> unigram only
    assert out.loc[3, "avg_lp_r4"] == round(round(float(np.log10(3 / T)), 6), 4)
    # backoff case needs an unseen-bigram continuation: "b a" never seen
    t2 = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                   "text": pa.array(["a b", "b a"])})
    out2 = bigram_score(ray.data.from_arrow(t2)) \
        .to_pandas().set_index("doc_id")
    # counts: a=2 b=2 T=4; bigrams (a,b)=1 (b,a)=1 -> both seen; use
    # a third doc to create an unseen pair instead
    t3 = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                   "text": pa.array(["a b c", "c a"])})
    out3 = bigram_score(ray.data.from_arrow(t3)) \
        .to_pandas().set_index("doc_id")
    # doc 1 "c a": (c,a) seen once, c count 2 -> log10(1/2); fine.
    lp_c = round(float(np.log10(2 / 5)), 6)
    lp_ca = round(float(np.log10(1 / 2)), 6)
    assert out3.loc[1, "avg_lp_r4"] == round((lp_c + lp_ca) / 2, 4)


def test_bigram_backoff_and_duckdb(ray_session):
    import duckdb
    import ray.data
    from apollo_ray.functions.lm import bigram_score, bigram_score_sql
    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 25)))
             for _ in range(60)] + ["", "w0"]
    t = pa.table({"doc_id": pa.array(np.arange(62, dtype=np.int64)),
                  "text": pa.array(texts)})
    got = bigram_score(ray.data.from_arrow(t)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    exp = con.execute(bigram_score_sql()).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["n_tokens"].astype(int).tolist() == \
        exp["n_tokens"].astype(int).tolist()
    assert np.allclose(got["avg_lp_r4"], exp["avg_lp_r4"], atol=0)


def test_avg_lp_r4_exact_half_boundary():
    # regression: a mean landing exactly on a 4th-decimal half
    # (-23.6712 / 16 = -1.47945) must round away from zero like
    # DuckDB, immune to float sum order
    import numpy as np
    from apollo_ray.functions.lm import _avg_lp_r4_exact
    lp = np.full(16, -23.6712 / 16)
    lp = np.round(lp, 6)  # -1.479450 each -> sum -23.6712 exactly
    out = _avg_lp_r4_exact(lp, np.array([0]), np.array([16]))
    assert out[0] == -1.4795
    # positive side
    out2 = _avg_lp_r4_exact(-lp, np.array([0]), np.array([16]))
    assert out2[0] == 1.4795
    # non-boundary sanity
    lp3 = np.array([-1.5, -2.0])
    assert _avg_lp_r4_exact(lp3, np.array([0]), np.array([2]))[0] == -1.75


def test_length_quantiles_matches_duckdb(ray_session):
    import duckdb
    import ray.data
    from apollo_ray.functions.textstats import length_quantiles
    rng = np.random.default_rng(21)
    texts = [" ".join(["w"] * int(n)) if n else ""
             for n in rng.integers(0, 50, size=90)]
    langs = rng.choice(["en", "de", "fr"], size=90).tolist()
    t = pa.table({"doc_id": pa.array(np.arange(90, dtype=np.int64)),
                  "text": pa.array(texts), "lang": pa.array(langs)})
    got = length_quantiles(ray.data.from_arrow(t), num_partitions=5) \
        .to_pandas().sort_values("lang").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    exp = con.execute(r"""
        WITH t AS (SELECT lang,
            CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n
          FROM documents)
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(quantile_disc(n, 0.25) AS BIGINT) AS p25,
               CAST(quantile_disc(n, 0.5) AS BIGINT) AS p50,
               CAST(quantile_disc(n, 0.75) AS BIGINT) AS p75
        FROM t GROUP BY lang
    """).df().sort_values("lang").reset_index(drop=True)
    for c in ("lang", "n_docs", "p25", "p50", "p75"):
        assert got[c].tolist() == exp[c].tolist(), c


def test_length_quantiles_small_groups(ray_session):
    import ray.data
    from apollo_ray.functions.textstats import length_quantiles
    t = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                  "text": pa.array(["a b c", "a"]),
                  "lang": pa.array(["en", "de"])})
    out = length_quantiles(ray.data.from_arrow(t)) \
        .to_pandas().set_index("lang")
    # single-doc groups: every quantile is that doc's length
    assert out.loc["en"].tolist() == [1, 3, 3, 3]
    assert out.loc["de"].tolist() == [1, 1, 1, 1]


def test_char_pair_counts(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from apollo_ray.functions.lm import char_pair_counts
    t = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["aab aab x", "héé"]),
    })
    df = char_pair_counts(rd.from_arrow(t)).to_pandas() \
        .set_index("pair")["n"].sort_index()
    # 'aab' x2 -> aa x2, ab x2; 'x' too short; 'héé' -> hé, éé
    assert df.to_dict() == {"aa": 2, "ab": 2, "hé": 1, "éé": 1}


def test_char_pair_counts_min_count(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from apollo_ray.functions.lm import char_pair_counts
    t = pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "text": pa.array(["aab aab cd"]),
    })
    out = char_pair_counts(rd.from_arrow(t), min_count=2).to_pandas()
    assert sorted(map(tuple, out.itertuples(index=False))) == \
        [("aa", 2), ("ab", 2)]
