"""encoding_quality (mojibake/control/replacement counts), readability
(Flesch milli-points, vowel-group syllables), chunk_documents
(fixed-window splitter) and word_pmi_pairs (collocation PMI)."""

import duckdb
import numpy as np
import pyarrow as pa


def _docs(texts, ids=None):
    return pa.table({
        "doc_id": pa.array(
            np.asarray(ids, dtype=np.int64) if ids is not None
            else np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    })


_MESSY = ("bad AB �� ok", "moji Ã© and "
          "â€™ splash Â  x",
          "ctrl \x01mix\x07 end \x7f", "café résumé 中")


def test_encoding_quality_values(ray_session):
    import ray
    from apollo_ray.functions.textstats import encoding_quality
    out = {r["doc_id"]: r for r in encoding_quality(
        ray.data.from_arrow(_docs(["clean ascii.", *_MESSY, ""]))
    ).take_all()}
    assert out[0]["n_replacement"] == 0 and out[0]["n_mojibake"] == 0
    assert out[1]["n_replacement"] == 2
    assert out[2]["n_mojibake"] == 3        # Ã©, â€™, Â<nbsp>
    assert out[3]["n_ctrl"] == 3            # \x01 \x07 \x7f
    assert out[3]["n_nonascii"] == 0
    assert out[4]["n_nonascii"] == 4 and out[4]["n_ctrl"] == 0
    assert out[5]["n_chars"] == 0


def test_encoding_quality_oracle_parity(ray_session):
    import ray
    from apollo_ray.functions.textstats import (encoding_quality,
                                                encoding_quality_sql)
    t = _docs(["The quick fox.", "", "tab\tand\nnl\rkept", *_MESSY])
    got = {r["doc_id"]: (r["n_chars"], r["n_replacement"], r["n_ctrl"],
                         r["n_nonascii"], r["n_mojibake"])
           for r in encoding_quality(ray.data.from_arrow(t)).take_all()}
    con = duckdb.connect()
    con.register("documents", t)
    want = {r[0]: tuple(r[1:])
            for r in con.execute(encoding_quality_sql()).fetchall()}
    assert got == want


def test_readability_values_and_parity(ray_session):
    import ray
    from apollo_ray.functions.textstats import readability, readability_sql
    texts = ["The quick brown fox. Jumps high!", "", "   ",
             "no sentence marks here", "xyz grr!!! brr?",  # .5 tie row
             "a.b.c? d! e", "y" * 50, "one two three four. five six."]
    t = _docs(texts)
    rows = {r["doc_id"]: r for r in readability(
        ray.data.from_arrow(t)).take_all()}
    assert rows[0]["n_sentences"] == 2 and rows[0]["n_words"] == 6
    assert rows[1]["flesch_milli"] is None and rows[1]["n_sentences"] == 0
    assert rows[2]["flesch_milli"] is None      # whitespace-only
    assert rows[3]["n_sentences"] == 1          # floor at 1
    con = duckdb.connect()
    con.register("documents", t)
    want = {r[0]: tuple(r[1:])
            for r in con.execute(readability_sql()).fetchall()}
    got = {i: (r["n_words"], r["n_sentences"], r["n_vowel_groups"],
               r["flesch_milli"]) for i, r in rows.items()}
    assert got == want


def test_chunk_documents_shapes(ray_session):
    import ray
    from apollo_ray.functions.clean import chunk_documents
    t = _docs(["abcdefghij", "", "x", "a" * 21])
    out = chunk_documents(ray.data.from_arrow(t), size=10,
                          overlap=3).take_all()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 1 not in by_doc                       # empty doc: no rows
    assert len(by_doc[0]) == 1 and by_doc[0][0]["chunk_text"] == "abcdefghij"
    assert len(by_doc[2]) == 1
    c3 = sorted(by_doc[3], key=lambda r: r["chunk_id"])
    assert [r["n_chunks"] for r in c3] == [3, 3, 3]
    # stride 7: [0:10], [7:17], [14:21]
    assert [len(r["chunk_text"]) for r in c3] == [10, 10, 7]
    # overlap reconstruction: doc = c0 + c1[3:] + c2[3:]
    assert c3[0]["chunk_text"] + c3[1]["chunk_text"][3:] \
        + c3[2]["chunk_text"][3:] == "a" * 21
    import pytest
    with pytest.raises(ValueError):
        chunk_documents(ray.data.from_arrow(t), size=5, overlap=5)


def test_chunk_documents_oracle_parity(ray_session):
    import ray
    from apollo_ray.functions.clean import (chunk_documents,
                                            chunk_documents_sql)
    t = _docs(["abcdefghij", "", "x", "abcd" * 7, "é中" * 9,
               "a" * 10, "a" * 11])
    con = duckdb.connect()
    con.register("documents", t)
    for size, ov in ((10, 0), (10, 3), (5, 4)):
        got = sorted((r["doc_id"], r["chunk_id"], r["n_chunks"],
                      r["chunk_text"])
                     for r in chunk_documents(ray.data.from_arrow(t),
                                              size, ov).take_all())
        want = sorted(map(tuple, con.execute(
            chunk_documents_sql(size, ov)).fetchall()))
        assert got == want, (size, ov)


def test_word_pmi_pairs_values(ray_session):
    import ray
    from apollo_ray.functions.lm import word_pmi_pairs
    # 'los angeles' always adjacent; 'the the' frequent but independent
    texts = ["los angeles " * 3 + "the the the the",
             "the los angeles the", "the the los angeles"]
    out = word_pmi_pairs(ray.data.from_arrow(_docs(texts)),
                         min_count=2, topn=5, num_partitions=4).take_all()
    assert out[0]["w1"] == "los" and out[0]["w2"] == "angeles"
    assert out[0]["pmi_micro"] > 0
    the_the = [r for r in out if r["w1"] == "the" and r["w2"] == "the"]
    assert not the_the or the_the[0]["pmi_micro"] < out[0]["pmi_micro"]


def test_word_pmi_pairs_oracle_parity(ray_session):
    import ray
    from apollo_ray.functions.lm import word_pmi_pairs, word_pmi_pairs_sql
    rng = np.random.default_rng(11)
    vocab = ["the", "quick", "fox", "los", "angeles", "et", "al", "x"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 10)))
             for _ in range(120)] + ["", "  ", "solo"]
    t = _docs(texts)
    con = duckdb.connect()
    con.register("documents", t)
    for mc, tn in ((2, 12), (1, 500)):
        got = sorted((r["pmi_micro"], r["w1"], r["w2"], r["c12"])
                     for r in word_pmi_pairs(
                         ray.data.from_arrow(t), min_count=mc, topn=tn,
                         num_partitions=4).take_all())
        want = sorted((r[3], r[0], r[1], r[2]) for r in con.execute(
            word_pmi_pairs_sql(mc, tn)).fetchall())
        assert got == want, (mc, tn)


def test_word_pmi_pairs_vocab_cap_guard(ray_session):
    import ray
    import pytest
    from apollo_ray.functions.lm import word_pmi_pairs
    t = _docs(["a b c d e f g h"])
    with pytest.raises(ValueError, match="max_vocab"):
        word_pmi_pairs(ray.data.from_arrow(t), min_count=1,
                       max_vocab=2, num_partitions=2,
                       method="broadcast")


def test_word_pmi_pairs_hashjoin_path(ray_session):
    """Forced hashjoin == broadcast == oracle, and auto falls back
    above the cap instead of raising."""
    import ray
    from apollo_ray.functions.lm import word_pmi_pairs, word_pmi_pairs_sql
    rng = np.random.default_rng(23)
    vocab = ["the", "fox", "los", "angeles", "et", "al"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 9)))
             for _ in range(80)]
    t = _docs(texts)
    kw = dict(min_count=2, topn=15, num_partitions=4)
    rows = lambda ds: sorted(
        (r["pmi_micro"], r["w1"], r["w2"], r["c12"])
        for r in ds.take_all())
    bc = rows(word_pmi_pairs(ray.data.from_arrow(t), **kw,
                             method="broadcast"))
    hj = rows(word_pmi_pairs(ray.data.from_arrow(t), **kw,
                             method="hashjoin"))
    auto_forced = rows(word_pmi_pairs(ray.data.from_arrow(t), **kw,
                                      max_vocab=1, method="auto"))
    assert bc == hj == auto_forced
    con = duckdb.connect()
    con.register("documents", t)
    want = sorted((r[3], r[0], r[1], r[2]) for r in con.execute(
        word_pmi_pairs_sql(2, 15)).fetchall())
    assert bc == want


def test_word_pmi_pairs_empty(ray_session):
    import ray
    from apollo_ray.functions.lm import word_pmi_pairs
    out = word_pmi_pairs(ray.data.from_arrow(_docs(["", "  "])),
                         num_partitions=2)
    assert out.count() == 0
    assert set(out.schema().names) == {"w1", "w2", "c12", "pmi_micro"}
