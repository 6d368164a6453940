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
