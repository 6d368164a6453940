"""Duplicated-substring detection (Lee-et-al-style window
fingerprinting): kernel properties + exact-mode parity with a
brute-force oracle + the winnowing detection guarantee."""

import numpy as np
import pyarrow as pa
import pytest

from apollo_ray.functions.substring import (substring_dup_spans,
                                            window_fingerprints,
                                            winnow_positions)


def brute_spans(texts: dict[int, str], L: int) -> set[tuple]:
    """All maximal merged spans whose every L-window occurs >= 2 times
    corpus-wide — direct string-dict implementation."""
    from collections import Counter
    counts = Counter()
    for t in texts.values():
        for i in range(len(t) - L + 1):
            counts[t[i:i + L]] += 1
    spans = set()
    for did, t in texts.items():
        marks = [i for i in range(len(t) - L + 1) if counts[t[i:i + L]] >= 2]
        if not marks:
            continue
        start, end = marks[0], marks[0] + L
        for i in marks[1:]:
            if i > end:
                spans.add((did, start, end, end - start))
                start = i
            end = i + L
        spans.add((did, start, end, end - start))
    return spans


def test_window_fingerprints_match_string_equality():
    rng = np.random.default_rng(5)
    alpha = "ab"  # tiny alphabet forces many true repeats
    t1 = "".join(rng.choice(list(alpha), 200))
    t2 = "".join(rng.choice(list(alpha), 200))
    L = 8
    f1, f2 = window_fingerprints(t1, L), window_fingerprints(t2, L)
    for i in range(0, len(f1), 17):
        for j in range(0, len(f2), 13):
            assert (f1[i] == f2[j]) == (t1[i:i + L] == t2[j:j + L])


def test_window_fingerprints_segmented_long_doc(monkeypatch):
    # force the segmented path and check it equals the one-shot hash
    import apollo_ray.functions.substring as sub
    t = "the quick brown fox jumps over the lazy dog " * 40
    full = window_fingerprints(t, 12).copy()

    orig = sub._window_hashes_one

    def seg(cp, L, base, p):
        n = len(cp)
        c = sub._pows(base, p)
        c.grow(n + L)
        nw = n - L + 1
        out = np.empty(nw, dtype=np.uint64)
        seg_len = 100  # tiny segments
        start = 0
        while start < nw:
            stop = min(nw, start + seg_len)
            hi = stop + L - 1
            terms = (cp[start:hi] % p) * c.ipw[:hi - start] % p
            R = np.zeros(hi - start + 1, dtype=np.uint64)
            np.cumsum(terms, out=R[1:])
            diff = (R[L:] - R[:stop - start]) % p
            out[start:stop] = diff * c.pw[L - 1:hi - start] % p
            start = stop
        return out

    monkeypatch.setattr(sub, "_window_hashes_one", seg)
    np.testing.assert_array_equal(window_fingerprints(t, 12), full)
    monkeypatch.setattr(sub, "_window_hashes_one", orig)


def test_winnow_positions_guarantee():
    rng = np.random.default_rng(7)
    h = rng.integers(0, 1 << 62, 500)
    w = 9
    sel = winnow_positions(h, w)
    # every window of w consecutive positions contains a selection
    for i in range(len(h) - w + 1):
        assert ((sel >= i) & (sel < i + w)).any()


def _mk_docs(texts: dict[int, str]):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(texts), type=pa.int64()),
        "text": pa.array(list(texts.values()), type=pa.string()),
    }))


@pytest.fixture
def planted_corpus():
    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
             "theta", "iota", "kappa"]

    def rand_text(n):
        return " ".join(rng.choice(words, n))

    shared = rand_text(30)          # ~150 chars, well over L + w
    texts = {
        1: rand_text(40) + " " + shared + " " + rand_text(10),
        2: rand_text(15) + " " + shared,
        3: rand_text(60),
        4: rand_text(5) + " tiny",
    }
    return texts, shared


def test_exact_mode_matches_brute_force(ray_session, planted_corpus):
    texts, _ = planted_corpus
    L = 24
    got = substring_dup_spans(_mk_docs(texts), min_len=L,
                              num_partitions=4).to_pandas()
    got_set = set(map(tuple, got[["doc_id", "start_pos", "end_pos",
                                  "span_len"]].itertuples(index=False)))
    assert got_set == brute_spans(texts, L)
    assert {1, 2} <= set(got["doc_id"])  # the planted share was found


def test_winnow_mode_finds_planted_regions(ray_session, planted_corpus):
    texts, shared = planted_corpus
    L, w = 24, 8
    got = substring_dup_spans(_mk_docs(texts), min_len=L, winnow_w=w,
                              num_partitions=4).to_pandas()
    # every doc containing the planted region must have >= 1 anchor
    # span covering (part of) it (guarantee: region length >= L + w - 1;
    # spans may start a char early — the shared region extends into the
    # joining whitespace, which is itself duplicated)
    for did in (1, 2):
        lo = texts[did].index(shared)
        hi = lo + len(shared)
        rows = got[got.doc_id == did]
        assert ((rows.start_pos < hi) & (rows.end_pos > lo)).any()
    # winnowed marks are a subset of exact marks: no span outside a
    # brute-force span
    exact = brute_spans(texts, L)
    for r in got.itertuples(index=False):
        assert any(d == r.doc_id and s <= r.start_pos and e >= r.end_pos
                   for (d, s, e, _) in exact)


def test_no_dups_empty_result(ray_session):
    texts = {1: "completely unique text one x", 2: "another different y"}
    got = substring_dup_spans(_mk_docs(texts), min_len=10,
                              num_partitions=2)
    assert got.count() == 0


def test_cut_dup_spans(ray_session, planted_corpus):
    from apollo_ray.functions.substring import cut_dup_spans
    texts, shared = planted_corpus
    L = 24
    docs = _mk_docs(texts)
    spans = substring_dup_spans(docs, min_len=L, num_partitions=4)
    cut = cut_dup_spans(docs, spans, num_partitions=4).to_pandas() \
        .set_index("doc_id")
    # the planted shared region is gone from both docs
    for did in (1, 2):
        assert shared not in cut.loc[did, "text"]
        assert cut.loc[did, "n_cut_chars"] >= len(shared)
    # docs without spans are untouched
    assert cut.loc[3, "text"] == texts[3]
    assert cut.loc[3, "n_cut_chars"] == 0
    assert cut.loc[4, "text"] == texts[4]
    # text_hash consistent with rewritten text
    from apollo_ray.hashing import hash_utf8
    for did in (1, 2, 3, 4):
        assert cut.loc[did, "text_hash"] == hash_utf8(cut.loc[did, "text"])
    # re-detect on the cut corpus: the planted duplicate is resolved
    import ray.data as rd
    import pyarrow as pa2
    redetect = substring_dup_spans(
        _mk_docs({int(d): t for d, t in cut["text"].items()}),
        min_len=L, num_partitions=4).to_pandas()
    assert len(redetect) == 0
