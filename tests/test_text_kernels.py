"""Text kernel tests: extraction invariant, tokenization, bags,
jaccard, quality stats, language-ID heuristic."""

import numpy as np

from apollo_ray.config import DedupConfig
from apollo_ray.fixtures import generate_pages
from apollo_ray.hashing import TokenHasher
from apollo_ray.kernels.jaccard import (jaccard_tokens, weighted_jaccard,
                                        weighted_jaccard_sparse)
from apollo_ray.kernels.text import (detect_lang, doc_to_bag, extract_text,
                                     fingerprint, quality_stats, tokenize)


def test_extraction_inverts_fixture_wrap():
    pages, _ = generate_pages(200)
    for html, text in zip(pages.column("html").to_pylist(),
                          pages.column("text").to_pylist()):
        assert extract_text(html) == text  # the per-row invariant


def test_extract_fallback_strips_tags():
    assert extract_text(b"<div>hello <b>world</b></div>") == "hello  world"


def test_tokenize_modes():
    assert tokenize("a  b\tc\nd") == ["a", "b", "c", "d"]
    assert tokenize("a,b c!", "words") == ["a", "b", "c"]


def test_doc_to_bag_properties():
    cfg = DedupConfig()
    th = TokenHasher(seed=cfg.seed)
    idx, w = doc_to_bag("the quick brown fox jumps over the lazy dog",
                        th, cfg.shingle_k, cfg.feature_dim_log2)
    assert idx.dtype == np.uint32 and w.dtype == np.float32
    assert np.all(np.diff(idx) > 0)          # sorted unique
    assert (w > 0).all()
    assert idx.max() < cfg.feature_dim
    # identical text -> identical bag
    idx2, w2 = doc_to_bag("the quick brown fox jumps over the lazy dog",
                          th, cfg.shingle_k, cfg.feature_dim_log2)
    np.testing.assert_array_equal(idx, idx2)
    np.testing.assert_array_equal(w, w2)
    # empty text -> empty bag
    e_idx, e_w = doc_to_bag("", th, cfg.shingle_k, cfg.feature_dim_log2)
    assert len(e_idx) == 0


def test_weighted_jaccard_semantics():
    # exact reference formula /root/reference/apollo/query.py:80-81
    v1 = np.array([1.0, 2.0, 0.0, 4.0], dtype=np.float32)
    v2 = np.array([2.0, 2.0, 3.0, 0.0], dtype=np.float32)
    expected = (1 + 2 + 0 + 0) / (2 + 2 + 3 + 4)
    assert abs(weighted_jaccard(v1, v2) - expected) < 1e-7
    # sparse variant equals dense on scattered vectors
    s = weighted_jaccard_sparse(np.array([0, 1, 3]), np.array([1., 2., 4.], dtype=np.float32),
                                np.array([0, 1, 2]), np.array([2., 2., 3.], dtype=np.float32))
    assert abs(s - expected) < 1e-7
    assert weighted_jaccard(v1, v1) == 1.0


def test_jaccard_tokens():
    assert jaccard_tokens({1, 2, 3}, {2, 3, 4}) == 0.5
    assert jaccard_tokens(set(), set()) == 0.0


def test_quality_stats():
    q = quality_stats("The cat sat on the mat.")
    assert q["n_tokens"] == 6.0
    assert 0 < q["stopword_ratio"] <= 1
    assert q["punct_ratio"] > 0
    assert quality_stats("")["n_tokens"] == 0.0


def test_detect_lang():
    assert detect_lang("this is the house of the rising sun and the moon") == "en"
    assert detect_lang("der Hund und die Katze und das Haus ist hier") == "de"
    assert detect_lang("zzz qqq") == "und"


_LANG_SAMPLES = {
    "en": "the cat sat on the mat and it was happy with this",
    "de": "der Hund und die Katze sind nicht mit dem Auto gefahren",
    "fr": "le chat est dans la maison et il ne dort pas avec les autres",
    "es": "el perro corre por el parque con los niños para jugar",
    "it": "il gatto che dorme non vuole giocare con una palla",
    "pt": "o cachorro não quer brincar com os outros animais da casa",
    "nl": "de hond en het paard zijn niet met de kat naar huis gegaan",
    "ru": "кошка сидит на окне и смотрит как идет дождь но это не беда",
    "pl": "kot nie chce się bawić ale pies jest bardzo wesoły przez cały dzień",
    "cs": "pes je velmi veselý ale kočka se bojí že bude pršet",
    "sv": "hunden och katten är inte med på resan för det regnar",
    "fi": "koira ja kissa ovat kotona mutta lintu ei ole että niin",
    "tr": "köpek ve kedi bir evde yaşıyor ama kuş için bu çok zor",
    "id": "kucing dan anjing ini tidak mau bermain dengan burung dari desa",
    "ro": "câinele și pisica nu vor să se joace cu pasărea pentru că plouă",
    "hu": "a kutya és a macska nem akar játszani csak aludni egy kicsit",
}


def test_detect_lang_16_languages():
    for lang, sample in _LANG_SAMPLES.items():
        assert detect_lang(sample) == lang, (lang, sample)


def test_detect_lang_batch_matches_scalar():
    from apollo_ray.kernels.text import detect_lang_batch
    texts = list(_LANG_SAMPLES.values()) + ["zzz qqq", "", " the the "]
    got = detect_lang_batch(texts)
    assert list(got) == [detect_lang(t) for t in texts]


def test_fingerprint_stability():
    th = TokenHasher()
    f1 = fingerprint("a b c d e f g h i j k l", th)
    f2 = fingerprint("a b c d e f g h i j k l", TokenHasher())
    assert f1 == f2 != 0


def test_batch_tokenizer_equals_per_doc():
    from apollo_ray.kernels.text import batch_token_hashes, tokenize
    texts = ["a  b c", " lead and trail ", "", "one", "x\ty\nz", "dup dup dup"]
    th = TokenHasher(seed=3)
    flat, offs = batch_token_hashes(texts, th)
    for i, t in enumerate(texts):
        expect = TokenHasher(seed=3).hash_tokens(tokenize(t))
        got = flat[offs[i]:offs[i + 1]]
        np.testing.assert_array_equal(got, expect)


def test_batch_bags_match_per_doc():
    """batch_bags_from_token_hashes == bag_from_token_hashes per doc,
    elementwise, across weightings, df filters, short and empty docs."""
    import numpy as np
    from apollo_ray.hashing import TokenHasher
    from apollo_ray.kernels.text import (bag_from_token_hashes,
                                         batch_bags_from_token_hashes)
    rng = np.random.default_rng(5)
    hasher = TokenHasher(seed=1)
    docs = []
    for n in (0, 1, 2, 4, 5, 30, 200, 3):
        toks = ["t%d" % x for x in rng.integers(0, 40, n)]
        docs.append(hasher.hash_tokens(toks))
    offs = np.zeros(len(docs) + 1, dtype=np.int64)
    np.cumsum([len(d) for d in docs], out=offs[1:])
    flat = (np.concatenate(docs) if any(len(d) for d in docs)
            else np.empty(0, dtype=np.uint64))
    df = rng.integers(1, 8, 1 << 10).astype(np.int64)
    for weighting, dfa, ndocs, min_df in (
            ("logtf", None, 0, 1), ("tf", None, 0, 1),
            ("logtf", df, 0, 2), ("logtf_logidf", df, 100, 1)):
        counts, idx, w = batch_bags_from_token_hashes(
            flat, offs, k=5, dim_log2=10, weighting=weighting,
            df=dfa, ndocs=ndocs, min_df=min_df)
        pos = 0
        for i, d in enumerate(docs):
            ei, ew = bag_from_token_hashes(
                d, 5, 10, weighting=weighting, df=dfa, ndocs=ndocs,
                min_df=min_df)
            assert counts[i] == len(ei)
            assert (idx[pos:pos + len(ei)] == ei).all()
            assert (w[pos:pos + len(ei)] == ew).all()   # bit-identical
            pos += len(ei)
        assert pos == len(idx)


def test_bpe_ish_tokenizer():
    from apollo_ray.kernels.text import tokenize
    assert tokenize("Hello, world! abc123 x-y", "bpe_ish") == \
        ["Hello", ",", "world", "!", "abc", "123", "x", "-", "y"]
    assert tokenize("", "bpe_ish") == []


def test_bpe_ish_arrow_count_matches_re():
    import pyarrow as pa
    import pyarrow.compute as pc
    from apollo_ray.kernels.text import BPE_ISH_PATTERN, tokenize
    texts = ["Hello, world! 42x", "", "  \t ", "a.b.c 1,000.50", "don't stop"]
    arr = pa.array(texts)
    counts = pc.count_substring_regex(arr, BPE_ISH_PATTERN).to_pylist()
    assert counts == [len(tokenize(t, "bpe_ish")) for t in texts]


def test_bpe_ish_batch_tokenizer_matches_regex():
    """The byte-LUT vectorized bpe_ish tokenizer must produce the
    exact token-hash stream of the per-doc regex path — the classes
    are disjoint ASCII byte classes and every non-ASCII byte is
    'other', so byte runs segment exactly like the char regex
    (unicode whitespace included: 'other' in both)."""
    import random
    import numpy as np
    import pyarrow as pa
    from apollo_ray.hashing import TokenHasher
    from apollo_ray.kernels.text import batch_token_hashes, tokenize

    texts = ["hello world42 foo-bar", "", "   ",
             "tabs\tand\nnewlines\x0b\x0cend",
             "héllo wörld — daß 日本語42abc", "a1b2c3",
             "!!!...??? mixed123abc#tag", "\xa0nbsp\xa0inside",
             "trailing space ", "x", "42"]
    rng = random.Random(3)
    alphabet = "ab1 2\t\n!.é日\xa0-Z"
    texts += ["".join(rng.choice(alphabet)
                      for _ in range(rng.randrange(0, 60)))
              for _ in range(100)]
    h1, h2 = TokenHasher(seed=7), TokenHasher(seed=7)
    ref_flat: list = []
    ref_offs = [0]
    for t in texts:
        ref_flat.extend(h1.hash_tokens(tokenize(t, "bpe_ish")).tolist())
        ref_offs.append(len(ref_flat))
    flat, offs = batch_token_hashes(pa.array(texts, type=pa.string()), h2,
                                    tokenizer="bpe_ish")
    assert offs.tolist() == ref_offs
    assert flat.tolist() == ref_flat
    # sliced-array offsets handled
    sl = pa.array(texts, type=pa.string()).slice(3, 5)
    h3, h4 = TokenHasher(seed=7), TokenHasher(seed=7)
    rf, ro = [], [0]
    for t in texts[3:8]:
        rf.extend(h3.hash_tokens(tokenize(t, "bpe_ish")).tolist())
        ro.append(len(rf))
    f2, o2 = batch_token_hashes(sl, h4, tokenizer="bpe_ish")
    assert o2.tolist() == ro and f2.tolist() == rf


def test_fused_bands_bpe_ish_tokenizer_end_to_end(ray_session):
    """DedupConfig(tokenizer='bpe_ish') must run the vectorized fused
    path and produce the same bands as the per-doc staged path."""
    import pyarrow as pa
    import ray.data as rd
    from apollo_ray.config import DedupConfig
    from apollo_ray.stages.bags import build_bags
    from apollo_ray.stages.bands import explode_bands
    from apollo_ray.stages.fused import fused_bands
    from apollo_ray.stages.wmh_stage import compute_signatures
    from apollo_ray.fixtures import generate_pages
    from apollo_ray.stages.extract import extract_docs

    pages, _ = generate_pages(200)
    cfg = DedupConfig(feature_dim_log2=12, tokenizer="bpe_ish",
                      wmh_concurrency=2, batch_size=64)
    docs = extract_docs(rd.from_arrow(pages), cfg)
    fused = fused_bands(docs, cfg).to_pandas() \
        .sort_values(["band_id", "bucket", "doc_id"]).reset_index(drop=True)
    staged = explode_bands(
        compute_signatures(build_bags(docs, cfg), cfg), cfg).to_pandas() \
        .sort_values(["band_id", "bucket", "doc_id"]).reset_index(drop=True)
    assert fused.equals(staged)
    assert len(fused) > 0


def test_whitespace_batch_split_matches_python_split():
    """The whole batch path rests on Arrow's utf8_split_whitespace
    segmenting exactly like Python str.split; pin it across every
    whitespace-adjacent codepoint (so a pyarrow upgrade cannot
    silently fork the fused and per-doc tokenizations)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    candidates = [0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F,
                  0x20, 0x85, 0xA0, 0x1680, 0x180E, 0x2000, 0x2001,
                  0x2002, 0x2003, 0x2004, 0x2005, 0x2006, 0x2007, 0x2008,
                  0x2009, 0x200A, 0x200B, 0x2028, 0x2029, 0x202F, 0x205F,
                  0x3000, 0xFEFF]
    for cp in candidates:
        t = "a" + chr(cp) + "b"
        py = t.split()
        ar = [x for x in
              pc.utf8_split_whitespace(pa.array([t]))[0].as_py() if x]
        assert py == ar, (hex(cp), py, ar)
