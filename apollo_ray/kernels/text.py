"""Text kernels: html->text extraction, tokenization, shingled bags.

The webtext analog of the reference's external UAST feature extractors
(``doc/cmd/features.md:11-41``; plugged in at ``apollo/hasher.py:217-219``):
here a document's features are hashed token k-shingles (the
``uast2seq``-style sequence features, ``doc/cmd/features.md:17,32``)
weighted by log-TF — `log_tf_log_idf`-style weighting
(``apollo/hasher.py:227``) with idf optional via a docfreq pass.

The per-row invariant (BASELINE.json input_hint): text extracted from
``html`` must byte-equal the driver's ``text`` column per url.  The
fixture html is a deterministic wrap (FIXTURES.md §1) and
``extract_text`` inverts exactly that wrap.
"""

from __future__ import annotations

import re

import numpy as np

from apollo_ray.hashing import TokenHasher, shingle_hashes

_WORD_RE = re.compile(r"\w+", re.UNICODE)
_TAG_RE = re.compile(rb"<[^>]*>")
_P_SPLIT = re.compile(rb"</p>\s*<p>")
_BODY_RE = re.compile(rb"<body>(?:<p>)?(.*?)(?:</p>)?</body>", re.DOTALL)


def extract_text(html: bytes) -> str:
    """Invert the deterministic fixture wrap (FIXTURES.md §1).

    ``<html><head>…</head><body><p>par1</p><p>par2</p>…</body></html>``
    -> paragraphs joined by ``"\\n\\n"``.  Falls back to stripping all
    tags for html that does not match the wrap (real-world pages); the
    byte-identity invariant is asserted only for fixture input.

    Body location uses C-speed ``bytes.find`` (first ``<body>``, first
    ``</body>`` after it — identical to the non-greedy regex it
    replaces, which profiled at 75% of the extract stage).
    """
    i = html.find(b"<body>")
    if i != -1:
        j = html.find(b"</body>", i + 6)
        if j != -1:
            body = html[i + 6:j]
            if body.startswith(b"<p>"):
                body = body[3:]
            if body.endswith(b"</p>"):
                body = body[:-4]
            parts = _P_SPLIT.split(body)
            return b"\n\n".join(parts).decode("utf-8", "replace")
    return _TAG_RE.sub(b" ", html).decode("utf-8", "replace").strip()


# GPT-2-style pre-tokenizer reduced to its ASCII-class core: runs of
# letters, runs of digits, runs of other-non-whitespace.  The classes
# are disjoint, so Python re, RE2 (Arrow/DuckDB) and leftmost-first vs
# leftmost-longest all produce identical matches — which keeps the
# operator exactly SQL-oracle-able.  Whitespace is spelled as explicit
# ASCII chars (not \s): Python \s also matches unicode spaces, RE2's
# does not.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f\v]+"
_BPE_ISH_RE = re.compile(BPE_ISH_PATTERN)


def tokenize(text: str, mode: str = "whitespace") -> list[str]:
    """``whitespace``: split on whitespace runs (matches the SQL oracle
    ``regexp_split_to_array(text, '\\s+')``); ``words``: ``\\w+``
    matches; ``bpe_ish``: the ASCII BPE-style pre-tokenizer above."""
    if mode == "whitespace":
        return text.split()
    if mode == "bpe_ish":
        return _BPE_ISH_RE.findall(text)
    return _WORD_RE.findall(text)


def doc_to_bag(text: str, hasher: TokenHasher, k: int, dim_log2: int,
               tokenizer: str = "whitespace", weighting: str = "logtf",
               extra_ks: tuple = (), family_weights: tuple | None = None,
               df: np.ndarray | None = None, ndocs: int = 0, min_df: int = 1
               ) -> tuple[np.ndarray, np.ndarray]:
    """One document -> sparse weighted bag (sorted indices, weights).

    tokens -> uint64 shingle hashes -> feature-hash into ``2**dim_log2``
    columns -> term frequencies -> weights.  The feature-hash replaces
    the reference's global ordered vocabulary (10M cap,
    ``doc/cmd/bags.md:15``): no global state, bounded dimension, the
    collision rate at D=2^16..2^20 is negligible for shingle bags.

    Feature families (the analog of apollo's multiple extractors
    selected by ``-f``, ``doc/cmd/features.md:8-19``): the primary
    ``k`` plus each k in ``extra_ks`` contributes shingles into the
    shared hashed space; ``family_weights`` scales each family's
    weights (M7, the per-extractor ``--<ex>-weight`` multiplier applied
    by scaling the family's columns, ``apollo/hasher.py:102-131``).

    Weights: ``tf`` -> raw counts; ``logtf`` -> 1 + ln(tf) (the tf half
    of log_tf_log_idf); ``logtf_logidf`` -> (1 + ln(tf)) * ln(ndocs/df)
    with a global document-frequency array (M4, the
    ``log_tf_log_idf`` weighting of ``apollo/hasher.py:227``).  With a
    ``df`` array, features with df < ``min_df`` are dropped (M5,
    ``--min-docfreq``, ``doc/cmd/bags.md:12``).

    Returns float32 weights, uint32 sorted indices.
    """
    tokens = tokenize(text, tokenizer)
    th = hasher.hash_tokens(tokens)
    return bag_from_token_hashes(th, k, dim_log2, weighting=weighting,
                                 extra_ks=extra_ks,
                                 family_weights=family_weights,
                                 df=df, ndocs=ndocs, min_df=min_df)


def bag_from_token_hashes(th: np.ndarray, k: int, dim_log2: int,
                          weighting: str = "logtf", extra_ks: tuple = (),
                          family_weights: tuple | None = None,
                          df: np.ndarray | None = None, ndocs: int = 0,
                          min_df: int = 1
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Core of :func:`doc_to_bag` operating on a precomputed token-hash
    sequence (shared by the per-doc path and the batch-vectorized
    tokenizer path, guaranteeing identical bags)."""
    ks = (k, *extra_ks)
    if family_weights is None:
        family_weights = (1.0,) * len(ks)
    idx_parts: list[np.ndarray] = []
    w_parts: list[np.ndarray] = []
    for fam_k, fam_w in zip(ks, family_weights):
        sh = shingle_hashes(th, fam_k)
        if len(sh) == 0:
            continue
        cols = (sh >> np.uint64(64 - dim_log2)).astype(np.uint32)
        idx, tf = np.unique(cols, return_counts=True)
        if weighting == "tf":
            w = tf.astype(np.float32)
        else:  # logtf | logtf_logidf (idf applied after the merge)
            w = (1.0 + np.log(tf)).astype(np.float32)
        w *= np.float32(fam_w)
        idx_parts.append(idx.astype(np.uint32))
        w_parts.append(w)
    if not idx_parts:
        return np.empty(0, dtype=np.uint32), np.empty(0, dtype=np.float32)
    if len(idx_parts) == 1:
        idx, w = idx_parts[0], w_parts[0]
    else:
        all_idx = np.concatenate(idx_parts)
        all_w = np.concatenate(w_parts)
        idx, inv = np.unique(all_idx, return_inverse=True)
        w = np.zeros(len(idx), dtype=np.float32)
        np.add.at(w, inv, all_w)
        idx = idx.astype(np.uint32)
    if df is not None:
        fdf = df[idx]
        keep = fdf >= min_df
        idx, w, fdf = idx[keep], w[keep], fdf[keep]
        if weighting == "logtf_logidf" and ndocs > 0 and len(idx):
            w = (w * np.log(ndocs / fdf)).astype(np.float32)
            pos = w > 0
            idx, w = idx[pos], w[pos]
    return idx, w


def batch_bags_from_token_hashes(th_flat: np.ndarray, offs: np.ndarray,
                                 k: int, dim_log2: int,
                                 weighting: str = "logtf",
                                 fam_w: float = 1.0,
                                 df: np.ndarray | None = None,
                                 ndocs: int = 0, min_df: int = 1
                                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch-vectorized bag building for the single-family path.

    Shingles the batch's WHOLE flat token-hash stream in one k-step
    numpy recurrence (identical values to :func:`shingle_hashes` — the
    recurrence only reads positions p..p+k-1), masks shingles that
    would span a document boundary, then collapses to per-(doc, col)
    counts with ONE ``np.unique`` over packed keys.  Per-doc Python
    work drops to the rare short-doc (< k tokens) fallback.

    Returns ``(counts_per_doc, indices, weights)`` where
    ``counts_per_doc[i]`` is doc i's feature count (0 = doc dropped,
    e.g. empty) and indices/weights are the concatenation in doc
    order — elementwise identical to calling
    :func:`bag_from_token_hashes` per doc.
    """
    from apollo_ray.hashing import _MASK64, splitmix64
    n_docs = len(offs) - 1
    lens = np.diff(offs)
    flat_n = len(th_flat)
    if flat_n >= k:
        m = flat_n - k + 1
        acc = np.zeros(m, dtype=np.uint64)
        for j in range(k):
            mult = splitmix64(
                np.array([j + 1], dtype=np.uint64))[0] | np.uint64(1)
            acc = (acc + th_flat[j:j + m] * mult) & _MASK64
            acc = splitmix64(acc)
        pos_doc = np.repeat(np.arange(n_docs, dtype=np.int64), lens)[:m]
        valid = (np.arange(m, dtype=np.int64) + k - 1) < offs[pos_doc + 1]
        sh = acc[valid]
        d_of = pos_doc[valid]
    else:
        sh = np.empty(0, dtype=np.uint64)
        d_of = np.empty(0, dtype=np.int64)
    short = np.flatnonzero((lens > 0) & (lens < k))
    if len(short):
        sh_s = np.fromiter(
            (shingle_hashes(th_flat[offs[i]:offs[i + 1]], k)[0]
             for i in short), dtype=np.uint64, count=len(short))
        sh = np.concatenate([sh, sh_s])
        d_of = np.concatenate([d_of, short])
    cols = (sh >> np.uint64(64 - dim_log2)).astype(np.int64)
    key = (d_of << np.int64(dim_log2)) | cols
    uk, tf = np.unique(key, return_counts=True)
    u_doc = (uk >> np.int64(dim_log2))
    u_col = (uk & np.int64((1 << dim_log2) - 1)).astype(np.uint32)
    if weighting == "tf":
        w = tf.astype(np.float32)
    else:
        w = (1.0 + np.log(tf)).astype(np.float32)
    if fam_w != 1.0:
        w = w * np.float32(fam_w)
    if df is not None:
        fdf = df[u_col]
        keep = fdf >= min_df
        if weighting == "logtf_logidf" and ndocs > 0:
            wi = np.zeros(len(w), dtype=np.float32)
            nz = fdf > 0
            wi[nz] = (w[nz] * np.log(ndocs / fdf[nz])).astype(np.float32)
            keep &= wi > 0
            w = wi
        u_doc, u_col, w = u_doc[keep], u_col[keep], w[keep]
    counts = np.bincount(u_doc, minlength=n_docs).astype(np.int64)
    return counts, u_col, w


def batch_token_hashes(texts_arr, hasher: TokenHasher,
                       tokenizer: str = "whitespace"
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized tokenization + hashing for a batch of texts.

    Arrow does the splitting in C (`utf8_split_whitespace` matches
    Python ``str.split`` on unicode whitespace) and dictionary-encodes
    the flat token stream, so the 64-bit token hash is computed once
    per DISTINCT token in the batch instead of once per occurrence —
    the per-token Python loop disappears.

    Returns (flat uint64 token hashes, int64 doc offsets).
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    if not isinstance(texts_arr, (pa.Array, pa.ChunkedArray)):
        texts_arr = pa.array(texts_arr, type=pa.string())
    if tokenizer == "bpe_ish":
        return _batch_token_hashes_bpe_ish(texts_arr, hasher)
    if tokenizer != "whitespace":
        # 'words' (\w+) cannot be replicated at byte level: Python's
        # \w matches unicode word characters, which a per-byte class
        # table cannot express — per-doc fallback stays the only path
        raise NotImplementedError(
            "batch path supports whitespace and bpe_ish tokenizers")
    toks = pc.utf8_split_whitespace(texts_arr)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lengths = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    flat = toks.flatten()
    enc = flat.dictionary_encode()
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    vocab = enc.dictionary.to_pylist()
    vocab_hashes = hasher.hash_tokens(vocab)
    idx = np.asarray(enc.indices, dtype=np.int64)
    # Arrow keeps empty tokens at string boundaries (str.split drops
    # them): filter them out and recount per-doc lengths
    nonempty_vocab = np.fromiter((len(t) > 0 for t in vocab), dtype=bool,
                                 count=len(vocab))
    keep = nonempty_vocab[idx]
    if not keep.all():
        doc_of = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
        lengths = np.bincount(doc_of[keep], minlength=len(lengths))
        idx = idx[keep]
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return vocab_hashes[idx], offsets


# byte -> bpe_ish character class: 0 separator (ASCII whitespace),
# 1 letter, 2 digit, 3 other.  Every non-ASCII byte is class 3, and a
# multibyte utf-8 character's bytes are ALL >= 0x80, so byte-level
# class runs segment text exactly like the BPE_ISH_PATTERN regex over
# characters (unicode whitespace is "other" in both — the pattern's
# whitespace set is explicit ASCII).
_BPE_CLS = np.full(256, 3, dtype=np.uint8)
for _c in b" \t\n\r\x0b\x0c":
    _BPE_CLS[_c] = 0
for _c in range(ord("A"), ord("Z") + 1):
    _BPE_CLS[_c] = 1
for _c in range(ord("a"), ord("z") + 1):
    _BPE_CLS[_c] = 1
for _c in range(ord("0"), ord("9") + 1):
    _BPE_CLS[_c] = 2


def _batch_token_hashes_bpe_ish(texts_arr, hasher: TokenHasher
                                ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized bpe_ish tokenization straight over the utf-8 bytes.

    One LUT pass classifies every byte; token runs are maximal
    same-class non-separator byte ranges cut at document boundaries —
    elementwise identical to ``_BPE_ISH_RE.findall`` per doc (the
    classes are disjoint and ASCII, see ``_BPE_CLS``; differential-
    pinned in tests incl. unicode).  Token bytes are gathered into one
    contiguous Arrow string array, dictionary-encoded, and hashed once
    per DISTINCT token through the same memoized hasher as the
    whitespace path.

    Returns (flat uint64 token hashes in document order, int64 doc
    offsets)."""
    import pyarrow as pa
    col = texts_arr
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n_docs = len(col)
    if col.null_count:
        raise ValueError("bpe_ish batch tokenizer: column contains nulls")
    if n_docs == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(1, dtype=np.int64)
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=off_dtype,
                         count=n_docs + 1 + col.offset)[col.offset:]         .astype(np.int64)
    base, end = int(offs[0]), int(offs[-1])
    buf = col.buffers()[2]
    if buf is None or end == base:
        return np.empty(0, dtype=np.uint64), np.zeros(n_docs + 1,
                                                      dtype=np.int64)
    data = np.frombuffer(buf, dtype=np.uint8, count=end)[base:]
    m = len(data)
    cls = _BPE_CLS[data]
    # run starts: position 0, any class change, any doc boundary
    rs_mask = np.empty(m, dtype=bool)
    rs_mask[0] = True
    np.not_equal(cls[1:], cls[:-1], out=rs_mask[1:])
    rs_mask[offs[:-1] - base] = True
    run_starts = np.flatnonzero(rs_mask)
    run_ends = np.append(run_starts[1:], m)
    tokmask = cls[run_starts] != 0
    t_s = run_starts[tokmask]
    t_e = run_ends[tokmask]
    n_tok = len(t_s)
    if n_tok == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(n_docs + 1,
                                                      dtype=np.int64)
    # per-doc token counts (token start -> owning doc)
    doc_of = np.searchsorted(offs, t_s + base, side="right") - 1
    counts = np.bincount(doc_of, minlength=n_docs)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    # ragged gather of token bytes into one contiguous buffer
    lens = t_e - t_s
    tok_off = np.zeros(n_tok + 1, dtype=np.int64)
    np.cumsum(lens, out=tok_off[1:])
    total = int(tok_off[-1])
    idx = (np.arange(total, dtype=np.int64)
           - np.repeat(tok_off[:-1], lens) + np.repeat(t_s, lens))
    vals = data[idx]
    if total < (1 << 31):
        arr = pa.Array.from_buffers(
            pa.utf8(), n_tok,
            [None, pa.py_buffer(tok_off.astype(np.int32)),
             pa.py_buffer(vals)])
    else:   # >2 GiB of token bytes in one batch: 64-bit offsets
        arr = pa.Array.from_buffers(
            pa.large_utf8(), n_tok,
            [None, pa.py_buffer(tok_off), pa.py_buffer(vals)])
    enc = arr.dictionary_encode()
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    vocab_hashes = hasher.hash_tokens(enc.dictionary.to_pylist())
    tok_idx = np.asarray(enc.indices, dtype=np.int64)
    return vocab_hashes[tok_idx], offsets


def effective_min_df(df: np.ndarray, cfg) -> int:
    """Combine ``min_docfreq`` with the ``vocabulary_size`` cap (M6,
    ``doc/cmd/bags.md:15``): keeping the top-N features by df equals a
    df floor at the N-th largest value (ties at the cutoff are kept —
    deterministic, marginally more than N)."""
    m = cfg.min_docfreq
    if cfg.vocabulary_size:
        nz = df[df > 0]
        if len(nz) > cfg.vocabulary_size:
            cutoff = np.partition(nz, len(nz) - cfg.vocabulary_size)[
                len(nz) - cfg.vocabulary_size]
            m = max(m, int(cutoff))
    return m


# --- text-analysis operators (training-data pipeline extras) ---

_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as at by".split())

# Function-word profiles for a no-deps language-ID heuristic over 16
# languages (Cavnar-Trenkle-style profile scoring reduced to its
# most-frequent-words core; frequent closed-class words are the
# strongest low-cost signal).  Words are space-padded substrings so
# Python ``str.count`` / Arrow ``count_substring`` / the generated
# DuckDB ``replace``-count oracle all agree byte-for-byte (lower() is
# unicode-correct in all three).  Dict ORDER is the tie-break: earlier
# language wins equal scores.  Markers must not contain quotes or
# regex metacharacters (they are spliced into SQL literals).
_LANG_MARKERS = {
    "en": (" the ", " and ", " of ", " to ", " is ", " that ", " it ",
           " for ", " was ", " with ", " this ", " from "),
    "de": (" der ", " die ", " und ", " das ", " ist ", " nicht ",
           " mit ", " ein ", " eine ", " auf ", " für ", " sich "),
    "fr": (" le ", " la ", " les ", " et ", " est ", " pas ", " une ",
           " dans ", " que ", " pour ", " qui ", " avec "),
    "es": (" el ", " los ", " que ", " es ", " una ", " por ", " con ",
           " para ", " las ", " del ", " más ", " como "),
    "it": (" il ", " che ", " di ", " per ", " non ", " una ",
           " della ", " con ", " sono ", " anche ", " più "),
    "pt": (" o ", " do ", " da ", " em ", " uma ", " não ", " para ",
           " com ", " os ", " mais ", " das ", " são "),
    "nl": (" de ", " het ", " een ", " van ", " niet ", " met ",
           " voor ", " zijn ", " ook ", " maar ", " aan "),
    "ru": (" и ", " в ", " не ", " на ", " что ", " как ", " это ",
           " по ", " но ", " его "),
    "pl": (" się ", " nie ", " jest ", " że ", " do ", " przez ",
           " jak ", " ale ", " tego ", " oraz "),
    "cs": (" je ", " se ", " že ", " ale ", " jako ", " tak ", " byl ",
           " nebo ", " podle ", " této "),
    "sv": (" och ", " att ", " det ", " som ", " är ", " av ", " för ",
           " med ", " på ", " inte "),
    "fi": (" ja ", " on ", " ei ", " että ", " joka ", " mutta ",
           " myös ", " ovat ", " kun ", " hän "),
    "tr": (" bir ", " ve ", " bu ", " için ", " ile ", " daha ",
           " çok ", " olarak ", " gibi ", " ancak "),
    "id": (" yang ", " dan ", " di ", " untuk ", " dengan ", " tidak ",
           " dari ", " ini ", " adalah ", " pada "),
    "ro": (" și ", " în ", " la ", " cu ", " este ", " pentru ",
           " care ", " mai ", " dar ", " fost "),
    "hu": (" és ", " nem ", " hogy ", " egy ", " van ", " meg ",
           " már ", " csak ", " azt ", " mint "),
}


def quality_stats(text: str) -> dict[str, float]:
    """Length / punctuation / stopword-ratio quality features
    (heuristics in the spirit of C4/Gopher corpus filtering)."""
    toks = text.split()
    n = len(toks)
    n_chars = len(text)
    n_punct = sum(text.count(c) for c in ".,;:!?")
    n_stop = sum(1 for t in toks if t.lower() in _STOPWORDS)
    mean_len = (sum(len(t) for t in toks) / n) if n else 0.0
    return {
        "n_tokens": float(n),
        "n_chars": float(n_chars),
        "mean_token_len": mean_len,
        "punct_ratio": (n_punct / n_chars) if n_chars else 0.0,
        "stopword_ratio": (n_stop / n) if n else 0.0,
    }


def detect_lang(text: str) -> str:
    """Function-word language-ID over the 16-language profile table;
    'und' (undetermined) when no marker fires.  Scalar reference
    implementation — the batch path is :func:`detect_lang_batch`."""
    padded = " %s " % text.lower()
    best, best_score = "und", 0
    for lang, markers in _LANG_MARKERS.items():
        score = sum(padded.count(m) for m in markers)
        if score > best_score:
            best, best_score = lang, score
    return best


def detect_lang_batch(texts_arr) -> np.ndarray:
    """Vectorized :func:`detect_lang` over a batch: one Arrow
    ``count_substring`` C scan per marker over the whole column
    instead of a Python loop per doc.  ``np.argmax`` keeps the first
    maximal row, matching the scalar path's dict-order tie-break.

    Returns an object ndarray of language codes."""
    import pyarrow as pa
    import pyarrow.compute as pc
    if not isinstance(texts_arr, (pa.Array, pa.ChunkedArray)):
        texts_arr = pa.array(texts_arr, type=pa.string())
    padded = pc.binary_join_element_wise(
        " ", pc.utf8_lower(texts_arr), " ", "")
    n = len(padded)
    langs = list(_LANG_MARKERS)
    scores = np.zeros((len(langs), n), dtype=np.int64)
    for li, lang in enumerate(langs):
        for m in _LANG_MARKERS[lang]:
            scores[li] += np.asarray(pc.count_substring(padded, pattern=m),
                                     dtype=np.int64)
    best = np.argmax(scores, axis=0)
    out = np.array(langs, dtype=object)[best]
    out[scores[best, np.arange(n)] == 0] = "und"
    return out


def _md5_u64(s: str) -> int:
    """Lower 64 bits of md5 (little-endian of the digest's last 8
    bytes) — bit-identical to DuckDB's ``md5_number_lower``, which
    makes every operator built on it exactly SQL-oracle-able."""
    import hashlib
    import struct
    return struct.unpack(
        "<Q", hashlib.md5(s.encode("utf-8", "surrogatepass")).digest()[8:])[0]


_MASK63 = (1 << 63) - 1


def fingerprint(text: str, hasher: TokenHasher | None = None,
                k: int = 8) -> int:
    """Document fingerprint: min md5-shingle hash (a 1-sample MinHash)
    — stable under small reorderings, cheap dedup prefilter.  Shingles
    are space-joined token k-grams (the whole token sequence when the
    doc has fewer than k tokens); each hash is masked to 63 bits
    BEFORE the min so the result is an int64 and equals the DuckDB
    oracle ``min(md5_number_lower(s) & ((1<<63)-1))``.  ``hasher`` is
    accepted for signature compatibility and unused."""
    toks = text.split()
    if not toks:
        return 0
    if len(toks) < k:
        shingles = [" ".join(toks)]
    else:
        shingles = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    return min(_md5_u64(s) & _MASK63 for s in shingles)
