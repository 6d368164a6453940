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
    """
    m = _BODY_RE.search(html)
    if m is not None:
        body = m.group(1)
        parts = _P_SPLIT.split(body)
        return b"\n\n".join(parts).decode("utf-8", "replace")
    return _TAG_RE.sub(b" ", html).decode("utf-8", "replace").strip()


def tokenize(text: str, mode: str = "whitespace") -> list[str]:
    """``whitespace``: split on whitespace runs (matches the SQL oracle
    ``regexp_split_to_array(text, '\\s+')``); ``words``: ``\\w+`` matches."""
    if mode == "whitespace":
        return text.split()
    return _WORD_RE.findall(text)


def doc_to_bag(text: str, hasher: TokenHasher, k: int, dim_log2: int,
               tokenizer: str = "whitespace", weighting: str = "logtf"
               ) -> tuple[np.ndarray, np.ndarray]:
    """One document -> sparse weighted bag (sorted indices, weights).

    tokens -> uint64 shingle hashes -> feature-hash into ``2**dim_log2``
    columns -> term frequencies -> weights.  The feature-hash replaces
    the reference's global ordered vocabulary (10M cap,
    ``doc/cmd/bags.md:15``): no global state, bounded dimension, the
    collision rate at D=2^16..2^20 is negligible for shingle bags.

    Weights: ``logtf`` -> 1 + ln(tf)  (the tf half of log_tf_log_idf);
    ``tf`` -> raw counts.  Returns float32 weights, uint32 indices.
    """
    tokens = tokenize(text, tokenizer)
    th = hasher.hash_tokens(tokens)
    sh = shingle_hashes(th, k)
    if len(sh) == 0:
        return np.empty(0, dtype=np.uint32), np.empty(0, dtype=np.float32)
    cols = (sh >> np.uint64(64 - dim_log2)).astype(np.uint32)
    idx, tf = np.unique(cols, return_counts=True)
    if weighting == "tf":
        w = tf.astype(np.float32)
    else:  # logtf
        w = (1.0 + np.log(tf)).astype(np.float32)
    return idx.astype(np.uint32), w


# --- text-analysis operators (training-data pipeline extras) ---

_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as at by".split())

# crude character-trigram profiles for a no-deps language-ID heuristic
_LANG_MARKERS = {
    "en": (" the ", " and ", " of ", " to ", " is "),
    "de": (" der ", " die ", " und ", " das ", " ist "),
    "fr": (" le ", " la ", " les ", " et ", " est "),
    "es": (" el ", " los ", " que ", " de ", " es "),
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
    """Marker-phrase language-ID heuristic; 'und' (undetermined) when
    no marker fires.  A real model is out of scope in this container —
    the operator shape (actor-pool map_batches) is what matters."""
    padded = " %s " % text.lower()
    best, best_score = "und", 0
    for lang, markers in _LANG_MARKERS.items():
        score = sum(padded.count(m) for m in markers)
        if score > best_score:
            best, best_score = lang, score
    return best


def fingerprint(text: str, hasher: TokenHasher, k: int = 8) -> int:
    """Rolling-hash document fingerprint: min shingle hash (a 1-sample
    MinHash) — stable under small reorderings, cheap dedup prefilter."""
    th = hasher.hash_tokens(text.split())
    sh = shingle_hashes(th, k)
    if len(sh) == 0:
        return 0
    return int(sh.min() >> np.uint64(1))  # 63-bit for int64 columns
