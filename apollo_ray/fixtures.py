"""Deterministic synthetic webtext fixtures (FIXTURES.md).

Generates the ``pages`` table of BASELINE.json ``input_hint`` with
planted duplicate clusters (exact + near dups at known edit rates) and
a ``truth`` sidecar — the ground truth for the recall >= 0.99 check.
All generation is seeded; no external data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SEED = 42
_CLUSTER_SIZES = [1, 1, 1, 1, 2, 2, 3, 5, 8, 20]
_EDIT_RATES = [0.02, 0.05, 0.10]


def _vocabulary(rng: np.random.Generator, n: int = 5000) -> list[str]:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    out = []
    for _ in range(n):
        ln = int(rng.integers(3, 10))
        out.append("".join(rng.choice(letters, ln)))
    return out


def _wrap_html(text: str, row_id: int) -> bytes:
    paras = text.split("\n\n")
    body = b"</p><p>".join(p.encode("utf-8") for p in paras)
    return (b"<html><head><title>t%d</title></head><body><p>" % row_id
            + body + b"</p></body></html>")


def _mutate(words: list[str], rate: float, vocab: list[str],
            rng: np.random.Generator) -> list[str]:
    out = []
    for w in words:
        r = rng.random()
        if r < rate / 3:           # delete
            continue
        if r < 2 * rate / 3:       # substitute
            out.append(vocab[int(rng.integers(len(vocab)))])
            continue
        if r < rate:               # insert before
            out.append(vocab[int(rng.integers(len(vocab)))])
        out.append(w)
    return out if out else [vocab[0]]


def generate_pages(n_rows: int, seed: int = SEED
                   ) -> tuple[pa.Table, pa.Table]:
    """Returns (pages, truth).

    pages: url, warc_ts, html, text, lang (input_hint schema).
    truth: url, cluster_id, is_exact, edit_rate.
    """
    rng = np.random.default_rng(seed)
    vocab = _vocabulary(rng)

    def make_base(ci: int) -> str:
        brng = np.random.default_rng(seed * 7_777_777 + ci)
        n_words = int(brng.integers(50, 401))
        words = [vocab[int(i)] for i in brng.integers(0, len(vocab), n_words)]
        # paragraph breaks every ~40 words so the html wrap is exercised
        parts = [" ".join(words[i:i + 40]) for i in range(0, len(words), 40)]
        return "\n\n".join(parts)

    rows: list[tuple[str, int, bool, float]] = []  # (text, cluster, exact, eps)
    ci = 0
    while len(rows) < n_rows:
        size = _CLUSTER_SIZES[ci % len(_CLUSTER_SIZES)]
        base = make_base(ci)
        crng = np.random.default_rng(seed * 1_000_003 + ci)
        for m in range(size):
            if len(rows) >= n_rows:
                break
            if m == 0:
                rows.append((base, ci, True, 0.0))
            elif crng.random() < 0.30:  # exact duplicate member
                rows.append((base, ci, True, 0.0))
            else:
                eps = _EDIT_RATES[int(crng.integers(len(_EDIT_RATES)))]
                words = base.replace("\n\n", " \n\n ").split(" ")
                mut = _mutate(words, eps, vocab, crng)
                text = " ".join(mut).replace(" \n\n ", "\n\n")
                rows.append((text, ci, False, eps))
        ci += 1

    # deterministic shuffle so clusters are not block-contiguous
    perm = np.random.default_rng(seed + 1).permutation(len(rows))
    rows = [rows[int(i)] for i in perm]

    urls, texts, htmls, langs, tss = [], [], [], [], []
    t_cluster, t_exact, t_eps = [], [], []
    base_ts = np.datetime64("2025-01-01T00:00:00", "us")
    for i, (text, cluster, exact, eps) in enumerate(rows):
        url = "https://site%04d.example/p/%d" % (i % 257, i)
        urls.append(url)
        texts.append(text)
        htmls.append(_wrap_html(text, i))
        langs.append("en" if i % 20 < 18 else ("de" if i % 20 == 18 else "fr"))
        tss.append(base_ts + np.timedelta64(i * 1337, "s"))
        t_cluster.append(cluster)
        t_exact.append(exact)
        t_eps.append(eps)

    pages = pa.table({
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(tss, type=pa.timestamp("us")),
        "html": pa.array(htmls, type=pa.binary()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
    })
    truth = pa.table({
        "url": pa.array(urls, type=pa.string()),
        "cluster_id": pa.array(t_cluster, type=pa.int64()),
        "is_exact": pa.array(t_exact, type=pa.bool_()),
        "edit_rate": pa.array(t_eps, type=pa.float64()),
    })
    return pages, truth


def pages_from_documents(documents: pa.Table) -> pa.Table:
    """Synthesize a ``pages`` view from a driver ``documents`` table
    (doc_id, text, lang, ...) — urls derived from doc_id, html a
    deterministic wrap of text (FIXTURES.md §3)."""
    doc_ids = documents.column("doc_id").to_pylist()
    texts = documents.column("text").to_pylist()
    langs = (documents.column("lang").to_pylist()
             if "lang" in documents.column_names else ["und"] * len(doc_ids))
    base_ts = np.datetime64("2025-01-01T00:00:00", "us")
    return pa.table({
        "url": pa.array(["https://docs.example/%d" % d for d in doc_ids]),
        "warc_ts": pa.array([base_ts + np.timedelta64(int(d), "s")
                             for d in doc_ids], type=pa.timestamp("us")),
        "html": pa.array([_wrap_html(t, int(d))
                          for d, t in zip(doc_ids, texts)], type=pa.binary()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
    })
