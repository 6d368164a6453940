"""Unigram-LM pseudo-perplexity scoring (ccnet-style quality signal).

ccnet (Wenzek et al. 2020) buckets Common-Crawl documents by the
perplexity of a KenLM 5-gram trained on Wikipedia; the bucket is the
dominant quality feature of the CCNet/LLaMA data recipes.  No n-gram
LM toolkit exists in this container, so this module implements the
same *shape* with a corpus-internal unigram model — declared as the
baseline stand-in, NOT a KenLM replacement: the operator surface
(two-pass train+score, broadcast model, per-doc score) is what a real
LM plugs into.

Pass 1 trains the model: per-batch partial token counts (map-side
pre-aggregation — one (token, n) row per DISTINCT token per batch, so
the shuffle moves vocabulary, not occurrences), one pkey groupby to
total counts, collected to the driver (web-scale: cap with
``vocab_cap`` — top-V tokens by frequency — and everything else
scores at the OOV floor; the model stays O(V)).  Pass 2 broadcasts
``{token: log10 p}`` once via ``ray.put`` and scores each batch with
a dictionary-encode + gather + ``reduceat`` mean — the per-token
Python work is one dict lookup per batch-DISTINCT token.

Determinism: per-token logprobs are rounded to 6 decimals and the
per-doc mean to 4, so the DuckDB oracle (same split, same
count/total division, ``log10`` + ``round``) reproduces the scores
exactly (the ``sum_value_r4`` precedent).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from apollo_ray.functions.textstats import _split_tokens
from apollo_ray.hashing import hash_utf8, mix_to_partition


def token_term_freqs(docs: "ray.data.Dataset", num_partitions: int = 64
                     ) -> "ray.data.Dataset":
    """(token, n) corpus-wide term frequencies (occurrences, not the
    per-doc-unique counts of :func:`textstats.docfreq`)."""

    def partial_counts(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat = _split_tokens(text).flatten()
        if len(flat) == 0:
            return pa.table({"token": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64()),
                             "pkey": pa.array([], type=pa.int32())})
        vc = flat.value_counts()
        tok = vc.field("values")
        h = np.fromiter((hash_utf8(t) for t in tok.to_pylist()),
                        dtype=np.int64, count=len(tok))
        return pa.table({
            "token": tok,
            "n": vc.field("counts").cast(pa.int64()),
            "pkey": pa.array(mix_to_partition(h, num_partitions),
                             type=pa.int32()),
        })

    def sum_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"token": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        enc = group.column("token").combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.asarray(group.column("n"), dtype=np.int64)
        sums = np.bincount(codes, weights=n,
                           minlength=len(enc.dictionary)).astype(np.int64)
        return pa.table({"token": enc.dictionary,
                         "n": pa.array(sums, type=pa.int64())})

    return docs.map_batches(partial_counts, batch_format="pyarrow") \
        .groupby("pkey").map_groups(sum_part, batch_format="pyarrow")


def unigram_score(docs: "ray.data.Dataset", vocab_cap: int | None = None,
                  num_partitions: int = 64) -> "ray.data.Dataset":
    """(doc_id, n_tokens, avg_lp_r4): mean unigram log10-probability
    per document (higher = more typical of the corpus; the ccnet
    perplexity-bucket analog).  Empty documents are dropped (no
    tokens to score — same contract as the hashers)."""
    tf = token_term_freqs(docs, num_partitions)
    if vocab_cap is not None:
        # distributed top-V: the driver only ever sees <= vocab_cap
        # rows; the normalizing total comes from a scalar aggregate
        from ray.data.aggregate import Sum
        agg = tf.aggregate(Sum("n"))
        total = int(agg["sum(n)"] or 0)
        rows = tf.sort(["n", "token"], descending=[True, False]) \
            .limit(vocab_cap).take_all()
    else:
        rows = tf.take_all()              # O(V) — small-corpus path
        total = sum(r["n"] for r in rows)
    if not rows or total == 0:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], type=pa.int64()),
            "n_tokens": pa.array([], type=pa.int64()),
            "avg_lp_r4": pa.array([], type=pa.float64())}))
    toks = np.asarray([r["token"] for r in rows], dtype=object)
    ns = np.asarray([r["n"] for r in rows], dtype=np.int64)
    lp = np.round(np.log10(ns / total), 6)
    # OOV floor: half an occurrence (only reachable with vocab_cap)
    oov_lp = round(float(np.log10(0.5 / total)), 6)
    model_ref = ray.put((dict(zip(toks.tolist(), lp.tolist())), oov_lp))

    def score(batch: pa.Table) -> pa.Table:
        model, oov = ray.get(model_ref)
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        tok_lists = _split_tokens(text)
        n_tok = pc.list_value_length(tok_lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = n_tok > 0
        flat = tok_lists.flatten()
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dict_lp = np.fromiter(
            (model.get(t, oov) for t in enc.dictionary.to_pylist()),
            dtype=np.float64, count=len(enc.dictionary))
        tok_lp = dict_lp[codes]
        offsets = np.zeros(len(n_tok) + 1, dtype=np.int64)
        np.cumsum(n_tok, out=offsets[1:])
        starts = offsets[:-1][keep]
        sums = np.add.reduceat(tok_lp, starts) if keep.any() else \
            np.empty(0, dtype=np.float64)
        avg = np.round(sums / n_tok[keep], 4)
        ids = np.asarray(batch.column("doc_id").cast(pa.int64()))[keep]
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_tokens": pa.array(n_tok[keep], type=pa.int64()),
            "avg_lp_r4": pa.array(avg, type=pa.float64()),
        })

    return docs.map_batches(score, batch_format="pyarrow")


def unigram_score_sql(vocab_cap: int | None = None) -> str:
    """DuckDB oracle for :func:`unigram_score` (same split, same
    count/total division, same 6/4-decimal rounding; with a cap, the
    same ``n DESC, token ASC`` top-V rule and 0.5-occurrence OOV
    floor)."""
    if vocab_cap is None:
        lp_cte = ("lp AS (SELECT t, round(log10(n / (SELECT s FROM tot)),"
                  " 6) AS lp FROM tf)")
        score = "sum(lp.lp)"
        join = "JOIN"
    else:
        lp_cte = f"""ranked AS (
          SELECT t, n, row_number() OVER (ORDER BY n DESC, t) AS r
          FROM tf),
        lp AS (SELECT t, round(log10(n / (SELECT s FROM tot)), 6) AS lp
               FROM ranked WHERE r <= {vocab_cap})"""
        score = ("sum(coalesce(lp.lp, "
                 "round(log10(0.5 / (SELECT s FROM tot)), 6)))")
        join = "LEFT JOIN"
    return rf"""
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS t
      FROM documents WHERE length(trim(text)) > 0),
    tf AS (SELECT t, count(*) AS n FROM tok GROUP BY t),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS s FROM tf),
    {lp_cte}
    SELECT tok.doc_id,
           count(*) AS n_tokens,
           round({score} / count(*), 4) AS avg_lp_r4
    FROM tok {join} lp ON tok.t = lp.t
    GROUP BY tok.doc_id
"""


UNIGRAM_SCORE_SQL = unigram_score_sql()


def tfidf_top_terms(docs: "ray.data.Dataset", k: int = 5,
                    vocab_cap: int | None = None,
                    num_partitions: int = 64) -> "ray.data.Dataset":
    """(doc_id, token, tfidf_r6) — the top-``k`` tokens of each
    document by tf-idf (keyword extraction; the per-doc analog of the
    reference's log-tf-log-idf weighting, ``apollo/hasher.py:224-228``,
    surfaced as a query instead of a hash input).

    ``score = round(tf * log10((N+1) / (df+1)), 6)`` with ties broken
    by token ascending; ``N`` = total documents.  The docfreq model is
    built by the existing :func:`textstats.docfreq` pass; with
    ``vocab_cap`` only the top-V tokens by ``(df DESC, token ASC)``
    are kept (distributed sort+limit — the driver never holds the full
    vocabulary) and out-of-model tokens take the max-idf floor
    ``df=0``.  Scoring is map-only: one broadcast of the model, per
    batch a dictionary-encode so Python touches only batch-distinct
    tokens, per-doc tf + top-k via one lexsort.
    """
    from apollo_ray.functions.textstats import _split_tokens, docfreq

    df_ds = docfreq(docs)
    if vocab_cap is not None:
        rows = df_ds.sort(["df", "token"], descending=[True, False]) \
            .limit(vocab_cap).take_all()
    else:
        rows = df_ds.take_all()           # O(V) — small-corpus path
    n_docs = docs.count()
    model = {r["token"]: int(r["df"]) for r in rows}
    model_ref = ray.put(model)

    def score(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "token": pa.array([], type=pa.string()),
                          "tfidf_r6": pa.array([], type=pa.float64())})
        if batch.num_rows == 0:
            return empty
        m = ray.get(model_ref)
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = _split_tokens(text)
        flat = toks.flatten()
        if len(flat) == 0:
            return empty
        n_tok = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_tok)
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_dict = len(enc.dictionary)
        uniq, tf = np.unique(doc_idx * n_dict + codes, return_counts=True)
        u_doc = uniq // n_dict
        u_code = (uniq % n_dict).astype(np.int64)
        dict_toks = enc.dictionary.to_pylist()
        dict_idf = np.fromiter(
            (np.log10((n_docs + 1) / (m.get(t, 0) + 1)) for t in dict_toks),
            dtype=np.float64, count=n_dict)
        sc = np.round(tf.astype(np.float64) * dict_idf[u_code], 6)
        # per-doc top-k by (score desc, token asc): lexsort with the
        # token order taken from the dictionary's own sorted ranks
        tok_rank = np.empty(n_dict, dtype=np.int64)
        tok_rank[np.argsort(np.asarray(dict_toks, dtype=object))] = \
            np.arange(n_dict)
        order = np.lexsort((tok_rank[u_code], -sc, u_doc))
        u_doc, u_code, sc = u_doc[order], u_code[order], sc[order]
        first = np.empty(len(u_doc), dtype=bool)
        first[0] = True
        first[1:] = u_doc[1:] != u_doc[:-1]
        seg_start = np.flatnonzero(first)
        rank = np.arange(len(u_doc)) - seg_start[np.cumsum(first) - 1]
        keep = rank < k
        ids = np.asarray(batch.column("doc_id").cast(pa.int64()))
        return pa.table({
            "doc_id": pa.array(ids[u_doc[keep]], type=pa.int64()),
            "token": enc.dictionary.take(pa.array(u_code[keep])),
            "tfidf_r6": pa.array(sc[keep], type=pa.float64()),
        })

    return docs.map_batches(score, batch_format="pyarrow")


def tfidf_top_terms_sql(k: int = 5, vocab_cap: int | None = None) -> str:
    """DuckDB oracle for :func:`tfidf_top_terms` (same tf, df, N,
    log10 scoring, 6-decimal rounding, and (score DESC, token ASC)
    per-doc rank)."""
    if vocab_cap is None:
        df_cte = "dfm AS (SELECT token, df FROM dfx)"
    else:
        df_cte = f"""dfr AS (
          SELECT token, df, row_number()
              OVER (ORDER BY df DESC, token) AS r FROM dfx),
        dfm AS (SELECT token, df FROM dfr WHERE r <= {vocab_cap})"""
    return rf"""
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      FROM documents WHERE length(trim(text)) > 0),
    tf AS (SELECT doc_id, token, count(*) AS tf
           FROM tok GROUP BY doc_id, token),
    dfx AS (SELECT token, count(DISTINCT doc_id) AS df
            FROM tok GROUP BY token),
    n AS (SELECT count(*) AS n FROM documents),
    {df_cte},
    scored AS (
      SELECT tf.doc_id, tf.token,
             round(tf.tf * log10(((SELECT n FROM n) + 1)
                                 / (coalesce(dfm.df, 0) + 1)), 6) AS s
      FROM tf LEFT JOIN dfm ON tf.token = dfm.token),
    r AS (SELECT doc_id, token, s, row_number()
             OVER (PARTITION BY doc_id ORDER BY s DESC, token) AS rk
          FROM scored)
    SELECT doc_id, token, s AS tfidf_r6 FROM r WHERE rk <= {k}
"""
