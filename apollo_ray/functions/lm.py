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


def _avg_lp_r4_exact(lp: np.ndarray, starts: np.ndarray,
                     counts: np.ndarray) -> np.ndarray:
    """Integer-exact per-segment mean of 6-decimal-quantized logprobs,
    rounded half-away-from-zero to 4 decimals.

    A float mean is NOT oracle-safe here: a real sf0.01 doc's mean
    landed exactly on a 4th-decimal half (-1.47945), where numpy's
    pairwise ``reduceat`` and DuckDB's sequential ``sum()`` differ by
    one ulp and flip the rounding.  Instead both sides snap each lp to
    integer micro-units (it is a 6-dp quantum, so ``rint`` never sees
    a half), sum exactly, and round the rational S/(n*100) in integer
    arithmetic: ``sign(S) * ((2|S| + n*100) // (2*n*100)) / 1e4``.
    The SQL twin is ``_AVG_LP_R4_EXACT_SQL``."""
    lpu = np.rint(lp * 1e6).astype(np.int64)
    s = np.add.reduceat(lpu, starts) if len(starts) else \
        np.empty(0, dtype=np.int64)
    m = counts * 100
    scaled = np.sign(s) * ((2 * np.abs(s) + m) // (2 * m))
    return scaled.astype(np.float64) / 1e4


_AVG_LP_R4_EXACT_SQL = """
    SELECT doc_id, count(*) AS n_tokens,
           (CASE WHEN sum(lpu) >= 0
                 THEN (2 * sum(lpu) + count(*) * 100)
                      // (2 * count(*) * 100)
                 ELSE -((2 * (-sum(lpu)) + count(*) * 100)
                        // (2 * count(*) * 100)) END) / 10000.0
               AS avg_lp_r4
    FROM pos2 GROUP BY doc_id
"""


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
        # rows; the normalizing total comes from a scalar aggregate.
        # Materialize first — tf is consumed twice below and a lazy
        # Dataset re-runs the whole corpus pass per consumer.
        tf = tf.materialize()
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
        avg = _avg_lp_r4_exact(tok_lp, starts, n_tok[keep])
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
        row_lp = "lp.lp"
        join = "JOIN"
    else:
        lp_cte = f"""ranked AS (
          SELECT t, n, row_number() OVER (ORDER BY n DESC, t) AS r
          FROM tf),
        lp AS (SELECT t, round(log10(n / (SELECT s FROM tot)), 6) AS lp
               FROM ranked WHERE r <= {vocab_cap})"""
        row_lp = ("coalesce(lp.lp, "
                  "round(log10(0.5 / (SELECT s FROM tot)), 6))")
        join = "LEFT JOIN"
    return rf"""
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS t
      FROM documents WHERE length(trim(text)) > 0),
    tf AS (SELECT t, count(*) AS n FROM tok GROUP BY t),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS s FROM tf),
    {lp_cte},
    pos2 AS (
      SELECT tok.doc_id, CAST(round({row_lp} * 1000000) AS BIGINT) AS lpu
      FROM tok {join} lp ON tok.t = lp.t)
    {_AVG_LP_R4_EXACT_SQL}
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


def bigram_counts(docs: "ray.data.Dataset", num_partitions: int = 64
                  ) -> "ray.data.Dataset":
    """(t1, t2, n) corpus-wide adjacent-pair counts (within-document
    bigrams; map-side pre-aggregation over batch-distinct pairs)."""

    def partial_counts(batch: pa.Table) -> pa.Table:
        empty = pa.table({"t1": pa.array([], type=pa.string()),
                          "t2": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64()),
                          "pkey": pa.array([], type=pa.int32())})
        if batch.num_rows == 0:
            return empty
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = _split_tokens(text)
        flat = toks.flatten()
        if len(flat) < 2:
            return empty
        n_tok = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_tok)
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_dict = len(enc.dictionary)
        adj = doc_idx[1:] == doc_idx[:-1]
        if not adj.any():
            return empty
        pair = codes[:-1][adj] * n_dict + codes[1:][adj]
        uniq, n = np.unique(pair, return_counts=True)
        d = enc.dictionary.to_pylist()
        t1 = [d[c] for c in uniq // n_dict]
        t2 = [d[c] for c in uniq % n_dict]
        kh = np.fromiter(
            (hash_utf8("%s\x00%s" % (a, b)) for a, b in zip(t1, t2)),
            dtype=np.int64, count=len(t1))
        return pa.table({
            "t1": pa.array(t1, type=pa.string()),
            "t2": pa.array(t2, type=pa.string()),
            "n": pa.array(n.astype(np.int64), type=pa.int64()),
            "pkey": pa.array(mix_to_partition(kh, num_partitions),
                             type=pa.int32()),
        })

    def sum_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"t1": pa.array([], type=pa.string()),
                             "t2": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        key = pc.binary_join_element_wise(
            group.column("t1").cast(pa.string()),
            group.column("t2").cast(pa.string()), "\x00")
        enc = key.combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.asarray(group.column("n"), dtype=np.int64)
        sums = np.bincount(codes, weights=n,
                           minlength=len(enc.dictionary)).astype(np.int64)
        parts = [s.split("\x00") for s in enc.dictionary.to_pylist()]
        return pa.table({
            "t1": pa.array([p[0] for p in parts], type=pa.string()),
            "t2": pa.array([p[1] for p in parts], type=pa.string()),
            "n": pa.array(sums, type=pa.int64())})

    return docs.map_batches(partial_counts, batch_format="pyarrow") \
        .groupby("pkey").map_groups(sum_part, batch_format="pyarrow")


def bigram_score(docs: "ray.data.Dataset", backoff: float = 0.4,
                 vocab_cap: int | None = None,
                 bigram_cap: int | None = None,
                 num_partitions: int = 64) -> "ray.data.Dataset":
    """(doc_id, n_tokens, avg_lp_r4): mean per-token log10-probability
    under a corpus-internal bigram model with stupid backoff (Brants
    et al. 2007) — one rung closer to the ccnet KenLM signal than
    :func:`unigram_score`.

    Per position: the first token scores ``log10(n(t)/T)``; later
    tokens score ``log10(c(t1,t2)/n(t1))`` when the bigram is in the
    model, else ``log10(backoff * n(t2)/T)`` (OOV unigrams take the
    0.5-occurrence floor).  Every per-position logprob is rounded to 6
    decimals and the per-doc mean to 4 (SQL-oracle determinism).
    Caps keep the broadcast model O(vocab_cap + bigram_cap) via
    distributed sort+limit; the two count passes are the map-side
    pre-aggregated shuffles of :func:`token_term_freqs` /
    :func:`bigram_counts`.
    """
    from ray.data.aggregate import Sum

    # materialize: consumed 1-2 times below; a lazy count table re-runs
    # its corpus pass per consumer
    tf = token_term_freqs(docs, num_partitions).materialize()
    if vocab_cap is not None:
        total = int(tf.aggregate(Sum("n"))["sum(n)"] or 0)
        uni_rows = tf.sort(["n", "token"], descending=[True, False]) \
            .limit(vocab_cap).take_all()
    else:
        uni_rows = tf.take_all()
        total = sum(r["n"] for r in uni_rows)
    if not uni_rows or total == 0:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], type=pa.int64()),
            "n_tokens": pa.array([], type=pa.int64()),
            "avg_lp_r4": pa.array([], type=pa.float64())}))
    bg = bigram_counts(docs, num_partitions)
    if bigram_cap is not None:
        bg = bg.materialize()
        bg_rows = bg.sort(["n", "t1", "t2"],
                          descending=[True, False, False]) \
            .limit(bigram_cap).take_all()
    else:
        bg_rows = bg.take_all()
    uni = {r["token"]: int(r["n"]) for r in uni_rows}
    big = {(r["t1"], r["t2"]): int(r["n"]) for r in bg_rows}
    oov_lp = round(float(np.log10(0.5 / total)), 6)
    model_ref = ray.put((uni, big, total, float(backoff), oov_lp))

    def score(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "n_tokens": pa.array([], type=pa.int64()),
                          "avg_lp_r4": pa.array([], type=pa.float64())})
        if batch.num_rows == 0:
            return empty
        uni_m, big_m, T, bo, oov = ray.get(model_ref)
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
        d = enc.dictionary.to_pylist()
        # batch-distinct unigram logprobs and backoff values
        uni_n = np.fromiter((uni_m.get(t, 0) for t in d),
                            dtype=np.float64, count=n_dict)
        with np.errstate(divide="ignore"):
            uni_lp = np.where(uni_n > 0,
                              np.round(np.log10(uni_n / T), 6), oov)
            back_lp = np.where(uni_n > 0,
                               np.round(np.log10(bo * uni_n / T), 6),
                               round(float(np.log10(bo * 0.5 / T)), 6))
        lp = uni_lp[codes]                     # default: doc-initial
        cont = np.zeros(len(codes), dtype=bool)
        cont[1:] = doc_idx[1:] == doc_idx[:-1]
        # batch-distinct bigram lookups
        if cont.any():
            pair = codes[np.flatnonzero(cont) - 1] * n_dict + codes[cont]
            up, inv = np.unique(pair, return_inverse=True)
            up_n = np.fromiter(
                (big_m.get((d[c // n_dict], d[c % n_dict]), 0)
                 for c in up), dtype=np.float64, count=len(up))
            prev_n = uni_n[(up // n_dict).astype(np.int64)]
            with np.errstate(divide="ignore", invalid="ignore"):
                up_lp = np.where((up_n > 0) & (prev_n > 0),
                                 np.round(np.log10(up_n / prev_n), 6),
                                 np.nan)
            pair_lp = up_lp[inv]
            fallback = back_lp[codes[cont]]
            lp[cont] = np.where(np.isnan(pair_lp), fallback, pair_lp)
        offsets = np.zeros(len(n_tok) + 1, dtype=np.int64)
        np.cumsum(n_tok, out=offsets[1:])
        keep = n_tok > 0
        starts = offsets[:-1][keep]
        avg = _avg_lp_r4_exact(lp, starts, n_tok[keep])
        ids = np.asarray(batch.column("doc_id").cast(pa.int64()))[keep]
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_tokens": pa.array(n_tok[keep], type=pa.int64()),
            "avg_lp_r4": pa.array(avg, type=pa.float64()),
        })

    return docs.map_batches(score, batch_format="pyarrow")


def bigram_score_sql(backoff: float = 0.4) -> str:
    """DuckDB oracle for the uncapped :func:`bigram_score` (parallel
    unnest gives (doc_id, idx, t); the previous token comes from a
    self-join on idx-1; bigram hit / backoff / doc-initial cases match
    the engine's rounding rules)."""
    return rf"""
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS t,
             unnest(range(len(regexp_split_to_array(trim(text), '\s+'))))
                 AS idx
      FROM documents WHERE length(trim(text)) > 0),
    uni AS (SELECT t, count(*) AS n FROM tok GROUP BY t),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS s FROM uni),
    big AS (SELECT a.t AS t1, b.t AS t2, count(*) AS n2
            FROM tok a JOIN tok b
              ON a.doc_id = b.doc_id AND b.idx = a.idx + 1
            GROUP BY a.t, b.t),
    pos AS (
      SELECT c.doc_id, c.idx, c.t,
             CASE
               WHEN c.idx = 0
                 THEN round(log10(u.n / (SELECT s FROM tot)), 6)
               WHEN bg.n2 IS NOT NULL
                 THEN round(log10(bg.n2 / up.n), 6)
               ELSE round(log10({backoff} * u.n / (SELECT s FROM tot)), 6)
             END AS lp
      FROM tok c
      JOIN uni u ON c.t = u.t
      LEFT JOIN tok p ON p.doc_id = c.doc_id AND p.idx = c.idx - 1
      LEFT JOIN uni up ON p.t = up.t
      LEFT JOIN big bg ON bg.t1 = p.t AND bg.t2 = c.t),
    pos2 AS (
      SELECT doc_id, CAST(round(lp * 1000000) AS BIGINT) AS lpu FROM pos)
    {_AVG_LP_R4_EXACT_SQL}
"""


def char_pair_counts(docs: "ray.data.Dataset", min_count: int = 1,
                     num_partitions: int = 64) -> "ray.data.Dataset":
    """(pair, n) — adjacent-character-pair frequencies inside
    whitespace tokens across the corpus: the merge-candidate table of
    the FIRST BPE training iteration (Sennrich et al. 2016), weighted
    by occurrence (every token instance counts).

    Vectorized without touching Python strings: for each offset i up
    to the longest token, one ``utf8_slice_codeunits(i, i+2)`` Arrow
    kernel pass over the whole flattened token array extracts that
    offset's pair for every token at once (O(max_token_len) kernel
    passes per batch, each full-width); per-batch ``value_counts``
    partials then shuffle on hash(pair) so the reduce sums each
    pair's total inside exactly one partition — occurrences never
    move, only per-batch-distinct (pair, n) rows.
    """
    from apollo_ray.functions.textstats import _split_tokens
    from apollo_ray.hashing import hash_utf8, mix_to_partition

    _EMPTY = pa.table({"pair": pa.array([], type=pa.string()),
                       "n": pa.array([], type=pa.int64()),
                       "pkey": pa.array([], type=pa.int32())})

    def partial_counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat = _split_tokens(text).flatten()
        if len(flat) == 0:
            return _EMPTY
        lens = pc.utf8_length(flat)
        max_len = pc.max(lens).as_py() or 0
        chunks = []
        for i in range(max_len - 1):
            m = pc.greater_equal(lens, i + 2)
            chunks.append(pc.utf8_slice_codeunits(flat.filter(m), i, i + 2))
        if not chunks:
            return _EMPTY
        pairs = pa.concat_arrays([c.combine_chunks() if
                                  isinstance(c, pa.ChunkedArray) else c
                                  for c in chunks])
        vc = pairs.value_counts()
        p = vc.field("values")
        n = vc.field("counts").cast(pa.int64())
        h = np.fromiter((hash_utf8(s) for s in p.to_pylist()),
                        dtype=np.int64, count=len(p))
        return pa.table({
            "pair": p, "n": n,
            "pkey": pa.array(mix_to_partition(h, num_partitions),
                             type=pa.int32())})

    def sum_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"pair": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        enc = group.column("pair").combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.asarray(group.column("n"), dtype=np.int64)
        tot = np.bincount(codes, weights=n.astype(np.float64),
                          minlength=len(enc.dictionary)).astype(np.int64)
        keep = tot >= min_count
        idx = np.flatnonzero(keep)
        return pa.table({
            "pair": enc.dictionary.take(pa.array(idx)),
            "n": pa.array(tot[idx], type=pa.int64())})

    return docs.map_batches(partial_counts, batch_format="pyarrow") \
        .groupby("pkey").map_groups(sum_part, batch_format="pyarrow")


def _pmi_final_fold(cand: list, topn: int) -> "ray.data.Dataset":
    """Driver fold over the <= partitions x topn per-partition
    candidates: global (pmi DESC, w1, w2) order, limit topn."""
    cand.sort(key=lambda r: (-r["pmi_micro"], r["w1"], r["w2"]))
    cand = cand[:topn]
    return ray.data.from_arrow(pa.table({
        "w1": pa.array([r["w1"] for r in cand], type=pa.string()),
        "w2": pa.array([r["w2"] for r in cand], type=pa.string()),
        "c12": pa.array([r["c12"] for r in cand], type=pa.int64()),
        "pmi_micro": pa.array([r["pmi_micro"] for r in cand],
                              type=pa.int64()),
    }))


def _word_pmi_hashjoin(freq: "ray.data.Dataset", bg: "ray.data.Dataset",
                       T: int, B: int, min_count: int, topn: int,
                       num_partitions: int) -> "ray.data.Dataset":
    """Above-cap path for :func:`word_pmi_pairs`: attach c1 then c2
    with two pkey hash-join exchanges instead of broadcasting the
    frequent vocabulary.  Each exchange unions the (token, n) side
    with the bigram side on hash(join word); within a partition the
    attach is one dictionary-encode + two gathers (no string sort, no
    per-row Python).  The driver never holds the vocabulary."""
    from apollo_ray.hashing import hash_utf8, mix_to_partition

    Tf, Bf = float(T), float(B)
    _empty = pa.table({"w1": pa.array([], type=pa.string()),
                       "w2": pa.array([], type=pa.string()),
                       "c12": pa.array([], type=pa.int64()),
                       "pmi_micro": pa.array([], type=pa.int64())})

    def _pkeys(words: list) -> pa.Array:
        h = np.fromiter((hash_utf8(w) for w in words), dtype=np.int64,
                        count=len(words))
        return pa.array(mix_to_partition(h, num_partitions),
                        type=pa.int32())

    def _u_side():
        def f(batch: pa.Table) -> pa.Table:
            toks = batch.column("token").to_pylist()
            n = batch.column("n").cast(pa.int64())
            nulls = pa.nulls(len(toks), type=pa.string())
            zeros = pa.nulls(len(toks), type=pa.int64())
            return pa.table({
                "jw": pa.array(toks, type=pa.string()),
                "ow": nulls, "c12": zeros,
                "cprev": zeros,
                "cnt": n,
                "kind": pa.array(np.zeros(len(toks), dtype=np.int8)),
                "pkey": _pkeys(toks)})
        return f

    _JOIN_SCHEMA = pa.schema([("jw", pa.string()), ("ow", pa.string()),
                              ("c12", pa.int64()), ("cprev", pa.int64()),
                              ("cnt", pa.int64()), ("kind", pa.int8()),
                              ("pkey", pa.int32())])
    _JOIN_EMPTY = _JOIN_SCHEMA.empty_table()

    def _bg_side(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch.column("n"), dtype=np.int64)
        keep = n >= min_count
        if not keep.any():
            return _JOIN_EMPTY
        idx = np.flatnonzero(keep)
        t1 = batch.column("t1").to_pylist()
        t2 = batch.column("t2").to_pylist()
        jw = [t1[i] for i in idx]
        return pa.table({
            "jw": pa.array(jw, type=pa.string()),
            "ow": pa.array([t2[i] for i in idx], type=pa.string()),
            "c12": pa.array(n[idx], type=pa.int64()),
            "cprev": pa.nulls(len(idx), type=pa.int64()),
            "cnt": pa.nulls(len(idx), type=pa.int64()),
            "kind": pa.array(np.ones(len(idx), dtype=np.int8)),
            "pkey": _pkeys(jw)})

    def _attach(group: pa.Table) -> pa.Table:
        """(jw, ow, c12, cprev) bigram rows + (jw, cnt) dict rows ->
        bigram rows with cnt gathered for jw; re-keyed on ow for the
        next exchange (or scored, see _attach2)."""
        if group.num_rows == 0:
            return _JOIN_EMPTY
        kind = np.asarray(group.column("kind"), dtype=np.int8)
        enc = group.column("jw").combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        lut = np.zeros(len(enc.dictionary), dtype=np.int64)
        d = kind == 0
        lut[codes[d]] = np.asarray(group.column("cnt"),
                                   dtype=np.float64)[d].astype(np.int64)
        b = np.flatnonzero(kind == 1)
        if not len(b):
            return _JOIN_EMPTY
        got = lut[codes[b]]
        ow = group.column("ow").take(pa.array(b)).to_pylist()
        return pa.table({
            "jw": pa.array(ow, type=pa.string()),
            "ow": group.column("jw").take(pa.array(b)),
            "c12": group.column("c12").take(pa.array(b)).cast(pa.int64()),
            "cprev": pa.array(got, type=pa.int64()),
            "cnt": pa.nulls(len(b), type=pa.int64()),
            "kind": pa.array(np.ones(len(b), dtype=np.int8)),
            "pkey": _pkeys(ow)})

    def _attach2_score(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _empty
        kind = np.asarray(group.column("kind"), dtype=np.int8)
        enc = group.column("jw").combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        lut = np.zeros(len(enc.dictionary), dtype=np.int64)
        d = kind == 0
        lut[codes[d]] = np.asarray(group.column("cnt"),
                                   dtype=np.float64)[d].astype(np.int64)
        b = np.flatnonzero(kind == 1)
        if not len(b):
            return _empty
        c2 = lut[codes[b]].astype(np.float64)
        c1 = np.asarray(group.column("cprev"),
                        dtype=np.float64)[b]
        c12 = np.asarray(group.column("c12"), dtype=np.float64)[b]
        pmi = np.floor(1e6 * np.log2((c12 * Tf * Tf)
                                     / ((Bf * c1) * c2)) + 0.5) \
            .astype(np.int64)
        # after the first attach jw holds w2 and ow holds w1
        w2 = group.column("jw").take(pa.array(b)).to_pylist()
        w1 = group.column("ow").take(pa.array(b)).to_pylist()
        rows = sorted(
            ((int(pmi[j]), w1[j], w2[j], int(c12[j]))
             for j in range(len(b))),
            key=lambda r: (-r[0], r[1], r[2]))[:topn]
        return pa.table({
            "w1": pa.array([r[1] for r in rows], type=pa.string()),
            "w2": pa.array([r[2] for r in rows], type=pa.string()),
            "c12": pa.array([r[3] for r in rows], type=pa.int64()),
            "pmi_micro": pa.array([r[0] for r in rows],
                                  type=pa.int64())})

    j1 = freq.map_batches(_u_side(), batch_format="pyarrow") \
        .union(bg.map_batches(_bg_side, batch_format="pyarrow")) \
        .groupby("pkey").map_groups(_attach, batch_format="pyarrow")
    cand = freq.map_batches(_u_side(), batch_format="pyarrow") \
        .union(j1) \
        .groupby("pkey").map_groups(_attach2_score,
                                    batch_format="pyarrow").take_all()
    return _pmi_final_fold(cand, topn)


def word_pmi_pairs(docs: "ray.data.Dataset", min_count: int = 5,
                   topn: int = 50, num_partitions: int = 64,
                   max_vocab: int = 5_000_000,
                   method: str = "auto") -> "ray.data.Dataset":
    """(w1, w2, c12, pmi_micro) — the ``topn`` adjacent word pairs by
    pointwise mutual information (collocation mining: "los angeles",
    "et al"), restricted to pairs with corpus count >= ``min_count``.

    PMI = log2(p(w1,w2) / (p(w1) p(w2))) with p(w1,w2) = c12/B over
    bigram occurrences and p(w) = c/T over token occurrences, in
    integer MICRO-bits via round-half-up floor(x + 0.5) in the same
    float64 operand order as the SQL oracle; ties at the top-n
    boundary break on (w1, w2) codepoint order (== DuckDB binary
    collation, since UTF-8 byte order preserves codepoint order).

    Scale shape: the two count passes are the map-side pre-aggregated
    shuffles of :func:`token_term_freqs` / :func:`bigram_counts`
    (partials are batch-distinct, one pkey exchange each).  Only
    unigrams with c >= min_count can touch a qualifying bigram
    (c1 >= c12 >= min_count), so the broadcast side is the frequent
    vocabulary — guarded by ``max_vocab``.  ``method``: "auto" uses
    the broadcast below the cap and falls back to
    :func:`_word_pmi_hashjoin` (two pkey hash-join exchanges, driver
    never holds the vocabulary) above it; "hashjoin" forces the
    distributed attach; "broadcast" keeps the declared raise above
    the cap.  The bigram side never leaves the cluster on either
    path: scoring is map-only over the count partitions and each
    block forwards only its own top-n.
    """
    from ray.data.aggregate import Sum

    if method not in ("auto", "broadcast", "hashjoin"):
        raise ValueError("method must be auto | broadcast | hashjoin")
    # materialize both (tiny) count tables immediately: they are each
    # consumed 2-3 times below (aggregate, filter+count, take_all /
    # score), and a lazy Dataset re-runs its whole corpus pass per
    # consumer — measured 5 full parquet+tokenize passes before this,
    # 2 after (3.9 s -> ~2 s at 500k/32)
    tf = token_term_freqs(docs, num_partitions).materialize()
    total_row = tf.aggregate(Sum("n"))
    T = int(total_row["sum(n)"] or 0)
    _empty = pa.table({"w1": pa.array([], type=pa.string()),
                       "w2": pa.array([], type=pa.string()),
                       "c12": pa.array([], type=pa.int64()),
                       "pmi_micro": pa.array([], type=pa.int64())})
    if T == 0:
        return ray.data.from_arrow(_empty)
    freq = tf.filter(expr=f"n >= {int(min_count)}")
    bg = bigram_counts(docs, num_partitions).materialize()
    B_row = bg.aggregate(Sum("n"))
    B = int(B_row["sum(n)"] or 0)
    if B == 0:
        return ray.data.from_arrow(_empty)
    if method == "hashjoin":
        return _word_pmi_hashjoin(freq, bg, T, B, min_count, topn,
                                  num_partitions)
    n_vocab = freq.count()
    if n_vocab > max_vocab:
        if method == "auto":
            return _word_pmi_hashjoin(freq, bg, T, B, min_count, topn,
                                      num_partitions)
        raise ValueError(
            "frequent vocabulary %d exceeds max_vocab=%d — raise "
            "min_count or use method='hashjoin' (two pkey hash-join "
            "exchanges instead of the broadcast)" % (n_vocab, max_vocab))
    uni = {r["token"]: int(r["n"]) for r in freq.take_all()}
    uni_ref = ray.put(uni)

    Tf, Bf = float(T), float(B)

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty
        n = np.asarray(batch.column("n"), dtype=np.int64)
        keep = n >= min_count
        if not keep.any():
            return _empty
        t1 = batch.column("t1").to_pylist()
        t2 = batch.column("t2").to_pylist()
        u = ray.get(uni_ref)
        c12 = n[keep].astype(np.float64)
        idx = np.flatnonzero(keep)
        c1 = np.fromiter((u[t1[i]] for i in idx), dtype=np.float64,
                         count=len(idx))
        c2 = np.fromiter((u[t2[i]] for i in idx), dtype=np.float64,
                         count=len(idx))
        pmi = np.floor(1e6 * np.log2((c12 * Tf * Tf)
                                     / ((Bf * c1) * c2)) + 0.5) \
            .astype(np.int64)
        rows = sorted(
            ((int(pmi[j]), t1[i], t2[i], int(n[i]))
             for j, i in enumerate(idx)),
            key=lambda r: (-r[0], r[1], r[2]))[:topn]
        return pa.table({
            "w1": pa.array([r[1] for r in rows], type=pa.string()),
            "w2": pa.array([r[2] for r in rows], type=pa.string()),
            "c12": pa.array([r[3] for r in rows], type=pa.int64()),
            "pmi_micro": pa.array([r[0] for r in rows], type=pa.int64()),
        })

    # each count partition forwards <= topn rows; final fold on <= 
    # num_partitions x topn rows
    cand = bg.map_batches(score, batch_format="pyarrow").take_all()
    cand.sort(key=lambda r: (-r["pmi_micro"], r["w1"], r["w2"]))
    cand = cand[:topn]
    return ray.data.from_arrow(pa.table({
        "w1": pa.array([r["w1"] for r in cand], type=pa.string()),
        "w2": pa.array([r["w2"] for r in cand], type=pa.string()),
        "c12": pa.array([r["c12"] for r in cand], type=pa.int64()),
        "pmi_micro": pa.array([r["pmi_micro"] for r in cand],
                              type=pa.int64()),
    }))


def word_pmi_pairs_sql(min_count: int = 5, topn: int = 50,
                       table: str = "documents") -> str:
    """DuckDB oracle for :func:`word_pmi_pairs` — same tok CTE as
    :func:`bigram_score_sql`, identical float64 PMI expression and
    round-half-up floor."""
    return rf"""
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS t,
             unnest(range(len(regexp_split_to_array(trim(text), '\s+'))))
                 AS idx
      FROM {table} WHERE length(trim(text)) > 0),
    uni AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY t),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS s FROM uni),
    big AS (SELECT a.t AS t1, b.t AS t2, CAST(count(*) AS BIGINT) AS n2
            FROM tok a JOIN tok b
              ON a.doc_id = b.doc_id AND b.idx = a.idx + 1
            GROUP BY a.t, b.t),
    btot AS (SELECT CAST(sum(n2) AS BIGINT) AS b FROM big),
    j AS (
      SELECT big.t1 AS w1, big.t2 AS w2, big.n2 AS c12,
             CAST(floor(1e6 * log2(
                 (CAST(big.n2 AS DOUBLE) * (SELECT s FROM tot)
                                         * (SELECT s FROM tot))
                 / ((CAST((SELECT b FROM btot) AS DOUBLE) * u1.n)
                    * u2.n)) + 0.5) AS BIGINT) AS pmi_micro
      FROM big
      JOIN uni u1 ON u1.t = big.t1
      JOIN uni u2 ON u2.t = big.t2
      WHERE big.n2 >= {int(min_count)})
    SELECT w1, w2, c12, pmi_micro FROM j
    ORDER BY pmi_micro DESC, w1 ASC, w2 ASC
    LIMIT {int(topn)}
    """
