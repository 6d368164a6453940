"""Multinomial Naive Bayes document classifier — the train-a-cheap-
quality/domain-classifier step of web-corpus curation (the fasttext-
classifier analog of CCNet/GPT-3-style filtering, built from counts so
the whole train+score chain is value-exact in SQL).

Train: per-(label, token) occurrence counts with Laplace add-one
smoothing over a (optionally top-V capped) vocabulary; class priors
from document counts.  Score: every document gets
``argmax_c [ prior_lpu(c) + sum_{t in doc ∩ vocab} lpu(c, t) ]``
with ties broken by label ASC; all per-term log10-probabilities are
quantized to 6 decimals and summed as integers (micro-log-probs), the
same determinism recipe as :mod:`apollo_ray.functions.lm`.

Scale shape: two metadata shuffles, both map-side pre-aggregated —
corpus term frequencies (for the vocab cap) and (label, token) counts
(hash-of-token partitioning, Arrow two-key group_by inside each
partition).  The driver holds only the O(L x V) model, broadcast once
via ``ray.put``; scoring is a pure map pass (dictionary-encode the
batch's tokens, one gather into the (V, L) lpu matrix, segmented
``reduceat`` sums per document).  Labels are assumed few (sources /
quality tiers / languages — L in the tens), the regime where
multinomial NB is actually used.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from apollo_ray.functions.textstats import _split_tokens
from apollo_ray.hashing import hash_utf8, mix_to_partition

__all__ = ["nb_classify", "nb_classify_sql", "code_detect",
           "code_detect_sql", "code_flags", "term_blocklist_filter",
           "term_blocklist_filter_sql"]


def _label_token_counts(docs: "ray.data.Dataset", label_col: str,
                        num_partitions: int) -> "ray.data.Dataset":
    """(label, token, n) occurrence counts, one hash-of-token shuffle
    of pre-aggregated partials (each batch contributes at most its
    distinct (label, token) pairs, never raw occurrences)."""

    def partials(batch: pa.Table) -> pa.Table:
        empty = pa.table({"label": pa.array([], type=pa.string()),
                          "token": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64()),
                          "pkey": pa.array([], type=pa.int32())})
        if batch.num_rows == 0:
            return empty
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = _split_tokens(text)
        n_tok = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = toks.flatten()
        if len(flat) == 0:
            return empty
        labels = batch.column(label_col)
        if isinstance(labels, pa.ChunkedArray):
            labels = labels.combine_chunks()
        lab_enc = labels.dictionary_encode()
        lab_codes = np.repeat(
            lab_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64),
            n_tok)
        tok_enc = flat.dictionary_encode()
        tok_codes = tok_enc.indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        nv = len(tok_enc.dictionary)
        combo = lab_codes * nv + tok_codes
        cnt = np.bincount(combo, minlength=len(lab_enc.dictionary) * nv)
        nz = np.flatnonzero(cnt)
        tok_idx = nz % nv
        toks_out = tok_enc.dictionary.take(pa.array(tok_idx))
        h = np.fromiter((hash_utf8(t) for t in toks_out.to_pylist()),
                        dtype=np.int64, count=len(nz))
        return pa.table({
            "label": lab_enc.dictionary.take(pa.array(nz // nv)),
            "token": toks_out,
            "n": pa.array(cnt[nz], type=pa.int64()),
            "pkey": pa.array(mix_to_partition(h, num_partitions),
                             type=pa.int32()),
        })

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"label": pa.array([], type=pa.string()),
                             "token": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        tg = group.group_by(["label", "token"]).aggregate([("n", "sum")])
        return pa.table({"label": tg.column("label"),
                         "token": tg.column("token"),
                         "n": tg.column("n_sum").cast(pa.int64())})

    return docs.map_batches(partials, batch_format="pyarrow") \
        .groupby("pkey").map_groups(fold, batch_format="pyarrow")


def _class_doc_counts(docs: "ray.data.Dataset", label_col: str
                      ) -> dict[str, int]:
    """label -> n_docs, folded from per-batch partials on the driver
    (L rows per batch; no shuffle)."""

    def partials(batch: pa.Table) -> pa.Table:
        labels = batch.column(label_col)
        if isinstance(labels, pa.ChunkedArray):
            labels = labels.combine_chunks()
        vc = labels.value_counts()
        return pa.table({"label": vc.field("values"),
                         "nd": vc.field("counts").cast(pa.int64())})

    out: dict[str, int] = {}
    for b in docs.map_batches(partials,
                              batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for lab, nd in zip(b.column("label").to_pylist(),
                           b.column("nd").to_pylist()):
            out[lab] = out.get(lab, 0) + int(nd)
    return out


def nb_classify(docs: "ray.data.Dataset", label_col: str = "source",
                vocab_cap: int | None = None, num_partitions: int = 64
                ) -> "ray.data.Dataset":
    """(doc_id, n_vocab_tokens, label_pred, best_lpu) — train a
    multinomial NB model on ``label_col`` and score every document
    (self-train + label-recovery; pass a labeled subset as ``docs``
    and score another set by reusing the broadcast model if needed).

    ``best_lpu`` is the winning class's integer micro-log10-prob
    score (prior + token sums), exactly reproducible in SQL
    (:func:`nb_classify_sql`).  Documents with no vocabulary tokens
    score on priors alone.
    """
    from ray.data.aggregate import Sum

    ct = _label_token_counts(docs, label_col, num_partitions)

    if vocab_cap is not None:
        # distributed top-V by corpus term frequency (n DESC, token ASC).
        # Materialize the (small) count table first — it is consumed
        # twice below and a lazy Dataset re-runs its corpus pass per
        # consumer.
        ct = ct.materialize()
        tf = ct.groupby("token").aggregate(Sum("n", alias_name="tn"))
        vocab_rows = tf.sort(["tn", "token"], descending=[True, False]) \
            .limit(vocab_cap).take_all()
        vocab = sorted(r["token"] for r in vocab_rows)
        vset_ref = ray.put(frozenset(vocab))

        def in_vocab(batch: pa.Table) -> pa.Table:
            vs = ray.get(vset_ref)
            keep = pa.array([t in vs for t in
                             batch.column("token").to_pylist()],
                            type=pa.bool_())
            return batch.filter(keep)

        ct_rows = ct.map_batches(in_vocab, batch_format="pyarrow") \
            .take_all()
    else:
        ct_rows = ct.take_all()           # O(L·V) — the model itself
        vocab = sorted({r["token"] for r in ct_rows})

    priors = _class_doc_counts(docs, label_col)
    classes = sorted(priors)
    n_docs = sum(priors.values())
    L, V = len(classes), len(vocab)
    cls_idx = {c: i for i, c in enumerate(classes)}
    tok_idx = {t: i for i, t in enumerate(vocab)}

    counts = np.zeros((V, L), dtype=np.int64)
    for r in ct_rows:
        counts[tok_idx[r["token"]], cls_idx[r["label"]]] = r["n"]
    tot_c = counts.sum(axis=0)
    # Laplace add-one over the vocab; 6-decimal quantized micro-units
    lp6 = np.round(np.log10((counts + 1.0) / (tot_c + float(V))), 6)
    lpu = np.round(lp6 * 1e6).astype(np.int64)
    prior_lp6 = np.round(np.log10(
        np.asarray([priors[c] for c in classes], dtype=np.float64)
        / float(n_docs)), 6)
    prior_lpu = np.round(prior_lp6 * 1e6).astype(np.int64)
    model_ref = ray.put((classes, tok_idx, lpu, prior_lpu))

    def score(batch: pa.Table) -> pa.Table:
        classes_, tok_idx_, lpu_, prior_ = ray.get(model_ref)
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = _split_tokens(text)
        n_tok = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = toks.flatten()
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dict_row = np.fromiter(
            (tok_idx_.get(t, -1) for t in enc.dictionary.to_pylist()),
            dtype=np.int64, count=len(enc.dictionary))
        rows = dict_row[codes] if len(codes) else np.zeros(0, np.int64)
        known = rows >= 0
        # per-occurrence (L,) lpu rows; OOV/non-vocab occurrences are 0
        occ = np.zeros((len(rows), len(classes_)), dtype=np.int64)
        if known.any():
            occ[known] = lpu_[rows[known]]
        offsets = np.zeros(len(n_tok) + 1, dtype=np.int64)
        np.cumsum(n_tok, out=offsets[1:])
        seg = np.zeros((len(n_tok), len(classes_)), dtype=np.int64)
        nv = np.zeros(len(n_tok), dtype=np.int64)
        if len(rows):
            pad = np.vstack([occ, np.zeros((1, len(classes_)), np.int64)])
            seg = np.add.reduceat(pad, offsets[:-1], axis=0)[:len(n_tok)]
            seg[n_tok == 0] = 0
            nvpad = np.append(known.astype(np.int64), 0)
            nv = np.add.reduceat(nvpad, offsets[:-1])[:len(n_tok)]
            nv[n_tok == 0] = 0
        scores = seg + prior_[None, :]
        best = np.argmax(scores, axis=1)       # first max = label ASC tie
        best_lpu = scores[np.arange(len(n_tok)), best]
        labels_out = pa.array(
            [classes_[i] for i in best.tolist()], type=pa.string())
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "n_vocab_tokens": pa.array(nv, type=pa.int64()),
            "label_pred": labels_out,
            "best_lpu": pa.array(best_lpu, type=pa.int64()),
        })

    return docs.map_batches(score, batch_format="pyarrow")


def nb_classify_sql(label_col: str = "source",
                    vocab_cap: int | None = None,
                    table: str = "documents") -> str:
    """DuckDB oracle for :func:`nb_classify`: same tokenizer, same
    top-V rule, same Laplace smoothing, 6-decimal quantization and
    integer micro-unit sums, argmax with label-ASC tie-break."""
    if vocab_cap is None:
        vocab_cte = "vocab AS (SELECT t FROM tf)"
    else:
        vocab_cte = f"""vocab AS (
          SELECT t FROM tf ORDER BY n DESC, t LIMIT {vocab_cap})"""
    return rf"""
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS t
      FROM {table} WHERE length(trim(text)) > 0),
    lab AS (SELECT doc_id, {label_col} AS c FROM {table}),
    cls AS (SELECT c, CAST(count(*) AS BIGINT) AS nd FROM lab GROUP BY c),
    nd_all AS (SELECT CAST(count(*) AS BIGINT) AS n FROM {table}),
    prior AS (
      SELECT c, CAST(round(round(log10(nd / (SELECT n FROM nd_all)), 6)
                           * 1000000) AS BIGINT) AS plpu
      FROM cls),
    tf AS (SELECT t, count(*) AS n FROM tok GROUP BY t),
    {vocab_cte},
    vsz AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
    vtok AS (SELECT tok.doc_id, tok.t FROM tok
             WHERE tok.t IN (SELECT t FROM vocab)),
    ct AS (SELECT lab.c, vtok.t, CAST(count(*) AS BIGINT) AS n
           FROM vtok JOIN lab USING (doc_id) GROUP BY lab.c, vtok.t),
    tot AS (SELECT c, CAST(sum(n) AS BIGINT) AS tc FROM ct GROUP BY c),
    lp AS (
      SELECT cls.c, v.t,
             CAST(round(round(log10((coalesce(ct.n, 0) + 1)
                                    / (coalesce(tot.tc, 0)
                                       + (SELECT v FROM vsz))), 6)
                        * 1000000) AS BIGINT) AS lpu
      FROM cls CROSS JOIN vocab v
      LEFT JOIN ct ON ct.c = cls.c AND ct.t = v.t
      LEFT JOIN tot ON tot.c = cls.c),
    s AS (SELECT vtok.doc_id, lp.c,
                 CAST(sum(lp.lpu) AS BIGINT) AS slpu,
                 CAST(count(*) AS BIGINT) AS ntv
          FROM vtok JOIN lp ON lp.t = vtok.t
          GROUP BY vtok.doc_id, lp.c),
    alls AS (
      SELECT d.doc_id, cls.c,
             coalesce(s.slpu, 0) + prior.plpu AS score,
             coalesce(s.ntv, 0) AS ntv
      FROM {table} d CROSS JOIN cls
      LEFT JOIN s ON s.doc_id = d.doc_id AND s.c = cls.c
      JOIN prior ON prior.c = cls.c)
    SELECT doc_id, ntv AS n_vocab_tokens, c AS label_pred,
           score AS best_lpu
    FROM alls
    QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, c) = 1
"""


# ---------------------------------------------------------------------------
# code-likeness heuristic — flag code-bearing documents in a text corpus
# ---------------------------------------------------------------------------

# code-only keywords: deliberately excludes English-common tokens
# (if/for/while) so prose never trips the detector
_CODE_KW_PATTERN = (r"\b(?:def|return|import|function|var|const|void|"
                    r"static|printf|include|lambda|elif|struct|typedef|"
                    r"endif)\b")
_CODE_INDENT_PATTERN = r"(?m)^(?:\t|    )"


def code_flags(text: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(code_score, is_code) numpy vectors for a text array — the
    decision kernel :func:`code_detect` and the curate pipeline's
    ``drop_code`` filter share."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()

    def n(arr) -> np.ndarray:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return arr.cast(pa.int64()).to_numpy(zero_copy_only=False)

    n_chars = n(pc.utf8_length(text))
    score = (2 * (n(pc.count_substring(text, "{"))
                  + n(pc.count_substring(text, "}")))
             + 2 * n(pc.count_substring(text, ";"))
             + n(pc.count_substring_regex(text, _CODE_INDENT_PATTERN))
             + 3 * n(pc.count_substring_regex(text, _CODE_KW_PATTERN)))
    is_code = (score >= 3) & (score * 100 >= n_chars)
    return score, is_code


def code_detect(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, n_chars, n_braces, n_semicolons, n_indented,
    n_keywords, code_score, is_code) — the cheap lexical code
    detector a training-data pipeline runs to route documents to a
    code pile vs a prose pile (or to drop half-rendered source from a
    web crawl) before any model-based classifier.

    Signals, every one a single vectorized Arrow kernel over the
    batch: ``{``/``}`` brace count, ``;`` count, lines opening with a
    tab / 4 spaces (RE2 multiline), and code-only keyword hits
    (def/return/import/... — English-common keywords like if/for are
    deliberately excluded so prose never scores).  The decision is
    pure integer arithmetic, value-exact in SQL:

        code_score = 2*n_braces + 2*n_semicolons + n_indented
                     + 3*n_keywords
        is_code    = code_score >= 3 AND code_score * 100 >= n_chars

    (at least one real marker cluster AND a density of one weighted
    marker per 100 chars — length-normalized so long prose with a
    stray semicolon stays prose).

    Scale shape: pure map, no shuffle, no state.
    """

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()

        def i64(arr) -> pa.Array:
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            return arr.cast(pa.int64())

        n_chars = i64(pc.utf8_length(text))
        n_braces = i64(pc.add(pc.count_substring(text, "{"),
                              pc.count_substring(text, "}")))
        n_semi = i64(pc.count_substring(text, ";"))
        n_ind = i64(pc.count_substring_regex(text, _CODE_INDENT_PATTERN))
        n_kw = i64(pc.count_substring_regex(text, _CODE_KW_PATTERN))
        score = pc.add(
            pc.add(pc.multiply(n_braces, pa.scalar(2, type=pa.int64())),
                   pc.multiply(n_semi, pa.scalar(2, type=pa.int64()))),
            pc.add(n_ind,
                   pc.multiply(n_kw, pa.scalar(3, type=pa.int64()))))
        is_code = pc.and_(
            pc.greater_equal(score, pa.scalar(3, type=pa.int64())),
            pc.greater_equal(
                pc.multiply(score, pa.scalar(100, type=pa.int64())),
                n_chars))
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "n_chars": n_chars,
            "n_braces": n_braces,
            "n_semicolons": n_semi,
            "n_indented": n_ind,
            "n_keywords": n_kw,
            "code_score": score,
            "is_code": is_code,
        })

    return docs.map_batches(f, batch_format="pyarrow")


def code_detect_sql(table: str = "documents",
                    text_expr: str = "text") -> str:
    """DuckDB oracle for :func:`code_detect`: identical RE2 pattern
    strings (DuckDB regexp is RE2 too, so keyword and indent counts
    are parity-by-construction), substring counts via the greedy
    length/replace trick, and the same integer decision rule."""
    t = f"({text_expr})"
    return f"""
        WITH c AS (
          SELECT doc_id,
                 CAST(length({t}) AS BIGINT) AS n_chars,
                 CAST((length({t}) - length(replace({t}, chr(123), '')))
                      + (length({t}) - length(replace({t}, chr(125), '')))
                      AS BIGINT) AS n_braces,
                 CAST(length({t}) - length(replace({t}, ';', ''))
                      AS BIGINT) AS n_semicolons,
                 CAST(len(regexp_extract_all({t},
                      '{_CODE_INDENT_PATTERN}')) AS BIGINT) AS n_indented,
                 CAST(len(regexp_extract_all({t},
                      '{_CODE_KW_PATTERN}')) AS BIGINT) AS n_keywords
          FROM {table})
        SELECT doc_id, n_chars, n_braces, n_semicolons, n_indented,
               n_keywords,
               (2*n_braces + 2*n_semicolons + n_indented + 3*n_keywords)
                 AS code_score,
               ((2*n_braces + 2*n_semicolons + n_indented + 3*n_keywords)
                  >= 3
                AND (2*n_braces + 2*n_semicolons + n_indented
                     + 3*n_keywords) * 100 >= n_chars) AS is_code
        FROM c
    """


# ---------------------------------------------------------------------------
# term-blocklist filtering — the C4-style wordlist safety gate
# ---------------------------------------------------------------------------

def term_blocklist_filter(docs: "ray.data.Dataset", terms: list[str]
                          ) -> "ray.data.Dataset":
    """(doc_id, n_blocked_hits, blocked) — flag documents containing
    any blocklisted term as a whole word, case-insensitive (the C4
    §2.2 wordlist gate: docs with any hit are dropped from the clean
    corpus; the list itself is corpus policy and supplied by the
    caller).  ``blocked = n_blocked_hits > 0``.

    Matching is one RE2 alternation ``\\b(?:t1|t2|...)\\b`` over the
    lowercased text — whole-word so innocuous superstrings never
    match.  Terms are regex-escaped; the lowercase fold is exact
    parity with SQL ``lower()`` (both simple codepoint folds).

    Scale shape: pure map, no shuffle; one vectorized RE2 count per
    batch.  A list too large for one alternation would shard into a
    handful of patterns and sum — RE2 compiles thousand-term
    alternations fine, so the single-pattern path covers real lists.
    """
    import re as _re
    norm = sorted({t.lower() for t in terms if t.strip()})
    if not norm:
        raise ValueError("terms must contain at least one term")
    pat = r"\b(?:%s)\b" % "|".join(_re.escape(t) for t in norm)

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        hits = pc.count_substring_regex(
            pc.utf8_lower(text), pat).cast(pa.int64())
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "n_blocked_hits": hits,
            "blocked": pc.greater(hits, pa.scalar(0, type=pa.int64())),
        })

    return docs.map_batches(f, batch_format="pyarrow")


def term_blocklist_filter_sql(terms: list[str], table: str = "documents",
                              text_expr: str = "text") -> str:
    """DuckDB oracle for :func:`term_blocklist_filter` (identical RE2
    alternation over ``lower()``)."""
    import re as _re
    norm = sorted({t.lower() for t in terms if t.strip()})
    pat = r"\b(?:%s)\b" % "|".join(_re.escape(t) for t in norm)
    pat_sql = pat.replace("'", "''")
    return f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(lower(({text_expr})),
                    '{pat_sql}')) AS BIGINT) AS n_blocked_hits,
               len(regexp_extract_all(lower(({text_expr})),
                    '{pat_sql}')) > 0 AS blocked
        FROM {table}
    """
