"""DSIR-style importance weights — Data Selection via Importance
Resampling (Xie et al. 2023): score every raw-corpus document by
``log p_target(x) - log p_raw(x)`` under two hashed-n-gram bag-of-words
models, where the target model is trained on a small high-quality set
and the raw model on the whole corpus.  Training pipelines resample
the corpus proportionally to these weights to shift it toward the
target distribution; the weight column is the operator output here
(resampling itself is :mod:`apollo_ray.functions.sampling`).

Features are the paper's hashed n-grams: every unigram and every
within-document adjacent bigram, hashed into ``n_buckets`` fixed
buckets (md5, DuckDB ``md5_number_lower`` semantics, so the bucketing
is SQL-reproducible).  Both models use add-0.5 smoothing over the
bucket space.

Scale shape (100 TB): the model is O(n_buckets) by construction —
that is the point of feature hashing — so pass 1 is one map over the
corpus emitting at most ``n_buckets`` partial rows per batch (bucket,
c_raw, c_target), one pkey groupby, and a driver-side table of
``n_buckets`` rows broadcast back as a single int64 array.  Pass 2 is
map-only: per batch, md5 only the batch-DISTINCT tokens/pairs
(dictionary-encode), gather the per-bucket weight delta, segment-sum
per document.  No shuffle touches document text.

Determinism: per-bucket log10 probabilities are rounded to 6 decimals
and snapped to integer micro-units (the ``_avg_lp_r4_exact``
precedent, :mod:`apollo_ray.functions.lm`); the per-doc weight is an
exact int64 sum of those micro-units, so the DuckDB oracle matches
bit-for-bit with no float-sum surface at all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from apollo_ray.functions.textstats import _split_tokens
from apollo_ray.hashing import mix_to_partition
from apollo_ray.kernels.text import _md5_u64

_PAIR_SEP = "\x01"


def _batch_occurrence_buckets(batch: pa.Table, n_buckets: int
                              ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per batch: (doc_row_idx, bucket) for every unigram AND adjacent
    bigram occurrence, plus the per-row token count.  md5 runs once
    per batch-distinct token / pair."""
    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = _split_tokens(text)
    flat = toks.flatten()
    n_tok = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    if len(flat) == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64),
                n_tok)
    doc_idx = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_tok)
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_dict = len(enc.dictionary)
    d = enc.dictionary.to_pylist()
    m = np.uint64(n_buckets)
    tok_bucket = np.fromiter(
        (_md5_u64(t) for t in d), dtype=np.uint64, count=n_dict)
    tok_bucket = (tok_bucket % m).astype(np.int64)
    uni_docs, uni_buckets = doc_idx, tok_bucket[codes]
    cont = np.zeros(len(codes), dtype=bool)
    cont[1:] = doc_idx[1:] == doc_idx[:-1]
    if cont.any():
        pair = codes[np.flatnonzero(cont) - 1] * n_dict + codes[cont]
        up, inv = np.unique(pair, return_inverse=True)
        pair_bucket = np.fromiter(
            (_md5_u64(d[c // n_dict] + _PAIR_SEP + d[c % n_dict])
             for c in up), dtype=np.uint64, count=len(up))
        pair_bucket = (pair_bucket % m).astype(np.int64)
        docs_all = np.concatenate([uni_docs, doc_idx[cont]])
        buckets_all = np.concatenate([uni_buckets, pair_bucket[inv]])
    else:
        docs_all, buckets_all = uni_docs, uni_buckets
    return docs_all, buckets_all, n_tok


def _feature_counts(docs: "ray.data.Dataset", n_buckets: int,
                    target_mod: int, num_partitions: int
                    ) -> "ray.data.Dataset":
    """(bucket, c_raw, c_tgt) totals over the corpus; the target side
    counts only docs with ``doc_id % target_mod == 0``."""
    empty = pa.table({"bucket": pa.array([], type=pa.int64()),
                      "c_raw": pa.array([], type=pa.int64()),
                      "c_tgt": pa.array([], type=pa.int64()),
                      "pkey": pa.array([], type=pa.int32())})

    def partial(batch: pa.Table) -> pa.Table:
        docs_i, buckets, _ = _batch_occurrence_buckets(batch, n_buckets)
        if len(buckets) == 0:
            return empty
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        is_tgt = (ids % target_mod == 0)[docs_i]
        c_raw = np.bincount(buckets, minlength=n_buckets)
        c_tgt = np.bincount(buckets[is_tgt], minlength=n_buckets)
        nz = np.flatnonzero(c_raw)
        return pa.table({
            "bucket": pa.array(nz, type=pa.int64()),
            "c_raw": pa.array(c_raw[nz], type=pa.int64()),
            "c_tgt": pa.array(c_tgt[nz], type=pa.int64()),
            "pkey": pa.array(mix_to_partition(nz, num_partitions),
                             type=pa.int32()),
        })

    def sum_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty.drop_columns(["pkey"])
        b = np.asarray(group.column("bucket"), dtype=np.int64)
        ub, inv = np.unique(b, return_inverse=True)
        cr = np.bincount(inv, weights=np.asarray(group.column("c_raw"),
                                                 dtype=np.int64))
        ct = np.bincount(inv, weights=np.asarray(group.column("c_tgt"),
                                                 dtype=np.int64))
        return pa.table({
            "bucket": pa.array(ub, type=pa.int64()),
            "c_raw": pa.array(cr.astype(np.int64), type=pa.int64()),
            "c_tgt": pa.array(ct.astype(np.int64), type=pa.int64()),
        })

    return docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("pkey").map_groups(sum_part, batch_format="pyarrow")


def dsir_logweights(docs: "ray.data.Dataset", n_buckets: int = 16384,
                    target_mod: int = 97, num_partitions: int = 64
                    ) -> "ray.data.Dataset":
    """(doc_id, n_feats, logw_micro) per non-empty document:
    occurrence-feature count (unigrams + adjacent bigrams) and the
    DSIR importance log-weight in integer micro-units of log10
    (positive = more target-like).  ``logw_micro`` is an exact int64:
    divide by 1e6 for the float weight.  Documents with no tokens are
    dropped (nothing to score — the :func:`lm.unigram_score`
    contract)."""
    cnt_rows = _feature_counts(docs, n_buckets, target_mod,
                               num_partitions).take_all()
    # per-bucket micro-unit delta; buckets never seen anywhere get the
    # smoothing-floor delta on both sides
    c_raw = np.zeros(n_buckets, dtype=np.int64)
    c_tgt = np.zeros(n_buckets, dtype=np.int64)
    for r in cnt_rows:
        c_raw[r["bucket"]] = r["c_raw"]
        c_tgt[r["bucket"]] = r["c_tgt"]
    t_raw, t_tgt = int(c_raw.sum()), int(c_tgt.sum())
    half_b = n_buckets * 0.5
    lp_t = np.round(np.log10((c_tgt + 0.5) / (t_tgt + half_b)), 6)
    lp_r = np.round(np.log10((c_raw + 0.5) / (t_raw + half_b)), 6)
    delta = (np.rint(lp_t * 1e6) - np.rint(lp_r * 1e6)).astype(np.int64)
    delta_ref = ray.put(delta)

    def score(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "n_feats": pa.array([], type=pa.int64()),
                          "logw_micro": pa.array([], type=pa.int64())})
        if batch.num_rows == 0:
            return empty
        dm = ray.get(delta_ref)
        docs_i, buckets, n_tok = _batch_occurrence_buckets(batch, n_buckets)
        if len(buckets) == 0:
            return empty
        n_rows = batch.num_rows
        n_feats = np.bincount(docs_i, minlength=n_rows).astype(np.int64)
        logw = np.bincount(docs_i, weights=dm[buckets],
                           minlength=n_rows).astype(np.int64)
        keep = n_tok > 0
        ids = np.asarray(batch.column("doc_id").cast(pa.int64()))
        return pa.table({
            "doc_id": pa.array(ids[keep], type=pa.int64()),
            "n_feats": pa.array(n_feats[keep], type=pa.int64()),
            "logw_micro": pa.array(logw[keep], type=pa.int64()),
        })

    return docs.map_batches(score, batch_format="pyarrow")


def dsir_logweights_sql(n_buckets: int = 16384, target_mod: int = 97) -> str:
    """DuckDB oracle for :func:`dsir_logweights`: identical hashed
    features (md5_number_lower % n_buckets over unigrams and
    chr(1)-joined bigrams), identical add-0.5 smoothing, 6-decimal
    rounding and micro-unit snapping, exact integer sum."""
    return rf"""
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS t,
             unnest(range(len(regexp_split_to_array(trim(text), '\s+'))))
                 AS idx
      FROM documents WHERE length(trim(text)) > 0),
    feat AS (
      SELECT doc_id, CAST(md5_number_lower(t) % {n_buckets} AS BIGINT) AS b
      FROM tok
      UNION ALL
      SELECT a.doc_id,
             CAST(md5_number_lower(a.t || chr(1) || c.t) % {n_buckets}
                  AS BIGINT) AS b
      FROM tok a JOIN tok c
        ON a.doc_id = c.doc_id AND c.idx = a.idx + 1),
    cnt AS (
      SELECT b, CAST(count(*) AS BIGINT) AS c_raw,
             CAST(sum(CASE WHEN doc_id % {target_mod} = 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS c_tgt
      FROM feat GROUP BY b),
    tot AS (SELECT CAST(sum(c_raw) AS BIGINT) AS tr,
                   CAST(sum(c_tgt) AS BIGINT) AS tt FROM cnt),
    lp AS (
      SELECT b,
             CAST(round(round(log10((c_tgt + 0.5)
                  / ((SELECT tt FROM tot) + {n_buckets} * 0.5)), 6)
                  * 1000000) AS BIGINT)
           - CAST(round(round(log10((c_raw + 0.5)
                  / ((SELECT tr FROM tot) + {n_buckets} * 0.5)), 6)
                  * 1000000) AS BIGINT) AS dmicro
      FROM cnt)
    SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
           CAST(sum(lp.dmicro) AS BIGINT) AS logw_micro
    FROM feat f JOIN lp USING (b)
    GROUP BY f.doc_id
"""
