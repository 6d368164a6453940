"""Distributed global-rank bucketing (ntile) without a global sort.

The ccnet pipeline (Wenzek et al. 2020) splits a corpus into
head/middle/tail terciles by language-model perplexity; more generally
a curation run wants "assign every row its global n-quantile bucket"
— SQL's ``ntile(n) OVER (ORDER BY score, id)``.  A naive
implementation is a full sort of the corpus; this one is two streaming
passes plus one 24-byte-per-row shuffle:

1. **Value histogram** (one pass): scores are discrete (integer token
   counts, 4-decimal rounded log-probs), so per-batch ``(value,
   count)`` partials pkey-shuffle on ``hash(value)`` and the merged
   histogram — O(distinct values), never O(rows) — comes to the
   driver.  The cumulative histogram gives every distinct value its
   0-based global rank interval ``[start, start+count)`` and therefore
   its ntile bucket interval ``[bucket_lo, bucket_hi]``.
2. **Assign + resolve** (one pass + one shuffle): a map stage looks
   each row's value up with ``searchsorted`` against the broadcast
   histogram.  Values whose whole rank interval lands in one bucket
   (all but at most ``n - 1`` boundary values) get their bucket
   map-side; rows of boundary values are routed to one partition per
   boundary value, where an ``argsort`` over ids yields the exact
   within-value ranks that split the bucket boundary (ties order by
   id ascending, matching ``ORDER BY score [DESC], id``).

The scores dataset is consumed twice (histogram + assign); checkpoint
it first if upstream scoring is expensive.  The ntile fill rule
matches DuckDB/ANSI: with ``N = q*n + r``, the first ``r`` buckets
hold ``q + 1`` rows (probed against DuckDB 1.x).

Scale notes: the driver holds only the distinct-value histogram
(capped by ``hist_cap``); the shuffle moves (id, value, bucket, pkey)
only; a boundary value with massive ties concentrates in one partition
— acceptable because there are at most ``n - 1`` boundary values and
within-value work is one argsort.

Above ``hist_cap`` distinct values (continuous-ish scores at corpus
scale) the exact histogram no longer fits the driver and ``mode="auto"``
switches to **sample-based approximate boundaries**: a deterministic
hash-of-id sample of ~``sample_target`` rows comes to the driver, the
``n - 1`` ANSI cut values are read off the sorted sample, and one
map-only pass assigns ``bucket = 1 + searchsorted(cuts, value)`` — no
second shuffle at all.  By the DKW inequality the rank error of each
cut is ≤ ``N * sqrt(ln(2/δ) / (2m))`` with probability 1-δ (m = sample
size; ~0.16% of N at m = 1e6, δ = 1e-3), plus whatever mass sits tied
on a cut value (ties never split in sampled mode — they all take the
lower bucket).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from apollo_ray.hashing import mix_to_partition


def _ntile_of_ranks(k: np.ndarray, total: int, n: int) -> np.ndarray:
    """Vectorized ANSI ntile: bucket (1-based) of 0-based rank ``k``."""
    q, r = divmod(total, n)
    cut = r * (q + 1)
    b = np.empty(len(k), dtype=np.int64)
    lo = k < cut
    b[lo] = k[lo] // (q + 1)
    if q > 0:
        b[~lo] = r + (k[~lo] - cut) // q
    return b + 1


def ntile_buckets(scores: "ray.data.Dataset", n: int,
                  score_col: str, id_col: str = "doc_id",
                  descending: bool = False,
                  num_partitions: int = 16,
                  hist_cap: int = 5_000_000,
                  mode: str = "auto",
                  sample_target: int = 1_000_000,
                  sample_rate: float | None = None) -> "ray.data.Dataset":
    """(id, score, bucket) — ``bucket = ntile(n) OVER (ORDER BY score
    [DESC], id)`` over the whole dataset, via the histogram scheme
    described in the module docstring.  ``scores`` must expose exactly
    comparable discrete values in ``score_col`` (int, or floats that
    are exact quanta such as 4-dp-rounded log-probs).

    ``mode``: ``"exact"`` raises above ``hist_cap`` distinct values;
    ``"auto"`` (default) switches to :func:`_ntile_buckets_sampled`
    there (the driver never holds more than ``hist_cap`` histogram
    rows — the collect loop bails out early); ``"sample"`` forces the
    approximate path.  ``sample_rate`` pins the sampling probability
    (1.0 = boundaries from the full data, exact when values are
    distinct); default derives it from ``sample_target`` and a count
    pass."""
    if mode not in ("auto", "exact", "sample"):
        raise ValueError("unknown ntile mode %r" % mode)
    if mode == "sample":
        return _ntile_buckets_sampled(scores, n, score_col, id_col,
                                      descending, sample_target,
                                      sample_rate)

    def _vals(batch: pa.Table) -> np.ndarray:
        col = batch.column(score_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return col.to_numpy(zero_copy_only=False)

    score_type = None

    def hist_partial(batch: pa.Table) -> pa.Table:
        st = batch.schema.field(score_col).type
        empty = pa.table({"val": pa.array([], type=st),
                          "cnt": pa.array([], type=pa.int64()),
                          "pkey": pa.array([], type=pa.int32())})
        if batch.num_rows == 0:
            return empty
        uv, cnt = np.unique(_vals(batch), return_counts=True)
        bits = uv.view(np.int64) if uv.dtype == np.float64 \
            else uv.astype(np.int64)
        return pa.table({
            "val": pa.array(uv, type=st),
            "cnt": pa.array(cnt.astype(np.int64), type=pa.int64()),
            "pkey": pa.array(mix_to_partition(bits, num_partitions),
                             type=pa.int32()),
        })

    def hist_combine(group: pa.Table) -> pa.Table:
        st = group.schema.field("val").type
        if group.num_rows == 0:
            return pa.table({"val": pa.array([], type=st),
                             "cnt": pa.array([], type=pa.int64())})
        v = group.column("val").to_numpy(zero_copy_only=False)
        c = np.asarray(group.column("cnt"), dtype=np.int64)
        uv, inv = np.unique(v, return_inverse=True)
        tot = np.bincount(inv, weights=c, minlength=len(uv)).astype(np.int64)
        return pa.table({"val": pa.array(uv, type=st),
                         "cnt": pa.array(tot, type=pa.int64())})

    hist = scores.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby("pkey").map_groups(hist_combine, batch_format="pyarrow")

    vs, cs = [], []
    n_distinct = 0
    for b in hist.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            n_distinct += b.num_rows
            if n_distinct > hist_cap:
                # bail BEFORE the driver holds an over-cap histogram
                if mode == "exact":
                    raise NotImplementedError(
                        "distinct score values exceed hist_cap=%d; use "
                        "mode='auto'/'sample' (sample-based approximate "
                        "boundaries)" % hist_cap)
                return _ntile_buckets_sampled(scores, n, score_col,
                                              id_col, descending,
                                              sample_target, sample_rate)
            score_type = b.schema.field("val").type
            vs.append(b.column("val").to_numpy(zero_copy_only=False))
            cs.append(np.asarray(b.column("cnt"), dtype=np.int64))
    out_schema = pa.schema([
        pa.field(id_col, pa.int64()),
        pa.field(score_col, score_type or pa.int64()),
        pa.field("bucket", pa.int64())])
    if not vs:
        return ray.data.from_arrow(out_schema.empty_table())
    v = np.concatenate(vs)
    c = np.concatenate(cs)
    order = np.argsort(v, kind="stable")
    v, c = v[order], c[order]
    total = int(c.sum())
    cum = np.cumsum(c)
    if descending:
        # global 0-based rank of the first row of value v[i] under
        # (score DESC, id ASC) ordering = count of rows with value > v[i]
        start = total - cum
    else:
        start = cum - c
    b_lo = _ntile_of_ranks(start, total, n)
    b_hi = _ntile_of_ranks(start + c - 1, total, n)
    boundary_idx = np.flatnonzero(b_lo != b_hi)
    ref = ray.put((v, start, b_lo, b_hi, boundary_idx, total))

    def assign(batch: pa.Table, ref=ref) -> pa.Table:
        st = batch.schema.field(score_col).type
        empty = pa.table({
            id_col: pa.array([], type=pa.int64()),
            score_col: pa.array([], type=st),
            "bucket": pa.array([], type=pa.int64()),
            "pkey": pa.array([], type=pa.int32())})
        if batch.num_rows == 0:
            return empty
        vv, start_, lo_, hi_, bix, _tot = ray.get(ref)
        val = _vals(batch)
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        idx = np.searchsorted(vv, val)
        uniform = lo_[idx] == hi_[idx]
        bucket = np.where(uniform, lo_[idx], np.int64(-1))
        pkey = mix_to_partition(ids, num_partitions).astype(np.int32)
        if (~uniform).any():
            pkey = pkey.copy()
            pkey[~uniform] = num_partitions + np.searchsorted(
                bix, idx[~uniform]).astype(np.int32)
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            score_col: pa.array(val, type=st),
            "bucket": pa.array(bucket, type=pa.int64()),
            "pkey": pa.array(pkey, type=pa.int32()),
        })

    def resolve(group: pa.Table, ref=ref) -> pa.Table:
        st = group.schema.field(score_col).type if group.num_rows else \
            (score_type or pa.int64())
        if group.num_rows == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             score_col: pa.array([], type=st),
                             "bucket": pa.array([], type=pa.int64())})
        bucket = np.asarray(group.column("bucket"), dtype=np.int64)
        ids = np.asarray(group.column(id_col), dtype=np.int64)
        val = _vals(group)
        if bucket[0] >= 0:                      # uniform-value partition
            return group.drop_columns(["pkey"])
        # one boundary value per group: exact within-value ranks by id
        vv, start_, lo_, hi_, bix, tot = ray.get(ref)
        i = int(np.searchsorted(vv, val[:1])[0])
        order = np.argsort(ids, kind="stable")
        ranks = np.empty(len(ids), dtype=np.int64)
        ranks[order] = start_[i] + np.arange(len(ids), dtype=np.int64)
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            score_col: pa.array(val, type=st),
            "bucket": pa.array(
                _ntile_of_ranks(ranks, tot, n), type=pa.int64()),
        })

    return scores.map_batches(assign, batch_format="pyarrow") \
        .groupby("pkey").map_groups(resolve, batch_format="pyarrow")


def _ntile_buckets_sampled(scores: "ray.data.Dataset", n: int,
                           score_col: str, id_col: str,
                           descending: bool,
                           sample_target: int = 1_000_000,
                           sample_rate: float | None = None
                           ) -> "ray.data.Dataset":
    """Approximate global ntile via sampled boundaries (the above-
    ``hist_cap`` scale path; error bound in the module docstring).

    Deterministic: a row joins the sample iff ``splitmix64(id)`` falls
    under the rate threshold, so reruns bucket identically.  The cut
    ranks follow the ANSI fill rule on the sample, so at
    ``sample_rate=1.0`` with all-distinct values the result equals the
    exact mode (pinned by tests); tied cut values all take the lower
    bucket."""
    from apollo_ray.hashing import splitmix64

    if sample_rate is None:
        total = scores.count()
        sample_rate = 1.0 if total <= sample_target else \
            sample_target / total
    rate = min(1.0, max(float(sample_rate), 0.0))
    thr = np.uint64(min(2**64 - 1, int(rate * float(2**64))))

    def _vals(batch: pa.Table) -> np.ndarray:
        col = batch.column(score_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return col.to_numpy(zero_copy_only=False)

    def sample(batch: pa.Table) -> pa.Table:
        st = batch.schema.field(score_col).type
        if batch.num_rows == 0:
            return pa.table({"val": pa.array([], type=st)})
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        keep = splitmix64(ids.astype(np.uint64)) <= thr
        return pa.table({"val": pa.array(_vals(batch)[keep], type=st)})

    parts = []
    score_type = None
    for b in scores.map_batches(sample, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            score_type = b.schema.field("val").type
            parts.append(b.column("val").to_numpy(zero_copy_only=False))
    out_schema = pa.schema([
        pa.field(id_col, pa.int64()),
        pa.field(score_col, score_type or pa.int64()),
        pa.field("bucket", pa.int64())])
    if not parts:
        return ray.data.from_arrow(out_schema.empty_table())
    s = np.sort(np.concatenate(parts))
    if descending:
        s = s[::-1]
    m = len(s)
    q, r = divmod(m, n)
    # ANSI fill on the sample: bucket j (1-based) ends at cumulative
    # rank j*q + min(j, r); its last sample value is the cut
    ends = np.minimum((np.arange(1, n, dtype=np.int64) * q
                       + np.minimum(np.arange(1, n), r)), m) - 1
    cuts = s[np.maximum(ends, 0)]
    cuts_ref = ray.put(cuts)

    def assign(batch: pa.Table, ref=cuts_ref) -> pa.Table:
        st = batch.schema.field(score_col).type
        if batch.num_rows == 0:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                score_col: pa.array([], type=st),
                "bucket": pa.array([], type=pa.int64())})
        cv = ray.get(ref)
        val = _vals(batch)
        key = val
        if descending:
            # cuts are descending; bucket = 1 + count of cuts STRICTLY
            # above the value (a value equal to bucket j's cut stays
            # in bucket j)
            bucket = len(cv) - np.searchsorted(cv[::-1], key,
                                               side="right") + 1
        else:
            bucket = np.searchsorted(cv, key, side="left") + 1
        return pa.table({
            id_col: batch.column(id_col).cast(pa.int64()),
            score_col: pa.array(val, type=st),
            "bucket": pa.array(bucket.astype(np.int64), type=pa.int64()),
        })

    return scores.map_batches(assign, batch_format="pyarrow")


_TIERS = {1: "head", 2: "middle", 3: "tail"}


def ppl_buckets(docs: "ray.data.Dataset", n: int = 3,
                vocab_cap: int | None = None,
                num_partitions: int = 16) -> "ray.data.Dataset":
    """ccnet-style head/middle/tail split: (doc_id, avg_lp_r4, bucket,
    tier) with ``bucket = ntile(n) OVER (ORDER BY avg_lp_r4 DESC,
    doc_id)`` — highest mean unigram log-probability (lowest
    pseudo-perplexity) lands in bucket 1 = ``head``."""
    from apollo_ray.functions.lm import unigram_score

    scores = unigram_score(docs, vocab_cap=vocab_cap) \
        .select_columns(["doc_id", "avg_lp_r4"])
    out = ntile_buckets(scores, n, score_col="avg_lp_r4",
                        id_col="doc_id", descending=True,
                        num_partitions=num_partitions)

    def label(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(
                "tier", pa.array([], type=pa.string()))
        b = np.asarray(batch.column("bucket"), dtype=np.int64)
        tier = np.where(b == 1, "head",
                        np.where(b == n, "tail", "middle"))
        return batch.append_column(
            "tier", pa.array(tier.tolist(), type=pa.string()))

    return out.map_batches(label, batch_format="pyarrow")


def ppl_buckets_sql(n: int = 3, vocab_cap: int | None = None) -> str:
    """DuckDB oracle for :func:`ppl_buckets` (nests the unigram_score
    oracle as a subquery; ntile fill rule probed against DuckDB)."""
    from apollo_ray.functions.lm import unigram_score_sql
    return f"""
    WITH u AS (SELECT * FROM ({unigram_score_sql(vocab_cap)})),
    b AS (SELECT doc_id, avg_lp_r4,
                 CAST(ntile({n}) OVER (ORDER BY avg_lp_r4 DESC, doc_id)
                      AS BIGINT) AS bucket
          FROM u)
    SELECT doc_id, avg_lp_r4, bucket,
           CASE WHEN bucket = 1 THEN 'head'
                WHEN bucket = {n} THEN 'tail'
                ELSE 'middle' END AS tier
    FROM b
"""


def token_ntile_buckets(docs: "ray.data.Dataset", n: int = 10,
                        num_partitions: int = 16) -> "ray.data.Dataset":
    """(doc_id, n_tokens, bucket) — global length-decile assignment
    (``ntile(n) OVER (ORDER BY n_tokens, doc_id)``), the
    integer-score exercise of the rank primitive."""
    from apollo_ray.functions.textstats import token_counts

    scores = token_counts(docs)
    return ntile_buckets(scores, n, score_col="n_tokens",
                         id_col="doc_id", num_partitions=num_partitions)


def token_ntile_buckets_sql(n: int = 10) -> str:
    return rf"""
    WITH t AS (SELECT doc_id,
            CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\s+'))
            END AS n_tokens
          FROM documents)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(ntile({n}) OVER (ORDER BY n_tokens, doc_id) AS BIGINT)
               AS bucket
    FROM t
"""
