"""Text-analysis operators over a ``documents``-shaped table
(doc_id, text, lang, ...) — the training-data-pipeline extras:
token counting, docfreq, quality scoring, language-ID, fingerprints.

All per-doc outputs use integer numerators (counts, summed lengths)
rather than precomputed ratios so the DuckDB oracle comparison is
exact (no float rounding surface).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Sum

from apollo_ray.hashing import TokenHasher
from apollo_ray.kernels.text import (_STOPWORDS, detect_lang_batch,
                                     fingerprint)

_PUNCT = ".,;:!?"


def _split_tokens(text_col: pa.Array) -> pa.Array:
    """Arrow-kernel whitespace split matching Python ``str.split``:
    ``utf8_split_whitespace`` keeps empty strings at boundaries /
    repeated whitespace, so drop empty tokens from each list."""
    toks = pc.utf8_split_whitespace(text_col)
    flat = toks.flatten()
    keep = pc.greater(pc.utf8_length(flat), 0)
    # rebuild list offsets over the non-empty tokens
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    starts = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=starts[1:])
    keep_np = keep.to_numpy(zero_copy_only=False)
    kept_per_list = np.add.reduceat(
        np.append(keep_np, 0), starts[:-1])[:len(lengths)] \
        if len(flat) else np.zeros(len(lengths), dtype=np.int64)
    kept_per_list[lengths == 0] = 0
    new_off = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(kept_per_list, out=new_off[1:])
    return pa.ListArray.from_arrays(
        pa.array(new_off, type=pa.int32()),
        flat.filter(keep))


def token_counts(docs: "ray.data.Dataset",
                 mode: str = "whitespace") -> "ray.data.Dataset":
    """(doc_id, n_tokens) — token counting (M3 analog), fully
    Arrow-vectorized (no per-row Python).

    ``whitespace``: split on whitespace runs.  ``bpe_ish``: the ASCII
    BPE-style pre-tokenizer (``kernels/text.BPE_ISH_PATTERN``), counted
    with one RE2 ``count_substring_regex`` pass per batch — a
    subword-ish budget estimate that DuckDB reproduces exactly via
    ``regexp_extract_all``."""
    from apollo_ray.kernels.text import BPE_ISH_PATTERN

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        if mode == "bpe_ish":
            n = pc.count_substring_regex(text, BPE_ISH_PATTERN).cast(pa.int64())
        else:
            n = pc.list_value_length(_split_tokens(text)).cast(pa.int64())
        return pa.table({"doc_id": batch.column("doc_id").cast(pa.int64()),
                         "n_tokens": n})
    return docs.map_batches(f, batch_format="pyarrow")


def quality_stats_table(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, n_tokens, n_chars, sum_token_len, n_stopwords, n_punct)
    — integer quality-score numerators (C4/Gopher-style filters).

    Vectorized: one Arrow whitespace split per batch; per-doc sums are
    ``np.add.reduceat`` over the flattened token array (segment sums by
    list offsets) — no Python loop over rows or tokens.
    """
    stop_arr = pa.array(sorted(_STOPWORDS), type=pa.string())

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = _split_tokens(text)
        flat = toks.flatten()
        n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        offsets = np.zeros(len(n_tok) + 1, dtype=np.int64)
        np.cumsum(n_tok, out=offsets[1:])

        def seg_sum(values: np.ndarray) -> np.ndarray:
            if len(values) == 0:
                return np.zeros(len(n_tok), dtype=np.int64)
            out = np.add.reduceat(np.append(values, 0), offsets[:-1])
            out = out[:len(n_tok)]
            out[n_tok == 0] = 0
            return out.astype(np.int64)

        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        is_stop = pc.is_in(pc.utf8_lower(flat), value_set=stop_arr) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n_punct = np.zeros(len(n_tok), dtype=np.int64)
        for c in _PUNCT:
            n_punct += pc.count_substring(text, c) \
                .to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "n_tokens": pa.array(n_tok, type=pa.int64()),
            "n_chars": pc.utf8_length(text).cast(pa.int64()),
            "sum_token_len": pa.array(seg_sum(tok_len), type=pa.int64()),
            "n_stopwords": pa.array(seg_sum(is_stop), type=pa.int64()),
            "n_punct": pa.array(n_punct, type=pa.int64()),
        })
    return docs.map_batches(f, batch_format="pyarrow")


def repetition_stats(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Gopher-style within-document repetition signals (Rae et al.
    2021 §A1.1: duplicate-line and duplicate-n-gram filters), as exact
    integer numerators per doc:

    (doc_id, n_lines, n_dup_lines, dup_line_chars, line_chars,
     n_2grams, n_dup_2grams, n_3grams, n_dup_3grams)

    - lines: ``text.split("\\n")`` (empties kept, matching DuckDB
      ``string_split``); ``n_dup_lines`` = occurrences beyond the
      first of each distinct line; ``dup_line_chars`` = chars in ALL
      occurrences of lines appearing >= 2 times.
    - n-grams: whitespace-token k-grams; dup = occurrences beyond the
      first of each distinct k-gram.

    Callers derive the Gopher ratios (dup_line_frac etc.) from the
    numerators; keeping integers makes the oracle comparison exact.
    Fully vectorized: Arrow split + dictionary-encode, then one
    np.lexsort per batch — token identity via dictionary codes is
    exact (no hashing), so distinct counts equal string-distinct
    counts.  Map-only (streams; no shuffle)."""

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        nums = repetition_numerators(text)
        out = {"doc_id": batch.column("doc_id").cast(pa.int64())}
        out.update({k: pa.array(v, type=pa.int64())
                    for k, v in nums.items() if k != "n_tokens"})
        return pa.table(out)

    return docs.map_batches(f, batch_format="pyarrow")


def _seg_stats(dv: np.ndarray, cols: list[np.ndarray], n: int,
               weights: np.ndarray | None = None):
    """Per-doc (total, distinct[, dup_weight]) over rows keyed by
    ``(dv, *cols)``: one lexsort + segment-boundary flags."""
    total = np.bincount(dv, minlength=n).astype(np.int64)
    if len(dv) == 0:
        z = np.zeros(n, dtype=np.int64)
        return total, z, z
    order = np.lexsort(tuple(reversed(cols)) + (dv,))
    d_s = dv[order]
    first = np.empty(len(d_s), dtype=bool)
    first[0] = True
    first[1:] = d_s[1:] != d_s[:-1]
    for c in cols:
        c_s = c[order]
        first[1:] |= c_s[1:] != c_s[:-1]
    distinct = np.bincount(d_s[first], minlength=n).astype(np.int64)
    dup_w = np.zeros(n, dtype=np.int64)
    if weights is not None:
        gid = np.cumsum(first) - 1
        gcnt = np.bincount(gid)
        w_s = weights[order]
        dup_occ = gcnt[gid] >= 2
        dup_w = np.bincount(d_s, weights=np.where(dup_occ, w_s, 0),
                            minlength=n).astype(np.int64)
    return total, distinct, dup_w


def repetition_numerators(text) -> dict[str, np.ndarray]:
    """The :func:`repetition_stats` numerators for one batch's text
    column, as int64 arrays — shared by the stats operator and the
    curation filter."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = len(text)
    # --- lines ---
    lines = pc.split_pattern(text, pattern="\n")
    ll = pc.list_value_length(lines).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = lines.flatten()
    codes = np.asarray(flat.dictionary_encode().indices, dtype=np.int64)
    linelen = pc.utf8_length(flat).to_numpy(
        zero_copy_only=False).astype(np.int64)
    docv = np.repeat(np.arange(n, dtype=np.int64), ll)
    n_lines, dist_lines, dup_chars = _seg_stats(
        docv, [codes], n, weights=linelen)
    line_chars = np.bincount(docv, weights=linelen,
                             minlength=n).astype(np.int64)
    # --- token n-grams ---
    toks = _split_tokens(text)
    tl = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    tflat = toks.flatten()
    tcodes = np.asarray(tflat.dictionary_encode().indices, dtype=np.int64)
    tdoc = np.repeat(np.arange(n, dtype=np.int64), tl)
    out = {"n_lines": n_lines,
           "n_dup_lines": n_lines - dist_lines,
           "dup_line_chars": dup_chars,
           "line_chars": line_chars}
    for k in (2, 3):
        if len(tcodes) >= k:
            valid = tdoc[:len(tdoc) - k + 1] == tdoc[k - 1:]
            d_k = tdoc[:len(tdoc) - k + 1][valid]
            cols = [tcodes[t:len(tcodes) - k + 1 + t][valid]
                    for t in range(k)]
        else:
            d_k, cols = np.empty(0, dtype=np.int64), \
                [np.empty(0, dtype=np.int64)] * k
        tot, dist, _ = _seg_stats(d_k, cols, n)
        out["n_%dgrams" % k] = tot
        out["n_dup_%dgrams" % k] = tot - dist
    out["n_tokens"] = np.bincount(tdoc, minlength=n).astype(np.int64)
    return out


def docfreq(docs: "ray.data.Dataset", min_df: int = 1) -> "ray.data.Dataset":
    """(token, df) — document frequency (A1, the
    ``OrderedDocumentFrequencies`` analog, ``apollo/hasher.py:116-117``),
    with the ``--min-docfreq`` filter (M5, ``doc/cmd/bags.md:12``).

    Per-doc-unique tokens are exploded inside map_batches (map-side
    dedup), then one groupby-count shuffle over (token) rows.
    """
    from apollo_ray.hashing import hash_utf8, mix_to_partition

    def explode_unique(batch: pa.Table) -> pa.Table:
        """Vectorized per-doc token dedup: Arrow split +
        dictionary-encode, (doc, code) pairs deduped with one
        ``np.unique``; the only Python loop is hashing each DISTINCT
        token of the batch once (for the partition key)."""
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = _split_tokens(text)
        flat = toks.flatten()
        if len(flat) == 0:
            return pa.table({"token": pa.array([], type=pa.string()),
                             "pkey": pa.array([], type=pa.int32())})
        n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        doc_idx = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_tok)
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_dict = len(enc.dictionary)
        uniq = np.unique(doc_idx * n_dict + codes)
        u_codes = uniq % n_dict
        dict_hash = np.fromiter(
            (hash_utf8(t) for t in enc.dictionary.to_pylist()),
            dtype=np.int64, count=n_dict)
        pkey = mix_to_partition(dict_hash[u_codes], 64)
        return pa.table({
            "token": enc.dictionary.take(pa.array(u_codes)),
            "pkey": pa.array(pkey, type=pa.int32()),
        })

    # vectorized per-partition counting (pyarrow value_counts) instead
    # of Ray's per-group aggregate — token cardinality is unbounded
    def count_part(group: pa.Table) -> pa.Table:
        vc = group.column("token").combine_chunks().value_counts()
        tok = vc.field("values")
        cnt = vc.field("counts").cast(pa.int64())
        out = pa.table({"token": tok, "df": cnt})
        if min_df > 1:
            out = out.filter(pc.greater_equal(out.column("df"), min_df))
        return out

    return docs.map_batches(explode_unique, batch_format="pyarrow") \
        .groupby("pkey").map_groups(count_part, batch_format="pyarrow")


class LangIdScorer:
    """Actor-pool stage: language-ID + fingerprint per doc.

    The model-loading pattern (ST2-style): state built once per actor in
    ``__init__`` — here a TokenHasher memo + the marker tables; a real
    fasttext-style model would load the same way.
    """

    def __init__(self, seed: int = 42):
        self.hasher = TokenHasher(seed=seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts_col = batch.column("text").combine_chunks()
        langs = detect_lang_batch(texts_col)
        fps = [fingerprint(t, self.hasher) for t in texts_col.to_pylist()]
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "lang_pred": pa.array(langs, type=pa.string()),
            "fingerprint": pa.array(fps, type=pa.int64()),
        })


def lang_id(docs: "ray.data.Dataset", concurrency: int = 4) -> "ray.data.Dataset":
    return docs.map_batches(LangIdScorer, batch_format="pyarrow",
                            concurrency=(1, concurrency))


def lang_stats(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(lang, n_docs, sum_chars) grouped stats (M1 analog)."""
    return docs.groupby("lang").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars"))


def user_last_event(events: "ray.data.Dataset") -> "ray.data.Dataset":
    """(user_id, last_ts_us, n_events) — the latest-per-key pattern
    (M2, the ``--dzhigurda`` history filter analog)."""
    def to_us(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64())
        return pa.table({"user_id": batch.column("user_id").cast(pa.int64()),
                         "ts_us": ts})
    return events.map_batches(to_us, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Max("ts_us", alias_name="last_ts_us"),
                                      Count(alias_name="n_events"))


def events_hourly(events: "ray.data.Dataset") -> "ray.data.Dataset":
    """(user_id, hour_us, n, sum_value_r4) — tumbling-window aggregate
    (the streaming-window analog over an ordered log; SURVEY §2.9)."""
    def bucket(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch.column("ts").cast(pa.int64()))
        hour = (ts // 3_600_000_000) * 3_600_000_000
        return pa.table({
            "user_id": batch.column("user_id").cast(pa.int64()),
            "hour_us": pa.array(hour, type=pa.int64()),
            "value": batch.column("value"),
        })

    from apollo_ray.hashing import mix_to_partition, pair_mix

    def add_pkey(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch.column("user_id"), dtype=np.int64)
        h = np.asarray(batch.column("hour_us"), dtype=np.int64)
        key = pair_mix(u, h).astype(np.int64) >> 1
        return batch.append_column(
            "pkey", pa.array(mix_to_partition(key, 64), type=pa.int32()))

    # vectorized per-partition (count, sum) — group cardinality is
    # user x hour, unbounded, so Ray's per-group aggregate is out
    def reduce_part(group: pa.Table) -> pa.Table:
        u = np.asarray(group.column("user_id"), dtype=np.int64)
        h = np.asarray(group.column("hour_us"), dtype=np.int64)
        val = np.asarray(group.column("value"), dtype=np.float64)
        if len(u) == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "hour_us": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "sum_value_r4": pa.array([], type=pa.float64())})
        order = np.lexsort((h, u))
        u_s, h_s, v_s = u[order], h[order], val[order]
        first = np.empty(len(u_s), dtype=bool)
        first[0] = True
        first[1:] = (u_s[1:] != u_s[:-1]) | (h_s[1:] != h_s[:-1])
        seg_id = np.cumsum(first) - 1
        n_seg = seg_id[-1] + 1
        counts = np.bincount(seg_id, minlength=n_seg)
        sums = np.zeros(n_seg, dtype=np.float64)
        np.add.at(sums, seg_id, v_s)
        return pa.table({
            "user_id": pa.array(u_s[first], type=pa.int64()),
            "hour_us": pa.array(h_s[first], type=pa.int64()),
            "n": pa.array(counts, type=pa.int64()),
            "sum_value_r4": pa.array(np.round(sums, 4), type=pa.float64()),
        })

    return events.map_batches(bucket, batch_format="pyarrow") \
        .map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(reduce_part, batch_format="pyarrow")


def user_sessions(events: "ray.data.Dataset", gap_sec: int = 1800,
                  num_partitions: int = 64) -> "ray.data.Dataset":
    """(user_id, n_sessions, n_events) — session counting with an
    inactivity gap (the streaming-shaped windowing pattern over a keyed
    log; SURVEY §2.9).

    Vectorized pkey pattern (same shape as ``events_hourly``): one
    shuffle on ``hash(user_id) % P``, then per partition a single
    lexsort + segment-cut — session breaks are within-user consecutive
    gaps > ``gap_sec``, counted per user with one ``np.bincount``.  No
    per-user Python call at unbounded key cardinality.
    """
    from apollo_ray.hashing import mix_to_partition

    def to_cols(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").cast(pa.int64())
        pkey = mix_to_partition(np.asarray(u), num_partitions)
        return pa.table({"user_id": u,
                         "ts_us": batch.column("ts").cast(pa.int64()),
                         "pkey": pa.array(pkey, type=pa.int32())})

    def reduce_part(group: pa.Table) -> pa.Table:
        u = np.asarray(group.column("user_id"), dtype=np.int64)
        ts = np.asarray(group.column("ts_us"), dtype=np.int64)
        if len(u) == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "n_sessions": pa.array([], type=pa.int64()),
                             "n_events": pa.array([], type=pa.int64())})
        order = np.lexsort((ts, u))
        u_s, t_s = u[order], ts[order]
        first = np.empty(len(u_s), dtype=bool)
        first[0] = True
        first[1:] = u_s[1:] != u_s[:-1]
        seg_id = np.cumsum(first) - 1
        n_seg = seg_id[-1] + 1
        counts = np.bincount(seg_id, minlength=n_seg)
        brk = np.zeros(len(u_s), dtype=np.int64)
        brk[1:] = ((~first[1:]) &
                   (t_s[1:] - t_s[:-1] > gap_sec * 1_000_000))
        n_breaks = np.bincount(seg_id, weights=brk,
                               minlength=n_seg).astype(np.int64)
        return pa.table({
            "user_id": pa.array(u_s[first], type=pa.int64()),
            "n_sessions": pa.array(1 + n_breaks, type=pa.int64()),
            "n_events": pa.array(counts, type=pa.int64()),
        })

    return events.map_batches(to_cols, batch_format="pyarrow") \
        .groupby("pkey").map_groups(reduce_part, batch_format="pyarrow")


def corpus_stats(docs: "ray.data.Dataset", num_partitions: int = 16
                 ) -> "ray.data.Dataset":
    """Per-(source, lang) corpus rollup:
    ``(source, lang, n_docs, n_unique_texts, sum_chars, sum_tokens)``
    — the summary report a curation run ends with (what went in, how
    much of it is distinct, the token budget per slice).

    One map pass computes per-row (group hash, text hash, token count)
    with Arrow kernels; one pkey shuffle on the group hash; the
    per-partition reduce is a vectorized segment rollup with distinct
    texts counted via ``np.unique`` over (group, text_hash) pairs —
    group cardinality is #sources x #langs (small), but the pattern
    stays safe if it is not.  Distinct texts use the engine's 63-bit
    content hash (collision odds negligible below ~10^9 texts; the
    SQL oracle counts DISTINCT raw text)."""
    from apollo_ray.hashing import hash_utf8, mix_to_partition

    def tag(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_tok = pc.list_value_length(_split_tokens(text)).cast(pa.int64())
        src = batch.column("source").to_pylist()
        lang = batch.column("lang").to_pylist()
        gh = np.fromiter(
            (hash_utf8("%s\x00%s" % (s, l)) for s, l in zip(src, lang)),
            dtype=np.int64, count=len(src))
        th = np.fromiter((hash_utf8(t) for t in text.to_pylist()),
                         dtype=np.int64, count=len(src))
        return pa.table({
            "source": batch.column("source"),
            "lang": batch.column("lang"),
            "gh": pa.array(gh, type=pa.int64()),
            "th": pa.array(th, type=pa.int64()),
            "n_chars": batch.column("n_chars").cast(pa.int64()),
            "n_tokens": n_tok,
            "pkey": pa.array(mix_to_partition(gh, num_partitions),
                             type=pa.int32()),
        })

    def reduce_part(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "source": pa.array([], type=pa.string()),
            "lang": pa.array([], type=pa.string()),
            "n_docs": pa.array([], type=pa.int64()),
            "n_unique_texts": pa.array([], type=pa.int64()),
            "sum_chars": pa.array([], type=pa.int64()),
            "sum_tokens": pa.array([], type=pa.int64())})
        if group.num_rows == 0:
            return empty
        gh = np.asarray(group.column("gh"), dtype=np.int64)
        th = np.asarray(group.column("th"), dtype=np.int64)
        nc = np.asarray(group.column("n_chars"), dtype=np.int64)
        nt = np.asarray(group.column("n_tokens"), dtype=np.int64)
        order = np.argsort(gh, kind="stable")
        gh_s, nc_s, nt_s = gh[order], nc[order], nt[order]
        first = np.empty(len(gh_s), dtype=bool)
        first[0] = True
        first[1:] = gh_s[1:] != gh_s[:-1]
        starts = np.flatnonzero(first)
        n_docs = np.diff(np.append(starts, len(gh_s)))
        sum_c = np.add.reduceat(nc_s, starts)
        sum_t = np.add.reduceat(nt_s, starts)
        # distinct texts per group: unique (gh, th) pairs, then count
        pair = np.unique(np.stack([gh, th], axis=1), axis=0)
        uniq = np.bincount(
            np.searchsorted(gh_s[starts], pair[:, 0]),
            minlength=len(starts)).astype(np.int64)
        src = np.asarray(group.column("source").to_pylist(),
                         dtype=object)[order][first]
        lang = np.asarray(group.column("lang").to_pylist(),
                          dtype=object)[order][first]
        return pa.table({
            "source": pa.array(src.tolist(), type=pa.string()),
            "lang": pa.array(lang.tolist(), type=pa.string()),
            "n_docs": pa.array(n_docs, type=pa.int64()),
            "n_unique_texts": pa.array(uniq, type=pa.int64()),
            "sum_chars": pa.array(sum_c, type=pa.int64()),
            "sum_tokens": pa.array(sum_t, type=pa.int64()),
        })

    return docs.map_batches(tag, batch_format="pyarrow") \
        .groupby("pkey").map_groups(reduce_part, batch_format="pyarrow")


def top_terms(docs: "ray.data.Dataset", k: int = 10,
              group_col: str = "lang", num_partitions: int = 64
              ) -> "ray.data.Dataset":
    """(group, token, n) — the exact top-``k`` tokens by occurrence
    count within each ``group_col`` slice (ties broken by token
    ascending) — the per-language vocabulary report of a curation run.

    Distributed two-level top-k with exact totals:

    1. map-side partial counts, one row per batch-DISTINCT
       (group, token);
    2. pkey shuffle on hash(group, token) — each pair's TOTAL is
       complete inside exactly one partition;
    3. per-partition per-group top-k candidates (a superset of the
       answer: every true top-k pair has its complete total in some
       partition, which must locally rank it top-k);
    4. candidates (<= groups x k x partitions rows) re-shuffle on
       hash(group) for the exact final per-group top-k.

    Token text never leaves a count row; no stage holds more than one
    partition's distinct pairs.
    """
    from apollo_ray.hashing import hash_utf8, mix_to_partition

    def partial_counts(batch: pa.Table) -> pa.Table:
        empty = pa.table({"grp": pa.array([], type=pa.string()),
                          "token": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64()),
                          "pkey": pa.array([], type=pa.int32())})
        if batch.num_rows == 0:
            return empty
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = _split_tokens(text)
        flat = toks.flatten()
        if len(flat) == 0:
            return empty
        n_tok = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        grp = batch.column(group_col).to_pylist()
        g_of_tok = np.repeat(
            np.arange(len(n_tok), dtype=np.int64), n_tok)
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_dict = len(enc.dictionary)
        # count per (doc-group, token-code): docs sharing a group merge
        g_codes = np.fromiter((hash_utf8(g) for g in grp),
                              dtype=np.int64, count=len(grp))
        # count per (group, token): segment-reduce after one lexsort
        gid = g_codes[g_of_tok]
        order = np.lexsort((codes, gid))
        gid_s, code_s = gid[order], codes[order]
        first = np.empty(len(gid_s), dtype=bool)
        if len(gid_s):
            first[0] = True
            first[1:] = (gid_s[1:] != gid_s[:-1]) | (code_s[1:] != code_s[:-1])
        starts = np.flatnonzero(first)
        n = np.diff(np.append(starts, len(gid_s))).astype(np.int64)
        # map gid back to the group string via first doc holding it
        gid_to_grp = {g_codes[i]: grp[i] for i in range(len(grp))}
        out_grp = [gid_to_grp[g] for g in gid_s[starts]]
        toks_out = enc.dictionary.take(
            pa.array(code_s[starts], type=pa.int64()))
        kh = np.fromiter(
            (hash_utf8("%s\x00%s" % (g, t))
             for g, t in zip(out_grp, toks_out.to_pylist())),
            dtype=np.int64, count=len(out_grp))
        return pa.table({
            "grp": pa.array(out_grp, type=pa.string()),
            "token": toks_out,
            "n": pa.array(n, type=pa.int64()),
            "pkey": pa.array(mix_to_partition(kh, num_partitions),
                             type=pa.int32()),
        })

    def _topk_within(group: pa.Table, sum_first: bool) -> pa.Table:
        empty = pa.table({"grp": pa.array([], type=pa.string()),
                          "token": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64()),
                          "gkey": pa.array([], type=pa.int32())})
        if group.num_rows == 0:
            return empty
        grp = np.asarray(group.column("grp").to_pylist(), dtype=object)
        tok = np.asarray(group.column("token").to_pylist(), dtype=object)
        n = np.asarray(group.column("n"), dtype=np.int64)
        if sum_first:
            # sum duplicate (grp, token) partials from different batches
            order = np.lexsort((tok, grp))
            grp, tok, n = grp[order], tok[order], n[order]
            first = np.empty(len(grp), dtype=bool)
            first[0] = True
            first[1:] = (grp[1:] != grp[:-1]) | (tok[1:] != tok[:-1])
            starts = np.flatnonzero(first)
            n = np.add.reduceat(n, starts)
            grp, tok = grp[starts], tok[starts]
        # rank: per grp by (n desc, token asc)
        order = np.lexsort((tok, -n, grp))
        grp, tok, n = grp[order], tok[order], n[order]
        first = np.empty(len(grp), dtype=bool)
        first[0] = True
        first[1:] = grp[1:] != grp[:-1]
        seg_id = np.cumsum(first) - 1
        seg_start = np.flatnonzero(first)
        rank = np.arange(len(grp)) - seg_start[seg_id]
        keep = rank < k
        grp, tok, n = grp[keep], tok[keep], n[keep]
        gh = np.fromiter((hash_utf8(g) for g in grp),
                         dtype=np.int64, count=len(grp))
        return pa.table({
            "grp": pa.array(grp.tolist(), type=pa.string()),
            "token": pa.array(tok.tolist(), type=pa.string()),
            "n": pa.array(n, type=pa.int64()),
            "gkey": pa.array(mix_to_partition(gh, num_partitions),
                             type=pa.int32()),
        })

    def candidates(group: pa.Table) -> pa.Table:
        return _topk_within(group.drop_columns(["pkey"]), sum_first=True)

    def final_topk(group: pa.Table) -> pa.Table:
        out = _topk_within(group.drop_columns(["gkey"]), sum_first=False)
        out = out.drop_columns(["gkey"])
        return out.rename_columns([group_col, "token", "n"])

    return docs.map_batches(partial_counts, batch_format="pyarrow") \
        .groupby("pkey").map_groups(candidates, batch_format="pyarrow") \
        .groupby("gkey").map_groups(final_topk, batch_format="pyarrow")


def length_quantiles(docs: "ray.data.Dataset", group_col: str = "lang",
                     num_partitions: int = 16) -> "ray.data.Dataset":
    """(group, n_docs, p25, p50, p75) — exact discrete quantiles of
    per-doc whitespace token counts within each ``group_col`` slice
    (the length-distribution report of a curation run).

    Exactness without a global sort: token counts are small integers,
    so the map side emits one (group, n_tokens, count) row per
    batch-distinct pair, a pkey shuffle on hash(group) co-locates each
    group's value histogram, and the reduce reads the quantile off the
    cumulative histogram.  Rank rule matches DuckDB ``quantile_disc``:
    the value at 1-based rank ceil(q*n), computed in integer
    arithmetic ((num*n + den - 1) // den for q = num/den) so no float
    boundary exists.  Empty documents count as length 0."""
    from apollo_ray.hashing import hash_utf8, mix_to_partition

    QS = ((1, 4, "p25"), (1, 2, "p50"), (3, 4, "p75"))

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"grp": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64()),
                          "cnt": pa.array([], type=pa.int64()),
                          "pkey": pa.array([], type=pa.int32())})
        if batch.num_rows == 0:
            return empty
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_tok = pc.list_value_length(_split_tokens(text)).to_numpy(
            zero_copy_only=False).astype(np.int64)
        grp = np.asarray(batch.column(group_col).to_pylist(), dtype=object)
        order = np.lexsort((n_tok, grp))
        g_s, n_s = grp[order], n_tok[order]
        first = np.empty(len(g_s), dtype=bool)
        first[0] = True
        first[1:] = (g_s[1:] != g_s[:-1]) | (n_s[1:] != n_s[:-1])
        starts = np.flatnonzero(first)
        cnt = np.diff(np.append(starts, len(g_s))).astype(np.int64)
        g_out = g_s[starts]
        gh = np.fromiter((hash_utf8(g) for g in g_out),
                         dtype=np.int64, count=len(g_out))
        return pa.table({
            "grp": pa.array(g_out.tolist(), type=pa.string()),
            "n": pa.array(n_s[starts], type=pa.int64()),
            "cnt": pa.array(cnt, type=pa.int64()),
            "pkey": pa.array(mix_to_partition(gh, num_partitions),
                             type=pa.int32()),
        })

    def reduce_part(group: pa.Table) -> pa.Table:
        cols = {group_col: pa.array([], type=pa.string()),
                "n_docs": pa.array([], type=pa.int64())}
        for _, _, name in QS:
            cols[name] = pa.array([], type=pa.int64())
        if group.num_rows == 0:
            return pa.table(cols)
        grp = np.asarray(group.column("grp").to_pylist(), dtype=object)
        n = np.asarray(group.column("n"), dtype=np.int64)
        cnt = np.asarray(group.column("cnt"), dtype=np.int64)
        order = np.lexsort((n, grp))
        grp, n, cnt = grp[order], n[order], cnt[order]
        # merge duplicate (grp, n) pairs from different batches
        first = np.empty(len(grp), dtype=bool)
        first[0] = True
        first[1:] = (grp[1:] != grp[:-1]) | (n[1:] != n[:-1])
        starts = np.flatnonzero(first)
        cnt = np.add.reduceat(cnt, starts)
        grp, n = grp[starts], n[starts]
        g_first = np.empty(len(grp), dtype=bool)
        g_first[0] = True
        g_first[1:] = grp[1:] != grp[:-1]
        g_starts = np.append(np.flatnonzero(g_first), len(grp))
        out = {group_col: [], "n_docs": []}
        for _, _, name in QS:
            out[name] = []
        for a, b in zip(g_starts[:-1], g_starts[1:]):
            cum = np.cumsum(cnt[a:b])
            total = int(cum[-1])
            out[group_col].append(grp[a])
            out["n_docs"].append(total)
            for num, den, name in QS:
                rank = (num * total + den - 1) // den
                out[name].append(int(n[a:b][np.searchsorted(cum, rank)]))
        return pa.table({
            group_col: pa.array(out[group_col], type=pa.string()),
            "n_docs": pa.array(out["n_docs"], type=pa.int64()),
            **{name: pa.array(out[name], type=pa.int64())
               for _, _, name in QS},
        })

    return docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("pkey").map_groups(reduce_part, batch_format="pyarrow")


def token_freq_hist(docs: "ray.data.Dataset", num_partitions: int = 64
                    ) -> "ray.data.Dataset":
    """(bucket, n_tokens) — Zipf/frequency histogram of the corpus
    vocabulary: how many DISTINCT tokens have a total occurrence count
    c with floor(log2(c)) == bucket.  The one-page vocabulary-shape
    report of a curation run (heavy-tail check before tokenizer
    training).

    Map-side partial counts (one row per batch-distinct token), one
    pkey shuffle on hash(token) — each token's TOTAL is complete in
    exactly one partition — then per-partition bucketing; only
    <= 64-row (bucket, count) partials reach the final fold.  The
    log2 bucket is integer-exact on both sides: numpy ``frexp``
    exponent here, ``length(bin(c)) - 1`` in the DuckDB oracle.
    """
    from apollo_ray.hashing import hash_utf8, mix_to_partition

    _EMPTY = pa.table({"token": pa.array([], type=pa.string()),
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
        vc = flat.value_counts()
        tok = vc.field("values")
        cnt = vc.field("counts").cast(pa.int64())
        h = np.fromiter((hash_utf8(t) for t in tok.to_pylist()),
                        dtype=np.int64, count=len(tok))
        return pa.table({
            "token": tok, "n": cnt,
            "pkey": pa.array(mix_to_partition(h, num_partitions),
                             type=pa.int32())})

    def bucket_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"bucket": pa.array([], type=pa.int64()),
                             "n_tokens": pa.array([], type=pa.int64())})
        enc = group.column("token").combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.asarray(group.column("n"), dtype=np.int64)
        # per-token totals: counts < 2^53, exact in the f64 accumulator
        tot = np.bincount(codes, weights=n.astype(np.float64),
                          minlength=len(enc.dictionary)).astype(np.int64)
        bucket = (np.frexp(tot.astype(np.float64))[1] - 1).astype(np.int64)
        bc = np.bincount(bucket)
        nz = np.flatnonzero(bc)
        return pa.table({"bucket": pa.array(nz, type=pa.int64()),
                         "n_tokens": pa.array(bc[nz], type=pa.int64())})

    def fold(group: pa.Table) -> pa.Table:
        b = np.asarray(group.column("bucket"), dtype=np.int64)
        n = np.asarray(group.column("n_tokens"), dtype=np.int64)
        return pa.table({"bucket": pa.array(b[:1], type=pa.int64()),
                         "n_tokens": pa.array([int(n.sum())],
                                              type=pa.int64())})

    parts = docs.map_batches(partial_counts, batch_format="pyarrow") \
        .groupby("pkey").map_groups(bucket_part, batch_format="pyarrow")
    # <= 64 partitions x ~40 buckets of partials: bounded-cardinality fold
    return parts.groupby("bucket").map_groups(fold, batch_format="pyarrow")


def source_dup_stats(docs: "ray.data.Dataset", num_partitions: int = 64
                     ) -> "ray.data.Dataset":
    """(source, n_docs, n_distinct, dup_ppm) — exact-duplication rate
    per corpus source/crawl, the first report a webtext ops team pulls
    after ingesting a new snapshot.

    Only (source, text_hash) rows shuffle — texts never move.  The
    pkey is hash(source, text_hash), so every copy of a given
    (source, text) lands in one partition and both the per-source row
    count and the distinct count are complete partials there; the
    final fold sees <= sources x partitions rows.  dup_ppm is
    round-half-up of 10^6 x (n_docs - n_distinct) / n_docs in exact
    int64 (bit-exact vs the SQL oracle).
    """
    from apollo_ray.hashing import (hash_utf8, mix_to_partition, pair_mix)

    def tag(batch: pa.Table) -> pa.Table:
        th = np.fromiter((hash_utf8(t) for t in
                          batch.column("text").to_pylist()),
                         dtype=np.int64, count=batch.num_rows)
        src = batch.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = src.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        sh = np.fromiter((hash_utf8(s) for s in
                          enc.dictionary.to_pylist()),
                         dtype=np.int64, count=len(enc.dictionary))
        pairkey = pair_mix(sh[codes], th).astype(np.int64) >> 1
        return pa.table({
            "source": src,
            "pairkey": pa.array(pairkey, type=pa.int64()),
            "pkey": pa.array(mix_to_partition(pairkey, num_partitions),
                             type=pa.int32())})

    def reduce_part(group: pa.Table) -> pa.Table:
        empty = pa.table({"source": pa.array([], type=pa.string()),
                          "n_docs": pa.array([], type=pa.int64()),
                          "n_distinct": pa.array([], type=pa.int64())})
        if group.num_rows == 0:
            return empty
        enc = group.column("source").combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        pk = np.asarray(group.column("pairkey"), dtype=np.int64)
        n_src = len(enc.dictionary)
        n_docs = np.bincount(codes, minlength=n_src)
        _, first = np.unique(pk, return_index=True)
        n_dist = np.bincount(codes[first], minlength=n_src)
        return pa.table({"source": enc.dictionary,
                         "n_docs": pa.array(n_docs, type=pa.int64()),
                         "n_distinct": pa.array(n_dist, type=pa.int64())})

    def fold(group: pa.Table) -> pa.Table:
        nd = int(np.asarray(group.column("n_docs"),
                            dtype=np.int64).sum())
        nu = int(np.asarray(group.column("n_distinct"),
                            dtype=np.int64).sum())
        ppm = (2_000_000 * (nd - nu) + nd) // (2 * nd)
        return pa.table({"source": group.column("source").slice(0, 1),
                         "n_docs": pa.array([nd], type=pa.int64()),
                         "n_distinct": pa.array([nu], type=pa.int64()),
                         "dup_ppm": pa.array([ppm], type=pa.int64())})

    parts = docs.map_batches(tag, batch_format="pyarrow") \
        .groupby("pkey").map_groups(reduce_part, batch_format="pyarrow")
    # bounded cardinality: one group per source
    return parts.groupby("source").map_groups(fold, batch_format="pyarrow")


def value_quantiles(events: "ray.data.Dataset",
                    group_col: str = "event_type",
                    num_partitions: int = 16) -> "ray.data.Dataset":
    """(event_type, n_events, p25_c, p50_c, p75_c) — exact discrete
    quantiles of the ``value`` column per group, in integer cents —
    ``length_quantiles`` generalized to a money/double column.

    The double is snapped to cents with ``np.rint`` (2-decimal inputs
    are never at a rounding half, the Q1 integer-cents argument), so
    the histogram domain is small integers and the same
    (group, cents, count) histogram shuffle + cumulative-rank read
    gives exact quantiles with no global sort.  Rank rule matches
    DuckDB ``quantile_disc``: 1-based rank ceil(q*n) in integer
    arithmetic.
    """
    from apollo_ray.hashing import hash_utf8, mix_to_partition

    QS = ((1, 4, "p25_c"), (1, 2, "p50_c"), (3, 4, "p75_c"))

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"grp": pa.array([], type=pa.string()),
                          "v": pa.array([], type=pa.int64()),
                          "cnt": pa.array([], type=pa.int64()),
                          "pkey": pa.array([], type=pa.int32())})
        if batch.num_rows == 0:
            return empty
        cents = np.rint(np.asarray(batch.column("value"),
                                   dtype=np.float64) * 100).astype(np.int64)
        grp = np.asarray(batch.column(group_col).to_pylist(), dtype=object)
        order = np.lexsort((cents, grp))
        g_s, v_s = grp[order], cents[order]
        first = np.empty(len(g_s), dtype=bool)
        first[0] = True
        first[1:] = (g_s[1:] != g_s[:-1]) | (v_s[1:] != v_s[:-1])
        starts = np.flatnonzero(first)
        cnt = np.diff(np.append(starts, len(g_s))).astype(np.int64)
        g_out = g_s[starts]
        gh = np.fromiter((hash_utf8(g) for g in g_out),
                         dtype=np.int64, count=len(g_out))
        return pa.table({
            "grp": pa.array(g_out.tolist(), type=pa.string()),
            "v": pa.array(v_s[starts], type=pa.int64()),
            "cnt": pa.array(cnt, type=pa.int64()),
            "pkey": pa.array(mix_to_partition(gh, num_partitions),
                             type=pa.int32()),
        })

    def reduce_part(group: pa.Table) -> pa.Table:
        cols = {group_col: pa.array([], type=pa.string()),
                "n_events": pa.array([], type=pa.int64())}
        for _, _, name in QS:
            cols[name] = pa.array([], type=pa.int64())
        if group.num_rows == 0:
            return pa.table(cols)
        grp = np.asarray(group.column("grp").to_pylist(), dtype=object)
        v = np.asarray(group.column("v"), dtype=np.int64)
        cnt = np.asarray(group.column("cnt"), dtype=np.int64)
        order = np.lexsort((v, grp))
        grp, v, cnt = grp[order], v[order], cnt[order]
        first = np.empty(len(grp), dtype=bool)
        first[0] = True
        first[1:] = (grp[1:] != grp[:-1]) | (v[1:] != v[:-1])
        starts = np.flatnonzero(first)
        cnt = np.add.reduceat(cnt, starts)
        grp, v = grp[starts], v[starts]
        g_first = np.empty(len(grp), dtype=bool)
        g_first[0] = True
        g_first[1:] = grp[1:] != grp[:-1]
        g_starts = np.append(np.flatnonzero(g_first), len(grp))
        out = {group_col: [], "n_events": []}
        for _, _, name in QS:
            out[name] = []
        for a, b in zip(g_starts[:-1], g_starts[1:]):
            cum = np.cumsum(cnt[a:b])
            total = int(cum[-1])
            out[group_col].append(grp[a])
            out["n_events"].append(total)
            for num, den, name in QS:
                rank = (num * total + den - 1) // den
                out[name].append(int(v[a:b][np.searchsorted(cum, rank)]))
        return pa.table({
            group_col: pa.array(out[group_col], type=pa.string()),
            "n_events": pa.array(out["n_events"], type=pa.int64()),
            **{name: pa.array(out[name], type=pa.int64())
               for _, _, name in QS},
        })

    return events.map_batches(partial, batch_format="pyarrow") \
        .groupby("pkey").map_groups(reduce_part, batch_format="pyarrow")


def props_key_stats(events: "ray.data.Dataset", key: str = "k",
                    num_partitions: int = 8) -> "ray.data.Dataset":
    """(event_type, n_with_key, sum_v, min_v, max_v) — aggregate an
    integer field out of the semi-structured ``props`` JSON-string
    column, per event type: the "extract one field from a JSON blob
    without a JSON shuffle" pattern.  Events whose props lack the key
    are excluded (no null/'' coercion surface vs the SQL oracle).

    Map side: one RE2 ``extract_regex`` kernel pass per batch (no
    per-row JSON parse) and per-(type) integer partials — count, sum,
    min, max are all mergeable, so only O(types) rows per batch reach
    the single tiny fold shuffle.
    """
    import re as _re

    from apollo_ray.hashing import hash_utf8, mix_to_partition

    pat = '"%s":\\s*(?P<v>-?\\d+)' % _re.escape(key)

    def partials(batch: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], type=pa.string()),
                          "n_with_key": pa.array([], type=pa.int64()),
                          "sum_v": pa.array([], type=pa.int64()),
                          "min_v": pa.array([], type=pa.int64()),
                          "max_v": pa.array([], type=pa.int64()),
                          "pkey": pa.array([], type=pa.int32())})
        if batch.num_rows == 0:
            return empty
        props = batch.column("props")
        if isinstance(props, pa.ChunkedArray):
            props = props.combine_chunks()
        ext = pc.extract_regex(props, pat)
        vs = ext.field("v") if ext.type != pa.null() else None
        ok = pc.is_valid(ext).to_numpy(zero_copy_only=False) \
            if vs is not None else np.zeros(batch.num_rows, dtype=bool)
        if not ok.any():
            return empty
        v = np.zeros(batch.num_rows, dtype=np.int64)
        # the struct is null on non-matching rows but its CHILD field
        # holds "" there — filter by the struct validity, not the child
        v[ok] = np.asarray(vs.filter(pa.array(ok)).cast(pa.int64()))
        et = np.asarray(batch.column("event_type").to_pylist(),
                        dtype=object)[ok]
        vv = v[ok]
        uniq, inv = np.unique(et, return_inverse=True)
        n = np.bincount(inv)
        s = np.bincount(inv, weights=vv.astype(np.float64)).astype(np.int64)
        mn = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mn, inv, vv)
        mx = np.full(len(uniq), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, inv, vv)
        gh = np.fromiter((hash_utf8(g) for g in uniq),
                         dtype=np.int64, count=len(uniq))
        return pa.table({
            "event_type": pa.array(uniq.tolist(), type=pa.string()),
            "n_with_key": pa.array(n, type=pa.int64()),
            "sum_v": pa.array(s, type=pa.int64()),
            "min_v": pa.array(mn, type=pa.int64()),
            "max_v": pa.array(mx, type=pa.int64()),
            "pkey": pa.array(mix_to_partition(gh, num_partitions),
                             type=pa.int32())})

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return group.select(["event_type", "n_with_key", "sum_v",
                                 "min_v", "max_v"])
        et = np.asarray(group.column("event_type").to_pylist(),
                        dtype=object)
        uniq, inv = np.unique(et, return_inverse=True)
        def agg(col, fn, init):
            x = np.asarray(group.column(col), dtype=np.int64)
            out = np.full(len(uniq), init, dtype=np.int64)
            fn.at(out, inv, x)
            return out
        n = np.bincount(inv, weights=np.asarray(
            group.column("n_with_key"), dtype=np.float64)).astype(np.int64)
        s = np.bincount(inv, weights=np.asarray(
            group.column("sum_v"), dtype=np.float64)).astype(np.int64)
        mn = agg("min_v", np.minimum, np.iinfo(np.int64).max)
        mx = agg("max_v", np.maximum, np.iinfo(np.int64).min)
        return pa.table({
            "event_type": pa.array(uniq.tolist(), type=pa.string()),
            "n_with_key": pa.array(n, type=pa.int64()),
            "sum_v": pa.array(s, type=pa.int64()),
            "min_v": pa.array(mn, type=pa.int64()),
            "max_v": pa.array(mx, type=pa.int64())})

    return events.map_batches(partials, batch_format="pyarrow") \
        .groupby("pkey").map_groups(fold, batch_format="pyarrow")


def char_entropy(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, n_chars, ent_nano) — Shannon entropy (bits) of each
    document's character-unigram distribution, in integer NANO-bits
    (the gibberish/low-diversity quality tell: base64 blobs read ~6,
    natural text ~4-4.5, 'aaaa...' 0).

    Determinism: each (doc, char) term ``p*log2(p)`` is rounded to 9
    decimals and summed as int64 nano-units — order-free integer
    arithmetic, value-exact in SQL (same double division, libm log2,
    round-then-scale on both sides).  Scale shape: pure map, no
    shuffle; per batch ONE np.unique over a (doc_idx << 21 | codepoint)
    composite + reduceat — no per-row Python.  Empty docs report 0/0.
    """

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_rows = len(text)
        lens = pc.utf8_length(text).fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        joined = "".join(t or "" for t in text.to_pylist())
        cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32) \
            .astype(np.int64)
        doc_idx = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
        ent = np.zeros(n_rows, dtype=np.int64)
        if len(cp):
            comp = (doc_idx << 21) | cp
            uniq, counts = np.unique(comp, return_counts=True)
            u_doc = uniq >> 21
            p = counts / lens[u_doc].astype(np.float64)
            nano = np.round(np.round(p * np.log2(p), 9) * 1e9) \
                .astype(np.int64)
            starts = np.flatnonzero(np.diff(u_doc, prepend=-1))
            sums = np.add.reduceat(nano, starts)
            ent[u_doc[starts]] = -sums
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "n_chars": pa.array(lens, type=pa.int64()),
            "ent_nano": pa.array(ent, type=pa.int64()),
        })

    return docs.map_batches(f, batch_format="pyarrow")


def char_entropy_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`char_entropy` (same per-term 9-decimal
    quantization, integer nano-bit sums)."""
    return f"""
        WITH ch AS (
          SELECT doc_id, unnest(split(text, '')) AS ch
          FROM {table} WHERE length(text) > 0),
        cc AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
               FROM ch GROUP BY doc_id, ch),
        n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n
              FROM cc GROUP BY doc_id),
        s AS (SELECT cc.doc_id,
                     CAST(sum(CAST(round(round((cc.c / n.n)
                                               * log2(cc.c / n.n), 9)
                                         * 1000000000) AS BIGINT))
                          AS BIGINT) AS su
              FROM cc JOIN n USING (doc_id) GROUP BY cc.doc_id)
        SELECT d.doc_id,
               CAST(length(d.text) AS BIGINT) AS n_chars,
               CAST(coalesce(-s.su, 0) AS BIGINT) AS ent_nano
        FROM {table} d LEFT JOIN s ON s.doc_id = d.doc_id
    """


# Mojibake tells: the classic UTF-8-read-as-cp1252 multi-char splashes
# (written as codepoint escapes — several are invisible).  Counted with
# the greedy non-overlapping replace trick on both sides (same
# semantics as the lang-ID marker counts).
_MOJIBAKE_MARKERS = ("Ã©",            # 'é' mis-decoded
                     "Ã¨",            # 'è'
                     "Ã¼",            # 'ü'
                     "â€™",      # ’ right single quote
                     "â€œ",      # “ left double quote
                     "Â ")            # nbsp splash

# Control chars excluding \t \n \r, plus DEL — a single-codepoint RE2
# class; the IDENTICAL pattern string is handed to Arrow and DuckDB
# (both RE2), so the counts agree by construction.
_CTRL_PATTERN = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
_NONASCII_PATTERN = r"[^\x00-\x7F]"
_REPLACEMENT_CHAR = "�"


def encoding_quality(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, n_chars, n_replacement, n_ctrl, n_nonascii, n_mojibake)
    — the encoding-health report of a crawled corpus: U+FFFD
    replacement chars (lossy transcode), stray control bytes, the
    non-ASCII codepoint count, and the classic UTF-8-as-cp1252
    mojibake marker count.  A curation run drops or re-decodes docs
    where n_replacement/n_mojibake are non-zero.

    Scale shape: pure map, no shuffle; every count is one Arrow RE2 /
    substring kernel over the batch (no per-row Python).  All outputs
    are integer counts — value-exact vs the SQL oracle.
    """

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()

        def cnt(arr) -> pa.Array:
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            return arr.cast(pa.int64())

        moji = None
        for m in _MOJIBAKE_MARKERS:
            c = pc.count_substring(text, m)
            moji = c if moji is None else pc.add(moji, c)
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "n_chars": cnt(pc.utf8_length(text)),
            "n_replacement": cnt(pc.count_substring(
                text, _REPLACEMENT_CHAR)),
            "n_ctrl": cnt(pc.count_substring_regex(text, _CTRL_PATTERN)),
            "n_nonascii": cnt(pc.count_substring_regex(
                text, _NONASCII_PATTERN)),
            "n_mojibake": cnt(moji),
        })

    return docs.map_batches(f, batch_format="pyarrow")


def encoding_quality_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`encoding_quality`: identical RE2
    patterns via ``regexp_extract_all`` lengths; mojibake markers via
    the greedy length/replace trick (non-overlapping, same as
    ``pc.count_substring``)."""
    moji = " + ".join(
        "(length(text) - length(replace(text, %s, ''))) // %d"
        % (" || ".join("chr(%d)" % ord(ch) for ch in m), len(m))
        for m in _MOJIBAKE_MARKERS)
    return f"""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST((length(text) - length(replace(text, chr(65533), '')))
                    AS BIGINT) AS n_replacement,
               CAST(len(regexp_extract_all(text, '{_CTRL_PATTERN}'))
                    AS BIGINT) AS n_ctrl,
               CAST(len(regexp_extract_all(text, '{_NONASCII_PATTERN}'))
                    AS BIGINT) AS n_nonascii,
               CAST({moji} AS BIGINT) AS n_mojibake
        FROM {table}
    """


def readability(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, n_words, n_sentences, n_vowel_groups, flesch_milli) —
    Flesch reading-ease in integer MILLI-points with the standard
    vowel-group syllable approximation (a run of [aeiouyAEIOUY] is one
    syllable; zero-vowel tokens contribute zero).  n_sentences is the
    count of '[.!?]+' runs, floored at 1 for any doc with words (the
    conventional guard so fragments still score).

    Determinism: words / sentence-runs / vowel-groups are Arrow RE2
    counts; flesch_milli = floor(1000*(206.835 - 1.015*(w/s) -
    84.6*(g/w)) + 0.5) — round-half-UP via explicit floor on BOTH
    sides (np.round is banker's, DuckDB round() is half-away; .5 ties
    genuinely occur, e.g. w=3,s=2,g=1), evaluated in the same float64
    operand order as the SQL oracle.  Word-less docs report NULL
    flesch and 0 sentences.  Whitespace parity caveat: tokens split on
    Python/Arrow unicode whitespace vs the oracle's RE2 ``\\s`` —
    identical on ASCII whitespace (same caveat as token_counts).
    Scale shape: pure map, no shuffle.
    """

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        w = pc.list_value_length(_split_tokens(text)).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        s_runs = pc.count_substring_regex(text, r"[.!?]+") \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        g = pc.count_substring_regex(text, r"[aeiouyAEIOUY]+") \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        s = np.maximum(s_runs, 1)
        wf = w.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            flesch = np.floor(1000.0 * (206.835 - 1.015 * (wf / s)
                                        - 84.6 * (g / wf)) + 0.5)
        has_words = w > 0
        vals = np.where(has_words, np.nan_to_num(flesch), 0).astype(
            np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "n_words": pa.array(w, type=pa.int64()),
            "n_sentences": pa.array(np.where(has_words, s, 0),
                                    type=pa.int64()),
            "n_vowel_groups": pa.array(g, type=pa.int64()),
            "flesch_milli": pa.Array.from_pandas(
                np.where(has_words, vals.astype(object), None),
                type=pa.int64()),
        })

    return docs.map_batches(f, batch_format="pyarrow")


def readability_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`readability` — identical RE2 patterns
    and the same float64 expression order for flesch_milli."""
    return f"""
        WITH b AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                 END AS w,
                 greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
                 len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS g
          FROM {table})
        SELECT doc_id,
               CAST(w AS BIGINT) AS n_words,
               CAST(CASE WHEN w > 0 THEN s ELSE 0 END AS BIGINT)
                   AS n_sentences,
               CAST(g AS BIGINT) AS n_vowel_groups,
               CASE WHEN w > 0 THEN CAST(floor(
                      1000.0 * (206.835 - 1.015 * (CAST(w AS DOUBLE) / s)
                                - 84.6 * (g / CAST(w AS DOUBLE))) + 0.5)
                    AS BIGINT) ELSE NULL END AS flesch_milli
        FROM b
    """


# ---------------------------------------------------------------------------
# html_tag_stats — markup-density report for half-rendered crawl text
# ---------------------------------------------------------------------------

_TAG_PATTERN = r"<[A-Za-z/][^>]*>"
_SCRIPT_PATTERN = r"<script[\s>]"
_ANCHOR_PATTERN = r"<a[\s>]"
_TAG_STRIP_PATTERN = r"<[^>]*>"


def html_tag_stats(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, n_chars, n_tags, n_scripts, n_anchors, text_chars,
    text_ratio_ppm) — markup density of a crawl corpus: how much of
    each document is HTML tags vs rendered text.  Curation drops or
    re-extracts docs whose text_ratio is low (extraction failed and
    the "text" is still markup).  text_chars is the length after
    stripping every ``<...>`` span; text_ratio_ppm =
    floor(1e6 * text_chars / n_chars + 0.5), NULL for empty docs.

    Scale shape: pure map, no shuffle — four Arrow RE2 kernels and
    one regex strip per batch; zero per-row Python.  Parity: the
    identical RE2 pattern strings go to DuckDB (both RE2), counts and
    the ppm ratio are integer round-half-up on both sides.
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
        stripped = pc.replace_substring_regex(text, _TAG_STRIP_PATTERN, "")
        text_chars = i64(pc.utf8_length(stripped))
        nc = n_chars.to_numpy(zero_copy_only=False)
        tc = text_chars.to_numpy(zero_copy_only=False)
        ratio = np.floor(1e6 * tc.astype(np.float64)
                         / np.where(nc == 0, 1, nc) + 0.5).astype(np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "n_chars": n_chars,
            "n_tags": i64(pc.count_substring_regex(text, _TAG_PATTERN)),
            "n_scripts": i64(pc.count_substring_regex(
                text, _SCRIPT_PATTERN)),
            "n_anchors": i64(pc.count_substring_regex(
                text, _ANCHOR_PATTERN)),
            "text_chars": text_chars,
            "text_ratio_ppm": pa.array(
                np.where(nc == 0, None, ratio), type=pa.int64()),
        })

    return docs.map_batches(f, batch_format="pyarrow")


def html_tag_stats_sql(table: str = "documents",
                       text_expr: str = "text") -> str:
    """DuckDB oracle for :func:`html_tag_stats` (identical RE2
    patterns; regexp_replace with the 'g' flag mirrors Arrow's
    replace-all; same float64 ppm expression)."""
    t = f"({text_expr})"
    return f"""
        WITH c AS (
          SELECT doc_id,
                 CAST(length({t}) AS BIGINT) AS n_chars,
                 CAST(len(regexp_extract_all({t}, '{_TAG_PATTERN}'))
                      AS BIGINT) AS n_tags,
                 CAST(len(regexp_extract_all({t}, '{_SCRIPT_PATTERN}'))
                      AS BIGINT) AS n_scripts,
                 CAST(len(regexp_extract_all({t}, '{_ANCHOR_PATTERN}'))
                      AS BIGINT) AS n_anchors,
                 CAST(length(regexp_replace({t}, '{_TAG_STRIP_PATTERN}',
                                            '', 'g')) AS BIGINT)
                   AS text_chars
          FROM {table})
        SELECT doc_id, n_chars, n_tags, n_scripts, n_anchors, text_chars,
               CASE WHEN n_chars = 0 THEN NULL
                    ELSE CAST(floor(1e6 * CAST(text_chars AS DOUBLE)
                                    / CAST(n_chars AS DOUBLE) + 0.5)
                              AS BIGINT)
               END AS text_ratio_ppm
        FROM c
    """


def quantile_filter(docs: "ray.data.Dataset", pct: str = "p25",
                    group_col: str = "lang", num_partitions: int = 16
                    ) -> "ray.data.Dataset":
    """(doc_id, group, n_tokens) — adaptive per-group length cut: keep
    documents whose whitespace token count is >= their OWN group's
    ``pct`` quantile (p25/p50/p75).  The dynamic-threshold variant of
    a fixed min-length filter: each language/source sets its own bar,
    so a uniformly short language is not wiped out by a global
    constant.

    Scale shape: :func:`length_quantiles` provides the thresholds (one
    batch-distinct histogram shuffle); the (group, threshold) table —
    group cardinality small by construction — is pulled once and
    broadcast in the closure; the cut itself is a pure map pass.  The
    document payload never moves: output is metadata only.
    """
    if pct not in ("p25", "p50", "p75"):
        raise ValueError("pct must be p25|p50|p75")
    thr = {r[group_col]: int(r[pct])
           for r in length_quantiles(docs, group_col=group_col,
                                     num_partitions=num_partitions)
           .take_all()}

    def f(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             group_col: pa.array([], type=pa.string()),
                             "n_tokens": pa.array([], type=pa.int64())})
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_tok = pc.list_value_length(_split_tokens(text)).to_numpy(
            zero_copy_only=False).astype(np.int64)
        grp = batch.column(group_col).to_pylist()
        cut = np.fromiter((thr.get(g, 0) for g in grp), dtype=np.int64,
                          count=len(grp))
        m = n_tok >= cut
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()).filter(
                pa.array(m)),
            group_col: pa.array(
                [g for g, keep in zip(grp, m.tolist()) if keep],
                type=pa.string()),
            "n_tokens": pa.array(n_tok[m], type=pa.int64())})

    return docs.map_batches(f, batch_format="pyarrow")


def quantile_filter_sql(pct: str = "p25", group_col: str = "lang",
                        table: str = "documents") -> str:
    """DuckDB oracle for :func:`quantile_filter` (quantile_disc
    matches length_quantiles' integer rank rule, proven by that
    query's own oracle)."""
    q = {"p25": "0.25", "p50": "0.5", "p75": "0.75"}[pct]
    return f"""
        WITH t AS (
          SELECT doc_id, {group_col},
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                 END AS n_tokens
          FROM {table}),
        q AS (SELECT {group_col},
                     CAST(quantile_disc(n_tokens, {q}) AS BIGINT) AS thr
              FROM t GROUP BY {group_col})
        SELECT t.doc_id, t.{group_col},
               CAST(t.n_tokens AS BIGINT) AS n_tokens
        FROM t JOIN q USING ({group_col})
        WHERE t.n_tokens >= q.thr
    """
