"""C4-style line-level corpus cleaning (Raffel et al. 2020 §2.2's
heuristics, the subset that is deterministic and dependency-free):

keep a line iff
  - it has >= ``min_words`` whitespace words,
  - it ends in terminal punctuation (``. ! ? "``),
  - its lowercase form contains none of the blocklist phrases
    (javascript / cookie / lorem ipsum — the C4 boilerplate tells).

``c4_clean`` rebuilds each document from its kept lines (joined with
``\\n``) and reports kept/dropped line counts.  Fully
Arrow-vectorized, map-only (streams, no shuffle); the same rules are
expressed in the DuckDB oracle with ``list_filter`` so the cleaned
text is compared byte-for-byte.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

BLOCKLIST = ("javascript", "cookie", "lorem ipsum")

# line_dedup: broadcast the packed per-doc drop lists below this many
# dropped docs (same role as curate.REP_BROADCAST_MAX); above it the
# rebuild falls back to a left-outer hash join
DROP_LISTS_BROADCAST_MAX = 20_000_000


def _counts_per_list(mask: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Sum of ``mask`` within each list segment of ``lengths``."""
    starts = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=starts[1:])
    if mask.size == 0:
        return np.zeros(len(lengths), dtype=np.int64)
    out = np.add.reduceat(np.append(mask, 0), starts[:-1])[:len(lengths)]
    out[lengths == 0] = 0
    return out.astype(np.int64)


def keep_mask(flat_lines: pa.Array, min_words: int = 3) -> np.ndarray:
    """Boolean keep decision per line, vectorized Arrow kernels."""
    trimmed = pc.utf8_trim_whitespace(flat_lines)
    toks = pc.utf8_split_whitespace(trimmed)
    tok_len = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    tok_flat = toks.flatten()
    nonempty = pc.greater(pc.utf8_length(tok_flat), 0).to_numpy(
        zero_copy_only=False)
    words = _counts_per_list(nonempty, tok_len)
    keep = words >= min_words
    keep &= pc.match_substring_regex(flat_lines, '[.!?"]$').to_numpy(
        zero_copy_only=False)
    lower = pc.utf8_lower(flat_lines)
    for phrase in BLOCKLIST:
        keep &= ~pc.match_substring(lower, phrase).to_numpy(
            zero_copy_only=False)
    return keep


def c4_clean(docs: "ray.data.Dataset", min_words: int = 3
             ) -> "ray.data.Dataset":
    """(doc_id, n_kept, n_dropped, clean_text) — line-filtered docs."""

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lines = pc.split_pattern(text, pattern="\n")
        ll = pc.list_value_length(lines).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = lines.flatten()
        keep = keep_mask(flat, min_words)
        n_kept = _counts_per_list(keep, ll)
        new_off = np.zeros(len(ll) + 1, dtype=np.int64)
        np.cumsum(n_kept, out=new_off[1:])
        kept_lines = pa.ListArray.from_arrays(
            pa.array(new_off, type=pa.int32()),
            flat.filter(pa.array(keep)))
        clean_text = pc.binary_join(kept_lines, "\n")
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "n_kept": pa.array(n_kept, type=pa.int64()),
            "n_dropped": pa.array(ll - n_kept, type=pa.int64()),
            "clean_text": clean_text,
        })

    return docs.map_batches(f, batch_format="pyarrow")


def _drop_lists_per_doc(drops: "ray.data.Dataset", num_partitions: int
                        ) -> "ray.data.Dataset":
    """(doc_id, drop_idx: binary) — sorted dropped line indices packed
    as an int64 blob per doc (Acero joins reject list-typed non-key
    columns; the `_spans_per_doc` precedent)."""
    from apollo_ray.hashing import mix_to_partition

    def add_pkey(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch.column("doc_id"), dtype=np.int64)
        return batch.append_column(
            "pkey", pa.array(mix_to_partition(d, num_partitions),
                             type=pa.int32()))

    def pack(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "drop_idx": pa.array([], type=pa.binary())})
        d = np.asarray(group.column("doc_id"), dtype=np.int64)
        ix = np.asarray(group.column("idx"), dtype=np.int64)
        order = np.lexsort((ix, d))
        d_s, ix_s = d[order], ix[order]
        first = np.empty(len(d_s), dtype=bool)
        first[0] = True
        first[1:] = d_s[1:] != d_s[:-1]
        off = np.append(np.flatnonzero(first), len(d_s))
        blobs = [ix_s[a:b].tobytes() for a, b in zip(off[:-1], off[1:])]
        return pa.table({
            "doc_id": pa.array(d_s[off[:-1]], type=pa.int64()),
            "drop_idx": pa.array(blobs, type=pa.binary()),
        })

    return drops.map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(pack, batch_format="pyarrow")


def _line_occurrences(batch: pa.Table, sep: str, min_len: int,
                      num_partitions: int, scope_col: str | None = None
                      ) -> pa.Table:
    """Explode a docs batch into per-line occurrence rows ``(lh,
    doc_id, idx, pkey)``.  ``lh`` is the 63-bit line hash — mixed with
    the row's ``scope_col`` value hash when given, so equal lines in
    different scopes get distinct keys.  Lines shorter than ``min_len``
    codepoints are ineligible and not emitted (always kept).  Per-batch
    hashing touches only batch-DISTINCT lines via
    ``dictionary_encode``; all columns leave as fixed-width ints (line
    TEXT never enters the shuffle)."""
    from apollo_ray.hashing import hash_utf8, mix_to_partition, pair_mix

    empty = pa.table({"lh": pa.array([], type=pa.int64()),
                      "doc_id": pa.array([], type=pa.int64()),
                      "idx": pa.array([], type=pa.int64()),
                      "pkey": pa.array([], type=pa.int32())})
    if batch.num_rows == 0:
        return empty
    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lists = pc.split_pattern(text, pattern=sep)
    lens = pc.list_value_length(lists).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = lists.flatten()
    if len(flat) == 0:
        return empty
    enc = flat.dictionary_encode()
    dict_lines = enc.dictionary.to_pylist()
    dict_h = np.fromiter((hash_utf8(s) for s in dict_lines),
                         dtype=np.int64, count=len(dict_lines))
    dict_elig = pc.utf8_length(enc.dictionary).to_numpy(
        zero_copy_only=False).astype(np.int64) >= min_len
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    lh = dict_h[codes]
    elig = dict_elig[codes]
    ids = np.asarray(batch.column("doc_id").cast(pa.int64()))
    doc = np.repeat(ids, lens)
    starts = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    idx = np.arange(len(lh), dtype=np.int64) - np.repeat(starts[:-1], lens)
    if scope_col is not None:
        senc = batch.column(scope_col)
        if isinstance(senc, pa.ChunkedArray):
            senc = senc.combine_chunks()
        senc = senc.dictionary_encode()
        sdict_h = np.fromiter((hash_utf8(s) for s in
                               senc.dictionary.to_pylist()),
                              dtype=np.int64, count=len(senc.dictionary))
        sh = sdict_h[senc.indices.to_numpy(zero_copy_only=False)
                     .astype(np.int64)]
        lh = (pair_mix(np.repeat(sh, lens), lh)
              & np.uint64((1 << 63) - 1)).astype(np.int64)
    lh, doc, idx = lh[elig], doc[elig], idx[elig]
    return pa.table({
        "lh": pa.array(lh, type=pa.int64()),
        "doc_id": pa.array(doc, type=pa.int64()),
        "idx": pa.array(idx, type=pa.int64()),
        "pkey": pa.array(mix_to_partition(lh, num_partitions),
                         type=pa.int32()),
    })


def line_dedup(docs: "ray.data.Dataset", min_len: int = 1,
               num_partitions: int = 64, sep: str = "\n"
               ) -> "ray.data.Dataset":
    """Cross-document duplicated-line removal (the ccnet / RefinedWeb
    line-dedup step, Wenzek et al. 2020 §3.1): hash every line of every
    document, keep only the corpus-wide FIRST occurrence of each line
    (ordered by ``(doc_id, line index)``), remove the rest, and rebuild
    each document from its surviving lines.  ``sep`` picks the
    granularity: ``"\\n"`` lines (default), ``"\\n\\n"`` paragraphs.

    Lines shorter than ``min_len`` codepoints are ineligible and always
    kept (``min_len=1`` exempts empty lines, so blank separators are
    not collapsed corpus-wide).

    Scale shape: one shuffle keyed on the 63-bit line hash (line TEXT
    never moves — only ``(hash, doc_id, idx)`` 24-byte rows), a second
    tiny shuffle packing per-doc dropped indices, then one left-outer
    hash join back onto ``docs`` (document text moves exactly once).
    Per-batch hashing touches only batch-DISTINCT lines via
    ``dictionary_encode``.  Returns the ``docs`` schema with ``text``
    rewritten plus ``n_dup_lines``.
    """
    def occurrences(batch: pa.Table) -> pa.Table:
        return _line_occurrences(batch, sep, min_len, num_partitions)

    def dup_occurrences(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "idx": pa.array([], type=pa.int64())})
        lh = np.asarray(group.column("lh"), dtype=np.int64)
        d = np.asarray(group.column("doc_id"), dtype=np.int64)
        ix = np.asarray(group.column("idx"), dtype=np.int64)
        order = np.lexsort((ix, d, lh))
        lh_s, d_s, ix_s = lh[order], d[order], ix[order]
        dup = np.empty(len(lh_s), dtype=bool)
        dup[0] = False
        dup[1:] = lh_s[1:] == lh_s[:-1]
        return pa.table({"doc_id": pa.array(d_s[dup], type=pa.int64()),
                         "idx": pa.array(ix_s[dup], type=pa.int64())})

    drops = docs.map_batches(occurrences, batch_format="pyarrow") \
        .groupby("pkey").map_groups(dup_occurrences, batch_format="pyarrow")
    return _apply_drop_lists(docs, drops, sep, "n_dup_lines",
                             num_partitions)


def _apply_drop_lists(docs: "ray.data.Dataset", drops: "ray.data.Dataset",
                      sep: str, count_col: str, num_partitions: int
                      ) -> "ray.data.Dataset":
    """Rebuild every document's ``text`` with the dropped ``(doc_id,
    idx)`` line occurrences removed, appending ``count_col`` (dropped
    lines per doc).  Shared tail of :func:`line_dedup` and
    :func:`strip_boilerplate`: the packed per-doc drop lists broadcast
    below ``DROP_LISTS_BROADCAST_MAX`` dropped docs, else a left-outer
    hash join — document text moves at most once either way."""
    from apollo_ray.util import hash_join

    # metadata-only side (one row per doc WITH drops, text never here);
    # materialize to count — fully-empty shuffle blocks lose their
    # schema through Acero joins (the curate/reps precedent)
    drop_lists = _drop_lists_per_doc(drops, num_partitions).materialize()
    if drop_lists.count() == 0:
        def passthrough(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                count_col,
                pa.array(np.zeros(batch.num_rows, dtype=np.int64),
                         type=pa.int64()))
        return docs.map_batches(passthrough, batch_format="pyarrow")
    def _rebuild_batch(batch: pa.Table, blobs: list) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out_t: list[str] = []
        n_dup = np.zeros(len(texts), dtype=np.int64)
        for i, (t, b) in enumerate(zip(texts, blobs)):
            if not b:
                out_t.append(t)
                continue
            di = np.frombuffer(b, dtype=np.int64)
            parts = t.split(sep)
            mask = np.ones(len(parts), dtype=bool)
            mask[di] = False
            n_dup[i] = len(di)
            out_t.append(sep.join(p for p, m in zip(parts, mask) if m))
        keep_cols = [c for c in batch.column_names
                     if c not in ("text", "drop_idx")]
        out = {c: batch.column(c) for c in keep_cols}
        out["text"] = pa.array(out_t, type=pa.string())
        out[count_col] = pa.array(n_dup, type=pa.int64())
        return pa.table(out)

    n_dropped_docs = drop_lists.count()
    if n_dropped_docs <= DROP_LISTS_BROADCAST_MAX:
        # broadcast the packed per-doc drop indices and rebuild with a
        # searchsorted lookup: document text never enters ANY shuffle
        # (the curate rep-id precedent; also sidesteps Acero's
        # intermittent failure on schema-less empty shuffle blocks,
        # seen at sf0.1 through the left-outer join)
        import ray
        ids_l, blobs_l = [], []
        for b in drop_lists.iter_batches(batch_format="pyarrow"):
            ids_l.append(np.asarray(b.column("doc_id"), dtype=np.int64))
            blobs_l.extend(b.column("drop_idx").to_pylist())
        ids = np.concatenate(ids_l)
        order = np.argsort(ids, kind="stable")
        blob_arr = np.asarray(blobs_l, dtype=object)[order]
        drops_ref = ray.put((ids[order], blob_arr))

        def rebuild_bcast(batch: pa.Table, drops_ref=drops_ref) -> pa.Table:
            import ray as _ray
            ids_s, blob_s = _ray.get(drops_ref)
            d = np.asarray(batch.column("doc_id").cast(pa.int64()))
            i = np.searchsorted(ids_s, d)
            hit = (i < len(ids_s))
            hit[hit] &= ids_s[i[hit]] == d[hit]
            blobs = [blob_s[j] if h else None
                     for h, j in zip(hit, np.minimum(i, len(ids_s) - 1))]
            return _rebuild_batch(batch, blobs)

        return docs.map_batches(rebuild_bcast, batch_format="pyarrow")

    joined = hash_join(docs, drop_lists, on=("doc_id",),
                       join_type="left_outer",
                       num_partitions=num_partitions)

    def rebuild(batch: pa.Table) -> pa.Table:
        return _rebuild_batch(batch, batch.column("drop_idx").to_pylist())

    return joined.map_batches(rebuild, batch_format="pyarrow")


def line_dedup_sql(min_len: int = 1, sep_sql: str = "chr(10)") -> str:
    """DuckDB oracle reproducing :func:`line_dedup` byte-for-byte on
    the ``documents`` table (parallel ``unnest`` zips line with index;
    ``row_number`` over the raw line = first-occurrence rule; docs
    whose every line was dropped come back via the left join).
    ``sep_sql`` mirrors the engine's ``sep`` — e.g.
    ``"chr(10)||chr(10)"`` for paragraph granularity."""
    return f"""
        WITH l AS (
          SELECT doc_id,
                 unnest(split(text, {sep_sql})) AS line,
                 unnest(range(len(split(text, {sep_sql})))) AS idx
          FROM documents
        ),
        r AS (
          SELECT doc_id, idx, line,
                 length(line) >= {min_len} AS elig,
                 row_number() OVER (PARTITION BY line
                                    ORDER BY doc_id, idx) AS rn
          FROM l
        ),
        kept AS (
          SELECT doc_id, idx, line FROM r WHERE NOT elig OR rn = 1
        ),
        agg AS (
          SELECT doc_id,
                 string_agg(line, {sep_sql} ORDER BY idx) AS text,
                 count(*) AS n_kept
          FROM kept GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(a.text, '') AS text,
               CAST(len(split(d.text, {sep_sql})) - coalesce(a.n_kept, 0)
                    AS BIGINT) AS n_dup_lines
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """


def strip_boilerplate(docs: "ray.data.Dataset", min_df: int = 2,
                      scope_col: str | None = None, min_len: int = 1,
                      num_partitions: int = 64, sep: str = "\n"
                      ) -> "ray.data.Dataset":
    """Frequent-line (boilerplate) removal — the ccnet / RefinedWeb
    companion to :func:`line_dedup` with the OPPOSITE drop rule: a line
    whose occurrence count within ``scope_col`` (e.g. the source/host
    column; ``None`` = corpus-global) reaches ``min_df`` is boilerplate
    (nav bars, footers, cookie banners repeat on every page of a site)
    and EVERY occurrence is removed — including the first, which
    ``line_dedup`` would keep.  Documents are rebuilt from their
    surviving lines; lines shorter than ``min_len`` codepoints are
    exempt (always kept).

    Scale shape (identical to ``line_dedup``): one shuffle keyed on
    the 63-bit (scope, line) hash — 24-byte occurrence rows, line text
    never moves — one tiny per-doc drop-list shuffle, then a broadcast
    (or, above ``DROP_LISTS_BROADCAST_MAX``, one hash join) rebuild
    pass where document text moves at most once.  Per-scope frequency
    is exact because all occurrences of a (scope, line) key land in
    one partition.  Returns the ``docs`` schema with ``text``
    rewritten plus ``n_boiler_lines``.
    """
    def occurrences(batch: pa.Table) -> pa.Table:
        return _line_occurrences(batch, sep, min_len, num_partitions,
                                 scope_col=scope_col)

    def frequent_occurrences(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "idx": pa.array([], type=pa.int64())})
        lh = np.asarray(group.column("lh"), dtype=np.int64)
        d = np.asarray(group.column("doc_id"), dtype=np.int64)
        ix = np.asarray(group.column("idx"), dtype=np.int64)
        order = np.argsort(lh, kind="stable")
        lh_s = lh[order]
        first = np.empty(len(lh_s), dtype=bool)
        first[0] = True
        first[1:] = lh_s[1:] != lh_s[:-1]
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, len(lh_s)))
        boiler = np.repeat(counts >= min_df, counts)
        keep = order[boiler]
        return pa.table({"doc_id": pa.array(d[keep], type=pa.int64()),
                         "idx": pa.array(ix[keep], type=pa.int64())})

    drops = docs.map_batches(occurrences, batch_format="pyarrow") \
        .groupby("pkey").map_groups(frequent_occurrences,
                                    batch_format="pyarrow")
    return _apply_drop_lists(docs, drops, sep, "n_boiler_lines",
                             num_partitions)


def strip_boilerplate_sql(min_df: int = 2, scope_sql: str = "source",
                          min_len: int = 1, sep_sql: str = "chr(10)",
                          table: str = "documents") -> str:
    """DuckDB oracle reproducing :func:`strip_boilerplate`
    byte-for-byte on a ``documents``-shaped table (``scope_sql`` is a
    SQL expression for the scope key, e.g. a column name or ``"''"``
    for corpus-global)."""
    return f"""
        WITH l AS (
          SELECT doc_id, {scope_sql} AS scope,
                 unnest(split(text, {sep_sql})) AS line,
                 unnest(range(len(split(text, {sep_sql})))) AS idx
          FROM {table}
        ),
        c AS (
          SELECT scope, line, count(*) AS df
          FROM l WHERE length(line) >= {min_len}
          GROUP BY scope, line
        ),
        kept AS (
          SELECT l.doc_id, l.idx, l.line
          FROM l LEFT JOIN c ON l.scope = c.scope AND l.line = c.line
          WHERE length(l.line) < {min_len} OR coalesce(c.df, 0) < {min_df}
        ),
        agg AS (
          SELECT doc_id,
                 string_agg(line, {sep_sql} ORDER BY idx) AS text,
                 count(*) AS n_kept
          FROM kept GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(a.text, '') AS text,
               CAST(len(split(d.text, {sep_sql})) - coalesce(a.n_kept, 0)
                    AS BIGINT) AS n_boiler_lines
        FROM {table} d LEFT JOIN agg a USING (doc_id)
    """


# ---------------------------------------------------------------------------
# normalize_text: Unicode/whitespace canonicalization (the fix-encoding
# step that precedes hashing in every web-corpus pipeline; the reference
# normalizes keys the same spirit-wise in apollo/bags.py before hashing)

_CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
_SPACE_RUN_RE = r"[ \t]+"
_OUTER_WS_RE = r"^\s+|\s+$"


def normalize_text_array(text: pa.Array) -> pa.Array:
    """Deterministic text canonicalization, in order:

    1. Unicode NFC composition (skipped vectorized-cheaply for pure-
       ASCII rows: ``binary_length == utf8_length`` iff ASCII);
    2. line endings: ``\\r\\n`` / lone ``\\r`` -> ``\\n``;
    3. strip C0 control chars except ``\\t``/``\\n`` (and DEL);
    4. collapse space/tab runs to one space;
    5. trim outer whitespace.

    Steps 2-5 are single RE2 passes over the whole batch; step 1 runs
    per-row Python ``unicodedata.normalize`` only on the non-ASCII
    minority.  Byte-for-byte reproducible in DuckDB
    (:func:`normalize_text_sql`): ``nfc_normalize`` is utf8proc NFC,
    identical to CPython's UCD on composition-stable sequences, and the
    regex passes share RE2 on both sides.
    """
    import unicodedata
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    non_ascii = pc.not_equal(pc.binary_length(text), pc.utf8_length(text))
    idx = np.flatnonzero(non_ascii.fill_null(False).to_numpy(
        zero_copy_only=False))
    if len(idx):
        rows = text.take(pa.array(idx)).to_pylist()
        fixed = [unicodedata.normalize("NFC", s) if s is not None else None
                 for s in rows]
        buf = np.asarray(text.to_pylist(), dtype=object)
        buf[idx] = fixed
        text = pa.array(buf.tolist(), type=pa.string())
    t = pc.replace_substring_regex(text, r"\r\n?", "\n")
    t = pc.replace_substring_regex(t, _CTRL_RE, "")
    t = pc.replace_substring_regex(t, _SPACE_RUN_RE, " ")
    t = pc.replace_substring_regex(t, _OUTER_WS_RE, "")
    return t


def normalize_text(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, norm_text, changed) — canonicalized text plus a
    did-anything-change flag.  Pure map pass: streams, no shuffle, no
    state; NFC runs per-row only on non-ASCII rows."""

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        norm = normalize_text_array(text)
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "norm_text": norm,
            "changed": pc.not_equal(norm, text),
        })

    return docs.map_batches(f, batch_format="pyarrow")


def normalize_expr_sql(text_expr: str) -> str:
    """The SQL expression reproducing :func:`normalize_text_array`
    byte-for-byte over ``text_expr`` — the single source of truth for
    every oracle that normalizes (``normalize_text_sql``,
    ``merge.normalized_exact_dedup_sql``)."""
    return (f"regexp_replace(regexp_replace(regexp_replace("
            f"regexp_replace(nfc_normalize({text_expr}), '\\r\\n?', "
            f"chr(10), 'g'), '{_CTRL_RE}', '', 'g'), "
            f"'{_SPACE_RUN_RE}', ' ', 'g'), '{_OUTER_WS_RE}', '', 'g')")


def normalize_text_sql(table: str = "documents",
                       text_sql: str = "text") -> str:
    """DuckDB oracle reproducing :func:`normalize_text`
    byte-for-byte (``text_sql`` is a SQL expression for the raw text
    column, so drivers can inject messy test strings on both sides)."""
    return f"""
        WITH raw AS (SELECT doc_id, {text_sql} AS t0 FROM {table}),
        n AS (
          SELECT doc_id, t0,
            {normalize_expr_sql('t0')} AS norm_text
          FROM raw)
        SELECT doc_id, norm_text, norm_text <> t0 AS changed FROM n
    """


def chunk_documents(docs: "ray.data.Dataset", size: int = 2048,
                    overlap: int = 0) -> "ray.data.Dataset":
    """(doc_id, chunk_id, n_chunks, chunk_text) — fixed-size codepoint
    windows with ``overlap`` (stride = size - overlap): the standard
    pre-embedding / context-window splitter of a training-data or RAG
    pipeline.  Chunk i covers ``[i*stride, i*stride + size)``;
    n_chunks = 1 if len <= size else ceil((len-size)/stride)+1; empty
    docs emit no rows.

    Scale shape: pure map (flat_map-style inside map_batches), no
    shuffle; output rows ~ input chars / stride.  The per-doc Python
    loop is memcpy-bound string slicing (chunking IS O(total chars)
    copying); offsets are computed vectorized.  Codepoint semantics
    match DuckDB ``substring`` (1-indexed, codepoints) exactly.
    """
    if overlap >= size or size <= 0 or overlap < 0:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        ids = batch.column("doc_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        lens = pc.utf8_length(text).fill_null(0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n_chunks = np.where(
            lens == 0, 0,
            np.where(lens <= size, 1, (lens - size + stride - 1)
                     // stride + 1)).astype(np.int64)
        out_ids = np.repeat(ids, n_chunks)
        out_n = np.repeat(n_chunks, n_chunks)
        total = int(n_chunks.sum())
        starts = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(n_chunks)[:-1])), n_chunks)
        chunks: list = []
        texts = text.to_pylist()
        for t, k in zip(texts, n_chunks):
            if k:
                chunks.extend(
                    (t or "")[i * stride:i * stride + size]
                    for i in range(int(k)))
        return pa.table({
            "doc_id": pa.array(out_ids, type=pa.int64()),
            "chunk_id": pa.array(starts, type=pa.int64()),
            "n_chunks": pa.array(out_n, type=pa.int64()),
            "chunk_text": pa.array(chunks, type=pa.string()),
        })

    return docs.map_batches(f, batch_format="pyarrow")


def chunk_documents_sql(size: int = 2048, overlap: int = 0,
                        table: str = "documents") -> str:
    """DuckDB oracle for :func:`chunk_documents` — lateral
    ``generate_series`` over the same chunk-count formula;
    ``substring`` is codepoint-based and 1-indexed like Python
    slicing."""
    stride = size - overlap
    return f"""
        WITH c AS (
          SELECT doc_id, text, length(text) AS n,
                 CASE WHEN length(text) = 0 THEN 0
                      WHEN length(text) <= {size} THEN 1
                      ELSE (length(text) - {size} + {stride} - 1)
                           // {stride} + 1 END AS k
          FROM {table})
        , e AS (
          SELECT doc_id, text, k,
                 unnest(generate_series(0, CAST(k - 1 AS BIGINT))) AS i
          FROM c)
        SELECT doc_id,
               CAST(i AS BIGINT) AS chunk_id,
               CAST(k AS BIGINT) AS n_chunks,
               substring(text, CAST(i * {stride} + 1 AS BIGINT),
                         {size}) AS chunk_text
        FROM e
    """
