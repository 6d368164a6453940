"""BPE tokenizer training + encoding over a ``documents`` table —
the tokenizer-training step of a training-data pipeline (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword
Units").

Distribution shape: the ONLY distributed pass is the word-frequency
count (``lm.token_term_freqs`` — per-batch-distinct (token, n) rows,
one vocabulary shuffle; occurrences never move).  The merge loop runs
on the driver over that word table — this is how real BPE trainers
work too (the state is O(distinct words), not O(corpus)); at web
scale the table is capped with ``vocab_cap`` (distributed
sort+limit, the ``unigram_score`` pattern) and the lost tail mass is
by construction the least-frequent words.  Encoding is map-only with
the tiny merge list broadcast once.

Merge semantics — declared variant: a merge step rewrites the padded
space-joined symbol string with one ``str.replace(" l r ", " lr ")``
pass (leftmost non-overlapping, delimiter consumed).  This differs
from Sennrich's list-walk ONLY on runs of the same pair inside one
word ("aaaa" with merge (a,a) gives [aa, a, aa, a]-style splits
instead of [aa, aa]) — chosen because DuckDB ``replace`` has exactly
these semantics, which makes the ENTIRE train + encode pipeline
value-exact against the generated SQL oracle (``bpe_sql``).  Pair
counts are over all symbol adjacencies (runs counted per adjacency),
ties broken by count DESC then pair string ascending (binary UTF-8
order == Python codepoint order).  No end-of-word marker.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _train_from_word_counts(words: list[str], counts: list[int],
                            num_merges: int) -> list[tuple]:
    """Driver-side merge loop over the (distinct-word, count) table.
    Returns [(rank, left, right, pair_count)]; stops early when no
    pair remains."""
    reprs = [" " + " ".join(list(w)) + " " for w in words]
    merges: list[tuple] = []
    for rank in range(1, num_merges + 1):
        pair_n: dict[tuple, int] = {}
        for r, n in zip(reprs, counts):
            sym = r.split()
            for a, b in zip(sym, sym[1:]):
                pair_n[(a, b)] = pair_n.get((a, b), 0) + n
        if not pair_n:
            break
        (left, right), cnt = min(
            pair_n.items(),
            key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
        merges.append((rank, left, right, cnt))
        pat, rep = f" {left} {right} ", f" {left}{right} "
        reprs = [r.replace(pat, rep) for r in reprs]
    return merges


def _word_table(docs: "ray.data.Dataset", vocab_cap: int | None,
                num_partitions: int) -> tuple[list[str], list[int]]:
    from apollo_ray.functions.lm import token_term_freqs
    tf = token_term_freqs(docs, num_partitions)
    if vocab_cap is not None:
        rows = tf.sort(["n", "token"], descending=[True, False]) \
            .limit(vocab_cap).take_all()
    else:
        rows = tf.take_all()              # O(V) — small-corpus path
    return ([r["token"] for r in rows], [r["n"] for r in rows])


def bpe_train(docs: "ray.data.Dataset", num_merges: int = 8,
              vocab_cap: int | None = None,
              num_partitions: int = 64) -> "ray.data.Dataset":
    """(rank, left, right, n) — the learned merge table, rank 1 first."""
    words, counts = _word_table(docs, vocab_cap, num_partitions)
    merges = _train_from_word_counts(words, counts, num_merges)
    return ray.data.from_arrow(pa.table({
        "rank": pa.array([m[0] for m in merges], type=pa.int64()),
        "left_sym": pa.array([m[1] for m in merges], type=pa.string()),
        "right_sym": pa.array([m[2] for m in merges], type=pa.string()),
        "n": pa.array([m[3] for m in merges], type=pa.int64()),
    }))


def _encode_n_subwords(token: str, merges: list[tuple]) -> int:
    r = " " + " ".join(list(token)) + " "
    for _, left, right, _ in merges:
        r = r.replace(f" {left} {right} ", f" {left}{right} ")
    return len(r.split())


def bpe_encode_counts(docs: "ray.data.Dataset", num_merges: int = 8,
                      vocab_cap: int | None = None,
                      merges: list[tuple] | None = None,
                      num_partitions: int = 64) -> "ray.data.Dataset":
    """(doc_id, n_bpe_tokens) — subword count per document under the
    learned merge table (trains first unless ``merges`` is given).
    The token budget estimate a data-mixing plan needs, under a real
    learned tokenizer instead of the ``bpe_ish`` regex heuristic.

    Map-only scoring: merges broadcast once via ``ray.put``; per batch
    the merge chain runs once per batch-DISTINCT token
    (dictionary-encode + gather), per-doc sums via ``reduceat``."""
    from apollo_ray.functions.textstats import _split_tokens
    if merges is None:
        words, counts = _word_table(docs, vocab_cap, num_partitions)
        merges = _train_from_word_counts(words, counts, num_merges)
    merges_ref = ray.put(list(merges))

    def score(batch: pa.Table) -> pa.Table:
        mg = ray.get(merges_ref)
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        tok_lists = _split_tokens(text)
        n_tok = pc.list_value_length(tok_lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = tok_lists.flatten()
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dict_n = np.fromiter(
            (_encode_n_subwords(t, mg) for t in
             enc.dictionary.to_pylist()),
            dtype=np.int64, count=len(enc.dictionary))
        per_tok = dict_n[codes] if len(codes) else np.zeros(0, np.int64)
        offsets = np.zeros(len(n_tok) + 1, dtype=np.int64)
        np.cumsum(n_tok, out=offsets[1:])
        sums = np.zeros(len(n_tok), dtype=np.int64)
        if len(per_tok):
            sums = np.add.reduceat(np.append(per_tok, 0),
                                   offsets[:-1])[:len(n_tok)]
            sums[n_tok == 0] = 0
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "n_bpe_tokens": pa.array(sums, type=pa.int64()),
        })

    return docs.map_batches(score, batch_format="pyarrow")


_WORDS_CTE = r"""
            tok AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\s+')) AS w
              FROM documents WHERE length(trim(text)) > 0),
            w0 AS (
              SELECT w,
                     ' ' || array_to_string(regexp_extract_all(w, '.'), ' ')
                         || ' ' AS r0,
                     count(*) AS n
              FROM tok GROUP BY w)"""


def _merge_chain_sql(num_merges: int) -> str:
    """CTE chain p{i}/b{i}/w{i} reproducing the training loop: pair
    counts over all adjacencies, best by (cnt DESC, pair ASC), one
    ``replace`` pass per iteration.

    Robust to EXHAUSTED merges (fewer real pairs than ``num_merges``,
    matching the engine's early loop exit): ``b{i}`` stays empty then
    (so the train oracle emits no row for step i), while ``w{i}``
    reads the pair through a scalar subquery coalesced to a sentinel
    that cannot match — when ``p{i}`` is empty every word is a single
    symbol, so no ``' x y '`` pattern exists in any ``r{i-1}`` and the
    replace is a no-op regardless of the sentinel's content."""
    parts = [_WORDS_CTE]
    noop = "chr(1) || ' ' || chr(1)"
    for i in range(1, num_merges + 1):
        pair_i = f"coalesce((SELECT pair FROM b{i}), {noop})"
        parts.append(f"""
            p{i} AS (
              SELECT sym[j] || ' ' || sym[j + 1] AS pair, sum(n) AS cnt
              FROM (SELECT regexp_split_to_array(trim(r{i - 1}, ' '), ' ')
                        AS sym, n FROM w{i - 1}),
                   LATERAL (SELECT unnest(range(1, len(sym))) AS j)
              GROUP BY 1),
            b{i} AS (
              SELECT pair, CAST(cnt AS BIGINT) AS cnt FROM p{i}
              ORDER BY cnt DESC, pair LIMIT 1),
            w{i} AS (
              SELECT w,
                     replace(r{i - 1}, ' ' || {pair_i} || ' ',
                             ' ' || replace({pair_i}, ' ', '') || ' ')
                         AS r{i},
                     n
              FROM w{i - 1})""")
    return ",".join(parts)


def bpe_train_sql(num_merges: int = 8) -> str:
    """Full-value oracle for :func:`bpe_train`."""
    selects = [
        f"SELECT {i} AS rank, split_part(pair, ' ', 1) AS left_sym,"
        f" split_part(pair, ' ', 2) AS right_sym, cnt AS n FROM b{i}"
        for i in range(1, num_merges + 1)]
    return ("WITH" + _merge_chain_sql(num_merges) + "\n            "
            + "\n            UNION ALL ".join(selects))


def bpe_encode_sql(num_merges: int = 8) -> str:
    """Full-value oracle for :func:`bpe_encode_counts`."""
    n = num_merges
    return ("WITH" + _merge_chain_sql(n) + f""",
            nsub AS (
              SELECT w, len(regexp_split_to_array(trim(r{n}, ' '), ' '))
                         AS n_sub
              FROM w{n}),
            per_doc AS (
              SELECT tok.doc_id, sum(nsub.n_sub) AS t
              FROM tok JOIN nsub ON tok.w = nsub.w
              GROUP BY tok.doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(per_doc.t, 0) AS BIGINT) AS n_bpe_tokens
            FROM documents d
            LEFT JOIN per_doc ON per_doc.doc_id = d.doc_id""")
