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
