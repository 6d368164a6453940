"""PII detection / redaction over a text column — the scrub step of a
training-data curation pipeline.

Patterns (emails, IPv4 addresses, simple phone forms) are written in
the RE2 subset that ``pyarrow.compute`` (RE2) and DuckDB (also RE2)
share, so detection counts AND the redacted text are bit-identical
between the engine and the SQL oracle.  Both stages are map-only
Arrow-vectorized ``map_batches`` (no Python loop over rows, no
shuffle); at 100 TB this streams at regex throughput per core.

Counts are computed on the ORIGINAL text per pattern independently
(overlaps may double-count — deliberate and mirrored in SQL);
redaction applies the patterns in the fixed order below, each on the
output of the previous, with ``<EMAIL>``/``<IP>``/``<PHONE>``
placeholders.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# (name, pattern, placeholder) — order matters for redaction (emails
# before phones so the digits of a redacted form can't re-match).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}|\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
)


def pii_stats(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, n_email, n_ipv4, n_phone) occurrence counts per doc."""

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        cols = {"doc_id": batch.column("doc_id").cast(pa.int64())}
        for name, pat, _ in PII_PATTERNS:
            cols["n_" + name] = pc.cast(
                pc.count_substring_regex(text, pattern=pat), pa.int64())
        return pa.table(cols)

    return docs.map_batches(f, batch_format="pyarrow")


def redact_pii(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, clean_text, n_redacted): text with every PII match
    replaced by its placeholder; n_redacted totals the replacements
    (counted pattern-by-pattern on the text as each sees it, matching
    the sequential SQL regexp_replace)."""

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        import numpy as np
        n_red = np.zeros(len(batch), dtype=np.int64)
        for _, pat, repl in PII_PATTERNS:
            n_red += np.asarray(
                pc.count_substring_regex(text, pattern=pat),
                dtype=np.int64)
            text = pc.replace_substring_regex(text, pattern=pat,
                                              replacement=repl)
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "clean_text": text,
            "n_redacted": pa.array(n_red, type=pa.int64()),
        })

    return docs.map_batches(f, batch_format="pyarrow")
