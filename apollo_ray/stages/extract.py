"""Extract stage: pages -> docs.

The webtext analog of the reference's corpus ingestion
(``apollo/bags.py:52-57`` delegates repo->file extraction to the
external engine; our input is already a Parquet ``pages`` table per
BASELINE.json ``input_hint``).  Stateless ``map_batches`` tasks:

    (url, warc_ts, html, lang) -> (doc_id, url, warc_ts, lang, text, text_hash)

- ``doc_id``   = blake2b-64(url)  (replaces the "mode@sha1" string keys,
  ``apollo/query.py:74``)
- ``text``     = deterministic html->text extraction; must byte-equal
  the driver's ``text`` column per url (the per-row invariant)
- ``text_hash`` = blake2b-64(text) — the exact-dedup key (D2: the
  reference collapses identical contents upstream by content sha1,
  ``apollo/bags.py:15``)
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from apollo_ray.config import DedupConfig
from apollo_ray.hashing import hash_utf8_batch
from apollo_ray.kernels.text import extract_text


def _extract_batch(batch: pa.Table) -> pa.Table:
    """Batch-vectorized: columns already in the right shape pass
    through **zero-copy** (no to_pylist/re-encode round trip) and the
    blake2b keys are computed straight over the Arrow utf-8 buffers
    (``hash_utf8_batch``).  Only the html->text extraction itself is a
    per-row loop — C-speed ``bytes.find``/``split``/``join``, measured
    2x faster than the equivalent vectorized RE2 passes."""
    names = set(batch.column_names)
    n = batch.num_rows
    if "html" in names:
        html = batch.column("html").to_pylist()
        text_col = pa.array([extract_text(h) for h in html],
                            type=pa.string())
    else:
        text_col = batch.column("text")
        if isinstance(text_col, pa.ChunkedArray):
            text_col = text_col.combine_chunks()
    if "url" in names:
        url_col = batch.column("url")
        doc_ids = pa.array(hash_utf8_batch(url_col), type=pa.int64())
    else:
        ids = batch.column("doc_id")
        doc_ids = (ids.cast(pa.int64())
                   if ids.type != pa.int64() else ids)
        url_col = doc_ids.cast(pa.string())
    cols: dict = {
        "doc_id": doc_ids,
        "url": url_col,
        "lang": (batch.column("lang") if "lang" in names
                 else pa.array(["und"] * n, type=pa.string())),
        "text": text_col,
        "text_hash": pa.array(hash_utf8_batch(text_col), type=pa.int64()),
    }
    if "warc_ts" in names:
        cols["warc_ts"] = batch.column("warc_ts")
    return pa.table(cols)


def extract_docs(pages: "ray.data.Dataset", cfg: DedupConfig,
                 latest_per_url: bool = False,
                 history_depth: int = 1) -> "ray.data.Dataset":
    """pages -> docs.  ``latest_per_url=True`` additionally keeps only
    the newest ``history_depth`` snapshots per url by ``warc_ts`` (M2,
    the ``--dzhigurda`` history-depth analog keeping the last N
    commits, ``doc/cmd/bags.md:9``) — one extra shuffle."""
    docs = pages.map_batches(_extract_batch, batch_format="pyarrow")
    if latest_per_url:
        import numpy as np
        import pyarrow.compute as pc
        from apollo_ray.hashing import mix_to_partition

        # vectorized pkey pattern: partition by hash(url), then ONE
        # sort + segment-cut per partition (a per-distinct-url pandas
        # call would be billions of Python calls at webtext scale)
        def add_pkey(batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
            return batch.append_column(
                "pkey", pa.array(mix_to_partition(ids, 64), type=pa.int32()))

        def newest_part(group: pa.Table) -> pa.Table:
            out_cols = [c for c in group.column_names if c != "pkey"]
            if group.num_rows == 0:
                return group.select(out_cols)
            t = group.sort_by([("url", "ascending"),
                               ("warc_ts", "ascending"),
                               ("doc_id", "ascending")])
            urls = t.column("url").combine_chunks()
            n = len(urls)
            new_seg = np.ones(n, dtype=bool)
            if n > 1:
                new_seg[1:] = np.asarray(
                    pc.invert(pc.equal(urls.slice(1), urls.slice(0, n - 1))))
            # distance from each row to the END of its url segment:
            # rows with dist < history_depth are the newest N snapshots
            seg_id = np.cumsum(new_seg) - 1
            seg_end = np.zeros(seg_id[-1] + 1, dtype=np.int64)
            np.maximum.at(seg_end, seg_id, np.arange(n, dtype=np.int64))
            keep = (seg_end[seg_id] - np.arange(n)) < history_depth
            return t.filter(pa.array(keep)).select(out_cols)

        docs = docs.map_batches(add_pkey, batch_format="pyarrow") \
            .groupby("pkey").map_groups(newest_part, batch_format="pyarrow")
    return docs


def check_extraction_invariant(pages: "ray.data.Dataset") -> int:
    """Count rows where extracted text != the reference ``text`` column
    (must be 0 on fixture input — the per-row invariant).  Distributed:
    the comparison runs inside map_batches; only the count is collected.
    """
    def _check(batch: pa.Table) -> pa.Table:
        bad = 0
        for h, t in zip(batch.column("html").to_pylist(),
                        batch.column("text").to_pylist()):
            if extract_text(h) != t:
                bad += 1
        return pa.table({"bad": pa.array([bad], type=pa.int64())})

    res = pages.map_batches(_check, batch_format="pyarrow").sum("bad")
    return int(res or 0)
