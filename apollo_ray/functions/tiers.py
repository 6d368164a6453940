"""Tiered web-corpus deduplication — the cost-ordered cascade.

Production webtext dedup runs cheap exact tiers before the expensive
similarity tier so the signature hashing only ever sees the already-
thinned corpus:

    tier 1 ``exact``   — byte-identical extracted text (hash collapse;
                         the reference's exact-duplicate election,
                         /root/reference/apollo/bags.py semantics);
    tier 2 ``url``     — identical *canonical* URL among tier-1
                         survivors (recrawl spellings of one page:
                         ``functions/urls.py`` rules);
    tier 3 ``minhash`` — near-duplicate clusters among tier-2
                         survivors (the flagship MinHash-LSH pipeline,
                         ``pipelines/dedup.py``), keeping one
                         representative (min doc_id) per cluster;
    tier 4 ``semantic`` — OPTIONAL (pass ``embeddings=``): SemDeDup
                         k-means + within-cluster cosine drop rule
                         over the tier-3 survivors' embeddings
                         (``functions/semdedup.py``), catching
                         paraphrase-level duplicates the text tiers
                         cannot see.  Docs without an embedding pass
                         through unjudged.

Scale shape (doc/SCALE.md conventions): tiers 1–2 shuffle ONLY
metadata rows ``(doc_id:int64, text_hash:int64, url_canon:string)`` —
the document payload never moves; each tier is one pkey groupby with
a vectorized first-row-per-segment election.  Tier 3 is the flagship
pipeline over the (much smaller) survivor set.  Survivor chaining
filters the payload table with the broadcast + ``np.searchsorted``
pattern below ``rep_broadcast_max`` ids and a pkey hash join above it
(the same rule as ``pipelines/curate.py``).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from apollo_ray.hashing import hash_utf8, mix_to_partition

# same rule as pipelines/curate.REP_BROADCAST_MAX: 8 B/id, 400 MB at cap
REP_BROADCAST_MAX = 50_000_000


def _meta_pass(docs: "ray.data.Dataset", url_col: str, text_col: str
               ) -> "ray.data.Dataset":
    """(doc_id, text_hash, url_canon) — one map pass, payload dropped."""
    from apollo_ray.functions.urls import canonicalize_url_array

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        from apollo_ray.hashing import hash_utf8_batch
        filled = pc.fill_null(batch.column(text_col), "")
        th = pa.array(hash_utf8_batch(filled), type=pa.int64())
        canon, _host = canonicalize_url_array(batch.column(url_col))
        return pa.table({"doc_id": batch.column("doc_id").cast(pa.int64()),
                         "text_hash": th, "url_canon": canon})

    return docs.map_batches(f, batch_format="pyarrow")


def _winners(meta: "ray.data.Dataset", key_col: str, num_partitions: int
             ) -> "ray.data.Dataset":
    """First (min doc_id) row per ``key_col`` group — pkey pattern.

    One metadata shuffle; within each partition one sort + segment cut
    (vectorized, no per-group Python), carrying every column of the
    winning row through."""

    def add_pkey(batch: pa.Table) -> pa.Table:
        col = batch.column(key_col)
        if pa.types.is_integer(col.type):
            k = np.asarray(col, dtype=np.int64)
        else:
            import pyarrow.compute as pc
            from apollo_ray.hashing import hash_utf8_batch
            k = hash_utf8_batch(pc.fill_null(col, ""))
        return batch.append_column(
            "pkey", pa.array(mix_to_partition(k, num_partitions),
                             type=pa.int32()))

    def first_per_key(group: pa.Table) -> pa.Table:
        out_cols = [c for c in group.column_names if c != "pkey"]
        if group.num_rows == 0:
            return group.select(out_cols)
        t = group.sort_by([(key_col, "ascending"), ("doc_id", "ascending")])
        keys = t.column(key_col).combine_chunks()
        n = len(keys)
        first = np.ones(n, dtype=bool)
        if n > 1:
            import pyarrow.compute as pc
            first[1:] = np.asarray(
                pc.invert(pc.equal(keys.slice(1), keys.slice(0, n - 1))))
        return t.filter(pa.array(first)).select(out_cols)

    return meta.map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(first_per_key, batch_format="pyarrow")


def _filter_to_ids(docs: "ray.data.Dataset", ids: "ray.data.Dataset",
                   num_partitions: int,
                   rep_broadcast_max: int = REP_BROADCAST_MAX
                   ) -> "ray.data.Dataset":
    """Keep ``docs`` rows whose doc_id appears in ``ids``."""
    n = ids.count()
    if n > rep_broadcast_max:
        from apollo_ray.util import hash_join
        return hash_join(docs, ids.select_columns(["doc_id"]),
                         on=("doc_id",), num_partitions=num_partitions)
    import ray
    arrs = [b["doc_id"] for b in
            ids.select_columns(["doc_id"]).iter_batches(batch_format="numpy")]
    ref = ray.put(np.sort(np.concatenate(arrs)) if arrs
                  else np.empty(0, dtype=np.int64))

    def keep(batch: pa.Table, ref=ref) -> pa.Table:
        import ray as _ray
        arr = _ray.get(ref)
        d = np.asarray(batch.column("doc_id"), dtype=np.int64)
        i = np.searchsorted(arr, d)
        hit = i < len(arr)
        hit[hit] &= arr[i[hit]] == d[hit]
        return batch.filter(pa.array(hit))

    return docs.map_batches(keep, batch_format="pyarrow")


def _drop_ids(docs: "ray.data.Dataset", ids: np.ndarray
              ) -> "ray.data.Dataset":
    """Drop ``docs`` rows whose doc_id is in the (sorted, broadcast)
    id array — the anti-join twin of :func:`_filter_to_ids`, used when
    the DROPPED side is the small one (semantic tier: only judged-and-
    rejected ids move, docs without an embedding pass through)."""
    import ray
    ref = ray.put(np.sort(np.asarray(ids, dtype=np.int64)))

    def keep(batch: pa.Table, ref=ref) -> pa.Table:
        import ray as _ray
        arr = _ray.get(ref)
        d = np.asarray(batch.column("doc_id"), dtype=np.int64)
        i = np.searchsorted(arr, d)
        hit = i < len(arr)
        hit[hit] &= arr[i[hit]] == d[hit]
        return batch.filter(pa.array(~hit))

    return docs.map_batches(keep, batch_format="pyarrow")


def tiered_dedup(docs: "ray.data.Dataset", cfg=None,
                 url_col: str = "url", text_col: str = "text",
                 num_partitions: int = 16,
                 rep_broadcast_max: int = REP_BROADCAST_MAX,
                 embeddings: "ray.data.Dataset | None" = None,
                 emb_id_col: str = "vec_id", emb_col: str = "embedding",
                 semantic_k: int = 8, semantic_threshold: float = 0.95,
                 semantic_iters: int = 2) -> dict[str, Any]:
    """Run the exact → url → minhash (→ semantic) cascade over
    ``docs``.

    ``docs`` needs (doc_id:int64, ``url_col``:string, ``text_col``:
    string); extra columns pass through to the survivor output.

    With ``embeddings`` (an (``emb_id_col``:int64, ``emb_col``:
    list<float>) table keyed by doc id), a fourth SemDeDup tier runs
    over the tier-3 survivors: k-means + within-cluster cosine drop
    rule (``functions/semdedup.py`` — Abbas et al. 2023), catching the
    semantic near-duplicates the text tiers cannot see.  Docs without
    an embedding row pass through unjudged; only the judged-and-
    rejected ids are broadcast for the anti-filter (the dropped side
    is the small one).

    Returns ``{"stats": pa.Table, "survivors": Dataset,
    "clusters": Dataset, "metrics": dict}``: ``stats`` is the per-tier
    rollup (tier_ord, tier, n_in, n_removed, n_out, ok) where the two
    SQL-expressible tiers carry exact counts and the minhash/semantic
    tiers carry ``-1`` sentinels plus an engine-computed invariant
    flag (real counts live in ``metrics``); ``survivors`` is the
    curated payload table (one representative per near-dup cluster);
    ``clusters`` the (doc_id, cc_id) labels over tier-2 survivors.
    """
    from apollo_ray.config import DedupConfig
    from apollo_ray.pipelines.curate import cluster_representatives
    from apollo_ray.pipelines.dedup import run_dedup

    cfg = cfg or DedupConfig(feature_dim_log2=14)
    n0 = docs.count()
    meta = _meta_pass(docs, url_col, text_col).materialize()
    w1 = _winners(meta, "text_hash", num_partitions).materialize()
    n1 = w1.count()
    w2 = _winners(w1, "url_canon", num_partitions).materialize()
    n2 = w2.count()

    surv2 = _filter_to_ids(docs, w2, num_partitions, rep_broadcast_max)

    def as_docs_schema(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        from apollo_ray.hashing import hash_utf8_batch
        names = set(batch.column_names)
        n = batch.num_rows
        text_a = batch.column(text_col)
        cols = {
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "url": (batch.column(url_col) if url_col in names else
                    batch.column("doc_id").cast(pa.string())),
            "lang": (batch.column("lang") if "lang" in names
                     else pa.array(["und"] * n, type=pa.string())),
            "text": text_a.cast(pa.string()),
            "text_hash": pa.array(
                hash_utf8_batch(pc.fill_null(text_a, "")),
                type=pa.int64()),
        }
        return pa.table(cols)

    docs_ds = surv2.map_batches(as_docs_schema, batch_format="pyarrow")
    out = run_dedup(None, cfg, docs_ds=docs_ds,
                    num_partitions=num_partitions)
    clusters = out["clusters"]
    n_labeled = clusters.count()
    reps = cluster_representatives(clusters, num_partitions).materialize()
    n3 = reps.count()
    survivors = _filter_to_ids(surv2, reps, num_partitions,
                               rep_broadcast_max)

    ok3 = int(n_labeled == n2 and 1 <= n3 <= n2) if n2 else int(n3 == 0)
    tiers = [(1, "exact", n0, n0 - n1, n1, int(n1 <= n0)),
             (2, "url", n1, n1 - n2, n2, int(n2 <= n1)),
             (3, "minhash", n2, -1, -1, ok3)]
    metrics = {"n_docs": n0, "n_exact": n1, "n_url": n2, "n_minhash": n3}

    if embeddings is not None:
        from apollo_ray.functions.semdedup import semdedup
        emb = embeddings
        if emb_id_col != "doc_id":
            emb = emb.map_batches(
                lambda b: b.rename_columns(
                    ["doc_id" if c == emb_id_col else c
                     for c in b.column_names]),
                batch_format="pyarrow")
        emb3 = _filter_to_ids(emb, reps, num_partitions,
                              rep_broadcast_max)
        verdicts = semdedup(emb3, k=semantic_k,
                            threshold=semantic_threshold,
                            iters=semantic_iters, id_col="doc_id",
                            col=emb_col, num_partitions=num_partitions)
        import pyarrow.compute as pc
        dropped_chunks = [
            np.asarray(b.filter(pc.invert(b.column("keep")))
                       .column("doc_id"), dtype=np.int64)
            for b in verdicts.select_columns(["doc_id", "keep"])
            .iter_batches(batch_format="pyarrow")]
        dropped = (np.concatenate(dropped_chunks) if dropped_chunks
                   else np.empty(0, dtype=np.int64))
        n4 = n3 - len(dropped)
        survivors = _drop_ids(survivors, dropped)
        ok4 = int(0 <= len(dropped) <= n3 and (n4 >= 1 or n3 == 0))
        # -1 sentinels like the minhash tier: the real n3/n4 counts are
        # not SQL-derivable (they live in metrics); ok carries the
        # engine-verified invariant
        tiers.append((4, "semantic", -1, -1, -1, ok4))
        metrics["n_semantic"] = n4

    stats = pa.table({
        "tier_ord": pa.array([t[0] for t in tiers], type=pa.int64()),
        "tier": pa.array([t[1] for t in tiers], type=pa.string()),
        "n_in": pa.array([t[2] for t in tiers], type=pa.int64()),
        "n_removed": pa.array([t[3] for t in tiers], type=pa.int64()),
        "n_out": pa.array([t[4] for t in tiers], type=pa.int64()),
        "ok": pa.array([t[5] for t in tiers], type=pa.int64()),
    })
    return {"stats": stats, "survivors": survivors, "clusters": clusters,
            "metrics": metrics}


def tiered_dedup_sql(table: str = "documents",
                     semantic: bool = False) -> str:
    """DuckDB oracle for the per-tier rollup over the synthetic crawl
    urls (``functions/urls.synthetic_crawl_urls``, derived identically
    on both sides because the driver tables carry no url column).

    Tier-1/2 counts are exact SQL (group by text; arg_min carries the
    winner's canonical url); the minhash tier emits the same ``-1``
    sentinels and constant-1 invariant flag the engine computes from
    its real clustering (``minhash_dedup_invariants`` /
    ``minhash_cluster_stats`` carry the strong per-cluster checks)."""
    from apollo_ray.functions.urls import _CANON_SQL, _SYNTH_URL_SQL
    sem = ("""
          UNION ALL
          SELECT 4, 'semantic', CAST(-1 AS BIGINT), -1, -1, 1 FROM c2"""
           if semantic else "")
    return (
        f"WITH u AS (SELECT doc_id, {_SYNTH_URL_SQL} AS url FROM {table}),"
        + _CANON_SQL + f""",
        m AS (SELECT d.doc_id, d.text, c.url_canon
              FROM {table} d JOIN canon c ON c.doc_id = d.doc_id),
        w1 AS (SELECT arg_min(url_canon, doc_id) AS url_canon
               FROM m GROUP BY text),
        c0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM m),
        c1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM w1),
        c2 AS (SELECT CAST(count(DISTINCT url_canon) AS BIGINT) AS n
               FROM w1)
        SELECT * FROM (
          SELECT CAST(1 AS BIGINT) AS tier_ord, 'exact' AS tier,
                 c0.n AS n_in, c0.n - c1.n AS n_removed, c1.n AS n_out,
                 CAST(1 AS BIGINT) AS ok
          FROM c0, c1
          UNION ALL
          SELECT 2, 'url', c1.n, c1.n - c2.n, c2.n, 1 FROM c1, c2
          UNION ALL
          SELECT 3, 'minhash', c2.n, -1, -1, 1 FROM c2{sem})
        """)
