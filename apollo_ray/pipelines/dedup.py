"""The flagship near-dedup pipeline (the whole reference system, D3).

    pages ──extract──▶ docs ──collapse(text_hash)──▶ reps
      ──bags──▶ bags ──wmh (actor pool)──▶ signatures
      ──explode──▶ bands ──groupby(bucket)──▶ star edges
      (∪ exact-member edges) ──[verify]──▶ edges
      ──large★/small★ CC──▶ clusters ──[communities]──▶ communities

Replaces apollo's command sequence ``bags`` -> ``hash`` -> ``cc`` ->
``cmd`` -> ``dumpcmd`` (``apollo/__main__.py:72-207``) — a chain of
batch jobs glued by Cassandra tables and asdf models — with one
resident Ray Data driver program whose stage boundaries are Parquet
checkpoints (``sources/io.py``): ``run()`` re-executes only stages
whose checkpoint is missing or whose (config, input) lineage changed.

Streaming discipline: nothing materializes the corpus on the driver;
stages are lazy ``map_batches`` chains and the only all-to-all
exchanges are the documented shuffles (text_hash collapse, bucket
groupby, CC rounds, final label groupby).
"""

from __future__ import annotations

import logging
import time
from typing import Any

import ray.data

from apollo_ray.config import DedupConfig
from apollo_ray.sources import io as ckpt_io
from apollo_ray.stages.bags import build_bags, collapse_exact, exact_member_edges
from apollo_ray.stages.bands import explode_bands
from apollo_ray.stages.cc_stage import assign_clusters, connected_components
from apollo_ray.stages.communities_stage import detect_communities
from apollo_ray.stages.edges import (bucket_pair_edges, bucket_star_edges,
                                     bucket_stats)
from apollo_ray.stages.extract import extract_docs
from apollo_ray.stages.verify import verify_edges
from apollo_ray.stages.wmh_stage import compute_signatures

log = logging.getLogger("apollo_ray.dedup")

STAGES = ("docs", "reps", "bags", "signatures", "bands", "edges",
          "clusters", "communities")


def run_dedup(pages: "ray.data.Dataset", cfg: DedupConfig,
              ckpt_root: str | None = None,
              input_fingerprint: str = "",
              with_communities: bool = False,
              with_stats: bool = False,
              num_partitions: int = 64,
              docs_ds: "ray.data.Dataset | None" = None) -> dict[str, Any]:
    """Run the full pipeline; returns {"clusters": Dataset, ...}.

    With ``ckpt_root`` every stage is checkpointed to Parquet and
    completed stages (matching config hash + input fingerprint) are
    skipped on re-run — resumability with per-stage lineage.  Without
    it the pipeline runs fully streaming, checkpoint-free.
    """
    chash = cfg.config_hash()
    metrics: dict[str, Any] = {}
    t_start = time.monotonic()
    pending_writes: list = []
    fold_side: dict[str, Any] = {}   # driver-resident fold-path arrays

    def stage(name: str, build, *deps_ok, fork: bool = True):
        """Build-or-load one checkpointed stage.

        Without a checkpoint root, stages consumed by MORE THAN ONE
        downstream (``fork=True``) are pinned in the object store: a
        lazy Dataset re-executes its whole upstream once per consumer —
        O(stages²) work and, combined with join aggregator actors, a
        resource deadlock on small CPU budgets.  Linear stages
        (``fork=False``) stay lazy so consecutive transforms pipeline
        in one streaming execution (e.g. bags -> wmh -> bands run as a
        single pass).  materialize() keeps execution streaming within
        the stage and spillable in the object store.
        """
        if ckpt_root is not None:
            if all(deps_ok) and ckpt_io.is_complete(ckpt_root, name, chash,
                                                    input_fingerprint):
                log.info("stage %s: checkpoint hit, skipping", name)
                metrics[name + "_cached"] = True
                return ckpt_io.read_stage(ckpt_root, name), True
            t0 = time.monotonic()
            ds = build()
            # write-through: downstream reads the materialized blocks
            # while the Parquet copy persists in the background; all
            # writes are joined before run_dedup returns
            ds, wh = ckpt_io.write_stage_async(ds, ckpt_root, name, chash,
                                               input_fingerprint)
            pending_writes.append(wh)
            metrics[name + "_sec"] = round(time.monotonic() - t0, 3)
            return ds, False
        t0 = time.monotonic()
        ds = build()
        if fork:
            ds = ds.materialize()
        metrics[name + "_sec"] = round(time.monotonic() - t0, 3)
        return ds, False

    # Checkpoint-free fast path: never materialize the doc payload.
    # The extract stage's wall time is ~95% object-store write of the
    # text column (measured at 500k: read+decode 1.6s, +extract 0.2s,
    # +materialize 6.0s) while the extract COMPUTE is trivial — so the
    # pipeline runs extraction twice instead of storing its output:
    # once in a metadata-only pass that materializes just
    # (doc_id, text_hash) for the collapse election and the final
    # cluster-label universe, and once folded into the fused
    # hash map (extract -> dup-filter -> bags -> wmh -> bands in one
    # streaming pass over the original parquet blocks).
    fold_extract = (ckpt_root is None and not cfg.verify
                    and docs_ds is None)
    meta = None
    if fold_extract:
        # Pre-warm the fused hashing state WHILE the metadata pass
        # scans the corpus: the first fused task on each worker would
        # otherwise pay the params plasma read + work-buffer
        # first-touch on the critical path of the bands stage.  The
        # metadata pass already runs on every worker, and its per-task
        # work is IO-bound, so building the state there overlaps it
        # for free.  Only valid when the fused pass needs no docfreq
        # side input (df changes the cached-state contents).
        warm_ref = None
        if not cfg.needs_docfreq:
            from apollo_ray.stages.wmh_stage import params_object_ref
            warm_ref = params_object_ref(cfg)

        def ids_meta(batch):
            if warm_ref is not None:
                from apollo_ray.stages.fused import _get_state
                _get_state(cfg, warm_ref)
            return batch.select(["doc_id", "text_hash"])

        def pruned_source(with_lang: bool, prefer_text: bool = False):
            """Column-pruned pages: the hashing passes need only the
            id + content columns (+ lang for the reps schema), and the
            fixture-shaped corpus carries text twice (html and text) —
            pruning roughly halves the parquet decode of each pass.
            ``out['docs']`` stays full-schema (API surface).

            ``prefer_text``: the metadata pass may hash the ``text``
            column directly — the pages contract (BASELINE.json
            input_hint, verified by check_extraction_invariant) is
            that ``text`` IS the extracted html byte-for-byte, and
            the dup filter keys on doc_id so downstream stays
            consistent either way.  The fused pass always extracts
            from html (the real per-row work)."""
            try:
                names = set(pages.schema().names)
            except Exception:
                return pages
            idc = "url" if "url" in names else \
                ("doc_id" if "doc_id" in names else None)
            order = ("text", "html") if prefer_text else ("html", "text")
            content = next((c for c in order if c in names), None)
            if idc is None or content is None:
                return pages
            keep = [idc, content]
            if with_lang and "lang" in names:
                keep.append("lang")
            return pages.select_columns(keep)

        docs = extract_docs(pages, cfg)          # stays lazy, full schema
        # the hash-path docs: same doc_id/text/text_hash/lang, minus
        # the columns the dedup chain never reads (reps' schema is
        # (doc_id, text, lang, member_ids) in every mode)
        docs_lean = extract_docs(pruned_source(with_lang=True), cfg)
        meta_lazy = extract_docs(pruned_source(with_lang=False,
                                               prefer_text=True), cfg) \
            .map_batches(ids_meta, batch_format="pyarrow")
        # Below the driver cap the metadata STREAMS straight to the
        # driver (iter_batches) instead of materializing to the object
        # store and pulling refs afterwards — the write-back was pure
        # overhead for a table the driver consumes whole (measured
        # 2.30 s -> 1.48 s at 4M rows), and the pull now overlaps the
        # pass.  Cap resolved at call time so the all-distributed
        # bench mode (cap=0) keeps the materialized route; a corpus
        # that overflows the cap mid-stream falls back to materialize
        # (one extra metadata scan, only on >cap-row corpora).
        import apollo_ray.stages.bags as _bags_mod
        _cap = _bags_mod.DRIVER_MEMBERSHIP_MAX_ROWS
        t0 = time.monotonic()
        meta = None
        if _cap > 0:
            import numpy as np
            import pyarrow as pa
            batches: list = []
            total = 0
            overflow = False
            for b in meta_lazy.iter_batches(batch_format="pyarrow",
                                            batch_size=None):
                batches.append(b)
                total += b.num_rows
                if total > _cap:
                    overflow = True
                    break
            if overflow:
                meta = meta_lazy.materialize()
            elif total:
                mt = pa.concat_tables(batches)
                fold_side["meta_ids"] = np.asarray(
                    mt.column("doc_id").combine_chunks(), dtype=np.int64)
                fold_side["meta_th"] = np.asarray(
                    mt.column("text_hash").combine_chunks(), dtype=np.int64)
            else:
                fold_side["meta_ids"] = np.empty(0, dtype=np.int64)
                fold_side["meta_th"] = np.empty(0, dtype=np.int64)
        else:
            meta = meta_lazy.materialize()
        metrics["docs_sec"] = round(time.monotonic() - t0, 3)
        docs_hit = False
    else:
        docs_lean = None
        # docs_ds: caller-supplied pre-extracted/filtered docs (the
        # curation pipeline cleans and filters before deduping); the
        # extract stage is skipped, everything downstream is identical
        docs, docs_hit = stage("docs", lambda: (docs_ds if docs_ds is not None
                                                else extract_docs(pages, cfg)))
    if cfg.collapse_exact:
        # checkpoint-free: reps stays LAZY (fork=False) — it is a cheap
        # broadcast-filter map over the docs, so fusing it into each
        # consumer avoids a full rep-text object-store round-trip
        # (collapse_exact's membership shuffle still materializes
        # eagerly inside the build); member edges come straight from
        # the (small, materialized) membership table
        side: dict[str, Any] = {}

        def build_reps():
            if meta is not None or "meta_ids" in fold_side:
                # fold-extract path: elect representatives from the
                # tiny metadata table (16 B/row), then filter the LAZY
                # docs — the broadcast filter + the re-extraction fuse
                # into the fused hash pass below.  Below the driver
                # cap the metadata already streamed to the driver and
                # the election is a thread-sharded lexsort (no
                # exchange, and the sort parallelizes ~4x — the
                # driver-serial term of the weak-scaling legs)
                import ray.data as rd
                from apollo_ray.stages.bags import (
                    _collapse_exact_shuffle, exact_membership,
                    exact_membership_arrays_parallel,
                    rep_filter_from_membership)
                if "meta_ids" in fold_side:
                    m = rd.from_arrow(exact_membership_arrays_parallel(
                        fold_side.pop("meta_th"), fold_side["meta_ids"]))
                else:
                    m = exact_membership(meta).materialize()
                r = rep_filter_from_membership(docs_lean, m)
                if r is None:     # above the broadcast cap: full-
                    # payload shuffle fallback (same as collapse_exact)
                    r = _collapse_exact_shuffle(docs_lean)
                side["membership"] = m
                return r
            r, m = collapse_exact(docs, with_membership=True)
            side["membership"] = m
            return r

        reps, reps_hit = stage("reps", build_reps, docs_hit, fork=False)
        membership = side.get("membership")
        if membership is not None:
            def memb_edges(batch):
                return batch.rename_columns(["v", "u"]).select(["u", "v"])
            member_edges = membership.map_batches(memb_edges,
                                                  batch_format="pyarrow")
        else:
            member_edges = exact_member_edges(reps)
    else:
        reps = docs_lean if docs_lean is not None else docs
        reps_hit = docs_hit
        member_edges = None
    if ckpt_root is None and not cfg.verify:
        # fast path: one fused actor pool computes bands directly
        # (tests pin it byte-identical to the staged path); bags and
        # signatures stay lazy and are only computed if a caller
        # consumes them from the returned dict.  When idf/min-df needs
        # a docfreq pass, run that full-corpus scan ONCE and share the
        # array between the (lazy) bags entry and the fused stage.
        from apollo_ray.stages.fused import fused_bands
        df, ndocs = (None, 0)
        if cfg.needs_docfreq:
            from apollo_ray.stages.bags import compute_feature_docfreq
            df, ndocs = compute_feature_docfreq(reps, cfg)
        bags = build_bags(reps, cfg, df=df, ndocs=ndocs)
        sigs = compute_signatures(bags, cfg)
        # the fused map emits the salted bucket pkey inline so the
        # edges stage skips one full pass over the band table
        bands_pre_keyed = True
        # band_id only feeds the per-hashtable bucket_stats gates; the
        # edge/CC/communities consumers key on the (band-folded)
        # bucket alone, so skip the column unless stats asked for it
        bands, bands_hit = stage(
            "bands",
            lambda: fused_bands(reps, cfg, df=df, ndocs=ndocs,
                                pkey=(num_partitions,
                                      max(1, cfg.bucket_salt)),
                                emit_band_id=with_stats),
            reps_hit)
    else:
        # staged path: separate checkpoints per artifact (the reference
        # persists bags, hashes and hashtables separately too,
        # apollo/cassandra_utils.py:74-86), and verify needs the bags
        bags, bags_hit = stage("bags", lambda: build_bags(reps, cfg), reps_hit,
                               fork=cfg.verify)
        sigs, sigs_hit = stage("signatures",
                               lambda: compute_signatures(bags, cfg),
                               bags_hit, fork=False)
        bands_pre_keyed = False
        bands, bands_hit = stage("bands", lambda: explode_bands(sigs, cfg),
                                 sigs_hit)
    if with_stats:
        metrics["bucket_stats"] = bucket_stats(bands)

    def build_edges():
        if cfg.verify:
            # all-pairs candidates so verification tests real co-bucket
            # pairs, not just member<->minimum links (edges.py)
            e = bucket_pair_edges(bands, cfg, num_partitions=num_partitions)
            e = verify_edges(e, bags, cfg,
                             num_partitions=num_partitions).select_columns(["u", "v"])
        else:
            e = bucket_star_edges(bands, cfg, num_partitions=num_partitions,
                                  pre_keyed=bands_pre_keyed)
        if member_edges is not None:
            e = e.union(member_edges)
        return e

    edges, edges_hit = stage("edges", build_edges, bands_hit)

    def build_clusters():
        t0 = time.monotonic()
        final_edges = connected_components(edges,
                                           num_partitions=num_partitions,
                                           max_rounds=cfg.cc_max_rounds)
        metrics["cc_sec"] = round(time.monotonic() - t0, 3)
        # fold-extract path: the doc-id universe comes from the tiny
        # materialized metadata table, not a third extraction pass;
        # when the membership election already pulled it to the driver,
        # label it there too (one searchsorted, no distributed map)
        meta_ids = fold_side.get("meta_ids")
        if meta_ids is not None:
            from apollo_ray.stages.cc_stage import assign_clusters_driver
            cl = assign_clusters_driver(meta_ids, final_edges)
            if cl is not None:
                return cl
            # label map too large for the driver: distributed labeling
            # over the driver-held id universe (chunked ~1M rows so
            # downstream stays parallel; no third extraction pass)
            import pyarrow as pa
            import ray.data as rd
            chunks = [pa.table({"doc_id": pa.array(meta_ids[i:i + 1_000_000],
                                                   type=pa.int64())})
                      for i in range(0, max(len(meta_ids), 1), 1_000_000)]
            return assign_clusters(rd.from_arrow(chunks), final_edges)
        id_src = meta if meta is not None else docs
        return assign_clusters(id_src.select_columns(["doc_id"]), final_edges)

    clusters, clusters_hit = stage("clusters", build_clusters,
                                   edges_hit, docs_hit)

    out: dict[str, Any] = {
        "docs": docs, "reps": reps, "bags": bags, "signatures": sigs,
        "bands": bands, "edges": edges, "clusters": clusters,
        "metrics": metrics,
    }
    if with_communities:
        comms, _ = stage(
            "communities",
            lambda: detect_communities(
                clusters, bands.select_columns(["doc_id", "bucket"]), cfg,
                algorithm=cfg.community_algorithm,
                num_partitions=num_partitions),
            clusters_hit, bands_hit)
        out["communities"] = comms
    if pending_writes:
        t0 = time.monotonic()
        for wh in pending_writes:
            wh.wait()
        metrics["ckpt_write_wait_sec"] = round(time.monotonic() - t0, 3)
    metrics["total_sec"] = round(time.monotonic() - t_start, 3)
    return out


def append_dedup(new_pages: "ray.data.Dataset", cfg: DedupConfig,
                 ckpt_root: str, shard_fingerprint: str,
                 num_partitions: int = 64) -> dict[str, Any]:
    """Incrementally add a corpus shard to an existing checkpointed
    dedup run — the analog of the reference's append-style ingestion,
    where a new ``bags``/``hash`` invocation extends the Cassandra
    tables and ``cc`` re-runs over everything
    (``apollo/hasher.py:181-203``, ``apollo/graph.py:91-148``).

    Only the NEW shard is extracted and hashed (at 100 TB the hash
    tier dominates; a daily increment re-hashes only itself).  The
    shard's docs/reps/bands are appended to the stage checkpoints as
    ``shard-<fp>/`` subdirectories; then the cheap wide stages —
    bucket edges and connected components — are rebuilt over the FULL
    band table, because a new doc landing in an old bucket must link
    to the old members.  Cross-shard exact duplicates need no special
    casing: identical text means identical signature means identical
    buckets, so the LSH tier merges them.

    Constraints (raise): the base checkpoints must exist with the same
    config hash; ``cfg.verify`` and idf/min-df weighting are
    unsupported (verification reads a bags checkpoint this mode does
    not maintain, and document-frequency weights are corpus-global —
    appending would hash the shard against a different df model).

    Idempotent: re-running with the same ``shard_fingerprint`` skips
    the shard compute and only rebuilds edges/clusters if needed.
    """
    from apollo_ray.stages.fused import fused_bands

    import re
    if not re.fullmatch(r"[A-Za-z0-9._+-]+", shard_fingerprint):
        raise ValueError("shard_fingerprint must be a filesystem-safe "
                         "token, got %r" % shard_fingerprint)
    if cfg.verify or cfg.needs_docfreq:
        raise ValueError(
            "append_dedup supports only verify=False and non-idf "
            "weighting without min_df (corpus-global state)")
    chash = cfg.config_hash()
    for st in ("docs", "bands") + (("reps",) if cfg.collapse_exact else ()):
        try:
            man = ckpt_io.read_manifest(ckpt_root, st)
        except (OSError, ValueError):
            raise FileNotFoundError(
                "append_dedup: base stage '%s' missing under %s — run the "
                "full pipeline with a checkpoint root first" % (st, ckpt_root))
        if man.get("config_hash") != chash:
            raise ValueError(
                "append_dedup: config hash mismatch on stage '%s' "
                "(checkpoint %s, config %s)"
                % (st, man.get("config_hash"), chash))
    metrics: dict[str, Any] = {}
    t_start = time.monotonic()
    stages_to_fill = [
        s for s in (("docs", "reps", "bands") if cfg.collapse_exact
                    else ("docs", "bands"))
        if not ckpt_io.has_shard(ckpt_root, s, shard_fingerprint)]
    if stages_to_fill:
        t0 = time.monotonic()
        new_docs = extract_docs(new_pages, cfg).materialize()
        if cfg.collapse_exact:
            new_reps, _ = collapse_exact(new_docs, with_membership=True)
            new_reps = new_reps.materialize()
        else:
            new_reps = new_docs
        new_bands = fused_bands(new_reps, cfg).materialize()
        metrics["shard_hash_sec"] = round(time.monotonic() - t0, 3)
        ckpt_io.append_stage(new_docs, ckpt_root, "docs", shard_fingerprint)
        if cfg.collapse_exact:
            ckpt_io.append_stage(new_reps, ckpt_root, "reps",
                                 shard_fingerprint)
        ckpt_io.append_stage(new_bands, ckpt_root, "bands",
                             shard_fingerprint)
        metrics["shard_rows"] = new_docs.count()
    else:
        metrics["shard_cached"] = True

    docs = ckpt_io.read_stage(ckpt_root, "docs")
    bands = ckpt_io.read_stage(ckpt_root, "bands")
    combined_fp = "+".join(
        [ckpt_io.read_manifest(ckpt_root, "docs").get("input_fingerprint", "")]
        + ckpt_io.read_manifest(ckpt_root, "docs").get("shards", []))

    t0 = time.monotonic()
    edges = bucket_star_edges(bands, cfg, num_partitions=num_partitions)
    if cfg.collapse_exact:
        reps = ckpt_io.read_stage(ckpt_root, "reps")
        edges = edges.union(exact_member_edges(reps))
    edges = ckpt_io.write_stage(edges, ckpt_root, "edges", chash, combined_fp)
    metrics["edges_sec"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    final_edges = connected_components(edges, num_partitions=num_partitions,
                                       max_rounds=cfg.cc_max_rounds)
    clusters = assign_clusters(docs.select_columns(["doc_id"]), final_edges)
    clusters = ckpt_io.write_stage(clusters, ckpt_root, "clusters", chash,
                                   combined_fp)
    metrics["clusters_sec"] = round(time.monotonic() - t0, 3)
    metrics["total_sec"] = round(time.monotonic() - t_start, 3)
    return {"docs": docs, "bands": bands, "edges": edges,
            "clusters": clusters, "metrics": metrics}
