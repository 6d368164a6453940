"""Communities stage: clusters -> sub-communities per fat component.

Mirrors ``detect_communities`` (``apollo/graph.py:195-269``): size-1
components are skipped, size-2 pass through as communities
(``apollo/graph.py:213-219``), larger ("fat") components run community
detection over the *linear* doc<->bucket bipartite graph
(``apollo/graph.py:222-233``, bucket vertices weighted by bucket size).

Differences from the reference's execution (not semantics):
- the reference builds every igraph object in driver RAM and ships
  pickled graphs to Spark (``apollo/graph.py:220-260``); here the
  membership rows are joined to cluster ids and grouped by ``cc_id`` so
  each component's graph is built inside ``map_groups`` on workers;
- igraph is unavailable in this container, so the default algorithm is
  the deterministic NumPy label propagation in kernels/communities.py
  (igraph algorithms plug in by reflection when importable, same
  surface as ``apollo/graph.py:277-289``).

Output: ``doc_id:int64, cc_id:int64, community_id:int64`` (community
label = min doc_id in the community).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from apollo_ray.config import DedupConfig
from apollo_ray.kernels.communities import (build_linear_edges,
                                            build_quadratic_edges, detect)

# cap on the broadcast (doc_id -> cc_id) label map in
# detect_communities (80 MB at the cap); above it the attach runs as
# a pkey hash join.  Module-level so the all-distributed bench mode
# can zero it (bench._maybe_force_distributed).
LABEL_BROADCAST_MAX = 5_000_000

# the complete-biclique shortcut only fires at sizes where the
# kernel test pins walktrap/LPA equivalence (tests/
# test_communities_kernel.py biclique pin); larger bicliques run the
# real detector instead of extrapolating symmetry
_BICLIQUE_MAX_DOCS = 64

# Mega-CC scale boundary (documented divergence): a CC above this many
# docs — a boilerplate blob where huge page populations share a band —
# would serialize ONE detection task for hours (walktrap falls back to
# LPA above 1000 vertices, but LPA itself is a sequential per-vertex
# sweep).  Such a CC is emitted as a single min-doc-labeled community
# instead of running detection.  The reference would hand the same CC
# to igraph walktrap per fat CC (apollo/graph.py:213-219) and stall
# identically; fixture/bench CCs sit far below the bound, so
# communities_invariants pins the in-bound semantics unchanged.
FAT_CC_MAX_DOCS = 200_000


def detect_communities(clusters: "ray.data.Dataset",
                       memberships: "ray.data.Dataset",
                       cfg: DedupConfig,
                       algorithm: str = "label_propagation",
                       edges: str = "linear",
                       num_partitions: int | None = None,
                       max_quadratic_pairs: int = 200_000,
                       biclique_shortcut: bool = True,
                       label_broadcast_max: int | None = None,
                       fat_cc_max_docs: int | None = None
                       ) -> "ray.data.Dataset":
    """clusters (doc_id, cc_id) x memberships (doc_id, bucket) ->
    (doc_id, cc_id, community_id).

    ``edges`` selects the reference's two graph constructions
    (``--edges linear|quadratic``, ``apollo/__main__.py:170-175``):
    ``linear`` builds the doc<->bucket bipartite graph with artificial
    bucket vertices (``apollo/graph.py:222-233``), ``quadratic``
    all-pairs-within-bucket doc edges (``apollo/graph.py:234-249``,
    O(n^2) per bucket — capped at ``max_quadratic_pairs`` per CC).

    ``biclique_shortcut``: a CC whose every doc belongs to every one
    of its buckets (membership rows == n_docs * n_buckets; rows are
    structurally distinct — the band index is folded into the bucket
    key, so one doc emits one row per band) is a complete biclique,
    on which walktrap, LPA and the igraph algorithms all return ONE
    community labeled min(doc_id) — the dominant shape for tight
    near-dup clusters that agree on all bands.  The shortcut skips
    graph construction + detection for those CCs, and only fires at
    ``<= _BICLIQUE_MAX_DOCS`` docs — the regime where equivalence is
    pinned by tests (kernel-level biclique pin + a stage-level
    shortcut-on == shortcut-off comparison on mixed topologies);
    larger bicliques run the real detector."""
    from apollo_ray.hashing import mix_to_partition
    n_parts = num_partitions or 64
    if label_broadcast_max is None:
        label_broadcast_max = LABEL_BROADCAST_MAX
    if fat_cc_max_docs is None:
        fat_cc_max_docs = FAT_CC_MAX_DOCS

    # Attach cc_id to the membership rows.  Below the broadcast cap
    # the (doc_id -> cc_id) label map rides one ray.put and the
    # attach+singleton-filter+pkey all fuse into ONE map pass over the
    # band table — no join exchange, and rows of size-1 components
    # (the vast majority of a dedup corpus) never enter the shuffle at
    # all (per_partition would only drop them after the exchange).
    # Above the cap: the pkey hash join, as before (the 100-TB route).
    mem = None
    try:
        n_labels = clusters.count()
    except Exception:
        n_labels = None
    if n_labels is not None and n_labels <= label_broadcast_max:
        import pandas as pd
        import ray as _ray
        cdf = clusters.select_columns(["doc_id", "cc_id"]).to_pandas()
        d_arr = cdf["doc_id"].to_numpy(dtype=np.int64)
        c_arr = cdf["cc_id"].to_numpy(dtype=np.int64)
        order = np.argsort(d_arr, kind="mergesort")
        d_sorted, c_sorted = d_arr[order], c_arr[order]
        cc_counts = pd.Series(c_arr).value_counts()
        fat_sorted = np.sort(
            cc_counts.index.to_numpy(dtype=np.int64)[
                cc_counts.to_numpy() >= 2])
        ref = _ray.put((d_sorted, c_sorted, fat_sorted))

        def attach_and_key(batch: pa.Table) -> pa.Table:
            ds, cs, fat = _ray.get(ref)
            d = np.asarray(batch.column("doc_id"), dtype=np.int64)
            cc = d.copy()
            hit = np.zeros(len(d), dtype=bool)
            if len(ds):
                pos = np.minimum(np.searchsorted(ds, d), len(ds) - 1)
                hit = ds[pos] == d
                cc[hit] = cs[pos[hit]]
            keep = np.zeros(len(cc), dtype=bool)
            if len(fat):
                fpos = np.minimum(np.searchsorted(fat, cc), len(fat) - 1)
                keep = fat[fpos] == cc
                # membership docs absent from `clusters` are dropped —
                # the hash-join route's inner join does the same, so
                # both routes agree for arbitrary caller inputs (not
                # only under the memberships ⊆ clusters invariant)
                keep &= hit
            sub = batch.filter(pa.array(keep))
            cc_k = cc[keep]
            return pa.table({
                "doc_id": sub.column("doc_id").cast(pa.int64()),
                "bucket": sub.column("bucket").cast(pa.int64()),
                "cc_id": pa.array(cc_k, type=pa.int64()),
                "pkey": pa.array(mix_to_partition(cc_k, n_parts),
                                 type=pa.int32())})

        keyed = memberships.map_batches(attach_and_key,
                                        batch_format="pyarrow")
    else:
        from apollo_ray.util import hash_join
        mem = hash_join(memberships, clusters, on=("doc_id",),
                        num_partitions=num_partitions)

    def _one_cc(cc_id: int, docs: np.ndarray, buckets: np.ndarray,
                out_d: list, out_c: list, out_m: list) -> None:
        uniq = np.unique(docs)
        if len(uniq) == 1:  # singleton CC: skipped (apollo/graph.py:214-215)
            return
        if len(uniq) == 2:  # pair passthrough (apollo/graph.py:216-218)
            out_d.append(uniq.astype(np.int64))
            out_c.append(np.full(2, cc_id, dtype=np.int64))
            out_m.append(np.full(2, uniq.min(), dtype=np.int64))
            return
        if len(uniq) > fat_cc_max_docs:
            # mega-CC boundary (see FAT_CC_MAX_DOCS): one community
            out_d.append(uniq.astype(np.int64))
            out_c.append(np.full(len(uniq), cc_id, dtype=np.int64))
            out_m.append(np.full(len(uniq), uniq.min(), dtype=np.int64))
            return
        if (biclique_shortcut and edges == "linear"
                and len(uniq) <= _BICLIQUE_MAX_DOCS
                and len(docs) == len(uniq) * len(np.unique(buckets))):
            # complete biclique -> one community labeled min doc.
            # Bounded to the regime the kernel test pins equivalence
            # for (walktrap AND label propagation both return exactly
            # this partition at <= _BICLIQUE_MAX_DOCS docs); larger
            # bicliques run real detection rather than extrapolate.
            out_d.append(uniq.astype(np.int64))
            out_c.append(np.full(len(uniq), cc_id, dtype=np.int64))
            out_m.append(np.full(len(uniq), uniq.min(), dtype=np.int64))
            return
        if edges == "quadratic":
            eu, ev = build_quadratic_edges(docs, buckets,
                                           max_pairs=max_quadratic_pairs)
            w = None
            if len(eu) == 0:  # all buckets singleton inside this CC
                eu, ev, w = build_linear_edges(docs, buckets)
        else:
            eu, ev, w = build_linear_edges(docs, buckets)
        labels = detect(eu, ev, w, algorithm=algorithm)
        # keep doc vertices only (linear mode adds artificial bucket
        # vertices) — vectorized membership test against the sorted
        # uniq array instead of a per-vertex Python set loop
        keys = np.fromiter(labels.keys(), dtype=np.int64, count=len(labels))
        vals = np.fromiter(labels.values(), dtype=np.int64,
                           count=len(labels))
        pos = np.searchsorted(uniq, keys)
        is_doc = np.zeros(len(keys), dtype=bool)
        inb = pos < len(uniq)
        is_doc[inb] = uniq[pos[inb]] == keys[inb]
        out_d.append(keys[is_doc])
        out_c.append(np.full(int(is_doc.sum()), cc_id, dtype=np.int64))
        out_m.append(vals[is_doc])

    def add_pkey(batch: pa.Table) -> pa.Table:
        cc = np.asarray(batch.column("cc_id"), dtype=np.int64)
        return batch.append_column(
            "pkey", pa.array(mix_to_partition(cc, n_parts), type=pa.int32()))

    # pkey pattern: one Ray group per PARTITION, components segmented
    # inside with a lexsort — per-component detection is inherently
    # per-group compute, but Ray's per-group overhead is not (NOTES_r1
    # item 3: per-key map_groups is fatal at millions of groups)
    def per_partition(group: pa.Table) -> pa.Table:
        cc = np.asarray(group.column("cc_id"), dtype=np.int64)
        docs = np.asarray(group.column("doc_id"), dtype=np.int64)
        buckets = np.asarray(group.column("bucket"), dtype=np.int64)
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "cc_id": pa.array([], type=pa.int64()),
                          "community_id": pa.array([], type=pa.int64())})
        if len(cc) == 0:
            return empty
        order = np.lexsort((docs, cc))
        cc_s, d_s, b_s = cc[order], docs[order], buckets[order]
        first = np.empty(len(cc_s), dtype=bool)
        first[0] = True
        first[1:] = cc_s[1:] != cc_s[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(cc_s))
        out_d: list = []
        out_c: list = []
        out_m: list = []
        for st, en in zip(starts, ends):
            _one_cc(int(cc_s[st]), d_s[st:en], b_s[st:en],
                    out_d, out_c, out_m)
        if not out_d:
            return empty
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_d), type=pa.int64()),
            "cc_id": pa.array(np.concatenate(out_c), type=pa.int64()),
            "community_id": pa.array(np.concatenate(out_m), type=pa.int64()),
        })

    if mem is not None:   # hash-join route: key by cc after the join
        keyed = mem.map_batches(add_pkey, batch_format="pyarrow")
    return keyed.groupby("pkey").map_groups(per_partition,
                                            batch_format="pyarrow")


def community_size_stats(communities: "ray.data.Dataset") -> dict:
    """mean/median/max community size (``apollo/graph.py:264-267``)."""
    sizes = communities.groupby("community_id").count()
    df = sizes.to_pandas()
    if df.empty:
        return {"n_communities": 0}
    col = "count()" if "count()" in df.columns else df.columns[-1]
    return {
        "n_communities": int(len(df)),
        "mean_size": float(df[col].mean()),
        "median_size": float(df[col].median()),
        "max_size": int(df[col].max()),
    }
