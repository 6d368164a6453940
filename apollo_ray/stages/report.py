"""Report / dump / query stages (S10, J1, J3/J4).

- ``cluster_report``: clusters joined back to doc metadata (J1 — the
  reference resolves sha1 -> (repo, commit, path) through batched
  Cassandra IN-queries, ``apollo/cassandra_utils.py:89-142``; here it
  is one hash join), communities of size <= 1 dropped like
  ``apollo/graph.py:319-324``, deterministic ordering (O3).
- ``render_markdown``: a small driver-side render of the final (small)
  table — the Jinja template analog (``apollo/query.md.jinja2``,
  ``apollo/report.md.jinja2``).
- ``query_similar``: probe path (``apollo/query.py:14-77``): hash one
  text, look up its buckets, union candidates (J3/D1), drop the probe
  itself (J4), optional precise verify.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from apollo_ray.config import DedupConfig
from apollo_ray.hashing import TokenHasher
from apollo_ray.kernels.jaccard import weighted_jaccard_sparse
from apollo_ray.kernels.text import doc_to_bag
from apollo_ray.kernels.wmh import generate_params, weighted_minhash_batch
from apollo_ray.stages.bands import band_params
from apollo_ray.stages.wmh_stage import list_columns_to_csr


def cluster_report(clusters: "ray.data.Dataset", docs: "ray.data.Dataset",
                   num_partitions: int | None = None, min_size: int = 2
                   ) -> "ray.data.Dataset":
    """(doc_id, cc_id) + docs metadata -> report rows sorted by
    (cc_id, doc_id), clusters below ``min_size`` dropped.

    Size filtering is a vectorized segment-cut per hashed partition
    (one Ray group per partition, not per cluster — the per-key
    ``map_groups`` pattern is fatal at duplicate-cluster cardinality).
    """
    from apollo_ray.hashing import mix_to_partition
    from apollo_ray.util import hash_join
    meta = docs.select_columns(["doc_id", "url", "lang"])
    joined = hash_join(clusters, meta, on=("doc_id",),
                       num_partitions=num_partitions)
    n_parts = num_partitions or 64

    def add_pkey(batch: pa.Table) -> pa.Table:
        cc = np.asarray(batch.column("cc_id"), dtype=np.int64)
        return batch.append_column(
            "pkey", pa.array(mix_to_partition(cc, n_parts), type=pa.int32()))

    def filter_small(group: pa.Table) -> pa.Table:
        out_cols = [c for c in group.column_names if c != "pkey"]
        cc = np.asarray(group.column("cc_id"), dtype=np.int64)
        if len(cc) == 0:
            return group.select(out_cols)
        order = np.argsort(cc, kind="stable")
        cc_s = cc[order]
        first = np.empty(len(cc_s), dtype=bool)
        first[0] = True
        first[1:] = cc_s[1:] != cc_s[:-1]
        seg_id = np.cumsum(first) - 1
        sizes = np.bincount(seg_id)
        keep = sizes[seg_id] >= min_size
        return group.take(pa.array(order[keep])).select(out_cols)

    return joined.map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(filter_small, batch_format="pyarrow") \
        .sort(["cc_id", "doc_id"])


def format_url(repo: str, commit: str, path: str) -> str:
    """Browsable-URL formatter (M10, ``apollo/query.py:84-91``
    semantics: github/gitlab -> /blob/, bitbucket -> /src/, else a
    bracketed triple)."""
    if repo.endswith(".git"):
        repo = repo[:-4]
    if repo.startswith(("github.com", "gitlab.com")):
        return "https://%s/blob/%s/%s" % (repo, commit, path)
    if repo.startswith("bitbucket.org"):
        return "https://%s/src/%s/%s" % (repo, commit, path)
    return "[%s %s %s]" % (repo, commit, path)


DEFAULT_TEMPLATE = """# Duplicate clusters ({{ clusters|length }})
{% for cc_id, rows in clusters %}
## cluster {{ cc_id }} ({{ rows|length }} docs)
{% for row in rows %}- {{ row.url }}
{% endfor %}{% endfor %}"""


def render_template(report_df: pd.DataFrame, template: str | None = None) -> str:
    """Jinja2-rendered report (S10, the ``--template`` surface of
    ``apollo/__main__.py:65-69`` / ``stream_template``
    ``apollo/query.py:94-106``).  ``template`` is a Jinja source string
    (or None for the built-in); the context mirrors the reference's
    ``communities=...`` iterable: ``clusters`` = [(cc_id, [rows...])]."""
    import jinja2
    from apollo_ray.stages.report import format_url
    env = jinja2.Environment(trim_blocks=True, lstrip_blocks=True,
                             keep_trailing_newline=False)
    tpl = env.from_string(template or DEFAULT_TEMPLATE)
    clusters = [(int(cc), list(g.itertuples()))
                for cc, g in report_df.groupby("cc_id", sort=True)]
    return tpl.render(clusters=clusters, format_url=format_url)


def render_markdown(report_df: pd.DataFrame) -> str:
    """Markdown dump of a (small, already-collected) report table."""
    lines = ["# Duplicate clusters", ""]
    for cc_id, g in report_df.groupby("cc_id", sort=True):
        lines.append("## cluster %d (%d docs)" % (int(cc_id), len(g)))
        for _, row in g.iterrows():
            lines.append("- %s" % row.get("url", row["doc_id"]))
        lines.append("")
    return "\n".join(lines)


class ProbeHasher:
    """Driver-side probe hashing for the query path — the analog of
    ``hash_file`` (``apollo/hasher.py:208-234``) without Babelfish."""

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg
        if cfg.minhash_mode == "unweighted":
            from apollo_ray.kernels.minhash import generate_minhash_params
            self.mh_params = generate_minhash_params(cfg.size, cfg.seed)
        else:
            p = generate_params(cfg.feature_dim, cfg.size, cfg.seed)
            self.rs, self.ln_cs, self.betas = p["rs"], p["ln_cs"], p["betas"]
        self.hasher = TokenHasher(seed=cfg.seed)
        self.htnum, self.band_size = band_params(cfg)

    def probe(self, text: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """text -> (bucket keys, bag indices, bag weights)."""
        from apollo_ray.stages.bands import bucket_keys
        cfg = self.cfg
        idx, w = doc_to_bag(text, self.hasher, cfg.shingle_k,
                            cfg.feature_dim_log2, **cfg.bag_kwargs)
        indptr = np.array([0, len(idx)], dtype=np.int64)
        if cfg.minhash_mode == "unweighted":
            from apollo_ray.kernels.minhash import (minhash_batch,
                                                    sig_to_u32_lanes)
            flat = sig_to_u32_lanes(minhash_batch(
                indptr, idx, self.mh_params["a"], self.mh_params["b"]))
        else:
            sig = weighted_minhash_batch(indptr, idx, w, self.rs, self.ln_cs,
                                         self.betas)[0]
            flat = sig.reshape(1, -1)
        buckets = bucket_keys(flat, self.htnum, self.band_size)[0]
        return buckets, idx, w


def _bucket_candidates(buckets: np.ndarray,
                       bands_ds: "ray.data.Dataset") -> list[int]:
    """Union of doc_ids sharing any probe bucket (J3+D1): the probe
    bucket set is tiny and broadcast into a vectorized filter."""
    barr = np.unique(np.asarray(buckets, dtype=np.int64))

    def flt(batch: pa.Table) -> pa.Table:
        b = np.asarray(batch.column("bucket"), dtype=np.int64)
        return batch.filter(pa.array(np.isin(b, barr))).select(["doc_id"])

    out = bands_ds.map_batches(flt, batch_format="pyarrow").unique("doc_id")
    # Dataset.unique returns None (not []) when the filter matched
    # nothing — a probe with no shared buckets has no candidates
    return [int(c) for c in out] if out else []


def _verify_candidates(cands: list[int], bags_ds: "ray.data.Dataset",
                       p_idx: np.ndarray, p_w: np.ndarray,
                       cfg: DedupConfig) -> list[int]:
    """Exact weighted-Jaccard check of candidates against the probe
    bag (``--precise``, ``apollo/query.py:45-66``)."""
    cand_arr = np.fromiter(cands, dtype=np.int64)

    def verify(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch.column("doc_id"), dtype=np.int64)
        mask = np.isin(d, cand_arr)
        sub = batch.filter(pa.array(mask))
        ip, ix, w = list_columns_to_csr(sub, "indices", "weights")
        binary = cfg.minhash_mode == "unweighted"
        keep = []
        for i in range(sub.num_rows):
            ii = ix[ip[i]:ip[i + 1]]
            if binary:  # plain set Jaccard — what unweighted sigs estimate
                inter = len(np.intersect1d(ii, p_idx, assume_unique=True))
                union = len(ii) + len(p_idx) - inter
                s = inter / union if union else 0.0
            else:
                s = weighted_jaccard_sparse(ii, w[ip[i]:ip[i + 1]],
                                            p_idx, p_w)
            keep.append(s >= cfg.threshold)
        return sub.select(["doc_id"]).filter(pa.array(np.array(keep, dtype=bool)))

    out = bags_ds.map_batches(verify, batch_format="pyarrow").unique("doc_id")
    return sorted(int(x) for x in out)


def query_similar(text: str, bands_ds: "ray.data.Dataset",
                  bags_ds: "ray.data.Dataset", cfg: DedupConfig,
                  precise: bool | None = None) -> list[int]:
    """Find documents similar to a probe text.

    Broadcast the (tiny) probe bucket set into a vectorized filter over
    the bands table (J3: the reference's per-band Cassandra SELECTs,
    ``apollo/query.py:39-43``), union candidates (D1), then optionally
    verify by exact weighted Jaccard (``--precise``,
    ``apollo/query.py:45-66``).
    """
    ph = ProbeHasher(cfg)
    if not text.split():  # empty probe matches nothing (the reference
        return []         # raises on all-zero bags, apollo/hasher.py:245)
    buckets, p_idx, p_w = ph.probe(text)
    cands = _bucket_candidates(buckets, bands_ds)
    if not (precise if precise is not None else cfg.verify):
        return sorted(cands)
    return _verify_candidates(cands, bags_ds, p_idx, p_w, cfg)


def query_similar_by_id(doc_id: int, signatures_ds: "ray.data.Dataset",
                        bands_ds: "ray.data.Dataset",
                        bags_ds: "ray.data.Dataset", cfg: DedupConfig,
                        precise: bool | None = None) -> list[int]:
    """Query an already-INDEXED document by key: its signature is read
    from the ``signatures`` checkpoint instead of re-hashing the text
    — the analog of the reference's ``hashtables2`` reverse index
    (``apollo/query.py:25-43``, ``apollo/cassandra_utils.py:85-86``).
    The probe doc itself is excluded from the result (J4).
    """
    from apollo_ray.stages.bands import bucket_keys
    target = np.int64(doc_id)

    def pick_sig(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch.column("doc_id"), dtype=np.int64)
        return batch.filter(pa.array(d == target))

    rows = signatures_ds.map_batches(pick_sig,
                                     batch_format="pyarrow").take_all()
    if not rows:
        raise KeyError("doc_id %d not found in signatures" % doc_id)
    sig = np.asarray(rows[0]["sig"], dtype=np.uint32).reshape(1, -1)
    htnum, band_size = band_params(cfg)
    buckets = bucket_keys(sig, htnum, band_size)[0]
    cands = [c for c in _bucket_candidates(buckets, bands_ds)
             if c != int(doc_id)]
    if not (precise if precise is not None else cfg.verify):
        return sorted(cands)

    def pick_bag(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch.column("doc_id"), dtype=np.int64)
        return batch.filter(pa.array(d == target))

    bag_rows = bags_ds.map_batches(pick_bag,
                                   batch_format="pyarrow").take_all()
    if not bag_rows:
        raise KeyError("doc_id %d not found in bags" % doc_id)
    p_idx = np.asarray(bag_rows[0]["indices"], dtype=np.uint32)
    p_w = np.asarray(bag_rows[0]["weights"], dtype=np.float32)
    return _verify_candidates(cands, bags_ds, p_idx, p_w, cfg)


def query_similar_batch(probes_ds: "ray.data.Dataset",
                        bands_ds: "ray.data.Dataset", cfg: DedupConfig,
                        df=None, ndocs: int = 0,
                        num_partitions: int = 64,
                        max_bucket: int = 10_000,
                        precise: bool = False,
                        bags_ds: "ray.data.Dataset | None" = None
                        ) -> "ray.data.Dataset":
    """(probe_id, doc_id) — candidate pairs for a whole TABLE of probe
    texts joined against an indexed corpus's bands checkpoint: the
    production shape of the reference's one-at-a-time query loop
    (``apollo/query.py:25-43`` issues per-band Cassandra SELECTs per
    probe; here any number of probes joins in one shuffle).

    Probe signatures come from the same fused batch hasher as the
    index (bit-identical bucket keys); probe and index band rows union
    with a side tag, shuffle once on hash(bucket), and each bucket
    segment emits its probe x doc cross product (vectorized ragged
    cross, the ``jaccard_join`` machinery); a second pair-hash pass
    dedupes pairs that co-occur in several buckets.  ``max_bucket``
    caps either side of a mega-bucket (boilerplate bands).

    ``df``/``ndocs``: required when ``cfg.needs_docfreq`` — the probe
    bags must be weighted with the INDEX-TIME docfreq model (load it
    from the checkpoint), otherwise bucket keys would diverge.

    ``precise=True`` (requires ``bags_ds``, the bags checkpoint) adds
    the exact-similarity tier: probe bags are rebuilt with the same
    stage as indexing, both endpoints' packed bags attach to each
    candidate pair via the two verify-stage hash joins, and pairs
    below ``cfg.threshold`` are dropped; output gains a
    ``similarity`` column (the reference's ``--precise``,
    ``apollo/query.py:45-66``, at table scale).
    """
    import ray as _ray

    from apollo_ray.hashing import mix_to_partition, pair_mix
    from apollo_ray.stages.fused import fused_hash_batch
    from apollo_ray.stages.wmh_stage import params_object_ref

    if cfg.needs_docfreq and df is None:
        raise ValueError("cfg needs a docfreq model: pass the "
                         "index-time df/ndocs (checkpoint 'state')")
    params_ref = params_object_ref(cfg)
    df_ref = _ray.put(df) if df is not None else None

    def probe_bands(batch: pa.Table) -> pa.Table:
        renamed = pa.table({
            "doc_id": batch.column("probe_id").cast(pa.int64()),
            "text": batch.column("text")})
        out = fused_hash_batch(renamed, cfg, params_ref, df_ref, ndocs)
        return pa.table({
            "bucket": out.column("bucket"),
            "id": out.column("doc_id"),
            "side": pa.array(np.ones(out.num_rows, dtype=np.int8))})

    def index_bands(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": batch.column("bucket").cast(pa.int64()),
            "id": batch.column("doc_id").cast(pa.int64()),
            "side": pa.array(np.zeros(batch.num_rows, dtype=np.int8))})

    rows = bands_ds.map_batches(index_bands, batch_format="pyarrow") \
        .union(probes_ds.map_batches(probe_bands, batch_format="pyarrow"))

    def add_pkey(batch: pa.Table) -> pa.Table:
        b = np.asarray(batch.column("bucket"), dtype=np.int64)
        return batch.append_column(
            "pkey", pa.array(mix_to_partition(b, num_partitions),
                             type=pa.int32()))

    _EMPTY = pa.table({"probe_id": pa.array([], type=pa.int64()),
                       "doc_id": pa.array([], type=pa.int64())})

    def emit_cross(group: pa.Table) -> pa.Table:
        b = np.asarray(group.column("bucket"), dtype=np.int64)
        if len(b) == 0:
            return _EMPTY
        ids = np.asarray(group.column("id"), dtype=np.int64)
        side = np.asarray(group.column("side"), dtype=np.int8)
        order = np.lexsort((ids, side, b))
        b_s, id_s, t_s = b[order], ids[order], side[order]
        new_seg = np.empty(len(b_s), dtype=bool)
        new_seg[0] = True
        new_seg[1:] = b_s[1:] != b_s[:-1]
        seg_of = np.cumsum(new_seg) - 1
        nseg = seg_of[-1] + 1
        starts = np.flatnonzero(new_seg)
        ends = np.append(starts[1:], len(b_s))
        cd = np.bincount(seg_of[t_s == 0], minlength=nseg)  # index docs
        cp = (ends - starts) - cd                           # probes
        capped = (cd > max_bucket) | (cp > max_bucket)
        cd = np.where(capped, 0, cd)
        cp = np.where(capped, 0, cp)
        npairs = cd * cp
        total = int(npairs.sum())
        if total == 0:
            return _EMPTY
        out_start = np.concatenate(([0], np.cumsum(npairs)[:-1]))
        live = np.flatnonzero(npairs)
        seg_row = np.repeat(live, npairs[live])
        pos = np.arange(total, dtype=np.int64) - out_start[seg_row]
        d_idx = starts[seg_row] + pos // cp[seg_row]
        p_idx = starts[seg_row] + cd[seg_row] + pos % cp[seg_row]
        return pa.table({
            "probe_id": pa.array(id_s[p_idx], type=pa.int64()),
            "doc_id": pa.array(id_s[d_idx], type=pa.int64())})

    pairs = rows.map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(emit_cross, batch_format="pyarrow")

    def add_pair_pkey(batch: pa.Table) -> pa.Table:
        p = np.asarray(batch.column("probe_id"), dtype=np.int64)
        d = np.asarray(batch.column("doc_id"), dtype=np.int64)
        key = pair_mix(p, d).astype(np.int64) >> 1
        return batch.append_column(
            "pkey", pa.array(mix_to_partition(key, num_partitions),
                             type=pa.int32()))

    def distinct(group: pa.Table) -> pa.Table:
        p = np.asarray(group.column("probe_id"), dtype=np.int64)
        d = np.asarray(group.column("doc_id"), dtype=np.int64)
        if len(p) == 0:
            return _EMPTY
        key = pair_mix(p, d)
        _, first = np.unique(key, return_index=True)
        return pa.table({"probe_id": pa.array(p[first], type=pa.int64()),
                         "doc_id": pa.array(d[first], type=pa.int64())})

    out = pairs.map_batches(add_pair_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(distinct, batch_format="pyarrow")
    if not precise:
        return out
    if bags_ds is None:
        raise ValueError("precise=True needs bags_ds (bags checkpoint)")

    from apollo_ray.stages.bags import build_bags
    from apollo_ray.stages.verify import (pack_bags, unpack_bag,
                                          weighted_jaccard_sparse)

    def as_docs(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("probe_id").cast(pa.int64()),
                         "text": batch.column("text")})

    # both lookup sides are candidate-sized, not corpus-sized: probe
    # bags (<= #probes) and the bags of candidate doc_ids only (the
    # corpus scan filters map-side).  Broadcast each as sorted
    # (ids, blobs) arrays — the house rule for metadata sides (Acero
    # joins fail intermittently on schema-less empty shuffle blocks).
    probe_docs = probes_ds.map_batches(as_docs, batch_format="pyarrow")
    p_packed = pack_bags(build_bags(probe_docs, cfg, df=df, ndocs=ndocs))

    def _collect_sorted(packed_ds) -> tuple:
        ids_l, blobs_l = [], []
        for b in packed_ds.iter_batches(batch_format="pyarrow"):
            if b.num_rows:
                ids_l.append(np.asarray(b.column("doc_id"), dtype=np.int64))
                blobs_l.extend(b.column("bag").to_pylist())
        if not ids_l:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=object)
        ids = np.concatenate(ids_l)
        order = np.argsort(ids, kind="stable")
        return ids[order], np.asarray(blobs_l, dtype=object)[order]

    cand_parts = [np.asarray(b.column("doc_id"), dtype=np.int64)
                  for b in out.iter_batches(batch_format="pyarrow")
                  if b.num_rows]
    cand_ids = (np.unique(np.concatenate(cand_parts)) if cand_parts
                else np.empty(0, dtype=np.int64))
    cand_ref = _ray.put(cand_ids)

    def keep_cands(batch: pa.Table) -> pa.Table:
        ks = _ray.get(cand_ref)
        d = np.asarray(batch.column("doc_id"), dtype=np.int64)
        pos = np.searchsorted(ks, d)
        hit = pos < len(ks)
        hit[hit] &= ks[pos[hit]] == d[hit]
        return batch.filter(pa.array(hit))

    d_packed = pack_bags(bags_ds.map_batches(keep_cands,
                                             batch_format="pyarrow"))
    bags_ref = _ray.put((_collect_sorted(p_packed),
                         _collect_sorted(d_packed)))
    thr = cfg.threshold
    binary = cfg.minhash_mode == "unweighted"

    def score(batch: pa.Table) -> pa.Table:
        (p_ids, p_blobs), (d_ids, d_blobs) = _ray.get(bags_ref)
        p = np.asarray(batch.column("probe_id"), dtype=np.int64)
        d = np.asarray(batch.column("doc_id"), dtype=np.int64)
        n = batch.num_rows
        keep = np.zeros(n, dtype=bool)
        sims = np.zeros(n, dtype=np.float32)
        pi = np.searchsorted(p_ids, p)
        di = np.searchsorted(d_ids, d)
        for i in range(n):
            if pi[i] >= len(p_ids) or p_ids[pi[i]] != p[i]:
                continue
            if di[i] >= len(d_ids) or d_ids[di[i]] != d[i]:
                continue
            iu, wu = unpack_bag(p_blobs[pi[i]])
            iv, wv = unpack_bag(d_blobs[di[i]])
            if binary:
                inter = len(np.intersect1d(iu, iv, assume_unique=True))
                union = len(iu) + len(iv) - inter
                sim = inter / union if union else 0.0
            else:
                sim = weighted_jaccard_sparse(iu, wu, iv, wv)
            sims[i] = sim
            keep[i] = sim >= thr
        res = pa.table({
            "probe_id": pa.array(p, type=pa.int64()),
            "doc_id": pa.array(d, type=pa.int64()),
            "similarity": pa.array(sims, type=pa.float32())})
        return res.filter(pa.array(keep))

    return out.map_batches(score, batch_format="pyarrow")
