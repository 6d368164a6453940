"""End-to-end corpus curation: the composed LLM-training-data flow

    pages ──extract──▶ docs
      ──[per-site boilerplate strip]──▶ (optional, RefinedWeb-style)
      ──[C4 line clean]──▶ cleaned docs
      ──[quality / repetition / language filters]──▶ kept docs
      ──[cross-doc line dedup]──▶ (optional, ccnet-style)
      ──[duplicated-substring cutting]──▶ (optional, Lee et al.)
      ──MinHash-LSH near-dedup──▶ clusters
      ──representative selection──▶ curated corpus

Every step is the already-tested operator (``functions/clean.py``,
``functions/textstats.repetition_numerators``, ``pipelines/dedup``);
this module only composes them into one streaming pipeline.  The
clean+filter step is a single ``map_batches`` (one pass over the
text), dedup reuses ``run_dedup`` with the filtered docs injected
(``docs_ds=``), and representative selection is the pkey pattern + a
hash join — no driver-side materialization anywhere.

Scale: identical profile to the flagship dedup (doc/SCALE.md) plus
one extra inner join of the curated ids against the docs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from apollo_ray.config import DedupConfig
from apollo_ray.hashing import hash_utf8, mix_to_partition
from apollo_ray.util import hash_join

# representative-id broadcast cap: above this the final membership
# filter falls back to a shuffle hash join instead of a driver-held
# id array (mirrors BROADCAST_COLLAPSE_MAX_DUPS in stages/bags.py)
REP_BROADCAST_MAX = 50_000_000


@dataclass(frozen=True)
class CurateConfig:
    """Thresholds for the clean + filter step.

    Defaults follow the published heuristics loosely (C4 line rules;
    Gopher repetition caps, Rae et al. 2021 §A1.1) — tune per corpus.
    """
    clean_lines: bool = True          # C4 line-level filter first
    min_words_per_line: int = 3
    langs: tuple[str, ...] | None = None   # allowlist; None = keep all
    min_tokens: int = 20              # doc-level floor after cleaning
    max_dup_line_frac: float = 0.30
    max_dup_3gram_frac: float = 0.60
    # cross-doc duplicated-substring cutting (Lee et al.) before the
    # near-dedup: 0 disables; >0 sets the min span length in chars.
    # Uses winnowed detection when cut_winnow_w is set (the scale
    # path), exact stride-1 otherwise.
    cut_substrings_min_len: int = 0
    cut_winnow_w: int | None = None
    # ccnet-style cross-doc line dedup before the near-dedup:
    # False disables; line_dedup_min_len sets the eligibility floor.
    dedup_lines: bool = False
    line_dedup_min_len: int = 1
    # per-site boilerplate stripping (RefinedWeb-style) FIRST, before
    # the quality filters (boilerplate inflates the repetition stats):
    # 0 disables; >=2 drops EVERY occurrence of a line whose count
    # within its scope reaches the threshold (nav bars, footers,
    # cookie banners repeat on every page of a site).
    strip_boiler_min_df: int = 0
    # "host" (derived from the url column), "global", or the name of
    # an existing docs column to scope line frequencies by.
    boiler_scope: str = "host"
    boiler_min_len: int = 1
    # publish-time PII scrubbing of the curated output (AFTER dedup,
    # so redaction never perturbs the duplicate clustering).
    redact_pii: bool = False
    # drop code-flagged documents (classify.code_flags integer rule) —
    # the prose-corpus routing decision; code goes to its own pile.
    drop_code: bool = False
    # representative election per near-dup cluster: "min_id" (the
    # reference's deterministic choice), "longest" (keep the doc
    # with the most characters — the usual production keep rule, so a
    # truncated mirror never shadows the full page; doc_id ties), or
    # "priority" (keep the copy from the best-ranked HOST per
    # ``priority_hosts``, listed best-first, unlisted hosts after —
    # the best-provenance rule when curated domains mix with mirrors;
    # doc_id ties).
    keep_rule: str = "min_id"
    priority_hosts: tuple = ()


def clean_filter_docs(docs: "ray.data.Dataset", ccfg: CurateConfig
                      ) -> "ray.data.Dataset":
    """One-pass clean + filter over ``docs``; rewrites ``text`` (and
    ``text_hash``) when cleaning, drops failing rows."""

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        if ccfg.clean_lines:
            from apollo_ray.functions.clean import (_counts_per_list,
                                                    keep_mask)
            lines = pc.split_pattern(text, pattern="\n")
            ll = pc.list_value_length(lines).to_numpy(
                zero_copy_only=False).astype(np.int64)
            flat = lines.flatten()
            km = keep_mask(flat, ccfg.min_words_per_line)
            n_kept = _counts_per_list(km, ll)
            off = np.zeros(len(ll) + 1, dtype=np.int64)
            np.cumsum(n_kept, out=off[1:])
            kept = pa.ListArray.from_arrays(
                pa.array(off, type=pa.int32()), flat.filter(pa.array(km)))
            text = pc.binary_join(kept, "\n")
            th = pa.array([hash_utf8(t) for t in text.to_pylist()],
                          type=pa.int64())
        else:
            th = batch.column("text_hash")
        from apollo_ray.functions.textstats import repetition_numerators
        nums = repetition_numerators(text)
        keep = nums["n_tokens"] >= ccfg.min_tokens
        with np.errstate(invalid="ignore", divide="ignore"):
            dlf = np.where(nums["n_lines"] > 0,
                           nums["n_dup_lines"] / nums["n_lines"], 0.0)
            d3f = np.where(nums["n_3grams"] > 0,
                           nums["n_dup_3grams"] / nums["n_3grams"], 0.0)
        keep &= dlf <= ccfg.max_dup_line_frac
        keep &= d3f <= ccfg.max_dup_3gram_frac
        if ccfg.langs is not None:
            lang = np.asarray(batch.column("lang").to_pylist(), dtype=object)
            keep &= np.isin(lang, np.asarray(ccfg.langs, dtype=object))
        if ccfg.drop_code:
            from apollo_ray.functions.classify import code_flags
            keep &= ~code_flags(text)[1]
        out = batch.set_column(batch.column_names.index("text"),
                               "text", text)
        out = out.set_column(batch.column_names.index("text_hash"),
                             "text_hash", th)
        return out.filter(pa.array(keep))

    return docs.map_batches(f, batch_format="pyarrow")


def _strip_boiler_docs(docs: "ray.data.Dataset", ccfg: CurateConfig,
                       num_partitions: int) -> "ray.data.Dataset":
    """Per-scope frequent-line removal over the extracted docs,
    restoring the docs schema (``text_hash`` recomputed from the
    rewritten text, helper columns dropped)."""
    from apollo_ray.functions.clean import strip_boilerplate

    scope_col: str | None
    drop_scope = False
    if ccfg.boiler_scope == "global":
        scope_col = None
    elif ccfg.boiler_scope == "host":
        from apollo_ray.functions.urls import canonicalize_url_array

        def add_host(batch: pa.Table) -> pa.Table:
            _, host = canonicalize_url_array(batch.column("url"))
            return batch.append_column("host", host.fill_null(""))

        docs = docs.map_batches(add_host, batch_format="pyarrow")
        scope_col, drop_scope = "host", True
    else:
        scope_col = ccfg.boiler_scope
    stripped = strip_boilerplate(docs, min_df=ccfg.strip_boiler_min_df,
                                 scope_col=scope_col,
                                 min_len=ccfg.boiler_min_len,
                                 num_partitions=num_partitions)

    def rehash(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        th = pa.array([hash_utf8(t) for t in texts], type=pa.int64())
        out = batch.set_column(batch.column_names.index("text_hash"),
                               "text_hash", th)
        drop = ["n_boiler_lines"] + (["host"] if drop_scope else [])
        return out.drop_columns(drop)

    return stripped.map_batches(rehash, batch_format="pyarrow")


def cluster_representatives(clusters: "ray.data.Dataset",
                            num_partitions: int = 64,
                            scores: "ray.data.Dataset | None" = None
                            ) -> "ray.data.Dataset":
    """(doc_id,) — one representative per cc (pkey pattern).

    Default election: minimum doc_id.  With ``scores`` (a
    (doc_id:int64, score:int64) metadata Dataset), election becomes
    max score, min doc_id on ties — the production "keep the best
    version of a near-dup cluster" rule.  The score attach is a
    metadata-only hash join (16 B/row each side, the payload never
    moves), then the same one-lexsort first-row-per-segment election.
    """
    if scores is not None:
        clusters = hash_join(clusters, scores, on=("doc_id",),
                             num_partitions=num_partitions)

    def add_pkey(batch: pa.Table) -> pa.Table:
        cc = np.asarray(batch.column("cc_id"), dtype=np.int64)
        return batch.append_column(
            "pkey", pa.array(mix_to_partition(cc, num_partitions),
                             type=pa.int32()))

    def reduce_part(group: pa.Table) -> pa.Table:
        cc = np.asarray(group.column("cc_id"), dtype=np.int64)
        if len(cc) == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64())})
        d = np.asarray(group.column("doc_id"), dtype=np.int64)
        if "score" in group.column_names:
            s = np.asarray(group.column("score"), dtype=np.int64)
            order = np.lexsort((d, -s, cc))
        else:
            order = np.lexsort((d, cc))
        cc_s, d_s = cc[order], d[order]
        first = np.empty(len(cc_s), dtype=bool)
        first[0] = True
        first[1:] = cc_s[1:] != cc_s[:-1]
        return pa.table({"doc_id": pa.array(d_s[first], type=pa.int64())})

    return clusters.map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(reduce_part, batch_format="pyarrow")


def curate_corpus(pages: "ray.data.Dataset", cfg: DedupConfig,
                  ccfg: CurateConfig | None = None,
                  num_partitions: int = 64) -> dict[str, Any]:
    """Run the full curation flow; returns
    ``{"curated": Dataset(docs schema), "clusters": ..., "metrics"}``.
    ``curated`` holds one representative per near-dup cluster of the
    cleaned, quality-filtered corpus."""
    from apollo_ray.stages.extract import extract_docs
    from apollo_ray.pipelines.dedup import run_dedup
    ccfg = ccfg or CurateConfig()
    docs = extract_docs(pages, cfg)
    if ccfg.strip_boiler_min_df > 0:
        docs = _strip_boiler_docs(docs, ccfg, num_partitions)
    kept = clean_filter_docs(docs, ccfg).materialize()
    if ccfg.dedup_lines and kept.count() > 0:
        from apollo_ray.functions.clean import line_dedup
        from apollo_ray.hashing import hash_utf8 as _h

        def rehash(batch: pa.Table) -> pa.Table:
            texts = batch.column("text").to_pylist()
            th = pa.array([_h(t) for t in texts], type=pa.int64())
            out = batch.set_column(batch.column_names.index("text_hash"),
                                   "text_hash", th)
            return out.drop_columns(["n_dup_lines"])

        kept = line_dedup(kept, min_len=ccfg.line_dedup_min_len,
                          num_partitions=num_partitions) \
            .map_batches(rehash, batch_format="pyarrow").materialize()
    if ccfg.cut_substrings_min_len > 0 and kept.count() > 0:
        from apollo_ray.functions.substring import (cut_dup_spans,
                                                    substring_dup_spans)
        spans = substring_dup_spans(kept,
                                    min_len=ccfg.cut_substrings_min_len,
                                    winnow_w=ccfg.cut_winnow_w,
                                    num_partitions=num_partitions)
        kept = cut_dup_spans(kept, spans,
                             num_partitions=num_partitions).materialize()
    if kept.count() == 0:
        # empty Ray datasets lose their schema through joins — short-
        # circuit (e.g. a punctuation-free corpus with clean_lines=True)
        empty_clusters = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], type=pa.int64()),
            "cc_id": pa.array([], type=pa.int64())}))
        return {"curated": kept, "clusters": empty_clusters,
                "kept_docs": kept, "metrics": {"empty_after_filter": True}}
    res = run_dedup(None, cfg, docs_ds=kept, num_partitions=num_partitions)
    scores = None
    if ccfg.keep_rule == "longest":
        def score_of(batch: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "score": pc.utf8_length(batch.column("text")).cast(
                    pa.int64()).fill_null(0)})
        scores = kept.map_batches(score_of, batch_format="pyarrow")
    elif ccfg.keep_rule == "priority":
        from apollo_ray.functions.urls import _host_of
        prio = {h: i for i, h in enumerate(ccfg.priority_hosts)}
        n_listed = len(prio)

        def prio_score(batch: pa.Table) -> pa.Table:
            hosts = _host_of(batch.column("url")).to_pylist()
            sc = [n_listed - prio.get(h, n_listed) for h in hosts]
            return pa.table({
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "score": pa.array(sc, type=pa.int64())})

        scores = kept.map_batches(prio_score, batch_format="pyarrow")
    elif ccfg.keep_rule != "min_id":
        raise ValueError("keep_rule must be 'min_id', 'longest' or "
                         "'priority', got %r" % (ccfg.keep_rule,))
    reps = cluster_representatives(res["clusters"], num_partitions,
                                   scores=scores)
    n_reps = reps.count()
    if n_reps <= REP_BROADCAST_MAX:
        # broadcast the rep-id array (8 B/row; 400 MB at the 50M cap)
        # and filter with np.searchsorted — same pattern as the exact-
        # collapse dup-id broadcast, and it avoids shipping doc text
        # through a shuffle join
        import ray
        ids = [b["doc_id"] for b in reps.iter_batches(batch_format="numpy")]
        rep_ref = ray.put(np.sort(np.concatenate(ids))
                          if ids else np.empty(0, dtype=np.int64))

        def keep_reps(batch: pa.Table, rep_ref=rep_ref) -> pa.Table:
            import ray as _ray
            arr = _ray.get(rep_ref)
            d = np.asarray(batch.column("doc_id"), dtype=np.int64)
            i = np.searchsorted(arr, d)
            hit = (i < len(arr))
            hit[hit] &= arr[i[hit]] == d[hit]
            return batch.filter(pa.array(hit))

        curated = kept.map_batches(keep_reps, batch_format="pyarrow")
    else:
        curated = hash_join(kept, reps, on=("doc_id",),
                            num_partitions=num_partitions)
    if ccfg.redact_pii:
        from apollo_ray.functions.pii import PII_PATTERNS

        def scrub(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            text = batch.column("text")
            for _, pat, repl in PII_PATTERNS:
                text = pc.replace_substring_regex(text, pattern=pat,
                                                  replacement=repl)
            return batch.set_column(batch.column_names.index("text"),
                                    "text", text)

        curated = curated.map_batches(scrub, batch_format="pyarrow")
    return {"curated": curated, "clusters": res["clusters"],
            "kept_docs": kept, "metrics": res["metrics"]}
