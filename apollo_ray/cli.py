"""CLI — the analog of apollo's subcommand surface
(``apollo/__main__.py:72-207``): one resident Ray Data driver instead
of a chain of Cassandra-glued batch jobs.

    python -m apollo_ray.cli run    --input pages/ --ckpt /tmp/ckpt [--communities]
    python -m apollo_ray.cli reset  --ckpt /tmp/ckpt [--stages bands,edges]
    python -m apollo_ray.cli query  --input pages/ --ckpt /tmp/ckpt --file probe.txt [--precise]
    python -m apollo_ray.cli report --ckpt /tmp/ckpt
    python -m apollo_ray.cli evalcc --ckpt /tmp/ckpt [--threshold 0.8]

``run`` resumes from per-stage Parquet checkpoints; ``reset`` is the
``resetdb`` analog (``apollo/cassandra_utils.py:59-86``, including the
partial ``--hashes-only``-style stage list); ``query`` is the probe
path (``apollo/query.py:14-77``); ``report`` the ``dumpcmd`` analog.
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None, address: str = "local") -> bool:
    """Returns True when this call created the Ray session (and the
    command should shut it down on exit).

    ``address="local"`` starts a throwaway single-node session;
    ``--address auto`` attaches to the running cluster instead, which
    is how a ``ray job submit`` driver runs these commands on a
    fixed-size multi-node cluster (doc/CLUSTER.md) — there the
    cluster, not the flag, decides the CPU count."""
    import ray
    created = False
    if not ray.is_initialized():
        kwargs = {"address": address, "include_dashboard": False,
                  "logging_level": "ERROR"}
        if num_cpus and address == "local":
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
        created = True
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    return created


def _cfg_from_args(args) -> "DedupConfig":
    from apollo_ray.config import DedupConfig
    cfg = DedupConfig()
    over = {}
    for f in ("shingle_k", "size", "threshold", "seed", "feature_dim_log2",
              "minhash_mode", "community_algorithm", "tokenizer"):
        v = getattr(args, f, None)
        if v is not None:
            over[f] = v
    if getattr(args, "precise", False):
        over["verify"] = True
    return cfg.with_(**over) if over else cfg


def cmd_run(args) -> int:
    import ray
    from apollo_ray.pipelines.dedup import run_dedup
    from apollo_ray.sources.io import read_pages
    owns = _init_ray(args.num_cpus, getattr(args, "address", "local"))
    cfg = _cfg_from_args(args)
    pages = read_pages(args.input, lang_filter=args.lang.split(",") if args.lang else None)
    out = run_dedup(pages, cfg, ckpt_root=args.ckpt,
                    input_fingerprint=args.input,
                    with_communities=args.communities,
                    with_stats=args.stats)
    n = out["clusters"].count()
    print(json.dumps({"docs": n, "metrics": out["metrics"]}, default=str))
    if owns:
        ray.shutdown()
    return 0


def cmd_append(args) -> int:
    """Incrementally hash ONE new corpus shard into an existing
    checkpointed run (only edges/CC are rebuilt over the union)."""
    import ray
    from apollo_ray.pipelines.dedup import append_dedup
    from apollo_ray.sources.io import read_pages
    owns = _init_ray(args.num_cpus, getattr(args, "address", "local"))
    cfg = _cfg_from_args(args)
    pages = read_pages(args.input, lang_filter=args.lang.split(",")
                       if args.lang else None)
    import hashlib
    shard_fp = args.shard or hashlib.md5(args.input.encode()).hexdigest()[:16]
    out = append_dedup(pages, cfg, ckpt_root=args.ckpt,
                       shard_fingerprint=shard_fp)
    n = out["clusters"].count()
    print(json.dumps({"docs": n, "metrics": out["metrics"]}, default=str))
    if owns:
        ray.shutdown()
    return 0


def cmd_curate(args) -> int:
    """Clean -> filter -> dedup -> representatives; writes the curated
    corpus as partitioned Parquet (resumable output layout)."""
    import ray
    from apollo_ray.pipelines.curate import CurateConfig, curate_corpus
    from apollo_ray.sources.io import read_pages
    owns = _init_ray(args.num_cpus, getattr(args, "address", "local"))
    cfg = _cfg_from_args(args)
    ccfg = CurateConfig(
        clean_lines=not args.no_clean,
        langs=tuple(args.lang.split(",")) if args.lang else None,
        min_tokens=args.min_tokens,
        max_dup_line_frac=args.max_dup_line_frac,
        max_dup_3gram_frac=args.max_dup_3gram_frac,
        dedup_lines=args.dedup_lines,
        line_dedup_min_len=args.line_dedup_min_len,
        strip_boiler_min_df=args.strip_boilerplate,
        boiler_scope=args.boiler_scope,
        boiler_min_len=args.boiler_min_len,
        cut_substrings_min_len=args.cut_substrings_min_len,
        cut_winnow_w=args.winnow_w,
        redact_pii=args.redact_pii,
        drop_code=args.drop_code,
        keep_rule=args.keep_rule,
        priority_hosts=tuple(h for h in args.priority_hosts.split(",") if h)
        if getattr(args, "priority_hosts", "") else ())
    pages = read_pages(args.input)
    out = curate_corpus(pages, cfg, ccfg)
    curated = out["curated"]
    if args.sample_alpha is not None:
        from apollo_ray.functions.sampling import temperature_sample
        curated = temperature_sample(
            curated, alpha=args.sample_alpha,
            base_permille=args.sample_base_permille,
            group_col=args.sample_group_col)
    if args.shards:
        from apollo_ray.pipelines.export import export_shards
        manifest = export_shards(curated, args.output, args.shards)
        print(json.dumps({"curated_docs": manifest["rows"],
                          "shards": manifest["per_shard"],
                          "metrics": out["metrics"]}, default=str))
    else:
        curated.write_parquet(args.output)
        n_curated = curated.count()
        print(json.dumps({"curated_docs": n_curated,
                          "metrics": out["metrics"]}, default=str))
    if owns:
        ray.shutdown()
    return 0


def cmd_tiers(args) -> int:
    """Cost-ordered dedup cascade (exact -> canonical-url -> minhash,
    ``functions/tiers.py``); writes the tier-3 survivor corpus and
    prints the per-tier rollup."""
    import ray
    from apollo_ray.functions.tiers import tiered_dedup
    from apollo_ray.sources.io import read_pages
    from apollo_ray.stages.extract import extract_docs
    owns = _init_ray(args.num_cpus, getattr(args, "address", "local"))
    cfg = _cfg_from_args(args)
    pages = read_pages(args.input, lang_filter=args.lang.split(",")
                       if args.lang else None)
    docs = extract_docs(pages, cfg)
    emb = None
    if getattr(args, "embeddings", None):
        import ray.data
        emb = ray.data.read_parquet(args.embeddings)
    out = tiered_dedup(docs, cfg, embeddings=emb,
                       semantic_threshold=getattr(
                           args, "semantic_threshold", 0.95),
                       semantic_k=getattr(args, "semantic_k", 8))
    if args.soft:
        # soft LSH tier: exact/url dups still drop hard (they carry no
        # information), but near-dup clusters are DOWNWEIGHTED, not
        # cut — write (doc_id, cc_id, n_members, weight_ppm) per
        # tier-2 survivor for the training sampler
        from apollo_ray.functions.sampling import cluster_soft_weights
        cluster_soft_weights(out["clusters"]).write_parquet(args.output)
    else:
        out["survivors"].write_parquet(args.output)
    print(json.dumps({"tiers": out["stats"].to_pylist(),
                      "soft": bool(args.soft),
                      "metrics": out["metrics"]}, default=str))
    if owns:
        ray.shutdown()
    return 0


def cmd_export(args) -> int:
    """Re-shard an existing docs Parquet directory (optionally with
    temperature rebalancing) into training shards."""
    import ray
    import ray.data
    from apollo_ray.pipelines.export import export_shards
    owns = _init_ray(args.num_cpus, getattr(args, "address", "local"))
    docs = ray.data.read_parquet(args.input)
    if args.sample_alpha is not None:
        from apollo_ray.functions.sampling import temperature_sample
        docs = temperature_sample(docs, alpha=args.sample_alpha,
                                  base_permille=args.sample_base_permille,
                                  group_col=args.sample_group_col)
    if args.packed_seq_len is not None:
        from apollo_ray.pipelines.export import export_packed
        manifest = export_packed(docs, args.output,
                                 seq_len=args.packed_seq_len,
                                 n_shards=args.shards)
    else:
        manifest = export_shards(docs, args.output, args.shards,
                                 key=args.key)
    print(json.dumps(manifest))
    if owns:
        ray.shutdown()
    return 0


def cmd_reset(args) -> int:
    from apollo_ray.sources.io import reset
    stages = args.stages.split(",") if args.stages else None
    reset(args.ckpt, stages)
    print("reset %s (%s)" % (args.ckpt, stages or "all"))
    return 0


def cmd_query(args) -> int:
    import ray
    from apollo_ray.sources.io import read_stage
    if args.doc_id is None and args.file is None and args.probes is None:
        print("error: query needs --file, --doc-id or --probes",
              file=sys.stderr)
        return 2
    owns = _init_ray(args.num_cpus, getattr(args, "address", "local"))
    cfg = _cfg_from_args(args)
    from apollo_ray.stages.report import (query_similar,
                                          query_similar_batch,
                                          query_similar_by_id)
    bands = read_stage(args.ckpt, "bands")
    if args.probes is not None:
        # whole-table probe join: parquet (probe_id, text) in,
        # (probe_id, doc_id) candidate pairs parquet out
        import ray.data
        probes = ray.data.read_parquet(args.probes)
        bags = read_stage(args.ckpt, "bags") if args.precise else None
        pairs = query_similar_batch(probes, bands, cfg,
                                    precise=args.precise, bags_ds=bags)
        out_dir = args.output or (args.ckpt.rstrip("/") + "/query_pairs")
        pairs.write_parquet(out_dir)
        print(json.dumps({"pairs_dir": out_dir,
                          "n_pairs": pairs.count()}))
        if owns:
            ray.shutdown()
        return 0
    bags = read_stage(args.ckpt, "bags")
    if args.doc_id is not None:
        # indexed-document probe: stored signature, no re-hash
        sigs = read_stage(args.ckpt, "signatures")
        hits = query_similar_by_id(args.doc_id, sigs, bands, bags, cfg,
                                   precise=args.precise)
    else:
        with open(args.file) as f:
            text = f.read()
        hits = query_similar(text, bands, bags, cfg, precise=args.precise)
    print(json.dumps({"similar": hits}))
    if owns:
        ray.shutdown()
    return 0


def cmd_report(args) -> int:
    import ray
    from apollo_ray.sources.io import read_stage
    from apollo_ray.stages.report import cluster_report, render_markdown
    owns = _init_ray(args.num_cpus, getattr(args, "address", "local"))
    clusters = read_stage(args.ckpt, "clusters")
    docs = read_stage(args.ckpt, "docs")
    rep = cluster_report(clusters, docs).to_pandas()
    sys.stdout.write(render_markdown(rep))
    if owns:
        ray.shutdown()
    return 0


def cmd_dumpcc(args) -> int:
    """Dump raw connected components to stdout, one line per CC of
    space-joined member urls sorted by cc id — the ``dumpcc`` analog
    (``apollo/graph.py:151-157``; the reference prints
    ``id_to_element`` names per component the same way)."""
    import ray
    from apollo_ray.sources.io import read_stage
    from apollo_ray.util import hash_join
    owns = _init_ray(args.num_cpus, getattr(args, "address", "local"))
    clusters = read_stage(args.ckpt, "clusters")
    docs = read_stage(args.ckpt, "docs").select_columns(["doc_id", "url"])
    df = hash_join(clusters, docs, on=("doc_id",)).to_pandas()
    for _, grp in df.sort_values(["cc_id", "doc_id"]).groupby(
            "cc_id", sort=True):
        print(" ".join(grp["url"]))
    if owns:
        ray.shutdown()
    return 0


def cmd_evalcc(args) -> int:
    """Community fitness metrics over a checkpointed run — the
    reference's ``evalcc`` command (``apollo/__main__.py:194-207`` ->
    ``apollo/graph.py:380-412``): pairwise weighted-Jaccard misses and
    squared-loss below the configured threshold, per community and
    reduced to corpus totals.  Reads the ``communities`` and ``bags``
    stage checkpoints written by ``run --communities``."""
    import ray
    from apollo_ray.sources.io import read_stage
    from apollo_ray.stages.evalcc import evaluate_communities
    owns = _init_ray(args.num_cpus, getattr(args, "address", "local"))
    cfg = _cfg_from_args(args)
    comms = read_stage(args.ckpt, "communities")
    bags = read_stage(args.ckpt, "bags")
    out = evaluate_communities(comms, bags, cfg)
    print(json.dumps(out))
    if owns:
        ray.shutdown()
    return 0


def cmd_stats(args) -> int:
    """One-shot corpus health report over a documents-shaped parquet
    dir: per-source duplication rate, per-lang volume, Zipf vocabulary
    histogram, token-length quantiles — the first look an ops user
    takes at a new snapshot."""
    import ray
    import ray.data

    from apollo_ray.functions.textstats import (lang_stats,
                                                length_quantiles,
                                                source_dup_stats,
                                                token_freq_hist)
    owns = _init_ray(args.num_cpus, getattr(args, "address", "local"))
    docs = ray.data.read_parquet(args.input)
    cols = set(docs.schema().names)
    out = {}
    if "source" in cols:
        out["sources"] = source_dup_stats(docs).to_pandas() \
            .sort_values("source").to_dict("records")
    if "lang" in cols and "n_chars" in cols:
        out["langs"] = lang_stats(docs).to_pandas() \
            .sort_values("lang").to_dict("records")
        out["length_quantiles"] = length_quantiles(docs).to_pandas() \
            .sort_values("lang").to_dict("records")
    hist = token_freq_hist(docs).to_pandas().sort_values("bucket")
    out["token_freq_log2_hist"] = hist.to_dict("records")
    # corpus-wide encoding / markup / code rates: per-doc stat tables
    # collapse to one counts row per BLOCK inside map_batches; only
    # those scalar partials reach the driver fold (streams at any N).
    # The per-doc ops key on doc_id; a pages-shaped input (url, text)
    # gets one derived from the url hash.
    if "doc_id" not in cols and "url" in cols:
        from apollo_ray.hashing import hash_utf8 as _h

        def add_id(batch):
            import pyarrow as _pa
            ids = [_h(u or "") for u in batch.column("url").to_pylist()]
            return batch.append_column(
                "doc_id", _pa.array(ids, type=_pa.int64()))

        docs = docs.map_batches(add_id, batch_format="pyarrow")
        cols.add("doc_id")
    from apollo_ray.functions.classify import code_detect
    from apollo_ray.functions.textstats import (encoding_quality,
                                                html_tag_stats)
    import pyarrow as pa
    import pyarrow.compute as pc

    def fold_counts(ds, exprs):
        def part(batch: pa.Table) -> pa.Table:
            return pa.table({k: pa.array([f(batch)], type=pa.int64())
                             for k, f in exprs.items()})
        tot = {k: 0 for k in exprs}
        for b in ds.map_batches(part, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
            for k in exprs:
                tot[k] += int(pc.sum(b.column(k)).as_py() or 0)
        return tot

    def npos(col):
        return lambda b: pc.sum(pc.cast(pc.greater(
            b.column(col), 0), pa.int64())).as_py() or 0

    out["encoding"] = fold_counts(encoding_quality(docs), {
        "docs_with_replacement": npos("n_replacement"),
        "docs_with_mojibake": npos("n_mojibake"),
        "docs_with_ctrl": npos("n_ctrl")})
    mk = fold_counts(html_tag_stats(docs), {
        "docs_with_tags": npos("n_tags"),
        "sum_text_chars": lambda b: pc.sum(b.column("text_chars"))
        .as_py() or 0,
        "sum_chars": lambda b: pc.sum(b.column("n_chars")).as_py() or 0})
    out["markup"] = {
        "docs_with_tags": mk["docs_with_tags"],
        "mean_text_ratio_ppm": (mk["sum_text_chars"] * 1_000_000
                                // mk["sum_chars"])
        if mk["sum_chars"] else None}
    out["code_docs"] = fold_counts(code_detect(docs), {
        "n": lambda b: pc.sum(pc.cast(b.column("is_code"), pa.int64()))
        .as_py() or 0})["n"]
    # PII exposure counts (emails/phones/ips/ssn-like — what a
    # redaction pass would touch) and the corpus's heavy-hitter
    # tokens: the round-3 operators an ops user reads first
    from apollo_ray.functions.pii import pii_stats
    out["pii_docs"] = fold_counts(pii_stats(docs), {
        "with_email": npos("n_email"), "with_phone": npos("n_phone"),
        "with_ip": npos("n_ipv4")})
    from apollo_ray.functions.sketch import heavy_hitters
    hh = heavy_hitters(docs, phi_ppm=20_000).to_pandas()
    hh = hh.sort_values(["n", "token"], ascending=[False, True]).head(10)
    out["heavy_hitter_tokens"] = hh.to_dict("records")
    out["n_docs"] = docs.count()
    print(json.dumps(out, default=int))
    if owns:
        ray.shutdown()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="apollo_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--ckpt", required=True)
        sp.add_argument("--num-cpus", type=int, default=None)
        sp.add_argument("--address", default="local",
                        help="local (default: throwaway session) | auto "
                             "(attach to the running cluster, e.g. under "
                             "ray job submit) | a ray:// address")
        sp.add_argument("--shingle-k", dest="shingle_k", type=int)
        sp.add_argument("--size", type=int)
        sp.add_argument("--threshold", type=float)
        sp.add_argument("--seed", type=int)
        sp.add_argument("--feature-dim-log2", dest="feature_dim_log2", type=int)
        sp.add_argument("--tokenizer",
                        choices=("whitespace", "bpe_ish", "words"),
                        default=None,
                        help="token stream feeding the shingles: "
                             "whitespace (default) and bpe_ish run the "
                             "vectorized batch path; words (\\w+) is the "
                             "per-doc fallback")
        sp.add_argument("--community-algorithm",
                        dest="community_algorithm", default=None,
                        help="walktrap (default, built-in) | "
                             "label_propagation | any igraph "
                             "community_* name when igraph is present")
        sp.add_argument("--minhash-mode", dest="minhash_mode",
                        choices=("weighted", "unweighted"), default=None,
                        help="weighted = Ioffe WMH over weighted bags "
                             "(reference scheme); unweighted = classic "
                             "k-permutation MinHash (binary Jaccard)")

    sp = sub.add_parser("run")
    common(sp)
    sp.add_argument("--input", required=True)
    sp.add_argument("--lang", default=None)
    sp.add_argument("--communities", action="store_true")
    sp.add_argument("--stats", action="store_true")
    sp.set_defaults(handler=cmd_run)

    sp = sub.add_parser("append")
    common(sp)
    sp.add_argument("--input", required=True,
                    help="pages parquet dir of the NEW shard")
    sp.add_argument("--lang", default=None)
    sp.add_argument("--shard", default=None,
                    help="shard fingerprint (defaults to --input path)")
    sp.set_defaults(handler=cmd_append)

    sp = sub.add_parser("curate")
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", required=True)
    sp.add_argument("--num-cpus", type=int, default=None)
    sp.add_argument("--address", default="local",
                    help="local (default: throwaway session) | auto "
                         "(attach to the running cluster, e.g. under "
                         "ray job submit) | a ray:// address")
    sp.add_argument("--lang", default=None)
    sp.add_argument("--no-clean", action="store_true")
    sp.add_argument("--min-tokens", type=int, default=20)
    sp.add_argument("--max-dup-line-frac", type=float, default=0.30)
    sp.add_argument("--max-dup-3gram-frac", type=float, default=0.60)
    sp.add_argument("--dedup-lines", action="store_true",
                    help="ccnet-style cross-doc line dedup before near-dedup")
    sp.add_argument("--line-dedup-min-len", type=int, default=1)
    sp.add_argument("--strip-boilerplate", type=int, default=0,
                    metavar="MIN_DF",
                    help="drop every line repeating >= MIN_DF times "
                         "within its scope before the quality filters "
                         "(0 disables)")
    sp.add_argument("--boiler-scope", default="host",
                    help="boilerplate frequency scope: host (from url), "
                         "global, or a docs column name")
    sp.add_argument("--boiler-min-len", type=int, default=1)
    sp.add_argument("--redact-pii", action="store_true",
                    help="scrub PII placeholders into the curated "
                         "output (after dedup)")
    sp.add_argument("--drop-code", action="store_true",
                    help="drop code-flagged docs (lexical code "
                         "detector) during the quality filter")
    sp.add_argument("--keep-rule", default="min_id",
                    choices=("min_id", "longest", "priority"),
                    help="representative election per near-dup cluster")
    sp.add_argument("--priority-hosts", default="",
                    help="comma list of hosts best-first for "
                         "--keep-rule priority (unlisted hosts rank "
                         "after every listed one)")
    sp.add_argument("--cut-substrings-min-len", type=int, default=0,
                    help="cut cross-doc duplicated substrings >= this length")
    sp.add_argument("--winnow-w", type=int, default=None)
    sp.add_argument("--shards", type=int, default=0,
                    help="write hash-sharded training output")
    sp.add_argument("--sample-alpha", type=float, default=None,
                    help="temperature-rebalance groups before output")
    sp.add_argument("--sample-base-permille", type=int, default=1000)
    sp.add_argument("--sample-group-col", default="lang")
    for f in (("--shingle-k", "shingle_k", int), ("--size", "size", int),
              ("--threshold", "threshold", float), ("--seed", "seed", int),
              ("--feature-dim-log2", "feature_dim_log2", int)):
        sp.add_argument(f[0], dest=f[1], type=f[2])
    sp.set_defaults(handler=cmd_curate)

    sp = sub.add_parser("tiers")
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", required=True)
    sp.add_argument("--soft", action="store_true",
                    help="downweight near-dup clusters instead of "
                         "cutting them: write per-doc sampling weights "
                         "(doc_id, cc_id, n_members, weight_ppm) over "
                         "the tier-2 survivors")
    sp.add_argument("--lang", default=None)
    sp.add_argument("--num-cpus", type=int, default=None)
    sp.add_argument("--address", default="local")
    sp.add_argument("--shingle-k", dest="shingle_k", type=int)
    sp.add_argument("--size", type=int)
    sp.add_argument("--threshold", type=float)
    sp.add_argument("--seed", type=int)
    sp.add_argument("--feature-dim-log2", dest="feature_dim_log2", type=int)
    sp.add_argument("--minhash-mode", dest="minhash_mode",
                    choices=("weighted", "unweighted"), default=None)
    sp.add_argument("--embeddings", default=None,
                    help="parquet dir/file with (vec_id, embedding) "
                         "rows keyed by doc id; enables the semantic "
                         "SemDeDup tier over the tier-3 survivors")
    sp.add_argument("--semantic-threshold", dest="semantic_threshold",
                    type=float, default=0.95)
    sp.add_argument("--semantic-k", dest="semantic_k", type=int, default=8)
    sp.set_defaults(handler=cmd_tiers)

    sp = sub.add_parser("export")
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", required=True)
    sp.add_argument("--shards", type=int, required=True)
    sp.add_argument("--key", default="doc_id")
    sp.add_argument("--num-cpus", type=int, default=None)
    sp.add_argument("--address", default="local",
                    help="local (default: throwaway session) | auto "
                         "(attach to the running cluster, e.g. under "
                         "ray job submit) | a ray:// address")
    sp.add_argument("--sample-alpha", type=float, default=None)
    sp.add_argument("--sample-base-permille", type=int, default=1000)
    sp.add_argument("--sample-group-col", default="lang")
    sp.add_argument("--packed-seq-len", dest="packed_seq_len", type=int,
                    default=None,
                    help="write packed uint32 token sequences of this "
                         "length instead of raw doc shards")
    sp.set_defaults(handler=cmd_export)

    sp = sub.add_parser("reset")
    sp.add_argument("--ckpt", required=True)
    sp.add_argument("--stages", default=None)
    sp.set_defaults(handler=cmd_reset)

    sp = sub.add_parser("query")
    common(sp)
    sp.add_argument("--input", default=None)
    sp.add_argument("--file", default=None,
                    help="probe text file (hash-and-query path)")
    sp.add_argument("--doc-id", type=int, default=None,
                    help="query an already-indexed document by id "
                         "(reads its stored signature)")
    sp.add_argument("--probes", default=None,
                    help="parquet of (probe_id, text): batch probe "
                         "join, writes candidate pairs parquet")
    sp.add_argument("--output", default=None,
                    help="output dir for --probes pairs")
    sp.add_argument("--precise", action="store_true")
    sp.set_defaults(handler=cmd_query)

    sp = sub.add_parser("report")
    common(sp)
    sp.set_defaults(handler=cmd_report)

    sp = sub.add_parser("evalcc")
    common(sp)
    sp.set_defaults(handler=cmd_evalcc)

    sp = sub.add_parser("dumpcc")
    common(sp)
    sp.set_defaults(handler=cmd_dumpcc)

    sp = sub.add_parser("stats")
    sp.add_argument("--input", required=True,
                    help="documents-shaped parquet file or dir")
    sp.add_argument("--num-cpus", type=int, default=None)
    sp.add_argument("--address", default="local",
                    help="local (default: throwaway session) | auto "
                         "(attach to the running cluster, e.g. under "
                         "ray job submit) | a ray:// address")
    sp.set_defaults(handler=cmd_stats)

    args = p.parse_args(argv)
    try:
        return args.handler(args)
    except FileNotFoundError as e:
        # missing checkpoint stage / input path: a clean one-line error
        # instead of a traceback (the message already says what to run)
        print("error: %s" % e, file=sys.stderr)
        return 2


if __name__ == "__main__":
    sys.exit(main())
