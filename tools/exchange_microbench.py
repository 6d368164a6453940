"""Isolate the bucket-groupby exchange (the worst-scaling stage) and
compare shuffle strategies on a band-shaped table.

The 2->8 per-stage splits (BENCH/SCALING_2_8.json r3 samples) show map
stages scaling at 0.83-0.90 while the edges exchange sits at ~0.41:
``groupby("pkey").map_groups`` pays Ray's sort-shuffle machinery
(boundary sampling + per-block sort by pkey + range merge) even though
the per-partition star kernel re-lexsorts by (bucket, doc) anyway.
Candidates measured here, all producing the identical edge multiset:

  sort      groupby("pkey").map_groups            (current pipeline)
  sort_lean same, band_id dropped before the exchange (17% fewer bytes)
  hash      ShuffleStrategy.HASH_SHUFFLE + groupby(num_partitions=P)
  repart    repartition(P, keys=["pkey"]) + map_batches(star) —
            hash exchange, NO sort anywhere; a block holds >= 1 whole
            pkey groups, and the star kernel's own bucket segmentation
            makes that safe (merging salt sub-buckets of one bucket
            only strengthens connectivity; star-of-stars = star)

Usage:
  python tools/exchange_microbench.py gen [n_docs]
  python tools/exchange_microbench.py run <num_cpus> <variant> [n_docs]
  python tools/exchange_microbench.py ab <num_cpus> <v1,v2,...> [reps] [n_docs]

``run`` executes one variant in a fresh in-process Ray and prints one
JSON line; ``ab`` interleaves variants round-robin in fresh
subprocesses (the same-window A/B discipline from BENCH/BASELINE.md —
host noise hits all variants alike).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

HTNUM = 9
DUP_FRAC = 0.36          # fixture-like: ~64% of docs unique
FIX_DIR = "/tmp/apollo_ray_exchange_fixture"


def make_fixture(n_docs: int) -> str:
    """Deterministic band-shaped table: htnum bucket rows per doc; a
    DUP_FRAC slice of docs shares all bucket values with a partner
    group (mimics near-dup groups), the rest are globally unique."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from apollo_ray.hashing import mix_to_partition, splitmix64

    path = os.path.join(FIX_DIR, "bands_%d" % n_docs)
    if os.path.exists(os.path.join(path, "_DONE")):
        return path
    os.makedirs(path, exist_ok=True)
    rng = np.random.RandomState(7)
    doc = np.arange(n_docs, dtype=np.int64)
    # group id: unique docs get their own group; dup docs share a group
    # of mean size 3 with neighbours
    group = doc.copy()
    n_dup = int(n_docs * DUP_FRAC)
    dup_ids = rng.choice(n_docs, size=n_dup, replace=False)
    group[dup_ids] = dup_ids // 3 * 3 + n_docs        # synthetic shared ids
    # bucket value: hash(group, band) — same group => same 9 buckets
    doc_rep = np.repeat(doc, HTNUM)
    band_rep = np.tile(np.arange(HTNUM, dtype=np.int32), n_docs)
    g_rep = np.repeat(group, HTNUM)
    bucket = splitmix64((g_rep.astype(np.uint64) << np.uint64(8))
                        ^ band_rep.astype(np.uint64)).astype(np.int64)
    pkey_salt, num_partitions = 8, 64
    key = (bucket.astype(np.uint64)
           ^ splitmix64((doc_rep % pkey_salt).astype(np.uint64))
           ).astype(np.int64)
    pkey = mix_to_partition(key, num_partitions)
    t = pa.table({"band_id": pa.array(band_rep),
                  "bucket": pa.array(bucket, type=pa.int64()),
                  "doc_id": pa.array(doc_rep, type=pa.int64()),
                  "pkey": pa.array(pkey, type=pa.int32())})
    n_files = 64
    step = (t.num_rows + n_files - 1) // n_files
    step -= step % HTNUM                    # keep docs whole per file
    for i in range(0, t.num_rows, step):
        pq.write_table(t.slice(i, step),
                       os.path.join(path, "part-%05d.parquet" % i),
                       row_group_size=1 << 16)
    with open(os.path.join(path, "_DONE"), "w") as f:
        f.write("ok")
    return path


def run_variant(variant: str, num_cpus: int, n_docs: int) -> dict:
    import ray
    import ray.data as rd
    from ray.data.context import DataContext, ShuffleStrategy

    from apollo_ray.stages.edges import _star_edges_in_partition

    path = make_fixture(n_docs)
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    if variant in ("hash", "repart"):
        # the DataContext is snapshotted into each Dataset at creation,
        # so the strategy must be set before read_parquet
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    files = [os.path.join(path, f) for f in sorted(os.listdir(path))
             if f.startswith("part-")]
    rd.read_parquet(files).count()            # warm page cache, untimed
    P = max(16, num_cpus * 2)

    def star_block(batch, emit_reps=True):
        return _star_edges_in_partition(batch, emit_reps=emit_reps)

    t0 = time.monotonic()
    bands = rd.read_parquet(files, override_num_blocks=len(files)) \
        .materialize()                         # pipeline-shape input:
    t_mat = time.monotonic() - t0              # bands arrive materialized
    t0 = time.monotonic()
    if variant == "sort":
        out = bands.groupby("pkey").map_groups(
            _star_edges_in_partition, batch_format="pyarrow",
            fn_kwargs={"emit_reps": True})
    elif variant == "sort_lean":
        out = bands.select_columns(["bucket", "doc_id", "pkey"]) \
            .groupby("pkey").map_groups(
                _star_edges_in_partition, batch_format="pyarrow",
                fn_kwargs={"emit_reps": True})
    elif variant == "hash":
        out = bands.select_columns(["bucket", "doc_id", "pkey"]) \
            .groupby("pkey", num_partitions=P).map_groups(
                _star_edges_in_partition, batch_format="pyarrow",
                fn_kwargs={"emit_reps": True})
    elif variant == "repart":
        out = bands.select_columns(["bucket", "doc_id", "pkey"]) \
            .repartition(P, keys=["pkey"]) \
            .map_batches(star_block, batch_format="pyarrow",
                         zero_copy_batch=True)
    elif variant == "core":
        # hand-rolled static hash exchange with raw Ray tasks: one
        # split task per input block (num_returns=P sub-tables sliced
        # by pkey % P) + one star task per partition gathering its B
        # sub-tables — no sort machinery, no aggregator actors, task
        # count B + P, object count B*P
        import pyarrow as pa

        @ray.remote
        def split_block(tbl: "pa.Table", nparts: int):
            pk = np.asarray(tbl.column("pkey"), dtype=np.int64) % nparts
            order = np.argsort(pk, kind="stable")
            counts = np.bincount(pk, minlength=nparts)
            bounds = np.concatenate([[0], np.cumsum(counts)])
            sorted_tbl = tbl.take(pa.array(order))
            return tuple(sorted_tbl.slice(bounds[i], counts[i])
                         for i in range(nparts))

        @ray.remote
        def star_part(*parts):
            t = pa.concat_tables(parts)
            return _star_edges_in_partition(t, emit_reps=True).num_rows

        refs = bands.to_arrow_refs()
        B = len(refs)
        split = [split_block.options(num_returns=P).remote(r, P)
                 for r in refs]
        if P == 1:
            split = [[s] for s in split]
        parts = [star_part.remote(*[split[b][p] for b in range(B)])
                 for p in range(P)]
        n_edges = sum(ray.get(parts))
        t_ex = time.monotonic() - t0
        res = {"variant": variant, "num_cpus": num_cpus, "n_docs": n_docs,
               "mat_sec": round(t_mat, 3), "exchange_sec": round(t_ex, 3),
               "n_edges": int(n_edges)}
        ray.shutdown()
        return res
    elif variant in ("staged8", "staged1"):
        # the REAL bucket_star_edges end-to-end (level-1 materialize +
        # filter passes + level-2 rep-link groupby when salt=8), over a
        # pre-keyed band table, exactly as the pipeline runs it
        from apollo_ray.config import DedupConfig
        from apollo_ray.stages.edges import bucket_star_edges
        salt = 8 if variant == "staged8" else 1
        cfg = DedupConfig(bucket_salt=salt)
        src = bands
        if salt == 1:
            # pkey in the fixture was salted at 8; re-key unsalted
            src = bands.select_columns(["bucket", "doc_id"])
        out = bucket_star_edges(src, cfg, num_partitions=P,
                                pre_keyed=(salt == 8))
    else:
        raise SystemExit("unknown variant %r" % variant)
    n_edges = out.count()
    t_ex = time.monotonic() - t0
    res = {"variant": variant, "num_cpus": num_cpus, "n_docs": n_docs,
           "mat_sec": round(t_mat, 3), "exchange_sec": round(t_ex, 3),
           "n_edges": int(n_edges)}
    ray.shutdown()
    return res


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "ab"
    if mode == "gen":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
        print(make_fixture(n))
        return 0
    if mode == "run":
        ncpu = int(sys.argv[2])
        variant = sys.argv[3]
        n = int(sys.argv[4]) if len(sys.argv) > 4 else 2_000_000
        print(json.dumps(run_variant(variant, ncpu, n)))
        return 0
    # ab: interleave variants in fresh subprocesses
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    variants = (sys.argv[3] if len(sys.argv) > 3
                else "sort,sort_lean,hash,repart").split(",")
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    n = int(sys.argv[5]) if len(sys.argv) > 5 else 2_000_000
    make_fixture(n)
    results: dict[str, list[float]] = {v: [] for v in variants}
    for r in range(reps):
        for v in variants:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "run",
                 str(ncpu), v, str(n)],
                capture_output=True, text=True, cwd=ROOT, timeout=1200)
            line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() \
                else ""
            try:
                rec = json.loads(line)
            except (json.JSONDecodeError, ValueError):
                print("FAIL %s: %s" % (v, out.stderr.strip()[-400:]),
                      flush=True)
                continue
            results[v].append(rec["exchange_sec"])
            print("rep %d %-10s exchange %6.2fs  (mat %5.2fs, edges %d)"
                  % (r, v, rec["exchange_sec"], rec["mat_sec"],
                     rec["n_edges"]), flush=True)
    print(json.dumps({v: {"samples": s, "best": min(s) if s else None}
                      for v, s in results.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
