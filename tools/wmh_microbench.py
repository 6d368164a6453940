"""No-Ray multiprocess microbenchmark of the WMH kernel.

Measures per-process throughput of ``wmh_batch_t`` at 1, 8 and 32
concurrent processes over identical synthetic CSR workloads, printing
docs/s aggregate and the 8->32 scaling efficiency.  This isolates the
kernel's memory-bandwidth behavior from Ray scheduling and parquet IO.

Usage: python tools/wmh_microbench.py [n_docs_per_proc] [mean_nnz]
           [dim_log2] [unit_frac]

``unit_frac`` sets the fraction of weights equal to exactly 1.0
(tf=1 under logtf — real webtext bags are ~95%+ unit).  The default 0
keeps the historical all-random workload so the probe gate thresholds
recorded in BENCH/ stay comparable; pass 0.95 to measure the
unit-weight fast path (one c2 gather per row) on a realistic mix.
"""
from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _worker(n_docs: int, mean_nnz: int, seed: int, out_q, dim_log2: int = 16,
            unit_frac: float = 0.0) -> None:
    from apollo_ray.kernels.wmh import (derive_params, generate_params,
                                        make_work_buffers, wmh_batch_t)
    dim, size = 1 << dim_log2, 128
    params = generate_params(dim, size, seed=1)
    dp = derive_params(params["rs"], params["ln_cs"], params["betas"])
    bufs = make_work_buffers(size)
    rng = np.random.default_rng(seed)
    lens = np.maximum(8, rng.poisson(mean_nnz, n_docs)).astype(np.int64)
    indptr = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=indptr[1:])
    nnz = int(indptr[-1])
    # sorted-unique indices per row, matching real bag layout
    idx = np.empty(nnz, dtype=np.int64)
    for i in range(n_docs):
        idx[indptr[i]:indptr[i + 1]] = np.sort(
            rng.choice(dim, lens[i], replace=False))
    data = rng.random(nnz).astype(np.float32) + np.float32(0.5)
    if unit_frac > 0:
        data[rng.random(nnz) < unit_frac] = np.float32(1.0)
    # warmup (params into cache, buffers faulted)
    wmh_batch_t(indptr[:17], idx, data, dp, work_bufs=bufs)
    t0 = time.perf_counter()
    wmh_batch_t(indptr, idx, data, dp, work_bufs=bufs)
    out_q.put(time.perf_counter() - t0)


def run(nproc: int, n_docs: int, mean_nnz: int, dim_log2: int = 16,
        unit_frac: float = 0.0) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=_worker, args=(n_docs, mean_nnz, 100 + i, q,
                                           dim_log2, unit_frac))
          for i in range(nproc)]
    t0 = time.perf_counter()
    for p in ps:
        p.start()
    times = [q.get() for _ in ps]
    for p in ps:
        p.join()
    wall = time.perf_counter() - t0
    agg = nproc * n_docs / max(times)
    print(f"  nproc={nproc:3d} docs/proc={n_docs} worker max={max(times):.2f}s "
          f"mean={np.mean(times):.2f}s wall={wall:.2f}s agg={agg:,.0f} docs/s")
    return agg


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    mean_nnz = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    dim_log2 = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    unit_frac = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
    print(f"WMH kernel microbench: {n_docs} docs/proc, mean nnz {mean_nnz}, "
          f"dim 2^{dim_log2}, size 128, unit_frac {unit_frac}")
    a1 = run(1, n_docs, mean_nnz, dim_log2, unit_frac)
    a8 = run(8, n_docs, mean_nnz, dim_log2, unit_frac)
    a32 = run(32, n_docs, mean_nnz, dim_log2, unit_frac)
    print(f"  1->8 eff {a8 / (8 * a1):.3f}   8->32 eff {a32 / (4 * a8):.3f}")


if __name__ == "__main__":
    main()
