"""Probe-bracketed scaling sampler (the BENCH/BASELINE.md discipline,
automated).

The host shows multi-minute contention episodes where 32-way aggregate
DRAM bandwidth halves while <=8-way stays normal (BENCH/BASELINE.md,
NOTES_r2/r3).  A scaling sample taken inside such a window measures
the co-tenant, not the code — so every sample must be bracketed by
no-Ray kernel probes.  This tool loops:

    probe -> clean?  ->  bench.py --scaling  ->  post-probe ->
    record sample (clean only if BOTH probes clean) -> repeat

Usage: python tools/scaling_sampler.py [max_samples] [max_minutes] [levels]

``levels`` is "8,32" (default), "2,8", "weak" (bench.py
--weak-scaling: 1M@8 vs 4M@32, records into BENCH/WEAK_SCALING.json),
or "auto"; strong samples append to BENCH/SCALING_{lo}_{hi}.json
r3_samples.  Auto mode prioritizes weak-scaling evidence (until 3
clean samples exist) whenever the 8->32 gate is clean.  Clean gates per level pair
come from the recorded clean ranges: the 8->32 pair needs the 32-proc
kernel regime healthy (eff >= 0.75, agg32 >= 70k docs/s); the 2->8
pair only needs the <=8-way regime healthy (1->8 eff >= 0.80,
single-proc >= 3,000 docs/s) — 32-way contention does not touch it
(BENCH/SCALING_2_8.json r3 note).  ``auto`` probes once per cycle and
samples whichever pair's gate is clean (8->32 preferred), so a host
mood that only permits the node-model pair still yields evidence.
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe() -> dict:
    out = subprocess.run([sys.executable,
                          os.path.join(ROOT, "tools", "wmh_microbench.py")],
                         capture_output=True, text=True, timeout=420).stdout
    agg = [float(m.replace(",", "")) for m in
           re.findall(r"agg=([\d,]+) docs/s", out)]
    e18 = re.search(r"1->8 eff ([\d.]+)", out)
    e832 = re.search(r"8->32 eff ([\d.]+)", out)
    return {
        "agg1": agg[0] if len(agg) > 0 else 0.0,
        "agg8": agg[1] if len(agg) > 1 else 0.0,
        "agg32": agg[2] if len(agg) > 2 else 0.0,
        "eff_1_8": float(e18.group(1)) if e18 else 0.0,
        "eff_8_32": float(e832.group(1)) if e832 else 0.0,
    }


def is_clean(p: dict, levels: tuple[int, int], post: bool = False) -> bool:
    # absolute throughput gates are scaled by 0.94: the probe's
    # default all-heavy workload runs the round-3 unit-weight kernel's
    # dense branch at 0.94x the old kernel (BENCH/BASELINE.md round-3
    # session 3), so a genuinely clean host reads 0.94x the historical
    # clean numbers the original gates were calibrated against;
    # efficiency-ratio gates are unit-free and stay as calibrated
    slack = 0.95 if post else 1.0      # post-probe gets mild tolerance
    if levels == (2, 8):
        return (p["eff_1_8"] >= 0.80 * slack
                and p["agg1"] >= 2850 * slack)
    return (p["eff_8_32"] >= 0.75 * slack
            and p["agg32"] >= 66_000 * (0.9 if post else 1.0))


def weak_sample(pre: dict) -> bool:
    """One bench.py --weak-scaling sample (1M@8 vs 4M@32; equal
    per-CPU work, ideal ratio 1.0), probe-bracketed like the strong
    samples.  Needs the full 8->32 gate: both legs touch the 32-way
    DRAM regime.  Records into BENCH/WEAK_SCALING.json."""
    rec = os.path.join(ROOT, "BENCH", "WEAK_SCALING.json")
    env = dict(os.environ, GRAFT_SCALING_REPEATS="1")
    out = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py"),
                          "--weak-scaling"], env=env, capture_output=True,
                         text=True, cwd=ROOT, timeout=2400)
    r = json.loads(out.stdout.strip().splitlines()[-1])
    post = probe()
    clean = is_clean(post, (8, 32), post=True)
    # Sanity applies ONLY to the kernel-bound parallel stage (bands):
    # per-CPU work is equal on both legs, so its hi/lo wall ratio must
    # sit in [0.6, 1.6] (1.0 ideal; up to ~1.45 under the measured
    # 32-way DRAM ceiling).  The docs/reps/cc/clusters stages contain
    # DRIVER-SERIAL metadata work that grows with DATA (4x), so hi/lo
    # ratios of 2-4 there are the expected Amdahl term, not a host
    # anomaly — the first three weak samples were wrongly excluded by
    # a docs_sec cap before this was understood (re-adjudicated in
    # BENCH/WEAK_SCALING.json).
    sl, sh = r.get("stage_sec_lo", {}), r.get("stage_sec_hi", {})
    if sl.get("bands_sec") and sh.get("bands_sec"):
        ratio = sh["bands_sec"] / sl["bands_sec"]
        if ratio > 1.6 or ratio < 0.6:
            clean = False
    if r["value"] > 1.1:        # super-unit weak efficiency: lo leg degraded
        clean = False
    sample = {
        "value": r["value"], "sec_lo": r["sec_lo"], "sec_hi": r["sec_hi"],
        "rows_lo": r["rows_lo"], "rows_hi": r["rows_hi"],
        "docs_per_sec_hi": r["docs_per_sec_hi"],
        "stage_sec_lo": sl, "stage_sec_hi": sh,
        "pre_probe": pre, "post_probe": post,
        "clean": bool(clean),
        "note": "tools/scaling_sampler.py probe-bracketed weak-scaling"
                " sample" + ("" if clean else
                             " - post-probe degraded or stage-split"
                             " anomaly, EXCLUDED"),
    }
    d = json.load(open(rec))
    key = "clean_samples" if clean else "excluded_samples"
    d.setdefault(key, []).append(sample)
    if clean:
        d["clean_values"] = [s["value"] for s in d["clean_samples"]
                             if isinstance(s, dict)]
    json.dump(d, open(rec, "w"), indent=1)
    print("weak sample: %.3f (clean=%s)" % (r["value"], clean), flush=True)
    return clean


def _weak_clean_count() -> int:
    rec = os.path.join(ROOT, "BENCH", "WEAK_SCALING.json")
    try:
        d = json.load(open(rec))
        return len([s for s in d.get("clean_samples", [])
                    if isinstance(s, dict)])
    except Exception:
        return 0


def main() -> int:
    max_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    max_minutes = float(sys.argv[2]) if len(sys.argv) > 2 else 60
    levels_s = sys.argv[3] if len(sys.argv) > 3 else "8,32"
    auto = levels_s == "auto"
    t_end = time.time() + max_minutes * 60
    taken = 0
    while taken < max_samples and time.time() < t_end:
        pre = probe()
        print("probe: 1->8 %.3f 8->32 %.3f agg1 %.0f agg32 %.0f"
              % (pre["eff_1_8"], pre["eff_8_32"], pre["agg1"], pre["agg32"]),
              flush=True)
        if auto:
            if is_clean(pre, (8, 32)):
                # prioritize the evidence we have least of: weak-scaling
                # clean samples (< 3) before more strong 8->32 samples
                if _weak_clean_count() < 3:
                    if weak_sample(pre):
                        taken += 1
                    continue
                levels_s = "8,32"
            elif is_clean(pre, (2, 8)):
                levels_s = "2,8"
            else:
                time.sleep(240)
                continue
            print("auto: sampling %s" % levels_s, flush=True)
        if levels_s == "weak":
            if is_clean(pre, (8, 32)):
                if weak_sample(pre):
                    taken += 1
            else:
                time.sleep(240)
            continue
        lo, hi = (int(x) for x in levels_s.split(","))
        rec = os.path.join(ROOT, "BENCH", "SCALING_%d_%d.json" % (lo, hi))
        if not is_clean(pre, (lo, hi)):
            time.sleep(240)
            continue
        env = dict(os.environ, GRAFT_SCALING_REPEATS="1",
                   GRAFT_SCALING_LEVELS=levels_s)
        out = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py"),
                              "--scaling"], env=env, capture_output=True,
                             text=True, cwd=ROOT, timeout=2400)
        r = json.loads(out.stdout.strip().splitlines()[-1])
        post = probe()
        clean = is_clean(post, (lo, hi), post=True)
        # bracket probes cannot catch a MID-LEG transient (seen: a
        # 0.421 sample with clean pre+post probes whose hi leg ran
        # its map-only docs stage SLOWER at 32 CPUs than at 8) — so
        # also require the legs' own stage splits to be physically
        # sane: a map stage must not anti-scale lo -> hi
        docs_lo = r.get("stage_sec_lo", {}).get("docs_sec")
        docs_hi = r.get("stage_sec_hi", {}).get("docs_sec")
        if docs_lo and docs_hi and docs_hi > docs_lo * 1.2:
            clean = False
        # ...and NO stage may take materially longer in absolute wall
        # time with 4x the CPUs: exchange stages are fixed-cost-bound
        # (ratio near 1 is normal) but hi > 1.35x lo means the hi leg
        # ran inside a transient the probes missed (caught once at a
        # 4M 0.424 sample: reps 2.2s->4.9s, cc 2.8s->5.0s at 8->32
        # while the post-probe squeaked past the softened gate)
        for k in ("reps_sec", "bands_sec", "edges_sec", "cc_sec",
                  "clusters_sec"):
            lo_v = r.get("stage_sec_lo", {}).get(k)
            hi_v = r.get("stage_sec_hi", {}).get(k)
            if lo_v and hi_v and hi_v > lo_v * 1.35:
                clean = False
        # ...and a kernel-bound map stage cannot scale SUPER-linearly:
        # bands per-stage efficiency above ~1.0 means the lo leg ran
        # degraded and the ratio is inflated (caught once at 0.838:
        # lo bands 61.6s vs the 40-48s clean range, "efficiency" 1.08)
        bands_lo = r.get("stage_sec_lo", {}).get("bands_sec")
        bands_hi = r.get("stage_sec_hi", {}).get("bands_sec")
        if bands_lo and bands_hi and \
                (bands_lo / bands_hi) / (hi / lo) > 1.02:
            clean = False
        sample = {
            "value": r["value"], "sec_lo": r["sec_lo"], "sec_hi": r["sec_hi"],
            "docs_per_sec_hi": r["docs_per_sec_hi"],
            "bench_rows": r["bench_rows"],
            "stage_sec_lo": r.get("stage_sec_lo", {}),
            "stage_sec_hi": r.get("stage_sec_hi", {}),
            "pre_probe": pre, "post_probe": post,
            "clean": bool(clean),
            "note": "tools/scaling_sampler.py probe-bracketed sample"
                    + ("" if clean else
                       " - post-probe degraded or leg stage-split"
                       " anomaly, EXCLUDED"),
        }
        d = json.load(open(rec))
        d.setdefault("r3_samples", []).append(sample)
        # clean lists are per input size: a 4M-row sample must not
        # enter the 2M-row median (the protocol's canonical size);
        # non-2M sizes get their own suffixed list
        d["r3_clean_samples"] = [
            s["value"] for s in d["r3_samples"]
            if s.get("clean") and s.get("bench_rows") == 2_000_000]
        other_rows = sorted({s.get("bench_rows") for s in d["r3_samples"]
                             if s.get("clean")
                             and s.get("bench_rows") != 2_000_000})
        for rows in other_rows:
            d["r3_clean_samples_%dk" % (rows // 1000)] = [
                s["value"] for s in d["r3_samples"]
                if s.get("clean") and s.get("bench_rows") == rows]
        json.dump(d, open(rec, "w"), indent=1)
        print("sample: %.3f (clean=%s); r3 clean list: %s"
              % (r["value"], clean, d["r3_clean_samples"]), flush=True)
        taken += 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
