"""Probe-bracketed scaling sampler (the BENCH/BASELINE.md discipline,
automated).

The host shows multi-minute contention episodes where 32-way aggregate
DRAM bandwidth halves while <=8-way stays normal (BENCH/BASELINE.md,
NOTES_r2/r3).  A scaling sample taken inside such a window measures
the co-tenant, not the code — so every sample must be bracketed by
no-Ray kernel probes.  This tool loops:

    probe -> clean?  ->  bench.py --scaling  ->  post-probe ->
    record sample (clean only if BOTH probes clean) -> repeat

Usage: python tools/scaling_sampler.py [max_samples] [max_minutes]
Appends samples to BENCH/SCALING_8_32.json r3_samples.
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REC = os.path.join(ROOT, "BENCH", "SCALING_8_32.json")
# clean-window gates, from the recorded clean ranges
MIN_EFF_8_32 = 0.75
MIN_AGG32 = 70_000          # docs/s, clean range 79-87k


def probe() -> tuple[float, float]:
    out = subprocess.run([sys.executable,
                          os.path.join(ROOT, "tools", "wmh_microbench.py")],
                         capture_output=True, text=True, timeout=420).stdout
    agg = [float(m.replace(",", "")) for m in
           re.findall(r"agg=([\d,]+) docs/s", out)]
    eff = re.search(r"8->32 eff ([\d.]+)", out)
    return (float(eff.group(1)) if eff else 0.0,
            agg[-1] if agg else 0.0)


def main() -> int:
    max_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    max_minutes = float(sys.argv[2]) if len(sys.argv) > 2 else 60
    t_end = time.time() + max_minutes * 60
    taken = 0
    while taken < max_samples and time.time() < t_end:
        eff, agg = probe()
        print("probe: kernel 8->32 %.3f, 32-proc agg %.0f docs/s"
              % (eff, agg), flush=True)
        if eff < MIN_EFF_8_32 or agg < MIN_AGG32:
            time.sleep(240)
            continue
        env = dict(os.environ, GRAFT_SCALING_REPEATS="1")
        out = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py"),
                              "--scaling"], env=env, capture_output=True,
                             text=True, cwd=ROOT, timeout=1200)
        r = json.loads(out.stdout.strip().splitlines()[-1])
        eff2, agg2 = probe()
        clean = (eff2 >= MIN_EFF_8_32 - 0.05 and agg2 >= MIN_AGG32 * 0.9)
        sample = {
            "value": r["value"], "sec_lo": r["sec_lo"], "sec_hi": r["sec_hi"],
            "docs_per_sec_hi": r["docs_per_sec_hi"],
            "bench_rows": r["bench_rows"],
            "pre_probe": {"kernel_8_32": eff, "agg32": agg},
            "post_probe": {"kernel_8_32": eff2, "agg32": agg2},
            "clean": bool(clean),
            "note": "tools/scaling_sampler.py probe-bracketed sample"
                    + ("" if clean else " - post-probe degraded, EXCLUDED"),
        }
        d = json.load(open(REC))
        d.setdefault("r3_samples", []).append(sample)
        d["r3_clean_samples"] = [s["value"] for s in d["r3_samples"]
                                 if s.get("clean")]
        json.dump(d, open(REC, "w"), indent=1)
        print("sample: %.3f (clean=%s); r3 clean list: %s"
              % (r["value"], clean, d["r3_clean_samples"]), flush=True)
        taken += 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
