"""Offline trace analysis: per-category device budget + roofline per kernel.

Works on committed traces (docs/traces/<tag>/...vm.trace.json.gz) — no chip
needed. Aggregates XLA op events by ``hlo_category``, attributes the top
kernels to source lines, and computes achieved TF/s / GB/s per kernel from
``model_flops`` / ``bytes_accessed`` so each tax can be judged against the
v5e rooflines (197 TF/s bf16 MXU, ~820 GB/s HBM — docs/PERF.md round-3
methodology).

Usage: python tools/analyze_trace.py <trace.json.gz | docs/traces/<tag>> [top_n]
"""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

PEAK_TFS = 197.0  # v5e bf16 MXU peak
PEAK_GBS = 820.0  # v5e HBM bandwidth


def load_events(path: str):
    if os.path.isdir(path):
        cands = sorted(
            glob.glob(os.path.join(
                path, "plugins", "profile", "*", "*.trace.json.gz"))
        )
        assert cands, f"no trace under {path}"
        path = cands[-1]
    with gzip.open(path, "rt") as f:
        return json.load(f)["traceEvents"], path


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    events, path = load_events(path)

    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "args" in e
    }
    dev_pids = {
        p for p, n in pid_names.items()
        if re.search(r"TPU|/device|XLA Op", n, re.I)
    }

    # count steps from the jit_train_step spans so numbers are per-step
    steps = 0
    by_op = defaultdict(lambda: [0.0, 0, 0, "", "", ""])  # us, flops, bytes
    cat = defaultdict(lambda: [0.0, 0, 0])
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        if name.startswith("jit_train_step") or name.startswith("jit_"):
            steps += 1
            continue
        a = e.get("args", {}) or {}
        c = a.get("hlo_category", "?")
        if re.fullmatch(r"\d+", name):  # per-step group lanes
            continue
        us = e.get("dur", 0.0)
        fl = int(a.get("model_flops", 0) or 0)
        byt = int(a.get("raw_bytes_accessed", a.get("bytes_accessed", 0)) or 0)
        rec = by_op[name]
        rec[0] += us
        rec[1] += fl
        rec[2] += byt
        rec[3] = c
        rec[4] = (a.get("source", "") or "").split("/")[-1]
        rec[5] = a.get("long_name", "")[:140]
        cc = cat[c]
        cc[0] += us
        cc[1] += fl
        cc[2] += byt

    steps = max(steps, 1)
    total_us = sum(v[0] for v in cat.values())
    print(f"{path}")
    print(f"steps traced: {steps}; device time "
          f"{total_us / 1e3 / steps:.1f} ms/step")
    print("\n== by hlo_category (per step) ==")
    for c, (us, fl, byt) in sorted(cat.items(), key=lambda kv: -kv[1][0]):
        tfs = fl / max(us, 1e-9) / 1e6
        gbs = byt / max(us, 1e-9) / 1e3
        print(f"{us / 1e3 / steps:8.2f} ms {100 * us / total_us:5.1f}%  "
              f"{tfs:7.1f} TF/s {gbs:7.0f} GB/s  {c}")
    tot_fl = sum(v[1] for v in cat.values())
    print(f"\nachieved: {tot_fl / max(total_us, 1e-9) / 1e6:.1f} TF/s "
          f"device-time avg = {100 * tot_fl / max(total_us, 1e-9) / 1e6 / PEAK_TFS:.1f}% MFU "
          f"(vs {PEAK_TFS:.0f} TF/s peak)")

    print(f"\n== top {top_n} kernels (per step) ==")
    rows = sorted(by_op.items(), key=lambda kv: -kv[1][0])[:top_n]
    for name, (us, fl, byt, c, src, long_name) in rows:
        tfs = fl / max(us, 1e-9) / 1e6
        gbs = byt / max(us, 1e-9) / 1e3
        frac_roof = max(tfs / PEAK_TFS, gbs / PEAK_GBS)
        print(f"{us / 1e3 / steps:8.2f} ms {100 * us / total_us:5.1f}%  "
              f"{tfs:6.1f} TF/s {gbs:6.0f} GB/s {100 * frac_roof:5.1f}%roof "
              f"{c[:14]:14s} {name[:24]:24s} {src[:40]}")


if __name__ == "__main__":
    main()
