"""Summarize a jax.profiler device trace: per-op time per step.

    python bench.py --trace_dir /tmp/trace
    python tools/trace_ops.py /tmp/trace [--steps 5] [--top 30]

Parses the Chrome-trace json (vm.trace.json.gz) the profiler writes and
prints TPU-side op durations divided by the step count.
"""

import argparse
import collections
import glob
import gzip
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    files = sorted(glob.glob(f"{args.trace_dir}/**/*.trace.json.gz", recursive=True))
    if not files:
        raise SystemExit(f"no *.trace.json.gz under {args.trace_dir}")
    ev = json.load(gzip.open(files[-1]))["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e and "TPU" in pids.get(e["pid"], ""):
            dur[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    for n, d in dur.most_common(args.top):
        print(f"{d / args.steps / 1e3:8.3f} ms  x{cnt[n] / args.steps:4.1f}  {n[:100]}")


if __name__ == "__main__":
    main()
