#!/bin/bash
# Full measured-mode bench matrix (BENCH.md) on the real TPU chip.
# Each line of $OUT is one bench.py JSON result; run time ~20 min.
set -u
OUT=${1:-/tmp/bench_matrix.jsonl}
cd "$(dirname "$0")/.."
: > "$OUT"

run() {
  echo "== bench $* ==" >&2
  python bench.py "$@" 2>/dev/null | tail -1 >> "$OUT"
  tail -1 "$OUT" >&2
}

run                                   # headline convunet+feat, fused fast
run --precision accurate              # fp32-parity fused path
run --model convunet+feat+future      # auto -> mixed (3-pass parity preset)
run --model convunet+feat+future --precision fast
run --scan                            # whole-clip lax.scan
run --streams 2
run --streams 4
run --model convunet                  # no feature recurrence
run --model convnext+feat+future      # flagship
run --model convnext+feat+future --precision accurate
run --with_flow --fast_flow           # self-contained on-device TV-L1
run --exact                           # fp32 XLA reference-parity path
run --train --frames 10               # jitted train step, production config
run --train --frames 10 --model convnext+feat+future
echo "DONE $OUT" >&2
