#!/bin/bash
# One-shot executor for the TPU-gated work queue (TODO_TPU.md).
# Run the moment the axon tunnel is back:  bash tools/tpu_queue.sh
# Everything lands under $OUTDIR; safe to re-run (steps are independent).
set -u
OUTDIR=${1:-/tmp/tpu_queue}
cd "$(dirname "$0")/.."
mkdir -p "$OUTDIR"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUTDIR/queue.log" >&2; }

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  log "== $name: $*"
  timeout "$tmo" "$@" > "$OUTDIR/$name.log" 2>&1
  local rc=$?
  tail -3 "$OUTDIR/$name.log" | tee -a "$OUTDIR/queue.log" >&2
  log "== $name done rc=$rc"
}

# 1. headline fps (current HEAD: 3 optimization commits past the last 28.9)
step headline 900 python bench.py

# 2. attribution for whatever ms remain to 30
step profile 900 python tools/profile_step.py
step trace 900 python bench.py --trace_dir "$OUTDIR/trace"

# 3. flagship + the dw knob sweeps (TODO item 3: knobs before code)
step flagship 900 python bench.py --model convnext+feat+future
step flagship_mxu2 900 python bench.py --model convnext+feat+future --dw_impl mxu2
step cnx_sweep 1800 python tools/cnx_chain_bench.py
step cnx_sweep3 3600 python tools/cnx_chain_bench.py --sweep3
step cnx_sweep2 1200 python tools/cnx_chain_bench.py --sweep2
step cnx_attrib 1200 python tools/cnx_chain_bench.py --attrib

# 4. the full bench matrix (fills every BENCH.md r3 row)
step matrix 3600 bash tools/run_bench_matrix.sh "$OUTDIR/bench_matrix.jsonl"

# 5. TPU-side fused-quality spot checks (no --interpret; exact side cached)
step fq_feat_fast 2400 python tools/fused_quality.py \
  --fused_precision fast --variants recurrent-convunet+feat \
  --iso 3200,12800 --dataroot '/tmp/tiny_rich_iso{iso}/validation' \
  --workdir /tmp/fq_tpu --cache /tmp/fq_rich/exact_cache.json \
  --out "$OUTDIR/fq_feat_fast.json"
step fq_fut_mixed 2400 python tools/fused_quality.py \
  --fused_precision mixed --variants recurrent-convunet+feat-future \
  --iso 3200,12800 --dataroot '/tmp/tiny_rich_iso{iso}/validation' \
  --workdir /tmp/fq_tpu --cache /tmp/fq_rich/exact_cache.json \
  --out "$OUTDIR/fq_fut_mixed.json"
step fq_cnx_fast 2400 python tools/fused_quality.py \
  --fused_precision fast --variants recurrent-ConvNeXtUnet+feat-future \
  --iso 3200,12800 --dataroot '/tmp/tiny_rich_iso{iso}/validation' \
  --workdir /tmp/fq_tpu --cache /tmp/fq_rich/exact_cache.json \
  --out "$OUTDIR/fq_cnx_fast.json"

# 6. self-contained mode
step selfcontained 900 python bench.py --with_flow --fast_flow

# 7. environment sanity: one end-to-end parity cell
step parity 2400 python tools/compare_parity.py \
  --dataroot /tmp/tiny_synth_iso3200/validation \
  --variant recurrent-convunet+feat --iso 3200 \
  --workdir "$OUTDIR/parity"

log "QUEUE COMPLETE -> $OUTDIR"
