#!/bin/bash
# Round-5 TPU-gated measurement queue.  Run the moment the axon relay is
# healthy (probe: a jitted matmul + fetch completes in seconds):
#     bash tools/tpu_queue_r5.sh
# Steps are independent and idempotent; everything lands under $OUTDIR.
# STRICTLY one TPU client at a time on this relay: a killed/concurrent
# client wedges the remote chip for minutes (see .claude/skills/verify).
set -u
OUTDIR=${1:-/tmp/tpu_r5}
cd "$(dirname "$0")/.."
mkdir -p "$OUTDIR"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUTDIR/queue.log" >&2; }

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  log "== $name: $*"
  timeout "$tmo" "$@" > "$OUTDIR/$name.log" 2>&1
  local rc=$?
  tail -3 "$OUTDIR/$name.log" | grep -v WARNING | tee -a "$OUTDIR/queue.log" >&2
  log "== $name done rc=$rc"
  sleep 5  # let the relay drain between clients
}

# 1. headline regression check (convunet+feat fast — expect ~32.8)
step headline 1200 python bench.py

# 2. ask #4: the feat-future within-budget preset's fps
#    (auto now resolves to hybrid:glue+A+dec2; mixed was 15.4)
step futfps_auto 1500 python bench.py --model convunet+feat+future
step futfps_mixed 1500 python bench.py --model convunet+feat+future --precision mixed

# 3. on-chip quality confirmation of the hybrid preset (exact side cached
#    from the CPU runs is NOT reusable on-chip: exact must re-run here)
step fq_hybrid 3600 python tools/fused_quality.py \
  --fused_precision hybrid:glue+A+dec2 \
  --variants recurrent-convunet+feat-future --iso 3200,12800 \
  --dataroot '/tmp/tiny_rich_iso{iso}/validation' --workdir /tmp/fq_tpu5 \
  --cache /tmp/fq_tpu5/exact_cache.json --out "$OUTDIR/fq_hybrid.json"

# 4. ask #6: flagship online-flow fps (quality cell measured on CPU
#    interpret; PARITY.md round-5 section)
step cnx_onlineflow_fps 1500 python bench.py --model convnext+feat+future \
  --with_flow --fast_flow

# 5. ask #3: flagship per-stage attribution for the roofline paragraph
step cnx_attrib 1500 python tools/cnx_chain_bench.py --attrib

# 6. flagship fps regression (expect ~18.5)
step flagship 1200 python bench.py --model convnext+feat+future

# 7. verify drive on the real chip
step drive 900 python tools/drive_e2e.py

log "QUEUE DONE"
