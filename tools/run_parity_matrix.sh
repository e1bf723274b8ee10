#!/bin/bash
# Full parity matrix: 10 released variants x 2 ISO levels.
# Generates the tiny synthetic datasets if absent, runs each comparison on
# CPU (exact precision; avoids TPU contention), appends one line per cell to
# $OUT. Designed to run for hours in the background.
set -u
cd /root/repo
OUT=${OUT:-/tmp/parity_matrix.log}
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu

for ISO in 3200 12800; do
  ROOT=/tmp/tiny_synth_iso$ISO
  if [ ! -d $ROOT/validation ]; then
    python tools/make_tiny_dataset.py --root $ROOT --iso $ISO \
      >> $OUT.gen 2>&1 || { echo "DATASET iso$ISO FAILED" >> $OUT; continue; }
  fi
done

VARIANTS="non_recurrent-convunet-no_warp non_recurrent-convunet-no_warp-future non_recurrent-convunet non_recurrent-convunet-future recurrent-convunet recurrent-convunet-future recurrent-convunet+feat recurrent-convunet+feat-future recurrent-ConvNeXtUnet recurrent-ConvNeXtUnet+feat-future"

for ISO in 3200 12800; do
  ROOT=/tmp/tiny_synth_iso$ISO
  for V in $VARIANTS; do
    if grep -q "^$V iso$ISO " $OUT 2>/dev/null; then continue; fi
    R=$(python tools/compare_parity.py --dataroot $ROOT/validation \
        --variant "$V" --iso $ISO --workdir /tmp/parity_iso$ISO 2>&1 \
        | grep -E "delta|PARITY")
    echo "$V iso$ISO $(echo $R | tr '\n' ' ')" >> $OUT
  done
done
echo "MATRIX DONE" >> $OUT
