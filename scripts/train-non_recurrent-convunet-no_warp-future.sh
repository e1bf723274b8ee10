#!/bin/bash
# Reproduction script (non_recurrent-convunet-no_warp-future, ISO ${iso}).
# Mirrors the reference scripts/ surface: prepares the tiny dataset with the
# on-device generator, then runs the train CLI.
set -e
iso=${iso:-3200}
ROOT=${DATAROOT:-datasets/tiny_reds}

if [ ! -d "$ROOT/train/gt_iso$iso" ]; then
  python -m rvdd_tpu.cli.generate_data \
    --input_train_dataset "$ROOT/train/%03d/%08d.png" \
    --input_val_dataset "$ROOT/validation/%03d/%08d.png" \
    --output_train_dataset "$ROOT/train" \
    --output_val_dataset "$ROOT/validation" \
    --ISO $iso --first 0 --last 72 --step 3 --nb_seq_train 10 --nb_seq_val 5
fi

python -m rvdd_tpu.cli.train \
  --netDenoiser convunet-mode=fixedfeatures --patch_depth 2 --unroll_focus all --no_warp --future_patch_depth 1 \
  --dataroot "$ROOT/train" --val_dataroot "$ROOT/validation" \
  --gtFolder gt_iso$iso --nFolder noisy_iso$iso \
  --gt_linear_RGB_Folder gt_raw_linear_RGB_iso$iso \
  --suffix nonrec-nowarp-future-iso$iso --checkpoints_dir checkpoints
