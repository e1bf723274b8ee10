"""Dataset generation CLI: sRGB video -> synthetic noisy GBRG raw, on device.

Equivalent of the reference offline generator (reference:
dataset/generate_raw_from_RGB.py) with the whole inverse pipeline jitted;
emits the same folder structure:

    <out>/gt_iso<ISO>/<seq>/<frame>.tiff               packed raw GT
    <out>/gt_raw_linear_RGB_iso<ISO>/<seq>/<frame>.tiff  uint16 linear RGB GT
    <out>/gt_RGB_iso<ISO>/<seq>/<frame>.png            sRGB GT (val only)
    <out>/noisy_iso<ISO>/<seq>/<frame>.tiff            noisy raw

Usage:
    python -m rvdd_tpu.cli.generate_data \
        --input_train_dataset path/%03d/%08d.png --output_train_dataset out \
        --ISO 3200 --nb_seq_train 10 --first 0 --last 72 --step 3
"""

from __future__ import annotations

import argparse
from os.path import join

import numpy as np
import jax

from rvdd_tpu.data.io import imread, imwrite
from rvdd_tpu.ops.pipeline import (
    Gains,
    find_gains,
    forward_pipeline,
    synthesize_raw,
)


def process_split(in_pattern, out_root, nb_seq, iso, first, last, step, is_val, seed):
    key = jax.random.PRNGKey(seed)
    for seq in range(nb_seq):
        gains = find_gains(seq, iso)
        print(f"{'Validation' if is_val else 'Train'} dataset, sequence {seq:03d}")
        for i in range(first, last + step, step):
            img = imread(in_pattern % (seq, i)).astype(np.float32)
            h, w, _ = img.shape
            img = img[: 2 * (h // 2), : 2 * (w // 2), :]
            key, sub = jax.random.split(key)
            gt_raw, gt_linear, noisy = synthesize_raw(img, gains, iso, sub)
            imwrite(
                join(out_root, f"gt_iso{iso:4d}", f"{seq:03d}", f"{i:08d}.tiff"),
                np.asarray(gt_raw, np.float32),
            )
            imwrite(
                join(out_root, f"gt_raw_linear_RGB_iso{iso:4d}", f"{seq:03d}", f"{i:08d}.tiff"),
                np.asarray(jax.numpy.round(gt_linear)).clip(0, 4095).astype(np.uint16),
            )
            imwrite(
                join(out_root, f"noisy_iso{iso:4d}", f"{seq:03d}", f"{i:08d}.tiff"),
                np.asarray(noisy, np.float32),
            )
            if is_val:
                srgb = forward_pipeline(gt_linear, gains, iso)
                imwrite(
                    join(out_root, f"gt_RGB_iso{iso:4d}", f"{seq:03d}", f"{i:08d}.png"),
                    np.asarray(srgb).round().clip(0, 255).astype(np.uint8),
                )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_val_dataset", type=str, default="")
    p.add_argument("--input_train_dataset", type=str, default="")
    p.add_argument("--output_val_dataset", type=str, default="")
    p.add_argument("--output_train_dataset", type=str, default="")
    p.add_argument("--nb_seq_val", type=int, default=5)
    p.add_argument("--nb_seq_train", type=int, default=240)
    p.add_argument("--ISO", type=int, default=3200, choices=[3200, 12800])
    p.add_argument("--first", type=int, default=0)
    p.add_argument("--last", type=int, default=498)
    p.add_argument("--step", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)

    if a.input_train_dataset:
        process_split(
            a.input_train_dataset, a.output_train_dataset, a.nb_seq_train,
            a.ISO, a.first, a.last, a.step, False, a.seed,
        )
    if a.input_val_dataset:
        process_split(
            a.input_val_dataset, a.output_val_dataset, a.nb_seq_val,
            a.ISO, a.first, a.last, a.step, True, a.seed + 1,
        )


if __name__ == "__main__":
    main()
