"""Create a tiny synthetic sRGB video dataset + raw derivatives for
end-to-end CLI testing (stands in for tiny_reds, which needs a download).

    python tools/make_tiny_dataset.py --root /tmp/tiny --seqs 2 --frames 8 \
        --height 96 --width 128 --iso 3200
"""

from __future__ import annotations

import argparse
import os
import sys
from os.path import join

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rvdd_tpu.data.io import imwrite


def synth_video(seq: int, frames: int, h: int, w: int, texture: str = "smooth"):
    rng = np.random.default_rng(seq)
    # pad by the full camera-motion excursion (1.5 px/frame in x, 1 px/frame
    # in y) so late frames don't run off the texture and come out truncated
    pad = max(32, int(1.5 * frames) + 8)
    yy, xx = np.mgrid[0 : h + pad, 0 : w + pad].astype(np.float32)
    tex = (
        110
        + 70 * np.sin(xx / (6 + seq)) * np.cos(yy / (8 + seq))
        + 40 * np.sin((xx + yy) / 17)
    )
    blobs = sum(
        120 * np.exp(-(((xx - rng.uniform(20, w)) / 12) ** 2 + ((yy - rng.uniform(20, h)) / 12) ** 2))
        for _ in range(4)
    )
    base = tex + blobs
    if texture == "rich":
        # multi-octave random texture: pushes the denoised operating point
        # from ~50 dB (smooth scenes) to the REDS-like ~37-42 dB regime
        from scipy.ndimage import gaussian_filter

        hp, wp = h + pad, w + pad
        detail = np.zeros((hp, wp), np.float32)
        for sigma, amp in ((1.0, 28.0), (2.5, 22.0), (6.0, 18.0), (14.0, 14.0)):
            n = rng.standard_normal((hp, wp)).astype(np.float32)
            f = gaussian_filter(n, sigma)
            detail += amp * f / (np.std(f) + 1e-8)
        base = 0.6 * base + 55 + detail
    for t in range(frames):
        dx, dy = int(1.5 * t), int(1.0 * t)
        win = base[dy : dy + h, dx : dx + w]
        rgb = np.stack([win, 0.85 * win + 15, 0.7 * win + 8], -1)
        yield np.clip(rgb, 0, 255).astype(np.uint8)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", type=str, default="/tmp/tiny_synth")
    p.add_argument("--seqs", type=int, default=2)
    p.add_argument("--val_seqs", type=int, default=1)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--height", type=int, default=96)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--iso", type=int, default=3200)
    p.add_argument("--texture", type=str, default="smooth",
                   choices=["smooth", "rich"])
    a = p.parse_args(argv)

    for split, n in [("train", a.seqs), ("validation", a.val_seqs)]:
        for seq in range(n):
            for t, img in enumerate(synth_video(seq + (100 if split == "validation" else 0), a.frames, a.height, a.width, a.texture)):
                imwrite(join(a.root, split, "srgb", f"{seq:03d}", f"{t:08d}.png"), img)

    from rvdd_tpu.cli.generate_data import main as gen

    gen(
        [
            "--input_train_dataset", join(a.root, "train", "srgb", "%03d", "%08d.png"),
            "--output_train_dataset", join(a.root, "train"),
            "--input_val_dataset", join(a.root, "validation", "srgb", "%03d", "%08d.png"),
            "--output_val_dataset", join(a.root, "validation"),
            "--ISO", str(a.iso),
            "--first", "0", "--last", str(a.frames - 1), "--step", "1",
            "--nb_seq_train", str(a.seqs), "--nb_seq_val", str(a.val_seqs),
        ]
    )
    print(f"tiny dataset at {a.root}")


if __name__ == "__main__":
    main()
