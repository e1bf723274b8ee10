"""Convert a released PyTorch checkpoint to a framework msgpack checkpoint.

    python tools/convert_checkpoint.py \
        /root/reference/trained-nets/recurrent-convunet-iso3200_net_Denoise.pth \
        --arch convunet-mode=fixedfeatures --input_nc 6 --out ckpt_dir/latest_val

Writes <out>_net_Denoise.msgpack loadable by the train/validate CLIs.
(The CLIs can also consume .pth files directly via --path2epoch; this tool
is for producing standalone framework checkpoints.)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pth")
    ap.add_argument("--arch", required=True)
    ap.add_argument("--input_nc", type=int, required=True, help="full stacked input channels")
    ap.add_argument("--output_nc", type=int, default=3)
    ap.add_argument("--out", required=True, help="output path prefix")
    a = ap.parse_args(argv)

    import jax
    from flax import serialization

    from rvdd_tpu.models import build_network, load_torch_checkpoint

    net = build_network(a.arch, a.input_nc, a.output_nc)
    params = load_torch_checkpoint(a.pth, net, (1, 64, 64, a.input_nc))
    os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
    path = f"{a.out}_net_Denoise.msgpack"
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"wrote {path} ({n/1e6:.2f} M params)")


if __name__ == "__main__":
    main()
