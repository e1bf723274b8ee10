"""TV-L1 solver cost attribution (real TPU) — drives the --online_flow
fps work (reference flow: 3rdparty/tvl1flow/tvl1flow_lib.c:91-473).

Times the full solver at several max_iterations values (the while_loop
early-exits on convergence, so the slope gives the real per-iteration
cost and the intercept the warp/pyramid overhead), each preset, and the
solver warp primitive standalone.

    python tools/tvl1_attrib.py [--h 540 --w 960]
"""

import argparse
import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from _timing import chained_timeit  # noqa: E402
from rvdd_tpu.ops.tvl1 import TVL1Params, tvl1_flow, _warp_catmull_zero  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=540)
    ap.add_argument("--w", type=int, default=960)
    args = ap.parse_args()

    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(0)
    base = gaussian_filter(rng.uniform(0, 1, (args.h + 8, args.w + 8)), 3)
    i0 = jnp.asarray(base[4 : 4 + args.h, 4 : 4 + args.w].astype(np.float32))
    i1 = jnp.asarray(base[6 : 6 + args.h, 5 : 5 + args.w].astype(np.float32))

    for label, p in [
        ("default (5 warps, <=300 it)", TVL1Params()),
        ("fast    (2 warps, <=75 it)", TVL1Params(nwarps=2, max_iterations=75)),
        ("2w/10it", TVL1Params(nwarps=2, max_iterations=10)),
        ("2w/30it", TVL1Params(nwarps=2, max_iterations=30)),
        ("1w/75it", TVL1Params(nwarps=1, max_iterations=75)),
    ]:
        t = chained_timeit(lambda x, p=p: tvl1_flow(i0, x, p), i1, iters=5)
        print(f"tvl1_flow {label:<28s} {1e3*t:8.2f} ms")

    u = jnp.asarray(
        (gaussian_filter(rng.standard_normal((args.h, args.w)), 30) * 3)
        .astype(np.float32)
    )
    t = chained_timeit(lambda x: _warp_catmull_zero(x, u, u), i1, iters=10)
    print(f"solver warp (single plane)           {1e3*t:8.2f} ms")


if __name__ == "__main__":
    main()
