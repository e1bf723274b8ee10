"""Standalone optical-flow CLI (equivalent of the IPOL tvl1flow demo;
reference: 3rdparty/tvl1flow/main.c) running the on-device solver.

    python -m rvdd_tpu.cli.flow I0.png I1.png out.tif
"""

from __future__ import annotations

import argparse

import numpy as np
import jax.numpy as jnp

from rvdd_tpu.data.io import imread, imwrite
from rvdd_tpu.ops.tvl1 import TVL1Params, to_gray, tvl1_flow


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("i0")
    p.add_argument("i1")
    p.add_argument("out", nargs="?", default="flow.tif")
    p.add_argument("--tau", type=float, default=0.25)
    p.add_argument("--lambda_", type=float, default=0.15)
    p.add_argument("--theta", type=float, default=0.3)
    p.add_argument("--nscales", type=int, default=100)
    p.add_argument("--zfactor", type=float, default=0.5)
    p.add_argument("--nwarps", type=int, default=5)
    p.add_argument("--epsilon", type=float, default=0.01)
    a = p.parse_args(argv)

    params = TVL1Params(
        tau=a.tau, lambda_=a.lambda_, theta=a.theta, nscales=a.nscales,
        zfactor=a.zfactor, nwarps=a.nwarps, epsilon=a.epsilon,
    )
    i0 = to_gray(jnp.asarray(imread(a.i0).astype(np.float32)))
    i1 = to_gray(jnp.asarray(imread(a.i1).astype(np.float32)))
    flow = np.asarray(tvl1_flow(i0, i1, params))
    imwrite(a.out, flow.astype(np.float32))
    print(f"wrote {a.out}: mean |u|={np.abs(flow[...,0]).mean():.3f} |v|={np.abs(flow[...,1]).mean():.3f}")


if __name__ == "__main__":
    main()
