"""Per-component timing of the 1080p inference step on the real chip.

Breaks the headline bench (bench.py) into its pieces so optimization work
targets the true bottleneck, plus matmul/conv orientation microbenchmarks
for the 48-channel U-Net convs.

    python tools/profile_step.py [--parts] [--mm] [--model convunet+feat]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def _fetch(out):
    # on the axon relay a data fetch is the only reliable completion barrier
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(leaves[0].ravel()[:8].astype(jnp.float32)))


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / iters


def bench_parts(args):
    from rvdd_tpu.models import build_network
    from rvdd_tpu.models.factory import init_network
    from rvdd_tpu.ops.demosaic import hamilton_adams
    from rvdd_tpu.ops.pallas.warp_pallas import warp_bicubic_pallas
    from rvdd_tpu.ops.warp import flow_upsample_2x

    h, w = 540, 960
    H, W = 2 * h, 2 * w
    rng = np.random.default_rng(0)
    feat = "feat" in args.model
    fd = 1 if "future" in args.model else 0
    arch = {
        "convunet": "convunet-mode=fixedfeatures",
        "convunet+feat": "convunet-mode=fixedfeatures+feat",
        "convnext+feat+future": "newunet-mode=feat",
    }[args.model]
    in_nc = (2 + fd) * 3
    kw = {"fast_act": True} if "newunet" in arch else {}
    net = build_network(arch, in_nc, 3, feat, dtype=jnp.bfloat16, **kw)
    params = init_network(net, jax.random.PRNGKey(0), (1, 128, 128, in_nc))

    raw = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 4)).astype(np.float32))
    x51 = jnp.asarray(
        rng.uniform(-1, 1, (1, H, W, 3 + (48 if feat else 0))).astype(np.float32)
    ).astype(jnp.bfloat16)
    netin = jnp.asarray(
        rng.uniform(-1, 1, (1, H, W, in_nc)).astype(np.float32)
    ).astype(jnp.bfloat16)
    featin = (
        jnp.asarray(rng.uniform(-1, 1, (1, H, W, 48)).astype(np.float32)).astype(
            jnp.bfloat16
        )
        if feat
        else None
    )
    from scipy.ndimage import gaussian_filter

    fl = np.stack(
        [
            gaussian_filter(rng.standard_normal((H, W)), 40) * 25 + 2,
            gaussian_filter(rng.standard_normal((H, W)), 40) * 25 - 1,
        ],
        -1,
    ).astype(np.float32)
    flow = jnp.asarray(fl)[None]
    flow_half = jnp.asarray(fl[::2, ::2] / 2)[None]

    t = timeit(jax.jit(hamilton_adams), raw)
    print(f"hamilton_adams 540x960->1080p      {1e3 * t:7.2f} ms")
    t = timeit(jax.jit(flow_upsample_2x), flow_half)
    print(f"flow_upsample_2x                   {1e3 * t:7.2f} ms")
    t = timeit(jax.jit(lambda x, f: warp_bicubic_pallas(x, f)[0]), x51, flow)
    print(f"pallas warp {x51.shape[-1]}ch 1080p            {1e3 * t:7.2f} ms")

    fwd = jax.jit(lambda p, x, f: net.apply({"params": p}, x, f))
    t = timeit(fwd, params, netin, featin)
    print(f"net forward ({args.model})        {1e3 * t:7.2f} ms")


def bench_mm(args):
    """Conv/matmul orientation shootout at 1080p, C=48, bf16."""
    H, W, C = 1080, 1920, 48
    M = H * W
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, H, W, C)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    k = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    flops = 2 * M * 9 * C * C

    conv = jax.jit(
        lambda x, k: jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
    )
    t = timeit(conv, x, k)
    print(f"XLA conv3x3 48->48 NHWC bf16       {1e3 * t:7.2f} ms  {flops / t / 1e12:6.1f} TF/s")

    conv_bf = jax.jit(
        lambda x, k: jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )
    t = timeit(conv_bf, x, k)
    print(f"XLA conv3x3 48->48 bf16 acc        {1e3 * t:7.2f} ms  {flops / t / 1e12:6.1f} TF/s")

    # im2col standard orientation: [M, 9C] @ [9C, C]
    a = jnp.asarray(rng.standard_normal((M, 9 * C)).astype(np.float32)).astype(jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((9 * C, C)).astype(np.float32)).astype(jnp.bfloat16)
    mm = jax.jit(lambda a, b: (a @ b))
    t = timeit(mm, a, b)
    print(f"matmul [M,432]@[432,48]            {1e3 * t:7.2f} ms  {flops / t / 1e12:6.1f} TF/s")

    # transposed orientation: [48, 432] @ [432, M]
    at = jnp.asarray(rng.standard_normal((C, 9 * C)).astype(np.float32)).astype(jnp.bfloat16)
    bt = jnp.asarray(rng.standard_normal((9 * C, M)).astype(np.float32)).astype(jnp.bfloat16)
    t = timeit(mm, at, bt)
    print(f"matmul [48,432]@[432,M]            {1e3 * t:7.2f} ms  {flops / t / 1e12:6.1f} TF/s")

    # wide-N sanity point: [M,432]@[432,128]
    b128 = jnp.asarray(rng.standard_normal((9 * C, 128)).astype(np.float32)).astype(jnp.bfloat16)
    t = timeit(mm, a, b128)
    fl128 = 2 * M * 9 * C * 128
    print(f"matmul [M,432]@[432,128]           {1e3 * t:7.2f} ms  {fl128 / t / 1e12:6.1f} TF/s")

    # peak reference: [8192, 2048] @ [2048, 8192]
    ap = jnp.asarray(rng.standard_normal((8192, 2048)).astype(np.float32)).astype(jnp.bfloat16)
    bp = jnp.asarray(rng.standard_normal((2048, 8192)).astype(np.float32)).astype(jnp.bfloat16)
    t = timeit(mm, ap, bp)
    flp = 2 * 8192 * 2048 * 8192
    print(f"matmul 8192x2048x8192 (peak ref)   {1e3 * t:7.2f} ms  {flp / t / 1e12:6.1f} TF/s")

    # HBM bandwidth reference: copy 1080p x 48ch bf16
    cp = jax.jit(lambda x: x * 1.000001)
    t = timeit(cp, x)
    print(f"elementwise 1080p 48ch bf16        {1e3 * t:7.2f} ms  {2 * x.size * 2 / t / 1e9:6.0f} GB/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="convunet+feat")
    ap.add_argument("--parts", action="store_true")
    ap.add_argument("--mm", action="store_true")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}")
    if args.mm or not args.parts:
        bench_mm(args)
    if args.parts or not args.mm:
        bench_parts(args)


if __name__ == "__main__":
    main()
