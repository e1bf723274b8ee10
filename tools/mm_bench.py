"""True device rates: k op applications inside one jit (no dispatch overhead).

    python tools/mm_bench.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


K_REPS = 20


def timeit_loop(op, x, reps=K_REPS, iters=3):
    """Time `op` applied `reps` times inside one jit with a data dependency."""

    @jax.jit
    def run(x):
        def body(i, carry):
            y = op(carry)
            # force sequential dependency without changing carry shape;
            # 1e-12 scale (not 0) so XLA cannot eliminate the op
            return carry + 1e-12 * jnp.reshape(y, (-1,))[0].astype(carry.dtype)

        return jax.lax.fori_loop(0, reps, body, x)

    out = run(x)
    float(jnp.sum(out.ravel()[:4].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(x)
    float(jnp.sum(out.ravel()[:4].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    return dt / reps


def main():
    H, W, C = 1080, 1920, 48
    M = H * W
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16

    def mk(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32)).astype(bf)

    x = mk(1, H, W, C)
    k33 = mk(3, 3, C, C)
    flops = 2 * M * 9 * C * C

    t = timeit_loop(
        lambda x: jax.lax.conv_general_dilated(
            x, k33, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(bf),
        x,
    )
    print(f"XLA conv3x3 48->48 f32acc   {1e3 * t:7.3f} ms  {flops / t / 1e12:6.1f} TF/s")

    t = timeit_loop(
        lambda x: jax.lax.conv_general_dilated(
            x, k33, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ),
        x,
    )
    print(f"XLA conv3x3 48->48 bf16acc  {1e3 * t:7.3f} ms  {flops / t / 1e12:6.1f} TF/s")

    a = mk(M, 9 * C)
    b48 = mk(9 * C, C)
    t = timeit_loop(lambda a: a + 1e-12 * (a @ b48)[0, 0], a)
    print(f"matmul [M,432]@[432,48]     {1e3 * t:7.3f} ms  {flops / t / 1e12:6.1f} TF/s")

    b128 = mk(9 * C, 128)
    fl = 2 * M * 9 * C * 128
    t = timeit_loop(lambda a: a + 1e-12 * (a @ b128)[0, 0], a)
    print(f"matmul [M,432]@[432,128]    {1e3 * t:7.3f} ms  {fl / t / 1e12:6.1f} TF/s")

    at = mk(C, 9 * C)
    bt = mk(9 * C, M)
    t = timeit_loop(lambda bt: bt + 1e-12 * (at @ bt)[0, 0], bt)
    print(f"matmul [48,432]@[432,M]     {1e3 * t:7.3f} ms  {flops / t / 1e12:6.1f} TF/s")

    ap = mk(8192, 2048)
    bp = mk(2048, 8192)
    flp = 2 * 8192 * 2048 * 8192
    t = timeit_loop(lambda ap: ap + 1e-12 * (ap @ bp)[0, 0], ap)
    print(f"matmul 8192x2048x8192 peak  {1e3 * t:7.3f} ms  {flp / t / 1e12:6.1f} TF/s")

    big = mk(64 * 1024 * 1024)  # 128 MB bf16
    t = timeit_loop(lambda b: b * 1.0000001, big)
    print(f"elementwise 128MB bf16      {1e3 * t:7.3f} ms  {2 * big.size * 2 / t / 1e9:6.0f} GB/s")


if __name__ == "__main__":
    main()
