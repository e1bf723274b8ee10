"""ConvNeXt fused-chain kernel microbenchmarks at 1080p (real TPU).

Times one full-res 2-block chain and a single-block chain under both
depthwise engines (vpu sweep vs mxu im2col dot) and dw_rows settings, so
kernel work targets the measured bottleneck.

    python tools/cnx_chain_bench.py
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rvdd_tpu.ops.pallas.convnext_pallas import fused_convnext_chain

F = 48


def timeit(fn, *args, iters=8, warmup=0):
    # differential in-jit timing (tools/_timing.py): cancels the relay's
    # ~40 ms fetch constant and its memoization of identical dispatches
    import os, sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _timing import chained_timeit

    return chained_timeit(fn, *args, iters=iters)


def mkblock(rng, cin, proj):
    def t(*s):
        return jnp.asarray((rng.standard_normal(s) * 0.05).astype(np.float32))

    arrs = []
    if proj:
        arrs += [t(F, cin), t(F, 1)]
    arrs += [t(F, 49), t(F, 1), t(F, 1) + 1.0, t(F, 1),
             t(4 * F, F), t(4 * F, 1), t(F, 4 * F), t(F, 1), t(F, 1)]
    return tuple(arrs)


def main():
    h, w = 1080, 1920
    wl = 2048
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (rng.standard_normal((h * F, wl)) * 0.2).astype(np.float32)
    ).astype(jnp.bfloat16)

    import sys

    if "--sweep2" in sys.argv:
        # dw_group x ln_impl sweep on the 1-block chain
        blocks = tuple(mkblock(rng, F, False) for _ in range(1))
        hps = (False,)
        for g, ln in ((48, "vpu"), (16, "vpu"), (16, "mxu"), (8, "mxu")):
            fn = jax.jit(
                lambda x, b=blocks, hp=hps, g=g, ln=ln: fused_convnext_chain(
                    x, b, hp, h_img=h, w_img=w, emit=(0,), dw_rows=8,
                    dw_group=g, ln_impl=ln,
                )
            )
            t = timeit(fn, x)
            print(f"1x block 1080p g={g:2d} ln={ln}   {1e3*t:7.2f} ms")
        return

    if "--sweep3" in sys.argv:
        # TODO_TPU.md item 3: the knob grid on the 2-block full-res chain
        # (the flagship's dominant shape), adaptively: stage A sweeps
        # impl x dw_rows x dw_group at auto tile; stage B sweeps tile_h on
        # the top-3.  Explicit tile_h bypasses the auto-tiler so knobs are
        # honored exactly; infeasible (VMEM) combos are reported + skipped.
        blocks = tuple(mkblock(rng, F, False) for _ in range(2))
        hps = (False, False)

        def run(kw):
            fn = jax.jit(
                lambda x, b=blocks, hp=hps, kw=kw: fused_convnext_chain(
                    x, b, hp, h_img=h, w_img=w, emit=(1,), **kw
                )
            )
            try:
                ms = 1e3 * timeit(fn, x, iters=10)
            except Exception as e:
                print(f"{kw}  FAIL {type(e).__name__}: {str(e)[:80]}")
                return None
            print(f"{kw}  {ms:7.2f} ms")
            return ms

        scored = []
        for impl in ("mxu", "mxu2"):
            for dr in (4, 8, 12):
                for g in (8, 16, 48):
                    kw = dict(dw_impl=impl, dw_rows=dr, dw_group=g, tile_h=0)
                    ms = run(kw)
                    if ms is not None:
                        scored.append((ms, kw))
        scored.sort(key=lambda e: e[0])
        for _, base in scored[:3]:
            for t in (8, 12, 20, 24, 40):
                kw = dict(base, tile_h=t)
                ms = run(kw)
                if ms is not None:
                    scored.append((ms, kw))
        scored.sort(key=lambda e: e[0])
        print(f"BEST: {scored[0][0]:.2f} ms {scored[0][1]}")
        return

    if "--attrib" in sys.argv:
        # cost attribution: skip one stage at a time (mxu rows=8)
        import os

        os.environ["RVDD_DEBUG_SKIP"] = "1"  # acknowledge the garbage output
        blocks = tuple(mkblock(rng, F, False) for _ in range(1))
        hps = (False,)
        for impl in ("mxu", "mxu2"):
            for skip in ((), ("pat",), ("dw",), ("ln",), ("gelu",), ("pw",),
                         ("dw", "ln", "gelu", "pw")):
                fn = jax.jit(
                    lambda x, b=blocks, hp=hps, sk=skip, im=impl:
                    fused_convnext_chain(
                        x, b, hp, h_img=h, w_img=w, emit=(0,), dw_rows=8,
                        dw_impl=im, debug_skip=sk,
                    )
                )
                t = timeit(fn, x)
                print(f"1x block 1080p [{impl}] "
                      f"skip={','.join(skip) or 'none':16s} {1e3*t:7.2f} ms")
        return

    for nb in (1, 2):
        blocks = tuple(mkblock(rng, F, False) for _ in range(nb))
        hps = (False,) * nb
        for impl, rows_opts in (("vpu", (0,)), ("mxu", (2, 4, 8)),
                                ("mxu2", (2, 4, 8))):
            for dr in rows_opts:
                kw = dict(dw_impl=impl)
                if dr:
                    kw["dw_rows"] = dr
                fn = jax.jit(
                    lambda x, b=blocks, hp=hps, kw=kw: fused_convnext_chain(
                        x, b, hp, h_img=h, w_img=w, emit=(len(b) - 1,), **kw
                    )
                )
                t = timeit(fn, x)
                label = impl + (f" rows={dr}" if dr else "")
                print(f"chain {nb}x block 48ch 1080p [{label}]  {1e3*t:7.2f} ms")


if __name__ == "__main__":
    main()
