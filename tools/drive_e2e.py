import os
import sys
import time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rvdd_tpu.ops import (tvl1_flow_pair, warp, hamilton_adams, psnr, to_net, flow_upsample_2x)
from rvdd_tpu.ops.pipeline import synthesize_raw, find_gains, forward_pipeline, Gains

H, W = 128, 160
yy, xx = np.mgrid[0:H+16, 0:W+16].astype(np.float32)
tex = 40 + 80*np.sin(xx/9) * np.cos(yy/7) + 0.4*xx + 60*np.exp(-(((xx-70)/20)**2+((yy-60)/20)**2))
def frame(dx, dy):
    img = tex[dy:dy+H, dx:dx+W]
    return np.clip(np.stack([img, 0.8*img+20, 0.6*img+10], -1), 0, 255).astype(np.float32)
f0, f1 = frame(8, 8), frame(12, 10)  # global shift (dx=4, dy=2) full-res

gains = find_gains(0, 3200)
gt_raw0, gt_lin0, noisy0 = synthesize_raw(f0, gains, 3200, jax.random.PRNGKey(0))
gt_raw1, gt_lin1, noisy1 = synthesize_raw(f1, gains, 3200, jax.random.PRNGKey(1))
t0=time.time()
flow = tvl1_flow_pair(noisy0, noisy1)
jax.block_until_ready(flow)
print(f"flow {time.time()-t0:.1f}s mean u={float(flow[...,0].mean()):.2f} v={float(flow[...,1].mean()):.2f} (expect ~ -2.0, -1.0 at half-res)")

rgb0 = hamilton_adams(to_net(gt_lin0*0 + gt_raw0/4095.)[None]*2-1 if False else to_net(gt_raw0/4095.)[None])
rgb1 = hamilton_adams(to_net(gt_raw1/4095.)[None])
fl2 = flow_upsample_2x(flow[None])
warped0, mask = warp(rgb0, fl2, "bicubic")
# score only where the warp is defined
m = np.asarray(mask)[...,0] > 0
a = np.asarray(warped0)[0][m[0]]; b = np.asarray(rgb1)[0][m[0]]; c = np.asarray(rgb0)[0][m[0]]
mse_al = np.mean((a-b)**2); mse_un = np.mean((c-b)**2)
p_al = 10*np.log10(4/mse_al); p_un = 10*np.log10(4/mse_un)
print(f"clean-frame PSNR: unaligned {p_un:.2f} dB -> aligned {p_al:.2f} dB")
assert p_al > p_un + 3, "alignment failed"
print("DRIVE PASSED")
