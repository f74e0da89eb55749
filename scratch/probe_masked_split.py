"""Split the masked-flow overhead: DMA vs compute (no new compiles).

Same program shapes as probe_masked_sub_r4; three masks:
  * all-valid       -> every window pure: predication floor
  * sparse dots     -> every window impure (mask DMAs + shared spectra
                       run everywhere) but ~all subgroups pure: the
                       mask-DMA + shared-cross-power cost in isolation
  * bench band+blob -> the production figure
One JSON line.
"""
import json
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np
import jax

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import jax.numpy as jnp
from sofima_tpu import flow_field

n = 10000
stride = 40
patch = 160
rng = np.random.RandomState(0)

noise = rng.rand(n, n).astype(np.float32)
f = np.fft.rfft2(noise)
fy = np.fft.fftfreq(n)[:, None]
fx = np.fft.rfftfreq(n)[None, :]
f *= np.exp(-((fx**2 + fy**2) / (2 * 0.08**2)))
pre_np = np.fft.irfft2(f, s=(n, n)).astype(np.float32)
pre_np = (pre_np - pre_np.min()) / np.ptp(pre_np) * 255.0
post_np = np.roll(pre_np, (7, -12), (0, 1))
pre = jax.device_put(pre_np)
post = jax.device_put(post_np)

yy, xx = np.mgrid[:n, :n]
mask_band = (((yy + xx) % 7919 < 900)
             | (((yy - 3000)**2 + (xx - 7000)**2) < 1500**2))
# One invalid pixel every ~640 px in x, 160 in y: every window sees
# >=1 invalid pixel (impure), nearly every 8-patch subgroup is pure.
mask_dots = (yy % 160 == 80) & (xx % 640 == 320)
del yy, xx, noise, f


def checksum(x):
  return float(sum(jnp.sum(jnp.nan_to_num(l.astype(jnp.float32)))
                   for l in jax.tree_util.tree_leaves(x)))


def _time(fn, reps=3):
  out = fn()
  checksum(out)
  best = float('inf')
  for _ in range(reps):
    t0 = time.perf_counter()
    out = fn()
    checksum(out)
    best = min(best, time.perf_counter() - t0)
  return out, best


def run(m):
  return flow_field.dense_flow_field(
      pre, post, (patch, patch), (stride, stride), batch_size=256,
      circular=True, dft_matmul=True, bf16=False,
      pre_mask=m, post_mask=m)


results = {}
for name, m_np in (('band', mask_band), ('dots', mask_dots),
                   ('allvalid', np.ones((n, n), bool))):
  m = jax.device_put(m_np)
  checksum(m)  # settle the upload before timing
  _, t = _time(lambda m=m: run(m))
  results[f'masked_{name}_s'] = round(t, 3)
  del m
print(json.dumps(results))
