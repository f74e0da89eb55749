"""Measure the per-patch peak chain's share of the fine-flow kernel.

Times the warm-started fine pass (coarse_to_fine_flow with a zero
prior) on a bench-sized 10k^2 pair, then re-times with
pallas_flow._peaks_for_patch monkeypatched to four trivial reductions —
the delta is the unrolled per-patch VPU peak chain, the candidate for
group-vectorization. Writes JSON to stdout.
"""

import json
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
import numpy as np

from sofima_tpu import flow_field
from sofima_tpu.ops import pallas_flow

results = {}
n = 10000
rng = np.random.RandomState(0)
noise = rng.rand(n, n).astype(np.float32)
f = np.fft.rfft2(noise)
fy = np.fft.fftfreq(n)[:, None]
fx = np.fft.rfftfreq(n)[None, :]
f *= np.exp(-((fx**2 + fy**2) / (2 * 0.08**2)))
img = np.fft.irfft2(f, s=(n, n)).astype(np.float32)
img = (img - img.min()) / np.ptp(img) * 255.0
pre = jax.device_put(img)
post = jax.device_put(np.roll(img, (7, -12), (0, 1)))
del noise, f, img

grid_n = n // 40
prior = jnp.zeros((2, grid_n, grid_n), jnp.float32)
pad = 160 // 2 // 40
origin = (160 // 2 - pad * 40,) * 2


def run():
  fl, ov = flow_field.coarse_to_fine_flow(
      pre, post, (160, 160), (40, 40), bf16=True, max_displacement=128,
      residual=6, return_overflow=True, peak_crop=32, prior=prior,
      prior_step=(40, 40), prior_origin=origin)
  return fl


def timed():
  out = run()
  float(jnp.nansum(out))
  best = float('inf')
  for _ in range(3):
    t0 = time.perf_counter()
    out = run()
    float(jnp.nansum(out))
    best = min(best, time.perf_counter() - t0)
  return best


results['fine_s'] = round(timed(), 4)
print(json.dumps(results), flush=True)

orig = pallas_flow._peaks_for_patch


def stub(x, lin, *, min_distance, threshold_rel, peak_radius, center,
         masks=None):
  del lin, min_distance, threshold_rel, peak_radius, center, masks
  s = jnp.sum(x)
  return s, s, s, s


pallas_flow._peaks_for_patch = stub
jax.clear_caches()
try:
  results['fine_nopeaks_s'] = round(timed(), 4)
finally:
  pallas_flow._peaks_for_patch = orig
print(json.dumps(results), flush=True)

# Also: stub the whole correlation->surface too (DMA/assembly floor)?
# Not needed yet; the two numbers above split kernel time into
# peaks vs everything-else.
results['peak_share'] = round(
    1.0 - results['fine_nopeaks_s'] / results['fine_s'], 3)
print('FINAL ' + json.dumps(results), flush=True)
