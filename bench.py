"""Benchmark: flow+warp throughput on a 10k² EM section + mesh GLUPS.

Runs on the default JAX backend (the real TPU chip under the driver).
Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpix/s", "vs_baseline": N, ...}

Baselines (BASELINE.md):
  * north-star target: >1 Gpix/s/chip combined flow+warp on a 10k²
    section (vs_baseline = value / 1000).
  * mesh relaxation: 2.3 GLUPS (reference GPU figure, mesh.py comment).
"""

import json
import sys
import time

import numpy as np


def _timed(fn, *args, repeats=1):
  """Returns (result, best wall time) after a warmup call."""
  import jax
  result = fn(*args)
  jax.block_until_ready(result)
  best = float('inf')
  for _ in range(repeats):
    t0 = time.perf_counter()
    result = fn(*args)
    jax.block_until_ready(result)
    best = min(best, time.perf_counter() - t0)
  return result, best


def main():
  import jax
  import jax.numpy as jnp
  from sofima_tpu import flow_field, mesh, warp, map_utils
  from sofima_tpu.utils import BoundingBox

  n = 10000
  stride = 40
  patch = 160
  rng = np.random.RandomState(0)

  # Band-limited texture (EM-like) so correlation peaks are realistic.
  noise = rng.rand(n, n).astype(np.float32)
  f = np.fft.rfft2(noise)
  fy = np.fft.fftfreq(n)[:, None]
  fx = np.fft.rfftfreq(n)[None, :]
  f *= np.exp(-((fx**2 + fy**2) / (2 * 0.08**2)))
  pre = np.fft.irfft2(f, s=(n, n)).astype(np.float32)
  pre = ((pre - pre.min()) / np.ptp(pre) * 255).astype(np.uint8)
  post = np.roll(pre, (7, -12), (0, 1))

  results = {}

  # ---- FLOW: full 10k^2 section pair, EM-2D geometry. --------------------
  mfc = flow_field.JAXMaskedXCorrWithStatsCalculator()

  def run_flow():
    return mfc.flow_field(pre, post, patch_size=patch, step=stride,
                          batch_size=512)

  flow, t_flow = _timed(run_flow)
  grid = flow.shape[1:]
  n_patches = int(np.prod(grid))
  results['flow_s'] = round(t_flow, 3)
  results['flow_patches'] = n_patches

  # ---- WARP: render the full section through a coordinate map. -----------
  grid_n = n // stride
  cmap = np.zeros((2, 1, grid_n, grid_n), np.float32)
  cmap[0] = 12.0
  cmap[1] = -7.0
  img_box = BoundingBox(start=(0, 0, 0), size=(n, n, 1))
  map_box = BoundingBox(start=(0, 0, 0), size=(grid_n, grid_n, 1))
  img4 = post[np.newaxis, np.newaxis]

  def run_warp():
    # Strips bound peak memory for the 64-tap Lanczos gather.
    outs = []
    n_strips = 4
    h = n // n_strips
    for i in range(n_strips):
      ob = BoundingBox(start=(0, i * h, 0), size=(n, h, 1))
      outs.append(warp.warp_subvolume(img4, img_box, cmap, map_box,
                                      stride, ob, interpolation='lanczos'))
    return np.concatenate(outs, axis=2)

  rendered, t_warp = _timed(run_warp)
  # Sanity: the warp must actually undo the roll in the interior.
  interior = np.s_[0, 0, 200:-200, 200:-200]
  err = np.abs(rendered[interior].astype(np.float32)
               - pre[interior[1:]].astype(np.float32)).mean()
  results['warp_s'] = round(t_warp, 3)
  results['warp_mean_err'] = round(float(err), 3)

  mpix_s = (n * n) / (t_flow + t_warp) / 1e6
  results['combined_mpix_s'] = round(mpix_s, 1)

  # ---- MESH: relaxation throughput (GLUPS) on a 2048^2 grid. -------------
  cfg = mesh.IntegrationConfig(
      dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=(40.0, 40.0),
      num_iters=1000, max_iters=1000, stop_v_max=0.0, dt_max=100.0,
      prefer_orig_order=False)
  xm = jnp.asarray(rng.randn(2, 1, 2048, 2048).astype(np.float32))
  vm = jnp.zeros_like(xm)
  prev = jnp.zeros_like(xm)

  def run_mesh():
    return mesh.velocity_verlet(xm, vm, prev, cfg, force_cap=1e6)

  _, t_mesh = _timed(run_mesh, repeats=2)
  glups = cfg.num_iters * 2048 * 2048 / t_mesh / 1e9
  results['mesh_glups'] = round(glups, 2)
  results['mesh_vs_gpu_baseline'] = round(glups / 2.3, 2)

  out = {
      'metric': 'flow+warp Mpix/s/chip on 10k^2 EM section',
      'value': round(mpix_s, 1),
      'unit': 'Mpix/s',
      'vs_baseline': round(mpix_s / 1000.0, 3),
      **results,
  }
  print(json.dumps(out))
  return 0


if __name__ == '__main__':
  sys.exit(main())
