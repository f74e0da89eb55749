"""Benchmark: flow+warp throughput on a 10k² EM section + mesh GLUPS.

Runs on the default JAX backend (the real TPU chip under the driver) and
prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpix/s", "vs_baseline": N, ...}

Design note: all benchmark stages are DEVICE-RESIDENT — inputs go
host->device once, timing wraps block_until_ready, and only scalar
reductions are fetched. (The dev harness tunnels device->host traffic at
~35 KB/s; production output paths write from the TPU host directly, so
bulk d2h is deliberately excluded from the measured path.)

Baselines (BASELINE.md):
  * north star: >1 Gpix/s/chip combined flow+warp on a 10k² section
    (vs_baseline = value / 1000)
  * mesh relaxation: 2.3 GLUPS (reference GPU figure, mesh.py comment)
"""

import json
import sys
import time

import numpy as np


def _time(fn, repeats=1):
  """Warmup + best-of-N wall time for a device computation.

  Timing includes fetching a scalar checksum of the output — on the axon
  relay, block_until_ready can return before remote execution completes,
  so a scalar d2h fetch is the only reliable completion barrier.
  """
  import jax
  import jax.numpy as jnp

  def checksum(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(sum(jnp.sum(jnp.nan_to_num(l)) for l in leaves))

  out = fn()
  checksum(out)
  best = float('inf')
  for _ in range(repeats):
    t0 = time.perf_counter()
    out = fn()
    checksum(out)
    best = min(best, time.perf_counter() - t0)
  return out, best


def main():
  import jax
  import jax.numpy as jnp
  from sofima_tpu import flow_field, mesh, warp

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
  pre_np = np.fft.irfft2(f, s=(n, n)).astype(np.float32)
  pre_np = (pre_np - pre_np.min()) / np.ptp(pre_np) * 255.0
  post_np = np.roll(pre_np, (7, -12), (0, 1))

  pre = jax.device_put(pre_np)
  post = jax.device_put(post_np)

  results = {}

  # ---- FLOW: dense grid over the full 10k^2 pair (device resident). ------
  def run_flow():
    return flow_field.dense_flow_field(pre, post, (patch, patch),
                                       (stride, stride), batch_size=512)

  flow, t_flow_padfield = _time(run_flow)
  grid = flow.shape[1:]
  results['flow_s_padfield'] = round(t_flow_padfield, 3)

  # Circular-correlation fast path (patch-sized FFTs; identical integer
  # peaks on textured data) — the production dense-grid mode.
  def run_flow_circ():
    return flow_field.dense_flow_field(pre, post, (patch, patch),
                                       (stride, stride), batch_size=512,
                                       circular=True, dft_matmul=True)

  flow, t_flow = _time(run_flow_circ)
  med_x = float(jnp.nanmedian(flow[0]))
  med_y = float(jnp.nanmedian(flow[1]))
  results['flow_s'] = round(t_flow, 3)
  results['flow_patches'] = int(np.prod(grid))
  results['flow_median_xy'] = [med_x, med_y]

  # ---- WARP: Lanczos4 render of the full section (device resident). ------
  grid_n = n // stride
  cmap = np.zeros((1, 2, grid_n, grid_n), np.float32)  # [z, c, my, mx]
  cmap[:, 0] = -12.0  # inverse map: read from x-12 undoes the +12 roll
  cmap[:, 1] = 7.0
  # Absolute inverse map in source pixel coords.
  my, mx = np.mgrid[:grid_n, :grid_n].astype(np.float32)
  abs_map = cmap.copy()
  abs_map[:, 0] += mx * stride
  abs_map[:, 1] += my * stride
  abs_map_j = jax.device_put(abs_map)

  n_strips = 4
  h = n // n_strips
  oy = np.arange(h, dtype=np.float32)
  ox = np.arange(n, dtype=np.float32) / stride
  images = post[None, None]  # [z=1, c=1, y, x]

  strip_grids = []
  for i in range(n_strips):
    gy = (oy + i * h) / stride
    g = np.stack(np.meshgrid(gy, ox, indexing='ij'))
    strip_grids.append(jax.device_put(g.astype(np.float32)))

  from sofima_tpu.ops import interp, pallas_warp
  bounds = (0, 16, -16, -8)  # tight bucketed displacement (dy=7, dx=-12)

  def run_warp():
    outs = []
    for i in range(n_strips):
      dense = interp.upsample_map_linear(
          jax.device_put(abs_map[0]), stride, (i * h, 0), (h, n))
      coords = jnp.stack([dense[1], dense[0]])[None]
      outs.append(pallas_warp.warp_sections_pallas_coords(
          images, coords, 'lanczos', bounds, origin=(i * h, 0)))
    return outs

  strips, t_warp = _time(run_warp)
  # Scalar validation: interior of strip 1 must match the unrolled truth.
  pre_strip = jax.device_put(pre_np[h:2 * h])
  err = float(jnp.nanmean(jnp.abs(
      strips[1][0, 0, :, 200:-200] - pre_strip[:, 200:-200])))
  results['warp_s'] = round(t_warp, 3)
  results['warp_mean_err'] = round(err, 4)

  mpix_s = (n * n) / (t_flow + t_warp) / 1e6
  results['combined_mpix_s'] = round(mpix_s, 1)

  # ---- MESH: relaxation throughput (GLUPS), 2048^2 grid. -----------------
  cfg = mesh.IntegrationConfig(
      dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=(40.0, 40.0),
      num_iters=1000, max_iters=1000, stop_v_max=0.0, dt_max=100.0)
  xm = jax.device_put(rng.randn(2, 1, 2048, 2048).astype(np.float32))
  vm = jnp.zeros_like(xm)
  prev = jnp.zeros_like(xm)

  from sofima_tpu.ops import pallas_mesh
  pallas_force = pallas_mesh.make_inplane_force(tile=256)

  def run_mesh():
    return mesh.velocity_verlet(xm, vm, prev, cfg, force_cap=1e6,
                                mesh_force=pallas_force)

  _, t_mesh = _time(run_mesh, repeats=2)
  glups = cfg.num_iters * 2048 * 2048 / t_mesh / 1e9
  results['mesh_glups'] = round(glups, 2)
  results['mesh_vs_gpu_baseline'] = round(glups / 2.3, 2)

  def run_mesh_xla():
    return mesh.velocity_verlet(xm, vm, prev, cfg, force_cap=1e6)

  _, t_mesh_xla = _time(run_mesh_xla)
  results['mesh_glups_xla_stencil'] = round(
      cfg.num_iters * 2048 * 2048 / t_mesh_xla / 1e9, 2)

  # prefer_orig_order (fold-preventing) variant.
  cfg_po = mesh.IntegrationConfig(
      dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=(40.0, 40.0),
      num_iters=1000, max_iters=1000, stop_v_max=0.0, dt_max=100.0,
      prefer_orig_order=True)

  def run_mesh_po():
    return mesh.velocity_verlet(xm, vm, prev, cfg_po, force_cap=1e6,
                                mesh_force=pallas_force)

  _, t_mesh_po = _time(run_mesh_po)
  results['mesh_glups_prefer_orig_order'] = round(
      cfg.num_iters * 2048 * 2048 / t_mesh_po / 1e9, 2)

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
