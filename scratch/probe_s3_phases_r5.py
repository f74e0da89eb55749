"""Per-phase wall clock of the device-resident stitch3d chain, warm.

Splits stitch_and_render_3d into its phases (fine flow x/y, aggregate,
solve, render) with device barriers between, to locate the warm-run
cost seen in probe_stitch3d_device.json (55 s median).
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')


def main():
  import jax
  try:
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
  except Exception:
    pass
  import jax.numpy as jnp
  from sofima_tpu import mesh
  from sofima_tpu import stitch_elastic
  from sofima_tpu.pipeline import stitch3d

  results = {}
  t_all = time.perf_counter()

  def tick(label, t0):
    dt = time.perf_counter() - t0
    results[label] = round(dt, 3)
    print(f'[probe +{time.perf_counter() - t_all:7.1f}s] {label}: '
          f'{dt:.3f}s', flush=True)
    with open('/tmp/probe_s3_phases.json', 'w') as fh:
      json.dump(results, fh, indent=1)
    return time.perf_counter()

  zdim, tile_yx, overlap3 = 64, 576, 64
  step3t = tile_yx - overlap3
  n3 = step3t + tile_yx
  rng3 = np.random.RandomState(9)
  noise3 = rng3.rand(zdim, n3, n3).astype(np.float32)
  f3d = np.fft.rfftn(noise3)
  fz = np.fft.fftfreq(zdim)[:, None, None]
  fy3 = np.fft.fftfreq(n3)[None, :, None]
  fx3 = np.fft.rfftfreq(n3)[None, None, :]
  f3d *= np.exp(-((fx3**2 + fy3**2 + fz**2) / (2 * 0.12**2)))
  vol3 = np.fft.irfftn(f3d, s=(zdim, n3, n3),
                       axes=(0, 1, 2)).astype(np.float32)
  vol3 = (vol3 - vol3.min()) / np.ptp(vol3) * 255.0
  del noise3, f3d

  tiles3 = {}
  for ty in range(2):
    for tx in range(2):
      tiles3[(tx, ty)] = np.ascontiguousarray(
          vol3[:, ty * step3t:ty * step3t + tile_yx,
               tx * step3t:tx * step3t + tile_yx])
  dev_tiles3 = {k: jax.device_put(v) for k, v in tiles3.items()}
  stride3 = (16, 16, 16)
  cfg = stitch3d.Stitch3dConfig(
      stride=stride3, patch_size=(32, 32, 32), flow_batch=64, margin=8,
      mesh_cfg=mesh.IntegrationConfig(
          dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=stride3,
          num_iters=400, max_iters=10000, stop_v_max=0.005, dt_max=100.0))

  cx3 = np.full((3, 1, 2, 2), np.nan)
  cx3[0, 0, :, 0] = -overlap3
  cx3[1, 0, :, 0] = 0.0
  cx3[2, 0, :, 0] = 0.0
  cy3 = np.full((3, 1, 2, 2), np.nan)
  cy3[0, 0, 0, :] = 0.0
  cy3[1, 0, 0, :] = -overlap3
  cy3[2, 0, 0, :] = 0.0
  coarse3 = np.zeros((3, 1, 2, 2), np.float32)
  for ty in range(2):
    for tx in range(2):
      coarse3[0, 0, ty, tx] = -overlap3 * tx
      coarse3[1, 0, ty, tx] = -overlap3 * ty
  t0 = tick('setup_s', t_all)

  tz, ty_, tx_ = zdim, tile_yx, tile_yx
  yx_shape = (2, 2)

  class _TileView:
    def __init__(self, t):
      self._t = np.asarray(t)
      self.shape = (1,) + tuple(int(s) for s in self._t.shape)

    def __getitem__(self, sel):
      return self._t[np.newaxis][sel]

  tile_views = {k: _TileView(t) for k, t in tiles3.items()}

  def phases():
    out = {}
    t0 = time.perf_counter()
    flows_x, off_x = stitch_elastic.compute_flow_map3d(
        tile_views, tile_shape=(tx_, ty_, tz), offset_map=cx3, axis=0,
        patch_size=cfg.patch_size, stride=cfg.stride,
        batch_size=cfg.flow_batch, flow_mode=cfg.flow_mode)
    out['flow_x'] = time.perf_counter() - t0
    t0 = time.perf_counter()
    flows_y, off_y = stitch_elastic.compute_flow_map3d(
        tile_views, tile_shape=(tx_, ty_, tz), offset_map=cy3, axis=1,
        patch_size=cfg.patch_size, stride=cfg.stride,
        batch_size=cfg.flow_batch, flow_mode=cfg.flow_mode)
    out['flow_y'] = time.perf_counter() - t0
    t0 = time.perf_counter()
    fx_a, fy_a, x0, nbors, key_to_idx = stitch_elastic.aggregate_arrays(
        (cx3[:, 0], flows_x, off_x), (cy3[:, 0], flows_y, off_y),
        list(tiles3.keys()), coarse3[:, 0], cfg.stride,
        tile_shape=(tz, ty_, tx_))
    out['aggregate'] = time.perf_counter() - t0
    t0 = time.perf_counter()
    fx_j, fy_j = jnp.asarray(fx_a), jnp.asarray(fy_a)
    nbors_j = jnp.asarray(nbors)

    def prev_fn(x):
      tgt = jax.vmap(functools.partial(
          stitch_elastic.compute_target_mesh, x=x, fx=fx_j, fy=fy_j,
          stride=cfg.stride))(nbors_j)
      return jnp.moveaxis(tgt, 0, 1)

    solved, _, steps = mesh.relax_mesh(
        jnp.asarray(x0), None, cfg.mesh_cfg, prev_fn=prev_fn,
        mesh_force=mesh.elastic_mesh_3d)
    solved_h = np.asarray(solved)
    out['solve'] = time.perf_counter() - t0
    out['solve_steps'] = int(steps)
    t0 = time.perf_counter()
    canvas, w_acc = stitch3d.render_stitched_3d(
        dev_tiles3, solved_h, key_to_idx, cfg, yx_shape=yx_shape)
    out['render_build'] = time.perf_counter() - t0
    t0 = time.perf_counter()
    out['checksum'] = float(jnp.sum(canvas))
    out['render_sync'] = time.perf_counter() - t0
    return out

  out = phases()
  t0 = tick('cold_s', t0)
  for k, v in out.items():
    if isinstance(v, float):
      results[f'cold_{k}'] = round(v, 3)
  for i in range(2):
    t1 = time.perf_counter()
    out = phases()
    results[f'warm{i}_total'] = round(time.perf_counter() - t1, 3)
    for k, v in out.items():
      if isinstance(v, float):
        results[f'warm{i}_{k}'] = round(v, 3)
    t0 = tick(f'warm_{i}', t0)

  with open('/tmp/probe_s3_phases.json', 'w') as fh:
    json.dump(results, fh, indent=1)
  print(json.dumps(results), flush=True)


if __name__ == '__main__':
  main()
