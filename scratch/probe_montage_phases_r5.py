"""Per-phase WARM wall clock of the device-resident montage chain.

probe_montage_device_r5.py timed the phases cold and the full chain
warm (12.7-17.9 s); this splits the WARM runs into phases with a
device barrier (tiny fetch) after each, to locate the cost.
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
  from sofima_tpu import mesh, stitch_elastic, stitch_rigid
  from sofima_tpu.pipeline import montage

  results = {}
  t_all = time.perf_counter()

  def tick(label, t0):
    dt = time.perf_counter() - t0
    results[label] = round(dt, 3)
    print(f'[probe +{time.perf_counter() - t_all:7.1f}s] {label}: '
          f'{dt:.3f}s', flush=True)
    with open('/tmp/probe_montage_phases.json', 'w') as fh:
      json.dump(results, fh, indent=1)
    return time.perf_counter()

  n = 10000
  rng = np.random.RandomState(0)
  noise = rng.rand(n, n).astype(np.float32)
  f = np.fft.rfft2(noise)
  fy = np.fft.fftfreq(n)[:, None]
  fx = np.fft.rfftfreq(n)[None, :]
  f *= np.exp(-((fx**2 + fy**2) / (2 * 0.08**2)))
  img = np.fft.irfft2(f, s=(n, n)).astype(np.float32)
  img = (img - img.min()) / np.ptp(img) * 255.0
  del noise, f

  grid_t, tile_t, overlap_t = 3, 3600, 400
  step_t = tile_t - overlap_t
  n_m = step_t * (grid_t - 1) + tile_t
  img_m = img[:n_m, :n_m]
  tiles = {}
  for ty in range(grid_t):
    for tx in range(grid_t):
      tiles[(tx, ty)] = jax.device_put(
          img_m[ty * step_t:ty * step_t + tile_t,
                tx * step_t:tx * step_t + tile_t])
  t0 = tick('setup_s', t_all)

  cfg = montage.MontageConfig(
      stride=40, patch_size=160, coarse_overlaps=(360, 440),
      min_overlap=200, margin=16, flow_batch=256,
      mesh_cfg=mesh.IntegrationConfig(
          dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=(40.0, 40.0),
          num_iters=1000, max_iters=20000, stop_v_max=0.005,
          dt_max=100.0))
  s = cfg.stride
  stride_t = (s, s)
  ov = tuple(cfg.coarse_overlaps)

  def phases():
    out = {}
    t0 = time.perf_counter()
    cx, cy = stitch_rigid.compute_coarse_offsets_batched(
        (grid_t, grid_t), tiles, overlaps_xy=(ov, ov),
        min_range=cfg.min_range, min_overlap=cfg.min_overlap,
        filter_size=cfg.filter_size)
    cx = stitch_rigid.interpolate_missing_offsets(cx, axis=-1)
    cy = stitch_rigid.interpolate_missing_offsets(cy, axis=-2)
    coarse = stitch_rigid.optimize_coarse_mesh(cx, cy)
    out['coarse'] = time.perf_counter() - t0
    t0 = time.perf_counter()
    fine_x, off_x = stitch_elastic.compute_flow_map(
        tiles, cx[:, 0], axis=0, patch_size=(160, 160), stride=stride_t,
        batch_size=cfg.flow_batch, flow_mode=cfg.flow_mode)
    fine_y, off_y = stitch_elastic.compute_flow_map(
        tiles, cy[:, 0], axis=1, patch_size=(160, 160), stride=stride_t,
        batch_size=cfg.flow_batch, flow_mode=cfg.flow_mode)
    out['fine'] = time.perf_counter() - t0
    t0 = time.perf_counter()
    fx_a, fy_a, x0, nbors, key_to_idx = stitch_elastic.aggregate_arrays(
        (cx[:, 0], fine_x, off_x), (cy[:, 0], fine_y, off_y),
        list(tiles.keys()), coarse[:, 0], stride_t,
        tile_shape=(tile_t, tile_t))
    nbors_j, fx_j, fy_j = (jnp.asarray(nbors), jnp.asarray(fx_a),
                           jnp.asarray(fy_a))

    def prev_fn(x):
      tgt = jax.vmap(functools.partial(
          stitch_elastic.compute_target_mesh, x=x, fx=fx_j, fy=fy_j,
          stride=stride_t))(nbors_j)
      return jnp.moveaxis(tgt, 0, 1)

    solved, _, steps = mesh.relax_mesh(jnp.asarray(x0), None, cfg.mesh_cfg,
                                       prev_fn=prev_fn)
    _ = float(jnp.sum(jnp.nan_to_num(solved)))  # barrier
    out['solve'] = time.perf_counter() - t0
    out['solve_steps'] = int(steps)
    t0 = time.perf_counter()
    maps = {k: solved[:, i:i + 1] for k, i in key_to_idx.items()}
    canvas, cmask, ovf = montage.render_tiles_device(
        tiles, maps, stride=s, margin=cfg.margin, cfg=cfg)
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
    results[f'warm{i}_steps'] = out['solve_steps']
    t0 = tick(f'warm_{i}', t0)

  with open('/tmp/probe_montage_phases.json', 'w') as fh:
    json.dump(results, fh, indent=1)
  print(json.dumps(results), flush=True)


if __name__ == '__main__':
  main()
