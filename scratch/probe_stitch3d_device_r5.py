"""Hardware probe of the device-resident stitch3d chain (bench
geometry): per-phase wall clock + end-to-end quality, cold and warm.
"""

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
  from sofima_tpu.pipeline import stitch3d

  results = {}
  t_all = time.perf_counter()

  def tick(label, t0):
    dt = time.perf_counter() - t0
    results[label] = round(dt, 2)
    print(f'[probe +{time.perf_counter() - t_all:7.1f}s] {label}: '
          f'{dt:.2f}s', flush=True)
    with open('/tmp/probe_stitch3d_device.json', 'w') as fh:
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
  from sofima_tpu import mesh
  cfg_s3 = stitch3d.Stitch3dConfig(
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

  def run():
    out = stitch3d.stitch_and_render_3d(tiles3, cx3, cy3, coarse3, cfg_s3,
                                        device_tiles=dev_tiles3)
    out['checksum'] = float(jnp.sum(out['canvas']))
    return out

  out = run()
  t0 = tick('cold_s', t0)
  tms = []
  for i in range(3):
    t1 = time.perf_counter()
    out = run()
    tms.append(time.perf_counter() - t1)
    t0 = tick(f'warm_{i}_s', t0)
  tms.sort()
  results['warm_median_s'] = round(tms[1], 3)
  results['mvox_s'] = round(zdim * n3 * n3 / tms[1] / 1e6, 1)

  lo_z, lo_yx = 8, 16
  truth3 = jax.device_put(
      vol3[lo_z:zdim - lo_z, lo_yx:n3 - lo_yx, lo_yx:n3 - lo_yx])

  @jax.jit
  def quality(canvas, weights, truth):
    c = canvas[lo_z:zdim - lo_z, lo_yx:n3 - lo_yx, lo_yx:n3 - lo_yx]
    w = weights[lo_z:zdim - lo_z, lo_yx:n3 - lo_yx, lo_yx:n3 - lo_yx]
    m = w > 0
    err = jnp.sum(jnp.where(m, jnp.abs(c - truth), 0.0))
    cnt = jnp.sum(m)
    return err / jnp.maximum(cnt, 1) / jnp.std(truth), cnt / truth.size

  rel3, cov3 = quality(out['canvas'], out['weights'], truth3)
  results['rel_err'] = round(float(rel3), 4)
  results['coverage'] = round(float(cov3), 4)
  results['solve_steps'] = int(out['solve_steps'])

  with open('/tmp/probe_stitch3d_device.json', 'w') as fh:
    json.dump(results, fh, indent=1)
  print(json.dumps(results), flush=True)


if __name__ == '__main__':
  main()
