"""Standalone two-pass render measurement, bench warp-stage geometry.

Replicates bench.py's WARP stage exactly (same field, same plan, same
static bounds -> shared compile cache), then measures the two-pass
kernel on the same inputs. Writes scratch/ablate_r4c_warp.json.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')


def main():
  import jax
  jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
  jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
  import jax.numpy as jnp
  from sofima_tpu.ops import interp, pallas_warp, shift_warp

  print('backend:', jax.default_backend(), flush=True)
  results = {}

  def save():
    with open('scratch/ablate_r4c_warp.json', 'w') as fh:
      json.dump(results, fh, indent=1)

  n = 10000
  stride = 40
  rng = np.random.RandomState(0)
  noise = rng.rand(n, n).astype(np.float32)
  f = np.fft.rfft2(noise)
  fy = np.fft.fftfreq(n)[:, None]
  fx = np.fft.rfftfreq(n)[None, :]
  f *= np.exp(-((fx**2 + fy**2) / (2 * 0.08**2)))
  pre_np = np.fft.irfft2(f, s=(n, n)).astype(np.float32)
  pre_np = (pre_np - pre_np.min()) / np.ptp(pre_np) * 255.0
  post = jax.device_put(np.roll(pre_np, (7, -12), (0, 1)))
  del noise, f, pre_np

  grid_n = n // stride
  my, mx = np.mgrid[:grid_n, :grid_n].astype(np.float32)
  amp = 12.0
  wav = 2000.0 / stride
  dx = -12.0 + amp * np.sin(2 * np.pi * my / wav)
  dy = 7.0 + amp * np.cos(2 * np.pi * mx / wav)
  abs_map = np.zeros((2, grid_n, grid_n), np.float32)
  abs_map[0] = dx + mx * stride
  abs_map[1] = dy + my * stride
  abs_map_j = jax.device_put(abs_map)
  node_pos = np.arange(grid_n, dtype=np.float64) * stride
  plan = shift_warp.tiled_shift_plan(dy[None], dx[None], node_pos,
                                     node_pos, (n, n))
  bases_j = jax.device_put(plan['bases'])
  print('residual bounds', plan['residual_bounds'], flush=True)

  def run_warp(two_pass):
    dense = interp.upsample_map_linear(abs_map_j, stride, (0, 0), (n, n))
    coords = jnp.stack([dense[1], dense[0]])[None]
    return pallas_warp.pallas_shift_warp_tiled(
        post[None], coords, bases_j, 'lanczos',
        *plan['residual_bounds'], *plan['base_bounds'], *plan['tile'],
        two_pass=two_pass)

  def measure(name, two_pass):
    out = run_warp(two_pass)
    float(jnp.sum(out[0, ::997]))
    ts = []
    for _ in range(5):
      t0 = time.perf_counter()
      out = run_warp(two_pass)
      float(jnp.sum(out[0, ::997]))
      ts.append(time.perf_counter() - t0)
    results[name] = round(sorted(ts)[2], 4)
    print(name, results[name], flush=True)
    save()
    return out

  exact = measure('warp_exact_s', False)
  sep = measure('warp_two_pass_s', True)
  inter = np.s_[64:-64, 64:-64]
  diff = jnp.abs(sep[0][inter] - exact[0][inter])
  results['two_pass_max_diff'] = round(float(jnp.max(diff)), 3)
  results['two_pass_mean_diff'] = round(float(jnp.mean(diff)), 4)
  save()
  print('DONE', results, flush=True)


if __name__ == '__main__':
  main()
