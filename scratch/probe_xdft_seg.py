"""Hardware A/B: segmented x-DFT (auto) vs unsegmented in the targeted
fine kernel + the dense (coarse-shape) kernel at pipeline geometry.
Writes /tmp/probe_xdft_seg.json.
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
  from sofima_tpu.ops import pallas_flow

  print('backend:', jax.default_backend(), flush=True)
  results = {}

  n = 10000
  rng = np.random.RandomState(0)
  noise = rng.rand(n, n).astype(np.float32)
  f = np.fft.rfft2(noise)
  fy = np.fft.fftfreq(n)[:, None]
  fx = np.fft.rfftfreq(n)[None, :]
  f *= np.exp(-((fx**2 + fy**2) / (2 * 0.08**2)))
  pre_np = np.fft.irfft2(f, s=(n, n)).astype(np.float32)
  pre_np = (pre_np - pre_np.min()) / np.ptp(pre_np) * 255.0
  pre = jax.device_put(pre_np)
  post = jax.device_put(np.roll(pre_np, (7, -12), (0, 1)))

  fine = (80, 80)
  step = (40, 40)
  geo = pallas_flow.targeted_geometry((n, n), fine, step)
  offs = jnp.zeros((geo['nrsteps'], geo['ngroups'], 2), jnp.int32)

  def run(tag, **kw):
    try:
      fn = lambda: pallas_flow.dense_flow_peaks_targeted(
          pre, post, offs, fine, step, max_offset=96, bf16=True,
          peak_crop=32, **kw)
      out = jax.block_until_ready(fn())
      ts = []
      for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
      results[tag] = {'s': round(sorted(ts)[2], 4)}
      results[tag]['peak0'] = [float(out[i, 40, 40]) for i in range(2)]
      print(tag, results[tag], flush=True)
      return np.asarray(out)
    except Exception as e:  # noqa: BLE001
      results[tag] = {'error': f'{type(e).__name__}: {e}'[:250]}
      print(tag, 'ERROR', results[tag]['error'][:140], flush=True)
      return None

  a = run('fine_seg1', xdft_seg=1)
  b = run('fine_auto')
  if a is not None and b is not None:
    d = np.abs(np.nan_to_num(a) - np.nan_to_num(b))
    results['fine_max_abs_diff'] = float(d.max())
    results['fine_identical'] = bool(
        np.array_equal(np.nan_to_num(a), np.nan_to_num(b)))
    print('fine diff:', results['fine_max_abs_diff'],
          'identical:', results['fine_identical'], flush=True)

  # Coarse/full dense kernel (patch 160): seg threading is internal
  # (auto only) — time before/after is the same entry point, so just
  # time it for the record.
  def run_dense(tag):
    try:
      fn = lambda: pallas_flow.dense_flow_peaks_pallas(
          pre, post, (160, 160), (160, 160), bf16=True)
      jax.block_until_ready(fn())
      ts = []
      for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
      results[tag] = {'s': round(sorted(ts)[2], 4)}
      print(tag, results[tag], flush=True)
    except Exception as e:  # noqa: BLE001
      results[tag] = {'error': f'{type(e).__name__}: {e}'[:250]}
      print(tag, 'ERROR', results[tag]['error'][:140], flush=True)

  run_dense('dense160_auto')

  with open('/tmp/probe_xdft_seg.json', 'w') as fh:
    json.dump(results, fh, indent=1)
  print('DONE', flush=True)


if __name__ == '__main__':
  main()
