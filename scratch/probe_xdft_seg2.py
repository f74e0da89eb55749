"""Re-measure fine targeted kernel seg1 vs auto with distinct inputs per
iteration (defeats any execute-dedup). Writes /tmp/probe_xdft_seg2.json.
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
      def fn(b):
        return pallas_flow.dense_flow_peaks_targeted(
            b, post, offs, fine, step, max_offset=96, bf16=True,
            peak_crop=32, **kw)
      float(jnp.nansum(fn(pre)))
      ts = []
      for i in range(5):
        b = pre + jnp.float32(i) * 1e-6
        float(jnp.sum(b[:1, :1]))
        t0 = time.perf_counter()
        float(jnp.nansum(fn(b)))
        ts.append(time.perf_counter() - t0)
      results[tag] = {'s': round(sorted(ts)[2], 4),
                      'all': [round(t, 4) for t in ts]}
      print(tag, results[tag], flush=True)
    except Exception as e:  # noqa: BLE001
      results[tag] = {'error': f'{type(e).__name__}: {e}'[:250]}
      print(tag, 'ERROR', results[tag]['error'][:140], flush=True)

  run('fine_seg1', xdft_seg=1)
  run('fine_auto')
  run('fine_seg4', xdft_seg=4)
  run('fine_seg16', xdft_seg=16)

  with open('/tmp/probe_xdft_seg2.json', 'w') as fh:
    json.dump(results, fh, indent=1)
  print('DONE', flush=True)


if __name__ == '__main__':
  main()
