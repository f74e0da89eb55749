"""Geometry ablation of the targeted fine NCC kernel (group x rows).

The round-4 profile shows the warm-start fine pass is the pipeline's
largest phase (72 ms/pair) and is NOT flop-bound (fine_patch 64 vs 80:
-9%; peak_crop off: +4%) — it is per-grid-step bound at ~36 us/step
over 2000 steps (group=16, rows=2). This probes whether larger steps
amortize that. Writes /tmp/probe_fine_geom_b.json.
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
  stride = 40
  fine = 80
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
  ref = None
  del noise, f, pre_np

  def save():
    with open('/tmp/probe_fine_geom_b.json', 'w') as fh:
      json.dump(results, fh, indent=1)

  for group, rows in [(32, 2), (32, 4), (64, 2), (64, 1), (48, 2),
                      (32, 1)]:
    key = f'g{group}r{rows}'
    try:
      geo = pallas_flow.targeted_geometry((n, n), (fine, fine),
                                          (stride, stride), group=group,
                                          rows=rows)
      offs = jnp.zeros((geo['nrsteps'], geo['ngroups'], 2), jnp.int32)

      def run(a=pre, b=post, o=offs, g=group, r=rows):
        return pallas_flow.dense_flow_peaks_targeted(
            a, b, o, (fine, fine), (stride, stride), max_offset=128,
            bf16=True, peak_crop=32, group=g, rows=r)

      out = run()
      chk = float(jnp.sum(jnp.nan_to_num(out[0])))
      ts = []
      for _ in range(3):
        t0 = time.perf_counter()
        out = run()
        float(jnp.sum(jnp.nan_to_num(out[0])))
        ts.append(time.perf_counter() - t0)
      t = sorted(ts)[1]
      steps = geo['nrsteps'] * geo['ngroups']
      results[key] = {'s': round(t, 4), 'steps': steps,
                      'us_per_step': round(t / steps * 1e6, 1),
                      'chk': round(chk, 1)}
      if ref is None:
        ref = chk
      results[key]['match'] = bool(abs(chk - ref) < 1e-3 * abs(ref) + 1)
      print(key, results[key], flush=True)
    except Exception as e:  # noqa: BLE001
      results[key] = {'error': f'{type(e).__name__}: {e}'[:200]}
      print(key, 'ERROR', results[key]['error'][:120], flush=True)
    save()
  print('DONE ' + json.dumps(results), flush=True)


if __name__ == '__main__':
  main()
