"""Hardware check of the bench flow stages with the segmented x-DFT.
Measures unmasked + masked dense flow at bench geometry and the peak
agreements the bench gates on. Writes /tmp/probe_seg_bench.json.
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
  from sofima_tpu import flow_field

  print('backend:', jax.default_backend(), flush=True)
  results = {}
  n, stride, patch = 10000, 40, 160
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
  yy, xx = np.mgrid[:n, :n]
  mask_np = (((yy + xx) % 7919 < 900)
             | (((yy - 3000)**2 + (xx - 7000)**2) < 1500**2))
  mask = jax.device_put(mask_np)
  del yy, xx, noise, f

  def timeit(fn):
    out = fn()
    float(jnp.nansum(out[0]))
    ts = []
    for _ in range(3):
      t0 = time.perf_counter()
      out = fn()
      float(jnp.nansum(out[0]))
      ts.append(time.perf_counter() - t0)
    return out, sorted(ts)[1]

  def run_flow(bf16, masked):
    kw = dict(batch_size=256, circular=True, dft_matmul=True, bf16=bf16)
    if masked:
      kw.update(pre_mask=mask, post_mask=mask)
    return flow_field.dense_flow_field(pre, post, (patch, patch),
                                       (stride, stride), **kw)

  f32, t32 = timeit(lambda: run_flow(False, False))
  b16, t16 = timeit(lambda: run_flow(True, False))
  agree = float(jnp.mean(
      jnp.nan_to_num(f32[0]) == jnp.nan_to_num(b16[0])))
  results['flow_s_f32'] = round(t32, 3)
  results['flow_s_bf16'] = round(t16, 3)
  results['flow_bf16_peak_agreement'] = round(agree, 5)
  print('unmasked', results, flush=True)

  m32, tm32 = timeit(lambda: run_flow(False, True))
  m16, tm16 = timeit(lambda: run_flow(True, True))
  agree_m = float(jnp.mean(
      jnp.nan_to_num(m32[0], nan=9e9) == jnp.nan_to_num(m16[0], nan=9e9)))
  results['flow_masked_s_f32'] = round(tm32, 3)
  results['flow_masked_s_bf16'] = round(tm16, 3)
  results['flow_masked_bf16_peak_agreement'] = round(agree_m, 5)
  results['flow_masked_valid_frac'] = round(
      float(jnp.mean(jnp.isfinite(m16[0]))), 3)
  print('masked', results, flush=True)

  with open('/tmp/probe_seg_bench.json', 'w') as fh:
    json.dump(results, fh, indent=1)
  print('DONE', flush=True)


if __name__ == '__main__':
  main()
