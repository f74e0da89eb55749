"""Breakdown of the warm-start flow phase (1.008 s / 15 pairs, 42% of
the round-4 pipeline): targeted fine NCC kernel vs clean_flow vs the
staleness/robustify logic around it. Writes /tmp/probe_flow_fine.json.
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
  from sofima_tpu import flow_field, flow_utils
  from sofima_tpu.ops import pallas_flow
  from sofima_tpu.pipeline import stack_align

  print('backend:', jax.default_backend(), flush=True)
  results = {}

  n = 10000
  stride = 40
  patch = 160
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
  del noise, f, pre_np

  def barrier(out):
    # block_until_ready is a no-op on the axon relay; d2h is the only
    # reliable barrier (same methodology as bench.py).
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(jnp.nan_to_num(leaf[..., ::7].astype(jnp.float32))))

  def timed(name, fn, *args):
    out = fn(*args)
    barrier(out)
    ts = []
    for _ in range(3):
      t0 = time.perf_counter()
      out = fn(*args)
      barrier(out)
      ts.append(time.perf_counter() - t0)
    results[name] = round(sorted(ts)[1], 4)
    print(name, results[name], flush=True)
    return out

  grid_n = n // stride
  cfg = stack_align.StackAlignConfig(max_displacement=128, residual=6,
                                     render_two_pass=True,
                                     peak_crop=32, warm_start=True)

  # 1. The whole _flow_phase with a prior (the warm path, one pair).
  prior = jnp.zeros((2, grid_n, grid_n), jnp.float32)

  @jax.jit
  def warm_flow(a, b, pr):
    return stack_align._flow_phase(a, b, cfg, grid_n, prior=pr)

  timed('flow_phase_warm_s', warm_flow, pre, post, prior)

  # 2. The targeted fine kernel alone (zero offsets).
  geo = pallas_flow.targeted_geometry((n, n), (fine, fine),
                                      (stride, stride))
  offs = jnp.zeros((geo['nrsteps'], geo['ngroups'], 2), jnp.int32)

  @jax.jit
  def fine_only(a, b, o):
    return pallas_flow.dense_flow_peaks_targeted(
        a, b, o, (fine, fine), (stride, stride), max_offset=128,
        bf16=True, peak_crop=32)

  timed('fine_kernel_s', fine_only, pre, post, offs)

  # 2b. Same without peak_crop (isolate the peak-chain share).
  @jax.jit
  def fine_nocrop(a, b, o):
    return pallas_flow.dense_flow_peaks_targeted(
        a, b, o, (fine, fine), (stride, stride), max_offset=128,
        bf16=True, peak_crop=None)

  timed('fine_kernel_nocrop_s', fine_nocrop, pre, post, offs)

  # 2c. fine_patch=64 variant (crop-aligned now, O(edge^3) matmuls).
  geo64 = pallas_flow.targeted_geometry((n - 8, n - 8), (64, 64),
                                        (stride, stride))
  offs64 = jnp.zeros((geo64['nrsteps'], geo64['ngroups'], 2), jnp.int32)

  @jax.jit
  def fine64(a, b, o):
    return pallas_flow.dense_flow_peaks_targeted(
        a[8:, 8:], b[8:, 8:], o, (64, 64), (stride, stride),
        max_offset=128, bf16=True, peak_crop=32)

  timed('fine_kernel_fp64_s', fine64, pre, post, offs64)

  # 3. clean_flow_device alone on a full-grid flow.
  flow4 = jnp.concatenate([
      jnp.zeros((2, 1, grid_n - 3, grid_n - 3), jnp.float32),
      jnp.ones((2, 1, grid_n - 3, grid_n - 3), jnp.float32) * 2.0,
  ])

  @jax.jit
  def clean_only(fl):
    return flow_utils.clean_flow_device(fl, cfg.min_peak_ratio,
                                        cfg.min_peak_sharpness,
                                        cfg.max_magnitude,
                                        cfg.max_deviation)

  timed('clean_s', clean_only, flow4)

  # 4. The prior robustify + grid_sample + offsets math alone: jit the
  # flow phase but stop before the kernel call is impossible; instead
  # time coarse_to_fine's prior preamble by differencing: warm_flow
  # minus fine_kernel minus clean.
  results['residue_s'] = round(
      results['flow_phase_warm_s'] - results['fine_kernel_s']
      - results['clean_s'], 4)
  print('residue (robustify/sample/pad/astype):', results['residue_s'],
        flush=True)

  with open('/tmp/probe_flow_fine.json', 'w') as fh:
    json.dump(results, fh, indent=1)
  print('DONE ' + json.dumps(results), flush=True)


if __name__ == '__main__':
  main()
