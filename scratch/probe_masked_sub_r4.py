"""Hardware probe: subgrouped-purity masked flow kernel (round 4).

Measures the new per-subgroup purity-predicated masked NCC kernel on
the bench's 10k^2 ~17%-masked pair: compile + min-of-3 timing for f32
and bf16-split, and integer-peak agreement vs the padfield masked
oracle path. Prints one JSON line.
"""
import json
import time

import numpy as np
import jax

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import jax.numpy as jnp
from sofima_tpu import flow_field

n = 10000
stride = 40
patch = 160
rng = np.random.RandomState(0)

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

yy, xx = np.mgrid[:n, :n]
mask_np = (((yy + xx) % 7919 < 900)
           | (((yy - 3000)**2 + (xx - 7000)**2) < 1500**2))
mask = jax.device_put(mask_np)
del yy, xx, noise, f


def checksum(x):
  leaves = jax.tree_util.tree_leaves(x)
  return float(sum(jnp.sum(jnp.nan_to_num(l.astype(jnp.float32)))
                   for l in leaves))


def _time(fn, reps=3):
  out = fn()
  checksum(out)
  best = float('inf')
  for _ in range(reps):
    t0 = time.perf_counter()
    out = fn()
    checksum(out)
    best = min(best, time.perf_counter() - t0)
  return out, best


def run_flow_masked(bf16):
  return flow_field.dense_flow_field(
      pre, post, (patch, patch), (stride, stride), batch_size=256,
      circular=True, dft_matmul=True, bf16=bf16,
      pre_mask=mask, post_mask=mask)


results = {}
t0 = time.perf_counter()
flow_m32, t_m32 = _time(lambda: run_flow_masked(False))
results['compile_plus_first_s'] = round(time.perf_counter() - t0, 1)
flow_m16, t_m16 = _time(lambda: run_flow_masked(True))
results['flow_masked_s_f32'] = round(t_m32, 3)
results['flow_masked_s_bf16'] = round(t_m16, 3)
agree_m = float(jnp.mean(
    jnp.nan_to_num(flow_m32[0], nan=9e9)
    == jnp.nan_to_num(flow_m16[0], nan=9e9)))
results['bf16_peak_agreement'] = round(agree_m, 5)

# Oracle: XLA circular masked path (reference Padfield semantics).
def run_oracle():
  return flow_field.dense_flow_field(
      pre, post, (patch, patch), (stride, stride), batch_size=256,
      circular=True, dft_matmul=False,
      pre_mask=mask, post_mask=mask)

try:
  oracle, t_or = _time(run_oracle, reps=1)
  results['oracle_s'] = round(t_or, 3)
  for name, fl in (('f32', flow_m32), ('bf16', flow_m16)):
    ag = float(jnp.mean(
        jnp.nan_to_num(fl[0], nan=9e9)
        == jnp.nan_to_num(oracle[0], nan=9e9)))
    results[f'oracle_peak_agreement_{name}'] = round(ag, 5)
except Exception as e:  # noqa: BLE001
  results['oracle_error'] = f'{type(e).__name__}: {e}'[:300]
results['valid_frac'] = round(
    float(jnp.mean(jnp.isfinite(flow_m32[0]))), 3)
print(json.dumps(results))
