"""Round-4 lever ablation on hardware: pipelined stack + fine_patch/residual.

Measures the streamed 16x10k^2 stack pipeline (same inputs as bench.py)
under each config variant, median of 3 runs, with the ground-truth
quality gate. Writes scratch/ablate_r4.json progressively.
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
  from sofima_tpu.ops import interp, pallas_warp
  from sofima_tpu.ops import shift_warp as shift_warp_ops
  from sofima_tpu.pipeline import stack_align

  print('backend:', jax.default_backend(), flush=True)
  results = {}

  def save():
    with open('scratch/ablate_r4.json', 'w') as fh:
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
  post_np = np.roll(pre_np, (7, -12), (0, 1))
  post = jax.device_put(post_np)
  del noise, f, pre_np, post_np

  n_z = 16
  grid_n_p = n // stride
  node_np = np.arange(grid_n_p, dtype=np.float64) * stride
  env_r = (-16, 16, -16, 16)
  env_b = (-128, 128, -128, 128)
  base_u8 = jnp.clip(post + 0.5, 0, 255).astype(jnp.uint8)

  @jax.jit
  def make_section(disp_yx):
    dense_d = interp.upsample_map_linear(disp_yx, stride, (0, 0), (n, n))
    yyj = jnp.arange(n, dtype=jnp.float32)[:, None]
    xxj = jnp.arange(n, dtype=jnp.float32)[None, :]
    coords_g = jnp.stack([yyj + dense_d[0], xxj + dense_d[1]])[None]
    dplan = shift_warp_ops.tiled_plan_device(
        disp_yx[0][None], disp_yx[1][None], node_np, node_np, (n, n),
        env_r, env_b)
    sec = pallas_warp.pallas_shift_warp_tiled(
        base_u8[None].astype(jnp.float32), coords_g, dplan['bases'],
        'linear', *env_r, *env_b, *dplan['tile'],
        tile_bounds=dplan['tile_bounds'])[0]
    return jnp.clip(sec + 0.5, 0, 255).astype(jnp.uint8)

  gm_y, gm_x = np.mgrid[:grid_n_p, :grid_n_p].astype(np.float32) * stride
  stack_list = [base_u8]
  for z in range(1, n_z):
    dyz = 2.5 * z + 7.0 * np.sin(2 * np.pi * gm_x / 2500.0 + 0.7 * z)
    dxz = -2.0 * z + 7.0 * np.cos(2 * np.pi * gm_y / 2500.0 + 0.4 * z)
    stack_list.append(make_section(jax.device_put(np.stack([dyz, dxz]))))
  stack = jnp.stack(stack_list)
  float(jnp.sum(stack[-1][::997]))  # materialize
  # Free everything but the stack: the whole-stack program needs the
  # HBM headroom (the first ablation runs OOM'd from leftover buffers;
  # make_section's jit closure pins base_u8 until deleted).
  del stack_list, base_u8, post, make_section
  jax.clear_caches()
  print('stack ready', stack.shape, flush=True)
  inter = np.s_[320:-320, 320:-320]

  def run_stepwise(cfg):
    solved_z = jnp.zeros((2, 1, grid_n_p, grid_n_p), jnp.float32)
    acc = jnp.float32(0.0)
    overflow = jnp.bool_(False)
    err_acc = jnp.float32(0.0)
    base_i = stack[0][inter].astype(jnp.float32)
    for z in range(1, n_z):
      solved_z, rendered_z, ov = stack_align.align_step(
          stack[z - 1], stack[z], solved_z, cfg)
      acc = acc + jnp.sum(rendered_z[::97, ::97])
      overflow = jnp.logical_or(overflow, ov)
      err_acc = jnp.maximum(
          err_acc, jnp.mean(jnp.abs(rendered_z[inter] - base_i)))
    return acc, err_acc, overflow

  def run_pipelined(cfg):
    rendered, _, overflow = stack_align.align_stack_pipelined(
        stack, cfg, out_dtype=jnp.uint8)

    # Per-section stats WITHOUT materializing the f32 stack (15 x 400MB
    # of f32 renders OOM'd the first ablation run): lax.map keeps one
    # f32 section transient at a time.
    def stats_one(r_u8):
      r = r_u8.astype(jnp.float32)
      base_i = stack[0][inter].astype(jnp.float32)
      return (jnp.sum(r[::97, ::97]),
              jnp.mean(jnp.abs(r[inter] - base_i)))

    sums, errs = jax.lax.map(stats_one, rendered[1:])
    return jnp.sum(sums), jnp.max(errs), overflow

  def measure(name, fn, cfg):
    try:
      t0 = time.perf_counter()
      acc, err, ovf = fn(cfg)
      float(acc)
      t_compile_run = time.perf_counter() - t0
      times = []
      for _ in range(3):
        t0 = time.perf_counter()
        acc, err, ovf = fn(cfg)
        float(acc)
        times.append(time.perf_counter() - t0)
      t_med = sorted(times)[1]
      results[name] = {
          'times_s': [round(t, 3) for t in times],
          'median_s': round(t_med, 3),
          'mpix_s': round((n_z - 1) * n * n / t_med / 1e6, 1),
          'max_err': round(float(err), 3),
          'overflow': bool(ovf),
          'first_call_s': round(t_compile_run, 1),
      }
      print(name, results[name], flush=True)
    except Exception as e:  # noqa: BLE001
      results[name] = {'error': f'{type(e).__name__}: {e}'[:500]}
      print(name, 'ERROR', results[name]['error'], flush=True)
    save()

  C = stack_align.StackAlignConfig
  base_kw = dict(max_displacement=128, residual=8)

  import os
  if os.environ.get('ABLATE_STEPWISE'):
    measure('stepwise_r3', run_stepwise, C(**base_kw))
  measure('pipelined', run_pipelined, C(**base_kw))
  measure('pipelined_fp64', run_pipelined, C(fine_patch=64, **base_kw))
  measure('pipelined_r6', run_pipelined,
          C(max_displacement=128, residual=6))
  measure('pipelined_fp64_r6', run_pipelined,
          C(fine_patch=64, max_displacement=128, residual=6))
  # fine_patch=48: one step further down the O(edge^3) curve.
  measure('pipelined_fp48_r6', run_pipelined,
          C(fine_patch=48, max_displacement=128, residual=6))
  save()
  print('DONE', flush=True)


if __name__ == '__main__':
  main()
