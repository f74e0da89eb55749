"""Round-4 ablation G: segmented x-DFT fine kernel on the headline pipeline.

With warm_start=True the pipelined driver feeds pair z-1's cleaned
flow to pair z as the fine-pass targeting prior, skipping the
per-pair coarse pass (flow+clean is 36% of the round-4 phase profile;
the coarse grid kernel is the larger half of it). The fine pass
re-measures peaks exactly, so the prior costs capture margin only —
the bench stack's section-to-section flow delta is ~5-7 px, well
inside the peak_crop=32 core. Variants on the r4 headline config
(residual=6, ni250, render_two_pass, peak_crop=32). Writes
scratch/ablate_r4i.json.
"""

import dataclasses
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
    with open('scratch/ablate_r4i.json', 'w') as fh:
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
  float(jnp.sum(stack[-1][::997]))
  del stack_list, base_u8, post, make_section
  jax.clear_caches()
  print('stack ready', flush=True)
  inter = np.s_[320:-320, 320:-320]

  def run_pipelined(cfg):
    rendered, _, overflow = stack_align.align_stack_pipelined(
        stack, cfg, out_dtype=jnp.uint8)

    def stats_one(r_u8):
      r = r_u8.astype(jnp.float32)
      base_i = stack[0][inter].astype(jnp.float32)
      return (jnp.sum(r[::97, ::97]),
              jnp.mean(jnp.abs(r[inter] - base_i)))

    sums, errs = jax.lax.map(stats_one, rendered[1:])
    return jnp.sum(sums), jnp.max(errs), overflow

  def measure(name, cfg):
    try:
      t0 = time.perf_counter()
      acc, err, ovf = run_pipelined(cfg)
      float(acc)
      first = time.perf_counter() - t0
      times = []
      for _ in range(3):
        t0 = time.perf_counter()
        acc, err, ovf = run_pipelined(cfg)
        float(acc)
        times.append(time.perf_counter() - t0)
      t_med = sorted(times)[1]
      results[name] = {
          'median_s': round(t_med, 3),
          'mpix_s': round((n_z - 1) * n * n / t_med / 1e6, 1),
          'max_err': round(float(err), 3),
          'overflow': bool(ovf),
          'first_call_s': round(first, 1),
      }
      print(name, results[name], flush=True)
    except Exception as e:  # noqa: BLE001
      results[name] = {'error': f'{type(e).__name__}: {e}'[:400]}
      print(name, 'ERROR', results[name]['error'], flush=True)
    save()

  C = stack_align.StackAlignConfig
  mesh250 = dataclasses.replace(C().mesh, num_iters=250)
  head = C(max_displacement=128, residual=6, render_two_pass=True,
           peak_crop=32, mesh=mesh250)

  measure('headline_pc32', head)
  measure('noramp_cap10', dataclasses.replace(
      head, mesh=dataclasses.replace(mesh250, start_cap=10.0)))
  measure('noramp_ni125', dataclasses.replace(
      head, mesh=dataclasses.replace(mesh250, start_cap=10.0,
                                     num_iters=125)))
  save()
  print('DONE', flush=True)


if __name__ == '__main__':
  main()
