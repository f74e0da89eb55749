"""Per-phase timing of the HEADLINE stack pipeline on hardware.

Same methodology as profile_phases_r4.py but at the current bench
headline config (residual=6, num_iters=250, render_two_pass, peak_crop
32, warm_start flow priors with the stale refresh) so the next
optimization round targets the real bottleneck. Writes
/tmp/phases_r6.json.
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
  import functools
  from sofima_tpu.ops import interp, pallas_warp
  from sofima_tpu.ops import shift_warp as shift_warp_ops
  from sofima_tpu.pipeline import stack_align

  print('backend:', jax.default_backend(), flush=True)
  results = {}

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
  grid_n = n // stride
  node_np = np.arange(grid_n, dtype=np.float64) * stride
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

  gm_y, gm_x = np.mgrid[:grid_n, :grid_n].astype(np.float32) * stride
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

  cfg = stack_align.StackAlignConfig(max_displacement=128, residual=6,
                                     render_two_pass=True,
                                     peak_crop=32, warm_start=False)
  cfg = dataclasses.replace(
      cfg, mesh=dataclasses.replace(cfg.mesh, num_iters=250))

  @jax.jit
  def phase_flow(stk):
    # Mirrors align_stack_pipelined's warm-start scan exactly.
    def flow_one(z, prior=None):
      pre = jax.lax.dynamic_index_in_dim(stk, z, keepdims=False)
      cur = jax.lax.dynamic_index_in_dim(stk, z + 1, keepdims=False)
      return stack_align._flow_phase(pre, cur, cfg, grid_n, prior=prior)

    flow0, ov0 = flow_one(jnp.int32(0))
    pad = cfg.patch // 2 // cfg.stride
    cap_half = cfg.peak_crop // 2

    def flow_scan(prev_flow, z):
      fl, ov = flow_one(z, prior=prev_flow[:, 0])
      sl = lambda a: jax.lax.slice(
          a, (0, 0, pad, pad),
          (a.shape[0], 1, a.shape[2] - pad, a.shape[3] - pad))
      interior = sl(fl)
      finite = jnp.isfinite(interior[0, 0])
      valid = jnp.mean(finite)
      resid = jnp.abs(interior - sl(prev_flow))
      resid = jnp.nan_to_num(jnp.max(resid, axis=(0, 1)))
      saturated = jnp.sum(finite & (resid > 0.75 * cap_half))
      frac_sat = saturated / jnp.maximum(jnp.sum(finite), 1)
      stale = (ov | (valid < 0.5) | (frac_sat > 0.05))
      fl, ov = jax.lax.cond(stale, lambda: flow_one(z),
                            lambda: (fl, ov))
      return fl, (fl, ov)

    _, (flows_rest, ov_rest) = jax.lax.scan(
        flow_scan, flow0, jnp.arange(1, n_z - 1))
    return jnp.concatenate([flow0[None], flows_rest], axis=0)

  @jax.jit
  def phase_solve(flows):
    def one(sp, ff):
      s = stack_align._solve_phase(ff, sp, cfg)
      return s, s
    z0 = jnp.zeros((2, 1, grid_n, grid_n), jnp.float32)
    _, out = jax.lax.scan(one, z0, flows)
    return out

  @jax.jit
  def phase_invert(solved_all):
    return jax.vmap(lambda sv: stack_align._invert_phase(sv, cfg))(
        solved_all)

  @jax.jit
  def phase_render(stk, rel_inv_all, inv_abs_all):
    def one(args):
      z1, ri, ia = args
      sec = jax.lax.dynamic_index_in_dim(stk, z1, keepdims=False)
      r, ov = stack_align._render_phase(sec, ri, ia, cfg)
      return jnp.sum(r[::97, ::97]), ov
    return jax.lax.map(one, (jnp.arange(1, n_z), rel_inv_all,
                             inv_abs_all))

  def timed(name, fn, *args):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., ::17]))
    ts = []
    for _ in range(3):
      t0 = time.perf_counter()
      out = fn(*args)
      float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., ::17]))
      ts.append(time.perf_counter() - t0)
    results[name] = round(sorted(ts)[1], 3)
    print(name, results[name], flush=True)
    return out

  try:
    flows = timed('flow_s', phase_flow, stack)
    solved_all = timed('solve_s', phase_solve, flows)
    ri, ia = timed('invert_s', phase_invert, solved_all)
    timed('render_s', phase_render, stack, ri, ia)
  except Exception as e:  # noqa: BLE001
    results['error'] = f'{type(e).__name__}: {e}'[:400]
    print('ERROR', results['error'], flush=True)
  with open('/tmp/phases_r6.json', 'w') as fh:
    json.dump(results, fh, indent=1)
  print('DONE ' + json.dumps(results), flush=True)


if __name__ == '__main__':
  main()
