"""Archival-protocol vs headline-protocol output delta (VERDICT r4 #1).

The headline pipeline solves with k0=0.1 / no cap ramp; the reference's
archival EM-2D protocol is k0=0.01 with a 0.01 -> 10 cap escalation
(/root/reference/processor/defaults/em_2d.py:137-167). This script
quantifies what that protocol delta does to the OUTPUTS on the bench
stack (16 x 10k^2), fused-chain vs fused-chain so the measured delta is
protocol-only:

  * implementation equivalence (fused chain == staged chain at the SAME
    protocol) is pinned at unit scale by
    tests/test_stack_align.py::TestFusedVsStaged — including the round-5
    archival row (k0=0.01 + ramp on both sides);
  * flow parity (grid kernels == padfield oracle integer peaks) is gated
    in bench.py on this very stack.

Reports, all device-reduced (scalar d2h only — the relay's bulk d2h is
~35 KB/s):
  * per-section solved-node |headline - archival| (max / mean);
  * per-section rendered |headline - archival| (mean / max over interior);
  * ground-truth error of each protocol vs the known deformation;
  * the archival preset's pipeline Mpix/s, median of 3 (the number
    PARITY.md records next to the headline).

Writes scratch/ablate_archival_r5.json.
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')


def main():
  import jax
  try:
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
  except Exception:
    pass
  import jax.numpy as jnp
  from sofima_tpu.ops import interp, pallas_warp
  from sofima_tpu.ops import shift_warp as shift_warp_ops
  from sofima_tpu.pipeline import stack_align

  results = {}

  def save():
    with open('scratch/ablate_archival_r5.json', 'w') as fh:
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

  n_z = 16
  gm_y, gm_x = np.mgrid[:grid_n, :grid_n].astype(np.float32) * stride
  stack_list = [base_u8]
  for z in range(1, n_z):
    dyz = 2.5 * z + 7.0 * np.sin(2 * np.pi * gm_x / 2500.0 + 0.7 * z)
    dxz = -2.0 * z + 7.0 * np.cos(2 * np.pi * gm_y / 2500.0 + 0.4 * z)
    stack_list.append(make_section(jax.device_put(np.stack([dyz, dxz]))))
  stack_j = jnp.stack(stack_list)
  del stack_list, base_u8, post, make_section
  jax.clear_caches()
  inter = np.s_[320:-320, 320:-320]

  # Headline config (bench.py r4/r5 settings).
  cfg_h = stack_align.StackAlignConfig(max_displacement=128, residual=6,
                                       render_two_pass=True,
                                       peak_crop=32, warm_start=False)
  cfg_h = dataclasses.replace(
      cfg_h, mesh=dataclasses.replace(cfg_h.mesh, num_iters=125))
  # Archival preset with the same flow/render levers (the preset only
  # changes the SOLVER protocol).
  cfg_a = stack_align.archival_em2d_config(
      max_displacement=128, residual=6, render_two_pass=True,
      peak_crop=32, warm_start=False)

  def run(cfg):
    rendered, solved, ovf = stack_align.align_stack_pipelined(
        stack_j, cfg, out_dtype=jnp.uint8)
    return rendered, solved, ovf

  def gt_err(rendered):
    def stats_one(r_u8):
      r = r_u8.astype(jnp.float32)
      base_i = stack_j[0][inter].astype(jnp.float32)
      return jnp.mean(jnp.abs(r[inter] - base_i))
    return jax.lax.map(stats_one, rendered[1:])

  # --- headline run ---
  rend_h, solved_h, ovf_h = run(cfg_h)
  errs_h = np.asarray(jax.jit(gt_err)(rend_h))
  results['headline_gt_err_max'] = round(float(errs_h.max()), 3)
  results['headline_overflow'] = bool(ovf_h)
  save()

  # --- archival run + timing ---
  t_all = []
  rend_a = solved_a = ovf_a = None
  for i in range(4):  # 1 warmup + 3 timed
    t0 = time.perf_counter()
    rend_a, solved_a, ovf_a = run(cfg_a)
    float(jnp.sum(rend_a[:, ::997, ::997].astype(jnp.float32)))
    dt = time.perf_counter() - t0
    if i:
      t_all.append(dt)
    else:
      results['archival_first_call_s'] = round(dt, 1)
  t_all.sort()
  t_med = t_all[1]
  results['archival_times_s'] = [round(t, 3) for t in t_all]
  results['archival_s'] = round(t_med, 3)
  results['archival_mpix_s'] = round((n_z - 1) * n * n / t_med / 1e6, 1)
  errs_a = np.asarray(jax.jit(gt_err)(rend_a))
  results['archival_gt_err_max'] = round(float(errs_a.max()), 3)
  results['archival_overflow'] = bool(ovf_a)
  save()

  # --- protocol deltas, device-reduced ---
  @jax.jit
  def deltas(ra, rb, sa, sb):
    def one(args):
      a, b = args
      d = jnp.abs(a.astype(jnp.float32)[inter]
                  - b.astype(jnp.float32)[inter])
      return jnp.mean(d), jnp.max(d)
    pix_mean, pix_max = jax.lax.map(one, (ra[1:], rb[1:]))
    nd = jnp.abs(sa - sb)
    node_max = jnp.nanmax(nd, axis=(1, 2, 3, 4))
    node_mean = jnp.nanmean(nd, axis=(1, 2, 3, 4))
    return pix_mean, pix_max, node_max, node_mean

  pix_mean, pix_max, node_max, node_mean = deltas(rend_h, rend_a,
                                                  solved_h, solved_a)
  results['pix_delta_mean_per_section'] = [
      round(float(v), 3) for v in np.asarray(pix_mean)]
  results['pix_delta_max_per_section'] = [
      round(float(v), 2) for v in np.asarray(pix_max)]
  results['node_delta_max_per_section'] = [
      round(float(v), 3) for v in np.asarray(node_max)]
  results['node_delta_mean_per_section'] = [
      round(float(v), 4) for v in np.asarray(node_mean)]
  results['pix_delta_mean_worst'] = round(float(np.asarray(pix_mean).max()),
                                          3)
  results['node_delta_max_worst'] = round(float(np.asarray(node_max).max()),
                                          3)
  save()
  print(json.dumps(results), flush=True)


if __name__ == '__main__':
  main()
