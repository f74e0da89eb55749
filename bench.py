"""Benchmark: flow+warp throughput on a 10k² EM section + mesh GLUPS.

Runs on the default JAX backend (the real TPU chip under the driver) and
prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpix/s", "vs_baseline": N, ...}

Design note: all headline stages are DEVICE-RESIDENT — inputs go
host->device once, timing wraps a scalar-checksum fetch (the only
reliable completion barrier on the axon relay, whose device->host path
runs at ~35 KB/s; production output paths write from the TPU-adjacent
host, so bulk d2h is deliberately excluded from the measured path).
The EstimateMissingFlow stage is host-orchestrated by design (like the
reference's) and is reported for regression tracking only.

Honesty notes (BENCH_r01 review items):
  * the warp stage uses a SMOOTH deformation field (amplitude 12 px,
    like examples/e2e_alignment.py), not a pure translation;
  * the warped output is validated against the independent gather
    sampler on a sub-strip;
  * flow runs bf16 only after asserting integer-peak parity with f32 on
    the benchmark data itself.

Baselines (BASELINE.md):
  * north star: >1 Gpix/s/chip combined flow+warp on a 10k² section
    (vs_baseline = value / 1000)
  * mesh relaxation: 2.3 GLUPS (reference GPU figure, mesh.py comment)
"""

import json
import sys
import time

import numpy as np


def _time(fn, repeats=3):
  """Warmup + median-of-N wall time for a device computation.

  Timing includes fetching a scalar checksum of the output — on the axon
  relay, block_until_ready can return before remote execution completes,
  so a scalar d2h fetch is the only reliable completion barrier.

  Median-of-N (default 3) everywhere as of round 5: single-shot timings
  on this relay showed 4-5x run-to-run swings on two stages in round 4
  (estimate_missing_flow, flow3d_padfield — BENCH_r03 vs r04), the same
  contention ambiguity that hit the pipeline stage in round 3. Returns
  (out, median_seconds, spread_seconds).
  """
  import jax
  import jax.numpy as jnp

  def checksum(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(sum(jnp.sum(jnp.nan_to_num(l)) for l in leaves))

  out = fn()
  checksum(out)
  times = []
  for _ in range(repeats):
    t0 = time.perf_counter()
    out = fn()
    checksum(out)
    times.append(time.perf_counter() - t0)
  times.sort()
  return out, times[len(times) // 2], times[-1] - times[0]


_T0 = time.perf_counter()


def _progress(msg):
  """Per-stage heartbeat on stderr (stdout carries ONLY the JSON line).

  The round-5 stage additions pushed a cold full run past an hour of
  wall clock (mostly first-call remote compiles); the heartbeat makes a
  long run diagnosable and attributes the time per stage."""
  print(f'[bench +{time.perf_counter() - _T0:7.1f}s] {msg}',
        file=sys.stderr, flush=True)


def _guard(results, name, fn):
  """Stage isolation: one failing stage must not erase the whole run's
  numbers (the JSON line is printed once at the end)."""
  _progress(f'stage {name} ...')
  try:
    fn()
  except Exception as e:  # noqa: BLE001 - record and continue
    results[name + '_error'] = f'{type(e).__name__}: {e}'[:300]
    _progress(f'stage {name} FAILED: {results[name + "_error"]}')


def main():
  import jax
  try:
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
  except Exception:
    pass
  import jax.numpy as jnp
  from sofima_tpu import flow_field, mesh, warp

  n = 10000
  stride = 40
  patch = 160
  rng = np.random.RandomState(0)

  # Band-limited texture (EM-like) so correlation peaks are realistic.
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

  results = {}

  # ---- FLOW: dense grid over the full 10k^2 pair (device resident). ------
  _progress('stage flow ...')
  def run_flow_padfield():
    return flow_field.dense_flow_field(pre, post, (patch, patch),
                                       (stride, stride), batch_size=512)

  flow, t_flow_padfield, sp_flow_padfield = _time(run_flow_padfield)
  grid = flow.shape[1:]
  results['flow_s_padfield'] = round(t_flow_padfield, 3)
  results['flow_s_padfield_spread_s'] = round(sp_flow_padfield, 3)

  # Production dense-grid mode: strip-sliced patches + fused Pallas
  # DFT-matmul correlation; bf16 matmul inputs gated on f32 parity.
  def run_flow(bf16):
    return flow_field.dense_flow_field(pre, post, (patch, patch),
                                       (stride, stride), batch_size=256,
                                       circular=True, dft_matmul=True,
                                       bf16=bf16)

  flow_f32, t_flow_f32, _sp = _time(lambda: run_flow(False))
  flow_b16, t_flow_b16, _sp = _time(lambda: run_flow(True))
  # Integer-peak parity gate (device-side reduction, scalar fetch).
  agree = float(jnp.mean(
      jnp.nan_to_num(flow_f32[0]) == jnp.nan_to_num(flow_b16[0])))
  results['flow_bf16_peak_agreement'] = round(agree, 5)
  if agree >= 0.999:
    flow, t_flow = flow_b16, t_flow_b16
    results['flow_mode'] = 'circular_dft_bf16'
  else:
    flow, t_flow = flow_f32, t_flow_f32
    results['flow_mode'] = 'circular_dft'
  results['flow_s_f32'] = round(t_flow_f32, 3)
  med_x = float(jnp.nanmedian(flow[0]))
  med_y = float(jnp.nanmedian(flow[1]))
  results['flow_s'] = round(t_flow, 3)
  results['flow_patches'] = int(np.prod(grid))
  results['flow_median_xy'] = [med_x, med_y]

  # MASKED flow (the production EM regime): Padfield NCC with a
  # realistic tissue mask (diagonal crack band + a blob, ~17% invalid),
  # fused in the same grid kernel.
  yy, xx = np.mgrid[:n, :n]
  mask_np = (((yy + xx) % 7919 < 900)
             | (((yy - 3000)**2 + (xx - 7000)**2) < 1500**2))
  mask = jax.device_put(mask_np)
  del yy, xx

  def run_flow_masked(bf16):
    return flow_field.dense_flow_field(
        pre, post, (patch, patch), (stride, stride), batch_size=256,
        circular=True, dft_matmul=True, bf16=bf16,
        pre_mask=mask, post_mask=mask)

  # bf16 image-term split in the masked NCC kernel (mask/overlap chain
  # stays f32), gated on integer-peak agreement with the full-f32 run.
  flow_m32, t_flow_m32, _sp = _time(lambda: run_flow_masked(False))
  flow_m16, t_flow_m16, _sp = _time(lambda: run_flow_masked(True))
  agree_m = float(jnp.mean(
      jnp.nan_to_num(flow_m32[0], nan=9e9)
      == jnp.nan_to_num(flow_m16[0], nan=9e9)))
  results['flow_masked_bf16_peak_agreement'] = round(agree_m, 5)
  results['flow_masked_s_f32'] = round(t_flow_m32, 3)
  if agree_m >= 0.9995:
    flow_m, t_flow_m = flow_m16, t_flow_m16
    results['flow_masked_mode'] = 'bf16_split'
  else:
    flow_m, t_flow_m = flow_m32, t_flow_m32
    results['flow_masked_mode'] = 'f32'
  results['flow_masked_s'] = round(t_flow_m, 3)
  results['flow_masked_valid_frac'] = round(
      float(jnp.mean(jnp.isfinite(flow_m[0]))), 3)

  # ---- WARP: Lanczos4 render of the full section under a SMOOTH map. -----
  _progress('stage warp ...')
  # Inverse map: the +(7,-12) roll undone, plus a smooth sinusoidal
  # deformation with 12 px amplitude (a realistic alignment field).
  grid_n = n // stride
  my, mx = np.mgrid[:grid_n, :grid_n].astype(np.float32)
  amp = 12.0
  wav = 2000.0 / stride
  dx = -12.0 + amp * np.sin(2 * np.pi * my / wav)
  dy = 7.0 + amp * np.cos(2 * np.pi * mx / wav)
  abs_map = np.zeros((1, 2, grid_n, grid_n), np.float32)
  abs_map[:, 0] = dx + mx * stride
  abs_map[:, 1] = dy + my * stride

  images = post[None, None]  # [z=1, c=1, y, x]

  from sofima_tpu.ops import interp, pallas_warp, shift_warp
  bounds = shift_warp.displacement_bounds(abs_map[0], None, stride)
  results['warp_bounds'] = list(bounds)

  abs_map_j = jax.device_put(abs_map[0])

  # Mirror warp_subvolume's path selection: prefer the per-tile-base
  # tiled kernel when it shrinks the shift lattice >1.5x.
  node_pos = np.arange(grid_n, dtype=np.float64) * stride
  plan = shift_warp.tiled_shift_plan(dy[None], dx[None], node_pos,
                                     node_pos, (n, n))
  taps = 8  # lanczos
  dy_lo, dy_hi, dx_lo, dx_hi = bounds
  global_iters = (dy_hi - dy_lo + taps) * (dx_hi - dx_lo + taps)
  use_tiled = False
  bases_j = None
  if plan is not None:
    ry_lo, ry_hi, rx_lo, rx_hi = plan['residual_bounds']
    tiled_iters = (ry_hi - ry_lo + taps) * (rx_hi - rx_lo + taps)
    use_tiled = 1.5 * tiled_iters < global_iters
    bases_j = jax.device_put(plan['bases'])
  results['warp_mode'] = 'tiled' if use_tiled else 'global'
  if use_tiled:
    results['warp_residual_bounds'] = list(plan['residual_bounds'])

  n_strips = 4
  h = n // n_strips

  def run_warp():
    if use_tiled:
      dense = interp.upsample_map_linear(abs_map_j, stride, (0, 0),
                                         (n, n))
      coords = jnp.stack([dense[1], dense[0]])[None]
      # tile_bounds pruning measured SLOWER on v5e (pl.when region
      # overhead beats the skipped work) — plain lattice is the fast path.
      return pallas_warp.pallas_shift_warp_tiled(
          post[None], coords, bases_j, 'lanczos',
          *plan['residual_bounds'], *plan['base_bounds'], *plan['tile'])
    outs = []
    for i in range(n_strips):
      dense = interp.upsample_map_linear(
          abs_map_j, stride, (i * h, 0), (h, n))
      coords = jnp.stack([dense[1], dense[0]])[None]
      outs.append(pallas_warp.warp_sections_pallas_coords(
          images, coords, 'lanczos', bounds, origin=(i * h, 0)))
    return outs

  warped, t_warp, _sp = _time(run_warp)
  # Validation: an independent sampler (gather path) on a small block.
  vy, vx = h + 256, 1024
  dense_v = interp.upsample_map_linear(abs_map_j, stride, (vy, vx),
                                       (128, 128))
  coords_v = jnp.stack([dense_v[1], dense_v[0]])
  ref_block = interp.sample(post, coords_v, method='lanczos',
                            mode='constant', cval=0.0)
  if use_tiled:
    got_block = warped[0, vy:vy + 128, vx:vx + 128]
  else:
    got_block = warped[1][0, 0, vy - h:vy - h + 128, vx:vx + 128]
  err = float(jnp.nanmean(jnp.abs(got_block - ref_block)))
  results['warp_s'] = round(t_warp, 3)
  results['warp_vs_gather_err'] = round(err, 4)

  # Conservative composition: dense-grid flow + exact render, timed as
  # separate dispatches (the round-1..4 "combined" metric; kept for
  # regression tracking). The HEADLINE combined metric is the fused
  # production chain measured below (combined_mpix_s) — see BASELINE.md
  # "Metric decision".
  mpix_s = (n * n) / (t_flow + t_warp) / 1e6
  results['combined_dense_mpix_s'] = round(mpix_s, 1)

  # Separable two-pass render (round 4): same plan, O(rx + ry) weight
  # evals per pixel instead of O(ry * rx); approximate for dx varying
  # along y (first-order-corrected attribution) — gated below on mean
  # agreement with the exact kernel.
  if use_tiled:
    def run_warp_2p():
      dense = interp.upsample_map_linear(abs_map_j, stride, (0, 0),
                                         (n, n))
      coords = jnp.stack([dense[1], dense[0]])[None]
      return pallas_warp.pallas_shift_warp_tiled(
          post[None], coords, bases_j, 'lanczos',
          *plan['residual_bounds'], *plan['base_bounds'], *plan['tile'],
          two_pass=True)

    warped_2p, t_warp_2p, _sp = _time(run_warp_2p)
    inter_w = np.s_[64:-64, 64:-64]
    d2p = jnp.abs(warped_2p[0][inter_w] - warped[0][inter_w])
    results['warp_two_pass_s'] = round(t_warp_2p, 3)
    results['warp_two_pass_mean_diff'] = round(float(jnp.mean(d2p)), 4)
    results['warp_two_pass_max_diff'] = round(float(jnp.max(d2p)), 3)
    results['combined_dense_two_pass_mpix_s'] = round(
        (n * n) / (t_flow + t_warp_2p) / 1e6, 1)
    del warped_2p, d2p

  # ---- COMBINED (headline): fused single-pair flow+warp chain. -----------
  # The production shape of "combined flow+warp on one 10k^2 pair": ONE
  # jit program runs coarse-to-fine flow -> clean -> harmonic fill ->
  # device tiled plan -> separable two-pass Lanczos render — i.e. the
  # EstimateFlow -> WarpByMap chain with the flow-negation inverse-map
  # approximation in place of a mesh solve (2nd-order exact for smooth
  # fields; the pipeline stage below covers the exact solver+inversion
  # path). The pair is (pre, warped): `warped` is post resampled under
  # the smooth 12 px sinusoidal field, so the TRUE pre->warped flow is
  # that sinusoid — the chain must measure it and render `warped` back
  # onto `pre`, which gives a hard ground-truth quality gate.
  def stage_combined_fused():
    from sofima_tpu import flow_utils
    from sofima_tpu.ops import fill as fill_ops
    warped_img = (warped[0] if use_tiled else
                  jnp.concatenate([w[0, 0] for w in warped], axis=0))
    res_c = 8
    node_np = np.arange(grid_n, dtype=np.float64) * stride
    pad = patch // 2 // stride

    @jax.jit
    def combined(a, b):
      f4, ov1 = flow_field.coarse_to_fine_flow(
          a, b, (patch, patch), (stride, stride), bf16=True,
          max_displacement=64, residual=res_c, peak_crop=32,
          return_overflow=True)
      clean = flow_utils.clean_flow_device(f4[:, None], 1.6, 1.6, 80.0,
                                           20.0)
      gfull = jnp.full((2, 1, grid_n, grid_n), jnp.nan, jnp.float32)
      gfull = jax.lax.dynamic_update_slice(gfull, clean, (0, 0, pad, pad))
      valid = jnp.isfinite(gfull[0, 0]) & jnp.isfinite(gfull[1, 0])
      grel = fill_ops.fill_invalid(gfull[:, 0], valid, extrapolate=True)
      inv_y = -grel[1]
      inv_x = -grel[0]
      env_r = (-res_c, res_c, -res_c, res_c)
      env_b = (-64, 64, -64, 64)
      dplan = shift_warp.tiled_plan_device(
          inv_y[None], inv_x[None], node_np, node_np, (n, n), env_r,
          env_b)
      node = jnp.arange(grid_n, dtype=jnp.float32) * stride
      dense = interp.upsample_map_linear(
          jnp.stack([inv_y + node[:, None], inv_x + node[None, :]]),
          stride, (0, 0), (n, n))
      rendered = pallas_warp.pallas_shift_warp_tiled(
          b[None], dense[None], dplan['bases'], 'lanczos',
          *env_r, *env_b, *dplan['tile'], two_pass=True)[0]
      return rendered, ov1 | dplan['overflow']

    (rend_c, ovf_c), t_cf, sp_cf = _time(
        lambda: combined(pre, warped_img))
    inter_c = np.s_[256:-256, 256:-256]
    err_c = float(jnp.mean(jnp.abs(rend_c[inter_c] - pre[inter_c])))
    results['combined_s'] = round(t_cf, 3)
    results['combined_spread_s'] = round(sp_cf, 3)
    results['combined_mpix_s'] = round((n * n) / t_cf / 1e6, 1)
    results['combined_err'] = round(err_c, 3)
    results['combined_overflow'] = bool(ovf_c)

  _guard(results, 'combined', stage_combined_fused)

  # ---- 3D RENDER: shift-decomposed trilinear warp (StitchAndRender path).
  _progress('stage warp3d ...')
  vol = jax.device_put(rng.rand(64, 1024, 1024).astype(np.float32))
  zz, yy, xx = np.mgrid[0:64, 0:1024, 0:1024].astype(np.float32)
  c3 = np.stack([
      zz + 2.0 * np.sin(2 * np.pi * yy / 512),
      yy + 6.0 * np.cos(2 * np.pi * xx / 512),
      xx + 6.0 * np.sin(2 * np.pi * zz / 64),
  ])
  coords3 = jax.device_put(c3)
  del zz, yy, xx, c3

  def run_warp3d():
    # VMEM-tile Pallas kernel — the 3d path ndimage_warp /
    # StitchAndRender3dTiles ride on TPU.
    return pallas_warp.pallas_shift_warp_3d(vol, coords3, 'linear',
                                            -4, 4, -8, 8, -8, 8)

  _, t_w3, _sp = _time(run_warp3d)
  results['warp3d_s'] = round(t_w3, 3)
  results['warp3d_mvox_s'] = round(64 * 1024 * 1024 / t_w3 / 1e6, 1)

  # ---- FLOW 3D: LICONN fine-stitching overlap pair. ----------------------
  # Circular strip path (one device program, gather-free patch assembly)
  # vs the scattered-start padfield driver on a tile-overlap-sized crop.
  def stage_flow3d():
    # 64 z-planes of EM-like texture (staggered crops of the section).
    vol3a = jax.device_put(np.ascontiguousarray(
        np.stack([pre_np[i * 7:i * 7 + 480, :160]
                  for i in range(64)])).astype(np.float32))
    vol3b = jnp.roll(vol3a, (2, -3, 4), (0, 1, 2))
    patch3, step3 = (40, 80, 80), (8, 40, 40)

    def run_flow3d():
      return flow_field.dense_flow_field(vol3a, vol3b, patch3, step3,
                                         circular=True)

    f3, t_f3, _sp = _time(run_flow3d)
    results['flow3d_s'] = round(t_f3, 3)
    results['flow3d_grid'] = list(int(v) for v in f3.shape[1:])
    mfc3 = flow_field.JAXMaskedXCorrWithStatsCalculator()
    # Median of 3 with spread: 3.198 s (r3) vs 15.848 s (r4) on single
    # shots — the host-batched driver d2h-syncs per batch, the shape
    # most exposed to relay contention (VERDICT r4 item 4).
    vol3a_np, vol3b_np = np.asarray(vol3a), np.asarray(vol3b)
    t3_ref_all = []
    for _ in range(3):
      t0 = time.perf_counter()
      f3_ref = mfc3.flow_field(vol3a_np, vol3b_np, patch_size=patch3,
                               step=step3, batch_size=32)
      t3_ref_all.append(time.perf_counter() - t0)
    t3_ref_all.sort()
    results['flow3d_padfield_s'] = round(t3_ref_all[1], 3)
    results['flow3d_padfield_spread_s'] = round(
        t3_ref_all[-1] - t3_ref_all[0], 3)
    agree3 = float(np.mean(
        np.nan_to_num(np.asarray(f3)[:3], nan=9e9)
        == np.nan_to_num(f3_ref[:3], nan=9e9)))
    results['flow3d_peak_agreement'] = round(agree3, 5)

    # MASKED 3d flow (the LICONN production regime): the dim-generic
    # circular Padfield NCC on the same strip path — previously a
    # NotImplementedError cliff onto the 3.2 s padfield driver.
    mask3_np = np.zeros((64, 480, 160), bool)
    mask3_np[:, 0:480:7, :] = True  # ~14% invalid, striped
    mask3 = jax.device_put(mask3_np)

    def run_flow3d_masked():
      return flow_field.dense_flow_field(vol3a, vol3b, patch3, step3,
                                         circular=True, pre_mask=mask3,
                                         post_mask=mask3)

    f3m, t_f3m, _sp = _time(run_flow3d_masked)
    results['flow3d_masked_s'] = round(t_f3m, 3)
    results['flow3d_masked_valid_frac'] = round(
        float(jnp.mean(jnp.isfinite(f3m[0]))), 3)

  _guard(results, 'flow3d', stage_flow3d)

  # ---- PIPELINE: streamed z-stack alignment. -----------------------------
  _progress('stage pipeline ...')
  # The production metric: 16 sections of 10k^2 streamed through the
  # FUSED per-section chain (coarse-to-fine flow -> clean -> mesh solve
  # -> invert -> Lanczos render; pipeline.stack_align.align_step, one
  # jit program per section, zero host round trips). Sections are
  # generated on device from the base texture with known smooth
  # deformations (cumulative drift + wobble), so alignment quality is
  # gated against ground truth below.
  from sofima_tpu.pipeline import stack_align
  from sofima_tpu.ops import shift_warp as shift_warp_ops

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
    stack_list.append(
        make_section(jax.device_put(np.stack([dyz, dxz]))))

  # Config chosen by the round-4 hardware ablations (docs/ROADMAP.md
  # round-4 tables): residual=6 shrinks the render lattice
  # ((2*residual + taps)^2 per pixel) for +6% at unchanged ground-truth
  # error; num_iters=125 solve chunks let the on-device while_loop exit
  # at the first converged boundary (+1% over 500 at 250, +0.3% more at
  # 125 — scratch/ablate_r4l.json: 1002.5 Mpix/s, identical error, no
  # overflow); the solve runs the NO-RAMP protocol (start_cap =
  # final_cap = 10, the StackAlignConfig default; halves the solve
  # phase at 0.03 px node delta — scratch/ablate_solve_cap.py) and the
  # invert runs fp12/n2 (1.8x faster invert phase at 0.002 px delta —
  # scratch/ablate_invert_iters.py); render_two_pass runs the separable O(rx + ry) render
  # kernel (+18%, ground-truth error identical at 3.113 — the separable
  # approximation is invisible next to the flow/solve error budget);
  # fine_patch=64 measured NO speedup (the fine-pass window DMA + peak
  # chain, not the O(edge^3) correlation, bounds the targeted kernel at
  # this size) and worse error (3.11 -> 3.45), so it stays off;
  # fine_patch=48 broke the 3.5 quality gate (4.11); peak_crop=32
  # (fine peak search restricted to the centered 32^2 correlation core
  # via pre-sliced inverse-DFT matrices) measured +0.9% with identical
  # error (scratch/ablate_r4d.py) — the fine peak chain is a minor
  # cost at this geometry, but the crop is free and sound while the
  # coarse prior bounds the fine residual (residual=6 << crop/2);
  # warm_start stays OFF for the headline: once the segmented x-DFT
  # made the coarse pass cheap, warm-start's sequential fine chain
  # (fine(z) waits on clean(z-1)) lost to the fully z-batched cold
  # passes — 784.5 (cold) vs 711.0 (warm) Mpix/s, scratch/ablate_r4g
  # .json; warm keeps slightly better error (2.98 vs 3.11, both far
  # inside the 3.5 gate) and remains the right mode for streamed
  # arrival (align_step covers that path below).
  import dataclasses as _dc_cfg
  pcfg = stack_align.StackAlignConfig(max_displacement=128, residual=6,
                                      render_two_pass=True,
                                      peak_crop=32, warm_start=False)
  pcfg = _dc_cfg.replace(pcfg, mesh=_dc_cfg.replace(pcfg.mesh,
                                                    num_iters=125))
  grid_nn = n // pcfg.stride
  stack_j = jnp.stack(stack_list)
  # Free every large device buffer except the stack itself — the
  # whole-stack program needs the HBM headroom (leftover stage buffers
  # alone were enough to OOM the 16x10k^2 run; make_section's jit
  # closure pins base_u8 until the function is dropped and caches
  # cleared — compiled programs reload from the persistent disk cache).
  del stack_list, base_u8, pre, post, images, warped, vol, coords3
  del flow, flow_m, flow_m32, flow_m16, mask
  del flow_f32, flow_b16, abs_map_j, bases_j, make_section
  jax.clear_caches()
  inter = np.s_[320:-320, 320:-320]

  def run_pipeline():
    rendered, _, overflow = stack_align.align_stack_pipelined(
        stack_j, pcfg, out_dtype=jnp.uint8)

    # Per-section stats WITHOUT materializing an f32 render stack
    # (15 x 400 MB of f32 sections OOM'd the ablation runs): lax.map
    # keeps one f32 section transient at a time.
    def stats_one(r_u8):
      r = r_u8.astype(jnp.float32)
      base_i = stack_j[0][inter].astype(jnp.float32)
      return (jnp.sum(r[::97, ::97]),
              jnp.mean(jnp.abs(r[inter] - base_i)))

    sums, errs = jax.lax.map(stats_one, rendered[1:])
    return jnp.sum(sums), jnp.max(errs), overflow

  acc, err_acc, overflow = run_pipeline()  # compile + warmup
  float(acc)
  times = []
  for _ in range(3):
    t0 = time.perf_counter()
    acc, err_acc, overflow = run_pipeline()
    float(acc)  # single d2h barrier ends the timed region
    times.append(time.perf_counter() - t0)
  t_pipe = sorted(times)[1]  # median of 3: the relay shows run-to-run
  # contention on long multi-dispatch programs (8.9 vs 20 s in r3)
  pipe_mpix = (n_z - 1) * n * n / t_pipe / 1e6
  results['pipeline_s'] = round(t_pipe, 3)
  results['pipeline_times_s'] = [round(t, 3) for t in times]
  results['pipeline_sections'] = n_z - 1
  results['pipeline_mpix_s'] = round(pipe_mpix, 1)
  results['pipeline_overflow'] = bool(overflow)
  # Quality: worst per-section mean |rendered - base| over the interior;
  # raw (unaligned) neighbors differ by ~20+ gray levels at this drift.
  results['pipeline_max_err'] = round(float(err_acc), 2)
  raw_err = float(jnp.mean(jnp.abs(
      stack_j[n_z - 1][inter].astype(jnp.float32)
      - stack_j[0][inter].astype(jnp.float32))))
  results['pipeline_raw_err'] = round(raw_err, 2)

  # Streamed per-section variant (the incremental-arrival mode) for
  # regression tracking of the align_step path.
  def stage_pipeline_stepwise():
    pcfg_s = stack_align.StackAlignConfig(max_displacement=128,
                                          residual=8)
    solved0 = jnp.zeros((2, 1, grid_nn, grid_nn), jnp.float32)

    def run_stepwise():
      solved_z = solved0
      acc = jnp.float32(0.0)
      ovf = jnp.bool_(False)
      for z in range(1, n_z):
        solved_z, rendered_z, ov = stack_align.align_step(
            stack_j[z - 1], stack_j[z], solved_z, pcfg_s)
        acc = acc + jnp.sum(rendered_z[::97, ::97])
        ovf = jnp.logical_or(ovf, ov)
      return acc, ovf

    acc_s, _ = run_stepwise()
    float(acc_s)
    ts = []
    for _ in range(3):
      t0 = time.perf_counter()
      acc_s, _ = run_stepwise()
      float(acc_s)
      ts.append(time.perf_counter() - t0)
    results['pipeline_stepwise_s'] = round(sorted(ts)[1], 3)
    results['pipeline_stepwise_mpix_s'] = round(
        (n_z - 1) * n * n / sorted(ts)[1] / 1e6, 1)

  _guard(results, 'pipeline_stepwise', stage_pipeline_stepwise)

  # Envelope-relaxed variant (informational): residual=4 + 250-iter
  # solve chunks runs ~9% faster at IDENTICAL interior error, but its
  # tiled-render plan flags envelope overflow on a few border tiles
  # (their extreme pixels render as zeros outside the measured
  # interior), so it stays off the gated headline.
  def stage_pipeline_tight():
    import dataclasses as _dc
    cfg_t = stack_align.StackAlignConfig(
        max_displacement=128, residual=4,
        mesh=_dc.replace(stack_align.StackAlignConfig().mesh,
                         num_iters=250))

    def run_tight():
      rendered, _, ovf = stack_align.align_stack_pipelined(
          stack_j, cfg_t, out_dtype=jnp.uint8)

      def stats_one(r_u8):
        r = r_u8.astype(jnp.float32)
        base_i = stack_j[0][inter].astype(jnp.float32)
        return (jnp.sum(r[::97, ::97]),
                jnp.mean(jnp.abs(r[inter] - base_i)))

      sums, errs = jax.lax.map(stats_one, rendered[1:])
      return jnp.sum(sums), jnp.max(errs), ovf

    acc_t, err_t, ovf_t = run_tight()
    float(acc_t)
    ts = []
    for _ in range(3):
      t0 = time.perf_counter()
      acc_t, err_t, ovf_t = run_tight()
      float(acc_t)
      ts.append(time.perf_counter() - t0)
    t_med = sorted(ts)[1]
    results['pipeline_tight_mpix_s'] = round(
        (n_z - 1) * n * n / t_med / 1e6, 1)
    results['pipeline_tight_max_err'] = round(float(err_t), 2)
    results['pipeline_tight_overflow'] = bool(ovf_t)

  _guard(results, 'pipeline_tight', stage_pipeline_tight)

  # ---- ESTIMATE MISSING FLOW: host-orchestrated retry stage. -------------
  _progress('stage estimate_missing_flow ...')
  # Small scale: the stage is host-loop + relay-latency bound in this dev
  # harness (production runs on a TPU-adjacent host); tracked for
  # regressions only.
  from sofima_tpu.processor import flow as flow_proc
  from sofima_tpu.processor.defaults import em_2d
  from sofima_tpu.utils.volume import InMemoryVolume
  from sofima_tpu.utils.bounding_box import BoundingBox
  from sofima_tpu.utils.subvolume import Subvolume
  import dataclasses as _dc

  tex_s = pre_np[:1200, :1200]
  stack = np.stack([tex_s, np.full_like(tex_s, 128.0),
                    np.roll(tex_s, 5, axis=1)])
  cfg = em_2d.estimate_missing_flow_config({
      'patch_size': 160, 'stride': 40, 'batch_size': 512,
      'max_delta_z': 2})
  cfg = _dc.replace(cfg, image_volinfo=InMemoryVolume(
      stack[None], fill_value=0.0), image_cache_bytes=1 << 28)
  proc = flow_proc.EstimateMissingFlow(cfg)
  g = 1200 // 40
  flow_in = np.full((2, 1, g, g), np.nan, np.float32)
  sv = Subvolume(flow_in.copy(), BoundingBox(start=(0, 0, 2),
                                             size=(g, g, 1)))
  proc.process(sv)  # warmup (compiles)
  # Median of 3 with spread: this host-orchestrated stage timed 0.342 s
  # in r3 and 1.298 s in r4 on single shots — relay contention, exactly
  # the ambiguity median-of-N resolves (VERDICT r4 item 4).
  t_missing_all = []
  for _ in range(3):
    t0 = time.perf_counter()
    out_missing = proc.process(Subvolume(flow_in.copy(),
                                         BoundingBox(start=(0, 0, 2),
                                                     size=(g, g, 1))))
    t_missing_all.append(time.perf_counter() - t0)
  t_missing_all.sort()
  results['estimate_missing_flow_s'] = round(t_missing_all[1], 3)
  results['estimate_missing_flow_spread_s'] = round(
      t_missing_all[-1] - t_missing_all[0], 3)
  results['estimate_missing_filled'] = int(
      np.isfinite(out_missing.data[0]).sum())

  # ---- MONTAGE 2D (BASELINE scenario 2): 3x3 tile grid, end-to-end. ------
  # The flagship 2d montage workflow (SURVEY §3.4 / em_stitching):
  # coarse whole-overlap offsets -> tile-level placement solve -> fine
  # overlap flow -> joint elastic solve -> render. Device-resident
  # chain (pipeline.montage): tiles live in HBM (device_put outside the
  # timed loop, like the pipeline stage's stack), the canvas never
  # leaves the device, and the only per-run d2h is stats/meshes. The
  # host-orchestrated chain (stitch_rigid/warp.render_tiles) is
  # correctness-covered in tests; on a relay-attached TPU its per-probe
  # transfers dominate (measured 225 s/run warm — scratch/
  # probe_scenarios_r5.py — vs the device chain below).
  # Median-of-3 of the COMPLETE chain, gated on montage-vs-source error.
  def stage_montage2d():
    from sofima_tpu.pipeline import montage
    grid_t, tile_t, overlap_t = 3, 3600, 400
    step_t = tile_t - overlap_t
    n_m = step_t * (grid_t - 1) + tile_t  # 10000
    img_m = pre_np[:n_m, :n_m]
    tiles = {}
    for ty in range(grid_t):
      for tx in range(grid_t):
        tiles[(tx, ty)] = jax.device_put(
            img_m[ty * step_t:ty * step_t + tile_t,
                  tx * step_t:tx * step_t + tile_t])
    cfg_mont = montage.MontageConfig(
        stride=40, patch_size=160, coarse_overlaps=(360, 440),
        min_overlap=200, margin=16, flow_batch=256,
        mesh_cfg=mesh.IntegrationConfig(
            dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=(40.0, 40.0),
            num_iters=1000, max_iters=20000, stop_v_max=0.005,
            dt_max=100.0))

    def run_montage():
      out = montage.montage_align_2d(tiles, (grid_t, grid_t), cfg_mont)
      # Barrier: reduced scalar fetch (block_until_ready returns before
      # remote execution completes on this relay — ROADMAP).
      out['checksum'] = float(jnp.sum(out['canvas']))
      return out

    run_montage()  # warmup (compiles)
    tms, out = [], None
    for _ in range(3):
      t0 = time.perf_counter()
      out = run_montage()
      tms.append(time.perf_counter() - t0)
    tms.sort()
    t_m = tms[1]
    solved, key_to_idx = out['solved'], out['key_to_idx']
    # Compare modulo the solver's global-translation gauge. Quality is
    # DEVICE-reduced (the relay's bulk d2h runs at ~1 MB/s; fetching the
    # 400 MB canvas would take minutes — scratch/probe_warp3d_run.py).
    sx = int(round(solved[0, key_to_idx[(0, 0)], 0, 0]))
    sy = int(round(solved[1, key_to_idx[(0, 0)], 0, 0]))
    lo, hi = tile_t // 4, n_m - tile_t // 4
    truth_m = jax.device_put(img_m[lo:hi, lo:hi].astype(np.float32))

    @jax.jit
    def montage_quality(canvas, mask_r, truth):
      c = jax.lax.dynamic_slice(canvas, (lo + sy, lo + sx), truth.shape)
      m_ = jax.lax.dynamic_slice(mask_r, (lo + sy, lo + sx), truth.shape)
      err = jnp.sum(jnp.where(m_, jnp.abs(c - truth), 0.0))
      cnt = jnp.sum(m_)
      return err / jnp.maximum(cnt, 1), cnt / truth.size

    err_m, cov_m = montage_quality(out['canvas'], out['mask'], truth_m)
    results['montage2d_s'] = round(t_m, 3)
    results['montage2d_spread_s'] = round(tms[-1] - tms[0], 3)
    results['montage2d_mpix_s'] = round(n_m * n_m / t_m / 1e6, 1)
    results['montage2d_err'] = round(float(err_m), 3)
    results['montage2d_coverage'] = round(float(cov_m), 4)
    results['montage2d_overflow'] = bool(out['overflow'])

  _guard(results, 'montage2d', stage_montage2d)

  # ---- STITCH 3D (BASELINE scenario 4): 2x2 LICONN tile grid. ------------
  # Volumetric tile stitching end-to-end: fine 3d overlap flow (circular
  # strip kernel, strips upload h2d) -> joint 3d elastic solve
  # (26-neighbor stencil) -> distance-weighted blended render, fully
  # device-resident (pipeline.stitch3d; the host StitchAndRender3dTiles
  # twin is correctness-covered in tests/test_stitching3d.py — its
  # per-work-box host round trips dominate on a relay-attached TPU).
  # Median-of-3 of the complete chain, gated on montage-vs-source
  # relative error, quality DEVICE-reduced.
  def stage_stitch3d():
    from sofima_tpu.pipeline import stitch3d

    zdim, tile_yx, overlap3 = 64, 576, 64
    step3t = tile_yx - overlap3  # 512
    n3 = step3t + tile_yx  # 1088
    # Band-limited 3d texture (separable-ish filtering via FFT).
    rng3 = np.random.RandomState(9)
    noise3 = rng3.rand(zdim, n3, n3).astype(np.float32)
    f3d = np.fft.rfftn(noise3)
    fz = np.fft.fftfreq(zdim)[:, None, None]
    fy3 = np.fft.fftfreq(n3)[None, :, None]
    fx3 = np.fft.rfftfreq(n3)[None, None, :]
    f3d *= np.exp(-((fx3**2 + fy3**2 + fz**2) / (2 * 0.12**2)))
    vol3 = np.fft.irfftn(f3d, s=(zdim, n3, n3)).astype(np.float32)
    vol3 = (vol3 - vol3.min()) / np.ptp(vol3) * 255.0
    del noise3, f3d

    tiles3 = {}
    for ty in range(2):
      for tx in range(2):
        tiles3[(tx, ty)] = np.ascontiguousarray(
            vol3[:, ty * step3t:ty * step3t + tile_yx,
                 tx * step3t:tx * step3t + tile_yx])
    dev_tiles3 = {k: jax.device_put(v) for k, v in tiles3.items()}
    stride3 = (16, 16, 16)
    cfg_s3 = stitch3d.Stitch3dConfig(
        stride=stride3, patch_size=(32, 32, 32), flow_batch=64, margin=8,
        mesh_cfg=mesh.IntegrationConfig(
            dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=stride3,
            num_iters=400, max_iters=10000, stop_v_max=0.005,
            dt_max=100.0))

    # Coarse offsets (xyz channels): x-pairs overlap by `overlap3` in
    # x, y-pairs in y; unused pair slots stay NaN.
    cx3 = np.full((3, 1, 2, 2), np.nan)
    cx3[0, 0, :, 0] = -overlap3
    cx3[1, 0, :, 0] = 0.0
    cx3[2, 0, :, 0] = 0.0
    cy3 = np.full((3, 1, 2, 2), np.nan)
    cy3[0, 0, 0, :] = 0.0
    cy3[1, 0, 0, :] = -overlap3
    cy3[2, 0, 0, :] = 0.0
    coarse3 = np.zeros((3, 1, 2, 2), np.float32)
    for ty in range(2):
      for tx in range(2):
        coarse3[0, 0, ty, tx] = -overlap3 * tx
        coarse3[1, 0, ty, tx] = -overlap3 * ty

    def run_stitch3d():
      out = stitch3d.stitch_and_render_3d(tiles3, cx3, cy3, coarse3,
                                          cfg_s3, device_tiles=dev_tiles3)
      # Barrier: reduced scalar fetch (block_until_ready returns before
      # remote execution completes on this relay).
      out['checksum'] = float(jnp.sum(out['canvas']))
      return out

    run_stitch3d()  # warmup (compiles)
    t3s, out3 = [], None
    for _ in range(3):
      t0 = time.perf_counter()
      out3 = run_stitch3d()
      t3s.append(time.perf_counter() - t0)
    t3s.sort()
    t_s3 = t3s[1]

    # Quality, device-reduced: the canvas reproduces the source volume
    # over the covered interior (z/y/x borders trimmed one overlap).
    lo_z, lo_yx = 8, 16
    truth3 = jax.device_put(
        vol3[lo_z:zdim - lo_z, lo_yx:n3 - lo_yx, lo_yx:n3 - lo_yx])

    @jax.jit
    def stitch3d_quality(canvas, weights, truth):
      c = canvas[lo_z:zdim - lo_z, lo_yx:n3 - lo_yx, lo_yx:n3 - lo_yx]
      w = weights[lo_z:zdim - lo_z, lo_yx:n3 - lo_yx, lo_yx:n3 - lo_yx]
      m = w > 0
      err = jnp.sum(jnp.where(m, jnp.abs(c - truth), 0.0))
      cnt = jnp.sum(m)
      return (err / jnp.maximum(cnt, 1) / jnp.std(truth),
              cnt / truth.size)

    rel3, cov3 = stitch3d_quality(out3['canvas'], out3['weights'], truth3)
    n_out_vox = zdim * n3 * n3  # the stitched union volume
    results['stitch3d_s'] = round(t_s3, 3)
    results['stitch3d_spread_s'] = round(t3s[-1] - t3s[0], 3)
    results['stitch3d_mvox_s'] = round(n_out_vox / t_s3 / 1e6, 1)
    results['stitch3d_solve_steps'] = int(out3['solve_steps'])
    results['stitch3d_rel_err'] = round(float(rel3), 4)
    results['stitch3d_coverage'] = round(float(cov3), 4)

  _guard(results, 'stitch3d', stage_stitch3d)

  # ---- MESH: relaxation throughput (GLUPS), 2048^2 grid. -----------------
  _progress('stage mesh ...')
  cfg = mesh.IntegrationConfig(
      dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=(40.0, 40.0),
      num_iters=1000, max_iters=1000, stop_v_max=0.0, dt_max=100.0)
  xm = jax.device_put(rng.randn(2, 1, 2048, 2048).astype(np.float32))
  vm = jnp.zeros_like(xm)
  prev = jnp.zeros_like(xm)

  from sofima_tpu.ops import pallas_mesh
  pallas_force = pallas_mesh.make_inplane_force(tile=256)

  def run_mesh():
    return mesh.velocity_verlet(xm, vm, prev, cfg, force_cap=1e6,
                                mesh_force=pallas_force)

  _, t_mesh, _sp = _time(run_mesh)
  glups = cfg.num_iters * 2048 * 2048 / t_mesh / 1e9
  results['mesh_glups'] = round(glups, 2)
  results['mesh_vs_gpu_baseline'] = round(glups / 2.3, 2)

  def run_mesh_xla():
    return mesh.velocity_verlet(xm, vm, prev, cfg, force_cap=1e6)

  _, t_mesh_xla, _sp = _time(run_mesh_xla)
  results['mesh_glups_xla_stencil'] = round(
      cfg.num_iters * 2048 * 2048 / t_mesh_xla / 1e9, 2)

  # prefer_orig_order (fold-preventing) variant.
  cfg_po = mesh.IntegrationConfig(
      dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=(40.0, 40.0),
      num_iters=1000, max_iters=1000, stop_v_max=0.0, dt_max=100.0,
      prefer_orig_order=True)

  def run_mesh_po():
    return mesh.velocity_verlet(xm, vm, prev, cfg_po, force_cap=1e6,
                                mesh_force=pallas_force)

  _, t_mesh_po, _sp = _time(run_mesh_po)
  results['mesh_glups_prefer_orig_order'] = round(
      cfg.num_iters * 2048 * 2048 / t_mesh_po / 1e9, 2)

  # ---- MESH 3D: volumetric 26-neighbor relaxation (LICONN solver). -------
  # z=8 x tile-32 windows: the 26-neighbor unrolled compute spills
  # registers at larger windows (z=16 x tile-128 exceeded VMEM; tile-64
  # crashed the remote compile helper).
  cfg3 = mesh.IntegrationConfig(
      dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=(40.0, 40.0, 40.0),
      num_iters=200, max_iters=200, stop_v_max=0.0, dt_max=100.0)
  x3 = jax.device_put(rng.randn(3, 8, 512, 1024).astype(np.float32))
  v3 = jnp.zeros_like(x3)
  prev3 = jnp.zeros_like(x3)
  n_nodes3 = 8 * 512 * 1024

  def stage_mesh3d_xla():
    def run_mesh3d_xla():
      return mesh.velocity_verlet(x3, v3, prev3, cfg3, force_cap=1e6,
                                  mesh_force=mesh.elastic_mesh_3d)

    _, t_mesh3x, _sp = _time(run_mesh3d_xla)
    results['mesh3d_glups_xla'] = round(
        cfg3.num_iters * n_nodes3 / t_mesh3x / 1e9, 2)

  _guard(results, 'mesh3d_xla', stage_mesh3d_xla)

  def stage_mesh3d():
    # Window-DMA slab kernel: halo rows ride the in-kernel window copy
    # (no up/dn shifted-array construction, which cost 0.71 of the
    # 2.42 ms/iter) + rsqrt force chain. 2.29 GLUPS on the full FIRE
    # Verlet loop (pure force kernel: 2.93), parity vs the XLA stencil
    # at f32 noise (~5e-6). History: 1.45 windowed tile=32 -> 1.59
    # rsqrt slab -> 1.74 (same, later relay) -> 2.29 window_dma.
    def pallas_force3(x, k, stride, prefer_orig_order=False, links=None):
      del links
      return pallas_mesh.elastic_mesh_3d_pallas_slab(
          x, k, stride, prefer_orig_order, tile_y=8, window_dma=True)

    def run_mesh3d():
      return mesh.velocity_verlet(x3, v3, prev3, cfg3, force_cap=1e6,
                                  mesh_force=pallas_force3)

    _, t_mesh3, _sp = _time(run_mesh3d)
    results['mesh3d_glups'] = round(
        cfg3.num_iters * n_nodes3 / t_mesh3 / 1e9, 2)

  _guard(results, 'mesh3d', stage_mesh3d)

  def stage_mesh3d_fused():
    # VMEM-resident fused 3d FIRE solver (whole convergence loop in one
    # kernel) on a LICONN-sized tile mesh, link-loop force body.
    cfg3f = mesh.IntegrationConfig(
        dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=(40.0, 40.0, 40.0),
        num_iters=500, max_iters=1000, stop_v_max=0.0, dt_max=100.0)
    x3f = jax.device_put(rng.randn(3, 8, 128, 256).astype(np.float32))
    prev3f = jnp.zeros_like(x3f)

    def run_mesh3d_fused():
      # link_loop: the compact per-link body is what fits the compile
      # helper at whole-mesh window sizes. symmetric: one distance
      # chain per +-link pair (Newton's third law), 13 loop trips —
      # measured +20% on hardware (0.73 vs 0.61 GLUPS,
      # scratch/probe_mesh3d_sym.py; the symmetric SLAB force kernel
      # conversely crashes the remote compile helper at every tile_y —
      # the reaction-roll accumulation pushes the unrolled body over
      # the helper's unroll x area blowup threshold). The rsqrt force
      # chain lifts this further: 0.87 GLUPS
      # (scratch/probe_mesh_rsqrt.py). guard='mask' (round 5) drops the
      # NaN guard ring whose +1 pad forced this mesh's x extent from
      # 256 to 384 (2x wasted nodes): per-link iota bounds masks
      # instead, bit-exact vs the ring, 0.89 -> 1.64 GLUPS
      # (scratch/probe_mesh3d_maskguard.py).
      return pallas_mesh.relax_mesh_fused_pallas_3d(
          x3f, prev3f, cfg3f, link_loop=True, symmetric=True,
          guard='mask')[0]

    _, t_m3f, _sp = _time(run_mesh3d_fused)
    results['mesh3d_fused_glups'] = round(
        cfg3f.max_iters * 8 * 128 * 256 / t_m3f / 1e9, 2)

  _guard(results, 'mesh3d_fused', stage_mesh3d_fused)

  # Informational-by-design flags, documented in the JSON itself so the
  # record explains its own caveats (VERDICT r4 weak item 3).
  results['pipeline_tight_note'] = (
      'residual=4 envelope-relaxed variant: faster at identical interior '
      'error but a few border tiles exceed the static envelope and '
      'render as zeros (overflow=true expected); informational only, '
      'never the headline')

  # ---- HARD QUALITY GATES: a regression exits nonzero (the numbers ----
  # above are still printed first so the record survives). New-stage
  # metrics default to FAILING values: a stage that errors out fails its
  # gates rather than silently disappearing from the record.
  gates = {
      'pipeline_max_err <= 3.5':
          results.get('pipeline_max_err', 99.0) <= 3.5,
      'pipeline_overflow == False':
          not results.get('pipeline_overflow', True),
      'flow_bf16_peak_agreement >= 0.999':
          results.get('flow_bf16_peak_agreement', 0.0) >= 0.999,
      'flow_masked_bf16_peak_agreement >= 0.999':
          results.get('flow_masked_bf16_peak_agreement', 0.0) >= 0.999,
      'flow3d_peak_agreement >= 0.999':
          results.get('flow3d_peak_agreement', 1.0) >= 0.999,
      'warp_vs_gather_err <= 1.0':
          results.get('warp_vs_gather_err', 9.9) <= 1.0,
      'flow_masked_valid_frac >= 0.5':
          results.get('flow_masked_valid_frac', 0.0) >= 0.5,
      'warp_two_pass_mean_diff <= 0.05':
          results.get('warp_two_pass_mean_diff', 0.0) <= 0.05,
      # Localized two-pass artifacts: the mean gate cannot see a small
      # region going wrong; bound the worst interior pixel too (2.85
      # measured in r4; 4.0 leaves noise margin but catches a kernel
      # regression).
      'warp_two_pass_max_diff <= 4.0':
          results.get('warp_two_pass_max_diff', 99.0) <= 4.0,
      # Fused single-pair combined chain: ground-truth render error and
      # static-envelope integrity.
      'combined_err <= 4.0':
          results.get('combined_err', 99.0) <= 4.0,
      'combined_overflow == False':
          not results.get('combined_overflow', True),
      # BASELINE scenario 2 (2d montage) and 4 (LICONN stitching).
      'montage2d_err <= 10.0':
          results.get('montage2d_err', 99.0) <= 10.0,
      'montage2d_coverage >= 0.95':
          results.get('montage2d_coverage', 0.0) >= 0.95,
      'stitch3d_rel_err <= 0.5':
          results.get('stitch3d_rel_err', 99.0) <= 0.5,
      'stitch3d_coverage >= 0.5':
          results.get('stitch3d_coverage', 0.0) >= 0.5,
  }
  failed = sorted(name for name, ok in gates.items() if not ok)
  results['gates_failed'] = failed

  combined_headline = results.get('combined_mpix_s', mpix_s)
  out = {
      'metric': ('end-to-end pipeline Mpix/s/chip '
                 '(16x 10k^2 stack: flow+clean+solve+invert+render)'),
      'value': results['pipeline_mpix_s'],
      'unit': 'Mpix/s',
      'vs_baseline': round(results['pipeline_mpix_s'] / 1000.0, 3),
      'combined_vs_baseline': round(combined_headline / 1000.0, 3),
      **results,
  }
  print(json.dumps(out))
  if failed:
    print(f'BENCH QUALITY GATES FAILED: {failed}', file=sys.stderr)
    return 1
  return 0


if __name__ == '__main__':
  sys.exit(main())
