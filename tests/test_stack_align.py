"""Device-resident stack-alignment pipeline (pipeline.stack_align)."""

import jax
import jax.numpy as jnp
import numpy as np

from sofima_tpu.ops import interp


def _texture(n, seed=0):
  rng = np.random.RandomState(seed)
  noise = rng.rand(n, n).astype(np.float32)
  f = np.fft.rfft2(noise)
  fy = np.fft.fftfreq(n)[:, None]
  fx = np.fft.rfftfreq(n)[None, :]
  f *= np.exp(-((fx**2 + fy**2) / (2 * 0.08**2)))
  tex = np.fft.irfft2(f, s=(n, n))
  tex = (tex - tex.min()) / np.ptp(tex)
  return (tex * 255).astype(np.float32)


def _make_stack(n, n_z):
  """Stack with cumulative smooth drift + deformation; returns stack."""
  base = _texture(n)
  yy, xx = np.mgrid[:n, :n].astype(np.float32)
  sections = [base]
  for z in range(1, n_z):
    # Cumulative displacement: drift + low-frequency wobble.
    dy = 3.0 * z + 4.0 * np.sin(2 * np.pi * xx / n + z)
    dx = -2.0 * z + 4.0 * np.cos(2 * np.pi * yy / n + 0.5 * z)
    coords = jnp.stack([jnp.asarray(yy + dy), jnp.asarray(xx + dx)])
    sec = interp.sample(jnp.asarray(base), coords, method='linear',
                        mode='nearest')
    sections.append(np.asarray(sec))
  return np.stack(sections).astype(np.uint8)


class TestStackAlign:

  def test_aligns_drifting_stack(self):
    from sofima_tpu.pipeline import stack_align
    n, n_z = 800, 4
    stack = _make_stack(n, n_z)
    cfg = stack_align.StackAlignConfig(max_displacement=64, residual=16)
    rendered, solved, overflow = stack_align.align_stack(stack, cfg)
    rendered = np.asarray(rendered)
    assert rendered.shape == (n_z, n, n)
    assert solved.shape[0] == n_z
    assert not bool(overflow)

    interior = np.s_[160:-160, 160:-160]
    raw = stack.astype(np.float32)
    for z in range(1, n_z):
      before = np.abs(raw[z][interior] - raw[z - 1][interior]).mean()
      after = np.abs(rendered[z][interior]
                     - rendered[z - 1][interior]).mean()
      # Aligned neighbors must be far closer than raw neighbors.
      assert after < before / 3, (z, before, after)

  def test_warm_start_matches_cold(self):
    # warm_start=True replaces pair z's coarse pass with pair z-1's
    # cleaned flow as the fine-pass targeting prior. The fine pass
    # re-measures peaks from the prior-shifted windows, so warm and
    # cold flows may differ by +-1 px at quantization-tie nodes
    # (integer-pixel flow contract; different window content resolves a
    # borderline peak either way) but never more — and alignment
    # quality must be indistinguishable.
    from sofima_tpu.pipeline import stack_align
    n, n_z = 800, 4
    stack = _make_stack(n, n_z)
    cfg = stack_align.StackAlignConfig(max_displacement=64, residual=16)
    cfg_w = stack_align.StackAlignConfig(max_displacement=64, residual=16,
                                         warm_start=True)
    grid_n = n // cfg.stride

    # Flow level: pair 1 warm-started from pair 0's cleaned flow.
    s0, s1, s2 = (jnp.asarray(stack[z].astype(np.float32))
                  for z in range(3))
    f0, _ = stack_align._flow_phase(s0, s1, cfg, grid_n)
    f1_cold, _ = stack_align._flow_phase(s1, s2, cfg, grid_n)
    f1_warm, _ = stack_align._flow_phase(s1, s2, cfg, grid_n,
                                         prior=f0[:, 0])
    d = np.abs(np.asarray(f1_warm) - np.asarray(f1_cold))
    assert np.nanmax(d) <= 1.5, np.nanmax(d)
    assert np.nanmean(d) < 0.3, np.nanmean(d)

    # End to end: the warm chain aligns the stack as well as the cold
    # one (same bar as test_aligns_drifting_stack, plus parity).
    rend_c, _, ovf_c = stack_align.align_stack(stack, cfg)
    rend_w, _, ovf_w = stack_align.align_stack(stack, cfg_w)
    assert not bool(ovf_c) and not bool(ovf_w)
    interior = np.s_[160:-160, 160:-160]
    raw = stack.astype(np.float32)
    for z in range(1, n_z):
      before = np.abs(raw[z][interior] - raw[z - 1][interior]).mean()
      a_c = np.abs(np.asarray(rend_c)[z][interior].astype(np.float32)
                   - np.asarray(rend_c)[z - 1][interior]
                   .astype(np.float32)).mean()
      a_w = np.abs(np.asarray(rend_w)[z][interior].astype(np.float32)
                   - np.asarray(rend_w)[z - 1][interior]
                   .astype(np.float32)).mean()
      assert a_w < before / 3, (z, before, a_w)
      # Quality parity: within 15% + epsilon of the cold chain.
      assert a_w < a_c * 1.15 + 0.2, (z, a_c, a_w)

  def test_warm_start_masked_matches_cold(self):
    # Round-5: warm-start priors on the MASKED path. The prior drives
    # the integer-shift transport in place of the coarse field, so a
    # masked production stream skips its coarse pass; warm and cold
    # masked flows may differ by +-1 px at quantization-tie nodes but
    # never more (same bar as the unmasked warm-start parity test).
    from sofima_tpu import flow_field
    from sofima_tpu.pipeline import stack_align
    n = 800
    stack = _make_stack(n, 3)
    mask_np = np.zeros((n, n), bool)
    mask_np[:, 330:420] = True  # vertical band, ~11% invalid
    mask = jnp.asarray(mask_np)
    cfg = stack_align.StackAlignConfig(max_displacement=64, residual=16)
    p, s = cfg.patch, cfg.stride
    grid_n = n // s
    pad = p // 2 // s

    s0, s1, s2 = (jnp.asarray(stack[z].astype(np.float32))
                  for z in range(3))
    kw = dict(patch_size=(p, p), step=(s, s), bf16=False,
              max_displacement=64, residual=16,
              pre_mask=mask, post_mask=mask)
    f0 = flow_field.coarse_to_fine_flow(s0, s1, **kw)
    f1_cold = flow_field.coarse_to_fine_flow(s1, s2, **kw)
    # Full-grid prior in the stack_align convention: node j at pixel
    # j*stride, NaN border (origin 0 <= step — the masked-path
    # constraint).
    full = jnp.full((2, grid_n, grid_n), jnp.nan, jnp.float32)
    prior = jax.lax.dynamic_update_slice(full, f0[:2], (0, pad, pad))
    f1_warm = flow_field.coarse_to_fine_flow(
        s1, s2, prior=prior, prior_step=(s, s), prior_origin=(0, 0),
        **kw)
    cold = np.asarray(f1_cold)[:2]
    warm = np.asarray(f1_warm)[:2]
    # The masked band invalidates different nodes depending on window
    # placement; compare where both measured.
    both = np.isfinite(cold[0]) & np.isfinite(warm[0])
    assert both.mean() > 0.6, both.mean()
    d = np.abs(warm[:, both] - cold[:, both])
    # Cold transports by the 160-px-granular coarse field, warm by the
    # 40-px-granular prior: the applied integer shifts differ per node,
    # so quantization ties can move +-1 px at the transport AND at the
    # re-measured peak (+-2 total at rare nodes) — never more. Nodes
    # whose true flow sits near a half-integer tie-flip by 1 px
    # routinely (integer-pixel flow contract), hence the mean bar of
    # ~half a pixel rather than the unmasked test's 0.3 (there cold and
    # warm share the same per-window transport granularity).
    assert d.max() <= 2.5, d.max()
    assert (d > 1.0).mean() < 0.05, (d > 1.0).mean()
    assert d.mean() < 0.5, d.mean()

  def test_masked_prior_origin_constraint_raises(self):
    # A masked-path prior whose grid origin exceeds its step cannot be
    # transported (the one-node extrapolation covers at most one cell).
    from sofima_tpu import flow_field
    import pytest
    n = 800
    stack = _make_stack(n, 2)
    mask = jnp.zeros((n, n), bool)
    s0, s1 = (jnp.asarray(stack[z].astype(np.float32)) for z in range(2))
    prior = jnp.zeros((2, 18, 18), jnp.float32)
    with pytest.raises(ValueError, match='origin'):
      flow_field.coarse_to_fine_flow(
          s0, s1, patch_size=(160, 160), step=(40, 40), bf16=False,
          pre_mask=mask, post_mask=mask, prior=prior,
          prior_step=(40, 40), prior_origin=(80, 80))

  def test_warm_start_stale_prior_refresh(self):
    # A section pair whose motion jumps far beyond the previous pair's
    # flow leaves the warm prior stale: the fine windows land off
    # target, peaks are mis-measured (aliased by the circular fine
    # window or killed by the clean gates). The refresh must detect
    # this and re-measure the pair with a full coarse pass, matching
    # the cold chain; with the refresh disabled the warm flow for that
    # pair must be visibly broken (the condition the detector sees).
    from sofima_tpu.pipeline import stack_align
    n = 640
    base = _texture(n)
    yy, xx = np.mgrid[:n, :n].astype(np.float32)

    def warped(dy, dx):
      coords = jnp.stack([jnp.asarray(yy + dy), jnp.asarray(xx + dx)])
      return np.asarray(interp.sample(jnp.asarray(base), coords,
                                      method='linear', mode='nearest'))

    # Pair 0: small drift. Pair 1: a 52/-48 px jump — beyond the fine
    # window's +-fp/2 = 40 px capture, so a warm prior of ~3 px leaves
    # the pair either alias-measured (smooth confident peaks wrong by
    # one 80 px window period) or clean-gated to NaN; both must trigger
    # the refresh.
    s0 = base
    s1 = warped(2.0, -3.0)
    s2 = warped(2.0 + 52.0, -3.0 - 48.0)
    stack = np.stack([s0, s1, s2]).astype(np.uint8)

    kw = dict(max_displacement=96, residual=16)
    cfg_cold = stack_align.StackAlignConfig(**kw)
    cfg_off = stack_align.StackAlignConfig(
        warm_start=True, warm_refresh_min_valid=None, **kw)
    cfg_on = stack_align.StackAlignConfig(warm_start=True, **kw)
    grid_n = n // cfg_cold.stride
    pad = cfg_cold.patch // 2 // cfg_cold.stride
    inner = np.s_[:, 0, pad:grid_n - pad, pad:grid_n - pad]

    s1j = jnp.asarray(s1.astype(np.float32))
    s2j = jnp.asarray(s2.astype(np.float32))
    f0, _ = stack_align._flow_phase(
        jnp.asarray(s0.astype(np.float32)), s1j, cfg_cold, grid_n)
    f1_cold, _ = stack_align._flow_phase(s1j, s2j, cfg_cold, grid_n)
    f1_stale, _ = stack_align._flow_phase(s1j, s2j, cfg_cold, grid_n,
                                          prior=f0[:, 0])
    cold_i = np.asarray(f1_cold)[inner]
    stale_i = np.asarray(f1_stale)[inner]
    # The stale warm flow must actually be broken (else the test proves
    # nothing): mostly invalid, or wrong by aliasing where it survived.
    stale_bad = (np.mean(np.isfinite(stale_i)) < 0.5
                 or np.nanmax(np.abs(stale_i - cold_i)) > 10.0)
    assert stale_bad, (np.mean(np.isfinite(stale_i)),
                       np.nanmax(np.abs(stale_i - cold_i)))

    # End to end: the refreshed warm chain matches the cold chain.
    rend_c, _, _ = stack_align.align_stack(stack, cfg_cold)
    rend_on, _, _ = stack_align.align_stack(stack, cfg_on)
    rend_off, _, _ = stack_align.align_stack(stack, cfg_off)
    interior = np.s_[160:-160, 160:-160]
    err = lambda r: np.abs(
        np.asarray(r)[2][interior].astype(np.float32)
        - np.asarray(r)[1][interior].astype(np.float32)).mean()
    e_cold, e_on, e_off = err(rend_c), err(rend_on), err(rend_off)
    assert e_on < e_cold * 1.15 + 0.2, (e_cold, e_on)
    # Without the refresh the jumped pair renders visibly worse.
    assert e_off > e_on * 1.5, (e_off, e_on)

  def test_identity_stack_is_stable(self):
    # No motion: the solve should stay ~zero and the render ~identity.
    from sofima_tpu.pipeline import stack_align
    n = 640
    base = _texture(n)
    stack = np.stack([base, base]).astype(np.uint8)
    cfg = stack_align.StackAlignConfig(max_displacement=64, residual=16)
    rendered, solved, overflow = stack_align.align_stack(stack, cfg)
    assert not bool(overflow)
    interior = np.s_[160:-160, 160:-160]
    err = np.abs(np.asarray(rendered)[1][interior]
                 - base[interior].astype(np.float32)).mean()
    assert err < 2.0, err
    assert float(jnp.nanmax(jnp.abs(solved[1]))) < 1.5


def _staged_step(sec_prev, sec_cur, solved_prev, n, stride=40, patch=160,
                 flow_override=None, k0=0.01):
  """One section of the STAGED archival-protocol chain.

  The reference-parity twin of align_step: padfield-oracle flow ->
  clean_flow -> relax_mesh_fused with the ARCHIVAL em_2d solver protocol
  (k0=0.01, cap escalation 0.01 -> 10, prefer_orig_order;
  /root/reference/processor/defaults/em_2d.py:137-167) -> scipy-free
  invert_map + fill_missing -> warp_subvolume. Materialized numpy
  between stages, exactly like the reference pipeline.
  """
  from sofima_tpu import flow_field, flow_utils, map_utils, mesh, warp
  from sofima_tpu.utils import BoundingBox

  mfc = flow_field.JAXMaskedXCorrWithStatsCalculator()
  flow = mfc.flow_field(np.asarray(sec_prev, np.float32),
                        np.asarray(sec_cur, np.float32),
                        patch_size=patch, step=stride, batch_size=256)
  if flow_override is not None:
    flow = flow_override(flow)
  clean = flow_utils.clean_flow(flow[:, np.newaxis], min_peak_ratio=1.6,
                                min_peak_sharpness=1.6, max_magnitude=80,
                                max_deviation=20)
  pad = patch // 2 // stride
  grid_n = n // stride
  full = np.full((2, 1, grid_n, grid_n), np.nan, np.float32)
  full[:, :, pad:pad + clean.shape[2], pad:pad + clean.shape[3]] = clean

  zero3 = np.zeros(3, np.float32)
  prev = np.asarray(map_utils.compose_maps_fast(
      jnp.asarray(full), zero3, float(stride), jnp.asarray(solved_prev),
      zero3, float(stride)))
  x0 = np.where(np.isnan(prev), solved_prev, prev)

  from sofima_tpu import mesh as mesh_lib
  cfg = mesh_lib.IntegrationConfig(
      dt=0.001, gamma=0.0, k0=k0, k=0.1, stride=(stride, stride),
      num_iters=1000, max_iters=100000, stop_v_max=0.005, dt_max=1000.0,
      start_cap=0.01, final_cap=10.0, cap_scale=1.1,
      prefer_orig_order=True)
  solved, _, _ = mesh_lib.relax_mesh_fused(
      jnp.asarray(x0), jnp.asarray(prev), cfg)
  solved = np.asarray(solved)

  box = BoundingBox(start=(0, 0, 0), size=(grid_n, grid_n, 1))
  inv = map_utils.invert_map(solved, box, box, stride)
  inv = map_utils.fill_missing(inv, extrapolate=True)
  img_box = BoundingBox(start=(0, 0, 0), size=(n, n, 1))
  rendered = warp.warp_subvolume(
      np.asarray(sec_cur, np.float32)[np.newaxis, np.newaxis], img_box,
      inv, box, stride, img_box, interpolation='lanczos')
  return solved, rendered[0, 0]


class TestFusedVsStaged:
  """The fused device chain must track the staged archival chain
  (VERDICT r3 item 6): same stack in, rendered outputs within the
  interpolation-tolerance bar. Protocol deltas are documented in
  docs/PARITY.md (no-ramp start_cap=10 vs the archival 0.01 -> 10
  escalation, coarse-to-fine flow vs padfield oracle)."""

  def test_equivalence_on_smooth_stack(self):
    from sofima_tpu.pipeline import stack_align
    n, n_z = 640, 3
    stack = _make_stack(n, n_z)
    # coarse_to_fine=False gives the fused chain the same integer flow
    # family as the padfield oracle (circular == padfield on interior
    # nodes, parity-tested), and the staged solve below uses the same
    # spring constants (k0=0.1 — the pipeline's warm-start protocol;
    # the archival em_2d k0=0.01 reaches a genuinely different fixed
    # point, a documented config delta, see docs/PARITY.md). What this
    # isolates is the IMPLEMENTATIONS: fused whole-loop solve kernel
    # (no-ramp cap 10) + device shift-lattice invert + tiled render vs
    # staged XLA relax (cap 0.01 -> 10) + host invert_map/fill_missing
    # + warp_subvolume.
    cfg = stack_align.StackAlignConfig(max_displacement=64, residual=16,
                                       coarse_to_fine=False)
    cfg_c2f = stack_align.StackAlignConfig(max_displacement=64,
                                           residual=16)

    solved_f = jnp.zeros((2, 1, n // 40, n // 40), jnp.float32)
    solved_c = jnp.zeros((2, 1, n // 40, n // 40), jnp.float32)
    solved_s = np.zeros((2, 1, n // 40, n // 40), np.float32)
    inter = np.s_[160:-160, 160:-160]
    for z in range(1, n_z):
      solved_f, rend_f, _ = stack_align.align_step(
          jnp.asarray(stack[z - 1]), jnp.asarray(stack[z]), solved_f, cfg)
      solved_c, rend_c, _ = stack_align.align_step(
          jnp.asarray(stack[z - 1]), jnp.asarray(stack[z]), solved_c,
          cfg_c2f)
      solved_s, rend_s = _staged_step(stack[z - 1], stack[z], solved_s,
                                      n, k0=0.1)
      # Interior only: at zero-context borders the padfield oracle
      # reports spurious 0-shift flows while the circular grid kernel
      # measures real flow — a documented border-behavior delta.
      nsl = np.s_[:, :, 5:-5, 5:-5]
      node_diff = np.nanmax(
          np.abs(np.asarray(solved_f)[nsl] - solved_s[nsl]))
      pix_diff = np.abs(np.asarray(rend_f)[inter] - rend_s[inter]).mean()
      # Interpolation-tolerance bar: same flows in, so interior mesh
      # nodes must land on the same solver fixed point (within the
      # stop_v_max settle) and rendered grays within ~1 level.
      assert node_diff < 0.5, (z, node_diff)
      assert pix_diff < 1.5, (z, pix_diff)
      # The production coarse-to-fine config tracks the same chain
      # within the fractional-vs-integer flow envelope.
      pix_diff_c = np.abs(
          np.asarray(rend_c)[inter] - rend_s[inter]).mean()
      assert pix_diff_c < 3.0, (z, pix_diff_c)

  def test_archival_protocol_row(self):
    # Round-5 (VERDICT r4 item 1): the ARCHIVAL preset
    # (stack_align.archival_em2d_config: k0=0.01, cap ramp 0.01 -> 10)
    # run through the FUSED chain must land on the same fixed point as
    # the staged archival chain — protocol equivalence, not just
    # implementation equivalence (the smooth test above pins k0=0.1 on
    # both sides). Measured tolerances: interior nodes settle within
    # the stop_v_max envelope (<0.5 px), rendered grays within the
    # interpolation bar (~1 level).
    from sofima_tpu.pipeline import stack_align
    n, n_z = 640, 3
    stack = _make_stack(n, n_z)
    cfg = stack_align.archival_em2d_config(max_displacement=64,
                                           residual=16,
                                           coarse_to_fine=False)
    assert cfg.mesh.k0 == 0.01 and cfg.mesh.start_cap == 0.01

    solved_f = jnp.zeros((2, 1, n // 40, n // 40), jnp.float32)
    solved_s = np.zeros((2, 1, n // 40, n // 40), np.float32)
    inter = np.s_[160:-160, 160:-160]
    for z in range(1, n_z):
      solved_f, rend_f, _ = stack_align.align_step(
          jnp.asarray(stack[z - 1]), jnp.asarray(stack[z]), solved_f, cfg)
      solved_s, rend_s = _staged_step(stack[z - 1], stack[z], solved_s,
                                      n, k0=0.01)
      nsl = np.s_[:, :, 5:-5, 5:-5]
      node_diff = np.nanmax(
          np.abs(np.asarray(solved_f)[nsl] - solved_s[nsl]))
      pix_diff = np.abs(np.asarray(rend_f)[inter] - rend_s[inter]).mean()
      assert node_diff < 0.5, (z, node_diff)
      assert pix_diff < 1.5, (z, pix_diff)

  def test_fold_and_outlier_stress(self):
    # A near-fold compression bump + a featureless (NaN-flow) strip +
    # an outlier decoy: both chains must stay finite and agree away
    # from the stressed regions.
    from sofima_tpu.ops import interp
    from sofima_tpu.pipeline import stack_align
    n = 640
    base = _texture(n)
    yy, xx = np.mgrid[:n, :n].astype(np.float32)
    # Strong local compression: displacement ramps 24 px over ~40 px.
    r2 = ((yy - 380.0)**2 + (xx - 300.0)**2) / (60.0**2)
    bump = 24.0 * np.exp(-r2)
    coords = jnp.stack([jnp.asarray(yy + bump), jnp.asarray(xx)])
    sec = np.array(interp.sample(jnp.asarray(base), coords,
                                 method='linear', mode='nearest'))
    sec[100:140, :] = 128.0  # featureless band -> NaN flows there
    sec[480:500, 480:500] = base[80:100, 80:100]  # outlier decoy block
    stack = np.stack([base, sec]).astype(np.uint8)

    # Same flow family as the staged oracle (see the smooth test); the
    # production coarse-to-fine path on stressed data is covered by the
    # err_f ground-truth assertion below.
    cfg = stack_align.StackAlignConfig(max_displacement=64, residual=24,
                                       coarse_to_fine=False)
    cfg_c2f = stack_align.StackAlignConfig(max_displacement=64,
                                           residual=24)
    zeros = jnp.zeros((2, 1, n // 40, n // 40), jnp.float32)
    solved_f, rend_f, _ = stack_align.align_step(
        jnp.asarray(stack[0]), jnp.asarray(stack[1]), zeros, cfg)
    solved_c, rend_c, _ = stack_align.align_step(
        jnp.asarray(stack[0]), jnp.asarray(stack[1]), zeros, cfg_c2f)
    solved_s, rend_s = _staged_step(
        stack[0], stack[1], np.zeros((2, 1, n // 40, n // 40),
                                     np.float32), n, k0=0.1)
    rend_f = np.asarray(rend_f)
    rend_c = np.asarray(rend_c)
    assert np.isfinite(rend_f).all()
    assert np.isfinite(np.asarray(solved_f)).all()
    assert np.isfinite(rend_c).all()
    # Quiet interior away from the bump/band/decoy: both chains agree.
    # (Rows 180:280 — the band ends at 140 and the bump's skirt is
    # <2 px above row 280; rows near 340 carry up to 15 px of bump.)
    quiet = np.s_[180:280, 160:-160]
    pix_diff = np.abs(rend_f[quiet] - rend_s[quiet]).mean()
    assert pix_diff < 2.0, pix_diff
    # And every variant aligns the quiet region back to the base.
    err_f = np.abs(rend_f[quiet] - base[quiet]).mean()
    assert err_f < 6.0, err_f
    err_c = np.abs(rend_c[quiet] - base[quiet]).mean()
    assert err_c < 6.0, err_c
