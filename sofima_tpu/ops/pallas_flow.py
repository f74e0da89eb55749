"""Fused Pallas kernels for the dense-flow correlation hot path.

Two entry points, both numerically matching the XLA reference paths
(flow_field._circular_xcorr_matmul + flow_field._batched_peaks):

* `dense_flow_peaks_pallas` — the production dense-grid kernel: ONE
  pallas_call over the whole patch grid. Each grid step DMAs the image
  window of a patch group (double-buffered), then three algebraic folds
  keep everything in large aligned MXU/VPU ops (see
  _corr_peaks_grouped): patch extraction IS a block-matrix row DFT,
  per-patch mean subtraction IS cross-power DC zeroing, output
  centering IS a static roll of the inverse-DFT matrices. Only the
  [4, gy, gx] statistics ever leave VMEM. The XLA strip pipeline this
  replaces round-tripped ~16x the image volume through HBM in patch
  batches (0.49 s -> 0.17 s for 61k patches on a 10k^2 v5e run).

* `flow_peaks_pallas` / `corr_patches_pallas` — the same fused
  correlation (+ optional peak stats) for a pre-materialized patch
  batch; used by the strip path when the grid kernel's alignment
  preconditions do not hold.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pick_grid_geometry(patch_size, step, group=None, rows=None,
                       grid_y=None):
  """Auto-picked (group, rows, win_c, hp) for the dense grid kernel.

  Single source of truth shared by `_dense_flow_peaks_impl` and the
  dispatch gate in `flow_field.dense_flow_field` (which sizes the same
  block matrices to estimate VMEM footprint) — keeping the two in
  lockstep so a heuristic change cannot silently desynchronize the gate
  from the kernel (ADVICE r2).
  """
  py, px = patch_size
  sy, sx = step
  if group is None:
    # Smallest multiple of 128/gcd(sx, 128) >= 8 keeps DMA starts
    # lane-aligned with a reasonable VMEM working set.
    unit = 128 // int(np.gcd(int(sx), 128))
    group = max(unit, ((8 + unit - 1) // unit) * unit)
  if rows is None:
    # Amortize per-step overhead over 2 grid rows when alignment allows.
    rows = 2 if (sy + py) % 8 == 0 and (grid_y is None or grid_y >= 2) \
        else 1
  win_c = -(-((group - 1) * sx + px) // 128) * 128
  hp = -(-(px // 2 + 1) // 128) * 128
  return group, rows, win_c, hp


def _blkdiag(m: np.ndarray, group: int) -> np.ndarray:
  """[hp, n2] -> block-diagonal [group*hp, group*n2] (see
  _corr_peaks_grouped's single-matmul inverse path)."""
  hp, n2 = m.shape
  out = np.zeros((group * hp, group * n2), m.dtype)
  for g in range(group):
    out[g * hp:(g + 1) * hp, g * n2:(g + 1) * n2] = m
  return out


# Expanded block-diagonal inverse matrices cost 2 * (G*hp) * (G*n2)
# f32 VMEM bytes; worth it only for small (peak-cropped) surfaces.
_BLKDIAG_VMEM_CAP = 10 * 1024 * 1024


def _corr_kernel(a_ref, b_ref, wr1, wi1, fr2, fi2, br2, bi2, out_ref,
                 *, bf16):
  """One group of patches: fused circular NCC correlation surfaces.

  All matmuls are batched over the whole group (the per-patch [160, 81]
  shapes pay mostly fixed MXU pipeline cost): the row-transform runs on
  [G*n1, n2], the column transforms on [n1, G*h] after an in-VMEM
  transpose. 18 large matmuls per grid step instead of 12*G small ones.
  Patches arrive mean-subtracted (rank-3 reductions crash Mosaic; the
  wrapper folds the mean into the XLA input pipeline).
  """
  group, n1, n2 = a_ref.shape
  h = fr2.shape[1]
  in_t = jnp.bfloat16 if bf16 else jnp.float32

  def mm(x, y):
    return jnp.dot(x.astype(in_t), y.astype(in_t),
                   preferred_element_type=jnp.float32)

  a = a_ref[:]
  b = b_ref[:]

  def to_cols(x):
    # [G*n1, h] -> [n1, G*h] (group the h-blocks per patch side by side).
    return x.reshape(group, n1, h).transpose(1, 0, 2).reshape(n1,
                                                              group * h)

  def rdft2(img):
    flat = img.reshape(group * n1, n2)
    ar = to_cols(mm(flat, fr2[:]))
    ai = to_cols(mm(flat, fi2[:]))
    re = mm(wr1[:], ar) - mm(wi1[:], ai)   # [n1, G*h]
    im = mm(wr1[:], ai) + mm(wi1[:], ar)
    return re, im

  pr, pi = rdft2(a)
  qr, qi = rdft2(b)
  cr = pr * qr + pi * qi                   # F(a) * conj(F(b))
  ci = pi * qr - pr * qi
  gr = (mm(wr1[:], cr) + mm(wi1[:], ci)) / n1
  gi = (mm(wr1[:], ci) - mm(wi1[:], cr)) / n1

  def from_cols(x):
    # [n1, G*h] -> [G*n1, h]
    return x.reshape(n1, group, h).transpose(1, 0, 2).reshape(
        group * n1, h)

  corr = (mm(from_cols(gr), br2[:]) + mm(from_cols(gi), bi2[:])) / n2
  corr = corr.reshape(group, n1, n2)
  # Center the zero-shift bin (matches jnp.roll in the XLA path).
  corr = pltpu.roll(corr, n1 // 2, 1)
  corr = pltpu.roll(corr, n2 // 2, 2)
  out_ref[:] = corr


def _peaks_for_group(x, *, min_distance, threshold_rel, peak_radius,
                     center):
  """Top-2 peak statistics for a stacked [G, n1, n2] correlation block.

  Group-vectorized restatement of _peaks_for_patch: every roll,
  compare, and reduction runs ONCE on the [G, n1, n2] block instead of
  once per patch. At peak-crop surface sizes ([32, 32] = a handful of
  vregs) the per-patch chain is VPU-op-LATENCY-bound — op count, not
  element count, is what it costs — so folding the G-fold unroll into
  the lane dimension removes ~G x ~30 serial VPU ops per grid step.
  Identical numerics: same separable local-max filter, the same
  min-linear-index argmax tie-breaking, the same clamped sharpness
  window.

  Returns [G, 4] rows of (ox, oy, sharpness, ratio); NaNs if no peak.
  """
  g, n1, n2 = x.shape
  neg = jnp.float32(-jnp.inf)
  pos = jnp.float32(jnp.inf)

  def shifted(a, s, axis, fill):
    n = a.shape[axis]
    r = pltpu.roll(a, s % n, axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, axis)
    bad = idx < s if s > 0 else idx >= n + s
    return jnp.where(bad, fill, r)

  mx = x
  for s in range(1, min_distance + 1):
    mx = jnp.maximum(mx, jnp.maximum(shifted(x, s, 1, neg),
                                     shifted(x, -s, 1, neg)))
  mx2 = mx
  for s in range(1, min_distance + 1):
    mx2 = jnp.maximum(mx2, jnp.maximum(shifted(mx, s, 2, neg),
                                       shifted(mx, -s, 2, neg)))

  def gmax(a):
    return jnp.max(jnp.max(a, axis=2), axis=1)

  def gmin(a):
    return jnp.min(jnp.min(a, axis=2), axis=1)

  iy = jax.lax.broadcasted_iota(jnp.int32, (g, n1, n2), 1)
  ix = jax.lax.broadcasted_iota(jnp.int32, (g, n1, n2), 2)
  lin = iy * n2 + ix
  thr = threshold_rel * gmax(x)[:, None, None]
  cand = jnp.where((x == mx2) & (x > thr), x, neg)
  val1 = gmax(cand)
  v1b = val1[:, None, None]
  big = jnp.int32(n1 * n2)
  idx1 = gmin(jnp.where(cand == v1b, lin, big))
  py = idx1 // n2
  px = idx1 - py * n2
  val2 = gmax(jnp.where(lin == idx1[:, None, None], neg, cand))

  size = 2 * peak_radius + 1
  sy = jnp.clip(py - peak_radius, 0, n1 - size)[:, None, None]
  sx = jnp.clip(px - peak_radius, 0, n2 - size)[:, None, None]
  inwin = ((iy >= sy) & (iy < sy + size)
           & (ix >= sx) & (ix < sx + size))
  minv = gmin(jnp.where(inwin, x, pos))

  nan = jnp.float32(jnp.nan)
  no_peak = jnp.isinf(val1)
  ox = jnp.where(no_peak, nan, (px - center[1]).astype(jnp.float32))
  oy = jnp.where(no_peak, nan, (py - center[0]).astype(jnp.float32))
  sharp = jnp.where(no_peak, nan, val1 / minv)
  ratio = jnp.where(no_peak, nan,
                    jnp.where(jnp.isinf(val2), 0.0, val1 / val2))
  return jnp.stack([ox, oy, sharp, ratio], axis=1)


def _corr_peaks_kernel(a_ref, b_ref, wr1, wi1, fr2, fi2, br2, bi2,
                       out_ref, *, bf16, min_distance, threshold_rel,
                       peak_radius, center):
  """Fully fused: correlation surfaces AND peak stats, nothing to HBM
  but the [G, 4] results."""
  out_ref[:] = _corr_peaks_values(
      a_ref[:], b_ref[:], wr1[:], wi1[:], fr2[:], fi2[:], br2[:], bi2[:],
      bf16=bf16, min_distance=min_distance, threshold_rel=threshold_rel,
      peak_radius=peak_radius, center=center)


def _corr_peaks_values(a, b, wr1, wi1, fr2, fi2, br2, bi2, *, bf16,
                       min_distance, threshold_rel, peak_radius, center):
  """[G, n1, n2] patch values -> [G, 4] peak statistics, all in VMEM.

  The correlation runs as PER-PATCH matmuls: batching patches into
  grouped [n1, G*h] operands needs four in-VMEM transposes per image
  whose shuffle cost exceeds the matmul pipeline savings (measured
  0.21s -> 0.17s on the 10k^2 dense grid by dropping them).
  """
  group, n1, n2 = a.shape
  in_t = jnp.bfloat16 if bf16 else jnp.float32

  def mm(x, y):
    return jnp.dot(x.astype(in_t), y.astype(in_t),
                   preferred_element_type=jnp.float32)

  def corr_one(ag, bg):
    def rdft2(img):
      ar = mm(img, fr2)
      ai = mm(img, fi2)
      return mm(wr1, ar) - mm(wi1, ai), mm(wr1, ai) + mm(wi1, ar)

    pr, pi = rdft2(ag)
    qr, qi = rdft2(bg)
    cr = pr * qr + pi * qi
    ci = pi * qr - pr * qi
    gr = (mm(wr1, cr) + mm(wi1, ci)) / n1
    gi = (mm(wr1, ci) - mm(wi1, cr)) / n1
    return (mm(gr, br2) + mm(gi, bi2)) / n2

  corr = jnp.stack([corr_one(a[g], b[g]) for g in range(group)])
  corr = pltpu.roll(corr, n1 // 2, 1)
  corr = pltpu.roll(corr, n2 // 2, 2)

  return _peaks_for_group(
      corr, min_distance=min_distance, threshold_rel=threshold_rel,
      peak_radius=peak_radius, center=center)


def _pick_xdft_seg(group, px, sx, win_c, hp):
  """Static segment count for the block x-DFT matmuls (1 = unsegmented).

  The [win_c, G*hp] block-diagonal DFT matrices are >90% structural
  zeros at production geometry (patch 80, stride 40, group 16). Splitting
  the window into `seg` lane segments — each matmul'd against its own
  [seg_wp, (G/seg)*hp] block slice — cuts the MAC count by up to ~6x
  (cost = seg * seg_wp * (G/seg) * hp, quadratic waste shrinks with
  groups-per-segment) and is BIT-EXACT: the dropped rows are exactly the
  zero rows of those column blocks (hardware-validated,
  scratch/probe_segmm.py: rel diff 0.0 vs the full matmul). Segments are
  only eligible when every slice offset stays sublane-aligned.
  """
  best, best_cost = 1, win_c * group * hp
  for seg in range(2, group + 1):
    if group % seg:
      continue
    gps = group // seg
    seg_w = (gps - 1) * sx + px
    seg_wp = -(-seg_w // 128) * 128
    if seg_wp > win_c or (gps * sx) % 8:
      continue
    cost = seg * seg_wp * gps * hp
    # Ties prefer MORE segments: equal MACs in smaller matmuls measured
    # faster (seg16 52.9 ms vs seg8 55.3 ms on the 10k^2 fine pass).
    if cost <= best_cost:
      best, best_cost = seg, cost
  return best


def _block_xdft(w, frb, fib, mm, *, group, px, sx, seg):
  """Forward block x-DFT of a [py, win_c] window row: (w@frb, w@fib).

  seg > 1 runs the segmented form (see _pick_xdft_seg): per-segment
  matmuls against aligned block slices of frb/fib, bit-exact vs the
  full matmuls (only structurally-zero rows leave the contraction).
  """
  if seg == 1:
    return mm(w, frb), mm(w, fib)
  gps = group // seg
  hp = frb.shape[1] // group
  win_c = w.shape[1]
  seg_w = (gps - 1) * sx + px
  seg_wp = -(-seg_w // 128) * 128
  ars, ais = [], []
  for s in range(seg):
    off = min(s * gps * sx, win_c - seg_wp)
    ws = jax.lax.slice(w, (0, off), (w.shape[0], off + seg_wp))
    frs = jax.lax.slice(frb, (off, s * gps * hp),
                        (off + seg_wp, (s + 1) * gps * hp))
    fis = jax.lax.slice(fib, (off, s * gps * hp),
                        (off + seg_wp, (s + 1) * gps * hp))
    ars.append(mm(ws, frs))
    ais.append(mm(ws, fis))
  return jnp.concatenate(ars, axis=1), jnp.concatenate(ais, axis=1)


def _corr_peaks_grouped(wa, wb, wr1, wi1, wr1i, wi1i, frb, fib, br2c,
                        bi2c, dcmask, *, group, py, px, sx, mean, bf16,
                        min_distance, threshold_rel, peak_radius, seg=1):
  """Grouped-spectrum correlation + peaks for one [py, win_c] window row.

  Three algebraic folds keep the whole stage in large aligned ops:
    * patch extraction IS the row DFT — `frb`/`fib` are block matrices
      whose g-th 128-column block holds the rDFT matrix shifted to the
      patch's column offset (g*sx), so ONE [py, win_c] x [win_c, G*128]
      matmul produces every patch's row spectrum (the per-patch
      lane-unaligned window slices this replaces cost more in VPU
      shuffles than the ~2.4x extra MXU FLOPs);
    * mean subtraction IS DC-bin zeroing — subtracting per-patch means
      from both patches only changes the (0,0) spectral bin of the
      cross-power, so `dcmask` zeroes it there (exact, not approximate);
    * output centering IS a static matrix roll — `wr1i`/`br2c` are the
      inverse-DFT matrices with rows/columns pre-rolled by patch/2,
      which eliminates both data rolls of the correlation surfaces.

  Returns [G, 4] peak statistics.
  """
  in_t = jnp.bfloat16 if bf16 else jnp.float32

  def mm(x, y):
    return jnp.dot(x.astype(in_t), y.astype(in_t),
                   preferred_element_type=jnp.float32)

  if mean is not None:
    wa = wa - mean
    wb = wb - mean

  def rdft_rows(w):
    ar, ai = _block_xdft(w, frb, fib, mm, group=group, px=px, sx=sx,
                         seg=seg)
    re = mm(wr1, ar) - mm(wi1, ai)
    im = mm(wr1, ai) + mm(wi1, ar)
    return re, im

  pr, pi = rdft_rows(wa)
  qr, qi = rdft_rows(wb)
  cr = (pr * qr + pi * qi) * dcmask
  ci = (pi * qr - pr * qi) * dcmask
  gr = (mm(wr1i, cr) + mm(wi1i, ci)) / py
  gi = (mm(wr1i, ci) - mm(wi1i, cr)) / py

  # Surface dims come from the inverse matrices: pre-cropped matrices
  # (peak_crop) yield a centered [n1, n2] core with its zero offset at
  # (n1//2, n2//2); full matrices give n1, n2 == py, px.
  n1 = wr1i.shape[0]
  if group > 1 and br2c.shape[0] == gr.shape[1]:
    # Block-diagonal column-inverse matrices ([G*hp, G*n2], built by
    # _blkdiag when the surface is small): the whole group's inverse
    # transform is TWO matmuls instead of 2*G small ones — the grid
    # step is matmul-DISPATCH-bound once the peak chain is
    # group-vectorized, so the ~G/2-fold extra MACs of the zero blocks
    # buy a net win. The per-patch surfaces come back as lane slices.
    # Like the forward x-DFT, the block-diagonal waste shrinks
    # quadratically with groups-per-matmul: segment whenever the
    # per-segment column width stays lane-aligned (exact — only zero
    # blocks leave the contraction).
    n2 = br2c.shape[1] // group
    hpg = gr.shape[1] // group
    seg_i = max((s for s in range(1, group + 1)
                 if group % s == 0 and ((group // s) * n2) % 128 == 0),
                default=1)
    if seg_i > 1:
      gpsi = group // seg_i
      parts = []
      for s in range(seg_i):
        grs = jax.lax.slice(gr, (0, s * gpsi * hpg),
                            (n1, (s + 1) * gpsi * hpg))
        gis = jax.lax.slice(gi, (0, s * gpsi * hpg),
                            (n1, (s + 1) * gpsi * hpg))
        b_r = jax.lax.slice(br2c, (s * gpsi * hpg, s * gpsi * n2),
                            ((s + 1) * gpsi * hpg, (s + 1) * gpsi * n2))
        b_i = jax.lax.slice(bi2c, (s * gpsi * hpg, s * gpsi * n2),
                            ((s + 1) * gpsi * hpg, (s + 1) * gpsi * n2))
        parts.append(mm(grs, b_r) + mm(gis, b_i))
      flat = jnp.concatenate(parts, axis=1) / px
    else:
      flat = (mm(gr, br2c) + mm(gi, bi2c)) / px  # [n1, G*n2]
    corr = jnp.stack([
        jax.lax.slice(flat, (0, g * n2), (n1, (g + 1) * n2))
        for g in range(group)])
  else:
    n2 = br2c.shape[1]
    hp = br2c.shape[0]
    corrs = []
    for g in range(group):
      grg = jax.lax.slice(gr, (0, g * hp), (n1, (g + 1) * hp))
      gig = jax.lax.slice(gi, (0, g * hp), (n1, (g + 1) * hp))
      corrs.append((mm(grg, br2c) + mm(gig, bi2c)) / px)
    corr = jnp.stack(corrs)

  return _peaks_for_group(
      corr, min_distance=min_distance, threshold_rel=threshold_rel,
      peak_radius=peak_radius, center=(n1 // 2, n2 // 2))


def _patch_moments_grouped(wa, wb, *, group, px, sx):
  """Per-patch first/second moments of a grouped window row.

  Returns ([4, group] sums, scalar-extract fn): rows are
  (sum wa, sum wa^2, sum wb, sum wb^2) per patch. Each window pixel is
  touched ONCE (four [py, win_c] column reductions) and per-patch sums
  come from one banded 0/1 selector matmul — unlike per-patch slice
  reductions, which re-read every pixel ~(patch/stride)x through
  lane-unaligned slices (measured: the slice moments made the
  fully-valid closed form SLOWER than the 6-term mask chain it
  replaces; this formulation removes that).
  """
  win_c = wa.shape[1]
  red = jnp.concatenate([
      jnp.sum(wa, axis=0, keepdims=True),
      jnp.sum(wa * wa, axis=0, keepdims=True),
      jnp.sum(wb, axis=0, keepdims=True),
      jnp.sum(wb * wb, axis=0, keepdims=True)], axis=0)
  col = jax.lax.broadcasted_iota(jnp.int32, (win_c, group), 0)
  gid = jax.lax.broadcasted_iota(jnp.int32, (win_c, group), 1)
  sel = ((col >= gid * sx) & (col < gid * sx + px)).astype(jnp.float32)
  m = jnp.dot(red, sel, preferred_element_type=jnp.float32)

  def at(r, g):
    return jnp.sum(jax.lax.slice(m, (r, g), (r + 1, g + 1)))

  return m, at


def _ncc_full_valid_grouped(wa, wb, wr1, wi1, wr1i, wi1i, frb, fib,
                            br2c, bi2c, *, group, py, px, sx, mean,
                            min_distance, threshold_rel, peak_radius,
                            seg=1):
  """Padfield NCC for a FULLY-VALID window row: exact closed form.

  With every mask pixel valid and circular correlation, all Padfield
  terms except the image cross-power are shift-independent: the overlap
  is py*px everywhere (a circularly shifted all-ones mask still covers
  the whole patch), and the masked sums / squared sums reduce to the
  patch's own moments. The NCC surface is therefore an affine rescale of
  the plain circular cross-correlation:

      ncc = (xcorr - sum_p*sum_c/N) / sqrt(var_p * var_c),  N = py*px

  computable from the cheap 2-plane spectra plus per-patch scalar
  moments — no mask spectra, no mask DMA, ~1/3 the matmuls of the
  6-term masked pipeline. Numerically this matches
  _masked_corr_peaks_grouped to float rounding (the masked path derives
  the same constants through DFT products). Always float32, like the
  masked path it substitutes for.

  Returns [G, 4] peak statistics.
  """
  in_t = jnp.float32
  eps = jnp.float32(np.finfo(np.float32).eps)

  def mm(x, y):
    return jnp.dot(x.astype(in_t), y.astype(in_t),
                   preferred_element_type=jnp.float32)

  wa = wa - (jnp.mean(wa) if mean is None else mean)
  wb = wb - (jnp.mean(wb) if mean is None else mean)

  def rdft_rows(w):
    ar, ai = _block_xdft(w, frb, fib, mm, group=group, px=px, sx=sx,
                         seg=seg)
    return mm(wr1, ar) - mm(wi1, ai), mm(wr1, ai) + mm(wi1, ar)

  pr, pi = rdft_rows(wa)
  qr, qi = rdft_rows(wb)
  cr = pr * qr + pi * qi
  ci = pi * qr - pr * qi
  gr = (mm(wr1i, cr) + mm(wi1i, ci)) / py
  gi = (mm(wr1i, ci) - mm(wi1i, cr)) / py

  hp = br2c.shape[0]
  n_area = jnp.float32(py * px)
  _, mom = _patch_moments_grouped(wa, wb, group=group, px=px, sx=sx)
  xcs, nums_c, denoms = [], [], []
  tolmax = jnp.float32(0.0)
  for g in range(group):
    grg = jax.lax.slice(gr, (0, g * hp), (py, (g + 1) * hp))
    gig = jax.lax.slice(gi, (0, g * hp), (py, (g + 1) * hp))
    xcs.append((mm(grg, br2c) + mm(gig, bi2c)) / px)
    sp = mom(0, g)
    sc = mom(2, g)
    var_p = jnp.fmax(mom(1, g) - sp * sp / n_area, 0.0)
    var_c = jnp.fmax(mom(3, g) - sc * sc / n_area, 0.0)
    denom = jnp.sqrt(var_p * var_c)
    tolmax = jnp.maximum(tolmax, denom)
    nums_c.append(sp * sc / n_area)
    denoms.append(denom)

  tol = 1e3 * eps * tolmax
  # Normalize per patch with SCALAR operands before stacking: stacking
  # the rank-0 scalars into a [G] vector and broadcasting [G, 1, 1]
  # hits an 'unsupported shape cast' in Mosaic layout inference on
  # hardware (CPU interpret accepts it) — scalar-broadcast ops on the
  # [n1, n2] surfaces lower cleanly and are numerically identical.
  corrs_n = [jnp.where(denoms[g] > tol,
                       (xcs[g] - nums_c[g])
                       / jnp.where(denoms[g] > tol, denoms[g], 1.0), 0.0)
             for g in range(group)]
  corr = jnp.clip(jnp.stack(corrs_n), -1.0, 1.0)
  return _peaks_for_group(
      corr, min_distance=min_distance, threshold_rel=threshold_rel,
      peak_radius=peak_radius, center=(py // 2, px // 2))


def _masked_row_subgrouped(wa, wb, va, vb, wr1, wi1, wr1i, wi1i,
                           frb, fib, br2c, bi2c, pure_sub_ref, sub_base,
                           out_ref, out_row0, *, group, sub, py, px,
                           sx, mean, bf16, min_distance, threshold_rel,
                           peak_radius, seg=1):
  """Masked circular NCC (Padfield) + peaks, purity-predicated per
  SUBGROUP of `sub` patches.

  The masked twin of _corr_peaks_grouped. The image cross-power —
  identical between the masked chain and the fully-valid closed form —
  is computed ONCE for the whole window row (forward DFTs of the
  masked images + one product + one grouped inverse). Each subgroup of
  `sub` patches then branches on its host-computed state flag
  (`pure_sub_ref[sub_base + sg]`, SMEM; 0 impure / 1 pure / 2 dead):

    * pure subgroup (every pixel of every patch valid): closed-form
      NCC from the shared cross-power plus row-shared patch moments —
      no mask spectra at all (cf. _ncc_full_valid_grouped);
    * dead subgroup (either plane fully invalid): the chain's output
      is identically no-peak, emitted directly as NaN rows;
    * impure subgroup: the remaining four Padfield forward DFTs (masks
      and masked squares) and five product inversions run on operands
      SLICED to the subgroup's columns, so the 6-term chain's cost is
      paid only where the mask actually intersects patches.

  Window-level purity (in _grid_kernel_masked) still short-circuits
  fully-valid steps and their mask DMAs; this routine is the impure-
  window path. Matches flow_field._masked_xcorr_circular within float
  tolerance. DEVIATION vs the pre-subgroup kernel: the denominator
  tolerance (1e3*eps*max|denom|) is shared per SUBGROUP, not per
  group — the reference itself gates against whatever batch shared a
  dispatch, so the sharing granularity is an implementation detail;
  it only moves near-flat patches between 'no peak' and 'noise peak'.

  Precision split under `bf16`: every matmul in the MASK-ONLY chain
  (the overlap counts smp x smc) stays float32 — overlap must survive
  jnp.round exactly, and bf16 DFT matrices perturb a 25600-px count by
  O(100). Matmuls whose operands involve the IMAGES (xcorr, sum and
  variance terms) run with bfloat16 inputs and float32 accumulation
  (the MXU-native mode): mean-subtracted EM patches lose <0.5% relative
  spectral amplitude, which the NCC normalization and integer peak
  extraction tolerate — gated by the bench masked peak-agreement check
  on hardware data. bf16=False keeps everything float32 (the reference
  masked path's precision).

  Writes [sub, 4] peak statistics per subgroup directly into
  out_ref[0, 0, out_row0 + sg*sub : out_row0 + (sg+1)*sub].
  """
  f32 = jnp.float32
  img_t = jnp.bfloat16 if bf16 else jnp.float32
  eps = jnp.float32(np.finfo(np.float32).eps)
  nsub = group // sub
  hp = br2c.shape[0]
  n_area = jnp.float32(py * px)

  def mm(x, y, t=f32):
    return jnp.dot(x.astype(t), y.astype(t),
                   preferred_element_type=jnp.float32)

  # Constant subtraction is exactly neutral under the NCC normalization;
  # do it anyway to keep the f32/bf16 spectra well-scaled.
  wa = wa - (jnp.mean(wa) if mean is None else mean)
  wb = wb - (jnp.mean(wb) if mean is None else mean)
  pz = wa * va
  cz = wb * vb
  pz2 = pz * pz
  cz2 = cz * cz

  def gdft(w, t=f32):
    ar, ai = _block_xdft(w, frb, fib, lambda x, y: mm(x, y, t),
                         group=group, px=px, sx=sx, seg=seg)
    return (mm(wr1, ar, t) - mm(wi1, ai, t),
            mm(wr1, ai, t) + mm(wi1, ar, t))

  def prod(a, b):  # a * conj(b), grouped layout
    return (a[0] * b[0] + a[1] * b[1], a[1] * b[0] - a[0] * b[1])

  def ginv(t, dt=f32):
    tr, ti = t
    gr = (mm(wr1i, tr, dt) + mm(wi1i, ti, dt)) / py
    gi = (mm(wr1i, ti, dt) - mm(wi1i, tr, dt)) / py
    return gr, gi

  # Shared across all subgroups: masked-image spectra + cross-power
  # (pure patches read pz = wa - mean in their columns, so the shared
  # surfaces are exact for both branches), plus the row's patch
  # moments (valid wherever the patch is fully valid — i.e. exactly
  # where the pure branch reads them).
  sp = gdft(pz, img_t)
  sc = gdft(cz, img_t)
  xc = ginv(prod(sp, sc), img_t)
  _, mom = _patch_moments_grouped(pz, cz, group=group, px=px, sx=sx)

  def col_inv(t, j, dt=f32):
    gr, gi = t
    grg = jax.lax.slice(gr, (0, j * hp), (py, (j + 1) * hp))
    gig = jax.lax.slice(gi, (0, j * hp), (py, (j + 1) * hp))
    return (mm(grg, br2c, dt) + mm(gig, bi2c, dt)) / px

  def emit_group(corr, sg):
    # Group-vectorized peak chain (see _peaks_for_group): one set of
    # rolls/reductions for the whole [sub, py, px] stack.
    vals = _peaks_for_group(
        corr, min_distance=min_distance, threshold_rel=threshold_rel,
        peak_radius=peak_radius, center=(py // 2, px // 2))
    out_ref[0, 0, out_row0 + sg * sub:out_row0 + (sg + 1) * sub] = vals

  for sg in range(nsub):
    flag = pure_sub_ref[sub_base + sg]
    c0 = sg * sub * sx
    c1 = c0 + (sub - 1) * sx + px
    b0 = sg * sub * hp
    b1 = (sg + 1) * sub * hp

    @pl.when(flag == 2)
    def _dead_sub(sg=sg):
      # Either plane fully invalid across the subgroup: every overlap
      # count is zero, the chain's surfaces are identically zero, and
      # the peak extractor returns all-NaN rows — emit them directly.
      out_ref[0, 0, out_row0 + sg * sub:out_row0 + (sg + 1) * sub] = (
          jnp.full((sub, 4), jnp.nan, jnp.float32))

    @pl.when(flag == 1)
    def _pure_sub(sg=sg):
      # Closed-form NCC: shared cross-power + row-shared patch moments
      # (valid for the patches of a PURE subgroup, where pz == wa-mean).
      xcs, numcs, denoms = [], [], []
      tolmax = jnp.float32(0.0)
      for j in range(sub):
        g = sg * sub + j
        xcs.append(col_inv(xc, g, img_t))
        sp_s = mom(0, g)
        sc_s = mom(2, g)
        var_p = jnp.fmax(mom(1, g) - sp_s * sp_s / n_area, 0.0)
        var_c = jnp.fmax(mom(3, g) - sc_s * sc_s / n_area, 0.0)
        denom = jnp.sqrt(var_p * var_c)
        tolmax = jnp.maximum(tolmax, denom)
        numcs.append(sp_s * sc_s / n_area)
        denoms.append(denom)
      tol = 1e3 * eps * tolmax
      # Per-patch scalar normalize before the stack (see the matching
      # note in _ncc_full_valid_grouped: stacked rank-0 scalars break
      # Mosaic layout inference on hardware).
      corrs_n = [jnp.where(denoms[j] > tol,
                           (xcs[j] - numcs[j])
                           / jnp.where(denoms[j] > tol, denoms[j], 1.0),
                           0.0)
                 for j in range(sub)]
      emit_group(jnp.clip(jnp.stack(corrs_n), -1.0, 1.0), sg)

    @pl.when(flag == 0)
    def _impure_sub(sg=sg, c0=c0, c1=c1, b0=b0, b1=b1):
      # Subgroup-sliced forward DFTs: the block matrices' rows outside
      # the subgroup's columns are zero, so slicing rows AND block
      # columns is exact and cuts the contraction to the subgroup.
      frb_s = jax.lax.slice(frb, (c0, b0), (c1, b1))
      fib_s = jax.lax.slice(fib, (c0, b0), (c1, b1))
      # The subgroup slice is itself block-diagonal over `sub` patches:
      # segment it like the whole-row spectra (exact, see _block_xdft).
      seg_s = _pick_xdft_seg(sub, px, sx, c1 - c0, hp)

      def gdft_s(w, t=f32):
        ws = jax.lax.slice(w, (0, c0), (py, c1))
        ar, ai = _block_xdft(ws, frb_s, fib_s,
                             lambda a, b: mm(a, b, t),
                             group=sub, px=px, sx=sx, seg=seg_s)
        return (mm(wr1, ar, t) - mm(wi1, ai, t),
                mm(wr1, ai, t) + mm(wi1, ar, t))

      smp = gdft_s(va)
      smc = gdft_s(vb)
      sp2 = gdft_s(pz2, img_t)
      sc2 = gdft_s(cz2, img_t)
      sp_s = tuple(jax.lax.slice(p, (0, b0), (py, b1)) for p in sp)
      sc_s = tuple(jax.lax.slice(p, (0, b0), (py, b1)) for p in sc)

      terms = [ginv(prod(smp, smc)), ginv(prod(sp_s, smc), img_t),
               ginv(prod(smp, sc_s), img_t),
               ginv(prod(sp2, smc), img_t),
               ginv(prod(smp, sc2), img_t)]
      term_t = [f32, img_t, img_t, img_t, img_t]

      nums, denoms, overlaps = [], [], []
      tolmax = jnp.float32(0.0)
      for j in range(sub):
        xcorr = col_inv(xc, sg * sub + j, img_t)
        ovl_raw, sum_p, sum_c, t_p2, t_c2 = (
            col_inv(t, j, dt) for t, dt in zip(terms, term_t))
        overlap = jnp.fmax(jnp.round(ovl_raw), eps)
        inv_overlap = 1.0 / overlap
        num = xcorr - sum_p * sum_c * inv_overlap
        var_p = jnp.fmax(t_p2 - jnp.square(sum_p) * inv_overlap, 0.0)
        var_c = jnp.fmax(t_c2 - jnp.square(sum_c) * inv_overlap, 0.0)
        denom = jnp.sqrt(var_p * var_c)
        tolmax = jnp.maximum(tolmax, jnp.max(jnp.abs(denom)))
        nums.append(num)
        denoms.append(denom)
        overlaps.append(overlap)

      tol = 1e3 * eps * tolmax
      num = jnp.stack(nums)
      denom = jnp.stack(denoms)
      overlap = jnp.stack(overlaps)
      corr = jnp.where(denom > tol,
                       num / jnp.where(denom > tol, denom, 1.0), 0.0)
      corr = jnp.clip(corr, -1.0, 1.0)
      # The strips path thresholds against the BATCH max overlap,
      # which equals the patch area whenever any patch pair is fully
      # valid (and makes results depend on batching when none is);
      # the theoretical max is deterministic and matches in the
      # common case.
      corr = jnp.where(overlap < 0.3 * (py * px), 0.0, corr)
      emit_group(corr, sg)


def _grid_kernel(pre_hbm, post_hbm, wr1, wi1, wr1i, wi1i, frb, fib,
                 br2c, bi2c, dcmask, out_ref, win_a, win_b, sems, *,
                 group, rows, py, px, sy, sx, win_r, win_c, ngroups,
                 nsteps, mean, bf16, min_distance, threshold_rel,
                 peak_radius, seg=1):
  """One (row step, patch group): window DMA + in-VMEM patch assembly.

  Replaces the XLA strip glue (_strip_patches), whose [b, py, px] patch
  batches round-tripped ~16x the image volume through HBM (~100 GB on a
  10k^2 run, the measured bottleneck). Here the step's image window
  ((rows-1)*sy + py rows x group*sx + px - sx columns) is DMA'd once and
  the 4x-overlapping patches are cut as static VMEM slices — HBM reads
  drop to the ~4x inherent window overlap.

  The window DMA is double-buffered across grid steps (each step kicks
  off the next step's copies before computing): the grid is a long
  sequential scan of small steps, so an unhidden DMA latency per step
  is a measurable fraction of the kernel.
  """
  r = pl.program_id(0)
  g = pl.program_id(1)
  step = r * ngroups + g
  slot = jax.lax.rem(step, 2)

  def copies(rr, gg, s):
    row0 = rr * (rows * sy)
    col0 = gg * (group * sx)
    cp_a = pltpu.make_async_copy(
        pre_hbm.at[pl.ds(row0, win_r), pl.ds(col0, win_c)],
        win_a.at[s], sems.at[s, 0])
    cp_b = pltpu.make_async_copy(
        post_hbm.at[pl.ds(row0, win_r), pl.ds(col0, win_c)],
        win_b.at[s], sems.at[s, 1])
    return cp_a, cp_b

  @pl.when(step == 0)
  def _prologue():
    for cp in copies(r, g, slot):
      cp.start()

  nxt = step + 1

  @pl.when(nxt < nsteps)
  def _prefetch():
    for cp in copies(nxt // ngroups, jax.lax.rem(nxt, ngroups), 1 - slot):
      cp.start()

  for cp in copies(r, g, slot):
    cp.wait()

  full_a = win_a[slot]
  full_b = win_b[slot]
  parts = []
  for r2 in range(rows):
    wa = jax.lax.slice(full_a, (r2 * sy, 0), (r2 * sy + py, win_c))
    wb = jax.lax.slice(full_b, (r2 * sy, 0), (r2 * sy + py, win_c))
    parts.append(_corr_peaks_grouped(
        wa, wb, wr1[:], wi1[:], wr1i[:], wi1i[:], frb[:], fib[:],
        br2c[:], bi2c[:], dcmask[:], group=group, py=py, px=px, sx=sx,
        mean=mean, bf16=bf16, min_distance=min_distance,
        threshold_rel=threshold_rel, peak_radius=peak_radius, seg=seg))
  out_ref[0, 0] = (parts[0] if rows == 1
                   else jnp.concatenate(parts, axis=0))


def _grid_kernel_targeted(offs_ref, pre_hbm, post_hbm, wr1, wi1, wr1i,
                          wi1i, frb, fib, br2c, bi2c, dcmask, out_ref,
                          win_a, win_b, sems, *, group, rows, py, px, sy,
                          sx, win_r, win_c, win_r2, win_c2, pad_y, pad_x,
                          ngroups, nsteps, mean, bf16, min_distance,
                          threshold_rel, peak_radius, seg=1):
  """Targeted twin of _grid_kernel: per-step integer POST window offsets.

  `offs_ref` (SMEM, [nsteps*2] int32) holds a (dy, dx) shift per
  (row-step, group) window, derived from a prior coarse flow. The post
  window is DMA'd from the shifted position — start rounded down to the
  (8, 128) tiling, content realigned with two dynamic rolls (the tiled
  warp kernel's trick) — so each patch pair is correlated at the coarse
  prior, extending the capture range far beyond patch/2 with ZERO
  resampling (integer shifts are exact). This is the reference's
  targeting-field mechanism (/root/reference/flow_field.py:626-677)
  restated at group granularity for the TPU grid kernel; the caller adds
  the offsets back onto the returned peaks.
  """
  r = pl.program_id(0)
  g = pl.program_id(1)
  step = r * ngroups + g
  slot = jax.lax.rem(step, 2)

  def copy_pre(rr, gg, s):
    row0 = rr * (rows * sy) + pad_y
    col0 = gg * (group * sx) + pad_x
    return pltpu.make_async_copy(
        pre_hbm.at[pl.ds(row0, win_r), pl.ds(col0, win_c)],
        win_a.at[s], sems.at[s, 0])

  def copy_post(rr, gg, s):
    idx = (rr * ngroups + gg) * 2
    row_raw = rr * (rows * sy) + pad_y + offs_ref[idx]
    col_raw = gg * (group * sx) + pad_x + offs_ref[idx + 1]
    row_al = (row_raw // 8) * 8
    col_al = (col_raw // 128) * 128
    cp = pltpu.make_async_copy(
        post_hbm.at[pl.ds(row_al, win_r2), pl.ds(col_al, win_c2)],
        win_b.at[s], sems.at[s, 1])
    return cp, row_raw - row_al, col_raw - col_al

  @pl.when(step == 0)
  def _prologue():
    copy_pre(r, g, slot).start()
    copy_post(r, g, slot)[0].start()

  nxt = step + 1

  @pl.when(nxt < nsteps)
  def _prefetch():
    rr = nxt // ngroups
    gg = jax.lax.rem(nxt, ngroups)
    copy_pre(rr, gg, 1 - slot).start()
    copy_post(rr, gg, 1 - slot)[0].start()

  copy_pre(r, g, slot).wait()
  cp_b, off_y, off_x = copy_post(r, g, slot)
  cp_b.wait()

  full_a = win_a[slot]
  fb = win_b[slot]
  fb = pltpu.roll(fb, (win_r2 - off_y) % win_r2, 0)
  fb = pltpu.roll(fb, (win_c2 - off_x) % win_c2, 1)
  full_b = jax.lax.slice(fb, (0, 0), (win_r, win_c))

  parts = []
  for r2 in range(rows):
    wa = jax.lax.slice(full_a, (r2 * sy, 0), (r2 * sy + py, win_c))
    wb = jax.lax.slice(full_b, (r2 * sy, 0), (r2 * sy + py, win_c))
    parts.append(_corr_peaks_grouped(
        wa, wb, wr1[:], wi1[:], wr1i[:], wi1i[:], frb[:], fib[:],
        br2c[:], bi2c[:], dcmask[:], group=group, py=py, px=px, sx=sx,
        mean=mean, bf16=bf16, min_distance=min_distance,
        threshold_rel=threshold_rel, peak_radius=peak_radius, seg=seg))
  out_ref[0, 0] = (parts[0] if rows == 1
                   else jnp.concatenate(parts, axis=0))


def _grid_kernel_masked(pure_ref, pure_sub_ref, pre_hbm, post_hbm,
                        vpre_hbm, vpost_hbm,
                        wr1, wi1, wr1i, wi1i, frb, fib, br2c, bi2c,
                        out_ref, win_a, win_b, win_va, win_vb, sems, *,
                        group, sub, rows, py, px, sy, sx, win_r, win_c,
                        ngroups, nsteps, mean, bf16, min_distance,
                        threshold_rel, peak_radius, seg=1):
  """Masked twin of _grid_kernel: four double-buffered window streams
  (images + valid masks) feeding the Padfield NCC pipeline.

  State-predicated at two granularities (0 impure / 1 pure / 2 dead,
  host-XLA-computed from per-plane mask integral images into SMEM):
  pure steps (whole window valid) skip the mask DMAs entirely and run
  the closed-form NCC (_ncc_full_valid_grouped — exactly the Padfield
  result at full validity); dead steps (either plane fully invalid)
  skip ALL DMAs and math and emit the chain's identical no-peak NaN
  rows. Impure steps run _masked_row_subgrouped, which re-branches per
  SUBGROUP of `sub` patches on
  `pure_sub_ref[step*rows*nsub + r2*nsub + sg]`, so the 3x cost of the
  6-term masked pipeline is only paid by patches the mask actually
  intersects (band/blob masks leave most patches of an impure window
  fully valid or fully dead). Deterministic: the branches depend on
  the data, not on batching."""
  r = pl.program_id(0)
  g = pl.program_id(1)
  step = r * ngroups + g
  slot = jax.lax.rem(step, 2)

  def copies(rr, gg, s, masks):
    row0 = rr * (rows * sy)
    col0 = gg * (group * sx)
    srcs = (vpre_hbm, vpost_hbm) if masks else (pre_hbm, post_hbm)
    dsts = (win_va, win_vb) if masks else (win_a, win_b)
    base = 2 if masks else 0
    return [
        pltpu.make_async_copy(
            src.at[pl.ds(row0, win_r), pl.ds(col0, win_c)],
            dst.at[s], sems.at[s, base + i])
        for i, (src, dst) in enumerate(zip(srcs, dsts))
    ]

  state = pure_ref[step]
  impure = state == 0
  dead = state == 2

  @pl.when((step == 0) & jnp.logical_not(dead))
  def _prologue():
    for cp in copies(r, g, slot, masks=False):
      cp.start()

  @pl.when((step == 0) & impure)
  def _prologue_masks():
    for cp in copies(r, g, slot, masks=True):
      cp.start()

  nxt = step + 1
  in_range = nxt < nsteps

  # Guard the SMEM read: pure_ref[nsteps] is out of bounds on the last
  # step, so clamp the index and combine with the range check.
  nxt_state = pure_ref[jnp.minimum(nxt, nsteps - 1)]

  @pl.when(in_range & (nxt_state != 2))
  def _prefetch():
    for cp in copies(nxt // ngroups, jax.lax.rem(nxt, ngroups), 1 - slot,
                     masks=False):
      cp.start()

  @pl.when(in_range & (nxt_state == 0))
  def _prefetch_masks():
    for cp in copies(nxt // ngroups, jax.lax.rem(nxt, ngroups), 1 - slot,
                     masks=True):
      cp.start()

  @pl.when(jnp.logical_not(dead))
  def _wait_images():
    for cp in copies(r, g, slot, masks=False):
      cp.wait()

  mats = (wr1[:], wi1[:], wr1i[:], wi1i[:], frb[:], fib[:], br2c[:],
          bi2c[:])

  @pl.when(impure)
  def _masked_path():
    for cp in copies(r, g, slot, masks=True):
      cp.wait()
    full = [w[slot] for w in (win_a, win_b, win_va, win_vb)]
    nsub = group // sub
    for r2 in range(rows):
      wa, wb, va, vb = (
          jax.lax.slice(f, (r2 * sy, 0), (r2 * sy + py, win_c))
          for f in full)
      _masked_row_subgrouped(
          wa, wb, va, vb, *mats, pure_sub_ref,
          step * (rows * nsub) + r2 * nsub, out_ref, r2 * group,
          group=group, sub=sub, py=py, px=px, sx=sx, mean=mean,
          bf16=bf16, min_distance=min_distance,
          threshold_rel=threshold_rel, peak_radius=peak_radius, seg=seg)

  @pl.when(state == 1)
  def _pure_path():
    full = [w[slot] for w in (win_a, win_b)]
    parts = []
    for r2 in range(rows):
      wa, wb = (jax.lax.slice(f, (r2 * sy, 0), (r2 * sy + py, win_c))
                for f in full)
      parts.append(_ncc_full_valid_grouped(
          wa, wb, *mats, group=group, py=py, px=px, sx=sx, mean=mean,
          min_distance=min_distance, threshold_rel=threshold_rel,
          peak_radius=peak_radius, seg=seg))
    out_ref[0, 0] = (parts[0] if rows == 1
                     else jnp.concatenate(parts, axis=0))

  @pl.when(dead)
  def _dead_path():
    # Either plane fully invalid across the whole window: zero overlap
    # everywhere, identically-zero NCC surfaces, no peaks — emit the
    # NaN rows without touching HBM at all (no DMAs were issued).
    out_ref[0, 0] = jnp.full((rows * group, 4), jnp.nan, jnp.float32)


def targeted_geometry(shape, patch_size, step, group=None, rows=None):
  """Grid/window geometry of the dense grid kernel, for offset building."""
  py, px = patch_size
  sy, sx = step
  h, w = shape
  gy = (h - (py - sy)) // sy
  gx = (w - (px - sx)) // sx
  group, rows, win_c, _ = pick_grid_geometry(patch_size, step, group,
                                             rows, grid_y=gy)
  return dict(gy=gy, gx=gx, group=group, rows=rows,
              ngroups=-(-gx // group), nrsteps=-(-gy // rows),
              win_r=(rows - 1) * sy + py, win_c=win_c)


@functools.partial(
    jax.jit, static_argnames=['patch_size', 'step', 'max_offset', 'mean',
                              'bf16', 'group', 'rows', 'min_distance',
                              'threshold_rel', 'peak_radius', 'interpret',
                              'peak_crop', 'xdft_seg'])
def dense_flow_peaks_targeted(
    pre_image: jnp.ndarray,
    post_image: jnp.ndarray,
    post_offsets: jnp.ndarray,
    patch_size: tuple[int, int] = (160, 160),
    step: tuple[int, int] = (40, 40),
    max_offset: int = 96,
    mean: float | None = None,
    bf16: bool = False,
    group: int | None = None,
    rows: int | None = None,
    min_distance: int = 2,
    threshold_rel: float = 0.5,
    peak_radius: int = 5,
    interpret: bool = False,
    peak_crop: int | None = None,
    xdft_seg: int | None = None,
) -> jnp.ndarray:
  """Dense grid flow with per-window integer POST offsets (targeting).

  `post_offsets`: int32 [nrsteps, ngroups, 2] (dy, dx) window shifts
  (clipped to +-max_offset), typically round(-coarse_flow) — see
  flow_field.coarse_to_fine_flow. Returns [4, gy, gx] where the x/y
  channels are peaks RELATIVE to the shifted windows; the caller must
  subtract the per-window (dx, dy) to recover absolute flow. Unmasked
  only.

  `peak_crop`: restrict the peak search to the centered
  [peak_crop, peak_crop] core of each correlation surface by slicing
  the pre-rolled inverse-DFT matrices — the crop costs NOTHING in the
  kernel (the inverse transforms and the whole peak chain simply run
  at the cropped size, ~(patch/peak_crop)^2 less VPU work). Sound
  whenever the coarse pass bounds the fine residual (|residual| <
  peak_crop/2): the deviations are that max(corr) for the relative
  threshold and the no-peak/second-peak statistics see only the core.
  A true peak outside the crop yields a plausible in-crop local max
  instead of the correct far peak, so callers MUST size the crop well
  above the expected residual (the pipeline gates this against ground
  truth; see StackAlignConfig.peak_crop).
  """
  py, px = patch_size
  sy, sx = step
  h, w = pre_image.shape
  geo = targeted_geometry((h, w), patch_size, step, group, rows)
  group, rows = geo['group'], geo['rows']
  gy, gx = geo['gy'], geo['gx']
  ngroups, nrsteps = geo['ngroups'], geo['nrsteps']
  win_r, win_c = geo['win_r'], geo['win_c']
  assert (group * sx) % 128 == 0 and sy % 8 == 0 and win_r % 8 == 0
  assert post_offsets.shape == (nrsteps, ngroups, 2), post_offsets.shape

  md = int(max_offset)
  pad_y = -(-md // 8) * 8
  pad_x = -(-md // 128) * 128
  win_r2 = win_r + 8
  win_c2 = win_c + 128

  pad_h = max((nrsteps * rows - 1) * sy + py - h, 0)
  pad_w = max((ngroups - 1) * group * sx + win_c - w, 0)
  pre = jnp.pad(pre_image.astype(jnp.float32),
                ((pad_y, pad_h), (pad_x, pad_w)))
  post = jnp.pad(post_image.astype(jnp.float32),
                 ((pad_y, pad_h + pad_y + 8), (pad_x, pad_w + pad_x + 128)))

  from sofima_tpu import flow_field
  wr1_np, wi1_np = flow_field._dft_mats(py)
  fr2, fi2, br2, bi2 = flow_field._rdft_mats(px)
  h0 = fr2.shape[1]
  hp = -(-h0 // 128) * 128
  frb_np = np.zeros((win_c, group * hp), np.float32)
  fib_np = np.zeros((win_c, group * hp), np.float32)
  for g in range(group):
    frb_np[g * sx:g * sx + px, g * hp:g * hp + h0] = fr2
    fib_np[g * sx:g * sx + px, g * hp:g * hp + h0] = fi2
  wr1i_np = np.roll(wr1_np, py // 2, axis=0)
  wi1i_np = np.roll(wi1_np, py // 2, axis=0)
  br2c_np = np.roll(np.pad(br2, ((0, hp - h0), (0, 0))), px // 2, axis=1)
  bi2c_np = np.roll(np.pad(bi2, ((0, hp - h0), (0, 0))), px // 2, axis=1)
  if peak_crop is not None:
    pc = int(peak_crop)
    if not (0 < pc <= min(py, px) and pc % 2 == 0):
      raise ValueError('peak_crop must be even and <= patch size')
    # Centered surface crop == row/column slices of the pre-rolled
    # inverse matrices (the surface's zero offset sits at patch//2).
    y0, x0 = py // 2 - pc // 2, px // 2 - pc // 2
    wr1i_np = wr1i_np[y0:y0 + pc]
    wi1i_np = wi1i_np[y0:y0 + pc]
    br2c_np = br2c_np[:, x0:x0 + pc]
    bi2c_np = bi2c_np[:, x0:x0 + pc]
  dc_np = np.ones((py, group * hp), np.float32)
  if mean is None:
    dc_np[0, np.arange(group) * hp] = 0.0

  if (group > 1 and
      2 * 4 * (group * hp) * (group * br2c_np.shape[1])
      <= _BLKDIAG_VMEM_CAP):
    br2c_np = _blkdiag(br2c_np, group)
    bi2c_np = _blkdiag(bi2c_np, group)

  offs = jnp.clip(post_offsets.astype(jnp.int32), -md, md).reshape(-1)
  mats = tuple(jnp.asarray(m) for m in
               (wr1_np, wi1_np, wr1i_np, wi1i_np, frb_np, fib_np,
                br2c_np, bi2c_np, dc_np))
  mat = lambda m: pl.BlockSpec(m.shape, lambda r, g: (0,) * m.ndim,
                               memory_space=pltpu.VMEM)
  seg = (_pick_xdft_seg(group, px, sx, win_c, hp) if xdft_seg is None
         else int(xdft_seg))
  kernel = functools.partial(
      _grid_kernel_targeted, group=group, rows=rows, py=py, px=px, sy=sy,
      sx=sx, win_r=win_r, win_c=win_c, win_r2=win_r2, win_c2=win_c2,
      pad_y=pad_y, pad_x=pad_x, ngroups=ngroups,
      nsteps=nrsteps * ngroups, mean=mean, bf16=bf16,
      min_distance=min_distance, threshold_rel=threshold_rel,
      peak_radius=peak_radius, seg=seg)
  out = pl.pallas_call(
      kernel,
      grid=(nrsteps, ngroups),
      in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [pl.BlockSpec(memory_space=pl.ANY)] * 2
                + [mat(m) for m in mats]),
      out_specs=pl.BlockSpec((1, 1, rows * group, 4),
                             lambda r, g: (r, g, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((nrsteps, ngroups, rows * group, 4),
                                     jnp.float32),
      scratch_shapes=[
          pltpu.VMEM((2, win_r, win_c), jnp.float32),
          pltpu.VMEM((2, win_r2, win_c2), jnp.float32),
          pltpu.SemaphoreType.DMA((2, 2)),
      ],
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(offs, pre, post, *mats)
  out = out.reshape(nrsteps, ngroups, rows, group, 4)
  out = out.transpose(0, 2, 1, 3, 4).reshape(nrsteps * rows,
                                             ngroups * group, 4)
  out = out[:gy, :gx]
  return jnp.moveaxis(out, -1, 0)


@functools.partial(
    jax.jit, static_argnames=['patch_size', 'step', 'mean', 'bf16',
                              'group', 'rows', 'min_distance',
                              'threshold_rel', 'peak_radius', 'interpret'])
def dense_flow_peaks_pallas(
    pre_image: jnp.ndarray,
    post_image: jnp.ndarray,
    patch_size: tuple[int, int] = (160, 160),
    step: tuple[int, int] = (40, 40),
    mean: float | None = None,
    bf16: bool = False,
    group: int | None = None,
    rows: int | None = None,
    min_distance: int = 2,
    threshold_rel: float = 0.5,
    peak_radius: int = 5,
    pre_valid: jnp.ndarray | None = None,
    post_valid: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
  """Dense-grid flow peaks over a full image pair in ONE pallas_call.

  The entire hot path — window DMA, patch assembly, mean handling,
  DFT-matmul correlation (plain circular, or the full masked Padfield
  NCC when `pre_valid`/`post_valid` float32 valid-pixel planes are
  given), peak statistics — runs in VMEM; HBM traffic is one
  ~4x-overlapped read of each plane plus the [4, gy, gx] result.
  Requires sy % 8 == 0 and group*sx % 128 == 0 (alignment of the DMA
  windows); group/rows are auto-picked when None.

  Returns [4, gy, gx] (x, y, sharpness, ratio) like
  flow_field._dense_flow_strips.

  vmap-safe: Mosaic cannot batch the ANY-memory-space image operands, so
  a custom_vmap rule serializes batches through lax.map (each element
  runs the unbatched kernel).
  """
  kwargs = dict(patch_size=patch_size, step=step, mean=mean, bf16=bf16,
                group=group, rows=rows, min_distance=min_distance,
                threshold_rel=threshold_rel, peak_radius=peak_radius,
                interpret=interpret)

  if pre_valid is None and post_valid is None:

    @jax.custom_batching.custom_vmap
    def run(pre, post):
      return _dense_flow_peaks_impl(pre, post, **kwargs)

    @run.def_vmap
    def _rule(axis_size, in_batched, pre, post):  # noqa: ANN001
      args = [pre, post]
      for i, b in enumerate(in_batched):
        if not b:
          args[i] = jnp.broadcast_to(args[i],
                                     (axis_size,) + args[i].shape)
      out = jax.lax.map(lambda ab: run(*ab), tuple(args))
      return out, True

    return run(pre_image, post_image)

  if pre_valid is None:
    pre_valid = jnp.ones_like(pre_image, jnp.float32)
  if post_valid is None:
    post_valid = jnp.ones_like(post_image, jnp.float32)

  @jax.custom_batching.custom_vmap
  def run_m(pre, post, va, vb):
    return _dense_flow_peaks_impl(pre, post, pre_valid=va, post_valid=vb,
                                  **kwargs)

  @run_m.def_vmap
  def _rule_m(axis_size, in_batched, *args):  # noqa: ANN001
    args = list(args)
    for i, b in enumerate(in_batched):
      if not b:
        args[i] = jnp.broadcast_to(args[i], (axis_size,) + args[i].shape)
    out = jax.lax.map(lambda ab: run_m(*ab), tuple(args))
    return out, True

  return run_m(pre_image, post_image, pre_valid.astype(jnp.float32),
               post_valid.astype(jnp.float32))


def _dense_flow_peaks_impl(
    pre_image: jnp.ndarray,
    post_image: jnp.ndarray,
    patch_size: tuple[int, int],
    step: tuple[int, int],
    mean: float | None,
    bf16: bool,
    group: int | None,
    rows: int | None,
    min_distance: int,
    threshold_rel: float,
    peak_radius: int,
    interpret: bool,
    pre_valid: jnp.ndarray | None = None,
    post_valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
  from sofima_tpu import flow_field

  py, px = patch_size
  sy, sx = step
  h, w = pre_image.shape
  gy = (h - (py - sy)) // sy
  gx = (w - (px - sx)) // sx
  # (Measured dead end: rows=1 for masked runs — finer purity
  # granularity — LOST to the doubled per-step overhead: 0.36 -> 0.41 s
  # on the 10k^2 masked bench. Keep the shared rows=2 default.)
  group, rows, win_c, _ = pick_grid_geometry(patch_size, step, group,
                                             rows, grid_y=gy)
  assert (group * sx) % 128 == 0, (group, sx)
  assert sy % 8 == 0 and ((rows - 1) * sy + py) % 8 == 0, (sy, py, rows)

  ngroups = -(-gx // group)
  nrsteps = -(-gy // rows)
  win_r = (rows - 1) * sy + py
  pad_h = max((nrsteps * rows - 1) * sy + py - h, 0)
  pad_w = max((ngroups - 1) * group * sx + win_c - w, 0)
  pre = jnp.pad(pre_image.astype(jnp.float32), ((0, pad_h), (0, pad_w)))
  post = jnp.pad(post_image.astype(jnp.float32), ((0, pad_h), (0, pad_w)))

  wr1_np, wi1_np = flow_field._dft_mats(py)
  fr2, fi2, br2, bi2 = flow_field._rdft_mats(px)
  h0 = fr2.shape[1]
  hp = -(-h0 // 128) * 128
  # Block forward matrices: column block g = the rDFT matrix placed at
  # the g-th patch's column offset, so the window matmul extracts AND
  # transforms every patch at once.
  frb_np = np.zeros((win_c, group * hp), np.float32)
  fib_np = np.zeros((win_c, group * hp), np.float32)
  for g in range(group):
    frb_np[g * sx:g * sx + px, g * hp:g * hp + h0] = fr2
    fib_np[g * sx:g * sx + px, g * hp:g * hp + h0] = fi2
  # Inverse matrices pre-rolled by patch/2: centering without data rolls.
  wr1i_np = np.roll(wr1_np, py // 2, axis=0)
  wi1i_np = np.roll(wi1_np, py // 2, axis=0)
  br2c_np = np.roll(np.pad(br2, ((0, hp - h0), (0, 0))), px // 2, axis=1)
  bi2c_np = np.roll(np.pad(bi2, ((0, hp - h0), (0, 0))), px // 2, axis=1)
  # Cross-power DC zeroing == per-patch mean subtraction (exact).
  dc_np = np.ones((py, group * hp), np.float32)
  if mean is None:
    dc_np[0, np.arange(group) * hp] = 0.0
  if (pre_valid is None and group > 1 and
      2 * 4 * (group * hp) * (group * br2c_np.shape[1])
      <= _BLKDIAG_VMEM_CAP):
    # Single-matmul inverse (unmasked kernels only; the masked bodies
    # index br2c per patch/subgroup and need the plain form).
    br2c_np = _blkdiag(br2c_np, group)
    bi2c_np = _blkdiag(bi2c_np, group)
  wr1 = jnp.asarray(wr1_np)
  wi1 = jnp.asarray(wi1_np)
  wr1i = jnp.asarray(wr1i_np)
  wi1i = jnp.asarray(wi1i_np)
  frb = jnp.asarray(frb_np)
  fib = jnp.asarray(fib_np)
  br2c = jnp.asarray(br2c_np)
  bi2c = jnp.asarray(bi2c_np)
  dcmask = jnp.asarray(dc_np)

  masked = pre_valid is not None
  nplanes = 6 if masked else 2

  mat = lambda m: pl.BlockSpec(m.shape, lambda r, g: (0,) * m.ndim,
                               memory_space=pltpu.VMEM)
  common = dict(group=group, rows=rows, py=py, px=px, sy=sy, sx=sx,
                win_r=win_r, win_c=win_c, ngroups=ngroups,
                nsteps=nrsteps * ngroups, mean=mean, bf16=bf16,
                min_distance=min_distance, threshold_rel=threshold_rel,
                peak_radius=peak_radius,
                seg=_pick_xdft_seg(group, px, sx, win_c, hp))
  if masked:
    # Pad masks with 0 = invalid; padded patch slots are cropped anyway.
    va = jnp.pad(pre_valid.astype(jnp.float32),
                 ((0, pad_h), (0, pad_w)))
    vb = jnp.pad(post_valid.astype(jnp.float32),
                 ((0, pad_h), (0, pad_w)))
    # Per-step window STATE (0 impure / 1 pure / 2 dead), int32
    # block-pooled integral images per plane — exact, unlike a float
    # cumsum over 1e8 pixels. All window starts/extents are multiples
    # of 8. Pure: no invalid pixel in either plane (skips mask DMAs,
    # closed-form NCC). Dead: EITHER plane fully invalid (all overlap
    # counts zero -> identically no-peak output; skips all DMAs and
    # math).
    hh, ww = va.shape
    h8 = -(-hh // 8) * 8
    w8 = -(-ww // 8) * 8

    def block_ii(plane):
      # Rounding rows/cols beyond the padded array are never DMA'd; 0
      # (= valid) padding cannot flip purity and only under-reports
      # deadness.
      p = jnp.pad((plane <= 0.0).astype(jnp.int32),
                  ((0, h8 - hh), (0, w8 - ww)))
      blk = p.reshape(h8 // 8, 8, w8 // 8, 8).sum(axis=(1, 3))
      return jnp.pad(jnp.cumsum(jnp.cumsum(blk, axis=0), axis=1),
                     ((1, 0), (1, 0)))

    ii_a = block_ii(va)
    ii_b = block_ii(vb)
    ii = ii_a + ii_b  # cumsum is linear: the union-count integral

    def box(i2, rr0, rr1, cc0, cc1):
      return (i2[rr1][:, cc1] - i2[rr0][:, cc1] - i2[rr1][:, cc0]
              + i2[rr0][:, cc0])

    r0 = np.arange(nrsteps) * (rows * sy) // 8
    r1 = r0 + win_r // 8
    c0 = np.arange(ngroups) * (group * sx) // 8
    c1 = c0 + win_c // 8
    area_w = win_r * win_c
    pure_w = box(ii, r0, r1, c0, c1) == 0
    dead_w = ((box(ii_a, r0, r1, c0, c1) == area_w)
              | (box(ii_b, r0, r1, c0, c1) == area_w))
    pure_flat = jnp.where(dead_w, 2, pure_w.astype(jnp.int32)).reshape(-1)
    # Per-SUBGROUP state for the impure-window path (sub patches per
    # flag). Purity uses OUTWARD block rounding of the column extents
    # (an unaligned stride only under-reports purity, never lies);
    # deadness uses INWARD rounding (only under-reports deadness). The
    # subgroup size must keep the per-subgroup [sub, 4] output stores
    # sublane-aligned: smallest multiple of 8 dividing group
    # (pick_grid_geometry always returns group % 8 == 0).
    sub = next((c for c in range(8, group + 1, 8) if group % c == 0),
               group)
    nsub = group // sub
    tr0 = np.arange(nrsteps * rows) * sy // 8
    tr1 = tr0 + -(-py // 8)
    starts = ((np.arange(ngroups)[:, None] * group
               + np.arange(nsub)[None, :] * sub) * sx)
    ext = (sub - 1) * sx + px
    cb0 = starts // 8
    cb1 = -(-(starts + ext) // 8)
    pure_s = box(ii, tr0, tr1, cb0, cb1) == 0
    cb0i = -(-starts // 8)
    cb1i = (starts + ext) // 8
    area_si = (tr1 - tr0)[:, None, None] * 8 * (cb1i - cb0i) * 8
    dead_s = (((box(ii_a, tr0, tr1, cb0i, cb1i) == area_si)
               | (box(ii_b, tr0, tr1, cb0i, cb1i) == area_si))
              & (area_si > 0))
    pure_sub_flat = (jnp.where(dead_s, 2, pure_s.astype(jnp.int32))
                     .reshape(nrsteps, rows, ngroups, nsub)
                     .transpose(0, 2, 1, 3).reshape(-1))
    kernel = functools.partial(_grid_kernel_masked, sub=sub, **common)
    inputs = (pure_flat, pure_sub_flat, pre, post, va, vb, wr1, wi1,
              wr1i, wi1i, frb, fib, br2c, bi2c)
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
                + [pl.BlockSpec(memory_space=pl.ANY)] * 4
                + [mat(m) for m in inputs[6:]])
    scratch = [pltpu.VMEM((2, win_r, win_c), jnp.float32)
               for _ in range(4)] + [pltpu.SemaphoreType.DMA((2, 4))]
  else:
    kernel = functools.partial(_grid_kernel, **common)
    inputs = (pre, post, wr1, wi1, wr1i, wi1i, frb, fib, br2c, bi2c,
              dcmask)
    in_specs = ([pl.BlockSpec(memory_space=pl.ANY)] * 2
                + [mat(m) for m in inputs[2:]])
    scratch = [pltpu.VMEM((2, win_r, win_c), jnp.float32)
               for _ in range(2)] + [pltpu.SemaphoreType.DMA((2, 2))]
  out = pl.pallas_call(
      kernel,
      grid=(nrsteps, ngroups),
      in_specs=in_specs,
      out_specs=pl.BlockSpec((1, 1, rows * group, 4),
                             lambda r, g: (r, g, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((nrsteps, ngroups, rows * group, 4),
                                     jnp.float32),
      scratch_shapes=scratch,
      cost_estimate=pl.CostEstimate(
          flops=(2 * py * win_c * group * hp      # block forward rDFT
                 + 8 * py * py * hp * group       # col fwd/inv + col inv
                 ) * nplanes * nrsteps * rows * ngroups,
          bytes_accessed=nplanes * nrsteps * ngroups * win_r * win_c * 4,
          transcendentals=0),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(*inputs)
  # [nrsteps, ngroups, rows, group, 4] -> [gy, gx, 4] (crop the padded
  # row/column slots).
  out = out.reshape(nrsteps, ngroups, rows, group, 4)
  out = out.transpose(0, 2, 1, 3, 4).reshape(nrsteps * rows,
                                             ngroups * group, 4)
  out = out[:gy, :gx]
  return jnp.moveaxis(out, -1, 0)


@functools.partial(
    jax.jit, static_argnames=['mean', 'bf16', 'group', 'min_distance',
                              'threshold_rel', 'peak_radius', 'interpret'])
def flow_peaks_pallas(
    a: jnp.ndarray,
    b: jnp.ndarray,
    mean: float | None = None,
    bf16: bool = False,
    group: int = 8,
    min_distance: int = 2,
    threshold_rel: float = 0.5,
    peak_radius: int = 5,
    interpret: bool = False,
) -> jnp.ndarray:
  """Fused correlation + top-2 peak statistics for a patch batch.

  The end-to-end strip pipeline is HBM-bound: every XLA stage
  (correlation spectra, max filter, argmax planes, window minima)
  round-trips [b, 160, 160]-sized arrays. This kernel keeps everything
  in VMEM and writes only the [n, 4] statistics.

  Returns [n, 4]: x, y offset from center, sharpness, peak ratio —
  exactly flow_field._batched_peaks' contract for 2d patches.
  """
  from sofima_tpu import flow_field

  n, n1, n2 = a.shape
  if mean is None:
    a = a - jnp.mean(a, axis=(1, 2), keepdims=True)
    b = b - jnp.mean(b, axis=(1, 2), keepdims=True)
  else:
    a = a - mean
    b = b - mean

  group = max(1, min(group, n))
  padded = -(-n // group) * group
  if padded != n:
    a = jnp.pad(a, ((0, padded - n), (0, 0), (0, 0)))
    b = jnp.pad(b, ((0, padded - n), (0, 0), (0, 0)))

  wr1, wi1 = (jnp.asarray(m) for m in flow_field._dft_mats(n1))
  fr2, fi2, br2, bi2 = flow_field._rdft_mats(n2)
  h0 = fr2.shape[1]
  hp = -(-h0 // 128) * 128
  fr2 = jnp.asarray(np.pad(fr2, ((0, 0), (0, hp - h0))))
  fi2 = jnp.asarray(np.pad(fi2, ((0, 0), (0, hp - h0))))
  br2 = jnp.asarray(np.pad(br2, ((0, hp - h0), (0, 0))))
  bi2 = jnp.asarray(np.pad(bi2, ((0, hp - h0), (0, 0))))

  block = pl.BlockSpec((group, n1, n2), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
  mat = lambda m: pl.BlockSpec(m.shape, lambda i: (0,) * m.ndim,
                               memory_space=pltpu.VMEM)
  out = pl.pallas_call(
      functools.partial(
          _corr_peaks_kernel, bf16=bf16, min_distance=min_distance,
          threshold_rel=threshold_rel, peak_radius=peak_radius,
          center=(n1 // 2, n2 // 2)),
      grid=(padded // group,),
      in_specs=[block, block, mat(wr1), mat(wi1), mat(fr2), mat(fi2),
                mat(br2), mat(bi2)],
      out_specs=pl.BlockSpec((group, 4), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((padded, 4), jnp.float32),
      cost_estimate=pl.CostEstimate(
          flops=12 * n1 * n1 * hp * 2 * padded,
          bytes_accessed=2 * padded * n1 * n2 * 4,
          transcendentals=0),
      # Larger groups exceed Mosaic's default 16 MB scoped-VMEM budget;
      # physical VMEM is 128 MB.
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(a, b, wr1, wi1, fr2, fi2, br2, bi2)
  return out[:n]


@functools.partial(
    jax.jit, static_argnames=['mean', 'bf16', 'group', 'interpret'])
def corr_patches_pallas(
    a: jnp.ndarray,
    b: jnp.ndarray,
    mean: float | None = None,
    bf16: bool = False,
    group: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
  """Centered circular cross-correlation surfaces for a patch batch.

  Args:
    a, b: [n, p1, p2] float32 patch batches (equal shapes)
    mean: constant to subtract instead of per-patch means
    bf16: bfloat16 matmul inputs with float32 accumulation (~4x MXU peak;
      integer-peak parity verified by tests)
    group: patches per grid step (VMEM working-set size)
    interpret: Pallas interpreter mode (CPU testing)

  Returns:
    [n, p1, p2] float32 correlation surfaces, zero-shift bin centered at
    (p1//2, p2//2) — the layout flow_field._batched_peaks consumes.
  """
  from sofima_tpu import flow_field

  n, n1, n2 = a.shape
  # Mean subtraction happens here in XLA (it fuses into the input
  # pipeline; rank-3 reductions inside the kernel crash Mosaic).
  if mean is None:
    a = a - jnp.mean(a, axis=(1, 2), keepdims=True)
    b = b - jnp.mean(b, axis=(1, 2), keepdims=True)
  else:
    a = a - mean
    b = b - mean

  group = max(1, min(group, n))
  padded = -(-n // group) * group
  if padded != n:
    a = jnp.pad(a, ((0, padded - n), (0, 0), (0, 0)))
    b = jnp.pad(b, ((0, padded - n), (0, 0), (0, 0)))

  wr1, wi1 = (jnp.asarray(m) for m in flow_field._dft_mats(n1))
  fr2, fi2, br2, bi2 = flow_field._rdft_mats(n2)
  # Pad the half-spectrum axis to the 128-lane tile: Mosaic cannot
  # shape-cast unaligned lane dims ([G, n1, 81] -> [n1, G*81]), and the
  # zero rows/columns are mathematically transparent through the whole
  # cross-power chain.
  h0 = fr2.shape[1]
  hp = -(-h0 // 128) * 128
  fr2 = jnp.asarray(np.pad(fr2, ((0, 0), (0, hp - h0))))
  fi2 = jnp.asarray(np.pad(fi2, ((0, 0), (0, hp - h0))))
  br2 = jnp.asarray(np.pad(br2, ((0, hp - h0), (0, 0))))
  bi2 = jnp.asarray(np.pad(bi2, ((0, hp - h0), (0, 0))))

  block = pl.BlockSpec((group, n1, n2), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
  mat = lambda m: pl.BlockSpec(m.shape, lambda i: (0,) * m.ndim,
                               memory_space=pltpu.VMEM)
  flops_per = 12 * n1 * n1 * (n2 // 2 + 1) * 2
  out = pl.pallas_call(
      functools.partial(_corr_kernel, bf16=bf16),
      grid=(padded // group,),
      in_specs=[block, block, mat(wr1), mat(wi1), mat(fr2), mat(fi2),
                mat(br2), mat(bi2)],
      out_specs=block,
      out_shape=jax.ShapeDtypeStruct((padded, n1, n2), jnp.float32),
      cost_estimate=pl.CostEstimate(
          flops=flops_per * padded,
          bytes_accessed=(2 * padded * n1 * n2 * 4) * 2,
          transcendentals=0),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(a, b, wr1, wi1, fr2, fi2, br2, bi2)
  return out[:n]
