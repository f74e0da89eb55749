"""Pallas TPU kernel for the shift-decomposed warp.

The XLA formulation (ops.shift_warp) streams the full image + coordinate
planes from HBM on every lattice iteration (~40 GB/s effective). This
kernel keeps everything VMEM-resident per output tile: one halo-window
DMA per tile, the displacement planes once, then the statically-unrolled
shift lattice runs entirely on the VPU — HBM traffic drops to
O(1 read + 1 write) per pixel.

Same math as shift_warp_2d (separable kernel weights over integer shift
lattice; factored Lanczos transcendentals).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sofima_tpu.ops.shift_warp import _LEFT, _TAPS, _kernel_weight


def _weight_planes(d: jnp.ndarray, method: str):
  """Per-axis transcendental planes for the factored Lanczos weights.

  Range-reduced like shift_warp.make_weight_fn: f32 sin at argument
  pi*d has absolute error ~|d|*pi*eps, which for large global
  displacements swamps sin(pi*t) ~ pi*t near integer displacements and
  blows up through the 1/(pi t)^2 factor (round-5 render_tiles bug).
  """
  if method != 'lanczos':
    return None
  k_int = jnp.round(d)
  parity = 1.0 - 2.0 * jnp.mod(k_int, 2.0)
  sin_pd = parity * jnp.sin(jnp.pi * (d - k_int))
  d8 = d - 8.0 * jnp.round(d / 8.0)
  return (sin_pd, jnp.sin(jnp.pi * d8 / 4.0),
          jnp.cos(jnp.pi * d8 / 4.0))


def _weight_at(d, planes, s: int, method: str):
  if method != 'lanczos':
    return _kernel_weight(d - s, method)
  sin_pd, sin_pd4, cos_pd4 = planes
  t = d - s
  sign = 1.0 if s % 2 == 0 else -1.0
  c_s = float(np.cos(np.pi * s / 4.0))
  s_s = float(np.sin(np.pi * s / 4.0))
  sin_pt4 = sin_pd4 * c_s - cos_pd4 * s_s
  x2 = jnp.maximum((jnp.pi * t) ** 2, 1e-12)
  w = jnp.where(jnp.abs(t) < 1e-6, 1.0,
                4.0 * sign * sin_pd * sin_pt4 / x2)
  return jnp.where(jnp.abs(t) < 4.0, w, 0.0)


def _warp_kernel(coords_ref, img_hbm, out_ref, window, sem, *, method,
                 sy0, ry, sx0, rx, tile_y, tile_x, win_r, win_c,
                 origin_y, origin_x, pad_top, pad_lft):
  z = pl.program_id(0)
  iy = pl.program_id(1)
  ix = pl.program_id(2)

  row0 = pad_top + origin_y + iy * tile_y + sy0
  col0 = pad_lft + origin_x + ix * tile_x + sx0
  copy = pltpu.make_async_copy(
      img_hbm.at[z, pl.ds(row0, win_r), pl.ds(col0, win_c)], window, sem)
  copy.start()

  # Displacement planes relative to global output positions.
  gy = (jax.lax.broadcasted_iota(jnp.int32, (tile_y, tile_x), 0)
        .astype(jnp.float32) + (iy * tile_y + origin_y))
  gx = (jax.lax.broadcasted_iota(jnp.int32, (tile_y, tile_x), 1)
        .astype(jnp.float32) + (ix * tile_x + origin_x))
  dy = coords_ref[0, 0] - gy
  dx = coords_ref[0, 1] - gx

  planes_y = _weight_planes(dy, method)
  planes_x = _weight_planes(dx, method)

  copy.wait()
  win = window[:]

  # x-weights are recomputed per lattice point (cheap arithmetic via the
  # factored planes) — precomputing all planes overflows VMEM.
  acc = jnp.zeros((tile_y, tile_x), jnp.float32)
  norm_y = jnp.zeros((tile_y, tile_x), jnp.float32)
  for i in range(ry):
    w_y = _weight_at(dy, planes_y, sy0 + i, method)
    norm_y = norm_y + w_y
    inner = jnp.zeros((tile_y, tile_x), jnp.float32)
    for j in range(rx):
      w_x = _weight_at(dx, planes_x, sx0 + j, method)
      inner = inner + w_x * jax.lax.slice(
          win, (i, j), (i + tile_y, j + tile_x))
    acc = acc + w_y * inner

  if method == 'lanczos':
    norm_x = jnp.zeros((tile_y, tile_x), jnp.float32)
    for j in range(rx):
      norm_x = norm_x + _weight_at(dx, planes_x, sx0 + j, method)
    acc = acc / jnp.maximum(norm_y * norm_x, 1e-12)
  out_ref[0, 0] = acc


@functools.partial(
    jax.jit,
    static_argnames=['method', 'dy_lo', 'dy_hi', 'dx_lo', 'dx_hi',
                     'origin_y', 'origin_x', 'tile', 'interpret'])
def pallas_shift_warp(
    images: jnp.ndarray,
    coords: jnp.ndarray,
    method: str,
    dy_lo: int, dy_hi: int, dx_lo: int, dx_hi: int,
    origin_y: int = 0, origin_x: int = 0,
    tile: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
  """Warps [z, h, w] images by per-pixel coords, tile-resident in VMEM.

  Args:
    images: [z, h, w] source sections
    coords: [z, 2, oy, ox] (y, x) sampling positions in image coords
    method: interpolation kernel
    dy_lo..dx_hi: static displacement bounds (vs output position + origin)
    origin_y/origin_x: image coordinate of output pixel (0, 0)
    tile: output tile edge
    interpret: interpreter mode for CPU tests

  Returns:
    [z, oy, ox] warped output (0 outside the image / bounds / NaN coords)
  """
  nz, oy, ox = coords.shape[0], coords.shape[2], coords.shape[3]
  left = _LEFT[method]
  taps = _TAPS[method]
  sy0 = dy_lo - left
  sy1 = dy_hi + (taps - 1 - left)
  sx0 = dx_lo - left
  sx1 = dx_hi + (taps - 1 - left)
  ry = sy1 - sy0 + 1
  rx = sx1 - sx0 + 1

  tile_y = min(max(tile // 2, 8), -(-oy // 8) * 8)
  tile_x = min(tile, -(-ox // 128) * 128)
  gy = -(-oy // tile_y)
  gx = -(-ox // tile_x)

  win_r = -(-(tile_y + ry) // 8) * 8
  win_c = -(-(tile_x + rx) // 128) * 128

  # Zero padding (cval=0) so every window access is in range.
  h, w = images.shape[1:]
  pad_top = max(-(origin_y + sy0), 0)
  pad_lft = max(-(origin_x + sx0), 0)
  # DMA window starts must be (8, 128)-aligned: tile strides already are,
  # so align the static residue by growing the leading pads.
  pad_top += (-(pad_top + origin_y + sy0)) % 8
  pad_lft += (-(pad_lft + origin_x + sx0)) % 128
  pad_bot = max(origin_y + (gy - 1) * tile_y + sy0 + win_r - h, 0)
  pad_rgt = max(origin_x + (gx - 1) * tile_x + sx0 + win_c - w, 0)
  padded = jnp.pad(images.astype(jnp.float32),
                   ((0, 0), (pad_top, pad_bot), (pad_lft, pad_rgt)))

  coords_pad = jnp.pad(
      jnp.nan_to_num(coords.astype(jnp.float32), nan=1e9),
      ((0, 0), (0, 0), (0, gy * tile_y - oy), (0, gx * tile_x - ox)),
      constant_values=1e9)

  kernel = functools.partial(
      _warp_kernel, method=method, sy0=sy0, ry=ry, sx0=sx0, rx=rx,
      tile_y=tile_y, tile_x=tile_x, win_r=win_r, win_c=win_c,
      origin_y=origin_y, origin_x=origin_x, pad_top=pad_top,
      pad_lft=pad_lft)

  out = pl.pallas_call(
      kernel,
      grid=(nz, gy, gx),
      in_specs=[
          pl.BlockSpec((1, 2, tile_y, tile_x),
                       lambda z, iy, ix: (z, 0, iy, ix),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec(memory_space=pl.ANY),
      ],
      out_specs=pl.BlockSpec((1, 1, tile_y, tile_x),
                             lambda z, iy, ix: (z, 0, iy, ix),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((nz, 1, gy * tile_y, gx * tile_x),
                                     jnp.float32),
      scratch_shapes=[
          pltpu.VMEM((win_r, win_c), jnp.float32),
          pltpu.SemaphoreType.DMA,
      ],
      # Wide shift lattices (large ry*rx from big displacement bounds)
      # push Mosaic's scheduler past the default 16 MB scoped-VMEM
      # budget; the physical VMEM is 128 MB, so raise the cap.
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(coords_pad, padded)
  return out[:, 0, :oy, :ox]


def _warp_tiled_kernel(bases_ref, coords_ref, img_hbm, out_ref, window,
                       sem, *, method, sy0, ry, sx0, rx, tile_y, tile_x,
                       win_r, win_c, origin_y, origin_x, pad_top,
                       pad_lft, ntx):
  """Tiled twin of _warp_kernel: per-tile integer base displacements.

  The base (from the host-side tiled_shift_plan) removes the tile's bulk
  displacement, so the static lattice only spans the LOCAL variation —
  independent of the warp's global magnitude. DMA starts are rounded
  down to the (8, 128) f32 tiling and the window is realigned with two
  dynamic in-VMEM rolls (Mosaic requires aligned DMA starts; the base is
  an arbitrary integer).
  """
  z = pl.program_id(0)
  iy = pl.program_id(1)
  ix = pl.program_id(2)
  # bases live as a flat [z, nty*ntx*2] SMEM array (blocked SMEM specs
  # hit Mosaic's (8, 128) block-divisibility rule); scalar reads with
  # dynamic indices are fine.
  bidx = (iy * ntx + ix) * 2
  by = bases_ref[z, bidx]
  bx = bases_ref[z, bidx + 1]

  row_raw = pad_top + origin_y + iy * tile_y + by + sy0
  col_raw = pad_lft + origin_x + ix * tile_x + bx + sx0
  row_al = (row_raw // 8) * 8
  col_al = (col_raw // 128) * 128
  off_y = row_raw - row_al
  off_x = col_raw - col_al
  copy = pltpu.make_async_copy(
      img_hbm.at[z, pl.ds(row_al, win_r), pl.ds(col_al, win_c)], window,
      sem)
  copy.start()

  gy = (jax.lax.broadcasted_iota(jnp.int32, (tile_y, tile_x), 0)
        .astype(jnp.float32) + (iy * tile_y + origin_y))
  gx = (jax.lax.broadcasted_iota(jnp.int32, (tile_y, tile_x), 1)
        .astype(jnp.float32) + (ix * tile_x + origin_x))
  dy = coords_ref[0, 0] - gy - by.astype(jnp.float32)
  dx = coords_ref[0, 1] - gx - bx.astype(jnp.float32)

  planes_y = _weight_planes(dy, method)
  planes_x = _weight_planes(dx, method)

  copy.wait()
  win = window[:]
  # Realign: shift content left/up by the alignment residues.
  win = pltpu.roll(win, (win_r - off_y) % win_r, 0)
  win = pltpu.roll(win, (win_c - off_x) % win_c, 1)

  acc = jnp.zeros((tile_y, tile_x), jnp.float32)
  norm_y = jnp.zeros((tile_y, tile_x), jnp.float32)
  for i in range(ry):
    w_y = _weight_at(dy, planes_y, sy0 + i, method)
    norm_y = norm_y + w_y
    inner = jnp.zeros((tile_y, tile_x), jnp.float32)
    for j in range(rx):
      w_x = _weight_at(dx, planes_x, sx0 + j, method)
      inner = inner + w_x * jax.lax.slice(
          win, (i, j), (i + tile_y, j + tile_x))
    acc = acc + w_y * inner

  if method == 'lanczos':
    norm_x = jnp.zeros((tile_y, tile_x), jnp.float32)
    for j in range(rx):
      norm_x = norm_x + _weight_at(dx, planes_x, sx0 + j, method)
    acc = acc / jnp.maximum(norm_y * norm_x, 1e-12)
  out_ref[0, 0] = acc


def _weight_planes_scaled(d: jnp.ndarray):
  """Quarter-angle planes for the SCALED Lanczos weights (see below).

  Range-reduced modulo the quarter-angle period (8) like
  _weight_planes: callers pass small residuals today, but the f32
  absolute error of sin(pi d / 4) grows with |d| and the reduction is
  one mul-round-sub per pass.
  """
  d8 = d - 8.0 * jnp.round(d / 8.0)
  return (jnp.sin(jnp.pi * d8 / 4.0), jnp.cos(jnp.pi * d8 / 4.0))


def _weight_at_scaled(d, planes, s: int):
  """Lanczos4 tap weight up to a common per-pixel factor.

  The true tap weight factors as
      w_s(d) = [4 sin(pi d) / pi^2] * (-1)^s sin(pi (d - s)/4) / (d-s)^2
  where the bracket depends on d only — IDENTICAL for every tap s of a
  pixel. A normalized pass (u = sum w*v / sum w) is invariant under
  per-pixel scaling, so this returns only the per-tap factor: the sign
  folds into the angle-addition constants, the sin(pi d) plane and the
  4/pi^2 constant disappear, and rsqrt^2 replaces the divide — ~1/3
  fewer VPU ops per tap than _weight_at on a pass that runs
  (2*residual + taps) of these per pixel.

  At integer d the bracket vanishes (all true weights are 0 except the
  on-pixel tap's 1); the singular tap is replaced by 3e12, which
  dominates the normalized sum to <~1e-3 gray — below the two-pass
  kernel's existing approximation floor. Out-of-window and NaN taps
  are zeroed exactly as _weight_at. ONLY valid inside normalized
  passes; never mix with unscaled weights.
  """
  sin4, cos4 = planes
  sign = 1.0 if s % 2 == 0 else -1.0
  c_s = float(np.cos(np.pi * s / 4.0)) * sign
  s_s = float(np.sin(np.pi * s / 4.0)) * sign
  t = d - s
  st4 = sin4 * c_s - cos4 * s_s
  t2 = t * t
  inv = jax.lax.rsqrt(jnp.maximum(t2, 1e-24))
  w = st4 * inv * inv
  w = jnp.where(t2 < 1e-12, jnp.float32(3e12), w)
  return jnp.where(t2 < 16.0, w, 0.0)


def _warp_tiled_sep_kernel(bases_ref, coords_ref, img_hbm, out_ref,
                           window, sem, *, method, sy0, ry, sx0, rx,
                           tile_y, tile_x, win_r, win_c, origin_y,
                           origin_x, pad_top, pad_lft, ntx):
  """Two-pass separable variant of _warp_tiled_kernel.

  Factors the (ry x rx) shift lattice into an x-pass over the window's
  source rows followed by a y-pass over the filtered rows:
  O(rx + ry) weight-evals + MACs per pixel instead of O(ry * rx) —
  at residual=6 Lanczos4 that is 40 vs 400, and each eval carries a
  VPU divide.

  The factorization is approximate for dx fields that vary along y:
  the exact tensor product applies the OUTPUT pixel's x-weights on
  every source row of its y-tap stencil, while the x-pass here filters
  each source row once, with the x-weights of the output row it
  dominantly serves (window row r serves output rows r - i with the
  weight mass near i ~ -sy0, so row r borrows dx[clamp(r + sy0)] via
  edge extension). The sampled x-position thus differs from the exact
  kernel by |ddx/dy| * O(taps/2 + residual) pixels — zero when dx is
  constant along y, and sub-0.1 px for mesh-smooth alignment maps
  (gate: tests/test_pallas_warp.py two-pass bounds). A non-finite
  coordinate dims its y-neighbors within the tap window instead of
  staying pixel-local, and the caller pads coords by edge-replication
  (not the 1e9 sentinel) so border tiles stay clean — use the exact
  kernel when NaN locality matters.
  """
  z = pl.program_id(0)
  iy = pl.program_id(1)
  ix = pl.program_id(2)
  bidx = (iy * ntx + ix) * 2
  by = bases_ref[z, bidx]
  bx = bases_ref[z, bidx + 1]

  row_raw = pad_top + origin_y + iy * tile_y + by + sy0
  col_raw = pad_lft + origin_x + ix * tile_x + bx + sx0
  row_al = (row_raw // 8) * 8
  col_al = (col_raw // 128) * 128
  off_y = row_raw - row_al
  off_x = col_raw - col_al
  copy = pltpu.make_async_copy(
      img_hbm.at[z, pl.ds(row_al, win_r), pl.ds(col_al, win_c)], window,
      sem)
  copy.start()

  gy = (jax.lax.broadcasted_iota(jnp.int32, (tile_y, tile_x), 0)
        .astype(jnp.float32) + (iy * tile_y + origin_y))
  gx = (jax.lax.broadcasted_iota(jnp.int32, (tile_y, tile_x), 1)
        .astype(jnp.float32) + (ix * tile_x + origin_x))
  dy = coords_ref[0, 0] - gy - by.astype(jnp.float32)
  dx = coords_ref[0, 1] - gx - bx.astype(jnp.float32)

  # dx at source rows: window row r <- dx[clamp(r + sy0, 0, tile_y-1)],
  # first-order-corrected for the y-tap stencil's center: the weight
  # mass of output row t sits at source row ~ t + dy(t), so row r
  # dominantly serves t ~ (r + sy0) - dy; borrow dx there via
  # dx - dy * ddx/dy instead of a per-pixel row gather. This cancels
  # the dy-proportional part of the attribution error, leaving the
  # irreducible +-taps/2 stencil spread.
  d_up = jnp.concatenate([dx[0:1], dx[:tile_y - 1]], 0)
  d_dn = jnp.concatenate([dx[1:], dx[tile_y - 1:tile_y]], 0)
  dx_corr = dx - dy * ((d_dn - d_up) * 0.5)
  wr = tile_y + ry - 1
  top_n = -sy0
  bot_n = ry - 1 + sy0
  parts = []
  if top_n > 0:
    parts.append(jnp.broadcast_to(dx_corr[0:1], (top_n, tile_x)))
  parts.append(dx_corr)
  if bot_n > 0:
    parts.append(jnp.broadcast_to(dx_corr[tile_y - 1:tile_y],
                                  (bot_n, tile_x)))
  dx_ext = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)

  # Both passes normalize by their tap-weight sum, so the SCALED
  # weights (common per-pixel factor dropped — see _weight_at_scaled)
  # are exact here up to the 1e-3-gray singular-tap approximation.
  # Scaled weight sums can be negative (the dropped factor carries the
  # sign), so the normalization guards |norm| rather than clamping.
  lcz = method == 'lanczos'
  planes_y = (_weight_planes_scaled(dy) if lcz
              else _weight_planes(dy, method))
  planes_x = (_weight_planes_scaled(dx_ext) if lcz
              else _weight_planes(dx_ext, method))

  def weight(d, planes, s):
    return (_weight_at_scaled(d, planes, s) if lcz
            else _weight_at(d, planes, s, method))

  def norm_safe(v, n):
    return v / jnp.where(jnp.abs(n) < 1e-12, 1e-12, n)

  copy.wait()
  win = window[:]
  win = pltpu.roll(win, (win_r - off_y) % win_r, 0)
  win = pltpu.roll(win, (win_c - off_x) % win_c, 1)

  # x-pass: filter every source row once -> [wr, tile_x].
  u = jnp.zeros((wr, tile_x), jnp.float32)
  norm_x = jnp.zeros((wr, tile_x), jnp.float32)
  for j in range(rx):
    w_x = weight(dx_ext, planes_x, sx0 + j)
    norm_x = norm_x + w_x
    u = u + w_x * jax.lax.slice(win, (0, j), (wr, j + tile_x))
  if lcz:
    u = norm_safe(u, norm_x)

  # y-pass over the filtered rows -> [tile_y, tile_x].
  acc = jnp.zeros((tile_y, tile_x), jnp.float32)
  norm_y = jnp.zeros((tile_y, tile_x), jnp.float32)
  for i in range(ry):
    w_y = weight(dy, planes_y, sy0 + i)
    norm_y = norm_y + w_y
    acc = acc + w_y * jax.lax.slice(u, (i, 0), (i + tile_y, tile_x))
  if lcz:
    acc = norm_safe(acc, norm_y)
  out_ref[0, 0] = acc


def _warp_tiled_pruned_kernel(bases_ref, tb_ref, coords_ref, img_hbm,
                              out_ref, window, acc_ref, inner_ref,
                              ny_ref, nx_ref, sem, *, method, sy0, ry,
                              sx0, rx, tile_y, tile_x, win_r, win_c,
                              origin_y, origin_x, pad_top, pad_lft, ntx,
                              chunk=4):
  """Per-tile-pruned twin of _warp_tiled_kernel.

  The static lattice [0, ry) x [0, rx) is an ENVELOPE; each tile supplies
  its own active tap range (from the plan's per-tile displacement hull)
  through SMEM, and inactive rows / column chunks are skipped with
  pl.when. Taps outside a tile's range have exactly-zero kernel weight
  for every pixel of the tile (the hull bound plus the kernel support
  margin), so pruning is exact — it only skips provable zeros. Work per
  tile then scales with the LOCAL displacement variation while the
  compiled program covers the global envelope, which also lets a
  device-computed plan (shift_warp.tiled_plan_device) drive the kernel
  with no host round trip.

  Accumulators live in VMEM scratch (acc/inner/norm refs) because values
  cannot flow across pl.when regions.
  """
  z = pl.program_id(0)
  iy = pl.program_id(1)
  ix = pl.program_id(2)
  bidx = (iy * ntx + ix) * 2
  by = bases_ref[z, bidx]
  bx = bases_ref[z, bidx + 1]
  tidx = (iy * ntx + ix) * 4
  iy0 = tb_ref[z, tidx]
  iy1 = tb_ref[z, tidx + 1]
  jx0 = tb_ref[z, tidx + 2]
  jx1 = tb_ref[z, tidx + 3]

  row_raw = pad_top + origin_y + iy * tile_y + by + sy0
  col_raw = pad_lft + origin_x + ix * tile_x + bx + sx0
  row_al = (row_raw // 8) * 8
  col_al = (col_raw // 128) * 128
  off_y = row_raw - row_al
  off_x = col_raw - col_al
  copy = pltpu.make_async_copy(
      img_hbm.at[z, pl.ds(row_al, win_r), pl.ds(col_al, win_c)], window,
      sem)
  copy.start()

  gy = (jax.lax.broadcasted_iota(jnp.int32, (tile_y, tile_x), 0)
        .astype(jnp.float32) + (iy * tile_y + origin_y))
  gx = (jax.lax.broadcasted_iota(jnp.int32, (tile_y, tile_x), 1)
        .astype(jnp.float32) + (ix * tile_x + origin_x))
  dy = coords_ref[0, 0] - gy - by.astype(jnp.float32)
  dx = coords_ref[0, 1] - gx - bx.astype(jnp.float32)

  planes_y = _weight_planes(dy, method)
  planes_x = _weight_planes(dx, method)

  copy.wait()
  win = window[:]
  win = pltpu.roll(win, (win_r - off_y) % win_r, 0)
  win = pltpu.roll(win, (win_c - off_x) % win_c, 1)

  zero = jnp.zeros((tile_y, tile_x), jnp.float32)
  acc_ref[:] = zero
  if method == 'lanczos':
    ny_ref[:] = zero
    nx_ref[:] = zero
  del inner_ref  # row accumulators live in registers inside the branch

  # Predication granularity is a branch-overhead tradeoff: each pl.when
  # region costs scalar-core setup, so rows are predicated individually
  # (the y span is what per-tile hulls shrink most) and the x sweep in
  # halves; inside a region everything stays in registers and only one
  # read-modify-write of acc_ref happens per (row, half).
  half = -(-rx // 2)
  segs = [(0, half), (half, rx)] if rx > 1 else [(0, rx)]

  for i in range(ry):

    @pl.when((i >= iy0) & (i <= iy1))
    def _row(i=i):
      w_y = _weight_at(dy, planes_y, sy0 + i, method)
      if method == 'lanczos':
        ny_ref[:] = ny_ref[:] + w_y
      for j0, j1 in segs:

        @pl.when((j1 - 1 >= jx0) & (j0 <= jx1))
        def _seg(j0=j0, j1=j1, w_y=w_y):
          inner = zero
          for j in range(j0, j1):
            w_x = _weight_at(dx, planes_x, sx0 + j, method)
            inner = inner + w_x * jax.lax.slice(
                win, (i, j), (i + tile_y, j + tile_x))
          acc_ref[:] = acc_ref[:] + w_y * inner

  if method == 'lanczos':
    for j0, j1 in segs:

      @pl.when((j1 - 1 >= jx0) & (j0 <= jx1))
      def _norm(j0=j0, j1=j1):
        v = zero
        for j in range(j0, j1):
          v = v + _weight_at(dx, planes_x, sx0 + j, method)
        nx_ref[:] = nx_ref[:] + v

    out_ref[0, 0] = acc_ref[:] / jnp.maximum(ny_ref[:] * nx_ref[:],
                                             1e-12)
  else:
    out_ref[0, 0] = acc_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=['method', 'ry_lo', 'ry_hi', 'rx_lo', 'rx_hi',
                     'by_lo', 'by_hi', 'bx_lo', 'bx_hi', 'tile_y',
                     'tile_x', 'origin_y', 'origin_x', 'interpret',
                     'two_pass'])
def pallas_shift_warp_tiled(
    images: jnp.ndarray,
    coords: jnp.ndarray,
    bases: jnp.ndarray,
    method: str,
    ry_lo: int, ry_hi: int, rx_lo: int, rx_hi: int,
    by_lo: int, by_hi: int, bx_lo: int, bx_hi: int,
    tile_y: int, tile_x: int,
    origin_y: int = 0, origin_x: int = 0,
    interpret: bool = False,
    tile_bounds: jnp.ndarray | None = None,
    two_pass: bool = False,
) -> jnp.ndarray:
  """Warps [z, h, w] images with per-tile base displacements, in VMEM.

  Pallas twin of shift_warp.shift_warp_2d_tiled (same plan contract:
  bases from tiled_shift_plan, static residual + base bounds).

  Args:
    images: [z, h, w] source sections
    coords: [z, 2, oy, ox] (y, x) sampling positions in image coords
    bases: int32 [z, nty, ntx, 2] per-tile (y, x) base displacements
    ry_lo..rx_hi: static residual-displacement bounds
    by_lo..bx_hi: static bounds over all bases (sets image padding)
    tile_y/tile_x: plan tile shape (tile_y % 8 == 0, tile_x % 128 == 0)
    origin_y/origin_x: image coordinate of output pixel (0, 0)
    tile_bounds: optional int32 [z, nty, ntx, 4] per-tile residual
      bounds (y_lo, y_hi, x_lo, x_hi) from the plan; when given, the
      static bounds act as an envelope and each tile sweeps only its own
      (pruned) tap range — exact, since skipped taps have zero weight
    two_pass: run the separable two-pass kernel — O(rx + ry) instead of
      O(ry * rx) work per pixel, approximate for dx varying along y
      (see _warp_tiled_sep_kernel; error ~ |ddx/dy| * (taps/2 +
      residual) px sampling offset, zero for y-constant dx). Not
      combinable with tile_bounds.

  Returns:
    [z, oy, ox] warped output (0 outside image/bounds/NaN coords)
  """
  if two_pass and tile_bounds is not None:
    raise ValueError('two_pass and tile_bounds are mutually exclusive')
  nz, oy, ox = coords.shape[0], coords.shape[2], coords.shape[3]
  assert tile_y % 8 == 0 and tile_x % 128 == 0, (tile_y, tile_x)
  left = _LEFT[method]
  taps = _TAPS[method]
  sy0 = ry_lo - left
  sy1 = ry_hi + (taps - 1 - left)
  sx0 = rx_lo - left
  sx1 = rx_hi + (taps - 1 - left)
  ry = sy1 - sy0 + 1
  rx = sx1 - sx0 + 1

  nty = -(-oy // tile_y)
  ntx = -(-ox // tile_x)
  # +8 / +128: room for the alignment-rounding residues.
  win_r = -(-(tile_y + ry - 1 + 8) // 8) * 8
  win_c = -(-(tile_x + rx - 1 + 128) // 128) * 128

  h, w = images.shape[1:]
  pad_top = max(-(origin_y + by_lo + sy0), 0) + 8
  pad_lft = max(-(origin_x + bx_lo + sx0), 0) + 128
  pad_bot = max(origin_y + (nty - 1) * tile_y + by_hi + sy0 + win_r - h,
                0) + 8
  pad_rgt = max(origin_x + (ntx - 1) * tile_x + bx_hi + sx0 + win_c - w,
                0) + 128
  padded = jnp.pad(images.astype(jnp.float32),
                   ((0, 0), (pad_top, pad_bot), (pad_lft, pad_rgt)))

  pad_spec = ((0, 0), (0, 0), (0, nty * tile_y - oy),
              (0, ntx * tile_x - ox))
  coords_nn = jnp.nan_to_num(coords.astype(jnp.float32), nan=1e9)
  if two_pass:
    # Edge replication: the padded output region is cropped anyway, and
    # the sep kernel's dx row-extension must not borrow the 1e9
    # sentinel at the image border (it would zero real border rows).
    coords_pad = jnp.pad(coords_nn, pad_spec, mode='edge')
  else:
    coords_pad = jnp.pad(coords_nn, pad_spec, constant_values=1e9)

  bases_flat = bases.astype(jnp.int32).reshape(nz, nty * ntx * 2)
  common = dict(method=method, sy0=sy0, ry=ry, sx0=sx0, rx=rx,
                tile_y=tile_y, tile_x=tile_x, win_r=win_r, win_c=win_c,
                origin_y=origin_y, origin_x=origin_x, pad_top=pad_top,
                pad_lft=pad_lft, ntx=ntx)
  data_specs = [
      pl.BlockSpec((1, 2, tile_y, tile_x),
                   lambda z, iy, ix: (z, 0, iy, ix),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec(memory_space=pl.ANY),
  ]
  scratch = [pltpu.VMEM((win_r, win_c), jnp.float32)]
  if tile_bounds is None:
    kernel = functools.partial(
        _warp_tiled_sep_kernel if two_pass else _warp_tiled_kernel,
        **common)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + data_specs
    inputs = (bases_flat, coords_pad, padded)
  else:
    # Residual-bound values -> tap-index ranges within the envelope
    # lattice (tap i covers shift sy0 + i; residual r needs taps
    # [r_lo - left, r_hi + taps - 1 - left], i.e. indices
    # [r_lo - ry_lo, r_hi - ry_lo + taps - 1] — `left` cancels).
    tb = tile_bounds.astype(jnp.int32).reshape(nz, nty * ntx, 4)
    ty0 = jnp.clip(tb[..., 0] - ry_lo, 0, ry)
    ty1 = jnp.clip(tb[..., 1] - ry_lo + taps - 1, -1, ry - 1)
    tx0 = jnp.clip(tb[..., 2] - rx_lo, 0, rx)
    tx1 = jnp.clip(tb[..., 3] - rx_lo + taps - 1, -1, rx - 1)
    tb_flat = jnp.stack([ty0, ty1, tx0, tx1],
                        axis=-1).reshape(nz, nty * ntx * 4)
    kernel = functools.partial(_warp_tiled_pruned_kernel, **common)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM)] + data_specs
    inputs = (bases_flat, tb_flat, coords_pad, padded)
    scratch += [pltpu.VMEM((tile_y, tile_x), jnp.float32)
                for _ in range(3)]
    if method == 'lanczos':
      scratch.append(pltpu.VMEM((tile_y, tile_x), jnp.float32))
    else:
      # Unused norm scratch slots still need a placeholder shape.
      scratch.append(pltpu.VMEM((8, 128), jnp.float32))
  out = pl.pallas_call(
      kernel,
      grid=(nz, nty, ntx),
      in_specs=in_specs,
      out_specs=pl.BlockSpec((1, 1, tile_y, tile_x),
                             lambda z, iy, ix: (z, 0, iy, ix),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((nz, 1, nty * tile_y, ntx * tile_x),
                                     jnp.float32),
      scratch_shapes=scratch + [pltpu.SemaphoreType.DMA],
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(*inputs)
  return out[:, 0, :oy, :ox]


def _warp3d_kernel(coords_ref, vol_hbm, out_ref, window, sem, *, method,
                   s0, rz, ry, rx, tile, win_shape, origin, pads):
  """One output tile of the 3d shift-decomposed warp, VMEM-resident.

  3d twin of _warp_kernel: one halo-window DMA per tile, then the
  statically-unrolled (rz, ry, rx) shift lattice runs on the VPU with
  per-axis weight planes. Replaces shift_warp_3d's fori_loop, which
  re-reads the full padded volume from HBM on every lattice iteration
  (the measured 3d rendering bottleneck).
  """
  iz = pl.program_id(0)
  iy = pl.program_id(1)
  ix = pl.program_id(2)
  td, th, tw = tile

  z0 = pads[0] + origin[0] + iz * td + s0[0]
  y0 = pads[1] + origin[1] + iy * th + s0[1]
  x0 = pads[2] + origin[2] + ix * tw + s0[2]
  copy = pltpu.make_async_copy(
      vol_hbm.at[pl.ds(z0, win_shape[0]), pl.ds(y0, win_shape[1]),
                 pl.ds(x0, win_shape[2])], window, sem)
  copy.start()

  gz = (jax.lax.broadcasted_iota(jnp.int32, tile, 0).astype(jnp.float32)
        + (iz * td + origin[0]))
  gy = (jax.lax.broadcasted_iota(jnp.int32, tile, 1).astype(jnp.float32)
        + (iy * th + origin[1]))
  gx = (jax.lax.broadcasted_iota(jnp.int32, tile, 2).astype(jnp.float32)
        + (ix * tw + origin[2]))
  dz = coords_ref[0] - gz
  dy = coords_ref[1] - gy
  dx = coords_ref[2] - gx

  from sofima_tpu.ops import shift_warp
  wz = shift_warp.make_weight_fn(dz, method)
  wy = shift_warp.make_weight_fn(dy, method)
  wx = shift_warp.make_weight_fn(dx, method)

  copy.wait()
  win = window[:]

  acc = jnp.zeros(tile, jnp.float32)
  for i in range(rz):
    w_z = wz(s0[0] + i)
    acc_y = jnp.zeros(tile, jnp.float32)
    for j in range(ry):
      w_y = wy(s0[1] + j)
      acc_x = jnp.zeros(tile, jnp.float32)
      for k in range(rx):
        w_x = wx(s0[2] + k)
        acc_x = acc_x + w_x * jax.lax.slice(
            win, (i, j, k), (i + td, j + th, k + tw))
      acc_y = acc_y + w_y * acc_x
    acc = acc + w_z * acc_y
  out_ref[:] = acc


@functools.partial(
    jax.jit,
    static_argnames=['method', 'dz_lo', 'dz_hi', 'dy_lo', 'dy_hi',
                     'dx_lo', 'dx_hi', 'origin_z', 'origin_y', 'origin_x',
                     'tile', 'interpret'])
def pallas_shift_warp_3d(
    volume: jnp.ndarray,
    coords: jnp.ndarray,
    method: str,
    dz_lo: int, dz_hi: int, dy_lo: int, dy_hi: int, dx_lo: int, dx_hi: int,
    origin_z: int = 0, origin_y: int = 0, origin_x: int = 0,
    tile: tuple[int, int, int] = (8, 64, 256),
    interpret: bool = False,
) -> jnp.ndarray:
  """Warps a [d, h, w] volume by per-voxel coords, tile-resident in VMEM.

  Drop-in twin of shift_warp.shift_warp_3d (same contract: static
  displacement bounds, 0 outside the volume / bounds / NaN coords).
  """
  from sofima_tpu.ops.shift_warp import _LEFT, _TAPS

  oz, oy, ox = coords.shape[1:]
  left = _LEFT[method]
  taps = _TAPS[method]
  s0 = (dz_lo - left, dy_lo - left, dx_lo - left)
  s1 = (dz_hi + (taps - 1 - left), dy_hi + (taps - 1 - left),
        dx_hi + (taps - 1 - left))
  rz, ry, rx = [b - a + 1 for a, b in zip(s0, s1)]

  td = min(tile[0], oz)
  th = min(tile[1], -(-oy // 8) * 8)
  tw = min(tile[2], -(-ox // 128) * 128)
  gz, gy, gx = -(-oz // td), -(-oy // th), -(-ox // tw)

  win_shape = (td + rz - 1,
               -(-(th + ry - 1) // 8) * 8,
               -(-(tw + rx - 1) // 128) * 128)

  d, h, w = volume.shape
  pad0 = max(-(origin_z + s0[0]), 0)
  pad1 = max(-(origin_y + s0[1]), 0)
  pad2 = max(-(origin_x + s0[2]), 0)
  # DMA starts on the tiled (y, x) dims must be (8, 128)-aligned: tile
  # strides already are, so align the static residue via leading pads.
  pad1 += (-(pad1 + origin_y + s0[1])) % 8
  pad2 += (-(pad2 + origin_x + s0[2])) % 128
  pads = (pad0, pad1, pad2)
  pad_end = (
      max(pad0 + origin_z + (gz - 1) * td + s0[0] + win_shape[0] - pad0 - d,
          0),
      max(pad1 + origin_y + (gy - 1) * th + s0[1] + win_shape[1] - pad1 - h,
          0),
      max(pad2 + origin_x + (gx - 1) * tw + s0[2] + win_shape[2] - pad2 - w,
          0))
  padded = jnp.pad(volume.astype(jnp.float32),
                   tuple(zip(pads, pad_end)))

  coords_pad = jnp.pad(
      jnp.nan_to_num(coords.astype(jnp.float32), nan=1e9),
      ((0, 0), (0, gz * td - oz), (0, gy * th - oy), (0, gx * tw - ox)),
      constant_values=1e9)

  kernel = functools.partial(
      _warp3d_kernel, method=method, s0=s0, rz=rz, ry=ry, rx=rx,
      tile=(td, th, tw), win_shape=win_shape,
      origin=(origin_z, origin_y, origin_x), pads=pads)

  out = pl.pallas_call(
      kernel,
      grid=(gz, gy, gx),
      in_specs=[
          pl.BlockSpec((3, td, th, tw),
                       lambda z, y, x: (0, z, y, x),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec(memory_space=pl.ANY),
      ],
      out_specs=pl.BlockSpec((td, th, tw), lambda z, y, x: (z, y, x),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((gz * td, gy * th, gx * tw),
                                     jnp.float32),
      scratch_shapes=[
          pltpu.VMEM(win_shape, jnp.float32),
          pltpu.SemaphoreType.DMA,
      ],
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(coords_pad, padded)
  return out[:oz, :oy, :ox]


def warp_sections_pallas_tiled(images: jnp.ndarray, abs_map: jnp.ndarray,
                               map_grid_coords: jnp.ndarray, method: str,
                               plan: dict,
                               origin: tuple[int, int] = (0, 0),
                               interpret: bool = False) -> jnp.ndarray:
  """Pallas twin of shift_warp.warp_sections_shift_tiled.

  [z, c, y, x] images + [z, 2, my, mx] absolute maps + a
  tiled_shift_plan -> [z, c, oy, ox] rendered output via the VMEM
  per-tile-base kernel.
  """
  from sofima_tpu.ops import interp as interp_ops

  def densify(m):
    dense_x = interp_ops.grid_sample_linear(m[0], map_grid_coords)
    dense_y = interp_ops.grid_sample_linear(m[1], map_grid_coords)
    return jnp.stack([dense_y, dense_x])

  coords = jax.vmap(densify)(abs_map)  # [z, 2, oy, ox]
  bases = jnp.asarray(plan['bases'])
  tb = plan.get('tile_bounds')
  if tb is not None:
    tb = jnp.asarray(tb)
  outs = []
  for c in range(images.shape[1]):
    outs.append(pallas_shift_warp_tiled(
        images[:, c], coords, bases, method, *plan['residual_bounds'],
        *plan['base_bounds'], *plan['tile'], origin_y=origin[0],
        origin_x=origin[1], interpret=interpret, tile_bounds=tb))
  return jnp.stack(outs, axis=1)


def warp_sections_pallas(images: jnp.ndarray, abs_map: jnp.ndarray,
                         map_grid_coords: jnp.ndarray, method: str,
                         bounds: tuple[int, int, int, int],
                         origin: tuple[int, int] = (0, 0),
                         interpret: bool = False) -> jnp.ndarray:
  """Pallas equivalent of shift_warp.warp_sections_shift.

  Densifies the per-section maps (bilinear, extrapolating) and renders
  every (section, channel) plane with the VMEM-resident tile kernel.
  """
  from sofima_tpu.ops import interp as interp_ops

  def densify(m):
    dense_x = interp_ops.grid_sample_linear(m[0], map_grid_coords)
    dense_y = interp_ops.grid_sample_linear(m[1], map_grid_coords)
    return jnp.stack([dense_y, dense_x])

  coords = jax.vmap(densify)(abs_map)  # [z, 2, oy, ox]
  return warp_sections_pallas_coords(images, coords, method, bounds,
                                     origin, interpret)


def warp_sections_pallas_coords(images: jnp.ndarray, coords: jnp.ndarray,
                                method: str,
                                bounds: tuple[int, int, int, int],
                                origin: tuple[int, int] = (0, 0),
                                interpret: bool = False) -> jnp.ndarray:
  """Renders [z, c, h, w] images given precomputed dense [z, 2, oy, ox]
  (y, x) sampling coords."""
  dy_lo, dy_hi, dx_lo, dx_hi = bounds
  outs = []
  for c in range(images.shape[1]):
    outs.append(pallas_shift_warp(
        images[:, c], coords, method, dy_lo, dy_hi, dx_lo, dx_hi,
        origin_y=origin[0], origin_x=origin[1], interpret=interpret))
  return jnp.stack(outs, axis=1)
