"""Rigid (coarse) tile stitching.

Two stages (capability parity with /root/reference/stitch_rigid.py):
  1. estimate a coarse XY offset between every pair of nearest-neighbor
     tiles via a single full-overlap masked cross-correlation, searching
     over several overlap widths and dynamic-range thresholds with a
     consistency-vs-peak-ratio preference;
  2. place all tiles by relaxing a spring system in which each tile is
     one node and springs encode the desired NN offsets
     (`elastic_tile_mesh`), solved with the FIRE mesh solver.

The tile-offset spring forces are expressed through one generic
channel/axis stencil instead of per-family unrolled blocks; dynamic-range
masks are computed with on-device moving max/min windows.
"""

from __future__ import annotations

import functools
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from sofima_tpu import flow_field
from sofima_tpu import mesh

TileXY = tuple[int, int]
MaskMap = Mapping[TileXY, np.ndarray]
Vector = tuple[int, ...]


@functools.partial(jax.jit, static_argnames=['filter_size'])
def _dynamic_range_mask(img: jnp.ndarray, range_limit: float,
                        filter_size: int) -> jnp.ndarray:
  """True where the local max-min range is below `range_limit`."""
  window = (filter_size,) * img.ndim
  strides = (1,) * img.ndim
  hi = jax.lax.reduce_window(img, -jnp.inf, jax.lax.max, window, strides,
                             'SAME')
  lo = jax.lax.reduce_window(img, jnp.inf, jax.lax.min, window, strides,
                             'SAME')
  return (hi - lo) < range_limit


def _estimate_offset(a: np.ndarray, b: np.ndarray, range_limit: float,
                     filter_size: int = 10,
                     masks: tuple[np.ndarray, np.ndarray] | None = None,
                     ) -> tuple[list[float], float]:
  """Single global offset between overlap crops `a` (pre) and `b` (post).

  Returns ([x_offset, y_offset], |peak ratio|).
  """
  a_f = jnp.asarray(a, jnp.float32)
  b_f = jnp.asarray(b, jnp.float32)
  a_mask = np.asarray(_dynamic_range_mask(a_f, range_limit, filter_size))
  b_mask = np.asarray(_dynamic_range_mask(b_f, range_limit, filter_size))
  if masks is not None:
    a_mask |= masks[0]
    b_mask |= masks[1]

  mfc = flow_field.JAXMaskedXCorrWithStatsCalculator()
  xo, yo, _, pr = mfc.flow_field(
      np.asarray(a, np.float32), np.asarray(b, np.float32),
      pre_mask=a_mask, post_mask=b_mask, patch_size=a.shape, step=(1, 1),
      batch_size=1).squeeze()
  return [xo, yo], abs(pr)


def _overlap_crops(pre: np.ndarray, post: np.ndarray, overlap: int,
                   axis: int):
  """Crops the facing `overlap`-wide strips of an adjacent tile pair."""
  if axis == 0:  # horizontal neighbors: right edge of pre, left of post
    return pre[:, -overlap:], post[:, :overlap]
  return pre[-overlap:, :], post[:overlap, :]


def _select_offset(get_estimate, overlaps, min_range, min_overlap: int,
                   max_ortho_shift: int, axis: int):
  """Preference logic over precomputable (range_limit, overlap) estimates.

  Preference order (per range limit): a unique-peak estimate terminates
  the search immediately; otherwise two consecutive overlap estimates
  within 20 px of each other; otherwise the valid estimate with the best
  peak ratio. Returns (inf, inf) if nothing valid was found.

  `get_estimate(range_limit, overlap) -> ([x_off, y_off], |peak ratio|)`
  supplies the raw estimates (sequential host xcorr or a batched device
  precompute); the `overlap` subtraction along `axis` happens here so
  both suppliers share identical semantics.
  """

  def valid(off):
    return (abs(off[1 - axis]) < max_ortho_shift
            and abs(off[axis]) >= min_overlap)

  result = None
  for range_limit in min_range:
    estimates = []
    best_pr, best_idx = 0.0, -1
    for overlap in overlaps:
      offset, pr = get_estimate(range_limit, overlap)
      offset = list(offset)
      offset[axis] -= overlap

      if pr == 0.0:  # single unambiguous peak
        return offset
      estimates.append(offset)
      if pr > best_pr and valid(offset):
        best_pr, best_idx = pr, len(estimates) - 1

    min_diff, min_idx = np.inf, 0
    for i, (off0, off1) in enumerate(zip(estimates, estimates[1:])):
      diff = abs(off1[axis] - off0[axis])
      if diff < min_diff and valid(off1):
        min_diff, min_idx = diff, i

    if min_diff < 20:  # two consistent consecutive estimates
      result = estimates[min_idx + 1]
      break
    if best_idx >= 0:
      result = estimates[best_idx]
      break

  if result is None or abs(result[axis]) < min_overlap:
    return [np.inf, np.inf]
  return result


def _find_offset(pre: np.ndarray, post: np.ndarray, overlaps, min_range,
                 min_overlap: int, max_ortho_shift: int, axis: int,
                 filter_size: int, masks=None):
  """Searches overlap widths/range limits for a reliable offset estimate.

  Sequential host driver: one device xcorr per (range_limit, overlap)
  probe, early-exiting per `_select_offset`'s preference order.
  """

  def get_estimate(range_limit, overlap):
    ov_masks = None
    if masks is not None:
      ma, mb = _overlap_crops(masks[0], masks[1], overlap, axis)
      # Drop overlap masking if it would blank the whole strip.
      ma = np.zeros_like(ma) if ma.all() else ma
      mb = np.zeros_like(mb) if mb.all() else mb
      ov_masks = (ma, mb)

    a, b = _overlap_crops(pre, post, overlap, axis)
    return _estimate_offset(a, b, range_limit, filter_size, ov_masks)

  return _select_offset(get_estimate, overlaps, min_range, min_overlap,
                        max_ortho_shift, axis)


@functools.partial(jax.jit,
                   static_argnames=['range_limits', 'filter_size',
                                    'max_masked'])
def _strip_peaks_batched(pre_strips: jnp.ndarray, post_strips: jnp.ndarray,
                         range_limits: tuple[float, ...], filter_size: int,
                         max_masked: float = 0.75) -> jnp.ndarray:
  """Full-strip masked-xcorr peak stats for a batch of tile-pair strips.

  The device twin of `_estimate_offset` over all pairs at once: for each
  dynamic-range limit, build the flat-region masks, deselect strips whose
  mask occupancy reaches `max_masked` (the flow-field driver's patch
  deselection), then run ONE batched masked NCC + peak extraction.

  Args:
    pre_strips/post_strips: [b, sy, sx] facing overlap strips
    range_limits: dynamic-range thresholds to evaluate (static)
    filter_size: moving max-min window
    max_masked: occupancy deselection threshold

  Returns:
    [len(range_limits), b, 4] rows (x, y, sharpness, peak ratio), NaN
    rows for deselected strips — exactly what a sequence of batch-of-1
    `_estimate_offset` calls produces (per_item thresholds).
  """
  window = (1, filter_size, filter_size)
  strides = (1, 1, 1)

  def local_range(img):
    hi = jax.lax.reduce_window(img, -jnp.inf, jax.lax.max, window, strides,
                               'SAME')
    lo = jax.lax.reduce_window(img, jnp.inf, jax.lax.min, window, strides,
                               'SAME')
    return hi - lo

  pre_f = pre_strips.astype(jnp.float32)
  post_f = post_strips.astype(jnp.float32)
  range_pre = local_range(pre_f)
  range_post = local_range(post_f)
  center = tuple(np.asarray(pre_strips.shape[-2:]) - 1)

  def one_limit(limit):
    pre_mask = range_pre < limit
    post_mask = range_post < limit
    occ_pre = jnp.mean(pre_mask.astype(jnp.float32), axis=(-2, -1))
    occ_post = jnp.mean(post_mask.astype(jnp.float32), axis=(-2, -1))
    deselect = (occ_pre >= max_masked) | (occ_post >= max_masked)

    def masked_mean(img, mask):
      s = jnp.sum(jnp.where(mask, 0.0, img), axis=(-2, -1), keepdims=True)
      n = jnp.sum(jnp.where(mask, 0.0, 1.0), axis=(-2, -1), keepdims=True)
      return s / jnp.maximum(n, 1.0)

    xc = flow_field.masked_xcorr(
        pre_f - masked_mean(pre_f, pre_mask),
        post_f - masked_mean(post_f, post_mask),
        pre_mask, post_mask, use_jax=True, dim=2, per_item=True)
    rows = flow_field._batched_peaks(xc, center, min_distance=2,
                                     threshold_rel=0.5, peak_radius=5)
    return jnp.where(deselect[:, None], jnp.nan, rows)

  return jax.lax.map(one_limit,
                     jnp.asarray(range_limits, jnp.float32))


def compute_coarse_offsets_batched(
    yx_shape: tuple[int, int],
    tile_map: Mapping[TileXY, Any],
    overlaps_xy=((200, 300), (200, 300)),
    min_range=(10, 100, 0),
    min_overlap: int = 160,
    filter_size: int = 10,
) -> tuple[np.ndarray, np.ndarray]:
  """Device-batched twin of `compute_coarse_offsets`.

  Per axis and overlap width, the facing strips of EVERY adjacent tile
  pair are stacked and cross-correlated in one device program per
  (overlap, all range limits) — 4 dispatches total for the default
  search grid instead of one host round trip per probe. Tile values may
  be device arrays (jnp), in which case strip slicing happens on device
  and no tile pixels cross the host link at all; the only d2h traffic is
  a [limits, pairs, 4] stats array per dispatch. The preference logic is
  the shared `_select_offset`, so the returned offsets match the
  sequential path (same estimates, same tie-breaks; external masks are
  not supported here — use `compute_coarse_offsets`).
  """
  conns = []
  for axis in range(2):
    conn = np.full((2, 1, yx_shape[0], yx_shape[1]), np.nan)
    dx, dy = (1, 0) if axis == 0 else (0, 1)
    pairs = [((x, y), (x + dx, y + dy))
             for y in range(yx_shape[0] - dy)
             for x in range(yx_shape[1] - dx)
             if (x, y) in tile_map and (x + dx, y + dy) in tile_map]
    if not pairs:
      conns.append(conn)
      continue

    peaks = {}  # overlap -> [n_limits, n_pairs, 4] host array
    for overlap in overlaps_xy[axis]:
      pre_strips = jnp.stack(
          [_overlap_crops(tile_map[a], tile_map[b], overlap, axis)[0]
           for a, b in pairs])
      post_strips = jnp.stack(
          [_overlap_crops(tile_map[a], tile_map[b], overlap, axis)[1]
           for a, b in pairs])
      peaks[overlap] = np.asarray(
          _strip_peaks_batched(pre_strips, post_strips, tuple(min_range),
                               filter_size))

    limit_idx = {rl: i for i, rl in enumerate(min_range)}
    ov_idx = {ov: i for i, ov in enumerate(overlaps_xy[axis])}
    for pair_i, ((x, y), _) in enumerate(pairs):

      def get_estimate(range_limit, overlap, pair_i=pair_i):
        row = peaks[overlap][limit_idx[range_limit], pair_i]
        return [row[0], row[1]], abs(row[3])

      conn[:, 0, y, x] = _select_offset(
          get_estimate, overlaps_xy[axis], min_range, min_overlap,
          max(overlaps_xy[1 - axis]), axis)
    conns.append(conn)

  return conns[0], conns[1]


def compute_coarse_offsets(
    yx_shape: tuple[int, int],
    tile_map: Mapping[TileXY, np.ndarray],
    overlaps_xy=((200, 300), (200, 300)),
    min_range=(10, 100, 0),
    min_overlap: int = 160,
    filter_size: int = 10,
    mask_map: MaskMap | None = None,
) -> tuple[np.ndarray, np.ndarray]:
  """Coarse offset between every adjacent tile pair of a grid.

  Returns (conn_x, conn_y), each [2, 1, ys, xs]: the XY offset between
  tiles (x, y)→(x+1, y) / (x, y)→(x, y+1), computed with the latter tile
  as the moving image. inf marks failed estimates, NaN missing tiles.
  """

  def tile_masks(key_a, key_b, axis):
    if mask_map is None:
      return None
    width = max(overlaps_xy[axis])
    return _overlap_crops(mask_map[key_a], mask_map[key_b], width, axis)

  conn_x = np.full((2, 1, yx_shape[0], yx_shape[1]), np.nan)
  for x in range(yx_shape[1] - 1):
    for y in range(yx_shape[0]):
      if (x, y) not in tile_map or (x + 1, y) not in tile_map:
        continue
      conn_x[:, 0, y, x] = _find_offset(
          tile_map[(x, y)], tile_map[(x + 1, y)], overlaps_xy[0], min_range,
          min_overlap, max(overlaps_xy[1]), 0, filter_size,
          tile_masks((x, y), (x + 1, y), 0))

  conn_y = np.full((2, 1, yx_shape[0], yx_shape[1]), np.nan)
  for y in range(yx_shape[0] - 1):
    for x in range(yx_shape[1]):
      if (x, y) not in tile_map or (x, y + 1) not in tile_map:
        continue
      conn_y[:, 0, y, x] = _find_offset(
          tile_map[(x, y)], tile_map[(x, y + 1)], overlaps_xy[1], min_range,
          min_overlap, max(overlaps_xy[0]), 1, filter_size,
          tile_masks((x, y), (x, y + 1), 1))

  return conn_x, conn_y


def interpolate_missing_offsets(conn: np.ndarray, axis: int,
                                max_r: int = 4) -> np.ndarray:
  """Replaces inf offsets with the mean of nearest finite neighbors.

  Searches up to `max_r` steps along `axis` (-1 for x, -2 for y);
  modifies `conn` in place and returns it.
  """
  if conn.ndim != 4:
    raise ValueError('conn array must have rank 4')

  missing = np.isinf(conn[0, 0])
  for y, x in np.argwhere(missing):
    found = []
    for r in range(1, max_r):
      for sign in (-1, 1):
        pos = [0, 0, y, x]
        pos[axis] += sign * r
        if 0 <= pos[axis] < conn.shape[axis] and np.isfinite(
            conn[0, 0, pos[2], pos[3]]):
          found.append(conn[:, 0, pos[2], pos[3]])
      if found:
        break
    if found:
      conn[:, 0, y, x] = np.mean(found, axis=0)
  return conn


def _offset_springs(x: jnp.ndarray, combos) -> jnp.ndarray:
  """Sum of linear offset-matching spring forces.

  Each combo is (channel, grid_axis, target): the difference of channel
  `channel` between grid neighbors along `grid_axis` (-1: x, -2: y)
  should equal `target`. For a pair (i, i+1): f = Δ - target acts as +f
  on node i and -f on node i+1.
  """
  f_tot = jnp.zeros_like(x)
  nc = x.shape[0]
  for channel, axis, target in combos:
    lo = [np.s_[:]] * x.ndim
    hi = [np.s_[:]] * x.ndim
    lo[axis] = np.s_[:-1]
    hi[axis] = np.s_[1:]
    diff = x[channel][tuple(hi[1:])] - x[channel][tuple(lo[1:])]
    t = target[tuple(lo[1:])]
    f = jnp.nan_to_num(diff - t)
    # Expand to all channels with zeros except `channel`.
    full = jnp.zeros((nc,) + f.shape, x.dtype).at[channel].set(f)
    pad_lo = [(0, 0)] * x.ndim
    pad_hi = [(0, 0)] * x.ndim
    pad_lo[axis] = (0, 1)  # scatter +f onto node i
    pad_hi[axis] = (1, 0)  # scatter -f onto node i+1
    f_tot = f_tot + jnp.pad(full, pad_lo) - jnp.pad(full, pad_hi)
  return f_tot


def elastic_tile_mesh(x: jnp.ndarray, cx: jnp.ndarray, cy: jnp.ndarray,
                      k=None, stride=None, prefer_orig_order=False,
                      links=None) -> jnp.ndarray:
  """Force on a 2d tile grid pulling NN offsets toward (cx, cy).

  x: [2, z, y, x] tile node positions; cx/cy: [2, z, y, x] desired offsets
  between (x,y)→(x+1,y) / (x,y)→(x,y+1) tiles. Extra arguments exist for
  mesh-solver signature compatibility.
  """
  del k, stride, prefer_orig_order, links
  combos = [
      (0, -1, cx[0]),  # x spacing of horizontal neighbors
      (1, -2, cy[1]),  # y spacing of vertical neighbors
      (0, -2, cy[0]),  # x shear of vertical neighbors
      (1, -1, cx[1]),  # y shear of horizontal neighbors
  ]
  return _offset_springs(x, combos)


def elastic_tile_mesh_3d(x: jnp.ndarray, cx: jnp.ndarray, cy: jnp.ndarray,
                         k=None, stride=None, prefer_orig_order=False,
                         links=None) -> jnp.ndarray:
  """3d variant of `elastic_tile_mesh` ([3, z, y, x] nodes, XYZ offsets)."""
  del k, stride, prefer_orig_order, links
  combos = [
      (0, -1, cx[0]), (1, -2, cy[1]),
      (0, -2, cy[0]), (1, -1, cx[1]),
      (2, -1, cx[2]), (2, -2, cy[2]),  # z coupling
  ]
  return _offset_springs(x, combos)


def optimize_coarse_mesh(cx: np.ndarray, cy: np.ndarray,
                         cfg: mesh.IntegrationConfig | None = None,
                         mesh_fn=elastic_tile_mesh) -> np.ndarray:
  """Relaxes the tile spring system; returns per-tile position offsets."""
  if cfg is None:
    cfg = mesh.IntegrationConfig(
        dt=0.001, gamma=0.0, k0=0.0, k=0.1, stride=(1, 1), num_iters=1000,
        max_iters=100000, stop_v_max=0.001, dt_max=100)

  # NaN targets (missing tiles) contribute no force: _offset_springs
  # nan_to_nums the per-spring force. inf entries (failed estimates) must
  # be fixed with interpolate_missing_offsets before solving.
  cx_j = jnp.asarray(cx, jnp.float32)
  cy_j = jnp.asarray(cy, jnp.float32)

  def _force(x, *args, **kwargs):
    return mesh_fn(x, cx_j, cy_j, *args, **kwargs)

  x, _, _ = mesh.relax_mesh(
      jnp.zeros_like(jnp.asarray(cx, jnp.float32)), None, cfg,
      mesh_force=_force)
  return np.array(x)
