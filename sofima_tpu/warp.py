"""Dense warping and montage rendering on device.

Capability parity with the reference renderer (/root/reference/warp.py):
  * `warp_subvolume` — warp [n, z, y, x] data by an inverse coordinate
    map. The reference densifies the map with scipy
    RegularGridInterpolator and resamples with OpenCV `cv.remap`
    (per-section host threads); here both stages are one jit device
    program per section batch: bilinear map densification
    (ops.interp.grid_sample_linear, with linear edge extrapolation) fused
    with a gather-based resampler supporting nearest / linear / cubic
    (Keys a=-0.75, OpenCV-compatible) / Lanczos4 kernels.
  * `ndimage_warp` — N-d warp with work-box tiling (RAM control) and an
    injectable `map_coordinates` for decorator composition.
  * `render_tiles` — montage rendering with margins, optional on-device
    CLAHE (ops.clahe), NaN-safe inverted-map generation.
  * `warp_points` — point-set warping.

Segmentation (uint64) data is relabeled to contiguous int32 on the host,
warped with nearest-neighbor sampling, and relabeled back — preserving
>2^32 ids exactly.
"""

from __future__ import annotations

import collections
import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sofima_tpu import map_utils
from sofima_tpu.ops import clahe as clahe_ops
from sofima_tpu.ops import interp
from sofima_tpu.utils.bounding_box import BoundingBox
from sofima_tpu.utils.box_generator import BoxGenerator

_INTERP_METHODS = ('nearest', 'linear', 'cubic', 'lanczos')


def _normalize_interp(interpolation: str | None, dtype) -> str:
  if dtype == np.uint64:
    return 'nearest'
  if interpolation is None:
    return 'lanczos'
  if interpolation not in _INTERP_METHODS:
    raise ValueError(f'Unknown interpolation {interpolation!r}; '
                     f'expected one of {_INTERP_METHODS}')
  return interpolation


# -- Segmentation relabeling --------------------------------------------------


def make_contiguous(data: np.ndarray) -> tuple[np.ndarray, list]:
  """Maps arbitrary uint64 ids to dense [0, n) int space.

  Uses the multithreaded native relabel kernel when available.
  """
  orig_ids = np.unique(data)
  from sofima_tpu import native
  low = native.relabel(data, orig_ids)
  if low is None:
    low = np.searchsorted(orig_ids, data)
  return low, list(zip(orig_ids.tolist(), range(len(orig_ids))))


def _restore_labels(data: np.ndarray, orig_to_low: list,
                    old_uids: frozenset) -> np.ndarray:
  new_uids = frozenset(np.unique(data.astype(np.uint64)))
  diff = (new_uids - old_uids) - {0}
  assert not diff, f'Unexpected new ids after warp: {diff}'
  orig_ids = np.array([o for o, _ in orig_to_low], dtype=np.uint64)
  return orig_ids[data.astype(np.int64)]


# -- Core fused warp kernels --------------------------------------------------


@functools.partial(jax.jit, static_argnames=['method'])
def _warp_sections(images: jnp.ndarray, abs_map: jnp.ndarray,
                   map_grid_coords: jnp.ndarray, method: str) -> jnp.ndarray:
  """Densify + resample a batch of sections in one program.

  Args:
    images: [z, c, y, x] source data (float32)
    abs_map: [z, 2, my, mx] per-section absolute inverse maps (x, y chans)
      in source-image pixel coordinates
    map_grid_coords: [2, oy, ox] output-pixel coords in map-node units
      (y, x order)
    method: resampling kernel

  Returns:
    [z, c, oy, ox] warped data (float32; NaN where the map was invalid)
  """

  def one_section(img_c, m):
    dense_x = interp.grid_sample_linear(m[0], map_grid_coords)
    dense_y = interp.grid_sample_linear(m[1], map_grid_coords)
    coords = jnp.stack([dense_y, dense_x])
    return jax.vmap(
        lambda img: interp.sample(img, coords, method=method,
                                  mode='constant', cval=0.0))(img_c)

  return jax.vmap(one_section)(images, abs_map)


def warp_subvolume(
    image: np.ndarray,
    image_box: BoundingBox,
    coord_map: np.ndarray,
    map_box: BoundingBox,
    stride: float,
    out_box: BoundingBox,
    interpolation: str | None = None,
    offset: float = 0.0,
    parallelism: int = 1,
) -> np.ndarray:
  """Warps [n, z, y, x] data by an inverse coordinate map.

  Every map entry gives the source coordinate in `image` to read from.
  All sections and channels are processed in a single device dispatch;
  `parallelism` is accepted for API compatibility and ignored (the device
  program is already parallel).
  """
  del parallelism
  assert image.ndim == 4
  orig_dtype = image.dtype

  orig_to_low = None
  if image.dtype == np.uint64:
    method = 'nearest'
    image, orig_to_low = make_contiguous(image)
    assert image.max() < 2**31
    image = image.astype(np.int32)
    old_uids = frozenset(np.unique(image))
  else:
    method = _normalize_interp(interpolation, image.dtype)
    if image.dtype == np.uint32:
      if image.max() >= 2**16:
        raise ValueError('Image warping supports up to uint16; use uint64 '
                         'for segmentation data.')
      image = image.astype(np.uint16)

  skipped = np.all(np.isnan(coord_map), axis=(0, 2, 3))

  # Inverse map in absolute source-image-local pixel coordinates.
  abs_map = map_utils.to_absolute(np.asarray(coord_map, np.float32), stride)
  abs_map += (map_box.start[:2] * stride
              - image_box.start[:2] + offset).reshape(2, 1, 1, 1).astype(
                  np.float32)

  # Output pixel coordinates in map-node units (for map densification).
  out_y = (np.arange(int(out_box.size[1]), dtype=np.float32)
           + out_box.start[1] - offset) / stride - map_box.start[1]
  out_x = (np.arange(int(out_box.size[0]), dtype=np.float32)
           + out_box.start[0] - offset) / stride - map_box.start[0]
  grid = np.stack(np.meshgrid(out_y, out_x, indexing='ij'))

  images_j = jnp.asarray(
      np.moveaxis(image.astype(np.float32), 1, 0))  # [z, c, y, x]
  maps_j = jnp.asarray(np.moveaxis(abs_map, 1, 0))  # [z, 2, my, mx]

  # Displacement bounds (output-pixel space) from the small map arrays:
  # when the deformation is bounded, use the gather-free shift-decomposed
  # warp (ops.shift_warp) — the fast path on TPU.
  from sofima_tpu.ops import shift_warp
  # Displacement = map value minus the node's own image-local position.
  node_y = ((np.arange(abs_map.shape[2], dtype=np.float64)
             + map_box.start[1]) * stride - image_box.start[1])
  node_x = ((np.arange(abs_map.shape[3], dtype=np.float64)
             + map_box.start[0]) * stride - image_box.start[0])
  disp_y = abs_map[1] - node_y[None, :, None]
  disp_x = abs_map[0] - node_x[None, None, :]

  origin_y = float(out_box.start[1] - image_box.start[1] - offset)
  origin_x = float(out_box.start[0] - image_box.start[0] - offset)
  shift_ok = (origin_y.is_integer() and origin_x.is_integer()
              and not np.all(np.isnan(disp_y))
              and not np.all(np.isnan(disp_x)))
  on_tpu = jax.devices()[0].platform in ('tpu', 'axon')
  use_shift = shift_ok
  tiled_plan = None
  if use_shift:
    # Exact node-hull bounds (linear densification is a convex
    # combination of node displacements + linear edge extrapolation).
    dy_lo, dy_hi, dx_lo, dx_hi = shift_warp.displacement_bounds_from_disp(
        disp_y, disp_x)
    use_shift = (
        max(dy_hi - dy_lo, dx_hi - dx_lo) <= shift_warp.MAX_SHIFT_RANGE
        and shift_warp.shift_path_profitable(dy_hi - dy_lo,
                                             dx_hi - dx_lo, method,
                                             pallas=on_tpu))
  if shift_ok and (not use_shift or on_tpu):
    # TILED shift decomposition: a per-tile integer base offset reduces
    # the lattice to the LOCAL displacement variation (alignment warps
    # are smooth). Mandatory for large global displacements; on TPU also
    # preferred over the single-lattice path when it meaningfully
    # shrinks the lattice (the Pallas executor amortizes the per-tile
    # base handling to two in-VMEM rolls).
    tiled_plan = shift_warp.tiled_shift_plan(
        disp_y, disp_x,
        node_y - origin_y, node_x - origin_x,
        (int(out_box.size[1]), int(out_box.size[0])))
    if tiled_plan is not None:
      ry_lo, ry_hi, rx_lo, rx_hi = tiled_plan['residual_bounds']
      if not (max(ry_hi - ry_lo, rx_hi - rx_lo) <= shift_warp.MAX_SHIFT_RANGE
              and shift_warp.shift_path_profitable(ry_hi - ry_lo,
                                                   rx_hi - rx_lo, method,
                                                   pallas=on_tpu)):
        tiled_plan = None
    if use_shift and tiled_plan is not None:
      taps = shift_warp._TAPS[method]
      global_iters = (dy_hi - dy_lo + taps) * (dx_hi - dx_lo + taps)
      tiled_iters = (ry_hi - ry_lo + taps) * (rx_hi - rx_lo + taps)
      if on_tpu and 1.5 * tiled_iters < global_iters:
        use_shift = False  # take the tiled branch below
      else:
        tiled_plan = None

  if use_shift:
    bounds = (dy_lo, dy_hi, dx_lo, dx_hi)
    origin_yx = (int(origin_y), int(origin_x))
    if jax.devices()[0].platform in ('tpu', 'axon'):
      # VMEM-resident Pallas tile kernel: the fast path on TPU.
      from sofima_tpu.ops import pallas_warp
      # Prefer gather-free periodic densification (integer stride/phase).
      phase_y = float(out_box.start[1] - offset - map_box.start[1] * stride)
      phase_x = float(out_box.start[0] - offset - map_box.start[0] * stride)
      max_phase = 8 * stride  # repeat-based upsampling scales with phase
      if (float(stride).is_integer() and phase_y.is_integer()
          and phase_x.is_integer() and 0 <= phase_y <= max_phase
          and 0 <= phase_x <= max_phase):
        dense = jax.vmap(lambda m: interp.upsample_map_linear(
            m, int(stride), (int(phase_y), int(phase_x)),
            (int(out_box.size[1]), int(out_box.size[0]))))(maps_j)
        coords = jnp.stack([dense[:, 1], dense[:, 0]], axis=1)
        warped = np.array(pallas_warp.warp_sections_pallas_coords(
            images_j, coords, method, bounds, origin=origin_yx))
      else:
        warped = np.array(pallas_warp.warp_sections_pallas(
            images_j, maps_j, jnp.asarray(grid), method, bounds,
            origin=origin_yx))
    else:
      warped = np.array(shift_warp.warp_sections_shift(
          images_j, maps_j, jnp.asarray(grid), method, bounds,
          origin=origin_yx))
  elif tiled_plan is not None:
    ty, tx = tiled_plan['tile']
    if on_tpu and ty % 8 == 0 and tx % 128 == 0:
      from sofima_tpu.ops import pallas_warp
      warped = np.array(pallas_warp.warp_sections_pallas_tiled(
          images_j, maps_j, jnp.asarray(grid), method, tiled_plan,
          origin=(int(origin_y), int(origin_x))))
    else:
      warped = np.array(shift_warp.warp_sections_shift_tiled(
          images_j, maps_j, jnp.asarray(grid), method, tiled_plan,
          origin=(int(origin_y), int(origin_x))))
  else:
    warped = np.array(
        _warp_sections(images_j, maps_j, jnp.asarray(grid), method))
  warped = np.moveaxis(warped, 0, 1)  # [c, z, oy, ox]
  warped = np.nan_to_num(warped)
  warped[:, skipped] = 0.0

  if orig_to_low is not None:
    out = _restore_labels(np.rint(warped).astype(np.int64), orig_to_low,
                          old_uids)
  elif np.issubdtype(orig_dtype, np.integer):
    info = np.iinfo(orig_dtype)
    out = np.clip(np.rint(warped), info.min, info.max).astype(orig_dtype)
  else:
    out = warped.astype(orig_dtype)
  return out


def _default_map_coordinates(data, coords, order):
  return np.asarray(
      interp.map_coordinates(jnp.asarray(np.asarray(data, np.float32)),
                             jnp.asarray(np.array(coords, np.float32)),
                             order=order, mode='constant', cval=np.nan))


# Test hook: force the shared-compile 3d path on CPU (Pallas interpret).
_FORCE_SHARED_3D = False


def _densify_box_3d(src_map_zyx, box_start, inv_stride, neg_off, box_shape):
  """Trilinear map densification for one work box, fully on device.

  `src_map_zyx`: [3, gz, gy, gx] absolute source coords at map nodes
  (channels z, y, x); `box_start` [3] global output-voxel origin of the
  box; returns [3, *box_shape] per-voxel source sampling coords.
  """
  coords = jnp.stack([
      (box_start[a] + jax.lax.broadcasted_iota(jnp.float32, box_shape, a)
       + neg_off[a]) * inv_stride[a] for a in range(3)
  ])
  return jnp.stack([
      interp.grid_sample_linear(src_map_zyx[a], coords) for a in range(3)
  ])


@functools.partial(jax.jit, static_argnames=['box_shape'])
def _dense_disp_stats_3d(src_map_zyx, box_start, inv_stride, neg_off,
                         box_shape):
  """[3, 2] per-axis (min, max) displacement of one box's dense map."""
  dense = _densify_box_3d(src_map_zyx, box_start, inv_stride, neg_off,
                          box_shape)
  disp = jnp.stack([
      dense[a] - jax.lax.broadcasted_iota(jnp.float32, box_shape, a)
      - box_start[a] for a in range(3)
  ])
  flat = disp.reshape(3, -1)
  return jnp.stack([jnp.nanmin(flat, axis=1), jnp.nanmax(flat, axis=1)],
                   axis=1)


@functools.partial(
    jax.jit, static_argnames=['box_shape', 'win_shape', 'rng', 'method'])
def _shared_shift_warp_3d(padded, src_map_zyx, box_start, shift, w0,
                          inv_stride, neg_off, box_shape, win_shape, rng,
                          method):
  """Densify + window + Pallas shift warp of ONE work box, one dispatch.

  All box-dependent quantities (`box_start`, `shift` = box origin +
  integer base + shared lattice offset, `w0` = window start into the
  padded volume) are DYNAMIC, and the displacement lattice (`rng`) is
  shared across boxes — so every work box of a render (and the paired
  image/weights warps) reuses ONE compiled program. This is what makes
  `pallas_shift_warp_3d` (40-95 s Mosaic compile per static
  configuration, scratch/probe_warp3d_compile.py) viable inside the
  box-tiled `ndimage_warp` driver.
  """
  dense = _densify_box_3d(src_map_zyx, box_start, inv_stride, neg_off,
                          box_shape)
  dense_local = dense - shift[:, None, None, None]
  win = jax.lax.dynamic_slice(padded, (w0[0], w0[1], w0[2]), win_shape)
  from sofima_tpu.ops import pallas_warp
  interpret = jax.default_backend() not in ('tpu', 'axon')
  return pallas_warp.pallas_shift_warp_3d(
      win, dense_local, method, 0, rng[0], 0, rng[1], 0, rng[2],
      interpret=interpret)


def _ndimage_warp_shared_3d(image, src_map, stride, gen, warped,
                            offset_zyx, method):
  """Shared-compile TPU path for 3d `ndimage_warp`.

  Per-box shift-warp lattices compile a fresh Mosaic kernel for every
  distinct (bounds, origin) combination — 40-95 s each on this relay —
  while the kernel itself runs in ~35 ms (scratch/probe_warp3d_run.py:
  0.24-0.65 GVox/s vs 0.01 for the XLA gather). This driver instead:

    1. measures every box's exact dense displacement range on device
       (6 scalars fetched per box),
    2. derives ONE shared bucketed lattice + per-box integer bases,
    3. pads the volume once so each box's source window is a
       `dynamic_slice` (dynamic start, static shape), and
    4. warps every box through the single jitted program above.

  The dense maps never leave the device (the per-box gather path used
  to round-trip ~100 MB/box through the host link). Returns the filled
  `warped` array, or None when the shared lattice is unprofitable
  (falls back to the per-box cost-model path).
  """
  from sofima_tpu.ops import shift_warp
  taps = shift_warp._TAPS[method]

  boxes = [gen.generate(i)[1] for i in range(gen.num_boxes)]
  shapes = {tuple(int(v) for v in b.size[::-1]) for b in boxes}
  if len(shapes) != 1:
    return None  # mixed box shapes: let the per-box path handle it
  box_shape = shapes.pop()

  src_zyx = np.ascontiguousarray(src_map[::-1]).astype(np.float32)
  src_j = jnp.asarray(src_zyx)
  inv_stride = jnp.asarray([1.0 / s for s in stride], jnp.float32)
  neg_off = jnp.asarray([-float(o) for o in offset_zyx[:3]], jnp.float32)

  stats, starts = [], []
  for b in boxes:
    st = np.asarray(b.start[::-1], np.float32)
    starts.append(st)
    stats.append(np.asarray(_dense_disp_stats_3d(
        src_j, jnp.asarray(st), inv_stride, neg_off, box_shape)))

  live = [np.isfinite(s).all() for s in stats]
  if not any(live):
    return None
  bases = np.zeros((len(boxes), 3), np.int64)
  rel_lo = np.full(3, np.inf)
  rel_hi = np.full(3, -np.inf)
  for i, (s, ok) in enumerate(zip(stats, live)):
    if not ok:
      continue
    bases[i] = np.rint((s[:, 0] + s[:, 1]) / 2.0).astype(np.int64)
    rel_lo = np.minimum(rel_lo, s[:, 0] - bases[i])
    rel_hi = np.maximum(rel_hi, s[:, 1] - bases[i])
  bucket = 4
  lo_s = (np.floor((rel_lo - 1) / bucket) * bucket).astype(np.int64)
  hi_s = (np.ceil((rel_hi + 1) / bucket) * bucket).astype(np.int64)
  rng = hi_s - lo_s

  iters = float(np.prod(rng + taps))
  if (int(rng.max()) > shift_warp.MAX_SHIFT_RANGE
      or iters * shift_warp.PALLAS_SHIFT_COST_PER_ITER
      >= taps**3 * shift_warp.GATHER_COST_PER_TAP):
    return None

  # Shared window geometry + padded volume (padded shape bucketed so
  # similarly-sized tiles of one render share the compile).
  win_shape = tuple(int(box_shape[a] + rng[a] + taps) for a in range(3))
  shifts = np.stack([
      st.astype(np.int64) + bases[i] + lo_s for i, st in enumerate(starts)
  ])
  vol = np.asarray(image.shape, np.int64)
  m_lo = np.maximum(0, -shifts.min(axis=0))
  end_need = (shifts + np.asarray(win_shape)).max(axis=0) + m_lo
  pad_to = np.array([16, 64, 128], np.int64)
  padded_dims = np.maximum(end_need, vol + m_lo)
  padded_dims = -(-padded_dims // pad_to) * pad_to
  m_hi = padded_dims - vol - m_lo
  padded = jnp.pad(jnp.asarray(image.astype(np.float32)),
                   tuple((int(a), int(b)) for a, b in zip(m_lo, m_hi)))

  integer_out = np.issubdtype(image.dtype, np.integer)
  for i, b in enumerate(boxes):
    if live[i]:
      w0 = shifts[i] + m_lo
      assert (w0 >= 0).all() and (
          w0 + np.asarray(win_shape) <= padded_dims).all()
      sub = np.asarray(_shared_shift_warp_3d(
          padded, src_j, jnp.asarray(starts[i]),
          jnp.asarray(shifts[i].astype(np.float32)),
          jnp.asarray(w0.astype(np.int32)), inv_stride, neg_off,
          box_shape, win_shape, tuple(int(r) for r in rng), method))
      if integer_out:
        sub = np.rint(sub)
    else:
      sub = np.zeros(box_shape, np.float32)
    out_sub = gen.index_to_cropped_box(i)
    rel = out_sub.translate(-b.start)
    warped[out_sub.to_slice3d()] = sub[rel.to_slice3d()].astype(
        warped.dtype)
  return warped


def ndimage_warp(
    image: np.ndarray,
    coord_map: np.ndarray,
    stride: Sequence[float],
    work_size: Sequence[int],
    overlap: Sequence[int],
    order: int = 1,
    map_coordinates=None,
    image_box: BoundingBox | None = None,
    map_box: BoundingBox | None = None,
    out_box: BoundingBox | None = None,
    parallelism: int = 1,
    out_scale: Sequence[float] = (1.0, 1.0, 1.0),
) -> np.ndarray:
  """N-d warp via dense coordinate lookup, tiled into work boxes.

  Args:
    image: [z,] y, x data to warp
    coord_map: [N, [z,] y, x] inverse coordinate map
    stride: [z,] y, x map node spacing in pixels
    work_size: xy[z] tile size (RAM control)
    overlap: xy[z] tile overlap
    order: 0, 1 or 3 (nearest/linear/cubic)
    map_coordinates: optional override with ndimage.map_coordinates
      signature (used by decorators to inject custom samplers)
    image_box/map_box/out_box: optional bounding boxes anchoring the data,
      the map, and the output in a global coordinate system
    parallelism: accepted for API compatibility (device is parallel)
    out_scale: xy[z] output-voxel / source-voxel scale for
      downsampling-aware rendering

  Returns:
    warped image covering out_box (or the image extent)
  """
  del parallelism
  if map_coordinates is None:
    map_coordinates = _default_map_coordinates

  shape = coord_map.shape[1:]
  dim = len(shape)
  assert dim == len(stride) == len(overlap) == len(work_size)
  if dim != image.ndim:
    raise ValueError(f'Dim mismatch: image {image.ndim} vs map {dim}')

  orig_to_low = None
  if image.dtype == np.uint64:
    image, orig_to_low = make_contiguous(image)
    old_uids = frozenset(np.unique(image))
    image = image.astype(np.int32)
    order = 0

  src_map = map_utils.to_absolute(np.asarray(coord_map, np.float32), stride)
  if map_box is not None:
    if image_box is None:
      raise ValueError('image_box required when map_box is given.')
    src_map += (map_box.start[:dim] * np.asarray(stride)[::-1]
                - image_box.start[:dim] / np.asarray(out_scale)[:dim]
                ).reshape((dim,) + (1,) * dim)
  reshaper = (slice(None),) + (np.newaxis,) * dim
  src_map = src_map * np.asarray(out_scale[:dim])[reshaper]

  sub_dim = 0
  image_size_xyz = image.shape[::-1]
  if dim == 2:
    work_size = list(work_size) + [1]
    overlap = list(overlap) + [0]
    image_size_xyz = list(image_size_xyz) + [1]
    sub_dim = 1

  if out_box is not None:
    warped = np.zeros(shape=tuple(int(s) for s in out_box.size[::-1]),
                      dtype=image.dtype)
  else:
    warped = np.zeros_like(image)
    out_box = BoundingBox(start=(0, 0, 0), size=image_size_xyz)

  gen = BoxGenerator(
      outer_box=BoundingBox(start=(0, 0, 0), size=out_box.size),
      box_size=work_size, box_overlap=overlap, back_shift_small_boxes=True)

  if map_box is not None:
    offset_zyx = (map_box.start * np.asarray(stride)[::-1]
                  - out_box.start)[::-1]
  else:
    offset_zyx = np.zeros(3)

  use_builtin = map_coordinates is _default_map_coordinates
  order_method = {0: 'nearest', 1: 'linear', 3: 'cubic'}
  image_j = None

  if (use_builtin and dim == 3 and order in order_method
      and (_FORCE_SHARED_3D
           or jax.devices()[0].platform in ('tpu', 'axon'))):
    res = _ndimage_warp_shared_3d(image, src_map, stride, gen, warped,
                                  offset_zyx, order_method[order])
    if res is not None:
      if orig_to_low is not None:
        return _restore_labels(res.astype(np.int64), orig_to_low, old_uids)
      return res.astype(image.dtype)

  def _shift_warp_box(dense, box_start_zyx):
    """Gather-free warp of one work box via the shift decomposition.

    Derives a per-box integer base displacement (so the static lattice
    only spans the box-local displacement variation) and dispatches to
    shift_warp_2d/3d. Returns None when unprofitable or degenerate.
    """
    nonlocal image_j
    from sofima_tpu.ops import shift_warp
    if order not in order_method:
      return None
    method = order_method[order]
    own = np.mgrid[tuple(np.s_[0:s] for s in dense[0].shape)]
    bucket = 4
    bases, bounds = [], []
    for d_abs, o, start in zip(dense, own, box_start_zyx):
      disp = d_abs - (o + float(start))
      if not np.isfinite(disp).any():
        return None
      lo, hi = np.nanmin(disp), np.nanmax(disp)
      base = int(np.rint((lo + hi) / 2.0))
      r_lo = int(np.floor((lo - base - 1) / bucket) * bucket)
      r_hi = int(np.ceil((hi - base + 1) / bucket) * bucket)
      bases.append(base)
      bounds.append((r_lo, r_hi))
    taps = shift_warp._TAPS[method]
    iters = np.prod([hi - lo + taps for lo, hi in bounds])
    on_tpu = jax.devices()[0].platform in ('tpu', 'axon')
    per_iter = (shift_warp.PALLAS_SHIFT_COST_PER_ITER if on_tpu
                else shift_warp.SHIFT_COST_PER_ITER)
    if (max(hi - lo for lo, hi in bounds) > shift_warp.MAX_SHIFT_RANGE
        or iters * per_iter
        >= taps**dim * shift_warp.GATHER_COST_PER_TAP):
      return None
    if image_j is None:
      image_j = jnp.asarray(image.astype(np.float32))
    coords_j = jnp.asarray(np.stack(dense).astype(np.float32))
    origins = tuple(int(s) + b for s, b in zip(box_start_zyx, bases))
    if dim == 2:
      (dy_lo, dy_hi), (dx_lo, dx_hi) = bounds
      if on_tpu:
        from sofima_tpu.ops import pallas_warp
        return np.asarray(pallas_warp.pallas_shift_warp(
            image_j[jnp.newaxis], coords_j[jnp.newaxis], method,
            dy_lo, dy_hi, dx_lo, dx_hi, origins[0], origins[1]))[0]
      return np.asarray(shift_warp.shift_warp_2d(
          image_j, coords_j, method, dy_lo, dy_hi, dx_lo, dx_hi,
          origins[0], origins[1]))
    (dz_lo, dz_hi), (dy_lo, dy_hi), (dx_lo, dx_hi) = bounds
    if on_tpu:
      # VMEM-tile kernel: shift_warp_3d's fori_loop re-reads the full
      # padded volume from HBM per lattice point.
      from sofima_tpu.ops import pallas_warp
      return np.asarray(pallas_warp.pallas_shift_warp_3d(
          image_j, coords_j, method, dz_lo, dz_hi, dy_lo, dy_hi,
          dx_lo, dx_hi, origins[0], origins[1], origins[2]))
    return np.asarray(shift_warp.shift_warp_3d(
        image_j, coords_j, method, dz_lo, dz_hi, dy_lo, dy_hi,
        dx_lo, dx_hi, origins[0], origins[1], origins[2]))

  for i in range(gen.num_boxes):
    _, in_box = gen.generate(i)
    sel = [np.s_[int(s):int(e)] for s, e in zip(
        in_box.start[::-1][sub_dim:], in_box.end[::-1][sub_dim:])]
    box_coords = np.mgrid[tuple(sel)].astype(np.float32)
    map_coords = [(c - o) / s for c, s, o in zip(
        box_coords, stride, offset_zyx[sub_dim:] if dim == 3
        else offset_zyx[sub_dim:][:dim])]

    if use_builtin:
      # Densify with linear *extrapolation* past the last map node (same
      # contract as warp_subvolume's grid interpolator) so a map without
      # edge context doesn't poison the border.
      coords_j = jnp.asarray(np.stack(map_coords))
      dense = [np.asarray(interp.grid_sample_linear(
          jnp.asarray(chan), coords_j)) for chan in src_map[::-1]]
    else:
      dense = [map_coordinates(chan, map_coords, order=1)
               for chan in src_map[::-1]]

    sub_warped = None
    if use_builtin:
      sub_warped = _shift_warp_box(
          dense, in_box.start[::-1][sub_dim:].astype(np.int64))
    if sub_warped is None:
      sub_warped = map_coordinates(image, dense, order=order)
    sub_warped = np.nan_to_num(sub_warped)
    if np.issubdtype(image.dtype, np.integer):
      sub_warped = np.rint(sub_warped)

    out_sub = gen.index_to_cropped_box(i)
    rel = out_sub.translate(-in_box.start)
    warped[out_sub.to_slice3d()[sub_dim:]] = sub_warped[
        rel.to_slice3d()[sub_dim:]].astype(warped.dtype)

  if orig_to_low is not None:
    warped = _restore_labels(warped.astype(np.int64), orig_to_low, old_uids)
    return warped
  return warped.astype(image.dtype)


def render_tiles(
    tiles: dict[tuple[int, int], np.ndarray],
    coord_maps: dict[tuple[int, int], np.ndarray],
    stride: tuple[int, int] = (20, 20),
    margin: int = 50,
    parallelism: int = 1,
    width: int | None = None,
    height: int | None = None,
    use_clahe: bool = False,
    clahe_kwargs=None,
    margin_overrides: dict[tuple[int, int],
                           tuple[int, int, int, int]] | None = None,
    return_warped_tiles: bool = False,
    tile_masks: dict[tuple[int, int], np.ndarray] | None = None,
):
  """Warps a collection of tiles into one montage image.

  Args:
    tiles: (x, y) -> [ty, tx] tile image
    coord_maps: (x, y) -> [2, 1, my, mx] forward coordinate map per tile
    stride: map node spacing (only equal XY strides supported)
    margin: pixels at tile edges excluded from rendering
    parallelism: accepted for API compatibility
    width/height: output size (inferred if omitted)
    use_clahe: apply on-device CLAHE before warping
    clahe_kwargs: forwarded to ops.clahe.equalize_adapthist
    margin_overrides: (x, y) -> (top, bottom, left, right) margins
    return_warped_tiles: also return per-tile warped content + offsets
    tile_masks: (x, y) -> bool array; True marks pixels to render

  Returns:
    (canvas, mask) or (canvas, mask, {(x, y): (x0, y0, warped)}).
  """
  del parallelism
  if stride[0] != stride[1]:
    raise NotImplementedError('Only equal XY strides are supported.')

  any_tile = next(iter(tiles.values()))
  img_yx = any_tile.shape
  image_box = BoundingBox(start=(0, 0, 0), size=(img_yx[1], img_yx[0], 1))
  map_yx = next(iter(coord_maps.values())).shape[-2:]
  map_box = BoundingBox(start=(0, 0, 0), size=(map_yx[1], map_yx[0], 1))

  if width is None or height is None:
    max_x = max(x for x, _ in tiles)
    max_y = max(y for _, y in tiles)
    height, width = img_yx[0] * (max_y + 1), img_yx[1] * (max_x + 1)

  canvas = np.zeros((height, width), dtype=any_tile.dtype)
  canvas_mask = np.zeros((height, width), dtype=bool)
  warped_map: dict[tuple[int, int], Any] = {}
  clahe_kwargs = clahe_kwargs or {}

  for (tile_x, tile_y), coord_map in coord_maps.items():
    img = tiles.get((tile_x, tile_y))
    if img is None:
      continue

    tile_mask = None
    if tile_masks is not None:
      tile_mask = tile_masks.get((tile_x, tile_y))

    tg_box = map_utils.outer_box(coord_map, map_box, stride[0])
    tg_box = tg_box.adjusted_by(start=(-1, -1, 0), end=(1, 1, 0))
    inv = map_utils.invert_map(coord_map, map_box, tg_box, stride[0])
    inv = map_utils.fill_missing(inv, extrapolate=True)

    mask = np.zeros_like(img)
    if margin_overrides is not None and (tile_x, tile_y) in margin_overrides:
      top, bottom, left, right = margin_overrides[tile_x, tile_y]
      mask[top:-(bottom + 1), left:-(right + 1)] = 1
    else:
      mask[margin:-(margin + 1), margin:-(margin + 1)] = 1

    if use_clahe:
      img = (clahe_ops.equalize_adapthist(img, **clahe_kwargs)
             * np.iinfo(img.dtype).max).astype(img.dtype)

    if tile_mask is not None:
      mask[tile_mask == 0] = 0

    stacked = np.concatenate([
        img[np.newaxis, np.newaxis], mask[np.newaxis, np.newaxis]], axis=0)

    out_box = BoundingBox(
        start=((tg_box.start[0] + 1) * stride[1],
               (tg_box.start[1] + 1) * stride[0], 0),
        size=(int(tg_box.size[0] * stride[1]),
              int(tg_box.size[1] * stride[0]), 1))

    warped = warp_subvolume(stacked, image_box, inv, tg_box, stride[0],
                            out_box=out_box)
    warped_img = warped[0, 0]
    warped_mask = warped[1, 0].astype(bool)

    y0 = img_yx[0] * tile_y + int(out_box.start[1])
    x0 = img_yx[1] * tile_x + int(out_box.start[0])
    if x0 < 0:
      warped_img = warped_img[:, -x0:]
      warped_mask = warped_mask[:, -x0:]
      x0 = 0
    if y0 < 0:
      warped_img = warped_img[-y0:, :]
      warped_mask = warped_mask[-y0:, :]
      y0 = 0

    target = canvas[y0:y0 + warped_img.shape[0], x0:x0 + warped_img.shape[1]]
    th, tw = target.shape
    warped_img = warped_img[:th, :tw]
    warped_mask = warped_mask[:th, :tw]

    if return_warped_tiles:
      warped_map[(tile_x, tile_y)] = (x0, y0, warped_img)

    canvas_mask[y0:y0 + th, x0:x0 + tw][warped_mask] = True
    warped_mask = warped_mask & (warped_img > 0)
    target[warped_mask] = warped_img[warped_mask]

  if return_warped_tiles:
    return canvas, canvas_mask, warped_map
  return canvas, canvas_mask


def warp_points(points: np.ndarray, coord_map: np.ndarray,
                map_box: BoundingBox, stride: float) -> np.ndarray:
  """Warps [n, 3] XYZ points through a [2, z, y, x] coordinate map.

  Integer input dtypes are preserved (coordinates rounded).
  """
  points = np.asarray(points)
  assert points.ndim == 2 and points.shape[1] == 3
  assert coord_map.shape[0] == 2

  abs_map = map_utils.to_absolute(np.asarray(coord_map, np.float32), stride)
  abs_map += (map_box.start[:2] * stride).reshape(2, 1, 1, 1).astype(
      np.float32)

  by_z = collections.defaultdict(list)
  for i, p in enumerate(points):
    by_z[p[2]].append(i)

  ret = points.copy()
  for z, idxs in by_z.items():
    z_rel = int(z - map_box.start[2])
    # Query coords in map-node units (y, x).
    qy = (points[idxs, 1] / stride) - map_box.start[1]
    qx = (points[idxs, 0] / stride) - map_box.start[0]
    coords = jnp.asarray(np.stack([qy, qx]).astype(np.float32))
    dx = np.asarray(interp.grid_sample_linear(
        jnp.asarray(abs_map[0, z_rel]), coords))
    dy = np.asarray(interp.grid_sample_linear(
        jnp.asarray(abs_map[1, z_rel]), coords))
    if np.issubdtype(ret.dtype, np.integer):
      dx = np.round(dx).astype(ret.dtype)
      dy = np.round(dy).astype(ret.dtype)
    ret[idxs, 0] = dx
    ret[idxs, 1] = dy
  return ret
