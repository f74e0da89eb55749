"""Shift-decomposed warping: gather-free dense resampling for TPU.

XLA lowers per-pixel gathers to scalar code on TPU (~50M elements/s —
1000x below HBM bandwidth), which makes classic remap formulations the
bottleneck of the rendering path. This module exploits the structure of
alignment warps: displacement fields are SMOOTH and BOUNDED, so the
resampling sum

    out[p] = sum_k  K(frac(p) - k) * img[base(p) + k]

can be reorganized over absolute integer shifts s:

    out[p] = sum_{s in [lo, hi+taps)^2}  Ky(dy(p) - sy) * Kx(dx(p) - sx)
                                         * img_padded[p + s]

where every term is a STATIC slice of the padded image times per-pixel
separable weights — pure VPU multiply-adds, no gathers at all. Cost
scales with the displacement range instead of the tap count, so Lanczos4
costs the same as bilinear for a given deformation magnitude.

The displacement bounds are static (host-derived from the coordinate map,
which is tiny, and bucketed to limit recompilation). For displacement
ranges beyond ~100 px, warp at a coarser granularity (the processors
already subdivide work spatially) or fall back to the gather sampler.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from sofima_tpu.ops import interp as interp_ops


def _kernel_weight(t: jnp.ndarray, method: str) -> jnp.ndarray:
  """Interpolation kernel K(t) evaluated elementwise (support varies)."""
  if method == 'nearest':
    return ((t >= -0.5) & (t < 0.5)).astype(jnp.float32)
  if method == 'linear':
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))
  if method == 'cubic':
    a = -0.75
    at = jnp.abs(t)
    near = (a + 2.0) * at**3 - (a + 3.0) * at**2 + 1.0
    far = a * at**3 - 5.0 * a * at**2 + 8.0 * a * at - 4.0 * a
    return jnp.where(at <= 1.0, near, jnp.where(at < 2.0, far, 0.0))
  if method == 'lanczos':
    x = jnp.pi * t
    w = jnp.where(
        jnp.abs(t) < 1e-6, 1.0,
        4.0 * jnp.sin(x) * jnp.sin(x / 4.0) / jnp.maximum(x * x, 1e-12))
    return jnp.where(jnp.abs(t) < 4.0, w, 0.0)
  raise ValueError(f'Unknown method {method!r}')


_TAPS = {'nearest': 1, 'linear': 2, 'cubic': 4, 'lanczos': 8}
# Kernel support radius on each side of the base tap.
_LEFT = {'nearest': 0, 'linear': 0, 'cubic': 1, 'lanczos': 3}


@functools.partial(
    jax.jit,
    static_argnames=['method', 'dy_lo', 'dy_hi', 'dx_lo', 'dx_hi'])
def shift_warp_2d(
    image: jnp.ndarray,
    coords: jnp.ndarray,
    method: str,
    dy_lo: int, dy_hi: int, dx_lo: int, dx_hi: int,
) -> jnp.ndarray:
  """Warps a [y, x] image given per-pixel source coords, gather-free.

  Args:
    image: [h, w] source
    coords: [2, oy, ox] (y, x) source sampling positions; out[p] =
      interp(image, coords[:, p])
    method: 'nearest' | 'linear' | 'cubic' | 'lanczos'
    dy_lo/dy_hi/dx_lo/dx_hi: static integer bounds of the displacement
      coords[c] - output_position[c] (inclusive); samples whose
      displacement leaves these bounds read zeros

  Returns:
    [oy, ox] warped image (float32); out-of-image samples are 0, NaN
    coords produce 0.
  """
  oy, ox = coords.shape[1:]
  image = image.astype(jnp.float32)

  left = _LEFT[method]
  taps = _TAPS[method]
  # Absolute shift range: base displacement plus kernel support.
  sy0 = int(np.floor(dy_lo)) - left
  sy1 = int(np.floor(dy_hi)) + (taps - 1 - left)
  sx0 = int(np.floor(dx_lo)) - left
  sx1 = int(np.floor(dx_hi)) + (taps - 1 - left)

  yy = jnp.arange(oy, dtype=jnp.float32)[:, None]
  xx = jnp.arange(ox, dtype=jnp.float32)[None, :]
  dy = jnp.nan_to_num(coords[0], nan=1e9) - yy  # [oy, ox]
  dx = jnp.nan_to_num(coords[1], nan=1e9) - xx

  # Pad so that img_padded[y + s - sy0, x + s - sx0] is always in range.
  pad_top, pad_bot = max(-sy0, 0), max(sy1 + oy - image.shape[0] + 1, 0)
  pad_lft, pad_rgt = max(-sx0, 0), max(sx1 + ox - image.shape[1] + 1, 0)
  padded = jnp.pad(image, ((pad_top, pad_bot), (pad_lft, pad_rgt)))

  # Precompute separable weight planes for every absolute shift.
  wy = [_kernel_weight(dy - s, method) for s in range(sy0, sy1 + 1)]
  wx = [_kernel_weight(dx - s, method) for s in range(sx0, sx1 + 1)]

  if method == 'lanczos':
    # Lanczos weights are normalized over the 8 contributing taps.
    norm_y = sum(wy)
    norm_x = sum(wx)
    wy = [w / jnp.maximum(norm_y, 1e-12) for w in wy]
    wx = [w / jnp.maximum(norm_x, 1e-12) for w in wx]

  out = jnp.zeros((oy, ox), jnp.float32)
  for iy, s_y in enumerate(range(sy0, sy1 + 1)):
    row_origin = pad_top + s_y
    # Accumulate the x-sweep for this row shift first (separable).
    inner = jnp.zeros((oy, ox), jnp.float32)
    for ix, s_x in enumerate(range(sx0, sx1 + 1)):
      window = jax.lax.dynamic_slice(
          padded, (row_origin, pad_lft + s_x), (oy, ox))
      inner = inner + wx[ix] * window
    out = out + wy[iy] * inner
  return out


def displacement_bounds(abs_map: np.ndarray, map_grid_coords: np.ndarray,
                        stride: float = 1.0,
                        bucket: int = 8) -> tuple[int, int, int, int]:
  """Static displacement bounds from a (small) absolute coordinate map.

  Args:
    abs_map: [2, my, mx] absolute source positions at map nodes (x, y
      channel order, pixels)
    map_grid_coords: unused placeholder for API symmetry
    stride: map node spacing in pixels
    bucket: bounds are rounded outward to multiples of this to limit the
      number of distinct compiled programs

  Returns:
    (dy_lo, dy_hi, dx_lo, dx_hi) conservative inclusive bounds
  """
  del map_grid_coords
  my, mx = abs_map.shape[1:]
  node_y = np.arange(my, dtype=np.float64)[:, None] * stride
  node_x = np.arange(mx, dtype=np.float64)[None, :] * stride
  dy = abs_map[1] - node_y
  dx = abs_map[0] - node_x
  pad = stride  # densification can locally exceed node values by < stride

  def lo(v):
    return int(np.floor((np.nanmin(v) - pad) / bucket) * bucket)

  def hi(v):
    return int(np.ceil((np.nanmax(v) + pad) / bucket) * bucket)

  return lo(dy), hi(dy), lo(dx), hi(dx)


# Maximum displacement range (per axis) for which the shift decomposition
# is profitable; beyond this, fall back to the gather sampler.
MAX_SHIFT_RANGE = 160


def warp_sections_shift(images: jnp.ndarray, abs_map: jnp.ndarray,
                        map_grid_coords: jnp.ndarray, method: str,
                        bounds: tuple[int, int, int, int]) -> jnp.ndarray:
  """Shift-decomposed equivalent of warp._warp_sections.

  Args:
    images: [z, c, y, x] source sections
    abs_map: [z, 2, my, mx] absolute inverse maps (x, y channels)
    map_grid_coords: [2, oy, ox] output coords in map-node units (y, x)
    method: interpolation kernel
    bounds: static displacement bounds (see displacement_bounds)

  Returns:
    [z, c, oy, ox] warped output
  """
  dy_lo, dy_hi, dx_lo, dx_hi = bounds

  def one_section(img_c, m):
    dense_x = interp_ops.grid_sample_linear(m[0], map_grid_coords)
    dense_y = interp_ops.grid_sample_linear(m[1], map_grid_coords)
    coords = jnp.stack([dense_y, dense_x])
    return jax.vmap(
        lambda img: shift_warp_2d(img, coords, method, dy_lo, dy_hi,
                                  dx_lo, dx_hi))(img_c)

  return jax.vmap(one_section)(images, abs_map)
