"""Elastic (fine) tile stitching.

Every tile is a spring-mass mesh; all tile meshes are packed into one
[2 or 3, N, (z,) y, x] array and relaxed *simultaneously*, coupled through
virtual springs whose targets come from composing inter-tile flow fields
with the neighboring tiles' meshes (capability parity with
/root/reference/stitch_elastic.py).

The coupling machinery (`compute_target_mesh`) is built jit/vmap-first:
a `lax.scan` over the (up to 4) neighbors of each tile, with
`dynamic_slice`-based paste into an oversized buffer so the whole
N-tile update runs as `vmap(compute_target_mesh)` inside the solver's
`prev_fn` — no host involvement during relaxation.

Data contracts preserved: the `NeighborInfo` int-table layout, the flow
packing produced by `aggregate_arrays`, and the (x, key_to_idx) npz
format consumed by the 3d renderer.
"""

from __future__ import annotations

import enum
import functools
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sofima_tpu import flow_field
from sofima_tpu import map_utils
from sofima_tpu.utils.bounding_box import BoundingBox

Vector = tuple[int, ...]
TileXY = tuple[int, int]
ShapeXYZ = tuple[int, int, int]
TileFlow = dict[TileXY, np.ndarray]
TileOffset = dict[TileXY, Vector]
TileFlowData = tuple[np.ndarray, TileFlow, TileOffset]


class NeighborInfo(enum.IntEnum):
  """Indices into a tile-pair metadata row (the `nbors` table)."""

  nbor_idx = 0             # neighboring tile index
  flow_idx = 1             # index into the flow array
  coarse_offset_ortho = 2  # offset orthogonal to the overlap dim (px)
  flow_size_ortho = 3      # flow grid size, orthogonal dim
  flow_size_overlap = 4    # flow grid size, overlap dim
  fine_off_x = 5           # XY offset used when computing the flow
  fine_off_y = 6
  dim = 7                  # 0: horizontal (x) neighbor, 1: vertical (y)
  coarse_offset_z = 8      # 3d only
  flow_size_z = 9
  fine_off_z = 10


def _relative_intersection(box1: BoundingBox, box2: BoundingBox):
  ibox = box1.intersection(box2)
  return (BoundingBox(start=ibox.start - box1.start, size=ibox.size),
          BoundingBox(start=ibox.start - box2.start, size=ibox.size))


def compute_flow_map(
    tile_map: Mapping[TileXY, np.ndarray],
    offset_map: np.ndarray,
    axis: int,
    patch_size: Vector = (120, 120),
    stride: Vector = (20, 20),
    batch_size: int = 256,
    flow_mode: str = 'padfield',
) -> tuple[TileFlow, TileOffset]:
  """Fine flow between adjacent 2d tiles along `axis` (0: x, 1: y).

  For each valid tile pair, crops stride-aligned overlap strips (shifted
  by the rounded orthogonal offset) from both tiles and estimates patch
  flow between them.

  `flow_mode` selects the correlation backend (see
  `flow_field.JAXMaskedXCorrWithStatsCalculator.flow_field`): the
  default 'padfield' is the reference-parity host-batched path; the
  'circular*' modes run each overlap in ONE device dispatch — with
  device-resident tiles (jnp values in `tile_map`) the strips never
  cross the host link (the 2d montage TPU fast path, mirroring
  `compute_flow_map3d`'s flow_mode contract).

  Returns ({(x, y): flow padded to the tile mesh grid},
           {(x, y): xy offset used for the crop}).
  """
  yx_shape = offset_map.shape[-2:]
  mfc = flow_field.JAXMaskedXCorrWithStatsCalculator()
  flows, offsets = {}, {}

  pad_y = patch_size[0] // 2 // stride[0]
  pad_x = patch_size[1] // 2 // stride[1]

  for y in range(yx_shape[0] - axis):
    for x in range(yx_shape[1] - (1 - axis)):
      if np.isnan(offset_map[0, y, x]):
        continue

      pre = tile_map[x, y]
      post = tile_map[x + (1 - axis), y + axis]
      offset = offset_map[:, y, x]  # (off_x, off_y)

      # Stride-align the overlap: shrink it so the crop start within the
      # 'pre' tile is a stride multiple.
      overlap = -int(offset[axis])
      overlap = pre.shape[1 - axis] - (
          (pre.shape[1 - axis] - overlap) // stride[1 - axis]
          * stride[1 - axis])
      rounded = np.asarray(stride)[::-1] * np.round(
          offset / np.asarray(stride)[::-1])
      ortho_offset = int(rounded[1 - axis])

      pre_sel = [np.s_[:], np.s_[:]]
      post_sel = [np.s_[:], np.s_[:]]
      pre_sel[1 - axis] = np.s_[-overlap:]
      post_sel[1 - axis] = np.s_[:overlap]
      if ortho_offset > 0:
        pre_sel[axis] = np.s_[ortho_offset:]
        post_sel[axis] = np.s_[:-ortho_offset]
      elif ortho_offset < 0:
        pre_sel[axis] = np.s_[:ortho_offset]
        post_sel[axis] = np.s_[-ortho_offset:]

      f = mfc.flow_field(pre[tuple(pre_sel)], post[tuple(post_sel)],
                         patch_size=patch_size, step=stride,
                         batch_size=batch_size, mode=flow_mode)
      flows[(x, y)] = np.pad(
          f, [[0, 0], [pad_y, pad_y - 1], [pad_x, pad_x - 1]],
          constant_values=np.nan)
      offsets[(x, y)] = ((-overlap, ortho_offset) if axis == 0
                         else (ortho_offset, -overlap))

  return flows, offsets


def compute_flow_map3d(
    tile_map: Mapping[TileXY, Any],
    tile_shape: ShapeXYZ,
    offset_map: np.ndarray,
    axis: int,
    patch_size: Vector = (120, 120, 120),
    stride: Vector = (40, 40, 40),
    batch_size: int = 16,
    flow_mode: str = 'circular',
    mask_map: Mapping[TileXY, Any] | None = None,
) -> tuple[TileFlow, TileOffset]:
  """Fine flow between adjacent 3d tiles along `axis` (0: x, 1: y).

  `tile_map` values are [1, z, y, x] array-likes; `offset_map` is
  [3, 1, ys, xs] with coarse XYZ offsets. Crop starts are stride-aligned
  in every dimension. Returns flows padded to the mesh grid and the XYZ
  offsets at which the neighboring tile was placed for flow computation.

  `flow_mode='circular'` (default) routes each overlap pair through the
  device-resident 3d strip path (flow_field._dense_flow_strips_3d):
  patch-periodic correlation in ONE dispatch per pair instead of the
  host-batched scattered-start loop — the TPU fast path for LICONN fine
  stitching (54x on the bench overlap; BENCH flow3d_s vs
  flow3d_padfield_s, exact integer-peak agreement). Geometries the
  strip path cannot take (unequal crop shapes, stride not dividing
  patch) fall back to the padfield driver automatically;
  flow_mode='padfield' forces the oracle arithmetic.

  `mask_map` optionally maps tile coordinates to [1, z, y, x] invalid-
  pixel masks (nonzero = invalid, the flow_field mask convention); the
  masked overlaps run the dim-generic circular Padfield NCC on the same
  strip path (or the padfield driver under flow_mode='padfield').
  """
  mfc = flow_field.JAXMaskedXCorrWithStatsCalculator()
  flows, offsets = {}, {}
  grid_yx = offset_map.shape[-2:]
  pad_zyx = np.array(patch_size) // 2 // np.asarray(stride)

  for y in range(grid_yx[0] - axis):
    for x in range(grid_yx[1] - (1 - axis)):
      nx, ny = x + (1 - axis), y + axis
      tile_pre = tile_map[(x, y)]
      tile_post = tile_map[(nx, ny)]
      offset = offset_map[:, 0, y, x]  # xyz

      curr_box = BoundingBox(start=(0, 0, 0), size=tile_shape)
      nbor_box = BoundingBox(
          start=(tile_shape[0] * (1 - axis) + offset[0],
                 tile_shape[1] * axis + offset[1], offset[2]),
          size=tile_shape)
      isec_curr, isec_nbor = _relative_intersection(curr_box, nbor_box)

      s = stride[2 - axis]
      # Stride-align the overlap dimension...
      overlap = isec_curr.size[axis]
      within = tile_shape[axis] - overlap
      new_overlap = tile_shape[axis] - within // s * s
      shift = np.zeros(3)
      shift[axis] = -(new_overlap - overlap)
      # ...and the orthogonal crop starts.
      for ax in range(3):
        if ax == axis:
          continue
        if isec_curr.start[ax] > 0:
          shift[ax] = s * np.round(isec_curr.start[ax] / s) - isec_curr.start[ax]
        elif isec_nbor.start[ax] > 0:
          shift[ax] = -(s * np.round(isec_nbor.start[ax] / s)
                        - isec_nbor.start[ax])

      nbor_box = nbor_box.translate(shift)
      isec_curr, isec_nbor = _relative_intersection(curr_box, nbor_box)
      assert np.all(isec_curr.start % s == 0)
      assert np.all(isec_nbor.start % s == 0)

      final = np.array(nbor_box.start - curr_box.start)
      final[axis] = -isec_curr.size[axis]
      offsets[(x, y)] = tuple(int(v) for v in final)

      # Keep device-resident slices on device (zero link traffic when
      # the tile views hold HBM arrays — pipeline.stitch3d); host
      # array-likes (volume views) materialize to numpy as before.
      def _take(view, sel):
        r = view[sel]
        return r if isinstance(r, jnp.ndarray) else np.asarray(r)

      pre = _take(tile_pre, isec_curr.to_slice4d()).squeeze(axis=0)
      post = _take(tile_post, isec_nbor.to_slice4d()).squeeze(axis=0)
      assert pre.shape == post.shape

      pre_mask = post_mask = None
      if mask_map is not None:
        if (x, y) in mask_map:
          pre_mask = _take(mask_map[(x, y)],
                           isec_curr.to_slice4d()).squeeze(axis=0)
        if (nx, ny) in mask_map:
          post_mask = _take(mask_map[(nx, ny)],
                            isec_nbor.to_slice4d()).squeeze(axis=0)

      if (flow_mode == 'circular' and pre.shape == post.shape
          and all(p % s == 0 for p, s in zip(patch_size, stride))):
        f = np.asarray(flow_field.dense_flow_field(
            jnp.asarray(pre, jnp.float32), jnp.asarray(post, jnp.float32),
            tuple(int(p) for p in patch_size),
            tuple(int(s) for s in stride), batch_size=batch_size,
            circular=True,
            pre_mask=None if pre_mask is None else jnp.asarray(pre_mask),
            post_mask=(None if post_mask is None
                       else jnp.asarray(post_mask))))
      else:
        # The padfield driver is host-batched: materialize device slices.
        f = mfc.flow_field(
            np.asarray(pre), np.asarray(post),
            pre_mask=None if pre_mask is None else np.asarray(pre_mask),
            post_mask=None if post_mask is None else np.asarray(post_mask),
            patch_size=patch_size, step=stride, batch_size=batch_size)
      flows[(x, y)] = np.pad(
          f, [[0, 0]] + [[p, p - 1] for p in pad_zyx],
          constant_values=np.nan)

  return flows, offsets


def aggregate_arrays(
    x_data: TileFlowData,
    y_data: TileFlowData,
    tile_coords: Sequence[TileXY],
    coarse_mesh: np.ndarray,
    stride: Vector,
    tile_shape: Vector,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray,
           dict[TileXY, int]]:
  """Packs per-tile meshes, flows and neighbor metadata into flat arrays.

  Args:
    x_data: (coarse offsets cx, horizontal flows, crop offsets)
    y_data: same for vertical neighbors
    tile_coords: (x, y) coordinates of all tiles
    coarse_mesh: rigid-stitching solution (per-tile position offsets)
    stride: [z]yx mesh/flow stride
    tile_shape: [z]yx tile image shape

  Returns:
    (fx_all, fy_all, x_all, nbors, key_to_idx) — see NeighborInfo for the
    layout of each `nbors[i, edge]` row.
  """
  cx, fine_x, offsets_x = x_data
  cy, fine_y, offsets_y = y_data
  assert cx.ndim == 3 and cy.ndim == 3

  key_to_idx = {tuple(k): i for i, k in enumerate(tile_coords)}
  dim = len(stride)
  n = len(key_to_idx)

  def _pack(fine, shapes_floor):
    shape = np.max([v.shape for v in fine.values()] + [shapes_floor],
                   axis=0)
    out = np.full([dim, n] + shape[1:].tolist(), np.nan)
    for k, i in key_to_idx.items():
      if k in fine:
        f = fine[k]
        sel = (np.s_[:],) + tuple(np.s_[:f.shape[-d]]
                                  for d in reversed(range(1, dim + 1)))
        out[:, i][sel] = f[:dim]
    return out

  floor = (dim,) + (1,) * dim
  fx_all = _pack(fine_x, floor)
  fy_all = _pack(fine_y, floor)

  def _nbor_row(key, flow_key, coarse, fine, offsets, axis):
    sizes = fine[flow_key].shape
    if dim == 2:
      ortho, overlap = sizes[-2:]
    else:
      size_z, ortho, overlap = sizes[-3:]
    if axis == 1:
      overlap, ortho = ortho, overlap
    off = offsets[flow_key]
    row = [key_to_idx[key], key_to_idx[flow_key],
           coarse[1] if axis == 0 else coarse[0],
           ortho, overlap, off[0], off[1], axis]
    if dim == 3:
      row += [coarse[2], size_z, off[2]]
    return row

  nbors = np.full((n, 4, 8 if dim == 2 else 11), -1, dtype=int)
  for tx, ty in tile_coords:
    i = key_to_idx[tx, ty]
    if (tx - 1, ty) in fine_x:  # left neighbor
      k = (tx - 1, ty)
      nbors[i, 0] = _nbor_row(k, k, cx[:, ty, tx - 1], fine_x, offsets_x, 0)
    if (tx, ty) in fine_x:      # right neighbor
      nbors[i, 1] = _nbor_row((tx + 1, ty), (tx, ty), cx[:, ty, tx],
                              fine_x, offsets_x, 0)
    if (tx, ty - 1) in fine_y:  # top neighbor
      k = (tx, ty - 1)
      nbors[i, 2] = _nbor_row(k, k, cy[:, ty - 1, tx], fine_y, offsets_y, 1)
    if (tx, ty) in fine_y:      # bottom neighbor
      nbors[i, 3] = _nbor_row((tx, ty + 1), (tx, ty), cy[:, ty, tx],
                              fine_y, offsets_y, 1)

  mesh_shape = (np.asarray(tile_shape) // np.asarray(stride)).tolist()
  x_all = np.zeros([dim, n] + mesh_shape, dtype=np.float32)
  for tx, ty in tile_coords:
    x_all[:, key_to_idx[tx, ty]] = coarse_mesh[:, ty, tx].reshape(
        (dim,) + (1,) * dim)

  return fx_all, fy_all, x_all, nbors, key_to_idx


def _window_edge_start(at_high_edge: jnp.ndarray, extent: int,
                       window: jnp.ndarray) -> jnp.ndarray:
  """Start index of a window abutting one edge of an axis.

  The overlap window always touches an edge of a tile mesh: index 0 at
  the low edge, or flush against the high edge (`extent - window`).
  """
  return jnp.where(at_high_edge, extent - window, 0)


def _apply_flow(base_mesh: jnp.ndarray, nbor_mesh: jnp.ndarray,
                nbor_flow: jnp.ndarray, mult: jnp.ndarray, stride: Vector,
                nbor_data: jnp.ndarray, axis: int) -> jnp.ndarray:
  """Pastes flow∘neighbor-mesh virtual-spring targets into `base_mesh`.

  Geometry derived from the NeighborInfo contract: the stride-aligned
  overlap window touches, on each axis, either the low or the high edge
  of the tile mesh it is read from. Which edge is a function of who owns
  the flow (`mult`) and of the sign of the coarse offset on that axis:

    * flow axis (`axis`): the window abuts the shared tile boundary —
      the high edge of the mesh on the 'pre' side of the flow
      (`mult == +1` reads the neighbor's far edge; the mirrored window
      in our own mesh is then at the low edge, and vice versa);
    * ortho / z axes: the coarse offset sign says which way the
      neighbor is shifted, so the window sits at the high edge of
      whichever mesh trails — `mult * offset > 0` on the neighbor,
      `mult * offset < 0` on ourselves.

  `mult` = +1 when the flow says how to move this tile to match the
  neighbor; -1 when it describes the reverse direction.
  `axis` = 0 for horizontal (x-overlap) neighbors, 1 for vertical.
  """
  channels = base_mesh.shape[0]
  overlap = nbor_data[NeighborInfo.flow_size_overlap]
  ortho = nbor_data[NeighborInfo.flow_size_ortho]
  off_ortho = nbor_data[NeighborInfo.coarse_offset_ortho]

  h, w = nbor_mesh.shape[-2], nbor_mesh.shape[-1]
  par_extent, ortho_extent = (w, h) if axis == 0 else (h, w)

  def window_start_yx(on_neighbor: bool) -> list[jnp.ndarray]:
    s = 1 if on_neighbor else -1
    par = _window_edge_start(s * mult > 0, par_extent, overlap)
    orth = _window_edge_start(s * mult * off_ortho > 0, ortho_extent,
                              ortho)
    return [orth, par] if axis == 0 else [par, orth]

  def window_start_z(on_neighbor: bool) -> jnp.ndarray:
    s = 1 if on_neighbor else -1
    return _window_edge_start(
        s * mult * nbor_data[NeighborInfo.coarse_offset_z] > 0,
        nbor_mesh.shape[-3], nbor_data[NeighborInfo.flow_size_z])

  flow = mult * jax.lax.dynamic_index_in_dim(
      nbor_flow, nbor_data[NeighborInfo.flow_idx], axis=1, keepdims=False)

  # Compose the flow with the neighbor's mesh state at the window.
  nbor_start = jnp.array(window_start_yx(on_neighbor=True), dtype=int)
  if channels == 3:
    nbor_start = jnp.concatenate(
        [window_start_z(on_neighbor=True)[None], nbor_start])
    flow_3d, mesh_3d = flow, nbor_mesh
  else:
    flow_3d = flow[:, None]
    mesh_3d = nbor_mesh[:, None]

  update = map_utils.compose_maps_fast(
      flow_3d, nbor_start, stride, mesh_3d, jnp.zeros_like(nbor_start),
      stride, mode='constant')

  fine_axes = [NeighborInfo.fine_off_x, NeighborInfo.fine_off_y]
  if channels == 2:
    update = update[:, 0]
  else:
    fine_axes.append(NeighborInfo.fine_off_z)
  fine = jnp.array([nbor_data[a] for a in fine_axes]).reshape(
      (channels,) + (1,) * channels)
  update = update + mult * fine

  # Paste at the mirrored window within our own mesh.
  tg_start = (0, *window_start_yx(on_neighbor=False))
  if channels == 3:
    tg_start = (0, window_start_z(on_neighbor=False)) + tg_start[1:]

  previous = jax.lax.dynamic_slice(base_mesh, tg_start, flow.shape)
  return jax.lax.dynamic_update_slice(
      base_mesh, jnp.where(jnp.isnan(update), previous, update), tg_start)


@functools.partial(jax.jit, static_argnames=['stride'])
def _update_mesh(mesh: jnp.ndarray, nbor_data: jnp.ndarray, x: jnp.ndarray,
                 fx: jnp.ndarray, fy: jnp.ndarray,
                 stride: Vector = (20, 20)):
  """Scan body: fold one neighbor's contribution into the target mesh."""
  nbor_idx = nbor_data[NeighborInfo.nbor_idx]
  flow_idx = nbor_data[NeighborInfo.flow_idx]
  # flow_idx == own index: the flow was computed with *us* as 'pre', so it
  # moves the neighbor toward us (mult=-1 when used as our target).
  mult = jnp.where(nbor_idx == flow_idx, 1, -1)
  nbor_mesh = jax.lax.dynamic_index_in_dim(x, nbor_idx, axis=1,
                                           keepdims=False)
  updated = jax.lax.cond(
      nbor_idx == -1,
      lambda: mesh,
      lambda: jax.lax.cond(
          nbor_data[NeighborInfo.dim] == 0,
          lambda: _apply_flow(mesh, nbor_mesh, fx, mult, stride, nbor_data,
                              0),
          lambda: _apply_flow(mesh, nbor_mesh, fy, mult, stride, nbor_data,
                              1)))
  return updated, None


def compute_target_mesh(nbor_data: jnp.ndarray, x: jnp.ndarray,
                        fx: jnp.ndarray, fy: jnp.ndarray,
                        stride: Vector = (20, 20)) -> jnp.ndarray:
  """Virtual-spring target positions for one tile mesh.

  Composes each neighbor's flow with that neighbor's current mesh and
  pastes the result into a NaN-filled target array; NaNs where no
  neighbor constrains a node. Typical use (inside the solver):
    prev_fn = lambda x: vmap(partial(compute_target_mesh,
                                     x=x, fx=fx, fy=fy, stride=s))(nbors)

  Args:
    nbor_data: [4, 8 or 11] neighbor rows (see NeighborInfo); -1 = none
    x: [2 or 3, n, (z,) y, x] all tile meshes
    fx/fy: [2 or 3, m, (z,) y, x] packed horizontal/vertical flows
    stride: [z]yx mesh stride

  Returns:
    [2 or 3, (z,) y, x] target mesh
  """
  dim = x.shape[0]
  # Oversize the buffer so dynamic_update_slice never clips under vmap.
  zyx = list(x.shape[-dim:])
  for i in range(dim):
    zyx[i] += max(fy.shape[-dim + i], fx.shape[-dim + i])

  mesh0 = jnp.full([dim] + zyx, np.nan)
  out = jax.lax.scan(
      functools.partial(_update_mesh, x=x, fx=fx, fy=fy,
                        stride=tuple(stride)),
      mesh0, nbor_data)[0]
  sel = (np.s_[:],) + tuple(np.s_[:s] for s in x.shape[-dim:])
  return out[sel]
