"""Pallas TPU kernel for the in-plane spring-mesh force.

The XLA formulation of the mesh force (mesh._spring_force) materializes
per-family shifted differences and padded scatters in HBM; this kernel
computes the complete 8-neighbor Hookean force in ONE pass: each grid
step DMAs a (TY+2, TX+2) halo window of the node array into VMEM and
evaluates all spring families as in-register shifted slices, writing the
(TY, TX) interior force tile. One HBM read + one write per node per step.

The force at node n is the symmetric per-node sum over its 8 neighbors:

    f(n) = sum_e  k_e (1 - l0_e / |d_e|) d_e,   d_e = x[n+e] - x[n] + s*e

(identical to the pairwise-scatter formulation; NaN neighbors contribute
zero — the caller pads the array with a NaN ring so borders need no
special casing).

Used as a drop-in `mesh_force` for the solver via `inplane_force_pallas`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# All 8 in-plane neighbor directions (xy components).
_DIRECTIONS = ((1, 0), (-1, 0), (0, 1), (0, -1),
               (1, 1), (-1, -1), (-1, 1), (1, -1))


# Halo window margins, chosen so every DMA slice is aligned to the
# (8, 128) float32 VMEM tiling: nodes sit at window[8 + ty, 128 + tx].
_MARGIN_Y = 8
_MARGIN_X = 128


def _force_tile(tile: jnp.ndarray, ty: int, tx: int, k: float, stride,
                prefer_orig_order: bool) -> jnp.ndarray:
  """Force on the [ty, tx] interior of an aligned halo window."""
  sx, sy = float(stride[0]), float(stride[1])
  k_diag = k / np.sqrt(2.0)

  center = tile[:, _MARGIN_Y:_MARGIN_Y + ty, _MARGIN_X:_MARGIN_X + tx]
  f_acc_x = jnp.zeros((ty, tx), jnp.float32)
  f_acc_y = jnp.zeros((ty, tx), jnp.float32)

  for ex, ey in _DIRECTIONS:
    nbor = tile[:, _MARGIN_Y + ey:_MARGIN_Y + ey + ty,
                _MARGIN_X + ex:_MARGIN_X + ex + tx]
    l0x = sx * ex
    l0y = sy * ey
    dx = nbor[0] - center[0] + l0x
    dy = nbor[1] - center[1] + l0y
    l0 = float(np.hypot(l0x, l0y))
    k_e = k if (ex == 0 or ey == 0) else k_diag
    # One rsqrt instead of sqrt + divide: the spring force only ever
    # needs 1/l, and rsqrt is a single VPU transcendental chain.
    dd = dx * dx + dy * dy
    inv_l = jax.lax.rsqrt(jnp.maximum(dd, 1e-60))
    if prefer_orig_order:
      fac_x = float(ex) * jnp.sign(dx) if ex != 0 else 1.0
      fac_y = float(ey) * jnp.sign(dy) if ey != 0 else 1.0
      fx = k_e * (1.0 - l0 * fac_x * inv_l) * dx
      fy = k_e * (1.0 - l0 * fac_y * inv_l) * dy
    else:
      coef = k_e * (1.0 - l0 * inv_l)
      fx = coef * dx
      fy = coef * dy
    # NaN neighbors (or NaN center) contribute no force. One validity
    # compare on dd replaces per-channel nan_to_num (3 compare+select
    # chains each): NaN endpoints make dd NaN, and finite endpoints
    # keep f finite (inv_l is clamped; |f| <= k_e * (1 + l0) * |d|).
    fin = jnp.isfinite(dd)
    f_acc_x = f_acc_x + jnp.where(fin, fx, 0.0)
    f_acc_y = f_acc_y + jnp.where(fin, fy, 0.0)

  return jnp.stack([f_acc_x, f_acc_y])


def _kernel(x_hbm, out_ref, scratch, sem, *, k, stride, prefer_orig_order,
            tile_y, tile_x):
  z = pl.program_id(0)
  iy = pl.program_id(1)
  ix = pl.program_id(2)

  copy = pltpu.make_async_copy(
      x_hbm.at[:, z, pl.ds(iy * tile_y, tile_y + 2 * _MARGIN_Y),
               pl.ds(ix * tile_x, tile_x + 2 * _MARGIN_X)],
      scratch, sem)
  copy.start()
  copy.wait()
  out_ref[:, 0] = _force_tile(scratch[:], tile_y, tile_x, k, stride,
                              prefer_orig_order)


@functools.partial(
    jax.jit,
    static_argnames=['k', 'stride', 'prefer_orig_order', 'tile',
                     'interpret'])
def inplane_force_pallas(x: jnp.ndarray, k: float, stride,
                         prefer_orig_order: bool = False,
                         tile: int = 256,
                         interpret: bool = False) -> jnp.ndarray:
  """Pallas in-plane mesh force; same contract as mesh.inplane_force.

  Args:
    x: [2, z, y, x] node positions (relative format)
    k: spring constant (diagonals get k/sqrt(2))
    stride: XY grid spacing
    prefer_orig_order: fold-preventing force formulation
    tile: spatial tile edge (grid step granularity)
    interpret: run in interpreter mode (CPU testing)

  Returns:
    [2, z, y, x] forces
  """
  if len(stride) != 2:
    raise ValueError('stride must be 2D (XY).')
  c, nz, ny, nx = x.shape
  assert c == 2

  tile_y = max(8, min(tile, -(-ny // 8) * 8))
  tile_x = max(128, min(tile, -(-nx // 128) * 128))
  gy = -(-ny // tile_y)
  gx = -(-nx // tile_x)

  # NaN ring + alignment margins: DMA windows start at tile origins and
  # span (tile + 2*margin) — fully (8, 128)-aligned; borders and grid
  # overhang read NaN neighbors, which contribute zero force.
  pad_y = gy * tile_y + 2 * _MARGIN_Y - ny - _MARGIN_Y
  pad_x = gx * tile_x + 2 * _MARGIN_X - nx - _MARGIN_X
  xp = jnp.pad(x.astype(jnp.float32),
               ((0, 0), (0, 0), (_MARGIN_Y, pad_y), (_MARGIN_X, pad_x)),
               constant_values=np.nan)

  kernel = functools.partial(
      _kernel, k=float(k), stride=tuple(float(s) for s in stride),
      prefer_orig_order=prefer_orig_order, tile_y=tile_y, tile_x=tile_x)

  out = pl.pallas_call(
      kernel,
      grid=(nz, gy, gx),
      in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
      out_specs=pl.BlockSpec(
          (2, 1, tile_y, tile_x),
          lambda z, iy, ix: (0, z, iy, ix),
          memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((2, nz, gy * tile_y, gx * tile_x),
                                     jnp.float32),
      scratch_shapes=[
          pltpu.VMEM((2, tile_y + 2 * _MARGIN_Y, tile_x + 2 * _MARGIN_X),
                     jnp.float32),
          pltpu.SemaphoreType.DMA,
      ],
      interpret=interpret,
  )(xp)
  return out[:, :, :ny, :nx]


def make_inplane_force(tile: int = 256, interpret: bool = False):
  """Returns a mesh_force callable backed by the Pallas kernel."""

  def force(x, k, stride, prefer_orig_order=False):
    return inplane_force_pallas(x, k, tuple(stride), prefer_orig_order,
                                tile=tile, interpret=interpret)

  return force


# ---------------------------------------------------------------------------
# 3d volumetric mesh force (26-neighborhood), for the LICONN-style solves.

def _force_tile_3d(tile: jnp.ndarray, ty: int, tx: int, k: float, stride,
                   prefer_orig_order: bool) -> jnp.ndarray:
  """Force on the [nz, ty, tx] interior of an aligned 3d halo window.

  `tile`: [3, nz + 2, ty + 2*MY, tx + 2*MX] node positions (z fully
  resident with a 1-plane halo).
  """
  import numpy as _np
  sx, sy, sz = (float(s) for s in stride)
  nz = tile.shape[1] - 2

  center = tile[:, 1:1 + nz, _MARGIN_Y:_MARGIN_Y + ty,
                _MARGIN_X:_MARGIN_X + tx]
  acc = [jnp.zeros((nz, ty, tx), jnp.float32) for _ in range(3)]

  for ez in (-1, 0, 1):
    for ey in (-1, 0, 1):
      for ex in (-1, 0, 1):
        if ex == 0 and ey == 0 and ez == 0:
          continue
        nbor = tile[:, 1 + ez:1 + ez + nz,
                    _MARGIN_Y + ey:_MARGIN_Y + ey + ty,
                    _MARGIN_X + ex:_MARGIN_X + ex + tx]
        l0v = (_np.float32(sx * ex), _np.float32(sy * ey),
               _np.float32(sz * ez))
        l0 = float(_np.linalg.norm(l0v))
        k_eff = k * sx / l0
        d = [nbor[c] - center[c] + l0v[c] for c in range(3)]
        dd = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        inv_l = jax.lax.rsqrt(jnp.maximum(dd, 1e-60))
        fin = jnp.isfinite(dd)  # one compare instead of 3x nan_to_num
        e = (ex, ey, ez)
        for c in range(3):
          if prefer_orig_order:
            fac = (float(e[c]) * jnp.sign(d[c]) if e[c] != 0 else 1.0)
            f = k_eff * (1.0 - l0 * fac * inv_l) * d[c]
          else:
            f = k_eff * (1.0 - l0 * inv_l) * d[c]
          acc[c] = acc[c] + jnp.where(fin, f, 0.0)

  return jnp.stack(acc)


def _kernel_3d(x_hbm, out_ref, scratch, sem, *, k, stride,
               prefer_orig_order, tile_y, tile_x, nz):
  iy = pl.program_id(0)
  ix = pl.program_id(1)
  copy = pltpu.make_async_copy(
      x_hbm.at[:, :, pl.ds(iy * tile_y, tile_y + 2 * _MARGIN_Y),
               pl.ds(ix * tile_x, tile_x + 2 * _MARGIN_X)],
      scratch, sem)
  copy.start()
  copy.wait()
  out_ref[...] = _force_tile_3d(scratch[:], tile_y, tile_x, k, stride,
                                prefer_orig_order)


def _kernel_3d_rolls(x_hbm, out_ref, scratch, sem, *, k, stride,
                     prefer_orig_order, tile_y, tile_x, nz):
  """Roll-based twin of _kernel_3d: the 26-link force is computed over
  the whole (8, 128)-ALIGNED halo window with static circular rolls,
  then sliced to the interior at aligned offsets. _force_tile_3d's
  margin-offset slicing produced unaligned layouts under the force
  math, which crashes this relay's remote Mosaic compile
  (hardware-bisected: the same math compiles on aligned layouts).
  Distance-1 neighbors of interior nodes never wrap, so the rolls are
  exact there; the discarded window ring absorbs the wraparound."""
  iy = pl.program_id(0)
  ix = pl.program_id(1)
  copy = pltpu.make_async_copy(
      x_hbm.at[:, :, pl.ds(iy * tile_y, tile_y + 2 * _MARGIN_Y),
               pl.ds(ix * tile_x, tile_x + 2 * _MARGIN_X)],
      scratch, sem)
  copy.start()
  copy.wait()
  force = _roll_force_3d(scratch[:], k, stride, prefer_orig_order)
  out_ref[...] = jax.lax.slice(
      force, (0, 1, _MARGIN_Y, _MARGIN_X),
      (3, 1 + nz, _MARGIN_Y + tile_y, _MARGIN_X + tile_x))


def _kernel_3d_loop(e_ref, ei_ref, l0v_ref, kl0_ref, x_hbm, out_ref,
                    scratch, sem, *, k, stride, prefer_orig_order,
                    tile_y, tile_x, nz):
  """Link-loop twin of _kernel_3d: the force is computed with the
  compact fori_loop body over the whole halo window, then sliced to the
  interior. Distance-1 neighbors of interior nodes never wrap, so the
  circular rolls are exact there; the discarded window ring absorbs the
  wraparound."""
  iy = pl.program_id(0)
  ix = pl.program_id(1)
  copy = pltpu.make_async_copy(
      x_hbm.at[:, :, pl.ds(iy * tile_y, tile_y + 2 * _MARGIN_Y),
               pl.ds(ix * tile_x, tile_x + 2 * _MARGIN_X)],
      scratch, sem)
  copy.start()
  copy.wait()
  # Pass the SMEM refs themselves: the loop body reads one scalar at a
  # time (SMEM rejects whole-array loads — hardware-only error, the
  # interpreter happily vectorizes them).
  tables = (e_ref, ei_ref, l0v_ref, kl0_ref)
  force = _roll_force_3d_loop(scratch[:], k, stride, prefer_orig_order,
                              tables=tables)
  out_ref[...] = jax.lax.slice(
      force, (0, 1, _MARGIN_Y, _MARGIN_X),
      (3, 1 + nz, _MARGIN_Y + tile_y, _MARGIN_X + tile_x))


@functools.partial(
    jax.jit,
    static_argnames=['k', 'stride', 'prefer_orig_order', 'tile',
                     'interpret', 'link_loop'])
def elastic_mesh_3d_pallas(x: jnp.ndarray, k: float, stride,
                           prefer_orig_order: bool = False,
                           tile: int = 128,
                           interpret: bool = False,
                           link_loop: bool = False) -> jnp.ndarray:
  """Pallas 3d mesh force (26-neighborhood); contract of elastic_mesh_3d.

  The z extent stays VMEM-resident per tile (volumetric tile stacks are
  shallow); y/x are tiled with (8, 128)-aligned halo windows, and the
  force is computed roll-based over the whole aligned window with an
  aligned interior slice — the per-link math on UNALIGNED layouts
  (what _force_tile_3d's margin-offset slicing produced) is what
  crashed the relay's remote Mosaic compile at every tile size in
  BENCH_r03 (hardware-bisected). `link_loop=True` swaps in the
  fori_loop force body with SMEM link tables (experiment knob).
  """
  if not hasattr(stride, '__len__'):
    stride = (float(stride),) * 3
  c, nz, ny, nx = x.shape
  assert c == 3

  tile_y = max(8, min(tile, -(-ny // 8) * 8))
  tile_x = max(128, min(tile * 2, -(-nx // 128) * 128))
  gy = -(-ny // tile_y)
  gx = -(-nx // tile_x)

  pad_y = gy * tile_y + 2 * _MARGIN_Y - ny - _MARGIN_Y
  pad_x = gx * tile_x + 2 * _MARGIN_X - nx - _MARGIN_X
  xp = jnp.pad(x.astype(jnp.float32),
               ((0, 0), (1, 1), (_MARGIN_Y, pad_y), (_MARGIN_X, pad_x)),
               constant_values=np.nan)

  stride_t = tuple(float(s) for s in stride)
  scratch_shapes = [
      pltpu.VMEM((3, nz + 2, tile_y + 2 * _MARGIN_Y,
                  tile_x + 2 * _MARGIN_X), jnp.float32),
      pltpu.SemaphoreType.DMA,
  ]
  out_spec = pl.BlockSpec((3, nz, tile_y, tile_x),
                          lambda iy, ix: (0, 0, iy, ix),
                          memory_space=pltpu.VMEM)
  out_shape = jax.ShapeDtypeStruct((3, nz, gy * tile_y, gx * tile_x),
                                   jnp.float32)

  if link_loop:
    kernel = functools.partial(
        _kernel_3d_loop, k=float(k), stride=stride_t,
        prefer_orig_order=prefer_orig_order, tile_y=tile_y,
        tile_x=tile_x, nz=nz)
    tables = [jnp.asarray(t) for t in _link_tables_np(stride_t, float(k))]
    out = pl.pallas_call(
        kernel,
        grid=(gy, gx),
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] * 4
                  + [pl.BlockSpec(memory_space=pl.ANY)]),
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*tables, xp)
  else:
    kernel = functools.partial(
        _kernel_3d_rolls, k=float(k), stride=stride_t,
        prefer_orig_order=prefer_orig_order, tile_y=tile_y,
        tile_x=tile_x, nz=nz)
    out = pl.pallas_call(
        kernel,
        grid=(gy, gx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(xp)
  return out[:, :, :ny, :nx]


def _slab_force_3d(up, mid, dn, k: float, stride,
                   prefer_orig_order: bool) -> jnp.ndarray:
  """26-link force on one y-slab from three y-shifted full-width blocks.

  `up`/`mid`/`dn` are [3, Z+2, ty, Xp] blocks of the SAME padded mesh
  shifted by ey = +1/0/-1 rows — y-neighbor access costs no halo
  margins or wraparound fix-ups (the shifted copies are built once per
  force call in XLA, ~3 HBM passes). z neighbors roll axis 1 (the NaN
  z-guard planes absorb wraparound), x neighbors roll axis 3 (the
  global NaN x-pad absorbs wraparound). Compute runs on exactly the
  output block — no margin waste (the aligned-window kernel burns 3-5x
  its tile in margin compute, capping it at ~1.45 GLUPS on v5e).
  """
  sx, sy, sz = (float(stride[0]), float(stride[1]), float(stride[2]))
  zn, xn = mid.shape[1], mid.shape[3]
  by_ey = {1: up, 0: mid, -1: dn}
  acc = [jnp.zeros(mid.shape[1:], jnp.float32) for _ in range(3)]
  for ey in (-1, 0, 1):
    src = by_ey[ey]
    for ez in (-1, 0, 1):
      for ex in (-1, 0, 1):
        if ex == 0 and ey == 0 and ez == 0:
          continue
        nbor = src
        if ez:
          nbor = pltpu.roll(nbor, (-ez) % zn, 1)
        if ex:
          nbor = pltpu.roll(nbor, (-ex) % xn, 3)
        l0v = (np.float32(sx * ex), np.float32(sy * ey),
               np.float32(sz * ez))
        l0 = float(np.linalg.norm(l0v))
        k_eff = k * sx / l0
        d = [nbor[c] - mid[c] + l0v[c] for c in range(3)]
        dd = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        inv_l = jax.lax.rsqrt(jnp.maximum(dd, 1e-60))
        # One validity compare per link instead of 3x nan_to_num (each
        # a 3-compare/3-select chain): NaN endpoints make dd NaN, and
        # finite endpoints keep f finite (inv_l is clamped, so
        # |f| <= k_eff * (1 + l0) * |d| — no inf to scrub).
        fin = jnp.isfinite(dd)
        e = (ex, ey, ez)
        for c in range(3):
          if prefer_orig_order:
            fac = (float(e[c]) * jnp.sign(d[c]) if e[c] != 0 else 1.0)
            f = k_eff * (1.0 - l0 * fac * inv_l) * d[c]
          else:
            f = k_eff * (1.0 - l0 * inv_l) * d[c]
          acc[c] = acc[c] + jnp.where(fin, f, 0.0)
  return jnp.stack(acc)


def _link_force_3d(base, nbor, e, k: float, stride,
                   prefer_orig_order: bool) -> jnp.ndarray:
  """Stacked [3, ...] spring force of ONE link family on `base` nodes.

  `base`/`nbor` are [3, ...] position blocks; `e = (ex, ey, ez)` the
  link direction in grid steps. NaN endpoints contribute zero.
  """
  sx, sy, sz = (float(stride[0]), float(stride[1]), float(stride[2]))
  ex, ey, ez = e
  l0v = (np.float32(sx * ex), np.float32(sy * ey), np.float32(sz * ez))
  l0 = float(np.linalg.norm(l0v))
  k_eff = k * sx / l0
  d = [nbor[c] - base[c] + l0v[c] for c in range(3)]
  dd = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
  inv_l = jax.lax.rsqrt(jnp.maximum(dd, 1e-60))
  fin = jnp.isfinite(dd)  # one compare instead of 3x nan_to_num
  out = []
  for c in range(3):
    if prefer_orig_order:
      fac = (float(e[c]) * jnp.sign(d[c]) if e[c] != 0 else 1.0)
      f = k_eff * (1.0 - l0 * fac * inv_l) * d[c]
    else:
      f = k_eff * (1.0 - l0 * inv_l) * d[c]
    out.append(jnp.where(fin, f, 0.0))
  return jnp.stack(out)


# Half of the 26 link directions: all nine with ey = +1 plus four of
# the eight in-row (ey = 0) families. Each remaining direction is the
# negation of exactly one entry.
_HALF_LINKS_3D = tuple(
    [(ex, 1, ez) for ez in (-1, 0, 1) for ex in (-1, 0, 1)]
    + [(1, 0, 0), (1, 0, 1), (1, 0, -1), (0, 0, 1)])


def _slab_force_3d_sym(up, mid, dn, k: float, stride,
                       prefer_orig_order: bool,
                       links=_HALF_LINKS_3D) -> jnp.ndarray:
  """26-link slab force via Newton's-third-law link sharing.

  Same contract as _slab_force_3d, but each +-e link PAIR shares one
  sqrt/div chain: the +e force field f_e is computed once, accumulated
  on its base nodes, and its reaction (-f_e at the +e-shifted nodes)
  accumulated via rolled copies — exact, including prefer_orig_order
  (negating e negates d, so e[c]*sign(d[c]) is invariant and the force
  is exactly antisymmetric). 13 + 9/tile_y chains instead of 26; the
  kernel is VPU-math-bound (all data-movement reformulations measured
  1.40-1.45 GLUPS), so halving the link math is the lever that moves
  it.

  Reaction wraparound rides the same NaN guards as the forward rolls
  (f_e is zero wherever an endpoint is NaN: guard z-planes, the x NaN
  pad, and the global y NaN rows). The y+1 shift cannot stay in-block
  for its first row, so that row's reaction is recomputed directly
  from `dn` (a [.., 1, xn] chain — 1/tile_y of a full one).
  """
  zn, xn = mid.shape[1], mid.shape[3]
  acc = jnp.zeros((3,) + mid.shape[1:], jnp.float32)
  for e in links:
    ex, ey, ez = e
    src = up if ey else mid
    nbor = src
    if ez:
      nbor = pltpu.roll(nbor, (-ez) % zn, 1)
    if ex:
      nbor = pltpu.roll(nbor, (-ex) % xn, 3)
    f = _link_force_3d(mid, nbor, e, k, stride, prefer_orig_order)
    acc = acc + f
    r = f
    if ez:
      r = pltpu.roll(r, ez % zn, 1)
    if ex:
      r = pltpu.roll(r, ex % xn, 3)
    if ey:
      # Row 0's reaction partner lives in the previous slab: recompute
      # f_e there from the y-1 shifted copy (base x(y0-1+(-ez,-ex))
      # arrives by rolling dn's first row by +e in z/x).
      dn_row = jax.lax.slice_in_dim(dn, 0, 1, axis=2)
      if ez:
        dn_row = pltpu.roll(dn_row, ez % zn, 1)
      if ex:
        dn_row = pltpu.roll(dn_row, ex % xn, 3)
      g = _link_force_3d(dn_row, jax.lax.slice_in_dim(mid, 0, 1, axis=2),
                         e, k, stride, prefer_orig_order)
      r = jnp.concatenate(
          [g, jax.lax.slice_in_dim(r, 0, r.shape[2] - 1, axis=2)],
          axis=2)
    acc = acc - r
  return acc


def _kernel_3d_slab_symloop(e_t, e_i, l0v_t, kl0_t, up_ref, mid_ref,
                            dn_ref, out_ref, *, prefer_orig_order, nz,
                            n_ey1, n_total):
  """Symmetric slab force as TWO fori_loops over half-link families.

  The unrolled symmetric slab body crashes the remote Mosaic compile
  helper whenever a program carries more than ~5 link bodies — even
  split across pallas_calls (hardware-bisected,
  scratch/probe_symslab_bisect{,2}.py: every <=5-link kernel compiles
  alone, any multi-kernel combination crashes, so the threshold is
  TOTAL generated code per program). A loop body is ONE link's math
  with dynamic pltpu.roll shifts and per-link constants from SMEM
  tables (rows 0..n_ey1-1 must be the ey=+1 links, the rest ey=0):
  two small bodies regardless of link count.

  Loop A (ey=+1 links) accumulates the forward force from the y+1
  shifted copy and its reaction via +e rolls, recomputing row 0's
  reaction from the y-1 copy (its partner lives in the previous slab)
  — the concatenate row-fix is restated as roll+iota-select, which
  Mosaic compiles where the concat form also did (both probed).
  Loop B (ey=0 links) is the same without the row fix. Contract and
  numerics of _slab_force_3d_sym, exactly.
  """
  up, mid, dn = up_ref[...], mid_ref[...], dn_ref[...]
  zn, xn = mid.shape[1], mid.shape[3]
  mid_row0 = jax.lax.slice_in_dim(mid, 0, 1, axis=2)
  dn_row0 = jax.lax.slice_in_dim(dn, 0, 1, axis=2)
  row_iota = jax.lax.broadcasted_iota(
      jnp.int32, (3,) + tuple(mid.shape[1:]), 2)

  def link_force(base, nbor, i):
    k_eff = kl0_t[0, i]
    l0 = kl0_t[1, i]
    d = [nbor[c] - base[c] + l0v_t[i, c] for c in range(3)]
    dd = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
    inv_l = jax.lax.rsqrt(jnp.maximum(dd, 1e-60))
    fin = jnp.isfinite(dd)
    outs = []
    for c in range(3):
      if prefer_orig_order:
        fac = jnp.where(e_t[i, c] != 0, e_t[i, c] * jnp.sign(d[c]), 1.0)
        f = k_eff * (1.0 - l0 * fac * inv_l) * d[c]
      else:
        f = k_eff * (1.0 - l0 * inv_l) * d[c]
      outs.append(jnp.where(fin, f, 0.0))
    return jnp.stack(outs)

  def fwd_shifts(i):
    iz = jax.lax.rem(jnp.int32(zn) - e_i[i, 2], jnp.int32(zn))
    ix = jax.lax.rem(jnp.int32(xn) - e_i[i, 0], jnp.int32(xn))
    rz = jax.lax.rem(jnp.int32(zn) + e_i[i, 2], jnp.int32(zn))
    rx = jax.lax.rem(jnp.int32(xn) + e_i[i, 0], jnp.int32(xn))
    return iz, ix, rz, rx

  def body_ey1(i, acc):
    iz, ix, rz, rx = fwd_shifts(i)
    nbor = pltpu.roll(pltpu.roll(up, iz, 1), ix, 3)
    f = link_force(mid, nbor, i)
    r = pltpu.roll(pltpu.roll(f, rz, 1), rx, 3)
    # Row 0's reaction partner lives in the previous slab: recompute
    # it from the y-1 copy (base x(y0-1+(-ez,-ex)) arrives by rolling
    # dn's first row by +e in z/x).
    g = link_force(pltpu.roll(pltpu.roll(dn_row0, rz, 1), rx, 3),
                   mid_row0, i)
    r = pltpu.roll(r, 1, 2)
    r = jnp.where(row_iota == 0, jnp.broadcast_to(g, r.shape), r)
    return acc + f - r

  def body_ey0(i, acc):
    iz, ix, rz, rx = fwd_shifts(i)
    nbor = pltpu.roll(pltpu.roll(mid, iz, 1), ix, 3)
    f = link_force(mid, nbor, i)
    r = pltpu.roll(pltpu.roll(f, rz, 1), rx, 3)
    return acc + f - r

  acc = jnp.zeros((3,) + tuple(mid.shape[1:]), jnp.float32)
  acc = jax.lax.fori_loop(0, n_ey1, body_ey1, acc)
  acc = jax.lax.fori_loop(n_ey1, n_total, body_ey0, acc)
  out_ref[...] = jax.lax.slice_in_dim(acc, 1, 1 + nz, axis=1)


def _kernel_3d_slab(up_ref, mid_ref, dn_ref, out_ref, *, k, stride,
                    prefer_orig_order, nz, symmetric=False, links=None):
  if symmetric:
    force = _slab_force_3d_sym(up_ref[...], mid_ref[...], dn_ref[...],
                               k, stride, prefer_orig_order,
                               links=links or _HALF_LINKS_3D)
  else:
    force = _slab_force_3d(up_ref[...], mid_ref[...], dn_ref[...], k,
                           stride, prefer_orig_order)
  out_ref[...] = jax.lax.slice_in_dim(force, 1, 1 + nz, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=['k', 'stride', 'prefer_orig_order', 'tile_y',
                     'interpret', 'symmetric', 'sym_split', 'link_loop',
                     'window_dma'])
def elastic_mesh_3d_pallas_slab(x: jnp.ndarray, k: float, stride,
                                prefer_orig_order: bool = False,
                                tile_y: int = 8,
                                interpret: bool = False,
                                symmetric: bool = False,
                                sym_split: int = 0,
                                link_loop: bool = False,
                                window_dma: bool = False) -> jnp.ndarray:
  """Margin-free 3d mesh force: y-shifted copies + full-width y-slabs.

  Contract of mesh.elastic_mesh_3d. Three y-shifted copies of the
  padded mesh feed blocked full-width slabs, so the kernel computes on
  exactly its output block (see _slab_force_3d). tile_y stays small so
  the per-slab unrolled 26-link body fits the relay's compile helper
  (the blowup scales with link count x block area — hardware-bisected).

  `symmetric=True` (one sqrt/div chain per +-link pair) is exact, but
  its SINGLE-kernel reaction-roll accumulation pushes the unrolled body
  over the compile helper's blowup threshold on hardware at every
  tile_y tried (8/16 — scratch/probe_mesh3d_sym.py, HTTP 500). The
  blowup scales with unrolled-link-count x block area (hardware-
  bisected, docs/ROADMAP.md), so `sym_split=N` partitions the 13
  half-link families across N pallas_calls — each body stays under the
  threshold — and sums the partial forces in XLA. The windows are
  re-DMA'd per group (~1 MB/block/group, negligible against the
  VPU-bound link math). sym_split=2 splits [9 ey=+1 | 4 ey=0];
  sym_split=3 splits [5 | 4 ey=+1 | 4 ey=0].
  """
  if not hasattr(stride, '__len__'):
    stride = (float(stride),) * 3
  c, nz, ny, nx = x.shape
  assert c == 3

  if window_dma:
    # See _kernel_3d_slab_win: one NaN-guarded padded array, halo rows
    # come from the in-kernel window DMA instead of up/dn copies.
    ty = tile_y
    wy = ty + 8
    pad_y = (-ny) % ty
    pad_x = (-nx) % 128 or 128
    # y layout: [1 NaN guard] + ny + pad_y + [7 NaN tail] so every
    # window base iy*ty is 8-aligned and the last window stays in
    # bounds ((gy-1)*ty + wy == yp + 8).
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (1, 1), (1, pad_y + 7), (0, pad_x)),
                 constant_values=np.nan)
    yp = ny + pad_y
    gy = yp // ty
    xw = xp.shape[3]
    kernel = functools.partial(
        _kernel_3d_slab_win, k=float(k),
        stride=tuple(float(s) for s in stride),
        prefer_orig_order=prefer_orig_order, nz=nz, ty=ty, wy=wy, gy=gy,
        xw=xw)
    out = pl.pallas_call(
        kernel,
        grid=(gy,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((3, nz, ty, xw), lambda iy: (0, 0, iy, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, nz, yp, xw), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, 3, nz + 2, wy, xw), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(xp)
    return out[:, :, :ny, :nx]

  pad_y = (-ny) % tile_y
  pad_x = (-nx) % 128 or 128  # >=1 NaN column so x-rolls wrap into NaN
  xp = jnp.pad(x.astype(jnp.float32),
               ((0, 0), (1, 1), (0, pad_y), (0, pad_x)),
               constant_values=np.nan)
  yp = ny + pad_y
  nan_row = jnp.full((3, nz + 2, 1, xp.shape[3]), jnp.nan, jnp.float32)
  up = jnp.concatenate([xp[:, :, 1:], nan_row], axis=2)   # row y+1 at y
  dn = jnp.concatenate([nan_row, xp[:, :, :-1]], axis=2)  # row y-1 at y
  gy = yp // tile_y

  spec = pl.BlockSpec((3, nz + 2, tile_y, xp.shape[3]),
                      lambda iy: (0, 0, iy, 0),
                      memory_space=pltpu.VMEM)
  out_spec = pl.BlockSpec((3, nz, tile_y, xp.shape[3]),
                          lambda iy: (0, 0, iy, 0),
                          memory_space=pltpu.VMEM)
  out_shape = jax.ShapeDtypeStruct((3, nz, yp, xp.shape[3]), jnp.float32)

  if symmetric and link_loop:
    # Two-fori_loop symmetric body (see _kernel_3d_slab_symloop): the
    # only symmetric slab form whose generated code fits the remote
    # compile helper's per-PROGRAM size threshold.
    stride_t = tuple(float(s) for s in stride)
    tables = [jnp.asarray(t)
              for t in _link_tables_np(stride_t, float(k), half=True)]
    n_ey1 = sum(1 for e in _HALF_LINKS_3D if e[1])
    kernel = functools.partial(
        _kernel_3d_slab_symloop, prefer_orig_order=prefer_orig_order,
        nz=nz, n_ey1=n_ey1, n_total=len(_HALF_LINKS_3D))
    out = pl.pallas_call(
        kernel,
        grid=(gy,),
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] * 4
                  + [spec] * 3),
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*tables, up, xp, dn)
    return out[:, :, :ny, :nx]

  def call(links=None):
    kernel = functools.partial(
        _kernel_3d_slab, k=float(k),
        stride=tuple(float(s) for s in stride),
        prefer_orig_order=prefer_orig_order, nz=nz, symmetric=symmetric,
        links=links)
    return pl.pallas_call(
        kernel,
        grid=(gy,),
        in_specs=[spec] * 3,
        out_specs=pl.BlockSpec((3, nz, tile_y, xp.shape[3]),
                               lambda iy: (0, 0, iy, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, nz, yp, xp.shape[3]),
                                       jnp.float32),
        interpret=interpret,
    )(up, xp, dn)

  if symmetric and sym_split > 1:
    ey1 = [e for e in _HALF_LINKS_3D if e[1]]
    ey0 = [e for e in _HALF_LINKS_3D if not e[1]]
    if sym_split == 2:
      groups = [tuple(ey1), tuple(ey0)]
    else:
      groups = [tuple(ey1[:5]), tuple(ey1[5:]), tuple(ey0)]
    out = call(groups[0])
    for g in groups[1:]:
      out = out + call(g)
  else:
    out = call()
  return out[:, :, :ny, :nx]


def _kernel_3d_slab_win(x_hbm, out_ref, win, sems, *, k, stride,
                        prefer_orig_order, nz, ty, wy, gy, xw):
  """Window-DMA twin of _kernel_3d_slab: no up/dn arrays at all.

  The per-iteration up/dn shifted-copy construction costs 0.71 ms of
  the 2.42 ms Verlet iteration at bench geometry (pure kernel: 2.93
  GLUPS, with construction: 1.96 — hardware-decomposed). Here each grid
  step DMAs ONE [3, nz+2, wy, xw] window of the padded mesh from an
  8-aligned row base (wy = ty + 8 covers the +-1-row halo), double-
  buffered across steps, and cuts up/mid/dn as y-offset slices (rows
  2:/1:/0: — unaligned sublane slices compile and cost two vector
  shifts; scratch/probe_fused_verlet.py probe A). Same force body,
  bit-identical results.
  """
  iy = pl.program_id(0)
  slot = jax.lax.rem(iy, 2)

  def copy(iy2, s):
    return pltpu.make_async_copy(
        x_hbm.at[:, :, pl.ds(iy2 * ty, wy)], win.at[s], sems.at[s])

  @pl.when(iy == 0)
  def _prologue():
    copy(iy, slot).start()

  @pl.when(iy + 1 < gy)
  def _prefetch():
    copy(iy + 1, 1 - slot).start()

  copy(iy, slot).wait()
  w = win[slot]
  dn = jax.lax.slice(w, (0, 0, 0, 0), (3, nz + 2, ty, xw))
  mid = jax.lax.slice(w, (0, 0, 1, 0), (3, nz + 2, 1 + ty, xw))
  up = jax.lax.slice(w, (0, 0, 2, 0), (3, nz + 2, 2 + ty, xw))
  force = _slab_force_3d(up, mid, dn, k, stride, prefer_orig_order)
  out_ref[...] = jax.lax.slice_in_dim(force, 1, 1 + nz, axis=1)


def make_elastic_mesh_3d(tile: int = 128, interpret: bool = False,
                         link_loop: bool = False):
  """Returns a 3d mesh_force callable backed by the Pallas kernel.

  Note: supports [3, z, y, x] inputs (no extra batch dims) and the full
  26-neighborhood link set.
  """

  def force(x, k, stride, prefer_orig_order=False, links=None):
    del links
    return elastic_mesh_3d_pallas(
        x, k, stride if hasattr(stride, '__len__') else (stride,) * 3,
        prefer_orig_order, tile=tile, interpret=interpret,
        link_loop=link_loop)

  return force


def _roll_force_2d(xp: jnp.ndarray, k: float, stride,
                   prefer_orig_order: bool) -> jnp.ndarray:
  """8-neighbor in-plane force on a NaN-ring-padded [2, Y, X] array.

  Neighbors come from circular rolls: the NaN guard ring makes the
  wraparound harmless (wrapped neighbors are NaN -> zero spring, and the
  ring's own nodes stay NaN through the integration). Pure jnp ops, so
  it traces both in XLA and inside a Pallas kernel.
  """
  sx, sy = float(stride[0]), float(stride[1])
  y_ax, x_ax = 1, 2
  acc0 = jnp.zeros(xp.shape[1:], jnp.float32)
  acc1 = jnp.zeros(xp.shape[1:], jnp.float32)
  yn, xn = xp.shape[1], xp.shape[2]
  for ey in (-1, 0, 1):
    for ex in (-1, 0, 1):
      if ex == 0 and ey == 0:
        continue
      nbor = xp
      if ey:
        nbor = pltpu.roll(nbor, (-ey) % yn, y_ax)
      if ex:
        nbor = pltpu.roll(nbor, (-ex) % xn, x_ax)
      l0x = np.float32(sx * ex)
      l0y = np.float32(sy * ey)
      l0 = float(np.hypot(l0x, l0y))
      # Same constants as _force_tile / mesh.inplane_force: axis links
      # k, diagonals k/sqrt(2) (constant elasticity).
      k_eff = k if (ex == 0 or ey == 0) else k / np.sqrt(2.0)
      d0 = nbor[0] - xp[0] + l0x
      d1 = nbor[1] - xp[1] + l0y
      dd = d0 * d0 + d1 * d1
      inv_l = jax.lax.rsqrt(jnp.maximum(dd, 1e-60))
      if prefer_orig_order:
        fac0 = float(ex) * jnp.sign(d0) if ex != 0 else 1.0
        fac1 = float(ey) * jnp.sign(d1) if ey != 0 else 1.0
        f0 = k_eff * (1.0 - l0 * fac0 * inv_l) * d0
        f1 = k_eff * (1.0 - l0 * fac1 * inv_l) * d1
      else:
        coef = k_eff * (1.0 - l0 * inv_l)
        f0 = coef * d0
        f1 = coef * d1
      fin = jnp.isfinite(dd)  # one compare instead of 2x nan_to_num
      acc0 = acc0 + jnp.where(fin, f0, 0.0)
      acc1 = acc1 + jnp.where(fin, f1, 0.0)
  return jnp.stack([acc0, acc1])


def _fused_fire_kernel(x_ref, prev_ref, out_ref, ehist_ref, steps_ref, *,
                       config, has_prev, max_chunks):
  """The ENTIRE relax_mesh_fused convergence loop in one kernel launch.

  State (x, v, a, prev) stays VMEM-resident across every FIRE step; the
  chunked while_loop (num_iters steps per chunk, v_max/cap convergence
  check) runs on in-register scalars. For small grids — one section's
  mesh in the alignment pipeline is ~250^2 nodes — this removes the
  per-step XLA op dispatch overhead that dominates the staged solver.
  """
  from sofima_tpu import mesh as mesh_lib

  xp = x_ref[...]
  prev = prev_ref[...] if has_prev else None

  def force_fn(x, k, stride, prefer_orig_order=False):
    return _roll_force_2d(x, k, stride, prefer_orig_order)

  force, _, fire_step = mesh_lib._make_step_fns(config, force_fn, None)

  a0 = force(xp, prev, jnp.float32(config.start_cap))
  state0 = (xp, jnp.zeros_like(xp), a0, jnp.float32(config.dt),
            jnp.float32(config.alpha), 0, jnp.float32(config.start_cap))
  ehist0 = jnp.full((8, 128), jnp.nan, jnp.float32)
  rid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
  cid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

  def chunk(carry):
    state, chunk_idx, ehist, streak = carry
    state = jax.lax.fori_loop(0, config.num_iters,
                              lambda t, s: fire_step(s, prev), state)
    x, v = state[0], state[1]
    v_sq = v[0] * v[0] + v[1] * v[1]
    e_kin = jnp.sum(v_sq)
    ehist = jnp.where((rid == 0) & (cid == chunk_idx), e_kin, ehist)
    v_max = jnp.sqrt(jnp.max(v_sq))
    cap = state[-1]
    # Two consecutive converged boundaries (see mesh.relax_mesh_fused):
    # a boundary right after a FIRE uphill reset can sample a
    # transiently-tiny v_max.
    conv = (v_max < config.stop_v_max) & (cap >= config.final_cap)
    streak = jnp.where(conv, streak + 1, 0)
    new_cap = jnp.where(
        (v_max < config.stop_v_max) & (cap < config.final_cap),
        jnp.minimum(cap * config.cap_scale, config.final_cap), cap)
    state = state[:-1] + (new_cap,)
    return state, chunk_idx + 1, ehist, streak

  def cond(carry):
    _, chunk_idx, _, streak = carry
    return (streak < 2) & (chunk_idx < max_chunks)

  state, chunks, ehist, _ = jax.lax.while_loop(
      cond, chunk, (state0, 0, ehist0, jnp.int32(0)))
  out_ref[...] = state[0]
  ehist_ref[...] = ehist
  steps_ref[...] = jnp.where((rid == 0) & (cid == 0),
                             chunks * config.num_iters,
                             jnp.zeros((8, 128), jnp.int32))


@functools.partial(jax.jit, static_argnames=['config', 'interpret'])
def relax_mesh_fused_pallas(x: jnp.ndarray, prev: jnp.ndarray | None,
                            config, interpret: bool = False):
  """VMEM-resident twin of mesh.relax_mesh_fused for small 2d grids.

  Same contract: (x_final, e_kin history, steps). Requires FIRE, no
  drift removal, [2, 1, gy, gx] (or [2, gy, gx]) state small enough for
  the whole solver state to live in VMEM (~<= 1M nodes). The staged
  solver pays ~30 XLA op dispatches per Verlet step, which dwarfs the
  arithmetic on a section-sized mesh; here the entire convergence loop
  is one kernel launch.
  """
  if not config.fire:
    raise NotImplementedError('relax_mesh_fused_pallas requires FIRE.')
  if config.remove_drift:
    raise NotImplementedError('drift removal not supported in-kernel')
  squeeze = x.ndim == 4
  if squeeze:
    assert x.shape[1] == 1, 'one section per solve'
    x = x[:, 0]
    if prev is not None:
      prev = prev[:, 0]
  assert x.shape[0] == 2
  gy, gx = x.shape[1:]
  if gy * gx * 4 * 4 * 2 > 24 * 1024 * 1024:
    raise ValueError('grid too large for the VMEM-resident solver')

  max_chunks = min(int(np.ceil(config.max_iters / config.num_iters)), 128)
  pad_cfg = ((0, 0), (1, 1), (1, 1))
  xp = jnp.pad(x.astype(jnp.float32), pad_cfg, constant_values=np.nan)
  has_prev = prev is not None
  inputs = [xp]
  if has_prev:
    inputs.append(jnp.pad(prev.astype(jnp.float32), pad_cfg,
                          constant_values=np.nan))
  else:
    inputs.append(jnp.zeros((1, 1, 1), jnp.float32))  # placeholder

  kernel = functools.partial(_fused_fire_kernel, config=config,
                             has_prev=has_prev, max_chunks=max_chunks)
  out, ehist, steps = pl.pallas_call(
      kernel,
      in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
      out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
      out_shape=[
          jax.ShapeDtypeStruct(xp.shape, jnp.float32),
          jax.ShapeDtypeStruct((8, 128), jnp.float32),
          jax.ShapeDtypeStruct((8, 128), jnp.int32),
      ],
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(*inputs)
  x_out = out[:, 1:1 + gy, 1:1 + gx]
  if squeeze:
    x_out = x_out[:, None]
  return x_out, ehist[0, :max_chunks], steps[0, 0]


def _roll_force_3d(xp: jnp.ndarray, k: float, stride,
                   prefer_orig_order: bool) -> jnp.ndarray:
  """26-neighbor force on a NaN-ring-padded [3, Z, Y, X] array.

  Roll-based twin of _force_tile_3d (same per-link constants
  k_eff = k * stride_x / l0); the NaN guard ring absorbs wraparound.
  The rolls are FACTORED over the link lattice (z once per ez, y once
  per (ez, ey), x per link): 26 rolls instead of 51 — pltpu.roll is a
  real VMEM copy, and roll traffic is what bounds this kernel on v5e.
  """
  sx, sy, sz = (float(stride[0]), float(stride[1]), float(stride[2]))
  zn, yn, xn = xp.shape[1], xp.shape[2], xp.shape[3]
  acc = [jnp.zeros(xp.shape[1:], jnp.float32) for _ in range(3)]
  for ez in (-1, 0, 1):
    xz = pltpu.roll(xp, (-ez) % zn, 1) if ez else xp
    for ey in (-1, 0, 1):
      xy = pltpu.roll(xz, (-ey) % yn, 2) if ey else xz
      for ex in (-1, 0, 1):
        if ex == 0 and ey == 0 and ez == 0:
          continue
        nbor = pltpu.roll(xy, (-ex) % xn, 3) if ex else xy
        l0v = (np.float32(sx * ex), np.float32(sy * ey),
               np.float32(sz * ez))
        l0 = float(np.linalg.norm(l0v))
        k_eff = k * sx / l0
        d = [nbor[c] - xp[c] + l0v[c] for c in range(3)]
        dd = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        inv_l = jax.lax.rsqrt(jnp.maximum(dd, 1e-60))
        fin = jnp.isfinite(dd)  # one compare instead of 3x nan_to_num
        e = (ex, ey, ez)
        for c in range(3):
          if prefer_orig_order:
            fac = (float(e[c]) * jnp.sign(d[c]) if e[c] != 0 else 1.0)
            f = k_eff * (1.0 - l0 * fac * inv_l) * d[c]
          else:
            f = k_eff * (1.0 - l0 * inv_l) * d[c]
          acc[c] = acc[c] + jnp.where(fin, f, 0.0)
  return jnp.stack(acc)


def _link_table_3d(stride, k: float, half: bool = False):
  """Static per-link tables for the 26-neighbor force: [26, 3] e and
  l0 components, plus k_eff — one row per direction. `half=True`
  returns only the 13 _HALF_LINKS_3D rows (one per +-e pair, for the
  Newton's-third-law shared-chain force)."""
  sx, sy, sz = (float(stride[0]), float(stride[1]), float(stride[2]))
  if half:
    dirs = list(_HALF_LINKS_3D)
  else:
    dirs = [(ex, ey, ez) for ez in (-1, 0, 1) for ey in (-1, 0, 1)
            for ex in (-1, 0, 1) if (ex, ey, ez) != (0, 0, 0)]
  es, l0vs, keffs = [], [], []
  for ex, ey, ez in dirs:
    l0v = (sx * ex, sy * ey, sz * ez)
    l0 = float(np.linalg.norm(l0v))
    es.append((ex, ey, ez))
    l0vs.append(l0v)
    keffs.append(k * sx / l0)
  return (np.asarray(es, np.float32), np.asarray(l0vs, np.float32),
          np.asarray(keffs, np.float32))


def _link_tables_np(stride, k: float, half: bool = False):
  """Kernel-input link tables: (e f32 [n,3], e i32 [n,3], l0v f32
  [n,3], [k_eff; l0] f32 [2, n]); n = 13 if `half` else 26."""
  e_np, l0v_np, keff_np = _link_table_3d(stride, k, half=half)
  l0_np = np.linalg.norm(l0v_np, axis=1).astype(np.float32)
  return (e_np, e_np.astype(np.int32), l0v_np,
          np.stack([keff_np, l0_np]))


def _roll_force_3d_loop(xp: jnp.ndarray, k: float, stride,
                        prefer_orig_order: bool,
                        tables=None,
                        symmetric: bool = False,
                        edge_guard: bool = False) -> jnp.ndarray:
  """26-neighbor force as a fori_loop over link directions.

  Functionally identical to `_roll_force_3d`, but the 26 link bodies
  become ONE loop body with dynamic pltpu.roll shifts and per-link
  constants read from a table — 26x less generated code (the unrolled
  form crashes this relay's remote Mosaic compile helper, exit 1 at
  every tile size, BENCH_r03). Inside a Pallas kernel the tables MUST
  be passed in as kernel inputs (`tables` = the `_link_tables_np`
  quadruple as SMEM REFS — indexed per element below, because SMEM
  only supports scalar loads); pallas_call rejects captured constants.

  `symmetric=True` loops over the 13 _HALF_LINKS_3D directions
  (`tables` must then be the half tables) and accumulates each link
  pair's reaction by rolling the force field by +e — Newton's third
  law shares one sqrt/div chain per pair, exactly (see
  _slab_force_3d_sym). No boundary fix-ups are needed here: the array
  carries NaN guards on every axis, a nonzero f_e never sits where its
  reaction roll would wrap (both endpoints must be real, unwrapped
  nodes), so wrapped reaction reads are always zero.

  `edge_guard=True` replaces the NaN guard ring with per-link iota
  boundary masks: wrapped neighbor reads are zeroed where idx + e
  leaves the array, and wrapped reaction reads where idx - e does. The
  array then needs NO +1 ring — which matters because the ring forces
  the x extent from a lane-aligned size to the next 128-multiple
  (e.g. 256 -> 384 padded: ~2x wasted arithmetic for the bench mesh).
  """
  zn, yn, xn = xp.shape[1], xp.shape[2], xp.shape[3]
  if tables is None:
    tables = tuple(jnp.asarray(t)
                   for t in _link_tables_np(stride, k, half=symmetric))
  e_t, e_i, l0v_t, kl0_t = tables
  if edge_guard:
    sp = xp.shape[1:]
    ioz = jax.lax.broadcasted_iota(jnp.int32, sp, 0)
    ioy = jax.lax.broadcasted_iota(jnp.int32, sp, 1)
    iox = jax.lax.broadcasted_iota(jnp.int32, sp, 2)

  def body(i, acc):
    ez, ey, ex = e_t[i, 2], e_t[i, 1], e_t[i, 0]
    ezi, eyi, exi = e_i[i, 2], e_i[i, 1], e_i[i, 0]
    # Dynamic circular shifts; the NaN guard ring (or the edge-guard
    # masks below) absorbs wraparound.
    iz = jax.lax.rem(jnp.int32(zn) - ezi, jnp.int32(zn))
    iy = jax.lax.rem(jnp.int32(yn) - eyi, jnp.int32(yn))
    ix = jax.lax.rem(jnp.int32(xn) - exi, jnp.int32(xn))
    nbor = pltpu.roll(xp, iz, 1)
    nbor = pltpu.roll(nbor, iy, 2)
    nbor = pltpu.roll(nbor, ix, 3)
    k_eff = kl0_t[0, i]
    l0 = kl0_t[1, i]
    d = [nbor[c] - xp[c] + l0v_t[i, c] for c in range(3)]
    dd = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
    inv_l = jax.lax.rsqrt(jnp.maximum(dd, 1e-60))
    fin = jnp.isfinite(dd)  # one compare instead of 3x nan_to_num
    if edge_guard:
      inb = ((ioz + ezi >= 0) & (ioz + ezi < zn)
             & (ioy + eyi >= 0) & (ioy + eyi < yn)
             & (iox + exi >= 0) & (iox + exi < xn))
      fin = fin & inb
    e = (ex, ey, ez)
    outs = []
    for c in range(3):
      if prefer_orig_order:
        fac = jnp.where(e[c] != 0, e[c] * jnp.sign(d[c]), 1.0)
        f = k_eff * (1.0 - l0 * fac * inv_l) * d[c]
      else:
        f = k_eff * (1.0 - l0 * inv_l) * d[c]
      outs.append(jnp.where(fin, f, 0.0))
    f_st = jnp.stack(outs)
    acc = acc + f_st
    if symmetric:
      rz = jax.lax.rem(jnp.int32(zn) + ezi, jnp.int32(zn))
      ry = jax.lax.rem(jnp.int32(yn) + eyi, jnp.int32(yn))
      rx = jax.lax.rem(jnp.int32(xn) + exi, jnp.int32(xn))
      r = pltpu.roll(f_st, rz, 1)
      r = pltpu.roll(r, ry, 2)
      r = pltpu.roll(r, rx, 3)
      if edge_guard:
        rin = ((ioz - ezi >= 0) & (ioz - ezi < zn)
               & (ioy - eyi >= 0) & (ioy - eyi < yn)
               & (iox - exi >= 0) & (iox - exi < xn))
        r = jnp.where(rin[None], r, 0.0)
      acc = acc - r
    return acc

  acc0 = jnp.zeros((3,) + xp.shape[1:], jnp.float32)
  return jax.lax.fori_loop(0, 13 if symmetric else 26, body, acc0)


@functools.partial(jax.jit, static_argnames=['config', 'interpret',
                                             'link_loop', 'symmetric',
                                             'guard'])
def relax_mesh_fused_pallas_3d(x: jnp.ndarray, prev: jnp.ndarray | None,
                               config, interpret: bool = False,
                               link_loop: bool = False,
                               symmetric: bool = False,
                               guard: str = 'pad'):
  """VMEM-resident fused FIRE solver for 3d grids ([3, z, y, x]).

  The 3d multi-step-per-launch solver: every FIRE step's 26-neighbor
  force, integration, and the chunked convergence loop run inside one
  kernel, so shallow volumetric tile meshes (LICONN stitching solves)
  never stage x/v/a through HBM between steps. Same contract as
  mesh.relax_mesh_fused. The state is NaN-padded to (8, 128)-aligned
  dims — the force math on unaligned layouts is what crashed the
  relay's remote Mosaic compile in BENCH_r03 (hardware-bisected);
  `link_loop=True` swaps in the fori_loop force body with SMEM link
  tables (kept as an experiment knob).

  `guard` selects the wraparound protection (round 5):
    'pad'   NaN guard ring on every axis (original). The +1 ring pushes
            a lane-aligned x extent to the NEXT 128-multiple — for the
            LICONN bench mesh (8, 128, 256) the padded kernel computes
            2.0x the real nodes.
    'mask'  no ring; per-link iota boundary masks zero wrapped neighbor
            and reaction reads inside the force loop (link_loop only).
            Arrays are padded with NaN to (8, 128) alignment only when
            needed.
  """
  if not config.fire:
    raise NotImplementedError('requires FIRE')
  if config.remove_drift:
    raise NotImplementedError('drift removal not supported in-kernel')
  if guard not in ('pad', 'mask'):
    raise ValueError(f'unknown guard {guard!r}')
  if guard == 'mask' and not link_loop:
    raise NotImplementedError("guard='mask' requires link_loop=True")
  assert x.ndim == 4 and x.shape[0] == 3
  nz, gy, gx = x.shape[1:]
  if nz * gy * gx * 4 * 4 * 3 > 24 * 1024 * 1024:
    raise ValueError('grid too large for the VMEM-resident solver')

  max_chunks = min(int(np.ceil(config.max_iters / config.num_iters)), 128)
  if guard == 'mask':
    # Alignment-only padding (may be empty): padded NaN nodes are inert
    # to the stencil; wraparound is handled by the in-kernel masks.
    pad_y1 = (-gy) % 8
    pad_x1 = (-gx) % 128
    pad_cfg = ((0, 0), (0, 0), (0, pad_y1), (0, pad_x1))
    out_lo = (0, 0, 0)
  else:
    # Pad the guard ring out to (8, 128)-aligned last-two dims: the
    # 26-link force body compiles fine on aligned arrays but the
    # unaligned [gy+2, gx+2] layout crashes this relay's remote Mosaic
    # compile helper (bisected on hardware — trivial math on unaligned
    # shapes is fine, the force math on unaligned shapes is not). Extra
    # NaN nodes are inert to the stencil, so over-padding is free.
    pad_y1 = (-(gy + 1)) % 8 or 8
    pad_x1 = (-(gx + 1)) % 128 or 128
    pad_cfg = ((0, 0), (1, 1), (1, pad_y1), (1, pad_x1))
    out_lo = (1, 1, 1)
  xp = jnp.pad(x.astype(jnp.float32), pad_cfg, constant_values=np.nan)
  has_prev = prev is not None
  inputs = [xp]
  if has_prev:
    inputs.append(jnp.pad(prev.astype(jnp.float32), pad_cfg,
                          constant_values=np.nan))
  else:
    inputs.append(jnp.zeros((1, 1, 1, 1), jnp.float32))
  stride_t = tuple(float(s) for s in config.stride) \
      if hasattr(config.stride, '__len__') else (float(config.stride),) * 3
  if link_loop:
    inputs.extend(
        jnp.asarray(t)
        for t in _link_tables_np(stride_t, config.k, half=symmetric))

  def kernel(x_ref, prev_ref, *rest):
    from sofima_tpu import mesh as mesh_lib

    if link_loop:
      e_ref, ei_ref, l0v_ref, kl0_ref = rest[:4]
      out_ref, ehist_ref, steps_ref = rest[4:]
      # SMEM refs passed through; the loop body does scalar loads only.
      tables = (e_ref, ei_ref, l0v_ref, kl0_ref)
    else:
      out_ref, ehist_ref, steps_ref = rest
      tables = None

    xk = x_ref[...]
    prev_k = prev_ref[...] if has_prev else None

    def force_fn(xv, k, stride, prefer_orig_order=False, links=None):
      del links
      s = stride if hasattr(stride, '__len__') else (stride,) * 3
      if link_loop:
        return _roll_force_3d_loop(xv, k, s, prefer_orig_order,
                                   tables=tables, symmetric=symmetric,
                                   edge_guard=(guard == 'mask'))
      return _roll_force_3d(xv, k, s, prefer_orig_order)

    force, _, fire_step = mesh_lib._make_step_fns(config, force_fn, None)
    a0 = force(xk, prev_k, jnp.float32(config.start_cap))
    state0 = (xk, jnp.zeros_like(xk), a0, jnp.float32(config.dt),
              jnp.float32(config.alpha), 0,
              jnp.float32(config.start_cap))
    ehist0 = jnp.full((8, 128), jnp.nan, jnp.float32)
    rid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    cid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def chunk(carry):
      state, chunk_idx, ehist, streak = carry
      state = jax.lax.fori_loop(0, config.num_iters,
                                lambda t, s: fire_step(s, prev_k), state)
      v = state[1]
      v_sq = v[0] * v[0] + v[1] * v[1] + v[2] * v[2]
      ehist = jnp.where((rid == 0) & (cid == chunk_idx), jnp.sum(v_sq),
                        ehist)
      v_max = jnp.sqrt(jnp.max(v_sq))
      cap = state[-1]
      # Two consecutive converged boundaries (see mesh.relax_mesh_fused).
      conv = (v_max < config.stop_v_max) & (cap >= config.final_cap)
      streak = jnp.where(conv, streak + 1, 0)
      new_cap = jnp.where(
          (v_max < config.stop_v_max) & (cap < config.final_cap),
          jnp.minimum(cap * config.cap_scale, config.final_cap), cap)
      state = state[:-1] + (new_cap,)
      return state, chunk_idx + 1, ehist, streak

    def cond(carry):
      _, chunk_idx, _, streak = carry
      return (streak < 2) & (chunk_idx < max_chunks)

    state, chunks, ehist, _ = jax.lax.while_loop(
        cond, chunk, (state0, 0, ehist0, jnp.int32(0)))
    out_ref[...] = state[0]
    ehist_ref[...] = ehist
    steps_ref[...] = jnp.where((rid == 0) & (cid == 0),
                               chunks * config.num_iters,
                               jnp.zeros((8, 128), jnp.int32))

  in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
  if link_loop:
    in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)] * 4
  out, ehist, steps = pl.pallas_call(
      kernel,
      in_specs=in_specs,
      out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
      out_shape=[
          jax.ShapeDtypeStruct(xp.shape, jnp.float32),
          jax.ShapeDtypeStruct((8, 128), jnp.float32),
          jax.ShapeDtypeStruct((8, 128), jnp.int32),
      ],
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(*inputs)
  x_out = out[:, out_lo[0]:out_lo[0] + nz, out_lo[1]:out_lo[1] + gy,
              out_lo[2]:out_lo[2] + gx]
  return x_out, ehist[0, :max_chunks], steps[0, 0]
