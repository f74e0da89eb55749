"""ReconcileCrossBlockMaps: blending algebra on constant-offset maps.

With spatially-constant coordinate maps, composition is additive and the
blend has a closed form:
    offset = -xblock_pre - block_end + xblock_post
    out(z) = data(z) + xblock_pre + (i / block_size) * offset
which pins block-start sections to the cross-block solution exactly and
interpolates interior sections linearly.
"""

import dataclasses
import numpy as np
import pytest

from sofima_tpu.processor import maps as maps_proc
from sofima_tpu.utils.bounding_box import BoundingBox
from sofima_tpu.utils.subvolume import Subvolume
from sofima_tpu.utils.volume import InMemoryVolume


def _const_map(value_xy, nz, n):
  m = np.zeros((2, nz, n, n), np.float32)
  m[0] = value_xy[0]
  m[1] = value_xy[1]
  return m


class TestReconcileCrossBlockMaps:

  def test_constant_map_blend(self):
    n = 8
    block = 4  # sections 0..4 in block 0, 4..8 in block 1
    nz = 9

    # Blockwise 'main' solution: constant +2 px x within each block.
    data = _const_map((2.0, 0.0), nz, n)

    # Cross-block solution: block boundaries at z=0,4,8 with x offsets.
    xblock_vals = {0: (1.0, 0.0), 4: (5.0, 0.0), 8: (9.0, 0.0)}
    xblock = np.zeros((2, nz, n, n), np.float32)
    xblock_inv = np.zeros((2, nz, n, n), np.float32)
    for z, (vx, vy) in xblock_vals.items():
      xblock[0, z] = vx
      xblock[1, z] = vy
      xblock_inv[0, z] = -vx
      xblock_inv[1, z] = -vy

    # 'last' = position of each block-start section as solved in the
    # PREVIOUS block: constant +3 px.
    last_inv = _const_map((-3.0, 0.0), nz, n)
    main_inv = _const_map((-2.0, 0.0), nz, n)

    cfg = maps_proc.ReconcileCrossBlockMaps.Config(
        cross_block=InMemoryVolume(xblock),
        cross_block_inv=InMemoryVolume(xblock_inv),
        last_inv=InMemoryVolume(last_inv),
        main_inv=InMemoryVolume(main_inv),
        z_map={'0': 0, '4': 4, '8': 8},
        stride=4,
        xy_overlap=4,
        backward=False)
    proc = maps_proc.ReconcileCrossBlockMaps(cfg)

    box = BoundingBox(start=(0, 0, 0), size=(n, n, nz))
    out = proc.process(Subvolume(data.copy(), box))
    result = out.data

    # Closed form per block [z0, z1): out(i=z-z0) =
    #   data + xpre + (i/bs) * (-xpre - bend + xpost)
    for zi in range(result.shape[1]):
      z = zi + int(out.bbox.start[2])
      z0 = 0 if z < block else block
      z1 = block if z < block else 2 * block
      i = z - z0
      xpre = xblock_vals[z0][0] if z0 > 0 else 0.0
      xpost = xblock_vals[z1][0]
      bend = 3.0 if z1 != 8 else 2.0  # last_inv vs main_inv at the end
      if i == 0:
        expected = xpre
      elif i == block:
        expected = xpost
      else:
        expected = 2.0 + xpre + (i / block) * (-xpre - bend + xpost)
      np.testing.assert_allclose(result[0, zi], expected, atol=0.05,
                                 err_msg=f'z={z}')
      np.testing.assert_allclose(result[1, zi], 0.0, atol=0.05)

  def test_constant_map_blend_backward(self):
    # Backward processing: each block is pinned at its START boundary to
    # the cross-block solution (xblock_post = xblock[z0]); the LAST block
    # keeps its blockwise solution at the end (xblock_pre = 0 at z1 =
    # last boundary); interior scale = (block_size - i) / block_size.
    n, block, nz = 8, 4, 9
    data = _const_map((2.0, 0.0), nz, n)

    xblock_vals = {0: (1.0, 0.0), 4: (5.0, 0.0), 8: (9.0, 0.0)}
    xblock = np.zeros((2, nz, n, n), np.float32)
    xblock_inv = np.zeros((2, nz, n, n), np.float32)
    for z, (vx, vy) in xblock_vals.items():
      xblock[0, z] = vx
      xblock[1, z] = vy
      xblock_inv[0, z] = -vx
      xblock_inv[1, z] = -vy

    last_inv = _const_map((-3.0, 0.0), nz, n)
    main_inv = _const_map((-2.0, 0.0), nz, n)

    cfg = maps_proc.ReconcileCrossBlockMaps.Config(
        cross_block=InMemoryVolume(xblock),
        cross_block_inv=InMemoryVolume(xblock_inv),
        last_inv=InMemoryVolume(last_inv),
        main_inv=InMemoryVolume(main_inv),
        z_map={'0': 0, '4': 4, '8': 8},
        stride=4,
        xy_overlap=4,
        backward=True)
    proc = maps_proc.ReconcileCrossBlockMaps(cfg)

    box = BoundingBox(start=(0, 0, 0), size=(n, n, nz))
    out = proc.process(Subvolume(data.copy(), box))
    result = out.data

    for zi in range(result.shape[1]):
      z = zi + int(out.bbox.start[2])
      z0 = 0 if z < block else block
      z1 = block if z < block else 2 * block
      i = z - z0
      xpost = xblock_vals[z0][0]
      # For the last block, xblock_pre = 0; block_end_inv comes from
      # last_inv at z0 (or main_inv at the very first boundary).
      xpre = xblock_vals[z1][0] if z1 != 8 else 0.0
      bend = 2.0 if z0 == 0 else 3.0
      if i == 0:
        expected = xpost
      elif i == block:
        expected = xpre
      else:
        offset = -xpre - bend + xpost
        expected = 2.0 + xpre + ((block - i) / block) * offset
      np.testing.assert_allclose(result[0, zi], expected, atol=0.05,
                                 err_msg=f'z={z}')
      np.testing.assert_allclose(result[1, zi], 0.0, atol=0.05)

  def test_nan_passthrough(self):
    n, nz = 8, 5
    data = _const_map((1.0, 0.0), nz, n)
    data[:, 2, 3, 3] = np.nan
    zeros = InMemoryVolume(_const_map((0.0, 0.0), nz, n))
    cfg = maps_proc.ReconcileCrossBlockMaps.Config(
        cross_block=zeros, cross_block_inv=zeros, last_inv=zeros,
        main_inv=zeros, z_map={'0': 0, '4': 4}, stride=4, xy_overlap=4)
    proc = maps_proc.ReconcileCrossBlockMaps(cfg)
    box = BoundingBox(start=(0, 0, 0), size=(n, n, nz))
    out = proc.process(Subvolume(data.copy(), box))
    # Invalid entries of the input stay invalid in the output (the
    # context crop shifts indices: out box starts at (2, 2, 1)).
    rel = np.array([2, 3, 3]) - out.bbox.start[::-1]
    assert np.isnan(out.data[(slice(None),) + tuple(rel)]).all()


class TestCrossBlockEndToEnd:
  """Real two-level blockwise solve (SURVEY §3.3 steps 4b/4c).

  Synthetic 9-section stack with cumulative smooth drift, solved in two
  independent blocks of 4 (block starts pinned to zero), then made
  globally contiguous via a low-z-res cross-block relaxation +
  ReconcileCrossBlockMaps. The naive blockwise solution has a geometry
  jump at z=4; the blended solution must not.
  """

  def _solve_stack(self):
    import jax.numpy as jnp
    from sofima_tpu import flow_field, flow_utils, map_utils, mesh

    n, stride, patch = 160, 10, 40
    nz, block = 9, 4
    grid_n = n // stride
    pad = patch // 2 // stride

    rng = np.random.RandomState(0)
    noise = rng.rand(n, n).astype(np.float32)
    f = np.fft.rfft2(noise)
    fy = np.fft.fftfreq(n)[:, None]
    fx = np.fft.rfftfreq(n)[None, :]
    f *= np.exp(-((fx**2 + fy**2) / (2 * 0.08**2)))
    tex = np.fft.irfft2(f, s=(n, n))
    tex = ((tex - tex.min()) / np.ptp(tex) * 255).astype(np.float32)

    y, x = np.mgrid[:n, :n].astype(np.float32)
    amp = 2.0
    dx = amp * np.sin(2 * np.pi * y / n)
    dy = amp * np.cos(2 * np.pi * x / n)

    from sofima_tpu.ops import interp
    sections = []
    for z in range(nz):
      coords = np.stack([y + z * dy, x + z * dx])
      sections.append(np.asarray(interp.sample(
          jnp.asarray(tex), jnp.asarray(coords), method='linear',
          mode='nearest')))
    sections = np.stack(sections)

    mfc = flow_field.JAXMaskedXCorrWithStatsCalculator()
    flows = {}
    for z in range(1, nz):
      fl = mfc.flow_field(sections[z - 1], sections[z], patch_size=patch,
                          step=stride, batch_size=64)
      cl = flow_utils.clean_flow(fl[:, np.newaxis], min_peak_ratio=1.4,
                                 min_peak_sharpness=1.4, max_magnitude=40,
                                 max_deviation=10)
      full = np.full((2, 1, grid_n, grid_n), np.nan, np.float32)
      full[:, :, pad:pad + cl.shape[2], pad:pad + cl.shape[3]] = cl
      flows[z] = full

    cfg = mesh.IntegrationConfig(
        dt=0.001, gamma=0.0, k0=0.1, k=0.1, stride=(stride, stride),
        num_iters=500, max_iters=20000, stop_v_max=0.01, dt_max=100.0,
        start_cap=0.01, final_cap=10.0, cap_scale=1.1)
    xcfg = dataclasses.replace(cfg, k0=0.01)

    def relax(prev):
      solved, _, _ = mesh.relax_mesh_fused(
          jnp.zeros_like(jnp.asarray(prev)), jnp.asarray(prev), cfg)
      return np.asarray(solved)

    def step(flow, ref_mesh):
      prev = np.array(map_utils.compose_maps_fast(
          jnp.asarray(flow), (0.0, 0.0), (stride, stride),
          jnp.asarray(ref_mesh), (0.0, 0.0), (stride, stride)))
      return relax(prev)

    # Blockwise 'main' solve: starts pinned to zeros.
    zeros = np.zeros((2, 1, grid_n, grid_n), np.float32)
    main = {0: zeros.copy(), 4: zeros.copy()}
    for z in (1, 2, 3):
      main[z] = step(flows[z], main[z - 1])
    last4 = step(flows[4], main[3])  # z=4 as solved within block 0
    for z in (5, 6, 7):
      main[z] = step(flows[z], main[z - 1])
    last8 = step(flows[8], main[7])  # z=8 as solved within block 1
    main[8] = last8

    # Cross-block solve over boundary sections (z = 0, 4, 8).
    import jax.numpy as _j
    from sofima_tpu import mesh as _mesh
    def xrelax(prev):
      solved, _, _ = _mesh.relax_mesh_fused(
          _j.zeros_like(_j.asarray(prev)), _j.asarray(prev), xcfg)
      return np.asarray(solved)
    xblock = [zeros.copy()]
    for cross_flow in (last4, last8):
      prev = np.array(map_utils.compose_maps_fast(
          jnp.asarray(cross_flow), (0.0, 0.0), (stride, stride),
          jnp.asarray(xblock[-1]), (0.0, 0.0), (stride, stride)))
      xblock.append(xrelax(prev))
    xblock = np.concatenate(xblock, axis=1)

    return dict(n=n, stride=stride, patch=patch, nz=nz, grid_n=grid_n,
                sections=sections, main=main, last4=last4, last8=last8,
                xblock=xblock)

  def test_two_level_blockwise_solve(self):
    from sofima_tpu import map_utils, warp
    s = self._solve_stack()
    stride, grid_n, nz = s['stride'], s['grid_n'], s['nz']
    gbox = BoundingBox(start=(0, 0, 0), size=(grid_n, grid_n, 1))

    def inv(m):
      out = map_utils.invert_map(m, gbox, gbox, stride)
      return map_utils.fill_missing(out, extrapolate=True)

    main_stack = np.concatenate([s['main'][z] for z in range(nz)], axis=1)
    main_inv = np.zeros_like(main_stack)
    main_inv[:, 8:9] = inv(s['main'][8])
    last_inv = np.zeros_like(main_stack)
    last_inv[:, 4:5] = inv(s['last4'])
    xblock_inv = np.concatenate(
        [inv(s['xblock'][:, i:i + 1]) for i in range(3)], axis=1)

    cfg = maps_proc.ReconcileCrossBlockMaps.Config(
        cross_block=InMemoryVolume(s['xblock']),
        cross_block_inv=InMemoryVolume(xblock_inv),
        last_inv=InMemoryVolume(last_inv),
        main_inv=InMemoryVolume(main_inv),
        z_map={'0': 0, '4': 1, '8': 2},
        stride=stride,
        xy_overlap=2)
    proc = maps_proc.ReconcileCrossBlockMaps(cfg)
    box = BoundingBox(start=(0, 0, 0), size=(grid_n, grid_n, nz))
    out = proc.process(Subvolume(main_stack.copy(), box))
    z_off = int(out.bbox.start[2])
    c_off = int(out.bbox.start[0])
    sel = np.s_[:, :, c_off:c_off + out.data.shape[2],
                c_off:c_off + out.data.shape[3]]

    def at(z):
      return out.data[:, z - z_off]

    # 1. Block-start sections land exactly on the cross-block solution.
    np.testing.assert_allclose(at(4), s['xblock'][sel][:, 1],
                               atol=1e-4, err_msg='z=4 not pinned')
    np.testing.assert_allclose(at(8), s['xblock'][sel][:, 2],
                               atol=1e-4, err_msg='z=8 not pinned')

    # 2. The naive blockwise solution jumps at z=4; the blend must not.
    def mag(d):
      return np.nanmean(np.hypot(d[0], d[1]))

    jump_main = mag(s['main'][4][:, 0] - s['main'][3][:, 0])
    step_typ = np.median([mag(s['main'][z][:, 0] - s['main'][z - 1][:, 0])
                          for z in (2, 3, 6, 7)])
    jump_blend = mag(at(4) - at(3))
    assert jump_main > 3 * step_typ, (jump_main, step_typ)  # defect exists
    assert jump_blend < 2 * step_typ, (jump_blend, step_typ)  # defect fixed

    # 3. Render across the boundary: blended geometry is contiguous.
    n, patch = s['n'], s['patch']
    ibox = BoundingBox(start=(0, 0, 0), size=(n, n, 1))

    def render(z, m):
      im = map_utils.fill_missing(
          map_utils.invert_map(m, gbox, gbox, stride), extrapolate=True)
      return warp.warp_subvolume(
          s['sections'][z][np.newaxis, np.newaxis], ibox, im, gbox,
          stride, ibox, interpolation='lanczos')[0, 0]

    interior = np.s_[patch:-patch, patch:-patch]
    def embed(m2d):
      fullm = np.full((2, 1, grid_n, grid_n), np.nan, np.float32)
      fullm[:, 0, c_off:c_off + m2d.shape[1],
            c_off:c_off + m2d.shape[2]] = m2d
      return fullm

    zeros_m = np.zeros((2, 1, grid_n, grid_n), np.float32)
    naive = np.abs(render(3, s['main'][3]) - render(4, zeros_m))
    blended = np.abs(render(3, embed(at(3))) - render(4, embed(at(4))))
    assert blended[interior].mean() < 0.6 * naive[interior].mean(), (
        blended[interior].mean(), naive[interior].mean())
