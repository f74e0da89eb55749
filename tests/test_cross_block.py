"""ReconcileCrossBlockMaps: blending algebra on constant-offset maps.

With spatially-constant coordinate maps, composition is additive and the
blend has a closed form:
    offset = -xblock_pre - block_end + xblock_post
    out(z) = data(z) + xblock_pre + (i / block_size) * offset
which pins block-start sections to the cross-block solution exactly and
interpolates interior sections linearly.
"""

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
