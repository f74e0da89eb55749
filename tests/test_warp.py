"""Tests for warping/rendering (goldens: translations, rotations, seg ids)."""

import numpy as np
import pytest

from sofima_tpu import map_utils
from sofima_tpu import warp
from sofima_tpu.utils import BoundingBox


class TestWarpSubvolume:

  def _boxes(self, size_xy, z=1):
    b = BoundingBox(start=(0, 0, 0), size=(size_xy[0], size_xy[1], z))
    return b

  def test_identity(self):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (1, 1, 40, 40)).astype(np.uint8)
    box = self._boxes((40, 40))
    cmap = np.zeros((2, 1, 4, 4), np.float32)
    mbox = BoundingBox(start=(0, 0, 0), size=(4, 4, 1))
    out = warp.warp_subvolume(img, box, cmap, mbox, 10.0, box,
                              interpolation='linear')
    np.testing.assert_array_equal(out[:, :, 5:-5, 5:-5],
                                  img[:, :, 5:-5, 5:-5])

  def test_integer_translation(self):
    rng = np.random.RandomState(1)
    img = rng.randint(10, 255, (1, 1, 40, 40)).astype(np.uint8)
    box = self._boxes((40, 40))
    # Inverse map: read from (x+5, y-3) -> shifts content by (-5, +3).
    cmap = np.zeros((2, 1, 4, 4), np.float32)
    cmap[0] = 5.0
    cmap[1] = -3.0
    mbox = BoundingBox(start=(0, 0, 0), size=(4, 4, 1))
    out = warp.warp_subvolume(img, box, cmap, mbox, 10.0, box,
                              interpolation='nearest')
    sel_out = np.s_[0, 0, 5:30, 5:30]
    expected = img[0, 0, 5 - 3:30 - 3, 5 + 5:30 + 5]
    np.testing.assert_array_equal(out[sel_out], expected)

  @pytest.mark.parametrize('method', ['linear', 'cubic', 'lanczos'])
  def test_methods_reproduce_translation(self, method):
    rng = np.random.RandomState(2)
    img = rng.rand(1, 1, 48, 48).astype(np.float32)
    box = self._boxes((48, 48))
    cmap = np.full((2, 1, 6, 6), 0.0, np.float32)
    cmap[0] = 7.0  # integer shift: all kernels must be exact
    mbox = BoundingBox(start=(0, 0, 0), size=(6, 6, 1))
    out = warp.warp_subvolume(img, box, cmap, mbox, 8.0, box,
                              interpolation=method)
    np.testing.assert_allclose(out[0, 0, 10:-10, 10:-10],
                               img[0, 0, 10:-10, 17:-3], atol=1e-3)

  def test_uint64_segmentation_preserves_large_ids(self):
    ids = np.array([0, 2**33 + 5, 2**40 + 1, 7], dtype=np.uint64)
    img = np.zeros((1, 1, 20, 20), dtype=np.uint64)
    img[0, 0, 5:10, 5:10] = ids[1]
    img[0, 0, 12:15, 12:15] = ids[2]
    img[0, 0, 0:3, 0:3] = ids[3]
    box = self._boxes((20, 20))
    cmap = np.zeros((2, 1, 2, 2), np.float32)
    cmap[0] = 2.0  # read from x+2
    mbox = BoundingBox(start=(0, 0, 0), size=(2, 2, 1))
    out = warp.warp_subvolume(img, box, cmap, mbox, 10.0, box)
    assert out.dtype == np.uint64
    assert set(np.unique(out)) <= set(ids.tolist())
    np.testing.assert_array_equal(out[0, 0, 5:10, 3:8], ids[1])

  def test_all_nan_section_skipped(self):
    img = np.full((1, 2, 20, 20), 9, dtype=np.uint8)
    box = BoundingBox(start=(0, 0, 0), size=(20, 20, 2))
    cmap = np.zeros((2, 2, 2, 2), np.float32)
    cmap[:, 1] = np.nan
    mbox = BoundingBox(start=(0, 0, 0), size=(2, 2, 2))
    out = warp.warp_subvolume(img, box, cmap, mbox, 10.0, box,
                              interpolation='nearest')
    assert (out[0, 0] == 9).all()
    assert (out[0, 1] == 0).all()


class TestNdimageWarp:

  def test_identity_2d(self):
    rng = np.random.RandomState(0)
    img = rng.rand(30, 30).astype(np.float32)
    cmap = np.zeros((2, 3, 3), np.float32)
    out = warp.ndimage_warp(img, cmap, stride=(10, 10), work_size=(20, 20),
                            overlap=(4, 4))
    np.testing.assert_allclose(out[2:-2, 2:-2], img[2:-2, 2:-2], atol=1e-4)

  def test_translation_3d(self):
    rng = np.random.RandomState(1)
    img = rng.rand(8, 24, 24).astype(np.float32)
    cmap = np.zeros((3, 2, 3, 3), np.float32)
    cmap[0] = 4.0  # x source offset
    out = warp.ndimage_warp(img, cmap, stride=(4, 8, 8),
                            work_size=(16, 16, 8), overlap=(4, 4, 0))
    np.testing.assert_allclose(out[2:-2, 2:-2, 2:-8],
                               img[2:-2, 2:-2, 6:-4], atol=1e-4)

  def test_rotation_mass_preserved(self):
    # 45° rotation of a square keeps its mass inside the rotated square.
    n = 64
    img = np.zeros((n, n), np.float32)
    img[24:40, 24:40] = 1.0
    theta = np.pi / 4
    c, s = np.cos(theta), np.sin(theta)
    yy, xx = np.mgrid[:9, :9].astype(np.float32)
    cy = cx = 4.0
    stride = 8.0
    # Inverse rotation about the image center.
    rel_x = (xx - cx) * stride
    rel_y = (yy - cy) * stride
    src_x = c * rel_x - s * rel_y + cx * stride
    src_y = s * rel_x + c * rel_y + cy * stride
    cmap = np.stack([src_x - xx * stride, src_y - yy * stride])
    out = warp.ndimage_warp(img, cmap, stride=(stride, stride),
                            work_size=(64, 64), overlap=(0, 0))
    assert out.sum() > 0.8 * img.sum()
    # The rotated square pokes outside the original square's x-extent:
    # (dx, dy) = (-10, 0) is outside [24, 40) but inside the rotation.
    assert out[32, 22] > 0.5


class TestRenderTiles:

  def test_two_tile_montage(self):
    rng = np.random.RandomState(0)
    t0 = rng.randint(60, 200, (48, 48)).astype(np.uint8)
    t1 = rng.randint(60, 200, (48, 48)).astype(np.uint8)
    tiles = {(0, 0): t0, (1, 0): t1}
    cmaps = {
        (0, 0): np.zeros((2, 1, 6, 6), np.float32),
        (1, 0): np.zeros((2, 1, 6, 6), np.float32),
    }
    canvas, mask = warp.render_tiles(tiles, cmaps, stride=(8, 8), margin=4)
    assert canvas.shape == (48, 96)
    assert mask[24, 24] and mask[24, 72]
    # Interior content preserved.
    np.testing.assert_array_equal(canvas[8:40, 8:40], t0[8:40, 8:40])

  def test_margins_excluded(self):
    t0 = np.full((32, 32), 100, np.uint8)
    tiles = {(0, 0): t0}
    cmaps = {(0, 0): np.zeros((2, 1, 4, 4), np.float32)}
    canvas, mask = warp.render_tiles(tiles, cmaps, stride=(8, 8), margin=8)
    assert not mask[2, 2]
    assert mask[16, 16]


class TestWarpPoints:

  def test_constant_shift(self):
    cmap = np.zeros((2, 1, 8, 8), np.float32)
    cmap[0] = 3.0
    cmap[1] = -2.0
    mbox = BoundingBox(start=(0, 0, 0), size=(8, 8, 1))
    pts = np.array([[10, 12, 0], [30, 40, 0]], dtype=np.int64)
    out = warp.warp_points(pts, cmap, mbox, stride=8.0)
    np.testing.assert_array_equal(out[:, 0], [13, 33])
    np.testing.assert_array_equal(out[:, 1], [10, 38])
    np.testing.assert_array_equal(out[:, 2], [0, 0])

  def test_float_points_preserved_dtype(self):
    cmap = np.zeros((2, 1, 4, 4), np.float32)
    mbox = BoundingBox(start=(0, 0, 0), size=(4, 4, 1))
    pts = np.array([[5.5, 6.25, 0.0]], dtype=np.float32)
    out = warp.warp_points(pts, cmap, mbox, stride=8.0)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out[0, :2], [5.5, 6.25], atol=1e-4)


class TestClahe:

  def test_flat_image_stays_flat(self):
    from sofima_tpu.ops import clahe
    img = np.full((64, 64), 128, np.uint8)
    out = clahe.equalize_adapthist(img)
    assert np.ptp(out) < 0.05

  def test_improves_low_contrast(self):
    from sofima_tpu.ops import clahe
    rng = np.random.RandomState(0)
    img = (rng.rand(64, 64) * 20 + 100).astype(np.uint8)  # low contrast
    out = clahe.equalize_adapthist(img)
    assert np.ptp(out) > 3 * (20 / 255)  # contrast expanded >3x
    assert 0.0 <= out.min() and out.max() <= 1.0


class TestRenderTilesExtras:

  def test_tile_masks_and_clahe(self):
    rng = np.random.RandomState(5)
    t0 = rng.randint(60, 200, (48, 48)).astype(np.uint8)
    tiles = {(0, 0): t0}
    cmaps = {(0, 0): np.zeros((2, 1, 6, 6), np.float32)}
    tile_mask = np.ones((48, 48), np.uint8)
    tile_mask[:, 24:] = 0  # right half excluded
    canvas, mask = warp.render_tiles(
        tiles, cmaps, stride=(8, 8), margin=4, use_clahe=True,
        clahe_kwargs={'clip_limit': 0.02},
        tile_masks={(0, 0): tile_mask})
    assert mask[24, 10]
    assert not mask[24, 40]  # masked-out half not rendered

  def test_margin_overrides(self):
    t0 = np.full((32, 32), 120, np.uint8)
    tiles = {(0, 0): t0}
    cmaps = {(0, 0): np.zeros((2, 1, 4, 4), np.float32)}
    canvas, mask = warp.render_tiles(
        tiles, cmaps, stride=(8, 8), margin=2,
        margin_overrides={(0, 0): (10, 10, 2, 2)})
    assert not mask[5, 16]  # top margin 10 excluded
    assert mask[16, 16]

  def test_return_warped_tiles(self):
    t0 = np.full((32, 32), 99, np.uint8)
    tiles = {(0, 0): t0}
    cmaps = {(0, 0): np.zeros((2, 1, 4, 4), np.float32)}
    canvas, mask, warped = warp.render_tiles(
        tiles, cmaps, stride=(8, 8), margin=4, return_warped_tiles=True)
    assert (0, 0) in warped
    x0, y0, img = warped[(0, 0)]
    assert img.ndim == 2
