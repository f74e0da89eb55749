"""Tests for bounding boxes, box generation, subvolumes, geom and config utils."""

import dataclasses

import numpy as np
import pytest

from sofima_tpu.utils import BoundingBox, BoxGenerator, Subvolume
from sofima_tpu.utils import config_utils
from sofima_tpu.utils import geom


class TestBoundingBox:

  def test_basic(self):
    b = BoundingBox(start=(1, 2, 3), size=(10, 20, 30))
    np.testing.assert_array_equal(b.end, [11, 22, 33])
    assert b.rank == 3

  def test_end_constructor(self):
    b = BoundingBox(start=(1, 2, 3), end=(11, 22, 33))
    np.testing.assert_array_equal(b.size, [10, 20, 30])

  def test_translate_adjust(self):
    b = BoundingBox(start=(0, 0, 0), size=(5, 5, 5))
    t = b.translate((1, -1, 2))
    np.testing.assert_array_equal(t.start, [1, -1, 2])
    a = b.adjusted_by(start=(-1, -1, 0), end=(1, 1, 0))
    np.testing.assert_array_equal(a.start, [-1, -1, 0])
    np.testing.assert_array_equal(a.size, [7, 7, 5])

  def test_intersection(self):
    a = BoundingBox(start=(0, 0, 0), size=(10, 10, 10))
    b = BoundingBox(start=(5, 5, 5), size=(10, 10, 10))
    i = a.intersection(b)
    np.testing.assert_array_equal(i.start, [5, 5, 5])
    np.testing.assert_array_equal(i.size, [5, 5, 5])
    c = BoundingBox(start=(20, 20, 20), size=(1, 1, 1))
    assert a.intersection(c) is None

  def test_slices(self):
    b = BoundingBox(start=(1, 2, 3), size=(4, 5, 6))
    assert b.to_slice3d() == (slice(3, 9), slice(2, 7), slice(1, 5))
    assert b.to_slice4d()[0] == slice(None)

  def test_equality_hash(self):
    a = BoundingBox(start=(0, 0, 0), size=(1, 1, 1))
    b = BoundingBox(start=(0, 0, 0), size=(1, 1, 1))
    assert a == b
    assert hash(a) == hash(b)


class TestBoxGenerator:

  def test_exact_tiling(self):
    outer = BoundingBox(start=(0, 0, 0), size=(100, 50, 10))
    gen = BoxGenerator(outer, box_size=(50, 25, 10))
    assert gen.num_boxes == 4
    boxes = gen.boxes()
    # Union covers the outer box exactly.
    covered = np.zeros((10, 50, 100), dtype=int)
    for b in boxes:
      covered[b.to_slice3d()] += 1
    assert np.all(covered == 1)

  def test_overlap_back_shift(self):
    outer = BoundingBox(start=(0, 0, 0), size=(100, 1, 1))
    gen = BoxGenerator(outer, box_size=(40, 1, 1), box_overlap=(10, 0, 0),
                       back_shift_small_boxes=True)
    boxes = gen.boxes()
    for b in boxes:
      assert b.size[0] == 40
      assert b.start[0] >= 0 and b.end[0] <= 100
    # All of the outer box is covered.
    covered = np.zeros(100, dtype=bool)
    for b in boxes:
      covered[int(b.start[0]):int(b.end[0])] = True
    assert covered.all()

  def test_cropped_boxes_partition(self):
    outer = BoundingBox(start=(0, 0, 0), size=(100, 60, 1))
    gen = BoxGenerator(outer, box_size=(40, 30, 1), box_overlap=(10, 10, 0),
                       back_shift_small_boxes=True)
    covered = np.zeros((1, 60, 100), dtype=int)
    for i in range(gen.num_boxes):
      cb = gen.index_to_cropped_box(i)
      covered[cb.to_slice3d()] += 1
      # Cropped box must be inside its work box.
      _, wb = gen.generate(i)
      assert wb.intersection(cb) == cb
    assert np.all(covered == 1), covered

  def test_iteration(self):
    outer = BoundingBox(start=(0, 0, 0), size=(10, 10, 10))
    gen = BoxGenerator(outer, box_size=(5, 5, 5))
    assert len(list(gen)) == gen.num_boxes == 8


class TestSubvolume:

  def test_channel_promotion(self):
    data = np.zeros((2, 3, 4))
    sv = Subvolume(data, BoundingBox(start=(0, 0, 0), size=(4, 3, 2)))
    assert sv.data.shape == (1, 2, 3, 4)

  def test_shape_check(self):
    with pytest.raises(ValueError):
      Subvolume(np.zeros((1, 2, 3, 4)),
                BoundingBox(start=(0, 0, 0), size=(1, 1, 1)))

  def test_clip(self):
    data = np.arange(2 * 4 * 6).reshape(1, 2, 4, 6).astype(np.float32)
    sv = Subvolume(data, BoundingBox(start=(0, 0, 0), size=(6, 4, 2)))
    clipped = sv.clip(BoundingBox(start=(1, 1, 0), size=(2, 2, 2)))
    assert clipped.data.shape == (1, 2, 2, 2)
    np.testing.assert_array_equal(clipped.data, data[:, :, 1:3, 1:3])


class TestGeom:

  def test_integral_image_query(self):
    rng = np.random.RandomState(0)
    mask = rng.rand(20, 30) > 0.5
    ii = geom.integral_image(mask)
    sums = geom.query_integral_image(ii, patch_size=(8, 8), stride=(4, 4))
    expected_shape = ((20 - 8) // 4 + 1, (30 - 8) // 4 + 1)
    assert sums.shape == expected_shape
    for i in range(expected_shape[0]):
      for j in range(expected_shape[1]):
        patch = mask[i * 4:i * 4 + 8, j * 4:j * 4 + 8]
        assert sums[i, j] == patch.sum(), (i, j)

  def test_integral_image_3d(self):
    rng = np.random.RandomState(1)
    mask = rng.rand(6, 8, 10) > 0.3
    ii = geom.integral_image(mask)
    sums = geom.query_integral_image(ii, patch_size=(4, 4, 4),
                                     stride=(2, 2, 2))
    patch = mask[2:6, 0:4, 4:8]
    assert sums[1, 0, 2] == patch.sum()


@dataclasses.dataclass(frozen=True)
class Inner:
  a: int = 1
  b: float = 2.0


@dataclasses.dataclass(frozen=True)
class Outer:
  name: str = 'x'
  inner: Inner = dataclasses.field(default_factory=Inner)


class TestConfigUtils:

  def test_update_dataclass_deep(self):
    cfg = Outer()
    new = config_utils.update_dataclass(cfg, {'inner': {'a': 5}})
    assert new.inner.a == 5
    assert new.inner.b == 2.0
    assert cfg.inner.a == 1  # original untouched

  def test_update_unknown_field(self):
    with pytest.raises(KeyError):
      config_utils.update_dataclass(Outer(), {'bogus': 1})

  def test_json_roundtrip(self):
    cfg = Outer(name='y', inner=Inner(a=7))
    text = config_utils.to_json(cfg)
    back = config_utils.from_json(Outer, text)
    assert back == cfg

  def test_registry(self):
    config_utils.register_default_config('test_flavor', Outer,
                                         lambda: Outer(name='d'))
    cfg = config_utils.default_config('test_flavor', Outer,
                                      overrides={'inner': {'b': 9.0}})
    assert cfg.name == 'd'
    assert cfg.inner.b == 9.0
