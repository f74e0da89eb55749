"""Native C++ kernel tests (EDT exactness, relabeling, remap)."""

import numpy as np
import pytest

from sofima_tpu import native
from sofima_tpu.ops import edt as edt_ops

requires_native = pytest.mark.skipif(not native.available(),
                                     reason='native toolchain unavailable')


def _brute_edt(mask, black_border=True):
  inside = mask != 0
  if black_border:
    inside = np.pad(inside, 1, constant_values=False)
  bg = np.argwhere(~inside).astype(np.float64)
  out = np.zeros(inside.shape, np.float32)
  for y, x in np.argwhere(inside):
    d = np.sqrt(((bg - [y, x]) ** 2).sum(axis=1)).min()
    out[y, x] = d
  if black_border:
    out = out[1:-1, 1:-1]
  return out


class TestNativeEdt:

  @requires_native
  def test_exact_vs_bruteforce(self):
    rng = np.random.RandomState(0)
    mask = rng.rand(24, 31) > 0.35
    out = native.edt2d(mask, black_border=True)
    np.testing.assert_allclose(out, _brute_edt(mask), atol=1e-4)

  @requires_native
  def test_no_black_border(self):
    mask = np.ones((10, 12), bool)
    mask[4, 6] = False
    out = native.edt2d(mask, black_border=False)
    assert out[4, 6] == 0
    np.testing.assert_allclose(out[4, 7], 1.0)
    np.testing.assert_allclose(out[0, 0], np.hypot(4, 6), atol=1e-4)

  @requires_native
  def test_rectangle_mask(self):
    mask = np.zeros((40, 40), bool)
    mask[5:35, 10:30] = True
    out = native.edt2d(mask, black_border=True)
    # Center distance = min distance to the rectangle border + 1 ring.
    assert abs(out[20, 20] - 10.0) < 1e-3
    assert out[0, 0] == 0

  def test_edt_dispatcher_matches_native(self):
    rng = np.random.RandomState(1)
    mask = rng.rand(20, 20) > 0.4
    out = edt_ops.edt(mask)
    np.testing.assert_allclose(out, _brute_edt(mask), atol=0.02)


class TestNativeRelabel:

  @requires_native
  def test_roundtrip(self):
    rng = np.random.RandomState(0)
    ids = np.array([0, 5, 2**33, 2**40 + 7], np.uint64)
    data = ids[rng.randint(0, 4, size=(50, 60))]
    out = native.relabel(data, np.sort(ids))
    assert out.dtype == np.int32
    restored = np.sort(ids)[out]
    np.testing.assert_array_equal(restored, data)


class TestNativeRemap:

  @requires_native
  def test_matches_interp(self):
    import jax.numpy as jnp
    from sofima_tpu.ops import interp
    rng = np.random.RandomState(0)
    img = rng.rand(30, 40).astype(np.float32)
    sy = rng.rand(100).astype(np.float32) * 29
    sx = rng.rand(100).astype(np.float32) * 39
    ours = native.remap_bilinear(img, sy, sx)
    ref = np.asarray(interp.sample(
        jnp.asarray(img), jnp.asarray(np.stack([sy, sx])),
        method='linear', mode='constant', cval=0.0))
    np.testing.assert_allclose(ours, ref, atol=1e-5)

  @requires_native
  def test_oob_cval(self):
    img = np.ones((5, 5), np.float32)
    out = native.remap_bilinear(img, np.array([-1.0]), np.array([2.0]),
                                cval=7.0)
    assert out[0] == 7.0
