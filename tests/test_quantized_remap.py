"""Quantized CPU remap (ops.quantized_remap): the cv2 fixed-point
contract (/root/reference/warp.py:156-165) and its tolerance bridge to
the float resampling paths."""

import os

import jax.numpy as jnp
import numpy as np

from sofima_tpu.ops import interp, quantized_remap

GOLDEN = os.path.join(os.path.dirname(__file__), 'golden',
                      'quantized_remap_lanczos4.npz')


class TestQuantizedRemap:

  def test_integer_shift_is_exact(self):
    rng = np.random.RandomState(0)
    img = (rng.rand(48, 48) * 255).astype(np.uint8)
    yy, xx = np.mgrid[:48, :48].astype(np.float64)
    out = quantized_remap.remap_lanczos4(img, xx + 5, yy - 3)
    np.testing.assert_array_equal(out[8:-8, 8:-8],
                                  np.roll(img, (3, -5), (0, 1))[8:-8, 8:-8])

  def test_tap_tables_sum_exactly(self):
    tabs = quantized_remap._tab2d()
    sums = tabs.astype(np.int64).sum(axis=(2, 3))
    # Every table sums to 2^15, except tables containing the saturated
    # DC tap (fraction 0: the 1.0 coefficient clamps to 32767, exactly
    # cv2's saturate_cast<short> behavior — benign for uint8 data).
    ok = (sums == quantized_remap.COEF_SCALE) | (
        (sums == quantized_remap.COEF_SCALE - 1)
        & (tabs.max(axis=(2, 3)) == 32767))
    assert ok.all()

  def test_golden_regression(self):
    # Bit-stable CPU anchor: any change to the quantized pipeline must
    # be deliberate (regenerate the golden and justify it).
    g = np.load(GOLDEN)
    out = quantized_remap.remap_lanczos4(g['image'],
                                         g['cx'].astype(np.float64),
                                         g['cy'].astype(np.float64))
    np.testing.assert_array_equal(out, g['expected'])

  def test_tolerance_bridge_to_float_path(self):
    # The documented contract: vs float Lanczos resampling CLIPPED to
    # the uint8 range (the quantized path saturates under/overshoot,
    # exactly like cv2 on uint8 data), the quantized path differs by
    # <= 8 gray levels at any pixel and <= 1.5 on average on smooth
    # maps — the error is dominated by the 1/32 coordinate
    # quantization, not the 15-bit taps. (The golden uses white-noise
    # data — the worst case for coordinate quantization; band-limited
    # EM content sits well inside these bounds.)
    g = np.load(GOLDEN)
    coords = jnp.stack([jnp.asarray(g['cy']), jnp.asarray(g['cx'])])
    ref = np.asarray(interp.sample(
        jnp.asarray(g['image'].astype(np.float32)), coords,
        method='lanczos', mode='constant', cval=0.0))
    ref = np.clip(ref, 0.0, 255.0)
    inter = np.s_[8:-8, 8:-8]
    diff = np.abs(ref[inter] - g['expected'].astype(np.float32)[inter])
    assert diff.max() <= 8.0, diff.max()
    assert diff.mean() <= 1.5, diff.mean()

  def test_nan_and_border(self):
    img = np.full((32, 32), 200, np.uint8)
    yy, xx = np.mgrid[:32, :32].astype(np.float64)
    cx = xx.copy()
    cy = yy.copy()
    cx[0, 0] = np.nan
    cx[1, 1] = 1000.0  # far out of range
    out = quantized_remap.remap_lanczos4(img, cx, cy, cval=7.0)
    assert out[0, 0] == 7
    assert out[1, 1] == 7
    assert out[16, 16] == 200
