"""Tests for flow filtering/reconciliation and morphology ops."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage  # oracle only

from sofima_tpu import flow_utils
from sofima_tpu.ops import morphology


class TestMorphology:

  def test_median_filter_matches_scipy_interior(self):
    rng = np.random.RandomState(0)
    x = rng.rand(2, 1, 12, 12).astype(np.float32)
    ours = np.asarray(morphology.median_filter(jnp.asarray(x), dims=2))
    ref = ndimage.median_filter(x, size=(1, 1, 3, 3))
    np.testing.assert_allclose(ours[:, :, 1:-1, 1:-1], ref[:, :, 1:-1, 1:-1],
                               atol=1e-6)

  def test_label_components(self):
    mask = np.zeros((10, 10), bool)
    mask[1:4, 1:4] = True      # component A (9 px)
    mask[6:8, 6:9] = True      # component B (6 px)
    mask[9, 0] = True          # component C (1 px)
    labels = np.asarray(morphology.label_components(jnp.asarray(mask)))
    assert labels[0, 0] == -1
    a, b, c = labels[2, 2], labels[7, 7], labels[9, 0]
    assert len({a, b, c}) == 3
    assert (labels[1:4, 1:4] == a).all()
    assert (labels[6:8, 6:9] == b).all()

  def test_component_sizes_and_small_mask(self):
    mask = np.zeros((10, 10), bool)
    mask[1:4, 1:4] = True
    mask[9, 0] = True
    small = np.asarray(
        morphology.small_component_mask(jnp.asarray(mask), min_size=5))
    assert small[9, 0]
    assert not small[2, 2]
    assert not small[0, 0]

  def test_snake_component(self):
    # Long thin winding component: propagation must still converge.
    mask = np.zeros((12, 12), bool)
    mask[0, :] = True
    mask[:, -1] = True
    mask[-1, :] = True
    labels = np.asarray(morphology.label_components(jnp.asarray(mask)))
    vals = np.unique(labels[mask])
    assert len(vals) == 1

  def test_serpentine_matches_scipy(self):
    # Boustrophedon path of geodesic length ~h*w/2 >> h+w: the worst case
    # for plain neighborhood propagation. Pointer jumping must converge to
    # the exact scipy.ndimage.label partition.
    h, w = 40, 40
    mask = np.zeros((h, w), bool)
    for r in range(0, h, 2):
      mask[r, :] = True
      if r + 1 < h:
        mask[r + 1, w - 1 if (r // 2) % 2 == 0 else 0] = True
    # A second serpentine, vertical, offset so it stays disjoint: use a
    # separate quadrant-sized block.
    mask2 = np.zeros((h, w), bool)
    for c in range(0, w, 2):
      mask2[:, c] = True
      if c + 1 < w:
        mask2[h - 1 if (c // 2) % 2 == 0 else 0, c + 1] = True
    for m in (mask, mask2):
      labels = np.asarray(morphology.label_components(jnp.asarray(m)))
      ref, nref = ndimage.label(m, structure=np.array(
          [[0, 1, 0], [1, 1, 1], [0, 1, 0]]))
      assert len(np.unique(labels[m])) == nref
      # Identical partition: our labels constant exactly on scipy's
      # components.
      for lab in range(1, nref + 1):
        assert len(np.unique(labels[ref == lab])) == 1

  def test_random_masks_match_scipy(self):
    rng = np.random.RandomState(42)
    struct = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
    for density in (0.3, 0.5, 0.7):
      m = rng.rand(64, 64) < density
      labels = np.asarray(morphology.label_components(jnp.asarray(m)))
      ref, nref = ndimage.label(m, structure=struct)
      assert len(np.unique(labels[m])) == nref
      # Same partition both ways.
      pairs = {(int(a), int(b)) for a, b in zip(ref[m].ravel(),
                                                labels[m].ravel())}
      assert len(pairs) == nref


class TestCleanFlow:

  def _flow4(self, shape=(1, 6, 6)):
    f = np.zeros((4,) + shape, np.float32)
    f[2] = 10.0  # sharpness
    f[3] = 0.0   # single peak
    return f

  def test_peak_quality_filters(self):
    f = self._flow4()
    f[2, 0, 2, 2] = 0.5  # low sharpness
    f[3, 0, 3, 3] = 1.1  # poor ratio (>0 and < threshold)
    out = flow_utils.clean_flow(f, min_peak_ratio=1.6, min_peak_sharpness=1.6,
                                max_magnitude=0, max_deviation=0)
    assert out.shape[0] == 2
    assert np.isnan(out[:, 0, 2, 2]).all()
    assert np.isnan(out[:, 0, 3, 3]).all()
    assert np.isfinite(out[:, 0, 0, 0]).all()

  def test_magnitude_filter(self):
    f = self._flow4()
    f[0, 0, 1, 1] = 50.0
    out = flow_utils.clean_flow(f, 0, 0, max_magnitude=40, max_deviation=0)
    assert np.isnan(out[:, 0, 1, 1]).all()
    assert np.isfinite(out[:, 0, 0, 0]).all()

  def test_deviation_filter(self):
    f = self._flow4()
    f[0, 0, 2, 2] = 9.0  # deviates from neighborhood median of 0
    out = flow_utils.clean_flow(f, 0, 0, max_magnitude=0, max_deviation=5)
    assert np.isnan(out[:, 0, 2, 2]).all()
    assert np.isfinite(out[:, 0, 4, 4]).all()

  def test_two_channel_passthrough(self):
    f = np.zeros((2, 1, 4, 4), np.float32)
    out = flow_utils.clean_flow(f, 1.6, 1.6, 40, 10)
    assert out.shape == f.shape
    assert np.isfinite(out).all()


class TestReconcileFlows:

  def test_preference_fill(self):
    a = np.full((2, 1, 4, 4), np.nan, np.float32)
    a[:, 0, :2] = 1.0
    b = np.full((2, 1, 4, 4), 2.0, np.float32)
    out = flow_utils.reconcile_flows([a, b], 0, 0, 0)
    np.testing.assert_array_equal(out[:, 0, 0, 0], 1.0)
    np.testing.assert_array_equal(out[:, 0, 3, 3], 2.0)

  def test_min_delta_z_gate(self):
    a = np.full((3, 1, 4, 4), np.nan, np.float32)
    b = np.ones((3, 1, 4, 4), np.float32)
    b[2] = 1.0  # Δz = 1 < 2 -> not allowed to donate
    out = flow_utils.reconcile_flows([a, b], 0, 0, 0, min_delta_z=2)
    assert np.isnan(out).all()
    b[2] = 2.0
    out = flow_utils.reconcile_flows([a, b], 0, 0, 0, min_delta_z=2)
    assert np.isfinite(out).all()

  def test_gradient_filter(self):
    f = np.zeros((2, 1, 6, 6), np.float32)
    f[0, 0, :, 3:] = 30.0  # sharp x-gradient at column 3
    out = flow_utils.reconcile_flows([f], max_gradient=20, max_deviation=0,
                                     min_patch_size=0)
    assert np.isnan(out[:, 0, 0, 3]).all()
    assert np.isfinite(out[:, 0, 0, 0]).all()

  def test_small_patch_removal(self):
    f = np.full((2, 1, 8, 8), np.nan, np.float32)
    f[:, 0, :4, :4] = 1.0  # 16 px component
    f[:, 0, 6, 6] = 1.0    # isolated pixel
    out = flow_utils.reconcile_flows([f], 0, 0, min_patch_size=4)
    assert np.isnan(out[:, 0, 6, 6]).all()
    assert np.isfinite(out[:, 0, 1, 1]).all()
