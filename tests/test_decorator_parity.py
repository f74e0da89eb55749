"""Decorator dataset parity: our lazy TensorStore views vs the reference.

Runs our decorators over shared zarr stores and compares the lazily
computed chunks against the REFERENCE core functions (flow_field,
flow_utils, mesh loaded from /root/reference with shimmed deps) applied
eagerly to the same stored arrays. This closes the loop the core parity
tests leave open: identical results through the storage + virtual-chunk
layer, not just at the function boundary.
"""

import os

import numpy as np
import pytest

ts = pytest.importorskip('tensorstore')

from tests.test_reference_parity import _load_reference

from sofima_tpu.decorators import flow as flow_dec

pytestmark = pytest.mark.skipif(
    not os.path.isdir('/root/reference'),
    reason='reference tree not mounted')


def _make_store(tmp_path, data, labels, name='vol'):
  spec = {
      'driver': 'zarr',
      'kvstore': {'driver': 'file', 'path': str(tmp_path / name)},
      'metadata': {'shape': list(data.shape),
                   'chunks': list(data.shape),
                   'dtype': np.dtype(data.dtype).str},
      'create': True,
      'delete_existing': True,
  }
  store = ts.open(spec).result()
  store = store[ts.d[:].label[labels]]
  store.write(data).result()
  return store, store.spec().to_json()


def _texture(n, seed=0):
  rng = np.random.RandomState(seed)
  noise = rng.rand(n, n).astype(np.float32)
  f = np.fft.rfft2(noise)
  fy = np.fft.fftfreq(n)[:, None]
  fx = np.fft.rfftfreq(n)[None, :]
  f *= np.exp(-((fx**2 + fy**2) / (2 * 0.1**2)))
  tex = np.fft.irfft2(f, s=(n, n))
  return ((tex - tex.min()) / np.ptp(tex) * 255).astype(np.float32)


def _noisy_flow(seed=3):
  """Realistic 4-channel flow with outliers, weak peaks, and NaN holes."""
  rng = np.random.RandomState(seed)
  flow = np.zeros((4, 1, 12, 14), np.float32)
  flow[0] = 2.0 + rng.randn(1, 12, 14) * 0.5
  flow[1] = -1.0 + rng.randn(1, 12, 14) * 0.5
  flow[2] = 2.5 + rng.rand(1, 12, 14)          # sharpness
  flow[3] = 2.0 + rng.rand(1, 12, 14)          # peak ratio
  flow[0, 0, 3, 4] = 55.0                      # magnitude outlier
  flow[1, 0, 7, 2] = 9.0                       # median-deviation outlier
  flow[2, 0, 5, 5] = 0.1                       # weak sharpness
  flow[3, 0, 8, 9] = 1.0                       # weak ratio
  flow[:, 0, 2, 10] = np.nan                   # existing hole
  return flow


class TestOptimFlowDatasetParity:

  def test_matches_reference_flow_field(self, tmp_path):
    ref_ff = _load_reference('flow_field')
    tex = _texture(128)
    moved = np.roll(tex, (3, -2), (0, 1))
    input_ts, _ = _make_store(tmp_path, moved.T[:, :, None],
                              ['x', 'y', 'z'], 'in')
    _, fixed_spec = _make_store(tmp_path, tex.T[:, :, None],
                                ['x', 'y', 'z'], 'fx')

    view = flow_dec.OptimFlow(
        fixed_spec=fixed_spec, image_dims=('x', 'y'),
        patch_size=(48, 48), step_size=(16, 16), batch_size=8,
        pad=False).decorate(input_ts)
    ours = np.array(view)[:, 0, :, :, 0]

    mfc = ref_ff.JAXMaskedXCorrWithStatsCalculator()
    theirs = mfc.flow_field(moved, tex, (48, 48), (16, 16), batch_size=8)

    assert ours.shape == theirs.shape
    # Flow components are integer-precision: exact match required.
    np.testing.assert_array_equal(np.isnan(ours), np.isnan(theirs))
    np.testing.assert_array_equal(
        np.nan_to_num(ours[:2]), np.nan_to_num(theirs[:2]))
    # Peak statistics are float: interpolation tolerance.
    np.testing.assert_allclose(np.nan_to_num(ours[2:]),
                               np.nan_to_num(theirs[2:]), atol=1e-3,
                               rtol=1e-3)


class TestFilterDatasetParity:

  def test_clean_flow_filter_matches_reference(self, tmp_path):
    ref_fu = _load_reference('flow_utils')
    flow = _noisy_flow()
    store, _ = _make_store(tmp_path, flow, ['fc', 'fz', 'fy', 'fx'],
                           'flow')
    args = dict(min_peak_ratio=1.6, min_peak_sharpness=1.6,
                max_magnitude=40, max_deviation=3)
    ours = np.array(flow_dec.CleanFlowFilter(**args).decorate(store))
    theirs = ref_fu.clean_flow(flow, dim=2, **args)
    assert ours.shape == theirs.shape
    np.testing.assert_array_equal(np.isnan(ours), np.isnan(theirs))
    np.testing.assert_allclose(np.nan_to_num(ours), np.nan_to_num(theirs),
                               atol=1e-5)

  def test_reconcile_flow_filter_matches_reference(self, tmp_path):
    # z=2: the (reference-inherited) wrapper contract squeezes singleton
    # dims, so single-section reconciliation must keep z > 1.
    ref_fu = _load_reference('flow_utils')
    flow = np.concatenate([_noisy_flow()[:2], _noisy_flow(seed=5)[:2]],
                          axis=1)
    flow[0, 0, 4, 6] = 30.0  # gradient outlier
    store, _ = _make_store(tmp_path, flow, ['fc', 'fz', 'fy', 'fx'],
                           'flow2')
    args = dict(max_gradient=5.0, max_deviation=3.0, min_patch_size=4)
    ours = np.array(flow_dec.ReconcileFlowFilter(**args).decorate(store))
    theirs = ref_fu.reconcile_flows([flow], **args)
    assert ours.shape == theirs.shape
    np.testing.assert_array_equal(np.isnan(ours), np.isnan(theirs))
    np.testing.assert_allclose(np.nan_to_num(ours), np.nan_to_num(theirs),
                               atol=1e-5)

  def test_mesh_relax_filter_matches_reference_fixed_point(self, tmp_path):
    ref_mesh = _load_reference('mesh')
    y, x = np.mgrid[:10, :12].astype(np.float32)
    # z=2 (z acts as a batch dim; singleton dims are squeezed away by the
    # reference-inherited wrapper contract).
    flow = np.stack([
        np.stack([1.5 * np.sin(y / 3), 0.8 * np.sin(y / 2)]),
        np.stack([1.0 * np.cos(x / 4), -0.6 * np.cos(x / 5)]),
    ]).astype(np.float32)
    store, _ = _make_store(tmp_path, flow, ['fc', 'fz', 'fy', 'fx'],
                           'flow3')
    args = dict(dt=0.001, gamma=0.0, k0=0.05, k=0.1, stride=(40, 40),
                num_iters=200, max_iters=20000, stop_v_max=1e-4,
                dt_max=100.0)
    ours = np.array(flow_dec.MeshRelaxFlowFilter(**args).decorate(store))

    cfg = ref_mesh.IntegrationConfig(**args)
    theirs, _, _ = ref_mesh.relax_mesh(
        np.zeros_like(flow), flow, cfg)
    theirs = np.asarray(theirs).reshape(flow.shape)
    # Same physical fixed point (trajectories are allowed to differ).
    np.testing.assert_allclose(ours, theirs, atol=5e-3)
