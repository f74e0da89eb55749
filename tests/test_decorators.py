"""Decorator tests: real TensorStore stores + lazy virtual views."""

import numpy as np
import pytest

ts = pytest.importorskip('tensorstore')

from sofima_tpu import decorators
from sofima_tpu import flow_field, flow_utils
from sofima_tpu.decorators import affine as affine_dec
from sofima_tpu.decorators import flow as flow_dec
from sofima_tpu.decorators import maps as maps_dec
from sofima_tpu.decorators import warp as warp_dec


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
  # Return a spec that preserves the dimension labels on reopen.
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


class TestRegistry:

  def test_registered_names(self):
    names = decorators.registered()
    for expected in ['OptimFlow', 'CleanFlowFilter', 'MeshRelaxFlowFilter',
                     'ReconcileFlowFilter', 'ComposeCoordMaps',
                     'MakeAffineCoordMap', 'WarpAffine', 'WarpCoordMap',
                     'OptimAffineTransformSectionwise',
                     'OptimTranslationTransform']:
      assert expected in names, expected


class TestOptimFlow:

  def test_matches_direct_call(self, tmp_path):
    tex = _texture(128)
    moved = np.roll(tex, (3, -2), (0, 1))
    # Layout: [x, y] with trailing batch dim z.
    input_data = moved.T[:, :, np.newaxis]
    fixed_data = tex.T[:, :, np.newaxis]
    input_ts, _ = _make_store(tmp_path, input_data, ['x', 'y', 'z'], 'in')
    _, fixed_spec = _make_store(tmp_path, fixed_data, ['x', 'y', 'z'], 'fx')

    dec = flow_dec.OptimFlow(fixed_spec=fixed_spec, image_dims=('x', 'y'),
                             patch_size=(48, 48), step_size=(16, 16),
                             batch_size=8, pad=False)
    view = dec.decorate(input_ts)
    assert view.domain.labels == ('fc', 'fz', 'fy', 'fx', 'z')
    result = np.array(view)
    # Direct call. Note pre=input, post=fixed in the decorator.
    mfc = flow_field.JAXMaskedXCorrWithStatsCalculator()
    direct = mfc.flow_field(moved, tex, (48, 48), (16, 16), batch_size=8)
    np.testing.assert_array_equal(result[:, 0, :, :, 0], direct)

  def test_padded_shape(self, tmp_path):
    tex = _texture(128)
    input_ts, _ = _make_store(tmp_path, tex.T[:, :, None],
                              ['x', 'y', 'z'], 'in')
    _, fixed_spec = _make_store(tmp_path, tex.T[:, :, None],
                                ['x', 'y', 'z'], 'fx')
    dec = flow_dec.OptimFlow(fixed_spec=fixed_spec, patch_size=(48, 48),
                             step_size=(16, 16), batch_size=8, pad=True)
    view = dec.decorate(input_ts)
    # padded shape: ceil((128-48+1)/16) + 48//16 - 1 = 6 + 2 = 8
    assert view.shape[2] == view.shape[3] == 8


class TestFilters:

  def _flow_store(self, tmp_path):
    flow = np.zeros((4, 1, 10, 10), np.float32)
    flow[0] = 2.0
    flow[2] = 10.0
    return _make_store(tmp_path, flow, ['fc', 'fz', 'fy', 'fx'], 'flow')

  def test_clean_flow_filter(self, tmp_path):
    store, _ = self._flow_store(tmp_path)
    view = flow_dec.CleanFlowFilter(
        min_peak_ratio=1.6, min_peak_sharpness=1.6, max_magnitude=40,
        max_deviation=10).decorate(store)
    assert view.shape[0] == 2  # stat channels stripped
    out = np.array(view)
    np.testing.assert_allclose(out[0], 2.0)

  def test_reconcile_flow_filter(self, tmp_path):
    store, _ = self._flow_store(tmp_path)
    view = flow_dec.ReconcileFlowFilter(
        max_gradient=0, max_deviation=0, min_patch_size=0).decorate(
            store[ts.d[0][:2]])
    out = np.array(view)
    np.testing.assert_allclose(out[0], 2.0)

  def test_mesh_relax_flow_filter(self, tmp_path):
    flow = np.zeros((2, 1, 8, 8), np.float32)
    store, _ = _make_store(tmp_path, flow, ['fc', 'fz', 'fy', 'fx'],
                           'flow0')
    view = flow_dec.MeshRelaxFlowFilter(
        dt=0.001, gamma=0.0, k0=0.05, k=0.1, stride=(40, 40),
        num_iters=100, max_iters=2000, stop_v_max=0.001,
        dt_max=100.0).decorate(store)
    out = np.array(view)
    np.testing.assert_allclose(out, 0.0, atol=1e-3)


class TestMapsDecorators:

  def test_compose_coord_maps(self, tmp_path):
    m1 = np.full((2, 1, 8, 8), 2.0, np.float32)
    m2 = np.full((2, 1, 8, 8), 3.0, np.float32)
    in_ts, _ = _make_store(tmp_path, m1, ['fc', 'fz', 'fy', 'fx'], 'm1')
    _, m2_spec = _make_store(tmp_path, m2, ['fc', 'fz', 'fy', 'fx'], 'm2')
    view = maps_dec.ComposeCoordMaps(coord_map_spec=m2_spec).decorate(in_ts)
    out = np.array(view)
    np.testing.assert_allclose(out[:, 0, :5, :5], 5.0, atol=1e-4)

  def test_make_affine_coord_map(self, tmp_path):
    matrix = np.array([[1, 0, 0, 7], [0, 1, 0, -3], [0, 0, 1, 2]],
                      np.float64)
    in_ts, _ = _make_store(tmp_path, matrix[:, :, None], ['r', 'c', 'b'],
                           'mat')
    view = maps_dec.MakeAffineCoordMap(size=(6, 5, 4)).decorate(in_ts)
    assert view.shape == (3, 4, 5, 6, 1)
    out = np.array(view)
    np.testing.assert_allclose(out[0], 7.0)
    np.testing.assert_allclose(out[1], -3.0)
    np.testing.assert_allclose(out[2], 2.0)


class TestWarpDecorators:

  def test_warp_affine_translation(self, tmp_path):
    tex = _texture(64)
    in_ts, _ = _make_store(tmp_path, tex.T[:, :, None], ['x', 'y', 'z'],
                           'img')
    matrix = np.array([[1.0, 0, 5], [0, 1, 0]])  # shift +5 in x
    _, mat_spec = _make_store(tmp_path, matrix[:, :, None],
                              ['r', 'c', 'z'], 'mat')
    view = warp_dec.WarpAffine(transform_spec=mat_spec).decorate(in_ts)
    out = np.array(view)[:, :, 0].T  # [y, x]
    np.testing.assert_allclose(out[10:-10, 10:-10],
                               tex[10:-10, 5:-15], atol=0.5)

  def test_warp_coord_map(self, tmp_path):
    rng = np.random.RandomState(0)
    vol = rng.rand(16, 16, 8).astype(np.float32)  # xyz
    in_ts, _ = _make_store(tmp_path, vol, ['x', 'y', 'z'], 'vol')
    cmap = np.zeros((3, 8, 16, 16), np.float32)  # identity
    _, cm_spec = _make_store(tmp_path, cmap, ['fc', 'fz', 'fy', 'fx'],
                             'cmap')
    view = warp_dec.WarpCoordMap(coord_map_spec=cm_spec).decorate(in_ts)
    out = np.array(view)
    np.testing.assert_allclose(out[2:-2, 2:-2, 2:-2],
                               vol[2:-2, 2:-2, 2:-2], atol=1e-3)


class TestAffineDecorators:

  def test_translation_transform(self, tmp_path):
    tex = _texture(96)
    moved = np.roll(tex, (4, -6), (0, 1))
    in_ts, _ = _make_store(tmp_path, moved.T[:, :, None],
                           ['x', 'y', 'z'], 'mov')
    _, fixed_spec = _make_store(tmp_path, tex.T[:, :, None],
                                ['x', 'y', 'z'], 'fix')
    view = affine_dec.OptimTranslationTransform(
        fixed_spec=fixed_spec).decorate(in_ts)
    assert view.domain.labels == ('r', 'c', 'z')
    out = np.array(view)[:, :, 0]
    # Moving is rolled +4 in dim0(x-label=rows of .T? data stored as x,y).
    # The decorator squeezes to [x, y]; shift to align mov->fix.
    np.testing.assert_allclose(out[:, 2], [6, -4], atol=0.5)

  def test_ecc_affine_recovers_translation(self, tmp_path):
    tex = _texture(96, seed=1)
    moved = np.roll(tex, (0, -5), (0, 1))  # shift -5 in x (image cols)
    in_ts, _ = _make_store(tmp_path, moved.T[:, :, None],
                           ['x', 'y', 'z'], 'mov')
    _, fixed_spec = _make_store(tmp_path, tex.T[:, :, None],
                                ['x', 'y', 'z'], 'fix')
    view = affine_dec.OptimAffineTransformSectionwise(
        fixed_spec=fixed_spec, motion='translation',
        num_iters=200).decorate(in_ts)
    out = np.array(view)[:, :, 0]
    assert out.shape == (2, 3)
    # The warp matrix gives moving-image sampling coords per fixed coord:
    # moving(x - 5) == fixed(x), so tx ≈ -5.
    np.testing.assert_allclose(out[0, 2], -5.0, atol=0.5)
    np.testing.assert_allclose(out[1, 2], 0.0, atol=0.5)
