"""Whole-volume diff: reference decorator classes vs ours.

Loads the REFERENCE decorator classes (/root/reference/decorators/*) with
shimmed gin + connectomics dependencies (mapped onto our decorator base
framework, whose Decorator/Filter surface is attribute-compatible),
instantiates them over real TensorStore stores, and diffs the resulting
virtual_chunked volumes against our decorators chunk-by-chunk. The
reference code is used strictly as a test oracle.

Coverage: CleanFlowFilter, ReconcileFlowFilter, MeshRelaxFlowFilter,
OptimFlow, ComposeCoordMaps, MakeAffineCoordMap (the decorators whose
reference implementations do not require OpenCV/skimage, which are not
installed).
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

ts = pytest.importorskip('tensorstore')

REFERENCE = '/root/reference'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason='reference tree not mounted')


def _install_shims():
  from sofima_tpu.decorators import base as our_base
  from sofima_tpu.utils import bounding_box as bb
  from sofima_tpu.utils import geom

  con = sys.modules.setdefault('connectomics',
                               types.ModuleType('connectomics'))

  common = types.ModuleType('connectomics.common')
  bb_mod = types.ModuleType('connectomics.common.bounding_box')
  bb_mod.BoundingBox = bb.BoundingBox
  bb_mod.BoundingBoxBase = bb.BoundingBox
  geom_mod = types.ModuleType('connectomics.common.geom_utils')
  geom_mod.integral_image = geom.integral_image_np
  geom_mod.query_integral_image = geom.query_integral_image
  utils_mod = types.ModuleType('connectomics.common.utils')

  def batch(items, size):
    for i in range(0, len(items), size):
      yield items[i:i + size]

  utils_mod.batch = batch
  jax_utils_mod = types.ModuleType('connectomics.common.jax_utils')

  def parse_device_str(s):
    raise NotImplementedError(s)

  jax_utils_mod.parse_device_str = parse_device_str

  vol = types.ModuleType('connectomics.volume')
  dec_mod = types.ModuleType('connectomics.volume.decorators')
  dec_mod.Decorator = our_base.Decorator
  dec_mod.Filter = our_base.Filter
  dec_mod.adjust_schema_for_virtual_chunked = (
      our_base.adjust_schema_for_virtual_chunked)
  dec_mod.adjust_schema_for_chunksize = our_base.adjust_schema_for_chunksize

  gin_mod = types.ModuleType('gin')
  gin_mod.register = lambda cls: cls
  gin_mod.configurable = lambda cls: cls

  sys.modules['connectomics.common'] = common
  sys.modules['connectomics.common.bounding_box'] = bb_mod
  sys.modules['connectomics.common.geom_utils'] = geom_mod
  sys.modules['connectomics.common.utils'] = utils_mod
  sys.modules['connectomics.common.jax_utils'] = jax_utils_mod
  sys.modules['connectomics.volume'] = vol
  sys.modules['connectomics.volume.decorators'] = dec_mod
  sys.modules.setdefault('gin', gin_mod)
  common.bounding_box = bb_mod
  common.geom_utils = geom_mod
  common.utils = utils_mod
  common.jax_utils = jax_utils_mod
  vol.decorators = dec_mod
  con.common = common
  con.volume = vol


def _bind_on_parent(dotted: str):
  # `sofima.flow_utils.clean_flow`-style attribute access needs the
  # submodule bound on its parent package — even when another test file
  # already loaded the module into sys.modules without binding it.
  parent, _, leaf = dotted.rpartition('.')
  if parent in sys.modules:
    setattr(sys.modules[parent], leaf, sys.modules[dotted])


def _load_ref_module(dotted: str, path: str):
  _install_shims()
  if dotted in sys.modules:
    _bind_on_parent(dotted)
    return sys.modules[dotted]
  if 'sofima' not in sys.modules:
    pkg = types.ModuleType('sofima')
    pkg.__path__ = [REFERENCE]
    sys.modules['sofima'] = pkg
  if 'sofima.decorators' not in sys.modules:
    sub = types.ModuleType('sofima.decorators')
    sub.__path__ = [f'{REFERENCE}/decorators']
    sys.modules['sofima.decorators'] = sub
  spec = importlib.util.spec_from_file_location(dotted, path)
  mod = importlib.util.module_from_spec(spec)
  sys.modules[dotted] = mod
  spec.loader.exec_module(mod)
  _bind_on_parent(dotted)
  return mod


def ref_flow_decorators():
  for dep in ('flow_field', 'flow_utils', 'mesh'):
    _load_ref_module(f'sofima.{dep}', f'{REFERENCE}/{dep}.py')
  return _load_ref_module('sofima.decorators.flow',
                          f'{REFERENCE}/decorators/flow.py')


def ref_maps_decorators():
  _load_ref_module('sofima.map_utils', f'{REFERENCE}/map_utils.py')
  return _load_ref_module('sofima.decorators.maps',
                          f'{REFERENCE}/decorators/maps.py')


def _make_store(tmp_path, data, labels, name):
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


def _flow_volume(seed=0):
  """A plausible [fc=4, fz=2, fy, fx] flow volume.

  fz must be > 1: the reference filters squeeze() their input, so a
  singleton fz would collapse the rank they expect.
  """
  rng = np.random.RandomState(seed)
  flow = np.zeros((4, 2, 12, 12), np.float32)
  flow[0] = rng.randint(-3, 4, (2, 12, 12))
  flow[1] = rng.randint(-3, 4, (2, 12, 12))
  flow[2] = 2.0 + rng.rand(2, 12, 12)      # sharpness
  flow[3] = 2.0 + rng.rand(2, 12, 12)      # peak ratio
  flow[2, 0, 3, 3] = 0.1                   # fails sharpness gate
  flow[3, 1, 5, 7] = 1.1                   # fails ratio gate
  return flow


class TestFlowFilterDiffs:

  def test_clean_flow_filter(self, tmp_path):
    from sofima_tpu.decorators import flow as our_flow
    ref = ref_flow_decorators()
    data = _flow_volume()
    store, _ = _make_store(tmp_path, data, ['fc', 'fz', 'fy', 'fx'], 'f')
    kwargs = dict(min_peak_ratio=1.6, min_peak_sharpness=1.6,
                  max_magnitude=10, max_deviation=5)
    theirs = np.array(ref.CleanFlowFilter(**kwargs).decorate(store))
    ours = np.array(our_flow.CleanFlowFilter(**kwargs).decorate(store))
    assert theirs.shape == ours.shape == (2, 2, 12, 12)
    np.testing.assert_allclose(ours, theirs, atol=1e-6, equal_nan=True)

  def test_reconcile_flow_filter(self, tmp_path):
    from sofima_tpu.decorators import flow as our_flow
    ref = ref_flow_decorators()
    data = _flow_volume(seed=1)[:2]
    data[:, 0, 2, 2] = np.nan
    store, _ = _make_store(tmp_path, data, ['fc', 'fz', 'fy', 'fx'], 'f')
    kwargs = dict(max_gradient=3.0, max_deviation=4.0, min_patch_size=2)
    theirs = np.array(ref.ReconcileFlowFilter(**kwargs).decorate(store))
    ours = np.array(our_flow.ReconcileFlowFilter(**kwargs).decorate(store))
    np.testing.assert_allclose(ours, theirs, atol=1e-6, equal_nan=True)

  def test_mesh_relax_flow_filter(self, tmp_path):
    from sofima_tpu.decorators import flow as our_flow
    ref = ref_flow_decorators()
    rng = np.random.RandomState(2)
    data = rng.randn(2, 2, 10, 10).astype(np.float32)
    store, _ = _make_store(tmp_path, data, ['fc', 'fz', 'fy', 'fx'], 'f')
    kwargs = dict(dt=0.001, gamma=0.0, k0=0.05, k=0.1, stride=(40, 40),
                  num_iters=200, max_iters=20000, stop_v_max=0.001,
                  dt_max=100.0)
    theirs = np.array(ref.MeshRelaxFlowFilter(**kwargs).decorate(store))
    ours = np.array(our_flow.MeshRelaxFlowFilter(**kwargs).decorate(store))
    # Different solvers, same fixed point.
    np.testing.assert_allclose(ours, theirs, atol=5e-3)

  def test_optim_flow(self, tmp_path):
    from sofima_tpu.decorators import flow as our_flow
    ref = ref_flow_decorators()
    tex = _texture(128)
    moved = np.roll(tex, (3, -2), (0, 1))
    input_ts, _ = _make_store(tmp_path, moved.T[:, :, None],
                              ['x', 'y', 'z'], 'in')
    _, fixed_spec = _make_store(tmp_path, tex.T[:, :, None],
                                ['x', 'y', 'z'], 'fx')
    kwargs = dict(fixed_spec=fixed_spec, image_dims=('x', 'y'),
                  patch_size=(48, 48), step_size=(16, 16), batch_size=8,
                  pad=False)
    theirs = np.array(ref.OptimFlow(**kwargs).decorate(input_ts))
    ours = np.array(our_flow.OptimFlow(**kwargs).decorate(input_ts))
    assert theirs.shape == ours.shape
    # Integer flow channels must match exactly where both are finite.
    tv = np.isfinite(theirs[:2])
    ov = np.isfinite(ours[:2])
    np.testing.assert_array_equal(tv, ov)
    np.testing.assert_array_equal(ours[:2][ov], theirs[:2][tv])


class TestMapsDecoratorDiffs:

  def test_compose_coord_maps(self, tmp_path):
    from sofima_tpu.decorators import maps as our_maps
    ref = ref_maps_decorators()
    rng = np.random.RandomState(3)
    m1 = rng.randn(2, 2, 8, 8).astype(np.float32) * 2
    m2 = rng.randn(2, 2, 8, 8).astype(np.float32) * 2
    in_ts, _ = _make_store(tmp_path, m1, ['fc', 'fz', 'fy', 'fx'], 'm1')
    _, m2_spec = _make_store(tmp_path, m2, ['fc', 'fz', 'fy', 'fx'], 'm2')
    kwargs = dict(coord_map_spec=m2_spec, start1=(0, 0, 0),
                  stride1=(1.0, 1.0), start2=(0, 0, 0),
                  stride2=(1.0, 1.0))
    theirs = np.array(ref.ComposeCoordMaps(**kwargs).decorate(in_ts))
    ours = np.array(our_maps.ComposeCoordMaps(**kwargs).decorate(in_ts))
    np.testing.assert_allclose(np.nan_to_num(ours), np.nan_to_num(theirs),
                               atol=1e-3)
    tn = np.isnan(theirs)
    on = np.isnan(ours)
    assert (tn == on).mean() > 0.95

  def test_make_affine_coord_map(self, tmp_path):
    from sofima_tpu.decorators import maps as our_maps
    ref = ref_maps_decorators()
    matrix = np.array([[1, 0, 0, 7], [0, 1, 0, -3], [0, 0, 1, 2]],
                      np.float64)
    in_ts, _ = _make_store(tmp_path, matrix[:, :, None], ['r', 'c', 'b'],
                           'mat')
    theirs = np.array(ref.MakeAffineCoordMap(size=(6, 5, 4)).decorate(in_ts))
    ours = np.array(our_maps.MakeAffineCoordMap(size=(6, 5, 4)).decorate(
        in_ts))
    assert theirs.shape == ours.shape
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
