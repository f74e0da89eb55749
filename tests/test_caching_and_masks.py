"""Tests: volume LRU caching, structured mask configs, decorator specs.

Covers the config plumbing the reference wires in its processor layer:
  * chunk caches (image_cache_bytes / mask_cache_bytes / source_cache_bytes,
    /root/reference/processor/flow.py:531-553, processor/warp.py:386,562)
  * connectomics-style MaskConfigs threshold/invert/combine semantics
    (/root/reference/processor/flow.py:75-96)
  * map/data decorator specs applied by WarpByMap
    (/root/reference/processor/warp.py:487-562)
"""

import dataclasses

import numpy as np
import pytest

from sofima_tpu.processor import flow
from sofima_tpu.processor import warp as warp_proc
from sofima_tpu.processor.defaults import em_2d
from sofima_tpu.utils import mask as mask_lib
from sofima_tpu.utils import metrics
from sofima_tpu.utils import volume as volume_lib
from sofima_tpu.utils.bounding_box import BoundingBox
from sofima_tpu.utils.subvolume import Subvolume
from sofima_tpu.utils.volume import CachingVolume, InMemoryVolume


def _texture(n, seed=0, sigma=0.1):
  rng = np.random.RandomState(seed)
  noise = rng.rand(n, n).astype(np.float32)
  f = np.fft.rfft2(noise)
  fy = np.fft.fftfreq(n)[:, None]
  fx = np.fft.rfftfreq(n)[None, :]
  f *= np.exp(-((fx**2 + fy**2) / (2 * sigma**2)))
  tex = np.fft.irfft2(f, s=(n, n))
  tex = (tex - tex.min()) / np.ptp(tex)
  return (tex * 255).astype(np.float32)


class TestCachingVolume:

  def test_hits_and_misses(self):
    data = np.arange(64, dtype=np.float32).reshape(1, 1, 8, 8)
    vol = CachingVolume(InMemoryVolume(data), cache_bytes=1 << 20)
    sel = (slice(None), slice(0, 1), slice(0, 4), slice(0, 4))
    a = vol[sel]
    b = vol[sel]
    np.testing.assert_array_equal(a, b)
    assert vol.hits == 1 and vol.misses == 1
    # A different region misses.
    vol[(slice(None), slice(0, 1), slice(4, 8), slice(0, 4))]
    assert vol.misses == 2

  def test_lru_eviction(self):
    data = np.zeros((1, 1, 8, 8), np.float32)
    row_bytes = 8 * 4  # one [1,1,1,8] row
    vol = CachingVolume(InMemoryVolume(data), cache_bytes=2 * row_bytes)
    rows = [(slice(None), slice(0, 1), slice(i, i + 1), slice(0, 8))
            for i in range(3)]
    vol[rows[0]]
    vol[rows[1]]
    vol[rows[2]]  # evicts rows[0]
    vol[rows[0]]
    assert vol.hits == 0 and vol.misses == 4
    vol[rows[2]]
    assert vol.hits == 1

  def test_write_invalidates(self):
    data = np.zeros((1, 1, 4, 4), np.float32)
    vol = CachingVolume(InMemoryVolume(data), cache_bytes=1 << 20)
    sel = (slice(None), slice(0, 1), slice(0, 4), slice(0, 4))
    vol[sel]
    box = BoundingBox(start=(0, 0, 0), size=(4, 4, 1))
    vol.write(np.ones((1, 1, 4, 4), np.float32), box)
    out = vol[sel]
    np.testing.assert_array_equal(out, 1.0)

  def test_zero_budget_is_passthrough(self):
    vol = volume_lib.maybe_cache(
        InMemoryVolume(np.zeros((1, 1, 4, 4), np.float32)), 0)
    assert not isinstance(vol, CachingVolume)


class TestMaskConfigs:

  def _mask_vol(self):
    m = np.zeros((1, 1, 8, 8), np.float32)
    m[0, 0, :4] = 200.0  # top half bright
    return InMemoryVolume(m, fill_value=0.0)

  def test_threshold(self):
    cfg = mask_lib.MaskConfig(
        volume=self._mask_vol(),
        channels=[mask_lib.MaskChannelConfig(min_value=128)])
    box = BoundingBox(start=(0, 0, 0), size=(8, 8, 1))
    out = mask_lib.build_mask(cfg, box)
    assert out.shape == (1, 8, 8)
    assert out[0, :4].all() and not out[0, 4:].any()

  def test_invert_and_values(self):
    cfg = mask_lib.MaskConfig(
        volume=self._mask_vol(),
        channels=[mask_lib.MaskChannelConfig(values=[200], invert=True)])
    box = BoundingBox(start=(0, 0, 0), size=(8, 8, 1))
    out = mask_lib.build_mask(cfg, box)
    assert not out[0, :4].any() and out[0, 4:].all()

  def test_combine_and(self):
    a = np.zeros((1, 1, 4, 4), np.float32)
    a[0, 0, :, :2] = 1.0  # left half
    b = np.zeros((1, 1, 4, 4), np.float32)
    b[0, 0, :2, :] = 1.0  # top half
    cfgs = mask_lib.MaskConfigs(
        masks=[mask_lib.MaskConfig(volume=InMemoryVolume(a, fill_value=0)),
               mask_lib.MaskConfig(volume=InMemoryVolume(b, fill_value=0))],
        combine='and')
    box = BoundingBox(start=(0, 0, 0), size=(4, 4, 1))
    out = mask_lib.build_mask(cfgs, box)
    assert out[0, 0, 0] and not out[0, 0, 3] and not out[0, 3, 0]

  def test_parse_dicts(self):
    cfgs = mask_lib.parse({
        'masks': [{'volume': self._mask_vol(),
                   'channels': [{'min_value': 128.0}]}],
        'combine': 'or'})
    box = BoundingBox(start=(0, 0, 0), size=(8, 8, 1))
    out = cfgs.build(box)
    assert out[0, :4].all()

  def test_estimate_flow_with_thresholded_mask_volume(self):
    # A raw (non-boolean) mask volume driven through MaskConfig threshold
    # semantics: bright rows are excluded from flow estimation.
    tex = _texture(240)
    stack = np.stack([np.roll(tex, 2 * z, axis=1) for z in range(2)])
    vol = InMemoryVolume(stack[np.newaxis].astype(np.float32),
                         fill_value=0.0)
    raw_mask = np.zeros((1, 2, 240, 240), np.float32)
    raw_mask[0, :, :120] = 255.0  # top half masked by threshold
    mask_cfg = mask_lib.MaskConfig(
        volume=InMemoryVolume(raw_mask, fill_value=0.0),
        channels=[mask_lib.MaskChannelConfig(min_value=128)])

    cfg = em_2d.estimate_flow_config({'patch_size': 80, 'stride': 40,
                                      'batch_size': 16})
    cfg = dataclasses.replace(cfg, mask_configs=mask_cfg,
                              mask_only_for_patch_selection=True)
    proc = flow.EstimateFlow(cfg)
    from sofima_tpu.processor import runner
    out = runner.process_volume(proc, vol, subvolume_size=(240, 240, 2))
    data = out.data
    # Output node v holds the patch CENTERED at v*stride (reference
    # convention). Patches centered at rows 40 and 80 lie fully inside
    # the masked half (rows 0..120) -> occupancy >= 0.75 -> no estimate.
    # Patches centered at rows 0/120 are only 50% masked -> computed.
    # Column 0 patches extend into the zero-padded halo (occupancy 50%).
    assert np.isnan(data[0, 1, 1, 1:]).all()
    assert np.isnan(data[0, 1, 2, 1:]).all()
    assert np.isfinite(data[0, 1, -2]).any()
    assert np.isfinite(data[0, 1, -1]).any()


class TestEstimateMissingFlowCaching:

  def test_image_cache_hits(self):
    tex = _texture(200, seed=2)
    stack = np.stack([
        tex,
        np.roll(tex, 3, axis=1),
        np.full_like(tex, 128.0),  # featureless -> bad direct flow
        np.roll(tex, 3, axis=1),
    ])
    image_vol = InMemoryVolume(stack[np.newaxis], fill_value=0.0)

    cfg = em_2d.estimate_missing_flow_config({
        'patch_size': 80, 'stride': 40, 'batch_size': 16,
        'max_delta_z': 3})
    cfg = dataclasses.replace(cfg, image_volinfo=image_vol,
                              image_cache_bytes=1 << 24)
    proc = flow.EstimateMissingFlow(cfg)

    grid = 200 // 40
    flow_in = np.full((2, 1, grid, grid), np.nan, np.float32)
    sv = Subvolume(flow_in.copy(), BoundingBox(start=(0, 0, 3),
                                               size=(grid, grid, 1)))
    before = metrics.registry().get_counter('EstimateMissingFlow_image',
                                            'hits')
    out1 = proc.process(sv)
    # Second work item over the same box: every section row is a hit.
    sv2 = Subvolume(flow_in.copy(), BoundingBox(start=(0, 0, 3),
                                                size=(grid, grid, 1)))
    out2 = proc.process(sv2)
    after = metrics.registry().get_counter('EstimateMissingFlow_image',
                                           'hits')
    assert after > before
    np.testing.assert_array_equal(out1.data, out2.data)
    valid = np.isfinite(out1.data[0, 0])
    assert valid.any()


class TestWarpByMapDecoratorSpecs:

  def _labeled_store(self, tmp_path, data, labels, name):
    ts = pytest.importorskip('tensorstore')
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

  def _run_warp(self, map_vol, data_vol, specs=None, data_specs=None):
    cfg = em_2d.warp_config({'stride': 8.0, 'interpolation': 'linear'})
    cfg = dataclasses.replace(cfg, map_volinfo=map_vol,
                              data_volinfo=data_vol,
                              map_decorator_specs=specs,
                              data_decorator_specs=data_specs)
    proc = warp_proc.WarpByMap(cfg)
    box = BoundingBox(start=(0, 0, 0), size=(48, 48, 1))
    outs = proc.process(Subvolume(np.zeros((1, 1, 48, 48), np.float32),
                                  box))
    return outs[0].data

  def test_compose_coord_maps_spec_matches_precomposed(self, tmp_path):
    # Warping through (map A decorated by "compose with map B") must equal
    # warping through the hand-precomposed map A+B (constant translations
    # compose additively).
    src = _texture(64, seed=3)
    data_vol = InMemoryVolume(src[None, None], fill_value=0.0)

    map_a = np.zeros((2, 1, 8, 8), np.float32)
    map_a[0] = 3.0   # dx
    map_b = np.zeros((2, 1, 8, 8), np.float32)
    map_b[1] = -2.0  # dy
    _, b_spec = self._labeled_store(tmp_path, map_b,
                                    ['fc', 'fz', 'fy', 'fx'], 'map_b')
    a_store, _ = self._labeled_store(tmp_path, map_a,
                                     ['fc', 'fz', 'fy', 'fx'], 'map_a')
    map_vol_a = volume_lib.TensorStoreVolume(a_store)

    specs = [{'decorator': 'ComposeCoordMaps', 'coord_map_spec': b_spec,
              'stride1': 8.0, 'stride2': 8.0}]
    out_dec = self._run_warp(map_vol_a, data_vol, specs=specs)

    pre = np.zeros((2, 1, 8, 8), np.float32)
    pre[0] = 3.0
    pre[1] = -2.0
    out_pre = self._run_warp(InMemoryVolume(pre), data_vol)
    np.testing.assert_allclose(out_dec, out_pre, atol=1e-4)
    # And the decorated run genuinely differs from the undecorated one.
    out_plain = self._run_warp(InMemoryVolume(map_a), data_vol)
    assert not np.allclose(np.nan_to_num(out_dec), np.nan_to_num(out_plain))

  def test_data_decorator_spec_applied(self, tmp_path):
    pytest.importorskip('tensorstore')
    from sofima_tpu.decorators import base as dec_base

    if 'DoubleFilterForTest' not in dec_base.registered():
      @dec_base.register
      class DoubleFilterForTest(dec_base.Filter):

        def __init__(self, **kwargs):
          super().__init__(lambda a: a * 2.0, **kwargs)

    src = _texture(64, seed=4)
    data_vol = InMemoryVolume(src[None, None], fill_value=0.0)
    ident = np.zeros((2, 1, 8, 8), np.float32)

    out_plain = self._run_warp(InMemoryVolume(ident), data_vol)
    out_double = self._run_warp(
        InMemoryVolume(ident), data_vol,
        data_specs=[{'decorator': 'DoubleFilterForTest'}])
    np.testing.assert_allclose(np.nan_to_num(out_double),
                               2.0 * np.nan_to_num(out_plain), atol=1e-3)
