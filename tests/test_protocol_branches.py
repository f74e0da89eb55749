"""Tests for the hairy production protocol branches.

Covers the paths the reference built explicit statuses/contracts for:
  * RelaxMesh coming-in regions (multi-z flows, strict mode)
    (/root/reference/processor/mesh.py:170-236)
  * the fold-recovery re-solve protocol with REGULARIZED / PREP_FAILED
    statuses (/root/reference/processor/mesh.py:428-513)
  * EstimateFlow.fixed_current (/root/reference/processor/flow.py:213-221)
  * EstimateMissingFlow.search_radius > 0 — recovering shifts larger than
    patch_size/2 via the enlarged search patch
    (/root/reference/processor/flow.py:577-582,792-803)
"""

import dataclasses

import numpy as np
import pytest

from sofima_tpu import mesh as mesh_lib
from sofima_tpu.processor import flow, mesh, runner
from sofima_tpu.processor.defaults import em_2d
from sofima_tpu.utils.bounding_box import BoundingBox
from sofima_tpu.utils.subvolume import Subvolume
from sofima_tpu.utils.volume import InMemoryVolume


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


class FakeTileRelaxMesh(mesh.RelaxMesh):
  """RelaxMesh with an in-memory solved-section store."""

  def __init__(self, config, store):
    super().__init__(config)
    self._store = store  # z -> [2, 1, y, x]

  def _load_stitched_tile(self, output_dir, box):
    z = int(box.start[2])
    if z in self._store:
      return self._store[z].copy()
    return None


class TestRelaxMeshComingIn:
  """Coming-in regions: multi-z reference flows in strict mode."""

  GRID = 12

  def _coming_in_proc(self, store, flow3, z=2, block_starts=(0,)):
    flow_vol = InMemoryVolume(flow3)
    cfg = em_2d.relax_mesh_config({
        'integration_config': {'stride': (10, 10), 'num_iters': 200,
                               'max_iters': 20000, 'k0': 0.1},
        'block_starts': list(block_starts),
    })
    cfg = dataclasses.replace(
        cfg, coming_in=[mesh.ComingIn(z=z, flow=flow_vol)])
    return FakeTileRelaxMesh(cfg, store)

  def _multiz_flow(self, z=2):
    # Left half of the grid references z-1 (Δz=1), right half z-2 (Δz=2).
    # The flow volume spans z so the coming-in section's box can read it.
    g = self.GRID
    flow3 = np.zeros((3, z + 1, g, g), np.float32)
    flow3[0] = 2.0                    # dx everywhere
    flow3[2, :, :, :g // 2] = 1.0     # lookback Δz
    flow3[2, :, :, g // 2:] = 2.0
    return flow3

  def test_coming_in_solve(self):
    g = self.GRID
    # Solved meshes: z=0 at rest, z=1 displaced +4 in x.
    mesh1 = np.zeros((2, 1, g, g), np.float32)
    mesh1[0] = 4.0
    store = {0: np.zeros((2, 1, g, g), np.float32), 1: mesh1}
    proc = self._coming_in_proc(store, self._multiz_flow())

    sv = Subvolume(np.zeros((2, 1, g, g), np.float32),
                   BoundingBox(start=(0, 0, 2), size=(g, g, 1)))
    prev = proc.get_prev_state((10, 10), sv.bbox)
    assert prev is not None
    # Constant maps compose additively: flow(2) + mesh(ref).
    interior_left = prev[:, 0, 2:-2, 2:g // 2 - 1]
    interior_right = prev[:, 0, 2:-2, g // 2 + 1:-2]
    np.testing.assert_allclose(interior_left[0], 6.0, atol=1e-3)   # 2 + 4
    np.testing.assert_allclose(interior_right[0], 2.0, atol=1e-3)  # 2 + 0
    np.testing.assert_allclose(prev[1, 0, 2:-2, 2:-2], 0.0, atol=1e-3)

    out = proc.process(Subvolume(
        np.zeros((2, 1, g, g), np.float32),
        BoundingBox(start=(0, 0, 2), size=(g, g, 1))))
    # With a strong data term the solve tracks prev per region.
    assert 4.0 < out.data[0, 0, g // 2, 2] < 7.0
    assert 0.5 < out.data[0, 0, g // 2, -3] < 4.0

  def test_coming_in_missing_mesh_is_strict(self):
    g = self.GRID
    store = {0: np.zeros((2, 1, g, g), np.float32)}  # z=1 mesh missing
    proc = self._coming_in_proc(store, self._multiz_flow())
    with pytest.raises(ValueError, match='Missing mesh data'):
      proc.get_prev_state((10, 10),
                          BoundingBox(start=(0, 0, 2), size=(g, g, 1)))

  def test_coming_in_cross_block_is_strict(self):
    g = self.GRID
    # z=3 in block starting at 2; Δz=2 references z=1 in the previous
    # block -> must raise rather than silently compose across blocks.
    flow3 = np.zeros((3, 4, g, g), np.float32)
    flow3[2] = 2.0
    store = {1: np.zeros((2, 1, g, g), np.float32)}
    proc = self._coming_in_proc(store, flow3, z=3, block_starts=(0, 2))
    with pytest.raises(ValueError, match='within one block'):
      proc.get_prev_state((10, 10),
                          BoundingBox(start=(0, 0, 3), size=(g, g, 1)))


class TestFoldRecovery:
  """The solve -> detect folds -> soft re-solve -> final solve protocol."""

  GRID = 10

  def _folding_prev(self, stride=10.0):
    # Reference positions that reverse the x-order of the grid: following
    # them exactly folds the mesh (negative node spacing).
    g = self.GRID
    prev = np.zeros((2, 1, g, g), np.float32)
    cols = np.arange(g, dtype=np.float32)
    prev[0] = (-2.0 * stride * cols)[None, None, :]
    return prev

  def _proc(self, k0, k):
    cfg = em_2d.relax_mesh_config({
        'integration_config': {'stride': (10, 10), 'num_iters': 200,
                               'max_iters': 40000, 'k0': k0, 'k': k},
    })
    return FakeTileRelaxMesh(cfg, {})

  def test_regularized_status(self):
    # Strong-ish data term folds the first solve; the k0/10 re-solve is
    # dominated by elasticity and untangles it.
    proc = self._proc(k0=0.3, k=1.0)
    x = np.zeros((2, 1, self.GRID, self.GRID), np.float32)
    out, _, _, status = proc.relax_mesh(
        x, self._folding_prev(), proc._config.integration_config, None)
    assert status == mesh.SolutionStatus.REGULARIZED
    # The protocol guarantees the regularized PREP state was fold-free;
    # the final data-term solve may re-introduce isolated irregularities
    # (the reference does not re-check either). Require that the bulk of
    # the mesh is untangled, unlike the raw solve.
    from sofima_tpu import map_utils
    masked = map_utils.mask_irregular(
        out[:, 0].copy(), (10, 10), proc._config.mesh_min_frac,
        dilation_iters=0)
    assert masked.mean() < 0.2

  def test_prep_failed_status(self):
    # A deep opposing-displacement seam: the two constrained halves force
    # an order reversal wider than the masked band, so even the k0/10
    # prep solve (with the fold neighborhood freed) folds again ->
    # PREP_FAILED, and the original solution is returned.
    g, stride = 24, 10.0
    prev = np.zeros((2, 1, g, g), np.float32)
    prev[0, :, :, :g // 2] = 8 * stride
    prev[0, :, :, g // 2:] = -8 * stride
    cfg = em_2d.relax_mesh_config({
        'integration_config': {'stride': (10, 10), 'num_iters': 200,
                               'max_iters': 40000, 'k0': 1.0, 'k': 0.05},
    })
    proc = FakeTileRelaxMesh(cfg, {})
    x = np.zeros((2, 1, g, g), np.float32)
    out, _, _, status = proc.relax_mesh(
        x, prev, cfg.integration_config, None)
    assert status == mesh.SolutionStatus.PREP_FAILED
    # Original (first-solve) solution returned: halves track their targets.
    assert out[0, 0, 0, 2] > 40.0 and out[0, 0, 0, -3] < -40.0

  def test_regular_status(self):
    proc = self._proc(k0=0.1, k=0.1)
    x = np.zeros((2, 1, self.GRID, self.GRID), np.float32)
    prev = np.zeros((2, 1, self.GRID, self.GRID), np.float32)
    prev[0] = 3.0
    _, _, _, status = proc.relax_mesh(
        x, prev, proc._config.integration_config, None)
    assert status == mesh.SolutionStatus.REGULAR


class TestFixedCurrent:
  """EstimateFlow.fixed_current: all sections vs the subvolume's last."""

  def test_flow_against_fixed_section(self):
    n = 200
    tex = _texture(n, seed=5)
    # Sections 0/1 shifted by +3/+1 px (x) vs section 2 (the fixed one).
    stack = np.stack([np.roll(tex, 3, axis=1), np.roll(tex, 1, axis=1),
                      tex, tex])
    vol = InMemoryVolume(stack[None], fill_value=0.0)

    cfg = em_2d.estimate_flow_config({'patch_size': 80, 'stride': 40,
                                      'batch_size': 16})
    cfg = dataclasses.replace(cfg, fixed_current=True)
    proc = flow.EstimateFlow(cfg)
    pre, post = proc.context()
    assert pre[2] == 0 and post[2] == cfg.z_stride

    out = runner.process_volume(proc, vol, subvolume_size=(n, n, 3))
    data = out.data
    # First work item covers sections 0..2 (+1 z context): flows for z=0
    # and z=1 are computed against section 2.
    i0 = data[0, 0, 2:-2, 2:-2]
    i1 = data[0, 1, 2:-2, 2:-2]
    assert np.isfinite(i0).any() and np.isfinite(i1).any()
    np.testing.assert_array_equal(i0[np.isfinite(i0)], 3.0)
    np.testing.assert_array_equal(i1[np.isfinite(i1)], 1.0)
    np.testing.assert_array_equal(
        data[1, 0][np.isfinite(data[1, 0])], 0.0)


class TestSearchRadius:
  """EstimateMissingFlow with an enlarged 'prev' search patch."""

  def _run(self, search_radius):
    n = 240
    tex = _texture(n, seed=6)
    shift = 25  # > patch/2 = 20: unrecoverable without search_radius
    stack = np.stack([
        tex,                          # z=0: the distant reference
        np.full_like(tex, 128.0),     # z=1: featureless
        np.roll(tex, shift, axis=1),  # z=2: the section to fix
    ])
    image_vol = InMemoryVolume(stack[None], fill_value=0.0)

    cfg = em_2d.estimate_missing_flow_config({
        'patch_size': 40, 'stride': 20, 'batch_size': 16,
        'max_delta_z': 2})
    cfg = dataclasses.replace(cfg, image_volinfo=image_vol,
                              search_radius=search_radius)
    proc = flow.EstimateMissingFlow(cfg)

    grid = n // 20
    flow_in = np.full((2, 1, grid, grid), np.nan, np.float32)
    sv = Subvolume(flow_in, BoundingBox(start=(0, 0, 2),
                                        size=(grid, grid, 1)))
    return proc.process(sv)

  def test_large_shift_recovered_with_search_radius(self):
    out = self._run(search_radius=20)
    interior = out.data[:, 0, 3:-3, 3:-3]
    valid = np.isfinite(interior[0])
    assert valid.mean() > 0.9
    # flow = pre - post = -shift, bias-free; found at lookback Δz = 2.
    np.testing.assert_array_equal(interior[0][valid], -25.0)
    np.testing.assert_array_equal(interior[1][valid], 0.0)
    np.testing.assert_array_equal(interior[2][valid], 2.0)

  def test_search_radius_beats_plain_patch(self):
    # At shift 25 > patch/2 the plain 40 px patch only recovers a
    # fraction of nodes (overlap 15/40 px -> weak, frequently rejected
    # peaks); the enlarged search patch recovers essentially all.
    def recovered(out):
      interior = out.data[:, 0, 3:-3, 3:-3]
      return np.mean(np.isfinite(interior[0]) & (interior[0] == -25.0))

    with_radius = recovered(self._run(search_radius=20))
    without = recovered(self._run(search_radius=0))
    assert with_radius > 0.9
    assert without < with_radius
