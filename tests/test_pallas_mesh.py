"""Pallas mesh-force kernel: equivalence with the XLA stencil."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sofima_tpu import mesh
from sofima_tpu.ops import pallas_mesh

# CPU tests run the kernel in interpreter mode.
FORCE = pallas_mesh.make_inplane_force(tile=16, interpret=True)


class TestPallasForce:

  def test_matches_xla_stencil(self):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 2, 20, 24).astype(np.float32) * 3
    ref = np.asarray(mesh.inplane_force(jnp.asarray(x), 0.1, (40, 40)))
    out = np.asarray(FORCE(jnp.asarray(x), 0.1, (40, 40)))
    np.testing.assert_allclose(out, ref, atol=1e-5)

  def test_matches_with_nan_nodes(self):
    rng = np.random.RandomState(1)
    x = rng.randn(2, 1, 16, 16).astype(np.float32)
    x[:, 0, 5, 7] = np.nan
    x[:, 0, 0, :3] = np.nan
    ref = np.asarray(mesh.inplane_force(jnp.asarray(x), 0.1, (40, 40)))
    out = np.asarray(FORCE(jnp.asarray(x), 0.1, (40, 40)))
    np.testing.assert_allclose(np.nan_to_num(out), np.nan_to_num(ref),
                               atol=1e-5)

  def test_prefer_orig_order(self):
    x = np.zeros((2, 1, 8, 8), np.float32)
    x[0, 0, 4, 4] = -60.0  # folded node at stride 40
    ref = np.asarray(
        mesh.inplane_force(jnp.asarray(x), 0.1, (40, 40), True))
    out = np.asarray(FORCE(jnp.asarray(x), 0.1, (40, 40), True))
    np.testing.assert_allclose(out, ref, atol=1e-5)

  def test_non_tile_multiple_shapes(self):
    rng = np.random.RandomState(2)
    x = rng.randn(2, 1, 19, 23).astype(np.float32)
    ref = np.asarray(mesh.inplane_force(jnp.asarray(x), 0.1, (40, 40)))
    out = np.asarray(FORCE(jnp.asarray(x), 0.1, (40, 40)))
    np.testing.assert_allclose(out, ref, atol=1e-5)

  def test_inside_solver(self):
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 1, 16, 16).astype(np.float32))
    prev = jnp.zeros_like(x)
    cfg = mesh.IntegrationConfig(
        dt=0.001, gamma=0.0, k0=0.05, k=0.1, stride=(40, 40),
        num_iters=100, max_iters=5000, stop_v_max=0.001, dt_max=100.0)
    ref, _, _ = mesh.relax_mesh(x, prev, cfg)
    out, _, _ = mesh.relax_mesh(x, prev, cfg, mesh_force=FORCE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


FORCE3 = pallas_mesh.make_elastic_mesh_3d(tile=16, interpret=True)


class TestPallas3dForce:

  def test_matches_xla_3d(self):
    rng = np.random.RandomState(0)
    x = rng.randn(3, 5, 10, 12).astype(np.float32) * 3
    ref = np.asarray(mesh.elastic_mesh_3d(jnp.asarray(x), 0.1, 40.0))
    out = np.asarray(FORCE3(jnp.asarray(x), 0.1, 40.0))
    np.testing.assert_allclose(out, ref, atol=1e-4)

  def test_matches_with_nans_and_anisotropic_stride(self):
    rng = np.random.RandomState(1)
    x = rng.randn(3, 4, 8, 9).astype(np.float32)
    x[:, 1, 3, 4] = np.nan
    ref = np.asarray(mesh.elastic_mesh_3d(jnp.asarray(x), 0.2,
                                          (30.0, 40.0, 20.0)))
    out = np.asarray(FORCE3(jnp.asarray(x), 0.2, (30.0, 40.0, 20.0)))
    np.testing.assert_allclose(np.nan_to_num(out), np.nan_to_num(ref),
                               atol=1e-4)

  def test_prefer_orig_order_3d(self):
    x = np.zeros((3, 3, 6, 6), np.float32)
    x[0, 1, 3, 3] = -60.0
    ref = np.asarray(mesh.elastic_mesh_3d(jnp.asarray(x), 0.1, 40.0, True))
    out = np.asarray(FORCE3(jnp.asarray(x), 0.1, 40.0, True))
    np.testing.assert_allclose(out, ref, atol=1e-4)


class TestFusedFireSolver:
  """Whole-convergence-loop-in-one-kernel solver (round 3)."""

  def _setup(self, g=24, seed=0):
    rng = np.random.RandomState(seed)
    prev = np.full((2, 1, g, g), np.nan, np.float32)
    prev[:, :, 2:-2, 2:-2] = rng.randn(2, 1, g - 4, g - 4).astype(
        np.float32) * 3
    cfg = mesh.IntegrationConfig(
        dt=0.001, gamma=0.0, k0=0.1, k=0.1, stride=(40.0, 40.0),
        num_iters=200, max_iters=2000, stop_v_max=0.005, dt_max=100.0,
        start_cap=0.01, final_cap=10.0, cap_scale=1.1,
        prefer_orig_order=True)
    return jnp.zeros_like(jnp.asarray(prev)), jnp.asarray(prev), cfg

  def test_matches_staged_solver(self):
    x0, prev, cfg = self._setup()
    ref, _, steps_ref = mesh.relax_mesh_fused(x0, prev, cfg)
    got, _, steps_got = pallas_mesh.relax_mesh_fused_pallas(
        x0, prev, cfg, interpret=True)
    assert int(steps_ref) == int(steps_got)
    assert bool(jnp.all(jnp.isnan(ref) == jnp.isnan(got)))
    assert float(jnp.nanmax(jnp.abs(ref - got))) < 1e-3

  def test_no_prev(self):
    x0, _, cfg = self._setup()
    x0 = x0 + 1.5  # displaced nodes relax back under elastic forces
    ref, _, _ = mesh.relax_mesh_fused(x0, None, cfg)
    got, _, _ = pallas_mesh.relax_mesh_fused_pallas(
        x0, None, cfg, interpret=True)
    assert float(jnp.nanmax(jnp.abs(ref - got))) < 1e-3

  def test_3d_matches_staged_solver(self):
    rng = np.random.RandomState(2)
    g = 10
    prev = np.full((3, 6, g, g), np.nan, np.float32)
    prev[:, 1:-1, 2:-2, 2:-2] = rng.randn(3, 4, g - 4, g - 4).astype(
        np.float32) * 3
    cfg = mesh.IntegrationConfig(
        dt=0.001, gamma=0.0, k0=0.1, k=0.1, stride=(40.0, 40.0, 40.0),
        num_iters=100, max_iters=1000, stop_v_max=0.005, dt_max=100.0,
        start_cap=0.01, final_cap=10.0, cap_scale=1.1)
    x0 = jnp.zeros_like(jnp.asarray(prev))
    ref, _, steps_ref = mesh.relax_mesh_fused(
        x0, jnp.asarray(prev), cfg, mesh_force=mesh.elastic_mesh_3d)
    got, _, steps_got = pallas_mesh.relax_mesh_fused_pallas_3d(
        x0, jnp.asarray(prev), cfg, interpret=True)
    assert int(steps_ref) == int(steps_got)
    assert float(jnp.nanmax(jnp.abs(ref - got))) < 1e-3

  def test_3d_link_loop_matches_unrolled(self):
    # The fori-loop force body (SMEM link tables, dynamic rolls) must be
    # numerically identical to the 26-way unrolled form it replaces
    # (the unrolled form crashes the axon relay's remote Mosaic
    # compile; the loop form is the hardware path).
    rng = np.random.RandomState(3)
    x0 = jnp.asarray(rng.randn(3, 4, 12, 16).astype(np.float32))
    prev = jnp.zeros_like(x0)
    cfg = mesh.IntegrationConfig(
        dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=(40.0, 30.0, 20.0),
        num_iters=50, max_iters=100, stop_v_max=0.0, dt_max=100.0)
    a, _, _ = pallas_mesh.relax_mesh_fused_pallas_3d(
        x0, prev, cfg, interpret=True, link_loop=False)
    b, _, _ = pallas_mesh.relax_mesh_fused_pallas_3d(
        x0, prev, cfg, interpret=True, link_loop=True)
    assert float(jnp.nanmax(jnp.abs(a - b))) < 1e-4
    # Symmetric (13 half-links + reaction rolls) must match too.
    c, _, _ = pallas_mesh.relax_mesh_fused_pallas_3d(
        x0, prev, cfg, interpret=True, link_loop=True, symmetric=True)
    assert float(jnp.nanmax(jnp.abs(a - c))) < 1e-4

  def test_3d_mask_guard_matches_pad_guard(self):
    # Round-5: guard='mask' drops the NaN guard ring (which forces a
    # lane-aligned x extent to the next 128-multiple — 2x wasted work
    # on the bench mesh) in favor of per-link iota boundary masks. Must
    # be numerically identical to the ring-guarded solve, including
    # missing interior nodes and prefer_orig_order + symmetric.
    rng = np.random.RandomState(7)
    prev = rng.randn(3, 4, 12, 16).astype(np.float32) * 3
    prev[:, 2, 5, 7] = np.nan
    prev = jnp.asarray(prev)
    x0 = jnp.where(jnp.isnan(prev), jnp.nan, jnp.zeros_like(prev))
    for sym in (False, True):
      for poo in (False, True):
        cfg = mesh.IntegrationConfig(
            dt=0.001, gamma=0.0, k0=0.1, k=0.1,
            stride=(40.0, 30.0, 20.0), num_iters=50, max_iters=300,
            stop_v_max=0.005, dt_max=100.0, prefer_orig_order=poo)
        a, _, steps_a = pallas_mesh.relax_mesh_fused_pallas_3d(
            x0, prev, cfg, interpret=True, link_loop=True, symmetric=sym)
        b, _, steps_b = pallas_mesh.relax_mesh_fused_pallas_3d(
            x0, prev, cfg, interpret=True, link_loop=True, symmetric=sym,
            guard='mask')
        assert int(steps_a) == int(steps_b), (sym, poo)
        assert bool(jnp.all(jnp.isnan(a) == jnp.isnan(b))), (sym, poo)
        assert float(jnp.nanmax(jnp.abs(a - b))) < 1e-4, (sym, poo)

  def test_roll_force_loop_symmetric_matches(self):
    # Direct force parity of the half-link (Newton's-third-law) loop
    # body vs the full 26-link loop on a NaN-guard-ringed array,
    # including missing interior nodes and prefer_orig_order.
    rng = np.random.RandomState(5)
    x = rng.randn(3, 6, 14, 18).astype(np.float32) * 5
    x[:, 3, 5, 7] = np.nan
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1)),
                constant_values=np.nan)
    xp = jnp.asarray(xp)
    for poo in (False, True):
      ref = pallas_mesh._roll_force_3d_loop(
          xp, 0.1, (40.0, 30.0, 20.0), poo)
      got = pallas_mesh._roll_force_3d_loop(
          xp, 0.1, (40.0, 30.0, 20.0), poo, symmetric=True)
      assert float(jnp.nanmax(jnp.abs(ref - got))) < 1e-4, poo


class TestElasticMesh3dLinkLoop:

  def test_force_link_loop_matches_xla(self):
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(3, 5, 20, 24).astype(np.float32) * 5)
    for poo in (False, True):
      ref = mesh.elastic_mesh_3d(x, 0.1, (40.0, 30.0, 20.0),
                                 prefer_orig_order=poo)
      got = pallas_mesh.elastic_mesh_3d_pallas(
          x, 0.1, (40.0, 30.0, 20.0), prefer_orig_order=poo,
          tile=16, interpret=True, link_loop=True)
      assert float(jnp.nanmax(jnp.abs(ref - got))) < 1e-4, poo

  def test_slab_force_matches_xla(self):
    # Margin-free slab formulation (y-shifted copies + full-width
    # blocks): exact parity with the XLA 26-neighbor force.
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(3, 5, 20, 24).astype(np.float32) * 5)
    for poo in (False, True):
      ref = mesh.elastic_mesh_3d(x, 0.1, (40.0, 30.0, 20.0),
                                 prefer_orig_order=poo)
      got = pallas_mesh.elastic_mesh_3d_pallas_slab(
          x, 0.1, (40.0, 30.0, 20.0), prefer_orig_order=poo, tile_y=4,
          interpret=True)
      assert float(jnp.nanmax(jnp.abs(ref - got))) < 1e-4, poo

  def test_slab_force_window_dma_matches_xla(self):
    # In-kernel window DMA (halo rows from one padded array, no up/dn
    # shifted copies): exact parity with the XLA 26-neighbor force,
    # including NaN nodes at tile boundaries.
    rng = np.random.RandomState(11)
    x = rng.randn(3, 5, 20, 24).astype(np.float32) * 5
    x[:, 1, 3:5, 7] = np.nan
    x = jnp.asarray(x)
    for poo in (False, True):
      ref = mesh.elastic_mesh_3d(x, 0.1, (40.0, 30.0, 20.0),
                                 prefer_orig_order=poo)
      got = pallas_mesh.elastic_mesh_3d_pallas_slab(
          x, 0.1, (40.0, 30.0, 20.0), prefer_orig_order=poo, tile_y=4,
          interpret=True, window_dma=True)
      assert float(jnp.nanmax(jnp.abs(ref - got))) < 1e-4, poo

  def test_slab_force_symmetric_matches_xla(self):
    # Newton's-third-law link sharing (13 + boundary chains instead of
    # 26): exact parity with the XLA 26-neighbor force, including NaN
    # nodes and prefer_orig_order.
    rng = np.random.RandomState(8)
    x = rng.randn(3, 5, 20, 24).astype(np.float32) * 5
    x[:, 2, 7:9, 3] = np.nan  # missing nodes exercise the guards
    x = jnp.asarray(x)
    for poo in (False, True):
      ref = mesh.elastic_mesh_3d(x, 0.1, (40.0, 30.0, 20.0),
                                 prefer_orig_order=poo)
      got = pallas_mesh.elastic_mesh_3d_pallas_slab(
          x, 0.1, (40.0, 30.0, 20.0), prefer_orig_order=poo, tile_y=4,
          interpret=True, symmetric=True)
      assert float(jnp.nanmax(jnp.abs(ref - got))) < 1e-4, poo

  def test_slab_force_symmetric_split_matches_xla(self):
    # sym_split partitions the 13 half-link families across 2 or 3
    # pallas_calls (the single symmetric body overruns the remote
    # compile helper's unroll-x-area threshold on hardware); the summed
    # partial forces must stay exactly the full symmetric force.
    rng = np.random.RandomState(9)
    x = rng.randn(3, 5, 20, 24).astype(np.float32) * 5
    x[:, 1, 4, 11:13] = np.nan
    x = jnp.asarray(x)
    for split in (2, 3):
      for poo in (False, True):
        ref = mesh.elastic_mesh_3d(x, 0.1, (40.0, 30.0, 20.0),
                                   prefer_orig_order=poo)
        got = pallas_mesh.elastic_mesh_3d_pallas_slab(
            x, 0.1, (40.0, 30.0, 20.0), prefer_orig_order=poo,
            tile_y=4, interpret=True, symmetric=True, sym_split=split)
        assert float(jnp.nanmax(jnp.abs(ref - got))) < 1e-4, (split, poo)

  def test_slab_force_symmetric_linkloop_matches_xla(self):
    # The two-fori_loop symmetric slab body (the only symmetric form
    # whose generated code fits the compile helper's per-program size
    # threshold) must match the XLA stencil exactly, NaN guards and
    # prefer_orig_order included.
    rng = np.random.RandomState(11)
    x = rng.randn(3, 5, 20, 24).astype(np.float32) * 5
    x[:, 2, 7, 3:5] = np.nan
    x[:, 0, 0, 0] = np.nan
    x = jnp.asarray(x)
    for poo in (False, True):
      ref = mesh.elastic_mesh_3d(x, 0.1, (40.0, 30.0, 20.0),
                                 prefer_orig_order=poo)
      got = pallas_mesh.elastic_mesh_3d_pallas_slab(
          x, 0.1, (40.0, 30.0, 20.0), prefer_orig_order=poo,
          tile_y=4, interpret=True, symmetric=True, link_loop=True)
      assert float(jnp.nanmax(jnp.abs(ref - got))) < 1e-4, poo

  def test_slab_force_inside_solver(self):
    rng = np.random.RandomState(7)
    prev = jnp.asarray(rng.randn(3, 4, 8, 10).astype(np.float32))
    x0 = jnp.zeros_like(prev)
    cfg = mesh.IntegrationConfig(
        dt=0.001, gamma=0.0, k0=0.1, k=0.1, stride=(40.0, 40.0, 40.0),
        num_iters=100, max_iters=400, stop_v_max=0.005, dt_max=100.0)

    def slab_force(x, k, stride, prefer_orig_order=False, links=None):
      del links
      return pallas_mesh.elastic_mesh_3d_pallas_slab(
          x, k, stride, prefer_orig_order, tile_y=4, interpret=True)

    ref, _, _ = mesh.relax_mesh_fused(x0, prev, cfg,
                                      mesh_force=mesh.elastic_mesh_3d)
    got, _, _ = mesh.relax_mesh_fused(x0, prev, cfg,
                                      mesh_force=slab_force)
    assert float(jnp.nanmax(jnp.abs(ref - got))) < 1e-3
