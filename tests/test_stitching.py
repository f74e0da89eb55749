"""Tile stitching tests: coarse offsets, tile placement, elastic solve."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sofima_tpu import mesh, stitch_elastic, stitch_rigid, warp


def _texture(n, seed=0, sigma=0.1):
  rng = np.random.RandomState(seed)
  noise = rng.rand(n, n).astype(np.float32)
  f = np.fft.rfft2(noise)
  fy = np.fft.fftfreq(n)[:, None]
  fx = np.fft.rfftfreq(n)[None, :]
  f *= np.exp(-((fx**2 + fy**2) / (2 * sigma**2)))
  tex = np.fft.irfft2(f, s=(n, n))
  tex = (tex - tex.min()) / np.ptp(tex)
  return (tex * 255).astype(np.uint8)


def _cut_tiles(img, tile=160, overlap=60, grid=2):
  step = tile - overlap
  tiles = {}
  for ty in range(grid):
    for tx in range(grid):
      tiles[(tx, ty)] = img[ty * step:ty * step + tile,
                            tx * step:tx * step + tile]
  return tiles


class TestCoarse:

  def setup_method(self):
    self.img = _texture(260)
    self.tiles = _cut_tiles(self.img)

  def test_coarse_offsets(self):
    cx, cy = stitch_rigid.compute_coarse_offsets(
        (2, 2), self.tiles, overlaps_xy=((65, 75), (65, 75)),
        min_overlap=10)
    # True overlap is 20 px: offset along the connection axis ~ -20.
    assert np.all(np.isfinite(cx[:, 0, :, 0]))
    np.testing.assert_allclose(cx[0, 0, :, 0], -60, atol=2)
    np.testing.assert_allclose(cx[1, 0, :, 0], 0, atol=2)
    np.testing.assert_allclose(cy[1, 0, 0, :], -60, atol=2)
    np.testing.assert_allclose(cy[0, 0, 0, :], 0, atol=2)
    # No connection beyond the grid edge.
    assert np.isnan(cx[0, 0, 0, 1])

  def test_optimize_coarse_mesh(self):
    cx, cy = stitch_rigid.compute_coarse_offsets(
        (2, 2), self.tiles, overlaps_xy=((65, 75), (65, 75)),
        min_overlap=10)
    pos = stitch_rigid.optimize_coarse_mesh(cx, cy)
    # Neighboring tiles end up 20 px closer than the default layout.
    np.testing.assert_allclose(pos[0, 0, :, 1] - pos[0, 0, :, 0], -60,
                               atol=2)
    np.testing.assert_allclose(pos[1, 0, 1, :] - pos[1, 0, 0, :], -60,
                               atol=2)

  def test_interpolate_missing_offsets(self):
    conn = np.full((2, 1, 1, 4), np.nan)
    conn[:, 0, 0, :3] = [[-20, -22, np.inf], [0, 1, np.inf]]
    out = stitch_rigid.interpolate_missing_offsets(conn, axis=-1)
    np.testing.assert_allclose(out[:, 0, 0, 2], [-22, 1])

  def test_missing_tile_offsets_nan(self):
    tiles = dict(self.tiles)
    del tiles[(1, 1)]
    cx, cy = stitch_rigid.compute_coarse_offsets(
        (2, 2), tiles, overlaps_xy=((65, 75), (65, 75)), min_overlap=10)
    assert np.isnan(cx[0, 0, 1, 0])  # pair (0,1)-(1,1) missing
    assert np.isfinite(cx[0, 0, 0, 0])

  def test_batched_matches_sequential(self):
    kwargs = dict(overlaps_xy=((65, 75), (65, 75)), min_overlap=10)
    cx, cy = stitch_rigid.compute_coarse_offsets((2, 2), self.tiles,
                                                 **kwargs)
    bx, by = stitch_rigid.compute_coarse_offsets_batched(
        (2, 2), self.tiles, **kwargs)
    np.testing.assert_array_equal(cx, bx)
    np.testing.assert_array_equal(cy, by)

  def test_batched_device_tiles_and_missing(self):
    tiles = {k: jnp.asarray(v) for k, v in self.tiles.items()
             if k != (1, 1)}
    host = {k: self.tiles[k] for k in tiles}
    kwargs = dict(overlaps_xy=((65, 75), (65, 75)), min_overlap=10)
    cx, cy = stitch_rigid.compute_coarse_offsets((2, 2), host, **kwargs)
    bx, by = stitch_rigid.compute_coarse_offsets_batched((2, 2), tiles,
                                                         **kwargs)
    np.testing.assert_array_equal(cx, bx)
    np.testing.assert_array_equal(cy, by)


class TestTileMeshForces:

  def test_elastic_tile_mesh_equilibrium(self):
    # Positions matching the desired offsets -> zero force.
    cx = np.full((2, 1, 2, 2), np.nan, np.float32)
    cy = np.full((2, 1, 2, 2), np.nan, np.float32)
    cx[0, 0, :, 0] = -20
    cx[1, 0, :, 0] = 0
    cy[1, 0, 0, :] = -20
    cy[0, 0, 0, :] = 0
    x = np.zeros((2, 1, 2, 2), np.float32)
    x[0, 0, :, 1] = -20
    x[1, 0, 1, :] = -20
    f = np.asarray(stitch_rigid.elastic_tile_mesh(
        jnp.asarray(x), jnp.asarray(cx), jnp.asarray(cy)))
    np.testing.assert_allclose(f, 0.0, atol=1e-5)

  def test_elastic_tile_mesh_3d_z_coupling(self):
    cx = np.full((3, 1, 1, 2), np.nan, np.float32)
    cy = np.full((3, 1, 1, 2), np.nan, np.float32)
    cx[:, 0, 0, 0] = (-20, 0, 5)  # desired z offset 5
    x = np.zeros((3, 1, 1, 2), np.float32)
    f = np.asarray(stitch_rigid.elastic_tile_mesh_3d(
        jnp.asarray(x), jnp.asarray(cx), jnp.asarray(cy)))
    # z-channel force pulls tile 0 up/down toward the z offset.
    assert f[2, 0, 0, 0] != 0
    np.testing.assert_allclose(f.sum(axis=(1, 2, 3)), 0, atol=1e-5)


class TestElastic2d:

  def test_full_elastic_stitch(self):
    img = _texture(260, seed=3)
    tiles = _cut_tiles(img)
    cx, cy = stitch_rigid.compute_coarse_offsets(
        (2, 2), tiles, overlaps_xy=((65, 75), (65, 75)), min_overlap=10)
    coarse = stitch_rigid.optimize_coarse_mesh(cx, cy)

    stride = (20, 20)
    fine_x, offsets_x = stitch_elastic.compute_flow_map(
        tiles, cx[:, 0], axis=0, patch_size=(40, 40), stride=stride,
        batch_size=16)
    fine_y, offsets_y = stitch_elastic.compute_flow_map(
        tiles, cy[:, 0], axis=1, patch_size=(40, 40), stride=stride,
        batch_size=16)
    assert fine_x and fine_y

    coords = list(tiles.keys())
    fx, fy, x0, nbors, key_to_idx = stitch_elastic.aggregate_arrays(
        (cx[:, 0], fine_x, offsets_x), (cy[:, 0], fine_y, offsets_y),
        coords, coarse[:, 0], stride, tile_shape=(160, 160))
    assert x0.shape == (2, 4, 8, 8)
    assert nbors.shape == (4, 4, 8)

    prev_fn = jax.jit(lambda x: jax.vmap(
        functools.partial(stitch_elastic.compute_target_mesh, x=x, fx=fx,
                          fy=fy, stride=stride))(jnp.asarray(nbors)))

    # Sanity: target meshes must have constrained entries near tile edges.
    tgt = np.asarray(prev_fn(jnp.asarray(x0)))
    tgt = np.moveaxis(tgt, 0, 1)  # [2, n, y, x]
    assert np.isfinite(tgt[:, 0, :, -1]).any()  # right edge of tile 0

    cfg = mesh.IntegrationConfig(
        dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=stride,
        num_iters=400, max_iters=20000, stop_v_max=0.005, dt_max=100.0)
    solved, _, _ = mesh.relax_mesh(
        jnp.asarray(x0), None, cfg,
        prev_fn=lambda x: jnp.moveaxis(
            jax.vmap(functools.partial(
                stitch_elastic.compute_target_mesh, x=x, fx=fx, fy=fy,
                stride=stride))(jnp.asarray(nbors)), 0, 1))
    solved = np.asarray(solved)

    # Render the montage and compare against the source image.
    maps = {k: solved[:, i:i + 1] for k, i in key_to_idx.items()}
    # render_tiles expects [2, 1, my, mx] per tile.
    canvas, mask = warp.render_tiles(
        tiles, maps, stride=stride, margin=4)
    # The coarse solve is mean-zero (gauge freedom): the whole montage is
    # globally translated by tile (0,0)'s solved offset. Compare content
    # modulo that shift.
    shift = int(round(solved[0, key_to_idx[(0, 0)], 0, 0]))
    shift_y = int(round(solved[1, key_to_idx[(0, 0)], 0, 0]))
    sel_canvas = np.s_[30 + shift_y:130 + shift_y, 30 + shift:130 + shift]
    sel_img = np.s_[30:130, 30:130]
    rendered = canvas[sel_canvas].astype(np.float32)
    truth = img[sel_img].astype(np.float32)
    valid = mask[sel_canvas]
    assert valid.mean() > 0.9
    err = np.abs(rendered - truth)[valid].mean()
    assert err < 10.0, err

    # Device-resident render must agree with the host render where both
    # are valid (same inversion family, same Lanczos kernel; the margin
    # mask is analytic instead of a warped indicator, so only
    # border-adjacent pixels may differ in coverage).
    from sofima_tpu.pipeline import montage
    canvas_d, mask_d, _ = montage.render_tiles_device(
        {k: jnp.asarray(v) for k, v in tiles.items()}, maps,
        stride=stride[0], margin=4)
    canvas_d, mask_d = np.asarray(canvas_d), np.asarray(mask_d)
    both = mask_d & mask & (canvas > 0) & (canvas_d > 0)
    assert both.mean() > 0.5
    dev_err = np.abs(canvas_d - canvas)[both].mean()
    assert dev_err < 1.0, dev_err
    # Coverage must agree except at mask borders.
    assert (mask_d ^ mask).mean() < 0.02


class TestMontageDevice:

  def test_montage_align_2d_end_to_end(self):
    from sofima_tpu.pipeline import montage
    img = _texture(260, seed=3)
    tiles = {k: jnp.asarray(v) for k, v in _cut_tiles(img).items()}
    cfg = montage.MontageConfig(
        stride=20, patch_size=40, coarse_overlaps=(65, 75),
        min_overlap=10, margin=4, flow_batch=16,
        mesh_cfg=mesh.IntegrationConfig(
            dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=(20.0, 20.0),
            num_iters=400, max_iters=20000, stop_v_max=0.005,
            dt_max=100.0))
    out = montage.montage_align_2d(tiles, (2, 2), cfg)
    canvas = np.asarray(out['canvas'])
    mask = np.asarray(out['mask'])
    solved, key_to_idx = out['solved'], out['key_to_idx']
    shift = int(round(solved[0, key_to_idx[(0, 0)], 0, 0]))
    shift_y = int(round(solved[1, key_to_idx[(0, 0)], 0, 0]))
    sel_canvas = np.s_[30 + shift_y:130 + shift_y, 30 + shift:130 + shift]
    rendered = canvas[sel_canvas].astype(np.float32)
    truth = img[30:130, 30:130].astype(np.float32)
    valid = mask[sel_canvas]
    assert valid.mean() > 0.9
    err = np.abs(rendered - truth)[valid].mean()
    assert err < 10.0, err
