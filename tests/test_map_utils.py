"""Tests for coordinate-map algebra (algebraic round-trips vs analytics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sofima_tpu import map_utils
from sofima_tpu.utils import BoundingBox


def _smooth_map(shape_yx, amp=2.0, freq=1.0):
  """Smooth sinusoidal 2d relative map [2, 1, y, x]."""
  y, x = np.mgrid[:shape_yx[0], :shape_yx[1]]
  dx = amp * np.sin(2 * np.pi * freq * y / shape_yx[0])
  dy = amp * np.cos(2 * np.pi * freq * x / shape_yx[1])
  return np.stack([dx, dy]).astype(np.float32)[:, np.newaxis]


class TestAbsoluteRelative:

  def test_roundtrip_2d(self):
    m = _smooth_map((8, 10))
    box = BoundingBox(start=(3, 4, 0), size=(10, 8, 1))
    for stride in (1.0, 4.0, (2.0, 3.0)):
      absm = map_utils.to_absolute(m, stride, box)
      rel = map_utils.to_relative(absm, stride, box)
      np.testing.assert_allclose(rel, m, atol=1e-4)

  def test_roundtrip_3d(self):
    rng = np.random.RandomState(0)
    m = rng.randn(3, 4, 5, 6).astype(np.float32)
    box = BoundingBox(start=(1, 2, 3), size=(6, 5, 4))
    absm = map_utils.to_absolute(m, 2.0, box)
    rel = map_utils.to_relative(absm, 2.0, box)
    np.testing.assert_allclose(rel, m, atol=1e-4)

  def test_absolute_values(self):
    m = np.zeros((2, 1, 2, 3), dtype=np.float32)
    absm = map_utils.to_absolute(m, 10.0)
    # x channel: 0, 10, 20 along x
    np.testing.assert_array_equal(absm[0, 0, 0], [0, 10, 20])
    np.testing.assert_array_equal(absm[1, 0, :, 0], [0, 10])


class TestFillMissing:

  def test_no_nans_passthrough(self):
    m = _smooth_map((8, 8))
    out = map_utils.fill_missing(m)
    np.testing.assert_array_equal(out, m)

  def test_fills_linear_field_exactly(self):
    # A linear field is harmonic: interpolation must reproduce it.
    y, x = np.mgrid[:16, :16].astype(np.float32)
    m = np.stack([0.5 * x + 0.25 * y, -0.3 * x + 0.1 * y])[:, np.newaxis]
    holes = np.zeros((16, 16), dtype=bool)
    holes[5:9, 6:10] = True
    damaged = m.copy()
    damaged[:, :, holes] = np.nan
    out = map_utils.fill_missing(damaged)
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out, m, atol=0.15)

  def test_interpolate_only_leaves_outside_nan(self):
    m = _smooth_map((12, 12))
    damaged = m.copy()
    damaged[:, :, :, :3] = np.nan  # left edge strip: outside span hull
    damaged[:, :, 5, 5] = np.nan  # interior hole
    out = map_utils.fill_missing(damaged)
    assert np.isfinite(out[:, :, 5, 5]).all()
    assert np.isnan(out[:, :, 5, 0]).all()

  def test_extrapolate_fills_everything(self):
    m = _smooth_map((12, 12))
    damaged = m.copy()
    damaged[:, :, :, :4] = np.nan
    out = map_utils.fill_missing(damaged, extrapolate=True)
    assert np.all(np.isfinite(out))
    # Extrapolated strip should carry nearest valid values.
    np.testing.assert_allclose(out[:, 0, :, 3], m[:, 0, :, 4], atol=0.5)

  def test_invalid_to_zero(self):
    m = np.full((2, 2, 4, 4), np.nan, dtype=np.float32)
    m[:, 0] = 1.0  # one valid section
    out = map_utils.fill_missing(m, invalid_to_zero=True)
    np.testing.assert_array_equal(out[:, 1], 0.0)
    np.testing.assert_array_equal(out[:, 0], 1.0)


class TestInvertCompose:

  def test_invert_constant_shift(self):
    # map: u = x + 5 -> inverse: x = u - 5
    m = np.zeros((2, 1, 12, 12), dtype=np.float32)
    m[0] = 5.0
    box = BoundingBox(start=(0, 0, 0), size=(12, 12, 1))
    inv = map_utils.invert_map(m, box, box, 1.0)
    # Queries with u < 5 are outside the image of the map -> NaN.
    assert np.isnan(inv[:, :, :, :5]).all()
    interior = inv[:, :, 2:-2, 6:-2]
    assert np.all(np.isfinite(interior))
    np.testing.assert_allclose(interior[0], -5.0, atol=0.05)
    np.testing.assert_allclose(interior[1], 0.0, atol=0.05)

  def test_invert_sinusoidal_is_negation(self):
    # For small smooth perturbations, inverse ≈ negation.
    m = _smooth_map((24, 24), amp=0.5)
    box = BoundingBox(start=(0, 0, 0), size=(24, 24, 1))
    inv = map_utils.invert_map(m, box, box, 1.0)
    sel = np.s_[:, :, 4:-4, 4:-4]
    assert np.all(np.isfinite(inv[sel]))
    np.testing.assert_allclose(inv[sel], -m[sel], atol=0.25)

  def test_compose_with_inverse_is_identity(self):
    m = _smooth_map((24, 24), amp=1.5)
    box = BoundingBox(start=(0, 0, 0), size=(24, 24, 1))
    inv = map_utils.invert_map(m, box, box, 1.0)
    comp = map_utils.compose_maps_fast(
        m, start1=(0, 0), stride1=1.0,
        map2=np.nan_to_num(inv), start2=(0, 0), stride2=1.0)
    comp = np.array(comp)
    sel = np.s_[:, :, 6:-6, 6:-6]
    np.testing.assert_allclose(comp[sel], 0.0, atol=0.2)

  def test_compose_maps_fast_translations(self):
    # Composition of two constant shifts adds them.
    m1 = np.full((2, 1, 8, 8), 2.0, dtype=np.float32)
    m2 = np.full((2, 1, 8, 8), 3.0, dtype=np.float32)
    out = np.array(map_utils.compose_maps_fast(
        m1, (0, 0), 1.0, m2, (0, 0), 1.0))
    # Queries past map2's grid clamp to the edge (mode='nearest'), so only
    # the interior adds exactly.
    np.testing.assert_allclose(out[:, :, :5, :5], 5.0, atol=1e-4)

  def test_compose_maps_fast_nan_propagation(self):
    m1 = np.zeros((2, 1, 8, 8), dtype=np.float32)
    m1[:, :, 3, 3] = np.nan
    m2 = np.zeros((2, 1, 8, 8), dtype=np.float32)
    out = np.array(map_utils.compose_maps_fast(
        m1, (0, 0), 1.0, m2, (0, 0), 1.0))
    assert np.isnan(out[:, 0, 3, 3]).all()
    assert np.isfinite(out[:, 0, 0, 0]).all()

  def test_compose_maps_fast_strides(self):
    # map1 on stride 2, map2 on stride 1; constant shifts still add.
    m1 = np.full((2, 1, 4, 4), 1.0, dtype=np.float32)
    m2 = np.full((2, 1, 8, 8), 2.0, dtype=np.float32)
    out = np.array(map_utils.compose_maps_fast(
        m1, (0, 0), 2.0, m2, (0, 0), 1.0))
    np.testing.assert_allclose(out, 3.0, atol=1e-4)

  def test_compose_maps_interpolates_map2_holes(self):
    m1 = np.zeros((2, 1, 8, 8), dtype=np.float32)
    m2 = np.full((2, 1, 8, 8), 4.0, dtype=np.float32)
    m2[:, :, 4, 4] = np.nan
    box = BoundingBox(start=(0, 0, 0), size=(8, 8, 1))
    out = map_utils.compose_maps(m1, box, 1.0, m2, box, 1.0)
    # compose_maps uses mode='constant': queries past map2's grid are NaN.
    interior = out[:, :, :3, :3]
    assert np.all(np.isfinite(interior))
    np.testing.assert_allclose(interior, 4.0, atol=0.1)
    assert np.isfinite(out[:, 0, 4, 4]).all()  # hole interpolated

  def test_3d_compose(self):
    m1 = np.full((3, 4, 4, 4), 1.0, dtype=np.float32)
    m2 = np.full((3, 4, 4, 4), 2.0, dtype=np.float32)
    out = np.array(map_utils.compose_maps_fast(
        m1, (0, 0, 0), 1.0, m2, (0, 0, 0), 1.0))
    np.testing.assert_allclose(out[:, :3, :3, :3], 3.0, atol=1e-4)


class TestResample:

  def test_downsample_constant(self):
    m = np.full((2, 1, 16, 16), 7.0, dtype=np.float32)
    src_box = BoundingBox(start=(0, 0, 0), size=(16, 16, 1))
    dst_box = BoundingBox(start=(0, 0, 0), size=(8, 8, 1))
    out = map_utils.resample_map(m, src_box, dst_box, 1.0, 2.0)
    assert out.shape == (2, 1, 8, 8)
    np.testing.assert_allclose(out, 7.0, atol=1e-4)

  def test_upsample_linear_field(self):
    y, x = np.mgrid[:8, :8].astype(np.float32)
    m = np.stack([x, y])[:, np.newaxis]
    src_box = BoundingBox(start=(0, 0, 0), size=(8, 8, 1))
    dst_box = BoundingBox(start=(0, 0, 0), size=(14, 14, 1))
    out = map_utils.resample_map(m, src_box, dst_box, 2.0, 1.0)
    # Physical position p maps to value p/2 (since value = node idx = p/2).
    yy, xx = np.mgrid[:14, :14].astype(np.float32)
    np.testing.assert_allclose(out[0, 0], xx / 2.0, atol=1e-3)
    np.testing.assert_allclose(out[1, 0], yy / 2.0, atol=1e-3)

  def test_nan_poisons_support(self):
    m = np.zeros((2, 1, 8, 8), dtype=np.float32)
    m[:, :, 4, 4] = np.nan
    src_box = BoundingBox(start=(0, 0, 0), size=(8, 8, 1))
    out = map_utils.resample_map(m, src_box, src_box, 1.0, 1.0)
    assert np.isnan(out[:, 0, 4, 4]).all()
    assert np.isfinite(out[:, 0, 0, 0]).all()


class TestBoxes:

  def test_outer_box_shift(self):
    m = np.full((2, 1, 10, 10), 0.0, dtype=np.float32)
    m[0] = 20.0  # shift +20 px in x
    box = BoundingBox(start=(0, 0, 0), size=(10, 10, 1))
    ob = map_utils.outer_box(m, box, 2.0)
    # x targets range over [20, 20+9*2] = [20,38] -> node units [10,19]
    assert ob.start[0] == 10
    assert ob.end[0] >= 19

  def test_inner_box_identity(self):
    m = np.zeros((2, 1, 10, 10), dtype=np.float32)
    box = BoundingBox(start=(0, 0, 0), size=(10, 10, 1))
    ib = map_utils.inner_box(m, box, 1.0)
    np.testing.assert_array_equal(ib.start, [0, 0, 0])
    np.testing.assert_array_equal(ib.size, [10, 10, 1])


class TestMaskIrregular:

  def test_folded_region_masked(self):
    m = np.zeros((2, 10, 10), dtype=np.float32)
    # Create a fold: node (5,5) displaced left past its neighbor.
    m[0, 5, 5] = -3.0
    bad = map_utils.mask_irregular(m, stride=(1.0, 1.0), frac=0.5)
    assert bad[5, 5] or bad[5, 4]
    assert np.isnan(m[0][bad]).all()

  def test_regular_map_untouched(self):
    m = np.zeros((2, 6, 6), dtype=np.float32)
    bad = map_utils.mask_irregular(m, stride=(1.0, 1.0), frac=0.5)
    assert not bad.any()
    assert np.all(np.isfinite(m))


class TestAffineMap:

  def test_translation(self):
    matrix = np.array([[1, 0, 0, 5], [0, 1, 0, -3], [0, 0, 1, 0]],
                      dtype=np.float64)
    box = BoundingBox(start=(0, 0, 0), size=(4, 4, 2))
    m = map_utils.make_affine_map(matrix, box, 1.0)
    assert m.shape == (3, 2, 4, 4)
    np.testing.assert_allclose(m[0], 5.0)
    np.testing.assert_allclose(m[1], -3.0)
    np.testing.assert_allclose(m[2], 0.0)


class TestInvertMapFloat64:

  def test_f64_beats_f32_on_extreme_grids(self):
    # Huge absolute coordinates (stride 1e6, coords up to 2.4e7 where the
    # float32 ulp is 2 px). Affine forward map: bilinear interpolation is
    # exact, so the true inverse is known in closed form. The float64
    # path must match it to well below a pixel; float32 cannot.
    from sofima_tpu.utils.bounding_box import BoundingBox

    n, stride = 24, 1.0e6
    yi, xi = np.mgrid[:n, :n].astype(np.float64)
    px, py = xi * stride, yi * stride
    a = np.array([[0.002, -0.001], [0.0015, 0.001]])  # d = A p + b
    b = np.array([3000.0, -2000.0])
    cmap = np.zeros((2, 1, n, n), np.float32)
    cmap[0, 0] = a[0, 0] * px + a[0, 1] * py + b[0]
    cmap[1, 0] = a[1, 0] * px + a[1, 1] * py + b[1]
    box = BoundingBox(start=(0, 0, 0), size=(n, n, 1))

    # True inverse offsets at the query nodes: p = (I+A)^-1 (q - b).
    q = np.stack([px, py])  # [2, y, x], xy channels
    m = np.linalg.inv(np.eye(2) + a)
    p_true = np.einsum('ij,jyx->iyx', m, q - b[:, None, None])
    true_rel = p_true - q

    def err(dtype):
      inv = map_utils.invert_map(cmap, box, box, stride, dtype=dtype)
      d = np.abs(inv[:, 0].astype(np.float64) - true_rel)
      interior = np.s_[:, 2:-2, 2:-2]
      assert np.isfinite(d[interior]).all()
      return d[interior].mean()

    err64 = err(np.float64)
    err32 = err(np.float32)
    assert err64 < 0.01, err64
    assert err32 > 0.1, err32  # ~0.25 px in practice: 25x worse than f64

  def test_f32_default_unchanged(self):
    from sofima_tpu.utils.bounding_box import BoundingBox
    n, stride = 20, 10.0
    y, x = np.mgrid[:n, :n].astype(np.float32)
    cmap = np.zeros((2, 1, n, n), np.float32)
    cmap[0, 0] = 3.0 * np.sin(2 * np.pi * y / n)
    cmap[1, 0] = 2.0 * np.cos(2 * np.pi * x / n)
    box = BoundingBox(start=(0, 0, 0), size=(n, n, 1))
    inv32 = map_utils.invert_map(cmap, box, box, stride)
    inv64 = map_utils.invert_map(cmap, box, box, stride, dtype=np.float64)
    assert inv32.dtype == np.float32
    assert inv64.dtype == np.float64
    valid = np.isfinite(inv32[0, 0]) & np.isfinite(inv64[0, 0])
    assert valid.mean() > 0.5
    np.testing.assert_allclose(inv32[:, 0][:, valid],
                               inv64[:, 0].astype(np.float32)[:, valid],
                               atol=0.05)


class TestContractIdentities:
  """The composition identities documented as the compatibility contract
  (reference map_utils.py:46-50; README 'Data contract')."""

  def _maps(self, n):
    y, x = np.mgrid[:n, :n].astype(np.float32)
    a = np.stack([1.5 * np.sin(2 * np.pi * y / n),
                  1.0 * np.cos(2 * np.pi * x / n)])[:, np.newaxis]
    b = np.stack([-1.0 * np.cos(2 * np.pi * x / n),
                  1.2 * np.sin(2 * np.pi * y / n)])[:, np.newaxis]
    return a.astype(np.float32), b.astype(np.float32)

  def test_inverse_of_composition(self):
    # comp(a, b)^-1 == comp(b^-1, a^-1)
    n = 24
    a, b = self._maps(n)
    box = BoundingBox(start=(0, 0, 0), size=(n, n, 1))

    comp_ab = np.array(map_utils.compose_maps_fast(
        a, (0, 0), 1.0, b, (0, 0), 1.0))
    lhs = map_utils.invert_map(comp_ab, box, box, 1.0)

    a_inv = map_utils.invert_map(a, box, box, 1.0)
    b_inv = map_utils.invert_map(b, box, box, 1.0)
    rhs = np.array(map_utils.compose_maps_fast(
        np.nan_to_num(b_inv), (0, 0), 1.0,
        np.nan_to_num(a_inv), (0, 0), 1.0))

    sel = np.s_[:, :, 6:-6, 6:-6]
    assert np.isfinite(lhs[sel]).all()
    np.testing.assert_allclose(lhs[sel], rhs[sel], atol=0.1)

  def test_warp_of_composition(self):
    # warp(img, comp(a, b)) == warp(warp(img, b), a)
    from sofima_tpu import warp
    n, stride = 96, 8
    gn = n // stride
    y, x = np.mgrid[:gn, :gn].astype(np.float32)
    a = np.stack([3.0 * np.sin(2 * np.pi * y / gn),
                  2.0 * np.cos(2 * np.pi * x / gn)])[:, np.newaxis]
    b = np.stack([-2.0 * np.cos(2 * np.pi * x / gn),
                  2.5 * np.sin(2 * np.pi * y / gn)])[:, np.newaxis]
    a = a.astype(np.float32)
    b = b.astype(np.float32)

    rng = np.random.RandomState(0)
    noise = rng.rand(n, n).astype(np.float32)
    f = np.fft.rfft2(noise)
    fy = np.fft.fftfreq(n)[:, None]
    fx = np.fft.rfftfreq(n)[None, :]
    f *= np.exp(-((fx**2 + fy**2) / (2 * 0.05**2)))
    img = np.fft.irfft2(f, s=(n, n)).astype(np.float32)
    img = (img - img.min()) / np.ptp(img) * 255.0

    ibox = BoundingBox(start=(0, 0, 0), size=(n, n, 1))
    mbox = BoundingBox(start=(0, 0, 0), size=(gn, gn, 1))

    def w(image, m):
      return warp.warp_subvolume(image[np.newaxis, np.newaxis], ibox, m,
                                 mbox, stride, ibox,
                                 interpolation='linear')[0, 0]

    comp_ab = np.array(map_utils.compose_maps_fast(
        a, (0, 0), (stride, stride), b, (0, 0), (stride, stride)))
    lhs = w(img, comp_ab)
    rhs = w(w(img, b), a)

    sel = np.s_[12:-12, 12:-12]
    # rhs suffers double interpolation; identity holds to pixel noise.
    err = np.abs(lhs[sel] - rhs[sel]).mean()
    assert err < 2.0, err


class TestInvertRobustness:
  """Round-3 robustness envelope: stiff maps, folds, telemetry.

  Oracle: the reference's algorithm — scattered interpolation of the
  swapped (source, target) point sets (scipy griddata, i.e. Qhull), per
  /root/reference/map_utils.py:392-487.
  """

  def _scipy_invert(self, coord_map, stride, query_shape):
    from scipy.interpolate import griddata
    g = coord_map.shape[-1]
    ny, nx = np.mgrid[:g, :g].astype(np.float64) * stride
    tx = nx + coord_map[0, 0]
    ty = ny + coord_map[1, 0]
    pts = np.stack([ty.ravel(), tx.ravel()], -1)
    qy, qx = np.mgrid[:query_shape[0], :query_shape[1]].astype(
        np.float64) * stride
    q = np.stack([qy.ravel(), qx.ravel()], -1)
    inv_x = griddata(pts, nx.ravel(), q, method='linear').reshape(qy.shape)
    inv_y = griddata(pts, ny.ravel(), q, method='linear').reshape(qy.shape)
    out = np.stack([inv_x - qx, inv_y - qy])  # relative, xy channels
    return out[:, None]

  def test_strong_compression_recovered_by_newton(self):
    # Uniform 0.2x compression: the damped fixed point contracts at
    # ~0.95/iter (far too slow for 32 iterations over a large grid);
    # the Newton phase must still invert it.
    g, stride = 30, 40
    nx = np.arange(g, dtype=np.float32) * stride
    cm = np.zeros((2, 1, g, g), np.float32)
    cm[0] = np.broadcast_to(-0.8 * nx[None, :], (1, g, g))
    cm[1] = np.broadcast_to(-0.8 * nx[:, None], (1, g, g))
    box = BoundingBox(start=(0, 0, 0), size=(g, g, 1))
    inv = map_utils.invert_map(cm, box, box, stride)
    # Image of the map is [0, 0.2*(g-1)*stride]; interior queries there
    # must satisfy the analytic inverse x = q / 0.2.
    qx = np.arange(g, dtype=np.float32) * stride
    lim = 0.2 * (g - 1) * stride
    sel = qx < lim * 0.9
    got_abs = inv[0, 0, 0, sel] + qx[sel]
    np.testing.assert_allclose(got_abs, qx[sel] / 0.2, atol=0.5)
    # Queries beyond the image stay NaN (convex-hull semantics).
    assert np.isnan(inv[0, 0, 0, qx > lim * 1.05]).all()

  def test_near_fold_mesh_map_vs_scattered_oracle(self):
    # A mesh-like map driven to the edge of folding: high-frequency
    # sinusoid with amplitude ~0.8 * stride / (2 pi) * period... chosen
    # so min spacing ~0.1*stride (mask_irregular flags it).
    g, stride = 24, 40
    nx = np.arange(g, dtype=np.float32) * stride
    wob = 22.0  # min d(abs_x)/dx ~ 0.28 -> node spacing < 0.5*stride
    cm = np.zeros((2, 1, g, g), np.float32)
    cm[0] = np.broadcast_to(
        wob * np.sin(2 * np.pi * nx[None, :] / (4.8 * stride)),
        (1, g, g)).astype(np.float32)

    flagged = map_utils.mask_irregular(
        cm[:, 0].copy(), stride=(stride, stride), frac=0.5)
    assert flagged.any()  # genuinely near-fold

    box = BoundingBox(start=(0, 0, 0), size=(g, g, 1))
    inv = map_utils.invert_map(cm, box, box, stride)
    oracle = self._scipy_invert(cm, stride, (g, g))

    both = np.isfinite(inv[0, 0]) & np.isfinite(oracle[0, 0])
    # Away from the compression throats the two inversions agree.
    err = np.abs(inv[:, 0][:, both] - oracle[:, 0][:, both])
    frac_close = (err.max(axis=0) < 2.0).mean()
    assert frac_close > 0.9, (frac_close, err.max())
    # Coverage: the dense inversion recovers at least 90% of the area
    # the scattered oracle covers.
    cover_o = np.isfinite(oracle[0, 0]).mean()
    cover_d = np.isfinite(inv[0, 0]).mean()
    assert cover_d > 0.9 * cover_o, (cover_d, cover_o)

  def test_divergence_telemetry(self):
    from sofima_tpu.utils import metrics
    g, stride = 16, 40
    # A map whose image covers only a corner: most queries must fail.
    cm = np.full((2, 1, g, g), np.nan, np.float32)
    cm[:, :, :4, :4] = 0.0
    box = BoundingBox(start=(0, 0, 0), size=(g, g, 1))
    before = metrics.registry().get_counter('map_utils',
                                            'invert_map_sections')
    inv = map_utils.invert_map(cm, box, box, stride)
    after = metrics.registry().get_counter('map_utils',
                                           'invert_map_sections')
    assert after == before + 1
    assert np.isnan(inv[0, 0, -1, -1])

  def test_render_after_fold_fill_error_is_bounded(self):
    # render_tiles papers over failed inversions with
    # fill_missing(extrapolate); quantify that the filled values stay
    # close to the scattered oracle where THE ORACLE is defined.
    g, stride = 24, 40
    nx = np.arange(g, dtype=np.float32) * stride
    cm = np.zeros((2, 1, g, g), np.float32)
    cm[0] = np.broadcast_to(
        14.0 * np.sin(2 * np.pi * nx[None, :] / (4.8 * stride)),
        (1, g, g)).astype(np.float32)
    box = BoundingBox(start=(0, 0, 0), size=(g, g, 1))
    inv = map_utils.invert_map(cm, box, box, stride)
    filled = map_utils.fill_missing(inv, extrapolate=True)
    oracle = self._scipy_invert(cm, stride, (g, g))
    both = np.isfinite(oracle[0, 0]) & np.isfinite(filled[0, 0])
    err = np.abs(filled[:, 0][:, both] - oracle[:, 0][:, both]).max(0)
    # Mean fill error within a node spacing; document the envelope.
    assert err.mean() < stride / 2, err.mean()

  def test_3d_strong_compression_recovered_by_newton(self):
    # 3d twin of the strong-compression test: uniform 0.15x compression
    # on every axis (det J = 0.003 — past the old 2d det gate, inside
    # the dim-consistent 3d one). The damped fixed point contracts far
    # too slowly; the 3d Newton phase (sampled 3x3 Jacobian, adjugate
    # solve) must invert it — the reference's scattered inversion is
    # dim-generic (/root/reference/map_utils.py:392-487), so must this
    # rescue be.
    g, stride = 16, 40
    n1 = np.arange(g, dtype=np.float32) * stride
    cm = np.zeros((3, g, g, g), np.float32)
    cm[0] = np.broadcast_to(-0.85 * n1[None, None, :], (g, g, g))
    cm[1] = np.broadcast_to(-0.85 * n1[None, :, None], (g, g, g))
    cm[2] = np.broadcast_to(-0.85 * n1[:, None, None], (g, g, g))
    box = BoundingBox(start=(0, 0, 0), size=(g, g, g))
    inv = map_utils.invert_map(cm, box, box, stride)
    # Interior queries (inside the compressed image) must satisfy the
    # analytic inverse x = q / 0.15.
    lim = 0.15 * (g - 1) * stride
    sel = n1 < lim * 0.9
    got_abs = inv[0][np.ix_(sel, sel, sel)] + n1[None, None, sel]
    want = np.broadcast_to(n1[None, None, sel] / 0.15, got_abs.shape)
    np.testing.assert_allclose(got_abs, want, atol=0.5)
    # Queries beyond the image stay NaN (convex-hull semantics).
    far = n1 > lim * 1.05
    assert np.isnan(inv[0][np.ix_(far, far, far)]).all()
    # Without Newton, the fixed point alone must NOT have converged
    # (this is what makes the rescue a real capability, not a no-op).
    absm = map_utils.to_absolute(cm, (stride,) * 3, box)
    qz, qy, qx = np.mgrid[:g, :g, :g].astype(np.float32) * stride
    query = jnp.asarray(np.stack([qx, qy, qz]))
    z3 = jnp.zeros(3, jnp.float32)
    s3 = jnp.full((3,), float(stride), jnp.float32)
    no_newton = np.asarray(map_utils._invert_section(
        jnp.asarray(absm), z3, query, s3, newton_iters=0))
    assert np.isnan(no_newton[0][np.ix_(sel, sel, sel)]).mean() > 0.5

  def test_3d_sinusoid_vs_scattered_oracle(self):
    # Dim-generic parity: a stiff (but invertible) 3d sinusoidal map vs
    # the reference's algorithm (scattered interpolation of swapped
    # point sets, scipy griddata / 3d Qhull).
    from scipy.interpolate import griddata
    g, stride = 10, 40
    n1 = np.arange(g, dtype=np.float64) * stride
    zz, yy, xx = np.meshgrid(n1, n1, n1, indexing='ij')
    cm = np.zeros((3, g, g, g), np.float32)
    wob = 18.0  # |d(abs)/dx| down to ~0.3: stiff for the fixed point
    cm[0] = wob * np.sin(2 * np.pi * xx / (4.0 * stride))
    cm[2] = wob * np.cos(2 * np.pi * zz / (4.0 * stride))
    box = BoundingBox(start=(0, 0, 0), size=(g, g, g))
    inv = map_utils.invert_map(cm, box, box, stride)

    tx = xx + cm[0]
    ty = yy + cm[1]
    tz = zz + cm[2]
    pts = np.stack([tz.ravel(), ty.ravel(), tx.ravel()], -1)
    q = np.stack([zz.ravel(), yy.ravel(), xx.ravel()], -1)
    oracle = np.stack([
        griddata(pts, xx.ravel(), q, method='linear').reshape(zz.shape)
        - xx,
        griddata(pts, yy.ravel(), q, method='linear').reshape(zz.shape)
        - yy,
        griddata(pts, zz.ravel(), q, method='linear').reshape(zz.shape)
        - zz,
    ])
    both = np.isfinite(inv[0]) & np.isfinite(oracle[0])
    assert both.mean() > 0.5  # the comparison covers real area
    err = np.abs(inv[:, both] - oracle[:, both])
    frac_close = (err.max(axis=0) < 2.0).mean()
    assert frac_close > 0.9, (frac_close, float(err.max()))
    cover_o = np.isfinite(oracle[0]).mean()
    cover_d = np.isfinite(inv[0]).mean()
    assert cover_d > 0.9 * cover_o, (cover_d, cover_o)

  def test_shift_sampler_matches_gather_invert(self):
    # The gather-free fixed-point sampler (shift_bound) must reproduce
    # the gather-based inversion bit-for-bit-ish, including NaN
    # semantics at the grid boundary.
    rng = np.random.RandomState(3)
    g, stride = 20, 40
    cm = (rng.randn(2, 1, g, g) * 4).astype(np.float32)
    import jax.numpy as jnp
    from scipy.ndimage import gaussian_filter
    cm = gaussian_filter(cm, (0, 0, 2, 2)).astype(np.float32)
    node = jnp.arange(g, dtype=jnp.float32) * stride
    qx = jnp.broadcast_to(node[None, :], (g, g))
    qy = jnp.broadcast_to(node[:, None], (g, g))
    query = jnp.stack([qx, qy])
    absm = jnp.asarray(cm[:, 0]) + query
    z2 = jnp.zeros(2, jnp.float32)
    s2 = jnp.full((2,), float(stride), jnp.float32)
    ref = np.asarray(map_utils._invert_section(absm, z2, query, s2))
    got = np.asarray(map_utils._invert_section(absm, z2, query, s2,
                                               shift_bound=2))
    np.testing.assert_array_equal(np.isnan(ref), np.isnan(got))
    np.testing.assert_allclose(np.nan_to_num(got), np.nan_to_num(ref),
                               atol=1e-3)
