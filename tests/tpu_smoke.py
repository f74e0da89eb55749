"""Hardware smoke suite: every Pallas kernel on the REAL chip vs XLA.

The CPU test suite runs Pallas kernels in interpreter mode, which does
NOT enforce Mosaic's lowering rules (scalar stores, SMEM/ANY block
constraints, DMA alignment, batching of ANY operands) — all of which
have produced hardware-only failures. This module re-validates each
kernel's numerics on the actual TPU against its XLA twin.

Run directly on a TPU host:   python tests/tpu_smoke.py
Under pytest it auto-skips unless a TPU backend is present.
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np
import pytest


def _on_tpu():
  import jax
  return jax.default_backend() in ('tpu', 'axon')


pytestmark = pytest.mark.skipif(
    'pytest' in sys.modules and not _on_tpu(),
    reason='requires a real TPU backend')


def _texture(n, seed=0):
  rng = np.random.RandomState(seed)
  noise = rng.rand(n, n).astype(np.float32)
  f = np.fft.rfft2(noise)
  fy = np.fft.fftfreq(n)[:, None]
  fx = np.fft.rfftfreq(n)[None, :]
  f *= np.exp(-((fx**2 + fy**2) / (2 * 0.08**2)))
  tex = np.fft.irfft2(f, s=(n, n))
  return ((tex - tex.min()) / np.ptp(tex) * 255).astype(np.float32)


def check_dense_flow():
  import jax.numpy as jnp
  from sofima_tpu import flow_field
  pre = _texture(520)
  post = np.roll(pre, (3, -5), (0, 1))
  got = np.asarray(flow_field.dense_flow_field(
      jnp.asarray(pre), jnp.asarray(post), (160, 160), (40, 40),
      circular=True, dft_matmul=True))
  ref = np.asarray(flow_field._dense_flow_strips(
      jnp.asarray(pre), jnp.asarray(post), (160, 160), (40, 40), None,
      2, 0.5, 5, rows_per_step=2, dft_matmul=True, use_pallas=False))
  # Integer peaks + peak ratio: exact. Sharpness divides by the window
  # MINIMUM of the correlation surface — near (and crossing) zero on a
  # pure-shift pair, so MXU-vs-XLA accumulation-order noise is amplified
  # arbitrarily; the meaningful contract is the clean_flow quality gate,
  # which may only disagree where the value itself is borderline.
  np.testing.assert_array_equal(np.nan_to_num(got[:2], nan=9e9),
                                np.nan_to_num(ref[:2], nan=9e9))
  np.testing.assert_allclose(got[3], ref[3], rtol=1e-3, atol=1e-3,
                             equal_nan=True)
  gate_got = np.nan_to_num(np.abs(got[2])) >= 1.6
  gate_ref = np.nan_to_num(np.abs(ref[2])) >= 1.6
  borderline = np.abs(np.nan_to_num(np.abs(ref[2])) - 1.6) < 0.3
  assert ((gate_got == gate_ref) | borderline).all()
  print('dense flow (grid kernel): OK')


def check_dense_flow_masked():
  import jax.numpy as jnp
  from sofima_tpu import flow_field
  pre = _texture(520)
  post = np.roll(pre, (3, -5), (0, 1)).copy()
  rng = np.random.RandomState(1)
  post[:140, :140] = rng.rand(140, 140) * 255
  pre_mask = np.zeros((520, 520), bool)
  pre_mask[400:, :] = True
  post_mask = np.zeros((520, 520), bool)
  post_mask[:140, :140] = True
  got = np.asarray(flow_field.dense_flow_field(
      jnp.asarray(pre), jnp.asarray(post), (160, 160), (40, 40),
      circular=True, dft_matmul=True,
      pre_mask=jnp.asarray(pre_mask), post_mask=jnp.asarray(post_mask)))
  # Whole-grid batch -> the reference's batch-global overlap threshold
  # equals the kernel's deterministic patch-area rule.
  ref = np.asarray(flow_field._dense_flow_strips(
      jnp.asarray(pre), jnp.asarray(post), (160, 160), (40, 40), None,
      2, 0.5, 5, rows_per_step=10, dft_matmul=True, use_pallas=False,
      pre_mask=jnp.asarray(pre_mask), post_mask=jnp.asarray(post_mask)))
  np.testing.assert_array_equal(np.nan_to_num(got[:2], nan=9e9),
                                np.nan_to_num(ref[:2], nan=9e9))
  print('masked dense flow (Padfield NCC kernel): OK')


def check_flow_vmap():
  import jax
  import jax.numpy as jnp
  from sofima_tpu import flow_field
  rng = np.random.RandomState(0)
  a = jnp.asarray((rng.rand(2, 360, 360) * 255).astype(np.float32))
  b = jnp.roll(a, (0, 4, -6), (0, 1, 2))
  out = np.asarray(jax.vmap(lambda x, y: flow_field.dense_flow_field(
      x, y, (160, 160), (40, 40), circular=True, dft_matmul=True))(a, b))
  single = np.asarray(flow_field.dense_flow_field(
      a[0], b[0], (160, 160), (40, 40), circular=True, dft_matmul=True))
  np.testing.assert_allclose(out[0], single, atol=2e-3, equal_nan=True)
  print('vmapped dense flow (custom_vmap rule): OK')


def check_warp_2d():
  import jax.numpy as jnp
  from sofima_tpu.ops import interp, pallas_warp, shift_warp
  img = _texture(640, seed=2)
  stride = 20
  g = 640 // stride
  my, mx = np.mgrid[:g, :g].astype(np.float32)
  dxn = -6.0 + 5.0 * np.sin(2 * np.pi * my / 12)
  dyn = 4.0 + 5.0 * np.cos(2 * np.pi * mx / 12)
  abs_map = jnp.asarray(np.stack([dxn + mx * stride, dyn + my * stride]))
  dense = interp.upsample_map_linear(abs_map, stride, (0, 0), (600, 600))
  coords = jnp.stack([dense[1], dense[0]])[None]
  bounds = shift_warp.displacement_bounds(np.asarray(abs_map), None,
                                          stride)
  got = np.asarray(pallas_warp.pallas_shift_warp(
      jnp.asarray(img)[None], coords, 'lanczos', *bounds))[0]
  ref = np.asarray(shift_warp.shift_warp_2d(
      jnp.asarray(img), coords[0], 'lanczos', *bounds))
  np.testing.assert_allclose(got, ref, atol=1e-3)
  print('2d shift warp (VMEM-tile kernel): OK')

  plan = shift_warp.tiled_shift_plan(
      dyn[None], dxn[None], my[:, 0] * stride, mx[0] * stride,
      (600, 600), tile=(64, 128))
  got_t = np.asarray(pallas_warp.pallas_shift_warp_tiled(
      jnp.asarray(img)[None], coords, jnp.asarray(plan['bases']),
      'lanczos', *plan['residual_bounds'], *plan['base_bounds'],
      *plan['tile']))[0]
  np.testing.assert_allclose(got_t, ref, atol=1e-3)
  print('tiled shift warp (per-tile bases, dynamic rolls): OK')


def check_warp_3d():
  import jax.numpy as jnp
  from sofima_tpu.ops import pallas_warp, shift_warp
  rng = np.random.RandomState(3)
  vol = rng.rand(20, 72, 300).astype(np.float32)
  zz, yy, xx = np.mgrid[0:16, 0:64, 0:280].astype(np.float32)
  coords = np.stack([
      zz + 1.5 * np.sin(2 * np.pi * yy / 64) + 2.0,
      yy + 3.0 * np.cos(2 * np.pi * xx / 128) - 1.0,
      xx + 2.5 * np.sin(2 * np.pi * zz / 16) + 0.5,
  ])
  bounds = (-1, 4, -5, 3, -2, 4)
  got = np.asarray(pallas_warp.pallas_shift_warp_3d(
      jnp.asarray(vol), jnp.asarray(coords), 'linear', *bounds,
      origin_z=1, origin_y=2, origin_x=0))
  ref = np.asarray(shift_warp.shift_warp_3d(
      jnp.asarray(vol), jnp.asarray(coords), 'linear', *bounds,
      origin_z=1, origin_y=2, origin_x=0))
  np.testing.assert_allclose(got, ref, atol=1e-4)
  print('3d shift warp (VMEM-tile kernel): OK')


def check_mesh_force():
  import jax.numpy as jnp
  from sofima_tpu import mesh
  from sofima_tpu.ops import pallas_mesh
  rng = np.random.RandomState(4)
  x = jnp.asarray(rng.randn(2, 1, 256, 384).astype(np.float32))
  force = pallas_mesh.make_inplane_force(tile=128)
  got = np.asarray(force(x, k=0.1, stride=(40.0, 40.0)))
  ref = np.asarray(mesh.inplane_force(x, k=0.1, stride=(40.0, 40.0)))
  np.testing.assert_allclose(got, ref, atol=1e-4)
  print('mesh in-plane force (Pallas stencil): OK')


def check_sharded_flow():
  import jax.numpy as jnp
  from sofima_tpu import flow_field
  from sofima_tpu.parallel import mesh_sharding
  dmesh = mesh_sharding.make_mesh(1)
  pre = _texture(360, seed=5)
  post = np.roll(pre, (2, -4), (0, 1))
  got = np.asarray(mesh_sharding.dense_flow_field_sharded(
      dmesh, pre, post, (160, 160), (40, 40), batch_size=64,
      circular=True, dft_matmul=True))
  ref = np.asarray(flow_field.dense_flow_field(
      jnp.asarray(pre), jnp.asarray(post), (160, 160), (40, 40),
      circular=True, dft_matmul=True))
  np.testing.assert_allclose(got, ref, atol=2e-3, equal_nan=True)
  print('dense flow under shard_map: OK')


def check_targeted_flow():
  """Round-3: grid kernel with per-window integer post offsets."""
  import jax.numpy as jnp
  from sofima_tpu import flow_field
  pre = _texture(520, seed=6)
  post = np.roll(pre, (23, -31), (0, 1))
  out = np.asarray(flow_field.coarse_to_fine_flow(
      jnp.asarray(pre), jnp.asarray(post)))
  ref = np.asarray(flow_field.dense_flow_field(
      jnp.asarray(pre), jnp.asarray(post), (160, 160), (40, 40),
      batch_size=64, circular=True, dft_matmul=True))
  sl = np.s_[1:-1, 1:-1]
  agree = np.nanmean((np.abs(out[0][sl] - ref[0][sl]) <= 1.0)
                     & (np.abs(out[1][sl] - ref[1][sl]) <= 1.0))
  assert agree > 0.97, agree
  print('coarse-to-fine targeted flow: OK')


def check_fused_fire_solver():
  """Round-3: whole FIRE convergence loop in one kernel launch."""
  import jax.numpy as jnp
  from sofima_tpu import mesh
  from sofima_tpu.ops import pallas_mesh
  rng = np.random.RandomState(7)
  g = 48
  prev = np.full((2, 1, g, g), np.nan, np.float32)
  prev[:, :, 2:-2, 2:-2] = rng.randn(2, 1, g - 4, g - 4).astype(
      np.float32) * 3
  cfg = mesh.IntegrationConfig(
      dt=0.001, gamma=0.0, k0=0.1, k=0.1, stride=(40.0, 40.0),
      num_iters=200, max_iters=2000, stop_v_max=0.005, dt_max=100.0,
      start_cap=0.01, final_cap=10.0, cap_scale=1.1,
      prefer_orig_order=True)
  x0 = jnp.zeros_like(jnp.asarray(prev))
  ref, _, _ = mesh.relax_mesh_fused(x0, jnp.asarray(prev), cfg)
  got, _, steps = pallas_mesh.relax_mesh_fused_pallas(
      x0, jnp.asarray(prev), cfg)
  assert int(steps) > 0
  d = float(np.nanmax(np.abs(np.asarray(ref) - np.asarray(got))))
  assert d < 1e-2, d
  print('fused FIRE solver kernel: OK')


def check_pruned_warp_lowering():
  """tile_bounds pruning is default-off (slow) but must stay CORRECT."""
  import jax.numpy as jnp
  from sofima_tpu.ops import interp, pallas_warp, shift_warp
  rng = np.random.RandomState(8)
  n, stride = 700, 40
  img = rng.rand(1, n, n).astype(np.float32) * 255
  grid_n = n // stride + 1
  my, mx = np.mgrid[:grid_n, :grid_n].astype(np.float32)
  dx = -12.0 + 12 * np.sin(2 * np.pi * my / 20)
  dy = 7.0 + 12 * np.cos(2 * np.pi * mx / 20)
  amap = np.zeros((2, grid_n, grid_n), np.float32)
  amap[0] = dx + mx * stride
  amap[1] = dy + my * stride
  node = np.arange(grid_n, dtype=np.float64) * stride
  plan = shift_warp.tiled_shift_plan(dy[None], dx[None], node, node,
                                     (n, n))
  dense = interp.upsample_map_linear(jnp.asarray(amap), stride, (0, 0),
                                     (n, n))
  coords = jnp.stack([dense[1], dense[0]])[None]
  args = (jnp.asarray(img), coords, jnp.asarray(plan['bases']),
          'lanczos', *plan['residual_bounds'], *plan['base_bounds'],
          *plan['tile'])
  ref = np.asarray(pallas_warp.pallas_shift_warp_tiled(*args))
  got = np.asarray(pallas_warp.pallas_shift_warp_tiled(
      *args, tile_bounds=jnp.asarray(plan['tile_bounds'])))
  np.testing.assert_allclose(got, ref, atol=5e-3)
  print('pruned tiled warp lowering: OK')


def check_pipeline_step():
  """One fused align_step on a small section pair."""
  import jax.numpy as jnp
  from sofima_tpu.pipeline import stack_align
  pre = _texture(800, seed=9)
  post = np.roll(pre, (9, -6), (0, 1))
  cfg = stack_align.StackAlignConfig(max_displacement=64, residual=8)
  solved0 = jnp.zeros((2, 1, 800 // 40, 800 // 40), jnp.float32)
  solved, rendered, overflow = stack_align.align_step(
      jnp.asarray(pre.astype(np.uint8)),
      jnp.asarray(post.astype(np.uint8)), solved0, cfg)
  assert not bool(overflow)
  err = float(np.mean(np.abs(
      np.asarray(rendered)[160:-160, 160:-160]
      - pre[160:-160, 160:-160])))
  assert err < 4.0, err
  print('fused pipeline align_step: OK')


CHECKS = [check_dense_flow, check_dense_flow_masked, check_flow_vmap,
          check_warp_2d, check_warp_3d, check_mesh_force,
          check_sharded_flow, check_targeted_flow,
          check_fused_fire_solver, check_pruned_warp_lowering,
          check_pipeline_step]


@pytest.mark.parametrize('check', CHECKS, ids=lambda c: c.__name__)
def test_tpu_smoke(check):
  check()


def main():
  import jax
  try:
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(__file__), '..',
                                   '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
  except Exception:
    pass
  if not _on_tpu():
    print('no TPU backend — nothing to smoke-test')
    return 1
  failed = []
  for check in CHECKS:
    try:
      check()
    except Exception as e:  # noqa: BLE001 - report and continue
      failed.append((check.__name__, e))
      print(f'{check.__name__}: FAILED {type(e).__name__}: {e}')
  print(f'{len(CHECKS) - len(failed)}/{len(CHECKS)} hardware checks '
        'passed')
  return 1 if failed else 0


if __name__ == '__main__':
  sys.exit(main())
