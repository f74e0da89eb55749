"""End-to-end 2d tile montage stitching on synthetic data.

Mirrors the reference's em_stitching workflow (SURVEY.md §3.4):

  1. COARSE  compute_coarse_offsets over all NN tile pairs
  2. PLACE   optimize_coarse_mesh (tile-level spring solve)
  3. FINE    compute_flow_map over tile overlaps
  4. PACK    aggregate_arrays
  5. SOLVE   relax_mesh with vmap(compute_target_mesh) as prev_fn
  6. RENDER  render_tiles

Success criterion: the rendered montage matches the source image from
which the tiles were cut (modulo the solver's global-translation gauge).

Run:  python examples/e2e_stitching.py [--grid 3] [--tile 200] [--cpu]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def make_texture(n, seed=0, sigma=0.1):
  rng = np.random.RandomState(seed)
  noise = rng.rand(n, n).astype(np.float32)
  f = np.fft.rfft2(noise)
  fy = np.fft.fftfreq(n)[:, None]
  fx = np.fft.rfftfreq(n)[None, :]
  f *= np.exp(-((fx**2 + fy**2) / (2 * sigma**2)))
  tex = np.fft.irfft2(f, s=(n, n))
  tex = (tex - tex.min()) / np.ptp(tex)
  return (tex * 255).astype(np.uint8)


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--grid', type=int, default=3)
  parser.add_argument('--tile', type=int, default=200)
  parser.add_argument('--overlap', type=int, default=60)
  parser.add_argument('--cpu', action='store_true')
  args = parser.parse_args()

  if args.cpu:
    import jax
    jax.config.update('jax_platforms', 'cpu')

  import jax
  import jax.numpy as jnp
  from sofima_tpu import mesh, stitch_elastic, stitch_rigid, warp

  grid, tile, overlap = args.grid, args.tile, args.overlap
  step = tile - overlap
  n = step * (grid - 1) + tile
  img = make_texture(n, seed=5)
  tiles = {}
  for ty in range(grid):
    for tx in range(grid):
      tiles[(tx, ty)] = img[ty * step:ty * step + tile,
                            tx * step:tx * step + tile]
  print(f'[stitch] {grid}x{grid} tiles of {tile}px, overlap {overlap}px '
        f'-> montage {n}px')

  t0 = time.time()
  ov = (overlap + 5, overlap + 15)
  cx, cy = stitch_rigid.compute_coarse_offsets(
      (grid, grid), tiles, overlaps_xy=(ov, ov), min_overlap=10)
  cx = stitch_rigid.interpolate_missing_offsets(cx, axis=-1)
  cy = stitch_rigid.interpolate_missing_offsets(cy, axis=-2)
  print(f'[stitch] coarse offsets: {time.time() - t0:.1f}s '
        f'(median x-offset {np.nanmedian(cx[0]):.1f})')

  coarse = stitch_rigid.optimize_coarse_mesh(cx, cy)

  stride = (20, 20)
  t0 = time.time()
  fine_x, off_x = stitch_elastic.compute_flow_map(
      tiles, cx[:, 0], axis=0, patch_size=(40, 40), stride=stride,
      batch_size=64)
  fine_y, off_y = stitch_elastic.compute_flow_map(
      tiles, cy[:, 0], axis=1, patch_size=(40, 40), stride=stride,
      batch_size=64)
  print(f'[stitch] fine flow: {len(fine_x)}+{len(fine_y)} pairs, '
        f'{time.time() - t0:.1f}s')

  coords = list(tiles.keys())
  fx, fy, x0, nbors, key_to_idx = stitch_elastic.aggregate_arrays(
      (cx[:, 0], fine_x, off_x), (cy[:, 0], fine_y, off_y), coords,
      coarse[:, 0], stride, tile_shape=(tile, tile))

  nbors_j = jnp.asarray(nbors)
  fx_j = jnp.asarray(fx)
  fy_j = jnp.asarray(fy)

  def prev_fn(x):
    tgt = jax.vmap(functools.partial(
        stitch_elastic.compute_target_mesh, x=x, fx=fx_j, fy=fy_j,
        stride=stride))(nbors_j)
    return jnp.moveaxis(tgt, 0, 1)

  cfg = mesh.IntegrationConfig(
      dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=stride, num_iters=400,
      max_iters=20000, stop_v_max=0.005, dt_max=100.0)
  t0 = time.time()
  solved, _, steps = mesh.relax_mesh(jnp.asarray(x0), None, cfg,
                                     prev_fn=prev_fn)
  solved = np.asarray(solved)
  print(f'[stitch] elastic solve: {int(steps)} steps, '
        f'{time.time() - t0:.1f}s')

  t0 = time.time()
  maps = {k: solved[:, i:i + 1] for k, i in key_to_idx.items()}
  canvas, mask = warp.render_tiles(tiles, maps, stride=stride, margin=4)
  print(f'[stitch] render: {time.time() - t0:.1f}s')

  # Compare modulo the global gauge translation.
  sx = int(round(solved[0, key_to_idx[(0, 0)], 0, 0]))
  sy = int(round(solved[1, key_to_idx[(0, 0)], 0, 0]))
  lo, hi = tile // 4, n - tile // 4
  c = canvas[lo + sy:hi + sy, lo + sx:hi + sx].astype(np.float32)
  m = mask[lo + sy:hi + sy, lo + sx:hi + sx]
  t = img[lo:hi, lo:hi].astype(np.float32)
  err = np.abs(c - t)[m].mean()
  cover = m.mean()
  print(f'[stitch] montage vs source: mean |err|={err:.2f} '
        f'(coverage {cover:.2%})')
  ok = err < 10.0 and cover > 0.95
  print('[stitch]', 'PASS' if ok else 'FAIL')
  return 0 if ok else 1


if __name__ == '__main__':
  sys.exit(main())
