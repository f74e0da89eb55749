"""End-to-end 3d volumetric tile stitching (LICONN-style recipe).

Mirrors the reference's liconn_inplane_stitching workflow (SURVEY.md
§3.4) on synthetic data: two overlapping 3d tiles cut from one volume,
3d fine flow over the overlap, joint 3d elastic mesh solve with
virtual-spring coupling, npz mesh exchange, and distance-weighted
3d rendering via StitchAndRender3dTiles.

Run:  python examples/e2e_stitching3d.py [--cpu]
"""

import argparse
import functools
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def make_volume(shape_zyx, seed=0):
  rng = np.random.RandomState(seed)
  noise = rng.rand(*shape_zyx).astype(np.float32)
  f = np.fft.rfftn(noise, axes=(0, 1, 2))
  freqs = np.meshgrid(*[np.fft.fftfreq(s) for s in shape_zyx[:-1]]
                      + [np.fft.rfftfreq(shape_zyx[-1])], indexing='ij')
  f *= np.exp(-sum(fr**2 for fr in freqs) / (2 * 0.12**2))
  vol = np.fft.irfftn(f, s=shape_zyx, axes=(0, 1, 2))
  vol = (vol - vol.min()) / np.ptp(vol)
  return (vol * 255).astype(np.float32)


class Tile:

  def __init__(self, data_zyx):
    self.data = data_zyx[np.newaxis]
    self.shape = data_zyx.shape

  def __getitem__(self, sel):
    return self.data[sel]


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--cpu', action='store_true')
  args = parser.parse_args()
  if args.cpu:
    import jax
    jax.config.update('jax_platforms', 'cpu')

  import jax
  import jax.numpy as jnp
  from sofima_tpu import mesh, stitch_elastic
  from sofima_tpu.processor import warp as warp_proc
  from sofima_tpu.utils import checkpoint
  from sofima_tpu.utils.bounding_box import BoundingBox
  from sofima_tpu.utils.subvolume import Subvolume

  overlap = 16
  vol = make_volume((24, 48, 80), seed=3)
  t0_data = vol[:, :, :48]
  t1_data = vol[:, :, 32:]
  tile_map = {(0, 0): Tile(t0_data), (1, 0): Tile(t1_data)}
  stride = (8, 8, 8)
  print('[3d] two 48x48x24 tiles, 16 px x-overlap')

  cx = np.full((3, 1, 1, 2), np.nan)
  cx[:, 0, 0, 0] = (-overlap, 0, 0)
  cy = np.full((3, 1, 1, 2), np.nan)

  t0 = time.time()
  flows_x, off_x = stitch_elastic.compute_flow_map3d(
      tile_map, tile_shape=(48, 48, 24), offset_map=cx, axis=0,
      patch_size=(16, 16, 16), stride=stride, batch_size=8)
  print(f'[3d] fine 3d flow: {time.time() - t0:.1f}s')

  coarse = np.zeros((3, 1, 1, 2), np.float32)
  coarse[0, 0, 0, 1] = -overlap

  fx, fy, x0, nbors, key_to_idx = stitch_elastic.aggregate_arrays(
      (cx[:, 0], flows_x, off_x), (cy[:, 0], {}, {}),
      list(tile_map.keys()), coarse[:, 0], stride, tile_shape=(24, 48, 48))

  fx_j, fy_j, nbors_j = jnp.asarray(fx), jnp.asarray(fy), jnp.asarray(nbors)

  def prev_fn(x):
    tgt = jax.vmap(functools.partial(
        stitch_elastic.compute_target_mesh, x=x, fx=fx_j, fy=fy_j,
        stride=stride))(nbors_j)
    return jnp.moveaxis(tgt, 0, 1)

  cfg = mesh.IntegrationConfig(
      dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=stride, num_iters=200,
      max_iters=5000, stop_v_max=0.01, dt_max=100.0)
  t0 = time.time()
  solved, _, steps = mesh.relax_mesh(jnp.asarray(x0), None, cfg,
                                     prev_fn=prev_fn,
                                     mesh_force=mesh.elastic_mesh_3d)
  solved = np.asarray(solved)
  print(f'[3d] joint 3d solve: {int(steps)} steps, {time.time() - t0:.1f}s')

  with tempfile.TemporaryDirectory() as tmp:
    mesh_path = os.path.join(tmp, 'meshes.npz')
    checkpoint.save_mesh_npz(mesh_path, solved, key_to_idx)

    class Render(warp_proc.StitchAndRender3dTiles):

      def _open_tile_volume(self, tile_id):
        return {0: t0_data, 1: t1_data}[tile_id]

    warp_proc.StitchAndRender3dTiles._tile_meshes = None
    warp_proc.StitchAndRender3dTiles._tile_boxes = {}
    warp_proc.StitchAndRender3dTiles._inverted_meshes = {}

    proc = Render(tile_map=[[0, 1]], tile_mesh_path=mesh_path,
                  stride=stride, margin=2, work_size=(64, 64, 32))
    out_box = BoundingBox(start=(0, 8, 4), size=(72, 32, 12))
    t0 = time.time()
    sv = Subvolume(np.zeros((1,) + tuple(out_box.size[::-1]), np.float32),
                   out_box)
    rendered = proc.process(sv).data[0]
    print(f'[3d] render: {time.time() - t0:.1f}s')

  mask = rendered > 0
  truth = vol[4:16, 8:40, 0:72]
  err = np.abs(rendered - truth)[mask].mean()
  rel = err / truth.std()
  print(f'[3d] montage vs source: rel err={rel:.3f} '
        f'(coverage {mask.mean():.1%})')
  ok = rel < 0.8 and mask.mean() > 0.5
  print('[3d]', 'PASS' if ok else 'FAIL')
  return 0 if ok else 1


if __name__ == '__main__':
  sys.exit(main())
