"""Per-phase timing of the stitch3d bench scenario only (the montage2d
half of probe_scenarios_r5 already ran: coarse 106 / fine 18 / solve 7 /
render 93 s warm). Finds where stitch3d's >4250 s went.
"""

import functools
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, '/root/repo')


def main():
  import jax
  try:
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
  except Exception:
    pass
  import jax.numpy as jnp
  from sofima_tpu import mesh, stitch_elastic

  results = {}
  t_all = time.perf_counter()

  def tick(label, t0):
    dt = time.perf_counter() - t0
    results[label] = round(dt, 2)
    print(f'[probe +{time.perf_counter() - t_all:7.1f}s] {label}: '
          f'{dt:.2f}s', flush=True)
    with open('/tmp/probe_stitch3d_r5.json', 'w') as fh:
      json.dump(results, fh, indent=1)
    return time.perf_counter()

  from sofima_tpu.processor import warp as warp_proc
  from sofima_tpu.utils import checkpoint as ckpt
  from sofima_tpu.utils.bounding_box import BoundingBox as BBox3
  from sofima_tpu.utils.subvolume import Subvolume as Subvol3

  zdim, tile_yx, overlap3 = 64, 576, 64
  step3t = tile_yx - overlap3
  n3 = step3t + tile_yx
  rng3 = np.random.RandomState(9)
  noise3 = rng3.rand(zdim, n3, n3).astype(np.float32)
  f3d = np.fft.rfftn(noise3)
  fz = np.fft.fftfreq(zdim)[:, None, None]
  fy3 = np.fft.fftfreq(n3)[None, :, None]
  fx3 = np.fft.rfftfreq(n3)[None, None, :]
  f3d *= np.exp(-((fx3**2 + fy3**2 + fz**2) / (2 * 0.12**2)))
  vol3 = np.fft.irfftn(f3d, s=(zdim, n3, n3)).astype(np.float32)
  vol3 = (vol3 - vol3.min()) / np.ptp(vol3) * 255.0
  del noise3, f3d

  class _Tile:
    def __init__(self, data_zyx):
      self.data = np.ascontiguousarray(data_zyx)[np.newaxis]
      self.shape = data_zyx.shape

    def __getitem__(self, sel):
      return self.data[sel]

  tile_map = {}
  for ty in range(2):
    for tx in range(2):
      tile_map[(tx, ty)] = _Tile(
          vol3[:, ty * step3t:ty * step3t + tile_yx,
               tx * step3t:tx * step3t + tile_yx])
  stride3 = (16, 16, 16)
  patch3s = (32, 32, 32)
  cfg_s3 = mesh.IntegrationConfig(
      dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=stride3,
      num_iters=400, max_iters=10000, stop_v_max=0.005, dt_max=100.0)
  out_box = BBox3(start=(16, 16, 8), size=(n3 - 32, n3 - 32, zdim - 16))
  t0 = tick('setup', t_all)

  def s3_flow():
    cx3 = np.full((3, 1, 2, 2), np.nan)
    cx3[0, 0, :, 0] = -overlap3
    cx3[1, 0, :, 0] = 0.0
    cx3[2, 0, :, 0] = 0.0
    cy3 = np.full((3, 1, 2, 2), np.nan)
    cy3[0, 0, 0, :] = 0.0
    cy3[1, 0, 0, :] = -overlap3
    cy3[2, 0, 0, :] = 0.0
    flows_x, off_x = stitch_elastic.compute_flow_map3d(
        tile_map, tile_shape=(tile_yx, tile_yx, zdim), offset_map=cx3,
        axis=0, patch_size=patch3s, stride=stride3, batch_size=64)
    flows_y, off_y = stitch_elastic.compute_flow_map3d(
        tile_map, tile_shape=(tile_yx, tile_yx, zdim), offset_map=cy3,
        axis=1, patch_size=patch3s, stride=stride3, batch_size=64)
    return cx3, cy3, flows_x, off_x, flows_y, off_y

  def s3_solve(cx3, cy3, flows_x, off_x, flows_y, off_y):
    coarse3 = np.zeros((3, 1, 2, 2), np.float32)
    for ty in range(2):
      for tx in range(2):
        coarse3[0, 0, ty, tx] = -overlap3 * tx
        coarse3[1, 0, ty, tx] = -overlap3 * ty
    fx_a, fy_a, x0, nbors, key_to_idx = stitch_elastic.aggregate_arrays(
        (cx3[:, 0], flows_x, off_x), (cy3[:, 0], flows_y, off_y),
        list(tile_map.keys()), coarse3[:, 0], stride3,
        tile_shape=(zdim, tile_yx, tile_yx))
    fx_j, fy_j = jnp.asarray(fx_a), jnp.asarray(fy_a)
    nbors_j = jnp.asarray(nbors)

    def prev_fn(x):
      tgt = jax.vmap(functools.partial(
          stitch_elastic.compute_target_mesh, x=x, fx=fx_j, fy=fy_j,
          stride=stride3))(nbors_j)
      return jnp.moveaxis(tgt, 0, 1)

    solved, _, steps = mesh.relax_mesh(jnp.asarray(x0), None, cfg_s3,
                                       prev_fn=prev_fn,
                                       mesh_force=mesh.elastic_mesh_3d)
    return np.asarray(solved), key_to_idx, int(steps)

  def s3_render(mesh_dir, solved, key_to_idx, reset=True):
    mesh_path = os.path.join(mesh_dir, 'meshes.npz')
    ckpt.save_mesh_npz(mesh_path, solved, key_to_idx)

    class _Render(warp_proc.StitchAndRender3dTiles):
      def _open_tile_volume(self, tile_id):
        return tile_map[((tile_id % 2), (tile_id // 2))].data[0]

    if reset:
      warp_proc.StitchAndRender3dTiles._tile_meshes = None
      warp_proc.StitchAndRender3dTiles._tile_boxes = {}
      warp_proc.StitchAndRender3dTiles._inverted_meshes = {}
    proc3 = _Render(tile_map=[[0, 1], [2, 3]], tile_mesh_path=mesh_path,
                    stride=stride3, margin=8,
                    work_size=(640, 640, 64))
    sv3 = Subvol3(np.zeros((1,) + tuple(out_box.size[::-1]), np.float32),
                  out_box)
    return proc3.process(sv3).data[0]

  # Warm pass, each phase timed separately (cold = compile-inclusive).
  fl = s3_flow()
  t0 = tick('s3_flow_cold_s', t0)
  solved3, k2i3, steps3 = s3_solve(*fl)
  results['s3_solve_steps'] = steps3
  t0 = tick('s3_solve_cold_s', t0)
  with tempfile.TemporaryDirectory() as tmp3:
    s3_render(tmp3, solved3, k2i3)
    t0 = tick('s3_render_cold_s', t0)

    fl = s3_flow()
    t0 = tick('s3_flow_s', t0)
    solved3, k2i3, _ = s3_solve(*fl)
    t0 = tick('s3_solve_s', t0)
    rendered3 = s3_render(tmp3, solved3, k2i3)
    t0 = tick('s3_render_s', t0)
    rendered3 = s3_render(tmp3, solved3, k2i3, reset=False)
    t0 = tick('s3_render_cached_s', t0)

  mask3r = rendered3 > 0
  truth3 = vol3[8:8 + (zdim - 16), 16:16 + (n3 - 32), 16:16 + (n3 - 32)]
  rel3 = float(np.abs(rendered3 - truth3)[mask3r].mean() / truth3.std())
  results['s3_rel_err'] = round(rel3, 4)
  results['s3_coverage'] = round(float(mask3r.mean()), 4)

  with open('/tmp/probe_stitch3d_r5.json', 'w') as fh:
    json.dump(results, fh, indent=1)
  print(json.dumps(results), flush=True)


if __name__ == '__main__':
  main()
