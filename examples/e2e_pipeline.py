"""End-to-end alignment through the PROCESSOR pipeline (chunk-parallel).

Exercises the scale-out path of the framework (SURVEY.md §3.3's
distributed twin): the same alignment as e2e_alignment.py, but driven
through SubvolumeProcessors mapped over chunked volumes by the runner:

  EstimateFlow -> ReconcileAndFilterFlows -> RelaxMesh (sequential z)
  -> InvertMap -> WarpByMap

Run:  python examples/e2e_pipeline.py [--cpu]
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--size', type=int, default=640)
  parser.add_argument('--cpu', action='store_true')
  args = parser.parse_args()
  if args.cpu:
    import jax
    jax.config.update('jax_platforms', 'cpu')

  from sofima_tpu.processor import flow as flow_proc
  from sofima_tpu.processor import maps as maps_proc
  from sofima_tpu.processor import mesh as mesh_proc
  from sofima_tpu.processor import warp as warp_proc
  from sofima_tpu.processor import runner
  from sofima_tpu.processor.defaults import em_2d
  from sofima_tpu.utils import metrics
  from sofima_tpu.utils.bounding_box import BoundingBox
  from sofima_tpu.utils.volume import InMemoryVolume
  from examples.e2e_alignment import make_texture, smooth_deformation

  n = args.size
  stride, patch = 40, 80
  print(f'[pipeline] synthetic stack {n}x{n}, 3 sections')
  tex = make_texture(n)
  deform = smooth_deformation(n, 8.0)

  import jax.numpy as jnp
  from sofima_tpu.ops import interp
  grid = np.mgrid[:n, :n].astype(np.float32)

  def warp_fwd(img, scale):
    return np.asarray(interp.sample(
        jnp.asarray(img.astype(np.float32)),
        jnp.asarray(np.stack([grid[0] + scale * deform[1],
                              grid[1] + scale * deform[0]])),
        method='linear', mode='nearest'))

  stack = np.stack([tex, warp_fwd(tex, 1.0), warp_fwd(tex, 2.0)])
  image_vol = InMemoryVolume(stack[np.newaxis].astype(np.float32),
                             fill_value=0.0)

  # 1. FLOW (chunked)
  t0 = time.time()
  flow_cfg = em_2d.estimate_flow_config({
      'patch_size': patch, 'stride': stride, 'batch_size': 64})
  flow_vol = runner.process_volume(
      flow_proc.EstimateFlow(flow_cfg), image_vol,
      subvolume_size=(n // 2 + patch, n // 2 + patch, 3))
  print(f'[pipeline] EstimateFlow: {time.time() - t0:.1f}s, '
        f'volume {flow_vol.data.shape}')

  # 2. RECONCILE/CLEAN (chunked)
  t0 = time.time()
  rec_cfg = em_2d.reconcile_flows_config({'min_patch_size': 0})
  clean_vol = runner.process_volume(
      flow_proc.ReconcileAndFilterFlows(rec_cfg, flow_vol), flow_vol)
  frac = np.isfinite(clean_vol.data[0, 1:]).mean()
  print(f'[pipeline] Reconcile: {time.time() - t0:.1f}s, '
        f'{frac:.1%} valid')

  # 3. RELAX (sequential over z, one section per work item)
  t0 = time.time()
  solved_store = {0: np.zeros((2, 1) + clean_vol.data.shape[2:],
                              np.float32)}

  class MemRelax(mesh_proc.RelaxMesh):

    def _load_stitched_tile(self, output_dir, box):
      z = int(box.start[2])
      return (solved_store[z].copy() if z in solved_store else None)

  relax_cfg = em_2d.relax_mesh_config({
      'integration_config': {'stride': (stride, stride), 'k0': 0.1,
                             'num_iters': 500},
      'block_starts': [0]})
  relax_cfg = dataclasses.replace(
      relax_cfg,
      flows=[mesh_proc.FlowVolume(delta_z=1, volume=clean_vol)])
  proc = MemRelax(relax_cfg)
  gy, gx = clean_vol.data.shape[2:]
  for z in range(1, 3):
    from sofima_tpu.utils.subvolume import Subvolume
    sv = Subvolume(np.zeros((2, 1, gy, gx), np.float32),
                   BoundingBox(start=(0, 0, z), size=(gx, gy, 1)))
    out = proc.process(sv)
    solved_store[z] = out.data.astype(np.float32)
  solved = np.concatenate([solved_store[z] for z in range(3)], axis=1)
  print(f'[pipeline] RelaxMesh: {time.time() - t0:.1f}s')

  # 4. INVERT (chunked)
  t0 = time.time()
  solved_vol = InMemoryVolume(solved)
  inv_cfg = maps_proc.InvertMap.Config(stride=float(stride),
                                       crop_output=False,
                                       input_volume=solved_vol)
  inv_vol = runner.process_volume(
      maps_proc.InvertMap(inv_cfg), solved_vol,
      subvolume_size=(gx, gy, 3))
  print(f'[pipeline] InvertMap: {time.time() - t0:.1f}s')

  # 5. WARP (chunked via WarpByMap)
  t0 = time.time()
  warp_cfg = em_2d.warp_config({
      'stride': float(stride), 'interpolation': 'lanczos'})
  warp_cfg = dataclasses.replace(warp_cfg, map_volinfo=inv_vol,
                                 data_volinfo=image_vol)
  rendered_vol = runner.process_volume(
      warp_proc.WarpByMap(warp_cfg), image_vol,
      subvolume_size=(n, n, 3))
  print(f'[pipeline] WarpByMap: {time.time() - t0:.1f}s')

  rendered = rendered_vol.data[0]
  sel = np.s_[patch:-patch, patch:-patch]
  err_before = np.abs(stack[1] - stack[0])[sel].mean()
  err_after = np.abs(rendered[1] - stack[0])[sel].mean()
  print(f'[pipeline] z=1 vs ref pixel residual: before={err_before:.2f} '
        f'after={err_after:.2f}')

  snap = metrics.registry().snapshot()
  done = {k: v for k, v in snap['counters'].items() if 'done' in k}
  print(f'[pipeline] counters: {done}')

  ok = err_after < err_before * 0.5
  print('[pipeline]', 'PASS' if ok else 'FAIL')
  return 0 if ok else 1


if __name__ == '__main__':
  sys.exit(main())
