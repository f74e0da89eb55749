"""Micro-probe: which part of StitchAndRender3dTiles._render_one_tile
burns the stitch3d scenario's wall clock (invert_map / fill_missing /
ndimage_warp), on the bench geometry (576^2 x 64 tiles, stride 16).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')


def tick(results, label, t0):
  dt = time.perf_counter() - t0
  results[label] = round(dt, 2)
  print(f'[{label}] {dt:.2f}s', flush=True)
  with open('/tmp/probe_s3_parts.json', 'w') as fh:
    json.dump(results, fh, indent=1)
  return time.perf_counter()


def main():
  import jax
  try:
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
  except Exception:
    pass
  from sofima_tpu import map_utils, warp
  from sofima_tpu.utils.bounding_box import BoundingBox

  results = {}
  rng = np.random.RandomState(0)

  # A solved-mesh-like smooth 3d map: [3, 4, 36, 36], stride 16, offsets
  # up to ~64 px (one overlap).
  mesh3 = rng.randn(3, 4, 36, 36).astype(np.float32) * 2.0
  mesh3[0] += np.linspace(0, -64, 36)[None, None, :]
  map_box = BoundingBox(start=(0, 0, 0), size=(36, 36, 4))
  stride3 = (16, 16, 16)

  tg_box = map_utils.outer_box(mesh3, map_box, stride3)
  tg_box = tg_box.adjusted_by(start=(-1, -1, -1), end=(1, 1, 1))
  results['tg_box_size'] = [int(v) for v in tg_box.size]
  t0 = time.perf_counter()

  inv = map_utils.invert_map(mesh3, map_box, tg_box, stride3)
  t0 = tick(results, 'invert_cold_s', t0)
  inv = map_utils.invert_map(mesh3, map_box, tg_box, stride3)
  t0 = tick(results, 'invert_warm_s', t0)

  filled = map_utils.fill_missing(inv, extrapolate=True,
                                  interpolate_first=False)
  t0 = tick(results, 'fill_cold_s', t0)
  filled = map_utils.fill_missing(inv, extrapolate=True,
                                  interpolate_first=False)
  t0 = tick(results, 'fill_warm_s', t0)

  # ndimage_warp of one tile through the filled map.
  image = rng.rand(64, 576, 576).astype(np.float32) * 255.0
  image_box = BoundingBox(start=(0, 0, 0), size=(576, 576, 64))
  out_box = BoundingBox(start=(0, 0, 0), size=(576, 576, 48))
  warped = warp.ndimage_warp(image, filled, stride3,
                             work_size=(512, 512, 32), overlap=(0, 0, 0),
                             image_box=image_box, map_box=tg_box,
                             out_box=out_box)
  t0 = tick(results, 'ndimage_warp_cold_s', t0)
  warped = warp.ndimage_warp(image, filled, stride3,
                             work_size=(512, 512, 32), overlap=(0, 0, 0),
                             image_box=image_box, map_box=tg_box,
                             out_box=out_box)
  t0 = tick(results, 'ndimage_warp_warm_s', t0)
  results['warped_nonzero'] = round(float((warped != 0).mean()), 3)

  print(json.dumps(results), flush=True)


if __name__ == '__main__':
  main()
