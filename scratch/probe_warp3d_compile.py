"""stitch3d render bottleneck: time ONE work box's warp at the bench
geometry — pallas_shift_warp_3d (trace/compile/run split) vs the XLA
gather map_coordinates fallback — to see whether cold compile or
execution dominates ndimage_warp's 15-minute cold pass.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')


def main():
  import jax
  import jax.numpy as jnp
  from sofima_tpu.ops import pallas_warp, shift_warp

  results = {}
  rng = np.random.RandomState(0)

  # One ndimage_warp work box at the bench geometry: image 64x576x576,
  # dense coords for a 32x512x512 box, displacements a few px + one
  # overlap (64) along x.
  image = rng.rand(64, 576, 576).astype(np.float32) * 255.0
  bz, by, bx = 32, 512, 512
  own = np.mgrid[0:bz, 0:by, 0:bx].astype(np.float32)
  disp = np.stack([
      0.5 * np.sin(own[1] / 97.0) + 1.0,
      2.0 * np.sin(own[2] / 131.0),
      2.0 * np.cos(own[1] / 113.0),
  ])
  coords = own + disp  # sample coords in source voxels
  image_j = jnp.asarray(image)
  coords_j = jnp.asarray(coords)

  # Shift bounds like _shift_warp_box would derive (bucket 4).
  bounds = []
  for d in disp:
    lo, hi = d.min(), d.max()
    base = int(np.rint((lo + hi) / 2.0))
    bounds.append((int(np.floor((lo - base - 1) / 4) * 4),
                   int(np.ceil((hi - base + 1) / 4) * 4), base))
  (dzl, dzh, oz), (dyl, dyh, oy), (dxl, dxh, ox) = bounds
  results['bounds'] = [b[:2] for b in bounds]

  fn = lambda im, co: pallas_warp.pallas_shift_warp_3d(
      im, co, 'linear', dzl, dzh, dyl, dyh, dxl, dxh, oz, oy, ox)
  t0 = time.perf_counter()
  lowered = jax.jit(fn).lower(image_j, coords_j)
  t1 = time.perf_counter()
  compiled = lowered.compile()
  t2 = time.perf_counter()
  out = compiled(image_j, coords_j)
  jax.block_until_ready(out)
  t3 = time.perf_counter()
  out2 = compiled(image_j, coords_j)
  jax.block_until_ready(out2)
  t4 = time.perf_counter()
  results['pallas3d'] = dict(trace_s=round(t1 - t0, 2),
                             compile_s=round(t2 - t1, 2),
                             run_cold_s=round(t3 - t2, 3),
                             run_warm_s=round(t4 - t3, 3))
  print('pallas3d', results['pallas3d'], flush=True)

  # XLA gather fallback (what map_coordinates does).
  from sofima_tpu.ops import interp
  gfn = lambda im, co: interp.sample(im, co, method='linear',
                                     mode='constant', cval=np.nan)
  t0 = time.perf_counter()
  glow = jax.jit(gfn).lower(image_j, coords_j)
  t1 = time.perf_counter()
  gcomp = glow.compile()
  t2 = time.perf_counter()
  g = gcomp(image_j, coords_j)
  jax.block_until_ready(g)
  t3 = time.perf_counter()
  g2 = gcomp(image_j, coords_j)
  jax.block_until_ready(g2)
  t4 = time.perf_counter()
  results['gather'] = dict(trace_s=round(t1 - t0, 2),
                           compile_s=round(t2 - t1, 2),
                           run_cold_s=round(t3 - t2, 3),
                           run_warm_s=round(t4 - t3, 3))
  print('gather', results['gather'], flush=True)

  diff = np.abs(np.asarray(out) - np.asarray(g))
  both = np.isfinite(np.asarray(out)) & np.isfinite(np.asarray(g))
  results['max_diff'] = float(diff[both].max())
  print(json.dumps(results), flush=True)
  with open('/tmp/probe_warp3d_compile.json', 'w') as fh:
    json.dump(results, fh, indent=1)


if __name__ == '__main__':
  main()
