"""Real RUN time (scalar-fetch barrier) of pallas_shift_warp_3d vs XLA
gather at stitch3d work-box geometry, plus a 16x-larger box. The relay's
block_until_ready returns early; fetching a reduced scalar is the
reliable barrier (bench.py discipline).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')


def main():
  import jax
  import jax.numpy as jnp
  from sofima_tpu.ops import interp, pallas_warp

  results = {}
  rng = np.random.RandomState(0)

  def bench(fn, *args, reps=3):
    # Warmup + median of reps with scalar-sum fetch barrier.
    float(jnp.sum(fn(*args)))
    ts = []
    for _ in range(reps):
      t0 = time.perf_counter()
      float(jnp.sum(fn(*args)))
      ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]

  for tag, (vz, vy, vx), (bz, by, bx) in [
      ('box512', (64, 576, 576), (32, 512, 512)),
      ('box1088', (64, 1152, 1152), (48, 1088, 1088)),
  ]:
    image = rng.rand(vz, vy, vx).astype(np.float32) * 255.0
    own = np.mgrid[0:bz, 0:by, 0:bx].astype(np.float32)
    disp = np.stack([
        0.5 * np.sin(own[1] / 97.0) + 1.0,
        2.0 * np.sin(own[2] / 131.0),
        2.0 * np.cos(own[1] / 113.0),
    ])
    coords = own + disp
    image_j = jax.device_put(jnp.asarray(image))
    coords_j = jax.device_put(jnp.asarray(coords))

    pfn = jax.jit(lambda im, co: pallas_warp.pallas_shift_warp_3d(
        im, co, 'linear', -4, 4, -4, 4, -4, 4, 0, 0, 0))
    gfn = jax.jit(lambda im, co: jnp.nan_to_num(interp.sample(
        im, co, method='linear', mode='constant', cval=np.nan)))

    t0 = time.perf_counter()
    tp = bench(pfn, image_j, coords_j)
    results[f'{tag}_pallas_cold_s'] = round(time.perf_counter() - t0 - 3 * tp,
                                            2)
    results[f'{tag}_pallas_run_s'] = round(tp, 4)
    t0 = time.perf_counter()
    tg = bench(gfn, image_j, coords_j)
    results[f'{tag}_gather_cold_s'] = round(time.perf_counter() - t0 - 3 * tg,
                                            2)
    results[f'{tag}_gather_run_s'] = round(tg, 4)
    results[f'{tag}_gvox_s_pallas'] = round(bz * by * bx / tp / 1e9, 2)
    results[f'{tag}_gvox_s_gather'] = round(bz * by * bx / tg / 1e9, 2)
    print(tag, {k: v for k, v in results.items() if k.startswith(tag)},
          flush=True)

  with open('/tmp/probe_warp3d_run.json', 'w') as fh:
    json.dump(results, fh, indent=1)


if __name__ == '__main__':
  main()
