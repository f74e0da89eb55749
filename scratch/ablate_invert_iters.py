"""Invert-phase fixed-point iteration ablation (round 4, continuation).

The pipeline's invert phase (vmap of map_utils._invert_section over z)
uses the library default num_iters=32 damped fixed-point steps before
the Newton refinement. The damped iteration contracts the residual by
~0.4x/step on mesh-smooth maps, so ~12 steps already land far below
the 0.01*stride tolerance; the remaining 20 steps are dead work — the
StackAlignConfig.invert_fp_iters knob exists but was never measured.

Measures, on hardware, the vmapped invert phase over 15 bench-like
solved meshes (G=250, drift up to ~37 px + 7 px waves) for
fp_iters in {32, 16, 12, 8} x newton_iters in {4, 2} and reports:
  * median-of-3 time (scalar-fetch barrier);
  * max |rel_inv - baseline| in px (baseline = fp32/newton4);
  * true inversion residual max |F(inv(q)) - q| in px per variant
    (bilinear resample of the forward map at the inverted points) —
    the quantity the tolerance actually bounds.

Writes scratch/ablate_invert_iters.json.
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')


def main():
  import jax
  jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
  jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
  import jax.numpy as jnp
  from sofima_tpu.pipeline import stack_align

  print('backend:', jax.default_backend(), flush=True)
  results = {}

  grid_n = 250
  n_z = 15
  stride = 40.0
  gm_y, gm_x = np.mgrid[:grid_n, :grid_n].astype(np.float32) * stride
  solved = []
  for z in range(1, n_z + 1):
    # Accumulated bench-like drift + waves (what the solve phase emits).
    dy = 2.5 * z + 7.0 * np.sin(2 * np.pi * gm_x / 2500.0 + 0.7 * z)
    dx = -2.0 * z + 7.0 * np.cos(2 * np.pi * gm_y / 2500.0 + 0.4 * z)
    solved.append(np.stack([dx, dy])[:, None])  # xy channels, [2,1,G,G]
  solved_j = jnp.asarray(np.stack(solved, 0), jnp.float32)

  base = stack_align.StackAlignConfig(max_displacement=128, residual=6,
                                      render_two_pass=True, peak_crop=32)

  node = jnp.arange(grid_n, dtype=jnp.float32) * stride
  qx = jnp.broadcast_to(node[None, :], (grid_n, grid_n))
  qy = jnp.broadcast_to(node[:, None], (grid_n, grid_n))
  query = jnp.stack([qx, qy])

  def residual_px(rel_inv_all):
    # max over z, nodes of |F(inv(q)) - q| where F(p) = p + D(p).
    def one(rel_inv, sv):
      pts = (query + rel_inv) / stride  # node units, xy
      coords = jnp.stack([pts[1], pts[0]])  # (row, col)
      import jax.scipy.ndimage as jnd
      dxs = jnd.map_coordinates(sv[0, 0], coords, order=1, cval=np.nan)
      dys = jnd.map_coordinates(sv[1, 0], coords, order=1, cval=np.nan)
      res = jnp.stack([rel_inv[0] + dxs, rel_inv[1] + dys])
      return jnp.nanmax(jnp.abs(res))
    return jnp.max(jax.vmap(one)(rel_inv_all, solved_j))

  def invert_all(cfg):
    @jax.jit
    def run(sv_all):
      rel_inv, inv_abs = jax.vmap(
          lambda sv: stack_align._invert_phase(sv, cfg))(sv_all)
      return rel_inv, jnp.nansum(rel_inv)
    rel_inv, chk = run(solved_j)
    float(chk)  # scalar-fetch execution barrier
    ts = []
    for _ in range(3):
      t0 = time.perf_counter()
      rel_inv, chk = run(solved_j)
      float(chk)
      ts.append(time.perf_counter() - t0)
    return rel_inv, sorted(ts)[1]

  variants = {
      'fp32_n4': (32, 4),
      'fp16_n4': (16, 4),
      'fp12_n4': (12, 4),
      'fp8_n4': (8, 4),
      'fp12_n2': (12, 2),
  }
  res_fn = jax.jit(residual_px)
  diff_fn = jax.jit(lambda a, b: jnp.nanmax(jnp.abs(a - b)))
  sols = {}
  for name, (fp, nw) in variants.items():
    cfg = dataclasses.replace(base, invert_fp_iters=fp,
                              invert_newton_iters=nw)
    rel_inv, t = invert_all(cfg)
    sols[name] = rel_inv
    results[name + '_s'] = round(t, 4)
    results[name + '_residual_px'] = round(float(res_fn(rel_inv)), 4)
    print(name, results[name + '_s'], 'residual',
          results[name + '_residual_px'], flush=True)

  ref = sols['fp32_n4']
  for name in variants:
    if name == 'fp32_n4':
      continue
    d = float(diff_fn(sols[name], ref))
    results[name + '_max_diff_px'] = round(d, 4)
    print(name, 'max diff vs fp32_n4', round(d, 4), flush=True)

  with open('scratch/ablate_invert_iters.json', 'w') as f:
    json.dump(results, f, indent=1)
  print(json.dumps(results), flush=True)


if __name__ == '__main__':
  main()
