"""Round-5 3d mesh force probes: isfinite guard + symmetric link-loop slab.

Measures GLUPS at the bench geometry ([3, 8, 512, 1024], 200 Verlet
iters) for:
  * the asymmetric slab with the new single-compare NaN guard (was
    1.592 with per-channel nan_to_num);
  * the NEW symmetric link-loop slab (_kernel_3d_slab_symloop), the
    first symmetric slab form that fits the compile helper;
  * the same at tile_y=16/32 (the loop body is tiny, bigger tiles may
    now fit and amortize grid overhead).
Device parity of the symloop kernel vs the XLA stencil is checked
first. Writes JSON progress to stdout.
"""

import json
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
import numpy as np

from sofima_tpu import mesh
from sofima_tpu.ops import pallas_mesh

results = {}
rng = np.random.RandomState(0)
cfg3 = mesh.IntegrationConfig(
    dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=(40.0, 40.0, 40.0),
    num_iters=200, max_iters=200, stop_v_max=0.0, dt_max=100.0)
x3 = jax.device_put(rng.randn(3, 8, 512, 1024).astype(np.float32))
v3 = jnp.zeros_like(x3)
prev3 = jnp.zeros_like(x3)
n_nodes = 8 * 512 * 1024


def timed(fn):
  out = fn()
  float(jnp.sum(jnp.nan_to_num(out[0])))
  best = float('inf')
  for _ in range(2):
    t0 = time.perf_counter()
    out = fn()
    float(jnp.sum(jnp.nan_to_num(out[0])))
    best = min(best, time.perf_counter() - t0)
  return best


def measure(name, force):
  def run():
    return mesh.velocity_verlet(x3, v3, prev3, cfg3, force_cap=1e6,
                                mesh_force=force)
  try:
    t = timed(run)
    results[name] = round(cfg3.num_iters * n_nodes / t / 1e9, 3)
  except Exception as e:  # noqa: BLE001
    results[name + '_error'] = f'{type(e).__name__}: {e}'[:160]
  print(json.dumps({k: results.get(k, results.get(k + '_error'))
                    for k in [name]} | results), flush=True)


def slab(symmetric=False, link_loop=False, tile_y=8):
  def force(x, k, stride, prefer_orig_order=False, links=None):
    del links
    return pallas_mesh.elastic_mesh_3d_pallas_slab(
        x, k, stride, prefer_orig_order, tile_y=tile_y,
        symmetric=symmetric, link_loop=link_loop)
  return force


# Device parity of the symloop kernel first (small grid).
xs = jax.device_put(rng.randn(3, 5, 24, 128).astype(np.float32) * 5)
try:
  f_ref = mesh.elastic_mesh_3d(xs, 0.1, (40.0, 40.0, 40.0))
  f_sl = pallas_mesh.elastic_mesh_3d_pallas_slab(
      xs, 0.1, (40.0, 40.0, 40.0), tile_y=8, symmetric=True,
      link_loop=True)
  results['parity_symloop_max_err'] = float(
      jnp.nanmax(jnp.abs(f_ref - f_sl)))
except Exception as e:  # noqa: BLE001
  results['parity_symloop_error'] = f'{type(e).__name__}: {e}'[:160]
print(json.dumps(results), flush=True)

measure('glups_asym_guard_t8', slab())
measure('glups_symloop_t8', slab(symmetric=True, link_loop=True))
measure('glups_symloop_t16', slab(symmetric=True, link_loop=True,
                                  tile_y=16))
measure('glups_symloop_t32', slab(symmetric=True, link_loop=True,
                                  tile_y=32))

print('FINAL ' + json.dumps(results), flush=True)
