"""Probe: split symmetric slab 3d force on hardware.

The single symmetric slab body crashes the remote compile helper
(unroll x area blowup); sym_split=2/3 partitions the 13 half-link
families across pallas_calls. Measures GLUPS at the bench geometry
([3, 8, 512, 1024], 200 Verlet iters) for direct / sym_split variants.
"""

import json
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

from sofima_tpu import mesh
from sofima_tpu.ops import pallas_mesh

rng = np.random.RandomState(0)
cfg3 = mesh.IntegrationConfig(
    dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=(40.0, 40.0, 40.0),
    num_iters=200, max_iters=200, stop_v_max=0.0, dt_max=100.0)
x3 = jax.device_put(rng.randn(3, 8, 512, 1024).astype(np.float32))
v3 = jnp.zeros_like(x3)
prev3 = jnp.zeros_like(x3)
n_nodes = 8 * 512 * 1024

results = {}


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
    results[name + '_error'] = f'{type(e).__name__}: {e}'[:200]
  print(json.dumps(results), flush=True)


def slab(symmetric=False, sym_split=0, tile_y=8):
  def force(x, k, stride, prefer_orig_order=False, links=None):
    del links
    return pallas_mesh.elastic_mesh_3d_pallas_slab(
        x, k, stride, prefer_orig_order, tile_y=tile_y,
        symmetric=symmetric, sym_split=sym_split)
  return force


# Parity check on device first (direct vs sym_split=3), small grid.
xs = jax.device_put(rng.randn(3, 5, 24, 128).astype(np.float32) * 5)
try:
  f_ref = mesh.elastic_mesh_3d(xs, 0.1, (40.0, 40.0, 40.0))
  f_s3 = pallas_mesh.elastic_mesh_3d_pallas_slab(
      xs, 0.1, (40.0, 40.0, 40.0), tile_y=8, symmetric=True, sym_split=3)
  results['parity_sym3_max_err'] = float(jnp.nanmax(jnp.abs(f_ref - f_s3)))
except Exception as e:  # noqa: BLE001
  results['parity_sym3_error'] = f'{type(e).__name__}: {e}'[:200]
print(json.dumps(results), flush=True)

measure('glups_sym_split3', slab(symmetric=True, sym_split=3))
measure('glups_sym_split2', slab(symmetric=True, sym_split=2))
measure('glups_direct', slab())

print('FINAL ' + json.dumps(results), flush=True)
