"""Hardware probe: Newton's-third-law symmetric 3d slab mesh force.

Times velocity_verlet (200 iters, bench cfg3 shapes [3,8,512,1024])
with the symmetric slab force at tile_y 8/16 vs the plain slab and
reports GLUPS + single-call parity vs the XLA 26-neighbor force.
One JSON line.
"""
import json
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np
import jax

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import jax.numpy as jnp
from sofima_tpu import mesh
from sofima_tpu.ops import pallas_mesh

rng = np.random.RandomState(0)
cfg3 = mesh.IntegrationConfig(
    dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=(40.0, 40.0, 40.0),
    num_iters=200, max_iters=200, stop_v_max=0.0, dt_max=100.0)
x3 = jax.device_put(rng.randn(3, 8, 512, 1024).astype(np.float32))
v3 = jnp.zeros_like(x3)
prev3 = jnp.zeros_like(x3)
n_nodes3 = 8 * 512 * 1024

results = {}


def checksum(x):
  leaves = jax.tree_util.tree_leaves(x)
  return float(sum(jnp.sum(jnp.nan_to_num(l.astype(jnp.float32)))
                   for l in leaves))


def _time(fn, reps=2):
  out = fn()
  checksum(out)
  best = float('inf')
  for _ in range(reps):
    t0 = time.perf_counter()
    out = fn()
    checksum(out)
    best = min(best, time.perf_counter() - t0)
  return out, best


def stage(name, fn):
  try:
    fn()
  except Exception as e:  # noqa: BLE001
    results[name + '_error'] = f'{type(e).__name__}: {e}'[:300]


# Parity of one force call on hardware (sym slab vs XLA stencil).
def parity():
  ref = mesh.elastic_mesh_3d(x3, 0.1, (40.0, 40.0, 40.0))
  got = pallas_mesh.elastic_mesh_3d_pallas_slab(
      x3, 0.1, (40.0, 40.0, 40.0), tile_y=8, symmetric=True)
  results['sym_force_max_diff'] = float(jnp.nanmax(jnp.abs(ref - got)))

stage('parity', parity)


def vv(force):
  return mesh.velocity_verlet(x3, v3, prev3, cfg3, force_cap=1e6,
                              mesh_force=force)


def mk_slab(tile_y, symmetric):
  def force(x, k, stride, prefer_orig_order=False, links=None):
    del links
    return pallas_mesh.elastic_mesh_3d_pallas_slab(
        x, k, stride, prefer_orig_order, tile_y=tile_y,
        symmetric=symmetric)
  return force


for name, ty, sym in (('sym_ty8', 8, True), ('sym_ty16', 16, True),
                      ('slab_ty8', 8, False)):
  def run(name=name, ty=ty, sym=sym):
    t0 = time.perf_counter()
    _, t = _time(lambda: vv(mk_slab(ty, sym)))
    results[f'compile_{name}_s'] = round(time.perf_counter() - t0, 1)
    results[f'mesh3d_glups_{name}'] = round(
        cfg3.num_iters * n_nodes3 / t / 1e9, 2)
  stage(name, run)

# Fused whole-convergence solver: half-link loop body vs full.
cfg3f = mesh.IntegrationConfig(
    dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=(40.0, 40.0, 40.0),
    num_iters=500, max_iters=1000, stop_v_max=0.0, dt_max=100.0)
x3f = jax.device_put(rng.randn(3, 8, 128, 256).astype(np.float32))
prev3f = jnp.zeros_like(x3f)

for name, sym in (('fused_sym', True), ('fused', False)):
  def run(name=name, sym=sym):
    t0 = time.perf_counter()
    _, t = _time(lambda: pallas_mesh.relax_mesh_fused_pallas_3d(
        x3f, prev3f, cfg3f, link_loop=True, symmetric=sym)[0])
    results[f'compile_{name}_s'] = round(time.perf_counter() - t0, 1)
    results[f'mesh3d_{name}_glups'] = round(
        cfg3f.max_iters * 8 * 128 * 256 / t / 1e9, 2)
  stage(name, run)

print(json.dumps(results))
