"""Hardware probe: rsqrt force math (one transcendental chain per link
instead of sqrt + divide) across the Pallas mesh kernels.

Measures, after the rsqrt rewrite in ops/pallas_mesh.py:
  * 2d inplane force GLUPS (velocity_verlet, bench shapes)
  * 3d slab force GLUPS (plain + tile_y=8)
  * fused 2d + 3d whole-convergence solver GLUPS
  * hardware parity of each force call vs the XLA stencil (which still
    computes sqrt + divide) — bounds the rsqrt lowering's precision.
One JSON line; compare against BENCH_r03/r4 mesh rows.
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
results = {}


def checksum(x):
  leaves = jax.tree_util.tree_leaves(x)
  return float(sum(jnp.sum(jnp.nan_to_num(l.astype(jnp.float32)))
                   for l in leaves))


def _time(fn, reps=3):
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


# ---- 2d: bench shape [2, 4, 1000, 1000], 200 VV iters.
cfg2 = mesh.IntegrationConfig(
    dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=(40.0, 40.0),
    num_iters=200, max_iters=200, stop_v_max=0.0, dt_max=100.0)
x2 = jax.device_put(rng.randn(2, 4, 1000, 1000).astype(np.float32))
v2 = jnp.zeros_like(x2)
prev2 = jnp.zeros_like(x2)
n2 = 4 * 1000 * 1000


def parity2():
  ref = mesh.inplane_force(x2, 0.1, (40.0, 40.0))
  got = pallas_mesh.inplane_force_pallas(x2, 0.1, (40.0, 40.0))
  results['force2d_max_diff'] = float(jnp.nanmax(jnp.abs(ref - got)))

stage('parity2', parity2)


def run2():
  force = pallas_mesh.make_inplane_force()
  _, t = _time(lambda: mesh.velocity_verlet(
      x2, v2, prev2, cfg2, force_cap=1e6, mesh_force=force))
  results['mesh2d_glups'] = round(cfg2.num_iters * n2 / t / 1e9, 2)

stage('mesh2d', run2)

# ---- 3d slab force: bench shape [3, 8, 512, 1024].
cfg3 = mesh.IntegrationConfig(
    dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=(40.0, 40.0, 40.0),
    num_iters=200, max_iters=200, stop_v_max=0.0, dt_max=100.0)
x3 = jax.device_put(rng.randn(3, 8, 512, 1024).astype(np.float32))
v3 = jnp.zeros_like(x3)
prev3 = jnp.zeros_like(x3)
n3 = 8 * 512 * 1024


def parity3():
  ref = mesh.elastic_mesh_3d(x3, 0.1, (40.0, 40.0, 40.0))
  got = pallas_mesh.elastic_mesh_3d_pallas_slab(
      x3, 0.1, (40.0, 40.0, 40.0), tile_y=8)
  results['force3d_max_diff'] = float(jnp.nanmax(jnp.abs(ref - got)))

stage('parity3', parity3)


def run3():
  def force(x, k, stride, prefer_orig_order=False, links=None):
    del links
    return pallas_mesh.elastic_mesh_3d_pallas_slab(
        x, k, stride, prefer_orig_order, tile_y=8)
  _, t = _time(lambda: mesh.velocity_verlet(
      x3, v3, prev3, cfg3, force_cap=1e6, mesh_force=force))
  results['mesh3d_slab_glups'] = round(cfg3.num_iters * n3 / t / 1e9, 2)

stage('mesh3d_slab', run3)

# ---- Fused whole-convergence solvers.
cfg2f = mesh.IntegrationConfig(
    dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=(40.0, 40.0),
    num_iters=500, max_iters=1000, stop_v_max=0.0, dt_max=100.0)
x2f = jax.device_put(rng.randn(2, 256, 512).astype(np.float32)[:, None])
prev2f = jnp.zeros_like(x2f)


def run2f():
  _, t = _time(lambda: pallas_mesh.relax_mesh_fused_pallas(
      x2f[:, 0], prev2f[:, 0], cfg2f)[0])
  results['mesh2d_fused_glups'] = round(
      cfg2f.max_iters * 256 * 512 / t / 1e9, 2)

stage('fused2d', run2f)

cfg3f = mesh.IntegrationConfig(
    dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=(40.0, 40.0, 40.0),
    num_iters=500, max_iters=1000, stop_v_max=0.0, dt_max=100.0)
x3f = jax.device_put(rng.randn(3, 8, 128, 256).astype(np.float32))
prev3f = jnp.zeros_like(x3f)


def run3f():
  _, t = _time(lambda: pallas_mesh.relax_mesh_fused_pallas_3d(
      x3f, prev3f, cfg3f, link_loop=True, symmetric=True)[0])
  results['mesh3d_fused_sym_glups'] = round(
      cfg3f.max_iters * 8 * 128 * 256 / t / 1e9, 2)

stage('fused3d', run3f)

print(json.dumps(results))
