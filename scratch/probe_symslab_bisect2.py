"""Bisect round 2: sym_split standalone vs inside velocity_verlet.

Round 1 (probe_symslab_bisect.py) showed single-kernel bodies with <=5
ey=1 links compile, 9 crash. sym_split=3 groups are 5/4/4 links yet the
velocity_verlet probe crashed — so either the 5-link-concat group alone
crashes, or the crash needs several kernels in one program / the VV
wrapper. This isolates each step. Writes JSON progress to stdout.
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
x3 = jax.device_put(rng.randn(3, 8, 512, 1024).astype(np.float32))


def attempt(name, fn):
  try:
    out = fn()
    float(jnp.sum(jnp.nan_to_num(out)))
    results[name] = 'ok'
  except Exception as e:  # noqa: BLE001
    results[name] = f'{type(e).__name__}: {e}'[:120]
  print(json.dumps({name: results[name]}), flush=True)


# 1. Standalone forward force, sym_split=3 (three kernels, one program).
attempt('standalone_split3', lambda: pallas_mesh.elastic_mesh_3d_pallas_slab(
    x3, 0.1, (40.0, 40.0, 40.0), tile_y=8, symmetric=True, sym_split=3))

# 2. Standalone, each group alone via sym_split internals: group of 5
#    ey1 links with the concat row fix (the round-1 unknown).
EY1 = [e for e in pallas_mesh._HALF_LINKS_3D if e[1]]
EY0 = [e for e in pallas_mesh._HALF_LINKS_3D if not e[1]]


def one_group(links):
  import functools
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu
  nz = 8
  tile_y = 8
  xp = jnp.pad(x3, ((0, 0), (1, 1), (0, 0), (0, 0)),
               constant_values=np.nan)
  up = pltpu.roll(xp, -1, 2) if False else jnp.roll(xp, -1, 2)
  dn = jnp.roll(xp, 1, 2)
  spec = pl.BlockSpec((3, nz + 2, tile_y, xp.shape[3]),
                      lambda iy: (0, 0, iy, 0),
                      memory_space=pltpu.VMEM)
  kernel = functools.partial(
      pallas_mesh._kernel_3d_slab, k=0.1, stride=(40.0, 40.0, 40.0),
      prefer_orig_order=False, nz=nz, symmetric=True,
      links=tuple(links))
  return pl.pallas_call(
      kernel,
      grid=(xp.shape[2] // tile_y,),
      in_specs=[spec] * 3,
      out_specs=pl.BlockSpec((3, nz, tile_y, xp.shape[3]),
                             lambda iy: (0, 0, iy, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((3, nz, xp.shape[2], xp.shape[3]),
                                     jnp.float32),
  )(up, xp, dn)


attempt('group_ey1_first5_concat', lambda: one_group(EY1[:5]))
attempt('group_ey1_last4_concat', lambda: one_group(EY1[5:]))
attempt('group_ey0_4', lambda: one_group(EY0))

# 3. If standalone worked: the same inside velocity_verlet (the round-1
#    failing configuration), to pin the VV wrapper as the trigger.
cfg3 = mesh.IntegrationConfig(
    dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=(40.0, 40.0, 40.0),
    num_iters=20, max_iters=20, stop_v_max=0.0, dt_max=100.0)


def in_vv():
  def force(x, k, stride, prefer_orig_order=False):
    return pallas_mesh.elastic_mesh_3d_pallas_slab(
        x, k, stride, prefer_orig_order, tile_y=8,
        symmetric=True, sym_split=3)
  out = mesh.velocity_verlet(x3, jnp.zeros_like(x3), jnp.zeros_like(x3),
                             cfg3, force_cap=1e6, mesh_force=force)
  return out[0]


attempt('vv_split3', in_vv)

print('FINAL ' + json.dumps(results), flush=True)
