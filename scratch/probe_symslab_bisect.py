"""Bisect WHICH symmetric-slab construct crashes the compile helper.

Each variant compiles ONE pallas_call of the symmetric slab body with a
reduced link set / modified reaction handling, so the failing construct
is identified instead of the whole sym_split program. Compile-only (one
tiny execution); writes progress to stdout as JSON.
"""

import functools
import json
import sys

sys.path.insert(0, '/root/repo')

import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from sofima_tpu.ops import pallas_mesh

results = {}
NZ, NY, NX = 8, 512, 1024
TILE_Y = 8


def compile_variant(name, links, reaction='full'):
  """reaction: 'full' (concat row fix), 'where' (iota select), 'none'."""

  def body(up_ref, mid_ref, dn_ref, out_ref):
    up, mid, dn = up_ref[...], mid_ref[...], dn_ref[...]
    zn, xn = mid.shape[1], mid.shape[3]
    acc = jnp.zeros((3,) + mid.shape[1:], jnp.float32)
    for e in links:
      ex, ey, ez = e
      src = up if ey else mid
      nbor = src
      if ez:
        nbor = pltpu.roll(nbor, (-ez) % zn, 1)
      if ex:
        nbor = pltpu.roll(nbor, (-ex) % xn, 3)
      f = pallas_mesh._link_force_3d(mid, nbor, e, 0.1,
                                     (40.0, 40.0, 40.0), False)
      acc = acc + f
      if reaction == 'none':
        continue
      r = f
      if ez:
        r = pltpu.roll(r, ez % zn, 1)
      if ex:
        r = pltpu.roll(r, ex % xn, 3)
      if ey:
        dn_row = jax.lax.slice_in_dim(dn, 0, 1, axis=2)
        if ez:
          dn_row = pltpu.roll(dn_row, ez % zn, 1)
        if ex:
          dn_row = pltpu.roll(dn_row, ex % xn, 3)
        g = pallas_mesh._link_force_3d(
            dn_row, jax.lax.slice_in_dim(mid, 0, 1, axis=2),
            e, 0.1, (40.0, 40.0, 40.0), False)
        if reaction == 'full':
          r = jnp.concatenate(
              [g, jax.lax.slice_in_dim(r, 0, r.shape[2] - 1, axis=2)],
              axis=2)
        else:  # 'where'
          r = pltpu.roll(r, 1, 2)
          row = jax.lax.broadcasted_iota(jnp.int32, r.shape, 2)
          r = jnp.where(row == 0, jnp.broadcast_to(g, r.shape), r)
      acc = acc - r
    out_ref[...] = jax.lax.slice_in_dim(acc, 1, 1 + NZ, axis=1)

  spec = pl.BlockSpec((3, NZ + 2, TILE_Y, NX),
                      lambda iy: (0, 0, iy, 0),
                      memory_space=pltpu.VMEM)
  x = jnp.zeros((3, NZ + 2, NY, NX), jnp.float32)
  try:
    out = pl.pallas_call(
        body,
        grid=(NY // TILE_Y,),
        in_specs=[spec] * 3,
        out_specs=pl.BlockSpec((3, NZ, TILE_Y, NX),
                               lambda iy: (0, 0, iy, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, NZ, NY, NX), jnp.float32),
    )(x, x, x)
    float(jnp.sum(out))
    results[name] = 'ok'
  except Exception as e:  # noqa: BLE001
    results[name] = f'{type(e).__name__}: {e}'[:120]
  print(json.dumps({name: results[name]}), flush=True)


EY1 = [e for e in pallas_mesh._HALF_LINKS_3D if e[1]]
EY0 = [e for e in pallas_mesh._HALF_LINKS_3D if not e[1]]

# 1. ey0 group alone (reaction rolls, NO concat) — is the reaction the
#    problem, or the concat?
compile_variant('ey0_4links_reaction', EY0)
# 2. one ey1 link with the concat fix.
compile_variant('ey1_1link_concat', EY1[:1])
# 3. one ey1 link, where-based row fix instead of concat.
compile_variant('ey1_1link_where', EY1[:1], reaction='where')
# 4. all nine ey1 links, where-based fix.
compile_variant('ey1_9links_where', EY1, reaction='where')
# 5. forward-only ey0 (no reaction at all) — sanity floor.
compile_variant('ey0_4links_noreact', EY0, reaction='none')

print('FINAL ' + json.dumps(results), flush=True)
