"""Minimal repro: remote tpu_compile_helper HTTP 500 on unrolled link math.

Self-contained (no sofima_tpu imports). A Pallas TPU kernel computing a
26-direction spring-force-style chain (roll + sqrt/div/select per link,
f32) over a 4d [3, 8, Y, 512] VMEM window:

  * Y = 48  -> compiles (slowly, minutes) and runs
  * Y = 80  -> remote compile helper dies in seconds:
               JaxRuntimeError: INTERNAL: http://127.0.0.1:80xx/
               remote_compile: HTTP 500: tpu_compile_helper ... exit 1
               (no further diagnostics)

The blowup tracks (unrolled link count) x (window area): halving the
links roughly doubles the passing area; restating the 26 links as ONE
fori_loop body with SMEM link tables compiles at any size (that is the
production workaround in sofima_tpu.ops.pallas_mesh, link_loop=True).
Interpret mode and CPU lowering are fine at every size - only the
remote helper fails, suggesting a compile-time resource limit (time or
memory) in the helper rather than an IR legality issue.

Usage:  python scratch/repro_mosaic_compile_crash.py [Y]
        (default 80 = crashing size; pass 48 to see the passing size)

Round-3/4 bisection notes: docs/ROADMAP.md "the 3d mesh Mosaic compile
crash, bisected and fixed".
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Y = int(sys.argv[1]) if len(sys.argv) > 1 else 80
SHAPE = (3, 8, Y, 512)

# 26 neighbor directions of a 3d lattice node.
DIRS = [(dz, dy, dx)
        for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
        if (dz, dy, dx) != (0, 0, 0)]


def kernel(x_ref, o_ref):
  x = x_ref[...]
  f = jnp.zeros_like(x)
  for dz, dy, dx in DIRS:
    n = x
    if dz:
      n = pltpu.roll(n, -dz, 1)
    if dy:
      n = pltpu.roll(n, -dy, 2)
    if dx:
      n = pltpu.roll(n, -dx, 3)
    d = n - x
    l0 = jnp.float32(np.sqrt(dz * dz + dy * dy + dx * dx) * 40.0)
    l = jnp.sqrt(jnp.sum(d * d, axis=0, keepdims=True))
    ok = l > 1e-6
    inv = jnp.where(ok, 1.0 / jnp.where(ok, l, 1.0), 0.0)
    f = f + jnp.where(ok, 0.1 * d * (1.0 - l0 * inv), 0.0)
  o_ref[...] = f


def main():
  x = jnp.asarray(np.random.RandomState(0).randn(*SHAPE), jnp.float32)
  out = pl.pallas_call(
      kernel,
      in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
      out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024))(x)
  print('compiled + ran, checksum',
        float(jnp.sum(jnp.nan_to_num(out))), flush=True)


if __name__ == '__main__':
  print('shape', SHAPE, 'backend', jax.default_backend(), flush=True)
  main()
