"""Mosaic probes for the fused 3d Verlet/FIRE slab kernel.

A. unaligned sublane slices: [3, 10, ty+2, Xp] window -> three
   [3, 10, ty, Xp] slabs at row offsets 0/1/2 + a force-like chain.
B. ANY-space manual-DMA outputs + input_output_aliases: in-place HBM
   update of the inner rows, pads persist across a fori_loop.
Writes /tmp/probe_fused_verlet.json.
"""

import functools
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
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  print('backend:', jax.default_backend(), flush=True)
  results = {}
  ty, nzp, xp_w = 8, 10, 1408
  wy = ty + 8          # window rows: 8-aligned, halo inside
  yp = 64
  gy = yp // ty

  rng = np.random.RandomState(0)
  x_np = rng.randn(3, nzp, yp + 16, xp_w).astype(np.float32)

  # --- A: unaligned sublane slices + force-ish chain -----------------
  def kern_a(w_ref, out_ref):
    w = w_ref[:]
    up = jax.lax.slice(w, (0, 0, 2, 0), (3, nzp, 2 + ty, xp_w))
    mid = jax.lax.slice(w, (0, 0, 1, 0), (3, nzp, 1 + ty, xp_w))
    dn = jax.lax.slice(w, (0, 0, 0, 0), (3, nzp, ty, xp_w))
    del w
    acc = jnp.zeros((3, nzp, ty, xp_w), jnp.float32)
    for nbor in (up, dn,
                 pltpu.roll(mid, 1, 3), pltpu.roll(up, nzp - 1, 1)):
      d = [nbor[c] - mid[c] + 1.0 for c in range(3)]
      dd = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
      inv_l = jax.lax.rsqrt(jnp.maximum(dd, 1e-60))
      fin = jnp.isfinite(dd)
      coef = 0.1 * (1.0 - 40.0 * inv_l)
      acc = acc + jnp.stack(
          [jnp.where(fin, coef * d[c], 0.0) for c in range(3)])
    out_ref[...] = acc

  try:
    f = pl.pallas_call(
        kern_a,
        grid=(gy,),
        in_specs=[pl.BlockSpec((3, nzp, wy, xp_w),
                               lambda iy: (0, 0, iy, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, nzp, ty, xp_w),
                               lambda iy: (0, 0, iy, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, nzp, yp, xp_w), jnp.float32),
    )
    # NOTE block row stride: in_spec block (ty+2) with index iy strides
    # by ty+2 — WRONG semantics for overlap, but compile is what we
    # probe; the real kernel uses manual DMA.
    out = jax.jit(f)(jnp.asarray(
        np.concatenate([x_np] * 3, axis=2)[:, :, :gy * wy]))
    results['A_unaligned_slices'] = 'compiles'
  except Exception as e:  # noqa: BLE001
    results['A_unaligned_slices'] = f'{type(e).__name__}: {e}'[:200]
  print('A', results['A_unaligned_slices'][:140], flush=True)

  # --- B: manual DMA in/out, aliasing, fori_loop ---------------------
  def kern_b(x_hbm, o_hbm, win, sem_i, sem_o):
    iy = pl.program_id(0)
    cp = pltpu.make_async_copy(
        x_hbm.at[:, :, pl.ds(iy * ty, wy)], win, sem_i)
    cp.start()
    cp.wait()
    w = win[...]
    mid = jax.lax.slice(w, (0, 0, 1, 0), (3, nzp, 1 + ty, xp_w))
    res = mid * 0.5 + 1.0
    win[:, :, 1:1 + ty] = res
    cp2 = pltpu.make_async_copy(
        win.at[:, :, pl.ds(1, ty)], o_hbm.at[:, :, pl.ds(1 + iy * ty, ty)],
        sem_o)
    cp2.start()
    cp2.wait()

  try:
    f = pl.pallas_call(
        kern_b,
        grid=(gy,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((3, nzp, yp + 16, xp_w),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((3, nzp, wy, xp_w), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        input_output_aliases={0: 0},
    )

    @jax.jit
    def loop(x):
      return jax.lax.fori_loop(0, 5, lambda i, s: f(s), x)

    out = np.asarray(loop(jnp.asarray(x_np)))
    # Pads (rows 0, yp+1) must persist; inner rows = ((x*0.5+1)...)^5.
    expect = x_np.copy()
    for _ in range(5):
      expect[:, :, 1:1 + yp] = expect[:, :, 1:1 + yp] * 0.5 + 1.0
    err = float(np.abs(out - expect).max())
    results['B_alias_dma'] = f'ok max_err={err:.2e}'
  except Exception as e:  # noqa: BLE001
    results['B_alias_dma'] = f'{type(e).__name__}: {e}'[:200]
  print('B', results['B_alias_dma'][:140], flush=True)

  with open('/tmp/probe_fused_verlet.json', 'w') as fh:
    json.dump(results, fh, indent=1)
  print('DONE', flush=True)


if __name__ == '__main__':
  main()
