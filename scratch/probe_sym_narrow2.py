"""Probe 2: symmetric narrow-tile slab force with DOUBLE-BUFFERED DMA.

Same construct as probe_sym_narrow (sym body compiles at ~180 vregs/op)
but with the flow-kernel prefetch pattern: each grid step kicks off the
next step's three window copies before computing, hiding the DMA that
capped probe 1 at 1.14 GLUPS. Writes /tmp/probe_sym_narrow2.json.
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
  from sofima_tpu import mesh
  from sofima_tpu.ops import pallas_mesh

  print('backend:', jax.default_backend(), flush=True)
  results = {}

  k, stride = 0.1, (40.0, 40.0, 40.0)
  ty = 8

  def sym_windowed(x, tile_x, mg=128):
    c, nz, ny, nx = x.shape
    pad_y = (-ny) % ty
    pad_x = (-nx) % tile_x or tile_x
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (1, 1), (0, pad_y), (mg, pad_x + mg)),
                 constant_values=np.nan)
    yp = ny + pad_y
    xw = xp.shape[3]
    nan_row = jnp.full((3, nz + 2, 1, xw), jnp.nan, jnp.float32)
    up = jnp.concatenate([xp[:, :, 1:], nan_row], axis=2)
    dn = jnp.concatenate([nan_row, xp[:, :, :-1]], axis=2)
    gy = yp // ty
    gx = (xw - 2 * mg) // tile_x
    win_x = tile_x + 2 * mg
    nsteps = gy * gx

    def kern_dma(up_hbm, mid_hbm, dn_hbm, out_ref, wins, sems):
      iy = pl.program_id(0)
      ix = pl.program_id(1)
      step = iy * gx + ix
      slot = jax.lax.rem(step, 2)

      def copies(iy2, ix2, s):
        return [pltpu.make_async_copy(
            h.at[:, :, pl.ds(iy2 * ty, ty), pl.ds(ix2 * tile_x, win_x)],
            wins.at[s, j], sems.at[s, j])
            for j, h in enumerate((up_hbm, mid_hbm, dn_hbm))]

      @pl.when(step == 0)
      def _prologue():
        for cp in copies(iy, ix, slot):
          cp.start()

      nxt = step + 1

      @pl.when(nxt < nsteps)
      def _prefetch():
        for cp in copies(nxt // gx, jax.lax.rem(nxt, gx), 1 - slot):
          cp.start()

      for cp in copies(iy, ix, slot):
        cp.wait()
      f = pallas_mesh._slab_force_3d_sym(
          wins[slot, 0], wins[slot, 1], wins[slot, 2], k, stride, False)
      out_ref[...] = jax.lax.slice(
          f, (0, 1, 0, mg), (3, 1 + nz, ty, mg + tile_x))

    out = pl.pallas_call(
        kern_dma,
        grid=(gy, gx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        out_specs=pl.BlockSpec((3, nz, ty, tile_x),
                               lambda iy, ix: (0, 0, iy, ix),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, nz, yp, gx * tile_x),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 3, 3, nz + 2, ty, win_x), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3))],
    )(up, xp, dn)
    return out[:, :, :ny, :nx]

  rng = np.random.RandomState(0)
  xs = jax.device_put(rng.randn(3, 5, 24, 256).astype(np.float32) * 5)
  x3 = jax.device_put(rng.randn(3, 8, 512, 1024).astype(np.float32))
  n_nodes = 8 * 512 * 1024

  for tx, mg in [(512, 128), (1024, 128), (256, 128)]:
    tag = f'sym_db_w{tx}'
    try:
      f_ref = mesh.elastic_mesh_3d(xs, k, stride)
      f_p = sym_windowed(xs, tx, mg)
      err = float(jnp.nanmax(jnp.abs(f_ref - f_p)))
      results[tag + '_parity'] = err
      print(tag, 'parity', err, flush=True)
      @jax.jit
      def many(x, tx=tx, mg=mg):
        def body(i, acc):
          f = sym_windowed(x + acc * 1e-20, tx, mg)
          return acc + jnp.nansum(f[0, 0, 0, :8])
        return jax.lax.fori_loop(0, 50, body, jnp.float32(0.0))
      float(many(x3))
      ts = []
      for _ in range(2):
        t0 = time.perf_counter()
        float(many(x3))
        ts.append(time.perf_counter() - t0)
      t = min(ts) / 50
      results[tag + '_glups'] = round(n_nodes / t / 1e9, 3)
      print(tag, results[tag + '_glups'], flush=True)
    except Exception as e:  # noqa: BLE001
      results[tag] = f'{type(e).__name__}: {e}'[:200]
      print(tag, 'ERROR', results[tag][:130], flush=True)
    with open('/tmp/probe_sym_narrow2.json', 'w') as fh:
      json.dump(results, fh, indent=1)
  print('DONE', flush=True)


if __name__ == '__main__':
  main()
