"""Probe: symmetric 3d slab force on NARROW-LANE windowed tiles.

Hypothesis: the Mosaic compile-helper crash threshold scales with
unrolled-link-count x vregs-per-op (block area / (8*128)). The full
slab at [3, 10, 8, 1408] is ~330 vregs/op; 13 sym link bodies blow it.
Windowed x-tiles of 512 live lanes (+128 margins each side) cut this to
~180 vregs/op at 50% margin compute waste — if sym compiles there, net
is still ~1.3x the direct kernel's math halving.

Variants: sym at x-tile 512/256 live lanes (margins 128), direct slab
baseline. Parity vs XLA stencil. Writes /tmp/probe_sym_narrow.json.
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

  def sym_windowed(x, tile_x, links=None):
    """Symmetric slab force with x-windowed tiles (margin 128/side)."""
    c, nz, ny, nx = x.shape
    mg = 128
    pad_y = (-ny) % ty
    pad_x = (-nx) % tile_x or tile_x  # NaN tail absorbs x-roll wrap
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

    def kern(up_ref, mid_ref, dn_ref, out_ref):
      f = pallas_mesh._slab_force_3d_sym(
          up_ref[...], mid_ref[...], dn_ref[...], k, stride, False)
      out_ref[...] = jax.lax.slice(
          f, (0, 1, 0, mg), (3, 1 + nz, ty, mg + tile_x))

    # Overlapping x windows via element-indexed manual maps are not
    # expressible in BlockSpec; fake it with a strided gather: pass the
    # SAME padded arrays at three x offsets using pl.ds DMA.
    def kern_dma(up_hbm, mid_hbm, dn_hbm, out_ref, w_u, w_m, w_d, sems):
      iy = pl.program_id(0)
      ix = pl.program_id(1)
      col0 = ix * tile_x
      cps = [pltpu.make_async_copy(
          h.at[:, :, pl.ds(iy * ty, ty), pl.ds(col0, win_x)], w, sems.at[j])
          for j, (h, w) in enumerate(
              ((up_hbm, w_u), (mid_hbm, w_m), (dn_hbm, w_d)))]
      for cp in cps:
        cp.start()
      for cp in cps:
        cp.wait()
      f = pallas_mesh._slab_force_3d_sym(
          w_u[...], w_m[...], w_d[...], k, stride, False)
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
        scratch_shapes=[pltpu.VMEM((3, nz + 2, ty, win_x), jnp.float32)
                        for _ in range(3)]
        + [pltpu.SemaphoreType.DMA((3,))],
    )(up, xp, dn)
    return out[:, :, :ny, :nx]

  # Parity on a small grid.
  rng = np.random.RandomState(0)
  xs = jax.device_put(rng.randn(3, 5, 24, 256).astype(np.float32) * 5)
  for tx in (512, 256):
    tag = f'sym_win{tx}'
    try:
      f_ref = mesh.elastic_mesh_3d(xs, k, stride)
      f_p = sym_windowed(xs, tx)
      err = float(jnp.nanmax(jnp.abs(f_ref - f_p)))
      results[tag + '_parity'] = err
      print(tag, 'parity', err, flush=True)
    except Exception as e:  # noqa: BLE001
      results[tag + '_parity'] = f'{type(e).__name__}: {e}'[:200]
      print(tag, 'PARITY ERROR', results[tag + '_parity'][:130], flush=True)
      continue

    # Speed at bench geometry via fori_loop of force calls.
    x3 = jax.device_put(rng.randn(3, 8, 512, 1024).astype(np.float32))
    n_nodes = 8 * 512 * 1024
    try:
      @jax.jit
      def many(x, tx=tx):
        def body(i, acc):
          f = sym_windowed(x + acc * 1e-20, tx)
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
      results[tag + '_glups'] = f'{type(e).__name__}: {e}'[:200]
      print(tag, 'SPEED ERROR', str(results[tag + '_glups'])[:130],
            flush=True)
    with open('/tmp/probe_sym_narrow.json', 'w') as fh:
      json.dump(results, fh, indent=1)
  print('DONE', flush=True)


if __name__ == '__main__':
  main()
