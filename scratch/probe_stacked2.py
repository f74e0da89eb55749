"""Bisect the stacked x-DFT Mosaic crash: which construct kills the helper?

Variants (all grid=2000 steps, window [80, 768] resident):
  extract_mm:    16 lane-offset slices -> sublane concat [1280,128] ->
                 one dense mm -> sum. (extraction + dense matmul only)
  permute_only:  [1280,128] input -> reshape(16,80,128).swapaxes(0,1)
                 .reshape(80,2048) -> sum. (the relayout only)
  stacked_loopy: extraction -> two dense mms -> per-group y-DFT loop
                 (16 small [48,80]@[80,128] matmuls) -> lane concat ->
                 sum. (full replacement, NO swapaxes)
Writes /tmp/probe_stacked2.json.
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

  print('backend:', jax.default_backend(), flush=True)
  results = {}

  py, px, sx, G = 80, 80, 40, 16
  win_c = 768
  hp2 = 128
  hpy = 48        # padded y-spectrum sublanes (41 live)
  steps = 2000

  rng = np.random.RandomState(0)
  win_np = rng.rand(py, win_c).astype(np.float32)
  big_np = rng.rand(G * py, 128).astype(np.float32)
  fx_np = rng.rand(128, hp2).astype(np.float32)
  fy_np = rng.rand(hpy, py).astype(np.float32)

  def mmf(x, y):
    return jnp.dot(x.astype(jnp.bfloat16), y.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)

  def k_extract_mm(w_ref, fx_ref, out_ref):
    w = w_ref[:]
    parts = [jax.lax.slice(w, (0, g * sx), (py, g * sx + 128))
             for g in range(G)]
    p = jnp.concatenate(parts, axis=0)
    a = mmf(p, fx_ref[:])
    out_ref[:] = jnp.full((8, 128), jnp.sum(a), jnp.float32)

  def k_permute_only(b_ref, out_ref):
    a = b_ref[:]
    ar = a.reshape(G, py, 128).swapaxes(0, 1).reshape(py, G * 128)
    out_ref[:] = jnp.full((8, 128), jnp.sum(ar * ar), jnp.float32)

  def k_stacked_loopy(w_ref, fx_ref, fy_ref, out_ref):
    w = w_ref[:]
    parts = [jax.lax.slice(w, (0, g * sx), (py, g * sx + 128))
             for g in range(G)]
    p = jnp.concatenate(parts, axis=0)
    ar = mmf(p, fx_ref[:])    # [G*py, hp2]
    ai = mmf(p, fx_ref[:])
    fy = fy_ref[:]
    yr = jnp.concatenate(
        [mmf(fy, jax.lax.slice(ar, (g * py, 0), ((g + 1) * py, hp2)))
         for g in range(G)], axis=1)   # [hpy, G*hp2]
    yi = jnp.concatenate(
        [mmf(fy, jax.lax.slice(ai, (g * py, 0), ((g + 1) * py, hp2)))
         for g in range(G)], axis=1)
    out_ref[:] = jnp.full((8, 128), jnp.sum(yr) + jnp.sum(yi * yi),
                          jnp.float32)

  def build(kern, ins):
    f = pl.pallas_call(
        kern,
        grid=(steps,),
        in_specs=[pl.BlockSpec(a.shape, lambda i: (0, 0)) for a in ins],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((steps * 8, 128), jnp.float32),
    )
    return jax.jit(f)

  win_j = jnp.asarray(win_np)
  big_j = jnp.asarray(big_np)
  fx_j = jnp.asarray(fx_np)
  fy_j = jnp.asarray(fy_np)

  for name, kern, ins in [
      ('extract_mm', k_extract_mm, (win_j, fx_j)),
      ('permute_only', k_permute_only, (big_j,)),
      ('stacked_loopy', k_stacked_loopy, (win_j, fx_j, fy_j)),
  ]:
    try:
      fn = build(kern, ins)
      out = fn(*ins)
      chk = float(out[0, 0])
      ts = []
      for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*ins)
        float(jnp.sum(out[:, :1]))
        ts.append(time.perf_counter() - t0)
      t = sorted(ts)[1]
      results[name] = {'s': round(t, 4), 'us_per_step': round(
          t / steps * 1e6, 2), 'chk': chk}
      print(name, results[name], flush=True)
    except Exception as e:  # noqa: BLE001
      results[name] = {'error': f'{type(e).__name__}: {e}'[:200]}
      print(name, 'ERROR', results[name]['error'][:120], flush=True)
    with open('/tmp/probe_stacked2.json', 'w') as fh:
      json.dump(results, fh, indent=1)
  print('DONE', flush=True)


if __name__ == '__main__':
  main()
