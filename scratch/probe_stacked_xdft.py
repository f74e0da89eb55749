"""Hardware probe: patch-stacked x-DFT vs block-diagonal frb matmul.

The round-4 profile pins the targeted fine kernel at ~39 us/step where
~2.0 of the 2.8 GFLOP/step are the frb block-diagonal x-DFT matmuls
(>90% structurally zero). This probes the replacement construct on the
relay before building it into pallas_flow:

  stacked:   extract G lane-offset patch slices from the window,
             concat along sublanes -> P [G*py, 128], TWO dense
             [G*py,128]@[128,128] matmuls, then a sublane permute
             [G,py,hp2] -> [py, G*hp2] to restore the grouped-spectrum
             layout the y-DFT consumes.
  blockdiag: the current mm(w, frb[win_c, G*128]) pair.

Checks numerical agreement (same math, different contraction order)
and times both at grid=2000 steps. Writes /tmp/probe_stacked.json.
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

  py, px, sx, G = 80, 80, 40, 16
  win_c = 768
  hp = 41          # rfft bins of an 80-point DFT
  hp2 = 128        # padded per-patch spectrum lane block (re 0:41, im 64:105)
  steps = 2000

  rng = np.random.RandomState(0)
  win_np = rng.rand(py, win_c).astype(np.float32)

  # Reference DFT matrices.
  k = np.arange(hp)[None, :]
  c = np.arange(px)[:, None]
  fxr = np.cos(-2 * np.pi * k * c / px).astype(np.float32)  # [px, hp]
  fxi = np.sin(-2 * np.pi * k * c / px).astype(np.float32)

  # frb/fib: [win_c, G*hp2], block g rows 40g..40g+px, cols g*hp2..+hp.
  frb = np.zeros((win_c, G * hp2), np.float32)
  fib = np.zeros((win_c, G * hp2), np.float32)
  for g in range(G):
    frb[g * sx:g * sx + px, g * hp2:g * hp2 + hp] = fxr
    fib[g * sx:g * sx + px, g * hp2:g * hp2 + hp] = fxi

  # Stacked matrices: [128, hp2] (rows >= px are zero).
  fxr_s = np.zeros((128, hp2), np.float32)
  fxi_s = np.zeros((128, hp2), np.float32)
  fxr_s[:px, :hp] = fxr
  fxi_s[:px, :hp] = fxi

  def kernel_blockdiag(w_ref, frb_ref, fib_ref, out_ref, *, bf16):
    in_t = jnp.bfloat16 if bf16 else jnp.float32

    def mm(x, y):
      return jnp.dot(x.astype(in_t), y.astype(in_t),
                     preferred_element_type=jnp.float32)

    w = w_ref[:]
    ar = mm(w, frb_ref[:])
    ai = mm(w, fib_ref[:])
    out_ref[:] = jnp.full((8, 128), jnp.sum(ar) + jnp.sum(ai * ai),
                          jnp.float32)

  def kernel_stacked(w_ref, fxr_ref, fxi_ref, out_ref, *, bf16):
    in_t = jnp.bfloat16 if bf16 else jnp.float32

    def mm(x, y):
      return jnp.dot(x.astype(in_t), y.astype(in_t),
                     preferred_element_type=jnp.float32)

    w = w_ref[:]
    # Extraction: G lane-offset slices -> [G*py, 128].
    parts = [jax.lax.slice(w, (0, g * sx), (py, g * sx + 128))
             for g in range(G)]
    p = jnp.concatenate(parts, axis=0)
    ars = mm(p, fxr_ref[:])   # [G*py, hp2]
    ais = mm(p, fxi_ref[:])
    # Sublane permute back to the grouped-spectrum layout [py, G*hp2].
    ar = (ars.reshape(G, py, hp2).swapaxes(0, 1)
          .reshape(py, G * hp2))
    ai = (ais.reshape(G, py, hp2).swapaxes(0, 1)
          .reshape(py, G * hp2))
    out_ref[:] = jnp.full((8, 128), jnp.sum(ar) + jnp.sum(ai * ai),
                          jnp.float32)

  def build(kern, mats, bf16):
    f = pl.pallas_call(
        functools.partial(kern, bf16=bf16),
        grid=(steps,),
        in_specs=[pl.BlockSpec((py, win_c), lambda i: (0, 0))] + [
            pl.BlockSpec(m.shape, lambda i: (0, 0)) for m in mats],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((steps * 8, 128), jnp.float32),
    )
    return jax.jit(lambda w, *m: f(w, *m))

  win_j = jnp.asarray(win_np)
  mats_b = (jnp.asarray(frb), jnp.asarray(fib))
  mats_s = (jnp.asarray(fxr_s), jnp.asarray(fxi_s))

  for name, kern, mats, bf16 in [
      ('blockdiag_bf16', kernel_blockdiag, mats_b, True),
      ('stacked_bf16', kernel_stacked, mats_s, True),
      ('blockdiag_f32', kernel_blockdiag, mats_b, False),
      ('stacked_f32', kernel_stacked, mats_s, False),
  ]:
    try:
      fn = build(kern, mats, bf16)
      out = fn(win_j, *mats)
      chk = float(out[0, 0])
      ts = []
      for _ in range(3):
        t0 = time.perf_counter()
        out = fn(win_j, *mats)
        float(jnp.sum(out))
        ts.append(time.perf_counter() - t0)
      t = sorted(ts)[1]
      results[name] = {'s': round(t, 4), 'us_per_step': round(
          t / steps * 1e6, 2), 'chk': chk}
      print(name, results[name], flush=True)
    except Exception as e:  # noqa: BLE001
      results[name] = {'error': f'{type(e).__name__}: {e}'[:300]}
      print(name, 'ERROR', results[name]['error'][:160], flush=True)
    with open('/tmp/probe_stacked.json', 'w') as fh:
      json.dump(results, fh, indent=1)

  # Numerical agreement (f32 paths must agree to float noise).
  if ('blockdiag_f32' in results and 's' in results['blockdiag_f32']
      and 's' in results.get('stacked_f32', {})):
    a = results['blockdiag_f32']['chk']
    b = results['stacked_f32']['chk']
    results['f32_rel_diff'] = abs(a - b) / max(abs(a), 1e-9)
    print('f32 rel diff:', results['f32_rel_diff'], flush=True)
  with open('/tmp/probe_stacked.json', 'w') as fh:
    json.dump(results, fh, indent=1)
  print('DONE ' + json.dumps(results), flush=True)


if __name__ == '__main__':
  main()
