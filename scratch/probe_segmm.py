"""Hardware probe: segmented block-diagonal x-DFT.

Split the [py, win_c] window into S lane segments, each covering G/S
patch groups; per-segment block-diag DFT matrices shrink the structural
zero waste quadratically: flops = py*win_c*G*128/S (floor py*G*128^2).

  S=1 (current):  80*768*2048  = 126 M-mults per (re|im)
  S=4:            4*80*256*512 =  42 M
  S=8:            8*80*128*256 =  21 M  (floor)

Segments overlap (group g spans lanes g*sx..g*sx+px), slices are NOT
128-aligned — probes whether bare lane slices (no sublane concat)
compile. Output concat along lanes is aligned (multiples of 512/256).
Checks f32 agreement vs the S=1 matmul. Writes /tmp/probe_segmm.json.
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
  hp = 41
  hp2 = 128
  steps = 2000

  rng = np.random.RandomState(0)
  win_np = rng.rand(py, win_c).astype(np.float32)

  k = np.arange(hp)[None, :]
  c = np.arange(px)[:, None]
  fxr = np.cos(-2 * np.pi * k * c / px).astype(np.float32)
  fxi = np.sin(-2 * np.pi * k * c / px).astype(np.float32)

  def make_seg_mats(S):
    """Per-segment blockdiag mats: [S, seg_w, (G//S)*hp2] stacked."""
    gps = G // S                      # groups per segment
    seg_w = (gps - 1) * sx + px       # live lanes per segment
    seg_wp = -(-seg_w // 128) * 128   # padded to lane tiles
    mr = np.zeros((S, seg_wp, gps * hp2), np.float32)
    mi = np.zeros((S, seg_wp, gps * hp2), np.float32)
    for j in range(gps):
      mr[:, j * sx:j * sx + px, j * hp2:j * hp2 + hp] = fxr
      mi[:, j * sx:j * sx + px, j * hp2:j * hp2 + hp] = fxi
    return mr, mi, seg_wp

  def mmf(x, y, bf16):
    t = jnp.bfloat16 if bf16 else jnp.float32
    return jnp.dot(x.astype(t), y.astype(t),
                   preferred_element_type=jnp.float32)

  def k_seg(w_ref, mr_ref, mi_ref, out_ref, *, S, seg_wp, bf16):
    gps = G // S
    w = w_ref[:]
    ars, ais = [], []
    for s in range(S):
      off = s * gps * sx
      off = min(off, win_c - seg_wp)
      ws = jax.lax.slice(w, (0, off), (py, off + seg_wp))
      ars.append(mmf(ws, mr_ref[s], bf16))
      ais.append(mmf(ws, mi_ref[s], bf16))
    ar = jnp.concatenate(ars, axis=1)
    ai = jnp.concatenate(ais, axis=1)
    out_ref[:] = jnp.full((8, 128), jnp.sum(ar) + jnp.sum(ai * ai),
                          jnp.float32)

  def k_s1(w_ref, mr_ref, mi_ref, out_ref, *, bf16):
    w = w_ref[:]
    ar = mmf(w, mr_ref[:], bf16)
    ai = mmf(w, mi_ref[:], bf16)
    out_ref[:] = jnp.full((8, 128), jnp.sum(ar) + jnp.sum(ai * ai),
                          jnp.float32)

  def build(kern, ins):
    f = pl.pallas_call(
        kern,
        grid=(steps,),
        in_specs=[pl.BlockSpec(a.shape, functools.partial(
            lambda n, i: (0,) * n, a.ndim)) for a in ins],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((steps * 8, 128), jnp.float32),
    )
    return jax.jit(f)

  win_j = jnp.asarray(win_np)

  # S=1 baseline mats.
  frb = np.zeros((win_c, G * hp2), np.float32)
  fib = np.zeros((win_c, G * hp2), np.float32)
  for g in range(G):
    frb[g * sx:g * sx + px, g * hp2:g * hp2 + hp] = fxr
    fib[g * sx:g * sx + px, g * hp2:g * hp2 + hp] = fxi

  cases = [('s1_bf16', functools.partial(k_s1, bf16=True),
            (win_j, jnp.asarray(frb), jnp.asarray(fib))),
           ('s1_f32', functools.partial(k_s1, bf16=False),
            (win_j, jnp.asarray(frb), jnp.asarray(fib)))]
  for S in (4, 8):
    mr, mi, seg_wp = make_seg_mats(S)
    for bf16 in (True, False):
      cases.append((
          f's{S}_{"bf16" if bf16 else "f32"}',
          functools.partial(k_seg, S=S, seg_wp=seg_wp, bf16=bf16),
          (win_j, jnp.asarray(mr), jnp.asarray(mi))))

  for name, kern, ins in cases:
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
    with open('/tmp/probe_segmm.json', 'w') as fh:
      json.dump(results, fh, indent=1)

  base = results.get('s1_f32', {}).get('chk')
  for S in (4, 8):
    r = results.get(f's{S}_f32', {})
    if base and 'chk' in r:
      rel = abs(r['chk'] - base) / abs(base)
      results[f's{S}_f32_rel'] = rel
      print(f's{S} f32 rel diff vs s1: {rel:.2e}', flush=True)
  with open('/tmp/probe_segmm.json', 'w') as fh:
    json.dump(results, fh, indent=1)
  print('DONE', flush=True)


if __name__ == '__main__':
  main()
