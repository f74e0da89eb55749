"""Hardware probe: guard='mask' vs guard='pad' in the fused 3d solver.

The pad guard's +1 ring pushes the (8, 128, 256) bench mesh to a
(10, 136, 384) padded kernel — 2.0x the real nodes. guard='mask' keeps
the array at its native aligned extents and masks wrapped reads with
per-link iota bounds (extra VPU compares per link, but on half the
nodes). Measures GLUPS for both on the bench-shaped LICONN mesh and
checks output parity on-device.
"""

import time

import numpy as np


def main():
  import jax
  try:
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
  except Exception:
    pass
  import jax.numpy as jnp
  from sofima_tpu import mesh
  from sofima_tpu.ops import pallas_mesh

  cfg = mesh.IntegrationConfig(
      dt=0.001, gamma=0.0, k0=0.01, k=0.1, stride=(40.0, 40.0, 40.0),
      num_iters=500, max_iters=1000, stop_v_max=0.0, dt_max=100.0)
  rng = np.random.RandomState(0)
  x = jax.device_put(rng.randn(3, 8, 128, 256).astype(np.float32))
  prev = jnp.zeros_like(x)

  def timeit(fn):
    out = fn()
    float(jnp.nansum(out[0][:, ::3, ::7, ::13]))
    ts = []
    for _ in range(3):
      t0 = time.perf_counter()
      out = fn()
      float(jnp.nansum(out[0][:, ::3, ::7, ::13]))
      ts.append(time.perf_counter() - t0)
    ts.sort()
    return out, ts[1], ts[-1] - ts[0]

  n_lups = cfg.max_iters * 8 * 128 * 256

  outs = {}
  for guard in ('pad', 'mask'):
    try:
      out, t, sp = timeit(lambda g=guard: pallas_mesh.relax_mesh_fused_pallas_3d(
          x, prev, cfg, link_loop=True, symmetric=True, guard=g))
      outs[guard] = out[0]
      print(f'guard={guard}: {t:.3f}s spread {sp:.3f}s '
            f'-> {n_lups / t / 1e9:.2f} GLUPS, steps={int(out[2])}',
            flush=True)
    except Exception as e:
      print(f'guard={guard}: FAILED {type(e).__name__}: {e}', flush=True)

  if len(outs) == 2:
    d = float(jnp.nanmax(jnp.abs(outs['pad'] - outs['mask'])))
    print(f'max |pad - mask| = {d:.2e}', flush=True)


if __name__ == '__main__':
  main()
