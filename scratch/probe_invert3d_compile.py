"""Where do 167 s of invert_map(3d) cold time go? Split trace vs XLA
compile for _invert_section at the stitch3d geometry, and ablate
newton_iters / num_iters.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')


def main():
  import jax
  import jax.numpy as jnp
  from sofima_tpu import map_utils

  results = {}

  # stitch3d geometry: map [3, 4, 36, 36], query box (36, 40, 8) ->
  # query grid [3, 8, 40, 36].
  rng = np.random.RandomState(0)
  abs_map = rng.randn(3, 4, 36, 36).astype(np.float32) * 2.0
  q = rng.rand(3, 8, 40, 36).astype(np.float32) * 500.0
  src = np.zeros(3, np.float32)
  stride = np.full(3, 16.0, np.float32)

  for tag, kw in [
      ('fp32_n0', dict(num_iters=32, newton_iters=0)),
      ('fp32_n8', dict(num_iters=32, newton_iters=8)),
      ('fp8_n2', dict(num_iters=8, newton_iters=2)),
  ]:
    fn = lambda m, s, qq, st: map_utils._invert_section(
        m, s, qq, st, return_stats=True, **kw)
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(jnp.asarray(abs_map), jnp.asarray(src),
                                jnp.asarray(q), jnp.asarray(stride))
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    out, failed = compiled(jnp.asarray(abs_map), jnp.asarray(src),
                           jnp.asarray(q), jnp.asarray(stride))
    jax.block_until_ready(out)
    t3 = time.perf_counter()
    results[tag] = dict(trace_s=round(t1 - t0, 2),
                        compile_s=round(t2 - t1, 2),
                        run_s=round(t3 - t2, 3))
    print(tag, results[tag], flush=True)

  with open('/tmp/probe_invert3d_compile.json', 'w') as fh:
    json.dump(results, fh, indent=1)


if __name__ == '__main__':
  main()
