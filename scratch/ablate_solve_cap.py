"""Solve-phase cap-protocol ablation (round 4, late session).

The fused FIRE solve burns ~25 cap escalations (start_cap 1.0 -> 10 at
x1.1 per 100 positive-power steps / converged chunk) even when the k0
clamp never binds: with clean_flow-gated targets and a warm start ON
the targets, |x - prev| at the solution is typically << cap/k0 = 10 px,
so the ramp is semantically a no-op that floors every section's solve
at ~2000+ iterations.

Measures, on hardware, the pipeline solve phase (scan over 15 synthetic
sections at the bench geometry G=250) for:
  a) headline protocol  start_cap=1.0, cap_scale=1.1, num_iters=250
  b) no-ramp            start_cap=10 (= final_cap)
  c) fast-ramp          cap_scale=1.6 (6 escalations)
and reports times, executed steps, and the MAX NODE DIFF of (b)/(c)
vs (a) — fixed-point equivalence evidence (the spring energy has one
minimum reachable by all three protocols when the clamp is slack).

Writes scratch/ablate_solve_cap.json.
"""

import dataclasses
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
  from sofima_tpu.pipeline import stack_align

  print('backend:', jax.default_backend(), flush=True)
  results = {}

  grid_n = 250
  n_z = 15
  pad = 2  # patch 160 // 2 // stride 40
  gm_y, gm_x = np.mgrid[:grid_n, :grid_n].astype(np.float32) * 40.0
  flows = []
  rng = np.random.RandomState(0)
  for z in range(n_z):
    # Bench-like drift + waves + clean_flow-style NaN dropout.
    dy = 2.5 + 1.2 * np.sin(2 * np.pi * gm_x / 2500.0 + 0.7 * z)
    dx = -2.0 + 1.1 * np.cos(2 * np.pi * gm_y / 2500.0 + 0.4 * z)
    f = np.stack([dy, dx])[:, None]  # [2, 1, G, G]
    f += rng.randn(*f.shape).astype(np.float32) * 0.3
    drop = rng.rand(grid_n, grid_n) < 0.03
    f[:, :, drop] = np.nan
    f[:, :, :pad] = np.nan
    f[:, :, -pad:] = np.nan
    f[:, :, :, :pad] = np.nan
    f[:, :, :, -pad:] = np.nan
    flows.append(f.astype(np.float32))
  flows_j = jnp.asarray(np.stack(flows))

  def solve_all(cfg):
    @jax.jit
    def run(fl):
      def one(sp, ff):
        s = stack_align._solve_phase(ff, sp, cfg)
        return s, s
      z0 = jnp.zeros((2, 1, grid_n, grid_n), jnp.float32)
      _, out = jax.lax.scan(one, z0, fl)
      # Scalar fetched per run = the execution barrier (block_until_
      # ready can return before remote execution completes on the axon
      # relay — ROADMAP env facts).
      return out, jnp.nansum(out)
    out, chk = run(flows_j)
    float(chk)
    ts = []
    for _ in range(3):
      t0 = time.perf_counter()
      out, chk = run(flows_j)
      float(chk)
      ts.append(time.perf_counter() - t0)
    return out, sorted(ts)[1]

  base = stack_align.StackAlignConfig(max_displacement=128, residual=6,
                                      render_two_pass=True, peak_crop=32)
  base = dataclasses.replace(
      base, mesh=dataclasses.replace(base.mesh, num_iters=250))

  variants = {
      'headline_cap1.0': base.mesh,
      'noramp_cap10': dataclasses.replace(base.mesh, start_cap=10.0),
      'ramp1.6': dataclasses.replace(base.mesh, cap_scale=1.6),
      'noramp_ni125': dataclasses.replace(base.mesh, start_cap=10.0,
                                          num_iters=125),
  }
  sols = {}
  for name, mcfg in variants.items():
    cfg = dataclasses.replace(base, mesh=mcfg)
    out, t = solve_all(cfg)
    sols[name] = out  # device-resident; d2h of the full stack is ~4 min
    results[name + '_s'] = round(t, 4)
    print(name, round(t, 4), flush=True)

  ref = sols['headline_cap1.0']
  diff_fn = jax.jit(lambda a, b: jnp.nanmax(jnp.abs(a - b)))
  for name in variants:
    if name == 'headline_cap1.0':
      continue
    d = float(diff_fn(sols[name], ref))
    results[name + '_max_node_diff_px'] = round(d, 4)
    print(name, 'max node diff', round(d, 4), flush=True)

  with open('scratch/ablate_solve_cap.json', 'w') as f:
    json.dump(results, f, indent=1)
  print(json.dumps(results), flush=True)


if __name__ == '__main__':
  main()
