"""Device-resident serial-section stack alignment (the TPU pipeline).

The reference's production chain (SURVEY.md §3.3; em_alignment notebook,
/root/reference/processor layers) runs flow -> clean -> solve -> invert
-> render as separate stages with materialized volumes between them. On
TPU the whole per-section chain compiles into ONE jit program:

  1. FLOW    coarse-to-fine dense grid (flow_field.coarse_to_fine_flow)
  2. CLEAN   clean_flow_device quality gates
  3. SOLVE   relax_mesh_fused, warm-started from the spring targets
  4. INVERT  fixed-point map inversion + harmonic hole fill
  5. RENDER  per-tile-base Pallas Lanczos warp with a device-computed
             plan (shift_warp.tiled_plan_device) and a tight static
             residual envelope

There is NO host synchronization anywhere in the chain: section z's
solve feeds section z+1's compose as a device array, plans are computed
on device, and the only d2h is whatever checksum or statistic the
caller fetches at the end. On a relay-attached or pod deployment this
is the difference between streaming and stalling.

Static shape contract: all sections share one (square) shape and one
patch/stride geometry, so the per-section program compiles once.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from sofima_tpu import flow_field
from sofima_tpu import flow_utils
from sofima_tpu import map_utils
from sofima_tpu import mesh
from sofima_tpu.ops import fill as fill_ops
from sofima_tpu.ops import interp as interp_ops
from sofima_tpu.ops import pallas_warp
from sofima_tpu.ops import shift_warp


@dataclasses.dataclass(frozen=True)
class StackAlignConfig:
  """Static configuration of the fused per-section pipeline step."""
  patch: int = 160
  stride: int = 40
  coarse_to_fine: bool = True
  # Fine-pass patch edge for coarse_to_fine (None = patch // 2). Smaller
  # is faster (the correlation is O(edge^3) per patch) at some
  # statistical robustness cost; capture range is set by the coarse
  # prior, not this.
  fine_patch: int | None = None
  bf16: bool = True
  # clean_flow gates (EM-2D defaults, processor/defaults/em_2d.py).
  min_peak_ratio: float = 1.6
  min_peak_sharpness: float = 1.6
  max_magnitude: float = 80.0
  max_deviation: float = 20.0
  # Render/warp static envelopes (see flow_field.coarse_to_fine_flow).
  # The residual envelope directly sizes the render's shift lattice
  # ((residual*2 + taps)^2 iterations/pixel): keep it as tight as the
  # per-tile displacement variation allows — the `overflow` output
  # flags a too-small choice.
  max_displacement: int = 96
  residual: int = 8
  method: str = 'lanczos'
  # Newton refinement iterations for the map inversion (folds cannot
  # occur in a freshly-relaxed smooth mesh, so a few suffice).
  invert_newton_iters: int = 4
  # Solver protocol: start_cap=1.0 (not the archival 0.01) — with the
  # fused whole-loop kernel the cap escalation 0.01 -> 10 at 1.1x per
  # converged chunk otherwise forces EVERY section to burn the full
  # max_iters budget (~0.5 s/section measured); flows here are already
  # clean_flow-gated, so early settling needs far less clamping.
  # Fold safety is retained (prefer_orig_order + final cap 10).
  mesh: mesh.IntegrationConfig = dataclasses.field(
      default_factory=lambda: mesh.IntegrationConfig(
          dt=0.001, gamma=0.0, k0=0.1, k=0.1, stride=(40.0, 40.0),
          num_iters=500, max_iters=8000, stop_v_max=0.005,
          dt_max=100.0, start_cap=1.0, final_cap=10.0, cap_scale=1.1,
          prefer_orig_order=True))


@functools.partial(jax.jit, static_argnames=['cfg'])
def align_step(sec_prev: jnp.ndarray, sec_cur: jnp.ndarray,
               solved_prev: jnp.ndarray, cfg: StackAlignConfig):
  """One fused pipeline step: returns (solved, rendered, overflow).

  Args:
    sec_prev/sec_cur: [n, n] raw adjacent sections (uint8 or float)
    solved_prev: [2, 1, G, G] relative mesh of the previous section
      (zeros for the first moving section); G = n // stride
    cfg: static configuration

  Returns:
    solved: [2, 1, G, G] relative mesh for sec_cur
    rendered: [n, n] float32 sec_cur rendered into the aligned frame
    overflow: bool scalar — render displacement exceeded the static
      envelope somewhere (affected border pixels render as zeros)
  """
  n = sec_cur.shape[-1]
  p, s = cfg.patch, cfg.stride
  pre = sec_prev.astype(jnp.float32)
  post = sec_cur.astype(jnp.float32)

  # 1. FLOW (grid identical to dense_flow_field(patch, stride)).
  if cfg.coarse_to_fine:
    fp = None if cfg.fine_patch is None else (cfg.fine_patch,
                                              cfg.fine_patch)
    f4 = flow_field.coarse_to_fine_flow(
        pre, post, (p, p), (s, s), fine_patch=fp, bf16=cfg.bf16,
        max_displacement=cfg.max_displacement, residual=cfg.residual)
  else:
    f4 = flow_field.dense_flow_field(
        pre, post, (p, p), (s, s), batch_size=256, circular=True,
        dft_matmul=True, bf16=cfg.bf16)

  # 2. CLEAN.
  clean = flow_utils.clean_flow_device(
      f4[:, None], cfg.min_peak_ratio, cfg.min_peak_sharpness,
      cfg.max_magnitude, cfg.max_deviation)

  grid_n = n // s
  pad = p // 2 // s
  full = jnp.full((2, 1, grid_n, grid_n), jnp.nan, jnp.float32)
  full = jax.lax.dynamic_update_slice(full, clean, (0, 0, pad, pad))

  # 3. SOLVE: prev targets = flow composed with the already-solved
  # reference mesh (processor/mesh.py compute_ref_mesh); warm-start from
  # the targets themselves (NaN -> previous solution) — the k0 springs
  # then begin satisfied and FIRE only has to relax elastic smoothness.
  zero3 = np.zeros(3, np.float32)
  prev = map_utils.compose_maps_fast(full, zero3, float(s), solved_prev,
                                     zero3, float(s))
  x0 = jnp.where(jnp.isnan(prev), solved_prev, prev)
  interpret = jax.default_backend() not in ('tpu', 'axon')
  fits_vmem = grid_n * grid_n * 32 <= 24 * 1024 * 1024
  if fits_vmem and not cfg.mesh.remove_drift:
    # Whole convergence loop in ONE kernel launch: on section-sized
    # grids the staged solver is bound by per-step op dispatch, not
    # arithmetic (ops.pallas_mesh.relax_mesh_fused_pallas).
    from sofima_tpu.ops import pallas_mesh
    solved, _, _ = pallas_mesh.relax_mesh_fused_pallas(
        x0, prev, cfg.mesh, interpret=interpret)
  else:
    solved, _, _ = mesh.relax_mesh_fused(x0, prev, cfg.mesh)

  # 4. INVERT (device fixed point) + harmonic fill of failed nodes.
  node = jnp.arange(grid_n, dtype=jnp.float32) * s
  qx = jnp.broadcast_to(node[None, :], (grid_n, grid_n))
  qy = jnp.broadcast_to(node[:, None], (grid_n, grid_n))
  query = jnp.stack([qx, qy])  # xy channels, physical pixels
  abs_map = solved[:, 0] + query
  zeros2 = jnp.zeros(2, jnp.float32)
  stride2 = jnp.full((2,), float(s), jnp.float32)
  inv_abs = map_utils._invert_section(
      abs_map, zeros2, query, stride2,
      newton_iters=cfg.invert_newton_iters,
      shift_bound=-(-cfg.max_displacement // s) + 1)
  rel_inv = inv_abs - query
  valid = jnp.isfinite(rel_inv[0]) & jnp.isfinite(rel_inv[1])
  rel_inv = fill_ops.fill_invalid(rel_inv, valid, extrapolate=True)
  inv_abs = rel_inv + query

  # 5. RENDER via the pruned tiled shift kernel, plan computed on device.
  node_np = np.arange(grid_n, dtype=np.float64) * s
  md = -(-cfg.max_displacement // 64) * 64
  env_r = (-cfg.residual, cfg.residual, -cfg.residual, cfg.residual)
  env_b = (-md, md, -md, md)
  dplan = shift_warp.tiled_plan_device(
      rel_inv[1][None], rel_inv[0][None], node_np, node_np, (n, n),
      env_r, env_b)
  dense = interp_ops.upsample_map_linear(
      jnp.stack([inv_abs[1], inv_abs[0]]), s, (0, 0), (n, n))
  coords = dense[None]  # [1, 2 (y, x), n, n]
  # NOTE: tile_bounds pruning is deliberately NOT used — measured on
  # v5e, pl.when region entry costs (~1us x regions x tiles) exceed the
  # skipped work; the tight static envelope above is the fast path.
  rendered = pallas_warp.pallas_shift_warp_tiled(
      post[None], coords, dplan['bases'], cfg.method, *env_r, *env_b,
      *dplan['tile'], interpret=interpret)[0]
  return solved, rendered, dplan['overflow']


def align_stack(stack, cfg: StackAlignConfig = StackAlignConfig()):
  """Aligns a [Z, n, n] stack; returns (rendered [Z, n, n] f32, solved).

  Host loop, but every iteration only enqueues device work (the solved
  mesh flows z -> z+1 as a device array) — fetch the outputs (or a
  checksum) once at the end.
  """
  stack = jnp.asarray(stack)
  z_dim, n, _ = stack.shape
  grid_n = n // cfg.stride
  solved = jnp.zeros((2, 1, grid_n, grid_n), jnp.float32)
  rendered = [stack[0].astype(jnp.float32)]
  solved_all = [solved]
  overflow = jnp.bool_(False)
  for z in range(1, z_dim):
    solved, r, ov = align_step(stack[z - 1], stack[z], solved, cfg)
    rendered.append(r)
    solved_all.append(solved)
    overflow = jnp.logical_or(overflow, ov)
  return jnp.stack(rendered), jnp.stack(solved_all), overflow
