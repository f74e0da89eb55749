"""Flow-field filtering and reconciliation.

A flow field has the representation of a relative coordinate map
(see map_utils); channels 2+ optionally carry statistics (sharpness, peak
ratio). Invalid entries are NaN in the X and Y channels.

Capability parity with /root/reference/flow_utils.py, with the filtering
math (median deviation, gradient checks, connected-component pruning)
expressed as jit device programs (ops.morphology) instead of
scipy.ndimage host calls.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sofima_tpu.ops import morphology


def apply_mask(flow: np.ndarray, mask: np.ndarray) -> None:
  """NaNs out all channels of `flow` where `mask` is True (in place)."""
  for i in range(flow.shape[0]):
    flow[i, ...][mask] = np.nan


def clean_flow(flow: np.ndarray, min_peak_ratio: float,
               min_peak_sharpness: float, max_magnitude: float,
               max_deviation: float, dim: int = 2) -> np.ndarray:
  """Removes flow vectors that fail quality requirements.

  Args:
    flow: [c, z, y, x] flow; c == dim (+2 when sharpness/ratio channels
      are present)
    min_peak_ratio: min |peak ratio| (channel dim+1); ratio==0 (single
      peak) always passes
    min_peak_sharpness: min |sharpness| (channel dim)
    max_magnitude: max |component|; <=0 disables
    max_deviation: max |component - 3^dim-window median|; <=0 disables
    dim: spatial dimensionality of the flow vectors

  Returns:
    [dim or dim+1, z, y, x] filtered flow (extra channel kept only when
    the input has exactly dim+1 channels, e.g. multi-section Δz flows)
  """
  assert dim in (2, 3)
  assert dim <= flow.shape[0] <= dim + 2
  flow = np.asarray(flow, np.float32)

  if flow.shape[0] == dim + 2:
    ret = flow[:dim].copy()
    bad = np.abs(flow[dim]) < min_peak_sharpness
    ratio = np.abs(flow[dim + 1])
    bad |= (ratio > 0.0) & (ratio < min_peak_ratio)
  else:
    ret = flow.copy()
    bad = np.zeros(flow.shape[1:], dtype=bool)

  if max_magnitude > 0:
    bad |= np.max(np.abs(flow[:dim]), axis=0) > max_magnitude

  if max_deviation > 0:
    med = np.asarray(_median_per_section(jnp.nan_to_num(flow[:dim]), dim))
    bad |= np.max(np.abs(med - flow[:dim]), axis=0) > max_deviation

  apply_mask(ret, bad)
  return ret


def clean_flow_device(flow: jnp.ndarray, min_peak_ratio: float,
                      min_peak_sharpness: float, max_magnitude: float,
                      max_deviation: float, dim: int = 2) -> jnp.ndarray:
  """jit-traceable twin of `clean_flow` (same semantics, jnp in/out).

  Used by device-resident drivers (pipeline.stack_align) where the host
  round trip of the numpy version would serialize the stage chain.
  """
  assert dim in (2, 3)
  assert dim <= flow.shape[0] <= dim + 2
  flow = jnp.asarray(flow, jnp.float32)

  if flow.shape[0] == dim + 2:
    ret = flow[:dim]
    bad = jnp.abs(flow[dim]) < min_peak_sharpness
    ratio = jnp.abs(flow[dim + 1])
    bad = bad | ((ratio > 0.0) & (ratio < min_peak_ratio))
  else:
    ret = flow[:dim + 1] if flow.shape[0] == dim + 1 else flow
    bad = jnp.zeros(flow.shape[1:], bool)

  if max_magnitude > 0:
    bad = bad | (jnp.max(jnp.abs(flow[:dim]), axis=0) > max_magnitude)

  if max_deviation > 0:
    med = _median_per_section(jnp.nan_to_num(flow[:dim]), dim)
    bad = bad | (jnp.max(jnp.abs(med - flow[:dim]), axis=0)
                 > max_deviation)

  return jnp.where(bad[None], jnp.nan, ret)


def _median_per_section(flow: jnp.ndarray, dim: int) -> jnp.ndarray:
  """3^dim median filter over [c, z, y, x] flows (per-z window for 2d)."""
  if dim == 2:
    # [c, z, y, x] -> window over (y, x) only.
    return morphology.median_filter(flow, dims=2)
  return morphology.median_filter(flow, dims=3)


def _steep_gradient(comp: np.ndarray, axis: int,
                    limit: float) -> np.ndarray:
  """Entries whose difference to EITHER axis neighbor exceeds `limit`.

  Out-of-range neighbors count as 0 (see caller for the contract).
  NaN differences compare False, so invalid entries never flag their
  neighbors here.
  """
  axis = axis % comp.ndim
  pad = [(0, 0)] * comp.ndim
  pad[axis] = (1, 1)
  padded = np.pad(comp, pad)
  n = comp.shape[axis]
  before = np.take(padded, np.arange(n), axis=axis)
  after = np.take(padded, np.arange(2, n + 2), axis=axis)
  with np.errstate(invalid='ignore'):
    return ((np.abs(comp - before) > limit)
            | (np.abs(after - comp) > limit))


def reconcile_flows(flows: Sequence[np.ndarray], max_gradient: float,
                    max_deviation: float, min_patch_size: int,
                    min_delta_z: int = 0) -> np.ndarray:
  """Merges flows in preference order and invalidates inconsistencies.

  Args:
    flows: [c, z, y, x] arrays sorted by decreasing preference (c in 2, 3)
    max_gradient: max |flow gradient| forward+backward per axis; <=0 off
    max_deviation: max |component - 3x3 median|; <=0 off
    min_patch_size: min connected-component size (pixels); <=0 off
    min_delta_z: for 3-channel flows, min |Δz| for donor entries

  Returns:
    [c, z, y, x] reconciled flow
  """
  ret = np.array(flows[0], np.float32)
  assert ret.shape[0] in (2, 3)

  for f in flows[1:]:
    holes = np.repeat(np.isnan(ret[0:1]), ret.shape[0], 0)
    if ret.shape[0] == 3:
      holes &= np.repeat(np.abs(f[2:3]) >= min_delta_z, 3, 0)
    ret[holes] = np.asarray(f, np.float32)[holes]

  if max_gradient > 0:
    # Each component is checked along its own axis (x-flow along x,
    # y-flow along y) against BOTH of its axis neighbors; the virtual
    # neighbor beyond the array edge is 0, so border entries are judged
    # against their own magnitude. (Boundary convention pinned by the
    # reference contract, /root/reference/flow_utils.py:110-116.)
    bad = _steep_gradient(ret[0], -1, max_gradient)
    bad |= _steep_gradient(ret[1], -2, max_gradient)
    apply_mask(ret, bad)

  if max_deviation > 0:
    med = np.asarray(
        morphology.median_filter(jnp.nan_to_num(ret), dims=2))
    bad = np.max(np.abs(med - ret)[:2], axis=0) > max_deviation
    apply_mask(ret, bad)

  if min_patch_size > 0:
    valid = ~np.any(np.isnan(ret), axis=0)
    small = np.asarray(
        jax.vmap(lambda v: morphology.small_component_mask(
            v, min_patch_size))(jnp.asarray(valid)))
    apply_mask(ret, small)

  return ret
