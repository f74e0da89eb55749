"""Flow-field decorators (lazy TensorStore views).

Capability parity with /root/reference/decorators/flow.py: flow
estimation against a fixed volume (`OptimFlow`), flow cleaning
(`CleanFlowFilter`), per-chunk mesh relaxation (`MeshRelaxFlowFilter`)
and single-flow reconciliation (`ReconcileFlowFilter`). Output volumes
use the `fc, fz, fy, fx` label convention.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from sofima_tpu import flow_field as flow_field_lib
from sofima_tpu import flow_utils
from sofima_tpu import mesh as mesh_lib
from sofima_tpu.decorators.base import (Decorator, Filter, JsonSpec,
                                        MutableJsonSpec, register)


def _clean_flow(flow: np.ndarray, **filter_args) -> np.ndarray:
  final_shape = list(flow.shape)
  final_shape[0] -= 2
  return flow_utils.clean_flow(
      flow.squeeze(), dim=flow.shape[0] - 2,
      **filter_args).reshape(final_shape)


@register
class CleanFlowFilter(Filter):
  """Lazy flow cleaning; shrinks the channel dim by the 2 stat channels."""

  def __init__(self, min_chunksize: Optional[Sequence[int]] = None,
               context_spec: Optional[MutableJsonSpec] = None,
               **filter_args):
    super().__init__(filter_fun=_clean_flow, context_spec=context_spec,
                     min_chunksize=min_chunksize, **filter_args)

  def decorate(self, input_ts):
    import tensorstore as ts
    from sofima_tpu.decorators.base import (
        adjust_schema_for_chunksize, adjust_schema_for_virtual_chunked)

    def read_fn(domain, array, unused_params):
      read_domain = list(domain)
      read_domain[0] = ts.Dim(inclusive_min=0,
                              exclusive_max=input_ts.shape[0],
                              label=input_ts.domain.labels[0])
      array[...] = self._filter_fun(
          np.array(input_ts[ts.IndexDomain(read_domain)]),
          **self._filter_args)

    schema = input_ts.schema
    if self._min_chunksize is not None:
      schema = adjust_schema_for_chunksize(schema, self._min_chunksize)
    schema = adjust_schema_for_virtual_chunked(schema)
    json = schema.to_json()
    json['chunk_layout']['read_chunk']['shape'][0] -= 2
    json['chunk_layout']['write_chunk']['shape'][0] -= 2
    bound = json['domain']['exclusive_max'][0]
    # Implicit bounds are encoded as 1-element lists in the JSON schema.
    if isinstance(bound, list):
      bound[0] -= 2
    else:
      json['domain']['exclusive_max'][0] = bound - 2
    return ts.virtual_chunked(read_fn, schema=ts.Schema(json),
                              context=self._context)


def _mesh_relax_flow(flow: np.ndarray, **filter_args) -> np.ndarray:
  import jax.numpy as jnp
  cfg = mesh_lib.IntegrationConfig(**filter_args)
  squeezed = flow.squeeze()
  x = jnp.zeros_like(jnp.asarray(squeezed))
  dim = flow.shape[0]
  if dim == 2:
    res = mesh_lib.relax_mesh(x, jnp.asarray(squeezed), cfg)
  elif dim == 3:
    res = mesh_lib.relax_mesh(x, jnp.asarray(squeezed), cfg,
                              mesh_force=mesh_lib.elastic_mesh_3d)
  else:
    raise ValueError(f'flow must have 2 or 3 channels, got {dim}')
  return np.asarray(res[0]).reshape(flow.shape)


@register
class MeshRelaxFlowFilter(Filter):
  """Lazy per-chunk mesh relaxation of a flow volume."""

  def __init__(self, min_chunksize: Optional[Sequence[int]] = None,
               context_spec: Optional[MutableJsonSpec] = None,
               **filter_args):
    super().__init__(filter_fun=_mesh_relax_flow, context_spec=context_spec,
                     min_chunksize=min_chunksize, **filter_args)


def _reconcile_flow(flow: np.ndarray, **filter_args) -> np.ndarray:
  return flow_utils.reconcile_flows(
      [flow.squeeze()], **filter_args).reshape(flow.shape)


@register
class ReconcileFlowFilter(Filter):
  """Lazy gradient/median/patch filtering of a single flow volume."""

  def __init__(self, min_chunksize: Optional[Sequence[int]] = None,
               context_spec: Optional[MutableJsonSpec] = None,
               **filter_args):
    super().__init__(filter_fun=_reconcile_flow, context_spec=context_spec,
                     min_chunksize=min_chunksize, **filter_args)


def _flow_shape(o, p, s):
  return np.ceil((o - p + 1) / s).astype(int)


def _padded_flow_shape(o, p, s):
  return _flow_shape(o, p, s) + p // s - 1


@register
class OptimFlow(Decorator):
  """Lazy flow estimation of the input volume against a fixed volume.

  Output dims: `fc` (flow + stat channels), `fz`, `fy`, `fx`, followed by
  any non-image input dims. With `pad=True` the flow grid is NaN-padded
  to patch/step alignment for downstream composition.
  """

  def __init__(self, fixed_spec: JsonSpec,
               image_dims: Sequence[str] = ('x', 'y'),
               context_spec: Optional[MutableJsonSpec] = None,
               patch_size: Sequence[int] = (32, 32),
               step_size: Sequence[int] = (16, 16),
               batch_size: int = 1,
               pad: bool = True,
               input_mask_spec: Optional[JsonSpec] = None,
               fixed_mask_spec: Optional[JsonSpec] = None,
               invert_masks: bool = False,
               jax_device: Optional[str] = None,
               **flow_args):
    super().__init__(context_spec)
    self._fixed_spec = fixed_spec
    self._image_dims = image_dims
    self._patch_zyx = tuple(patch_size[::-1])
    self._step_zyx = tuple(step_size[::-1])
    self._batch_size = batch_size
    self._pad = pad
    self._input_mask_spec = input_mask_spec
    self._fixed_mask_spec = fixed_mask_spec
    self._invert_masks = invert_masks
    self._jax_device = jax_device
    self._flow_args = flow_args

  def _check_compatible(self, input_ts, other_ts, what: str):
    if input_ts.domain.labels != other_ts.domain.labels:
      raise ValueError(f'Input and {what} must have the same labels: '
                       f'{input_ts.domain.labels} vs '
                       f'{other_ts.domain.labels}')
    if input_ts.shape != other_ts.shape:
      raise ValueError(f'Input and {what} must have the same shape: '
                       f'{input_ts.shape} vs {other_ts.shape}')

  def decorate(self, input_ts):
    import jax
    import tensorstore as ts

    fixed_ts = ts.open(self._fixed_spec).result()
    self._check_compatible(input_ts, fixed_ts, 'fixed volume')

    num_image_dims = len(self._image_dims)
    if num_image_dims not in (2, 3):
      raise ValueError('2 or 3 image dims required, got '
                       f'{num_image_dims}')
    for d in self._image_dims:
      if d not in input_ts.domain.labels:
        raise ValueError(f'image dim {d} not in {input_ts.domain.labels}')

    input_mask_ts = None
    if self._input_mask_spec is not None:
      input_mask_ts = ts.open(self._input_mask_spec).result()
      self._check_compatible(input_ts, input_mask_ts, 'input mask')
    fixed_mask_ts = None
    if self._fixed_mask_spec is not None:
      fixed_mask_ts = ts.open(self._fixed_mask_spec).result()
      self._check_compatible(input_ts, fixed_mask_ts, 'fixed mask')

    non_image_dims = [l for l in input_ts.domain.labels
                      if l not in self._image_dims]
    input_domain = {dim.label: dim for dim in list(input_ts.domain)}

    def read_fn(domain, array, unused_params):
      domain_dict = {dim.label: dim for dim in list(domain)}
      read_domain = ts.IndexDomain(
          [domain_dict[l] for l in non_image_dims]
          + [input_domain[l] for l in self._image_dims])

      def get_mask(mask_ts):
        if mask_ts is None:
          return None
        m = np.array(mask_ts[read_domain], dtype=bool).squeeze().T
        return ~m if self._invert_masks else m

      device_ctx = (jax.default_device(jax.devices(self._jax_device)[0])
                    if self._jax_device else _nullcontext())
      with device_ctx:
        mfc = flow_field_lib.JAXMaskedXCorrWithStatsCalculator()
        flow = mfc.flow_field(
            pre_image=np.array(input_ts[read_domain],
                               dtype=np.float32).squeeze().T,
            post_image=np.array(fixed_ts[read_domain],
                                dtype=np.float32).squeeze().T,
            pre_mask=get_mask(input_mask_ts),
            post_mask=get_mask(fixed_mask_ts),
            patch_size=self._patch_zyx,
            step=self._step_zyx,
            batch_size=self._batch_size,
            **self._flow_args)

      if num_image_dims == 2:
        flow = np.asarray(flow[:, np.newaxis])

      if self._pad:
        pad_total = (np.array(self._patch_zyx)
                     // np.array(self._step_zyx) - 1)
        pad_left = (np.array(self._patch_zyx)
                    // np.array(self._step_zyx) // 2)
        pad_width = [(0, 0)]
        if num_image_dims == 2:
          pad_width.append([0, 0])
        for left, total in zip(pad_left, pad_total):
          pad_width.append([left, total - left])
        array[...] = np.pad(flow, pad_width,
                            constant_values=np.nan).reshape(array.shape)
      else:
        array[...] = flow.reshape(array.shape)

    labels = ['fc', 'fz', 'fy', 'fx'] + non_image_dims
    flow_shape = {'fc': num_image_dims + 2}
    if num_image_dims == 2:
      flow_shape['fz'] = 1
    calc = _padded_flow_shape if self._pad else _flow_shape
    for i, l in enumerate(self._image_dims):
      flow_shape[labels[3 - i]] = calc(
          o=input_domain[l].size, p=self._patch_zyx[-1 - i],
          s=self._step_zyx[-1 - i])

    chunksize = [1 if l in non_image_dims else int(flow_shape[l])
                 for l in labels]
    schema = {
        'chunk_layout': {'read_chunk': {'shape': chunksize},
                         'write_chunk': {'shape': chunksize}},
        'domain': {
            'labels': labels,
            'inclusive_min': [0] * 4 + [
                input_domain[l].inclusive_min for l in non_image_dims],
            'exclusive_max': [int(flow_shape[l]) for l in labels[:4]] + [
                input_domain[l].exclusive_max for l in non_image_dims],
        },
        'dtype': 'float32',
        'rank': len(chunksize),
    }
    import tensorstore as ts
    return ts.virtual_chunked(read_fn, schema=ts.Schema(schema),
                              context=self._context)


class _nullcontext:

  def __enter__(self):
    return None

  def __exit__(self, *args):
    return False
