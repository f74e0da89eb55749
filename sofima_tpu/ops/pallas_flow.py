"""Fused Pallas kernel for the dense-flow correlation hot path.

The XLA strip pipeline computes the circular DFT-matmul correlation as a
chain of einsums whose [b, n, h] spectra intermediates round-trip
through HBM between stages — measured memory-bound on v5e (bf16 matmul
inputs change nothing; ~0.14 s of the 10k^2 flow kernel). This kernel
keeps the entire per-patch pipeline (mean subtraction -> forward rDFT ->
cross-power -> inverse rDFT -> center roll) in VMEM: per grid step a
small group of patches is loaded, all twelve matmuls run back-to-back on
the MXU with float32 accumulation (optionally bfloat16 inputs), and only
the final correlation surfaces are written back.

Replaces the compute core of flow_field._circular_xcorr_matmul
(numerically identical in f32 mode); the surrounding peak extraction
stays in XLA (see flow_field._batched_peaks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_kernel(a_ref, b_ref, wr1, wi1, fr2, fi2, br2, bi2, out_ref,
                 *, mean, bf16):
  """One group of patches: fused circular NCC correlation surfaces."""
  group, n1, n2 = a_ref.shape
  in_t = jnp.bfloat16 if bf16 else jnp.float32

  def mm(x, y):
    return jnp.dot(x.astype(in_t), y.astype(in_t),
                   preferred_element_type=jnp.float32)

  for g in range(group):
    a = a_ref[g]
    b = b_ref[g]
    if mean is None:
      a = a - jnp.mean(a)
      b = b - jnp.mean(b)
    else:
      a = a - mean
      b = b - mean

    def rdft2(img):
      ar = mm(img, fr2[:])       # [n1, h]
      ai = mm(img, fi2[:])
      re = mm(wr1[:], ar) - mm(wi1[:], ai)
      im = mm(wr1[:], ai) + mm(wi1[:], ar)
      return re, im

    pr, pi = rdft2(a)
    qr, qi = rdft2(b)
    cr = pr * qr + pi * qi       # F(a) * conj(F(b))
    ci = pi * qr - pr * qi
    gr = (mm(wr1[:], cr) + mm(wi1[:], ci)) / n1
    gi = (mm(wr1[:], ci) - mm(wi1[:], cr)) / n1
    corr = (mm(gr, br2[:]) + mm(gi, bi2[:])) / n2
    # Center the zero-shift bin (matches jnp.roll in the XLA path).
    corr = pltpu.roll(corr, n1 // 2, 0)
    corr = pltpu.roll(corr, n2 // 2, 1)
    out_ref[g] = corr


@functools.partial(
    jax.jit, static_argnames=['mean', 'bf16', 'group', 'interpret'])
def corr_patches_pallas(
    a: jnp.ndarray,
    b: jnp.ndarray,
    mean: float | None = None,
    bf16: bool = False,
    group: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
  """Centered circular cross-correlation surfaces for a patch batch.

  Args:
    a, b: [n, p1, p2] float32 patch batches (equal shapes)
    mean: constant to subtract instead of per-patch means
    bf16: bfloat16 matmul inputs with float32 accumulation (~4x MXU peak;
      integer-peak parity verified by tests)
    group: patches per grid step (VMEM working-set size)
    interpret: Pallas interpreter mode (CPU testing)

  Returns:
    [n, p1, p2] float32 correlation surfaces, zero-shift bin centered at
    (p1//2, p2//2) — the layout flow_field._batched_peaks consumes.
  """
  from sofima_tpu import flow_field

  n, n1, n2 = a.shape
  group = max(1, min(group, n))
  padded = -(-n // group) * group
  if padded != n:
    a = jnp.pad(a, ((0, padded - n), (0, 0), (0, 0)))
    b = jnp.pad(b, ((0, padded - n), (0, 0), (0, 0)))

  wr1, wi1 = (jnp.asarray(m) for m in flow_field._dft_mats(n1))
  fr2, fi2, br2, bi2 = (jnp.asarray(m) for m in flow_field._rdft_mats(n2))

  block = pl.BlockSpec((group, n1, n2), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
  mat = lambda m: pl.BlockSpec(m.shape, lambda i: (0,) * m.ndim,
                               memory_space=pltpu.VMEM)
  flops_per = 12 * n1 * n1 * (n2 // 2 + 1) * 2
  out = pl.pallas_call(
      functools.partial(_corr_kernel, mean=mean, bf16=bf16),
      grid=(padded // group,),
      in_specs=[block, block, mat(wr1), mat(wi1), mat(fr2), mat(fi2),
                mat(br2), mat(bi2)],
      out_specs=block,
      out_shape=jax.ShapeDtypeStruct((padded, n1, n2), jnp.float32),
      cost_estimate=pl.CostEstimate(
          flops=flops_per * padded,
          bytes_accessed=(2 * padded * n1 * n2 * 4) * 2,
          transcendentals=0),
      interpret=interpret,
  )(a, b, wr1, wi1, fr2, fi2, br2, bi2)
  return out[:n]
