"""Device-resident stack-alignment pipeline (pipeline.stack_align)."""

import jax.numpy as jnp
import numpy as np

from sofima_tpu.ops import interp


def _texture(n, seed=0):
  rng = np.random.RandomState(seed)
  noise = rng.rand(n, n).astype(np.float32)
  f = np.fft.rfft2(noise)
  fy = np.fft.fftfreq(n)[:, None]
  fx = np.fft.rfftfreq(n)[None, :]
  f *= np.exp(-((fx**2 + fy**2) / (2 * 0.08**2)))
  tex = np.fft.irfft2(f, s=(n, n))
  tex = (tex - tex.min()) / np.ptp(tex)
  return (tex * 255).astype(np.float32)


def _make_stack(n, n_z):
  """Stack with cumulative smooth drift + deformation; returns stack."""
  base = _texture(n)
  yy, xx = np.mgrid[:n, :n].astype(np.float32)
  sections = [base]
  for z in range(1, n_z):
    # Cumulative displacement: drift + low-frequency wobble.
    dy = 3.0 * z + 4.0 * np.sin(2 * np.pi * xx / n + z)
    dx = -2.0 * z + 4.0 * np.cos(2 * np.pi * yy / n + 0.5 * z)
    coords = jnp.stack([jnp.asarray(yy + dy), jnp.asarray(xx + dx)])
    sec = interp.sample(jnp.asarray(base), coords, method='linear',
                        mode='nearest')
    sections.append(np.asarray(sec))
  return np.stack(sections).astype(np.uint8)


class TestStackAlign:

  def test_aligns_drifting_stack(self):
    from sofima_tpu.pipeline import stack_align
    n, n_z = 800, 4
    stack = _make_stack(n, n_z)
    cfg = stack_align.StackAlignConfig(max_displacement=64, residual=16)
    rendered, solved, overflow = stack_align.align_stack(stack, cfg)
    rendered = np.asarray(rendered)
    assert rendered.shape == (n_z, n, n)
    assert solved.shape[0] == n_z
    assert not bool(overflow)

    interior = np.s_[160:-160, 160:-160]
    raw = stack.astype(np.float32)
    for z in range(1, n_z):
      before = np.abs(raw[z][interior] - raw[z - 1][interior]).mean()
      after = np.abs(rendered[z][interior]
                     - rendered[z - 1][interior]).mean()
      # Aligned neighbors must be far closer than raw neighbors.
      assert after < before / 3, (z, before, after)

  def test_identity_stack_is_stable(self):
    # No motion: the solve should stay ~zero and the render ~identity.
    from sofima_tpu.pipeline import stack_align
    n = 640
    base = _texture(n)
    stack = np.stack([base, base]).astype(np.uint8)
    cfg = stack_align.StackAlignConfig(max_displacement=64, residual=16)
    rendered, solved, overflow = stack_align.align_stack(stack, cfg)
    assert not bool(overflow)
    interior = np.s_[160:-160, 160:-160]
    err = np.abs(np.asarray(rendered)[1][interior]
                 - base[interior].astype(np.float32)).mean()
    assert err < 2.0, err
    assert float(jnp.nanmax(jnp.abs(solved[1]))) < 1.5
