"""Debug: warm-start prior flow vs cold flow at small scale (CPU)."""
import sys
sys.path.insert(0, '/root/repo')
import numpy as np
import jax
import jax.numpy as jnp

from sofima_tpu.ops import interp
from sofima_tpu.pipeline import stack_align


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


n, n_z = 800, 3
base = _texture(n)
yy, xx = np.mgrid[:n, :n].astype(np.float32)
sections = [base]
for z in range(1, n_z):
  dy = 3.0 * z + 4.0 * np.sin(2 * np.pi * xx / n + z)
  dx = -2.0 * z + 4.0 * np.cos(2 * np.pi * yy / n + 0.5 * z)
  coords = jnp.stack([jnp.asarray(yy + dy), jnp.asarray(xx + dx)])
  sec = interp.sample(jnp.asarray(base), coords, method='linear',
                      mode='nearest')
  sections.append(np.asarray(sec))
stack = np.stack(sections).astype(np.uint8)

cfg = stack_align.StackAlignConfig(max_displacement=64, residual=16)
grid_n = n // cfg.stride

s0 = jnp.asarray(stack[0].astype(np.float32))
s1 = jnp.asarray(stack[1].astype(np.float32))
s2 = jnp.asarray(stack[2].astype(np.float32))

f0, ov0 = stack_align._flow_phase(s0, s1, cfg, grid_n)
f1_cold, ov1 = stack_align._flow_phase(s1, s2, cfg, grid_n)
f1_warm, ovw = stack_align._flow_phase(s1, s2, cfg, grid_n,
                                       prior=f0[:, 0])

f1c = np.asarray(f1_cold[:, 0])
f1w = np.asarray(f1_warm[:, 0])
d = np.abs(f1w - f1c)
print('overflow cold/warm:', bool(ov1), bool(ovw))
print('nan counts cold/warm:', np.isnan(f1c).sum(), np.isnan(f1w).sum())
print('nanmax diff:', np.nanmax(d), 'nanmean diff:', np.nanmean(d))
iy, ix = np.unravel_index(np.nanargmax(d[0] + d[1]), d[0].shape)
print('worst node', iy, ix, 'cold', f1c[:, iy, ix], 'warm', f1w[:, iy, ix])
# Histogram of diffs
print('frac > 0.5 px:', np.nanmean((d > 0.5).astype(np.float32)))
print('frac > 2 px:', np.nanmean((d > 2.0).astype(np.float32)))
# Where do they differ? borders vs interior
print('interior nanmax:', np.nanmax(d[:, 5:-5, 5:-5]))
print('interior nanmean:', np.nanmean(d[:, 5:-5, 5:-5]))
