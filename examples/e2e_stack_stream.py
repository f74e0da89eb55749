"""Streamed z-stack alignment with the fused per-section pipeline.

The round-3 production path: pipeline.stack_align runs the whole
flow -> clean -> solve -> invert -> render chain as ONE device program
per section with zero host synchronization — section z's solved mesh
feeds section z+1's solve as a device array, and the only host traffic
is the final fetch.

Builds a synthetic stack with cumulative drift + low-frequency wobble,
aligns it, and checks every rendered section against the (known) base
frame.

Run:  python examples/e2e_stack_stream.py [--size 1024] [--sections 6]
      [--cpu]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def make_texture(n: int, seed: int = 0) -> np.ndarray:
  rng = np.random.RandomState(seed)
  noise = rng.rand(n, n).astype(np.float32)
  f = np.fft.rfft2(noise)
  fy = np.fft.fftfreq(n)[:, None]
  fx = np.fft.rfftfreq(n)[None, :]
  f *= np.exp(-((fx**2 + fy**2) / (2 * 0.08**2)))
  tex = np.fft.irfft2(f, s=(n, n))
  return ((tex - tex.min()) / np.ptp(tex) * 255).astype(np.float32)


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--size', type=int, default=1024)
  parser.add_argument('--sections', type=int, default=6)
  parser.add_argument('--cpu', action='store_true')
  args = parser.parse_args()

  if args.cpu:
    import jax
    jax.config.update('jax_platforms', 'cpu')

  import jax.numpy as jnp
  from sofima_tpu.ops import interp
  from sofima_tpu.pipeline import stack_align

  n = args.size
  base = make_texture(n)
  yy, xx = np.mgrid[:n, :n].astype(np.float32)
  print(f'[stream] building {args.sections} sections of {n}x{n}...')
  sections = [base]
  for z in range(1, args.sections):
    dy = 2.5 * z + 5.0 * np.sin(2 * np.pi * xx / n + 0.7 * z)
    dx = -2.0 * z + 5.0 * np.cos(2 * np.pi * yy / n + 0.4 * z)
    coords = jnp.stack([jnp.asarray(yy + dy), jnp.asarray(xx + dx)])
    sections.append(np.asarray(interp.sample(
        jnp.asarray(base), coords, method='linear', mode='nearest')))
  stack = np.stack(sections).astype(np.uint8)

  cfg = stack_align.StackAlignConfig(max_displacement=64, residual=8)
  t0 = time.time()
  rendered, solved, overflow = stack_align.align_stack(stack, cfg)
  rendered = np.asarray(rendered)  # the single fetch ends the stream
  dt = time.time() - t0
  mpix = (args.sections - 1) * n * n / dt / 1e6
  print(f'[stream] {args.sections - 1} sections aligned in {dt:.1f}s '
        f'({mpix:.0f} Mpix/s incl. compile on first run); '
        f'overflow={bool(overflow)}')

  inter = np.s_[160:-160, 160:-160]
  ok = True
  for z in range(1, args.sections):
    before = np.abs(stack[z].astype(np.float32)[inter]
                    - base[inter]).mean()
    after = np.abs(rendered[z][inter] - base[inter]).mean()
    print(f'[stream] z={z}: |err| raw={before:6.2f}  aligned={after:6.2f}')
    ok &= after < before / 3
  print('[stream]', 'PASS' if ok else 'FAIL')
  return 0 if ok else 1


if __name__ == '__main__':
  sys.exit(main())
