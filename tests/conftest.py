"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is exercised separately by bench.py; unit tests use
XLA's host-platform device virtualization so multi-chip sharding logic
(shard_map/pjit over a Mesh) is validated without TPU access.

Note: this environment preloads an `axon` TPU PJRT plugin via
sitecustomize that overrides JAX_PLATFORMS, so we must force the CPU
backend through jax.config *after* import.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
