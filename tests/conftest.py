"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is exercised separately by bench.py; unit tests use
XLA's host-platform device virtualization so multi-chip sharding logic
(shard_map/pjit over a Mesh) is validated without TPU access.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_ENABLE_X64', '0')
