"""Test environment: force JAX onto a virtual 8-device CPU mesh.

Must run before jax (or anything importing jax) is imported, so multi-chip
sharding tests exercise real collectives without TPU hardware.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

# keep TF (used as the golden-parity oracle) quiet and off any accelerator
os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '2')
os.environ.setdefault('CUDA_VISIBLE_DEVICES', '')

# the image preloads an 'axon' TPU platform that overrides the JAX_PLATFORMS
# env var; pin the config explicitly so tests really run on the CPU mesh
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
assert len(jax.devices()) >= 8, 'virtual CPU device mesh not active'
