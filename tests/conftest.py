"""Test configuration: CPU backend with a virtual 8-device mesh, f64 on.

Note: this image's axon TPU plugin overrides the JAX_PLATFORMS env var, so
the platform must be forced via jax.config *after* importing jax — otherwise
tests silently run on the tunneled TPU (slow remote compiles, no real f64).
"""

import os

# Headless rendering backend for vision-observable tests (must be set
# before mujoco loads an OpenGL platform library).
os.environ.setdefault('MUJOCO_GL', 'egl')

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
  # Virtual 8-device CPU mesh for multi-chip sharding tests (SURVEY.md §4).
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
