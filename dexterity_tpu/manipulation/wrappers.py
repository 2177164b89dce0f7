"""Environment wrappers (reference: dexterity/manipulation/wrappers/).

`Wrapper`: dm_env-style delegation.  `ActionNoise`: Gaussian noise scaled
to the action range, clipped (wrappers/action_noise.py:9-26).
"""

from __future__ import annotations

import numpy as np


class Wrapper:
  """Delegating wrapper for interactive environments
  (reference: wrappers/base.py:6-38)."""

  def __init__(self, env):
    self._env = env

  def __getattr__(self, name):
    return getattr(self._env, name)

  @property
  def environment(self):
    return self._env

  def reset(self):
    return self._env.reset()

  def step(self, action):
    return self._env.step(action)

  def action_spec(self):
    return self._env.action_spec()

  def observation_spec(self):
    return self._env.observation_spec()


class ActionNoise(Wrapper):
  """Adds zero-mean Gaussian noise scaled to the action range."""

  def __init__(self, env, scale: float = 0.01, seed: int = 0):
    super().__init__(env)
    spec = env.action_spec()
    lo = np.where(np.isfinite(spec.minimum), spec.minimum, -1.0)
    hi = np.where(np.isfinite(spec.maximum), spec.maximum, 1.0)
    self._stddev = scale * (hi - lo)
    self._lo, self._hi = lo, hi
    self._rng = np.random.RandomState(seed)

  def step(self, action):
    noisy = np.asarray(action) + self._rng.normal(
        scale=self._stddev, size=self._stddev.shape)
    return self._env.step(np.clip(noisy, self._lo, self._hi))
