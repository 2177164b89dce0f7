"""Manipulation task suite (reference: dexterity/manipulation/__init__.py).

`load(domain, task)` mirrors the reference API surface: ALL_TASKS,
ALL_NAMES, TASKS_BY_DOMAIN, and per-domain SUITE registries; it returns a
compiled `GoalEnvironment` (batched, jittable).  `load_interactive` wraps it
with the stateful dm_env-style interface for scripts and the explore app.
"""

from __future__ import annotations

import collections
from typing import Optional

from dexterity_tpu import environment as _environment
from dexterity_tpu import task as _task
from dexterity_tpu.manipulation.tasks import juggle as _juggle
from dexterity_tpu.manipulation.tasks import reach as _reach
from dexterity_tpu.manipulation.tasks import reorient as _reorient

_DOMAINS = {
    name: module
    for name, module in (('reach', _reach), ('reorient', _reorient),
                         ('juggle', _juggle))
    if hasattr(module, 'SUITE')
}


def _get_tasks(tag):
  """Returns a sequence of (domain name, task name) pairs."""
  result = []
  for domain_name in sorted(_DOMAINS.keys()):
    domain = _DOMAINS[domain_name]
    if tag is None:
      tasks_in_domain = sorted(domain.SUITE.keys())
    else:
      tasks_in_domain = sorted(domain.SUITE.tagged(tag))
    for task_name in tasks_in_domain:
      result.append((domain_name, task_name))
  return tuple(result)


def _get_tasks_by_domain(tasks):
  result = collections.defaultdict(list)
  for domain_name, task_name in tasks:
    result[domain_name].append(task_name)
  return {k: tuple(v) for k, v in result.items()}


ALL_TASKS = _get_tasks(tag=None)
ALL_NAMES = ['.'.join(domain_task) for domain_task in ALL_TASKS]
TASKS_BY_DOMAIN = _get_tasks_by_domain(ALL_TASKS)


def build_task(domain_name: str, task_name: str) -> _task.Task:
  if domain_name not in _DOMAINS:
    raise ValueError(f'Unknown domain: {domain_name}')
  domain = _DOMAINS[domain_name]
  if task_name not in domain.SUITE:
    raise ValueError(f'Unknown task: {task_name}')
  return domain.SUITE[task_name]()


def load(domain_name: str, task_name: str, seed: Optional[int] = None,
         strip_singleton_obs_buffer_dim: bool = True,
         time_limit: Optional[float] = None,
         dtype=None) -> _environment.GoalEnvironment:
  """Builds and compiles a task environment.

  Honors the reference `load()` contract
  (dexterity/manipulation/__init__.py:57-86):
    seed: default PRNG seed, used when the environment is driven through
      the stateful InteractiveEnvironment wrapper (the pure `reset(key)`
      API takes explicit keys).
    strip_singleton_obs_buffer_dim: when False, every observation keeps the
      leading (buffer_size=1,) axis the reference's composer observables
      carry.
    time_limit: episode wall-clock truncation in seconds; converted to a
      step limit at the task control rate like composer.Environment.

  Contact-pair pruning is already baked into the model assets at import
  time (the reference prunes per-load, manipulation/__init__.py:71-74).
  """
  task = build_task(domain_name, task_name)
  return _environment.GoalEnvironment(
      task, dtype=dtype, time_limit=time_limit, seed=seed,
      strip_singleton_obs_buffer_dim=strip_singleton_obs_buffer_dim)


def load_interactive(domain_name: str, task_name: str,
                     seed: Optional[int] = None, **kwargs):
  env = load(domain_name, task_name, seed=seed, **kwargs)
  return _environment.InteractiveEnvironment(env, seed=seed)
