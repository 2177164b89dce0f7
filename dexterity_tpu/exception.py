"""Exceptions (reference: dexterity/exception.py)."""


class GoalInitializationError(RuntimeError):
  """Raised when goal rejection sampling exhausts its budget.

  In the batched environments this surfaces as the `goal_ok` flag in the
  environment state (jit-compatible); the stateful wrapper raises it to
  preserve the reference's retry-on-reset semantics
  (dexterity/environment.py:14-33).
  """
