"""dexterity-tpu: TPU-native dexterous hand manipulation.

See README.md for the component map and TUTORIAL.md for a walkthrough.
"""

__version__ = '0.1.0'

# Light-weight root: subpackages import jax lazily where possible.
from dexterity_tpu import exception  # noqa: F401
