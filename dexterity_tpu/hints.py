"""Type aliases (reference: dexterity/hints.py:12-21)."""

from typing import Tuple, Union

import jax
import numpy as np

from dexterity_tpu.core.spec import BodySpec, GeomSpec, JointSpec, SiteSpec
from dexterity_tpu.core.types import Data, Model

FloatArray = Union[np.ndarray, jax.Array]
RgbaColor = Tuple[float, float, float, float]
# Spec elements play the role of the reference's MjcfElement handles.
SpecElement = Union[BodySpec, JointSpec, GeomSpec, SiteSpec]
