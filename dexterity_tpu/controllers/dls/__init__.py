from dexterity_tpu.controllers.dls.dls import (
    DampedLeastSquaresMapper, DampedLeastSquaresParameters)
