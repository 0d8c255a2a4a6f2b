"""Flight controllers: pure-function cores + object-style API wrappers."""

from gym_pybullet_adrp_tpu.control.api import (
    BaseControl, CTBRControl, DSLPIDControl, MellingerControl,
)

__all__ = ["BaseControl", "CTBRControl", "DSLPIDControl", "MellingerControl"]
