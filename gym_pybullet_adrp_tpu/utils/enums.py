"""Enumerations for drone models, physics modes, actions, observations and commands.

Capability parity with the reference enum surface
(reference: gym_pybullet_adrp/utils/enums.py:8-87), re-expressed so that every
enum that participates in jitted code has a stable integer value usable with
``jax.lax.switch`` / array indexing.
"""

from enum import Enum, IntEnum


class DroneModel(Enum):
    """Drone models (parameter sets live in models/drone.py).

    Reference: utils/enums.py:8-14 — CF2X maps to the IROS 2022 parameter set
    (m=0.03454), as in the reference's ``cf2x_IROS.urdf``.
    """

    CF2X = "cf2x_IROS"
    CF2P = "cf2p"
    RACE = "racer"


class Physics(IntEnum):
    """Physics implementations (reference: utils/enums.py:18-26).

    Integer-valued so the physics pipeline can be selected statically at trace
    time; the force augmentations compose exactly as in the reference
    (BaseAviary.py:347-376).
    """

    PYB = 0              # semi-implicit Euler rigid body (PyBullet-analogue)
    DYN = 1              # explicit dynamics (reference BaseAviary._dynamics)
    PYB_GND = 2          # + ground effect
    PYB_DRAG = 3         # + drag
    PYB_DW = 4           # + downwash
    PYB_GND_DRAG_DW = 5  # + all three

    @property
    def value_str(self) -> str:
        return _PHYSICS_STR[self]


_PHYSICS_STR = {
    Physics.PYB: "pyb",
    Physics.DYN: "dyn",
    Physics.PYB_GND: "pyb_gnd",
    Physics.PYB_DRAG: "pyb_drag",
    Physics.PYB_DW: "pyb_dw",
    Physics.PYB_GND_DRAG_DW: "pyb_gnd_drag_dw",
}


class ImageType(IntEnum):
    """Camera capture image type (reference: utils/enums.py:30-36)."""

    RGB = 0
    DEP = 1
    SEG = 2
    BW = 3


class ActionType(Enum):
    """Action types (reference: utils/enums.py:40-47)."""

    MEL = "mel"
    RPM = "rpm"
    PID = "pid"
    VEL = "vel"
    ONE_D_RPM = "one_d_rpm"
    ONE_D_PID = "one_d_pid"


class ObservationType(Enum):
    """Observation types (reference: utils/enums.py:51-54)."""

    KIN = "kin"
    RGB = "rgb"


class Command(IntEnum):
    """High-level commander commands (reference: utils/enums.py:58-70).

    Integer-valued: the in-graph command state machine dispatches with
    ``jax.lax.switch`` over this id (the reference dispatched via a pipe
    protocol to a subprocess, MellingerControl.py:32-57).
    """

    NONE = 0
    FULLSTATE = 1
    TAKEOFF = 2
    TAKEOFFYAW = 3
    TAKEOFFVEL = 4
    LAND = 5
    LANDYAW = 6
    LANDVEL = 7
    STOP = 8
    GOTO = 9
    NOTIFY = 10


class State(IntEnum):
    """State-machine behaviour states (reference: utils/enums.py:74-80; dead
    code there, kept for API parity)."""

    INIT = 0
    TAKEOFF = 1
    CONTROL = 2
    LAND = 3
    END = 4


class RaceMode(IntEnum):
    """Race mode: collision behaviour + obs-space structure
    (reference: utils/enums.py:84-87)."""

    COMPARE = 0
    COMPETE = 1
