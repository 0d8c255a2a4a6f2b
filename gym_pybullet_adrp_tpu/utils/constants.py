"""Global constants.

Capability parity with reference gym_pybullet_adrp/utils/constants.py:10-44.
Values are plain Python floats/ints so they fold into jitted graphs as
compile-time constants.
"""

import math

import numpy as np

# math
RAD_TO_DEG = 180.0 / math.pi
DEG_TO_RAD = math.pi / 180.0
VEC3_UP = np.array([0.0, 0.0, 1.0])
ZERO3 = np.zeros(3)

# gravity used across the framework (reference BaseAviary.py:74)
G = 9.8

# lsy-drone-racing geometry (reference constants.py:23-25)
Z_LOW = 0.3
Z_HIGH = 0.775
VISIBILITY_RANGE = 0.45

# crazyflie firmware (reference constants.py:29-44)
FIRMWARE_FREQ = 500
FIRMWARE_DT = 1.0 / 500
CTRL_FREQ = 25
CTRL_DT = 1.0 / 25
MIN_PWM = 20000.0
MAX_PWM = 65535.0
PWM2RPM_SCALE = 0.2685
PWM2RPM_CONST = 4070.3
ACTION_DELAY = 0
SENSOR_DELAY = 0
GYRO_LPF_CUTOFF_FREQ = 80.0
ACCEL_LPF_CUTOFF_FREQ = 30.0
SUPPLY_VOLTAGE = 3.0
MOTOR_SET_ENABLE = True
QUAD_FORMATION_X = True
SPEED_LIMIT = 10.0

# race gate geometry, from the portal/low_portal/obstacle URDFs
# (reference assets/portal.urdf: 0.5 m square opening of 0.05-thick beams at
#  +-0.225 offsets; MultiRaceAviary.py:477-484: tall opening center z=1.0,
#  low z=0.525, ray half-length 0.1875)
GATE_Z_TALL = 1.0
GATE_Z_LOW = 0.525
GATE_RAY_HALF_LEN = 0.1875
GATE_OPENING_HALF = 0.225  # beam center offset from gate center
GATE_BEAM_HALF = 0.025     # beam half thickness
GATE_EDGE_HALF_LEN = 0.25  # beams are 0.5 m long
GATE_SUPPORT_RADIUS = 0.05
GATE_SUPPORT_CENTER_DZ = -0.6
GATE_SUPPORT_HALF_LEN = 0.4
OBSTACLE_RADIUS = 0.05
OBSTACLE_HALF_LEN = 0.4    # 0.8 m cylinder centered at the obstacle z
