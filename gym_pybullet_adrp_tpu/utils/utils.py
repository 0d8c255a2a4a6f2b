"""General utilities: wall-clock sync, CLI parsing, controller loading.

Capability parity with reference utils/utils.py:20-196 (minus
``load_firmware``, which is obsolete: the firmware is pure JAX with explicit
state, so no per-process module duplication is needed — see
control/mellinger.py).
"""

import importlib.util
import time
from pathlib import Path

import numpy as np


def get_quaternion_from_euler(roll, pitch, yaw):
    """Euler (extrinsic xyz) -> quat [x, y, z, w]
    (reference utils.py:20-43)."""
    qx = np.sin(roll / 2) * np.cos(pitch / 2) * np.cos(yaw / 2) - \
        np.cos(roll / 2) * np.sin(pitch / 2) * np.sin(yaw / 2)
    qy = np.cos(roll / 2) * np.sin(pitch / 2) * np.cos(yaw / 2) + \
        np.sin(roll / 2) * np.cos(pitch / 2) * np.sin(yaw / 2)
    qz = np.cos(roll / 2) * np.cos(pitch / 2) * np.sin(yaw / 2) - \
        np.sin(roll / 2) * np.sin(pitch / 2) * np.cos(yaw / 2)
    qw = np.cos(roll / 2) * np.cos(pitch / 2) * np.cos(yaw / 2) + \
        np.sin(roll / 2) * np.sin(pitch / 2) * np.sin(yaw / 2)
    return [qx, qy, qz, qw]


def sync(i, start_time, timestep):
    """Real-time pacing for GUI runs (reference utils.py:47-66)."""
    if timestep > 0.04 or i % (int(1 / (24 * timestep))) == 0:
        elapsed = time.time() - start_time
        if elapsed < (i * timestep):
            time.sleep(timestep * i - elapsed)


def str2bool(val):
    """Permissive CLI boolean (reference utils.py:70-91)."""
    if isinstance(val, bool):
        return val
    if val.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if val.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise ValueError("[ERROR] in str2bool(), a Boolean value is expected")


def load_controller(path):
    """Dynamically import a user controller module and return its Controller
    class (reference utils.py:112-135: expects the module to expose exactly
    one subclass of BaseController named `Controller` or discoverable)."""
    path = Path(path)
    spec = importlib.util.spec_from_file_location(path.stem, path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    if hasattr(module, "Controller"):
        return module.Controller
    from agents.base import BaseController

    candidates = [
        v for v in vars(module).values()
        if isinstance(v, type) and issubclass(v, BaseController)
        and v is not BaseController and v.__module__ == module.__name__
    ]
    if len(candidates) != 1:
        raise RuntimeError(
            f"controller module {path} must define exactly one controller "
            f"class (found {len(candidates)})"
        )
    return candidates[0]


def map2pi(angle):
    """Wrap angle(s) to [-pi, pi) (reference utils.py:188-196)."""
    return (np.asarray(angle) + np.pi) % (2 * np.pi) - np.pi


def draw_trajectory(initial_info, waypoints, ref_x, ref_y, ref_z):
    """GUI trajectory drawing (reference utils.py:155-184) — headless no-op;
    kept for API parity (renderer integration lives in utils/rendering)."""
    return None
