"""URDF asset IO: reference-format parsing + round-trip.

Covers the capability of the reference's ``BaseAviary._parseURDFParameters``
(reference envs/BaseAviary.py:989-1021): users bring their own drone URDFs
and every parameter the reference reads must come through.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_pybullet_adrp_tpu.models.drone import _REGISTRY, drone_params
from gym_pybullet_adrp_tpu.models.urdf import (
    drone_params_from_urdf, parse_drone_urdf, write_drone_urdf,
)
from gym_pybullet_adrp_tpu.utils.enums import DroneModel

# reference-style URDF: comments, visual-before-collision, mesh visual,
# extra attrs in <properties>, multi-link — everything the reference assets
# contain that a positional parser would trip on
REFERENCE_STYLE_URDF = """<?xml version="1.0" ?>
<robot name="custom">
  <properties arm="0.05" kf="4.0e-10" km="8.0e-12" thrust2weight="2.5"
    max_speed_kmh="40" gnd_eff_coeff="11.0" prop_radius="2.5e-2"
    drag_coeff_xy="9.0e-7" drag_coeff_z="10.0e-7"
    dw_coeff_1="2000.0" dw_coeff_2=".15" dw_coeff_3="-.1"
    pwm2rpm_scale="0.2685" pwm2rpm_const="4070.3"
    pwm_min="20000.0" pwm_max="65535.0" />
  <link name="base_link">
    <inertial>
      <origin rpy="0 0 0" xyz="0 0 0"/>
      <!-- measured mass -->
      <mass value="0.04"/>
      <inertia ixx="1.5e-5" ixy="0.0" ixz="0.0" iyy="1.6e-5" iyz="0.0"
        izz="2.2e-5"/>
    </inertial>
    <visual>
      <origin rpy="0 0 55" xyz="0 0 0"/>
      <geometry><mesh filename="./cf2.dae" scale="1 1 1"/></geometry>
    </visual>
    <collision>
      <origin rpy="0 0 0" xyz="0 0 0.01"/>
      <geometry><cylinder length="0.03" radius="0.07"/></geometry>
    </collision>
  </link>
  <link name="prop0_link"><inertial>
    <mass value="0.0"/>
    <inertia ixx="0" ixy="0" ixz="0" iyy="0" iyz="0" izz="0"/>
  </inertial></link>
</robot>
"""


def test_parse_reference_style_urdf():
    raw = parse_drone_urdf(REFERENCE_STYLE_URDF)
    assert raw["mass"] == 0.04
    assert raw["arm"] == 0.05
    assert raw["thrust2weight"] == 2.5
    assert raw["J"] == (1.5e-5, 1.6e-5, 2.2e-5)
    assert raw["kf"] == 4.0e-10 and raw["km"] == 8.0e-12
    assert raw["collision_h"] == 0.03
    assert raw["collision_r"] == 0.07
    assert raw["collision_z_offset"] == 0.01
    assert raw["drag_coeff"] == (9.0e-7, 9.0e-7, 10.0e-7)
    assert raw["dw_coeff_1"] == 2000.0
    assert raw["dw_coeff_2"] == 0.15 and raw["dw_coeff_3"] == -0.1
    assert raw["pwm2rpm_scale"] == 0.2685 and raw["pwm_max"] == 65535.0


@pytest.mark.parametrize("model", list(DroneModel))
def test_registry_roundtrip(model, tmp_path):
    """write(registry entry) -> parse == registry entry, for every model."""
    raw = dict(_REGISTRY[model])
    path = tmp_path / f"{model.name.lower()}.urdf"
    write_drone_urdf(raw, path)
    parsed = parse_drone_urdf(path)
    for k, v in raw.items():
        assert parsed[k] == pytest.approx(v), k

    # and the parsed params match the embedded registry pytree exactly
    via_urdf = drone_params_from_urdf(path)
    builtin = drone_params(model)
    for a, b in zip(via_urdf, builtin):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_urdf_params_run_in_env():
    """A custom-URDF drone steps through the hover env end to end."""
    from gym_pybullet_adrp_tpu.envs import rl as rlenv
    from gym_pybullet_adrp_tpu.envs.core import AviaryConfig

    params = drone_params_from_urdf(REFERENCE_STYLE_URDF)
    cfg = rlenv.RLConfig(aviary=AviaryConfig(ctrl_freq=30))
    state = rlenv.rl_reset(cfg, np.array([[0.0, 0.0, 0.1125]]),
                           np.zeros((1, 3)), dtype=jnp.float32)
    step = jax.jit(lambda s, a: rlenv.rl_step(cfg, params, s, a))
    action = jnp.zeros((1, cfg.act_size), dtype=jnp.float32)
    for _ in range(3):
        state, obs, reward, term, trunc = step(state, action)
    assert np.all(np.isfinite(np.asarray(obs)))


def test_parse_errors():
    with pytest.raises(ValueError, match="properties"):
        parse_drone_urdf("<robot><link name='l'/></robot>")
    with pytest.raises(ValueError, match="missing attributes"):
        parse_drone_urdf("<robot><properties arm='0.1'/></robot>")


import os

import pytest

REF_ASSETS = "/root/reference/gym_pybullet_adrp/assets"


@pytest.mark.skipif(not os.path.isdir(REF_ASSETS),
                    reason="reference checkout not present")
@pytest.mark.parametrize("fname,model", [
    ("cf2x_IROS.urdf", "CF2X"),
    ("cf2p.urdf", "CF2P"),
    ("racer.urdf", "RACE"),
])
def test_reference_urdfs_match_registry(fname, model):
    """GOLDEN: parsing the reference's actual URDF assets reproduces the
    embedded parameter registry (models/drone.py) — the registry is a
    faithful transcription, not an approximation."""
    import numpy as np

    from gym_pybullet_adrp_tpu.models.drone import drone_params
    from gym_pybullet_adrp_tpu.models.urdf import drone_params_from_urdf
    from gym_pybullet_adrp_tpu.utils.enums import DroneModel

    parsed = drone_params_from_urdf(os.path.join(REF_ASSETS, fname))
    registry = drone_params(DroneModel[model])
    for field in parsed._fields:
        a = np.asarray(getattr(parsed, field), dtype=np.float64)
        b = np.asarray(getattr(registry, field), dtype=np.float64)
        np.testing.assert_allclose(
            a, b, rtol=1e-6, atol=0, err_msg=f"{fname}:{field}"
        )


@pytest.mark.skipif(not os.path.isdir(REF_ASSETS),
                    reason="reference checkout not present")
def test_reference_legacy_cf2x_matches_race_randomization_base():
    """The race randomization bases (CF2X_LEGACY — reference _drone_init
    reads the legacy cf2x.urdf, not the IROS file) match the actual asset."""
    import numpy as np

    from gym_pybullet_adrp_tpu.models.drone import CF2X_LEGACY
    from gym_pybullet_adrp_tpu.models.urdf import parse_drone_urdf

    raw = parse_drone_urdf(os.path.join(REF_ASSETS, "cf2x.urdf"))
    np.testing.assert_allclose(raw["mass"], CF2X_LEGACY["mass"], rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(raw["J"], dtype=np.float64)
        if "J" in raw else [raw["ixx"], raw["iyy"], raw["izz"]],
        np.asarray(CF2X_LEGACY["J"]), rtol=1e-9,
    )


@pytest.mark.skipif(not os.path.isdir(REF_ASSETS),
                    reason="reference checkout not present")
def test_reference_gate_and_obstacle_geometry_constants():
    """GOLDEN: the analytic gate/obstacle geometry constants (which replace
    rayTestBatch/getContactPoints) match the reference's actual URDF assets
    (portal.urdf beam boxes, obstacle.urdf cylinder)."""
    import xml.etree.ElementTree as ET

    import numpy as np

    from gym_pybullet_adrp_tpu.utils.constants import (
        GATE_BEAM_HALF, GATE_EDGE_HALF_LEN, GATE_OPENING_HALF,
        OBSTACLE_HALF_LEN, OBSTACLE_RADIUS,
    )

    from gym_pybullet_adrp_tpu.utils.constants import (
        GATE_SUPPORT_CENTER_DZ, GATE_SUPPORT_HALF_LEN, GATE_SUPPORT_RADIUS,
    )

    portal = ET.parse(os.path.join(REF_ASSETS, "portal.urdf")).getroot()
    offsets, sizes = [], []
    for col in portal.iter("collision"):
        xyz = [float(v) for v in col.find("origin").get("xyz").split()]
        box = col.find("geometry/box")
        if box is None:
            # the support pole under the gate center
            cyl = col.find("geometry/cylinder")
            np.testing.assert_allclose(xyz[2], GATE_SUPPORT_CENTER_DZ)
            np.testing.assert_allclose(
                float(cyl.get("radius")), GATE_SUPPORT_RADIUS
            )
            np.testing.assert_allclose(
                float(cyl.get("length")), 2 * GATE_SUPPORT_HALF_LEN
            )
            continue
        size = [float(v) for v in box.get("size").split()]
        offsets.append(xyz)
        sizes.append(size)
    assert len(offsets) == 4  # 4 beams
    # beam centers sit at +-0.225 from the gate center
    np.testing.assert_allclose(
        sorted(abs(v) for o in offsets for v in o if abs(v) > 1e-9),
        [GATE_OPENING_HALF] * 4,
    )
    # every beam is a 0.5 m box of 0.05 m thickness
    for s in sizes:
        np.testing.assert_allclose(max(s), 2 * GATE_EDGE_HALF_LEN)
        np.testing.assert_allclose(min(s), 2 * GATE_BEAM_HALF)

    obstacle = ET.parse(os.path.join(REF_ASSETS, "obstacle.urdf")).getroot()
    cyl = obstacle.find(".//collision/geometry/cylinder")
    np.testing.assert_allclose(float(cyl.get("radius")), OBSTACLE_RADIUS)
    np.testing.assert_allclose(float(cyl.get("length")), 2 * OBSTACLE_HALF_LEN)
