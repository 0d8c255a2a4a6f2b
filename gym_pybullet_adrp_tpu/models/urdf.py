"""URDF drone asset IO: parse and emit reference-format drone URDFs.

The reference ships its drone models as URDF files and reads 17 physical
parameters out of them at env construction
(``BaseAviary._parseURDFParameters``, reference envs/BaseAviary.py:989-1021:
a custom ``<properties>`` element with aerodynamic coefficients, plus the
standard ``<inertial>`` mass/inertia and the base link's ``<collision>``
cylinder). This framework keeps the built-in models embedded as data
(``models/drone.py``) so nothing near the compute path touches files — but
users of the reference bring their *own* URDFs, so the capability to load
one must exist.

This module is that capability, host-side only:

- :func:`parse_drone_urdf` reads any reference-format drone URDF (by path or
  XML string) into a plain parameter dict — by tag search, not the
  reference's fragile positional child indexing.
- :func:`drone_params_from_urdf` turns that into a :class:`DroneParams`
  pytree usable by every env in the framework.
- :func:`write_drone_urdf` emits a minimal reference-compatible URDF from a
  parameter dict (round-trips with the parser), so assets created here load
  in the reference and vice versa.
"""

import xml.etree.ElementTree as ET
from os import PathLike
from typing import Union

import jax.numpy as jnp
import numpy as np

from gym_pybullet_adrp_tpu.models.drone import DroneParams

# <properties> attributes (reference BaseAviary.py:998-1020) -> raw keys
_PROPERTIES_ATTRS = (
    "arm", "kf", "km", "thrust2weight", "max_speed_kmh", "gnd_eff_coeff",
    "prop_radius", "drag_coeff_xy", "drag_coeff_z",
    "dw_coeff_1", "dw_coeff_2", "dw_coeff_3",
)
# optional firmware/PWM attributes present in the reference assets (used by
# the firmware pathway, reference assets/cf2x_IROS.urdf <properties>)
_OPTIONAL_ATTRS = ("pwm2rpm_scale", "pwm2rpm_const", "pwm_min", "pwm_max")


def _load_root(source: Union[str, PathLike]) -> ET.Element:
    text = None
    if isinstance(source, str) and source.lstrip().startswith("<"):
        text = source
    if text is not None:
        return ET.fromstring(text)
    return ET.parse(source).getroot()


def parse_drone_urdf(source: Union[str, PathLike]) -> dict:
    """Parse a reference-format drone URDF into a raw parameter dict.

    ``source`` is a filesystem path or an XML string. Returns a dict with
    the keys of ``models.drone._REGISTRY`` entries (mass, arm,
    thrust2weight, J, kf, km, collision_h/r/z_offset, max_speed_kmh,
    gnd_eff_coeff, prop_radius, drag_coeff, dw_coeff_1..3) plus any of the
    optional PWM attributes present.

    Covers the same surface as the reference's
    ``_parseURDFParameters`` (BaseAviary.py:989-1021) but locates elements
    by tag (``<properties>``; first ``<link>``'s ``<inertial>`` and
    ``<collision>``) instead of by child position.
    """
    root = _load_root(source)

    props = root.find("properties")
    if props is None:
        raise ValueError("URDF has no <properties> element (drone "
                         "aerodynamic parameters)")
    missing = [a for a in _PROPERTIES_ATTRS if a not in props.attrib]
    if missing:
        raise ValueError(f"<properties> missing attributes: {missing}")
    p = {a: float(props.attrib[a]) for a in _PROPERTIES_ATTRS}

    link = root.find("link")
    if link is None:
        raise ValueError("URDF has no <link> element")
    inertial = link.find("inertial")
    if inertial is None or inertial.find("mass") is None \
            or inertial.find("inertia") is None:
        raise ValueError("base link has no <inertial><mass/><inertia/>")
    mass = float(inertial.find("mass").attrib["value"])
    inertia = inertial.find("inertia").attrib
    J = (float(inertia["ixx"]), float(inertia["iyy"]), float(inertia["izz"]))

    collision = link.find("collision")
    if collision is None:
        raise ValueError("base link has no <collision> element")
    cyl = collision.find("geometry/cylinder")
    if cyl is None:
        raise ValueError("collision geometry is not a <cylinder>")
    origin = collision.find("origin")
    xyz = (origin.attrib.get("xyz", "0 0 0") if origin is not None
           else "0 0 0")
    z_offset = float(xyz.split()[2])

    raw = dict(
        mass=mass,
        arm=p["arm"],
        thrust2weight=p["thrust2weight"],
        J=J,
        kf=p["kf"],
        km=p["km"],
        collision_h=float(cyl.attrib["length"]),
        collision_r=float(cyl.attrib["radius"]),
        collision_z_offset=z_offset,
        max_speed_kmh=p["max_speed_kmh"],
        gnd_eff_coeff=p["gnd_eff_coeff"],
        prop_radius=p["prop_radius"],
        drag_coeff=(p["drag_coeff_xy"], p["drag_coeff_xy"],
                    p["drag_coeff_z"]),
        dw_coeff_1=p["dw_coeff_1"],
        dw_coeff_2=p["dw_coeff_2"],
        dw_coeff_3=p["dw_coeff_3"],
    )
    for a in _OPTIONAL_ATTRS:
        if a in props.attrib:
            raw[a] = float(props.attrib[a])
    return raw


def drone_params_from_urdf(source: Union[str, PathLike],
                           dtype=jnp.float32) -> DroneParams:
    """Load a drone URDF straight into a :class:`DroneParams` pytree.

    Drop-in alternative to ``models.drone.drone_params`` for user-supplied
    assets; every env accepts the result since params are plain pytrees.
    """
    raw = parse_drone_urdf(source)
    fields = {
        k: jnp.asarray(np.asarray(raw[k]), dtype=dtype)
        for k in DroneParams._fields
    }
    return DroneParams(**fields)


def write_drone_urdf(raw: dict, path: Union[str, PathLike, None] = None,
                     name: str = "drone") -> str:
    """Emit a minimal reference-compatible drone URDF.

    ``raw`` uses the registry key layout (see :func:`parse_drone_urdf`'s
    return value). Returns the XML string; also writes it to ``path`` when
    given. ``parse_drone_urdf(write_drone_urdf(raw))`` round-trips exactly.
    """
    drag = raw["drag_coeff"]
    props = {
        "arm": raw["arm"], "kf": raw["kf"], "km": raw["km"],
        "thrust2weight": raw["thrust2weight"],
        "max_speed_kmh": raw["max_speed_kmh"],
        "gnd_eff_coeff": raw["gnd_eff_coeff"],
        "prop_radius": raw["prop_radius"],
        "drag_coeff_xy": drag[0], "drag_coeff_z": drag[2],
        "dw_coeff_1": raw["dw_coeff_1"], "dw_coeff_2": raw["dw_coeff_2"],
        "dw_coeff_3": raw["dw_coeff_3"],
    }
    for a in _OPTIONAL_ATTRS:
        if a in raw:
            props[a] = raw[a]

    robot = ET.Element("robot", name=name)
    ET.SubElement(robot, "properties",
                  {k: repr(float(v)) for k, v in props.items()})
    link = ET.SubElement(robot, "link", name="base_link")

    inertial = ET.SubElement(link, "inertial")
    ET.SubElement(inertial, "origin", rpy="0 0 0", xyz="0 0 0")
    ET.SubElement(inertial, "mass", value=repr(float(raw["mass"])))
    J = raw["J"]
    ET.SubElement(inertial, "inertia",
                  ixx=repr(float(J[0])), ixy="0.0", ixz="0.0",
                  iyy=repr(float(J[1])), iyz="0.0", izz=repr(float(J[2])))

    visual = ET.SubElement(link, "visual")
    ET.SubElement(visual, "origin", rpy="0 0 0", xyz="0 0 0")
    geom = ET.SubElement(visual, "geometry")
    ET.SubElement(geom, "cylinder",
                  length=repr(float(raw["collision_h"])),
                  radius=repr(float(raw["collision_r"])))

    collision = ET.SubElement(link, "collision")
    ET.SubElement(
        collision, "origin", rpy="0 0 0",
        xyz=f"0 0 {repr(float(raw['collision_z_offset']))}",
    )
    geom = ET.SubElement(collision, "geometry")
    ET.SubElement(geom, "cylinder",
                  length=repr(float(raw["collision_h"])),
                  radius=repr(float(raw["collision_r"])))

    ET.indent(robot)
    text = ('<?xml version="1.0" ?>\n'
            + ET.tostring(robot, encoding="unicode") + "\n")
    if path is not None:
        with open(path, "w") as f:
            f.write(text)
    return text
