"""Analytic collision / proximity / gate-passage geometry.

TPU-native replacement for the PyBullet narrow-phase queries the race env
makes across the FFI boundary every step:

* ``rayTestBatch`` gate-passage fan (reference MultiRaceAviary.py:471-506),
* ``getContactPoints`` collision checks (:552-562),
* ``getClosestPoints`` visibility gating in ``_computeObs`` (:614-643).

Geometry is reconstructed from the reference URDFs: a gate is a 0.5 m square
opening of 0.05-thick beams at ±0.225 offsets (portal.urdf / low_portal.urdf)
with a support below; an obstacle is an r=0.05, 0.8 m vertical cylinder
(obstacle.urdf). Beams/cylinders are modeled as capsules and the drone as a
sphere of its collision radius — a documented approximation of the exact
box/cylinder contact manifold that preserves the contact *events* the env's
logic consumes (elimination booleans), which is the reference's own
correctness anchor.

All functions broadcast over leading axes and are branchless.
"""

import jax.numpy as jnp

from gym_pybullet_adrp_tpu.utils.constants import (
    GATE_BEAM_HALF, GATE_EDGE_HALF_LEN, GATE_OPENING_HALF, GATE_RAY_HALF_LEN,
    GATE_SUPPORT_CENTER_DZ, GATE_SUPPORT_HALF_LEN, GATE_SUPPORT_RADIUS,
    GATE_Z_LOW, GATE_Z_TALL, OBSTACLE_HALF_LEN, OBSTACLE_RADIUS,
)


def point_segment_distance(p, a, b):
    """Distance from point(s) p to segment(s) [a, b]; broadcasts on leading axes."""
    ab = b - a
    denom = jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-12)
    t = jnp.clip(jnp.sum((p - a) * ab, axis=-1) / denom, 0.0, 1.0)
    closest = a + t[..., None] * ab
    return jnp.linalg.norm(p - closest, axis=-1)


def gate_beam_segments(gate_pose):
    """Capsule segments of one gate's frame in world coordinates.

    gate_pose: (..., 6) [x, y, z, r, p, yaw] — the env only yaw-rotates gates
    (reference _addObstacles:388-394 passes full rpy; tracks use yaw only).
    Returns (a, b, radius): a/b (..., 5, 3) segment endpoints for 4 beams +
    support, radius (5,).
    """
    x, y, z, yaw = (
        gate_pose[..., 0], gate_pose[..., 1], gate_pose[..., 2],
        gate_pose[..., 5],
    )
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    # gate-local x axis (width direction) in world
    ux = jnp.stack([c, s, jnp.zeros_like(c)], axis=-1)
    center = jnp.stack([x, y, z], axis=-1)
    up = jnp.zeros_like(center).at[..., 2].set(1.0)

    h = GATE_OPENING_HALF
    e = GATE_EDGE_HALF_LEN
    # horizontal beams at z ± 0.225, spanning ±0.25 along ux
    top_a = center + h * up - e * ux
    top_b = center + h * up + e * ux
    bot_a = center - h * up - e * ux
    bot_b = center - h * up + e * ux
    # vertical beams at ±0.225 along ux, spanning z ± 0.25
    left_a = center - h * ux - e * up
    left_b = center - h * ux + e * up
    right_a = center + h * ux - e * up
    right_b = center + h * ux + e * up
    # support column below the opening (portal: cylinder; low_portal: box
    # base — both approximated as a vertical capsule)
    sup_c = center + GATE_SUPPORT_CENTER_DZ * up
    sup_a = sup_c - GATE_SUPPORT_HALF_LEN * up
    sup_b = sup_c + GATE_SUPPORT_HALF_LEN * up

    a = jnp.stack([top_a, bot_a, left_a, right_a, sup_a], axis=-2)
    b = jnp.stack([top_b, bot_b, left_b, right_b, sup_b], axis=-2)
    radius = jnp.asarray(
        [GATE_BEAM_HALF, GATE_BEAM_HALF, GATE_BEAM_HALF, GATE_BEAM_HALF,
         GATE_SUPPORT_RADIUS],
        dtype=gate_pose.dtype,
    )
    return a, b, radius


def drone_gate_distance(drone_pos, gate_pose):
    """Surface distance from a drone center to one gate's structure.

    drone_pos: (..., 3); gate_pose: (..., 6). Replacement for
    ``getClosestPoints(gate, drone)`` distance gating (reference :614-620).
    """
    a, b, radius = gate_beam_segments(gate_pose)
    d = point_segment_distance(drone_pos[..., None, :], a, b) - radius
    return jnp.min(d, axis=-1)


def drone_obstacle_distance(drone_pos, obstacle_pose):
    """Surface distance to an obstacle cylinder (reference :631-637).

    obstacle_pose: (..., >=3) [x, y, z, ...]; the 0.8 m cylinder is centered
    at the obstacle z (obstacle.urdf).
    """
    center = obstacle_pose[..., :3]
    up = jnp.zeros_like(center).at[..., 2].set(1.0)
    a = center - OBSTACLE_HALF_LEN * up
    b = center + OBSTACLE_HALF_LEN * up
    return point_segment_distance(drone_pos, a, b) - OBSTACLE_RADIUS


def gate_pass_rays(drone_pos, gate_pose, gate_type, drone_radius):
    """Gate-passage test: does the drone body intersect the 7-ray fan?

    Mirrors ``_gate_progress`` (reference :471-506): 7 vertical segments in
    the gate plane at lateral offsets i*0.05 (i = -3..3) along the gate's
    yaw direction, z in height ± 0.1875 with height fixed per gate *type*
    (1.0 tall / 0.525 low — reference :477-482 hardcodes these, ignoring the
    configured z). Intersection = point-segment distance < drone radius.

    drone_pos (..., 3); gate_pose (..., 6); gate_type (...,) int (0 tall,
    1 low). Returns bool (...,).
    """
    x, y, yaw = gate_pose[..., 0], gate_pose[..., 1], gate_pose[..., 5]
    height = jnp.where(
        gate_type == 0,
        jnp.asarray(GATE_Z_TALL, dtype=drone_pos.dtype),
        jnp.asarray(GATE_Z_LOW, dtype=drone_pos.dtype),
    )
    dx = 0.05 * jnp.cos(yaw)
    dy = 0.05 * jnp.sin(yaw)
    i = jnp.arange(-3, 4, dtype=drone_pos.dtype)  # (7,)
    rx = x[..., None] + i * dx[..., None]
    ry = y[..., None] + i * dy[..., None]
    lo = height[..., None] - GATE_RAY_HALF_LEN
    hi = height[..., None] + GATE_RAY_HALF_LEN
    a = jnp.stack([rx, ry, jnp.broadcast_to(lo, rx.shape)], axis=-1)
    b = jnp.stack([rx, ry, jnp.broadcast_to(hi, rx.shape)], axis=-1)
    d = point_segment_distance(drone_pos[..., None, :], a, b)
    return jnp.any(d < jnp.asarray(drone_radius)[..., None], axis=-1)


def drone_drone_collision(pos, radius, half_h=0.0125):
    """(N, N) bool pairwise collision matrix, drones as flat cylinders
    (COMPETE mode elimination, reference reset:153-159 + _collision:552-562)."""
    delta = pos[..., :, None, :] - pos[..., None, :, :]
    dxy = jnp.linalg.norm(delta[..., :2], axis=-1)
    dz = jnp.abs(delta[..., 2])
    n = pos.shape[-2]
    hit = (dxy < 2.0 * radius) & (dz < 2.0 * half_h)
    return hit & ~jnp.eye(n, dtype=bool)


# ---------------------------------------------------------------------------
# cylinder-exact contact tests (drone = flat cylinder r=collision_r,
# half-height collision_h/2 — the cf2 URDF collision shape)


def _vertical_capsule_hit(pos, center_xy_a, z_lo, z_hi, obs_r, drone_r, half_h):
    """Drone cylinder vs vertical cylinder: horizontal overlap AND z overlap."""
    dxy = jnp.linalg.norm(pos[..., :2] - center_xy_a, axis=-1)
    z = pos[..., 2]
    return (
        (dxy < obs_r + drone_r)
        & (z - half_h < z_hi)
        & (z + half_h > z_lo)
    )


def drone_gate_collision(drone_pos, gate_pose, drone_r, half_h=0.0125):
    """Exact-enough drone-cylinder vs gate-frame contact test.

    Decomposes each frame element into horizontal/vertical gap tests so a
    drone skimming just above the support column (as the reference's
    hand-tuned race line does) is NOT flagged — matching PyBullet's
    box/cylinder contact manifold to within the beam-corner rounding.
    drone_pos (..., 3); gate_pose (..., 6). Returns bool (...,).
    """
    x, y, z, yaw = (
        gate_pose[..., 0], gate_pose[..., 1], gate_pose[..., 2],
        gate_pose[..., 5],
    )
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    ux = jnp.stack([c, s], axis=-1)                       # beam direction
    center_xy = jnp.stack([x, y], axis=-1)
    rel_xy = drone_pos[..., :2] - center_xy
    along = jnp.sum(rel_xy * ux, axis=-1)                 # along beam axis
    perp = jnp.abs(rel_xy[..., 0] * (-ux[..., 1]) + rel_xy[..., 1] * ux[..., 0])
    dz_center = drone_pos[..., 2] - z

    within_span = jnp.abs(along) < GATE_EDGE_HALF_LEN + drone_r

    # horizontal beams at z ± 0.225: box half 0.025 in perp and z
    horiz_hit = (
        within_span
        & (perp < GATE_BEAM_HALF + drone_r)
        & (
            (jnp.abs(dz_center - GATE_OPENING_HALF) < GATE_BEAM_HALF + half_h)
            | (jnp.abs(dz_center + GATE_OPENING_HALF) < GATE_BEAM_HALF + half_h)
        )
    )

    # vertical beams at along = ±0.225 spanning z ± 0.25
    vert_hit = (
        (perp < GATE_BEAM_HALF + drone_r)
        & (
            (jnp.abs(along - GATE_OPENING_HALF) < GATE_BEAM_HALF + drone_r)
            | (jnp.abs(along + GATE_OPENING_HALF) < GATE_BEAM_HALF + drone_r)
        )
        & (jnp.abs(dz_center) < GATE_EDGE_HALF_LEN + half_h)
    )

    # support column below the opening
    sup_lo = z + GATE_SUPPORT_CENTER_DZ - GATE_SUPPORT_HALF_LEN
    sup_hi = z + GATE_SUPPORT_CENTER_DZ + GATE_SUPPORT_HALF_LEN
    sup_hit = _vertical_capsule_hit(
        drone_pos, center_xy, sup_lo, sup_hi, GATE_SUPPORT_RADIUS, drone_r,
        half_h,
    )
    return horiz_hit | vert_hit | sup_hit


def drone_obstacle_collision(drone_pos, obstacle_pose, drone_r, half_h=0.0125):
    """Drone cylinder vs obstacle cylinder (r=0.05, z ± 0.4 around center)."""
    center = obstacle_pose[..., :3]
    return _vertical_capsule_hit(
        drone_pos,
        center[..., :2],
        center[..., 2] - OBSTACLE_HALF_LEN,
        center[..., 2] + OBSTACLE_HALF_LEN,
        OBSTACLE_RADIUS,
        drone_r,
        half_h,
    )


def ground_collision(pos, collision_h, collision_z_offset):
    """Drone touching the plane (reference PLANE_ID contact)."""
    return pos[..., 2] <= collision_h / 2.0 - collision_z_offset + 1e-6
