"""Analytic ray-casting renderer: RGB / depth / segmentation in-graph.

TPU-native replacement for PyBullet's TinyRenderer camera paths
(``p.getCameraImage`` in ``BaseAviary._getDroneImages``:569-621 and the
video-recording capture, :296-321). The scene — ground plane, gate frames,
obstacles, drones — is described by primitive arrays (spheres + vertical
capsules + boxes as capsule unions reusing the collision geometry) and each
pixel traces one analytic ray. Everything is one fused XLA program: batched
over pixels (and cameras under ``vmap``), so vision observations can feed RL
training on-device.

Conventions match the reference cameras: 60° vertical FOV, aspect from the
resolution, camera up = world +z, drone cameras look along the body x axis
from ``pos + [0, 0, L]`` (reference :596-608).
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.ops import quat as quat_ops


class Scene(NamedTuple):
    """Primitive soup (pytree). Fixed-size arrays; unused slots masked."""

    # vertical capsules: (M, 3) base center, (M,) half_len, (M,) radius
    cap_center: jnp.ndarray
    cap_half: jnp.ndarray
    cap_radius: jnp.ndarray
    cap_color: jnp.ndarray      # (M, 3)
    cap_valid: jnp.ndarray      # (M,) bool
    # spheres (drones): (K, 3), (K,)
    sph_center: jnp.ndarray
    sph_radius: jnp.ndarray
    sph_color: jnp.ndarray
    sph_valid: jnp.ndarray
    # general segments (gate beams): (B, 3) a, (B, 3) b, (B,) radius
    seg_a: jnp.ndarray
    seg_b: jnp.ndarray
    seg_radius: jnp.ndarray
    seg_color: jnp.ndarray
    seg_valid: jnp.ndarray


def scene_from_race_state(gates_actual, obstacles_actual, drone_pos,
                          drone_radius=0.06):
    """Build a Scene from race-track arrays (reuses the collision geometry
    in ops/collision.py: 4 beams + support per gate, cylinder per obstacle)."""
    from gym_pybullet_adrp_tpu.ops.collision import gate_beam_segments
    from gym_pybullet_adrp_tpu.utils.constants import (
        OBSTACLE_HALF_LEN, OBSTACLE_RADIUS,
    )

    dtype = drone_pos.dtype
    a, b, radius = jax.vmap(
        lambda g: gate_beam_segments(g[:6])
    )(gates_actual)  # (G, 5, 3) x2, (G, 5)... radius broadcasts
    G = gates_actual.shape[0]
    seg_a = a.reshape(-1, 3)
    seg_b = b.reshape(-1, 3)
    seg_r = jnp.broadcast_to(radius, (G, 5)).reshape(-1)
    seg_color = jnp.tile(
        jnp.asarray(
            [[0.5, 0.5, 0.5], [0.0, 0.0, 0.9], [0.0, 0.9, 0.0],
             [0.9, 0.0, 0.0], [0.1, 0.5, 0.7]],
            dtype=dtype,
        ),
        (G, 1),
    )
    seg_valid = jnp.ones(seg_a.shape[0], dtype=bool)

    O = obstacles_actual.shape[0]
    cap_center = obstacles_actual[:, :3]
    cap_half = jnp.full((O,), OBSTACLE_HALF_LEN, dtype=dtype)
    cap_radius = jnp.full((O,), OBSTACLE_RADIUS, dtype=dtype)
    cap_color = jnp.tile(jnp.asarray([[0.1, 0.5, 0.7]], dtype=dtype), (O, 1))
    cap_valid = jnp.ones((O,), dtype=bool)

    K = drone_pos.shape[0]
    sph_color = jnp.tile(jnp.asarray([[0.3, 0.3, 0.3]], dtype=dtype), (K, 1))
    return Scene(
        cap_center=cap_center, cap_half=cap_half, cap_radius=cap_radius,
        cap_color=cap_color, cap_valid=cap_valid,
        sph_center=drone_pos,
        sph_radius=jnp.full((K,), drone_radius, dtype=dtype),
        sph_color=sph_color,
        sph_valid=jnp.ones((K,), dtype=bool),
        seg_a=seg_a, seg_b=seg_b, seg_radius=seg_r, seg_color=seg_color,
        seg_valid=seg_valid,
    )


def add_landmarks(scene: Scene, dtype=jnp.float32) -> Scene:
    """Append the 4 colored landmark pillars (the reference's RGB-mode
    props, BaseRLAviary._addObstacles:106-126). One definition shared by
    the Gym replay scene (envs/aviary._scene) and the in-graph training
    obs (envs/rl.compute_rgb_obs) so train-time and replay-time visuals
    cannot diverge."""
    lm = jnp.asarray(
        [[1, 0, 0.1], [0, 1, 0.1], [-1, 0, 0.1], [0, -1, 0.1]], dtype=dtype
    )
    return scene._replace(
        cap_center=lm,
        cap_half=jnp.full((4,), 0.1, dtype),
        cap_radius=jnp.full((4,), 0.05, dtype),
        cap_color=jnp.asarray(
            [[0.8, 0.2, 0.2], [0.2, 0.8, 0.2], [0.9, 0.8, 0.1],
             [0.5, 0.3, 0.1]], dtype=dtype,
        ),
        cap_valid=jnp.ones((4,), dtype=bool),
    )


def empty_scene(dtype=jnp.float32) -> Scene:
    """Ground-plane-only scene (the RL hover envs)."""
    z3 = jnp.zeros((0, 3), dtype=dtype)
    z1 = jnp.zeros((0,), dtype=dtype)
    zb = jnp.zeros((0,), dtype=bool)
    return Scene(
        cap_center=z3, cap_half=z1, cap_radius=z1, cap_color=z3, cap_valid=zb,
        sph_center=z3, sph_radius=z1, sph_color=z3, sph_valid=zb,
        seg_a=z3, seg_b=z3, seg_radius=z1, seg_color=z3, seg_valid=zb,
    )


# ---------------------------------------------------------------------------
# intersections (each returns hit distance t, +inf on miss)

_FAR = 1e9


def _ray_plane_z0(o, d):
    t = -o[..., 2] / jnp.where(jnp.abs(d[..., 2]) > 1e-9, d[..., 2], 1e-9)
    return jnp.where((t > 1e-4) & (jnp.abs(d[..., 2]) > 1e-9), t, _FAR)


def _ray_sphere(o, d, c, r):
    oc = o - c
    b = jnp.sum(oc * d, axis=-1)
    cc = jnp.sum(oc * oc, axis=-1) - r * r
    disc = b * b - cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = -b - sq
    return jnp.where((disc > 0) & (t > 1e-4), t, _FAR)


def _ray_capsule(o, d, a, b_end, r):
    """Ray vs capsule segment [a, b_end] radius r (infinite-cylinder clip +
    end-sphere caps)."""
    ab = b_end - a
    ao = o - a
    ab_len2 = jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-12)
    # cylinder part: components orthogonal to axis
    d_par = jnp.sum(d * ab, axis=-1, keepdims=True) * ab / ab_len2[..., None]
    o_par = jnp.sum(ao * ab, axis=-1, keepdims=True) * ab / ab_len2[..., None]
    d_perp = d - d_par
    o_perp = ao - o_par
    A = jnp.sum(d_perp * d_perp, axis=-1)
    B = jnp.sum(o_perp * d_perp, axis=-1)
    C = jnp.sum(o_perp * o_perp, axis=-1) - r * r
    disc = B * B - A * C
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    safe_A = jnp.where(A > 1e-12, A, 1e-12)
    t_cyl = (-B - sq) / safe_A
    # clip to the segment span
    hit_pt = o + t_cyl[..., None] * d
    s = jnp.sum((hit_pt - a) * ab, axis=-1) / ab_len2
    cyl_ok = (disc > 0) & (A > 1e-12) & (t_cyl > 1e-4) & (s >= 0) & (s <= 1)
    t_cyl = jnp.where(cyl_ok, t_cyl, _FAR)
    # end caps
    t_a = _ray_sphere(o, d, a, r)
    t_b = _ray_sphere(o, d, b_end, r)
    return jnp.minimum(t_cyl, jnp.minimum(t_a, t_b))


def render(scene: Scene, cam_pos, cam_target, width=64, height=48,
           fov_deg=60.0, far=1000.0):
    """Render one camera. Returns (rgb (H, W, 4) float [0, 255],
    depth (H, W) float meters, seg (H, W) int32 object id; -1 = none/sky,
    0 = ground, then capsules, spheres, segments in scene order).
    """
    dtype = cam_pos.dtype
    forward = cam_target - cam_pos
    forward = forward / jnp.maximum(jnp.linalg.norm(forward), 1e-9)
    world_up = jnp.asarray([0.0, 0.0, 1.0], dtype=dtype)
    right = jnp.cross(forward, world_up)
    right_norm = jnp.linalg.norm(right)
    # degenerate straight-up/down view: pick x as right
    right = jnp.where(
        right_norm > 1e-6,
        right / jnp.maximum(right_norm, 1e-9),
        jnp.asarray([1.0, 0.0, 0.0], dtype=dtype),
    )
    up = jnp.cross(right, forward)

    aspect = width / height
    tan_half = jnp.tan(jnp.deg2rad(fov_deg / 2.0))
    ys = (0.5 - (jnp.arange(height, dtype=dtype) + 0.5) / height) * 2 * tan_half
    xs = ((jnp.arange(width, dtype=dtype) + 0.5) / width - 0.5) * 2 * tan_half * aspect
    dirs = (
        forward[None, None, :]
        + xs[None, :, None] * right[None, None, :]
        + ys[:, None, None] * up[None, None, :]
    )
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)  # (H, W, 3)
    o = jnp.broadcast_to(cam_pos, dirs.shape)

    # collect hits: ids offset per primitive class
    t_ground = _ray_plane_z0(o, dirs)  # (H, W)
    best_t = t_ground
    best_id = jnp.where(t_ground < _FAR, 0, -1)

    def fold(best, ts, ids_base, valid):
        best_t, best_id = best
        if ts.shape[-1] == 0:
            return best
        ts = jnp.where(valid, ts, _FAR)
        arg = jnp.argmin(ts, axis=-1)
        tmin = jnp.take_along_axis(ts, arg[..., None], axis=-1)[..., 0]
        better = tmin < best_t
        return (
            jnp.where(better, tmin, best_t),
            jnp.where(better, ids_base + arg, best_id),
        )

    if scene.cap_center.shape[0] > 0:
        up3 = jnp.asarray([0.0, 0.0, 1.0], dtype=dtype)
        a = scene.cap_center - scene.cap_half[:, None] * up3
        b = scene.cap_center + scene.cap_half[:, None] * up3
        ts = jax.vmap(
            lambda aa, bb, rr: _ray_capsule(o, dirs, aa, bb, rr),
            out_axes=-1,
        )(a, b, scene.cap_radius)
        best_t, best_id = fold((best_t, best_id), ts, 1, scene.cap_valid)
    n_cap = scene.cap_center.shape[0]

    if scene.sph_center.shape[0] > 0:
        ts = jax.vmap(
            lambda cc, rr: _ray_sphere(o, dirs, cc, rr), out_axes=-1
        )(scene.sph_center, scene.sph_radius)
        best_t, best_id = fold((best_t, best_id), ts, 1 + n_cap, scene.sph_valid)
    n_sph = scene.sph_center.shape[0]

    if scene.seg_a.shape[0] > 0:
        ts = jax.vmap(
            lambda aa, bb, rr: _ray_capsule(o, dirs, aa, bb, rr), out_axes=-1
        )(scene.seg_a, scene.seg_b, scene.seg_radius)
        best_t, best_id = fold(
            (best_t, best_id), ts, 1 + n_cap + n_sph, scene.seg_valid
        )

    # colors
    hit_pt = o + best_t[..., None] * dirs
    # ground checkerboard
    checker = (
        jnp.floor(hit_pt[..., 0]).astype(jnp.int32)
        + jnp.floor(hit_pt[..., 1]).astype(jnp.int32)
    ) % 2
    ground_col = jnp.where(
        checker[..., None] == 0,
        jnp.asarray([0.8, 0.8, 0.8], dtype=dtype),
        jnp.asarray([0.55, 0.55, 0.55], dtype=dtype),
    )
    all_colors = jnp.concatenate(
        [scene.cap_color, scene.sph_color, scene.seg_color], axis=0
    )
    sky = jnp.asarray([0.7, 0.85, 1.0], dtype=dtype)
    obj_col = jnp.where(
        best_id[..., None] >= 1,
        all_colors[jnp.clip(best_id - 1, 0, max(all_colors.shape[0] - 1, 0))],
        ground_col,
    ) if all_colors.shape[0] > 0 else ground_col
    rgb = jnp.where(
        best_id[..., None] < 0, sky,
        jnp.where(best_id[..., None] == 0, ground_col, obj_col),
    )
    # simple depth-based shading
    shade = 1.0 / (1.0 + 0.08 * jnp.minimum(best_t, 50.0))
    rgb = jnp.where(best_id[..., None] >= 0, rgb * (0.55 + 0.45 * shade[..., None]), rgb)

    rgba = jnp.concatenate(
        [rgb * 255.0, jnp.full(rgb.shape[:-1] + (1,), 255.0, dtype=dtype)],
        axis=-1,
    )
    depth = jnp.where(best_t < _FAR, best_t, far)
    return rgba, depth, best_id


def drone_camera(drone_pos, drone_quat, arm_len):
    """Camera pose for a drone's POV (reference _getDroneImages:596-603:
    eye at pos + [0, 0, L], target 1000 m along the body x axis)."""
    forward = quat_ops.rotate(
        drone_quat, jnp.asarray([1000.0, 0.0, 0.0], dtype=drone_pos.dtype)
    )
    eye = drone_pos + jnp.asarray([0.0, 0.0, arm_len], dtype=drone_pos.dtype)
    return eye, drone_pos + forward
