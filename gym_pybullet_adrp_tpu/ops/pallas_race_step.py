"""Fully-fused race RL step: firmware window + ctrl-rate tail, ONE kernel.

Round-1 profile (VALIDATION §5): the 20-tick window kernel alone runs at
325M env-steps/s but the end-to-end row path managed 67.5M — the ctrl-rate
tail (gate progress, collisions, visibility, RewardWrapper shaping, obs
assembly, autoreset) ran as ~hundreds of small XLA fusions over (T, 128)
rows, each paying an HBM round trip and launch overhead. This kernel keeps
the S block VMEM-resident through BOTH the window and the tail, writing the
observation block, reward rows, done rows, and the post-autoreset state in
the same launch.

Everything stochastic that must match the unfused row path bitwise — the
episode-reset pose/inertia/geometry draws — is sampled OUTSIDE with the
same jax.random key splits and passed in as rows (they are tiny: ~10 rows).
Only the per-tick disturbance noise uses the in-kernel TPU PRNG (identical
to ops/pallas_race.race_window), with the same precomputed-rows fallback
for interpret mode.

Block channel maps (beyond pallas_race's S/W):

R (14, T, 128) race rows:
  0 current_gate  1 eliminated  2 finished  3 shape_gate_id
  4:7 target_xyz  7:10 prev_pos  10 mass  11:14 J diag
GG (3G, Tb, 128) / OO (2O, Tb, 128): per-env actual geometry
  ([gx, gy, gyaw] per gate / [ox, oy] per obstacle)
EP (Tb, 128): episode ctrl-step counter
RST (10, T, 128) reset draws: [px, py, pz, roll, pitch, yaw, mass, J diag]
RSTG (3G, Tb, 128) / RSTO (2O, Tb, 128): reset geometry rows

Outputs: S' (58), R' (14), GG', OO', EP', OBS (C, T, 128), REW (T, 128),
DONE (Tb, 128). Every block is both a scan carry in the training loop and
a kernel operand — the env's state pytree IS this set of blocks
(envs/race_rl_rowfast.RowRaceState), so a train step does zero
repacking between launches. Reference semantics per
envs/race_rl_rowfast.py (which is the bit-checked XLA twin, kept as the
interpret-mode equivalence anchor).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_pybullet_adrp_tpu.ops import pallas_race
from gym_pybullet_adrp_tpu.utils.constants import (
    GATE_BEAM_HALF, GATE_EDGE_HALF_LEN, GATE_OPENING_HALF, GATE_RAY_HALF_LEN,
    GATE_SUPPORT_CENTER_DZ, GATE_SUPPORT_HALF_LEN, GATE_SUPPORT_RADIUS,
    GATE_Z_LOW, GATE_Z_TALL, OBSTACLE_HALF_LEN, OBSTACLE_RADIUS, RAD_TO_DEG,
    VISIBILITY_RANGE,
)

LANE = pallas_race.LANE
R_CHANNELS = 14
RST_CHANNELS = 10

# policy-params pack layout (rows x 128, f32) for the in-kernel
# ActorCritic forward (models/policy.ActorCritic tanh towers, any hidden
# widths — VERDICT r3 item 2 unlocked the pack past 64-64): transposed
# weight blocks first (matmul lhs; inner dims > 128 split into
# 128-column chunks stacked along rows), then lane-broadcast biases.
LOG_2PI = float(np.log(2.0 * np.pi))


def pp_layout(C, hidden=(64, 64)):
    """Row offsets of the policy pack for obs size ``C`` and tower widths
    ``hidden``. Weight entries are (row, out, inn, n_chunks) — chunk j
    holds inner dims [128j, 128(j+1)) in its first lanes; bias entries
    are (row, rows). The 64-64 layout reproduces the round-3 constants
    exactly (PP_W1T=0 ... PP_ROWS=526)."""
    H1, H2 = hidden
    off = {}
    r = 0
    for name, out, inn in (
        ("w1", H1, C), ("w2", H2, H1), ("w3", 4, H2),
        ("v1", H1, C), ("v2", H2, H1), ("v3", 1, H2),
    ):
        nch = -(-inn // 128)
        off[name] = (r, out, inn, nch)
        r += out * nch
    for name, rows in (
        ("b1", H1), ("b2", H2), ("vb1", H1), ("vb2", H2),
        ("b3", 4), ("vb3", 1), ("logstd", 4),
    ):
        off[name] = (r, rows)
        r += rows
    return off, r


def _policy_forward(pp, obs, actn, C, T, hidden=(64, 64)):
    """In-kernel ActorCritic forward + Gaussian sample, per (C,128) lane
    slice (the obs block is (C, T, 128); each t-slice is one MXU matmul
    chain). Returns (action (4,T,128) UNCLIPPED, logp (T,128),
    value (T,128)) matching models/policy.sample_action/gaussian_logp
    numerics.
    """
    f32 = jnp.float32
    off, _ = pp_layout(C, hidden)

    def matmul(name, x):
        r, out, inn, nch = off[name]
        acc = None
        for j in range(nch):
            w = min(128, inn - 128 * j)
            w_j = pp[r + j * out:r + (j + 1) * out, :w]
            x_j = x[128 * j:128 * j + w]
            d = jax.lax.dot(w_j, x_j, preferred_element_type=f32)
            acc = d if acc is None else acc + d
        return acc

    def bias(name):
        r, rows = off[name]
        return pp[r:r + rows]

    b1, b2 = bias("b1"), bias("b2")
    vb1, vb2 = bias("vb1"), bias("vb2")
    b3, vb3 = bias("b3"), bias("vb3")
    log_std = bias("logstd")
    std = jnp.exp(log_std)

    acts, logps, vals = [], [], []
    for t in range(T):
        x = obs[:, t, :]                                   # (C, 128)
        h = jnp.tanh(matmul("w1", x) + b1)
        h = jnp.tanh(matmul("w2", h) + b2)
        mean = matmul("w3", h) + b3
        hv = jnp.tanh(matmul("v1", x) + vb1)
        hv = jnp.tanh(matmul("v2", hv) + vb2)
        val = matmul("v3", hv) + vb3
        n = actn[:, t, :]                                  # (4, 128)
        action = mean + std * n
        # logp of the sampled action under N(mean, std): the normalized
        # residual IS the drawn noise. Summed via explicit row adds —
        # Mosaic (v5e) rejects a sublane-axis multi_reduction over a
        # 4-row block with offset layouts.
        contrib = -0.5 * (n * n + 2.0 * log_std + LOG_2PI)  # (4, 128)
        logp = (contrib[0:1] + contrib[1:2]
                + contrib[2:3] + contrib[3:4])              # (1, 128)
        acts.append(action)
        logps.append(logp)
        vals.append(val)
    return (
        jnp.stack(acts, axis=1),            # (4, T, 128)
        jnp.concatenate(logps, axis=0),     # (T, 128)
        jnp.concatenate(vals, axis=0),      # (T, 128)
    )


def _step_core(cfg, S0, A, Rb, gg, oo, ep_steps0, rst, gates_reset,
               obst_reset, noise_blk, policy_inputs):
    """One env step over plain arrays (shared verbatim by the single-step
    kernel and the K-step rollout kernel — one body, one maintenance
    point, bitwise-identical semantics on both). With ``policy_inputs``
    (obs_prev, pp, actn) the ActorCritic forward + Gaussian sample runs
    first and ``A`` is ignored. Returns a dict of output arrays."""
    (n_ticks, dt, kf, km, arm, ground_z, N, Tb, G, O, gates, obstacles,
     bounds_hi, heights, compete, per_drone_reward, end_after_gate,
     done_on_collision, done_on_completion, episode_len_sec, pyb_freq,
     noise, noise_rows, drone_r, half_h, unroll, telemetry, policy,
     elim_penalty, policy_hidden) = cfg

    A_raw = LOGP = VAL = None
    if policy:
        obs_in, pp, actn = policy_inputs
        C_obs = obs_in.shape[0]
        A_raw, LOGP, VAL = _policy_forward(pp, obs_in, actn, C_obs,
                                           N * Tb, policy_hidden)
        A_clip = jnp.clip(A_raw, -1.0, 1.0)
        # ACTION_SCALE [1, 1, 1, pi] as scalar math (a jnp constant would
        # be a captured array, which pallas_call rejects)
        A = jnp.concatenate(
            [A_clip[:3], A_clip[3:4] * np.float32(np.pi)], axis=0
        )

    T = N * Tb

    def _d(x, d):
        return x[d * Tb:(d + 1) * Tb]

    def _env_rows(x):
        """(Tb, 128) per-env rows -> (T, 128) per-drone broadcast."""
        if N == 1:
            return x
        return jnp.concatenate([x] * N, axis=0)

    def _tile_done(x):
        if N == 1:
            return x
        return jnp.concatenate([x] * N, axis=0)

    # ---- 1. build the window statics from action + race rows (build_W) ----
    elim0 = Rb[1]
    px0, py0, pz0 = S0[0], S0[1], S0[2]
    yaw0 = S0[23]
    z = jnp.zeros_like(px0)
    alive = elim0 < 0.5
    wv = dict(
        sp_pos=(px0 + A[0], py0 + A[1], pz0 + A[2]),
        sp_vel=(z, z, z),
        sp_acc=(z, z, z),
        sp_rate=(z, z, z),
        sp_yaw_quat_deg=yaw0 * RAD_TO_DEG,
        sp_thrust=z,
        pos_mode=alive,
        z_disable=~alive,
        planner=None,
        t_begin=z,
        duration=z,
        eliminated=~alive,
        coeffs=None,                      # statically elides the planner
        mass=Rb[10],
        J=(Rb[11], Rb[12], Rb[13]),
    )

    # ---- 2. the firmware window (shared with race_window) -----------------
    S = pallas_race._window_loop(
        S0, wv, n_ticks=n_ticks, dt=dt, kf=kf, km=km, arm=arm,
        ground_z=ground_z, noise=noise, noise_blk=noise_blk, unroll=unroll,
    )

    # ---- 3. ctrl-rate tail (mirrors race_rl_rowfast.row_tail) -------------
    px, py, pz = S[0], S[1], S[2]
    roll, pitch, yaw = S[21], S[22], S[23]
    vx, vy, vz = S[7], S[8], S[9]
    qx, qy, qz, qw = S[3], S[4], S[5], S[6]
    wx, wy, wz = S[10], S[11], S[12]
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - qz * qw)
    r02 = 2 * (qx * qz + qy * qw)
    r10 = 2 * (qx * qy + qz * qw)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - qx * qw)
    r20 = 2 * (qx * qz - qy * qw)
    r21 = 2 * (qy * qz + qx * qw)
    r22 = 1 - 2 * (qx * qx + qy * qy)
    ox_w = r00 * wx + r01 * wy + r02 * wz
    oy_w = r10 * wx + r11 * wy + r12 * wz
    oz_w = r20 * wx + r21 * wy + r22 * wz

    gx_a = [_env_rows(gg[3 * g + 0]) for g in range(G)]
    gy_a = [_env_rows(gg[3 * g + 1]) for g in range(G)]
    gyaw_a = [_env_rows(gg[3 * g + 2]) for g in range(G)]
    gcos = [jnp.cos(v) for v in gyaw_a]
    gsin = [jnp.sin(v) for v in gyaw_a]
    ox_a = [_env_rows(oo[2 * o]) for o in range(O)]
    oy_a = [_env_rows(oo[2 * o + 1]) for o in range(O)]
    ep_steps = ep_steps0

    current_gate0 = Rb[0]
    finished = jnp.maximum(
        Rb[2], (current_gate0 >= G).astype(px.dtype)
    )
    passed_any = jnp.zeros_like(px)
    for g in range(G):
        h = heights[g]
        c, s = gcos[g], gsin[g]
        relx, rely = px - gx_a[g], py - gy_a[g]
        along = relx * c + rely * s
        perp = jnp.abs(-relx * s + rely * c)
        dz_lo = (h - GATE_RAY_HALF_LEN) - pz
        dz_hi = pz - (h + GATE_RAY_HALF_LEN)
        dz_out = jnp.maximum(jnp.maximum(dz_lo, dz_hi), 0.0)
        i_near = jnp.clip(jnp.round(along / 0.05), -3.0, 3.0)
        d_lat = jnp.abs(along - i_near * 0.05)
        dist2 = perp * perp + d_lat * d_lat + dz_out * dz_out
        hit = dist2 < drone_r * drone_r
        passed_any = passed_any + hit.astype(px.dtype) * (
            (current_gate0 == g).astype(px.dtype)
        )
    in_prog = (current_gate0 < G).astype(px.dtype)
    current_gate = current_gate0 + jnp.minimum(passed_any, 1.0) * in_prog

    crash = jnp.zeros_like(px, dtype=jnp.bool_)
    for g in range(G):
        gz_ = gates[g, 2]
        c, s = gcos[g], gsin[g]
        relx, rely = px - gx_a[g], py - gy_a[g]
        along = relx * c + rely * s
        perp = jnp.abs(-relx * s + rely * c)
        dzc = pz - gz_
        within = jnp.abs(along) < GATE_EDGE_HALF_LEN + drone_r
        horiz = within & (perp < GATE_BEAM_HALF + drone_r) & (
            (jnp.abs(dzc - GATE_OPENING_HALF) < GATE_BEAM_HALF + half_h)
            | (jnp.abs(dzc + GATE_OPENING_HALF) < GATE_BEAM_HALF + half_h)
        )
        vert = (perp < GATE_BEAM_HALF + drone_r) & (
            (jnp.abs(along - GATE_OPENING_HALF) < GATE_BEAM_HALF + drone_r)
            | (jnp.abs(along + GATE_OPENING_HALF) < GATE_BEAM_HALF + drone_r)
        ) & (jnp.abs(dzc) < GATE_EDGE_HALF_LEN + half_h)
        sup_lo = gz_ + GATE_SUPPORT_CENTER_DZ - GATE_SUPPORT_HALF_LEN
        sup_hi = gz_ + GATE_SUPPORT_CENTER_DZ + GATE_SUPPORT_HALF_LEN
        dxy = jnp.sqrt(relx * relx + rely * rely)
        sup = (
            (dxy < GATE_SUPPORT_RADIUS + drone_r)
            & (pz - half_h < sup_hi) & (pz + half_h > sup_lo)
        )
        crash = crash | horiz | vert | sup
    for o in range(O):
        oz_ = obstacles[o, 2]
        dxy = jnp.sqrt((px - ox_a[o]) ** 2 + (py - oy_a[o]) ** 2)
        crash = crash | (
            (dxy < OBSTACLE_RADIUS + drone_r)
            & (pz - half_h < oz_ + OBSTACLE_HALF_LEN)
            & (pz + half_h > oz_ - OBSTACLE_HALF_LEN)
        )
    crash = crash | (pz <= ground_z + 1e-6)
    if compete and N > 1:
        # concatenate as f32 — Mosaic (v5e) rejects i1 vector concats
        dd = []
        for d in range(N):
            hit_d = jnp.zeros((Tb, LANE), dtype=jnp.bool_)
            for e in range(N):
                if e == d:
                    continue
                dxy2 = (
                    (_d(px, d) - _d(px, e)) ** 2
                    + (_d(py, d) - _d(py, e)) ** 2
                )
                hit_d = hit_d | (
                    (dxy2 < (2.0 * drone_r) ** 2)
                    & (jnp.abs(_d(pz, d) - _d(pz, e)) < 2.0 * half_h)
                )
            dd.append(hit_d.astype(px.dtype))
        crash = crash | (jnp.concatenate(dd, axis=0) > 0.5)
    if not done_on_collision:
        crash = jnp.zeros_like(crash)
    oob = (
        (jnp.abs(px) > bounds_hi[0]) | (jnp.abs(py) > bounds_hi[1])
        | (jnp.abs(pz) > bounds_hi[2])
    )
    unstable = (
        (jnp.abs(ox_w) > 20.0) | (jnp.abs(oy_w) > 20.0)
        | (jnp.abs(oz_w) > 20.0)
    )
    eliminated = jnp.maximum(
        Rb[1], (crash | oob | unstable).astype(px.dtype)
    )

    # visibility (exact min over the 5 frame capsules)
    gate_range = []
    e_half = GATE_EDGE_HALF_LEN
    hb = GATE_BEAM_HALF
    for g in range(G):
        gz_ = gates[g, 2]
        c, s = gcos[g], gsin[g]
        relx, rely = px - gx_a[g], py - gy_a[g]
        along = relx * c + rely * s
        perp = -relx * s + rely * c
        dzc = pz - gz_
        a_cl = jnp.clip(along, -e_half, e_half)
        d_top = jnp.sqrt(
            (along - a_cl) ** 2 + perp ** 2 + (dzc - GATE_OPENING_HALF) ** 2
        ) - hb
        d_bot = jnp.sqrt(
            (along - a_cl) ** 2 + perp ** 2 + (dzc + GATE_OPENING_HALF) ** 2
        ) - hb
        z_cl = jnp.clip(dzc, -e_half, e_half)
        d_l = jnp.sqrt(
            (along + GATE_OPENING_HALF) ** 2 + perp ** 2 + (dzc - z_cl) ** 2
        ) - hb
        d_r = jnp.sqrt(
            (along - GATE_OPENING_HALF) ** 2 + perp ** 2 + (dzc - z_cl) ** 2
        ) - hb
        sup_c = GATE_SUPPORT_CENTER_DZ
        s_cl = jnp.clip(dzc - sup_c, -GATE_SUPPORT_HALF_LEN,
                        GATE_SUPPORT_HALF_LEN)
        d_s = jnp.sqrt(
            relx ** 2 + rely ** 2 + (dzc - sup_c - s_cl) ** 2
        ) - GATE_SUPPORT_RADIUS
        d = jnp.minimum(
            jnp.minimum(jnp.minimum(d_top, d_bot), jnp.minimum(d_l, d_r)),
            d_s,
        )
        gate_range.append((d < VISIBILITY_RANGE).astype(px.dtype))
    obst_range = []
    for o in range(O):
        oz_ = obstacles[o, 2]
        dxy = jnp.sqrt((px - ox_a[o]) ** 2 + (py - oy_a[o]) ** 2)
        dz_out = jnp.maximum(
            jnp.maximum((oz_ - OBSTACLE_HALF_LEN) - pz,
                        pz - (oz_ + OBSTACLE_HALF_LEN)), 0.0)
        d = jnp.sqrt(dxy * dxy + dz_out * dz_out) - OBSTACLE_RADIUS
        obst_range.append((d < VISIBILITY_RANGE).astype(px.dtype))

    gate_pose_rows = []
    for g in range(G):
        in_r = gate_range[g] > 0.5
        gate_pose_rows.append([
            jnp.where(in_r, gx_a[g], gates[g, 0]),
            jnp.where(in_r, gy_a[g], gates[g, 1]),
            jnp.full_like(px, gates[g, 2]),
            jnp.where(in_r, gyaw_a[g], gates[g, 5]),
        ])
    obst_pose_rows = []
    for o in range(O):
        in_r = obst_range[o] > 0.5
        obst_pose_rows.append([
            jnp.where(in_r, ox_a[o], obstacles[o, 0]),
            jnp.where(in_r, oy_a[o], obstacles[o, 1]),
            jnp.full_like(px, obstacles[o, 2]),
        ])

    # ---- 4. termination / shaping (mirrors race_rl_rowfast.step) ----------
    ep_steps = ep_steps + 1
    done_mask = (
        jnp.maximum(eliminated, finished)
        if done_on_completion else eliminated
    )
    all_done = done_mask.reshape(N, Tb, LANE).min(axis=0)
    terminated = all_done > 0.5
    if end_after_gate:
        terminated = terminated | (_d(current_gate, 0) >= end_after_gate)
    truncated = ep_steps * n_ticks / pyb_freq > episode_len_sec
    task_completed = finished.reshape(N, Tb, LANE).min(axis=0) > 0.5

    shape_gate_id = Rb[3]
    sg_mod = shape_gate_id - G * jnp.floor(shape_gate_id / G)
    passed = current_gate > sg_mod
    gid = jnp.clip(current_gate, 0.0, G - 1.0)
    tx = jnp.zeros_like(px)
    ty = jnp.zeros_like(px)
    tz = jnp.zeros_like(px)
    for g in range(G):
        m = (gid == g).astype(px.dtype)
        tx = tx + m * gate_pose_rows[g][0]
        ty = ty + m * gate_pose_rows[g][1]
        tz = tz + m * gate_pose_rows[g][2]
    new_tx = jnp.where(passed, tx, Rb[4])
    new_ty = jnp.where(passed, ty, Rb[5])
    new_tz = jnp.where(passed, tz, Rb[6])
    new_gate_id = jnp.where(passed, current_gate, shape_gate_id)
    r_passed = jnp.where(passed, 5.0, 0.0)
    prev_px, prev_py, prev_pz = Rb[7], Rb[8], Rb[9]
    d_prev_xy = jnp.sqrt(
        (new_tx - prev_px) ** 2 + (new_ty - prev_py) ** 2
    )
    d_cur_xy = jnp.sqrt((new_tx - px) ** 2 + (new_ty - py) ** 2)
    d_prev_z = jnp.abs(new_tz - prev_pz)
    d_cur_z = jnp.abs(new_tz - pz)
    progress = (d_prev_xy - d_cur_xy) + (d_prev_z - d_cur_z) + r_passed

    if per_drone_reward:
        elim_edge = eliminated - Rb[1]
        finish_edge = finished - Rb[2]
        reward = progress - elim_penalty * elim_edge + 10.0 * finish_edge
    else:
        r_coll = jnp.where(terminated & ~task_completed, -1.0, 0.0)
        r_lap = jnp.where(terminated & task_completed, 10.0, 0.0)
        reward_env = _d(progress, 0) + r_coll + r_lap
        reward = _tile_done(reward_env)  # only the first Tb rows are read

    # ---- 5. observation channels -------------------------------------------
    obs_list = (
        [px, py, pz, roll, pitch, yaw, vx, vy, vz, ox_w, oy_w, oz_w]
        + [ch for g in range(G) for ch in gate_pose_rows[g]]
        + gate_range
        + [ch for o in range(O) for ch in obst_pose_rows[o]]
        + obst_range
        + [current_gate]
    )
    if compete and N > 1:
        pose6 = (px, py, pz, roll, pitch, yaw)
        for j in range(N - 1):
            for ch in pose6:
                blocks = []
                for d in range(N):
                    e = [e_ for e_ in range(N) if e_ != d][j]
                    blocks.append(_d(ch, e))
                obs_list.append(jnp.concatenate(blocks, axis=0))
    obs_rows = jnp.stack(obs_list, axis=0)  # (C, T, 128)

    # ---- 6. autoreset -------------------------------------------------------
    done = terminated | truncated             # (Tb, 128)
    d_env = done.astype(px.dtype)
    d_rows = _tile_done(d_env)                # f32 concat (no i1 vectors)
    done_rows = d_rows > 0.5                  # (T, 128)

    rpx, rpy_, rpz = rst[0], rst[1], rst[2]
    rroll, rpitch, ryaw = rst[3], rst[4], rst[5]
    # reset S block, exactly as race_rl_rowfast.reset_rows builds it
    cr, sr = jnp.cos(rroll / 2), jnp.sin(rroll / 2)
    cp, sp_ = jnp.cos(rpitch / 2), jnp.sin(rpitch / 2)
    cy, sy = jnp.cos(ryaw / 2), jnp.sin(ryaw / 2)
    rqx = sr * cp * cy - cr * sp_ * sy
    rqy = cr * sp_ * cy + sr * cp * sy
    rqz = cr * cp * sy - sr * sp_ * cy
    rqw = cr * cp * cy + sr * sp_ * sy
    zr = jnp.zeros_like(px)
    S_reset = jnp.stack(
        [rpx, rpy_, rpz, rqx, rqy, rqz, rqw] + [zr] * 6
        + [zr] * 8
        + [rroll, rpitch, ryaw]
        + [zr] * 3
        + [zr] * 12
        + [zr] * 6 + [zr] * 2 + [zr] * 2 + [zr] * 4
        + [zr] * 5,
        axis=0,
    )
    S = jnp.where(done_rows[None], S_reset, S)

    gg_new = jnp.where(done[None], gates_reset, gg).astype(S0.dtype)
    oo_new = jnp.where(done[None], obst_reset, oo).astype(S0.dtype)
    ep_new = (ep_steps * (1 - d_env)).astype(S0.dtype)

    # shaping target after reset: gate 0's *reset* pose (nominal z)
    tgt0x = _env_rows(gates_reset[0])
    tgt0y = _env_rows(gates_reset[1])
    tgt0z = jnp.full_like(px, gates[0, 2])

    r_new = jnp.stack(
        [
            current_gate * (1 - d_rows),
            eliminated * (1 - d_rows),
            finished * (1 - d_rows),
            new_gate_id * (1 - d_rows),
            jnp.where(done_rows, tgt0x, new_tx),
            jnp.where(done_rows, tgt0y, new_ty),
            jnp.where(done_rows, tgt0z, new_tz),
            jnp.where(done_rows, rpx, px),
            jnp.where(done_rows, rpy_, py),
            jnp.where(done_rows, rpz, pz),
            jnp.where(done_rows, rst[6], Rb[10]),
            jnp.where(done_rows, rst[7], Rb[11]),
            jnp.where(done_rows, rst[8], Rb[12]),
            jnp.where(done_rows, rst[9], Rb[13]),
        ],
        axis=0,
    )

    # post-done obs = fresh episode's first obs
    obs_rows = jnp.where(done_rows[None], 0.0, obs_rows)
    reset_kin = (rpx, rpy_, rpz, rroll, rpitch, ryaw)
    fixed = []
    for i, v in enumerate(reset_kin):
        fixed.append(jnp.where(done_rows, v, obs_rows[i]))
    obs_fixed = {i: f for i, f in enumerate(fixed)}
    gate_pose_nom = gates[:, [0, 1, 2, 5]].reshape(-1)
    for i, v in enumerate(gate_pose_nom):
        ch = 12 + i
        obs_fixed[ch] = jnp.where(done_rows, v, obs_rows[ch])
    obst_pose_nom = obstacles[:, :3].reshape(-1)
    for i, v in enumerate(obst_pose_nom):
        ch = 12 + 4 * G + G + i
        obs_fixed[ch] = jnp.where(done_rows, v, obs_rows[ch])
    if compete and N > 1:
        base = 12 + 4 * G + G + 3 * O + O + 1
        ch_i = base
        for j in range(N - 1):
            for v in reset_kin:
                blocks = []
                for d in range(N):
                    e = [e_ for e_ in range(N) if e_ != d][j]
                    blocks.append(_d(v, e))
                fresh = jnp.concatenate(blocks, axis=0)
                obs_fixed[ch_i] = jnp.where(done_rows, fresh, obs_rows[ch_i])
                ch_i += 1
    C = obs_rows.shape[0]
    obs_rows = jnp.stack(
        [obs_fixed.get(i, obs_rows[i]) for i in range(C)], axis=0
    )

    out = {
        "S": S.astype(S0.dtype),
        "R": r_new.astype(S0.dtype),
        "GG": gg_new,
        "OO": oo_new,
        "EP": ep_new,
        "OBS": obs_rows.astype(S0.dtype),
        "REW": reward.astype(S0.dtype),
        "DONE": done.astype(S0.dtype),
    }
    if telemetry:
        # pre-autoreset race telemetry (VERDICT r2 item 9): the direct
        # gates-passed / eliminated / finished / episode-step values BEFORE
        # the same-step reset wipes them, so evaluation reads completion
        # and lap times from state rather than decoding reward edges.
        # Channel 4 is the env-level `terminated` (race logic, pre-OR with
        # truncation) so gymnasium surfaces can split term/trunc.
        out["INFO"] = jnp.stack(
            [current_gate, eliminated, finished, _tile_done(ep_steps),
             _tile_done(terminated.astype(px.dtype))],
            axis=0,
        ).astype(S0.dtype)
    if policy:
        out["ACT"] = A_raw.astype(S0.dtype)
        out["LOGP"] = LOGP.astype(S0.dtype)
        out["VAL"] = VAL.astype(S0.dtype)
    return out


def _fused_kernel(*refs, cfg):
    (n_ticks, dt, kf, km, arm, ground_z, N, Tb, G, O, gates, obstacles,
     bounds_hi, heights, compete, per_drone_reward, end_after_gate,
     done_on_collision, done_on_completion, episode_len_sec, pyb_freq,
     noise, noise_rows, drone_r, half_h, unroll, telemetry, policy,
     elim_penalty, policy_hidden) = cfg

    idx = 0
    if noise is not None and not noise_rows:
        seed_ref = refs[idx]
        idx += 1
        pltpu.prng_seed(seed_ref[0])
    if policy:
        # the action operand is replaced by (prev obs, packed policy
        # params, standard-normal draws): the ActorCritic forward +
        # Gaussian sampling runs INSIDE the launch (VERDICT r2 item 3 —
        # no XLA policy stage between env kernel launches)
        (s_ref, obs_in_ref, pp_ref, actn_ref, r_ref, gg_ref, oo_ref,
         ep_ref, rst_ref, rstg_ref, rsto_ref) = refs[idx:idx + 11]
        idx += 11
        A = None
        policy_inputs = (obs_in_ref[:], pp_ref[:], actn_ref[:])
    else:
        (s_ref, a_ref, r_ref, gg_ref, oo_ref, ep_ref, rst_ref, rstg_ref,
         rsto_ref) = refs[idx:idx + 9]
        idx += 9
        A = a_ref[:]
        policy_inputs = None
    noise_blk = None
    if noise is not None and noise_rows:
        noise_blk = refs[idx][:]
        idx += 1
    (s_out, r_out, gg_out, oo_out, ep_out, obs_out, rew_out,
     done_out) = refs[idx:idx + 8]
    idx += 8
    info_out = None
    if telemetry:
        info_out = refs[idx]
        idx += 1
    if policy:
        act_out, logp_out, val_out = refs[idx:idx + 3]

    out = _step_core(
        cfg, s_ref[:], A, r_ref[:], gg_ref[:], oo_ref[:], ep_ref[:],
        rst_ref[:], rstg_ref[:], rsto_ref[:], noise_blk, policy_inputs,
    )
    s_out[:] = out["S"]
    r_out[:] = out["R"]
    gg_out[:] = out["GG"]
    oo_out[:] = out["OO"]
    ep_out[:] = out["EP"]
    obs_out[:] = out["OBS"]
    rew_out[:] = out["REW"]
    done_out[:] = out["DONE"]
    if telemetry:
        info_out[:] = out["INFO"]
    if policy:
        act_out[:] = out["ACT"]
        logp_out[:] = out["LOGP"]
        val_out[:] = out["VAL"]


def _rollout_kernel(*refs, cfg, emit_obs):
    """K env steps per launch (grid over steps): the state blocks live in
    the constant-index OUTPUT refs — VMEM-resident across the whole grid,
    DMA'd to HBM once at the end — while per-step inputs (actions/noise
    draws/reset draws) and per-step outputs (reward/done/obs/trajectory)
    stream through double-buffered (1, ...) blocks. This removes the
    per-step HBM round trip of the full state (~22% of the single-step
    launch, VALIDATION §5d) and the per-launch overhead."""
    (n_ticks, dt, kf, km, arm, ground_z, N, Tb, G, O, gates, obstacles,
     bounds_hi, heights, compete, per_drone_reward, end_after_gate,
     done_on_collision, done_on_completion, episode_len_sec, pyb_freq,
     noise, noise_rows, drone_r, half_h, unroll, telemetry, policy,
     elim_penalty, policy_hidden) = cfg

    k = pl.program_id(0)
    idx = 0
    seeds_ref = None
    if noise is not None and not noise_rows:
        seeds_ref = refs[idx]
        idx += 1
    s_in, r_in, gg_in, oo_in, ep_in = refs[idx:idx + 5]
    idx += 5
    if policy:
        obs0_ref, pp_ref, actn_ref = refs[idx:idx + 3]
        idx += 3
    else:
        a_ref = refs[idx]
        idx += 1
    rst_ref, rstg_ref, rsto_ref = refs[idx:idx + 3]
    idx += 3
    nz_ref = None
    if noise is not None and noise_rows:
        nz_ref = refs[idx]
        idx += 1
    s_out, r_out, gg_out, oo_out, ep_out = refs[idx:idx + 5]
    idx += 5
    rew_out, done_out = refs[idx:idx + 2]
    idx += 2
    obs_out = None
    if emit_obs:
        obs_out = refs[idx]
        idx += 1
    info_out = None
    if telemetry:
        info_out = refs[idx]
        idx += 1
    if policy:
        act_out, logp_out, val_out = refs[idx:idx + 3]
        idx += 3
        obs_scr = refs[idx]          # scratch: the obs carry
        idx += 1

    # step 0: seed the VMEM-resident carries from the initial state
    @pl.when(k == 0)
    def _():
        s_out[:] = s_in[:]
        r_out[:] = r_in[:]
        gg_out[:] = gg_in[:]
        oo_out[:] = oo_in[:]
        ep_out[:] = ep_in[:]
        if policy:
            obs_scr[:] = obs0_ref[:]

    if seeds_ref is not None:
        # one reseed per step, bitwise-matching the per-launch seeding of
        # the single-step kernel under the same key chain
        pltpu.prng_seed(seeds_ref[k])
    noise_blk = nz_ref[0] if nz_ref is not None else None
    policy_inputs = (
        (obs_scr[:], pp_ref[:], actn_ref[0]) if policy else None
    )
    A = None if policy else a_ref[0]

    out = _step_core(
        cfg, s_out[:], A, r_out[:], gg_out[:], oo_out[:], ep_out[:],
        rst_ref[0], rstg_ref[0], rsto_ref[0], noise_blk, policy_inputs,
    )
    s_out[:] = out["S"]
    r_out[:] = out["R"]
    gg_out[:] = out["GG"]
    oo_out[:] = out["OO"]
    ep_out[:] = out["EP"]
    rew_out[0] = out["REW"]
    done_out[0] = out["DONE"]
    if emit_obs:
        obs_out[0] = out["OBS"]
    if telemetry:
        info_out[0] = out["INFO"]
    if policy:
        obs_scr[:] = out["OBS"]
        act_out[0] = out["ACT"]
        logp_out[0] = out["LOGP"]
        val_out[0] = out["VAL"]


def race_rollout(kf, km, arm, ground_z, S, A_seq, R, GG, OO, EP, RST_seq,
                 RSTG_seq, RSTO_seq, *, n_ticks, dt, spec_tail,
                 interpret=False, noise=None, seeds=None,
                 noise_rows_seq=None, telemetry=False, emit_obs=True,
                 policy_pack=None, obs_rows=None, actn_seq=None,
                 elim_penalty=1.0, policy_hidden=(64, 64)):
    """K fused env steps in ONE launch (grid over steps; state stays in
    VMEM between steps — see ``_rollout_kernel``).

    Sequence operands carry a leading K axis: ``A_seq`` (K, 4, T, 128)
    pre-scaled action rows (or ``actn_seq`` standard-normal draws with
    ``policy_pack``/``obs_rows`` for the in-kernel policy), ``RST_seq``
    (K, RST_CHANNELS, T, 128), ``RSTG_seq`` (K, 3G, Tb, 128), ``RSTO_seq``
    (K, 2O, Tb, 128) the per-step reset draws (sampled outside with the
    same key splits as K calls of ``race_step_fused`` — bitwise-identical
    trajectories), ``seeds`` (K,) int32 per-step PRNG seeds for the
    disturbance path, ``noise_rows_seq`` (K, n_ticks, 7, T, 128) the
    interpret-mode additive-noise fallback.

    Returns (S', R', GG', OO', EP', REW (K, T, 128), DONE (K, Tb, 128)
    [, OBS (K, C, T, 128) if emit_obs][, INFO (K, 5, T, 128) if telemetry]
    [, ACT (K, 4, T, 128), LOGP (K, T, 128), VAL (K, T, 128) if policy]).
    """
    (N, Tb, G, O, gates, obstacles, bounds_hi, heights, compete,
     per_drone_reward, end_after_gate, done_on_collision,
     done_on_completion, episode_len_sec, pyb_freq, drone_r, half_h) = \
        spec_tail
    if noise is not None:
        noise = (
            float(noise[0]),
            tuple(float(v) for v in noise[1]),
            tuple(float(v) for v in noise[2]),
        )
    policy = policy_pack is not None
    cfg = (
        n_ticks, float(dt), float(kf), float(km), float(arm),
        float(ground_z), N, Tb, G, O,
        np.asarray(gates, dtype=np.float32),
        np.asarray(obstacles, dtype=np.float32),
        tuple(float(v) for v in bounds_hi),
        tuple(float(v) for v in heights),
        bool(compete), bool(per_drone_reward), int(end_after_gate),
        bool(done_on_collision), bool(done_on_completion),
        float(episode_len_sec), float(pyb_freq),
        noise, noise_rows_seq is not None, float(drone_r), float(half_h),
        not interpret, bool(telemetry), policy,
        float(elim_penalty), tuple(policy_hidden),
    )
    T = N * Tb
    C = 12 + 5 * G + 4 * O + 1 + (6 * (N - 1) if compete and N > 1 else 0)
    K = (actn_seq if policy else A_seq).shape[0]
    dtype = S.dtype
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    def const(shape):
        """Whole-array block revisited by every grid step: stays
        VMEM-resident, one HBM transfer total."""
        return pl.BlockSpec(shape, lambda k: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def stream(shape):
        """(1, ...) block per grid step, double-buffered by the Mosaic
        pipeliner: the step-k slice of a (K, ...) sequence."""
        return pl.BlockSpec((1,) + shape,
                            lambda k: (k,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def seq_spec(arr, shape):
        """Per-step sequence spec; a length-1 sequence (deterministic
        configs: the reset draws are key-independent, so every step's
        rows are identical) pins to block 0 — VMEM-resident, one HBM
        read total instead of one per step."""
        if arr.shape[0] == 1:
            return pl.BlockSpec((1,) + shape,
                                lambda k: (0,) * (len(shape) + 1),
                                memory_space=pltpu.VMEM)
        return stream(shape)

    in_specs, args = [], []
    if noise is not None and noise_rows_seq is None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.asarray(seeds, dtype=jnp.int32).reshape(K))
    state_shapes = [
        (pallas_race.S_CHANNELS, T, LANE),
        (R_CHANNELS, T, LANE),
        (3 * G, Tb, LANE),
        (2 * O, Tb, LANE),
        (Tb, LANE),
    ]
    for blk, shape in zip((S, R, GG, OO, EP), state_shapes):
        in_specs.append(const(shape))
        args.append(blk)
    if policy:
        in_specs += [const((C, T, LANE)), const(policy_pack.shape),
                     stream((4, T, LANE))]
        args += [obs_rows, policy_pack, actn_seq]
    else:
        in_specs.append(stream((4, T, LANE)))
        args.append(A_seq)
    in_specs += [seq_spec(RST_seq, (RST_CHANNELS, T, LANE)),
                 seq_spec(RSTG_seq, (3 * G, Tb, LANE)),
                 seq_spec(RSTO_seq, (2 * O, Tb, LANE))]
    args += [RST_seq, RSTG_seq, RSTO_seq]
    if noise is not None and noise_rows_seq is not None:
        in_specs.append(stream(noise_rows_seq.shape[1:]))
        args.append(noise_rows_seq)

    out_specs = [const(s) for s in state_shapes]
    out_shape = [jax.ShapeDtypeStruct(s, dtype) for s in state_shapes]
    out_specs += [stream((T, LANE)), stream((Tb, LANE))]
    out_shape += [jax.ShapeDtypeStruct((K, T, LANE), dtype),
                  jax.ShapeDtypeStruct((K, Tb, LANE), dtype)]
    if emit_obs:
        out_specs.append(stream((C, T, LANE)))
        out_shape.append(jax.ShapeDtypeStruct((K, C, T, LANE), dtype))
    if telemetry:
        out_specs.append(stream((5, T, LANE)))
        out_shape.append(jax.ShapeDtypeStruct((K, 5, T, LANE), dtype))
    scratch = []
    if policy:
        out_specs += [stream((4, T, LANE)), stream((T, LANE)),
                      stream((T, LANE))]
        out_shape += [jax.ShapeDtypeStruct((K, 4, T, LANE), dtype),
                      jax.ShapeDtypeStruct((K, T, LANE), dtype),
                      jax.ShapeDtypeStruct((K, T, LANE), dtype)]
        scratch.append(pltpu.VMEM((C, T, LANE), dtype))

    kwargs = {}
    if not interpret:
        # v5e has 128 MiB of physical VMEM; Mosaic's default 16 MiB
        # scoped limit rejects the larger block sets (2-drone COMPETE
        # with telemetry at 4096 envs needs ~20 MiB resident)
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    return pl.pallas_call(
        partial(_rollout_kernel, cfg=cfg, emit_obs=emit_obs),
        grid=(K,),
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(*args)


def race_step_fused(kf, km, arm, ground_z, S, A, R, GG, OO, EP, RST, RSTG,
                    RSTO, *, n_ticks, dt, spec_tail, interpret=False,
                    noise=None, seed=None, noise_rows=None, telemetry=False,
                    policy_pack=None, obs_rows=None, actn=None,
                    elim_penalty=1.0, policy_hidden=(64, 64)):
    """One fused race RL step over the packed state blocks.

    ``spec_tail`` is a tuple of the static tail parameters:
    (N, Tb, G, O, gates (G,7) np.f32, obstacles (O,6) np.f32,
     bounds_hi (3,), heights (G,), compete, per_drone_reward,
     end_after_gate, done_on_collision, done_on_completion,
     episode_len_sec, pyb_freq, drone_r, half_h).
    Returns (S', R', GG', OO', EP', OBS (C,T,128), REW (T,128),
    DONE (Tb,128)); with ``telemetry=True`` an extra
    INFO (5, T, 128) block of PRE-autoreset rows
    [current_gate, eliminated, finished, ep_steps, terminated] is appended.

    With ``policy_pack`` (a (PP_ROWS, 128) pack from
    envs/race_rl_rowfast.pack_policy_params), ``obs_rows`` (C, T, 128)
    (previous obs) and ``actn`` (4, T, 128) (standard-normal draws), the
    ActorCritic forward + Gaussian sampling runs in-kernel and ``A`` is
    ignored (pass None): the rollout's per-step policy stage fuses into
    the env launch. Three extra outputs are appended: the UNCLIPPED
    sampled ACTION (4, T, 128), LOGP (T, 128), VALUE (T, 128) — the
    PPO trajectory fields.
    """
    (N, Tb, G, O, gates, obstacles, bounds_hi, heights, compete,
     per_drone_reward, end_after_gate, done_on_collision,
     done_on_completion, episode_len_sec, pyb_freq, drone_r, half_h) = \
        spec_tail
    if noise is not None:
        noise = (
            float(noise[0]),
            tuple(float(v) for v in noise[1]),
            tuple(float(v) for v in noise[2]),
        )
    cfg = (
        n_ticks, float(dt), float(kf), float(km), float(arm),
        float(ground_z), N, Tb, G, O,
        np.asarray(gates, dtype=np.float32),
        np.asarray(obstacles, dtype=np.float32),
        tuple(float(v) for v in bounds_hi),
        tuple(float(v) for v in heights),
        bool(compete), bool(per_drone_reward), int(end_after_gate),
        bool(done_on_collision), bool(done_on_completion),
        float(episode_len_sec), float(pyb_freq),
        noise, noise_rows is not None, float(drone_r), float(half_h),
        not interpret, bool(telemetry), policy_pack is not None,
        float(elim_penalty), tuple(policy_hidden),
    )
    T = N * Tb
    C = 12 + 5 * G + 4 * O + 1 + (6 * (N - 1) if compete and N > 1 else 0)
    dtype = S.dtype
    out_shape = (
        jax.ShapeDtypeStruct((pallas_race.S_CHANNELS, T, LANE), dtype),
        jax.ShapeDtypeStruct((R_CHANNELS, T, LANE), dtype),
        jax.ShapeDtypeStruct((3 * G, Tb, LANE), dtype),
        jax.ShapeDtypeStruct((2 * O, Tb, LANE), dtype),
        jax.ShapeDtypeStruct((Tb, LANE), dtype),
        jax.ShapeDtypeStruct((C, T, LANE), dtype),
        jax.ShapeDtypeStruct((T, LANE), dtype),
        jax.ShapeDtypeStruct((Tb, LANE), dtype),
    )
    if telemetry:
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((5, T, LANE), dtype),
        )
    if policy_pack is not None:
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((4, T, LANE), dtype),   # unclipped action
            jax.ShapeDtypeStruct((T, LANE), dtype),      # logp
            jax.ShapeDtypeStruct((T, LANE), dtype),      # value
        )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    if policy_pack is not None:
        args = (S, obs_rows, policy_pack, actn, R, GG, OO, EP, RST,
                RSTG, RSTO)
    else:
        args = (S, A, R, GG, OO, EP, RST, RSTG, RSTO)
    in_specs = [vmem] * len(args)
    if noise is not None and noise_rows is not None:
        in_specs = in_specs + [vmem]
        args = args + (noise_rows,)
    elif noise is not None:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        args = (jnp.asarray(seed, dtype=jnp.int32).reshape(1),) + args
    kwargs = {}
    if not interpret:
        # see race_rollout: lift Mosaic's default 16 MiB scoped-vmem
        # limit toward the chip's 128 MiB (telemetry + COMPETE obs at
        # 4096 envs exceeds the default)
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    return pl.pallas_call(
        partial(_fused_kernel, cfg=cfg),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=tuple([vmem] * len(out_shape)),
        interpret=interpret,
        **kwargs,
    )(*args)
