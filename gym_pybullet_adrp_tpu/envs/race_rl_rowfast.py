"""Row-major race RL trainer path: packed state across steps.

The fused race window kernel runs at ~325M env-steps/s, but the general
pipeline (envs/race_fast.py) spends >99% of its time repacking the RaceState
pytree every control step and running the ctrl-rate tail as vmapped
per-env geometry. This module specializes the RL training configurations —
CF2X drones, FULLSTATE pose-relative actions, PYB physics, no stochastic
disturbances, no gate/inertia randomization (the twogates / getting_started
/ level0 training setups), COMPARE or COMPETE mode, any drone count — and
keeps EVERYTHING in channel-row form `(T, 128)` across steps:

* the policy action is the only thing transposed in, the obs block the
  only thing transposed out;
* FULLSTATE command processing degenerates to writing a handful of W rows
  (no commander state survives between steps under a FULLSTATE stream);
* gate progress / collisions / observation flags / RewardWrapper shaping /
  autoreset are expressed as row math over the static track geometry.

Multi-drone layout is **drone-major**: with B envs (multiple of 128) and N
drones, drone ``d`` of all envs occupies row block ``[d*Tb, (d+1)*Tb)``
where ``Tb = B/128``. COMPETE's opponent-pose observations and drone-drone
collision tests (reference MultiRaceAviary obs :654-659 / reset :151-159)
are then pure row slices — no lane shuffles.

Correctness is asserted against the general path in
tests/test_race_rowfast.py (interpret mode).
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from gym_pybullet_adrp_tpu.envs import race_fast
from gym_pybullet_adrp_tpu.envs.race import RaceSpec, RaceTrack
from gym_pybullet_adrp_tpu.ops import pallas_race
from gym_pybullet_adrp_tpu.utils.constants import (
    GATE_BEAM_HALF, GATE_EDGE_HALF_LEN, GATE_OPENING_HALF, GATE_RAY_HALF_LEN,
    GATE_SUPPORT_CENTER_DZ, GATE_SUPPORT_HALF_LEN, GATE_SUPPORT_RADIUS,
    GATE_Z_LOW, GATE_Z_TALL, OBSTACLE_HALF_LEN, OBSTACLE_RADIUS, RAD_TO_DEG,
    VISIBILITY_RANGE,
)
from gym_pybullet_adrp_tpu.utils.enums import RaceMode

LANE = pallas_race.LANE
S_CH = pallas_race.S_CHANNELS
W_CH = pallas_race.W_CHANNELS


class RowRaceState(NamedTuple):
    """All-rows training state.

    Per-agent leaves are drone-major ``(N*Tb, 128)``; per-env leaves
    (episode counter, drone-0 RewardWrapper memory) are ``(Tb, 128)``.
    """

    S: jnp.ndarray              # (58, N*Tb, 128) kernel state block
    current_gate: jnp.ndarray   # (N*Tb, 128)
    eliminated: jnp.ndarray     # (N*Tb, 128) 0/1
    finished: jnp.ndarray       # (N*Tb, 128) 0/1
    ep_steps: jnp.ndarray       # (Tb, 128) ctrl steps this episode
    # RewardWrapper shaping memory, per drone (reference wrapper.py:80-99;
    # the reference wrapper shapes drone 0 only — rows for every drone make
    # the same shaping available per agent for shared-policy self-play)
    shape_gate_id: jnp.ndarray  # (N*Tb, 128)
    target_xyz: jnp.ndarray     # (3, N*Tb, 128)
    prev_pos: jnp.ndarray       # (3, N*Tb, 128)


def supports(spec: RaceSpec) -> bool:
    return (
        race_fast.supports(spec)
        and not spec.random_gates_obstacles
        and not spec.random_drone_inertia
    )


def _track_consts(spec: RaceSpec, track: RaceTrack):
    """Static numpy geometry for the row tail."""
    gates = np.asarray(track.gates_nominal)          # (G, 7)
    obstacles = np.asarray(track.obstacles_nominal)  # (O, 6)
    bounds_hi = np.asarray(track.bounds)[1]
    heights = np.where(gates[:, 6] == 0, GATE_Z_TALL, GATE_Z_LOW)
    return gates, obstacles, bounds_hi, heights


def make_row_env(spec: RaceSpec, track: RaceTrack, n_envs: int,
                 end_after_gate: int = 0, interpret: bool = False,
                 per_drone_reward: bool = False):
    """Build ``(reset(key) -> state, step(state, action, key) ->
    (state, obs, reward, done(B,)))`` in row form.

    Single drone: ``action (B, 4)``, ``obs (B, 49)`` (the historical
    interface). Multi-drone: ``action (B, N, 4)``, ``obs (B, N, obs_size)``
    with COMPETE's ``6*(N-1)`` opponent-pose channels appended per drone.
    Done is env-level (all drones eliminated-or-finished, or truncation) —
    matching ``race_rl.batched_rl_race_step``.

    Reward: by default drone-0 shaped, reward ``(B,)`` — the reference
    RewardWrapper semantics (one trainable agent). With
    ``per_drone_reward=True`` every drone gets its own shaping (dense
    progress + gate pass, −1 on its own elimination, +10 on its own
    finish), reward ``(B, N)`` — the shared-policy self-play mode the
    reference's subprocess architecture could not express (its README
    states only one agent can be trained at a time).
    """
    assert supports(spec), "row-fast path: no randomized gates/inertia/dist"
    assert n_envs % LANE == 0, f"n_envs must be a multiple of {LANE}"
    N = spec.num_drones
    Tb = n_envs // LANE
    T = N * Tb
    G = spec.num_gates
    O = spec.num_obstacles
    compete = spec.racemode == RaceMode.COMPETE
    gates, obstacles, bounds_hi, heights = _track_consts(spec, track)
    kf, km, arm, ground_z = race_fast._model_scalars(spec)
    from gym_pybullet_adrp_tpu.models.drone import CF2X_LEGACY

    mass = CF2X_LEGACY["mass"]
    J = CF2X_LEGACY["J"]
    init_pos = np.asarray(track.init_pos)[:N]        # (N, 3)
    init_rpy = np.asarray(track.init_rpy)[:N]        # (N, 3)
    rs_pos = np.asarray(spec.rs_pos) if spec.random_drone_state else None
    rs_rot = np.asarray(spec.rs_rot) if spec.random_drone_state else None
    drone_r, half_h = 0.06, 0.0125

    def const_rows(per_drone_vals):
        """(N,) python/np values -> (N*Tb, 1) drone-major row constant."""
        return jnp.asarray(
            np.repeat(np.asarray(per_drone_vals, dtype=np.float32), Tb)
        )[:, None]

    init_px = const_rows(init_pos[:, 0])
    init_py = const_rows(init_pos[:, 1])
    init_pz = const_rows(init_pos[:, 2])
    init_roll = const_rows(init_rpy[:, 0])
    init_pitch = const_rows(init_rpy[:, 1])
    init_yaw = const_rows(init_rpy[:, 2])

    # constant observation blocks (no gate/obstacle randomization here)
    gate_pose_obs = gates[:, [0, 1, 2, 5]].reshape(-1)        # (4G,)
    obst_pose_obs = obstacles[:, :3].reshape(-1)              # (3O,)

    def _d(x, d):
        """Drone-d row block of an (N*Tb, 128) rowset."""
        return x[d * Tb:(d + 1) * Tb]

    def reset_rows(key):
        """Fresh per-agent S rows + reset pose rows (race_reset semantics:
        one independent state-randomization draw per drone)."""
        kp, kr = jax.random.split(key)
        if rs_pos is not None:
            lo_p, hi_p = rs_pos[:, 0], rs_pos[:, 1]
            lo_r, hi_r = rs_rot[:, 0], rs_rot[:, 1]
            dpos = (
                jax.random.uniform(kp, (3, T, LANE))
                * (hi_p - lo_p)[:, None, None] + lo_p[:, None, None]
            )
            drpy = (
                jax.random.uniform(kr, (3, T, LANE))
                * (hi_r - lo_r)[:, None, None] + lo_r[:, None, None]
            )
        else:
            dpos = jnp.zeros((3, T, LANE))
            drpy = jnp.zeros((3, T, LANE))
        px = init_px + dpos[0]
        py = init_py + dpos[1]
        pz = init_pz + dpos[2]
        roll = init_roll + drpy[0]
        pitch = init_pitch + drpy[1]
        yaw = init_yaw + drpy[2]
        cr, sr = jnp.cos(roll / 2), jnp.sin(roll / 2)
        cp, sp = jnp.cos(pitch / 2), jnp.sin(pitch / 2)
        cy, sy = jnp.cos(yaw / 2), jnp.sin(yaw / 2)
        qx = sr * cp * cy - cr * sp * sy
        qy = cr * sp * cy + sr * cp * sy
        qz = cr * cp * sy - sr * sp * cy
        qw = cr * cp * cy + sr * sp * sy
        z = jnp.zeros((T, LANE))
        S = jnp.stack(
            [px, py, pz, qx, qy, qz, qw] + [z] * 6      # vel, omega
            + [z] * 8                                    # rpms, prev_rpms
            + [roll, pitch, yaw]                         # prev_rpy = rpy
            + [z] * 3                                    # prev_vel
            + [z] * 12                                   # LPF states
            + [z] * 6 + [z] * 2 + [z] * 2 + [z] * 4     # integrals etc.
            + [z] * 5,                                   # tick..error
            axis=0,
        )
        # the row path is f32-native regardless of the ambient x64 flag
        f32 = jnp.float32
        return (S.astype(f32), px.astype(f32), py.astype(f32),
                pz.astype(f32), roll.astype(f32), pitch.astype(f32),
                yaw.astype(f32))

    def reset(key):
        S, px, py, pz, _, _, _ = reset_rows(key)
        f32 = jnp.float32
        zz_env = jnp.zeros((Tb, LANE), dtype=f32)
        zz = jnp.zeros((T, LANE), dtype=f32)
        tgt = jnp.stack(
            [jnp.full((T, LANE), gates[0, 0], dtype=f32),
             jnp.full((T, LANE), gates[0, 1], dtype=f32),
             jnp.full((T, LANE), gates[0, 2], dtype=f32)], axis=0,
        )
        return RowRaceState(
            S=S, current_gate=zz, eliminated=zz, finished=zz,
            ep_steps=zz_env, shape_gate_id=zz,
            target_xyz=tgt,
            prev_pos=jnp.stack([px, py, pz], axis=0),
        )

    def build_W(state: RowRaceState, action_rows):
        """FULLSTATE pose-relative setpoint rows (reference RLController
        transform; eliminated drones -> STOP)."""
        S = state.S
        elim = state.eliminated
        px, py, pz = S[0], S[1], S[2]
        yaw = S[23]  # prev_rpy yaw == current yaw
        sx = px + action_rows[0]
        sy = py + action_rows[1]
        sz = pz + action_rows[2]
        z = jnp.zeros_like(px)
        alive = 1.0 - elim
        rows = (
            [sx, sy, sz]              # sp_pos
            + [z, z, z]               # sp_vel
            + [z, z, z]               # sp_acc
            + [z, z, z]               # sp_att_rate
            + [yaw * RAD_TO_DEG]      # desired yaw (FULLSTATE quat chain)
            + [z]                     # thrust (STOP -> 0)
            + [alive]                 # pos_mode (STOP disables)
            + [elim]                  # z_mode_disable for eliminated
            + [z]                     # planner off
            + [z, z]                  # t_begin, duration
            + [elim]                  # eliminated mask for the kernel
            + [z] * 32                # coeffs unused
            + [jnp.full_like(px, mass), jnp.full_like(px, J[0]),
               jnp.full_like(px, J[1]), jnp.full_like(px, J[2])]
            + [z]                     # reserved
        )
        return jnp.stack(rows, axis=0)

    def row_tail(state: RowRaceState, S):
        """Gate progress, collisions, obs channels, per-agent — all rows."""
        px, py, pz = S[0], S[1], S[2]
        roll, pitch, yaw = S[21], S[22], S[23]
        vx, vy, vz = S[7], S[8], S[9]
        qx, qy, qz, qw = S[3], S[4], S[5], S[6]
        wx, wy, wz = S[10], S[11], S[12]
        # world angular velocity
        r00 = 1 - 2 * (qy * qy + qz * qz)
        r01 = 2 * (qx * qy - qz * qw)
        r02 = 2 * (qx * qz + qy * qw)
        r10 = 2 * (qx * qy + qz * qw)
        r11 = 1 - 2 * (qx * qx + qz * qz)
        r12 = 2 * (qy * qz - qx * qw)
        r20 = 2 * (qx * qz - qy * qw)
        r21 = 2 * (qy * qz + qx * qw)
        r22 = 1 - 2 * (qx * qx + qy * qy)
        ox = r00 * wx + r01 * wy + r02 * wz
        oy = r10 * wx + r11 * wy + r12 * wz
        oz = r20 * wx + r21 * wy + r22 * wz

        # ---- gate progress (ray-fan test for the tracked gate) ------------
        finished = jnp.maximum(
            state.finished, (state.current_gate >= G).astype(px.dtype)
        )
        passed_any = jnp.zeros_like(px)
        for g in range(G):
            gx, gy, gyaw = gates[g, 0], gates[g, 1], gates[g, 5]
            h = heights[g]
            c, s = np.cos(gyaw), np.sin(gyaw)
            relx, rely = px - gx, py - gy
            along = relx * c + rely * s
            perp = jnp.abs(-relx * s + rely * c)
            dz_lo = (h - GATE_RAY_HALF_LEN) - pz
            dz_hi = pz - (h + GATE_RAY_HALF_LEN)
            dz_out = jnp.maximum(jnp.maximum(dz_lo, dz_hi), 0.0)
            # distance to nearest of the 7 rays: lateral offsets i*0.05
            i_near = jnp.clip(jnp.round(along / 0.05), -3.0, 3.0)
            d_lat = jnp.abs(along - i_near * 0.05)
            dist2 = perp * perp + d_lat * d_lat + dz_out * dz_out
            hit = dist2 < drone_r * drone_r
            passed_any = passed_any + hit.astype(px.dtype) * (
                (state.current_gate == g).astype(px.dtype)
            )
        in_prog = (state.current_gate < G).astype(px.dtype)
        current_gate = state.current_gate + jnp.minimum(passed_any, 1.0) * in_prog

        # ---- collisions / elimination -------------------------------------
        crash = jnp.zeros_like(px, dtype=bool)
        for g in range(G):
            gx, gy, gz_, gyaw = gates[g, 0], gates[g, 1], gates[g, 2], gates[g, 5]
            c, s = np.cos(gyaw), np.sin(gyaw)
            relx, rely = px - gx, py - gy
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
            ox_, oy_, oz_ = obstacles[o, 0], obstacles[o, 1], obstacles[o, 2]
            dxy = jnp.sqrt((px - ox_) ** 2 + (py - oy_) ** 2)
            crash = crash | (
                (dxy < OBSTACLE_RADIUS + drone_r)
                & (pz - half_h < oz_ + OBSTACLE_HALF_LEN)
                & (pz + half_h > oz_ - OBSTACLE_HALF_LEN)
            )
        crash = crash | (pz <= ground_z + 1e-6)
        if compete and N > 1:
            # pairwise flat-cylinder overlap between same-env drones
            # (ops/collision.drone_drone_collision row form): drone-major
            # layout makes the opponent a row-block slice, no lane shuffles
            dd = []
            for d in range(N):
                hit_d = jnp.zeros((Tb, LANE), dtype=bool)
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
                dd.append(hit_d)
            crash = crash | jnp.concatenate(dd, axis=0)
        oob = (
            (jnp.abs(px) > bounds_hi[0]) | (jnp.abs(py) > bounds_hi[1])
            | (jnp.abs(pz) > bounds_hi[2])
        )
        unstable = (
            (jnp.abs(ox) > 20.0) | (jnp.abs(oy) > 20.0) | (jnp.abs(oz) > 20.0)
        )
        eliminated = jnp.maximum(
            state.eliminated,
            (crash | oob | unstable).astype(px.dtype),
        )

        # ---- visibility flags (exact min over the 5 frame capsules,
        #      matching ops/collision.drone_gate_distance) ------------------
        gate_range = []
        e = GATE_EDGE_HALF_LEN
        hb = GATE_BEAM_HALF
        for g in range(G):
            gx, gy, gz_, gyaw = gates[g, 0], gates[g, 1], gates[g, 2], gates[g, 5]
            c, s = np.cos(gyaw), np.sin(gyaw)
            relx, rely = px - gx, py - gy
            along = relx * c + rely * s
            perp = -relx * s + rely * c
            dzc = pz - gz_
            a_cl = jnp.clip(along, -e, e)
            # horizontal beams at z ± 0.225
            d_top = jnp.sqrt(
                (along - a_cl) ** 2 + perp ** 2 + (dzc - GATE_OPENING_HALF) ** 2
            ) - hb
            d_bot = jnp.sqrt(
                (along - a_cl) ** 2 + perp ** 2 + (dzc + GATE_OPENING_HALF) ** 2
            ) - hb
            # vertical beams at along ± 0.225
            z_cl = jnp.clip(dzc, -e, e)
            d_l = jnp.sqrt(
                (along + GATE_OPENING_HALF) ** 2 + perp ** 2 + (dzc - z_cl) ** 2
            ) - hb
            d_r = jnp.sqrt(
                (along - GATE_OPENING_HALF) ** 2 + perp ** 2 + (dzc - z_cl) ** 2
            ) - hb
            # support capsule below
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
            ox_, oy_, oz_ = obstacles[o, 0], obstacles[o, 1], obstacles[o, 2]
            dxy = jnp.sqrt((px - ox_) ** 2 + (py - oy_) ** 2)
            dz_out = jnp.maximum(
                jnp.maximum((oz_ - OBSTACLE_HALF_LEN) - pz,
                            pz - (oz_ + OBSTACLE_HALF_LEN)), 0.0)
            d = jnp.sqrt(dxy * dxy + dz_out * dz_out) - OBSTACLE_RADIUS
            obst_range.append((d < VISIBILITY_RANGE).astype(px.dtype))

        return (
            current_gate, eliminated, finished,
            (roll, pitch, yaw, vx, vy, vz, ox, oy, oz),
            gate_range, obst_range,
        )

    def step(state: RowRaceState, action, key):
        """action: (B, 4) when N == 1 else (B, N, 4), in [-1, 1].

        Returns (state, obs, reward (B,), done (B,)) with obs (B, 49) for a
        single drone, (B, N, obs_size) otherwise.
        """
        a = jnp.clip(action, -1.0, 1.0) * jnp.asarray([1.0, 1.0, 1.0, np.pi])
        if N == 1 and a.ndim == 2:
            action_rows = a.T.reshape(4, T, LANE)
        else:
            # (B, N, 4) -> drone-major rows (4, N*Tb, 128)
            action_rows = a.transpose(2, 1, 0).reshape(4, T, LANE)
        W = build_W(state, action_rows)
        S = pallas_race.race_window(
            kf, km, arm, ground_z, state.S, W,
            n_ticks=spec.steps_per_ctrl, dt=1.0 / spec.pyb_freq,
            interpret=interpret,
        )
        (current_gate, eliminated, finished, kin, gate_range, obst_range) = \
            row_tail(state, S)
        roll, pitch, yaw, vx, vy, vz, ox, oy, oz = kin
        px, py, pz = S[0], S[1], S[2]

        ep_steps = state.ep_steps + 1
        # env-level done: ALL drones eliminated-or-finished (reference
        # _computeTerminated:674-698 / finish_ctrl_step)
        done_mask = jnp.maximum(eliminated, finished)
        all_done = done_mask.reshape(N, Tb, LANE).min(axis=0)
        terminated = all_done > 0.5
        if end_after_gate:
            # drone-0 early cutoff (DroneObservationWrapper, wrapper.py:61-63)
            terminated = terminated | (_d(current_gate, 0) >= end_after_gate)
        truncated = ep_steps * spec.steps_per_ctrl / spec.pyb_freq > \
            spec.episode_len_sec
        # all drones finished (reference info["task_completed"] semantics)
        task_completed = finished.reshape(N, Tb, LANE).min(axis=0) > 0.5

        # ---- RewardWrapper shaping, per drone rows (reference wrapper.py) -
        passed = current_gate > jnp.mod(state.shape_gate_id, G)
        gid = jnp.clip(current_gate, 0, G - 1)
        tx = jnp.zeros_like(px)
        ty = jnp.zeros_like(px)
        tz = jnp.zeros_like(px)
        for g in range(G):
            m = (gid == g).astype(px.dtype)
            tx = tx + m * gates[g, 0]
            ty = ty + m * gates[g, 1]
            tz = tz + m * gates[g, 2]
        new_tx = jnp.where(passed, tx, state.target_xyz[0])
        new_ty = jnp.where(passed, ty, state.target_xyz[1])
        new_tz = jnp.where(passed, tz, state.target_xyz[2])
        new_gate_id = jnp.where(passed, current_gate, state.shape_gate_id)
        r_passed = jnp.where(passed, 5.0, 0.0)
        d_prev_xy = jnp.sqrt(
            (new_tx - state.prev_pos[0]) ** 2 + (new_ty - state.prev_pos[1]) ** 2
        )
        d_cur_xy = jnp.sqrt((new_tx - px) ** 2 + (new_ty - py) ** 2)
        d_prev_z = jnp.abs(new_tz - state.prev_pos[2])
        d_cur_z = jnp.abs(new_tz - pz)
        progress = (d_prev_xy - d_cur_xy) + (d_prev_z - d_cur_z) + r_passed

        if per_drone_reward:
            # own-event sparse terms: −1 the step a drone is eliminated,
            # +10 the step it finishes the lap
            elim_edge = eliminated - state.eliminated
            finish_edge = finished - state.finished
            reward = progress - elim_edge + 10.0 * finish_edge
        else:
            # reference semantics: drone-0 shaping, env-level sparse terms
            r_coll = jnp.where(terminated & ~task_completed, -1.0, 0.0)
            r_lap = jnp.where(terminated & task_completed, 10.0, 0.0)
            reward = _d(progress, 0) + r_coll + r_lap

        # ---- observation channels (per agent) ------------------------------
        const_rows_g = [jnp.full_like(px, v) for v in gate_pose_obs]
        obst_rows = [jnp.full_like(px, v) for v in obst_pose_obs]
        obs_list = (
            [px, py, pz, roll, pitch, yaw, vx, vy, vz, ox, oy, oz]
            + const_rows_g + gate_range + obst_rows + obst_range
            + [current_gate]
        )
        if compete and N > 1:
            # opponents' (pos, rpy), ascending drone index skipping self
            # (reference _computeObs:654-659); per-drone channels assembled
            # from the opponents' row blocks
            pose6 = (px, py, pz, roll, pitch, yaw)
            for j in range(N - 1):
                for ch in pose6:
                    blocks = []
                    for d in range(N):
                        e = [e_ for e_ in range(N) if e_ != d][j]
                        blocks.append(_d(ch, e))
                    obs_list.append(jnp.concatenate(blocks, axis=0))
        obs_rows = jnp.stack(obs_list, axis=0)  # (C, N*Tb, 128)
        C = obs_rows.shape[0]

        # ---- autoreset ----------------------------------------------------
        done = terminated | truncated            # (Tb, 128) env-level
        done_rows = jnp.tile(done, (N, 1))       # (N*Tb, 128)
        S_reset, rpx, rpy_, rpz, rroll, rpitch, ryaw = reset_rows(key)
        d_env = done.astype(px.dtype)
        d_rows = done_rows.astype(px.dtype)
        S = jnp.where(done_rows[None], S_reset, S)
        new_state = RowRaceState(
            S=S,
            current_gate=current_gate * (1 - d_rows),
            eliminated=eliminated * (1 - d_rows),
            finished=finished * (1 - d_rows),
            ep_steps=ep_steps * (1 - d_env).astype(ep_steps.dtype),
            shape_gate_id=new_gate_id * (1 - d_rows),
            target_xyz=jnp.where(
                done_rows[None],
                jnp.stack([
                    jnp.full_like(px, gates[0, 0]),
                    jnp.full_like(px, gates[0, 1]),
                    jnp.full_like(px, gates[0, 2]),
                ], axis=0),
                jnp.stack([new_tx, new_ty, new_tz], axis=0),
            ),
            prev_pos=jnp.where(
                done_rows[None],
                jnp.stack([rpx, rpy_, rpz], axis=0),
                jnp.stack([px, py, pz], axis=0),
            ),
        )
        # post-done obs = fresh episode's first obs (kin of reset pose)
        obs_rows = jnp.where(done_rows[None], 0.0, obs_rows)
        reset_kin = (rpx, rpy_, rpz, rroll, rpitch, ryaw)
        for i, v in enumerate(reset_kin):
            obs_rows = obs_rows.at[i].set(
                jnp.where(done_rows, v, obs_rows[i])
            )
        for i, v in enumerate(gate_pose_obs):
            obs_rows = obs_rows.at[12 + i].set(
                jnp.where(done_rows, v, obs_rows[12 + i])
            )
        for i, v in enumerate(obst_pose_obs):
            obs_rows = obs_rows.at[12 + 4 * G + G + i].set(
                jnp.where(done_rows, v, obs_rows[12 + 4 * G + G + i])
            )
        if compete and N > 1:
            # opponent channels after reset = opponents' reset poses
            base = 12 + 4 * G + G + 3 * O + O + 1
            ch_i = base
            for j in range(N - 1):
                for ch in reset_kin:
                    blocks = []
                    for d in range(N):
                        e = [e_ for e_ in range(N) if e_ != d][j]
                        blocks.append(_d(ch, e))
                    fresh = jnp.concatenate(blocks, axis=0)
                    obs_rows = obs_rows.at[ch_i].set(
                        jnp.where(done_rows, fresh, obs_rows[ch_i])
                    )
                    ch_i += 1

        if N == 1:
            obs = obs_rows.reshape(C, n_envs).T  # (B, 49)
        else:
            # (C, N, Tb, 128) -> (B, N, C)
            obs = obs_rows.reshape(C, N, n_envs).transpose(2, 1, 0)
        if per_drone_reward:
            reward_out = reward.reshape(N, n_envs).T  # (B, N)
        else:
            reward_out = reward.reshape(n_envs)
        return new_state, obs, reward_out, done.reshape(n_envs)

    return reset, step
