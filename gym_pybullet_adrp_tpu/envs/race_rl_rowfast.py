"""Row-major race RL trainer path: packed state across steps.

The fused race window kernel runs at ~325M env-steps/s, but the general
pipeline (envs/race_fast.py) spends >99% of its time repacking the RaceState
pytree every control step and running the ctrl-rate tail as vmapped
per-env geometry. This module specializes the RL training configurations —
CF2X drones, FULLSTATE pose-relative actions, PYB physics (the whole
getting_started / level0-3 / twogates ladder; level1-3's per-tick wind +
action-noise disturbances are sampled by the kernel's in-chip PRNG),
COMPARE or COMPETE mode, any drone count, with or without
gate/obstacle/inertia randomization — and keeps EVERYTHING in channel-row
form `(T, 128)` across steps:

* the policy action is the only thing transposed in, the obs block the
  only thing transposed out;
* FULLSTATE command processing degenerates to writing a handful of W rows
  (no commander state survives between steps under a FULLSTATE stream);
* gate progress / collisions / observation flags / RewardWrapper shaping /
  autoreset are expressed as row math over the track geometry — which is
  itself held as per-env rows, so level2-style per-episode gate/obstacle
  randomization (reference MultiRaceAviary._addObstacles:359-380) costs
  nothing extra: the geometry scalars just become (Tb, 128) tensors;
* per-drone mass/inertia randomization (reference _drone_init:407-432)
  rides the W rows the kernel already consumes.

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
from gym_pybullet_adrp_tpu.utils.enums import DroneModel, Physics, RaceMode

LANE = pallas_race.LANE
S_CH = pallas_race.S_CHANNELS
W_CH = pallas_race.W_CHANNELS


class RowRaceState(NamedTuple):
    """All-rows training state, held as the fused kernel's packed blocks.

    The pytree leaves are exactly the operand/result blocks of
    ``ops/pallas_race_step.race_step_fused`` so a training scan carries
    them launch-to-launch with ZERO repacking (the round-1 profile showed
    the per-step stack/unstack of named rows cost ~17% of the whole env
    step). Named views are exposed as properties; the row maps are
    documented in ops/pallas_race_step.py.
    """

    S: jnp.ndarray    # (58, N*Tb, 128) kernel state block
    R: jnp.ndarray    # (14, N*Tb, 128) race rows: gate/elim/finish/
    #                 # shaping-gate, target_xyz, prev_pos, mass, J diag
    GG: jnp.ndarray   # (3*G, Tb, 128) actual gate x, y, yaw rows
    OO: jnp.ndarray   # (2*O, Tb, 128) actual obstacle x, y rows
    EP: jnp.ndarray   # (Tb, 128) ctrl steps this episode

    @property
    def current_gate(self):
        return self.R[0]

    @property
    def eliminated(self):
        return self.R[1]

    @property
    def finished(self):
        return self.R[2]

    # RewardWrapper shaping memory, per drone (reference wrapper.py:80-99;
    # the reference wrapper shapes drone 0 only — rows for every drone make
    # the same shaping available per agent for shared-policy self-play)
    @property
    def shape_gate_id(self):
        return self.R[3]

    @property
    def target_xyz(self):
        return self.R[4:7]

    @property
    def prev_pos(self):
        return self.R[7:10]

    # per-drone randomized inertia (reference _drone_init)
    @property
    def mass(self):
        return self.R[10]

    @property
    def inertia(self):
        return self.R[11:14]

    @property
    def ep_steps(self):
        return self.EP

    # per-env actual track geometry (== nominal unless randomized)
    @property
    def gates_xyyaw(self):
        g3 = self.GG.shape[0]
        return self.GG.reshape(g3 // 3, 3, *self.GG.shape[1:])

    @property
    def obst_xy(self):
        o2 = self.OO.shape[0]
        return self.OO.reshape(o2 // 2, 2, *self.OO.shape[1:])


def pack_policy_params(params, dtype=jnp.float32):
    """Flax ActorCritic params -> the (rows, 128) kernel pack consumed by
    the in-kernel policy forward (ops/pallas_race_step._policy_forward;
    layout ``pp_layout`` — tower widths inferred from the param shapes,
    inner dims > 128 chunked into 128-column blocks). Pure jnp —
    traceable, rebuilt once per PPO iteration from the live params."""
    from gym_pybullet_adrp_tpu.ops import pallas_race_step as prs

    p = params["params"]
    C = p["Dense_0"]["kernel"].shape[0]
    hidden = (p["Dense_0"]["kernel"].shape[1],
              p["Dense_1"]["kernel"].shape[1])

    def wT(name):
        w = p[name]["kernel"].T.astype(dtype)          # (out, in)
        out, inn = w.shape
        chunks = []
        for j in range(0, inn, 128):
            blk = w[:, j:j + 128]
            chunks.append(
                jnp.pad(blk, ((0, 0), (0, 128 - blk.shape[1])))
            )
        return jnp.concatenate(chunks, axis=0)

    def brow(vec, rows):
        v = jnp.asarray(vec, dtype=dtype).reshape(rows, 1)
        return jnp.broadcast_to(v, (rows, 128))

    H1, H2 = hidden
    pack = jnp.concatenate(
        [
            wT("Dense_0"), wT("Dense_1"), wT("Dense_2"),
            wT("Dense_3"), wT("Dense_4"), wT("Dense_5"),
            brow(p["Dense_0"]["bias"], H1),
            brow(p["Dense_1"]["bias"], H2),
            brow(p["Dense_3"]["bias"], H1),
            brow(p["Dense_4"]["bias"], H2),
            brow(p["Dense_2"]["bias"], 4),
            brow(p["Dense_5"]["bias"], 1),
            brow(p["log_std"], 4),
        ],
        axis=0,
    )
    _, rows = prs.pp_layout(C, hidden)
    assert pack.shape == (rows, 128), (pack.shape, rows)
    return pack


def supports(spec: RaceSpec) -> bool:
    # unlike race_fast, disturbances are fine: the kernel samples them
    # with the in-chip PRNG (pallas_race.race_window noise=...)
    return (
        spec.physics == Physics.PYB
        and spec.drone_model == DroneModel.CF2X
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
                 per_drone_reward: bool = False, fused: bool = True,
                 telemetry: bool = False, elim_penalty: float = 1.0,
                 policy_hidden=(64, 64)):
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

    ``fused=True`` (default) runs window + ctrl-rate tail + autoreset as
    ONE Pallas launch (ops/pallas_race_step.py); ``fused=False`` keeps the
    window-kernel + XLA-row-tail twin, which
    tests/test_race_rowfast.py::test_fused_matches_unfused pins bitwise
    against the fused path (same jax.random reset draws by construction).

    ``elim_penalty`` scales the per-drone sparse penalty a drone receives
    the step it is eliminated (default 1.0 = the reference RewardWrapper's
    -1 collision term; training-time shaping knob — the level3-mastery
    artifact trains with a strong penalty so eliminations dominate the
    return signal).

    ``telemetry=True`` appends an ``info`` dict to the step return —
    PRE-autoreset rows ``current_gate`` / ``eliminated`` / ``finished``
    (each ``(B,)``, or ``(B, N)`` multi-drone) and the env-level episode
    step counter ``ep_steps`` ``(B,)`` — so evaluation reads gates passed,
    completion, and lap timing directly from race state instead of
    decoding reward edges (the packed state is already reset when ``step``
    returns; reference MultiRaceAviary surfaces the same values through
    its pre-reset ``info``/state).
    """
    assert supports(spec), "row-fast path: PYB physics, CF2X"
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

    mass0 = CF2X_LEGACY["mass"]
    J0 = np.asarray(CF2X_LEGACY["J"])
    init_pos = np.asarray(track.init_pos)[:N]        # (N, 3)
    init_rpy = np.asarray(track.init_rpy)[:N]        # (N, 3)
    rs_pos = np.asarray(spec.rs_pos) if spec.random_drone_state else None
    rs_rot = np.asarray(spec.rs_rot) if spec.random_drone_state else None
    rand_go = spec.random_gates_obstacles
    rand_in = spec.random_drone_inertia
    drone_r, half_h = 0.06, 0.0125
    f32 = jnp.float32

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

    def _d(x, d):
        """Drone-d row block of an (N*Tb, 128) rowset."""
        return x[d * Tb:(d + 1) * Tb]

    def _env_rows(x):
        """Per-env (Tb, 128) rows -> per-drone (N*Tb, 128) broadcast."""
        return jnp.tile(x, (N, 1))

    def reset_track_rows(key):
        """Actual gate/obstacle geometry + per-drone inertia (per-env rows;
        reference _addObstacles:359-380 x/y/yaw and x/y offsets,
        _drone_init:407-432 mass/J offsets from the legacy cf2x base)."""
        kg, ko, km_, ki = jax.random.split(key, 4)
        gate_nom = jnp.asarray(
            gates[:, [0, 1, 5]], dtype=f32
        )[:, :, None, None]                              # (G, 3, 1, 1)
        obst_nom = jnp.asarray(
            obstacles[:, :2], dtype=f32
        )[:, :, None, None]                              # (O, 2, 1, 1)
        if rand_go:
            lo, hi = spec.rg_gates
            g_off = jax.random.uniform(
                kg, (G, 3, Tb, LANE), minval=lo, maxval=hi, dtype=f32
            )
            lo_o, hi_o = spec.rg_obstacles
            o_off = jax.random.uniform(
                ko, (O, 2, Tb, LANE), minval=lo_o, maxval=hi_o, dtype=f32
            )
            gates_rows = gate_nom + g_off
            obst_rows = obst_nom + o_off
        else:
            gates_rows = jnp.broadcast_to(gate_nom, (G, 3, Tb, LANE))
            obst_rows = jnp.broadcast_to(obst_nom, (O, 2, Tb, LANE))
        if rand_in:
            m_off = jax.random.uniform(
                km_, (T, LANE), minval=spec.ri_mass[0],
                maxval=spec.ri_mass[1], dtype=f32,
            )
            lo_j = jnp.asarray(
                [spec.ri_ixx[0], spec.ri_iyy[0], spec.ri_izz[0]], dtype=f32
            )[:, None, None]
            hi_j = jnp.asarray(
                [spec.ri_ixx[1], spec.ri_iyy[1], spec.ri_izz[1]], dtype=f32
            )[:, None, None]
            j_off = (
                jax.random.uniform(ki, (3, T, LANE), dtype=f32)
                * (hi_j - lo_j) + lo_j
            )
            mass_rows = jnp.clip(mass0 + m_off, 0.0, 100.0)
            j_rows = jnp.clip(
                jnp.asarray(J0, dtype=f32)[:, None, None] + j_off, 0.0, 100.0
            )
        else:
            mass_rows = jnp.full((T, LANE), mass0, dtype=f32)
            j_rows = jnp.broadcast_to(
                jnp.asarray(J0, dtype=f32)[:, None, None], (3, T, LANE)
            )
        return gates_rows, obst_rows, mass_rows, j_rows

    def reset_pose_rows(key):
        """Reset pose draws (race_reset semantics: one independent
        state-randomization draw per drone). Returns f32 rows
        (px, py, pz, roll, pitch, yaw), each (T, 128)."""
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
        # the row path is f32-native regardless of the ambient x64 flag
        return (px.astype(f32), py.astype(f32), pz.astype(f32),
                roll.astype(f32), pitch.astype(f32), yaw.astype(f32))

    def reset_rows(key):
        """Fresh per-agent S rows + reset pose rows."""
        px, py, pz, roll, pitch, yaw = reset_pose_rows(key)
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
        return (S.astype(f32), px.astype(f32), py.astype(f32),
                pz.astype(f32), roll.astype(f32), pitch.astype(f32),
                yaw.astype(f32))

    def reset(key):
        k_state, k_track = jax.random.split(key)
        S, px, py, pz, _, _, _ = reset_rows(k_state)
        gates_rows, obst_rows, mass_rows, j_rows = reset_track_rows(k_track)
        zz_env = jnp.zeros((Tb, LANE), dtype=f32)
        zz = jnp.zeros((T, LANE), dtype=f32)
        # first shaping target: gate 0's actual pose (reference wrapper
        # initializes from the first obs, which resolves visibility; start
        # positions sit outside VISIBILITY_RANGE so nominal is what the
        # wrapper sees — but the progress deltas cancel the constant anyway)
        R = jnp.stack(
            [zz, zz, zz, zz,                      # gate/elim/finish/shape
             _env_rows(gates_rows[0, 0]),         # target_xyz
             _env_rows(gates_rows[0, 1]),
             jnp.full((T, LANE), gates[0, 2], dtype=f32),
             px, py, pz,                          # prev_pos
             mass_rows, j_rows[0], j_rows[1], j_rows[2]], axis=0,
        )
        return RowRaceState(
            S=S, R=R,
            GG=gates_rows.reshape(3 * G, Tb, LANE),
            OO=obst_rows.reshape(2 * O, Tb, LANE),
            EP=zz_env,
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
            + [state.mass, state.inertia[0], state.inertia[1],
               state.inertia[2]]
            + [z]                     # reserved
        )
        return jnp.stack(rows, axis=0)

    def row_tail(state: RowRaceState, S):
        """Gate progress, collisions, obs channels, per-agent — all rows.

        Gate/obstacle geometry comes from the state's per-env rows, so the
        same code serves nominal and randomized (level2) tracks.
        """
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

        # actual geometry rows broadcast per drone
        gx_a = [_env_rows(state.gates_xyyaw[g, 0]) for g in range(G)]
        gy_a = [_env_rows(state.gates_xyyaw[g, 1]) for g in range(G)]
        gyaw_a = [_env_rows(state.gates_xyyaw[g, 2]) for g in range(G)]
        gcos = [jnp.cos(v) for v in gyaw_a]
        gsin = [jnp.sin(v) for v in gyaw_a]
        ox_a = [_env_rows(state.obst_xy[o, 0]) for o in range(O)]
        oy_a = [_env_rows(state.obst_xy[o, 1]) for o in range(O)]

        # ---- gate progress (ray-fan test for the tracked gate) ------------
        finished = jnp.maximum(
            state.finished, (state.current_gate >= G).astype(px.dtype)
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
        if not spec.done_on_collision:
            # config flag: collisions don't eliminate (race.py wiring note)
            crash = jnp.zeros_like(crash)
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
            gz_ = gates[g, 2]
            c, s = gcos[g], gsin[g]
            relx, rely = px - gx_a[g], py - gy_a[g]
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
            oz_ = obstacles[o, 2]
            dxy = jnp.sqrt((px - ox_a[o]) ** 2 + (py - oy_a[o]) ** 2)
            dz_out = jnp.maximum(
                jnp.maximum((oz_ - OBSTACLE_HALF_LEN) - pz,
                            pz - (oz_ + OBSTACLE_HALF_LEN)), 0.0)
            d = jnp.sqrt(dxy * dxy + dz_out * dz_out) - OBSTACLE_RADIUS
            obst_range.append((d < VISIBILITY_RANGE).astype(px.dtype))

        # ---- visibility-resolved pose channels (reference compute_obs:
        #      actual pose when in range, nominal otherwise) ----------------
        gate_pose_rows = []   # per gate: [x, y, z, yaw] rows, per drone
        for g in range(G):
            in_r = gate_range[g] > 0.5
            gate_pose_rows.append([
                jnp.where(in_r, gx_a[g], gates[g, 0]),
                jnp.where(in_r, gy_a[g], gates[g, 1]),
                jnp.full_like(px, gates[g, 2]),
                jnp.where(in_r, gyaw_a[g], gates[g, 5]),
            ])
        obst_pose_rows = []   # per obstacle: [x, y, z] rows, per drone
        for o in range(O):
            in_r = obst_range[o] > 0.5
            obst_pose_rows.append([
                jnp.where(in_r, ox_a[o], obstacles[o, 0]),
                jnp.where(in_r, oy_a[o], obstacles[o, 1]),
                jnp.full_like(px, obstacles[o, 2]),
            ])

        return (
            current_gate, eliminated, finished,
            (roll, pitch, yaw, vx, vy, vz, ox, oy, oz),
            gate_range, obst_range, gate_pose_rows, obst_pose_rows,
        )

    def step(state: RowRaceState, action, key):
        """action: (B, 4) when N == 1 else (B, N, 4), in [-1, 1].

        Returns (state, obs, reward, done (B,)) with obs (B, 49) for a
        single drone, (B, N, obs_size) otherwise.
        """
        a = jnp.clip(action, -1.0, 1.0) * jnp.asarray([1.0, 1.0, 1.0, np.pi])
        if N == 1 and a.ndim == 2:
            action_rows = a.T.reshape(4, T, LANE)
        else:
            # (B, N, 4) -> drone-major rows (4, N*Tb, 128)
            action_rows = a.transpose(2, 1, 0).reshape(4, T, LANE)
        W = build_W(state, action_rows.astype(f32))
        if spec.disturbances:
            key, k_noise = jax.random.split(key)
            noise = (spec.action_noise_std, spec.dyn_dist_low,
                     spec.dyn_dist_high)
            seed, noise_rows = None, None
            if interpret:
                # interpret mode cannot lower the in-kernel PRNG: sample
                # the additive per-tick noise block outside the kernel
                kw_, ka_ = jax.random.split(k_noise)
                lo = jnp.asarray(spec.dyn_dist_low, dtype=f32)
                hi = jnp.asarray(spec.dyn_dist_high, dtype=f32)
                nt = spec.steps_per_ctrl
                wind = lo[:, None, None] + jax.random.uniform(
                    kw_, (nt, 3, T, LANE), dtype=f32
                ) * (hi - lo)[:, None, None]
                act_n = jax.random.normal(
                    ka_, (nt, 4, T, LANE), dtype=f32
                ) * spec.action_noise_std
                noise_rows = jnp.concatenate([wind, act_n], axis=1)
            else:
                seed = jax.random.randint(
                    k_noise, (1,), 0, jnp.iinfo(jnp.int32).max,
                    dtype=jnp.int32,
                )
        else:
            noise, seed, noise_rows = None, None, None
        S = pallas_race.race_window(
            kf, km, arm, ground_z, state.S, W,
            n_ticks=spec.steps_per_ctrl, dt=1.0 / spec.pyb_freq,
            interpret=interpret, noise=noise, seed=seed,
            noise_rows=noise_rows,
        )
        (current_gate, eliminated, finished, kin, gate_range, obst_range,
         gate_pose_rows, obst_pose_rows) = row_tail(state, S)
        roll, pitch, yaw, vx, vy, vz, ox, oy, oz = kin
        px, py, pz = S[0], S[1], S[2]

        ep_steps = state.ep_steps + 1
        # env-level done: ALL drones eliminated-or-finished (reference
        # _computeTerminated:674-698 / finish_ctrl_step); with
        # done_on_completion=False finished drones don't count toward it
        done_mask = (
            jnp.maximum(eliminated, finished)
            if spec.done_on_completion else eliminated
        )
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
        # target gate pose resolves visibility exactly like the obs the
        # reference wrapper reads (wrapper.py:91-99 reads obs[12:...])
        passed = current_gate > jnp.mod(state.shape_gate_id, G)
        gid = jnp.clip(current_gate, 0, G - 1)
        tx = jnp.zeros_like(px)
        ty = jnp.zeros_like(px)
        tz = jnp.zeros_like(px)
        for g in range(G):
            m = (gid == g).astype(px.dtype)
            tx = tx + m * gate_pose_rows[g][0]
            ty = ty + m * gate_pose_rows[g][1]
            tz = tz + m * gate_pose_rows[g][2]
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
            reward = progress - elim_penalty * elim_edge + 10.0 * finish_edge
        else:
            # reference semantics: drone-0 shaping, env-level sparse terms
            r_coll = jnp.where(terminated & ~task_completed, -1.0, 0.0)
            r_lap = jnp.where(terminated & task_completed, 10.0, 0.0)
            reward = _d(progress, 0) + r_coll + r_lap

        # ---- observation channels (per agent) ------------------------------
        obs_list = (
            [px, py, pz, roll, pitch, yaw, vx, vy, vz, ox, oy, oz]
            + [ch for g in range(G) for ch in gate_pose_rows[g]]
            + gate_range
            + [ch for o in range(O) for ch in obst_pose_rows[o]]
            + obst_range
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
        k_state, k_track = jax.random.split(key)
        S_reset, rpx, rpy_, rpz, rroll, rpitch, ryaw = reset_rows(k_state)
        gates_rows, obst_rows, mass_rows, j_rows = reset_track_rows(k_track)
        d_env = done.astype(px.dtype)
        d_rows = done_rows.astype(px.dtype)
        S = jnp.where(done_rows[None], S_reset, S)
        R_new = jnp.stack(
            [
                current_gate * (1 - d_rows),
                eliminated * (1 - d_rows),
                finished * (1 - d_rows),
                new_gate_id * (1 - d_rows),
                jnp.where(done_rows, _env_rows(gates_rows[0, 0]), new_tx),
                jnp.where(done_rows, _env_rows(gates_rows[0, 1]), new_ty),
                jnp.where(done_rows, jnp.full_like(px, gates[0, 2]), new_tz),
                jnp.where(done_rows, rpx, px),
                jnp.where(done_rows, rpy_, py),
                jnp.where(done_rows, rpz, pz),
                jnp.where(done_rows, mass_rows, state.mass),
                jnp.where(done_rows, j_rows[0], state.inertia[0]),
                jnp.where(done_rows, j_rows[1], state.inertia[1]),
                jnp.where(done_rows, j_rows[2], state.inertia[2]),
            ],
            axis=0,
        )
        new_state = RowRaceState(
            S=S, R=R_new,
            GG=jnp.where(
                done[None], gates_rows.reshape(3 * G, Tb, LANE), state.GG
            ),
            OO=jnp.where(
                done[None], obst_rows.reshape(2 * O, Tb, LANE), state.OO
            ),
            EP=ep_steps * (1 - d_env).astype(ep_steps.dtype),
        )
        # post-done obs = fresh episode's first obs: kinematics of the reset
        # pose + nominal gate/obstacle poses (start positions sit outside
        # VISIBILITY_RANGE of every gate on the shipped tracks)
        obs_rows = jnp.where(done_rows[None], 0.0, obs_rows)
        reset_kin = (rpx, rpy_, rpz, rroll, rpitch, ryaw)
        for i, v in enumerate(reset_kin):
            obs_rows = obs_rows.at[i].set(
                jnp.where(done_rows, v, obs_rows[i])
            )
        gate_pose_nom = gates[:, [0, 1, 2, 5]].reshape(-1)
        for i, v in enumerate(gate_pose_nom):
            obs_rows = obs_rows.at[12 + i].set(
                jnp.where(done_rows, v, obs_rows[12 + i])
            )
        obst_pose_nom = obstacles[:, :3].reshape(-1)
        for i, v in enumerate(obst_pose_nom):
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
        if telemetry:
            info = {
                "current_gate": _per_drone_out(current_gate),
                "eliminated": _per_drone_out(eliminated),
                "finished": _per_drone_out(finished),
                "ep_steps": ep_steps.reshape(n_envs),
                "terminated": terminated.reshape(n_envs),
            }
            return new_state, obs, reward_out, done.reshape(n_envs), info
        return new_state, obs, reward_out, done.reshape(n_envs)

    def _per_drone_out(rows):
        """(N*Tb, 128) drone-major rows -> (B,) or (B, N) host layout."""
        if N == 1:
            return rows.reshape(n_envs)
        return rows.reshape(N, n_envs).T

    def initial_obs(state: RowRaceState):
        """First-episode observation, exactly as the kernel's autoreset
        builds post-done obs: kinematics of the reset pose + NOMINAL
        gate/obstacle channels (start poses sit outside VISIBILITY_RANGE
        on the shipped tracks). Same (B, obs) / (B, N, obs) layout as
        ``step``'s obs output — hand-building zeros instead (as the round-1
        trainer did) puts the policy's very first action out of
        distribution."""
        px, py, pz = state.prev_pos  # == the reset pose positions
        roll, pitch, yaw = state.S[21], state.S[22], state.S[23]
        z = jnp.zeros_like(px)
        obs_list = [px, py, pz, roll, pitch, yaw] + [z] * 6
        for g in range(G):
            for v in (gates[g, 0], gates[g, 1], gates[g, 2], gates[g, 5]):
                obs_list.append(jnp.full_like(px, v))
        obs_list += [z] * G
        for o in range(O):
            for v in obstacles[o, :3]:
                obs_list.append(jnp.full_like(px, v))
        obs_list += [z] * O
        obs_list += [z]  # current_gate
        if compete and N > 1:
            pose6 = (px, py, pz, roll, pitch, yaw)
            for j in range(N - 1):
                for ch in pose6:
                    blocks = []
                    for d in range(N):
                        e_ = [x for x in range(N) if x != d][j]
                        blocks.append(_d(ch, e_))
                    obs_list.append(jnp.concatenate(blocks, axis=0))
        obs_rows = jnp.stack(obs_list, axis=0)
        C = obs_rows.shape[0]
        if N == 1:
            return obs_rows.reshape(C, n_envs).T
        return obs_rows.reshape(C, N, n_envs).transpose(2, 1, 0)

    # ---- fused single-launch step (ops/pallas_race_step.py) ----------------
    from gym_pybullet_adrp_tpu.ops import pallas_race_step

    spec_tail = (
        N, Tb, G, O,
        np.asarray(gates, dtype=np.float32),
        np.asarray(obstacles, dtype=np.float32),
        tuple(float(v) for v in bounds_hi),
        tuple(float(h) for h in heights),
        compete, per_drone_reward, int(end_after_gate),
        spec.done_on_collision, spec.done_on_completion,
        float(spec.episode_len_sec), float(spec.pyb_freq),
        drone_r, half_h,
    )

    def step_fused(state: RowRaceState, action, key):
        """Same contract as ``step``, one Pallas launch for window + tail +
        autoreset. Reset draws are sampled here with the same key splits as
        the unfused path, so both paths are bitwise-identical."""
        a = jnp.clip(action, -1.0, 1.0) * jnp.asarray([1.0, 1.0, 1.0, np.pi])
        if N == 1 and a.ndim == 2:
            action_rows = a.T.reshape(4, T, LANE)
        else:
            action_rows = a.transpose(2, 1, 0).reshape(4, T, LANE)
        if spec.disturbances:
            key, k_noise = jax.random.split(key)
            noise = (spec.action_noise_std, spec.dyn_dist_low,
                     spec.dyn_dist_high)
            seed, noise_rows = None, None
            if interpret:
                kw_, ka_ = jax.random.split(k_noise)
                lo = jnp.asarray(spec.dyn_dist_low, dtype=f32)
                hi = jnp.asarray(spec.dyn_dist_high, dtype=f32)
                nt = spec.steps_per_ctrl
                wind = lo[:, None, None] + jax.random.uniform(
                    kw_, (nt, 3, T, LANE), dtype=f32
                ) * (hi - lo)[:, None, None]
                act_n = jax.random.normal(
                    ka_, (nt, 4, T, LANE), dtype=f32
                ) * spec.action_noise_std
                noise_rows = jnp.concatenate([wind, act_n], axis=1)
            else:
                seed = jax.random.randint(
                    k_noise, (1,), 0, jnp.iinfo(jnp.int32).max,
                    dtype=jnp.int32,
                )
        else:
            noise, seed, noise_rows = None, None, None
        k_state, k_track = jax.random.split(key)
        pose = reset_pose_rows(k_state)
        gates_rows, obst_rows, mass_rows, j_rows = reset_track_rows(k_track)
        RST = jnp.stack(
            list(pose) + [mass_rows, j_rows[0], j_rows[1], j_rows[2]], axis=0
        )
        out = pallas_race_step.race_step_fused(
            kf, km, arm, ground_z,
            state.S, action_rows.astype(f32), state.R, state.GG,
            state.OO, state.EP, RST.astype(f32),
            gates_rows.reshape(3 * G, Tb, LANE),
            obst_rows.reshape(2 * O, Tb, LANE),
            n_ticks=spec.steps_per_ctrl, dt=1.0 / spec.pyb_freq,
            spec_tail=spec_tail, interpret=interpret, noise=noise,
            seed=seed, noise_rows=noise_rows, telemetry=telemetry,
            elim_penalty=elim_penalty,
        )
        S2, R2, GG2, OO2, EP2, OBS, REW, DONE = out[:8]
        new_state = RowRaceState(S=S2, R=R2, GG=GG2, OO=OO2, EP=EP2)
        C = OBS.shape[0]
        if N == 1:
            obs = OBS.reshape(C, n_envs).T
        else:
            obs = OBS.reshape(C, N, n_envs).transpose(2, 1, 0)
        if per_drone_reward:
            reward_out = REW.reshape(N, n_envs).T
        else:
            reward_out = REW[:Tb].reshape(n_envs)
        done = DONE.reshape(n_envs) > 0.5
        if telemetry:
            INFO = out[8]
            info = {
                "current_gate": _per_drone_out(INFO[0]),
                "eliminated": _per_drone_out(INFO[1]),
                "finished": _per_drone_out(INFO[2]),
                "ep_steps": INFO[3][:Tb].reshape(n_envs),
                "terminated": INFO[4][:Tb].reshape(n_envs) > 0.5,
            }
            return new_state, obs, reward_out, done, info
        return new_state, obs, reward_out, done

    def _step_draws(key):
        """Shared per-step stochastic inputs (disturbance noise + reset
        draws), with the same key splits as step/step_fused."""
        if spec.disturbances:
            key, k_noise = jax.random.split(key)
            noise = (spec.action_noise_std, spec.dyn_dist_low,
                     spec.dyn_dist_high)
            seed, noise_rows = None, None
            if interpret:
                kw_, ka_ = jax.random.split(k_noise)
                lo = jnp.asarray(spec.dyn_dist_low, dtype=f32)
                hi = jnp.asarray(spec.dyn_dist_high, dtype=f32)
                nt = spec.steps_per_ctrl
                wind = lo[:, None, None] + jax.random.uniform(
                    kw_, (nt, 3, T, LANE), dtype=f32
                ) * (hi - lo)[:, None, None]
                act_n = jax.random.normal(
                    ka_, (nt, 4, T, LANE), dtype=f32
                ) * spec.action_noise_std
                noise_rows = jnp.concatenate([wind, act_n], axis=1)
            else:
                seed = jax.random.randint(
                    k_noise, (1,), 0, jnp.iinfo(jnp.int32).max,
                    dtype=jnp.int32,
                )
        else:
            noise, seed, noise_rows = None, None, None
        k_state, k_track = jax.random.split(key)
        pose = reset_pose_rows(k_state)
        gates_rows, obst_rows, mass_rows, j_rows = reset_track_rows(k_track)
        RST = jnp.stack(
            list(pose) + [mass_rows, j_rows[0], j_rows[1], j_rows[2]],
            axis=0,
        )
        return noise, seed, noise_rows, RST, gates_rows, obst_rows

    def step_policy(state: RowRaceState, obs_rows, pp, actn, key):
        """Policy-in-kernel rollout step (VERDICT r2 item 3): the
        ActorCritic forward + Gaussian sample + env step + autoreset run
        as ONE launch. ``obs_rows`` (C, T, 128) is the previous obs in
        row form (``reset.initial_obs_rows`` for step 0), ``pp`` the
        ``pack_policy_params`` pack, ``actn`` (4, T, 128) standard-normal
        draws. Returns ``(state, obs_rows', tr)`` with ``tr`` holding the
        PPO trajectory rows: unclipped ``action`` (4, T, 128), ``logp`` /
        ``value`` / ``reward`` (T, 128), ``done`` (Tb, 128)."""
        noise, seed, noise_rows, RST, gates_rows, obst_rows = \
            _step_draws(key)
        out = pallas_race_step.race_step_fused(
            kf, km, arm, ground_z,
            state.S, None, state.R, state.GG, state.OO, state.EP,
            RST.astype(f32),
            gates_rows.reshape(3 * G, Tb, LANE),
            obst_rows.reshape(2 * O, Tb, LANE),
            n_ticks=spec.steps_per_ctrl, dt=1.0 / spec.pyb_freq,
            spec_tail=spec_tail, interpret=interpret, noise=noise,
            seed=seed, noise_rows=noise_rows, telemetry=telemetry,
            policy_pack=pp, obs_rows=obs_rows, actn=actn,
            elim_penalty=elim_penalty, policy_hidden=policy_hidden,
        )
        S2, R2, GG2, OO2, EP2, OBS, REW, DONE = out[:8]
        # output offsets follow the telemetry flag: with telemetry the
        # kernel appends an INFO block before the policy outputs
        base = 9 if telemetry else 8
        ACT, LOGP, VAL = out[base:base + 3]
        new_state = RowRaceState(S=S2, R=R2, GG=GG2, OO=OO2, EP=EP2)
        tr = {
            "action": ACT, "logp": LOGP, "value": VAL, "reward": REW,
            "done": DONE,
        }
        if telemetry:
            tr["info"] = out[8]
        return new_state, OBS, tr

    # fully-deterministic configs draw identical reset rows every step
    # (key-independent): collapse the rollout kernel's per-step reset
    # sequences to ONE resident block instead of K streamed ones
    _static_draws = not (
        spec.random_drone_state or spec.random_gates_obstacles
        or spec.random_drone_inertia or spec.disturbances
    )

    def _stacked_draws(keys):
        """Per-step stochastic inputs for K steps, stacked along a leading
        K axis — jax.vmap of ``_step_draws`` over the per-step keys, so
        every draw is bitwise-identical to K sequential step calls. For
        deterministic configs the draws are key-independent, so a single
        leading-1 block is returned (the kernel pins it VMEM-resident)."""
        if _static_draws:
            keys = keys[:1]
        if spec.disturbances:
            noise_t = (spec.action_noise_std, spec.dyn_dist_low,
                       spec.dyn_dist_high)
        else:
            noise_t = None

        def one(key):
            _, seed, noise_rows, RST, gates_rows, obst_rows = \
                _step_draws(key)
            res = [RST.astype(f32),
                   gates_rows.reshape(3 * G, Tb, LANE).astype(f32),
                   obst_rows.reshape(2 * O, Tb, LANE).astype(f32)]
            if seed is not None:
                res.append(seed[0])
            if noise_rows is not None:
                res.append(noise_rows)
            return tuple(res)

        outs = jax.vmap(one)(keys)
        RSTs, GRs, ORs = outs[0], outs[1], outs[2]
        seeds = nrs = None
        if spec.disturbances:
            if interpret:
                nrs = outs[3]
            else:
                seeds = outs[3]
        return noise_t, seeds, nrs, RSTs, GRs, ORs

    def rollout_steps(state: RowRaceState, action, keys):
        """K fused env steps in ONE kernel launch (grid over steps; the
        state blocks stay VMEM-resident between steps —
        ops/pallas_race_step.race_rollout). Bitwise-identical to K
        sequential ``step_fused(state, action[i], keys[i])`` calls.
        ``action``: (K, n_envs, 4) or (K, n_envs, N, 4) in [-1, 1];
        ``keys``: (K,) PRNG keys. Returns
        (state', REW (K, T, 128), DONE (K, Tb, 128))."""
        K = keys.shape[0]
        a = jnp.clip(action, -1.0, 1.0) * jnp.asarray(
            [1.0, 1.0, 1.0, np.pi]
        )
        if N == 1 and a.ndim == 3:
            rows = a.transpose(0, 2, 1).reshape(K, 4, T, LANE)
        else:
            rows = a.transpose(0, 3, 2, 1).reshape(K, 4, T, LANE)
        noise_t, seeds, nrs, RSTs, GRs, ORs = _stacked_draws(keys)
        out = pallas_race_step.race_rollout(
            kf, km, arm, ground_z, state.S, rows.astype(f32), state.R,
            state.GG, state.OO, state.EP, RSTs, GRs, ORs,
            n_ticks=spec.steps_per_ctrl, dt=1.0 / spec.pyb_freq,
            spec_tail=spec_tail, interpret=interpret, noise=noise_t,
            seeds=seeds, noise_rows_seq=nrs, telemetry=False,
            emit_obs=False, elim_penalty=elim_penalty,
        )
        S2, R2, GG2, OO2, EP2, REW, DONE = out[:7]
        new_state = RowRaceState(S=S2, R=R2, GG=GG2, OO=OO2, EP=EP2)
        return new_state, REW, DONE

    def rollout_policy(state: RowRaceState, obs_rows, pp, actn_seq, keys):
        """K policy-in-kernel steps in ONE launch: the ActorCritic forward
        + Gaussian sample + env step + autoreset for each of K steps, with
        the policy pack and state VMEM-resident throughout. Matches K
        sequential ``step_policy`` calls. Returns ``(state', obs_rows',
        tr)`` with tr rows stacked (K, ...): the POST-step obs sequence
        plus action/logp/value/reward/done."""
        noise_t, seeds, nrs, RSTs, GRs, ORs = _stacked_draws(keys)
        out = pallas_race_step.race_rollout(
            kf, km, arm, ground_z, state.S, None, state.R,
            state.GG, state.OO, state.EP, RSTs, GRs, ORs,
            n_ticks=spec.steps_per_ctrl, dt=1.0 / spec.pyb_freq,
            spec_tail=spec_tail, interpret=interpret, noise=noise_t,
            seeds=seeds, noise_rows_seq=nrs, telemetry=False,
            emit_obs=True, policy_pack=pp, obs_rows=obs_rows,
            actn_seq=actn_seq, elim_penalty=elim_penalty,
            policy_hidden=policy_hidden,
        )
        S2, R2, GG2, OO2, EP2, REW, DONE, OBS, ACT, LOGP, VAL = out[:11]
        new_state = RowRaceState(S=S2, R=R2, GG=GG2, OO=OO2, EP=EP2)
        tr = {
            "obs": OBS, "action": ACT, "logp": LOGP, "value": VAL,
            "reward": REW, "done": DONE,
        }
        return new_state, OBS[-1], tr

    def initial_obs_rows(state: RowRaceState):
        """Row-form (C, T, 128) first-episode obs (initial_obs without
        the host-layout transpose) — the step_policy carry format."""
        px, py, pz = state.prev_pos
        roll, pitch, yaw = state.S[21], state.S[22], state.S[23]
        z = jnp.zeros_like(px)
        obs_list = [px, py, pz, roll, pitch, yaw] + [z] * 6
        for g in range(G):
            for v in (gates[g, 0], gates[g, 1], gates[g, 2], gates[g, 5]):
                obs_list.append(jnp.full_like(px, v))
        obs_list += [z] * G
        for o in range(O):
            for v in obstacles[o, :3]:
                obs_list.append(jnp.full_like(px, v))
        obs_list += [z] * O
        obs_list += [z]
        if compete and N > 1:
            pose6 = (px, py, pz, roll, pitch, yaw)
            for j in range(N - 1):
                for ch in pose6:
                    blocks = []
                    for d in range(N):
                        e_ = [x for x in range(N) if x != d][j]
                        blocks.append(_d(ch, e_))
                    obs_list.append(jnp.concatenate(blocks, axis=0))
        return jnp.stack(obs_list, axis=0).astype(f32)

    reset.initial_obs = initial_obs
    reset.initial_obs_rows = initial_obs_rows
    step_out = step_fused if fused else step
    step_out.policy_step = step_policy if fused else None
    step_out.rollout_steps = rollout_steps if fused else None
    step_out.rollout_policy = rollout_policy if fused else None
    return reset, step_out


def make_policy_rollout(spec: RaceSpec, reset, step, n_envs: int,
                        n_steps: int, kernel_chunk: int = 16):
    """Build the policy-in-kernel PPO rollout pieces for a
    ``make_row_env(fused=True)`` pair (VERDICT r2 item 3).

    ``kernel_chunk`` > 0 runs the rollout through the K-step rollout
    kernel (``step.rollout_policy``: K policy+env steps per launch, state
    and policy pack VMEM-resident) whenever it divides ``n_steps``;
    0 keeps one launch per step.

    Returns ``(batched_reset, rollout_override, adapter_step)``:
    ``batched_reset(key) -> ((row_state, obs_rows), flat_obs)`` (the env
    state carries the row-form obs), ``rollout_override(ts)`` for
    ``rl.ppo.make_ppo_core`` (scans ``step.policy_step`` — ActorCritic
    forward + sampling inside the env kernel launch, trajectories kept in
    row form and transposed once per iteration), and an
    ``EnvAdapter.step``-compatible wrapper for the tuple state.
    """
    import jax as _jax
    import jax.numpy as _jnp

    from gym_pybullet_adrp_tpu.rl.ppo import Transition

    B = n_envs
    N = spec.num_drones
    Tb = B // LANE
    T = N * Tb
    C = spec.obs_size
    policy_step = step.policy_step
    assert policy_step is not None, "needs make_row_env(fused=True)"

    def rows_to_flat(x):
        # (k, T, 128) drone-major rows -> (k, B*N) env-major
        k = x.shape[0]
        if N == 1:
            return x.reshape(k, B)
        return x.reshape(k, N, B).transpose(0, 2, 1).reshape(k, B * N)

    def chrows_to_flat(x, ch):
        # (k, ch, T, 128) -> (k, B*N, ch)
        k = x.shape[0]
        if N == 1:
            return x.reshape(k, ch, B).transpose(0, 2, 1)
        return x.reshape(k, ch, N, B).transpose(0, 3, 2, 1).reshape(
            k, B * N, ch
        )

    def flat_to_rows(x):
        # (B*N,) env-major -> (T, 128) drone-major rows
        if N == 1:
            return x.reshape(Tb, LANE)
        return x.reshape(B, N).T.reshape(T, LANE)

    def batched_reset(key):
        st = reset(key)
        obs_rows = reset.initial_obs_rows(st)
        return (st, obs_rows), chrows_to_flat(obs_rows[None], C)[0]

    use_chunks = (
        kernel_chunk and step.rollout_policy is not None
        and n_steps % kernel_chunk == 0
    )

    def _ep_account(carry, x):
        """Episode-return/length bookkeeping for one step's (rew, done)
        rows — shared by the per-step and per-chunk paths."""
        ep_ret, ep_len = carry
        rew, done = x
        done_rows = _jnp.tile(done, (N, 1)) > 0.5
        ep_ret2 = ep_ret + rew
        ep_len2 = ep_len + 1.0
        fin_ret = _jnp.where(done_rows, ep_ret2, _jnp.nan)
        fin_len = _jnp.where(done_rows, ep_len2, -1.0)
        return (
            _jnp.where(done_rows, 0.0, ep_ret2),
            _jnp.where(done_rows, 0.0, ep_len2),
        ), (fin_ret, fin_len)

    def rollout_override(ts):
        rng, k_act, k_env = _jax.random.split(ts.rng, 3)
        actn = _jax.random.normal(
            k_act, (n_steps, 4, T, LANE), dtype=_jnp.float32
        )
        env_keys = _jax.random.split(k_env, n_steps)
        pp = pack_policy_params(ts.params)
        st, obs_rows = ts.env_state
        ep_ret = flat_to_rows(ts.ep_return)
        ep_len = flat_to_rows(ts.ep_len.astype(_jnp.float32))

        if use_chunks:
            K = kernel_chunk
            n_chunks = n_steps // K
            actn_c = actn.reshape((n_chunks, K) + actn.shape[1:])
            keys_c = env_keys.reshape(
                (n_chunks, K) + env_keys.shape[1:]
            )

            def body(carry, xs):
                st, obs_rows, ep_ret, ep_len = carry
                a_n, ks = xs
                st2, obs_last, tr = step.rollout_policy(
                    st, obs_rows, pp, a_n, ks
                )
                # Transition.obs is the PRE-step obs each action saw:
                # shift the kernel's post-step sequence by the carry
                obs_seq = _jnp.concatenate(
                    [obs_rows[None], tr["obs"][:-1]], axis=0
                )
                (ep_ret, ep_len), (fin_ret, fin_len) = _jax.lax.scan(
                    _ep_account, (ep_ret, ep_len),
                    (tr["reward"], tr["done"]),
                )
                ys = (obs_seq, tr["action"], tr["logp"], tr["value"],
                      tr["reward"], tr["done"], fin_ret, fin_len)
                return (st2, obs_last, ep_ret, ep_len), ys

            (st, obs_rows, ep_ret, ep_len), ys = _jax.lax.scan(
                body, (st, obs_rows, ep_ret, ep_len), (actn_c, keys_c),
            )
            ys = _jax.tree_util.tree_map(
                lambda x: x.reshape((n_steps,) + x.shape[2:]), ys
            )
        else:
            def body(carry, xs):
                st, obs_rows, ep_ret, ep_len = carry
                a_n, k = xs
                st2, obs2, tr = policy_step(st, obs_rows, pp, a_n, k)
                (ep_ret2, ep_len2), (fin_ret, fin_len) = _ep_account(
                    (ep_ret, ep_len), (tr["reward"], tr["done"])
                )
                carry = (st2, obs2, ep_ret2, ep_len2)
                ys = (obs_rows, tr["action"], tr["logp"], tr["value"],
                      tr["reward"], tr["done"], fin_ret, fin_len)
                return carry, ys

            (st, obs_rows, ep_ret, ep_len), ys = _jax.lax.scan(
                body, (st, obs_rows, ep_ret, ep_len), (actn, env_keys),
            )
        (obs_seq, act_seq, logp_seq, val_seq, rew_seq, done_seq,
         fin_ret, fin_len) = ys
        done_flat = done_seq.reshape(n_steps, B) > 0.5
        if N > 1:
            done_flat = _jnp.repeat(done_flat, N, axis=1)
        traj = Transition(
            obs=chrows_to_flat(obs_seq, C),
            action=chrows_to_flat(act_seq, 4),
            logp=rows_to_flat(logp_seq),
            value=rows_to_flat(val_seq),
            reward=rows_to_flat(rew_seq),
            done=done_flat,
        )
        # materialize the flat (time, batch, ...) layout ONCE: without the
        # barrier XLA re-fuses these big transposes into every minibatch
        # gather of the 10x8 update phase (measured 4x update inflation)
        traj = _jax.lax.optimization_barrier(traj)
        metrics = {
            "finished_return": rows_to_flat(fin_ret),
            "finished_len": rows_to_flat(fin_len).astype(_jnp.int32),
        }
        ts = ts._replace(
            env_state=(st, obs_rows),
            last_obs=chrows_to_flat(obs_rows[None], C)[0],
            rng=rng,
            ep_return=rows_to_flat(ep_ret[None])[0],
            ep_len=rows_to_flat(ep_len[None])[0].astype(_jnp.int32),
        )
        return ts, traj, metrics

    def adapter_step(env_state, action, key):
        st, _ = env_state
        if N == 1:
            st2, obs, rew, done = step(st, action, key)
            obs_rows = obs.T.reshape(C, Tb, LANE)
            return (st2, obs_rows), obs, rew, done
        act = action.reshape(B, N, 4)
        st2, obs, rew, done = step(st, act, key)
        obs_rows = obs.transpose(2, 1, 0).reshape(C, T, LANE)
        return (
            (st2, obs_rows),
            obs.reshape(B * N, C),
            rew.reshape(B * N),
            _jnp.repeat(done, N),
        )

    return batched_reset, rollout_override, adapter_step
