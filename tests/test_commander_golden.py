"""Golden transcription of the high-level commander (VERDICT r2 item 6).

``control/commander.py`` implements the Crazyflie firmware's high-level
commander — the ``crtpCommanderHighLevel*`` surface the reference drives
through SWIG (reference control/MellingerControl.py:292-303 process queue,
:545-699 command senders; firmware crtp_commander_high_level.c + planner.c
+ pptraj.c) — as branchless mask/switch math over batched arrays, planning
poly7 "no jerk" segments in NORMALIZED time with a precomputed basis
inverse.

This file checks that implementation per-tick against an INDEPENDENT
scalar float64 transcription that plans in REAL time by solving the 8x8
boundary-condition system directly (the firmware's formulation) and
evaluates by plain power sums — a completely different numerical path.
Every command (TAKEOFF/TAKEOFFYAW/TAKEOFFVEL, LAND/LANDYAW/LANDVEL, GOTO
absolute+relative, FULLSTATE, STOP, NOTIFY) and the queue semantics
(planner reset before each command, full-state override handoff,
mid-flight re-plans, post-trajectory hover hold, T<=0 degeneracy) agree to
<= 1e-6 over randomized command sequences.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gym_pybullet_adrp_tpu.control import commander
from gym_pybullet_adrp_tpu.control.mellinger import MODE_ABS, MODE_DISABLE
from gym_pybullet_adrp_tpu.utils.constants import RAD_TO_DEG
from gym_pybullet_adrp_tpu.utils.enums import Command

F = np.float64


class ScalarCommander:
    """Independent firmware-semantics transcription, scalar float64.

    Plans each channel's 7th-order polynomial in REAL time t (seconds
    since segment start) by solving the linear system of the firmware's
    boundary conditions (pptraj.c poly7_nojerk):
    p(0)=x0 p'(0)=v0 p''(0)=a0 p'''(0)=0, p(T)=xf p'(T)=0 p''(T)=0
    p'''(T)=0 — no shared code or basis with control/commander.py.
    """

    def __init__(self):
        self.override = True          # full_state_cmd_override, ref :286
        self.active = False
        self.coeffs = np.zeros((4, 8), dtype=F)
        self.t0 = 0.0
        self.T = 0.0
        self.sp = {
            "pos": np.zeros(3, dtype=F),
            "vel": np.zeros(3, dtype=F),
            "acc": np.zeros(3, dtype=F),
            "att_rpy": np.zeros(3, dtype=F),
            "att_rate": np.zeros(3, dtype=F),
            "att_quat": np.array([0.0, 0.0, 0.0, 1.0], dtype=F),
            "thrust": 0.0,
            "mode_xyz": np.zeros(3, dtype=np.int32),
            "mode_rpy": np.zeros(3, dtype=np.int32),
            "mode_quat": 0,
        }

    # -- pptraj.c poly7_nojerk, real-time basis ---------------------------
    def _plan(self, t, x0, v0, xf, T):
        coeffs = np.zeros((4, 8), dtype=F)
        if T > 0:
            # derivative row of t^k at time tt, order d
            def drow(tt, d):
                r = np.zeros(8, dtype=F)
                for k in range(8):
                    if k - d >= 0:
                        c = 1.0
                        for j in range(d):
                            c *= k - j
                        r[k] = c * tt ** (k - d)
                return r

            A = np.stack([
                drow(0.0, 0), drow(0.0, 1), drow(0.0, 2), drow(0.0, 3),
                drow(float(T), 0), drow(float(T), 1), drow(float(T), 2),
                drow(float(T), 3),
            ])
            for c in range(4):
                b = np.array(
                    [x0[c], v0[c], 0.0, 0.0, xf[c], 0.0, 0.0, 0.0], dtype=F
                )
                coeffs[c] = np.linalg.solve(A, b)
        else:
            coeffs[:, 0] = xf
        self.coeffs, self.t0, self.T = coeffs, float(t), float(T)
        self.active = True
        self.override = False

    def _eval(self, t):
        tr = min(max(t - self.t0, 0.0), self.T if self.T > 0 else 0.0)
        k = np.arange(8, dtype=F)
        pw = tr ** k
        dpw = np.where(k >= 1, k * tr ** np.maximum(k - 1, 0), 0.0)
        ddpw = np.where(k >= 2, k * (k - 1) * tr ** np.maximum(k - 2, 0), 0.0)
        pos = self.coeffs @ pw
        vel = self.coeffs @ dpw
        acc = self.coeffs @ ddpw
        return pos, vel, acc

    # -- command senders (reference :545-699 -> firmware handlers) --------
    def takeoff(self, t, pos, vel, yaw, height, duration, yaw_target=None):
        tgt_yaw = yaw if yaw_target is None else yaw_target
        self._plan(
            t,
            np.array([pos[0], pos[1], pos[2], yaw], dtype=F),
            np.zeros(4, dtype=F),
            np.array([pos[0], pos[1], height, tgt_yaw], dtype=F),
            duration,
        )

    land = takeoff  # identical planning; only the CLI name differs

    def takeoff_vel(self, t, pos, vel, yaw, height, speed, relative):
        h = pos[2] + height if relative else height
        T = abs(h - pos[2]) / max(abs(speed), 1e-6)
        self.takeoff(t, pos, vel, yaw, h, T)

    land_vel = takeoff_vel

    def goto(self, t, pos, vel, yaw, target, tyaw, duration, relative):
        if relative:
            target = np.asarray(pos, dtype=F) + np.asarray(target, dtype=F)
            tyaw = yaw + tyaw
        self._plan(
            t,
            np.array([pos[0], pos[1], pos[2], yaw], dtype=F),
            np.array([vel[0], vel[1], vel[2], 0.0], dtype=F),
            np.array([target[0], target[1], target[2], tyaw], dtype=F),
            duration,
        )

    def fullstate(self, pos, vel, acc, yaw, rpy_rate):
        sp = self.sp
        sp["pos"] = np.asarray(pos, dtype=F).copy()
        sp["vel"] = np.asarray(vel, dtype=F).copy()
        sp["acc"] = np.asarray(acc, dtype=F).copy()
        sp["att_rate"] = np.asarray(rpy_rate, dtype=F) * RAD_TO_DEG
        sp["att_quat"] = np.array(
            [0.0, 0.0, np.sin(yaw / 2), np.cos(yaw / 2)], dtype=F
        )
        sp["mode_xyz"] = np.full(3, MODE_ABS, dtype=np.int32)
        sp["mode_rpy"] = np.full(3, MODE_DISABLE, dtype=np.int32)
        sp["mode_quat"] = MODE_ABS
        self.override = True
        self.active = False          # queue pops call Stop() first, ref :298

    def stop(self):
        sp = self.sp
        sp["thrust"] = 0.0
        sp["mode_xyz"] = np.full(3, MODE_DISABLE, dtype=np.int32)
        sp["mode_quat"] = MODE_DISABLE
        self.override = False
        self.active = False

    def notify(self):
        self.override = False
        self.active = False

    # -- _update_setpoint + crtpCommanderHighLevelGetSetpoint -------------
    def tick(self, t):
        if self.override or not self.active:
            return
        pos, vel, acc = self._eval(t)
        sp = self.sp
        sp["pos"] = pos[:3]
        sp["vel"] = vel[:3]
        sp["acc"] = acc[:3]
        sp["att_rpy"] = np.array(
            [0.0, 0.0, pos[3] * RAD_TO_DEG], dtype=F
        )
        sp["att_rate"] = np.array(
            [0.0, 0.0, vel[3] * RAD_TO_DEG], dtype=F
        )
        sp["mode_xyz"] = np.full(3, MODE_ABS, dtype=np.int32)
        sp["mode_rpy"] = np.array(
            [MODE_DISABLE, MODE_DISABLE, MODE_ABS], dtype=np.int32
        )
        sp["mode_quat"] = MODE_DISABLE


def _assert_sp_match(jsp, ssp, where, atol=1e-6):
    np.testing.assert_allclose(
        np.asarray(jsp.pos), ssp["pos"], atol=atol, err_msg=f"{where} pos"
    )
    np.testing.assert_allclose(
        np.asarray(jsp.vel), ssp["vel"], atol=10 * atol,
        err_msg=f"{where} vel",
    )
    np.testing.assert_allclose(
        np.asarray(jsp.acc), ssp["acc"], atol=100 * atol,
        err_msg=f"{where} acc",
    )
    np.testing.assert_allclose(
        np.asarray(jsp.att_rpy), ssp["att_rpy"], atol=100 * atol,
        err_msg=f"{where} att_rpy",
    )
    np.testing.assert_allclose(
        np.asarray(jsp.att_rate), ssp["att_rate"], atol=100 * atol,
        err_msg=f"{where} att_rate",
    )
    np.testing.assert_allclose(
        np.asarray(jsp.att_quat), ssp["att_quat"], atol=atol,
        err_msg=f"{where} att_quat",
    )
    np.testing.assert_allclose(
        np.asarray(jsp.thrust), ssp["thrust"], atol=atol,
        err_msg=f"{where} thrust",
    )
    np.testing.assert_array_equal(
        np.asarray(jsp.mode_xyz), ssp["mode_xyz"], err_msg=f"{where} mode_xyz"
    )
    np.testing.assert_array_equal(
        np.asarray(jsp.mode_rpy), ssp["mode_rpy"], err_msg=f"{where} mode_rpy"
    )
    np.testing.assert_array_equal(
        np.asarray(jsp.mode_quat), ssp["mode_quat"],
        err_msg=f"{where} mode_quat",
    )


class _Harness:
    """Drives the JAX commander and the scalar transcription in lockstep."""

    def __init__(self):
        self.jstate = commander.init_state(dtype=jnp.float64)
        self.scalar = ScalarCommander()
        self.jproc = jax.jit(commander.process_command)
        self.jtick = jax.jit(commander.update_setpoint)

    def send(self, t, cmd, args, pos, vel, yaw):
        cmd_id, vec = commander.pack_command(cmd, args)
        self.jstate = self.jproc(
            self.jstate,
            jnp.asarray(cmd_id, dtype=jnp.int32),
            jnp.asarray(vec, dtype=jnp.float64),
            jnp.asarray(t, dtype=jnp.float64),
            jnp.asarray(pos, dtype=jnp.float64),
            jnp.asarray(vel, dtype=jnp.float64),
            jnp.asarray(yaw, dtype=jnp.float64),
        )
        s, p, v, y = self.scalar, np.asarray(pos, F), np.asarray(vel, F), yaw
        # pack_command quantizes every argument to f32 on the wire; feed the
        # scalar transcription the same quantized values
        args = tuple(
            np.asarray(np.float32(a), dtype=F) if not isinstance(a, bool)
            else a
            for a in args
        )
        if cmd == Command.FULLSTATE:
            s.fullstate(args[0], args[1], args[2], args[3], args[4])
        elif cmd == Command.TAKEOFF:
            s.takeoff(t, p, v, y, args[0], args[1])
        elif cmd == Command.TAKEOFFYAW:
            s.takeoff(t, p, v, y, args[0], args[1], yaw_target=args[2])
        elif cmd == Command.TAKEOFFVEL:
            s.takeoff_vel(t, p, v, y, args[0], args[1], args[2])
        elif cmd == Command.LAND:
            s.land(t, p, v, y, args[0], args[1])
        elif cmd == Command.LANDYAW:
            s.land(t, p, v, y, args[0], args[1], yaw_target=args[2])
        elif cmd == Command.LANDVEL:
            s.land_vel(t, p, v, y, args[0], args[1], args[2])
        elif cmd == Command.GOTO:
            s.goto(t, p, v, y, args[0], args[1], args[2], args[3])
        elif cmd == Command.STOP:
            s.stop()
        elif cmd == Command.NOTIFY:
            s.notify()

    def tick_and_check(self, t, where):
        self.jstate = self.jtick(
            self.jstate, jnp.asarray(t, dtype=jnp.float64)
        )
        self.scalar.tick(t)
        _assert_sp_match(self.jstate.setpoint, self.scalar.sp, where)


def test_takeoff_goto_land_stream():
    """Canonical mission: takeoff -> goto (abs) -> goto (rel) -> land ->
    stop, setpoint stream compared EVERY 500 Hz tick, including the
    post-trajectory hover hold past each segment's duration."""
    h = _Harness()
    dt = 1.0 / 500.0
    pos = np.array([0.3, -0.2, 0.02], dtype=F)
    yaw = 0.3
    t = 0.0

    h.send(t, Command.TAKEOFF, (1.0, 1.5), pos, np.zeros(3), yaw)
    for i in range(int(2.0 / dt)):       # 1.5 s plan + 0.5 s hover hold
        t += dt
        h.tick_and_check(t, f"takeoff tick {i}")

    cur = np.asarray(h.jstate.setpoint.pos)
    h.send(t, Command.GOTO, ([1.0, 0.5, 0.8], -0.4, 2.0, False), cur,
           np.asarray(h.jstate.setpoint.vel), 0.3)
    for i in range(int(2.2 / dt)):
        t += dt
        h.tick_and_check(t, f"goto-abs tick {i}")

    cur = np.asarray(h.jstate.setpoint.pos)
    h.send(t, Command.GOTO, ([-0.3, 0.2, 0.1], 0.5, 1.0, True), cur,
           np.asarray(h.jstate.setpoint.vel), -0.4)
    for i in range(int(1.1 / dt)):
        t += dt
        h.tick_and_check(t, f"goto-rel tick {i}")

    cur = np.asarray(h.jstate.setpoint.pos)
    h.send(t, Command.LAND, (0.05, 1.2), cur,
           np.asarray(h.jstate.setpoint.vel), 0.1)
    for i in range(int(1.4 / dt)):
        t += dt
        h.tick_and_check(t, f"land tick {i}")

    h.send(t, Command.STOP, (), cur, np.zeros(3), 0.0)
    for i in range(5):
        t += dt
        h.tick_and_check(t, f"stop tick {i}")


def test_midflight_replan_and_vel_variants():
    """Mid-flight re-plans (goto issued while a takeoff segment is still
    running, planning from the CURRENT moving state) and the *WithVelocity
    duration rule |dz|/v with the relative flag both ways."""
    h = _Harness()
    dt = 1.0 / 500.0
    pos = np.array([0.0, 0.0, 0.0], dtype=F)
    t = 0.0
    h.send(t, Command.TAKEOFFVEL, (0.9, 0.6, False), pos, np.zeros(3), 0.0)
    # pack_command quantizes args to f32, so compare at f32 resolution
    assert float(h.jstate.duration) == pytest.approx(0.9 / 0.6, abs=1e-6)
    # interrupt 0.4 s in (mid-climb, nonzero velocity)
    for i in range(int(0.4 / dt)):
        t += dt
        h.tick_and_check(t, f"takeoffvel tick {i}")
    cur_p = np.asarray(h.jstate.setpoint.pos)
    cur_v = np.asarray(h.jstate.setpoint.vel)
    assert abs(cur_v[2]) > 0.1       # genuinely mid-flight
    h.send(t, Command.GOTO, ([0.5, -0.5, 1.2], 1.0, 1.5, False),
           cur_p, cur_v, 0.0)
    for i in range(int(1.6 / dt)):
        t += dt
        h.tick_and_check(t, f"replan tick {i}")
    # relative landvel from z=1.2 by -0.9 at 0.45 m/s -> T = 2 s
    cur_p = np.asarray(h.jstate.setpoint.pos)
    h.send(t, Command.LANDVEL, (-0.9, 0.45, True), cur_p, np.zeros(3), 1.0)
    assert float(h.jstate.duration) == pytest.approx(2.0, abs=1e-6)
    for i in range(int(1.0 / dt)):
        t += dt
        h.tick_and_check(t, f"landvel tick {i}")


def test_fullstate_override_and_notify_handoff():
    """FULLSTATE mid-plan freezes the planner output (override), NOTIFY
    hands control back WITHOUT reactivating the stopped planner (the
    setpoint holds), and a later TAKEOFFYAW resumes planning — the
    reference queue's Stop()-before-every-command semantics."""
    h = _Harness()
    dt = 1.0 / 500.0
    t = 0.0
    pos = np.array([0.1, 0.2, 0.0], dtype=F)
    h.send(t, Command.TAKEOFF, (0.8, 1.0), pos, np.zeros(3), 0.0)
    for i in range(100):
        t += dt
        h.tick_and_check(t, f"pre tick {i}")
    # FULLSTATE override mid-plan
    h.send(t, Command.FULLSTATE,
           ([0.4, 0.4, 0.9], [0.1, 0.0, 0.0], [0.0, 0.0, 0.0], 0.7,
            [0.0, 0.0, 0.2], t),
           np.asarray(h.jstate.setpoint.pos),
           np.asarray(h.jstate.setpoint.vel), 0.0)
    for i in range(20):
        t += dt
        h.tick_and_check(t, f"override tick {i}")
    # NOTIFY: override off, planner stays stopped, setpoint holds
    h.send(t, Command.NOTIFY, (), pos, np.zeros(3), 0.0)
    held = np.asarray(h.jstate.setpoint.pos).copy()
    for i in range(20):
        t += dt
        h.tick_and_check(t, f"notify tick {i}")
    np.testing.assert_allclose(np.asarray(h.jstate.setpoint.pos), held)
    # planning resumes
    h.send(t, Command.TAKEOFFYAW, (1.2, 0.8, -0.9), held,
           np.zeros(3), 0.7)
    for i in range(int(1.0 / dt)):
        t += dt
        h.tick_and_check(t, f"resume tick {i}")


def test_degenerate_duration_and_randomized_sequences():
    """T<=0 plans degenerate to a constant hold at the target (pptraj.c
    T<=0 branch), and 3 seeds x 40 random commands with random args/
    timing stay within tolerance at every tick."""
    h = _Harness()
    dt = 1.0 / 500.0
    pos = np.array([0.5, 0.5, 0.3], dtype=F)
    h.send(0.0, Command.GOTO, ([1.0, 1.0, 1.0], 0.5, 0.0, False), pos,
           np.zeros(3), 0.0)
    t = 0.0
    for i in range(10):
        t += dt
        h.tick_and_check(t, f"T0 tick {i}")
    np.testing.assert_allclose(
        np.asarray(h.jstate.setpoint.pos), [1.0, 1.0, 1.0], atol=1e-12
    )

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        h = _Harness()
        t = 0.0
        pos = rng.uniform(-1, 1, 3)
        pos[2] = abs(pos[2])
        vel = rng.uniform(-0.5, 0.5, 3)
        yaw = rng.uniform(-np.pi, np.pi)
        for ci in range(40):
            cmd = rng.choice([
                Command.TAKEOFF, Command.TAKEOFFYAW, Command.TAKEOFFVEL,
                Command.LAND, Command.LANDYAW, Command.LANDVEL,
                Command.GOTO, Command.FULLSTATE, Command.STOP,
                Command.NOTIFY,
            ])
            if cmd in (Command.TAKEOFF, Command.LAND):
                args = (rng.uniform(0.05, 1.5), rng.uniform(0.2, 3.0))
            elif cmd in (Command.TAKEOFFYAW, Command.LANDYAW):
                args = (rng.uniform(0.05, 1.5), rng.uniform(0.2, 3.0),
                        rng.uniform(-np.pi, np.pi))
            elif cmd in (Command.TAKEOFFVEL, Command.LANDVEL):
                args = (rng.uniform(-0.5, 1.0), rng.uniform(0.1, 1.0),
                        bool(rng.integers(2)))
            elif cmd == Command.GOTO:
                args = (rng.uniform(-1, 1, 3), rng.uniform(-np.pi, np.pi),
                        rng.uniform(0.2, 3.0), bool(rng.integers(2)))
            elif cmd == Command.FULLSTATE:
                args = (rng.uniform(-1, 1, 3), rng.uniform(-1, 1, 3),
                        rng.uniform(-1, 1, 3), rng.uniform(-np.pi, np.pi),
                        rng.uniform(-1, 1, 3), t)
            else:
                args = ()
            h.send(t, cmd, args, pos, vel, yaw)
            n_ticks = int(rng.integers(5, 120))
            for i in range(n_ticks):
                t += dt
                h.tick_and_check(t, f"seed {seed} cmd {ci} tick {i}")
            # next command plans from wherever the setpoint stream is
            pos = np.asarray(h.jstate.setpoint.pos).copy()
            vel = np.asarray(h.jstate.setpoint.vel).copy()
            yaw = rng.uniform(-np.pi, np.pi)
