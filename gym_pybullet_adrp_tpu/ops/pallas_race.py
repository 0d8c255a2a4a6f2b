"""Pallas TPU kernel for the race inner loop: physics + Mellinger + commander.

One launch executes the whole 20-tick (500 Hz firmware window per 25 Hz
control step) race substep loop — rigid-body physics, the Mellinger
firmware control law with its biquad sensor filters / tick gating / tumble
cutoff / power distribution, and the high-level commander's per-tick poly7
setpoint evaluation — with all controller state VMEM-resident in
channel-major layout. The XLA race path (envs/race.py) runs the same math
as ~hundreds of small fusions per tick.

Scope: Physics.PYB, CF2X. Stochastic disturbances (the level1-3 configs'
per-tick wind force + thrust-space action noise, reference
MultiRaceAviary._apply_physics:532-544 and MellingerControl:202-253) are
sampled with the in-kernel TPU PRNG when ``noise`` is passed. Agents
(env x drone) flatten onto the lane axis; per-agent mass/inertia (race
randomization) ride as input channels. Equivalence with the XLA path is
asserted in tests/test_pallas_race.py (interpret mode).

Channel maps (S = state, W = window-static):

S (58, T, 128):
  0:3   pos        3:7  quat xyzw   7:10 vel      10:13 omega(body)
  13:17 rpms       17:21 prev_rpms
  21:24 prev_rpy   24:27 prev_vel
  27:30 acc_lpf_d1 30:33 acc_lpf_d2  33:36 gyro_lpf_d1 36:39 gyro_lpf_d2
  39:42 i_err_pos  42:45 i_err_m     45:47 prev_omega_rp
  47:49 prev_sp_omega_rp             49:53 control_rpyt
  53 tick  54 last_pos_call  55 last_att_call  56 tumble_counter
  57 error_flag

W (57, T, 128):
  0:3 sp_pos  3:6 sp_vel  6:9 sp_acc  9:12 sp_att_rate(deg/s)
  12 sp_yaw_quat_deg  13 sp_thrust  14 pos_mode(1=modeAbs on x)
  15 z_mode_disable   16 planner_mode(1=poly setpoint per tick)
  17 t_begin  18 duration  19 eliminated
  20:52 poly coeffs (x8,y8,z8,yaw8; normalized time)
  52 mass  53:56 J diag  56 (reserved)
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_pybullet_adrp_tpu.control import mellinger as mel

LANE = 128
S_CHANNELS = 58
W_CHANNELS = 57

RAD2DEG = 180.0 / np.pi
DEG2RAD = np.pi / 180.0

_ACC_B0, _ACC_B1, _ACC_B2, _ACC_A1, _ACC_A2 = mel._ACC_LPF_COEFFS
_GY_B0, _GY_B1, _GY_B2, _GY_A1, _GY_A2 = mel._GYRO_LPF_COEFFS


def _atan_core(x):
    """cephes atanf polynomial on |x| <= tan(pi/8) (float32 ~1 ulp)."""
    z = x * x
    return (
        (((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1)
         * z - 3.33329491539e-1) * z * x + x
    )


def _atan(x):
    """Branchless float32 atan via cephes range reduction (Mosaic has no
    atan2/asin lowering). One division total: the range-reduction branches
    share a selected numerator/denominator."""
    ax = jnp.abs(x)
    big = ax > 2.414213562373095      # tan(3pi/8)
    mid = ax > 0.4142135623730950     # tan(pi/8)
    num = jnp.where(big, -1.0, jnp.where(mid, ax - 1.0, ax))
    den = jnp.where(
        big, jnp.maximum(ax, 1e-30), jnp.where(mid, ax + 1.0, 1.0)
    )
    xr = num / den
    base = jnp.where(big, np.pi / 2, jnp.where(mid, np.pi / 4, 0.0))
    y = base + _atan_core(xr)
    return jnp.where(x < 0, -y, y)


def _atan2(y, x):
    ax = jnp.where(jnp.abs(x) > 1e-30, x, 1e-30)
    base = _atan(y / ax)
    # quadrant fix for x < 0
    shift = jnp.where(y >= 0, np.pi, -np.pi)
    return jnp.where(x < 0, base + shift, base)


def _asin(x):
    """Direct cephes asinf polynomial (float32 ~1 ulp) — much cheaper than
    the former atan2(x, sqrt(1-x^2)) route (no extra atan range reduction,
    one sqrt only on the |x| > 0.5 branch's operand)."""
    x = jnp.clip(x, -1.0, 1.0)
    a = jnp.abs(x)
    big = a > 0.5
    zz = jnp.where(big, 0.5 * (1.0 - a), a * a)
    s = jnp.where(big, jnp.sqrt(zz), a)
    p = (
        ((((4.2163199048e-2 * zz + 2.4181311049e-2) * zz + 4.5470025998e-2)
          * zz + 7.4953002686e-2) * zz + 1.6666752422e-1) * zz * s + s
    )
    r = jnp.where(big, np.pi / 2 - 2.0 * p, p)
    return jnp.where(x < 0, -r, r)


def _rot_cols_from_rpy(r, p, y):
    """Columns of R = Rz(y)Ry(p)Rx(r) (extrinsic xyz == pybullet euler)."""
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp_ = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    c0 = (cy * cp, sy * cp, -sp_)
    c1 = (cy * sp_ * sr - sy * cr, sy * sp_ * sr + cy * cr, cp * sr)
    c2 = (cy * sp_ * cr + sy * sr, sy * sp_ * cr - cy * sr, cp * cr)
    return c0, c1, c2


def _u01_factory(row_shape):
    def _u01(nch):
        """nch rows of uniform [0, 1) floats from raw PRNG bits."""
        bits = pltpu.prng_random_bits((nch,) + row_shape)
        u = pltpu.bitcast(
            (pltpu.bitcast(bits, jnp.uint32) >> 9) | jnp.uint32(0x3F800000),
            jnp.float32,
        )  # [1, 2)
        return u - 1.0

    return _u01


def _kernel(*refs, n_ticks, dt, kf, km, arm, ground_z, col_h_half,
            noise=None, noise_rows=False, unroll=True):
    """``noise``: (act_std, wind_lo, wind_hi) enables per-tick disturbances.
    Two sampling modes: in-kernel TPU PRNG (compiled path; ``seed_ref``
    leads the refs) or a precomputed additive-noise input block
    (``noise_rows=True``; interpret-mode tests — the HLO interpreter has no
    pltpu.prng_* lowering)."""
    noise_blk = None
    if noise is not None and noise_rows:
        state_ref, win_ref, noise_ref, out_ref = refs
        noise_blk = noise_ref[:]          # (n_ticks, 7, T, 128) additive
    elif noise is not None:
        seed_ref, state_ref, win_ref, out_ref = refs
        pltpu.prng_seed(seed_ref[0])
    else:
        state_ref, win_ref, out_ref = refs
    st = state_ref[:]
    w = win_ref[:]

    wv = dict(
        sp_pos=(w[0], w[1], w[2]),
        sp_vel=(w[3], w[4], w[5]),
        sp_acc=(w[6], w[7], w[8]),
        sp_rate=(w[9], w[10], w[11]),
        sp_yaw_quat_deg=w[12],
        sp_thrust=w[13],
        pos_mode=w[14] > 0.5,
        z_disable=w[15] > 0.5,
        planner=w[16] > 0.5,
        t_begin=w[17],
        duration=w[18],
        eliminated=w[19] > 0.5,
        coeffs=w[20:52],          # (32, T, 128)
        mass=w[52],
        J=(w[53], w[54], w[55]),
    )
    out_ref[:] = _window_loop(
        st, wv, n_ticks=n_ticks, dt=dt, kf=kf, km=km, arm=arm,
        ground_z=ground_z, noise=noise, noise_blk=noise_blk, unroll=unroll,
    )


def _window_loop(st, wv, *, n_ticks, dt, kf, km, arm, ground_z,
                 noise=None, noise_blk=None, unroll=True):
    """The 20-tick firmware window: physics + commander + Mellinger +
    power distribution, fully VMEM-resident. ``wv`` is the unpacked
    window-static dict (see the W channel map); ``wv['coeffs'] is None``
    statically elides the poly7 planner evaluation (the RL FULLSTATE path
    never uses it). Returns the final S block."""
    row_shape = st.shape[1:]  # (T, 128)
    _u01 = _u01_factory(row_shape)
    if noise is not None and noise_blk is None:
        act_std, wind_lo, wind_hi = noise

    sp_pos = wv["sp_pos"]
    sp_vel = wv["sp_vel"]
    sp_acc = wv["sp_acc"]
    sp_rate = wv["sp_rate"]
    sp_yaw_quat_deg = wv["sp_yaw_quat_deg"]
    sp_thrust = wv["sp_thrust"]
    pos_mode = wv["pos_mode"]
    z_disable = wv["z_disable"]
    planner = wv["planner"]
    t_begin = wv["t_begin"]
    duration = wv["duration"]
    eliminated = wv["eliminated"]
    coeffs = wv["coeffs"]
    mass = wv["mass"]
    Jx, Jy, Jz = wv["J"]
    arm_s = float(arm / np.sqrt(2.0))  # plain float: no f64 promotion
    inv_dt = float(1.0 / dt)
    inv_dt_g = float(1.0 / dt / 9.8)
    # loop-invariant reciprocals (mass/J are window-static rows): the
    # per-tick /mass, /J divisions become multiplies
    inv_mass = 1.0 / mass
    inv_Jx, inv_Jy, inv_Jz = 1.0 / Jx, 1.0 / Jy, 1.0 / Jz
    xc_static = None
    if coeffs is None:
        dy0 = sp_yaw_quat_deg * DEG2RAD
        xc_static = (jnp.cos(dy0), jnp.sin(dy0))

    def poly_eval(t_rel):
        """Evaluate pos/vel/acc of the 4-channel poly7 at clamped t_rel."""
        safe_T = jnp.where(duration > 0, duration, 1.0)
        s = jnp.clip(t_rel / safe_T, 0.0, 1.0)
        outs = []
        for ch in range(4):
            c = [coeffs[8 * ch + i] for i in range(8)]
            # Horner for p, p', p''
            pv = c[7]
            dv = 7.0 * c[7]
            av = 42.0 * c[7]
            for i in range(6, -1, -1):
                pv = pv * s + c[i]
                if i >= 1:
                    dv = dv * s + i * c[i]
                if i >= 2:
                    av = av * s + i * (i - 1) * c[i]
            outs.append((pv, dv / safe_T, av / (safe_T * safe_T)))
        return outs  # [(p, v, a)] x 4 channels

    def tick_tuple(i, st):
        """One firmware tick over the 58 channel rows as a TUPLE (st[c] is
        a (T, 128) row). Carrying rows instead of the stacked block lets
        the unrolled TPU path skip 19 intermediate (58, T, 128)
        stack/unstack round trips — identical math, identical bits."""
        px, py, pz = st[0], st[1], st[2]
        qx, qy, qz, qw = st[3], st[4], st[5], st[6]
        vx, vy, vz = st[7], st[8], st[9]
        wx, wy, wz = st[10], st[11], st[12]
        rpm = [st[13], st[14], st[15], st[16]]

        # ---- 1. physics substep (PYB, CF2X) -------------------------------
        f = [r * r * kf for r in rpm]
        thrust = f[0] + f[1] + f[2] + f[3]
        tq = [r * r * km for r in rpm]
        tx = (f[0] + f[1] - f[2] - f[3]) * arm_s
        ty = (-f[0] + f[1] + f[2] - f[3]) * arm_s
        tz = tq[0] - tq[1] + tq[2] - tq[3]
        fx = 2.0 * (qx * qz + qy * qw) * thrust
        fy = 2.0 * (qy * qz - qx * qw) * thrust
        fz = (1.0 - 2.0 * (qx * qx + qy * qy)) * thrust
        if noise_blk is not None:
            tick_noise = noise_blk[i]     # (7, T, 128) additive values
            fx = fx + tick_noise[0]
            fy = fy + tick_noise[1]
            fz = fz + tick_noise[2]
        elif noise is not None:
            # wind disturbance force, uniform per tick per agent (reference
            # _apply_physics:532-544 via dynamics.pyb_substep ext_force_world)
            uw = _u01(3)
            fx = fx + (wind_lo[0] + uw[0] * (wind_hi[0] - wind_lo[0]))
            fy = fy + (wind_lo[1] + uw[1] * (wind_hi[1] - wind_lo[1]))
            fz = fz + (wind_lo[2] + uw[2] * (wind_hi[2] - wind_lo[2]))
        # inv_mass/inv_J are hoisted window-statics: 6 divisions/tick -> mults
        vx = vx + dt * fx * inv_mass
        vy = vy + dt * fy * inv_mass
        vz = vz + dt * (fz * inv_mass - 9.8)
        wx = wx + dt * tx * inv_Jx
        wy = wy + dt * ty * inv_Jy
        wz = wz + dt * tz * inv_Jz
        px = px + dt * vx
        py = py + dt * vy
        pz = pz + dt * vz
        r00 = 1.0 - 2.0 * (qy * qy + qz * qz)
        r01 = 2.0 * (qx * qy - qz * qw)
        r02 = 2.0 * (qx * qz + qy * qw)
        r10 = 2.0 * (qx * qy + qz * qw)
        r11 = 1.0 - 2.0 * (qx * qx + qz * qz)
        r12 = 2.0 * (qy * qz - qx * qw)
        r20 = 2.0 * (qx * qz - qy * qw)
        r21 = 2.0 * (qy * qz + qx * qw)
        r22 = 1.0 - 2.0 * (qx * qx + qy * qy)
        ox = r00 * wx + r01 * wy + r02 * wz
        oy = r10 * wx + r11 * wy + r12 * wz
        oz = r20 * wx + r21 * wy + r22 * wz
        # sinc-form small-angle quaternion update. theta = |w| dt/2 is
        # bounded: |w| > 20 eliminates at ctrl rate (max 20 ticks of
        # bounded torque later, |w| <~ 120 -> theta <~ 0.12), and
        # eliminated/grounded rows have zero torque so |w| never grows
        # past that. The 7th-order series for sin(theta)/|w| =
        # (dt/2)(1 - t2/6 + t4/120 - t6/5040) and cos is f32-exact to
        # theta ~ 0.5 and avoids the hardware sin/cos + divide.
        n2 = ox * ox + oy * oy + oz * oz
        t2 = n2 * (dt * dt * 0.25)
        t4 = t2 * t2
        t6 = t4 * t2
        s_n = (dt * 0.5) * (
            1.0 - t2 * (1.0 / 6.0) + t4 * (1.0 / 120.0) - t6 * (1.0 / 5040.0)
        )
        cth = 1.0 - t2 * 0.5 + t4 * (1.0 / 24.0) - t6 * (1.0 / 720.0)
        ux, uy, uz = ox * s_n, oy * s_n, oz * s_n
        nqx = cth * qx + qw * ux + (uy * qz - uz * qy)
        nqy = cth * qy + qw * uy + (uz * qx - ux * qz)
        nqz = cth * qz + qw * uz + (ux * qy - uy * qx)
        nqw = cth * qw - (ux * qx + uy * qy + uz * qz)
        keep = n2 <= 1e-16  # |w| <= 1e-8, on the squared norm (no sqrt)
        qx = jnp.where(keep, qx, nqx)
        qy = jnp.where(keep, qy, nqy)
        qz = jnp.where(keep, qz, nqz)
        qw = jnp.where(keep, qw, nqw)
        below = pz < ground_z
        pz = jnp.where(below, ground_z, pz)
        vx = jnp.where(below, 0.0, vx)
        vy = jnp.where(below, 0.0, vy)
        vz = jnp.where(below, jnp.maximum(vz, 0.0), vz)
        wx = jnp.where(below, 0.0, wx)
        wy = jnp.where(below, 0.0, wy)
        wz = jnp.where(below, 0.0, wz)

        # rpy from the updated quaternion (pybullet euler convention)
        sinr = 2.0 * (qw * qx + qy * qz)
        cosr = 1.0 - 2.0 * (qx * qx + qy * qy)
        roll = _atan2(sinr, cosr)
        sinp = jnp.clip(2.0 * (qw * qy - qz * qx), -1.0, 1.0)
        pitch = _asin(sinp)
        siny = 2.0 * (qw * qz + qx * qy)
        cosy_r = 1.0 - 2.0 * (qy * qy + qz * qz)
        yaw = _atan2(siny, cosy_r)
        # trig of rpy, derived algebraically from the same quat-matrix
        # entries (cos(asin x) = sqrt(1-x^2); the yaw/roll sin-cos pairs
        # are the matrix entries over cos(pitch)) — replaces 6 hardware
        # sin/cos. Gimbal-lock rows (|pitch| -> 90 deg) get the eps-guarded
        # large-but-finite values; those rows are transient tumbles.
        cp2 = jnp.maximum(1.0 - sinp * sinp, 1e-12)
        inv_cp = jax.lax.rsqrt(cp2)   # >= 1e-12 so no extra guard needed
        cp = cp2 * inv_cp             # sqrt(x) = x * rsqrt(x)
        sp_ = sinp
        cyw = cosy_r * inv_cp
        syw = siny * inv_cp
        cr = cosr * inv_cp
        sr = sinr * inv_cp

        # ---- 2. commander per-tick setpoint -------------------------------
        tick = st[53]
        t_now = tick * dt
        if coeffs is None:
            # RL FULLSTATE path: no poly7 planner — statically elided
            spx, spy, spz = sp_pos
            svx, svy, svz = sp_vel
            sax, say, saz = sp_acc
            srx, sry, srz = sp_rate
            desired_yaw_deg = sp_yaw_quat_deg
        else:
            pe = poly_eval(t_now - t_begin)
            spx = jnp.where(planner, pe[0][0], sp_pos[0])
            spy = jnp.where(planner, pe[1][0], sp_pos[1])
            spz = jnp.where(planner, pe[2][0], sp_pos[2])
            svx = jnp.where(planner, pe[0][1], sp_vel[0])
            svy = jnp.where(planner, pe[1][1], sp_vel[1])
            svz = jnp.where(planner, pe[2][1], sp_vel[2])
            sax = jnp.where(planner, pe[0][2], sp_acc[0])
            say = jnp.where(planner, pe[1][2], sp_acc[1])
            saz = jnp.where(planner, pe[2][2], sp_acc[2])
            srx = jnp.where(planner, 0.0, sp_rate[0])
            sry = jnp.where(planner, 0.0, sp_rate[1])
            srz = jnp.where(planner, pe[3][1] * RAD2DEG, sp_rate[2])
            desired_yaw_deg = jnp.where(
                planner, pe[3][0] * RAD2DEG, sp_yaw_quat_deg
            )

        # ---- 3. Mellinger sensors ------------------------------------------
        prev_r, prev_p, prev_y = st[21], st[22], st[23]
        pvx, pvy, pvz = st[24], st[25], st[26]
        rate_r = (roll - prev_r) * inv_dt
        rate_p = (pitch - prev_p) * inv_dt
        rate_y = (yaw - prev_y) * inv_dt
        accx = (vx - pvx) * inv_dt_g
        accy = (vy - pvy) * inv_dt_g
        accz = (vz - pvz) * inv_dt_g + 1.0
        # body rot = inv(R_intrinsicXYZ(rpy)): acc_body = R_intr^T @ acc
        # R_intr = Rx(r)Ry(p)Rz(y); rows of R_intr^T are columns of R_intr
        # (cr..syw computed from the quat matrix above)
        # R_intr columns (Rx@Ry@Rz):
        a00 = cp * cyw
        a01 = -cp * syw
        a02 = sp_
        a10 = cr * syw + sr * sp_ * cyw
        a11 = cr * cyw - sr * sp_ * syw
        a12 = -sr * cp
        a20 = sr * syw - cr * sp_ * cyw
        a21 = sr * cyw + cr * sp_ * syw
        a22 = cr * cp
        ab_x = a00 * accx + a10 * accy + a20 * accz
        ab_y = a01 * accx + a11 * accy + a21 * accz
        ab_z = a02 * accx + a12 * accy + a22 * accz

        # biquad LPFs (quirk-preserving coefficient swap, see mellinger.py)
        def lpf(b0, b1, b2, a1, a2, d1, d2, x):
            d0 = x - d1 * a1 - d2 * a2
            out = d0 * b0 + d1 * b1 + d2 * b2
            return d0, d1, out

        acc_d1 = [st[27], st[28], st[29]]
        acc_d2 = [st[30], st[31], st[32]]
        gy_d1 = [st[33], st[34], st[35]]
        gy_d2 = [st[36], st[37], st[38]]
        acc_f = []
        for i, x in enumerate((ab_x, ab_y, ab_z)):
            nd1, nd2, out = lpf(
                _ACC_B0, _ACC_B1, _ACC_B2, _ACC_A1, _ACC_A2,
                acc_d1[i], acc_d2[i], x,
            )
            acc_d1[i], acc_d2[i] = nd1, nd2
            acc_f.append(out)
        gyro_f = []
        for i, x in enumerate(
            (rate_r * RAD2DEG, rate_p * RAD2DEG, rate_y * RAD2DEG)
        ):
            nd1, nd2, out = lpf(
                _GY_B0, _GY_B1, _GY_B2, _GY_A1, _GY_A2, gy_d1[i], gy_d2[i], x
            )
            gy_d1[i], gy_d2[i] = nd1, nd2
            gyro_f.append(out)

        # ---- 4. tick gating + tumble --------------------------------------
        tumbling = accz < -0.5
        tumble_counter = jnp.where(tumbling, st[56] + 1.0, 0.0)
        tumbled = tumble_counter >= 30.0
        cur_time = tick / (1.0 / dt)  # == tick * dt (firmware freq = 1/dt)
        att_due = cur_time - st[55] > 0.002
        pos_due = att_due & (cur_time - st[54] > 0.01)
        run = att_due & ~tumbled

        # ---- 5. Mellinger control law -------------------------------------
        m_dt = 1.0 / 500.0
        r_err = (spx - px, spy - py, spz - pz)
        v_err = (svx - vx, svy - vy, svz - vz)
        i_ep = [st[39], st[40], st[41]]
        i_ep[0] = jnp.clip(i_ep[0] + r_err[0] * m_dt, -mel.I_RANGE_XY, mel.I_RANGE_XY)
        i_ep[1] = jnp.clip(i_ep[1] + r_err[1] * m_dt, -mel.I_RANGE_XY, mel.I_RANGE_XY)
        i_ep[2] = jnp.clip(i_ep[2] + r_err[2] * m_dt, -mel.I_RANGE_Z, mel.I_RANGE_Z)

        tf_x = mel.MASS * sax + mel.KP_XY * r_err[0] + mel.KD_XY * v_err[0] + mel.KI_XY * i_ep[0]
        tf_y = mel.MASS * say + mel.KP_XY * r_err[1] + mel.KD_XY * v_err[1] + mel.KI_XY * i_ep[1]
        tf_z = (
            mel.MASS * (saz + mel.GRAVITY_MAGNITUDE)
            + mel.KP_Z * r_err[2] + mel.KD_Z * v_err[2] + mel.KI_Z * i_ep[2]
        )
        # attitude-only branch (STOP): att_rpy == 0 -> alt_x = alt_y = 0;
        # firmware's else-z is the constant 1 (mode.z is disabled whenever
        # pos_mode is off on this path — eliminated/STOP rows)
        t0_ = jnp.where(pos_mode, tf_x, 0.0)
        t1_ = jnp.where(pos_mode, tf_y, 0.0)
        t2_ = jnp.where(pos_mode, tf_z, 1.0)
        # yaw correction when not in position mode (legacy yaw from state;
        # the deg->rad round trip is elided — cos/sin(yaw) reused, only
        # STOP'd/eliminated rows take this branch and their thrust is 0)
        t0 = jnp.where(pos_mode, t0_, t0_ * cyw - t1_ * syw)
        t1 = jnp.where(pos_mode, t1_, t0_ * syw + t1_ * cyw)
        t2 = t2_

        # state rotation matrix columns from the *extrinsic* rpy (matches
        # from_euler_xyz(rpy) in the XLA path); trig shared with the
        # sensor-rotation block above
        c0x, c0y, c0z = cyw * cp, syw * cp, -sp_
        c1x = cyw * sp_ * sr - syw * cr
        c1y = syw * sp_ * sr + cyw * cr
        c1z = cp * sr
        c2x = cyw * sp_ * cr + syw * sr
        c2y = syw * sp_ * cr - cyw * sr
        c2z = cp * cr
        current_thrust = t0 * c2x + t1 * c2y + t2 * c2z

        inv_t = jax.lax.rsqrt(
            jnp.maximum(t0 * t0 + t1 * t1 + t2 * t2, 1e-24)
        )
        zdx, zdy, zdz = t0 * inv_t, t1 * inv_t, t2 * inv_t
        if coeffs is None:
            # desired yaw is window-static on the FULLSTATE path: its
            # cos/sin were hoisted out of the tick loop
            xcx, xcy = xc_static
        else:
            dy_rad = desired_yaw_deg * DEG2RAD
            xcx, xcy = jnp.cos(dy_rad), jnp.sin(dy_rad)
        # yd = normalize(zd x xc)
        ydx = zdy * 0.0 - zdz * xcy
        ydy = zdz * xcx - zdx * 0.0
        ydz = zdx * xcy - zdy * xcx
        inv_y = jax.lax.rsqrt(
            jnp.maximum(ydx * ydx + ydy * ydy + ydz * ydz, 1e-24)
        )
        ydx, ydy, ydz = ydx * inv_y, ydy * inv_y, ydz * inv_y
        # xd = yd x zd
        xdx = ydy * zdz - ydz * zdy
        xdy = ydz * zdx - ydx * zdz
        xdz = ydx * zdy - ydy * zdx

        # eR from M = Rdes^T R - R^T Rdes (columns c_i of R, d_i of Rdes)
        def dot3(ax, ay, az, bx, by, bz):
            return ax * bx + ay * by + az * bz

        eR_x = dot3(zdx, zdy, zdz, c1x, c1y, c1z) - dot3(ydx, ydy, ydz, c2x, c2y, c2z)
        eR_y = -(dot3(xdx, xdy, xdz, c2x, c2y, c2z) - dot3(zdx, zdy, zdz, c0x, c0y, c0z))
        eR_z = dot3(ydx, ydy, ydz, c0x, c0y, c0z) - dot3(xdx, xdy, xdz, c1x, c1y, c1z)

        om_r = gyro_f[0] * DEG2RAD
        om_p = -gyro_f[1] * DEG2RAD
        om_y = gyro_f[2] * DEG2RAD
        sp_om_r = srx * DEG2RAD
        sp_om_p = sry * DEG2RAD
        ew_x = sp_om_r - om_r
        ew_y = -sp_om_p - om_p
        ew_z = srz * DEG2RAD - om_y
        inv_m_dt = 1.0 / m_dt  # python float: constant mult, not a division
        err_d_roll = ((sp_om_r - st[47]) - (om_r - st[45])) * inv_m_dt
        err_d_pitch = ((-sp_om_p - st[48]) - (om_p - st[46])) * inv_m_dt

        i_m = [st[42], st[43], st[44]]
        i_m[0] = jnp.clip(i_m[0] - eR_x * m_dt, -mel.I_RANGE_M_XY, mel.I_RANGE_M_XY)
        i_m[1] = jnp.clip(i_m[1] - eR_y * m_dt, -mel.I_RANGE_M_XY, mel.I_RANGE_M_XY)
        i_m[2] = jnp.clip(i_m[2] - eR_z * m_dt, -mel.I_RANGE_M_Z, mel.I_RANGE_M_Z)

        M_x = -mel.KR_XY * eR_x + mel.KW_XY * ew_x + mel.KI_M_XY * i_m[0] + mel.KD_OMEGA_RP * err_d_roll
        M_y = -mel.KR_XY * eR_y + mel.KW_XY * ew_y + mel.KI_M_XY * i_m[1] + mel.KD_OMEGA_RP * err_d_pitch
        M_z = -mel.KR_Z * eR_z + mel.KW_Z * ew_z + mel.KI_M_Z * i_m[2]

        thrust_out = jnp.where(
            z_disable, sp_thrust, mel.MASS_THRUST * current_thrust
        )
        pos_thrust = thrust_out > 0
        roll_out = jnp.where(pos_thrust, jnp.clip(M_x, -32000.0, 32000.0), 0.0)
        pitch_out = jnp.where(pos_thrust, jnp.clip(M_y, -32000.0, 32000.0), 0.0)
        yaw_out = jnp.where(pos_thrust, jnp.clip(-M_z, -32000.0, 32000.0), 0.0)
        reset_m = ~pos_thrust
        for i in range(3):
            i_ep[i] = jnp.where(reset_m, 0.0, i_ep[i])
            i_m[i] = jnp.where(reset_m, 0.0, i_m[i])

        # gate: hold outputs/integrals when the attitude loop doesn't fire
        def sel(new, old):
            return jnp.where(run, new, old)

        ctl_r = sel(roll_out, st[49])
        ctl_p = sel(pitch_out, st[50])
        ctl_y = sel(yaw_out, st[51])
        ctl_t = sel(thrust_out, st[52])
        i_ep = [sel(i_ep[i], st[39 + i]) for i in range(3)]
        i_m = [sel(i_m[i], st[42 + i]) for i in range(3)]
        new_prev_om_r = sel(om_r, st[45])
        new_prev_om_p = sel(om_p, st[46])
        new_prev_sp_r = sel(sp_om_r, st[47])
        new_prev_sp_p = sel(-sp_om_p, st[48])

        # ---- 6. power distribution + motor pipeline -----------------------
        r2 = ctl_r * 0.5
        p2 = ctl_p * 0.5
        mth = [
            ctl_t - r2 + p2 + ctl_y,
            ctl_t - r2 - p2 - ctl_y,
            ctl_t + r2 - p2 + ctl_y,
            ctl_t + r2 + p2 - ctl_y,
        ]
        # constant-folded voltage curve: vv = clip(v)*(60/65535);
        # pwm = min(volts/3, 1)*65535 with volts = -6.239e-4 vv^2 + 0.088 vv
        k_in = 60.0 / 65535.0
        kq = -0.0006239 * k_in * k_in * (65535.0 / 3.0)
        kl = 0.088 * k_in * (65535.0 / 3.0)
        pwms = []
        for v in mth:
            cl = jnp.clip(v, 0.0, 65535.0)
            pwms.append(jnp.minimum((kq * cl + kl) * cl, 65535.0))
        # tumble kill
        pwms = [jnp.where(tumbled, 0.0, v) for v in pwms]
        # pwm -> rpm -> thrust, reorder [3,2,1,0], -> rpm
        rpms_out = []
        for v in pwms:
            cl = jnp.clip(v, 20000.0, 65535.0)
            rpms_out.append(0.2685 * cl + 4070.3)
        if noise_blk is None and noise is None:
            # noise-free: the thrust round trip rpm -> kf*rpm^2 ->
            # sqrt(thr/kf) -> pwm-clip -> rpm is the identity (rpms_out is
            # already inside the pwm-clip image) — only the [3,2,1,0]
            # reorder survives
            new_rpm = rpms_out[::-1]
        else:
            thr = [kf * r * r for r in rpms_out][::-1]
            if noise_blk is not None:
                for m in range(4):
                    thr[m] = thr[m] + tick_noise[3 + m]
            else:
                # thrust-space action noise, N(0, act_std) per motor per
                # tick (reference MellingerControl:202-253; Box-Muller)
                un = _u01(8)
                for m in range(4):
                    r_bm = jnp.sqrt(
                        -2.0 * jnp.log(jnp.maximum(un[m], 1e-12))
                    )
                    z = r_bm * jnp.cos((2.0 * np.pi) * un[4 + m])
                    thr[m] = thr[m] + act_std * z
            inv_kf = 1.0 / kf
            new_rpm = []
            for t_m in thr:
                mp = (jnp.sqrt(jnp.maximum(t_m, 0.0) * inv_kf) - 4070.3) \
                    * (1.0 / 0.2685)
                mp = jnp.clip(mp, 20000.0, 65535.0)
                new_rpm.append(0.2685 * mp + 4070.3)
        new_rpm = [jnp.where(eliminated, 0.0, r) for r in new_rpm]
        prev_rpms = [jnp.where(eliminated, 0.0, r) for r in rpm]

        new_tick = tick + 1.0
        # reference holds the last-call stamps while tumbling (the tumble
        # path early-returns before the gating bookkeeping)
        new_last_att = jnp.where(att_due & ~tumbled, cur_time, st[55])
        new_last_pos = jnp.where(pos_due & ~tumbled, cur_time, st[54])
        new_err = jnp.where(tumbled, 1.0, st[57])

        dt_ = st[0].dtype  # keep the carry dtype under ambient x64
        return tuple(
            v.astype(dt_) for v in (
                px, py, pz, qx, qy, qz, qw, vx, vy, vz, wx, wy, wz,
                new_rpm[0], new_rpm[1], new_rpm[2], new_rpm[3],
                prev_rpms[0], prev_rpms[1], prev_rpms[2], prev_rpms[3],
                roll, pitch, yaw, vx, vy, vz,
                acc_d1[0], acc_d1[1], acc_d1[2],
                acc_d2[0], acc_d2[1], acc_d2[2],
                gy_d1[0], gy_d1[1], gy_d1[2],
                gy_d2[0], gy_d2[1], gy_d2[2],
                i_ep[0], i_ep[1], i_ep[2],
                i_m[0], i_m[1], i_m[2],
                new_prev_om_r, new_prev_om_p,
                new_prev_sp_r, new_prev_sp_p,
                ctl_r, ctl_p, ctl_y, ctl_t,
                new_tick, new_last_pos, new_last_att, tumble_counter,
                new_err,
            )
        )

    if unroll:
        # full unroll (+26% on TPU: VLIW scheduling across ticks) with the
        # channel rows carried as a tuple — no per-tick (58, T, 128)
        # restack between ticks
        rows = tuple(st[c] for c in range(S_CHANNELS))
        for i in range(n_ticks):
            rows = tick_tuple(i, rows)
        return jnp.stack(rows, axis=0)
    # interpret mode keeps the rolled fori_loop (a 20x smaller graph for
    # the CPU tests); the stack/unstack round trip is bit-transparent
    return jax.lax.fori_loop(
        0, n_ticks,
        lambda i, blk: jnp.stack(
            tick_tuple(i, tuple(blk[c] for c in range(S_CHANNELS))),
            axis=0,
        ),
        st,
    )


def race_window(kf, km, arm, ground_z, state_block, window_block,
                n_ticks: int = 20, dt: float = 1.0 / 500.0,
                interpret: bool = False, noise=None, seed=None,
                noise_rows=None):
    """Run one control step's firmware window. Blocks are channel-major
    (S/W, T, 128) float32.

    ``noise``: optional (act_std, wind_lo(3,), wind_hi(3,)) static floats
    enabling per-tick stochastic disturbances; ``seed`` (int32 scalar or
    (1,) array, may be traced) seeds the in-kernel PRNG per launch.
    ``noise_rows``: optional precomputed (n_ticks, 7, T, 128) additive
    noise block (wind force xyz + per-motor thrust noise) used instead of
    the in-kernel PRNG — required under ``interpret`` (the HLO interpreter
    cannot lower pltpu.prng_*).
    """
    if noise is not None:
        noise = (
            float(noise[0]),
            tuple(float(v) for v in noise[1]),
            tuple(float(v) for v in noise[2]),
        )
    kernel = partial(
        _kernel, n_ticks=n_ticks, dt=float(dt), kf=float(kf), km=float(km),
        arm=float(arm), ground_z=float(ground_z), col_h_half=0.0125,
        noise=noise, noise_rows=noise_rows is not None,
        unroll=not interpret,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = (state_block, window_block)
    if noise is not None and noise_rows is not None:
        in_specs = in_specs + [pl.BlockSpec(memory_space=pltpu.VMEM)]
        args = args + (noise_rows,)
    elif noise is not None:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        args = (jnp.asarray(seed, dtype=jnp.int32).reshape(1),) + args
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(state_block.shape, state_block.dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
