"""Quaternion / rotation ops, xyzw convention (PyBullet-compatible).

These are the TPU-native replacements for the PyBullet quaternion utilities the
reference calls across the FFI boundary every tick
(``p.getMatrixFromQuaternion`` / ``p.getEulerFromQuaternion`` /
``p.getQuaternionFromEuler``, reference BaseAviary.py:522, 596, 843) and for
``scipy.spatial.transform.Rotation`` uses in the controllers
(DSLPIDControl.py:205-244).

All functions are pure, dtype-polymorphic, and broadcast over leading batch
axes — trailing axis is the vector/quaternion dimension. Everything here is
trivially ``vmap``-able and fuses into the surrounding XLA graph.
"""

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# conversions


def from_euler_xyz(rpy):
    """Euler XYZ (roll, pitch, yaw; extrinsic x-y-z, PyBullet convention) -> quat xyzw.

    Matches ``p.getQuaternionFromEuler`` and the reference's
    ``get_quaternion_from_euler`` (utils/utils.py:20-43).
    """
    roll, pitch, yaw = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    qx = sr * cp * cy - cr * sp * sy
    qy = cr * sp * cy + sr * cp * sy
    qz = cr * cp * sy - sr * sp * cy
    qw = cr * cp * cy + sr * sp * sy
    return jnp.stack([qx, qy, qz, qw], axis=-1)


def to_euler_xyz(q):
    """Quat xyzw -> Euler XYZ (roll, pitch, yaw), PyBullet convention.

    Matches ``p.getEulerFromQuaternion`` (extrinsic x-y-z / intrinsic Z-Y'-X'').
    """
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # roll (x-axis rotation)
    sinr_cosp = 2.0 * (w * x + y * z)
    cosr_cosp = 1.0 - 2.0 * (x * x + y * y)
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)
    # pitch (y-axis rotation), clamped for numerical safety at the poles
    sinp = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    # yaw (z-axis rotation)
    siny_cosp = 2.0 * (w * z + x * y)
    cosy_cosp = 1.0 - 2.0 * (y * y + z * z)
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def to_matrix(q):
    """Quat xyzw -> 3x3 rotation matrix (matches ``p.getMatrixFromQuaternion``)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def from_matrix(m):
    """3x3 rotation matrix -> quat xyzw (Shepperd's branchless method).

    Replacement for ``scipy Rotation.from_matrix(...).as_quat()``
    (reference DSLPIDControl.py:205).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate constructions; pick the numerically best via where-chains
    # (branchless: all four are computed, XLA fuses this into a tiny kernel)
    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-20))

    q_w = jnp.stack(
        [m21 - m12, m02 - m20, m10 - m01, 1.0 + tr], axis=-1
    ) / (2.0 * safe_sqrt(1.0 + tr))[..., None]
    q_x = jnp.stack(
        [1.0 + m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12], axis=-1
    ) / (2.0 * safe_sqrt(1.0 + m00 - m11 - m22))[..., None]
    q_y = jnp.stack(
        [m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21, m02 - m20], axis=-1
    ) / (2.0 * safe_sqrt(1.0 - m00 + m11 - m22))[..., None]
    q_z = jnp.stack(
        [m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22, m10 - m01], axis=-1
    ) / (2.0 * safe_sqrt(1.0 - m00 - m11 + m22))[..., None]

    use_w = (tr > m00) & (tr > m11) & (tr > m22)
    use_x = (m00 >= m11) & (m00 >= m22) & ~use_w
    use_y = (m11 > m22) & ~use_w & ~use_x
    q = jnp.where(
        use_w[..., None], q_w,
        jnp.where(use_x[..., None], q_x, jnp.where(use_y[..., None], q_y, q_z)),
    )
    return normalize(q)


def from_euler_intrinsic_xyz(rpy):
    """Intrinsic-XYZ Euler -> quat xyzw.

    Replacement for ``scipy Rotation.from_euler('XYZ', ...)`` used by the DSL
    PID attitude loop (reference DSLPIDControl.py:242). Intrinsic XYZ equals
    extrinsic zyx composition: q = qx ⊗ qy ⊗ qz applied right-to-left.
    """
    half = rpy * 0.5
    cx, sx = jnp.cos(half[..., 0]), jnp.sin(half[..., 0])
    cy, sy = jnp.cos(half[..., 1]), jnp.sin(half[..., 1])
    cz, sz = jnp.cos(half[..., 2]), jnp.sin(half[..., 2])
    # q = Rx * Ry * Rz (intrinsic XYZ)
    qw = cx * cy * cz - sx * sy * sz
    qx = sx * cy * cz + cx * sy * sz
    qy = cx * sy * cz - sx * cy * sz
    qz = cx * cy * sz + sx * sy * cz
    return jnp.stack([qx, qy, qz, qw], axis=-1)


def to_euler_intrinsic_xyz(q):
    """Quat xyzw -> intrinsic-XYZ Euler angles.

    Replacement for ``scipy Rotation.as_euler('XYZ')``
    (reference DSLPIDControl.py:205). For R = Rx(a)Ry(b)Rz(c):
    b = asin(R02), a = atan2(-R12, R22), c = atan2(-R01, R00).
    """
    m = to_matrix(q)
    b = jnp.arcsin(jnp.clip(m[..., 0, 2], -1.0, 1.0))
    a = jnp.arctan2(-m[..., 1, 2], m[..., 2, 2])
    c = jnp.arctan2(-m[..., 0, 1], m[..., 0, 0])
    return jnp.stack([a, b, c], axis=-1)


# ---------------------------------------------------------------------------
# algebra


def multiply(q1, q2):
    """Hamilton product q1 ⊗ q2, xyzw."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def conjugate(q):
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q (apply R(q) @ v), xyzw."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def rotate_inv(q, v):
    """Rotate v by the inverse of q (apply R(q)^T @ v)."""
    return rotate(conjugate(q), v)


# ---------------------------------------------------------------------------
# integration


def integrate_body(q, omega_body, dt):
    """Integrate quat with body-frame angular velocity over dt.

    Exact closed-form (axis-angle) update, numerically identical to the
    reference's ``BaseAviary._integrateQ`` (BaseAviary.py:883-896): its
    Lambda-matrix exponential is the body-frame (right-multiply) quaternion
    update. Guards the omega->0 singularity with the DOUBLE-where pattern:
    the norm is clamped BEFORE the sqrt/division so the discarded branch's
    cotangents stay finite — a single where would forward correctly but
    backprop NaN at omega = 0 (the sim is advertised differentiable,
    tests/test_diff.py).
    """
    norm2 = jnp.sum(omega_body * omega_body, axis=-1, keepdims=True)
    small = norm2 <= 1e-16  # == (norm <= 1e-8), the reference's atol
    norm = jnp.sqrt(jnp.where(small, 1.0, norm2))
    theta = jnp.where(small, 0.0, norm) * dt * 0.5
    axis = omega_body / norm
    dq = jnp.concatenate([axis * jnp.sin(theta), jnp.cos(theta)], axis=-1)
    out = multiply(q, dq)
    # reference returns q unchanged when ||omega|| ~ 0 (np.isclose default atol 1e-8)
    return jnp.where(small, q, out)


def integrate_world(q, omega_world, dt):
    """Integrate quat with world-frame angular velocity over dt (left multiply).

    This is the PyBullet-style update used by the PYB physics pipeline.
    Autodiff-safe at omega = 0 via the double-where pattern (see
    :func:`integrate_body`).
    """
    norm2 = jnp.sum(omega_world * omega_world, axis=-1, keepdims=True)
    small = norm2 <= 1e-16
    norm = jnp.sqrt(jnp.where(small, 1.0, norm2))
    theta = jnp.where(small, 0.0, norm) * dt * 0.5
    axis = omega_world / norm
    dq = jnp.concatenate([axis * jnp.sin(theta), jnp.cos(theta)], axis=-1)
    out = multiply(dq, q)
    return jnp.where(small, q, out)
