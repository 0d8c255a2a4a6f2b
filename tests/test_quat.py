"""Quaternion op tests against scipy.spatial.transform.Rotation.

The reference leans on PyBullet's quaternion helpers and scipy Rotation
(reference DSLPIDControl.py:205-244, BaseAviary.py:522); scipy is the
independent oracle here.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from gym_pybullet_adrp_tpu.ops import quat as q


RNG = np.random.default_rng(0)


def random_quats(n=64):
    quats = RNG.normal(size=(n, 4))
    return quats / np.linalg.norm(quats, axis=-1, keepdims=True)


def test_from_euler_xyz_matches_scipy():
    rpy = RNG.uniform(-np.pi, np.pi, size=(64, 3))
    ours = np.asarray(q.from_euler_xyz(jnp.asarray(rpy)))
    ref = R.from_euler("xyz", rpy).as_quat()  # extrinsic xyz, xyzw
    # sign-insensitive comparison
    sign = np.sign(np.sum(ours * ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(ours, ref * sign, atol=1e-12)


def test_to_euler_xyz_roundtrip():
    quats = random_quats()
    rpy = np.asarray(q.to_euler_xyz(jnp.asarray(quats)))
    ref = R.from_quat(quats).as_euler("xyz")
    np.testing.assert_allclose(rpy, ref, atol=1e-10)


def test_to_matrix_matches_scipy():
    quats = random_quats()
    ours = np.asarray(q.to_matrix(jnp.asarray(quats)))
    ref = R.from_quat(quats).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_from_matrix_roundtrip():
    quats = random_quats()
    mats = R.from_quat(quats).as_matrix()
    ours = np.asarray(q.from_matrix(jnp.asarray(mats)))
    sign = np.sign(np.sum(ours * quats, axis=-1, keepdims=True))
    np.testing.assert_allclose(ours, quats * sign, atol=1e-9)


def test_intrinsic_xyz_euler_matches_scipy():
    rpy = RNG.uniform(-1.2, 1.2, size=(64, 3))
    ours = np.asarray(q.from_euler_intrinsic_xyz(jnp.asarray(rpy)))
    ref = R.from_euler("XYZ", rpy).as_quat()
    sign = np.sign(np.sum(ours * ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(ours, ref * sign, atol=1e-12)

    quats = random_quats()
    ours_e = np.asarray(q.to_euler_intrinsic_xyz(jnp.asarray(quats)))
    ref_e = R.from_quat(quats).as_euler("XYZ")
    np.testing.assert_allclose(ours_e, ref_e, atol=1e-9)


def test_rotate_matches_matrix():
    quats = random_quats()
    v = RNG.normal(size=(64, 3))
    ours = np.asarray(q.rotate(jnp.asarray(quats), jnp.asarray(v)))
    ref = np.einsum("nij,nj->ni", R.from_quat(quats).as_matrix(), v)
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_integrate_body_matches_reference_integrateQ():
    """Closed-form axis-angle update == reference _integrateQ
    (BaseAviary.py:883-896) Lambda-matrix exponential."""

    def reference_integrate(quat, omega, dt):
        omega_norm = np.linalg.norm(omega)
        p, qy, r = omega
        if np.isclose(omega_norm, 0):
            return quat
        lam = (
            np.array(
                [
                    [0, r, -qy, p],
                    [-r, 0, p, qy],
                    [qy, -p, 0, r],
                    [-p, -qy, -r, 0],
                ]
            )
            * 0.5
        )
        theta = omega_norm * dt / 2
        return np.dot(
            np.eye(4) * np.cos(theta) + 2 / omega_norm * lam * np.sin(theta),
            quat,
        )

    for _ in range(32):
        quat = random_quats(1)[0]
        omega = RNG.normal(size=3) * 5
        dt = 1 / 240
        ref = reference_integrate(quat, omega, dt)
        ours = np.asarray(
            q.integrate_body(jnp.asarray(quat), jnp.asarray(omega), dt)
        )
        # XLA CPU's f64 sin/cos carry ~1e-8 error (vectorized poly approx);
        # the algebra is exact (see pure-NumPy cross-check in test history)
        np.testing.assert_allclose(ours, ref, atol=5e-8)

    # omega -> 0 singularity guard
    quat = random_quats(1)[0]
    ours = np.asarray(
        q.integrate_body(jnp.asarray(quat), jnp.zeros(3), 1 / 240)
    )
    np.testing.assert_allclose(ours, quat, atol=0)
