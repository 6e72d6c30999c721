import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from ov2slam_tpu.utils import lie


def random_poses(rng, n):
    q = Rotation.random(n, random_state=np.random.RandomState(1)).as_quat()
    # scipy gives xyzw; convert to wxyz
    q = np.concatenate([q[:, 3:4], q[:, :3]], axis=1)
    t = rng.normal(size=(n, 3))
    return jnp.asarray(np.concatenate([q, t], axis=1))


def test_quat_matrix_roundtrip(rng):
    T = random_poses(rng, 64)
    q = lie.pose_q(T)
    R = lie.quat_to_matrix(q)
    q2 = lie.matrix_to_quat(R)
    # sign-canonical comparison
    qc = jnp.where(q[..., 0:1] < 0, -q, q)
    np.testing.assert_allclose(np.array(q2), np.array(qc), atol=1e-9)


def test_quat_rotate_matches_matrix(rng):
    T = random_poses(rng, 32)
    v = jnp.asarray(rng.normal(size=(32, 3)))
    r1 = lie.quat_rotate(lie.pose_q(T), v)
    R = lie.quat_to_matrix(lie.pose_q(T))
    r2 = jnp.squeeze(R @ v[..., None], -1)
    np.testing.assert_allclose(np.array(r1), np.array(r2), atol=1e-10)


def test_so3_exp_log_roundtrip(rng):
    w = rng.normal(size=(100, 3))
    # restrict to the principal domain |w| < pi where log is the inverse
    w = w / np.maximum(np.linalg.norm(w, axis=-1, keepdims=True), 1.0) * 0.95 * np.pi
    w = jnp.asarray(np.concatenate(
        [w, [[1e-10, 0, 0], [3.1, 0.0, 0.0], [0.0, 0.0, 0.0]]]))
    q = lie.so3_exp(w)
    w2 = lie.so3_log(q)
    np.testing.assert_allclose(np.array(w2), np.array(w), atol=1e-7)
    # outside the principal domain, exp(log(q)) must still equal q
    wbig = jnp.asarray(rng.normal(size=(50, 3)) * 3.0)
    qb = lie.so3_exp(wbig)
    qb2 = lie.so3_exp(lie.so3_log(qb))
    np.testing.assert_allclose(
        np.array(lie.quat_to_matrix(qb2)),
        np.array(lie.quat_to_matrix(qb)), atol=1e-8)


def test_so3_exp_matches_scipy(rng):
    w = rng.normal(size=(50, 3))
    q = np.array(lie.so3_exp(jnp.asarray(w)))
    R_ours = np.array(lie.quat_to_matrix(q))
    R_scipy = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R_ours, R_scipy, atol=1e-9)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(64, 6))
    # keep rotation part in the principal domain |w| < pi
    w = xi[:, 3:6]
    xi[:, 3:6] = w / np.maximum(
        np.linalg.norm(w, axis=-1, keepdims=True), 1.0) * 0.95 * np.pi
    xi = jnp.asarray(xi)
    T = lie.se3_exp(xi)
    xi2 = lie.se3_log(T)
    np.testing.assert_allclose(np.array(xi2), np.array(xi), atol=1e-8)


def test_pose_compose_inverse(rng):
    Ta = random_poses(rng, 16)
    Tb = random_poses(rng, 16)
    Tab = lie.pose_compose(Ta, Tb)
    Ma = np.array(lie.pose_to_matrix(Ta))
    Mb = np.array(lie.pose_to_matrix(Tb))
    np.testing.assert_allclose(
        np.array(lie.pose_to_matrix(Tab)), Ma @ Mb, atol=1e-9)
    ident = lie.pose_compose(Ta, lie.pose_inverse(Ta))
    np.testing.assert_allclose(
        np.array(lie.pose_t(ident)), np.zeros((16, 3)), atol=1e-9)
    np.testing.assert_allclose(
        np.abs(np.array(lie.pose_q(ident))[:, 0]), np.ones(16), atol=1e-9)


def test_pose_apply(rng):
    T = random_poses(rng, 8)
    p = jnp.asarray(rng.normal(size=(8, 3)))
    out = lie.pose_apply(T, p)
    M = np.array(lie.pose_to_matrix(T))
    expected = np.einsum("nij,nj->ni", M[:, :3, :3], np.array(p)) + M[:, :3, 3]
    np.testing.assert_allclose(np.array(out), expected, atol=1e-9)


def test_left_update_first_order(rng):
    """exp(dx)*T matches the reference's left-parameterization plus."""
    T = random_poses(rng, 4)
    dx = jnp.asarray(rng.normal(size=(4, 6)) * 1e-6)
    T2 = lie.pose_left_update(T, dx)
    # first order: t' ≈ t + dx[:3] + dx[3:] × t ; R' ≈ (I + hat(w)) R
    t, w = np.array(dx[:, :3]), np.array(dx[:, 3:])
    t0 = np.array(lie.pose_t(T))
    expected_t = t0 + t + np.cross(w, t0)
    np.testing.assert_allclose(np.array(lie.pose_t(T2)), expected_t,
                               atol=1e-10)


def test_pose_from_matrix_roundtrip(rng):
    T = random_poses(rng, 32)
    M = lie.pose_to_matrix(T)
    T2 = lie.pose_from_matrix(M)
    Tc = jnp.where(T[..., 0:1] < 0, -jnp.concatenate(
        [T[..., :4], -T[..., 4:]], -1), T)  # only q sign may flip
    np.testing.assert_allclose(
        np.array(lie.pose_to_matrix(T2)), np.array(M), atol=1e-9)
