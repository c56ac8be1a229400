"""SO(3)/SE(3) algebra: quaternions, rotation matrices, rotation vectors.

TPU-first replacement for the reference's torch ``rigid_utils`` +
pytorch3d conversions (``openfold/utils/rigid_utils.py``,
``composition.py:3-9``): pure jnp functions, fully vmap/jit-compatible,
batched over arbitrary leading dims. Rigids use the tensor-7 layout
``[qw, qx, qy, qz, tx, ty, tz]`` (quaternion-first, matching the
``rigids_t`` feature convention the protein stack carries).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def quat_normalize(q: Array) -> Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)


def quat_to_rotmat(q: Array) -> Array:
    """Unit quaternion [w,x,y,z] -> rotation matrix (..., 3, 3)."""
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(m: Array) -> Array:
    """Rotation matrix -> unit quaternion [w,x,y,z], branch-free (jit-safe).

    Uses the four-candidate construction: compute all four quaternion
    candidates from the diagonal combinations and select the best-conditioned
    one with ``where`` (no data-dependent Python branching).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def cand(t, a, b, c, d):
        s = jnp.sqrt(jnp.maximum(t, 1e-12)) * 2.0
        return jnp.stack([a(s), b(s), c(s), d(s)], axis=-1), t

    q0, t0 = cand(
        1.0 + tr,
        lambda s: 0.25 * s,
        lambda s: (m21 - m12) / s,
        lambda s: (m02 - m20) / s,
        lambda s: (m10 - m01) / s,
    )
    q1, t1 = cand(
        1.0 + m00 - m11 - m22,
        lambda s: (m21 - m12) / s,
        lambda s: 0.25 * s,
        lambda s: (m01 + m10) / s,
        lambda s: (m02 + m20) / s,
    )
    q2, t2 = cand(
        1.0 - m00 + m11 - m22,
        lambda s: (m02 - m20) / s,
        lambda s: (m01 + m10) / s,
        lambda s: 0.25 * s,
        lambda s: (m12 + m21) / s,
    )
    q3, t3 = cand(
        1.0 - m00 - m11 + m22,
        lambda s: (m10 - m01) / s,
        lambda s: (m02 + m20) / s,
        lambda s: (m12 + m21) / s,
        lambda s: 0.25 * s,
    )
    ts = jnp.stack([t0, t1, t2, t3], axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)
    idx = jnp.argmax(ts, axis=-1)
    q = jnp.take_along_axis(qs, idx[..., None, None], axis=-2).squeeze(-2)
    # canonical sign: w >= 0
    return quat_normalize(q * jnp.where(q[..., :1] < 0, -1.0, 1.0))


def rotvec_to_rotmat(v: Array, eps: float = 1e-8) -> Array:
    """Axis-angle (rotation vector) -> rotation matrix via Rodrigues.

    Gradient-safe at theta=0 (where zero-init update heads live): the
    singular ``sin(theta)/theta`` factors are computed with the double-where
    trick against their Taylor expansions, so both value AND gradient are
    exact and finite at the origin.
    """
    theta2 = jnp.sum(v * v, axis=-1, keepdims=True)
    small = theta2 < eps
    theta2_safe = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(theta2_safe)
    # A = sin(t)/t, B = (1-cos(t))/t^2 with removable singularities
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    kx, ky, kz = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(kx)
    K = jnp.stack([zero, -kz, ky, kz, zero, -kx, -ky, kx, zero], axis=-1)
    K = K.reshape(v.shape[:-1] + (3, 3))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), K.shape)
    return eye + A[..., None] * K + B[..., None] * (K @ K)


def rotmat_to_rotvec(m: Array, eps: float = 1e-12) -> Array:
    """Rotation matrix -> axis-angle via the quaternion logarithm.

    Gradient-safe at the identity (norm(xyz)=0): ``2*atan2(n, w)/n`` has the
    smooth limit ``2/w``; both branches are evaluated on safe inputs via the
    double-where trick.
    """
    q = rotmat_to_quat(m)
    w = q[..., :1]
    xyz = q[..., 1:]
    n2 = jnp.sum(xyz * xyz, axis=-1, keepdims=True)
    small = n2 < eps
    n_safe = jnp.sqrt(jnp.where(small, jnp.ones_like(n2), n2))
    theta = 2.0 * jnp.arctan2(n_safe, w)
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 0.5), theta / n_safe)
    return xyz * scale


def rotvec_compose(a: Array, b: Array) -> Array:
    """Compose rotation vectors: R(out) = R(a) @ R(b) (right-multiply
    convention of the reference's geodesic walk, ``so3_diffuser.py:368-372``)."""
    return rotmat_to_rotvec(rotvec_to_rotmat(a) @ rotvec_to_rotmat(b))


def quat_multiply(a: Array, b: Array) -> Array:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def project_rotmat(m: Array) -> Array:
    """Project a near-rotation matrix onto SO(3) via SVD
    (``composition.py:290-291,711-717``)."""
    u, _, vt = jnp.linalg.svd(m, full_matrices=False)
    det = jnp.linalg.det(u @ vt)
    d = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    return (u * d[..., None, :]) @ vt


# Tensor-7 rigid helpers ------------------------------------------------------


def rigid(quat: Array, trans: Array) -> Array:
    return jnp.concatenate([quat_normalize(quat), trans], axis=-1)


def rigid_quat(r7: Array) -> Array:
    return r7[..., :4]


def rigid_trans(r7: Array) -> Array:
    return r7[..., 4:]


def rigid_rotmat(r7: Array) -> Array:
    return quat_to_rotmat(r7[..., :4])


def rigid_identity(shape, dtype=jnp.float32) -> Array:
    q = jnp.zeros(shape + (4,), dtype).at[..., 0].set(1.0)
    t = jnp.zeros(shape + (3,), dtype)
    return jnp.concatenate([q, t], axis=-1)


def rigid_apply(r7: Array, points: Array) -> Array:
    """Apply the transform to points (..., 3)."""
    return jnp.einsum("...ij,...j->...i", rigid_rotmat(r7), points) + rigid_trans(r7)


def rigid_compose_rotvec(r7: Array, rotvec: Array, dtrans: Array) -> Array:
    """Right-compose a rotation-vector update and add a translation delta."""
    rot = rigid_rotmat(r7) @ rotvec_to_rotmat(rotvec)
    return rigid(rotmat_to_quat(rot), rigid_trans(r7) + dtrans)


def rigid_compose_q_update(r7: Array, update6: Array, mask: Array) -> Array:
    """AF2 backbone update (openfold ``Rigid.compose_q_update_vec``,
    ``rigid_utils.py:1039-1063``): ``update6[..., :3]`` are the (x, y, z) of a
    non-unit quaternion update (1, x, y, z) composed on the right of the
    current rotation; ``update6[..., 3:]`` is a translation delta expressed in
    the local frame. ``mask`` (..., 1) gates both deltas (fixed residues)."""
    q_vec, t_vec = update6[..., :3], update6[..., 3:]
    quats = rigid_quat(r7)
    zero = jnp.zeros_like(q_vec[..., :1])
    quat_update = quat_multiply(quats, jnp.concatenate([zero, q_vec], axis=-1))
    new_quats = quat_normalize(quats + quat_update * mask)
    trans_update = jnp.einsum("...ij,...j->...i", rigid_rotmat(r7), t_vec)
    new_trans = rigid_trans(r7) + trans_update * mask
    return jnp.concatenate([new_quats, new_trans], axis=-1)
