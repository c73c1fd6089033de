"""Rotation parameterisations: rotation-vector (axis-angle) <-> matrix.

The reference uses ``scipy.spatial.transform.Rotation`` for the bundle
adjustment parameterisation (``computer_code/api/helpers.py:258,281``).
Here the same maps are written as pure, differentiable JAX functions so the
bundle-adjustment solver can run jitted/vmapped on TPU and be differentiated
with ``jax.jacfwd``.

All functions are branch-free: the small-angle limit is handled with a
Taylor-safe formulation instead of data-dependent control flow, so the
kernels trace cleanly under ``jit`` and are numerically safe at theta -> 0.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def _sinc(x):
    """sin(x)/x, safe at 0 (exact Taylor fallback via where-trick)."""
    safe = jnp.where(jnp.abs(x) < 1e-6, 1.0, x)
    return jnp.where(jnp.abs(x) < 1e-6, 1.0 - x * x / 6.0, jnp.sin(safe) / safe)


def _cosc(x):
    """(1 - cos(x)) / x**2, safe at 0."""
    safe = jnp.where(jnp.abs(x) < 1e-6, 1.0, x)
    return jnp.where(
        jnp.abs(x) < 1e-6, 0.5 - x * x / 24.0, (1.0 - jnp.cos(safe)) / (safe * safe)
    )


def hat(v):
    """Skew-symmetric cross-product matrix [v]_x of a 3-vector (… , 3)."""
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def rotvec_to_matrix(rvec):
    """Rodrigues: (…, 3) rotation vector -> (…, 3, 3) rotation matrix.

    R = I + sinc(θ)·[v]x + cosc(θ)·[v]x².  Matches
    ``Rotation.from_rotvec(...).as_matrix()`` (used at
    ``computer_code/api/helpers.py:258``).
    """
    # NOT jnp.linalg.norm: d(sqrt(x))/dx at x=0 is inf, so the Jacobian of
    # an exactly-zero rotvec (identity pose — e.g. a solver's placeholder
    # view) would be NaN.  The max-clamped sqrt has zero gradient through
    # the clamp, and _sinc/_cosc are locally constant at 0, so dR = hat(dv)
    # comes out exact.
    sq = jnp.sum(rvec * rvec, axis=-1, keepdims=True)[..., None]  # (...,1,1)
    theta = jnp.sqrt(jnp.maximum(sq, _EPS * _EPS))
    V = hat(rvec)
    V2 = V @ V
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), V.shape)
    return eye + _sinc(theta) * V + _cosc(theta) * V2


def matrix_to_rotvec(R):
    """(…, 3, 3) rotation matrix -> (…, 3) rotation vector.

    Branch-free log map, robust near θ=0 and θ=π. Matches
    ``Rotation.from_matrix(...).as_rotvec()`` (used at
    ``computer_code/api/helpers.py:281``).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)  # [0, pi]

    # Antisymmetric part gives axis*sin(theta)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )  # = 2 sin(theta) * axis

    # Generic case: rvec = theta/(2 sin(theta)) * w ; near 0 -> w/2
    s = _sinc(theta)[..., None]  # sin(theta)/theta
    generic = w / (2.0 * jnp.maximum(s, _EPS))

    # Near theta = pi: axis from diagonal of (R + I)/2 = aa^T formulation
    B = (R + jnp.eye(3, dtype=R.dtype)) / 2.0
    diag = jnp.clip(jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], axis=-1), 0.0, None)
    axis_pi = jnp.sqrt(diag)
    # fix signs using off-diagonals relative to the largest component
    k = jnp.argmax(axis_pi, axis=-1)

    def _signed(axis_pi, B, k):
        # B[k, j] = a_k * a_j with a_k > 0 chosen, so sign(a_j) = sign(B[k, j]).
        row = B[k]
        return axis_pi * jnp.where(row < 0, -1.0, 1.0)

    if R.ndim == 2:
        axis_signed = _signed(axis_pi, B, k)
    else:
        import jax

        flatB = B.reshape((-1, 3, 3))
        flata = axis_pi.reshape((-1, 3))
        flatk = k.reshape((-1,))
        axis_signed = jax.vmap(_signed)(flata, flatB, flatk).reshape(axis_pi.shape)

    near_pi = (jnp.pi - theta) < 1e-3
    axis_norm = axis_signed / jnp.maximum(
        jnp.linalg.norm(axis_signed, axis=-1, keepdims=True), _EPS
    )
    rvec_pi = axis_norm * theta[..., None]
    return jnp.where(near_pi[..., None], rvec_pi, generic)


def _quat_to_matrix(xp, q):
    """Shared formula; ``xp`` is jnp (traced) or numpy (host-side)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rows = [
        xp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                  2 * (x * z + w * y)], axis=-1),
        xp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                  2 * (y * z - w * x)], axis=-1),
        xp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                  1 - 2 * (x * x + y * y)], axis=-1),
    ]
    return xp.stack(rows, axis=-2)


def quat_to_matrix(q):
    """(..., 4) unit quaternion (w, x, y, z) -> (..., 3, 3), jax."""
    return _quat_to_matrix(jnp, q)


def quat_to_matrix_np(q):
    """numpy variant for host-side consumers (no device dispatch)."""
    import numpy as np

    return _quat_to_matrix(np, np.asarray(q))


def matrix_to_quat(R):
    """(..., 3, 3) rotation -> (..., 4) unit quaternion (w, x, y, z).

    Branchless Shepperd: build all four case constructions, pick the one
    keyed by the largest of (trace, R00, R11, R22) — numerically safe for
    every rotation, no data-dependent control flow.
    """
    r = lambda i, j: R[..., i, j]
    tr = r(0, 0) + r(1, 1) + r(2, 2)
    # candidate squared magnitudes (all >= 0 up to rounding)
    m = jnp.stack([1.0 + tr,
                   1.0 + r(0, 0) - r(1, 1) - r(2, 2),
                   1.0 - r(0, 0) + r(1, 1) - r(2, 2),
                   1.0 - r(0, 0) - r(1, 1) + r(2, 2)], axis=-1)
    k = jnp.argmax(m, axis=-1)
    s = 2.0 * jnp.sqrt(jnp.maximum(
        jnp.take_along_axis(m, k[..., None], axis=-1)[..., 0], 1e-12))
    q_w = jnp.stack([0.25 * s, (r(2, 1) - r(1, 2)) / s,
                     (r(0, 2) - r(2, 0)) / s, (r(1, 0) - r(0, 1)) / s],
                    axis=-1)
    q_x = jnp.stack([(r(2, 1) - r(1, 2)) / s, 0.25 * s,
                     (r(0, 1) + r(1, 0)) / s, (r(0, 2) + r(2, 0)) / s],
                    axis=-1)
    q_y = jnp.stack([(r(0, 2) - r(2, 0)) / s, (r(0, 1) + r(1, 0)) / s,
                     0.25 * s, (r(1, 2) + r(2, 1)) / s], axis=-1)
    q_z = jnp.stack([(r(1, 0) - r(0, 1)) / s, (r(0, 2) + r(2, 0)) / s,
                     (r(1, 2) + r(2, 1)) / s, 0.25 * s], axis=-1)
    q = jnp.select([k[..., None] == 0, k[..., None] == 1,
                    k[..., None] == 2], [q_w, q_x, q_y], q_z)
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, 1e-12)
