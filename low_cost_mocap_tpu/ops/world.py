"""World-frame tools: camera->world transform, floor fit, origin, scale.

Rebuilds the reference's world-frame handling:
  - the per-point camera->world conversion applied in the hot loop
    (``computer_code/api/helpers.py:97-103``), including the
    ``[[-1,0,0],[0,-1,0],[0,0,1]]`` flip and the y/z swap — reference frame
    conventions preserved bit-for-bit so trajectories are comparable;
  - ``acquire-floor``: least-squares plane fit + rotation aligning the floor
    normal to +z (``computer_code/api/index.py:158-194``), including the
    trailing ``diag(1,-1,1)`` quirk (``index.py:190``);
  - ``set-origin``: translation update (``computer_code/api/index.py:197-210``);
  - ``determine-scale``: metric scale from the 0.15 m wand
    (``computer_code/api/index.py:290-309``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

def to_world(points, to_world_matrix):
    """Apply the reference's camera-frame -> world-frame conversion.

    points: (..., 3) triangulated points (camera-0 frame);
    to_world_matrix: (4, 4).
    Exactly ``computer_code/api/helpers.py:97-103``: flip, homogenise,
    multiply, dehomogenise, swap y/z.

    Precision note: this sits on the METRIC output path — the flip is a
    sign change done elementwise (no matmul, exact), and the 4x4 world
    multiply forces full-f32 accumulation.  Under the TPU's DEFAULT
    matmul precision the bf16 input truncation here cost ~1 mm of
    on-chip accuracy (~0.5 m positions x 2^-9), measured with the
    on-chip vs-reference differential.
    """
    p = points * jnp.asarray([-1.0, -1.0, 1.0], points.dtype)  # FLIP, exact
    ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
    w = jnp.einsum("...j,ij->...i", ph, to_world_matrix.astype(points.dtype),
                   precision=jax.lax.Precision.HIGHEST)
    w = w[..., :3] / w[..., 3:4]
    return w[..., [0, 2, 1]]  # swap y and z (helpers.py:102)


def fit_floor(object_points, to_world_matrix):
    """Update the to-world matrix so the marker-cloud plane becomes level.

    object_points: (N, 3) collected *world-frame* points lying on the floor
    (outputs of ``to_world`` under the current matrix, display convention:
    height = component 1); to_world_matrix: (4, 4) current matrix.
    Returns the new (4, 4) matrix.

    Replaces ``acquire_floor`` (``computer_code/api/index.py:158-194``).
    Deliberate divergence, documented: the reference fits the plane in the
    post-swap (display) frame but applies the resulting rotation in the
    pre-swap frame and patches the mismatch with a ``diag(1,-1,1)`` it
    annotates "i dont fucking know why" (``index.py:190``) — empirically
    that only levels the floor near its hand-tuned default matrix.  Here the
    leveling rotation is derived and applied consistently in the pre-swap
    frame and COMPOSED onto the current matrix (like ``set-origin`` does,
    ``index.py:207``), which levels the floor for any rig.
    """
    dtype = object_points.dtype
    # pre-swap frame: q = swap(world); height axis is q[2]
    q = object_points[:, jnp.array([0, 2, 1])]
    A = jnp.stack([q[:, 0], q[:, 1], jnp.ones_like(q[:, 0])], axis=-1)
    fit, *_ = jnp.linalg.lstsq(A, q[:, 2:3], rcond=None)
    a, b = fit[0, 0], fit[1, 0]
    n = jnp.array([-a, -b, 1.0], dtype)
    n = n / jnp.linalg.norm(n)
    up = jnp.array([0.0, 0.0, 1.0], dtype)
    # Rodrigues rotation taking n -> up (n is within ~90° of up by design)
    v = jnp.cross(n, up)
    s2 = jnp.sum(v * v)
    c = jnp.dot(n, up)
    from low_cost_mocap_tpu.ops.rotations import hat

    V = hat(v)
    R = (
        jnp.eye(3, dtype=dtype)
        + V
        + V @ V * (1.0 - c) / jnp.maximum(s2, 1e-12)
    )
    R = jnp.where(s2 < 1e-12, jnp.eye(3, dtype=dtype), R)
    T = jnp.eye(4, dtype=dtype)
    T = T.at[:3, :3].set(R)
    return T @ to_world_matrix.astype(dtype)


def set_origin(object_point, to_world_matrix):
    """Shift the world origin to ``object_point``.

    Matches ``computer_code/api/index.py:197-210`` including the y/z swap of
    the clicked point (``index.py:204``).
    """
    p = object_point[jnp.array([0, 2, 1])]
    T = jnp.eye(4, dtype=to_world_matrix.dtype)
    T = T.at[:3, 3].set(-p)
    return T @ to_world_matrix


def determine_scale(pair_points, ts, wand_length: float = 0.15):
    """Metric scale factor from observed wand marker pairs.

    pair_points: (F, 2, 3) — two wand markers over F frames;
    ts: (C, 3) camera translations to rescale.
    Returns (scale_factor, scaled_ts), matching
    ``computer_code/api/index.py:290-309``.
    """
    d = jnp.linalg.norm(pair_points[:, 0] - pair_points[:, 1], axis=-1)
    scale = wand_length / jnp.mean(d)
    return scale, ts * scale
