"""Optimal assignment (Hungarian-equivalent) for small tracking problems.

The association problems in this system are tiny — track slots x per-frame
fits, both bounded by ``max_bodies``/``num_objects`` (<= 8 in any real
rig).  At that size the TPU-friendly formulation of min-cost matching is
EXHAUSTIVE: evaluate every permutation of a static table with one einsum
and argmin (8! = 40,320 rows — one small matmul), rather than a
data-dependent augmenting-path loop (scipy's ``linear_sum_assignment``,
the classic Hungarian algorithm) that cannot jit.  Exact optimum, fully
batched, compiles into the per-frame step.

Greedy nearest-neighbour association (the reference's approach,
``computer_code/api/KalmanFilter.py:75-78``) is optimal only when
assignments don't compete; when two tracks approach each other the greedy
order can swap identities that the optimal matching keeps.
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np

MAX_EXACT = 8  # 8! = 40,320 permutations; 9! would be 2.9 MB/row-table


@functools.lru_cache(maxsize=16)
def _perm_table(n: int) -> np.ndarray:
    """(n!, n) int32 table of all permutations of range(n)."""
    return np.asarray(list(itertools.permutations(range(n))), np.int32)


@functools.partial(jax.jit, static_argnames=())
def assign(cost):
    """Min-cost perfect matching on a square (N, N) cost matrix, N <= 8.

    Returns (col_of_row (N,) int32, total_cost ()).  Infeasible pairs
    should carry a LARGE (not inf) cost — inf would poison every
    permutation containing it; use e.g. 1e9 and treat matches above your
    gate as unmatched afterwards.
    """
    N = cost.shape[0]
    if N > MAX_EXACT:
        raise ValueError(f"exact assignment supports N <= {MAX_EXACT}, "
                         f"got {N} (use greedy association above that)")
    perms = jnp.asarray(_perm_table(N))                  # (P, N)
    onehot = jax.nn.one_hot(perms, N, dtype=cost.dtype)  # (P, N, N)
    totals = jnp.einsum("pij,ij->p", onehot, cost)
    best = jnp.argmin(totals)
    return perms[best], totals[best]
