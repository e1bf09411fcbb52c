"""Small dense linear algebra, unrolled for static tiny sizes.

The reference leans on Eigen (SURVEY.md §2.4 L0) for n<=30 dense factorizations
inside the constraint solver.  Under vmap on TPU, generic LAPACK-style
routines with pivoting are hostile to batching, so we unroll Cholesky at
trace time over the static size: every scalar op becomes one fused
elementwise op over the env batch axis (VPU-friendly), with no control flow.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


# above this size, unrolled graphs bloat compile time; XLA's blocked
# implementations are compile-size O(1) and batch fine
_UNROLL_MAX = 12


def chol(A, eps: float = 0.0):
    """Cholesky factor L (lower) of SPD A.

    A: (..., n, n).  `eps` is added to the diagonal (regularization / CFM).
    Small n: trace-time unrolled (pure elementwise ops over the env batch);
    large n: `jnp.linalg.cholesky` (blocked, compile-size O(1)).
    """
    n = A.shape[-1]
    if n > _UNROLL_MAX:
        eye = jnp.eye(n, dtype=A.dtype)
        # relative jitter in f32: guards PSD-ness against rounding in the
        # batched assembly (the unrolled path guards via max(s, tiny))
        rel = 1e-6 if A.dtype == jnp.float32 else 0.0
        scale = jnp.mean(jnp.diagonal(A, axis1=-2, axis2=-1), axis=-1)
        return jnp.linalg.cholesky(
            A + (eps + rel * scale)[..., None, None] * eye
        )
    rows = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[..., i, j]
            if j == i:
                s = s + eps
            for k in range(j):
                s = s - rows[i][k] * rows[j][k]
            if i == j:
                rows[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                rows[i][j] = s / rows[j][j]
    zero = jnp.zeros_like(A[..., 0, 0])
    full = [
        jnp.stack([rows[i][j] if j <= i else zero for j in range(n)], axis=-1)
        for i in range(n)
    ]
    return jnp.stack(full, axis=-2)


def chol_solve(L, b):
    """Solve (L L^T) x = b with unrolled forward/back substitution.

    L: (..., n, n) lower, b: (..., n) or (..., n, m).
    """
    n = L.shape[-1]
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    if n > _UNROLL_MAX:
        y = jax.lax.linalg.triangular_solve(
            L, b, left_side=True, lower=True, transpose_a=False
        )
        x = jax.lax.linalg.triangular_solve(
            L, y, left_side=True, lower=True, transpose_a=True
        )
        return x[..., 0] if vec else x
    # forward: L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i, :]
        for k in range(i):
            s = s - L[..., i, k, None] * y[k]
        y[i] = s / L[..., i, i, None]
    # backward: L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[..., k, i, None] * x[k]
        x[i] = s / L[..., i, i, None]
    out = jnp.stack(x, axis=-2)
    return out[..., 0] if vec else out


def solve_psd(A, b, eps: float = 0.0):
    """Solve A x = b for SPD A via unrolled Cholesky."""
    return chol_solve(chol(A, eps=eps), b)
