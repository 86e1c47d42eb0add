"""Linear-algebra and Gaussian-divergence utilities.

TPU-native rebuild of the reference's ``fbs/utils.py:7-53``: LTI-SDE
discretisation by matrix fraction decomposition, Hermitian matrix square
root, Bures-Wasserstein distance and Gaussian KL divergence.  All functions
are jit-compatible and work in either f32 or f64.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from fbs_tpu.typing import JArray, FloatScalar

__all__ = ["discretise_lti_sde", "sqrtm", "bures_dist", "kl"]


def discretise_lti_sde(A: JArray, gamma: JArray, dt: FloatScalar) -> Tuple[JArray, JArray]:
    """Exactly discretise the linear time-invariant SDE
    ``dX = A X dt + B dW`` (with ``gamma = B B^T``) into
    ``X_{k+1} = F X_k + w_k, w_k ~ N(0, Q)``.

    Uses the matrix-fraction decomposition: one ``expm`` of the stacked
    ``[[A, gamma], [0, -A^T]]`` block matrix (reference ``fbs/utils.py:7-21``).
    """
    d = A.shape[0]
    F = jax.scipy.linalg.expm(A * dt)
    blk = jnp.block([[A, gamma], [jnp.zeros_like(A), -A.T]])
    AB = jax.scipy.linalg.expm(blk * dt) @ jnp.vstack([jnp.zeros_like(A), jnp.eye(d, dtype=A.dtype)])
    Q = AB[:d, :] @ F.T
    return F, Q


def sqrtm(mat: JArray, method: str = "eigh") -> JArray:
    """Hermitian matrix square root (reference ``fbs/utils.py:24-31``).

    The ``eigh`` route is preferred on TPU: it lowers to a single fused
    eigendecomposition, whereas ``scipy.linalg.sqrtm`` falls back to a host
    Schur decomposition.
    """
    if method == "eigh":
        w, v = jnp.linalg.eigh(mat)
        # Clamp tiny negative eigenvalues arising from round-off.
        w = jnp.maximum(w, 0.0)
        return (v * jnp.sqrt(w)) @ v.T
    return jnp.real(jax.scipy.linalg.sqrtm(mat))


def bures_dist(m0: JArray, cov0: JArray, m1: JArray, cov1: JArray) -> JArray:
    """Squared Bures-Wasserstein (Gaussian W2) distance
    (reference ``fbs/utils.py:34-40``)."""
    s0 = sqrtm(cov0)
    cross = sqrtm(s0 @ cov1 @ s0)
    return jnp.sum((m0 - m1) ** 2) + jnp.trace(cov0 + cov1 - 2.0 * cross)


def _log_det_chol(chol: JArray) -> JArray:
    return 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diag(chol))))


def kl(m0: JArray, cov0: JArray, m1: JArray, cov1: JArray) -> JArray:
    """KL divergence KL(N(m0, cov0) || N(m1, cov1))
    (reference ``fbs/utils.py:43-53``)."""
    d = m0.shape[-1]
    chol0 = jax.scipy.linalg.cho_factor(cov0)
    chol1 = jax.scipy.linalg.cho_factor(cov1)
    dm = m1 - m0
    return (jnp.trace(jax.scipy.linalg.cho_solve(chol1, cov0))
            - d
            + jnp.dot(dm, jax.scipy.linalg.cho_solve(chol1, dm))
            + _log_det_chol(chol1[0]) - _log_det_chol(chol0[0]))
