"""FastICA on TPU: batched blind source separation for the ICA rPPG method.

TPU-native replacement for ``sklearn.decomposition.FastICA`` as configured at
``analysis/measurement/ica.py:36-44`` (3 components, parallel algorithm,
logcosh nonlinearity, max_iter=300, tol=1e-6, unit-variance whitening,
random_state=0).  The per-window solve is a fixed-point iteration under
``lax.while_loop``; whitening uses SVD; symmetric decorrelation uses a
batched 3x3 ``eigh``.  ``vmap`` the public entry point over windows/streams
— the reference runs one FastICA *per frame* (``ica.py:65``), which here
becomes a single batched program over every window at once.

Non-convergence is reported as a boolean instead of a warning so callers can
mask out failed windows (``ica.py:64-69`` skips them).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ICAResult", "fastica", "default_w_init", "ica_sources"]


class ICAResult(NamedTuple):
    sources: jnp.ndarray      # (T, C) estimated independent components
    converged: jnp.ndarray    # () bool — False mirrors ConvergenceWarning
    n_iter: jnp.ndarray       # () int32


def default_w_init(n_components: int, seed: int = 0) -> np.ndarray:
    """The exact ``w_init`` sklearn draws from ``RandomState(seed)``."""
    return np.random.RandomState(seed).normal(
        size=(n_components, n_components))


def _sym_decorrelation(W: jnp.ndarray) -> jnp.ndarray:
    """W <- (W W^T)^{-1/2} W via eigendecomposition (sklearn semantics)."""
    s, u = jnp.linalg.eigh(W @ W.T)
    s = jnp.clip(s, 1e-12, None)
    return (u * (1.0 / jnp.sqrt(s))) @ u.T @ W


def _whiten_unit_variance(X: jnp.ndarray, n_components: int
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """sklearn's SVD whitening: returns (X1, K, mean).

    ``X`` is ``(T, F)`` samples x features; ``X1`` is ``(C, T)`` whitened.
    """
    T = X.shape[0]
    XT = X.T                                   # (F, T)
    mean = jnp.mean(XT, axis=-1, keepdims=True)
    XT = XT - mean
    u, d, _ = jnp.linalg.svd(XT, full_matrices=False)
    #

    u = u * jnp.sign(u[0])                     # sklearn's deterministic sign
    K = (u / d).T[:n_components]               # (C, F)
    X1 = (K @ XT) * jnp.sqrt(jnp.asarray(T, X.dtype))
    return X1, K, mean[:, 0]


def fastica(X: jnp.ndarray,
            w_init: np.ndarray,
            max_iter: int = 300,
            tol: float = 1e-6) -> ICAResult:
    """Run FastICA (parallel / logcosh / unit-variance) on one window.

    Args:
      X: ``(T, F)`` window, samples along axis 0 (the reference feeds
         ``(window, 3)`` per-frame BGR means, std-normalized — ``ica.py:59-65``).
      w_init: ``(C, C)`` unmixing initialization (host numpy; use
         :func:`default_w_init` for sklearn parity).
      max_iter / tol: sklearn-compatible stopping rule.

    Returns:
      :class:`ICAResult` with unit-variance sources shaped ``(T, C)``.
    """
    n_components = w_init.shape[0]
    T = X.shape[0]
    X1, K, _ = _whiten_unit_variance(X, n_components)  # X1: (C, T)
    W0 = _sym_decorrelation(jnp.asarray(w_init, dtype=X.dtype))

    def g_logcosh(wx):
        gx = jnp.tanh(wx)
        g_prime = jnp.mean(1.0 - gx**2, axis=-1)
        return gx, g_prime

    inv_T = 1.0 / T

    def cond(carry):
        _, ii, lim = carry
        return jnp.logical_and(ii < max_iter, lim >= tol)

    def body(carry):
        W, ii, _ = carry
        gwtx, g_wtx = g_logcosh(W @ X1)
        W1 = _sym_decorrelation(gwtx @ X1.T * inv_T - g_wtx[:, None] * W)
        lim = jnp.max(jnp.abs(jnp.abs(jnp.diagonal(W1 @ W.T)) - 1.0))
        return W1, ii + 1, lim

    W, n_iter, lim = jax.lax.while_loop(
        cond, body, (W0, jnp.int32(0), jnp.asarray(jnp.inf, X.dtype)))
    converged = lim < tol

    S = (W @ X1).T / jnp.sqrt(jnp.asarray(T, X.dtype))  # undo sqrt(T) scaling
    # whiten="unit-variance": rescale sources to unit std (ddof=0, sklearn).
    S = S / jnp.std(S, axis=0, keepdims=True)
    return ICAResult(sources=S, converged=converged, n_iter=n_iter)


def ica_sources(windows: jnp.ndarray, w_init: np.ndarray,
                max_iter: int = 300, tol: float = 1e-6) -> ICAResult:
    """Batched FastICA over ``(N, T, F)`` windows via ``vmap``."""
    return jax.vmap(lambda w: fastica(w, w_init, max_iter, tol))(windows)
