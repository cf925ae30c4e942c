"""UV confidence losses (reference projects/DensePose/densepose/modeling/
losses/chart_with_confidences.py; Neverova et al., "Correlated Uncertainty
for Learning Dense Correspondences from Noisy Labels", NeurIPS 2019).

Both losses are elementwise negative log likelihoods with per-point validity
weights (the fixed-shape counterpart of the reference's point-list sums).
"""

import math

import jax
import jax.numpy as jnp

__all__ = ["iid_isotropic_gaussian_uv_loss", "indep_anisotropic_gaussian_uv_loss"]

_LOG2PI = math.log(2.0 * math.pi)


def iid_isotropic_gaussian_uv_loss(
    u: jnp.ndarray,
    v: jnp.ndarray,
    sigma_u: jnp.ndarray,
    target_u: jnp.ndarray,
    target_v: jnp.ndarray,
    weights: jnp.ndarray,
    sigma_lower_bound: float = 0.01,
) -> jnp.ndarray:
    """NLL for iid residuals with isotropic covariance sigma^2 I
    (reference chart_with_confidences.py:121-156):
        1/2 (log 2pi + 2 log sigma^2 + ||delta||^2 / sigma^2)
    """
    sigma2 = jax.nn.softplus(sigma_u) + sigma_lower_bound
    delta2 = (u - target_u) ** 2 + (v - target_v) ** 2
    loss = 0.5 * (_LOG2PI + 2.0 * jnp.log(sigma2) + delta2 / sigma2)
    return (loss * weights).sum() / jnp.maximum(weights.sum(), 1.0)


def indep_anisotropic_gaussian_uv_loss(
    u: jnp.ndarray,
    v: jnp.ndarray,
    sigma_u: jnp.ndarray,
    kappa_u: jnp.ndarray,
    kappa_v: jnp.ndarray,
    target_u: jnp.ndarray,
    target_v: jnp.ndarray,
    weights: jnp.ndarray,
    sigma_lower_bound: float = 0.01,
) -> jnp.ndarray:
    """NLL for independent residuals with anisotropic covariance
    sigma^2 I + r r^T (reference chart_with_confidences.py:159-222):
        1/2 (log 2pi + log(sigma^2 (sigma^2 + ||r||^2))
             + ||delta||^2 / sigma^2
             - <delta, r>^2 / (sigma^2 (sigma^2 + ||r||^2)))
    """
    sigma2 = jax.nn.softplus(sigma_u) + sigma_lower_bound
    r2 = kappa_u**2 + kappa_v**2
    du = u - target_u
    dv = v - target_v
    delta2 = du**2 + dv**2
    dr = du * kappa_u + dv * kappa_v
    denom2 = sigma2 * (sigma2 + r2)
    loss = 0.5 * (
        _LOG2PI + jnp.log(denom2) + delta2 / sigma2 - dr**2 / denom2
    )
    return (loss * weights).sum() / jnp.maximum(weights.sum(), 1.0)
