r"""Pose priors for SMPLify fitting (pure JAX).

Rebuild of the reference's ``net/smplify/prior.py`` (itself from SMPLify-X):
a max-mixture GMM negative log-likelihood over the 69-D body pose
(prior.py:83-214), an elbow/knee hyperextension prior (prior.py:36-72), and
an L2 prior. Loads the reference's ``gmm_08.pkl`` when present; otherwise a
deterministic synthetic mixture keeps the code path exercised.
"""

from __future__ import annotations

import os
import pickle

import jax.numpy as jnp
import numpy as np

__all__ = ["MaxMixturePrior", "angle_prior", "l2_prior"]


def _load_gmm(prior_file: str):
    with open(prior_file, "rb") as f:
        gmm = pickle.load(f, encoding="latin1")
    if isinstance(gmm, dict):
        return (np.asarray(gmm["means"], np.float32),
                np.asarray(gmm["covars"], np.float32),
                np.asarray(gmm["weights"], np.float32))
    return (np.asarray(gmm.means_, np.float32),
            np.asarray(gmm.covars_, np.float32),
            np.asarray(gmm.weights_, np.float32))


def _synthetic_gmm(num_gaussians: int = 8, dim: int = 69, seed: int = 0):
    r"""Deterministic stand-in mixture: small-variance components near the
    rest pose with mild correlations."""
    rng = np.random.RandomState(seed)
    means = rng.normal(0, 0.2, (num_gaussians, dim)).astype(np.float32)
    covs = []
    for _ in range(num_gaussians):
        a = rng.normal(0, 0.05, (dim, dim)).astype(np.float32)
        covs.append(a @ a.T + 0.2 * np.eye(dim, dtype=np.float32))
    weights = rng.dirichlet(np.ones(num_gaussians)).astype(np.float32)
    return means, np.stack(covs), weights


class MaxMixturePrior:
    r"""Min-over-components GMM NLL (prior.py:83-179, merged likelihood).

    nll(pose) = min_k [ 0.5 (pose-mu_k)' P_k (pose-mu_k) - log w'_k ]
    with w'_k = w_k / ((2 pi)^(D/2) * sqrtdet_k / min_j sqrtdet_j).
    """

    def __init__(self, prior_folder: str = "data/dataset_work",
                 num_gaussians: int = 8, epsilon: float = 1e-16):
        path = os.path.join(prior_folder,
                            "gmm_{:02d}.pkl".format(num_gaussians))
        if os.path.exists(path):
            means, covs, weights = _load_gmm(path)
        else:
            means, covs, weights = _synthetic_gmm(num_gaussians)
        self.means = jnp.asarray(means)
        self.precisions = jnp.asarray(
            np.stack([np.linalg.inv(c) for c in covs]).astype(np.float32))
        sqrdets = np.array([np.sqrt(np.linalg.det(c.astype(np.float64)))
                            for c in covs])
        const = (2 * np.pi) ** (means.shape[1] / 2.0)
        nll_weights = weights / (const * (sqrdets / sqrdets.min()))
        self.nll_weights = jnp.asarray(nll_weights.astype(np.float32))

    def __call__(self, pose: jnp.ndarray, betas=None) -> jnp.ndarray:
        r"""pose [B, 69] -> per-sample NLL [B]."""
        diff = pose[:, None, :] - self.means[None]           # [B, K, D]
        quad = jnp.einsum("bkd,kde,bke->bk", diff, self.precisions, diff)
        ll = 0.5 * quad - jnp.log(self.nll_weights)[None]
        return jnp.min(ll, axis=1)


# elbow/knee hyperextension: indices into the 69-D body pose (without global
# rotation) and the bending signs (prior.py:36-72, losses.py:15-21)
_ANGLE_IDX = np.array([55 - 3, 58 - 3, 12 - 3, 15 - 3])
_ANGLE_SIGN = np.array([1.0, -1.0, -1.0, -1.0], np.float32)


def angle_prior(pose: jnp.ndarray) -> jnp.ndarray:
    r"""exp(sign * angle)^2 on knees/elbows; pose [B, 69] -> [B, 4]."""
    return jnp.exp(pose[:, _ANGLE_IDX] * _ANGLE_SIGN) ** 2


def l2_prior(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(x ** 2)
