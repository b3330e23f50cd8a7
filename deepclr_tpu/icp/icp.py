"""Classic ICP registration baselines, jax-native.

Replaces the reference's Open3D / GICP-extension baselines
(/root/reference/deepclr/icp/icp.py:11-65) with fixed-shape, masked XLA
implementations that run on TPU (or CPU):

  * ICP_PO2PO — point-to-point ICP (nearest-neighbor correspondences +
    weighted Kabsch/SVD update),
  * ICP_PO2PL — point-to-plane ICP (target normals from k-NN PCA, linearized
    6-DoF Gauss-Newton step),
  * GICP      — Segal generalized (plane-to-plane) ICP: per-point regularized
    covariances, Mahalanobis-weighted Gauss-Newton.

All variants iterate until the parameter update falls below ``epsilon``
or ``max_iterations`` is reached (lax.while_loop), mirroring the reference
GICP's convergence contract (gicp_binding.cpp: epsilon=1e-3, max 100 outer
iterations), with ``max_distance`` correspondence gating;
``register(template, source)`` returns the 4x4 transform mapping source
into the template frame (``return_info=True`` adds iteration count and the
final update magnitude).

Clouds are padded to power-of-two sizes (min 1024), so ``_icp_core``
recompiles at most once per pow2 bucket, not per cloud size.
"""
from __future__ import annotations

import enum
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import se3
from ..ops import knn

__all__ = ["ICPAlgorithm", "ICPRegistration", "estimate_normals",
           "estimate_covariances"]


class ICPAlgorithm(enum.Enum):
    ICP_PO2PO = "icp_po2po"
    ICP_PO2PL = "icp_po2pl"
    GICP = "gicp"

    @classmethod
    def create(cls, value) -> "ICPAlgorithm":
        if isinstance(value, cls):
            return value
        return cls(str(value).lower())


def _neighborhood_cov(points, mask, k: int):
    """k-NN covariance matrices per point: (N,3,3), plus neighborhood means."""
    idx, _ = knn(points[None], points[None], k, points_mask=mask[None])
    nbrs = jnp.take_along_axis(
        points[None], idx.reshape(1, -1, 1), axis=1
    ).reshape(points.shape[0], k, 3)
    mean = jnp.mean(nbrs, axis=1)
    centered = nbrs - mean[:, None, :]
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / k
    return cov, mean


@partial(jax.jit, static_argnames=("k",))
def estimate_normals(points, mask, k: int = 30):
    """Per-point normals: smallest-eigenvector of the k-NN covariance."""
    cov, _ = _neighborhood_cov(points, mask, k)
    _, vecs = jnp.linalg.eigh(cov)  # ascending eigenvalues
    return vecs[:, :, 0]  # (N, 3)


@partial(jax.jit, static_argnames=("k",))
def estimate_covariances(points, mask, k: int = 20, epsilon: float = 1e-3):
    """GICP regularized covariances: eigenvalues flattened to (eps, 1, 1)."""
    cov, _ = _neighborhood_cov(points, mask, k)
    _, vecs = jnp.linalg.eigh(cov)
    lam = jnp.diag(jnp.asarray([epsilon, 1.0, 1.0]))
    return jnp.einsum("nij,jk,nlk->nil", vecs, lam, vecs)


def _skew(v):
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
    ], axis=-2)


def _se3_exp(xi):
    """First-order-safe se(3) exponential: xi = [omega(3), v(3)] -> 4x4."""
    omega, v = xi[:3], xi[3:]
    theta = jnp.linalg.norm(omega) + 1e-12
    k = omega / theta
    K = _skew(k)
    s, c = jnp.sin(theta), jnp.cos(theta)
    R = jnp.eye(3) + s * K + (1 - c) * (K @ K)
    V = (
        jnp.eye(3)
        + (1 - c) / theta * K
        + (theta - s) / theta * (K @ K)
    )
    return se3.make_transform(R, V @ v)


def _correspondences(src, template, template_mask, max_distance):
    idx, d2 = knn(src[None], template[None], 1, points_mask=template_mask[None])
    idx = idx[0, :, 0]
    d2 = d2[0, :, 0]
    tgt = template[idx]
    w = (d2 < max_distance * max_distance).astype(jnp.float32)
    return tgt, idx, w


def _icp_po2po_step(src0, src_mask, template, template_mask, transform,
                    max_distance):
    src = se3.transform_points(transform, src0[None])[0]
    tgt, _, w = _correspondences(src, template, template_mask, max_distance)
    w = w * src_mask
    wsum = jnp.sum(w) + 1e-8
    cs = jnp.sum(src * w[:, None], axis=0) / wsum
    ct = jnp.sum(tgt * w[:, None], axis=0) / wsum
    H = jnp.einsum("n,ni,nj->ij", w, src - cs, tgt - ct)
    u, _, vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(vt.T @ u.T))
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0]) * jnp.asarray([1.0, 1.0, d]))
    R = vt.T @ D @ u.T
    t = ct - R @ cs
    delta = se3.make_transform(R, t)
    return delta @ transform


def _gauss_newton_step(src0, src_mask, template, template_mask, transform,
                       max_distance, row_mats, residual_weight_fn):
    """Shared linearized step: minimize sum w * ||L_i (R s + t - q_i)||^2."""
    src = se3.transform_points(transform, src0[None])[0]
    tgt, idx, w = _correspondences(src, template, template_mask, max_distance)
    w = w * src_mask

    L = residual_weight_fn(src, tgt, idx, transform)  # (N, 3, 3) weights
    d = src - tgt  # residual BEFORE the increment (N, 3)

    # Jacobian of (R_inc s' + t_inc - q) wrt xi=[omega, v] at identity:
    # J = [ -skew(s'), I ]  (N, 3, 6)
    J = jnp.concatenate([-_skew(src), jnp.broadcast_to(
        jnp.eye(3), (src.shape[0], 3, 3)
    )], axis=-1)

    LJ = jnp.einsum("nij,njk->nik", L, J)
    Ld = jnp.einsum("nij,nj->ni", L, d)
    A = jnp.einsum("n,nik,nil->kl", w, LJ, LJ)
    b = jnp.einsum("n,nik,ni->k", w, LJ, Ld)
    xi = -jnp.linalg.solve(A + 1e-6 * jnp.eye(6), b)
    return _se3_exp(xi) @ transform


@partial(jax.jit, static_argnames=("algorithm", "max_distance",
                                   "max_iterations", "epsilon"))
def _icp_core(algorithm: str, src, src_mask, template, template_mask,
              aux_template, max_distance: float, max_iterations: int,
              epsilon: float):
    src_mask_f = src_mask.astype(jnp.float32)

    if algorithm == "icp_po2po":
        def step(transform):
            return _icp_po2po_step(
                src, src_mask_f, template, template_mask, transform,
                max_distance,
            )
    elif algorithm == "icp_po2pl":
        normals = aux_template  # (N, 3)

        def weight_fn(s, tgt, idx, transform):
            n = normals[idx]
            return n[:, :, None] * n[:, None, :]  # rank-1 L = n n^T

        def step(transform):
            return _gauss_newton_step(
                src, src_mask_f, template, template_mask, transform,
                max_distance, None, weight_fn,
            )
    elif algorithm == "gicp":
        cov_t = aux_template["cov_template"]  # (Nt, 3, 3)
        cov_s = aux_template["cov_source"]    # (Ns, 3, 3)

        def weight_fn(s, tgt, idx, transform):
            R = transform[:3, :3]
            ct = cov_t[idx]
            cs = jnp.einsum("ij,njk,lk->nil", R, cov_s, R)
            M = ct + cs
            # TPU f32 eigh returns slightly non-orthonormal eigenvectors,
            # so a few regularized covariances can be indefinite (min eig
            # ~ -5e-4 observed at sequence scale); symmetrize + jitter,
            # and zero non-finite whitening factors — a NaN row would
            # otherwise poison the normal equations through 0 * NaN even
            # for pairs the distance gate already excludes (w = 0)
            M = 0.5 * (M + jnp.swapaxes(M, -1, -2)) + 1e-5 * jnp.eye(3)
            info = jnp.linalg.inv(M)
            # whitening factor: ||L d||^2 == d^T M^-1 d  (L = chol(M^-1)^T)
            L = jnp.swapaxes(jnp.linalg.cholesky(info), -1, -2)
            return jnp.where(jnp.isfinite(L), L, 0.0)

        def step(transform):
            return _gauss_newton_step(
                src, src_mask_f, template, template_mask, transform,
                max_distance, None, weight_fn,
            )
    else:  # pragma: no cover
        raise ValueError(algorithm)

    # converge on parameter-update magnitude, like the reference GICP
    # (epsilon on the transform delta, capped outer iterations)
    def cond(state):
        _, it, delta = state
        return (it < max_iterations) & (delta >= epsilon)

    def body(state):
        transform, it, _ = state
        new = step(transform)
        delta = jnp.max(jnp.abs(new - transform))
        return new, it + 1, delta

    init = (jnp.eye(4), jnp.int32(0), jnp.float32(jnp.inf))
    transform, n_iter, delta = jax.lax.while_loop(cond, body, init)
    return transform, n_iter, delta


def _pad_pow2(cloud: np.ndarray, minimum: int = 1024):
    n = cloud.shape[0]
    size = max(minimum, 1 << (n - 1).bit_length())
    out = np.zeros((size, 3), np.float32)
    out[:n] = cloud[:, :3]
    mask = np.zeros(size, bool)
    mask[:n] = True
    return out, mask


class ICPRegistration:
    """Prepare and register point clouds with different ICP variants
    (reference ICPRegistration API)."""

    def __init__(self, algorithm: ICPAlgorithm, max_distance: float = 1.0,
                 neighbor_radius: float = 1.0, max_nn: int = 30,
                 max_iterations: int = 100, epsilon: float = 1e-3):
        self._algorithm = ICPAlgorithm.create(algorithm)
        self._max_distance = float(max_distance)
        self._neighbor_radius = neighbor_radius
        self._max_nn = int(max_nn)
        self._max_iterations = int(max_iterations)
        self._epsilon = float(epsilon)

    def prepare(self, cloud: np.ndarray) -> Any:
        """Pad + precompute per-cloud data (normals / covariances)."""
        pts, mask = _pad_pow2(np.asarray(cloud, np.float32))
        prepared = {"points": jnp.asarray(pts), "mask": jnp.asarray(mask)}
        if self._algorithm == ICPAlgorithm.ICP_PO2PL:
            prepared["normals"] = estimate_normals(
                prepared["points"], prepared["mask"], k=self._max_nn
            )
        elif self._algorithm == ICPAlgorithm.GICP:
            prepared["cov"] = estimate_covariances(
                prepared["points"], prepared["mask"], k=min(self._max_nn, 20)
            )
        return prepared

    def register(self, template: Any, source: Any, return_info: bool = False):
        """4x4 transform aligning source onto template.

        With ``return_info``: (transform, {iterations, final_delta}) — the
        convergence diagnostics of the epsilon-gated loop.
        """
        algo = self._algorithm.value
        if self._algorithm == ICPAlgorithm.ICP_PO2PO:
            aux = jnp.zeros(())
        elif self._algorithm == ICPAlgorithm.ICP_PO2PL:
            aux = template["normals"]
        else:
            aux = {"cov_template": template["cov"], "cov_source": source["cov"]}
        m, n_iter, delta = _icp_core(
            algo, source["points"], source["mask"], template["points"],
            template["mask"], aux, self._max_distance, self._max_iterations,
            self._epsilon,
        )
        if return_info:
            return np.asarray(m), {
                "iterations": int(n_iter), "final_delta": float(delta),
            }
        return np.asarray(m)
