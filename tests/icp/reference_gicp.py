"""Slow, independent host-side reference for Segal GICP and point-to-plane
ICP — used ONLY by the parity tests.

Deliberately mirrors the semantics of the reference's GICP binding
(/root/reference/extern/gicp/gicp_binding.cpp:33-70: 20-NN covariances with
eigenvalues regularized to (eps, 1, 1), kd-tree correspondences gated by
max_distance, iterative minimization of the Mahalanobis cost with a
quasi-Newton optimizer, outer loop until the transform delta drops below
epsilon or 100 iterations) while sharing NO code or algorithmic structure
with deepclr_tpu.icp (brute-force NN instead of the MXU knn, scipy BFGS
over an axis-angle chart instead of the jax Gauss-Newton step).
"""
import numpy as np
from scipy.optimize import minimize
from scipy.spatial.transform import Rotation


def _knn_bruteforce(query, points, k):
    d2 = ((query[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :k]
    return idx


def regularized_covariances(points, k=20, eps=1e-3):
    """Per-point k-NN covariance with eigenvalues flattened to (eps,1,1)."""
    idx = _knn_bruteforce(points, points, k)
    nbrs = points[idx]                       # (N, k, 3)
    mean = nbrs.mean(axis=1, keepdims=True)
    c = nbrs - mean
    cov = np.einsum("nki,nkj->nij", c, c) / k
    w, v = np.linalg.eigh(cov)
    lam = np.diag([eps, 1.0, 1.0])
    return np.einsum("nij,jk,nlk->nil", v, lam, v)


def _params_to_transform(x):
    T = np.eye(4)
    T[:3, :3] = Rotation.from_rotvec(x[3:]).as_matrix()
    T[:3, 3] = x[:3]
    return T


def _transform_to_params(T):
    return np.concatenate([T[:3, 3],
                           Rotation.from_matrix(T[:3, :3]).as_rotvec()])


def reference_gicp(template, source, k=20, eps_cov=1e-3, max_distance=2.0,
                   epsilon=1e-3, max_outer=100):
    """4x4 transform aligning ``source`` onto ``template``."""
    template = np.asarray(template, np.float64)
    source = np.asarray(source, np.float64)
    C_t = regularized_covariances(template, k, eps_cov)
    C_s = regularized_covariances(source, k, eps_cov)

    T = np.eye(4)
    for _ in range(max_outer):
        R0, t0 = T[:3, :3], T[:3, 3]
        moved = source @ R0.T + t0
        idx = _knn_bruteforce(moved, template, 1)[:, 0]
        tgt = template[idx]
        keep = ((moved - tgt) ** 2).sum(-1) < max_distance ** 2
        if keep.sum() < 10:
            break
        s, q = source[keep], tgt[keep]
        ct, cs = C_t[idx[keep]], C_s[keep]

        def cost(x):
            Tx = _params_to_transform(x)
            R, t = Tx[:3, :3], Tx[:3, 3]
            d = q - (s @ R.T + t)
            M = np.linalg.inv(ct + np.einsum("ij,njk,lk->nil", R, cs, R))
            return np.einsum("ni,nij,nj->", d, M, d)

        res = minimize(cost, _transform_to_params(T), method="BFGS",
                       options={"maxiter": 40, "gtol": 1e-8})
        T_new = _params_to_transform(res.x)
        delta = np.max(np.abs(T_new - T))
        T = T_new
        if delta < epsilon:
            break
    return T


def _pca_normals(points, k=30):
    idx = _knn_bruteforce(points, points, k)
    nbrs = points[idx]
    c = nbrs - nbrs.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", c, c) / k
    _, v = np.linalg.eigh(cov)
    return v[:, :, 0]


def reference_po2pl(template, source, k=30, max_distance=2.0, epsilon=1e-3,
                    max_outer=100):
    """Point-to-plane ICP: minimize sum (n_i . d_i)^2 with scipy BFGS."""
    template = np.asarray(template, np.float64)
    source = np.asarray(source, np.float64)
    normals = _pca_normals(template, k)

    T = np.eye(4)
    for _ in range(max_outer):
        R0, t0 = T[:3, :3], T[:3, 3]
        moved = source @ R0.T + t0
        idx = _knn_bruteforce(moved, template, 1)[:, 0]
        tgt, n = template[idx], normals[idx]
        keep = ((moved - tgt) ** 2).sum(-1) < max_distance ** 2
        if keep.sum() < 10:
            break
        s, q, nk = source[keep], tgt[keep], n[keep]

        def cost(x):
            Tx = _params_to_transform(x)
            d = q - (s @ Tx[:3, :3].T + Tx[:3, 3])
            return ((nk * d).sum(-1) ** 2).sum()

        res = minimize(cost, _transform_to_params(T), method="BFGS",
                       options={"maxiter": 40, "gtol": 1e-10})
        T_new = _params_to_transform(res.x)
        delta = np.max(np.abs(T_new - T))
        T = T_new
        if delta < epsilon:
            break
    return T
