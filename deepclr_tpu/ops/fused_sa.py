"""Fused set-abstraction scale: ball query + grouping + shared MLP + max-pool
as one gather-free streaming computation.

Why: on TPU, the literal translation of the reference's CUDA pipeline
(ball_query indices -> grouping_operation gather -> MLP -> max,
extern/pointnet2.patch:101-174) is bottlenecked by giant scatters/gathers
(measured: seconds per 16k-point batch).  This formulation never materializes
indices:

  out[p] = max_{j : ||x_j - c_p|| < r, valid_j} MLP(x_j - c_p ‖ f_j)

* layer 1 is affine in (dx ‖ f), so it splits into a per-point term
  A_j = x_j·W1x + f_j·W1f + b1 (one N-row matmul) and a per-center term
  B_p = -c_p·W1x; the pairwise pre-activation is a broadcast add,
* layers 2..L run on (center, point)-tile blocks — pure MXU matmuls,
* distances come from the same MXU cross term,
* out-of-radius / padded pairs are masked to -inf before the running max.

Multi-scale bundles: pass block-diagonal tail weights, concatenated layer-1
weights, and a per-output-column ``radius`` tuple — all MSG scales then share
a single pass over the cloud (one distance matrix for every scale).

Semantics vs. the reference: the reference truncates each ball to its first
``nsample`` hits in index order and pads by duplicating the first hit; this
computes the max over *all* in-radius points (a superset — identical whenever
the ball holds <= nsample hits).  Every ball contains its own center (FPS
picks real points), so balls are never empty.

Differentiation: because the output is a max over neighbors, its gradient
touches only the winning point per (center, output column).  On TPU the
backward is a SECOND culled streaming Pallas pass (same grid family as the
forward) that recomputes the activation chain bit-identically, selects the
winning rows by equality with the forward's own output, and accumulates
every gradient in-stream — no argmax tracking in the forward and no
(B, P*H3)-row winner gather, both measured multi-ms at KITTI scale (see
docs/kernels.md).  The result is an exact subgradient matching the f32
scan VJP bit-for-bit on hardware; on exact float ties every maximizing
row receives the full cotangent (the scan VJP splits evenly, the legacy
argmax path picks the lowest index — identical whenever the winner is
unique).  Off-TPU the backward differentiates the XLA scan formulation.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ball_mlp_max", "ball_mlp_max_xla", "multi_scale_bundle"]

# np (not jnp): a module-level jnp scalar would initialize jax backends at
# import time, breaking late jax.distributed.initialize on pods
_NEG = np.float32(-1e30)

Radius = Union[float, Tuple[float, ...]]


def _r2_cols(radius: Radius, h_last: int) -> jnp.ndarray:
    if isinstance(radius, tuple):
        r = jnp.asarray(radius, jnp.float32)
        assert r.shape[0] == h_last
        return r * r
    return jnp.full((h_last,), float(radius) ** 2, jnp.float32)


def multi_scale_bundle(scale_weights, scale_biases, radii):
    """Combine per-scale MLP params into one fused bundle.

    Args:
      scale_weights: list over scales of [w1 (Cin,h1), w2 (h1,h2), ...].
      scale_biases: matching biases.
      radii: per-scale radius.

    Returns:
      (weights, biases, radius_cols) for ball_mlp_max — layer-1 weights
      concatenated on the output axis, tail layers block-diagonal, and a
      per-output-column radius tuple (scale masking).
    """
    n_layers = len(scale_weights[0])
    weights = [jnp.concatenate([w[0] for w in scale_weights], axis=1)]
    biases = [jnp.concatenate([b[0] for b in scale_biases], axis=0)]
    for li in range(1, n_layers):
        ws = [w[li] for w in scale_weights]
        total_in = sum(w.shape[0] for w in ws)
        total_out = sum(w.shape[1] for w in ws)
        block = jnp.zeros((total_in, total_out), ws[0].dtype)
        ri = ci = 0
        for w in ws:
            block = jax.lax.dynamic_update_slice(block, w, (ri, ci))
            ri += w.shape[0]
            ci += w.shape[1]
        weights.append(block)
        biases.append(jnp.concatenate([b[li] for b in scale_biases], axis=0))
    radius_cols = tuple(
        float(r)
        for r, w in zip(radii, scale_weights)
        for _ in range(w[-1].shape[1])
    )
    return weights, biases, radius_cols


def _mlp_tail(h, weights, biases, compute_dtype):
    for w, b in zip(weights, biases):
        h = jnp.maximum(
            jnp.dot(h, w.astype(compute_dtype), preferred_element_type=compute_dtype)
            + b.astype(compute_dtype),
            0.0,
        )
    return h


def _xla_impl(xyz, centers, weights, biases, features, m, radius: Radius,
              chunk: int, compute_dtype):
    b, n, _ = xyz.shape
    p = centers.shape[1]
    w1, b1 = weights[0], biases[0]
    h_last = weights[-1].shape[-1]

    w1x = w1[:3].astype(jnp.float32)
    a = jnp.dot(xyz, w1x, preferred_element_type=jnp.float32)
    if features is not None:
        a = a + jnp.dot(
            features, w1[3:].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
    a = a + b1  # (B, N, H1)

    bc = -jnp.dot(centers, w1x, preferred_element_type=jnp.float32)  # (B,P,H1)
    x2 = jnp.sum(xyz * xyz, axis=-1)
    c2 = jnp.sum(centers * centers, axis=-1)
    r2 = _r2_cols(radius, h_last)

    chunk = min(chunk, n)
    while n % chunk:
        chunk //= 2
    n_chunks = n // chunk

    a_s = a.reshape(b, n_chunks, chunk, -1).transpose(1, 0, 2, 3)
    xyz_s = xyz.reshape(b, n_chunks, chunk, 3).transpose(1, 0, 2, 3)
    x2_s = x2.reshape(b, n_chunks, chunk).transpose(1, 0, 2)
    m_s = m[..., 0].reshape(b, n_chunks, chunk).transpose(1, 0, 2)

    tail_w = [w.astype(compute_dtype) for w in weights[1:]]
    tail_b = [x.astype(compute_dtype) for x in biases[1:]]

    # remat: without it the scan saves every chunk's (B, P, chunk, H)
    # activations for the backward pass (tens of GB at 16k points)
    @jax.checkpoint
    def step(carry, inp):
        a_c, xyz_c, x2_c, m_c = inp
        cross = jnp.einsum(
            "bpd,bjd->bpj", centers, xyz_c,
            preferred_element_type=jnp.float32, precision="highest",
        )
        d2 = c2[:, :, None] + x2_c[:, None, :] - 2.0 * cross
        hit = (d2[..., None] < r2) & (m_c[:, None, :, None] > 0.5)

        h = jnp.maximum(a_c[:, None, :, :] + bc[:, :, None, :], 0.0)
        h = _mlp_tail(h.astype(compute_dtype), tail_w, tail_b, compute_dtype)
        h = jnp.where(hit, h.astype(jnp.float32), _NEG)
        return jnp.maximum(carry, jnp.max(h, axis=2)), None

    init = jnp.full((b, p, h_last), _NEG, jnp.float32)
    out, _ = jax.lax.scan(step, init, (a_s, xyz_s, x2_s, m_s))
    return jnp.where(out <= _NEG / 2, 0.0, out)


@partial(jax.jit, static_argnames=("radius", "chunk", "compute_dtype"))
def ball_mlp_max_xla(xyz, centers, weights, biases, radius: Radius,
                     features=None, mask=None, chunk: int = 512,
                     compute_dtype=jnp.bfloat16):
    """Portable (lax.scan) implementation; runs on any backend."""
    b, n, _ = xyz.shape
    m = (jnp.ones((b, n, 1), jnp.float32) if mask is None
         else mask.astype(jnp.float32)[..., None])
    return _xla_impl(xyz, centers, tuple(weights), tuple(biases), features,
                     m, radius, chunk, compute_dtype)


def _winner_mlp(x_w, centers, f_w, weights, biases, valid):
    """Re-evaluate the fused MLP at the winning pairs only.

    x_w: (B, P, H3, 3) winner coords, centers: (B, P, 3),
    f_w: (B, P, H3, F) winner features or None -> (B, P, H3) the winning
    output column's value per (center, column).  Differentiating THIS
    function gives the exact max-pool subgradient of ball_mlp_max.
    """
    dxc = x_w - centers[:, :, None, :]
    h = dxc if f_w is None else jnp.concatenate([dxc, f_w], axis=-1)
    for w, bb in zip(weights[:-1], biases[:-1]):
        h = jnp.maximum(jnp.dot(h, w) + bb, 0.0)
    out = jnp.maximum(
        jnp.einsum("bpch,hc->bpc", h, weights[-1]) + biases[-1][None, None, :],
        0.0,
    )
    return jnp.where(valid, out, 0.0)


def _winner_grads(xyz, centers, weights, biases, features, jstar, g):
    """Winner-only VJP: gather the argmax points, differentiate the MLP
    re-evaluation at just those pairs, scatter point-gradients back.

    (Carrying the winner rows out of the forward kernel instead of
    gathering here was tried and is a net loss: the in-kernel one-hot
    select + inner-axis reduce costs ~30 ms at the flagship shape vs the
    ~10 ms gather it replaces — bisected with a noextract/nostore kernel
    split, 6.4 / 36.9 ms.)"""
    b, n, _ = xyz.shape
    p = centers.shape[1]
    h3 = weights[-1].shape[-1]

    valid = jstar >= 0  # (B, P, H3)
    js = jnp.maximum(jstar, 0).reshape(b, p * h3)

    # ONE row gather for all channels: TPU row gathers price per
    # launch, not per byte — gathering [xyz | features] together
    # measured 10.2 ms vs 14.8 ms for two separate gathers at
    # (8, 65536) rows
    src = (xyz if features is None
           else jnp.concatenate([xyz, features], -1))
    w_rows = jnp.take_along_axis(src, js[..., None], axis=1)
    w_rows = w_rows.reshape(b, p, h3, src.shape[-1])
    x_w = w_rows[..., :3]
    f_w = None if features is None else w_rows[..., 3:]

    g = jnp.where(valid, g, 0.0)
    if f_w is None:
        _, vjp = jax.vjp(
            lambda xw, c, w, bb: _winner_mlp(xw, c, None, w, bb, valid),
            x_w, centers, weights, biases,
        )
        dx_w, dcenters, dweights, dbiases = vjp(g)
        df_w = None
    else:
        _, vjp = jax.vjp(
            lambda xw, c, fw, w, bb: _winner_mlp(xw, c, fw, w, bb, valid),
            x_w, centers, f_w, weights, biases,
        )
        dx_w, dcenters, df_w, dweights, dbiases = vjp(g)

    rows = jnp.arange(b)[:, None]
    dxyz = jnp.zeros_like(xyz).at[rows, js].add(
        dx_w.reshape(b, p * h3, 3)
    )
    dfeatures = None
    if features is not None:
        dfeatures = jnp.zeros_like(features).at[rows, js].add(
            df_w.reshape(b, p * h3, features.shape[-1])
        )
    return dxyz, dcenters, dweights, dbiases, dfeatures


def _parse_bwd_tiles(tiles: str):
    """Parse a 'center_tile,stream,inner,splits' backward tile config
    (the DEEPCLR_SA_BWD_TILES format) with a clear error on bad input."""
    try:
        parts = [int(x) for x in tiles.split(",")]
        if len(parts) != 4 or any(p <= 0 for p in parts):
            raise ValueError
    except ValueError:
        raise ValueError(
            f"DEEPCLR_SA_BWD_TILES={tiles!r} is invalid: expected four "
            "positive integers 'center_tile,stream,inner,splits' "
            "(e.g. '16,32,32,4')"
        ) from None
    return parts


def _kernel_grads(xyz, centers, weights, biases, features, m, out, g,
                  radius_t, compute_dtype, interpret, residuals=None):
    """Equality-select backward: one culled streaming Pallas pass
    accumulates the tail-layer gradients plus the layer-1 term cotangents
    (da for ``a = x·W1x + f·W1f + b1``, dbc for ``bc = -c·W1x``); the
    layer-1/input gradients assemble from those with plain N-row matmuls.

    No argmax tracking in the forward and no (B, P*H3)-row winner gather —
    both measured multi-ms at KITTI scale (see docs/kernels.md)."""
    import os

    from .pallas.fused_sa_kernel import ball_mlp_max_bwd_pallas

    # backward tile config "tile,stream,inner,splits" — default from the
    # hardware sweep (scripts/sweep_fused_sa.py --backward, docs/kernels.md);
    # DEEPCLR_SA_BWD_TILES overrides for A/B
    # r4 hardware sweep (B16 x 16k, P=1024): the forward's cull-optimal
    # fine tiles win once center_splits caps the unrolled program size —
    # 13.9 ms vs 19.1 ms at the r3 default 64,16,16,1 (docs/kernels.md);
    # 2-split (32-body) and stream-64 variants hit the Mosaic cliff (60 ms)
    tiles = os.environ.get("DEEPCLR_SA_BWD_TILES", "16,32,32,4")
    center_tile, stream, inner, splits = _parse_bwd_tiles(tiles)
    da, dbc, dw_tail, db_tail = ball_mlp_max_bwd_pallas(
        xyz, centers, weights, biases, radius_t, g, out,
        features=features, mask=m[..., 0] > 0.5,
        compute_dtype=compute_dtype, interpret=interpret,
        center_tile=center_tile, stream=stream, inner=inner,
        center_splits=splits, residuals=residuals,
    )
    w1 = weights[0]
    w1x = w1[:3].astype(jnp.float32)
    dw1x = (jnp.einsum("bni,bnh->ih", xyz, da)
            - jnp.einsum("bpi,bph->ih", centers, dbc))
    db1 = jnp.sum(da, axis=(0, 1))
    dxyz = jnp.einsum("bnh,ih->bni", da, w1x)
    dcenters = -jnp.einsum("bph,ih->bpi", dbc, w1x)
    if features is not None:
        dw1 = jnp.concatenate(
            [dw1x, jnp.einsum("bnf,bnh->fh", features, da)], axis=0)
        dfeatures = jnp.einsum(
            "bnh,fh->bnf", da, w1[3:].astype(jnp.float32))
    else:
        dw1 = dw1x
        dfeatures = None
    return (dxyz, dcenters, (dw1, *dw_tail), (db1, *db_tail), dfeatures)


def ball_mlp_max(xyz, centers, weights, biases, radius: Radius,
                 features=None, mask=None, chunk: int = 512,
                 compute_dtype=jnp.bfloat16, backward: str = "auto"):
    """Fused radius-neighborhood PointNet scale (differentiable).

    Forward runs the Pallas TPU kernel when on TPU (XLA scan elsewhere).
    ``backward`` selects the VJP:

    * "kernel" (the TPU default under "auto") — equality-select backward
      kernel: a second culled streaming pass recomputes activations,
      selects winners by equality with the forward output, and
      accumulates all gradients in-stream.  No argmax tracking and no
      winner-row gather.
    * "argmax" — winner-only path: argmax-tracking forward kernel +
      gather/re-evaluate at the winning pairs (kept for A/B).
    * "scan" — differentiate the XLA scan formulation (the off-TPU
      default under "auto").

    Tie gradients differ: kernel gives full cotangent to every maximizing
    row, argmax to the lowest index, scan splits evenly — identical
    whenever the winner is unique (always, except exact float ties
    between distinct points).
    """
    from .pallas.fused_sa_kernel import ball_mlp_max_pallas, pallas_available

    use_pallas = pallas_available()
    if backward == "auto":
        mode = "kernel" if use_pallas else "scan"
    else:
        mode = backward
    if (mode == "scan" and use_pallas
            and compute_dtype == jnp.bfloat16):
        import warnings

        # the rematerialized bf16 forward inside the scan VJP differs from
        # the saved values in ulps on TPU, so reduce_max's equality-mask
        # transpose matches nothing and gradients silently vanish
        # (measured |g| ratio ~0 vs f32; docs/kernels.md)
        warnings.warn(
            "ball_mlp_max backward='scan' on TPU with bfloat16 yields "
            "near-zero gradients (remat/reduce_max equality hazard); use "
            "backward='kernel' (the TPU default) or compute_dtype=float32",
            stacklevel=2,
        )
    radius_t = radius if isinstance(radius, tuple) else float(radius)
    weights = tuple(weights)
    biases = tuple(biases)
    b, n, _ = xyz.shape
    m = (jnp.ones((b, n, 1), jnp.float32) if mask is None
         else mask.astype(jnp.float32)[..., None])

    @jax.custom_vjp
    def f(xyz, centers, weights, biases, features, m):
        if use_pallas or mode == "kernel":
            # the kernel backward compares recomputed activations against
            # the forward output by equality, so the forward must be the
            # Pallas kernel (interpret off-TPU), not the XLA scan
            return ball_mlp_max_pallas(
                xyz, centers, weights, biases, radius_t,
                features=features, mask=m[..., 0] > 0.5,
                compute_dtype=compute_dtype, interpret=not use_pallas,
            )
        return _xla_impl(xyz, centers, weights, biases, features, m,
                         radius_t, chunk, compute_dtype)

    def f_fwd(xyz, centers, weights, biases, features, m):
        if mode == "kernel":
            # run the kernel ONCE, keeping its packed point operands and
            # cull bitmap as residuals — the backward otherwise re-packs
            # geo/a and re-runs the N x P cull pre-pass per center-split
            # (the r4 double prologue, docs/kernels.md)
            out, res_pack = ball_mlp_max_pallas(
                xyz, centers, weights, biases, radius_t,
                features=features, mask=m[..., 0] > 0.5,
                compute_dtype=compute_dtype, interpret=not use_pallas,
                return_residuals=True,
            )
            return out, (xyz, centers, weights, biases, features, m, out,
                         res_pack)
        if mode == "argmax":
            # run the argmax-tracking kernel ONCE here: its value output is
            # identical to the plain kernel's, and stashing the winner
            # indices as a residual removes the full second kernel launch
            # the backward otherwise needs
            from .pallas.fused_sa_kernel import ball_mlp_max_pallas_argmax

            out, jstar = ball_mlp_max_pallas_argmax(
                xyz, centers, weights, biases, radius_t,
                features=features, mask=m[..., 0] > 0.5,
                compute_dtype=compute_dtype, interpret=not use_pallas,
            )
            return out, (xyz, centers, weights, biases, features, m, jstar)
        return f(xyz, centers, weights, biases, features, m), (
            xyz, centers, weights, biases, features, m, None,
        )

    def f_bwd(res, g):
        if mode == "kernel":
            (xyz, centers, weights, biases, features, m, out,
             res_pack) = res
            dxyz, dcenters, dweights, dbiases, dfeatures = _kernel_grads(
                xyz, centers, weights, biases, features, m, out, g,
                radius_t, compute_dtype, interpret=not use_pallas,
                residuals=res_pack,
            )
            return (dxyz, dcenters, dweights, dbiases, dfeatures,
                    jnp.zeros_like(m))
        xyz, centers, weights, biases, features, m, aux = res
        if mode == "argmax":
            dxyz, dcenters, dweights, dbiases, dfeatures = _winner_grads(
                xyz, centers, weights, biases, features, aux, g
            )
            if features is None:
                dfeatures = None
            return (dxyz, dcenters, dweights, dbiases, dfeatures,
                    jnp.zeros_like(m))
        _, vjp = jax.vjp(
            lambda xyz, centers, weights, biases, features: _xla_impl(
                xyz, centers, weights, biases, features, m,
                radius_t, chunk, compute_dtype,
            ),
            xyz, centers, weights, biases, features,
        )
        grads = vjp(g)
        return (*grads, jnp.zeros_like(m))

    f.defvjp(f_fwd, f_bwd)
    return f(xyz, centers, weights, biases, features, m)
