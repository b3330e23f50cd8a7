"""Pallas TPU kernel: fused ball-query + grouping + shared-MLP + max-pool.

See ops/fused_sa.py for the math.  Grid design:

  grid = (B, P // TP, N // (G * CN))  — batch x center-tile x point-chunk

The point-chunk axis is innermost, so the output block (one center tile) is
*revisited* across chunks and accumulates a running max while Pallas
double-buffers the streaming chunk inputs — no HBM gathers, no index
materialization.

Lane packing: the shared MLP is narrow (H1 = 16..32 per scale bundle), which
would waste the 128-wide MXU/VPU lanes.  G = 128 // H1 point groups are
packed side by side on the lane axis: layer-1 terms are reshaped host-side to
(N/G, G*H1), the MLP tail weights become G-fold block-diagonal 128-wide
matmuls (full MXU K utilization), and the radius/validity mask is expanded to
packed columns with a tiny (., G) @ (G, G*H3) one-hot matmul.  The final
reduction over the G groups happens outside the kernel (one cheap XLA max).

Mosaic layout rules honored: pairwise (TP, CN, ·) tensors are built only by
broadcasting *existing* unit dims (per-center inputs ship as (B, P, 1, ·)),
lane-axis concats/slices, reshapes that merge/split leading dims, and MXU
dot_generals.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ball_mlp_max_pallas", "pallas_available"]

_NEG = -1e30  # python float: jnp scalars would be captured consts in kernels


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def _block_diag(mats):
    rows = sum(m.shape[0] for m in mats)
    cols = sum(m.shape[1] for m in mats)
    out = jnp.zeros((rows, cols), mats[0].dtype)
    r = c = 0
    for m in mats:
        out = jax.lax.dynamic_update_slice(out, m, (r, c))
        r += m.shape[0]
        c += m.shape[1]
    return out


def _make_kernel(n_tail: int, groups: int, inner: int, compute_dtype):
    def kernel(xyz_ref, a_ref, m_ref, cts_ref, bc_ref, r2_ref, e_ref,
               *tail_and_out):
        out_ref = tail_and_out[-1]
        tail = tail_and_out[:-1]
        ni = pl.program_id(2)

        cnb = a_ref.shape[1]          # packed block length (points / G)
        tp = bc_ref.shape[1]          # center tile
        gh3 = out_ref.shape[2]        # G * H3
        num_inner = cnb // inner

        @pl.when(ni == 0)
        def _():
            out_ref[0] = jnp.full((tp, gh3), _NEG, jnp.float32)

        bc = bc_ref[0]                # (TP, 1, G*H1) f32
        cts = cts_ref[0]              # (TP, 1, 3)
        e = e_ref[:, :]               # (G, G*H3) f32
        r2 = r2_ref[:, :, :]          # (1, 1, G*H3)

        def body(ii, carry):
            s = ii * inner
            a_c = a_ref[0, pl.ds(s, inner), :][None]   # (1, CNI, G*H1)
            m_c = m_ref[0, pl.ds(s, inner), :]         # (CNI, G)

            # distances per packed group (lane concat), layout (TP, CNI, G)
            d2_groups = []
            for g in range(groups):
                d2 = None
                for k in range(3):
                    xk = xyz_ref[0, pl.ds(s, inner),
                                 3 * g + k:3 * g + k + 1][None]  # (1,CNI,1)
                    ck = cts[:, :, k:k + 1]                      # (TP,1,1)
                    dx = xk - ck
                    d2 = dx * dx if d2 is None else d2 + dx * dx
                d2_groups.append(d2)
            d2 = jnp.concatenate(d2_groups, axis=2)  # (TP, CNI, G)

            # expand (group) -> (packed output columns), one-hot matmul
            d2_flat = d2.reshape(tp * inner, groups)
            d2_cols = jnp.dot(d2_flat, e, preferred_element_type=jnp.float32)
            d2_cols = d2_cols.reshape(tp, inner, gh3)
            m_cols = jnp.dot(m_c, e, preferred_element_type=jnp.float32)[None]

            # layer 1 (f32 add for fidelity) then block-diagonal MXU tail
            pre = jnp.maximum(a_c + bc, 0.0)  # (TP, CNI, G*H1)
            h = jnp.broadcast_to(pre, (tp, inner, pre.shape[-1]))
            h = h.reshape(tp * inner, -1).astype(compute_dtype)
            for li in range(n_tail):
                w = tail[2 * li][:, :].astype(compute_dtype)
                b = tail[2 * li + 1][:, :]
                acc = jnp.dot(h, w, preferred_element_type=jnp.float32)
                h = jnp.maximum(acc + b.astype(jnp.float32), 0.0)
                if li < n_tail - 1:
                    h = h.astype(compute_dtype)
            h = h.reshape(tp, inner, gh3)

            hit = (d2_cols < r2) & (m_cols > 0.5)
            h = jnp.where(hit, h, _NEG)
            return jnp.maximum(carry, jnp.max(h, axis=1))

        init = out_ref[0]
        out_ref[0] = jax.lax.fori_loop(0, num_inner, body, init)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("radius", "center_tile", "chunk", "inner",
                     "compute_dtype", "interpret"),
)
def _ball_mlp_max_pallas_impl(xyz, centers, weights, biases, radius,
                              features, mask, center_tile: int, chunk: int,
                              inner: int, compute_dtype, interpret: bool):
    b, n, _ = xyz.shape
    p = centers.shape[1]
    w1, b1 = weights[0], biases[0]
    h1 = w1.shape[1]
    h3 = weights[-1].shape[-1]
    n_tail = len(weights) - 1

    groups = max(1, 128 // h1)
    while n % groups != 0 and groups > 1:
        groups //= 2
    cn = chunk  # packed rows per grid step (covers groups*chunk points)

    w1x = w1[:3].astype(jnp.float32)
    a = jnp.dot(xyz, w1x, preferred_element_type=jnp.float32)
    if features is not None:
        a = a + jnp.dot(
            features, w1[3:].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
    a = a + b1  # (B, N, H1)
    bc = -jnp.dot(centers, w1x, preferred_element_type=jnp.float32)  # (B,P,H1)

    if mask is None:
        m = jnp.ones((b, n), jnp.float32)
    else:
        m = mask.astype(jnp.float32)

    if isinstance(radius, tuple):
        r2_base = jnp.asarray(radius, jnp.float32) ** 2
        assert r2_base.shape[0] == h3
    else:
        r2_base = jnp.full((h3,), float(radius) ** 2, jnp.float32)

    # --- pack G point groups onto lanes ---------------------------------
    np_rows = n // groups
    a_p = a.reshape(b, np_rows, groups * h1)
    xyz_p = xyz.reshape(b, np_rows, groups * 3)
    m_p = m.reshape(b, np_rows, groups)
    bc_t = jnp.tile(bc, (1, 1, groups))[:, :, None, :]  # (B,P,1,G*H1)
    cts4 = centers[:, :, None, :]                       # (B,P,1,3)
    r2_p = jnp.tile(r2_base, (groups,))[None, None, :]  # (1,1,G*H3)

    # group -> packed-column one-hot expansion matrix (G, G*H3)
    e = np.zeros((groups, groups * h3), np.float32)
    for g in range(groups):
        e[g, g * h3:(g + 1) * h3] = 1.0
    e = jnp.asarray(e)

    tail_w = [
        _block_diag([w] * groups).astype(compute_dtype) for w in weights[1:]
    ]
    tail_b = [jnp.tile(bb, (groups,))[None, :] for bb in biases[1:]]

    grid = (b, p // center_tile, np_rows // cn)

    def vm(block, index_map):
        return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)

    in_specs = [
        vm((1, cn, groups * 3), lambda bi, pi, ni: (bi, ni, 0)),   # xyz_p
        vm((1, cn, groups * h1), lambda bi, pi, ni: (bi, ni, 0)),  # a_p
        vm((1, cn, groups), lambda bi, pi, ni: (bi, ni, 0)),       # m_p
        vm((1, center_tile, 1, 3), lambda bi, pi, ni: (bi, pi, 0, 0)),
        vm((1, center_tile, 1, groups * h1),
           lambda bi, pi, ni: (bi, pi, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.VMEM),                     # r2_p
        pl.BlockSpec(memory_space=pltpu.VMEM),                     # e
    ]
    args = [xyz_p, a_p, m_p, cts4, bc_t, r2_p, e]
    for w, bb in zip(tail_w, tail_b):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(w)
        args.append(bb)

    kernel = _make_kernel(n_tail, groups, inner, compute_dtype)

    packed = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, p, groups * h3), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, center_tile, groups * h3), lambda bi, pi, ni: (bi, pi, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(*args)

    # reduce over the packed groups + empty-ball guard (tiny XLA ops)
    out = jnp.max(packed.reshape(b, p, groups, h3), axis=2)
    return jnp.where(out <= _NEG / 2, 0.0, out)


def ball_mlp_max_pallas(xyz, centers, weights, biases, radius,
                        features=None, mask=None, center_tile: int = 16,
                        chunk: int = 1024, inner: int = 64,
                        compute_dtype=jnp.bfloat16, interpret: bool = False):
    """Pallas TPU implementation of ops.fused_sa.ball_mlp_max.

    chunk: packed rows streamed per grid step; inner: rows per compute
    sub-chunk inside the kernel (bounds VMEM temporaries).
    """
    p = centers.shape[1]
    center_tile = min(center_tile, p)
    while p % center_tile != 0:
        center_tile //= 2
    n = xyz.shape[1]
    groups = max(1, 128 // weights[0].shape[1])
    while n % groups != 0 and groups > 1:
        groups //= 2
    np_rows = n // groups
    chunk = min(chunk, np_rows)
    while np_rows % chunk != 0 and chunk > 1:
        chunk //= 2
    inner = min(inner, chunk)
    while chunk % inner != 0 and inner > 1:
        inner //= 2
    return _ball_mlp_max_pallas_impl(
        xyz, centers, tuple(weights), tuple(biases), radius, features, mask,
        center_tile, chunk, inner, compute_dtype, interpret,
    )
