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
matmuls (full MXU K utilization), and the final reduction over the G groups
happens outside the kernel (one cheap XLA max).

Distance + masking are a single MXU expansion matmul: packed coordinate
differences squared [dx2 | invalidity] (CN, 3G+G lanes) x a 0/1/BIG matrix ->
penalized squared distance per packed output column, so the only full-width
VPU work per pair is compare/select/max.

Mosaic layout rules honored: pairwise (TP, CN, ·) tensors are built only by
broadcasting *existing* unit dims (per-center inputs ship as (B, P, 1, ·)),
reshapes merge/split leading dims only, and the inner sub-chunk loop is
unrolled with static slice starts (a fori_loop with dynamic pl.ds starts
sends the Mosaic compiler into a pathological multi-hour path).
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
_BIG = 1e12   # penalty added to d2 of invalid points


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


def _make_kernel(n_tail: int, groups: int, inner: int, compute_dtype,
                 r2_max: float):
    def kernel(geo_ref, a_ref, aabb_ref, cts_ref, bc_ref, r2_ref, e2_ref,
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
        cts = cts_ref[0]              # (TP, 1, G*3 + G) tiled centers ‖ 0
        e2 = e2_ref[:, :]             # (G*3 + G, G*H3) expansion matrix
        r2 = r2_ref[:, :, :]          # (1, 1, G*H3)

        # center-tile AABB (coords identical across groups; use group 0)
        c_lo = [jnp.min(cts[:, :, k]) for k in range(3)]
        c_hi = [jnp.max(cts[:, :, k]) for k in range(3)]

        def body(ii):
            s = ii * inner
            geo_c = geo_ref[0, pl.ds(s, inner), :][None]  # (1, CNI, 4G)
            a_c = a_ref[0, pl.ds(s, inner), :][None]      # (1, CNI, G*H1)

            # packed coordinate diffs: [x - c | (1-m)] for all G groups;
            # squaring leaves the invalidity indicator intact (0/1)
            dx = geo_c - cts                               # (TP, CNI, 4G)
            dx2 = dx * dx
            # penalized squared distances per packed output column (MXU)
            d2_cols = jnp.dot(
                dx2.reshape(tp * inner, -1), e2,
                preferred_element_type=jnp.float32,
            ).reshape(tp, inner, gh3)

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

            h = jnp.where(d2_cols < r2, h, _NEG)
            out_ref[0] = jnp.maximum(out_ref[0], jnp.max(h, axis=1))

        # unrolled sub-chunk loop with static slice starts; each sub-chunk
        # is skipped entirely when its AABB is farther than the max radius
        # from the center tile's AABB (points are Morton-sorted, so chunks
        # are spatially tight)
        for ii in range(num_inner):
            d2_lb = jnp.float32(0.0)
            for k in range(3):
                p_lo = aabb_ref[0, ii, k]
                p_hi = aabb_ref[0, ii, 3 + k]
                gap = jnp.maximum(
                    jnp.maximum(p_lo - c_hi[k], c_lo[k] - p_hi), 0.0
                )
                d2_lb = d2_lb + gap * gap

            @pl.when(d2_lb < r2_max)
            def _(ii=ii):
                body(ii)

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
        inval = jnp.zeros((b, n, 1), jnp.float32)
    else:
        inval = 1.0 - mask.astype(jnp.float32)[..., None]

    if isinstance(radius, tuple):
        r2_base = jnp.asarray(radius, jnp.float32) ** 2
        assert r2_base.shape[0] == h3
        r2_max = max(float(r) for r in radius) ** 2
    else:
        r2_base = jnp.full((h3,), float(radius) ** 2, jnp.float32)
        r2_max = float(radius) ** 2

    # --- pack G point groups onto lanes ---------------------------------
    np_rows = n // groups
    a_p = a.reshape(b, np_rows, groups * h1)
    # geometry block: per group [x, y, z, invalid]  -> (B, N/G, 4G)
    geo = jnp.concatenate([xyz, inval], axis=-1).reshape(b, np_rows, groups * 4)

    # per-sub-chunk AABBs over *valid* points (rows [s, s+inner) cover
    # points [s*G, (s+inner)*G)); all-invalid chunks get an empty box that
    # always culls
    n_sub = np_rows // inner
    pts_sub = xyz.reshape(b, n_sub, inner * groups, 3)
    valid_sub = (inval < 0.5).reshape(b, n_sub, inner * groups, 1)
    lo = jnp.min(jnp.where(valid_sub, pts_sub, jnp.inf), axis=2)
    hi = jnp.max(jnp.where(valid_sub, pts_sub, -jnp.inf), axis=2)
    aabb = jnp.concatenate([lo, hi], axis=-1)  # (B, n_sub, 6)
    bc_t = jnp.tile(bc, (1, 1, groups))[:, :, None, :]  # (B,P,1,G*H1)
    # tiled centers matching the geo layout: [cx, cy, cz, 0] per group
    cts_pad = jnp.concatenate(
        [centers, jnp.zeros((b, p, 1), jnp.float32)], axis=-1
    )
    cts_t = jnp.tile(cts_pad, (1, 1, groups))[:, :, None, :]  # (B,P,1,4G)
    r2_p = jnp.tile(r2_base, (groups,))[None, None, :]  # (1,1,G*H3)

    # expansion matrix: squared coord diffs summed per group + BIG * invalid
    # (the invalid indicator survives squaring: (0-1)^2 = 1)
    e2 = np.zeros((groups * 4, groups * h3), np.float32)
    for g in range(groups):
        for k in range(3):
            e2[g * 4 + k, g * h3:(g + 1) * h3] = 1.0
        e2[g * 4 + 3, g * h3:(g + 1) * h3] = _BIG
    e2 = jnp.asarray(e2)

    tail_w = [
        _block_diag([w] * groups).astype(compute_dtype) for w in weights[1:]
    ]
    tail_b = [jnp.tile(bb, (groups,))[None, :] for bb in biases[1:]]

    grid = (b, p // center_tile, np_rows // chunk)

    def vm(block, index_map):
        return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)

    per_block = chunk // inner
    in_specs = [
        vm((1, chunk, groups * 4), lambda bi, pi, ni: (bi, ni, 0)),    # geo
        vm((1, chunk, groups * h1), lambda bi, pi, ni: (bi, ni, 0)),   # a_p
        pl.BlockSpec((1, per_block, 6), lambda bi, pi, ni: (bi, ni, 0),
                     memory_space=pltpu.SMEM),                          # aabb
        vm((1, center_tile, 1, groups * 4),
           lambda bi, pi, ni: (bi, pi, 0, 0)),                          # cts_t
        vm((1, center_tile, 1, groups * h1),
           lambda bi, pi, ni: (bi, pi, 0, 0)),                          # bc_t
        pl.BlockSpec(memory_space=pltpu.VMEM),                          # r2_p
        pl.BlockSpec(memory_space=pltpu.VMEM),                          # e2
    ]
    args = [geo, a_p, aabb, cts_t, bc_t, r2_p, e2]
    for w, bb in zip(tail_w, tail_b):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(w)
        args.append(bb)

    kernel = _make_kernel(n_tail, groups, inner, compute_dtype, r2_max)

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
                        features=None, mask=None, center_tile: int = 32,
                        chunk: int = 1024, inner: int = 128,
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
