"""Pallas TPU kernel: fused ball-query + grouping + shared-MLP + max-pool.

See ops/fused_sa.py for the math.  Grid design (v2, resident centers):

  grid = (B, N // (G * inner))  — batch x point-sub-chunk

All P centers (packed layer-1 terms + tiled coordinates) and the full
(P, G*H3) output stay resident in VMEM for the whole cloud, so each cloud's
points stream through HBM exactly ONCE (v1 re-streamed the cloud once per
center tile, which made DMA + grid overhead the floor).  Inside the kernel a
fully-unrolled loop over center tiles does the pairwise work; a
host-precomputed (sub-chunk x tile) AABB-distance bitmap in SMEM skips tiles
farther than the max radius — with Morton-sorted points AND centers, ~75-88%
of tile visits are culled on KITTI-scale clouds.

Lane packing: the shared MLP is narrow (H1 = 16..32 per scale bundle), which
would waste the 128-wide MXU/VPU lanes.  G = 128 // H1 point groups are
packed side by side on the lane axis: layer-1 terms are reshaped host-side to
(N/G, G*H1), the MLP tail weights become G-fold block-diagonal 128-wide
matmuls (full MXU K utilization), and the final reduction over the G groups
happens outside the kernel (one cheap XLA max).

Distance + masking are a single MXU expansion matmul: packed coordinate
differences squared [dx2 | invalidity] (inner, 3G+G lanes) x a 0/1/BIG matrix
-> penalized squared distance per packed output column, so the only
full-width VPU work per pair is compare/select/max.

Mosaic layout rules honored: pairwise (T, inner, ·) tensors are built only by
broadcasting *existing* unit dims (per-center inputs ship as (B, P, 1, ·)),
reshapes merge/split leading dims only, and both the tile loop and the
sub-chunk streaming use static offsets (a fori_loop with dynamic pl.ds starts
sends the Mosaic compiler into a pathological multi-hour path).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "ball_mlp_max_pallas",
    "ball_mlp_max_pallas_argmax",
    "ball_mlp_max_bwd_pallas",
    "block_min_d2_pallas",
    "pallas_available",
]

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


def _min_d2_kernel(chunk: int, sub_per_step: int):
    """Per-(sub-chunk, center) min squared distance — culling pre-pass.

    Grid (B, n_sub // sub_per_step).  Each step loads sub_per_step point
    chunks of ``chunk`` points and the resident (4, P) center columns
    [cx; cy; cz; 0], and writes the min over each chunk's points of
    (x-c)² + BIG·invalid for every center: out block (1, sub_per_step, P).

    Pure VPU: the dx² form keeps the error *relative to d²* (the expanded
    x²+c²-2xc form loses ~|x|²·eps to cancellation, which is why the XLA
    formulations need precision="highest" and 2-6x the time), and nothing
    pairwise ever touches HBM — the (chunk, P) temporaries live and die in
    VMEM.  ~8 VPU ops per pair; the (N, P) matrix never materializes.
    """

    def kernel(pts_ref, cts_ref, out_ref):
        for s in range(sub_per_step):
            lo = s * chunk
            d2 = None
            for k in range(3):
                xk = pts_ref[0, lo:lo + chunk, k:k + 1]   # (chunk, 1)
                ck = cts_ref[0, k:k + 1, :]               # (1, P)
                dx = xk - ck
                d2 = dx * dx if d2 is None else d2 + dx * dx
            d2 = d2 + pts_ref[0, lo:lo + chunk, 3:4]      # BIG·invalid
            out_ref[0, s, :] = jnp.min(d2, axis=0)

    return kernel


def block_min_d2_pallas(xyz, inval_big, centers, chunk: int,
                        interpret: bool = False):
    """min over each chunk of ``chunk`` consecutive points of the squared
    distance to every center: (B, N, 3), (B, N) [BIG·invalid], (B, P, 3)
    -> (B, N // chunk, P) float32."""
    b, n, _ = xyz.shape
    p = centers.shape[1]
    n_sub = n // chunk
    sub_per_step = 8
    while n_sub % sub_per_step:
        sub_per_step //= 2
    pts = jnp.concatenate([xyz, inval_big[..., None]], axis=-1)  # (B, N, 4)
    cts = jnp.concatenate(
        [centers, jnp.zeros((b, p, 1), jnp.float32)], axis=-1
    ).transpose(0, 2, 1)                                          # (B, 4, P)

    grid = (b, n_sub // sub_per_step)
    return pl.pallas_call(
        _min_d2_kernel(chunk, sub_per_step),
        out_shape=jax.ShapeDtypeStruct((b, n_sub, p), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, sub_per_step * chunk, 4),
                         lambda bi, si: (bi, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, p), lambda bi, si: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, sub_per_step, p),
                               lambda bi, si: (bi, si, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pts, cts)


def _make_kernel(n_tail: int, n_tiles: int, tile: int, stream: int,
                 inner: int, compute_dtype, groups: int, h3: int,
                 with_argmax: bool, d2_mode: str = "f32"):
    slices = stream // inner

    def kernel(geo_ref, a_ref, act_ref, cts_ref, bc_ref, r2_ref, e2_ref,
               *tail_and_out):
        if with_argmax:
            out_ref, idx_ref = tail_and_out[-2], tail_and_out[-1]
            tail = tail_and_out[:-2]
        else:
            out_ref = tail_and_out[-1]
            idx_ref = None
            tail = tail_and_out[:-1]
        ni = pl.program_id(1)

        p = out_ref.shape[1]
        gh3 = out_ref.shape[2]

        @pl.when(ni == 0)
        def _():
            out_ref[0] = jnp.full((p, gh3), _NEG, jnp.float32)
            if with_argmax:
                idx_ref[0] = jnp.full((p, gh3), -1, jnp.int32)

        e2 = e2_ref[:, :]             # (G*3 + G, G*H3) expansion matrix
        r2 = r2_ref[:, :, :]          # (1, 1, G*H3)
        if with_argmax:
            # packed column -> point-group offset: lane // H3
            lane_g = jax.lax.broadcasted_iota(
                jnp.int32, (1, inner, gh3), 2
            ) // h3
            row_io = jax.lax.broadcasted_iota(
                jnp.int32, (1, inner, gh3), 1
            )

        def body(t, k, geo_c, a_c):
            lo = t * tile
            cts = cts_ref[0, lo:lo + tile]  # (tile, 1, 4G) static slice
            bc = bc_ref[0, lo:lo + tile]    # (tile, 1, G*H1)

            # packed coordinate diffs: [x - c | (1-m)] for all G groups;
            # squaring leaves the invalidity indicator intact (0/1)
            dx = geo_c - cts                # (tile, inner, 4G)
            dx2 = (dx * dx).reshape(tile * inner, -1)
            # penalized squared distances per packed output column (MXU).
            # Measured (scripts/sweep_fused_sa.py): explicit bf16 here is
            # bit-identical to the f32 matmul at identical time — the
            # Mosaic f32 matmul already runs as bf16 MXU passes — so d2
            # precision is not a perf lever; the knob stays for A/B only.
            if d2_mode == "bf16":
                d2_cols = jnp.dot(
                    dx2.astype(jnp.bfloat16), e2.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
            else:  # f32 (default)
                d2_cols = jnp.dot(dx2, e2, preferred_element_type=jnp.float32)
            d2_cols = d2_cols.reshape(tile, inner, gh3)

            # layer 1 (f32 add for fidelity) then block-diagonal MXU tail
            pre = jnp.maximum(a_c + bc, 0.0)  # (tile, inner, G*H1)
            h = jnp.broadcast_to(pre, (tile, inner, pre.shape[-1]))
            h = h.reshape(tile * inner, -1).astype(compute_dtype)
            for li in range(n_tail):
                w = tail[2 * li][:, :].astype(compute_dtype)
                b = tail[2 * li + 1][:, :]
                acc = jnp.dot(h, w, preferred_element_type=jnp.float32)
                h = jnp.maximum(acc + b.astype(jnp.float32), 0.0)
                if li < n_tail - 1:
                    h = h.astype(compute_dtype)
            h = h.reshape(tile, inner, gh3)

            h = jnp.where(d2_cols < r2, h, _NEG)
            rowmax = jnp.max(h, axis=1)      # (tile, gh3)
            old = out_ref[0, lo:lo + tile, :]
            if with_argmax:
                # flat point index of the slice-local winner (lowest on ties)
                j_t = (ni * stream + k * inner + row_io) * groups + lane_g
                rsel = h == rowmax[:, None, :]
                rj = jnp.min(
                    jnp.where(rsel, jnp.broadcast_to(j_t, h.shape),
                              jnp.int32(2**30)),
                    axis=1,
                )
                upd = rowmax > old
                idx_ref[0, lo:lo + tile, :] = jnp.where(
                    upd, rj, idx_ref[0, lo:lo + tile, :]
                )
                out_ref[0, lo:lo + tile, :] = jnp.where(upd, rowmax, old)
            else:
                out_ref[0, lo:lo + tile, :] = jnp.maximum(old, rowmax)

        # unrolled (compute-slice x center-tile) loop with static offsets;
        # a pair runs only when the host-side AABB bitmap says the slice
        # can hold in-radius points for the tile
        for k in range(slices):
            s = k * inner
            geo_c = geo_ref[0, s:s + inner, :][None]  # (1, inner, 4G)
            a_c = a_ref[0, s:s + inner, :][None]      # (1, inner, G*H1)
            for t in range(n_tiles):
                @pl.when(act_ref[0, t, ni * slices + k] > 0)
                def _(t=t, k=k, geo_c=geo_c, a_c=a_c):
                    body(t, k, geo_c, a_c)

    return kernel


def _prologue(xyz, centers, weights, biases, radius, features, mask,
              center_tile: int, stream: int, inner: int, compute_dtype,
              interpret: bool, cull: str, reuse=None):
    """Shared fwd/bwd packing: lane groups, layer-1 terms, culling bitmap,
    block-diagonal tail weights.  Returns a dict of kernel operands; the
    backward pass MUST see bit-identical packed inputs so its recomputed
    activations match the forward's winners exactly.

    ``reuse``: optional dict of forward residuals — ``geo``/``a_p`` (the
    packed point operands, tiling-independent) and/or ``active`` (the cull
    bitmap at THIS (center_tile, inner) granularity).  Present entries skip
    their recompute: the backward otherwise re-runs the layer-1 point
    matmul, the lane packing, and the N x P cull pre-pass per center-split
    (the r4 "double prologue", ~2-4 ms of the train step)."""
    b, n, _ = xyz.shape
    p = centers.shape[1]
    w1, b1 = weights[0], biases[0]
    h1 = w1.shape[1]
    h3 = weights[-1].shape[-1]
    reuse = reuse or {}

    groups = max(1, 128 // h1)
    while n % groups != 0 and groups > 1:
        groups //= 2

    w1x = w1[:3].astype(jnp.float32)
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
    if "geo" in reuse:
        geo, a_p = reuse["geo"], reuse["a_p"]
    else:
        a = jnp.dot(xyz, w1x, preferred_element_type=jnp.float32)
        if features is not None:
            a = a + jnp.dot(
                features, w1[3:].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
        a = a + b1  # (B, N, H1)
        a_p = a.reshape(b, np_rows, groups * h1)
        # geometry block: per group [x, y, z, invalid]  -> (B, N/G, 4G)
        geo = jnp.concatenate([xyz, inval], axis=-1).reshape(
            b, np_rows, groups * 4)

    # --- host-side culling bitmap ---------------------------------------
    # a (sub-chunk x center-tile) visit is skipped when NO pair in it can
    # be in-radius; sub-chunk s covers points [s·inner·G, (s+1)·inner·G)
    n_sub = np_rows // inner
    n_tiles = p // center_tile
    if "active" in reuse:
        active = reuse["active"]
        assert active.shape == (b, n_tiles, n_sub), (
            active.shape, (b, n_tiles, n_sub))
    elif cull == "exact":
        # exact necessity: min pairwise d² per block via the tiny VPU
        # pre-pass kernel (block_min_d2_pallas) + a lane-group min.
        # Offline study (cubic Morton, KITTI-like clouds): AABB boxes
        # overshoot ~3x — 16.9% of visits survive the box test but only
        # 5.8% actually hold an in-radius pair.  The pre-pass uses the
        # same dx² form as the main kernel, so the only cross-boundary
        # disagreement is the main kernel's bf16 e2-matmul rounding
        # (~0.4% relative) — covered by the threshold margin below.
        d2_sub = block_min_d2_pallas(
            xyz, _BIG * inval[..., 0], centers, inner * groups,
            interpret=interpret,
        )                                          # (B, n_sub, P)
        d2_lb = jnp.min(
            d2_sub.reshape(b, n_sub, n_tiles, center_tile), axis=3
        ) * (1.0 - 1e-2) - 1e-3                    # (B, n_sub, n_tiles)
    else:  # "aabb": box-distance lower bound (no N x P pre-pass)
        pts_sub = xyz.reshape(b, n_sub, inner * groups, 3)
        valid_sub = (inval < 0.5).reshape(b, n_sub, inner * groups, 1)
        s_lo = jnp.min(jnp.where(valid_sub, pts_sub, jnp.inf), axis=2)
        s_hi = jnp.max(jnp.where(valid_sub, pts_sub, -jnp.inf), axis=2)
        c_tiles = centers.reshape(b, n_tiles, center_tile, 3)
        t_lo = jnp.min(c_tiles, axis=2)
        t_hi = jnp.max(c_tiles, axis=2)
        gap = jnp.maximum(
            jnp.maximum(
                s_lo[:, :, None, :] - t_hi[:, None, :, :],
                t_lo[:, None, :, :] - s_hi[:, :, None, :],
            ),
            0.0,
        )
        d2_lb = jnp.sum(gap * gap, axis=-1)       # (B, n_sub, n_tiles)
    if "active" not in reuse:
        # (B, n_tiles, n_sub): whole per-cloud bitmap resident in SMEM,
        # indexed [t, ni] (SMEM blocks need full trailing dims; dynamic
        # scalar reads ok)
        active = (d2_lb < r2_max).astype(jnp.int32).transpose(0, 2, 1)

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

    return dict(
        b=b, n=n, p=p, h1=h1, h3=h3, groups=groups, np_rows=np_rows,
        n_sub=n_sub, n_tiles=n_tiles, geo=geo, a_p=a_p, active=active,
        cts_t=cts_t, bc_t=bc_t, r2_p=r2_p, e2=e2, tail_w=tail_w,
        tail_b=tail_b,
    )


@functools.partial(
    jax.jit,
    static_argnames=("radius", "center_tile", "stream", "inner",
                     "compute_dtype", "interpret", "with_argmax", "d2_mode",
                     "cull", "return_residuals"),
)
def _ball_mlp_max_pallas_impl(xyz, centers, weights, biases, radius,
                              features, mask, center_tile: int, stream: int,
                              inner: int, compute_dtype, interpret: bool,
                              with_argmax: bool = False,
                              d2_mode: str = "f32", cull: str = "exact",
                              return_residuals: bool = False):
    pk = _prologue(xyz, centers, weights, biases, radius, features, mask,
                   center_tile, stream, inner, compute_dtype, interpret, cull)
    b, p, h3 = pk["b"], pk["p"], pk["h3"]
    groups, np_rows, n_tiles = pk["groups"], pk["np_rows"], pk["n_tiles"]
    geo, a_p, active = pk["geo"], pk["a_p"], pk["active"]
    cts_t, bc_t, r2_p, e2 = pk["cts_t"], pk["bc_t"], pk["r2_p"], pk["e2"]
    tail_w, tail_b = pk["tail_w"], pk["tail_b"]
    h1 = pk["h1"]
    n_sub = pk["n_sub"]
    n_tail = len(weights) - 1

    grid = (b, np_rows // stream)

    def vm(block, index_map):
        return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)

    in_specs = [
        vm((1, stream, groups * 4), lambda bi, ni: (bi, ni, 0)),    # geo
        vm((1, stream, groups * h1), lambda bi, ni: (bi, ni, 0)),   # a_p
        pl.BlockSpec((1, n_tiles, n_sub), lambda bi, ni: (bi, 0, 0),
                     memory_space=pltpu.SMEM),                       # active
        vm((1, p, 1, groups * 4), lambda bi, ni: (bi, 0, 0, 0)),    # cts_t
        vm((1, p, 1, groups * h1), lambda bi, ni: (bi, 0, 0, 0)),   # bc_t
        pl.BlockSpec(memory_space=pltpu.VMEM),                      # r2_p
        pl.BlockSpec(memory_space=pltpu.VMEM),                      # e2
    ]
    args = [geo, a_p, active, cts_t, bc_t, r2_p, e2]
    for w, bb in zip(tail_w, tail_b):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(w)
        args.append(bb)

    kernel = _make_kernel(n_tail, n_tiles, center_tile, stream, inner,
                          compute_dtype, groups, h3, with_argmax, d2_mode)

    out_spec = pl.BlockSpec(
        (1, p, groups * h3), lambda bi, ni: (bi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    if with_argmax:
        out_shape = (
            jax.ShapeDtypeStruct((b, p, groups * h3), jnp.float32),
            jax.ShapeDtypeStruct((b, p, groups * h3), jnp.int32),
        )
        out_specs = (out_spec, out_spec)
    else:
        out_shape = jax.ShapeDtypeStruct((b, p, groups * h3), jnp.float32)
        out_specs = out_spec

    result = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*args)

    # reduce over the packed groups + empty-ball guard (tiny XLA ops)
    packed = result[0] if with_argmax else result
    vals = packed.reshape(b, p, groups, h3)
    out = jnp.max(vals, axis=2)
    guarded = jnp.where(out <= _NEG / 2, 0.0, out)
    if not with_argmax:
        if return_residuals:
            # forward residuals for the backward pass: the packed point
            # operands (tiling-independent) + the cull bitmap (valid at
            # this (center_tile, inner); _remap_active re-derives others)
            return guarded, (pk["geo"], pk["a_p"], pk["active"])
        return guarded

    idx = result[1].reshape(b, p, groups, h3)
    gstar = jnp.argmax(vals, axis=2)                       # (B, P, H3)
    jstar = jnp.take_along_axis(idx, gstar[:, :, None, :], axis=2)[:, :, 0, :]
    jstar = jnp.where(out <= _NEG / 2, -1, jstar)
    return guarded, jstar


def _tile_sizes(xyz, centers, weights, center_tile, stream, inner):
    p = centers.shape[1]
    center_tile = min(center_tile, p)
    while p % center_tile != 0:
        center_tile //= 2
    n = xyz.shape[1]
    groups = max(1, 128 // weights[0].shape[1])
    while n % groups != 0 and groups > 1:
        groups //= 2
    np_rows = n // groups
    stream = min(stream, np_rows)
    while np_rows % stream != 0 and stream > 1:
        stream //= 2
    inner = min(inner, stream)
    while stream % inner != 0 and inner > 1:
        inner //= 2
    return center_tile, stream, inner


# the forward's default tiling; the backward mirrors this to decide whether
# a saved cull bitmap applies directly or needs _remap_active
FWD_TILES = (16, 32, 32)


def ball_mlp_max_pallas(xyz, centers, weights, biases, radius,
                        features=None, mask=None,
                        center_tile: int = FWD_TILES[0],
                        stream: int = FWD_TILES[1],
                        inner: int = FWD_TILES[2],
                        compute_dtype=jnp.bfloat16,
                        interpret: bool = False, d2_mode: str = "f32",
                        cull: str = "exact", return_residuals: bool = False,
                        **_ignored):
    """Pallas TPU implementation of ops.fused_sa.ball_mlp_max.

    center_tile: centers processed per unrolled kernel iteration (smaller
    tiles cull better, more unrolled code); stream: packed point rows
    DMA'd per grid step (stream * G points); inner: rows per compute slice
    inside the kernel — the culling granularity, and it bounds the live
    VMEM temporaries (inner=32 keeps each body's activations ~2 MB).
    d2_mode: distance-matmul precision for A/B only — "f32" (default) and
    "bf16" are measured bit-identical at identical time on TPU (sweep:
    scripts/sweep_fused_sa.py).
    cull: "exact" (default) computes the per-visit min pairwise distance
    in an XLA pre-pass and skips every unnecessary visit; "aabb" uses the
    box-distance lower bound (A/B only — strictly more visits).
    """
    center_tile, stream, inner = _tile_sizes(
        xyz, centers, weights, center_tile, stream, inner
    )
    return _ball_mlp_max_pallas_impl(
        xyz, centers, tuple(weights), tuple(biases), radius, features, mask,
        center_tile, stream, inner, compute_dtype, interpret,
        d2_mode=d2_mode, cull=cull, return_residuals=return_residuals,
    )


def ball_mlp_max_pallas_argmax(xyz, centers, weights, biases, radius,
                               features=None, mask=None,
                               center_tile: int = 16, stream: int = 32,
                               inner: int = 32, compute_dtype=jnp.bfloat16,
                               interpret: bool = False,
                               d2_mode: str = "f32", cull: str = "exact"):
    """Like ball_mlp_max_pallas, but also returns the flat winner index per
    (center, output column): (out (B,P,H3) f32, jstar (B,P,H3) i32, -1 for
    empty balls).  Used by the argmax-based backward pass (ops/fused_sa.py),
    which re-evaluates the MLP chain only at the winning pairs."""
    center_tile, stream, inner = _tile_sizes(
        xyz, centers, weights, center_tile, stream, inner
    )
    return _ball_mlp_max_pallas_impl(
        xyz, centers, tuple(weights), tuple(biases), radius, features, mask,
        center_tile, stream, inner, compute_dtype, interpret,
        with_argmax=True, d2_mode=d2_mode, cull=cull,
    )


# ---------------------------------------------------------------------------
# Backward kernel: equality-select gradient streaming
# ---------------------------------------------------------------------------

def _make_bwd_kernel(n_tail: int, n_tiles: int, tile: int, stream: int,
                     inner: int, compute_dtype, groups: int, h3: int,
                     d2_mode: str):
    """Gradient kernel with the forward's grid + culling.

    Each visited (sub-chunk, center-tile) pair recomputes the forward
    activation chain bit-identically, selects winning rows by equality with
    the forward output (``h == out[p, c]``), and back-propagates the tail
    MLP on the spot, accumulating:

      * dW/db per tail layer   — resident (gh_in, gh_out) f32 across the grid,
      * d(a) per point row     — the layer-1 per-point term's cotangent,
      * d(bc) per center       — the layer-1 per-center term's cotangent.

    No winner indices are ever stored or gathered: the forward runs the
    PLAIN kernel (no argmax tracking) and the backward never materializes a
    (B, P*H3)-row gather — both measured multi-ms costs at KITTI scale.

    Tie semantics: every row achieving the maximum receives the full
    cotangent (the argmax path gives it to the lowest index; the XLA scan
    VJP splits it evenly).  All three coincide when the winner is unique —
    exact float ties between distinct points are the only divergence.
    """
    slices = stream // inner

    def kernel(geo_ref, a_ref, act_ref, cts_ref, bc_ref, r2_ref, e2_ref,
               gt_ref, outt_ref, *rest):
        tail = rest[:2 * n_tail]
        tail_wT = rest[2 * n_tail:3 * n_tail]
        outs = rest[3 * n_tail:]
        da_ref, dbc_ref = outs[0], outs[1]
        dw_refs = outs[2:2 + n_tail]
        db_refs = outs[2 + n_tail:]
        bi = pl.program_id(0)
        ni = pl.program_id(1)

        p = dbc_ref.shape[1]
        gh1 = dbc_ref.shape[2]
        gh3 = outt_ref.shape[2]

        @pl.when(jnp.logical_and(bi == 0, ni == 0))
        def _():
            for li in range(n_tail):
                dw_refs[li][:, :] = jnp.zeros(dw_refs[li].shape, jnp.float32)
                db_refs[li][:, :] = jnp.zeros(db_refs[li].shape, jnp.float32)

        @pl.when(ni == 0)
        def _():
            dbc_ref[0] = jnp.zeros((p, gh1), jnp.float32)

        da_ref[0] = jnp.zeros((stream, gh1), jnp.float32)

        e2 = e2_ref[:, :]
        r2 = r2_ref[:, :, :]

        def body(t, k, geo_c, a_c):
            lo = t * tile
            cts = cts_ref[0, lo:lo + tile]       # (tile, 1, 4G)
            bc = bc_ref[0, lo:lo + tile]         # (tile, 1, G*H1)
            outt = outt_ref[0, lo:lo + tile, :]  # (tile, G*H3)
            gt = gt_ref[0, lo:lo + tile, :]      # (tile, G*H3)

            # ---- forward recompute: bit-identical to _make_kernel ------
            dx = geo_c - cts
            dx2 = (dx * dx).reshape(tile * inner, -1)
            if d2_mode == "bf16":
                d2_cols = jnp.dot(
                    dx2.astype(jnp.bfloat16), e2.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
            else:
                d2_cols = jnp.dot(dx2, e2, preferred_element_type=jnp.float32)
            d2_cols = d2_cols.reshape(tile, inner, gh3)

            pre = jnp.maximum(a_c + bc, 0.0)     # (tile, inner, G*H1)
            h = jnp.broadcast_to(pre, (tile, inner, pre.shape[-1]))
            hs = [h.reshape(tile * inner, -1)]
            for li in range(n_tail):
                w = tail[2 * li][:, :].astype(compute_dtype)
                b = tail[2 * li + 1][:, :]
                acc = jnp.dot(hs[-1].astype(compute_dtype), w,
                              preferred_element_type=jnp.float32)
                hs.append(jnp.maximum(acc + b.astype(jnp.float32), 0.0))

            # ---- winner selection by equality with the fwd output ------
            hm = jnp.where(d2_cols < r2,
                           hs[-1].reshape(tile, inner, gh3), _NEG)
            sel = hm == outt[:, None, :]
            delta = jnp.where(sel, gt[:, None, :], 0.0)
            delta = delta.reshape(tile * inner, gh3)

            # ---- tail backprop + accumulation --------------------------
            # backward matmuls run in compute_dtype with f32 accumulation
            # (f32 operands cost multiple MXU passes per matmul — measured
            # ~2x on the whole backward kernel at flagship shape)
            for li in range(n_tail - 1, -1, -1):
                # relu' of this layer's output
                delta = delta * (hs[li + 1] > 0.0).astype(jnp.float32)
                dw_refs[li][:, :] += jax.lax.dot_general(
                    hs[li].astype(compute_dtype), delta.astype(compute_dtype),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                db_refs[li][:, :] += jnp.sum(delta, axis=0, keepdims=True)
                delta = jnp.dot(
                    delta.astype(compute_dtype), tail_wT[li][:, :],
                    preferred_element_type=jnp.float32,
                )
            # relu' of the layer-1 pre-activation
            d0 = (delta * (hs[0] > 0.0).astype(jnp.float32)).reshape(
                tile, inner, gh1
            )
            da_ref[0, k * inner:(k + 1) * inner, :] += jnp.sum(d0, axis=0)
            dbc_ref[0, lo:lo + tile, :] += jnp.sum(d0, axis=1)

        for k in range(slices):
            s = k * inner
            geo_c = geo_ref[0, s:s + inner, :][None]  # (1, inner, 4G)
            a_c = a_ref[0, s:s + inner, :][None]      # (1, inner, G*H1)
            for t in range(n_tiles):
                @pl.when(act_ref[0, t, ni * slices + k] > 0)
                def _(t=t, k=k, geo_c=geo_c, a_c=a_c):
                    body(t, k, geo_c, a_c)

    return kernel


def _remap_active(active, fwd_ct: int, fwd_inner: int, bwd_ct: int,
                  bwd_inner: int):
    """Re-derive a cull bitmap saved at (fwd_ct, fwd_inner) granularity for
    a backward tiling (bwd_ct, bwd_inner).  Finer axes repeat the parent
    block's bit (a superset of visits — extra visits select nothing, so
    gradients are unchanged); coarser axes take the union.  Returns None
    when the granularities don't divide (caller recomputes)."""

    def remap(arr, axis, src, dst):
        if src == dst:
            return arr
        if dst < src and src % dst == 0:
            return jnp.repeat(arr, src // dst, axis=axis)
        if dst > src and dst % src == 0:
            r = dst // src
            b, t, s = arr.shape
            if axis == 1:
                return arr.reshape(b, t // r, r, s).max(axis=2)
            return arr.reshape(b, t, s // r, r).max(axis=3)
        return None

    out = remap(active, 1, fwd_ct, bwd_ct)
    if out is None:
        return None
    return remap(out, 2, fwd_inner, bwd_inner)


@functools.partial(
    jax.jit,
    static_argnames=("radius", "center_tile", "stream", "inner",
                     "compute_dtype", "interpret", "d2_mode", "cull"),
)
def _ball_mlp_bwd_impl(xyz, centers, weights, biases, radius, g, out,
                       features, mask, center_tile: int, stream: int,
                       inner: int, compute_dtype, interpret: bool,
                       d2_mode: str = "f32", cull: str = "exact",
                       reuse_geo=None, reuse_a=None, reuse_active=None):
    reuse = {}
    if reuse_geo is not None:
        reuse["geo"] = reuse_geo
        reuse["a_p"] = reuse_a
    if reuse_active is not None:
        reuse["active"] = reuse_active
    pk = _prologue(xyz, centers, weights, biases, radius, features, mask,
                   center_tile, stream, inner, compute_dtype, interpret, cull,
                   reuse=reuse or None)
    b, p, h1, h3 = pk["b"], pk["p"], pk["h1"], pk["h3"]
    groups, np_rows, n_tiles = pk["groups"], pk["np_rows"], pk["n_tiles"]
    n_sub = pk["n_sub"]
    n_tail = len(weights) - 1

    # packed (B, P, G*H3) cotangent + forward-output comparison target.
    # ``out`` is the guarded output (empty balls -> 0.0): masked rows carry
    # _NEG which never equals it, so empty balls select nothing — and a
    # genuine 0.0 winner matches rows whose relu clamped to exactly 0,
    # where relu' kills the gradient anyway (scan-VJP does the same).
    gt = jnp.tile(g.astype(jnp.float32), (1, 1, groups))
    outt = jnp.tile(out.astype(jnp.float32), (1, 1, groups))

    tail_wT = [jnp.swapaxes(w, 0, 1) for w in pk["tail_w"]]

    grid = (b, np_rows // stream)
    gh1 = groups * h1
    gh3 = groups * h3

    def vm(block, index_map):
        return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)

    in_specs = [
        vm((1, stream, groups * 4), lambda bi, ni: (bi, ni, 0)),    # geo
        vm((1, stream, gh1), lambda bi, ni: (bi, ni, 0)),           # a_p
        pl.BlockSpec((1, n_tiles, n_sub), lambda bi, ni: (bi, 0, 0),
                     memory_space=pltpu.SMEM),                       # active
        vm((1, p, 1, groups * 4), lambda bi, ni: (bi, 0, 0, 0)),    # cts_t
        vm((1, p, 1, gh1), lambda bi, ni: (bi, 0, 0, 0)),           # bc_t
        pl.BlockSpec(memory_space=pltpu.VMEM),                      # r2_p
        pl.BlockSpec(memory_space=pltpu.VMEM),                      # e2
        vm((1, p, gh3), lambda bi, ni: (bi, 0, 0)),                 # gt
        vm((1, p, gh3), lambda bi, ni: (bi, 0, 0)),                 # outt
    ]
    args = [pk["geo"], pk["a_p"], pk["active"], pk["cts_t"], pk["bc_t"],
            pk["r2_p"], pk["e2"], gt, outt]
    for w, bb in zip(pk["tail_w"], pk["tail_b"]):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(w)
        args.append(bb)
    for wT in tail_wT:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(wT)

    out_shape = [
        jax.ShapeDtypeStruct((b, np_rows, gh1), jnp.float32),   # da
        jax.ShapeDtypeStruct((b, p, gh1), jnp.float32),         # dbc
    ]
    out_specs = [
        vm((1, stream, gh1), lambda bi, ni: (bi, ni, 0)),
        vm((1, p, gh1), lambda bi, ni: (bi, 0, 0)),
    ]
    for w in pk["tail_w"]:
        out_shape.append(
            jax.ShapeDtypeStruct((w.shape[0], w.shape[1]), jnp.float32))
        out_specs.append(vm((w.shape[0], w.shape[1]), lambda bi, ni: (0, 0)))
    for bb in pk["tail_b"]:
        out_shape.append(jax.ShapeDtypeStruct((1, bb.shape[1]), jnp.float32))
        out_specs.append(vm((1, bb.shape[1]), lambda bi, ni: (0, 0)))

    kernel = _make_bwd_kernel(n_tail, n_tiles, center_tile, stream, inner,
                              compute_dtype, groups, h3, d2_mode)
    results = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(*args)

    da_p, dbc_p = results[0], results[1]
    dw_packed = results[2:2 + n_tail]
    db_packed = results[2 + n_tail:]

    # --- unpack the lane groups (tiny XLA ops) --------------------------
    n = pk["n"]
    da = da_p.reshape(b, n, h1)
    dbc = dbc_p.reshape(b, p, groups, h1).sum(axis=2)
    dw_tail = []
    db_tail = []
    for li in range(n_tail):
        hi = weights[1 + li].shape[0]
        ho = weights[1 + li].shape[1]
        dw_tail.append(jnp.einsum(
            "gigo->io", dw_packed[li].reshape(groups, hi, groups, ho)))
        db_tail.append(db_packed[li].reshape(groups, ho).sum(axis=0))
    return da, dbc, tuple(dw_tail), tuple(db_tail)


def ball_mlp_max_bwd_pallas(xyz, centers, weights, biases, radius, g, out,
                            features=None, mask=None, center_tile: int = 64,
                            stream: int = 16, inner: int = 16,
                            compute_dtype=jnp.bfloat16,
                            interpret: bool = False, d2_mode: str = "f32",
                            cull: str = "exact", center_splits: int = 1,
                            residuals=None):
    """Equality-select backward for ball_mlp_max_pallas.

    Args:
      g: (B, P, H3) cotangent of the forward output.
      out: (B, P, H3) the forward's own (guarded) output — the winner
        comparison target.  Must come from ball_mlp_max_pallas with the
        same tile/dtype settings so the recomputed activations match.

    Returns ``(da, dbc, dw_tail, db_tail)``: cotangents of the layer-1
    per-point term ``a = x·W1x + f·W1f + b1`` (B, N, H1), the per-center
    term ``bc = -c·W1x`` (B, P, H1), and the tail weights/biases.  The
    caller assembles layer-1/input gradients from da/dbc (ops/fused_sa.py
    ``_kernel_grads``).

    Tile sizes deliberately differ from the forward's (64/16/16 vs
    16/32/32): every per-pair value depends only on that pair's inputs
    (contractions run over the fixed K axis), so the recomputed
    activations are bitwise-identical under ANY tiling and the equality
    select stays exact; coarser culling only *adds* zero-delta visits,
    never skips a winner.  The forward's tiles are cull-optimal, but the
    backward body carries ~2.5x the ops and the fully-unrolled
    (slices x n_tiles) loop at the forward's tiling tips Mosaic into a
    pathological codegen regime — measured 102 ms vs 17 ms at the
    flagship shape (B16 x 16k pts, P=1024) for bit-identical results.

    ``center_splits`` > 1 escapes that cliff structurally: the P centers
    are split into that many independent pallas_calls, each with P/splits
    centers resident — the unrolled body count (and thus Mosaic's program
    size) shrinks by the split factor while the CULLING granularity stays
    at ``center_tile``.  Cost: the point stream re-runs per split, but
    that is HBM traffic (~10 GB/s-scale per pass), not a relay transfer —
    measured in the tile sweep.  Gradients combine exactly (per-center
    outputs concatenate; per-point/weight cotangents sum — linearity of
    the loss over disjoint center sets).
    """
    center_tile, stream, inner = _tile_sizes(
        xyz, centers, weights, center_tile, stream, inner
    )
    p = centers.shape[1]

    # forward residual reuse: skip the layer-1 point matmul + lane packing
    # and the N x P cull pre-pass (per split) — the r4 "double prologue"
    geo_r = a_r = act_r = None
    if residuals is not None:
        geo_r, a_r, act_r = residuals
        # the saved bitmap's granularity is the forward's effective tiling
        # (ball_mlp_max_pallas defaults clamped by _tile_sizes)
        f_ct, _f_st, f_in = _tile_sizes(xyz, centers, weights, *FWD_TILES)
        act_r = _remap_active(act_r, f_ct, f_in, center_tile, inner)

    splits = max(1, int(center_splits))
    while splits > 1 and (p % splits or (p // splits) % center_tile):
        splits -= 1
    if splits == 1:
        return _ball_mlp_bwd_impl(
            xyz, centers, tuple(weights), tuple(biases), radius, g, out,
            features, mask, center_tile, stream, inner, compute_dtype,
            interpret, d2_mode=d2_mode, cull=cull,
            reuse_geo=geo_r, reuse_a=a_r, reuse_active=act_r,
        )
    ps = p // splits
    tiles_ps = ps // center_tile
    da = None
    dbc_parts = []
    dw_sum = None
    db_sum = None
    for s in range(splits):
        lo = s * ps
        act_s = (None if act_r is None
                 else act_r[:, s * tiles_ps:(s + 1) * tiles_ps, :])
        da_s, dbc_s, dw_s, db_s = _ball_mlp_bwd_impl(
            xyz, centers[:, lo:lo + ps], tuple(weights), tuple(biases),
            radius, g[:, lo:lo + ps], out[:, lo:lo + ps],
            features, mask, center_tile, stream, inner, compute_dtype,
            interpret, d2_mode=d2_mode, cull=cull,
            reuse_geo=geo_r, reuse_a=a_r, reuse_active=act_s,
        )
        da = da_s if da is None else da + da_s
        dbc_parts.append(dbc_s)
        if dw_sum is None:
            dw_sum, db_sum = list(dw_s), list(db_s)
        else:
            dw_sum = [acc + w for acc, w in zip(dw_sum, dw_s)]
            db_sum = [acc + bb for acc, bb in zip(db_sum, db_s)]
    return (da, jnp.concatenate(dbc_parts, axis=1),
            tuple(dw_sum), tuple(db_sum))
