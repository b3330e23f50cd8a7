"""Pallas TPU kernel: furthest point sampling, all clouds in one instance.

Sequential argmax selection with every cloud resident in VMEM — the XLA
fallback dispatches one tiny HBM-bound step per selected point, this kernel
keeps the running min-distance caches on-chip.

v4 kernel (``_fps_kernel_wide``) — cloud-per-sublane layout:

  xyz   (3, B, N) f32   coordinate planes, cloud bi = sublane row bi
  m     (B, N)    f32   validity (0/1)
  out   (B, P)    i32   selected indices

Every per-iteration op (distance update, running min, max, tie-broken
argmax, coordinate extraction of the winner) is ONE full-width VPU op over
the (B, N) plane, with per-cloud values living in a (B, 1) column: per-cloud
reductions are plain lane-axis reductions and broadcasts, no unrolling, no
relayouts.  Selected indices accumulate into a (B, P) VMEM scratch via a
one-hot column write (dynamic-store-free).  Replaced the v2 per-cloud
unrolled body (one (128, N/128) op chain per cloud per iteration — 16x the
op dispatches; measured 9.3 ms vs 2.6 ms for 16x16k clouds, npoint=1024).

Matches the reference CUDA kernel's semantics (start at the first valid
index, ties -> lowest index; reference extern/pointnet2.patch:306-320) and
is bit-exact against the XLA fallback.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["furthest_point_sample_pallas", "fps_pallas_available"]


def fps_pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def _fps_kernel_wide(npoint: int, n: int):
    """v4 body: every op is one (B, N) plane-wide VPU op."""
    big_i = 2**30  # python int: jnp scalars would be captured consts

    def kernel(xyz_ref, m_ref, out_ref, dists_ref):
        b = m_ref.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
        p_iota = jax.lax.broadcasted_iota(jnp.int32, (b, npoint), 1)

        valid = m_ref[:, :] > 0.5
        dists_ref[:, :] = jnp.where(valid, 1e10, -1.0)
        # first pick per cloud: lowest-index valid point; a fully-masked
        # cloud (no valid lane) pins to 0 so consumers never see an
        # out-of-range index
        first = jnp.min(jnp.where(valid, lane, big_i), axis=1, keepdims=True)
        first = jnp.where(first == big_i, 0, first)
        out_ref[:, :] = jnp.where(p_iota == 0, first, 0)

        def body(i, last):
            # winner coordinates via select-reduce (no dynamic lane reads)
            hit = lane == last                     # (B, N)
            d2 = None
            for k in range(3):
                plane = xyz_ref[k]
                ck = jnp.sum(jnp.where(hit, plane, 0.0), axis=1,
                             keepdims=True)        # (B, 1)
                dx = plane - ck
                d2 = dx * dx if d2 is None else d2 + dx * dx
            # invalid points are pinned at -1; d2 >= 0 keeps them there
            dists = jnp.minimum(dists_ref[:, :], d2)
            dists_ref[:, :] = dists
            mx = jnp.max(dists, axis=1, keepdims=True)
            nxt = jnp.min(jnp.where(dists == mx, lane, big_i), axis=1,
                          keepdims=True)           # ties -> lowest index
            out_ref[:, :] += jnp.where(p_iota == i, nxt, 0)
            return nxt

        jax.lax.fori_loop(1, npoint, body, first)

    return kernel


@functools.partial(jax.jit, static_argnames=("npoint",))
def _fps_pallas_wide(xyz, npoint: int, mask=None):
    b, n, _ = xyz.shape
    planes = jnp.transpose(xyz, (2, 0, 1))  # (3, B, N)
    if mask is None:
        m = jnp.ones((b, n), jnp.float32)
    else:
        m = mask.astype(jnp.float32)

    return pl.pallas_call(
        _fps_kernel_wide(npoint, n),
        out_shape=jax.ShapeDtypeStruct((b, npoint), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((b, n), jnp.float32)],
    )(planes, m)


def _max_clouds_per_call(n: int) -> int:
    """Largest batch slice whose VMEM residency fits the scoped limit.

    The kernel keeps xyz planes (3*B*N), the mask (B*N) and the running
    min-distance scratch (B*N) in VMEM — 5*B*N f32 words.  The TPU scoped
    vmem limit is 16 MB; budget 14 MB to leave room for the output and
    compiler temporaries, and round down to a sublane multiple (8).
    """
    budget_words = (14 << 20) // 4
    b = max(1, budget_words // (5 * n))
    return max(8, (b // 8) * 8) if b >= 8 else b


def furthest_point_sample_pallas(xyz, npoint: int, mask=None):
    """(B, N, 3) f32 [+ (B, N) mask] -> (B, npoint) int32 indices.

    Batches larger than one call's VMEM residency are processed in
    slices; FPS is independent per cloud, so slicing is exact.
    """
    b, n, _ = xyz.shape
    step = _max_clouds_per_call(n)
    if b <= step:
        return _fps_pallas_wide(xyz, npoint, mask=mask)
    outs = []
    for s in range(0, b, step):
        sl = slice(s, min(s + step, b))
        outs.append(_fps_pallas_wide(
            xyz[sl], npoint, mask=None if mask is None else mask[sl]))
    return jnp.concatenate(outs, axis=0)
