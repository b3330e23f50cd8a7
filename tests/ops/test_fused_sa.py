"""Fused SA path: equivalence with the exact (index-based) path, the Pallas
kernel (interpret mode), and gradient flow."""
import jax
import jax.numpy as jnp
import numpy as np

from deepclr_tpu.models.pointnet2 import SetAbstractionMSG
from deepclr_tpu.ops.fused_sa import (
    ball_mlp_max_xla,
    multi_scale_bundle,
)
from deepclr_tpu.ops.pallas.fused_sa_kernel import ball_mlp_max_pallas

B, N, P = 2, 256, 32


def _data(seed=0, feat_dim=1):
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    feat = jnp.asarray(rng.normal(size=(B, N, feat_dim)).astype(np.float32))
    mask = np.ones((B, N), bool)
    mask[0, 200:] = False
    return xyz, feat, jnp.asarray(mask)


def _params(seed=1, in_dim=4, mlp=(8, 8, 16), scales=2):
    rng = np.random.default_rng(seed)
    sw, sb = [], []
    for _ in range(scales):
        dims = [in_dim, *mlp]
        ws = [jnp.asarray(rng.normal(size=(dims[i], dims[i + 1])).astype(np.float32) * 0.3)
              for i in range(len(mlp))]
        bs = [jnp.asarray(rng.normal(size=(dims[i + 1],)).astype(np.float32) * 0.1)
              for i in range(len(mlp))]
        sw.append(ws)
        sb.append(bs)
    return sw, sb


def test_fused_equals_exact_when_nsample_covers_all():
    """With nsample >= all possible hits, the reference truncation is a no-op
    and both SetAbstraction paths must agree."""
    xyz, feat, mask = _data()
    module_args = dict(
        npoint=P, radii=(0.8, 1.5), nsamples=(N, N),
        mlps=((8, 8, 16), (8, 8, 16)),
    )
    m_fused = SetAbstractionMSG(fused=True, **module_args)
    m_exact = SetAbstractionMSG(fused=False, **module_args)
    variables = m_fused.init(jax.random.PRNGKey(0), xyz, feat, mask)

    xyz_f, feat_f = m_fused.apply(variables, xyz, feat, mask)
    xyz_e, feat_e = m_exact.apply(variables, xyz, feat, mask)
    np.testing.assert_allclose(np.asarray(xyz_f), np.asarray(xyz_e), atol=1e-6)
    np.testing.assert_allclose(np.asarray(feat_f), np.asarray(feat_e), atol=1e-4)


def test_multi_scale_bundle_equals_per_scale():
    xyz, feat, mask = _data(seed=2)
    centers = xyz[:, :P, :]
    sw, sb = _params()
    radii = (0.8, 1.5)

    per_scale = [
        np.asarray(ball_mlp_max_xla(
            xyz, centers, tuple(sw[i]), tuple(sb[i]), radii[i],
            features=feat, mask=mask, compute_dtype=jnp.float32,
        ))
        for i in range(2)
    ]
    weights, biases, radius_cols = multi_scale_bundle(sw, sb, radii)
    bundled = np.asarray(ball_mlp_max_xla(
        xyz, centers, tuple(weights), tuple(biases), radius_cols,
        features=feat, mask=mask, compute_dtype=jnp.float32,
    ))
    np.testing.assert_allclose(
        bundled, np.concatenate(per_scale, axis=-1), atol=1e-4
    )


def test_pallas_kernel_matches_xla_interpret():
    xyz, feat, mask = _data(seed=3)
    centers = xyz[:, :P, :]
    sw, sb = _params(seed=4)
    weights, biases, radius_cols = multi_scale_bundle(sw, sb, (0.8, 1.5))

    ref = np.asarray(ball_mlp_max_xla(
        xyz, centers, tuple(weights), tuple(biases), radius_cols,
        features=feat, mask=mask, compute_dtype=jnp.float32,
    ))
    got = np.asarray(ball_mlp_max_pallas(
        xyz, centers, tuple(weights), tuple(biases), radius_cols,
        features=feat, mask=mask, compute_dtype=jnp.float32,
        interpret=True,
    ))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_fused_gradients_flow():
    xyz, feat, mask = _data(seed=5)
    centers = xyz[:, :P, :]
    sw, sb = _params(seed=6, scales=1)

    def loss(ws, bs, feat):
        out = ball_mlp_max_xla(
            xyz, centers, tuple(ws), tuple(bs), 1.0,
            features=feat, mask=mask, compute_dtype=jnp.float32,
        )
        return jnp.sum(out ** 2)

    grads_w, grads_b, grads_f = jax.grad(loss, argnums=(0, 1, 2))(
        sw[0], sb[0], feat
    )
    for g in [*grads_w, *grads_b, grads_f]:
        assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(grads_f))) > 0

    # custom_vjp wrapper (pallas-forward path on TPU, XLA here)
    from deepclr_tpu.ops.fused_sa import ball_mlp_max

    def loss2(ws, bs, feat):
        out = ball_mlp_max(
            xyz, centers, tuple(ws), tuple(bs), 1.0,
            features=feat, mask=mask, compute_dtype=jnp.float32,
        )
        return jnp.sum(out ** 2)

    g2 = jax.grad(loss2, argnums=2)(sw[0], sb[0], feat)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(grads_f), atol=1e-4)


def test_argmax_backward_matches_scan_backward():
    """The TPU winner-only backward must produce the same gradients as
    differentiating the XLA scan (no duplicate points -> unique winners,
    so the subgradients coincide)."""
    from deepclr_tpu.ops.fused_sa import ball_mlp_max

    xyz, feat, mask = _data(seed=11)
    centers = xyz[:, :P, :]
    sw, sb = _params(seed=12)
    weights, biases, radius_cols = multi_scale_bundle(sw, sb, (0.8, 1.5))

    def loss(backward):
        def fn(ws, bs, feat, xyz, centers):
            out = ball_mlp_max(
                xyz, centers, tuple(ws), tuple(bs), radius_cols,
                features=feat, mask=mask, compute_dtype=jnp.float32,
                backward=backward,
            )
            return jnp.sum(out ** 2)
        return fn

    args = (weights, biases, feat, xyz, centers)
    g_scan = jax.grad(loss("scan"), argnums=(0, 1, 2, 3, 4))(*args)
    g_arg = jax.grad(loss("argmax"), argnums=(0, 1, 2, 3, 4))(*args)
    for gs, ga in zip(jax.tree_util.tree_leaves(g_scan),
                      jax.tree_util.tree_leaves(g_arg)):
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gs), atol=2e-3, rtol=1e-3
        )


def test_kernel_backward_matches_scan_backward():
    """The equality-select backward kernel must produce the same gradients
    as differentiating the XLA scan (no duplicate points -> unique winners,
    so the subgradients coincide).  In interpret mode the forward recompute
    is bitwise-identical XLA, so the match is essentially exact."""
    from deepclr_tpu.ops.fused_sa import ball_mlp_max

    xyz, feat, mask = _data(seed=11)
    centers = xyz[:, :P, :]
    sw, sb = _params(seed=12)
    weights, biases, radius_cols = multi_scale_bundle(sw, sb, (0.8, 1.5))

    def loss(backward):
        def fn(ws, bs, feat, xyz, centers):
            out = ball_mlp_max(
                xyz, centers, tuple(ws), tuple(bs), radius_cols,
                features=feat, mask=mask, compute_dtype=jnp.float32,
                backward=backward,
            )
            return jnp.sum(out ** 2)
        return fn

    args = (weights, biases, feat, xyz, centers)
    g_scan = jax.grad(loss("scan"), argnums=(0, 1, 2, 3, 4))(*args)
    g_ker = jax.grad(loss("kernel"), argnums=(0, 1, 2, 3, 4))(*args)
    for gs, gk in zip(jax.tree_util.tree_leaves(g_scan),
                      jax.tree_util.tree_leaves(g_ker)):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gs), atol=2e-3, rtol=1e-3
        )


def test_kernel_backward_no_features():
    """features=None path of the backward kernel (xyz-only layer 1)."""
    from deepclr_tpu.ops.fused_sa import ball_mlp_max

    xyz, _, mask = _data(seed=21)
    centers = xyz[:, :P, :]
    sw, sb = _params(seed=22, in_dim=3, scales=1)

    def loss(backward):
        def fn(ws, bs, xyz, centers):
            out = ball_mlp_max(
                xyz, centers, tuple(ws), tuple(bs), 1.2,
                mask=mask, compute_dtype=jnp.float32, backward=backward,
            )
            return jnp.sum(out ** 2)
        return fn

    args = (sw[0], sb[0], xyz, centers)
    g_scan = jax.grad(loss("scan"), argnums=(0, 1, 2, 3))(*args)
    g_ker = jax.grad(loss("kernel"), argnums=(0, 1, 2, 3))(*args)
    for gs, gk in zip(jax.tree_util.tree_leaves(g_scan),
                      jax.tree_util.tree_leaves(g_ker)):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gs), atol=2e-3, rtol=1e-3
        )


def test_kernel_backward_chained_levels():
    """Two chained fused-SA levels under the kernel backward: level-2's
    input gradients (dxyz/dfeatures) must flow back through level-1 —
    the path a multi-level SetAbstraction exercises but the single-level
    flagship never does."""
    from deepclr_tpu.ops.fused_sa import ball_mlp_max

    xyz, feat, mask = _data(seed=41)
    centers1 = xyz[:, :P, :]
    centers2 = xyz[:, :P // 2, :]
    sw, sb = _params(seed=42, scales=1)
    sw2, sb2 = _params(seed=43, in_dim=3 + 16, mlp=(8, 8, 8), scales=1)

    def loss(backward):
        def fn(ws1, bs1, ws2, bs2, feat):
            f1 = ball_mlp_max(
                xyz, centers1, tuple(ws1), tuple(bs1), 1.0,
                features=feat, mask=mask, compute_dtype=jnp.float32,
                backward=backward,
            )  # (B, P, 16) -> features of the level-2 cloud (centers1)
            out = ball_mlp_max(
                centers1, centers2, tuple(ws2), tuple(bs2), 1.5,
                features=f1, compute_dtype=jnp.float32, backward=backward,
            )
            return jnp.sum(out ** 2)
        return fn

    args = (sw[0], sb[0], sw2[0], sb2[0], feat)
    g_scan = jax.grad(loss("scan"), argnums=(0, 1, 2, 3, 4))(*args)
    g_ker = jax.grad(loss("kernel"), argnums=(0, 1, 2, 3, 4))(*args)
    total = 0.0
    for gs, gk in zip(jax.tree_util.tree_leaves(g_scan),
                      jax.tree_util.tree_leaves(g_ker)):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gs), atol=2e-3, rtol=1e-3
        )
        total += float(jnp.sum(jnp.abs(gk)))
    assert total > 0  # gradients actually flowed through both levels


def test_bwd_kernel_tile_independence():
    """The backward kernel's gradients must be identical under any tiling:
    per-pair values depend only on that pair (contractions run over the
    fixed K axis), which is what licenses the coarser backward tiles."""
    from deepclr_tpu.ops.fused_sa import multi_scale_bundle
    from deepclr_tpu.ops.pallas.fused_sa_kernel import (
        ball_mlp_max_bwd_pallas,
        ball_mlp_max_pallas,
    )

    xyz, feat, mask = _data(seed=31)
    centers = xyz[:, :P, :]
    sw, sb = _params(seed=32)
    weights, biases, rcols = multi_scale_bundle(sw, sb, (0.8, 1.5))
    weights, biases = tuple(weights), tuple(biases)

    out = ball_mlp_max_pallas(
        xyz, centers, weights, biases, rcols, features=feat, mask=mask,
        compute_dtype=jnp.float32, interpret=True,
    )
    g = jnp.ones_like(out)

    ref = None
    for ct, st, inn in ((8, 16, 16), (16, 8, 8), (32, 32, 16)):
        res = ball_mlp_max_bwd_pallas(
            xyz, centers, weights, biases, rcols, g, out,
            features=feat, mask=mask, compute_dtype=jnp.float32,
            center_tile=ct, stream=st, inner=inn, interpret=True,
        )
        leaves = jax.tree_util.tree_leaves(res)
        if ref is None:
            ref = leaves
            continue
        for a, b in zip(leaves, ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-6
            )


def test_argmax_kernel_winner_indices():
    """The argmax output must point at the actual maximizing point per
    (center, column), and -1 for empty balls."""
    from deepclr_tpu.ops.pallas.fused_sa_kernel import (
        ball_mlp_max_pallas_argmax,
    )

    xyz, feat, mask = _data(seed=13)
    centers = xyz[:, :P, :]
    sw, sb = _params(seed=14)
    weights, biases, radius_cols = multi_scale_bundle(sw, sb, (0.8, 1.5))

    out, jstar = jax.jit(
        lambda x, c, f: ball_mlp_max_pallas_argmax(
            x, c, tuple(weights), tuple(biases), radius_cols,
            features=f, mask=mask, compute_dtype=jnp.float32,
            interpret=True,
        )
    )(xyz, centers, feat)
    out = np.asarray(out)
    jstar = np.asarray(jstar)

    # numpy reference: evaluate the MLP at each winner index and compare
    xyz_n, feat_n, mask_n = (np.asarray(xyz), np.asarray(feat),
                             np.asarray(mask))
    w_n = [np.asarray(w) for w in weights]
    b_n = [np.asarray(x) for x in biases]
    r2 = np.asarray(radius_cols) ** 2
    for b in range(B):
        for p in (0, 7, P - 1):
            for c in (0, 5, len(r2) - 1):
                j = jstar[b, p, c]
                if j < 0:
                    assert out[b, p, c] == 0.0
                    continue
                assert mask_n[b, j]
                d2 = ((xyz_n[b, j] - centers[b, p]) ** 2).sum()
                assert d2 < r2[c]
                h = np.concatenate(
                    [xyz_n[b, j] - np.asarray(centers)[b, p], feat_n[b, j]]
                )
                for w, bb in zip(w_n, b_n):
                    h = np.maximum(h @ w + bb, 0.0)
                np.testing.assert_allclose(h[c], out[b, p, c], atol=1e-4)


def test_padding_points_never_contribute():
    xyz, feat, mask = _data(seed=7)
    sw, sb = _params(seed=8, scales=1)
    centers = xyz[:, :P, :]

    out1 = np.asarray(ball_mlp_max_xla(
        xyz, centers, tuple(sw[0]), tuple(sb[0]), 1.0,
        features=feat, mask=mask, compute_dtype=jnp.float32,
    ))
    # corrupt masked-out points: result must not change
    xyz2 = np.asarray(xyz).copy()
    xyz2[0, 200:] = 0.123  # same region masked out
    feat2 = np.asarray(feat).copy()
    feat2[0, 200:] = 99.0
    out2 = np.asarray(ball_mlp_max_xla(
        jnp.asarray(xyz2), centers, tuple(sw[0]), tuple(sb[0]), 1.0,
        features=jnp.asarray(feat2), mask=mask, compute_dtype=jnp.float32,
    ))
    np.testing.assert_allclose(out1, out2, atol=1e-6)


def test_kernel_backward_center_splits_exact():
    """center_splits > 1 must be bit-identical to the single-call backward:
    per-center outputs concatenate, per-point/weight cotangents sum
    (linearity over disjoint center sets)."""
    from deepclr_tpu.ops.pallas.fused_sa_kernel import (
        ball_mlp_max_bwd_pallas,
        ball_mlp_max_pallas,
    )

    xyz, feat, mask = _data(seed=31)
    centers = xyz[:, :P, :]
    sw, sb = _params(seed=32)
    weights, biases, radius_cols = multi_scale_bundle(sw, sb, (0.8, 1.5))

    out = ball_mlp_max_pallas(
        xyz, centers, weights, biases, radius_cols, features=feat,
        mask=mask, compute_dtype=jnp.float32, interpret=True,
    )
    g = jnp.asarray(
        np.random.default_rng(33).normal(size=out.shape).astype(np.float32)
    )

    kwargs = dict(features=feat, mask=mask, compute_dtype=jnp.float32,
                  interpret=True, center_tile=8, stream=16, inner=16)
    ref = ball_mlp_max_bwd_pallas(
        xyz, centers, weights, biases, radius_cols, g, out,
        center_splits=1, **kwargs,
    )
    for splits in (2, 4):
        split = ball_mlp_max_bwd_pallas(
            xyz, centers, weights, biases, radius_cols, g, out,
            center_splits=splits, **kwargs,
        )
        for r, s in zip(jax.tree_util.tree_leaves(ref),
                        jax.tree_util.tree_leaves(split)):
            np.testing.assert_allclose(np.asarray(s), np.asarray(r),
                                       atol=1e-5)


def test_parse_bwd_tiles():
    from deepclr_tpu.ops.fused_sa import _parse_bwd_tiles

    assert _parse_bwd_tiles("16,32,32,4") == [16, 32, 32, 4]
    import pytest

    for bad in ("16,32,32", "a,b,c,d", "16,32,32,0", "16,-1,32,4", ""):
        with pytest.raises(ValueError, match="DEEPCLR_SA_BWD_TILES"):
            _parse_bwd_tiles(bad)


def test_bwd_residual_reuse_bit_identical():
    """Backward with forward residuals (geo/a_p/cull bitmap reuse) must be
    bit-identical to the recompute backward, including when the backward
    tiling differs from the forward's (the _remap_active superset path)
    and under center splits."""
    from deepclr_tpu.ops.fused_sa import multi_scale_bundle
    from deepclr_tpu.ops.pallas.fused_sa_kernel import (
        ball_mlp_max_bwd_pallas,
        ball_mlp_max_pallas,
    )

    xyz, feat, mask = _data(seed=41)
    centers = xyz[:, :P, :]
    sw, sb = _params(seed=42)
    weights, biases, rcols = multi_scale_bundle(sw, sb, (0.8, 1.5))
    weights, biases = tuple(weights), tuple(biases)

    out, res_pack = ball_mlp_max_pallas(
        xyz, centers, weights, biases, rcols, features=feat, mask=mask,
        compute_dtype=jnp.float32, interpret=True, return_residuals=True,
    )
    g = jnp.ones_like(out)

    # same-tiling, finer, coarser, and split backward configs
    for ct, st, inn, splits in ((16, 32, 32, 1), (8, 16, 16, 1),
                                (32, 32, 16, 1), (16, 32, 32, 4)):
        kwargs = dict(
            features=feat, mask=mask, compute_dtype=jnp.float32,
            center_tile=ct, stream=st, inner=inn, interpret=True,
            center_splits=splits,
        )
        base = ball_mlp_max_bwd_pallas(
            xyz, centers, weights, biases, rcols, g, out, **kwargs)
        reused = ball_mlp_max_bwd_pallas(
            xyz, centers, weights, biases, rcols, g, out,
            residuals=res_pack, **kwargs)
        for a, b in zip(jax.tree_util.tree_leaves(base),
                        jax.tree_util.tree_leaves(reused)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
