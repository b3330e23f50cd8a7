"""Module-level coverage: global grouping (k=0), two-stage SA, FP module,
uncertainty loss."""
import jax
import jax.numpy as jnp
import numpy as np

from deepclr_tpu.models.deepclr import (
    MotionEmbedding,
    SetAbstraction,
    TransformUncertaintyLoss,
)
from deepclr_tpu.models.feature_propagation import FeaturePropagation
from deepclr_tpu.geometry import LabelType

B, P = 2, 32


def _feats(seed, p=P, c=19):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(B, p, c)).astype(np.float32))


def test_global_grouping_k0():
    """k=0 -> every source point grouped for every template point."""
    m = MotionEmbedding(mlp=(8, 16), k=0, radius=0.0)
    f0, f1 = _feats(0), _feats(1)
    variables = m.init(jax.random.PRNGKey(0), f0, f1)
    out = m.apply(variables, f0, f1)
    assert out.shape == (B, P, 3 + 16)

    # permuting the source points must not change the result (max over all)
    perm = np.random.default_rng(2).permutation(P)
    out_p = m.apply(variables, f0, f1[:, perm, :])
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_p), atol=1e-5)


def test_two_stage_set_abstraction():
    sa = SetAbstraction(
        npoint=(64, 16),
        radii=((0.5, 1.0), (1.0, 2.0)),
        nsamples=((8, 16), (8, 16)),
        mlps=(((8, 8, 16), (8, 8, 16)), ((8, 16), (8, 16))),
    )
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.normal(size=(B, 256, 4)).astype(np.float32))
    variables = sa.init(jax.random.PRNGKey(0), pts)
    out = sa.apply(variables, pts)
    assert out.shape == (B, 16, 3 + 32)  # second-stage concat of 16+16


def test_feature_propagation():
    rng = np.random.default_rng(4)
    dense = jnp.asarray(rng.normal(size=(B, 128, 3)).astype(np.float32))
    sparse = dense[:, :16, :]
    sparse_feats = jnp.asarray(rng.normal(size=(B, 16, 8)).astype(np.float32))
    dense_feats = jnp.asarray(rng.normal(size=(B, 128, 4)).astype(np.float32))

    fp = FeaturePropagation(mlp=(16, 16))
    variables = fp.init(
        jax.random.PRNGKey(0), dense, sparse, dense_feats, sparse_feats
    )
    out = fp.apply(variables, dense, sparse, dense_feats, sparse_feats)
    assert out.shape == (B, 128, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_uncertainty_loss_learns_weights():
    loss_mod = TransformUncertaintyLoss(
        label_type=LabelType.POSE3D_DUAL_QUAT, sx=0.0, sq=-3.0
    )
    y = jnp.asarray(np.random.default_rng(5).normal(size=(4, 8)).astype(np.float32))
    y_true = jnp.tile(jnp.asarray([[1.0, 0, 0, 0, 0, 0, 0, 0]]), (4, 1))
    variables = loss_mod.init(jax.random.PRNGKey(0), y, y_true)
    assert float(variables["params"]["sq"][0]) == -3.0
    loss = loss_mod.apply(variables, y, y_true)
    assert np.isfinite(float(loss))

    grads = jax.grad(
        lambda p: loss_mod.apply({"params": p}, y, y_true)
    )(variables["params"])
    assert abs(float(grads["sx"][0])) > 0  # learnable weighting


def test_inference_helper_sequential_matches_pairwise():
    """Sequential mode (cached features) == pairwise prediction."""
    from deepclr_tpu.models import ModelInferenceHelper, build_model, init_params

    cfg = {
        "input_dim": 3, "point_dim": 3,
        "label_type": "pose3d_dual_quat", "model_type": "deepclr",
        "params": {
            "batch_norm": False, "dropout": 1.0,
            "cloud_features": {"name": "SetAbstraction", "params": {
                "npoint": [32], "radii": [[0.6, 1.2]], "nsamples": [[8, 16]],
                "mlps": [[[8, 8, 16], [8, 8, 16]]]}},
            "merge": {"name": "MotionEmbedding",
                      "params": {"k": 4, "radius": 10.0, "mlp": [16, 32]}},
            "output": {"name": "OutputSimple",
                       "params": {"mlp": [32, 64], "linear": [64, 32]}},
        },
    }
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), num_points=128)

    rng = np.random.default_rng(0)
    frames = [rng.normal(size=(128, 3)).astype(np.float32) * 3 for _ in range(3)]

    seq = ModelInferenceHelper(model, variables, is_sequential=True,
                               num_points=128)
    assert seq.predict(frames[0]) is None  # first frame only seeds the state
    assert seq.has_state()
    y01 = seq.predict(frames[1])
    y12 = seq.predict(frames[2])

    pair = ModelInferenceHelper(model, variables, is_sequential=False,
                                num_points=128)
    np.testing.assert_allclose(
        y01, pair.predict(frames[1], frames[0]), atol=1e-5
    )
    np.testing.assert_allclose(
        y12, pair.predict(frames[2], frames[1]), atol=1e-5
    )
    seq.reset_state()
    assert not seq.has_state()


def test_batched_sequential_matches_single():
    """B lock-step streams == B independent sequential helpers, including a
    mid-run per-lane reset (new sequence on one lane only)."""
    from deepclr_tpu.models import (
        BatchedSequentialHelper, ModelInferenceHelper, build_model, init_params,
    )

    cfg = {
        "input_dim": 3, "point_dim": 3,
        "label_type": "pose3d_dual_quat", "model_type": "deepclr",
        "params": {
            "batch_norm": False, "dropout": 1.0,
            "cloud_features": {"name": "SetAbstraction", "params": {
                "npoint": [32], "radii": [[0.6, 1.2]], "nsamples": [[8, 16]],
                "mlps": [[[8, 8, 16], [8, 8, 16]]]}},
            "merge": {"name": "MotionEmbedding",
                      "params": {"k": 4, "radius": 10.0, "mlp": [16, 32]}},
            "output": {"name": "OutputSimple",
                       "params": {"mlp": [32, 64], "linear": [64, 32]}},
        },
    }
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), num_points=128)

    B, T = 3, 4
    rng = np.random.default_rng(7)
    streams = [[rng.normal(size=(128, 3)).astype(np.float32) * 3
                for _ in range(T)] for _ in range(B)]

    batched = BatchedSequentialHelper(model, variables, batch=B,
                                      num_points=128, seed=0)
    singles = [ModelInferenceHelper(model, variables, is_sequential=True,
                                    num_points=128, seed=i) for i in range(B)]

    for t in range(T):
        if t == 2:
            batched.reset_stream(1)
            singles[1].reset_state()
        got = batched.step([streams[i][t] for i in range(B)])
        for i in range(B):
            want = singles[i].predict(streams[i][t])
            if want is None:
                assert got[i] is None
            else:
                np.testing.assert_allclose(got[i], want, atol=1e-5)


def test_pairwise_predict_batch_matches_single():
    from deepclr_tpu.models import ModelInferenceHelper, build_model, init_params

    cfg = {
        "input_dim": 3, "point_dim": 3,
        "label_type": "pose3d_dual_quat", "model_type": "deepclr",
        "params": {
            "batch_norm": False, "dropout": 1.0,
            "cloud_features": {"name": "SetAbstraction", "params": {
                "npoint": [32], "radii": [[0.6, 1.2]], "nsamples": [[8, 16]],
                "mlps": [[[8, 8, 16], [8, 8, 16]]]}},
            "merge": {"name": "MotionEmbedding",
                      "params": {"k": 4, "radius": 10.0, "mlp": [16, 32]}},
            "output": {"name": "OutputSimple",
                       "params": {"mlp": [32, 64], "linear": [64, 32]}},
        },
    }
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), num_points=128)

    rng = np.random.default_rng(3)
    temps = [rng.normal(size=(128, 3)).astype(np.float32) * 3 for _ in range(2)]
    srcs = [rng.normal(size=(128, 3)).astype(np.float32) * 3 for _ in range(2)]

    helper = ModelInferenceHelper(model, variables, is_sequential=False,
                                  num_points=128)
    y = helper.predict_batch(srcs, temps)
    assert y.shape[0] == 2
    for i in range(2):
        np.testing.assert_allclose(
            y[i], helper.predict(srcs[i], temps[i]), atol=1e-5
        )


def _np_motion_embedding(f0, f1, idx, params, mlp_dims, radius, pd=3,
                         append=True):
    """Literal reference: concat [dpos | f0 | f1] (or [dpos | f1 - f0]) ->
    Dense/ReLU chain -> radius zeroing -> max over neighbors (reference
    MotionEmbeddingBase, /root/reference/deepclr/models/deepclr.py:176-231)."""
    b, p, k = idx.shape
    g1 = np.take_along_axis(f1[:, None].repeat(p, 1),
                            idx[..., None].astype(np.int64), axis=2)
    pos_diff = g1[..., :pd] - f0[:, :, None, :pd]
    if append:
        f0_b = np.broadcast_to(f0[:, :, None, pd:],
                               (b, p, k, f0.shape[-1] - pd))
        h = np.concatenate([pos_diff, f0_b, g1[..., pd:]], axis=-1)
    else:
        h = np.concatenate(
            [pos_diff, g1[..., pd:] - f0[:, :, None, pd:]], axis=-1
        )
    for i in range(len(mlp_dims)):
        w = np.asarray(params[f"dense_{i}"]["kernel"])
        bb = np.asarray(params[f"dense_{i}"]["bias"])
        h = np.maximum(h @ w + bb, 0.0)
    dist = np.linalg.norm(pos_diff, axis=-1, keepdims=True)
    h = np.where(dist >= radius, 0.0, h)
    feat = h.max(axis=-2)
    return np.concatenate([f0[..., :pd], feat], axis=-1)


import pytest


@pytest.mark.parametrize("append", [True, False])
def test_motion_embedding_matches_literal_formulation(append):
    """The layer-1-split kNN path must equal the literal concat+MLP form
    (it is the same affine map, just factored; layer 1 runs in f32)."""
    from deepclr_tpu import ops

    mlp = (16, 16, 32)
    radius = 4.0
    m = MotionEmbedding(mlp=mlp, k=4, radius=radius, append_features=append)
    rng = np.random.default_rng(7)
    # realistic absolute coordinates (tens of meters) to exercise the
    # large-coordinate cancellation the f32 layer-1 exists for
    f0 = np.concatenate([
        rng.normal(size=(B, P, 3)).astype(np.float32) * 30.0,
        rng.normal(size=(B, P, 8)).astype(np.float32),
    ], axis=-1)
    f1 = np.concatenate([
        rng.normal(size=(B, P, 3)).astype(np.float32) * 30.0,
        rng.normal(size=(B, P, 8)).astype(np.float32),
    ], axis=-1)

    variables = m.init(jax.random.PRNGKey(1), jnp.asarray(f0), jnp.asarray(f1))
    out = np.asarray(m.apply(variables, jnp.asarray(f0), jnp.asarray(f1)))

    idx = np.asarray(ops.knn(f0[..., :3], f1[..., :3], 4)[0])
    ref = _np_motion_embedding(
        f0, f1, idx, variables["params"]["mlp"], mlp, radius, append=append
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_motion_embedding_onehot_gather_matches_take():
    """gather="onehot" (MXU one-hot row select, hi/lo bf16 passes) must
    reproduce the exact "take" row gather: values to the hi+lo
    reconstruction bound (≤2⁻¹⁶·|a| per row, far below the tail's own
    rounding), gradients through the matmul transpose vs the scatter-add."""
    rng = np.random.default_rng(11)
    f0 = np.concatenate([
        rng.normal(size=(B, P, 3)).astype(np.float32) * 30.0,
        rng.normal(size=(B, P, 8)).astype(np.float32),
    ], axis=-1)
    f1 = np.concatenate([
        rng.normal(size=(B, P, 3)).astype(np.float32) * 30.0,
        rng.normal(size=(B, P, 8)).astype(np.float32),
    ], axis=-1)

    kw = dict(mlp=(16, 16, 32), k=4, radius=8.0)
    m_take = MotionEmbedding(gather="take", **kw)
    m_oh = MotionEmbedding(gather="onehot", **kw)
    variables = m_take.init(jax.random.PRNGKey(1), jnp.asarray(f0),
                            jnp.asarray(f1))

    out_take = np.asarray(m_take.apply(variables, jnp.asarray(f0),
                                       jnp.asarray(f1)))
    out_oh = np.asarray(m_oh.apply(variables, jnp.asarray(f0),
                                   jnp.asarray(f1)))
    np.testing.assert_allclose(out_oh, out_take, rtol=1e-3, atol=2e-3)

    # gradient w.r.t. the source features (flows through the gathered
    # layer-1 term a): scatter-add (take) vs transposed matmul (onehot).
    # Compare where the forward winners agree bitwise — near-ties at the
    # radius/relu boundary legitimately route cotangents differently.
    def loss(mod, f1v):
        return jnp.sum(mod.apply(variables, jnp.asarray(f0), f1v) ** 2)

    g_take = np.asarray(jax.grad(lambda v: loss(m_take, v))(jnp.asarray(f1)))
    g_oh = np.asarray(jax.grad(lambda v: loss(m_oh, v))(jnp.asarray(f1)))
    agree = np.all(out_take == out_oh, axis=-1)  # (B, P) winner rows equal
    scale = np.abs(g_take).max() + 1e-6
    frac_same = agree.mean()
    assert frac_same > 0.9, f"winner agreement too low: {frac_same}"
    np.testing.assert_allclose(g_oh / scale, g_take / scale, atol=5e-3)
