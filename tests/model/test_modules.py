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
