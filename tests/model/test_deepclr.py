"""Model shape + behavior tests (mirrors reference tests/model/test_deepclr.py
but runs on CPU/TPU via jax instead of requiring CUDA)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepclr_tpu.geometry import LabelType
from deepclr_tpu.models import build_model, init_params

# KITTI-sized model config (configs/training/kitti_base.yaml:10-39 of the
# reference), with the in-model loss exercised like the reference test.
MODEL_CFG = {
    "input_dim": 4,
    "point_dim": 3,
    "label_type": "pose3d_dual_quat",
    "model_type": "deepclr",
    "params": {
        "batch_norm": False,
        "dropout": 1.0,
        "cloud_features": {
            "name": "SetAbstraction",
            "params": {
                "npoint": [1024],
                "radii": [[0.5, 1.0]],
                "nsamples": [[64, 128]],  # scaled down from 512/1024 for test speed
                "mlps": [[[16, 16, 32], [16, 16, 32]]],
            },
        },
        "merge": {
            "name": "MotionEmbedding",
            "params": {"k": 20, "radius": 10.0, "mlp": [128, 128, 256]},
        },
        "output": {
            "name": "OutputSimple",
            "params": {"mlp": [256, 256, 512, 512, 1024], "linear": [1024, 512, 256]},
        },
        "loss": {"name": "TransformLoss", "params": {"p": 2, "sx": 1.0, "sq": 200.0}},
    },
}

B, N = 2, 1500


@pytest.fixture(scope="module")
def model_and_params():
    model = build_model(MODEL_CFG)
    variables = init_params(model, jax.random.PRNGKey(0), num_points=N, batch_size=B)
    return model, variables


def _clouds(seed):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(B, N, 4)).astype(np.float32) * 10.0
    return jnp.asarray(pts)


def test_encode_shapes(model_and_params):
    model, variables = model_and_params
    feats = model.apply(variables, _clouds(0), method="encode")
    assert feats.shape == (B, 1024, 67)  # 3 + 32 + 32


def test_register_shapes(model_and_params):
    model, variables = model_and_params
    f0 = model.apply(variables, _clouds(0), method="encode")
    f1 = model.apply(variables, _clouds(1), method="encode")
    merged = model.merge.bind(
        {"params": variables["params"]["merge"]}
    )(f0, f1)
    assert merged.shape == (B, 1024, 259)  # 3 + 256
    y = model.apply(variables, f0, f1, method="register")
    assert y.shape == (B, 8)


def test_full_forward_with_loss(model_and_params):
    model, variables = model_and_params
    y_true = jnp.tile(
        jnp.asarray([[1.0, 0, 0, 0, 0.1, 0.2, 0.3, 0.0]]), (B, 1)
    )
    y_pred, loss = model.apply(variables, _clouds(0), _clouds(1), y=y_true)
    assert y_pred.shape == (B, 8)
    assert loss.shape == ()
    assert np.isfinite(float(loss))


def test_forward_matches_precomputed_features(model_and_params):
    """Full forward == encode twice + register (the sequential-mode split)."""
    model, variables = model_and_params
    t, s = _clouds(2), _clouds(3)
    y_full, _ = model.apply(variables, t, s)
    f0 = model.apply(variables, t, method="encode")
    f1 = model.apply(variables, s, method="encode")
    y_split = model.apply(variables, f0, f1, method="register")
    np.testing.assert_allclose(np.asarray(y_full), np.asarray(y_split), atol=1e-6)


def test_output_is_valid_pose(model_and_params):
    """Head activations keep the output a decodable rigid transform:
    real_w in (0,1) (sigmoid), real_xyz in (-1,1) (tanh), and to_matrix
    yields an orthonormal rotation."""
    model, variables = model_and_params
    y_pred, _ = model.apply(variables, _clouds(4), _clouds(5))
    y = np.asarray(y_pred)
    assert np.all((y[:, 0] > 0) & (y[:, 0] < 1))
    assert np.all((y[:, 1:4] > -1) & (y[:, 1:4] < 1))
    m = np.asarray(LabelType.POSE3D_DUAL_QUAT.to_matrix(y_pred))
    rtr = np.einsum("bij,bik->bjk", m[:, :3, :3], m[:, :3, :3])
    np.testing.assert_allclose(rtr, np.broadcast_to(np.eye(3), (B, 3, 3)), atol=1e-5)


def test_masked_padding_is_ignored(model_and_params):
    """Padding points must not change the prediction."""
    model, variables = model_and_params
    t, s = _clouds(6), _clouds(7)
    full_mask = jnp.ones((B, N), bool)
    y_ref, _ = model.apply(variables, t, s, full_mask, full_mask)

    # Pad with garbage points marked invalid.
    pad = jnp.full((B, 100, 4), 123.0, jnp.float32)
    t_pad = jnp.concatenate([t, pad], axis=1)
    s_pad = jnp.concatenate([s, pad], axis=1)
    mask = jnp.concatenate([full_mask, jnp.zeros((B, 100), bool)], axis=1)
    y_pad, _ = model.apply(variables, t_pad, s_pad, mask, mask)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_pad), atol=1e-5)


def test_augmentation_transform_applied(model_and_params):
    """On-device augmentation == transforming the cloud on host."""
    from deepclr_tpu.geometry import se3

    model, variables = model_and_params
    t, s = _clouds(8), _clouds(9)
    aug = np.eye(4, dtype=np.float32)
    aug[:3, 3] = [1.0, -2.0, 0.5]
    aug = jnp.tile(jnp.asarray(aug)[None], (B, 1, 1))

    y_dev, _ = model.apply(variables, t, s, aug_template=aug)
    t_host = jnp.concatenate(
        [se3.transform_points(aug, t[..., :3]), t[..., 3:]], axis=-1
    )
    y_host, _ = model.apply(variables, t_host, s)
    np.testing.assert_allclose(np.asarray(y_dev), np.asarray(y_host), atol=1e-5)


def test_gradients_flow(model_and_params):
    model, variables = model_and_params
    t, s = _clouds(10), _clouds(11)
    y_true = jnp.tile(jnp.asarray([[1.0, 0, 0, 0, 0.1, 0.2, 0.3, 0.0]]), (B, 1))

    def loss_fn(params):
        _, loss = model.apply({"params": params}, t, s, y=y_true)
        return loss

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # at least some gradient signal everywhere important
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert total > 0.0
