"""uint16 fixed-point upload: round-trip precision + prediction parity.

The quantized upload halves the host->device transfer that dominates
single-stream sequential latency on relayed chips (docs/roofline.md); it
must be metrically invisible: ~3 mm resolution over a LiDAR range, far
below sensor noise and the model's per-pair accuracy (~4 cm).
"""
import numpy as np
import pytest

from deepclr_tpu.models import (
    BatchedSequentialHelper, ModelInferenceHelper, build_model, init_params,
)
from deepclr_tpu.models.base import _quantize_u16

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
            "params": {"npoint": [32], "radii": [[1.0, 2.0]],
                       "nsamples": [[8, 16]],
                       "mlps": [[[8, 8, 16], [8, 8, 16]]]},
        },
        "merge": {"name": "MotionEmbedding",
                  "params": {"k": 4, "radius": 10.0, "mlp": [16, 32]}},
        "output": {"name": "OutputSimple",
                   "params": {"mlp": [32, 64], "linear": [64, 32]}},
    },
}

N = 256


def _cloud(seed, scale=40.0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-scale, scale, size=(N, 3)).astype(np.float32)
    extra = rng.uniform(0, 1, size=(N, 1)).astype(np.float32)
    return np.concatenate([pts, extra], 1)


def test_quantize_roundtrip_resolution():
    pts = _cloud(0, scale=100.0)  # +/-100 m: the worst-case LiDAR range
    q, lo, scale = _quantize_u16(pts)
    assert q.dtype == np.uint16
    back = q.astype(np.float32) * scale + lo
    # error bounded by half a quantization step per axis (~1.5 mm here)
    assert np.abs(back - pts).max() <= (scale / 2 + 1e-6).max()
    assert np.abs(back[:, :3] - pts[:, :3]).max() < 0.002


@pytest.fixture(scope="module")
def model_and_vars():
    import jax

    model = build_model(MODEL_CFG)
    variables = init_params(model, jax.random.PRNGKey(0), num_points=N)
    return model, variables


def test_pairwise_prediction_parity(model_and_vars):
    model, variables = model_and_vars
    t, s = _cloud(1), _cloud(2)
    y32 = ModelInferenceHelper(model, variables, num_points=N).predict(s, t)
    y16 = ModelInferenceHelper(model, variables, num_points=N,
                               upload_dtype="uint16").predict(s, t)
    np.testing.assert_allclose(y16, y32, atol=2e-2)


def test_batched_sequential_prediction_parity(model_and_vars):
    model, variables = model_and_vars
    frames = [[_cloud(10 + t * 2 + b) for b in range(2)] for t in range(3)]
    h32 = BatchedSequentialHelper(model, variables, batch=2, num_points=N)
    h16 = BatchedSequentialHelper(model, variables, batch=2, num_points=N,
                                  upload_dtype="uint16")
    for t, fr in enumerate(frames):
        y32 = h32.step(fr)
        y16 = h16.step(fr)
        if t == 0:
            assert y32 == [None, None] and y16 == [None, None]
        else:
            for a, b in zip(y16, y32):
                np.testing.assert_allclose(a, b, atol=2e-2)


def test_bad_upload_dtype_rejected(model_and_vars):
    model, variables = model_and_vars
    with pytest.raises(ValueError):
        ModelInferenceHelper(model, variables, num_points=N,
                             upload_dtype="int8")
