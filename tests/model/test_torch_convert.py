"""torch -> flax weight conversion against a synthetic reference-named state
dict, validated by shape-compatibility with a freshly built model."""
import jax
import numpy as np
import pytest

from deepclr_tpu.models import build_model, init_params
from deepclr_tpu.models.torch_convert import convert_torch_state_dict

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
            "params": {"npoint": [64], "radii": [[0.5, 1.0]],
                       "nsamples": [[16, 32]],
                       "mlps": [[[16, 16, 32], [16, 16, 32]]]},
        },
        "merge": {"name": "MotionEmbedding",
                  "params": {"k": 8, "radius": 10.0, "mlp": [128, 128, 256]}},
        "output": {"name": "OutputSimple",
                   "params": {"mlp": [256, 256, 512, 512, 1024],
                              "linear": [1024, 512, 256]}},
    },
}


def _synthetic_torch_state(rng):
    """State dict with the reference's exact naming (KITTI architecture)."""
    sd = {}
    # SA stage 0: 2 scales, mlps [in=4, 16, 16, 32] with use_xyz (in=1+3)
    dims = [4, 16, 16, 32]
    for s in range(2):
        for i in range(3):
            sd[f"_cloud_layers.0._sa0.mlps.{s}.layer{i}.conv.weight"] = (
                rng.normal(size=(dims[i + 1], dims[i], 1, 1)).astype(np.float32)
            )
            sd[f"_cloud_layers.0._sa0.mlps.{s}.layer{i}.conv.bias"] = (
                rng.normal(size=(dims[i + 1],)).astype(np.float32)
            )
    # merge conv: [131, 128, 128, 256]
    mdims = [131, 128, 128, 256]
    for i in range(3):
        sd[f"_merge_layers.0._embedding._conv._sequential.{i}._sequential.0.weight"] = (
            rng.normal(size=(mdims[i + 1], mdims[i], 1)).astype(np.float32)
        )
        sd[f"_merge_layers.0._embedding._conv._sequential.{i}._sequential.0.bias"] = (
            rng.normal(size=(mdims[i + 1],)).astype(np.float32)
        )
    # output conv [259, 256, 256, 512, 512, 1024]
    odims = [259, 256, 256, 512, 512, 1024]
    for i in range(5):
        sd[f"_merge_layers.1.conv._sequential.{i}._sequential.0.weight"] = (
            rng.normal(size=(odims[i + 1], odims[i], 1)).astype(np.float32)
        )
        sd[f"_merge_layers.1.conv._sequential.{i}._sequential.0.bias"] = (
            rng.normal(size=(odims[i + 1],)).astype(np.float32)
        )
    # output linear [1024, 512, 256] -> layers 1024->512->256
    ldims = [1024, 512, 256]
    for i in range(2):
        sd[f"_merge_layers.1.linear._sequential.{i}._sequential.0.weight"] = (
            rng.normal(size=(ldims[i + 1], ldims[i])).astype(np.float32)
        )
        sd[f"_merge_layers.1.linear._sequential.{i}._sequential.0.bias"] = (
            rng.normal(size=(ldims[i + 1],)).astype(np.float32)
        )
    # head 256 -> 8
    sd["_merge_layers.1.output.weight"] = rng.normal(size=(8, 256)).astype(np.float32)
    sd["_merge_layers.1.output.bias"] = rng.normal(size=(8,)).astype(np.float32)
    return sd


def test_convert_matches_model_structure():
    rng = np.random.default_rng(0)
    sd = _synthetic_torch_state(rng)
    converted = convert_torch_state_dict(sd)

    model = build_model(MODEL_CFG)
    variables = init_params(model, jax.random.PRNGKey(0), num_points=256)
    params = jax.device_get(variables["params"])

    # every converted leaf exists with the right shape
    def check(dst, src, path=""):
        for k, v in src.items():
            assert k in dst, f"missing {path}/{k} in model params"
            if isinstance(v, dict):
                check(dst[k], v, f"{path}/{k}")
            else:
                assert np.shape(dst[k]) == np.shape(v), (
                    f"{path}/{k}: model {np.shape(dst[k])} vs converted {np.shape(v)}"
                )

    check(params, converted)

    # a known value transposes correctly
    w_t = sd["_merge_layers.1.output.weight"]
    np.testing.assert_allclose(
        converted["output"]["output"]["kernel"], w_t.T, atol=0
    )
    # converted weights actually run
    for section, sub in converted.items():
        def assign(dst, src):
            for k, v in src.items():
                if isinstance(v, dict):
                    assign(dst[k], v)
                else:
                    dst[k] = v
        assign(params[section], sub)
    pts = rng.normal(size=(1, 256, 4)).astype(np.float32)
    y, _ = model.apply({"params": params}, pts, pts)
    assert np.isfinite(np.asarray(y)).all()


def test_reference_name_manifest_and_strict_conversion():
    """Regression anchor for the torch->flax name map: the recorded
    manifest of reference state-dict keys (KITTI architecture, derived from
    the reference module structure at models/deepclr.py:444-474) must be
    exactly what the synthetic state emits, and strict conversion must
    consume every key — a silent regex/rename break fails loudly here."""
    import os.path as osp

    manifest = osp.join(osp.dirname(__file__), "reference_state_dict_kitti.txt")
    with open(manifest) as f:
        expected = sorted(line.strip() for line in f if line.strip())

    sd = _synthetic_torch_state(np.random.default_rng(0))
    assert sorted(sd) == expected

    params = convert_torch_state_dict(sd, strict=True)
    assert "cloud_features" in params and "output" in params

    # an unexpected entry must be rejected in strict mode
    sd["_merge_layers.1.renamed.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match="unrecognized"):
        convert_torch_state_dict(sd, strict=True)
