"""torch-zipfile checkpoint format: pure-python reader/writer interop.

Closes the round-2 gap: ``load_torch_checkpoint`` had never seen the
on-disk format it claims to read (reference weights.tar are LFS pointers).
Here a *real* torch-zipfile archive is produced from the recorded reference
name manifest and round-tripped through the converter; when torch is
available the format itself is pinned against torch.save/torch.load in both
directions.  Reference contract: /root/reference/deepclr/models/build.py:44-49.
"""
import numpy as np
import pytest

from deepclr_tpu.models.torch_convert import (
    convert_torch_state_dict, load_torch_checkpoint,
)
from deepclr_tpu.models.torch_io import (
    read_torch_checkpoint, write_torch_checkpoint,
)

from .test_torch_convert import _synthetic_torch_state


def _sample_state():
    rng = np.random.default_rng(7)
    return {
        "conv.weight": rng.normal(size=(8, 4, 1, 1)).astype(np.float32),
        "conv.bias": rng.normal(size=(8,)).astype(np.float32),
        "embed.weight": rng.normal(size=(16, 3)).astype(np.float64),
        "steps": np.arange(5, dtype=np.int64),
        "flags": np.array([True, False, True]),
        "half.weight": rng.normal(size=(2, 3)).astype(np.float16),
    }


def _assert_state_equal(got, want):
    assert sorted(got) == sorted(want)
    for k in want:
        g = np.asarray(got[k])
        np.testing.assert_array_equal(g, want[k], err_msg=k)
        assert g.dtype == want[k].dtype, k


def test_pure_roundtrip(tmp_path):
    """writer -> reader without torch anywhere in the loop."""
    path = str(tmp_path / "weights.tar")
    state = _sample_state()
    write_torch_checkpoint(path, state)
    _assert_state_equal(read_torch_checkpoint(path), state)


def test_write_then_torch_load(tmp_path):
    torch = pytest.importorskip("torch")
    path = str(tmp_path / "weights.tar")
    state = _sample_state()
    write_torch_checkpoint(path, state)
    loaded = torch.load(path, map_location="cpu", weights_only=True)
    _assert_state_equal(
        {k: v.numpy() for k, v in loaded.items()}, state
    )


def test_torch_save_then_pure_read(tmp_path):
    torch = pytest.importorskip("torch")
    path = str(tmp_path / "ckpt.tar")
    state = _sample_state()
    # nested container shaped like the reference's CheckpointData
    # (/root/reference/deepclr/utils/checkpoint.py:12-17)
    ckpt = {
        "epoch": 3,
        "iteration": 1200,
        "model_state_dict": {k: torch.from_numpy(v.copy())
                             for k, v in state.items()},
    }
    # include a non-contiguous tensor: stride reconstruction must hold
    ckpt["model_state_dict"]["noncontig"] = torch.from_numpy(
        np.arange(24, dtype=np.float32).reshape(4, 6)
    ).t()
    torch.save(ckpt, path)

    got = read_torch_checkpoint(path)
    assert got["epoch"] == 3 and got["iteration"] == 1200
    _assert_state_equal(
        {k: v for k, v in got["model_state_dict"].items() if k != "noncontig"},
        state,
    )
    np.testing.assert_array_equal(
        got["model_state_dict"]["noncontig"],
        np.arange(24, dtype=np.float32).reshape(4, 6).T,
    )


def test_weights_tar_to_model_forward(tmp_path):
    """End to end: reference-named weights.tar (real zipfile format) ->
    load_torch_checkpoint -> converted model forward matches the directly
    converted params bit-for-bit."""
    import jax

    from deepclr_tpu.models import build_model, init_params
    from .test_torch_convert import MODEL_CFG

    sd = _synthetic_torch_state(np.random.default_rng(3))
    path = str(tmp_path / "weights.tar")
    write_torch_checkpoint(path, sd)

    from_file = load_torch_checkpoint(path)
    direct = convert_torch_state_dict(sd)
    jax.tree_util.tree_map(np.testing.assert_array_equal, from_file, direct)

    model = build_model(MODEL_CFG)
    variables = init_params(model, jax.random.PRNGKey(0), num_points=256)
    params = jax.device_get(variables["params"])

    def assign(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                assign(dst[k], v)
            else:
                dst[k] = v

    assign(params, from_file)
    rng = np.random.default_rng(11)
    pts = rng.normal(size=(1, 256, 4)).astype(np.float32)
    y, _ = model.apply({"params": params}, pts, pts)
    assert y.shape == (1, 8)
    assert np.isfinite(np.asarray(y)).all()
