"""CLI integration: inference.py / icp.py / evaluation.py / paper tables on a
synthetic scenario, exercising the full output-directory contract."""
import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest
import yaml

from deepclr_tpu.data.pack import PackWriter

REPO = osp.realpath(osp.join(osp.dirname(__file__), "..", ".."))
SCRIPTS = osp.join(REPO, "scripts")

N_FRAMES = 12


def _write_sequence_pack(path, n_frames=N_FRAMES, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(300, 4)).astype(np.float32) * 5
    with PackWriter(str(path)) as w:
        for i in range(n_frames):
            pose = np.eye(4)
            pose[0, 3] = i * 1.0
            cloud = base + np.array([i * 0.0, 0, 0, 0], np.float32)
            w.put(f"{i:08d}", {
                "idx": i, "timestamp": i * 1e5, "pose": pose,
                "cloud": cloud + rng.normal(size=cloud.shape).astype(np.float32) * 0.01,
            })


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


def _run(args, env):
    result = subprocess.run(
        [sys.executable] + args, capture_output=True, text=True, env=env,
        cwd=REPO, timeout=900,
    )
    assert result.returncode == 0, (
        f"{args}\nSTDOUT:\n{result.stdout[-2000:]}\nSTDERR:\n{result.stderr[-3000:]}"
    )
    return result


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("cli")
    _write_sequence_pack(ws / "04.pack")

    # scenario
    scenario = {
        "name": "kitti_04_10",
        "dataset_type": "kitti_odometry_velodyne",
        "sequential": True,
        "data": {"04": str(ws / "04.pack")},
    }
    with open(ws / "scenario.yaml", "w") as f:
        yaml.dump(scenario, f)

    # untrained model dir (model_config.yaml + weights.msgpack)
    import jax

    from deepclr_tpu.models import build_model, init_params, save_weights

    model_dir = ws / "models" / "toy"
    model_dir.mkdir(parents=True)
    with open(model_dir / "model_config.yaml", "w") as f:
        yaml.dump(MODEL_CFG, f)
    model = build_model(MODEL_CFG)
    variables = init_params(model, jax.random.PRNGKey(0), num_points=256)
    save_weights(str(model_dir / "weights.msgpack"), variables)

    env = dict(os.environ)
    env.update({
        "MODEL_PATH": str(ws / "models"),
        "JAX_PLATFORMS": "cpu",
        "JAX_PLATFORM_NAME": "cpu",
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
    })
    return ws, env


def test_inference_cli(workspace):
    ws, env = workspace
    out_base = ws / "out"
    _run([
        osp.join(SCRIPTS, "inference.py"), str(ws / "scenario.yaml"),
        "toy", str(out_base), "--num_points", "256",
    ], env)

    runs = os.listdir(out_base)
    assert len(runs) == 1
    run_dir = out_base / runs[0]
    assert "kitti_04_10" in runs[0] and "DEEPCLR" in runs[0]
    assert (run_dir / "scenario.yaml").exists()
    assert (run_dir / "04.txt").exists()
    data = np.atleast_2d(np.loadtxt(run_dir / "04.txt"))
    assert data.shape[1] == 26  # stamp + 12 pred + 12 gt + time
    assert data.shape[0] == N_FRAMES - 1


def test_inference_cli_parallel_sequences(workspace):
    """--parallel_sequences N: lock-step streams of different lengths produce
    the same poses as the stream-at-a-time path (no subsampling at
    num_points >= cloud size, so predictions are bit-equal)."""
    ws, env = workspace
    _write_sequence_pack(ws / "05.pack", n_frames=N_FRAMES - 4, seed=1)
    scenario = {
        "name": "kitti_two_seq",
        "dataset_type": "kitti_odometry_velodyne",
        "sequential": True,
        "data": {"04": str(ws / "04.pack"), "05": str(ws / "05.pack")},
    }
    with open(ws / "scenario2.yaml", "w") as f:
        yaml.dump(scenario, f)

    outs = {}
    for tag, extra in {"plain": [], "par": ["--parallel_sequences", "2"]}.items():
        out_base = ws / f"out_{tag}"
        _run([
            osp.join(SCRIPTS, "inference.py"), str(ws / "scenario2.yaml"),
            "toy", str(out_base), "--num_points", "384", *extra,
        ], env)
        run_dir = out_base / os.listdir(out_base)[0]
        outs[tag] = run_dir

    for seq, n in {"04": N_FRAMES - 1, "05": N_FRAMES - 5}.items():
        plain = np.atleast_2d(np.loadtxt(outs["plain"] / f"{seq}.txt"))
        par = np.atleast_2d(np.loadtxt(outs["par"] / f"{seq}.txt"))
        assert plain.shape == par.shape == (n, 26)
        # stamp + pred pose + gt pose identical; column 25 is timing
        np.testing.assert_allclose(par[:, :25], plain[:, :25], atol=1e-5)


def test_evaluation_cli_on_inference_output(workspace):
    ws, env = workspace
    out_base = ws / "out"
    run_dir = out_base / os.listdir(out_base)[0]
    _run([osp.join(SCRIPTS, "evaluation.py"), str(run_dir)], env)
    eval_dir = run_dir / "evaluation"
    assert (eval_dir / "step_errors.csv").exists()
    # sequential scenario -> segment csv + plot dirs (may hold NaNs for the
    # tiny trajectory, but files must exist)
    assert (eval_dir / "segment_errors.csv").exists()
    assert (eval_dir / "plot_path2d").is_dir()

    import pandas as pd

    df = pd.read_csv(eval_dir / "step_errors.csv")
    assert "t_kitti_mean [m]" in df.columns
    assert list(df["name"]) == ["04", "TOTAL"]


def test_paper_table_cli(workspace):
    ws, env = workspace
    result = _run([
        osp.join(SCRIPTS, "paper", "kitti_odometry_table.py"), str(ws / "out"),
    ], env)
    assert "DeepCLR Results on KITTI Odometry" in result.stdout


def test_icp_cli(workspace):
    ws, env = workspace
    out_base = ws / "icp_out"
    _run([
        osp.join(SCRIPTS, "icp.py"), str(ws / "scenario.yaml"),
        "icp_po2po", str(out_base), "--max-distance", "5.0",
        "--max-iterations", "5",
    ], env)
    runs = os.listdir(out_base)
    assert len(runs) == 1 and "ICP_PO2PO" in runs[0]
    txt = out_base / runs[0] / "04.txt"
    assert txt.exists()
    data = np.atleast_2d(np.loadtxt(txt))
    assert data.shape[0] == N_FRAMES - 1


def test_timing_cli(workspace):
    """timing.py contract: one wall-ms line per pair, then the r4 summary
    lines splitting wall vs compute-only (device-resident input)."""
    ws, env = workspace
    cfg = {
        "base_dir": str(ws),
        "identifier": "timing",
        "data": {"validation": str(ws / "04.pack"),
                 "dataset_type": "kitti_odometry_velodyne",
                 "sequential": True},
        "data_loader": {"batch_size": 1, "num_points": 256,
                        "num_workers": 0, "buffer_size": 0},
        "model": MODEL_CFG,
        "optimizer": {"max_iterations": 1},
    }
    with open(ws / "timing.yaml", "w") as f:
        yaml.dump(cfg, f)

    for extra in ([], ["--sequential", "--upload_dtype", "uint16"]):
        result = _run([
            osp.join(SCRIPTS, "timing.py"), str(ws / "timing.yaml"), *extra,
        ], env)
        lines = [ln for ln in result.stdout.splitlines() if ln.strip()]
        ms_lines = [float(ln) for ln in lines
                    if not ln.startswith("#") and ":" not in ln]
        assert len(ms_lines) == N_FRAMES - 1
        assert all(m > 0 for m in ms_lines)
        summary = [ln for ln in lines if ln.startswith("#")]
        assert any("compute-only" in ln for ln in summary)
        assert any("wall ms/frame" in ln for ln in summary)


def test_inference_cli_batched_pairwise(workspace):
    """--parallel_sequences on a NON-sequential scenario batches pairs
    through predict_batch; poses match the pair-at-a-time path bit-for-bit
    when clouds fit num_points (no subsampling)."""
    ws, env = workspace
    scenario = {
        "name": "kitti_pairwise",
        "dataset_type": "kitti_odometry_velodyne",
        "sequential": False,
        "data": {"04": str(ws / "04.pack")},
    }
    with open(ws / "scenario_pw.yaml", "w") as f:
        yaml.dump(scenario, f)

    outs = {}
    for tag, extra in {"plain": [], "bat": ["--parallel_sequences", "3"]}.items():
        out_base = ws / f"out_pw_{tag}"
        _run([
            osp.join(SCRIPTS, "inference.py"), str(ws / "scenario_pw.yaml"),
            "toy", str(out_base), "--num_points", "384", *extra,
        ], env)
        outs[tag] = out_base / os.listdir(out_base)[0]

    plain = np.atleast_2d(np.loadtxt(outs["plain"] / "04.txt"))
    bat = np.atleast_2d(np.loadtxt(outs["bat"] / "04.txt"))
    # N_FRAMES-1 pairs; batch 3 leaves a padded tail chunk whose extra
    # lanes must be discarded, not recorded
    assert plain.shape == bat.shape == (N_FRAMES - 1, 26)
    np.testing.assert_allclose(bat[:, :25], plain[:, :25], atol=1e-5)
