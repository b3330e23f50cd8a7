"""Config system tests: schema, extends-inheritance, freeze, overrides."""
import os
import os.path as osp

import pytest

from deepclr_tpu.config import Config, Mode, load_config
from deepclr_tpu.geometry import LabelType
from deepclr_tpu.losses import MetricType
from deepclr_tpu.models import ModelType

CONFIG_DIR = osp.join(osp.dirname(__file__), "..", "..", "configs", "training")


@pytest.fixture(autouse=True)
def _env(tmp_path, monkeypatch):
    monkeypatch.setenv("MODEL_PATH", str(tmp_path / "models"))
    monkeypatch.setenv("KITTI_PATH", str(tmp_path / "kitti"))
    monkeypatch.setenv("MODELNET40_PATH", str(tmp_path / "modelnet40"))


def test_basic_config_tree():
    cfg = Config(allow_dynamic_params=True)
    cfg.define_param("alpha", default=1.0)
    grp = cfg.define_group("sub")
    cfg.define_param("beta", parent=grp, required=True)
    assert cfg.alpha == 1.0
    assert not cfg.is_valid()
    cfg.sub.beta = 3
    assert cfg.is_valid()
    cfg.read_dict({"alpha": 2.0, "sub": {"beta": 5}})
    assert cfg.alpha == 2.0 and cfg.sub.beta == 5

    cfg.freeze()
    with pytest.raises(RuntimeError):
        cfg.alpha = 9.0
    cfg.defrost()
    cfg.alpha = 9.0
    assert cfg.alpha == 9.0


def test_dotted_overrides():
    cfg = Config(allow_dynamic_params=True)
    grp = cfg.define_group("optimizer")
    cfg.define_param("base_lr", parent=grp, default=1e-4)
    cfg.read_list(["optimizer.base_lr", "0.5"])
    assert cfg.optimizer.base_lr == 0.5


def test_load_kitti_base_training_config():
    cfg = load_config(osp.join(CONFIG_DIR, "kitti_base.yaml"), Mode.TEST)
    assert cfg.model.label_type == LabelType.POSE3D_DUAL_QUAT
    assert cfg.model.model_type == ModelType.DEEPCLR
    assert cfg.model.input_dim == 4
    assert cfg.data_loader.batch_size == 5
    assert cfg.optimizer.name == "Ranger"
    assert cfg.optimizer.max_iterations == 800000
    assert cfg.metrics.loss[0]["type"] == MetricType.TRANS
    assert cfg.metrics.loss[1]["weights"] == [200.0]
    assert cfg.scheduler.params["cyclic_iterations"] == 600000
    assert cfg.is_frozen()

    params = cfg.model.params.to_dict()
    assert params["cloud_features"]["params"]["npoint"] == [1024]
    assert params["merge"]["params"]["k"] == 20


def test_extends_inheritance():
    cfg = load_config(osp.join(CONFIG_DIR, "kitti_00-10.yaml"), Mode.TEST)
    # child values
    assert cfg.identifier == "kitti_00-10"
    assert len(cfg.data.training) == 11
    assert cfg.transforms.translation_noise.scale == [0.2, 0.02, 0.02]
    # inherited values from kitti_base.yaml
    assert cfg.optimizer.name == "Ranger"
    assert cfg.model.params.to_dict()["merge"]["params"]["radius"] == 10.0
    assert cfg.extends is None


def test_new_mode_creates_experiment(tmp_path):
    cfg = load_config(osp.join(CONFIG_DIR, "modelnet40.yaml"), Mode.NEW)
    assert cfg.experiment is not None
    assert cfg.output_dir.startswith(os.environ["MODEL_PATH"])
    assert "modelnet40" in cfg.experiment


def test_continue_mode_requires_checkpoint():
    with pytest.raises(RuntimeError, match="checkpoint"):
        load_config(osp.join(CONFIG_DIR, "kitti_base.yaml"), Mode.CONTINUE)


def test_config_yaml_round_trip(tmp_path):
    cfg = load_config(osp.join(CONFIG_DIR, "kitti_base.yaml"), Mode.TEST)
    out = tmp_path / "dump.yaml"
    cfg.write_file(str(out))

    cfg2 = load_config(str(out), Mode.TEST)
    assert cfg2.model.label_type == cfg.model.label_type
    assert cfg2.optimizer.max_iterations == cfg.optimizer.max_iterations
    assert (
        cfg2.model.params.to_dict()["cloud_features"]
        == cfg.model.params.to_dict()["cloud_features"]
    )


def test_unresolved_env_var_raises(tmp_path):
    from deepclr_tpu.utils.path import expand_path

    with pytest.raises(RuntimeError, match="DOES_NOT_EXIST"):
        expand_path("${DOES_NOT_EXIST_XYZ:-x}/foo".replace(":-x", ""))
