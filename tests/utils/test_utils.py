"""Utility coverage: pcv rendering, factory, prepare_tensor, profiling."""
import numpy as np


def test_pcv_saves_figure(tmp_path):
    from deepclr_tpu.utils.pcv import PointCloudVisualizer

    viz = PointCloudVisualizer()
    rng = np.random.default_rng(0)
    viz.add_cloud("a", rng.normal(size=(50, 3)), color=(1, 0, 0))
    viz.add_cloud("b", rng.normal(size=(70, 4)))
    viz.add_ground_plane(z=-1.0)
    viz.set_camera(elev=45)
    out = tmp_path / "clouds.png"
    viz.save(str(out))
    viz.close()
    assert out.exists() and out.stat().st_size > 1000


def test_factory_by_name():
    from deepclr_tpu.utils.factory import factory

    class Base:
        def __init__(self, v):
            self.v = v

    class Child(Base):
        pass

    class GrandChild(Child):
        pass

    assert isinstance(factory(Base, "GrandChild", 3), GrandChild)
    assert factory(Base, "Child", 5).v == 5
    try:
        factory(Base, "Nope")
        assert False
    except ValueError:
        pass


def test_prepare_tensor_and_device_timer():
    import jax

    from deepclr_tpu.utils.profiling import device_timer, sync
    from deepclr_tpu.utils.tensor import prepare_tensor

    tree = {"a": np.ones((4, 4)), "b": [np.zeros(3), "keep"]}
    moved = prepare_tensor(tree, device=jax.devices()[0])
    assert isinstance(moved["a"], jax.Array)
    assert moved["b"][1] == "keep"

    with device_timer() as t:
        out = moved["a"] + 1
        sync(out)
    assert t["ms"] >= 0.0
