"""Config loader: inherit_from chain + deep merge."""

import os

from coslam_tpu.config import load_config, update_recursive

HERE = os.path.dirname(os.path.abspath(__file__))
CONFIGS = os.path.join(os.path.dirname(HERE), "configs")


def test_update_recursive():
    a = {"x": {"y": 1, "z": 2}, "k": 0}
    update_recursive(a, {"x": {"y": 5}, "new": {"n": 1}})
    assert a == {"x": {"y": 5, "z": 2}, "k": 0, "new": {"n": 1}}


def test_inherit_chain(tmp_path):
    parent = tmp_path / "base.yaml"
    parent.write_text("a: 1\nnest:\n  x: 1\n  y: 2\n")
    child = tmp_path / "child.yaml"
    child.write_text(f"inherit_from: {parent}\nnest:\n  y: 3\nb: 2\n")
    cfg = load_config(str(child))
    assert cfg["a"] == 1 and cfg["b"] == 2
    assert cfg["nest"] == {"x": 1, "y": 3}


def test_repo_configs_load():
    cfg = load_config(os.path.join(CONFIGS, "Replica", "room0.yaml"))
    assert cfg["dataset"] == "replica"
    assert cfg["mapping"]["sample"] == 2048
    assert cfg["mapping"]["bound"][0] == [-1.0, 7.0]
    assert cfg["grid"]["enc"] == "HashGrid"
    assert cfg["training"]["trunc"] == 0.1

    tum = load_config(os.path.join(CONFIGS, "Tum", "fr1_desk.yaml"))
    assert tum["dataset"] == "tum"
    assert tum["training"]["n_importance"] == 128


def test_flagship_config_builds():
    """configs/Replica/room0_vm.yaml (the bench.py headline operating
    point) must load through the inherit chain and build a working
    3-level TensoVM model."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from coslam_tpu.models.scene_rep import JointEncoding

    cfg = load_config(os.path.join(CONFIGS, "Replica", "room0_vm.yaml"))
    assert cfg["grid"]["enc"] == "TensoVM"
    assert cfg["grid"]["triplane_levels"] == 3
    assert cfg["training"]["n_samples_d"] == 16
    model = JointEncoding(cfg, np.array(cfg["mapping"]["bound"],
                                        np.float32))
    params = model.init_params(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (17, 3),
                           minval=-1.0, maxval=1.0)
    sdf = model.query_sdf(params, x)
    assert sdf.shape == (17,) and bool(jnp.all(jnp.isfinite(sdf)))
