"""Mesh/sharding utilities on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_build_mesh_shapes():
    from gomatching_tpu.parallel import build_mesh

    n = len(jax.devices())
    mesh = build_mesh()
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["data"] == n and mesh.shape["model"] == 1


def test_build_mesh_from_cfg_model_axis():
    from gomatching_tpu.config import setup_eval_cfg
    from gomatching_tpu.parallel import build_mesh

    n = len(jax.devices())
    if n % 2:
        pytest.skip("needs an even device count")
    cfg = setup_eval_cfg(
        "configs/GoMatching_ICDAR15.yaml",
        ["MODEL.WEIGHTS", "''", "TPU.MESH_MODEL", "2", "TPU.MESH_DATA", "-1"],
    )
    mesh = build_mesh(cfg)
    assert mesh.shape["model"] == 2 and mesh.shape["data"] == n // 2


def test_shard_batch_and_params_round_trip():
    import jax.numpy as jnp

    from gomatching_tpu.parallel import build_mesh, shard_batch, shard_params

    mesh = build_mesh()
    n = mesh.shape["data"]
    batch = {"x": np.arange(n * 4, dtype=np.float32).reshape(n, 4)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.spec == jax.sharding.PartitionSpec("data")
    np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])

    params = {"w": np.ones((3, 3), np.float32)}
    repl = shard_params(params, mesh)
    assert repl["w"].sharding.spec == jax.sharding.PartitionSpec()
    # a jitted reduction over the sharded batch must see the global array
    total = jax.jit(lambda b: jnp.sum(b["x"]))(sharded)
    assert float(total) == float(batch["x"].sum())


def test_maybe_init_distributed(monkeypatch):
    """train_net --num-machines wiring (reference train_net.py:198-208): the
    single-host default is a no-op; >1 machines calls jax.distributed.initialize
    with the tcp:// prefix stripped; 'auto' defers to env-driven init."""
    import sys

    sys.path.insert(0, ".")
    import train_net

    calls = []

    def fake_init(**kw):
        calls.append(kw)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)

    args = train_net.get_parser().parse_args(
        ["--config-file", "configs/GoMatching_ICDAR15.yaml"]
    )
    train_net.maybe_init_distributed(args)
    assert calls == []  # single host: no-op

    args = train_net.get_parser().parse_args(
        ["--config-file", "x", "--num-machines", "4", "--machine-rank", "2",
         "--dist-url", "tcp://10.0.0.1:1234"]
    )
    train_net.maybe_init_distributed(args)
    assert calls == [
        {"coordinator_address": "10.0.0.1:1234", "num_processes": 4,
         "process_id": 2}
    ]

    calls.clear()
    args = train_net.get_parser().parse_args(
        ["--config-file", "x", "--num-machines", "2"]
    )
    train_net.maybe_init_distributed(args)
    assert calls == [{}]  # auto -> env-driven initialize()
