"""Core module tests: config, registry, mesh, rng."""

import jax
import numpy as np
import pytest

from egot2x.core.config import Config
from egot2x.core.mesh import batch_sharding, make_mesh
from egot2x.core.registry import Registry
from egot2x.core.rng import KeyChain


def test_config_attribute_and_merge():
    cfg = Config(a=1, b={"c": 2})
    assert cfg.a == 1 and cfg.b.c == 2
    cfg.merge({"b": {"d": 3}})
    assert cfg.b.c == 2 and cfg.b.d == 3


def test_config_dotlist_coercion():
    cfg = Config()
    cfg.merge_dotlist(["SOLVER.LR", "1e-4", "DATA.TASK", "pnr",
                       "MODEL.DIMS", "[1, 2]"])
    assert cfg.SOLVER.LR == 1e-4
    assert cfg.DATA.TASK == "pnr"
    assert cfg.MODEL.DIMS == [1, 2]


def test_config_yaml_roundtrip(tmp_path):
    cfg = Config(A={"B": 5}, C="x")
    p = tmp_path / "c.yaml"
    p.write_text(cfg.dump_yaml())
    cfg2 = Config.from_yaml(str(p))
    assert cfg2.A.B == 5 and cfg2.C == "x"


def test_config_freeze_blocks_new_keys():
    cfg = Config(a=1).freeze()
    cfg.a = 2  # existing keys stay writable
    with pytest.raises(AttributeError):
        cfg.new_key = 3


def test_registry_duplicate_and_unknown():
    r = Registry("X")

    @r.register
    def foo():
        return 1

    with pytest.raises(KeyError):
        r.register(lambda: 2, name="foo")
    with pytest.raises(KeyError, match="Known: foo"):
        r.get("bar")
    assert r.get("foo")() == 1


def test_mesh_shapes():
    mesh = make_mesh(jax.devices())
    assert mesh.devices.size == jax.device_count()
    mesh2 = make_mesh(jax.devices(), model=2)
    assert mesh2.shape["model"] == 2
    with pytest.raises(ValueError):
        make_mesh(jax.devices()[:3], model=2)


def test_keychain_determinism():
    k1 = KeyChain(7)
    k2 = KeyChain(7)
    a = np.asarray(jax.random.key_data(k1.next("x")))
    b = np.asarray(jax.random.key_data(k2.next("x")))
    np.testing.assert_array_equal(a, b)
    # streams differ by name and by draw
    c = np.asarray(jax.random.key_data(k1.next("x")))
    d = np.asarray(jax.random.key_data(k1.next("y")))
    assert not np.array_equal(a, c)
    assert not np.array_equal(a, d)
    # epoch keys reproducible
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(k1.epoch_key("s", 3))),
        np.asarray(jax.random.key_data(k2.epoch_key("s", 3))))
