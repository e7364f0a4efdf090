import os

import pytest

from certifiedgpt_tpu.common.config import Config, ConfigNode, load_yaml
from certifiedgpt_tpu.common.registry import registry


def test_registry_decorators_roundtrip():
    @registry.register_agent("unit_test_agent")
    class AnAgent:
        pass

    assert registry.get_agent_class("unit_test_agent") is AnAgent
    assert "unit_test_agent" in registry.list_agents()


def test_registry_duplicate_name_raises():
    @registry.register_model("unit_test_dup")
    class M1:
        pass

    with pytest.raises(KeyError):

        @registry.register_model("unit_test_dup")
        class M2:
            pass


def test_registry_dotted_state():
    registry.register("a.b.c", 42)
    assert registry.get("a.b.c") == 42
    assert registry.get("a.b.missing", "fallback") == "fallback"
    assert registry.get_configuration_class("a.b.c") == 42


def test_confignode_attribute_and_item_access():
    node = ConfigNode({"run": {"max_epoch": 10, "lr_sched": "warmup_cosine"}})
    assert node.run.max_epoch == 10
    assert node["run"]["lr_sched"] == "warmup_cosine"
    assert node.run.get("missing", 3) == 3
    assert "run" in node


def test_env_interpolation(monkeypatch):
    monkeypatch.setenv("UNIT_TEST_CKPT", "/data/ckpt.pth")
    node = ConfigNode({"model": {"ckpt": "${env:UNIT_TEST_CKPT}"}})
    assert node.model.ckpt == "/data/ckpt.pth"

    node2 = ConfigNode({"p": "${env:UNIT_TEST_UNSET,/default/path}"})
    assert node2.p == "/default/path"

    node3 = ConfigNode({"p": "${env:UNIT_TEST_UNSET_NO_DEFAULT}"})
    with pytest.raises(KeyError):
        _ = node3.p


def test_config_yaml_roundtrip(tmp_path):
    path = tmp_path / "cfg.yaml"
    path.write_text(
        """
model:
  arch: minigpt4
datasets:
  vqav2:
    batch_size: 4
run:
  agent: image_text_finetune
  max_epoch: 2
  evaluate: false
"""
    )
    cfg = Config(str(path))
    assert cfg.arch == "minigpt4"
    assert cfg.run.agent == "image_text_finetune"
    assert cfg.datasets.vqav2.batch_size == 4
    assert cfg.evaluate_only is False
    # Config registers itself like the reference does.
    assert registry.get("configuration") is cfg


def test_confignode_merge():
    base = ConfigNode({"run": {"max_epoch": 2, "seed": 42}})
    merged = base.merge({"run": {"max_epoch": 5}, "extra": 1})
    assert merged.run.max_epoch == 5
    assert merged.run.seed == 42
    assert merged.extra == 1
    assert base.run.max_epoch == 2  # original untouched
