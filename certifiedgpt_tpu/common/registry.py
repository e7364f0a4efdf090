"""Global component registry.

Single process-wide name->class mapping for dataset builders, processors,
models, agents and LR schedulers, plus a dotted-key state store for paths
and shared singletons (logger, configuration).

Capability parity with the reference registry (``common/registry.py:9-267``
in the reference tree): the same categories, the same decorator-based
registration style, and the same public names are kept so that YAML configs
written for the reference resolve identically here
(``image_text_finetune``, ``image_text_eval``, ``minigpt4``,
``blip2_image_train``, ``blip_caption``, ``vqav2``, ``cc_sbu``,
``testvqav2``...).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Type


class Registry:
    mapping: Dict[str, Dict[str, Any]] = {
        "builder_name_mapping": {},
        "processor_name_mapping": {},
        "model_name_mapping": {},
        "agent_name_mapping": {},
        "lr_scheduler_name_mapping": {},
        "state": {},
        "paths": {},
    }

    # ------------------------------------------------------------------
    # decorators
    # ------------------------------------------------------------------
    @classmethod
    def _register(cls, table: str, name: str) -> Callable[[Type], Type]:
        def wrap(target: Type) -> Type:
            existing = cls.mapping[table].get(name)
            if existing is not None and existing is not target:
                raise KeyError(
                    f"Name '{name}' already registered for {existing} in {table}"
                )
            cls.mapping[table][name] = target
            return target

        return wrap

    @classmethod
    def register_builder(cls, name: str):
        return cls._register("builder_name_mapping", name)

    @classmethod
    def register_processor(cls, name: str):
        return cls._register("processor_name_mapping", name)

    @classmethod
    def register_model(cls, name: str):
        return cls._register("model_name_mapping", name)

    @classmethod
    def register_agent(cls, name: str):
        return cls._register("agent_name_mapping", name)

    @classmethod
    def register_lr_scheduler(cls, name: str):
        return cls._register("lr_scheduler_name_mapping", name)

    # ------------------------------------------------------------------
    # getters
    # ------------------------------------------------------------------
    @classmethod
    def get_builder_class(cls, name: str):
        return cls.mapping["builder_name_mapping"].get(name)

    @classmethod
    def get_processor_class(cls, name: str):
        return cls.mapping["processor_name_mapping"].get(name)

    @classmethod
    def get_model_class(cls, name: str):
        return cls.mapping["model_name_mapping"].get(name)

    @classmethod
    def get_agent_class(cls, name: str):
        return cls.mapping["agent_name_mapping"].get(name)

    @classmethod
    def get_lr_scheduler_class(cls, name: str):
        return cls.mapping["lr_scheduler_name_mapping"].get(name)

    @classmethod
    def list_builders(cls):
        return sorted(cls.mapping["builder_name_mapping"].keys())

    @classmethod
    def list_processors(cls):
        return sorted(cls.mapping["processor_name_mapping"].keys())

    @classmethod
    def list_models(cls):
        return sorted(cls.mapping["model_name_mapping"].keys())

    @classmethod
    def list_agents(cls):
        return sorted(cls.mapping["agent_name_mapping"].keys())

    # ------------------------------------------------------------------
    # paths
    # ------------------------------------------------------------------
    @classmethod
    def register_path(cls, name: str, path: str) -> None:
        cls.mapping["paths"][name] = path

    @classmethod
    def get_path(cls, name: str, default: Any = None):
        return cls.mapping["paths"].get(name, default)

    # ------------------------------------------------------------------
    # dotted-key state store (logger, configuration, ... live here)
    # ------------------------------------------------------------------
    @classmethod
    def register(cls, name: str, obj: Any) -> None:
        """Store ``obj`` under dotted key ``name`` (e.g. ``a.b.c``)."""
        path = name.split(".")
        current = cls.mapping["state"]
        for part in path[:-1]:
            current = current.setdefault(part, {})
        current[path[-1]] = obj

    @classmethod
    def get(cls, name: str, default: Any = None, no_warning: bool = True):
        path = name.split(".")
        value: Any = cls.mapping["state"]
        for part in path:
            if not isinstance(value, dict) or part not in value:
                return default
            value = value[part]
        return value

    @classmethod
    def unregister(cls, name: str):
        return cls.mapping["state"].pop(name, None)

    # The reference stores the logger and live Config under these keys and
    # fetches them everywhere via get_configuration_class (ref
    # agents/base.py:252-255); keep the same accessor name.
    @classmethod
    def get_configuration_class(cls, name: str):
        return cls.get(name)


registry = Registry
