from certifiedgpt_tpu.agents.base import BaseAgent, setup_agent  # noqa: F401
