"""Import-time registration of all components.

The reference registers builders/processors/models/agents/schedulers by
importing their modules in the launcher (ref ``launch.py:17-26``); callers
here do the same with one import::

    from certifiedgpt_tpu import registration  # noqa: F401
"""

import certifiedgpt_tpu.data.processors  # noqa: F401
import certifiedgpt_tpu.data.builders  # noqa: F401
import certifiedgpt_tpu.models.model_zoo  # noqa: F401
import certifiedgpt_tpu.optim  # noqa: F401
import certifiedgpt_tpu.agents.finetune  # noqa: F401
import certifiedgpt_tpu.agents.eval  # noqa: F401
import certifiedgpt_tpu.agents.certify  # noqa: F401
import certifiedgpt_tpu.attack.agent  # noqa: F401
