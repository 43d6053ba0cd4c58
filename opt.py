"""Back-compat shim: the reference exposes ``from opt import get_opts``.

The real implementation lives in aon_tpu.utils.config (dataclass-backed,
same flag names, same JSON-wins overlay semantics).
"""

from aon_tpu.utils.config import get_config as get_opts  # noqa: F401
