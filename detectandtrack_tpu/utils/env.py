"""Environment / runtime report (Parity: `lib/utils/env.py`, SURVEY.md §2.1).

The reference's env.py wrangles Caffe2 import paths; the TPU-native
equivalent reports the jax runtime: backend, devices, mesh capabilities,
library versions — used by the CLI banner and bug reports.
"""

from __future__ import annotations

import platform
from typing import Dict


def get_runtime_info() -> Dict[str, str]:
    import jax

    info = {
        "python": platform.python_version(),
        "platform": platform.platform(),
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": ", ".join(str(d) for d in jax.devices()),
        "device_count": str(jax.device_count()),
        "process_count": str(jax.process_count()),
    }
    for mod in ("flax", "optax", "numpy"):
        try:
            info[mod] = __import__(mod).__version__
        except Exception:
            info[mod] = "n/a"
    try:
        import orbax.checkpoint as ocp
        info["orbax-checkpoint"] = getattr(ocp, "__version__", "ok")
    except Exception:
        info["orbax-checkpoint"] = "n/a"
    return info


def log_runtime_info(logger) -> None:
    for k, v in get_runtime_info().items():
        logger.info("env: %s = %s", k, v)
