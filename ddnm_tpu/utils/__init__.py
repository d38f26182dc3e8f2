"""Runtime utilities: platform selection, jitted init, timing, observability."""

from ddnm_tpu.utils.runtime import (
    apply_platform_env,
    enable_compilation_cache,
    is_remote_compile_backend,
    jit_init,
    sync,
)
from ddnm_tpu.utils.observability import MetricsLogger, StepTimer, profile

__all__ = [
    "apply_platform_env",
    "enable_compilation_cache",
    "is_remote_compile_backend",
    "jit_init",
    "sync",
    "MetricsLogger",
    "StepTimer",
    "profile",
]
