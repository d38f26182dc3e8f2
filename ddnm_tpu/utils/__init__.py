"""Runtime utilities: platform selection, jitted init, timing."""

from ddnm_tpu.utils.runtime import (
    apply_platform_env,
    enable_compilation_cache,
    jit_init,
    sync,
)

__all__ = ["apply_platform_env", "enable_compilation_cache", "jit_init", "sync"]
