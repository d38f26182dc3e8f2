"""Runtime/runtime-environment helpers.

The axon TPU plugin pre-sets `jax_platforms` via the config API, which
silently overrides the JAX_PLATFORMS environment variable; `apply_platform_env`
re-asserts the user's choice. `jit_init` matters on remote-compiled backends:
flax's `Module.init` runs op-by-op eagerly, which costs minutes over a
compile tunnel (measured ~245 s for the 114M-param DDPM UNet vs one jitted
compile); wrapping it in `jax.jit` makes initialisation a single executable.
"""

from __future__ import annotations

import os

import jax

__all__ = [
    "apply_platform_env",
    "enable_compilation_cache",
    "is_remote_compile_backend",
    "jit_init",
    "sync",
]


def apply_platform_env() -> None:
    """Honour JAX_PLATFORMS even when a site plugin pre-set jax_platforms."""
    env = os.environ.get("JAX_PLATFORMS")
    if env:
        try:
            jax.config.update("jax_platforms", env)
        except Exception:
            pass  # backend already initialised; keep whatever it picked


def enable_compilation_cache(path: str = "") -> None:
    """Persistent XLA compilation cache (big win on remote-compile backends)."""
    cache = path or os.environ.get(
        "DDNM_TPU_CACHE", os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def jit_init(model, rngs, *args, **kwargs):
    """`model.init` under jit (one compile instead of eager per-op dispatch)."""
    return jax.jit(model.init)(rngs, *args, **kwargs)


def sync(tree):
    """Block until every array in `tree` is computed (fetch-free)."""
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return tree


def is_remote_compile_backend() -> bool:
    """True on the axon-tunnelled TPU dev environment (remote Mosaic/XLA
    compiler; scan-over-UNet and Pallas compiles are pathologically slow
    there — measured ~200 s for a trivial Pallas kernel). The backend name
    reports plain "tpu", so detect the plugin via its env/config
    fingerprints. Production TPU backends return False."""
    import os

    if jax.default_backend() == "cpu":
        return False
    if any(k.startswith("PALLAS_AXON") or k == "AXON_LOOPBACK_RELAY" for k in os.environ):
        return True
    try:
        platforms = jax.config.jax_platforms or ""
    except Exception:
        platforms = ""
    return "axon" in platforms
