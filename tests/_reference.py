"""Helpers to import the PyTorch reference (read-only, at /root/reference)
for golden-value parity tests. The reference is treated as an oracle only —
none of its code is vendored here.

Reference modules have top-level imports of cv2/lmdb/blobfile which may be
absent; we stub those (they are dead imports on the paths we exercise, e.g.
`import cv2` at functions/svd_operators.py:2 is never used).
"""

import importlib
import sys
from pathlib import Path
import types

import pytest

REFERENCE_ROOT = "/root/reference"

_STUB_MODULES = [
    "cv2",
    "lmdb",
    "blobfile",
    "torchvision",
    "torchvision.transforms",
    "torchvision.utils",
    "torchvision.datasets",
]


def _ensure_stubs():
    for name in _STUB_MODULES:
        if name not in sys.modules:
            try:
                importlib.import_module(name)
            except ImportError:
                mod = types.ModuleType(name)
                sys.modules[name] = mod
                if "." in name:
                    parent, child = name.rsplit(".", 1)
                    setattr(sys.modules[parent], child, mod)
    # The reference's top-level `datasets` package pulls in torchvision
    # transforms at import time; guided_diffusion.diffusion only needs these
    # three names from it, so give it a minimal oracle-safe stand-in.
    if "datasets" not in sys.modules:
        mod = types.ModuleType("datasets")
        mod.get_dataset = None
        mod.data_transform = lambda config, x: 2 * x - 1
        mod.inverse_data_transform = lambda config, x: ((x + 1) / 2).clamp(0, 1)
        sys.modules["datasets"] = mod


def import_hq_reference(module: str):
    """Import a module from the hq_demo fork's guided_diffusion package under
    the alias `hq_guided_diffusion` (the fork shadows the main package name).
    """
    _ensure_stubs()
    import importlib.util

    alias = "hq_guided_diffusion"
    pkg_dir = f"{REFERENCE_ROOT}/hq_demo/guided_diffusion"
    if alias not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            alias, f"{pkg_dir}/__init__.py", submodule_search_locations=[pkg_dir]
        )
        pkg = importlib.util.module_from_spec(spec)
        sys.modules[alias] = pkg
        spec.loader.exec_module(pkg)
    try:
        # hq modules do absolute imports like `from guided_diffusion.scheduler
        # import ...`; the main-pipeline package (also named guided_diffusion)
        # has no such submodules, so alias them in without conflict.
        for sub in ("scheduler", "respace", "gaussian_diffusion", "losses", "nn"):
            target = f"guided_diffusion.{sub}"
            if target not in sys.modules:
                try:
                    sys.modules[target] = importlib.import_module(f"{alias}.{sub}")
                except Exception:
                    pass
        return importlib.import_module(f"{alias}.{module}")
    except Exception as e:  # pragma: no cover
        if not Path(REFERENCE_ROOT).exists():
            pytest.skip(f"reference tree missing: {e}")
        raise  # reference exists -> an import failure is a REAL regression


def import_reference(module: str):
    """Import a module from the reference repo, or skip the test."""
    _ensure_stubs()
    if REFERENCE_ROOT not in sys.path:
        # APPEND, never prepend: the reference root has its own top-level
        # `main.py`, which would otherwise shadow this repo's CLI module for
        # any test that runs after a parity test (order-dependent failures).
        sys.path.append(REFERENCE_ROOT)
    try:
        import torch  # noqa: F401
    except ImportError:
        pytest.skip("torch unavailable; reference parity tests skipped")
    try:
        return importlib.import_module(module)
    except Exception as e:  # pragma: no cover
        if not Path(REFERENCE_ROOT).exists():
            pytest.skip(f"reference tree missing: {e}")
        raise  # reference exists -> an import failure is a REAL regression
