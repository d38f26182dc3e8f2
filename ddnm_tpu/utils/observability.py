"""Observability: key-value metrics logging + device profiling.

The reference's observability surface is stdlib logging plus a tqdm PSNR bar
(SURVEY.md §5); its 495-line OpenAI logger is dead code. This module gives
the framework a live equivalent: a minimal key-value logger with
human/JSONL sinks (the useful subset of that dead logger's API) and a
`profile` context that wraps `jax.profiler.trace` so any run can emit an
XPlane trace viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from pathlib import Path
from typing import Optional

logger = logging.getLogger("ddnm_tpu")

__all__ = ["MetricsLogger", "profile", "StepTimer"]


class MetricsLogger:
    """Accumulate per-step metrics; dump to log + optional JSONL file.

    logkv / logkv_mean / dumpkvs mirror the reference logger's public API
    (guided_diffusion/logger.py:212-243) with a fraction of the machinery.
    """

    def __init__(self, jsonl_path: Optional[str | Path] = None):
        self._vals: dict = {}
        self._counts: dict = {}
        self._file = None
        if jsonl_path is not None:
            Path(jsonl_path).parent.mkdir(parents=True, exist_ok=True)
            self._file = open(jsonl_path, "a")

    def logkv(self, key: str, val) -> None:
        self._vals[key] = val
        self._counts[key] = 1

    def logkv_mean(self, key: str, val) -> None:
        n = self._counts.get(key, 0)
        old = self._vals.get(key, 0.0)
        self._vals[key] = (old * n + float(val)) / (n + 1)
        self._counts[key] = n + 1

    def dumpkvs(self) -> dict:
        out = {k: self._vals[k] for k in sorted(self._vals)}
        if out:
            logger.info(
                "metrics | %s",
                " ".join(f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                         for k, v in out.items()),
            )
            if self._file is not None:
                self._file.write(json.dumps({"ts": time.time(), **out}) + "\n")
                self._file.flush()
        self._vals.clear()
        self._counts.clear()
        return out

    def close(self) -> None:
        if self._file is not None:
            self._file.close()


@contextlib.contextmanager
def profile(trace_dir: Optional[str | Path]):
    """jax.profiler trace context; no-op when trace_dir is None."""
    if trace_dir is None:
        yield
        return
    import jax

    Path(trace_dir).mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(trace_dir)):
        yield
    logger.info("profiler trace written to %s", trace_dir)


class StepTimer:
    """Wall-clock step timing with device sync (images/sec/chip metric —
    the north-star throughput number, SURVEY.md §5)."""

    def __init__(self):
        self.t0 = None
        self.steps = 0
        self.items = 0
        self.elapsed = 0.0

    def start(self):
        self.t0 = time.perf_counter()

    def stop(self, tree, items: int = 0):
        import jax

        jax.device_get(jax.tree.leaves(tree)[0]) if jax.tree.leaves(tree) else None
        self.elapsed += time.perf_counter() - self.t0
        self.steps += 1
        self.items += items

    def items_per_sec(self) -> float:
        return self.items / self.elapsed if self.elapsed > 0 else 0.0
