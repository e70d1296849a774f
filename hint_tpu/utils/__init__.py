"""Shared utilities: compilation cache, profiling, timing.

The reference's only observability is wall-clock prints
(/root/reference/train_unconditional.py:188,208); here we expose the JAX
profiler and a persistent compilation cache (compiles of the unrolled HAC
graphs are the dominant fixed cost on repeated runs).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional


def respect_env_platforms() -> None:
    """Re-assert ``JAX_PLATFORMS`` over any sitecustomize plugin.

    Some environments register an accelerator PJRT plugin from
    sitecustomize via ``jax.config.update("jax_platforms", ...)``, which
    silently overrides the env var; a ``JAX_PLATFORMS=cpu`` run would then
    still grab the accelerator (and contend with whatever owns it)."""
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def enable_compilation_cache(
    cache_dir: Optional[str] = None, min_compile_secs: float = 1.0
) -> None:
    """Persist compiled XLA executables across processes.

    Safe to call multiple times; honors ``HINT_TPU_CACHE_DIR``. Also
    re-asserts ``JAX_PLATFORMS`` (every process entry point calls this
    first, so the env var stays authoritative everywhere)."""
    import jax

    respect_env_platforms()
    cache_dir = cache_dir or os.environ.get(
        "HINT_TPU_CACHE_DIR", os.path.expanduser("~/.cache/hint_tpu_xla")
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Running per-step wall-clock stats for the train loop."""

    def __init__(self):
        self.n = 0
        self.total = 0.0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.total += time.perf_counter() - self._t0
        self.n += 1
        return False

    @property
    def mean(self) -> float:
        return self.total / max(self.n, 1)
