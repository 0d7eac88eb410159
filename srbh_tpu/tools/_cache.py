"""Opt-in persistent-compilation-cache setup for the bench/profiling CLIs.

Call from ``main()``/``__main__`` ONLY — never at module import. Enabling
the persistent cache is process-global jax config, and these tools are
also imported as libraries (``bench.py``, tests). An import-time update
once poisoned the torch-oracle suite: importing ``tools.train_bench``
inside pytest enabled ``/tmp/jaxcache`` for the whole process, and the
train-step oracle's jit was then served from a cache entry compiled with
different codegen (XLA:CPU machine-feature mismatch logged by
``cpu_aot_loader``), drifting its step-3 loss just past the 1e-3 oracle
tolerance — only when the suite ran in full. Keeping the cache opt-in per
CLI process removes the whole class.
"""
from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    import jax

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
