"""Persistent XLA compilation cache (repo-local).

Remote compiles through the axon tunnel cost ~1-2 min per program; the
persistent cache turns repeat CLI/bench invocations into ~seconds.
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = Path(__file__).resolve().parent.parent.parent / ".jax_cache"


def enable_compilation_cache(path: str | os.PathLike | None = None) -> None:
    import jax

    p = Path(path) if path else _DEFAULT
    p.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(p))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
