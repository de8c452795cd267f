"""Small runtime helpers for CLI entry points."""

from __future__ import annotations

import os
import sys


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist XLA compilations across processes.

    The eval pyramid compiles one program per bucketed image shape; with the
    on-disk cache a second run (or a resumed sweep) skips all of them.
    """
    import jax

    cache_dir = path or os.path.join(
        os.path.expanduser("~"), ".cache", "tinyfaces_tpu_xla"
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # older jax without these flags: best-effort
        pass


def clean_exit(code: int = 0) -> None:
    """Flush stdio and hard-exit.

    Some TPU runtime plugins (e.g. the axon tunnel) leave non-daemon threads
    that stall interpreter shutdown for minutes; CLIs call this after their
    work is fully flushed to disk.
    """
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(code)
