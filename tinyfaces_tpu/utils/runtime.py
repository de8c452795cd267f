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


def warm_d2h_async():
    """Start the backend's one-time D2H path init on a daemon thread.

    The remote tunnel pays a size-independent, once-per-process init on
    the FIRST device->host fetch — measured 181-470 s with direct probes
    (docs/PERF.md round 5c); it was misattributed as "compile" in
    BENCH_r04's 411.6 s warmup and it is why short cold-process eval
    sweeps recorded ~1 img/s (the 192-image sweep's work is ~3 s; the
    init dominated). H2D, dispatch, and compile all proceed during the
    init, so firing a 1-element fetch at entry-point start overlaps it
    with checkpoint load, compiles, and executable uploads.

    Returns the thread; join() it to block until D2H is warm, or check
    the module flag `warm_d2h_async.done` (set on completion).
    """
    import threading
    import time as _time

    def _warm():
        try:
            import jax
            import numpy as np

            t0 = _time.perf_counter()
            np.asarray(jax.device_put(np.zeros(1, np.float32)))
            warm_d2h_async.init_s = round(_time.perf_counter() - t0, 1)
        except Exception:
            pass
        warm_d2h_async.done = True

    t = threading.Thread(target=_warm, daemon=True, name="d2h-init-warm")
    t.start()
    return t


warm_d2h_async.done = False
warm_d2h_async.init_s = None


def clean_exit(code: int = 0) -> None:
    """Flush stdio and hard-exit.

    Some TPU runtime plugins (e.g. the axon tunnel) leave non-daemon threads
    that stall interpreter shutdown for minutes; CLIs call this after their
    work is fully flushed to disk.
    """
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(code)
