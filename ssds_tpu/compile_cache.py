"""Persistent XLA compilation cache wiring.

The reference pays no compile cost (PyTorch eager + cuDNN autotune); under
XLA the first compile of the big train/predict programs is the dominant
startup cost — 20–40 s on-host, and **1–10 minutes** through a tunneled
backend. Enabling JAX's persistent compilation cache makes every program
after the first session load from disk, so repeated CLI runs
(train/test/demo/bench) start in seconds.

Opt-out with ``SSDS_TPU_NO_COMPILE_CACHE=1``; relocate with
``SSDS_TPU_COMPILE_CACHE=/path``. Safe to call multiple times and before or
after backend initialization (``jax_compilation_cache_dir`` is read at
compile time, not at backend init).
"""

from __future__ import annotations

import os

_enabled = False


def enable_compile_cache() -> None:
    """Idempotent: point JAX's persistent compilation cache at a disk dir."""
    global _enabled
    if _enabled or os.environ.get("SSDS_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    try:
        backend = jax.default_backend()
    except Exception:
        return
    if backend == "cpu":
        # XLA:CPU AOT reload is machine-feature pinned (loud
        # prefer-no-scatter/-gather mismatch errors + SIGILL risk when the
        # compile and execute hosts differ) and CPU compiles are cheap —
        # cache only accelerator programs.
        return
    path = os.environ.get("SSDS_TPU_COMPILE_CACHE") or os.path.expanduser(
        "~/.cache/ssds_tpu/xla")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache even quick compiles: the tunnel RTT makes every remote
        # compile expensive regardless of XLA's own compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    except Exception as e:  # noqa: BLE001 — cache is best-effort, never fatal
        print(f"warning: compile cache disabled ({type(e).__name__}: {e})",
              flush=True)
