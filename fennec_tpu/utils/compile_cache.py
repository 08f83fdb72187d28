"""Persistent XLA compile-cache enablement.

First-time XLA compiles of the search/emission programs take tens of
seconds (minutes over a remote-device tunnel); a short-lived process —
the CLI especially — would pay that on every invocation.  Enabling
JAX's persistent compilation cache makes every geometry compile once
per machine.  Opt out with FENNEC_NO_COMPILE_CACHE=1 or by pointing
FENNEC_COMPILE_CACHE at a different directory.
"""

from __future__ import annotations

import os

_DONE = False


def enable_compile_cache() -> None:
    """Idempotently point JAX's persistent compile cache at
    ~/.cache/fennec_jax_cache (or $FENNEC_COMPILE_CACHE).  Best-effort:
    config-name drift across JAX versions must never break the CLI."""
    global _DONE
    if _DONE or os.environ.get("FENNEC_NO_COMPILE_CACHE"):
        return
    _DONE = True
    import jax

    path = os.environ.get(
        "FENNEC_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "fennec_jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
