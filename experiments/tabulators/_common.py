"""Shared setup for the tabulators/plotters (host analytics).

These scripts crunch committed result artifacts; they must never touch the
TPU backend (on this platform the default 'axon' device is reached through a
tunnel and compiles via a remote helper — minutes per program).  ``setup()``
pins JAX to CPU via the config API (the ``JAX_PLATFORMS`` env var is captured
before user code runs and is ignored) and enables the persistent compile
cache, so every tabulator starts and finishes in seconds.

``experiments_dir()`` resolves artifact paths relative to this file rather
than the caller's cwd, so the tabulators work from any directory.
"""
import os
import sys


def setup():
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
    from fbs_tpu.compile_cache import enable

    enable()


def experiments_dir() -> str:
    """Absolute path of the experiments/ directory (parent of tabulators/)."""
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def fail_if_empty(found: int, what: str):
    """Exit nonzero (not a silent success) when no artifacts matched."""
    if found == 0:
        print(f"ERROR: no {what} found — check the artifact directory and flags.",
              file=sys.stderr)
        sys.exit(1)
