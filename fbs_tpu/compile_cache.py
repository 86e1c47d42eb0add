"""Persistent XLA compilation cache for the experiment entry points.

TPU compiles of the full Gibbs-sweep programs take minutes each (they go
through a remote compile helper on this platform); the persistent cache
makes every rerun — and every CLI that shares a compiled program shape —
start in seconds.  Verified to round-trip through the axon remote-compile
backend.

The reference has no equivalent (it relies on each Slurm job paying the
compile once and running for hours).  Library code stays pure: only entry
points (experiment CLIs, bench) opt in by calling :func:`enable`.
"""
from __future__ import annotations

import hashlib
import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/fbs_tpu_xla")


def _host_signature() -> str:
    """Short stable hash of this host's CPU feature set.

    XLA:CPU persists AOT-compiled executables whose cache key does not
    include the host's CPU features; loading an entry produced on a
    different machine (this VM is recreated with varying CPU models)
    logs a wall of ``cpu_aot_loader`` errors and can in principle SIGILL.
    CPU cache entries are therefore scoped per host-signature; TPU entries
    are keyed by chip type inside XLA already and stay shared.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:12]


def enable(cache_dir: str | None = None, min_compile_secs: float = 1.0) -> str:
    """Enable JAX's persistent compilation cache (idempotent).

    Honours ``JAX_COMPILATION_CACHE_DIR`` if set; returns the directory used.

    Also honours ``FBS_PLATFORM`` (e.g. ``cpu``): on this platform the stock
    ``JAX_PLATFORMS`` env var is captured by a sitecustomize before user code
    runs, so a smoke test of an experiment CLI would otherwise grab the
    (single-client) TPU and can wedge a long-running training job's RPC.
    Every entry point calls :func:`enable` before touching the backend, so
    the override is applied here.
    """
    import jax

    forced = os.environ.get("FBS_PLATFORM")
    if forced:
        jax.config.update("jax_platforms", forced)

    path = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT_DIR)
    # CPU executables are AOT-compiled for the host's exact ISA, so CPU cache
    # entries must be scoped per host signature (a shared dir SIGILLs across
    # heterogeneous hosts).  Scope when any config forces CPU — and also when
    # nothing forces a platform at all and auto-detection resolves to CPU
    # (initialising the backend is harmless then: no accelerator is
    # configured, and callers proceed to compute right after).
    # jax.config reflects runtime forcing too (jax.config.update("jax_platforms",
    # "cpu") — the only override that works under this platform's sitecustomize),
    # which the env-var checks alone missed: such runs read/wrote the shared
    # top-level dir and kept the cpu_aot_loader error walls alive.
    cfg_platforms = getattr(jax.config, "jax_platforms", None) or ""
    cpu = ((forced or "").startswith("cpu")
           or cfg_platforms.startswith("cpu")
           or os.environ.get("JAX_PLATFORMS", "").startswith("cpu"))
    if (not cpu and not forced and not cfg_platforms
            and not os.environ.get("JAX_PLATFORMS")):
        cpu = jax.default_backend() == "cpu"
    if cpu:
        # No persistent cache on CPU.  This XLA version's cpu_aot_loader
        # compares its own compile-side tuning flags (+prefer-no-scatter/
        # +prefer-no-gather) against the host's cpuinfo flags and logs a
        # spurious machine-feature-mismatch ERROR for every entry it loads —
        # even entries compiled seconds earlier on the same host (verified
        # empirically).  Host-signature scoping therefore cannot silence it.
        # CPU compiles here take seconds, so the cache buys nothing worth a
        # wall of alarming errors in every tabulator/test run; the cache
        # stays on for TPU, where the remote compile helper costs minutes.
        jax.config.update("jax_enable_compilation_cache", False)
        return ""
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    return path
