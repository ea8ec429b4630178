"""Backend guard for device-measurement tools.

The package widens ``JAX_PLATFORMS=axon`` to ``axon,cpu`` (the host
tier needs the cpu backend registered next to the accelerator), which
means a dead accelerator plugin DEGRADES to a working cpu backend
instead of raising at init. bench.py's probe classifies that as
cpu-fallback; every other device-measurement tool calls
``guard_backend()`` so an outage can never silently record XLA:CPU
figures as device results (the measurement-integrity trap
BENCH_NOTES warns about).

The guard trips only when the environment asked for an accelerator
(``JAX_PLATFORMS`` mentions one) but the default backend came up cpu —
explicitly cpu-pinned runs (tests, host-side A/Bs) pass untouched.
"""

from __future__ import annotations

import os
import sys


def guard_backend(tool: str = "") -> str:
    """Exit(3) when an accelerator was requested but jax degraded to
    the cpu backend; returns the default backend name otherwise."""
    import jax

    requested = os.environ.get("JAX_PLATFORMS", "")
    backend = jax.default_backend()
    wanted_accel = any(p.strip() and p.strip() != "cpu"
                       for p in requested.split(","))
    if wanted_accel and backend == "cpu":
        print(
            f"{tool or 'device tool'}: JAX_PLATFORMS={requested!r} "
            "requested an accelerator but the default backend came up "
            "XLA:CPU (plugin failed to initialize?). Refusing to "
            "record cpu numbers as device measurements; pin "
            "JAX_PLATFORMS=cpu explicitly for a host-side run.",
            file=sys.stderr, flush=True)
        raise SystemExit(3)
    return backend
