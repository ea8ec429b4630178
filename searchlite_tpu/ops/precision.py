"""Matmul precision policy (divergence D8, COMPONENTS.md).

On TPU, XLA's default matmul precision computes f32 dots with
bf16-rounded inputs (~2^-8 relative error, f32 accumulation). For
BM25 scoring that means device scores carry ~0.3% noise vs exact f32,
and top-k near-ties can order differently than a CPU oracle — measured
on v5e 2026-08-17; the reference's Rust engine computes exact f32.

Policy:

- ``SEARCHLITE_PRECISION`` unset / ``f32`` (default): keep the TPU-fast
  default. Idiomatic for the hardware (3x matmul throughput), scores
  good to ~3 decimal digits, near-tie order may differ from exact f32.
- ``f32_strict``: force ``jax_default_matmul_precision=highest``
  (3-pass bf16 → exact-f32 dots on TPU). Bit-honest score parity with
  the CPU oracle at ~3x scoring-matmul cost.
- ``bf16``: bf16 storage AND inputs (ops/impact.py scorers) — the
  explicit speed opt-in, layered on top of either of the above.

The pruned execution's upper bounds are inflated by UB_SAFETY so
bound-vs-threshold comparisons stay sound under fast-mode rounding
(an underestimated bound could otherwise prune a true top-k doc's
tile); exactness of returned scores is unaffected (scored tiles are
scored with the same dots the dense path uses).
"""

from __future__ import annotations

import os

# > 2^-7: covers bf16 input rounding (2^-8) with headroom for the
# f32-accumulation of non-negative terms
UB_SAFETY = 1.02

_applied: str | None = None


def apply_matmul_precision() -> None:
    """Idempotent per mode; call from scorer factories BEFORE tracing/
    compiling (factories run once per process per config, ahead of
    first use). Re-checks the env each call so enabling f32_strict
    after an earlier scorer was built still takes effect for newly
    built scorers (already-compiled traces keep their precision)."""
    global _applied
    want = "highest" if strict() else None
    if want == _applied:
        return
    if want is not None:
        import jax

        jax.config.update("jax_default_matmul_precision", want)
        _applied = want


def strict() -> bool:
    return os.environ.get("SEARCHLITE_PRECISION") == "f32_strict"


def m_store_dtype(precision: str):
    """Storage dtype for SCATTER-BUILT impact matrices (the sparse M).

    Measured on v5e (tools/profile_split.py, round 3): a bf16 scatter
    store is SLOWER than f32 (18.1 vs 14.2 ms at the headline shapes —
    sub-word scatter writes), and the default fast-f32 matmul already
    runs at bf16 speed on f32 inputs (7.7 ms either way), so the
    scatter path stores f32 in every mode. bf16 pays off only where
    there is no scatter — the precomputed dense rows
    (``dense_store_dtype``)."""
    import jax.numpy as jnp

    return jnp.float32


def impacts_store_dtype(platform: str | None = None):
    """DEVICE storage dtype for posting impacts (block_impacts,
    impacts_flat, and the doc-shard copies). bf16 on accelerators in
    the fast/bf16 modes: the default fast-f32 matmul rounds M's
    entries to bf16 anyway, so dense-path scores are unchanged, while
    upload bytes, HBM residency, and M-build gather traffic halve
    (at 5M docs the block upload drops 2.5 GB → 1.9 GB). The sparse
    candidate path's f32 multiplies then see bf16-rounded impacts —
    within the D8 fast-mode tolerance that bench.py's oracle gate
    verifies. Host arrays stay f32 (pruning bounds, the C++ engine,
    and ingest are unaffected).

    f32 under ``f32_strict`` or ``SEARCHLITE_DEVICE_IMPACTS=f32``;
    CPU backends keep f32 (exact math for tests) unless
    ``SEARCHLITE_DEVICE_IMPACTS=bf16`` forces the quantized layout
    (used by the equivalence tests). ``platform`` overrides the
    default-backend check for arrays placed on a non-default device
    (the host tier stores f32: no HBM/link bandwidth to save on the
    local cpu backend)."""
    import jax
    import jax.numpy as jnp

    forced = os.environ.get("SEARCHLITE_DEVICE_IMPACTS")
    if strict() or forced == "f32":
        return jnp.float32
    if forced == "bf16":
        return jnp.bfloat16
    if (platform or jax.default_backend()) == "cpu":
        return jnp.float32
    return jnp.bfloat16


def dense_store_dtype(precision: str):
    """Storage dtype for the PRECOMPUTED dense impact rows (m_dense):
    no scatter ever writes them, so bf16 halves HBM + upload + matmul
    read traffic with scores bit-identical under the default fast-f32
    matmul (which rounds inputs to bf16 anyway — D8). CPU backends and
    f32_strict keep f32 (exact-f32 dots)."""
    import jax
    import jax.numpy as jnp

    if precision == "bf16":
        return jnp.bfloat16
    if precision == "f32_strict" or strict():
        return jnp.float32
    if jax.default_backend() == "cpu":
        return jnp.float32
    return jnp.bfloat16
