"""Blockwise flash attention — Pallas TPU kernel (placeholder: jnp for now).

Real kernel lands in the kernels milestone; this module is only imported on
TPU backends.
"""

from __future__ import annotations

from arsvt_tpu.ops.attention import sdpa_reference


def flash_attention(q, k, v, *, mask=None):
    return sdpa_reference(q, k, v, mask=mask)
