"""PRNG key management.

Functional replacement for the reference's implicit global torch RNG
(/root/reference/train.py has no seeding at all — runs are irreproducible).
Every stochastic op here takes an explicit key; `KeySeq` is a convenience
splitter for host-side loops, and `fold_host` gives per-host streams for
multi-host input pipelines.
"""

from __future__ import annotations

import jax


class KeySeq:
    """Host-side stateful key splitter: ``ks = KeySeq(0); k = ks()``."""

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.PRNGKey(seed_or_key)
        else:
            self._key = seed_or_key

    def __call__(self, n: int | None = None):
        if n is None:
            self._key, sub = jax.random.split(self._key)
            return sub
        self._key, *subs = jax.random.split(self._key, n + 1)
        return subs


def fold_host(key, process_index: int | None = None):
    """Fold the host index into a key for per-host data pipelines."""
    if process_index is None:
        process_index = jax.process_index()
    return jax.random.fold_in(key, process_index)
