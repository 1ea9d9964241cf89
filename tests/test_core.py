"""Core: dtype policy and PRNG helpers."""

import jax
import jax.numpy as jnp
import numpy as np

from arsvt_tpu.core.dtypes import DEFAULT_POLICY, FP32_POLICY
from arsvt_tpu.core.prng import KeySeq, fold_host


def test_policy_casts_only_floats():
    tree = {"w": jnp.ones((2,), jnp.float32), "i": jnp.ones((2,), jnp.int32)}
    out = DEFAULT_POLICY.cast_to_compute(tree)
    assert out["w"].dtype == jnp.bfloat16
    assert out["i"].dtype == jnp.int32
    back = DEFAULT_POLICY.cast_to_param(out)
    assert back["w"].dtype == jnp.float32


def test_fp32_policy_is_identity_on_floats():
    x = jnp.ones((2,), jnp.float32)
    assert FP32_POLICY.cast_to_compute(x).dtype == jnp.float32


def test_keyseq_unique_and_reproducible():
    ks1, ks2 = KeySeq(7), KeySeq(7)
    a, b = ks1(), ks1()
    assert not np.array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(KeySeq(7)()), np.asarray(ks2()))
    three = KeySeq(0)(3)
    assert len(three) == 3


def test_fold_host_distinct_streams():
    key = jax.random.PRNGKey(0)
    k0 = fold_host(key, 0)
    k1 = fold_host(key, 1)
    assert not np.array_equal(np.asarray(k0), np.asarray(k1))
