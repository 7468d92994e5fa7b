"""Pallas decode-attention kernel vs the XLA transposed-attend path."""

import numpy as np
import jax.numpy as jnp

from texocr_tpu.models.attention import MultiHeadAttention
from texocr_tpu.ops.decode_attention import decode_attention


def test_matches_xla_transposed(rng):
    b, h, dh, t = 4, 3, 64, 37
    q = jnp.asarray(rng.normal(size=(b, h, 1, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, dh, t)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, dh, t)).astype(np.float32))
    for limit in [t, 5, jnp.asarray(rng.integers(1, t, size=(b,)), jnp.int32)]:
        got = decode_attention(q, k, v, scale=0.125, limit=limit, interpret=True)
        lim = jnp.broadcast_to(jnp.asarray(limit), (b,))
        key_ok = jnp.arange(t)[None, None, None, :] < lim[:, None, None, None]
        want = MultiHeadAttention._attend_transposed(q, k, v, 0.125, key_ok)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5
        )
