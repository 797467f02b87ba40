"""Ring attention vs single-device causal attention on the CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyramidkv_tpu.ops.attention import causal_prefill_attention
from pyramidkv_tpu.parallel import make_mesh
from pyramidkv_tpu.parallel.ring_attention import ring_causal_attention_sharded


@pytest.mark.parametrize("ring", [2, 4, 8])
@pytest.mark.parametrize("true_len", [128, 100])
def test_ring_matches_single_device(ring, true_len):
    if ring > len(jax.devices()):
        pytest.skip("not enough devices")
    b, h, n, d = 2, 4, 128, 16
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
               for _ in range(3))
    tl = jnp.asarray([true_len, true_len - 7], jnp.int32)
    want = causal_prefill_attention(q, k, v, true_len=tl, block=32)
    mesh = make_mesh((1, ring), ("data", "model"))
    got = ring_causal_attention_sharded(q, k, v, tl, mesh, axis="model")
    for bi in range(b):
        pad = n - int(tl[bi])
        np.testing.assert_allclose(
            np.asarray(got)[bi, :, pad:], np.asarray(want)[bi, :, pad:],
            rtol=2e-4, atol=2e-4,
        )
