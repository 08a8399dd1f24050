"""Fused GroupNorm(+SiLU) kernel parity (ops/kernels/group_norm.py).

The kernel is the TPU fast path of ``EDMGroupNorm``
(``networks/edm/network.py``; ref GroupNorm at
``/root/reference/fastgen/networks/EDM/network.py:112-160``). Parity here
gates the production default (``FASTGEN_FUSED_GN``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastgen_tpu.ops.kernels.group_norm import (_gn_reference,
                                                fused_group_norm)


@pytest.mark.parametrize("with_silu", [False, True])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_reference(with_silu, dtype):
    rs = np.random.RandomState(0)
    b, h, w, c, g = 2, 8, 16, 256, 32
    x = jnp.asarray(rs.randn(b, h, w, c), dtype)
    scale = jnp.asarray(1 + 0.1 * rs.randn(c), jnp.float32)
    bias = jnp.asarray(0.1 * rs.randn(c), jnp.float32)
    out = fused_group_norm(x, scale, bias, g, eps=1e-5, with_silu=with_silu,
                           interpret=True)
    ref = _gn_reference(x.reshape(b, h * w, c), scale, bias, g, 1e-5,
                        with_silu).reshape(b, h, w, c)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol, rtol=tol)


def test_unfriendly_shapes_fall_back():
    # c % 128 != 0 -> XLA reference path; must still be exact
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 8, 8, 96), jnp.float32)
    scale, bias = jnp.ones((96,)), jnp.zeros((96,))
    out = fused_group_norm(x, scale, bias, 32, interpret=True)
    ref = _gn_reference(x.reshape(2, 64, 96), scale, bias, 32, 1e-5,
                        False).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_gradients_match_xla_groupnorm():
    """custom-VJP backward (XLA recompute) == grad of the pure reference."""
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(1, 8, 8, 128), jnp.float32)
    scale = jnp.asarray(1 + 0.1 * rs.randn(128), jnp.float32)
    bias = jnp.asarray(0.1 * rs.randn(128), jnp.float32)

    def loss_fused(x, s, b):
        return jnp.sum(fused_group_norm(x, s, b, 32, interpret=True) ** 2)

    def loss_ref(x, s, b):
        return jnp.sum(_gn_reference(x.reshape(1, 64, 128), s, b, 32, 1e-5,
                                     False) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)
