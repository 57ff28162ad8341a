"""Fused Pallas ConvBlock stack vs the unfused XLA ops (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_universe_tpu.ops.conv import conv1d, _same_pads, prelu
from open_universe_tpu.ops.film import film
from open_universe_tpu.ops.pallas_conv_block import (
    fused_conv_stack,
    pack_stack_kernel,
)

INV_SQRT2 = 1.0 / np.sqrt(2.0)


def _reference_stack(h, w1, b1, w2, b2, w3, b3, alphas,
                     film_gb=None, input_cond=None, res=None):
    if res is not None:
        h = (h + res) * INV_SQRT2
    cond_out = conv1d(prelu(h, alphas[0]), w1, padding=_same_pads(5)) + b1
    x = cond_out
    if input_cond is not None:
        x = (x + input_cond) * INV_SQRT2
    if film_gb is not None:
        x = film(x, film_gb)
    x = conv1d(prelu(x, alphas[1]), w2, padding=_same_pads(3)) + b2
    x = conv1d(prelu(x, alphas[2]), w3, padding=_same_pads(3)) + b3
    return (h + x) * INV_SQRT2, cond_out


@pytest.mark.parametrize("use_film", [False, True])
@pytest.mark.parametrize("use_ic_res", [False, True])
def test_fused_conv_stack_matches_ops(use_film, use_ic_res):
    rng = np.random.default_rng(0)
    b, t, c = 2, 160, 8
    h = jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(5, c, c)) * 0.2, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, c, c)) * 0.2, jnp.float32)
    w3 = jnp.asarray(rng.normal(size=(3, c, c)) * 0.2, jnp.float32)
    b1, b2, b3 = (jnp.asarray(rng.normal(size=(c,)), jnp.float32)
                  for _ in range(3))
    alphas = jnp.asarray([0.25, 0.1, 0.4], jnp.float32)
    gb = (jnp.asarray(rng.normal(size=(b, 2 * c)), jnp.float32)
          if use_film else None)
    ic = (jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
          if use_ic_res else None)
    res = (jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
           if use_ic_res else None)

    v_ref, c_ref = _reference_stack(h, w1, b1, w2, b2, w3, b3, alphas,
                                    film_gb=gb, input_cond=ic, res=res)
    v, co = fused_conv_stack(h, w1, b1, w2, b2, w3, b3, alphas,
                             film_gb=gb, input_cond=ic, res=res,
                             tile=4, interpret=True)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(co), np.asarray(c_ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_conv_stack_padding_tile():
    """T not divisible by tile: padded run must still match exactly."""
    rng = np.random.default_rng(1)
    b, t, c = 1, 150, 4  # 150 % 32 != 0
    h = jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(5, c, c)) * 0.2, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, c, c)) * 0.2, jnp.float32)
    w3 = jnp.asarray(rng.normal(size=(3, c, c)) * 0.2, jnp.float32)
    b1 = b2 = b3 = jnp.zeros((c,), jnp.float32)
    alphas = jnp.asarray([0.25, 0.25, 0.25], jnp.float32)

    v_ref, c_ref = _reference_stack(h, w1, b1, w2, b2, w3, b3, alphas)
    v, co = fused_conv_stack(h, w1, b1, w2, b2, w3, b3, alphas,
                             tile=32, interpret=True)  # p=1 fallback path
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(co), np.asarray(c_ref),
                               rtol=2e-5, atol=2e-5)


def test_pack_stack_kernel_matches_conv():
    """Frame-packed kernel == plain conv for several (k, p)."""
    import jax.numpy as jnp
    from open_universe_tpu.ops.conv import conv1d, _same_pads

    rng = np.random.default_rng(3)
    for k, p, t, c in [(5, 4, 40, 3), (3, 4, 40, 3), (5, 2, 24, 5),
                       (3, 2, 24, 5), (5, 1, 20, 4)]:
        x = jnp.asarray(rng.normal(size=(2, t, c)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, c, c)), jnp.float32)
        y_ref = conv1d(x, w, padding=_same_pads(k))
        wp = pack_stack_kernel(w, p)
        xf = x.reshape(2, t // p, p * c)
        d2 = (wp.shape[0] - 1) // 2
        xf_pad = jnp.pad(xf, ((0, 0), (d2, d2), (0, 0)))
        acc = sum(jnp.einsum("bfi,io->bfo", xf_pad[:, i : i + t // p], wp[i])
                  for i in range(wp.shape[0]))
        np.testing.assert_allclose(np.asarray(acc.reshape(2, t, c)),
                                   np.asarray(y_ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["enc", "dec"])
def test_convblock_fused_flag_matches_unfused(mode):
    """ConvBlock(flag on, interpret) == ConvBlock(flag off), same params."""
    from open_universe_tpu.models.universe.blocks import ConvBlock
    from open_universe_tpu.ops.pallas_conv_block import (
        set_use_pallas_conv_block,
    )

    rng = np.random.default_rng(2)
    b, t, c = 2, 96, 8
    if mode == "enc":
        block = ConvBlock(c, 2, "down", use_weight_norm=True)
        h = jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
        kwargs = dict(
            noise_cond=jnp.asarray(rng.normal(size=(b, 2 * c)), jnp.float32))
    else:
        block = ConvBlock(c, 2, "up", use_weight_norm=True)
        h = jnp.asarray(rng.normal(size=(b, t // 2, 2 * c)), jnp.float32)
        kwargs = dict(
            noise_cond=jnp.asarray(rng.normal(size=(b, 2 * c)), jnp.float32),
            input_cond=jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32),
            res=jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32),
            length=t)

    params = block.init(jax.random.PRNGKey(0), h, **kwargs)
    outs_ref = block.apply(params, h, **kwargs)
    try:
        set_use_pallas_conv_block(True, interpret=True)
        params2 = block.init(jax.random.PRNGKey(0), h, **kwargs)
        outs = block.apply(params, h, **kwargs)
    finally:
        set_use_pallas_conv_block(False)

    # identical param trees (fused path materializes through the same
    # submodules)
    assert jax.tree.structure(params) == jax.tree.structure(params2)
    for a, bb in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb))

    for y_ref, y in zip(outs_ref, outs):
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=3e-5, atol=3e-5)
