"""Conv / transposed-conv / GRU parity vs torch (used as a numerical oracle)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from open_universe_tpu.ops import conv as ops_conv


def _np(x):
    return np.asarray(x)


@pytest.mark.parametrize("kernel,stride,t", [(3, 1, 31), (5, 1, 40), (4, 4, 37),
                                             (2, 2, 16), (5, 5, 41)])
def test_conv1d_matches_torch(kernel, stride, t):
    rng = np.random.default_rng(0)
    b, cin, cout = 2, 3, 5
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    w = rng.standard_normal((kernel, cin, cout)).astype(np.float32)

    pad = "same" if stride == 1 else "valid"
    y = ops_conv.conv1d(jnp.asarray(x), jnp.asarray(w), stride=stride,
                        padding=ops_conv._same_pads(kernel) if pad == "same"
                        else (0, 0))

    tconv = torch.nn.Conv1d(cin, cout, kernel, stride=stride, bias=False,
                            padding="same" if stride == 1 else 0)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w.transpose(2, 1, 0)))
        yt = tconv(torch.from_numpy(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(_np(y), yt.numpy().transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("kernel,stride,t", [(4, 4, 10), (5, 5, 8), (2, 2, 13)])
def test_conv_transpose1d_matches_torch(kernel, stride, t):
    rng = np.random.default_rng(1)
    b, cin, cout = 2, 4, 3
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    w = rng.standard_normal((kernel, cin, cout)).astype(np.float32)

    y = ops_conv.conv_transpose1d(jnp.asarray(x), jnp.asarray(w), stride=stride)

    tconv = torch.nn.ConvTranspose1d(cin, cout, kernel, stride=stride, bias=False)
    with torch.no_grad():
        # torch ConvTranspose1d weight: (in, out, W)
        tconv.weight.copy_(torch.from_numpy(w.transpose(1, 2, 0)))
        yt = tconv(torch.from_numpy(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(_np(y), yt.numpy().transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("bidirectional,num_layers", [(True, 1), (True, 2),
                                                      (False, 1)])
def test_gru_matches_torch(bidirectional, num_layers):
    rng = np.random.default_rng(2)
    b, t, c, h = 2, 11, 6, 4
    x = rng.standard_normal((b, t, c)).astype(np.float32)

    from open_universe_tpu.ops.gru import GRU
    model = GRU(hidden_size=h, num_layers=num_layers, bidirectional=bidirectional)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    tg = torch.nn.GRU(c, h, num_layers=num_layers, bidirectional=bidirectional,
                      batch_first=True)

    # copy torch weights into our params
    p = jax.tree_util.tree_map(np.array, params)["params"]
    with torch.no_grad():
        for layer in range(num_layers):
            if bidirectional:
                for d, sfx in [("fwd", ""), ("bwd", "_reverse")]:
                    blk = p[f"l{layer}"]
                    blk[f"{d}_w_ih"] = getattr(
                        tg, f"weight_ih_l{layer}{sfx}").numpy().T
                    blk[f"{d}_w_hh"] = getattr(
                        tg, f"weight_hh_l{layer}{sfx}").numpy().T
                    blk[f"{d}_b_ih"] = getattr(
                        tg, f"bias_ih_l{layer}{sfx}").numpy()
                    blk[f"{d}_b_hh"] = getattr(
                        tg, f"bias_hh_l{layer}{sfx}").numpy()
            else:
                name = f"l{layer}_fwd"
                p[name]["w_ih"] = getattr(tg, f"weight_ih_l{layer}").numpy().T
                p[name]["w_hh"] = getattr(tg, f"weight_hh_l{layer}").numpy().T
                p[name]["b_ih"] = getattr(tg, f"bias_ih_l{layer}").numpy()
                p[name]["b_hh"] = getattr(tg, f"bias_hh_l{layer}").numpy()
        yt, _ = tg(torch.from_numpy(x))

    y = model.apply({"params": p}, jnp.asarray(x))
    np.testing.assert_allclose(_np(y), yt.numpy(), rtol=1e-4, atol=1e-5)


def test_wn_conv_module_runs():
    x = jnp.ones((2, 20, 3))
    m = ops_conv.Conv1d(features=8, kernel_size=3, padding="same",
                        use_weight_norm=True)
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, 20, 8)

    mt = ops_conv.ConvTranspose1d(features=4, kernel_size=4, stride=4,
                                  use_weight_norm=True)
    pt = mt.init(jax.random.PRNGKey(1), x)
    yt = mt.apply(pt, x)
    assert yt.shape == (2, 80, 4)


def test_fir_fold_matches_lowpass_then_conv():
    """fir_taps fusion == explicit same-pad FIR -> valid strided conv."""
    from open_universe_tpu.ops.antialias import binomial_filter, low_pass_filter

    rng = np.random.default_rng(0)
    for k, stride, t, c_in, c_out in [(2, 2, 40, 3, 5), (4, 4, 48, 4, 2),
                                      (5, 5, 50, 2, 6)]:
        x = jnp.asarray(rng.normal(size=(2, t, c_in)), jnp.float32)
        taps = binomial_filter(2 * k + 1)
        m = ops_conv.Conv1d(features=c_out, kernel_size=k, stride=stride,
                            use_bias=False, fir_taps=tuple(taps.tolist()))
        params = m.init(jax.random.PRNGKey(k), x)
        y_fused = m.apply(params, x)

        kern = params["params"]["kernel"]
        y_ref = ops_conv.conv1d(low_pass_filter(x, 2 * k + 1), kern,
                                stride=stride, padding=(0, 0))
        assert y_fused.shape == y_ref.shape
        np.testing.assert_allclose(_np(y_fused), _np(y_ref),
                                   rtol=1e-5, atol=1e-5)


def test_fir_fold_matches_convtranspose_then_lowpass():
    from open_universe_tpu.ops.antialias import binomial_filter, low_pass_filter

    rng = np.random.default_rng(1)
    for k, stride, t, c_in, c_out in [(2, 2, 40, 3, 5), (4, 4, 24, 4, 2),
                                      (5, 5, 20, 2, 6)]:
        x = jnp.asarray(rng.normal(size=(2, t, c_in)), jnp.float32)
        taps = binomial_filter(2 * k + 1)
        m = ops_conv.ConvTranspose1d(features=c_out, kernel_size=k,
                                     stride=stride, use_bias=False,
                                     fir_taps=tuple(taps.tolist()))
        params = m.init(jax.random.PRNGKey(k), x)
        y_fused = m.apply(params, x)

        kern = params["params"]["kernel"]
        y_ref = low_pass_filter(
            ops_conv.conv_transpose1d(x, kern, stride=stride), 2 * k + 1)
        assert y_fused.shape == y_ref.shape
        np.testing.assert_allclose(_np(y_fused), _np(y_ref),
                                   rtol=1e-5, atol=1e-5)
