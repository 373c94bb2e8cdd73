"""Lane-pad (wide-flow) conv widening must be numerically exact.

The serving-throughput lever (ops/conv2d_resample.py `set_lane_pad`)
zero-pads 64-out-channel convs at >=512² spatial to 128 output lanes and
lets the wide tensor FLOW: consumer convs zero-pad their weight input rows,
biases/styles/demodulation pad with zeros, and the pad lanes never touch a
real output (zero weight rows). These tests pin exactness end to end —
including through modulated_conv2d (demodulation + noise), SPADE blocks,
and a full Generator forward — with the spatial threshold lowered so tiny
test tensors take the wide path.
"""

import importlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# the package re-exports the function under the module's name
c2r = importlib.import_module("pasta_tpu.ops.conv2d_resample")
from pasta_tpu.ops import modulated_conv2d, setup_filter


@pytest.fixture
def lane_pad_small():
    """Enable lane padding with the spatial threshold lowered so the
    16px test tensors qualify (the production threshold is 512²)."""
    old_min = c2r._LANE_PAD_MIN_PIXELS
    c2r._LANE_PAD_MIN_PIXELS = 16 * 16
    c2r.set_lane_pad(True)
    yield
    c2r._LANE_PAD_MIN_PIXELS = old_min
    c2r.set_lane_pad(False)


def _rand(*shape, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32))


@pytest.mark.parametrize("up,down,k", [(1, 1, 3), (2, 1, 3), (1, 2, 3),
                                       (1, 1, 1)])
def test_conv2d_resample_lane_pad_exact(lane_pad_small, up, down, k):
    x = _rand(2, 16, 16, 24, seed=1)
    w = _rand(k, k, 24, 64, seed=2) * 0.1
    f = setup_filter((1, 3, 3, 1))
    kwargs = dict(f=f, up=up, down=down, padding=k // 2)

    got = c2r.conv2d_resample(x, w, **kwargs)
    c2r.set_lane_pad(False)
    want = c2r.conv2d_resample(x, w, **kwargs)
    c2r.set_lane_pad(True)
    assert got.shape[-1] == 128 and want.shape[-1] == 64
    np.testing.assert_allclose(np.asarray(got[..., :64]), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    # pad lanes of a bare conv are exactly zero
    assert float(jnp.max(jnp.abs(got[..., 64:]))) == 0.0


def test_wide_input_consumed_exactly(lane_pad_small):
    """A consumer conv must ignore garbage in the pad lanes."""
    x = _rand(2, 16, 16, 64, seed=3)
    garbage = _rand(2, 16, 16, 64, seed=4) * 100
    x_wide = jnp.concatenate([x, garbage], axis=-1)
    w = _rand(3, 3, 64, 32, seed=5) * 0.1
    got = c2r.conv2d_resample(x_wide, w, padding=1)
    c2r.set_lane_pad(False)
    want = c2r.conv2d_resample(x, w, padding=1)
    c2r.set_lane_pad(True)
    # zero rows contribute exactly 0 per term, but the wider contraction
    # reassociates the accumulation -> f32 rounding-scale differences
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_modulated_conv_lane_pad_exact(lane_pad_small):
    x = _rand(2, 16, 16, 24, seed=3)
    w = _rand(3, 3, 24, 64, seed=4) * 0.1
    styles = _rand(2, 24, seed=5) * 0.2 + 1.0
    noise = _rand(2, 16, 16, 1, seed=6) * 0.05

    got = modulated_conv2d(x, w, styles, noise=noise, padding=1)
    c2r.set_lane_pad(False)
    want = modulated_conv2d(x, w, styles, noise=noise, padding=1)
    c2r.set_lane_pad(True)
    assert got.shape[-1] == 128
    np.testing.assert_allclose(np.asarray(got[..., :64]), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_lane_pad_skips_groups_and_small(lane_pad_small):
    # Depthwise (groups=C) convs must be left alone.
    x = _rand(1, 16, 16, 8, seed=7)
    w = _rand(4, 4, 1, 8, seed=8)
    y = c2r._conv2d(x, w, padding=1, groups=8)
    assert y.shape[-1] == 8
    # Below the spatial threshold: no padding path either.
    c2r._LANE_PAD_MIN_PIXELS = 10**9
    x2 = _rand(1, 16, 16, 64, seed=9)
    w2 = _rand(1, 1, 64, 64, seed=10)
    assert c2r._conv2d(x2, w2).shape[-1] == 64


def test_lane_pad_non64_out_unchanged(lane_pad_small):
    # Only exactly-64-out convs widen (torgb heads etc. keep logical width).
    x = _rand(1, 16, 16, 8, seed=11)
    for out in (3, 10, 128):
        w = _rand(1, 1, 8, out, seed=12)
        assert c2r._conv2d(x, w).shape[-1] == out


def test_generator_forward_lane_pad_exact(lane_pad_small):
    """Full generator forward: wide-flow must reproduce the reference-path
    outputs exactly (the pad lanes never reach img/parsing heads)."""
    from pasta_tpu.models import Generator

    res = 64
    # Threshold at the top resolution: widens the same class of convs the
    # production 512 model widens (top-res 64-out convs), and keeps the
    # style path's Dense/matmul layers (res/4, like production's 128²)
    # below it.
    c2r._LANE_PAD_MIN_PIXELS = res * res
    model = Generator(img_resolution=res, channel_base=res * 64,
                      channel_max=64, c_dim=512, w_dim=64)
    n = 1
    rng = np.random.RandomState(0)

    def t(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32)) * 0.3

    inputs = dict(
        z=jnp.zeros((n, 0)),
        c=t(n, res // 4, res // 4, 45),
        retain=t(n, res, res, 6),
        pose=t(n, res, res, 5),
        denorm_upper_input=t(n, res, res, 3),
        denorm_lower_input=t(n, res, res, 3),
        denorm_upper_mask=(t(n, res, res, 1) > 0).astype(jnp.float32),
        denorm_lower_mask=(t(n, res, res, 1) > 0).astype(jnp.float32),
    )
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    variables = model.init(rngs, **inputs, noise_mode="const")
    img_w, ft_w, par_w = model.apply(variables, **inputs, noise_mode="const")
    c2r.set_lane_pad(False)
    img, ft, par = model.apply(variables, **inputs, noise_mode="const")
    c2r.set_lane_pad(True)
    for a, b in ((img_w, img), (ft_w, ft), (par_w, par)):
        assert a.shape == b.shape
        # wider contractions reassociate accumulation: rounding-scale only
        # (pad-lane leakage would be O(1), not 1e-4)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
        assert float(jnp.mean(jnp.abs(a - b))) < 1e-5
