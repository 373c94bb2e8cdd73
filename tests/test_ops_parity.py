"""Numerical parity of the ops core vs the reference torch `_ref` formulas.

Layout note: ours is NHWC / HWIO, the reference is NCHW / OIHW; tests
transpose at the boundary.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pasta_tpu import ops

RTOL = 2e-4
ATOL = 2e-5


def nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


def nhwc(x_nchw):
    return np.transpose(np.asarray(x_nchw), (0, 2, 3, 1))


def hwio(w_oihw):
    return np.transpose(np.asarray(w_oihw), (2, 3, 1, 0))


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0)


class TestSetupFilter:
    def test_matches_reference(self, torch_ref, rng):
        import torch

        for f_in in [None, 1, [1, 3, 3, 1], [1, 2, 1], rng.randn(4, 4), list(range(1, 9))]:
            for flip in [False, True]:
                for gain in [1, 4]:
                    ours = ops.setup_filter(f_in, flip_filter=flip, gain=gain)
                    f_t = None if f_in is None else torch.as_tensor(
                        np.asarray(f_in, dtype=np.float32))
                    theirs = torch_ref.upfirdn2d.setup_filter(
                        f_t, flip_filter=flip, gain=gain).numpy()
                    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-7)

    def test_separable_auto(self):
        assert ops.setup_filter([1, 3, 3, 1]).ndim == 2  # 4 taps -> outer product
        assert ops.setup_filter(list(range(1, 9))).ndim == 1  # 8 taps -> separable


class TestUpfirdn2d:
    @pytest.mark.parametrize("up,down,padding", [
        (1, 1, 0),
        (2, 1, 1),
        (1, 2, 1),
        (2, 1, [2, 1]),
        (1, 1, [1, 2, 3, 4]),
        (1, 1, [-1, -1]),
        (2, 2, [1, 1, 2, 2]),
        ((2, 1), 1, 1),
        (4, 1, 2),
    ])
    @pytest.mark.parametrize("sep", [False, True])
    def test_vs_ref(self, torch_ref, rng, up, down, padding, sep):
        import torch

        # Large enough that the 8-tap separable filter fits even after
        # negative-padding crops (the torch oracle hard-errors otherwise).
        x = rng.randn(2, 13, 11, 3).astype(np.float32)
        taps = [1, 3, 3, 1, 2, 2, 1, 1] if sep else [1, 3, 3, 1]
        f = ops.setup_filter(taps)
        y = ops.upfirdn2d(jnp.asarray(x), f, up=up, down=down, padding=padding,
                          gain=2.0)
        f_t = torch_ref.upfirdn2d.setup_filter(torch.as_tensor(np.asarray(taps, np.float32)))
        y_ref = torch_ref.upfirdn2d.upfirdn2d(
            torch.as_tensor(nchw(x)), f_t, up=up, down=down,
            padding=list(padding) if isinstance(padding, list) else padding,
            gain=2.0, impl="ref").numpy()
        np.testing.assert_allclose(np.asarray(y), nhwc(y_ref), rtol=RTOL, atol=ATOL)

    def test_flip_filter(self, torch_ref, rng):
        import torch

        x = rng.randn(1, 8, 8, 2).astype(np.float32)
        f = rng.randn(3, 3).astype(np.float32)
        y = ops.upfirdn2d(jnp.asarray(x), jnp.asarray(f), padding=1, flip_filter=True)
        y_ref = torch_ref.upfirdn2d.upfirdn2d(
            torch.as_tensor(nchw(x)), torch.as_tensor(f), padding=1,
            flip_filter=True, impl="ref").numpy()
        np.testing.assert_allclose(np.asarray(y), nhwc(y_ref), rtol=RTOL, atol=ATOL)

    @pytest.mark.parametrize("wrapper", ["upsample2d", "downsample2d", "filter2d"])
    def test_wrappers(self, torch_ref, rng, wrapper):
        import torch

        x = rng.randn(2, 16, 16, 3).astype(np.float32)
        f = ops.setup_filter([1, 3, 3, 1])
        f_t = torch_ref.upfirdn2d.setup_filter(torch.as_tensor([1., 3., 3., 1.]))
        y = getattr(ops, wrapper)(jnp.asarray(x), f)
        y_ref = getattr(torch_ref.upfirdn2d, wrapper)(
            torch.as_tensor(nchw(x)), f_t, impl="ref").numpy()
        np.testing.assert_allclose(np.asarray(y), nhwc(y_ref), rtol=RTOL, atol=ATOL)

    def test_identity_filter(self):
        x = jnp.arange(16.0).reshape(1, 4, 4, 1)
        y = ops.upfirdn2d(x, None)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x))

    def test_grad_flows(self):
        f = ops.setup_filter([1, 3, 3, 1])

        def loss(x):
            return jnp.sum(ops.upsample2d(x, f) ** 2)

        g = jax.grad(loss)(jnp.ones((1, 8, 8, 2)))
        assert g.shape == (1, 8, 8, 2)
        assert bool(jnp.all(jnp.isfinite(g)))


class TestBiasAct:
    @pytest.mark.parametrize("act", sorted(ops.activation_funcs))
    def test_vs_ref(self, torch_ref, rng, act):
        import torch

        x = rng.randn(4, 6, 5, 8).astype(np.float32)
        b = rng.randn(8).astype(np.float32)
        for gain, clamp in [(None, None), (2.0, None), (None, 0.5), (1.5, 1.0)]:
            y = ops.bias_act(jnp.asarray(x), jnp.asarray(b), act=act,
                             gain=gain, clamp=clamp)
            y_ref = torch_ref.bias_act.bias_act(
                torch.as_tensor(nchw(x)), torch.as_tensor(b), dim=1, act=act,
                gain=gain, clamp=clamp, impl="ref").numpy()
            np.testing.assert_allclose(np.asarray(y), nhwc(y_ref),
                                       rtol=RTOL, atol=1e-5)

    def test_second_order_grad(self):
        # R1 regularization needs grad-of-grad through bias_act.
        b = jnp.asarray(np.random.RandomState(1).randn(4).astype(np.float32))

        def f(x):
            return jnp.sum(ops.bias_act(x, b, act="lrelu", clamp=5.0) ** 2)

        x = jnp.asarray(np.random.RandomState(2).randn(2, 3, 3, 4).astype(np.float32))
        g = jax.grad(f)(x)
        gg = jax.grad(lambda x: jnp.sum(jax.grad(f)(x) ** 2))(x)
        assert bool(jnp.all(jnp.isfinite(g))) and bool(jnp.all(jnp.isfinite(gg)))

    def test_clamp_zero_grad_outside(self):
        def f(x):
            return jnp.sum(ops.bias_act(x, act="linear", clamp=1.0))

        g = jax.grad(f)(jnp.asarray([0.5, 2.0, -3.0]))
        np.testing.assert_allclose(np.asarray(g), [1.0, 0.0, 0.0])


class TestConv2dResample:
    @pytest.mark.parametrize("k,up,down,padding,groups", [
        (3, 1, 1, 1, 1),
        (3, 2, 1, 1, 1),
        (3, 1, 2, 1, 1),
        (1, 1, 2, 0, 1),
        (1, 2, 1, 0, 1),
        (4, 2, 1, [1, 2], 1),
        (3, 1, 1, [0, 1, 0, 1], 1),
        (3, 1, 1, 1, 2),
        (3, 2, 2, 1, 1),
    ])
    @pytest.mark.parametrize("flip_weight", [True, False])
    def test_vs_ref(self, torch_ref, rng, k, up, down, padding, groups, flip_weight):
        import torch

        in_ch, out_ch = 6, 8
        x = rng.randn(2, 12, 10, in_ch).astype(np.float32)
        w = (rng.randn(out_ch, in_ch // groups, k, k) * 0.1).astype(np.float32)
        f = ops.setup_filter([1, 3, 3, 1])
        f_t = torch_ref.upfirdn2d.setup_filter(torch.as_tensor([1., 3., 3., 1.]))
        y = ops.conv2d_resample(
            jnp.asarray(x), jnp.asarray(hwio(w)), f=f, up=up, down=down,
            padding=padding, groups=groups, flip_weight=flip_weight)
        y_ref = torch_ref.conv2d_resample.conv2d_resample(
            torch.as_tensor(nchw(x)), torch.as_tensor(w), f=f_t, up=up,
            down=down, padding=padding, groups=groups,
            flip_weight=flip_weight).numpy()
        np.testing.assert_allclose(np.asarray(y), nhwc(y_ref), rtol=2e-3, atol=1e-4)


class TestModulatedConv2d:
    @pytest.mark.parametrize("demodulate", [True, False])
    @pytest.mark.parametrize("up", [1, 2])
    def test_vs_ref_nonfused(self, torch_ref, rng, demodulate, up):
        """Oracle: the reference's non-fused path (networks.py:72-82), built
        from its own primitives (styles-scale -> conv2d_resample -> demod)."""
        import torch

        n, in_ch, out_ch, k, res = 3, 6, 8, 3, 8
        x = rng.randn(n, res, res, in_ch).astype(np.float32)
        w = (rng.randn(out_ch, in_ch, k, k) * 0.2).astype(np.float32)
        s = (rng.randn(n, in_ch) * 0.5 + 1).astype(np.float32)
        noise = rng.randn(n, res * up, res * up, 1).astype(np.float32)
        f = ops.setup_filter([1, 3, 3, 1])
        f_t = torch_ref.upfirdn2d.setup_filter(torch.as_tensor([1., 3., 3., 1.]))

        flip_weight = up == 1
        y = ops.modulated_conv2d(
            jnp.asarray(x), jnp.asarray(hwio(w)), jnp.asarray(s),
            noise=jnp.asarray(noise), up=up, padding=k // 2,
            resample_filter=f, demodulate=demodulate, flip_weight=flip_weight)

        # torch oracle, non-fused formulation
        xt = torch.as_tensor(nchw(x))
        wt = torch.as_tensor(w)
        st = torch.as_tensor(s)
        dcoefs = None
        if demodulate:
            wns = wt.unsqueeze(0) * st.reshape(n, 1, -1, 1, 1)
            dcoefs = (wns.square().sum(dim=[2, 3, 4]) + 1e-8).rsqrt()
        xt = xt * st.reshape(n, -1, 1, 1)
        xt = torch_ref.conv2d_resample.conv2d_resample(
            xt, wt, f=f_t, up=up, padding=k // 2, flip_weight=flip_weight)
        if demodulate:
            xt = xt * dcoefs.reshape(n, -1, 1, 1)
        xt = xt + torch.as_tensor(nchw(noise))
        np.testing.assert_allclose(np.asarray(y), nhwc(xt.numpy()),
                                   rtol=2e-3, atol=1e-4)

    def test_fused_equals_nonfused_math(self, torch_ref, rng):
        """Our output should also match the reference *fused* path — the two
        formulations are mathematically identical."""
        import os
        import sys
        import torch

        sys.path.insert(0, "/root/reference")
        # Work around two reference import-time bugs (SURVEY.md §2.1/§2.2):
        # is_custom_kernel_supported() crashes on CPU-only torch
        # (networks.py:733-737), and util_functions loads human_colormap.mat
        # with a cwd-relative path (util_functions.py:11-12).
        if torch.version.cuda is None:
            torch.version.cuda = "0.0"
        cwd = os.getcwd()
        os.chdir("/root/reference")
        try:
            from training import networks as ref_networks
        except ImportError as e:
            pytest.skip(f"reference networks not importable: {e}")
        finally:
            os.chdir(cwd)

        n, in_ch, out_ch, k, res = 2, 4, 5, 3, 8
        x = rng.randn(n, res, res, in_ch).astype(np.float32)
        w = (rng.randn(out_ch, in_ch, k, k) * 0.2).astype(np.float32)
        s = (rng.randn(n, in_ch) * 0.5 + 1).astype(np.float32)

        y = ops.modulated_conv2d(
            jnp.asarray(x), jnp.asarray(hwio(w)), jnp.asarray(s), padding=k // 2)
        y_ref = ref_networks.modulated_conv2d(
            torch.as_tensor(nchw(x)), torch.as_tensor(w), torch.as_tensor(s),
            padding=k // 2, fused_modconv=True).numpy()
        np.testing.assert_allclose(np.asarray(y), nhwc(y_ref), rtol=2e-3, atol=1e-4)

    def test_second_order_grad(self):
        rng = np.random.RandomState(3)
        w = jnp.asarray(rng.randn(3, 3, 4, 5).astype(np.float32) * 0.2)
        s = jnp.asarray(rng.randn(2, 4).astype(np.float32))

        def f(x):
            return jnp.sum(ops.modulated_conv2d(x, w, s, padding=1) ** 2)

        x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
        gg = jax.grad(lambda x: jnp.sum(jax.grad(f)(x) ** 2))(x)
        assert bool(jnp.all(jnp.isfinite(gg)))
