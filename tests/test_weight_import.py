"""Weight-import parity: torch reference models -> pasta_tpu, output match.

Strategy (no pretrained pickle ships with the reference): initialize the
*reference torch modules* randomly, import their state dicts through
pasta_tpu.io, and require matching outputs. This validates the importer's
name map / layout transforms AND the full model graph in one shot.

The reference's `SynthesisLayer` is undefined in its repo (SURVEY.md §2.2);
for the generator test we inject a standard StyleGAN2-ADA SynthesisLayer
(reconstructed from public spec + legacy.py:171-202 param names) into the
reference module namespace so `GeneratorFull_v20` can be constructed.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pasta_tpu.models import Generator, Discriminator
from pasta_tpu.io import import_discriminator_state, import_generator_state
from pasta_tpu.io.torch_import import state_dict_to_numpy


def nhwc(x_nchw):
    return np.transpose(np.asarray(x_nchw), (0, 2, 3, 1))


class TestDiscriminatorImport:
    def test_logits_match(self, ref_networks):
        import torch

        torch.manual_seed(0)
        c_dim, res, img_ch = 512, 64, 6
        channel_base, channel_max = 2048, 128
        ref_d = ref_networks.Discriminator(
            c_dim=c_dim, img_resolution=res, img_channels=img_ch,
            channel_base=channel_base, channel_max=channel_max,
            conv_clamp=256).eval()

        ours = Discriminator(
            c_dim=c_dim, img_resolution=res, img_channels=img_ch,
            channel_base=channel_base, channel_max=channel_max,
            conv_clamp=256, mbstd_group_size=4)

        epilogue_ch = min(channel_base // 4, channel_max)
        variables = import_discriminator_state(
            state_dict_to_numpy(ref_d), epilogue_channels=epilogue_ch)

        rng = np.random.RandomState(1)
        img = rng.randn(4, img_ch, res, res).astype(np.float32)
        c = rng.randn(4, c_dim).astype(np.float32)

        with torch.no_grad():
            ref_logits = ref_d(torch.as_tensor(img), torch.as_tensor(c)).numpy()
        our_logits = ours.apply(
            {"params": variables["params"]}, jnp.asarray(nhwc(img)),
            jnp.asarray(c))
        np.testing.assert_allclose(
            np.asarray(our_logits), ref_logits, rtol=2e-3, atol=2e-3)


def _make_ref_synthesis_layer(ref_networks):
    """Standard ADA SynthesisLayer, built from the reference's own primitives."""
    import torch
    from torch_utils.ops import upfirdn2d as ref_up
    from torch_utils.ops import bias_act as ref_ba

    class SynthesisLayer(torch.nn.Module):
        def __init__(self, in_channels, out_channels, w_dim, resolution,
                     kernel_size=3, up=1, use_noise=True, activation="lrelu",
                     resample_filter=[1, 3, 3, 1], conv_clamp=None,
                     channels_last=False):
            super().__init__()
            self.resolution = resolution
            self.up = up
            self.use_noise = use_noise
            self.activation = activation
            self.conv_clamp = conv_clamp
            self.register_buffer(
                "resample_filter", ref_up.setup_filter(resample_filter))
            self.padding = kernel_size // 2
            self.act_gain = ref_ba.activation_funcs[activation].def_gain
            self.affine = ref_networks.FullyConnectedLayer(
                w_dim, in_channels, bias_init=1)
            self.weight = torch.nn.Parameter(
                torch.randn([out_channels, in_channels, kernel_size, kernel_size]))
            if use_noise:
                self.register_buffer(
                    "noise_const", torch.randn([resolution, resolution]))
                self.noise_strength = torch.nn.Parameter(torch.zeros([]))
            self.bias = torch.nn.Parameter(torch.zeros([out_channels]))

        def forward(self, x, w, noise_mode="random", fused_modconv=True, gain=1):
            styles = self.affine(w)
            noise = None
            if self.use_noise and noise_mode == "random":
                noise = torch.randn(
                    [x.shape[0], 1, self.resolution, self.resolution],
                    device=x.device) * self.noise_strength
            if self.use_noise and noise_mode == "const":
                noise = self.noise_const * self.noise_strength
            flip_weight = self.up == 1
            x = ref_networks.modulated_conv2d(
                x=x, weight=self.weight, styles=styles, noise=noise,
                up=self.up, padding=self.padding,
                resample_filter=self.resample_filter,
                flip_weight=flip_weight, fused_modconv=fused_modconv)
            act_gain = self.act_gain * gain
            act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
            return ref_ba.bias_act(
                x, self.bias.to(x.dtype), act=self.activation,
                gain=act_gain, clamp=act_clamp)

    # The reference's persistence system pickles class references at module
    # construction (persistence.py:231-249) — expose at module scope.
    import sys

    SynthesisLayer.__name__ = "RefSynthesisLayer"
    SynthesisLayer.__qualname__ = "RefSynthesisLayer"
    SynthesisLayer.__module__ = __name__
    setattr(sys.modules[__name__], "RefSynthesisLayer", SynthesisLayer)
    return SynthesisLayer


class TestGeneratorImport:
    @pytest.mark.slow
    def test_outputs_match_512(self, ref_networks):
        """Full 512px generator parity (the reference only works at 512:
        its const encoder hardcodes 6 downsamplings, networks.py:2350)."""
        import torch

        if not hasattr(ref_networks, "SynthesisLayer"):
            ref_networks.SynthesisLayer = _make_ref_synthesis_layer(ref_networks)

        torch.manual_seed(0)
        ref_g = ref_networks.GeneratorFull_v20(
            z_dim=0, c_dim=512, w_dim=512, img_resolution=512, img_channels=3,
            mapping_kwargs=dict(num_layers=1),
            synthesis_kwargs=dict(
                channel_base=32768, channel_max=512, num_fp16_res=0,
                conv_clamp=256, use_noise=True),
        ).eval()

        ours = Generator()
        variables = import_generator_state(state_dict_to_numpy(ref_g))

        rng = np.random.RandomState(2)
        n, res = 1, 512
        c = rng.randn(n, 45, res // 4, res // 4).astype(np.float32)
        retain = rng.randn(n, 6, res, res).astype(np.float32)
        pose = rng.randn(n, 5, res, res).astype(np.float32)
        denorm_u = rng.randn(n, 3, res, res).astype(np.float32)
        denorm_l = rng.randn(n, 3, res, res).astype(np.float32)
        mask_u = (rng.rand(n, 1, res, res) > 0.5).astype(np.float32)
        mask_l = (rng.rand(n, 1, res, res) > 0.5).astype(np.float32)
        z = np.zeros((n, 0), np.float32)

        with torch.no_grad():
            ref_img, ref_ft, ref_parsing = ref_g(
                torch.as_tensor(z), torch.as_tensor(c),
                torch.as_tensor(retain), torch.as_tensor(pose),
                torch.as_tensor(denorm_u), torch.as_tensor(denorm_l),
                torch.as_tensor(mask_u), torch.as_tensor(mask_l),
                noise_mode="const")

        our_img, our_ft, our_parsing = ours.apply(
            variables,
            z=jnp.asarray(z), c=jnp.asarray(nhwc(c)),
            retain=jnp.asarray(nhwc(retain)), pose=jnp.asarray(nhwc(pose)),
            denorm_upper_input=jnp.asarray(nhwc(denorm_u)),
            denorm_lower_input=jnp.asarray(nhwc(denorm_l)),
            denorm_upper_mask=jnp.asarray(nhwc(mask_u)),
            denorm_lower_mask=jnp.asarray(nhwc(mask_l)),
            noise_mode="const")

        for name, ref_t, our_t, tol in [
            ("img", ref_img, our_img, 5e-3),
            ("finetune", ref_ft, our_ft, 5e-3),
            ("parsing", ref_parsing, our_parsing, 5e-3),
        ]:
            ref_np = nhwc(ref_t.numpy())
            our_np = np.asarray(our_t)
            scale = np.abs(ref_np).max() + 1e-8
            err = np.abs(our_np - ref_np).max() / scale
            assert err < tol, f"{name}: max rel err {err:.2e} (scale {scale:.3g})"
