"""Shape/structure tests for the generator and discriminator stacks."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pasta_tpu.models import Generator, Discriminator


def _gen_inputs(rng, n, res):
    return dict(
        z=jnp.zeros((n, 0)),
        c=jnp.asarray(rng.randn(n, res // 4, res // 4, 45), jnp.float32),
        retain=jnp.asarray(rng.randn(n, res, res, 6), jnp.float32),
        pose=jnp.asarray(rng.randn(n, res, res, 5), jnp.float32),
        denorm_upper_input=jnp.asarray(rng.randn(n, res, res, 3), jnp.float32),
        denorm_lower_input=jnp.asarray(rng.randn(n, res, res, 3), jnp.float32),
        denorm_upper_mask=jnp.asarray(
            (rng.rand(n, res, res, 1) > 0.5), jnp.float32),
        denorm_lower_mask=jnp.asarray(
            (rng.rand(n, res, res, 1) > 0.5), jnp.float32),
    )


@pytest.fixture(scope="module")
def small_gen():
    """64px generator: same topology, fewer channels, fast on CPU."""
    model = Generator(img_resolution=64, channel_base=2048, channel_max=128,
                      conv_clamp=256)
    rng = np.random.RandomState(0)
    inputs = _gen_inputs(rng, 2, 64)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        **inputs)
    return model, variables, inputs


class TestGenerator:
    def test_forward_shapes(self, small_gen):
        model, variables, inputs = small_gen
        img, finetune, parsing = model.apply(
            variables, rngs={"noise": jax.random.PRNGKey(2)}, **inputs)
        assert img.shape == (2, 64, 64, 3)
        assert finetune.shape == (2, 64, 64, 3)
        assert parsing.shape == (2, 64, 64, 7)
        for t in (img, finetune, parsing):
            assert bool(jnp.all(jnp.isfinite(t)))

    def test_num_ws(self, small_gen):
        model, variables, _ = small_gen
        # 64px: blocks 8,16,32,64 -> 1 + 2*3 convs + 1 torgb = 8
        syn = model.bind(variables).synthesis
        assert syn.num_ws == 8

    def test_param_tree_names(self, small_gen):
        _, variables, _ = small_gen
        params = variables["params"]
        syn = params["synthesis"]
        for key in ["b8", "b16", "b32", "b64", "spade_b256_1", "spade_b256_2",
                    "texture_b512", "spade_encoder.0"]:
            assert key in syn, f"missing {key}: {sorted(syn)}"
        assert "affine" in syn["b8"]["conv1"]
        assert "m_weight1" in syn["b64"]["torgb"]  # 7-class parsing head
        assert "m_weight1" not in syn["texture_b512"]["torgb"]
        assert "spade_b512" in syn["texture_b512"]
        assert "fc0" in params["mapping"]
        assert "model.0" in params["const_encoding"]
        assert "model.12" in params["style_encoding"]
        assert "feat_enc.3" in params["style_encoding"]

    def test_noise_const_buffers(self, small_gen):
        _, variables, _ = small_gen
        bufs = variables["buffers"]["synthesis"]
        assert bufs["b8"]["conv1"]["noise_const"].shape == (8, 8)
        assert bufs["b64"]["conv0"]["noise_const"].shape == (64, 64)

    def test_gt_parsing_path(self, small_gen):
        model, variables, inputs = small_gen
        gt = jnp.zeros((2, 64, 64, 1), jnp.float32)
        img, finetune, parsing = model.apply(
            variables, gt_parsing=gt, noise_mode="const", **inputs)
        assert finetune.shape == (2, 64, 64, 3)

    def test_const_noise_deterministic(self, small_gen):
        model, variables, inputs = small_gen
        a = model.apply(variables, noise_mode="const", **inputs)[1]
        b = model.apply(variables, noise_mode="const", **inputs)[1]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_truncation(self, small_gen):
        model, variables, inputs = small_gen
        out = model.apply(variables, truncation_psi=0.5, noise_mode="const",
                          **inputs)
        assert out[0].shape == (2, 64, 64, 3)


class TestDiscriminator:
    @pytest.mark.parametrize("img_channels", [6, 10])  # image D / parsing D
    @pytest.mark.slow
    def test_forward(self, img_channels):
        model = Discriminator(
            c_dim=64, img_resolution=64, img_channels=img_channels,
            channel_base=2048, channel_max=128, conv_clamp=256,
            mbstd_group_size=2)
        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.randn(4, 64, 64, img_channels), jnp.float32)
        c = jnp.asarray(rng.randn(4, 64), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), img, c)
        logits = model.apply(variables, img, c)
        assert logits.shape == (4, 1)
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_unconditional(self):
        model = Discriminator(
            c_dim=0, img_resolution=32, img_channels=3,
            channel_base=1024, channel_max=64, mbstd_group_size=2)
        img = jnp.ones((2, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), img, None)
        logits = model.apply(variables, img, None)
        assert logits.shape == (2, 1)

    def test_r1_grad(self):
        """R1 needs grad of D's output w.r.t. the input image."""
        model = Discriminator(
            c_dim=0, img_resolution=32, img_channels=3,
            channel_base=1024, channel_max=64, mbstd_group_size=2)
        img = jnp.ones((2, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), img, None)

        def f(img):
            return jnp.sum(model.apply(variables, img, None))

        g = jax.grad(f)(img)
        assert g.shape == img.shape
        assert bool(jnp.all(jnp.isfinite(g)))
