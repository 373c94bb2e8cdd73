"""Interleaved-batch D/DP/VGG calls == separate calls (bit/tolerance exact).

The loss cores batch the discriminator's fake-img / fake-finetune / real
forwards into ONE call by interleaving sub-batches (loss_terms._ilv):
MinibatchStdLayer's groups are batch-strided (reference
networks.py:527-549), and interleaving keeps every group inside one
sub-batch whenever group_size divides the sub-batch — so the fused call is
exactly equivalent. These tests pin that equivalence against real modules
(not mocks), plus the fused SpadeNormBlock gamma/beta conv.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from pasta_tpu.train.loss_terms import _ilv, _dilv, build_loss_cores
from pasta_tpu.train.config import smoke_config


def test_ilv_roundtrip():
    a = jnp.arange(12.0).reshape(4, 3)
    b = -a
    c = a * 10
    x = _ilv(a, b, c)
    assert x.shape == (12, 3)
    ra, rb, rc = _dilv(x, 3)
    np.testing.assert_array_equal(ra, a)
    np.testing.assert_array_equal(rb, b)
    np.testing.assert_array_equal(rc, c)


def test_mbstd_interleave_exact():
    """D(ilv(x1, x2, x3)) == ilv(D(x1), D(x2), D(x3)) through the real
    discriminator (mbstd groups must not cross sub-batches)."""
    from pasta_tpu.models.discriminator import Discriminator

    n, res, gs = 4, 32, 2
    d = Discriminator(c_dim=8, img_resolution=res, img_channels=6,
                      channel_base=1024, mbstd_group_size=gs)
    rng = np.random.RandomState(0)
    xs = [jnp.asarray(rng.randn(n, res, res, 6), jnp.float32)
          for _ in range(3)]
    cs = [jnp.asarray(rng.randn(n, 8), jnp.float32) for _ in range(3)]
    params = d.init(jax.random.PRNGKey(0), xs[0], cs[0])

    sep = [d.apply(params, x, c) for x, c in zip(xs, cs)]
    fused = _dilv(d.apply(params, _ilv(*xs), _ilv(*cs)), 3)
    for a, b in zip(sep, fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_d_terms_batched_matches_separate():
    """cores['d'] with batching active == the explicit separate-call math
    (ADA off so the RNG stream is not a factor)."""
    from pasta_tpu.losses.gan import d_logistic_loss

    base = smoke_config(1, batch_size=4, data_axis_size=1, resolution=32,
                        use_ada=False, vgg_weight=0.0, mbstd_group_size=2)
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(4, 32, 32, 3), jnp.float32)
    ft = jnp.asarray(rng.randn(4, 32, 32, 3), jnp.float32)
    gen_c = jnp.asarray(rng.randn(4, 8), jnp.float32)
    batch = dict(
        real_img=jnp.asarray(rng.randn(4, 32, 32, 3), jnp.float32),
        pose=jnp.asarray(rng.randn(4, 32, 32, 5), jnp.float32),
        gt_parsing=jnp.asarray(
            rng.randint(0, 7, (4, 32, 32, 1)), jnp.float32))
    keys = dict(aug1=jax.random.PRNGKey(1), aug2=jax.random.PRNGKey(2),
                aug3=jax.random.PRNGKey(3))

    # a per-sample "discriminator" whose output depends on batch statistics
    # the way mbstd does (catches group-mixing): per-strided-group std.
    def stat_apply(p, x, c):
        n = x.shape[0]
        g = min(2, n)
        y = x.reshape(g, n // g, -1)
        s = jnp.std(y, axis=0).mean(axis=-1)          # [n//g]
        s = jnp.tile(s, (g,))                          # [n]
        return (jnp.mean(x, axis=(1, 2, 3)) + s)[:, None] + \
            jnp.sum(c, axis=-1, keepdims=True)

    cores = build_loss_cores(base, None, None, None,
                             d_apply=stat_apply, dp_apply=stat_apply)
    loss, metrics = cores["d"](None, img, ft, gen_c, jnp.float32(0.0),
                               batch, keys, do_r1=False)

    # oracle: three separate calls, same math
    def d_in(x):
        return jnp.concatenate([x, batch["pose"][..., 0:3]], axis=-1)

    gl = stat_apply(None, d_in(img), gen_c)
    fl = stat_apply(None, d_in(ft), gen_c)
    rl = stat_apply(None, d_in(batch["real_img"]), gen_c)
    want = ((d_logistic_loss(fake_logits=gl)
             + d_logistic_loss(fake_logits=fl)) / 2
            + d_logistic_loss(real_logits=rl))
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-6)
    np.testing.assert_allclose(float(metrics["real_scores"]),
                               float(jnp.mean(rl)), rtol=1e-6)


def test_g_terms_batched_matches_separate():
    from pasta_tpu.losses.gan import g_nonsat_loss

    base = smoke_config(1, batch_size=4, data_axis_size=1, resolution=32,
                        use_ada=False, vgg_weight=0.0, l1_weight=0.0,
                        mask_weight=0.0, mbstd_group_size=2)
    rng = np.random.RandomState(2)
    outputs = (jnp.asarray(rng.randn(4, 32, 32, 3), jnp.float32),
               jnp.asarray(rng.randn(4, 32, 32, 3), jnp.float32),
               jnp.asarray(rng.randn(4, 32, 32, 7), jnp.float32),
               jnp.asarray(rng.randn(4, 8), jnp.float32))
    batch = dict(
        real_img=jnp.asarray(rng.randn(4, 32, 32, 3), jnp.float32),
        pose=jnp.asarray(rng.randn(4, 32, 32, 5), jnp.float32),
        gt_parsing=jnp.asarray(
            rng.randint(0, 7, (4, 32, 32, 1)), jnp.float32))
    keys = dict(aug1=jax.random.PRNGKey(1), aug2=jax.random.PRNGKey(2))

    def stat_apply(p, x, c):
        n = x.shape[0]
        g = min(2, n)
        s = jnp.std(x.reshape(g, n // g, -1), axis=0).mean(axis=-1)
        return (jnp.mean(x, axis=(1, 2, 3)) + jnp.tile(s, (g,)))[:, None]

    cores = build_loss_cores(base, None, None, None,
                             d_apply=stat_apply, dp_apply=stat_apply)
    loss, _ = cores["g"](outputs, None, None, jnp.float32(0.0), batch, keys)

    img, ft, pp, gen_c = outputs

    def d_in(x):
        return jnp.concatenate([x, batch["pose"][..., 0:3]], axis=-1)

    gl = stat_apply(None, d_in(img), gen_c)
    fl = stat_apply(None, d_in(ft), gen_c)
    dp_in = jnp.concatenate(
        [jax.nn.softmax(pp, axis=-1), batch["pose"][..., 0:3]], axis=-1)
    pl = stat_apply(None, dp_in, gen_c)
    want = ((g_nonsat_loss(gl) + g_nonsat_loss(fl)) / 2
            + g_nonsat_loss(pl))
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-6)


def test_vgg_pair_batched_matches_separate():
    from pasta_tpu.losses.vgg import (VGG19Features, vgg_features,
                                      vgg_feature_loss)

    base = smoke_config(1, batch_size=2, data_axis_size=1, resolution=32,
                        use_ada=False, vgg_weight=1.0, remat=False,
                        mbstd_group_size=2)
    vgg_params = VGG19Features().init(
        jax.random.PRNGKey(7), jnp.zeros((1, 32, 32, 3)))
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    ft = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    real = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)

    outputs = (img, ft, jnp.zeros((2, 32, 32, 7)), jnp.zeros((2, 8)))
    batch = dict(real_img=real,
                 pose=jnp.zeros((2, 32, 32, 5)),
                 gt_parsing=jnp.zeros((2, 32, 32, 1)))
    keys = dict(aug1=jax.random.PRNGKey(1), aug2=jax.random.PRNGKey(2))
    cfg0 = dataclasses.replace(base, l1_weight=0.0, mask_weight=0.0)
    cores = build_loss_cores(cfg0, None, None, vgg_params,
                             d_apply=lambda p, x, c: jnp.zeros((x.shape[0], 1)),
                             dp_apply=lambda p, x, c: jnp.zeros((x.shape[0], 1)))
    loss, metrics = cores["g"](outputs, None, None, jnp.float32(0.0),
                               batch, keys)

    rf = vgg_features(vgg_params, real)
    want = (vgg_feature_loss(vgg_params, img, rf)
            + vgg_feature_loss(vgg_params, ft, rf)) / 2 * cfg0.vgg_weight
    got_vgg = float(metrics["g_vgg"]) / 2
    # batch-4 vs batch-2 conv programs reassociate the f32 reductions
    # differently (~2e-4 rel on CPU); the math is otherwise identical
    np.testing.assert_allclose(got_vgg, float(want), rtol=1e-3)


def test_vgg_remat_off_same_loss():
    """vgg_remat=False (store pyramids, skip backward recompute) computes
    the same g_terms loss and grads as the remat default."""
    from pasta_tpu.losses.vgg import VGG19Features

    losses = {}
    for vr in (None, False):
        base = smoke_config(1, batch_size=2, data_axis_size=1, resolution=32,
                            use_ada=False, vgg_weight=1.0, l1_weight=0.0,
                            mask_weight=0.0, remat=True, vgg_remat=vr,
                            mbstd_group_size=2)
        vgg_params = VGG19Features().init(
            jax.random.PRNGKey(7), jnp.zeros((1, 32, 32, 3)))
        rng = np.random.RandomState(9)
        img = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
        ft = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
        outputs = (img, ft, jnp.zeros((2, 32, 32, 7)), jnp.zeros((2, 8)))
        batch = dict(real_img=jnp.asarray(rng.randn(2, 32, 32, 3),
                                          jnp.float32),
                     pose=jnp.zeros((2, 32, 32, 5)),
                     gt_parsing=jnp.zeros((2, 32, 32, 1)))
        keys = dict(aug1=jax.random.PRNGKey(1), aug2=jax.random.PRNGKey(2))
        cores = build_loss_cores(
            base, None, None, vgg_params,
            d_apply=lambda p, x, c: jnp.zeros((x.shape[0], 1)),
            dp_apply=lambda p, x, c: jnp.zeros((x.shape[0], 1)))

        def f(im):
            loss, _ = cores["g"]((im,) + outputs[1:], None, None,
                                 jnp.float32(0.0), batch, keys)
            return loss

        losses[vr] = (float(f(img)), jax.grad(f)(img))
    np.testing.assert_allclose(losses[False][0], losses[None][0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(losses[False][1]),
                               np.asarray(losses[None][1]), rtol=1e-5,
                               atol=1e-7)


def test_g_terms_unbatched_variant_matches():
    """g_terms(batch_streams=False) — the R1-program memory fallback —
    computes the same loss as the batched default (D call and VGG pair
    both take the separate-call path)."""
    from pasta_tpu.losses.vgg import VGG19Features

    base = smoke_config(1, batch_size=4, data_axis_size=1, resolution=32,
                        use_ada=False, vgg_weight=1.0, l1_weight=1.0,
                        mask_weight=0.0, remat=True, mbstd_group_size=2)
    vgg_params = VGG19Features().init(
        jax.random.PRNGKey(7), jnp.zeros((1, 32, 32, 3)))
    rng = np.random.RandomState(5)
    outputs = (jnp.asarray(rng.randn(4, 32, 32, 3), jnp.float32),
               jnp.asarray(rng.randn(4, 32, 32, 3), jnp.float32),
               jnp.asarray(rng.randn(4, 32, 32, 7), jnp.float32),
               jnp.asarray(rng.randn(4, 8), jnp.float32))
    batch = dict(
        real_img=jnp.asarray(rng.randn(4, 32, 32, 3), jnp.float32),
        pose=jnp.asarray(rng.randn(4, 32, 32, 5), jnp.float32),
        gt_parsing=jnp.asarray(
            rng.randint(0, 7, (4, 32, 32, 1)), jnp.float32))
    keys = dict(aug1=jax.random.PRNGKey(1), aug2=jax.random.PRNGKey(2))

    def stat_apply(p, x, c):
        n = x.shape[0]
        g = min(2, n)
        s = jnp.std(x.reshape(g, n // g, -1), axis=0).mean(axis=-1)
        return (jnp.mean(x, axis=(1, 2, 3)) + jnp.tile(s, (g,)))[:, None]

    cores = build_loss_cores(base, None, None, vgg_params,
                             d_apply=stat_apply, dp_apply=stat_apply)
    args = (outputs, None, None, jnp.float32(0.0), batch, keys)
    loss_b, m_b = cores["g"](*args)
    loss_u, m_u = cores["g"](*args, batch_streams=False)
    # same reassociation tolerance as the pair test above
    np.testing.assert_allclose(float(loss_u), float(loss_b), rtol=1e-3)
    np.testing.assert_allclose(float(m_u["g_vgg"]), float(m_b["g_vgg"]),
                               rtol=1e-3)
    np.testing.assert_allclose(float(m_u["g_loss"]), float(m_b["g_loss"]),
                               rtol=1e-5)


def test_spade_norm_fused_matches_two_convs():
    from pasta_tpu.nn.synthesis import SpadeNormBlock
    from pasta_tpu.nn.layers import instance_norm_2d
    from pasta_tpu.ops import conv2d_resample
    import math

    m = SpadeNormBlock(in_channels=8, norm_channels=12)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 12))
    feat = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 8))
    v = m.init(jax.random.PRNGKey(0), x, feat)
    p = v["params"]
    assert set(p) == {"conv_mlp", "conv_gamma", "conv_beta"}
    assert p["conv_gamma"]["weight"].shape == (3, 3, 12, 12)

    out = m.apply(v, x, feat)
    g_mlp, g = 1.0 / math.sqrt(8 * 9), 1.0 / math.sqrt(12 * 9)
    actv = jax.nn.relu(conv2d_resample(
        feat, (p["conv_mlp"]["weight"] * g_mlp).astype(feat.dtype),
        f=None, padding=1, flip_weight=True))
    gamma = conv2d_resample(actv, (p["conv_gamma"]["weight"] * g).astype(
        actv.dtype), f=None, padding=1, flip_weight=True)
    beta = conv2d_resample(actv, (p["conv_beta"]["weight"] * g).astype(
        actv.dtype), f=None, padding=1, flip_weight=True)
    want = instance_norm_2d(x) * (1 + gamma) + beta
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
