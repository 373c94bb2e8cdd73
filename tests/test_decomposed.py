"""Decomposed VJP-chained step == monolithic step (gradient equivalence)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pasta_tpu.train.config import smoke_config
from pasta_tpu.train.state import init_state, example_batch
from pasta_tpu.train.steps import make_train_step
from pasta_tpu.train.decomposed import make_decomposed_steps


@pytest.mark.slow
def test_matches_monolithic():
    cfg = dataclasses.replace(
        smoke_config(1), batch_size=2, data_axis_size=1, mbstd_group_size=2,
        resolution=64, use_noise=False,  # deterministic forward
        use_ada=False)                   # keys differ between step variants
    state0 = init_state(cfg, jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v)
             for k, v in example_batch(cfg, np.random.RandomState(0)).items()}
    key = jax.random.PRNGKey(1)

    mono = make_train_step(cfg)
    deco = make_decomposed_steps(cfg)
    s_mono, m_mono = mono(state0, batch, key, do_r1_d=True, do_r1_dp=True)
    s_deco, m_deco = deco(state0, batch, key, do_r1_d=True, do_r1_dp=True)

    # G params after one update must match (same grads up to float assoc).
    a = jax.tree.leaves(s_mono.g_params)
    b = jax.tree.leaves(s_deco.g_params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-3, atol=5e-5)
    # D params likewise.
    for x, y in zip(jax.tree.leaves(s_mono.d_params),
                    jax.tree.leaves(s_deco.d_params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-3, atol=5e-5)
    # Key scalar metrics agree.
    for name in ["d_loss", "dp_loss"]:
        np.testing.assert_allclose(float(m_mono[name]), float(m_deco[name]),
                                   rtol=1e-3, atol=1e-4)


def test_reuse_g_fakes_matches_monolithic_reuse():
    """Decomposed + reuse_g_fakes == monolithic + reuse_g_fakes: both feed
    the D/DP phases Gmain's own fakes, so at use_noise=False the post-step
    D params must agree (same tolerance as the baseline parity test)."""
    cfg = dataclasses.replace(
        smoke_config(1), batch_size=2, data_axis_size=1, mbstd_group_size=2,
        resolution=64, use_noise=False, use_ada=False, reuse_g_fakes=True,
        strict_phase_noise=False)
    state0 = init_state(cfg, jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v)
             for k, v in example_batch(cfg, np.random.RandomState(0)).items()}
    key = jax.random.PRNGKey(1)

    s_mono, m_mono = make_train_step(cfg)(state0, batch, key)
    s_deco, m_deco = make_decomposed_steps(cfg)(state0, batch, key)
    for x, y in zip(jax.tree.leaves(s_mono.d_params),
                    jax.tree.leaves(s_deco.d_params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-3, atol=5e-5)
    for name in ["d_loss", "dp_loss"]:
        np.testing.assert_allclose(float(m_mono[name]), float(m_deco[name]),
                                   rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_chunked_backward_matches():
    """bwd_chunk VJP-chunked G backward == whole-batch decomposed step."""
    base = dataclasses.replace(
        smoke_config(1), batch_size=4, data_axis_size=1, mbstd_group_size=2,
        resolution=64, use_noise=False, use_ada=False)
    chunked = dataclasses.replace(base, bwd_chunk=2)
    state0 = init_state(base, jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v)
             for k, v in example_batch(base, np.random.RandomState(0)).items()}
    key = jax.random.PRNGKey(1)
    s_a, _ = make_decomposed_steps(base)(state0, batch, key)
    s_b, _ = make_decomposed_steps(chunked)(state0, batch, key)
    # chunk-summed grads differ from whole-batch grads only by float
    # association; adam's sign-sensitive normalization can turn an epsilon
    # grad difference into a ~lr-sized param difference on near-zero grads —
    # bound the fraction and magnitude instead of elementwise equality.
    n_bad = n_tot = 0
    for x, y in zip(jax.tree.leaves(s_a.g_params),
                    jax.tree.leaves(s_b.g_params)):
        d = np.abs(np.asarray(x) - np.asarray(y))
        assert d.max() <= 2 * base.lr + 1e-6, d.max()
        n_bad += int((d > 5e-5).sum())
        n_tot += d.size
    assert n_bad / n_tot < 0.005, (n_bad, n_tot)


@pytest.mark.slow
def test_three_way_loss_parity_with_contextual():
    """monolithic == phase == decomposed with EVERY G loss term active
    (vgg + contextual included) — the three step modes consume one loss
    definition (train/loss_terms.py); round-3 verdict found phase mode had
    silently dropped the contextual term."""
    from pasta_tpu.losses.vgg import VGG19Features
    from pasta_tpu.train.steps import make_phase_steps

    cfg = dataclasses.replace(
        smoke_config(1), batch_size=2, data_axis_size=1, mbstd_group_size=2,
        resolution=64, use_noise=False, use_ada=False,
        vgg_weight=0.3, contextual_weight=0.5)
    vgg_params = VGG19Features().init(
        jax.random.PRNGKey(7), jnp.zeros((1, 64, 64, 3)))
    state0 = init_state(cfg, jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v)
             for k, v in example_batch(cfg, np.random.RandomState(0)).items()}
    key = jax.random.PRNGKey(1)

    steps = {
        "mono": make_train_step(cfg, vgg_params=vgg_params),
        "phase": make_phase_steps(cfg, vgg_params=vgg_params),
        "deco": make_decomposed_steps(cfg, vgg_params=vgg_params),
    }
    out = {name: fn(state0, batch, key, do_r1_d=True, do_r1_dp=True)
           for name, fn in steps.items()}

    s_ref, m_ref = out["mono"]
    for name in ("phase", "deco"):
        s, m = out[name]
        for x, y in zip(jax.tree.leaves(s_ref.g_params),
                        jax.tree.leaves(s.g_params)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=5e-3, atol=5e-5, err_msg=name)
        for x, y in zip(jax.tree.leaves(s_ref.d_params),
                        jax.tree.leaves(s.d_params)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=5e-3, atol=5e-5, err_msg=name)
        # The unified cores report the same metric set in every mode; the
        # g_vgg metric being nonzero proves the vgg path ran, and parity
        # of g-params above proves contextual contributed identically
        # (cfg.contextual_weight=0.5 changes the G gradient).
        for metric in ["d_loss", "dp_loss", "g_loss", "g_vgg"]:
            np.testing.assert_allclose(
                float(m_ref[metric]), float(m[metric]),
                rtol=1e-3, atol=1e-4, err_msg=f"{name}:{metric}")
        assert float(m["g_vgg"]) != 0.0


def test_contextual_term_active_in_shared_core():
    """cores['g'] responds to contextual_weight — guards against the term
    being silently dropped again (it feeds every step mode now)."""
    from pasta_tpu.losses.vgg import VGG19Features
    from pasta_tpu.train.loss_terms import build_loss_cores

    base = smoke_config(1, batch_size=2, data_axis_size=1, resolution=32,
                        use_ada=False, vgg_weight=0.0)
    vgg_params = VGG19Features().init(
        jax.random.PRNGKey(7), jnp.zeros((1, 32, 32, 3)))
    rng = np.random.RandomState(0)
    outputs = (jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32),
               jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32),
               jnp.asarray(rng.randn(2, 32, 32, 7), jnp.float32),
               jnp.asarray(rng.randn(2, 8), jnp.float32))
    batch = dict(
        real_img=jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32),
        pose=jnp.asarray(rng.randn(2, 32, 32, 5), jnp.float32),
        gt_parsing=jnp.asarray(
            rng.randint(0, 7, (2, 32, 32, 1)), jnp.float32))
    keys = dict(aug1=jax.random.PRNGKey(1), aug2=jax.random.PRNGKey(2))
    fake_apply = lambda p, x, c: jnp.mean(x, axis=(1, 2, 3))[:, None]

    def g_loss(ctx_w):
        cfg = dataclasses.replace(base, contextual_weight=ctx_w)
        cores = build_loss_cores(cfg, None, None, vgg_params,
                                 d_apply=fake_apply, dp_apply=fake_apply)
        loss, _ = cores["g"](outputs, None, None, jnp.float32(0.0),
                             batch, keys)
        return float(loss)

    assert g_loss(1.0) != g_loss(0.0)
