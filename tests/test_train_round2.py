"""Round-2 training features: path-length reg, per-phase noise keys,
in-training metric evaluation, tick stats, try-on grids, log tee."""

import dataclasses
import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pasta_tpu.train.config import smoke_config
from pasta_tpu.train.state import init_state, example_batch
from pasta_tpu.train.steps import make_train_step, make_phase_steps
from pasta_tpu.train.decomposed import make_decomposed_steps

FIXTURES = "/root/reference/test_datas"


def _tiny_cfg(**kw):
    base = dict(batch_size=2, data_axis_size=1, mbstd_group_size=2)
    base.update(kw)
    return dataclasses.replace(smoke_config(1), **base)


class TestPathLengthReg:
    @pytest.mark.slow
    def test_pl_step_updates_mean_and_params(self):
        cfg = _tiny_cfg(pl_weight=2.0)
        state = init_state(cfg, jax.random.PRNGKey(0))
        batch = {k: jnp.asarray(v) for k, v in
                 example_batch(cfg, np.random.RandomState(0)).items()}
        step = make_train_step(cfg)
        s1, m1 = step(state, batch, jax.random.PRNGKey(1), do_pl=True)
        assert np.isfinite(float(m1["pl_penalty"]))
        assert float(s1.pl_mean) != 0.0
        s0, m0 = step(state, batch, jax.random.PRNGKey(1), do_pl=False)
        assert "pl_penalty" not in m0
        assert float(s0.pl_mean) == 0.0
        # the Gpl optimizer step moved G params beyond the Gmain update
        diff = [np.abs(np.asarray(a) - np.asarray(b)).max()
                for a, b in zip(jax.tree.leaves(s1.g_params),
                                jax.tree.leaves(s0.g_params))]
        assert max(diff) > 0

    def test_pl_rejected_outside_monolithic(self):
        cfg = _tiny_cfg(pl_weight=2.0)
        with pytest.raises(AssertionError):
            make_phase_steps(cfg)
        with pytest.raises(AssertionError):
            make_decomposed_steps(cfg)


class TestPhaseNoiseKeys:
    def test_default_is_reference_faithful(self):
        """strict_phase_noise defaults ON (fresh per-phase draws, the
        reference's loss_fullbody.py:227-231/278-283 semantics); the shared
        draw is the opt-in optimization — same policy as reuse_g_fakes."""
        from pasta_tpu.train.config import TrainConfig

        assert TrainConfig().strict_phase_noise is True
        assert TrainConfig().reuse_g_fakes is False

    @pytest.mark.slow
    def test_strict_decomposed_matches_monolithic_with_noise(self):
        """At the DEFAULT config (strict_phase_noise=True) the decomposed
        step reproduces the monolithic step's per-phase noise draws exactly
        (use_noise=True)."""
        cfg = _tiny_cfg(resolution=64, use_ada=False)
        state0 = init_state(cfg, jax.random.PRNGKey(0))
        batch = {k: jnp.asarray(v) for k, v in
                 example_batch(cfg, np.random.RandomState(0)).items()}
        key = jax.random.PRNGKey(1)
        s_mono, m_mono = make_train_step(cfg)(state0, batch, key)
        s_deco, m_deco = make_decomposed_steps(cfg)(state0, batch, key)
        for x, y in zip(jax.tree.leaves(s_mono.dp_params),
                        jax.tree.leaves(s_deco.dp_params)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=5e-3, atol=5e-5)
        np.testing.assert_allclose(float(m_mono["dp_loss"]),
                                   float(m_deco["dp_loss"]),
                                   rtol=1e-3, atol=1e-4)


class TestFidJitter:
    def test_singular_covariance_is_finite(self):
        from pasta_tpu.metrics.fid import compute_fid

        rng = np.random.RandomState(0)
        # rank-1 covariance (4 samples, 16 features) — singular by design
        f = rng.randn(1, 16)
        sigma = f.T @ f
        mu = rng.randn(16)
        fid = compute_fid(mu, sigma, mu + 0.1, sigma)
        assert np.isfinite(fid)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(FIXTURES), reason="fixtures missing")
class TestTrainingLoopRound2:
    def test_loop_with_eval_grid_and_stats(self, tmp_path):
        """End-to-end smoke: in-training FID rows in stats.jsonl, multi-step
        tick aggregation (num > 1), try-on grid + log.txt in the run dir."""
        from pasta_tpu.data.trainsets import TryonTrainDataset
        from pasta_tpu.metrics.inception import random_inception_params
        from pasta_tpu.train.loop import training_loop

        cfg = _tiny_cfg(batch_size=4, data_axis_size=2, vgg_weight=0.0)
        dataset = TryonTrainDataset(FIXTURES, resolution=cfg.resolution)
        run_dir = str(tmp_path / "run")
        training_loop(
            cfg, dataset, run_dir,
            total_steps=4, tick_interval=2, snapshot_ticks=2,
            num_workers=2,
            eval_metrics=("fid", "fid_tryon"), eval_ticks=1, eval_items=4,
            detector_params=random_inception_params(0),
            tryon_grid_k=3)

        with open(os.path.join(run_dir, "stats.jsonl")) as f:
            rows = [json.loads(line) for line in f]
        assert any("fid_holdout" in r and np.isfinite(r["fid_holdout"])
                   for r in rows)
        assert any("fid_tryon" in r and np.isfinite(r["fid_tryon"])
                   for r in rows)
        assert any(r.get("g_loss", {}).get("num", 0) > 1 for r in rows)
        assert os.path.exists(os.path.join(run_dir, "log.txt"))
        with open(os.path.join(run_dir, "log.txt")) as f:
            assert "tick step" in f.read()
        grids = [f for f in os.listdir(run_dir) if f.startswith("tryon_grid")]
        assert grids, os.listdir(run_dir)
        # parsing snapshot grids (reference fakes*_parsing.png analogue)
        names = os.listdir(run_dir)
        assert any(f.endswith("_parsing.png") for f in names), names
        assert any(f.endswith("_parsing_color.png") for f in names), names
        # bordered cross-pair grid: sources column+row around a k x k grid
        import PIL.Image

        g = np.asarray(PIL.Image.open(os.path.join(run_dir, grids[0])))
        res = cfg.resolution
        assert g.shape[0] > 3 * res and g.shape[1] > 3 * res, g.shape


class TestPrecisionAndRemat:
    """Round-2 throughput levers: per-block remat and bf16 policies."""

    @pytest.mark.slow
    def test_remat_matches_baseline_exactly(self):
        cfg0 = _tiny_cfg(remat=False)
        cfg1 = _tiny_cfg(remat=True)
        state0 = init_state(cfg0, jax.random.PRNGKey(0))
        state1 = init_state(cfg1, jax.random.PRNGKey(0))
        # remat is structure-preserving: identical param trees
        for a, b in zip(jax.tree.leaves(state0.g_params),
                        jax.tree.leaves(state1.g_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        batch = {k: jnp.asarray(v) for k, v in
                 example_batch(cfg0, np.random.RandomState(0)).items()}
        key = jax.random.PRNGKey(1)
        _, m0 = make_train_step(cfg0)(state0, batch, key,
                                      do_r1_d=True, do_r1_dp=True)
        _, m1 = make_train_step(cfg1)(state1, batch, key,
                                      do_r1_d=True, do_r1_dp=True)
        for k in m0:
            np.testing.assert_allclose(float(m0[k]), float(m1[k]),
                                       rtol=1e-5, atol=1e-6, err_msg=k)

    @pytest.mark.slow
    def test_bf16_policies_run_finite(self):
        cfg = _tiny_cfg(remat=True, g_num_bf16_res=2, d_num_bf16_res=2)
        state = init_state(cfg, jax.random.PRNGKey(0))
        batch = {k: jnp.asarray(v) for k, v in
                 example_batch(cfg, np.random.RandomState(0)).items()}
        s1, m = make_train_step(cfg)(state, batch, jax.random.PRNGKey(1),
                                     do_r1_d=True, do_r1_dp=True)
        vals = {k: float(v) for k, v in m.items()}
        assert all(np.isfinite(v) for v in vals.values()), vals
        # params stay fp32 (bf16 is compute-only)
        for leaf in jax.tree.leaves(s1.g_params):
            assert leaf.dtype == jnp.float32

    @pytest.mark.slow
    def test_bf16_generator_forward_close_to_fp32(self):
        """bf16 G forward stays within bf16 tolerance of the fp32 output."""
        from pasta_tpu.models import Generator

        kw = dict(z_dim=0, c_dim=512, w_dim=512, img_resolution=64,
                  img_channels=3, channel_base=2048, channel_max=128,
                  conv_clamp=256, use_noise=False, mapping_layers=1)
        g32 = Generator(**kw)
        gbf = Generator(num_bf16_res=2, **kw)
        rng = np.random.RandomState(0)
        n, res = 1, 64
        inputs = dict(
            z=jnp.zeros((n, 0)),
            c=jnp.asarray(rng.randn(n, res // 4, res // 4, 45), jnp.float32),
            retain=jnp.asarray(rng.randn(n, res, res, 6), jnp.float32),
            pose=jnp.asarray(rng.randn(n, res, res, 5), jnp.float32),
            denorm_upper_input=jnp.asarray(
                rng.randn(n, res, res, 3), jnp.float32),
            denorm_lower_input=jnp.asarray(
                rng.randn(n, res, res, 3), jnp.float32),
            denorm_upper_mask=jnp.asarray(
                rng.rand(n, res, res, 1) > 0.5, jnp.float32),
            denorm_lower_mask=jnp.asarray(
                rng.rand(n, res, res, 1) > 0.5, jnp.float32),
            # Pin the parsing index: the argmax-driven SPADE mask path is
            # discrete, so a single bf16-rounded class flip would cascade —
            # not a precision signal.
            gt_parsing=jnp.asarray(
                rng.randint(0, 7, (n, res, res, 1)), jnp.float32),
        )
        variables = g32.init({"params": jax.random.PRNGKey(0),
                              "noise": jax.random.PRNGKey(1)}, **inputs)
        img32, ft32, pp32 = g32.apply(variables, noise_mode="none", **inputs)
        imgbf, ftbf, ppbf = gbf.apply(variables, noise_mode="none", **inputs)
        assert ftbf.dtype == jnp.float32   # outputs are always fp32
        a, b = np.asarray(ft32), np.asarray(ftbf)
        scale = np.abs(a).max() + 1e-6
        mean_rel = np.abs(b - a).mean() / scale
        assert mean_rel < 0.02, mean_rel   # bf16 ~3 decimal digits, averaged


def test_npz_state_roundtrip(tmp_path):
    """Multi-process snapshots (flat npz) restore exactly into a fresh
    TrainState template — the orbax-free resume path (orbax's save
    deadlocks when called chief-only; see train/loop._save_snapshot)."""
    import numpy as np

    from pasta_tpu.io.npz_ckpt import load_npz_into, save_npz_variables
    from pasta_tpu.train.config import TrainConfig

    cfg = TrainConfig(resolution=32, batch_size=2, data_axis_size=1,
                      channel_base=1024, channel_max=64, mbstd_group_size=2)
    state = init_state(cfg, jax.random.PRNGKey(0))
    host = jax.tree.map(np.asarray, state)
    path = str(tmp_path / "state.npz")
    save_npz_variables(path, host)

    template = jax.tree.map(np.zeros_like,
                            jax.tree.map(np.asarray,
                                         init_state(cfg,
                                                    jax.random.PRNGKey(7))))
    restored = load_npz_into(path, template)
    flat_a = jax.tree_util.tree_leaves(host)
    flat_b = jax.tree_util.tree_leaves(restored)
    assert len(flat_a) == len(flat_b) and len(flat_a) > 50
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
