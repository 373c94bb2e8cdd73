"""Training extras: freeze-D masking, npz checkpoint roundtrip, PPL."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pasta_tpu.train.config import smoke_config
from pasta_tpu.train.state import init_state, example_batch
from pasta_tpu.train.steps import make_train_step
from pasta_tpu.io.npz_ckpt import save_npz_variables, load_npz_variables
from pasta_tpu.metrics.ppl import compute_ppl, slerp, lerp


def _small_cfg(**kw):
    base = smoke_config(1)
    return dataclasses.replace(
        base, batch_size=2, data_axis_size=1, mbstd_group_size=2,
        resolution=64, **kw)


class TestFreezeD:
    @pytest.mark.slow
    def test_frozen_layers_unchanged(self):
        cfg = _small_cfg(freeze_d_layers=3, use_ada=False)
        state = init_state(cfg, jax.random.PRNGKey(0))
        step = make_train_step(cfg)
        batch = {k: jnp.asarray(v)
                 for k, v in example_batch(cfg, np.random.RandomState(0)).items()}
        before = jax.device_get(state.d_params)
        state, _ = step(state, batch, jax.random.PRNGKey(1))
        after = jax.device_get(state.d_params)
        # layers 0,1,2 = b64.fromrgb, b64.conv0, b64.conv1 must be frozen
        for name in ["fromrgb", "conv0", "conv1"]:
            np.testing.assert_array_equal(
                before["b64"][name]["weight"], after["b64"][name]["weight"])
        # layer 3 (b64.skip) and deeper blocks must have moved
        assert not np.allclose(
            before["b64"]["skip"]["weight"], after["b64"]["skip"]["weight"])
        assert not np.allclose(
            before["b32"]["conv0"]["weight"], after["b32"]["conv0"]["weight"])


class TestReuseGFakes:
    @pytest.mark.slow
    def test_matches_shared_forward_at_lr0(self):
        """With lr=0 (G params frozen across the step) and use_noise=False
        (noise keys irrelevant), the reuse_g_fakes step's D/DP phases see
        bit-identical fakes to the shared-forward step — so every D metric
        must match exactly."""
        metrics = {}
        for reuse in (False, True):
            cfg = _small_cfg(use_ada=False, use_noise=False, lr=0.0,
                             vgg_weight=0.0, reuse_g_fakes=reuse,
                             strict_phase_noise=False, donate=False)
            state = init_state(cfg, jax.random.PRNGKey(0))
            step = make_train_step(cfg)
            batch = {k: jnp.asarray(v)
                     for k, v in example_batch(
                         cfg, np.random.RandomState(0)).items()}
            _, m = step(state, batch, jax.random.PRNGKey(1))
            metrics[reuse] = jax.device_get(m)
        for k in ("d_loss", "real_scores", "fake_scores", "dp_loss"):
            if k in metrics[False]:
                np.testing.assert_allclose(
                    metrics[True][k], metrics[False][k], rtol=0, atol=0,
                    err_msg=k)

    @pytest.mark.slow
    def test_runs_with_real_lr(self):
        """Smoke: the reuse step trains (finite losses, params move)."""
        cfg = _small_cfg(use_ada=False, reuse_g_fakes=True,
                         strict_phase_noise=False, donate=False)
        state = init_state(cfg, jax.random.PRNGKey(0))
        step = make_train_step(cfg)
        batch = {k: jnp.asarray(v)
                 for k, v in example_batch(cfg, np.random.RandomState(1)).items()}
        before = jax.device_get(state.g_params)
        state, m = step(state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(m["g_loss"]))
        assert np.isfinite(float(m["d_loss"]))
        after = jax.device_get(state.g_params)
        flat_b = jax.tree.leaves(before)
        flat_a = jax.tree.leaves(after)
        assert any(not np.allclose(a, b) for a, b in zip(flat_a, flat_b))


class TestNpzCheckpoint:
    def test_roundtrip(self, tmp_path):
        tree = {
            "params": {"layer.0": {"weight": np.random.randn(3, 4)},
                       "b": {"bias": np.zeros(5)}},
            "buffers": {"w_avg": np.ones(7)},
        }
        path = str(tmp_path / "ckpt.npz")
        save_npz_variables(path, tree)
        loaded = load_npz_variables(path)
        np.testing.assert_array_equal(
            loaded["params"]["layer.0"]["weight"],
            tree["params"]["layer.0"]["weight"])
        np.testing.assert_array_equal(loaded["buffers"]["w_avg"],
                                      tree["buffers"]["w_avg"])


class TestPPL:
    def test_interp_endpoints(self):
        a = jnp.asarray(np.random.RandomState(0).randn(4, 8).astype(np.float32))
        b = jnp.asarray(np.random.RandomState(1).randn(4, 8).astype(np.float32))
        np.testing.assert_allclose(np.asarray(lerp(a, b, 0.0)), np.asarray(a))
        np.testing.assert_allclose(np.asarray(lerp(a, b, 1.0)), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(slerp(a, b, jnp.zeros((4, 1)))), np.asarray(a),
            rtol=1e-5, atol=1e-5)

    def test_ppl_linear_synth(self):
        """For a linear 'generator', PPL == |J|^2-style constant."""
        w = np.random.RandomState(0).randn(8, 12).astype(np.float32)

        def synth(codes):
            return (codes @ w).reshape(codes.shape[0], 2, 2, 3)

        def feats(imgs):
            return imgs.reshape(imgs.shape[0], -1)

        rng = np.random.RandomState(2)
        a = jnp.asarray(rng.randn(64, 8).astype(np.float32))
        b = jnp.asarray(rng.randn(64, 8).astype(np.float32))
        ppl = compute_ppl(synth, feats, a, b, jax.random.PRNGKey(0),
                          epsilon=1e-3)
        # d = |(b-a) eps W|^2 / eps^2 = |(b-a) W|^2 — finite, positive
        assert np.isfinite(ppl) and ppl > 0


class TestCheckpointResume:
    @pytest.mark.slow
    def test_orbax_trainstate_roundtrip(self, tmp_path):
        from pasta_tpu.io.checkpoint import (
            save_checkpoint_variables, load_checkpoint_variables)

        cfg = _small_cfg()
        state = init_state(cfg, jax.random.PRNGKey(0))
        state = state.replace(step=jnp.asarray(7, jnp.int32),
                              ada_p=jnp.asarray(0.25, jnp.float32))
        path = str(tmp_path / "ckpt")
        save_checkpoint_variables(path, jax.device_get(state))
        restored = load_checkpoint_variables(
            path, jax.tree.map(np.asarray, jax.device_get(state)))
        assert int(restored.step) == 7
        assert float(restored.ada_p) == 0.25
        for a, b in zip(jax.tree.leaves(state.g_params),
                        jax.tree.leaves(restored.g_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # optimizer state survives too (the reference loses it; SURVEY §5)
        for a, b in zip(jax.tree.leaves(state.g_opt),
                        jax.tree.leaves(restored.g_opt)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestEvaluatorStatsCache:
    """Held-out real detector stats disk cache (reference
    metric_utils.py:180-228 cache semantics)."""

    def test_real_stats_cached_across_constructions(self, tmp_path):
        import os

        import pasta_tpu.train.loop as loop_mod
        from pasta_tpu.data.trainsets import TryonTrainDataset
        from pasta_tpu.metrics.inception import random_inception_params
        from pasta_tpu.metrics.metric_main import DetectorRunner

        cfg = _small_cfg()
        dataset = TryonTrainDataset("/root/reference/test_datas",
                                    resolution=64)
        det = random_inception_params(0)
        cache = str(tmp_path / "cache")

        calls = []
        orig = DetectorRunner.array_stats

        def counting(self, *a, **kw):
            calls.append(1)
            return orig(self, *a, **kw)

        DetectorRunner.array_stats = counting
        try:
            ev1 = loop_mod.TrainingEvaluator(
                cfg, dataset, det, num_items=4, batch_size=2,
                metrics=("fid",), cache_dir=cache)
            n_first = len(calls)
            assert n_first == 1  # one real-side extraction
            files = os.listdir(cache)
            assert any(f.startswith("train-real-stats") for f in files)
            ev2 = loop_mod.TrainingEvaluator(
                cfg, dataset, det, num_items=4, batch_size=2,
                metrics=("fid",), cache_dir=cache)
            assert len(calls) == n_first  # cache hit: no re-extraction
        finally:
            DetectorRunner.array_stats = orig
        mu1, s1 = ev1.real_stats.get_mean_cov()
        mu2, s2 = ev2.real_stats.get_mean_cov()
        np.testing.assert_array_equal(mu1, mu2)
        np.testing.assert_array_equal(s1, s2)
        # a different detector must miss the cache
        det2 = random_inception_params(1)
        ev3 = loop_mod.TrainingEvaluator(
            cfg, dataset, det2, num_items=4, batch_size=2,
            metrics=("fid",), cache_dir=cache)
        mu3, _ = ev3.real_stats.get_mean_cov()
        assert not np.allclose(mu1, mu3)
