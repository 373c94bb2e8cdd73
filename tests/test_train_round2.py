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
    @pytest.mark.slow
    def test_strict_decomposed_matches_monolithic_with_noise(self):
        """With strict_phase_noise the decomposed step reproduces the
        monolithic step's per-phase noise draws exactly (use_noise=True)."""
        cfg = _tiny_cfg(resolution=64, use_ada=False,
                        strict_phase_noise=True)
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
            eval_metrics=("fid",), eval_ticks=1, eval_items=4,
            detector_params=random_inception_params(0),
            tryon_grid_k=3)

        with open(os.path.join(run_dir, "stats.jsonl")) as f:
            rows = [json.loads(line) for line in f]
        assert any("fid" in r and np.isfinite(r["fid"]) for r in rows)
        assert any(r.get("g_loss", {}).get("num", 0) > 1 for r in rows)
        assert os.path.exists(os.path.join(run_dir, "log.txt"))
        with open(os.path.join(run_dir, "log.txt")) as f:
            assert "tick step" in f.read()
        grids = [f for f in os.listdir(run_dir) if f.startswith("tryon_grid")]
        assert grids, os.listdir(run_dir)
