"""Metric registry + runners (reference metrics/metric_main.py:24-77).

The reference's generator-stats path is stale (calls the PASTA-GAN-v1
signature, metric_utils.py:232-301; SURVEY.md §2.2); the practically-used
evaluation — FID/KID/IS/PR between a folder of generated try-on results and
a folder of reals — is what this module implements, with TPU-batched
feature extraction and the reference's cache/jsonl conventions.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Optional

import numpy as np
import PIL.Image
import jax
import jax.numpy as jnp

from .feature_stats import FeatureStats, cache_path
from .fid import compute_fid
from .kid import compute_kid
from .inception_score import compute_is
from .precision_recall import compute_pr
from .inception import (
    inception_features, preprocess_images, import_inception_torch_state)

_metric_registry: Dict[str, Callable] = {}


def register_metric(fn):
    _metric_registry[fn.__name__] = fn
    return fn


def is_valid_metric(name):
    return name in _metric_registry


def list_metrics():
    return sorted(_metric_registry)


class DetectorRunner:
    """Batched jitted feature extraction over image folders.

    kind='inception' -> 2048-d pool3 features (+softmax probs for IS);
    kind='vgg16'     -> 4096-d fc7 features (the reference PR detector,
                        metrics/precision_recall.py:37-46; no probs).
    """

    def __init__(self, detector_params, batch_size=32, kind="inception"):
        assert kind in ("inception", "vgg16")
        self.params = detector_params
        self.batch_size = batch_size
        self.kind = kind

        if kind == "inception":
            @jax.jit
            def _features(params, images):
                return inception_features(
                    params, preprocess_images(images), return_logits=True)
        else:
            from .vgg16 import fc_features

            @jax.jit
            def _features(params, images):
                return fc_features(params, images), None

        self._features = _features

    def folder_stats(self, folder, capture_all=False, capture_mean_cov=True,
                     max_items=None, capture_probs=False, cache_dir=None,
                     crop=None):
        if cache_dir is not None:
            path = cache_path(cache_dir, "feats", folder=folder,
                              max_items=max_items, crop=crop,
                              detector=self.kind)
            if os.path.exists(path):
                return FeatureStats.load(path)
        files = sorted(
            f for f in os.listdir(folder)
            if f.lower().endswith((".png", ".jpg", ".jpeg")))
        if not files:
            raise ValueError(f"no images found in {folder}")
        if max_items is not None:
            files = files[:max_items]
        stats = FeatureStats(capture_all=capture_all or capture_probs,
                             capture_mean_cov=capture_mean_cov,
                             max_items=max_items)
        probs_all = []
        batch, bs = [], self.batch_size
        for fname in files:
            img = np.array(PIL.Image.open(
                os.path.join(folder, fname)).convert("RGB"))
            if crop is not None:
                y0, y1, x0, x1 = crop
                img = img[y0:y1, x0:x1]
            batch.append(img)
            if len(batch) == bs:
                self._flush(batch, stats, probs_all)
                batch = []
        if batch:
            self._flush(batch, stats, probs_all)
        stats.probs = np.concatenate(probs_all) if probs_all else None
        if cache_dir is not None:
            stats.save(path)
        return stats

    def array_stats(self, images_uint8, capture_all=False,
                    capture_mean_cov=True, capture_probs=False):
        """FeatureStats over an in-memory [N, H, W, 3] uint8 array (the
        in-training evaluation path — no folder round-trip)."""
        imgs = list(np.asarray(images_uint8))
        stats = FeatureStats(capture_all=capture_all or capture_probs,
                             capture_mean_cov=capture_mean_cov)
        probs_all = []
        for i in range(0, len(imgs), self.batch_size):
            self._flush(imgs[i:i + self.batch_size], stats, probs_all)
        stats.probs = np.concatenate(probs_all) if probs_all else None
        return stats

    def _flush(self, batch, stats, probs_all):
        # pad to full batch for one compiled shape
        n_real = len(batch)
        shape0 = batch[0].shape
        while len(batch) < self.batch_size:
            batch.append(np.zeros(shape0, np.uint8))
        arr = np.stack([
            np.asarray(PIL.Image.fromarray(b).resize((shape0[1], shape0[0])))
            if b.shape != shape0 else b for b in batch])
        feats, logits = self._features(self.params, jnp.asarray(arr))
        feats = np.asarray(feats)[:n_real]
        stats.append(feats)
        if logits is not None:
            probs = np.asarray(jax.nn.softmax(logits, axis=-1))[:n_real]
            probs_all.append(probs)


@register_metric
def fid(runner, real_dir, gen_dir, max_items=None, cache_dir=None, crop=None):
    real = runner.folder_stats(real_dir, capture_mean_cov=True,
                               max_items=max_items, cache_dir=cache_dir)
    gen = runner.folder_stats(gen_dir, capture_mean_cov=True,
                              max_items=max_items, crop=crop)
    mu_r, sig_r = real.get_mean_cov()
    mu_g, sig_g = gen.get_mean_cov()
    return {"fid": compute_fid(mu_r, sig_r, mu_g, sig_g)}


@register_metric
def kid(runner, real_dir, gen_dir, max_items=None, cache_dir=None, crop=None):
    real = runner.folder_stats(real_dir, capture_all=True,
                               capture_mean_cov=False, max_items=max_items,
                               cache_dir=cache_dir)
    gen = runner.folder_stats(gen_dir, capture_all=True,
                              capture_mean_cov=False, max_items=max_items,
                              crop=crop)
    return {"kid": compute_kid(real.get_all(), gen.get_all())}


@register_metric
def inception_score(runner, real_dir, gen_dir, max_items=None,
                    cache_dir=None, crop=None):
    gen = runner.folder_stats(gen_dir, capture_probs=True,
                              capture_mean_cov=False, max_items=max_items,
                              crop=crop)
    mean, std = compute_is(gen.probs)
    return {"is_mean": mean, "is_std": std}


@register_metric
def ppl(runner, real_dir, gen_dir, max_items=None, cache_dir=None, crop=None,
        ppl_ctx=None, epsilon=1e-4, interp="lerp", seed=0):
    """Try-on conditional perceptual path length.

    Reference analogue: ppl2_wend (metrics/metric_main.py:96-111,
    perceptual_path_length.py:23-130 — stale for this model family; see
    metrics/ppl.py). Needs `ppl_ctx` from ppl.build_tryon_ppl_ctx (the
    model + condition endpoints) plus a feature extractor: `runner` may be
    a VGG16 DetectorRunner (LPIPS space when its params carry lin weights)
    or an inception runner; real_dir/gen_dir are unused."""
    assert ppl_ctx is not None, (
        "ppl needs ppl_ctx=build_tryon_ppl_ctx(...) — from the CLI pass "
        "--network/--dataroot/--testtxt (cli/calc_metrics.py)")
    import jax

    from .ppl import compute_ppl

    if "feature_fn" in ppl_ctx:
        feature_fn = ppl_ctx["feature_fn"]
    elif runner.kind == "vgg16":
        from .ppl import make_lpips_feature_fn

        feature_fn = make_lpips_feature_fn(runner.params)
    else:
        def feature_fn(images_pm1):
            # preprocess_images rescales from [0, 255] (any float dtype)
            arr = preprocess_images((images_pm1 + 1.0) * 127.5)
            return inception_features(runner.params, arr)

    value = compute_ppl(
        ppl_ctx["synth_from_code"], feature_fn,
        ppl_ctx["codes_a"][:max_items] if max_items else ppl_ctx["codes_a"],
        ppl_ctx["codes_b"][:max_items] if max_items else ppl_ctx["codes_b"],
        jax.random.PRNGKey(seed), epsilon=epsilon, interp=interp, crop=crop)
    return {"ppl": value}


@register_metric
def pr(runner, real_dir, gen_dir, max_items=None, cache_dir=None, crop=None):
    real = runner.folder_stats(real_dir, capture_all=True,
                               capture_mean_cov=False, max_items=max_items,
                               cache_dir=cache_dir)
    gen = runner.folder_stats(gen_dir, capture_all=True,
                              capture_mean_cov=False, max_items=max_items,
                              crop=crop)
    precision, recall = compute_pr(real.get_all(), gen.get_all())
    return {"precision": precision, "recall": recall}


def calc_metric(metric, runner, real_dir, gen_dir, run_dir=None, **kwargs):
    """Run one metric; write metric-<name>.jsonl like the reference
    (metric_main.py:67-77)."""
    assert is_valid_metric(metric), f"unknown metric {metric}"
    # fail fast on empty/missing folders before any feature extraction
    # (ppl synthesizes its own images — no folders involved)
    if metric != "ppl":
        for d in (real_dir, gen_dir):
            if not os.path.isdir(d):
                raise ValueError(f"not a directory: {d}")
            if not any(f.lower().endswith((".png", ".jpg", ".jpeg"))
                       for f in os.listdir(d)):
                raise ValueError(f"no images found in {d}")
    t0 = time.time()
    results = _metric_registry[metric](runner, real_dir, gen_dir, **kwargs)
    record = dict(
        metric=metric, results=results, total_time=time.time() - t0,
        real_dir=real_dir, gen_dir=gen_dir, timestamp=time.time())
    if run_dir is not None:
        os.makedirs(run_dir, exist_ok=True)
        with open(os.path.join(run_dir, f"metric-{metric}.jsonl"), "at") as f:
            f.write(json.dumps(record) + "\n")
    return record


def _load_state(path):
    if path.endswith(".npz"):
        data = np.load(path)
        return {k: data[k] for k in data.files}
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: v.numpy() for k, v in obj.items()}


def load_detector(path):
    """Load inception weights (.npz flat or torch .pth state dict)."""
    return import_inception_torch_state(_load_state(path))


def load_vgg16_detector(path, lpips_path=None):
    """Load torchvision-vgg16 weights (+ optional LPIPS lin weights)."""
    from .vgg16 import import_vgg16_torch_state

    lpips_state = _load_state(lpips_path) if lpips_path else None
    return import_vgg16_torch_state(_load_state(path), lpips_state)
