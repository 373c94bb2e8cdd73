"""Training orchestration (reference training_loop_fullbody.py:344-789).

Host loop: parallel preprocessing -> shard batch over the data mesh -> one
jitted SPMD step (all phases) -> periodic status/stats/snapshots/checkpoints
-> optional in-training metric evaluation (FID/KID on a fixed held-out
reconstruction set — the reference's metric hook,
training_loop_fullbody.py:738-748, which it ships commented out).

Improvements over the reference checkpoint story (SURVEY.md §5): orbax
checkpoints carry optimizer state, EMA, ADA p, and step — resume is exact.

Observability: stdout tees into <run_dir>/log.txt (dnnlib util.Logger),
per-tick 3-moment stats go to stats.jsonl (every step is aggregated — step
metrics are fetched lazily in one tick-time transfer, no per-step device
sync), and scalars go to TensorBoard events when torch.utils.tensorboard
is importable (training_loop_fullbody.py:766-773 semantics).
"""

from __future__ import annotations

import concurrent.futures
import os
import re
import sys
import time
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import PIL.Image

from ..data.trainsets import (TryonTrainDataset, assemble_train_batch,
                              assemble_train_batch_lean,
                              batch_to_lean_inputs, batch_to_raw_inputs,
                              batch_to_train_inputs)
from ..io.checkpoint import save_checkpoint_variables, load_checkpoint_variables
from ..io.npz_ckpt import load_npz_into, save_npz_variables
from .config import TrainConfig
from .entry import make_mesh, shard_batch, replicate
from .state import init_state, make_models, TrainState
from .steps import make_train_step, make_phase_steps
from .stats import Collector, JsonlLogger, Tee


class ParallelLoader:
    """Background-thread batch producer over a thread pool.

    The reference relies on torch DataLoader worker processes feeding an
    InfiniteSampler (training_loop_fullbody.py:392-394, misc.py:115-146);
    this is the torch-free equivalent: a rank-strided windowed-shuffle
    index stream (data/sampler.py) drained by a thread pool. Under
    multi-host training, pass rank=jax.process_index(),
    num_replicas=jax.process_count() for disjoint per-process streams.
    """

    def __init__(self, dataset, batch_size, num_workers=8, seed=0,
                 rank=0, num_replicas=1, shuffle=True, window_size=0.5,
                 holdout=0):
        from ..data.sampler import infinite_sampler

        self.dataset = dataset
        self.lean = getattr(dataset, "loader_impl", "host") == "device"
        self._get = dataset.lean_item if self.lean else dataset.__getitem__
        self.batch_size = batch_size
        self.sampler = infinite_sampler(
            len(dataset), rank=rank, num_replicas=num_replicas,
            shuffle=shuffle, seed=seed, window_size=window_size,
            skip_first=holdout)
        self.pool = concurrent.futures.ThreadPoolExecutor(num_workers)
        self._pending = []

    def _submit(self):
        idxs = [next(self.sampler) for _ in range(self.batch_size)]
        return [self.pool.submit(self._get, int(i)) for i in idxs]

    def __iter__(self):
        # keep two batches in flight; yield COMPACT raw batches (uint8) —
        # the training loop expands them on device (assemble_train_batch),
        # so the host->device upload is ~6x smaller than shipping the
        # assembled float32 inputs. The device loader (lean) ships only
        # raw planes + scalars and yields (batch, tiled, windowed).
        self._pending = [self._submit(), self._submit()]
        while True:
            futs = self._pending.pop(0)
            self._pending.append(self._submit())
            items = [f.result() for f in futs]
            yield (batch_to_lean_inputs(items) if self.lean
                   else batch_to_raw_inputs(items))


def save_image_grid(images, path, drange=(-1, 1), grid_cols=None,
                    side_images=None, top_images=None, border=4):
    """[N, H, W, 3] -> one PNG grid (training_loop_fullbody.py:313-340).

    side_images ([rows, H, W, 3]) / top_images ([cols, H, W, 3]) prepend the
    source person column / source garment row with a `border`-px white
    gutter — the reference's image_side/image_top bordered snapshot layout.
    Sources share `drange` with the cells."""
    n, h, w, _ = images.shape
    cols = grid_cols or int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    lo, hi = drange

    def to_u8(x):
        x = (np.asarray(x, np.float32) - lo) * 255 / (hi - lo)
        return np.clip(x, 0, 255).astype(np.uint8)

    img = to_u8(images)
    grid = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i in range(n):
        r, c = divmod(i, cols)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = img[i]
    if side_images is not None:
        side = to_u8(side_images)
        col = np.zeros((rows * h, w, 3), np.uint8)
        for r in range(min(rows, len(side))):
            col[r * h:(r + 1) * h] = side[r]
        gutter = np.full((rows * h, border, 3), 255, np.uint8)
        grid = np.concatenate([col, gutter, grid], axis=1)
    if top_images is not None:
        top = to_u8(top_images)
        lead = (w + border) if side_images is not None else 0
        row = np.full((h, lead + cols * w, 3), 255, np.uint8)
        for c in range(min(cols, len(top))):
            row[:, lead + c * w:lead + (c + 1) * w] = top[c]
        gutter = np.full((border, row.shape[1], 3), 255, np.uint8)
        grid = np.concatenate([row, gutter, grid], axis=0)
    PIL.Image.fromarray(grid).save(path)


class TrainingEvaluator:
    """In-training metric evaluation on a held-out set.

    The first `num_items` dataset items are the held-out pool — the
    training loop excludes exactly those indices from its sampler
    (ParallelLoader holdout / data/sampler.py skip_first), so the EMA
    generator is never trained on what it is evaluated on. Two protocols:

    * ``fid_holdout`` / ``kid_holdout``: reconstruction — G_ema re-renders
      each held-out item from its own conditioning (same-pair, const
      noise); detector features vs those items' reals.
    * ``fid_tryon``: the BASELINE config-3 protocol shape — generate over a
      cross-pairs list (held-out person i wearing held-out garment i+1,
      test-mode preprocessing) and compare features against the held-out
      reals.

    Real-side stats are computed once at construction. This is the working
    version of the reference's snapshot-time metric hook
    (training_loop_fullbody.py:738-748 + metrics/metric_main.py:39-77),
    which it ships commented out.
    """

    def __init__(self, cfg: TrainConfig, dataset, detector_params,
                 num_items: int = 64, batch_size: int = 8,
                 metrics: Sequence[str] = ("fid",), tryon_mode="upper",
                 cache_dir: Optional[str] = None):
        from ..metrics.metric_main import DetectorRunner

        self.metrics = tuple(metrics)
        n = min(num_items, len(dataset))
        batch_size = min(batch_size, n)
        self.runner = DetectorRunner(detector_params, batch_size=batch_size)
        items = [dataset[i] for i in range(n)]
        self.batches = [
            batch_to_train_inputs(items[i:i + batch_size])
            for i in range(0, n - batch_size + 1, batch_size)
        ]  # full batches only: one compiled forward shape
        # Real-side detector stats are training-invariant: disk-cache them
        # keyed by the held-out item identity + detector, so large eval
        # pools (>=512 items) cost one extraction ever, not one per run
        # (reference metric_utils.py:180-228 cache semantics).
        self.real_stats = None
        cache_file = None
        if cache_dir is not None:
            from ..metrics.feature_stats import FeatureStats, cache_path

            cache_file = cache_path(
                cache_dir, "train-real-stats",
                root=str(getattr(dataset, "root", "")),
                names=list(getattr(dataset, "image_names", []))[:n],
                resolution=cfg.resolution, num_items=n,
                detector=self.runner.kind,
                detector_digest=_params_digest(detector_params))
            if os.path.exists(cache_file):
                self.real_stats = FeatureStats.load(cache_file)
        if self.real_stats is None:
            reals = np.concatenate([b["real_img"] for b in self.batches])
            self.real_stats = self.runner.array_stats(
                _to_uint8(reals), capture_all=True)
            if cache_file is not None:
                self.real_stats.save(cache_file)
        self.tryon_batches = None
        if any(m.endswith("tryon") for m in self.metrics):
            self.tryon_batches = self._build_tryon_batches(
                cfg, dataset, n, batch_size, tryon_mode)
        self._g, _, _ = make_models(cfg)
        self._fwd = None

    @staticmethod
    def _build_tryon_batches(cfg, dataset, n, batch_size, mode):
        """Cross-pair inputs (person i, garment of person i+1 mod n) over
        the held-out pool, test-mode preprocessing — the try-on protocol
        (reference test.py pairs-list semantics)."""
        from ..data import preprocess as pp
        from ..data.testsets import to_model_inputs
        from ..data.roots import as_root

        root = as_root(dataset.root)
        names = dataset.image_names[:n]
        people = [pp.load_person(root, name, with_garment_parsing=True)
                  for name in names]
        items = [pp.preprocess_pair(people[i], people[(i + 1) % len(people)],
                                    mode)
                 for i in range(len(people))]
        if cfg.resolution != 512:
            from ..data.trainsets import _resize_item

            items = [_resize_item(it, cfg.resolution) for it in items]
        return [
            {k: jnp.asarray(v) for k, v in
             to_model_inputs(items[i:i + batch_size])[0].items()}
            for i in range(0, len(items) - batch_size + 1, batch_size)
        ]

    def _forward(self):
        if self._fwd is None:
            g = self._g

            @jax.jit
            def fwd(params, buffers, batch):
                n = batch["real_img"].shape[0]
                _, finetune, _ = g.apply(
                    {"params": params, "buffers": buffers},
                    z=jnp.zeros((n, 0)), c=batch["style_input"],
                    retain=batch["retain"], pose=batch["pose"],
                    denorm_upper_input=batch["denorm_upper_input"],
                    denorm_lower_input=batch["denorm_lower_input"],
                    denorm_upper_mask=batch["denorm_upper_mask"],
                    denorm_lower_mask=batch["denorm_lower_mask"],
                    noise_mode="const")
                return finetune

            self._fwd = fwd
        return self._fwd

    def _tryon_forward(self):
        if getattr(self, "_tfwd", None) is None:
            g = self._g

            @jax.jit
            def tfwd(params, buffers, inputs):
                _, finetune, _ = g.apply(
                    {"params": params, "buffers": buffers},
                    noise_mode="const", **inputs)
                return finetune

            self._tfwd = tfwd
        return self._tfwd

    def _fid(self, gen_stats):
        from ..metrics.fid import compute_fid

        mu_r, sig_r = self.real_stats.get_mean_cov()
        mu_g, sig_g = gen_stats.get_mean_cov()
        return compute_fid(mu_r, sig_r, mu_g, sig_g)

    def __call__(self, state: TrainState) -> dict:
        fwd = self._forward()
        fakes = []
        for b in self.batches:
            jb = {k: jnp.asarray(v) for k, v in b.items()}
            fakes.append(np.asarray(jax.device_get(
                fwd(state.g_ema_params, state.g_ema_buffers, jb))))
        gen = self.runner.array_stats(
            _to_uint8(np.concatenate(fakes)), capture_all=True)
        tryon_gen = None
        if self.tryon_batches is not None:
            tfwd = self._tryon_forward()
            tfakes = [np.asarray(jax.device_get(
                tfwd(state.g_ema_params, state.g_ema_buffers, b)))
                for b in self.tryon_batches]
            tryon_gen = self.runner.array_stats(
                _to_uint8(np.concatenate(tfakes)), capture_all=True)
        out = {}
        for m in self.metrics:
            if m == "fid":
                out["fid_holdout"] = self._fid(gen)
            elif m == "kid":
                from ..metrics.kid import compute_kid

                out["kid_holdout"] = compute_kid(self.real_stats.get_all(),
                                                 gen.get_all())
            elif m == "fid_tryon":
                out["fid_tryon"] = self._fid(tryon_gen)
            else:
                raise ValueError(f"unsupported in-training metric: {m}")
        return out


def _to_uint8(images_pm1):
    return ((np.asarray(images_pm1, np.float32) + 1) * 127.5).clip(
        0, 255).astype(np.uint8)


def _params_digest(params):
    """Cheap deterministic digest of a param tree (cache key component)."""
    import hashlib

    h = hashlib.md5()
    for leaf in jax.tree_util.tree_leaves(params):
        a = np.asarray(leaf)
        h.update(str(a.shape).encode())
        h.update(str(a.dtype).encode())
        h.update(a.reshape(-1)[:4].tobytes())
    return h.hexdigest()


def training_loop(
    cfg: TrainConfig,
    dataset: TryonTrainDataset,
    run_dir: str,
    vgg_params=None,
    resume_path: Optional[str] = None,
    total_steps: Optional[int] = None,
    tick_interval: int = 50,
    snapshot_ticks: int = 10,
    num_workers: int = 8,
    seed: int = 0,
    progress_fn=None,
    abort_fn=None,
    eval_metrics: Sequence[str] = (),
    eval_ticks: int = 10,
    eval_items: Optional[int] = None,
    detector_params=None,
    tryon_grid_k: int = 0,
    metric_cache_dir: Optional[str] = None,
):
    # eval_items defaults from the TrainConfig sizing (cfg.metric_items) —
    # 64-item FID is a smoke trend, not a sized protocol.
    if eval_items is None:
        eval_items = getattr(cfg, "metric_items", 64)
    os.makedirs(run_dir, exist_ok=True)
    stdout_tee = Tee(sys.stdout, os.path.join(run_dir, "log.txt"))
    sys.stdout = stdout_tee
    try:
        return _training_loop_impl(
            cfg, dataset, run_dir, vgg_params, resume_path, total_steps,
            tick_interval, snapshot_ticks, num_workers, seed, progress_fn,
            abort_fn, eval_metrics, eval_ticks, eval_items, detector_params,
            metric_cache_dir,
            tryon_grid_k)
    finally:
        sys.stdout = stdout_tee._stream
        stdout_tee.close()


def _training_loop_impl(
    cfg, dataset, run_dir, vgg_params, resume_path, total_steps,
    tick_interval, snapshot_ticks, num_workers, seed, progress_fn, abort_fn,
    eval_metrics, eval_ticks, eval_items, detector_params, metric_cache_dir,
    tryon_grid_k,
):
    mesh = make_mesh(cfg.data_axis_size)
    state = init_state(cfg, jax.random.PRNGKey(seed))
    from ..summary import summarize_state

    summarize_state(state)  # startup accounting (misc.py:201-269 analogue)
    if resume_path is not None:
        if resume_path.endswith(".npz"):
            # multi-process snapshots (io/npz_ckpt; see _save_snapshot)
            state = load_npz_into(resume_path,
                                  jax.tree.map(np.asarray, state))
        else:
            state = load_checkpoint_variables(
                resume_path, jax.tree.map(np.asarray, state))
        state = TrainState(*state) if isinstance(state, (tuple, list)) else state
        # The reference speeds up ADA adaptation and disables the EMA rampup
        # on resume (train.py:340-342); orbax restores ada_p/step exactly, so
        # only the rampup disable applies.
        if cfg.ema_rampup is not None:
            import dataclasses as _dc

            cfg = _dc.replace(cfg, ema_rampup=None)
    state = replicate(state, mesh)

    if cfg.step_mode == "decomposed":
        from .decomposed import make_decomposed_steps as step_builder
    elif cfg.step_mode == "phases":
        step_builder = make_phase_steps
    else:
        step_builder = make_train_step
    train_step = step_builder(cfg, vgg_params=vgg_params, mesh=mesh)
    # Multi-process (jax.distributed): each process loads its rank-strided
    # 1/num_processes of the global batch; shard_batch assembles the global
    # array from the local shards. Process 0 owns all file output.
    n_proc, pid = jax.process_count(), jax.process_index()
    assert cfg.batch_size % max(n_proc, 1) == 0
    # The evaluator's items (dataset[0..holdout)) are excluded from the
    # training stream — a true held-out set (the round-2 evaluator trained
    # on its own eval items).
    holdout = min(eval_items, max(len(dataset) - cfg.batch_size, 0)) \
        if eval_metrics else 0
    loader = iter(ParallelLoader(
        dataset, cfg.batch_size // n_proc, num_workers, seed,
        rank=pid, num_replicas=n_proc, holdout=holdout))
    is_chief = pid == 0
    logger = JsonlLogger(run_dir)
    collector = Collector()
    tb_writer = _make_tb_writer(run_dir)
    evaluator = None
    if eval_metrics:
        assert detector_params is not None, (
            "in-training metrics need detector_params (inception weights)")
        evaluator = TrainingEvaluator(
            cfg, dataset, detector_params, num_items=holdout,
            metrics=eval_metrics, cache_dir=metric_cache_dir)

    if total_steps is None:
        total_steps = cfg.total_kimg * 1000 // cfg.batch_size

    key = jax.random.PRNGKey(seed + 1)
    start_step = int(jax.device_get(state.step))
    t_tick = time.time()
    images_at_tick = start_step * cfg.batch_size
    step_metrics = []  # device-side; fetched once per tick (no per-step sync)

    lean_loader = getattr(dataset, "loader_impl", "host") == "device"
    if lean_loader:
        assemble_lean = jax.jit(
            assemble_train_batch_lean,
            static_argnames=("tiled", "cut_windowed", "warp_impl"))
    else:
        assemble = jax.jit(assemble_train_batch)
    compiled_variants = set()
    for step in range(start_step, total_steps):
        if lean_loader:
            batch_np, tiled, windowed = next(loader)
            batch = assemble_lean(shard_batch(batch_np, mesh),
                                  tiled=tiled, cut_windowed=windowed)
        else:
            batch_np = next(loader)
            batch = assemble(shard_batch(batch_np, mesh))
        key, sub = jax.random.split(key)
        do_r1_d = cfg.r1_gamma != 0 and step % cfg.d_reg_interval == 0
        do_pl = cfg.pl_weight != 0 and step % cfg.g_reg_interval == 0
        variant = (do_r1_d, do_pl)
        if n_proc > 1 and variant not in compiled_variants:
            # First call of a step variant triggers its (minutes-long)
            # compile; the cross-process collective rendezvous inside the
            # step has a short timeout, so a process that compiled faster
            # would give up waiting for the laggard. Sync entry to
            # compile+execute through the coordination service (which
            # accepts a long explicit timeout).
            compiled_variants.add(variant)
            _dist_barrier(f"step-variant-{variant}")
        state, metrics = train_step(state, batch, sub, do_r1_d=do_r1_d,
                                    do_r1_dp=do_r1_d, do_pl=do_pl)
        step_metrics.append(metrics)

        if (step + 1) % tick_interval == 0 or step == total_steps - 1:
            for m in jax.device_get(step_metrics):
                collector.report({k: float(v) for k, v in m.items()})
            step_metrics.clear()
            cur_nimg = (step + 1) * cfg.batch_size
            dt = time.time() - t_tick
            sec_per_kimg = dt / max((cur_nimg - images_at_tick) / 1000, 1e-9)
            print(
                f"tick step {step + 1:<7d} kimg {cur_nimg / 1000:<10.1f} "
                f"sec/kimg {sec_per_kimg:<8.1f} "
                f"g_loss {collector.mean('g_loss'):.3f} "
                f"d_loss {collector.mean('d_loss'):.3f} "
                f"augment p {collector.mean('ada_p'):.3f}",
                flush=True)
            row = {"step": step + 1, "kimg": cur_nimg / 1000,
                   "sec_per_kimg": sec_per_kimg, **collector.as_dict()}

            tick_idx = (step + 1) // tick_interval
            if evaluator is not None and (
                    tick_idx % eval_ticks == 0 or step == total_steps - 1):
                results = evaluator(state)
                row.update(results)
                print("metrics " + " ".join(
                    f"{k} {v:.2f}" for k, v in results.items()), flush=True)
            logger.write(row)
            if tb_writer is not None:
                for name, val in row.items():
                    if isinstance(val, dict):
                        tb_writer.add_scalar(
                            f"Train/{name}", val["mean"], step + 1)
                    elif isinstance(val, (int, float)) and name != "step":
                        tb_writer.add_scalar(
                            f"Train/{name}", val, step + 1)
                tb_writer.flush()
            collector.reset()
            t_tick = time.time()
            images_at_tick = cur_nimg

            if (tick_idx % snapshot_ticks == 0 or step == total_steps - 1) \
                    and is_chief:
                # Multi-process: the replicated state checkpoints fine from
                # process 0; the sample grid is skipped (its vis batch is
                # sharded across processes).
                _save_snapshot(cfg, state, batch if n_proc == 1 else None,
                               run_dir, step + 1)
                # Multi-process: the tryon grid jits a chief-only forward
                # over the globally-replicated EMA params, which would hang
                # at the collective rendezvous — skip it (like the sample
                # grid above).
                if tryon_grid_k > 0 and n_proc == 1:
                    save_cross_pair_grid(
                        cfg, state, dataset.root, run_dir, step + 1,
                        k=tryon_grid_k, mode="thirds",
                        image_names=dataset.image_names[:tryon_grid_k])
            if progress_fn is not None:
                progress_fn(cur_nimg, cfg.total_kimg * 1000)
            if abort_fn is not None and abort_fn():
                break

    if n_proc > 1:
        # The chief's final snapshot (orbax save, grids) can exceed the
        # coordination service's fixed ~5-min SHUTDOWN barrier on a slow
        # host; sync here with the long-timeout barrier so every process
        # reaches interpreter exit together.
        _dist_barrier("end-of-run")
    return state


def _make_tb_writer(run_dir):
    """TensorBoard scalars, when available (training_loop_fullbody.py:422-427
    guarded-import semantics)."""
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(log_dir=run_dir)
    except Exception as e:  # pragma: no cover - depends on environment
        print(f"skipping tfevents export: {e}", flush=True)
        return None


def save_cross_pair_grid(cfg, state, dataset_root, run_dir, step, k=4,
                         mode="upper", image_names=None):
    """Cross-pair try-on grid: row person x col garment, generated by G_ema.

    The reference composes this with a host-side warp compositor
    (denorm_clothes + setup_snapshot_image_grid,
    training_loop_fullbody.py:77-309); here the standard test-mode
    preprocessing + serving path produce the same visualization.
    mode='thirds' reproduces the reference grid composition: the top third
    of rows swaps pants (lower), the middle third the whole outfit (full),
    the bottom third tops (upper).
    """
    from ..data import preprocess as pp
    from ..data.testsets import to_model_inputs
    from ..models import Generator

    g = Generator(
        z_dim=cfg.z_dim, c_dim=cfg.c_dim, w_dim=cfg.w_dim,
        img_resolution=cfg.resolution, img_channels=3,
        channel_base=cfg.channel_base, channel_max=cfg.channel_max,
        conv_clamp=cfg.conv_clamp, use_noise=cfg.use_noise,
        mapping_layers=cfg.mapping_layers)
    from ..data.roots import as_root

    dataset_root = as_root(dataset_root)
    if image_names is None:
        image_names = dataset_root.list("image")[:k]
    people = [pp.load_person(dataset_root, n, with_garment_parsing=True)
              for n in image_names]
    if mode == "thirds":
        third = max(len(people) // 3, 1)
        row_modes = ["lower" if i < third else
                     "full" if i < 2 * third else "upper"
                     for i in range(len(people))]
    else:
        row_modes = [mode] * len(people)
    items = []
    for row, row_mode in zip(people, row_modes):
        for col in people:
            items.append(pp.preprocess_pair(row, col, row_mode))
    if cfg.resolution != 512:
        from ..data.trainsets import _resize_item

        items = [_resize_item(it, cfg.resolution) for it in items]
    inputs, _ = to_model_inputs(items)
    inputs = {key: jnp.asarray(v) for key, v in inputs.items()}

    @jax.jit
    def fwd(params, buffers, inputs):
        _, finetune, _ = g.apply(
            {"params": params, "buffers": buffers}, noise_mode="const",
            **inputs)
        return finetune

    fakes = jax.device_get(
        fwd(state.g_ema_params, state.g_ema_buffers, inputs))

    def _src(p):
        img = p.image.astype(np.float32) / 127.5 - 1.0
        if img.shape[0] != cfg.resolution:
            import cv2

            img = cv2.resize(img, (cfg.resolution, cfg.resolution),
                             interpolation=cv2.INTER_AREA)
        return img

    sources = np.stack([_src(p) for p in people])
    # source-bordered layout (setup_snapshot_image_grid image_side /
    # image_top, training_loop_fullbody.py:214-340): left column = target
    # persons (rows), top row = garment sources (columns)
    save_image_grid(fakes, os.path.join(run_dir, f"tryon_grid{step:06d}.png"),
                    grid_cols=len(people), side_images=sources,
                    top_images=sources)


def _save_snapshot(cfg, state, batch, run_dir, step):
    """EMA-generator sample grid + full-state checkpoint."""
    from .state import make_models

    if batch is None:  # multi-process: checkpoint only
        # orbax's save runs sync_global_processes (a cross-process
        # allgather) internally — a chief-only call deadlocks until the
        # coordination shutdown timeout kills the job. Write the flat npz
        # snapshot instead; training resume restores it via
        # load_npz_into(path, state_template) (the keys are TrainState
        # attribute paths, not inference variables).
        path = os.path.join(run_dir, f"ckpt-{step:06d}.npz")
        save_npz_variables(path, jax.device_get(state))
        print(f"snapshot: {path}", flush=True)
        return
    g, _, _ = make_models(cfg)
    n_vis = min(8, batch["real_img"].shape[0])
    sub = {k: v[:n_vis] for k, v in batch.items()}

    @jax.jit
    def ema_forward(params, buffers, sub):
        img, finetune, parsing = g.apply(
            {"params": params, "buffers": buffers},
            z=jnp.zeros((n_vis, 0)), c=sub["style_input"],
            retain=sub["retain"], pose=sub["pose"],
            denorm_upper_input=sub["denorm_upper_input"],
            denorm_lower_input=sub["denorm_lower_input"],
            denorm_upper_mask=sub["denorm_upper_mask"],
            denorm_lower_mask=sub["denorm_lower_mask"],
            noise_mode="const")
        return finetune, jnp.argmax(parsing, axis=-1)

    fakes, parsing_idx = (jax.device_get(t) for t in ema_forward(
        state.g_ema_params, state.g_ema_buffers, sub))
    reals = jax.device_get(sub["real_img"])
    save_image_grid(
        np.concatenate([reals, fakes], axis=0),
        os.path.join(run_dir, f"fakes{step:06d}.png"), grid_cols=n_vis)
    # Predicted-parsing snapshot grids (training_loop_fullbody.py:709-719
    # fakes*_parsing.png): the reference's grayscale index/6 encoding, plus
    # a CIHP-colormapped twin (util_functions.py parsing2im semantics).
    from ..data.cihp import parsing2im

    gray = (parsing_idx.astype(np.float32) / 6.0 * 2.0 - 1.0)[..., None]
    save_image_grid(
        np.repeat(gray, 3, axis=-1),
        os.path.join(run_dir, f"fakes{step:06d}_parsing.png"),
        grid_cols=n_vis)
    color = np.stack([parsing2im(p) for p in parsing_idx])
    save_image_grid(
        color, os.path.join(run_dir, f"fakes{step:06d}_parsing_color.png"),
        drange=(0, 255), grid_cols=n_vis)
    ckpt_dir = os.path.join(run_dir, f"ckpt-{step:06d}")
    save_checkpoint_variables(ckpt_dir, jax.device_get(state))
    print(f"snapshot: fakes{step:06d}.png + {ckpt_dir}", flush=True)


def _dist_barrier(name, timeout_ms=60 * 60 * 1000):
    """Cross-process barrier via the jax.distributed coordination service.

    Unlike a device collective (whose gloo/ICI rendezvous has a short
    fixed timeout), the coordination-service barrier takes an explicit
    timeout — used to keep processes in lockstep across minutes-long
    per-variant step compiles (see the call site in the training loop)."""
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(re.sub(r"[^\w-]", "_", name), timeout_ms)
