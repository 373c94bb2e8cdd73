"""Training configuration (reference cfg presets, train.py:160-260).

The shipped `fashion` preset: 512px, total batch 32 over 8 devices,
lr 5e-4, Adam(0, 0.99), R1 gamma 10, mbstd 4, fmaps 1.0, EMA 10 kimg,
1 mapping layer, ADA 'bgc' targeting 0.6; loss weights from train.sh:
l1 10, vgg 20, mask 30.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # model
    resolution: int = 512
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: float = 256.0
    mapping_layers: int = 1
    use_noise: bool = True
    z_dim: int = 0
    c_dim: int = 512
    w_dim: int = 512

    # optimization
    batch_size: int = 32
    data_axis_size: int = 8
    # Microbatch gradient accumulation (reference batch_gpu / no_sync rounds,
    # training_loop_fullbody.py:616-629): the per-step batch is split into
    # grad_accum microbatches scanned before each optimizer update. Gradients
    # are MEANED over microbatches (the mathematical full-batch gradient; the
    # reference sums round losses, a scale Adam mostly absorbs).
    grad_accum: int = 1
    # Step compilation granularity: 'monolithic' (one program, fastest),
    # 'phases' (one per G/D/DP phase), 'decomposed' (VJP-chained
    # single-model programs — required when the toolchain compiler can't
    # handle G-backward+D graphs in one program, as on the tunneled v5e).
    step_mode: str = "monolithic"

    # Chunk the generator backward into per-chunk VJPs summed in a scan
    # (decomposed mode only; 0 = whole batch). Exact — G has no cross-batch
    # coupling — and keeps each compiled backward at chunk size, for
    # toolchains whose compiler cannot handle the full-batch 512px backward.
    bwd_chunk: int = 0
    # Compute lazy R1 on batch//r1_batch_shrink samples (memory headroom on
    # a single chip; unbiased estimator of the same penalty — analogous to
    # the reference's pl_batch_shrink for its path-length reg).
    r1_batch_shrink: int = 1
    # When True (default — reference parity), every D/parsing-D phase
    # consumes a fresh no-grad generator draw with its own noise key (the
    # reference's per-phase run_G, loss_fullbody.py:227-231/278-283). When
    # False, one shared no-grad G forward from the post-update G feeds the
    # D and parsing-D phases (monolithic and decomposed modes) — saving 1-2
    # full 512px G forwards per step; with use_noise=True those phases then
    # see one common noise draw instead of independent ones (same
    # distribution). Like reuse_g_fakes, the optimization is opt-in and the
    # faithful semantics are the default.
    strict_phase_noise: bool = True
    # When True (requires strict_phase_noise=False, grad_accum=1), the D and
    # parsing-D phases consume the SAME stop-gradiented fakes Gmain already
    # computed, eliminating the shared no-grad forward entirely (measured
    # 113 ms of a 1355 ms b8 step). Semantics deviation vs the reference:
    # D then sees fakes from the PRE-update G with Gmain's noise draw — the
    # classic GAN regime (one fake batch per step) rather than StyleGAN2's
    # per-phase regeneration; off by default for strict parity. In the
    # monolithic step the reuse only applies to non-R1 program variants
    # (the fakes otherwise outlive Gmain's backward: +379MB at b8, OOM).
    reuse_g_fakes: bool = False

    @property
    def split_phases(self):  # backward compat
        return self.step_mode != "monolithic"
    mbstd_group_size: int = 4
    lr: float = 5e-4
    adam_beta1: float = 0.0
    adam_beta2: float = 0.99
    adam_eps: float = 1e-8
    total_kimg: int = 10000

    # objectives
    r1_gamma: float = 10.0
    l1_weight: float = 10.0
    vgg_weight: float = 20.0
    mask_weight: float = 30.0
    pl_weight: float = 0.0          # path-length reg is disabled in the
                                    # reference fashion config (train.sh)
    # Gpl hyperparameters (loss_fullbody.py:203-221, StyleGAN2 defaults):
    # the reg runs on batch//pl_batch_shrink samples every g_reg_interval
    # steps; pl_mean is an EMA of path lengths with this decay.
    pl_batch_shrink: int = 2
    pl_decay: float = 0.01
    contextual_weight: float = 0.0
    sanitize_grads: bool = True     # nan_to_num on grads
                                    # (training_loop_fullbody.py:634-636)
    style_mixing_prob: float = 0.0
    # Lazy-regularization cadence. In ALL step modes the R1 penalty runs as
    # its own backward + its own optimizer update after the Dmain update
    # (the reference's Dreg phase registry, training_loop_fullbody.py:
    # 462-481). NOTE (round 5): phase mode folded R1 into the Dmain update
    # through round 3; round 4 harmonized it with the other modes — resumed
    # phase-mode runs will see shifted r1_penalty statistics (a
    # r1_batch_shrink-prefix estimate and two Adam updates instead of one).
    d_reg_interval: int = 16
    g_reg_interval: int = 4
    # The reference registers the parsing-D phases twice (a bug — see
    # SURVEY.md §7 known bugs; training_loop_fullbody.py:468-470), training
    # it with two optimizers per step. Off by default; on for exact parity.
    double_d_parsing: bool = False
    # Freeze-D (reference DiscriminatorBlock freeze_layers,
    # networks.py:473-479 + train.py freezed): freeze the first N conv
    # layers of the image D (counting fromrgb/conv0/conv1/skip from the
    # highest resolution down, like first_layer_idx).
    freeze_d_layers: int = 0

    # EMA
    ema_kimg: float = 10.0
    ema_rampup: Optional[float] = None

    # In-training metric evaluation sizing: held-out pool for the FID/KID
    # evaluator (training_loop's default when the CLI doesn't override).
    # 512 items makes the in-training FID a sized protocol instead of a
    # smoke trend; the held-out real detector stats are disk-cached
    # (TrainingEvaluator cache_dir) so the pool costs one extraction ever.
    metric_items: int = 512

    # ADA
    ada_target: float = 0.6
    ada_interval: int = 4
    ada_kimg: float = 500.0
    augment_p_init: float = 0.0
    use_ada: bool = True
    # Geometric-warp implementation for ADA ('auto' | 'twopass' | 'gather');
    # 'auto' = the TPU-native two-pass warp on TPU, gather elsewhere.
    ada_impl: str = "auto"

    # Training data loader ('host' | 'device'): 'device' keeps only decode
    # + scalar geometry on host and runs the per-sample warps/rasters in a
    # device program (data/trainsets.py assemble_train_batch_lean) — ~3x
    # the host loader throughput per core at 512px.
    loader_impl: str = "host"

    # Mixed precision. The reference ships fp16 for the D's top-3
    # resolutions with conv_clamp=256 (train.py:196-197) — bf16 here, same
    # default. The reference forces G synthesis fp32 (networks.py:2294);
    # g_num_bf16_res>0 additionally runs the top-N G blocks (style +
    # texture + SPADE) in bf16 compute with fp32 params — the main 512px
    # training-throughput lever on TPU (off by default for reference
    # numerics parity).
    d_num_bf16_res: int = 3
    g_num_bf16_res: int = 0
    # Run the VGG19 perceptual-loss feature extractor in bf16 (fp32
    # accumulation in the per-slice reductions). The perceptual distance is
    # insensitive to feature precision, and the VGG fwd+bwd is a large
    # share of Gmain's FLOPs at 512px.
    vgg_bf16: bool = True
    # Donate the input state to the step program (halves peak param/opt
    # memory; the caller must not reuse the passed-in state object — the
    # training loop rebinds it every step). Smoke/test configs disable it
    # so tests can replay different step modes from one initial state.
    donate: bool = True
    # Rematerialize each synthesis block in the backward pass
    # (jax.checkpoint per block): cuts peak activation memory ~proportionally
    # to block count for ~1/3 more forward FLOPs. Required to fit the
    # monolithic 512px step in one v5e chip's 16G HBM.
    remat: bool = True
    # Remat only G blocks at resolution >= this (remat=True). The small-res
    # blocks (8..64) hold ~0.5 GB of activations at batch 8 but real FLOPs
    # (512 channels); storing them skips their backward recompute.
    remat_min_res: int = 0
    # Remat each SPADE normalization inside the SPADE resblocks. Required
    # headroom for batch 16; pure recompute overhead when the step already
    # fits (9 extra 256px convs per resblock backward). None = follow remat.
    spade_inner_remat: Optional[bool] = None
    # Remat the discriminator forwards inside the loss (one extra D forward
    # per backward; ~2.7 GB of D activations live otherwise at batch 8
    # across the step's ~9 D applications). None = follow remat.
    d_remat: Optional[bool] = None
    # Remat the VGG loss forward (one extra VGG19 pyramid recompute per
    # backward; storing the fake-stream pyramids costs ~1 GB at batch 8
    # bf16). None = follow remat.
    vgg_remat: Optional[bool] = None

    @property
    def batch_per_device(self):
        assert self.batch_size % self.data_axis_size == 0
        return self.batch_size // self.data_axis_size

    def lazy_reg_scale(self, interval):
        """Lazy-regularization hyperparameter scaling
        (training_loop_fullbody.py:474-481)."""
        mb_ratio = interval / (interval + 1)
        return dict(
            lr=self.lr * mb_ratio,
            b1=self.adam_beta1 ** mb_ratio,
            b2=self.adam_beta2 ** mb_ratio,
        )


def fashion_config(**overrides) -> TrainConfig:
    return TrainConfig(**overrides)


def smoke_config(n_devices=8, **overrides) -> TrainConfig:
    """Tiny config for CPU-mesh smoke tests and the driver dry run."""
    defaults = dict(
        resolution=64,
        channel_base=2048,
        channel_max=128,
        batch_size=n_devices * 2,
        data_axis_size=n_devices,
        mbstd_group_size=2,
        vgg_weight=0.0,
        total_kimg=1,
        d_num_bf16_res=0,   # fp32 smoke numerics on CPU meshes
        donate=False,       # CPU tests replay multiple modes from one state
    )
    defaults.update(overrides)
    return TrainConfig(**defaults)
