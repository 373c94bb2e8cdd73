"""Training state pytree + model/optimizer construction."""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models import Generator, Discriminator
from .config import TrainConfig


@struct.dataclass
class TrainState:
    step: jnp.ndarray               # int32 scalar
    cur_nimg: jnp.ndarray           # int32 scalar
    g_params: Any
    g_buffers: Any
    d_params: Any
    dp_params: Any
    g_ema_params: Any
    g_ema_buffers: Any
    g_opt: Any
    d_opt: Any
    dp_opt: Any
    ada_p: jnp.ndarray              # float32 scalar
    pl_mean: jnp.ndarray = None     # float32 scalar (path-length EMA)


def make_models(cfg: TrainConfig):
    g = Generator(
        z_dim=cfg.z_dim, c_dim=cfg.c_dim, w_dim=cfg.w_dim,
        img_resolution=cfg.resolution, img_channels=3,
        channel_base=cfg.channel_base, channel_max=cfg.channel_max,
        conv_clamp=cfg.conv_clamp, use_noise=cfg.use_noise,
        mapping_layers=cfg.mapping_layers,
        num_bf16_res=cfg.g_num_bf16_res, remat=cfg.remat,
        remat_min_res=cfg.remat_min_res,
        spade_inner_remat=cfg.spade_inner_remat)
    # image D: 3 (image) + 3 (pose rgb); parsing D: 7 + 3
    # (training_loop_fullbody.py:405-410)
    d = Discriminator(
        c_dim=cfg.c_dim, img_resolution=cfg.resolution, img_channels=3 + 3,
        channel_base=cfg.channel_base, channel_max=cfg.channel_max,
        conv_clamp=cfg.conv_clamp, mbstd_group_size=cfg.mbstd_group_size,
        num_bf16_res=cfg.d_num_bf16_res)
    dp = Discriminator(
        c_dim=cfg.c_dim, img_resolution=cfg.resolution, img_channels=7 + 3,
        channel_base=cfg.channel_base, channel_max=cfg.channel_max,
        conv_clamp=cfg.conv_clamp, mbstd_group_size=cfg.mbstd_group_size,
        num_bf16_res=cfg.d_num_bf16_res)
    return g, d, dp


def _freeze_d_mask(cfg: TrainConfig, d_params):
    """Trainability mask for freeze-D: first `freeze_d_layers` layers of the
    image D (layer order = fromrgb, conv0, conv1, skip from the top
    resolution down — reference first_layer_idx accounting,
    networks.py:471-479)."""
    import math as _math

    res_log2 = int(_math.log2(cfg.resolution))
    layer_idx = {}
    idx = 0
    for res in [2 ** i for i in range(res_log2, 2, -1)]:
        block = f"b{res}"
        names = (["fromrgb"] if res == cfg.resolution else []) + \
            ["conv0", "conv1", "skip"]
        for name in names:
            layer_idx[(block, name)] = idx
            idx += 1

    def mask_fn(path, leaf):
        keys = tuple(str(getattr(k, "key", k)) for k in path)
        if len(keys) >= 2 and (keys[0], keys[1]) in layer_idx:
            return layer_idx[(keys[0], keys[1])] >= cfg.freeze_d_layers
        return True

    import jax as _jax

    return _jax.tree_util.tree_map_with_path(mask_fn, d_params)


def make_optimizers(cfg: TrainConfig, d_params=None):
    """One Adam per module, lazy-reg scaled where the module has a reg phase
    (training_loop_fullbody.py:466-487); optional freeze-D masking."""
    g_h = cfg.lazy_reg_scale(cfg.g_reg_interval) if cfg.pl_weight != 0 else \
        dict(lr=cfg.lr, b1=cfg.adam_beta1, b2=cfg.adam_beta2)
    d_h = cfg.lazy_reg_scale(cfg.d_reg_interval) if cfg.r1_gamma != 0 else \
        dict(lr=cfg.lr, b1=cfg.adam_beta1, b2=cfg.adam_beta2)
    mk = lambda h: optax.adam(h["lr"], b1=h["b1"], b2=h["b2"], eps=cfg.adam_eps)
    d_tx = mk(d_h)
    if cfg.freeze_d_layers > 0 and d_params is not None:
        # NB: optax.masked passes masked-out updates through UNCHANGED —
        # freezing needs the update explicitly zeroed.
        labels = jax.tree.map(
            lambda train: "train" if train else "freeze",
            _freeze_d_mask(cfg, d_params))
        d_tx = optax.multi_transform(
            {"train": d_tx, "freeze": optax.set_to_zero()}, labels)
    return mk(g_h), d_tx, mk(d_h)


def example_batch(cfg: TrainConfig, rng: np.random.RandomState):
    """Random batch with the training-input schema (shapes/dtypes only)."""
    n, res = cfg.batch_size, cfg.resolution
    f32 = lambda *s: rng.rand(*s).astype(np.float32) * 2 - 1
    return dict(
        real_img=f32(n, res, res, 3),
        pose=f32(n, res, res, 5),
        style_input=f32(n, res // 4, res // 4, 45),
        retain=f32(n, res, res, 6),
        denorm_upper_input=f32(n, res, res, 3),
        denorm_lower_input=f32(n, res, res, 3),
        denorm_upper_mask=(rng.rand(n, res, res, 1) > 0.5).astype(np.float32),
        denorm_lower_mask=(rng.rand(n, res, res, 1) > 0.5).astype(np.float32),
        gt_parsing=rng.randint(0, 7, (n, res, res, 1)).astype(np.float32),
    )


def init_state(cfg: TrainConfig, key) -> TrainState:
    g, d, dp = make_models(cfg)
    rng = np.random.RandomState(0)
    batch = example_batch(cfg, rng)
    n = cfg.batch_size
    k_g, k_d, k_dp, k_noise = jax.random.split(key, 4)

    def _init():
        g_vars = g.init(
            {"params": k_g, "noise": k_noise},
            z=jnp.zeros((n, 0)), c=jnp.asarray(batch["style_input"]),
            retain=jnp.asarray(batch["retain"]), pose=jnp.asarray(batch["pose"]),
            denorm_upper_input=jnp.asarray(batch["denorm_upper_input"]),
            denorm_lower_input=jnp.asarray(batch["denorm_lower_input"]),
            denorm_upper_mask=jnp.asarray(batch["denorm_upper_mask"]),
            denorm_lower_mask=jnp.asarray(batch["denorm_lower_mask"]),
            gt_parsing=jnp.asarray(batch["gt_parsing"]))
        d_vars = d.init(
            k_d, jnp.zeros((n, cfg.resolution, cfg.resolution, 6)),
            jnp.zeros((n, cfg.c_dim)))
        dp_vars = dp.init(
            k_dp, jnp.zeros((n, cfg.resolution, cfg.resolution, 10)),
            jnp.zeros((n, cfg.c_dim)))
        return g_vars, d_vars, dp_vars

    g_vars, d_vars, dp_vars = jax.jit(_init)()
    g_opt_tx, d_opt_tx, dp_opt_tx = make_optimizers(cfg, d_vars["params"])
    g_params = g_vars["params"]
    g_buffers = g_vars.get("buffers", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        cur_nimg=jnp.zeros((), jnp.int32),
        g_params=g_params,
        g_buffers=g_buffers,
        d_params=d_vars["params"],
        dp_params=dp_vars["params"],
        g_ema_params=jax.tree.map(jnp.copy, g_params),
        g_ema_buffers=jax.tree.map(jnp.copy, g_buffers),
        g_opt=g_opt_tx.init(g_params),
        d_opt=d_opt_tx.init(d_vars["params"]),
        dp_opt=dp_opt_tx.init(dp_vars["params"]),
        ada_p=jnp.asarray(cfg.augment_p_init, jnp.float32),
        pl_mean=jnp.zeros((), jnp.float32),
    )
