"""Jitted SPMD training step (loss parity: training/loss_fullbody.py:117-330).

One compiled program executes the reference's phase sequence on a batch —
Gmain -> Dmain (-> Dr1) -> DPmain (-> DPr1) -> EMA -> ADA — with the module
update order preserved (G steps first; the D phases see the updated G, as in
the reference's sequential phase loop, training_loop_fullbody.py:603-639).
R1 phases are folded in on every d_reg_interval-th step with gain=interval
(lazy regularization), selected by a static flag: two compiled variants, no
in-graph branching.

Data parallelism: callers shard the batch over a 1-D 'data' mesh and keep
state replicated; jit inserts the gradient psums (SURVEY.md §2.3).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..losses.gan import g_nonsat_loss, d_logistic_loss
from ..losses.parsing import weighted_parsing_ce
from ..losses.vgg import vgg_loss
from .augment import augment_pipe, AugmentConfig
from .config import TrainConfig
from .state import TrainState, make_models, make_optimizers


def _run_g(g, g_params, g_buffers, batch, noise_key, update_w_avg=True):
    """Generator forward incl. w_avg update (loss_fullbody.py run_G)."""
    n = batch["real_img"].shape[0]
    variables = {"params": g_params, "buffers": g_buffers}
    (img, finetune, pred_parsing), mutated = g.apply(
        variables,
        rngs={"noise": noise_key},
        mutable=["buffers"],
        z=jnp.zeros((n, 0)),
        c=batch["style_input"],
        retain=batch["retain"],
        pose=batch["pose"],
        denorm_upper_input=batch["denorm_upper_input"],
        denorm_lower_input=batch["denorm_lower_input"],
        denorm_upper_mask=batch["denorm_upper_mask"],
        denorm_lower_mask=batch["denorm_lower_mask"],
        gt_parsing=batch["gt_parsing"],
        update_w_avg=update_w_avg,
    )
    return img, finetune, pred_parsing, mutated["buffers"]


def _style_code(g, g_params, g_buffers, batch):
    """real_c == gen_c == style-encoder code (loss_fullbody.py:127-129)."""
    code, _feats = g.apply(
        {"params": g_params, "buffers": g_buffers},
        batch["style_input"], batch["retain"],
        method=lambda m, c, r: m.style_encoding(c, r))
    return code


def _d_in(img, pose, ada_p, aug_key, cfg, augment=True):
    """ADA-augment the 3ch image, then concat pose rgb (run_D,
    loss_fullbody.py:100-106)."""
    if augment and cfg.use_ada:
        img = augment_pipe(img, ada_p, aug_key, AugmentConfig.bgc())
    return jnp.concatenate([img, pose[..., 0:3]], axis=-1)


def _gt_parsing_onehot(gt_parsing):
    """7-channel one-hot of the gt parsing map (loss_fullbody.py:300-308)."""
    idx = gt_parsing[..., 0].astype(jnp.int32)
    return jax.nn.one_hot(idx, 7, dtype=jnp.float32)


def make_train_step(cfg: TrainConfig, vgg_params=None):
    """Returns step(state, batch, key, do_r1_d, do_r1_dp) -> (state, metrics).

    do_r1_* are static; jit compiles (at most) 4 variants.
    """
    g, d, dp = make_models(cfg)
    _opt_cache = {}

    def _get_opts(d_params):
        if "opts" not in _opt_cache:
            _opt_cache["opts"] = make_optimizers(cfg, d_params)
        return _opt_cache["opts"]

    def g_loss_fn(g_params, state: TrainState, batch, keys):
        img, finetune, pred_parsing, new_buffers = _run_g(
            g, g_params, state.g_buffers, batch, keys["noise"])
        gen_c = _style_code(g, g_params, state.g_buffers, batch)

        d_in = _d_in(img, batch["pose"], state.ada_p, keys["aug1"], cfg)
        d_in_ft = _d_in(finetune, batch["pose"], state.ada_p, keys["aug2"], cfg)
        gen_logits = d.apply({"params": state.d_params}, d_in, gen_c)
        ft_logits = d.apply({"params": state.d_params}, d_in_ft, gen_c)

        parsing_soft = jax.nn.softmax(pred_parsing, axis=-1)
        dp_in = jnp.concatenate([parsing_soft, batch["pose"][..., 0:3]], axis=-1)
        parsing_logits = dp.apply({"params": state.dp_params}, dp_in, gen_c)

        loss_gmain = g_nonsat_loss(gen_logits)
        loss_gmain_ft = g_nonsat_loss(ft_logits)
        loss_g_parsing = g_nonsat_loss(parsing_logits)

        loss_l1 = loss_l1_ft = 0.0
        if cfg.l1_weight > 0:
            loss_l1 = jnp.mean(jnp.abs(img - batch["real_img"])) * cfg.l1_weight
            loss_l1_ft = jnp.mean(
                jnp.abs(finetune - batch["real_img"])) * cfg.l1_weight

        loss_mask = 0.0
        if cfg.mask_weight > 0:
            loss_mask = weighted_parsing_ce(
                pred_parsing, batch["gt_parsing"][..., 0].astype(jnp.int32)
            ) * cfg.mask_weight

        loss_vgg = loss_vgg_ft = 0.0
        if cfg.vgg_weight > 0 and vgg_params is not None:
            loss_vgg = vgg_loss(vgg_params, img, batch["real_img"]) * cfg.vgg_weight
            loss_vgg_ft = vgg_loss(
                vgg_params, finetune, batch["real_img"]) * cfg.vgg_weight

        loss_ctx = 0.0
        if cfg.contextual_weight > 0 and vgg_params is not None:
            from ..losses.contextual import contextual_loss

            loss_ctx = contextual_loss(
                vgg_params, finetune, batch["real_img"]) * cfg.contextual_weight

        loss = (
            (loss_gmain + loss_gmain_ft) / 2
            + (loss_l1 + loss_l1_ft) / 2
            + (loss_vgg + loss_vgg_ft) / 2
            + loss_mask
            + loss_g_parsing
            + loss_ctx
        )
        metrics = dict(
            g_loss=loss_gmain, g_loss_finetune=loss_gmain_ft,
            g_parsing=loss_g_parsing, g_l1=loss_l1 + loss_l1_ft,
            g_vgg=loss_vgg + loss_vgg_ft, g_mask=loss_mask,
            fake_scores=jnp.mean(gen_logits))
        return loss, (new_buffers, metrics)

    def d_loss_fn(d_params, g_params, g_buffers, state, batch, keys, do_r1):
        gen_c = _style_code(g, g_params, g_buffers, batch)
        img, finetune, _, _ = _run_g(
            g, g_params, g_buffers, batch, keys["noise"], update_w_avg=False)
        img = jax.lax.stop_gradient(img)
        finetune = jax.lax.stop_gradient(finetune)

        d_in = _d_in(img, batch["pose"], state.ada_p, keys["aug1"], cfg)
        d_in_ft = _d_in(finetune, batch["pose"], state.ada_p, keys["aug2"], cfg)
        gen_logits = d.apply({"params": d_params}, d_in, gen_c)
        ft_logits = d.apply({"params": d_params}, d_in_ft, gen_c)
        loss_fake = (d_logistic_loss(fake_logits=gen_logits)
                     + d_logistic_loss(fake_logits=ft_logits)) / 2

        def real_logits_of(real_img):
            real_in = _d_in(real_img, batch["pose"], state.ada_p,
                            keys["aug3"], cfg)
            return d.apply({"params": d_params}, real_in, gen_c)

        real_logits = real_logits_of(batch["real_img"])
        loss_real = d_logistic_loss(real_logits=real_logits)

        loss = loss_fake + loss_real
        r1 = 0.0
        if do_r1:
            grads = jax.grad(
                lambda x: jnp.sum(real_logits_of(x)))(batch["real_img"])
            r1 = jnp.mean(jnp.sum(jnp.square(grads), axis=(1, 2, 3)))
            # lazy reg: applied every interval steps with gain=interval
            loss = loss + r1 * (cfg.r1_gamma / 2) * cfg.d_reg_interval
        metrics = dict(
            d_loss=loss_fake + loss_real,
            real_scores=jnp.mean(real_logits),
            real_signs=jnp.mean(jnp.sign(real_logits)),
            r1_penalty=r1)
        return loss, metrics

    def dp_loss_fn(dp_params, g_params, g_buffers, state, batch, keys, do_r1):
        gen_c = _style_code(g, g_params, g_buffers, batch)
        _, _, pred_parsing, _ = _run_g(
            g, g_params, g_buffers, batch, keys["noise"], update_w_avg=False)
        parsing_soft = jax.lax.stop_gradient(
            jax.nn.softmax(pred_parsing, axis=-1))
        pose_rgb = batch["pose"][..., 0:3]
        fake_in = jnp.concatenate([parsing_soft, pose_rgb], axis=-1)
        fake_logits = dp.apply({"params": dp_params}, fake_in, gen_c)
        loss_fake = d_logistic_loss(fake_logits=fake_logits)

        gt_onehot = _gt_parsing_onehot(batch["gt_parsing"])

        def real_logits_of(gt_oh):
            real_in = jnp.concatenate([gt_oh, pose_rgb], axis=-1)
            return dp.apply({"params": dp_params}, real_in, gen_c)

        real_logits = real_logits_of(gt_onehot)
        loss_real = d_logistic_loss(real_logits=real_logits)
        loss = loss_fake + loss_real
        r1 = 0.0
        if do_r1:
            grads = jax.grad(lambda x: jnp.sum(real_logits_of(x)))(gt_onehot)
            r1 = jnp.mean(jnp.sum(jnp.square(grads), axis=(1, 2, 3)))
            loss = loss + r1 * (cfg.r1_gamma / 2) * cfg.d_reg_interval
        metrics = dict(dp_loss=loss_fake + loss_real, dp_r1_penalty=r1)
        return loss, metrics

    @functools.partial(jax.jit, static_argnames=("do_r1_d", "do_r1_dp"))
    def train_step(state: TrainState, batch, key, do_r1_d: bool = False,
                   do_r1_dp: bool = False):
        g_opt_tx, d_opt_tx, dp_opt_tx = _get_opts(state.d_params)
        ks = jax.random.split(key, 12)
        keys_g = dict(noise=ks[0], aug1=ks[1], aug2=ks[2])
        keys_d = dict(noise=ks[3], aug1=ks[4], aug2=ks[5], aug3=ks[6])
        keys_dp = dict(noise=ks[7])

        # NOTE on style mixing: the reference gates it by style_mixing_prob
        # (loss_fullbody.py:87-91) but ships prob=0 AND z_dim=0 — with no z
        # input the mixed mapping output is identical to the original, so
        # mixing is a structural no-op for this model family; intentionally
        # not implemented.

        # --- G phase ---
        (g_loss, (new_g_buffers, g_metrics)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params, state, batch, keys_g)
        if cfg.sanitize_grads:
            g_grads = jax.tree.map(
                lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5),
                g_grads)
        g_updates, g_opt = g_opt_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        state = state.replace(
            g_params=g_params, g_buffers=new_g_buffers, g_opt=g_opt)

        # --- D phase (sees updated G, like the reference phase order) ---
        (d_loss, d_metrics), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(
                state.d_params, state.g_params, state.g_buffers, state, batch,
                keys_d, do_r1_d)
        if cfg.sanitize_grads:
            d_grads = jax.tree.map(
                lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5),
                d_grads)
        d_updates, d_opt = d_opt_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)
        state = state.replace(d_params=d_params, d_opt=d_opt)

        # --- parsing-D phase(s) ---
        n_dp = 2 if cfg.double_d_parsing else 1
        dp_metrics = {}
        for _ in range(n_dp):
            (dp_loss, dp_metrics), dp_grads = jax.value_and_grad(
                dp_loss_fn, has_aux=True)(
                    state.dp_params, state.g_params, state.g_buffers, state,
                    batch, keys_dp, do_r1_dp)
            dp_updates, dp_opt = dp_opt_tx.update(
                dp_grads, state.dp_opt, state.dp_params)
            dp_params = optax.apply_updates(state.dp_params, dp_updates)
            state = state.replace(dp_params=dp_params, dp_opt=dp_opt)

        # --- EMA (training_loop_fullbody.py:641-650) ---
        ema_nimg = cfg.ema_kimg * 1000
        if cfg.ema_rampup is not None:
            ema_nimg = jnp.minimum(
                ema_nimg, state.cur_nimg.astype(jnp.float32) * cfg.ema_rampup)
        ema_beta = 0.5 ** (cfg.batch_size / jnp.maximum(ema_nimg, 1e-8))
        lerp = lambda a, b: b + (a - b) * ema_beta  # a=ema, b=new
        g_ema_params = jax.tree.map(lerp, state.g_ema_params, state.g_params)
        g_ema_buffers = jax.tree.map(
            lambda a, b: b, state.g_ema_buffers, state.g_buffers)

        # --- ADA controller (training_loop_fullbody.py:656-660; applied
        # per-step at 1/interval rate — same expected drift) ---
        ada_p = state.ada_p
        if cfg.use_ada:
            adjust = jnp.sign(d_metrics["real_signs"] - cfg.ada_target) * \
                cfg.batch_size / (cfg.ada_kimg * 1000)
            ada_p = jnp.clip(ada_p + adjust, 0.0, 1.0)

        state = state.replace(
            step=state.step + 1,
            cur_nimg=state.cur_nimg + cfg.batch_size,
            g_ema_params=g_ema_params,
            g_ema_buffers=g_ema_buffers,
            ada_p=ada_p,
        )
        metrics = dict(ada_p=ada_p, **g_metrics, **d_metrics, **dp_metrics)
        return state, metrics

    return train_step
