"""Decomposed training step: VJP chaining across single-model-sized jits.

The tunneled TPU toolchain's compile helper crashes on programs that combine
the 512px generator backward with the discriminator graphs (each compiles
fine alone — see round-1 isolation). This module splits every phase along
model boundaries and chains gradients manually:

  G phase:
    1. g_fwd        — G forward (+w_avg buffers, style code) [G-sized]
    2. g_cotangents — all G-loss terms (D/DP forwards + L1/CE/VGG) and their
                      gradients w.r.t. the G OUTPUTS (img, finetune,
                      parsing, style code) [D-sized]
    3. g_bwd_update — vjp of the G forward with those cotangents + Adam
                      [G-sized; rematerializes the forward]
  D / DP phases: consume stop-gradient G outputs -> each program holds only
    one discriminator (R1 included — grad-of-grad of D alone compiles).
  post: EMA + ADA controller.

Numerics match make_train_step exactly with use_noise=False (chain rule is
associative); equivalence is covered by tests. With use_noise=True the
default (cfg.strict_phase_noise=True) matches the monolithic/reference
per-phase generator draws exactly (fresh draw per D / parsing-D phase,
keys ks[3]/ks[7+i] — reference loss_fullbody.py:227-231/278-283). Setting
cfg.strict_phase_noise=False is the opt-in optimization: the parsing-D
phase reuses the D phase's draw (one shared no-grad G forward per step,
same distribution, one fewer 512px G forward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from .config import TrainConfig
from .loss_terms import build_loss_cores
from .state import TrainState, make_models, make_optimizers


def make_decomposed_steps(cfg: TrainConfig, vgg_params=None, mesh=None):
    assert cfg.freeze_d_layers == 0 and cfg.grad_accum == 1, (
        "freeze-D / grad accumulation live in the monolithic step")
    assert cfg.pl_weight == 0, (
        "path-length regularization is only implemented in the monolithic "
        "make_train_step (the reference ships it disabled)")
    g, d, dp = make_models(cfg)
    g_opt_tx, d_opt_tx, dp_opt_tx = make_optimizers(cfg)
    sanitize = (lambda t: jax.tree.map(
        lambda x: jnp.nan_to_num(x, nan=0.0, posinf=1e5, neginf=-1e5), t)
    ) if cfg.sanitize_grads else (lambda t: t)
    # ONE loss definition across step modes (loss_terms.build_loss_cores);
    # module applies stay un-checkpointed — every decomposed program is
    # single-model-sized by construction.
    cores = build_loss_cores(cfg, d, dp, vgg_params, mesh=mesh)

    def _g_outputs(g_params, g_buffers, batch, noise_key):
        """G forward returning (img, finetune, parsing, style_code),
        new_buffers."""
        n = batch["real_img"].shape[0]
        # return_code=True: the style code comes from the same fused forward
        # (one style-encoder pass; structurally identical to the monolithic
        # step's _run_g so the two variants match bit-for-bit in tests).
        (img, ft, parsing, code), mut = g.apply(
            {"params": g_params, "buffers": g_buffers},
            rngs={"noise": noise_key}, mutable=["buffers"],
            z=jnp.zeros((n, 0)), c=batch["style_input"],
            retain=batch["retain"], pose=batch["pose"],
            denorm_upper_input=batch["denorm_upper_input"],
            denorm_lower_input=batch["denorm_lower_input"],
            denorm_upper_mask=batch["denorm_upper_mask"],
            denorm_lower_mask=batch["denorm_lower_mask"],
            gt_parsing=batch["gt_parsing"], update_w_avg=True,
            return_code=True)
        return (img, ft, parsing, code), mut["buffers"]

    def _chunk_layout(n):
        chunk = cfg.bwd_chunk
        if chunk and chunk < n:
            return n // chunk, chunk
        return None, n

    @jax.jit
    def g_fwd(g_params, g_buffers, batch, noise_key):
        n = batch["real_img"].shape[0]
        n_chunks, chunk = _chunk_layout(n)
        if n_chunks is None:
            return _g_outputs(g_params, g_buffers, batch, noise_key)
        # Chunked forward with per-chunk folded noise keys — must mirror the
        # chunked backward exactly so the rematerialized noise matches.
        batch_s = jax.tree.map(
            lambda x: x.reshape((n_chunks, chunk) + x.shape[1:]), batch)

        def body(bufs, xs):
            b_c, i = xs
            outputs, new_bufs = _g_outputs(
                g_params, bufs, b_c, jax.random.fold_in(noise_key, i))
            return new_bufs, outputs

        bufs, outs = jax.lax.scan(
            body, g_buffers, (batch_s, jnp.arange(n_chunks)))
        outputs = jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:]), outs)
        return outputs, bufs

    @jax.jit
    def g_cotangents(outputs, d_params, dp_params, ada_p, batch, keys):
        (loss, metrics), cots = jax.value_and_grad(
            cores["g"], has_aux=True)(
                outputs, d_params, dp_params, ada_p, batch, keys)
        return cots, metrics

    donate = (0,) if cfg.donate else ()

    @functools.partial(jax.jit, donate_argnums=donate)
    def g_bwd_update(state: TrainState, batch, noise_key, cotangents):
        def chunk_vjp_keyed(g_params, batch_c, cots_c, key_c):
            def fwd_only(p):
                outputs, _ = _g_outputs(
                    p, state.g_buffers, batch_c, key_c)
                return outputs

            _, vjp = jax.vjp(fwd_only, g_params)
            (grads,) = vjp(cots_c)
            return grads

        n = batch["real_img"].shape[0]
        n_chunks, chunk = _chunk_layout(n)
        if n_chunks is not None:
            split = lambda t: jax.tree.map(
                lambda x: x.reshape((n_chunks, chunk) + x.shape[1:]), t)
            batch_s, cots_s = split(batch), split(cotangents)

            def body(acc, xs):
                b_c, c_c, i = xs
                g = chunk_vjp_keyed(state.g_params, b_c, c_c,
                                    jax.random.fold_in(noise_key, i))
                return jax.tree.map(jnp.add, acc, g), None

            zero = jax.tree.map(jnp.zeros_like, state.g_params)
            grads, _ = jax.lax.scan(
                body, zero, (batch_s, cots_s, jnp.arange(n_chunks)))
        else:
            grads = chunk_vjp_keyed(state.g_params, batch, cotangents,
                                    noise_key)
        grads = sanitize(grads)
        updates, g_opt = g_opt_tx.update(grads, state.g_opt, state.g_params)
        params = optax.apply_updates(state.g_params, updates)
        return state.replace(g_params=params, g_opt=g_opt)

    @functools.partial(jax.jit, static_argnames=("do_r1",),
                       donate_argnums=donate)
    def d_phase(state: TrainState, img, ft, gen_c, batch, keys, do_r1=False):
        (loss, metrics), grads = jax.value_and_grad(
            cores["d"], has_aux=True)(state.d_params, img, ft, gen_c,
                                      state.ada_p, batch, keys, False)
        grads = sanitize(grads)
        updates, d_opt = d_opt_tx.update(grads, state.d_opt, state.d_params)
        params = optax.apply_updates(state.d_params, updates)
        state = state.replace(d_params=params, d_opt=d_opt)
        if do_r1:
            # Dreg: own backward + own optimizer update (reference phase
            # semantics, same split as the monolithic step's r1_d_step).
            (_, r1_metrics), grads = jax.value_and_grad(
                cores["d_r1"], has_aux=True)(
                    state.d_params, gen_c, state.ada_p, batch, keys)
            updates, d_opt = d_opt_tx.update(
                sanitize(grads), state.d_opt, state.d_params)
            params = optax.apply_updates(state.d_params, updates)
            state = state.replace(d_params=params, d_opt=d_opt)
            metrics = {**metrics, **r1_metrics}
        return state, metrics

    @functools.partial(jax.jit, static_argnames=("do_r1", "fold_post"),
                       donate_argnums=donate)
    def dp_phase(state: TrainState, parsing, gen_c, batch, real_signs=None,
                 do_r1=False, fold_post=False):
        parsing_soft = jax.nn.softmax(parsing, axis=-1)
        (loss, metrics), grads = jax.value_and_grad(
            cores["dp"], has_aux=True)(state.dp_params, parsing_soft, gen_c,
                                       batch, False)
        grads = sanitize(grads)
        updates, dp_opt = dp_opt_tx.update(grads, state.dp_opt,
                                           state.dp_params)
        params = optax.apply_updates(state.dp_params, updates)
        state = state.replace(dp_params=params, dp_opt=dp_opt)
        if do_r1:
            # DPreg: own backward + own optimizer update (see d_phase).
            (_, r1_metrics), grads = jax.value_and_grad(
                cores["dp_r1"], has_aux=True)(state.dp_params, gen_c, batch)
            updates, dp_opt = dp_opt_tx.update(
                sanitize(grads), state.dp_opt, state.dp_params)
            params = optax.apply_updates(state.dp_params, updates)
            state = state.replace(dp_params=params, dp_opt=dp_opt)
            metrics = {**metrics, **r1_metrics}
        if fold_post:
            # EMA + ADA bookkeeping folded into the last DP program — one
            # fewer dispatch per step (the tunnel dispatch is the decomposed
            # mode's overhead).
            state = _post(state, real_signs)
        return state, metrics

    def _post(state: TrainState, real_signs):
        ema_nimg = cfg.ema_kimg * 1000
        if cfg.ema_rampup is not None:
            ema_nimg = jnp.minimum(
                ema_nimg, state.cur_nimg.astype(jnp.float32) * cfg.ema_rampup)
        ema_beta = 0.5 ** (cfg.batch_size / jnp.maximum(ema_nimg, 1e-8))
        lerp = lambda a, b: b + (a - b) * ema_beta
        g_ema_params = jax.tree.map(lerp, state.g_ema_params, state.g_params)
        ada_p = state.ada_p
        if cfg.use_ada:
            adjust = jnp.sign(real_signs - cfg.ada_target) * \
                cfg.batch_size / (cfg.ada_kimg * 1000)
            ada_p = jnp.clip(ada_p + adjust, 0.0, 1.0)
        return state.replace(
            step=state.step + 1, cur_nimg=state.cur_nimg + cfg.batch_size,
            g_ema_params=g_ema_params, g_ema_buffers=state.g_buffers,
            ada_p=ada_p)

    def step(state, batch, key, do_r1_d=False, do_r1_dp=False, do_pl=False):
        assert not do_pl, "pl reg requires step_mode='monolithic'"
        ks = jax.random.split(key, 12)  # index layout matches make_train_step
        keys_g = dict(aug1=ks[1], aug2=ks[2])
        keys_d = dict(aug1=ks[4], aug2=ks[5], aug3=ks[6])

        # --- G phase (fwd -> cotangents -> bwd+update) ---
        outputs, new_buffers = g_fwd(
            state.g_params, state.g_buffers, batch, ks[0])
        cots, g_metrics = g_cotangents(
            outputs, state.d_params, state.dp_params, state.ada_p, batch,
            keys_g)
        state = g_bwd_update(state, batch, ks[0], cots)
        state = state.replace(g_buffers=new_buffers)

        # --- D / DP phases on the UPDATED G (reference phase order);
        # reuse_g_fakes feeds the G phase's own outputs instead (classic-GAN
        # semantics, one fewer full G forward — see TrainConfig) ---
        if cfg.reuse_g_fakes and not cfg.strict_phase_noise:
            img, ft, parsing, gen_c = outputs
        else:
            (img, ft, parsing, gen_c), _ = g_fwd(
                state.g_params, state.g_buffers, batch, ks[3])
        img = jax.lax.stop_gradient(img)
        ft = jax.lax.stop_gradient(ft)
        parsing = jax.lax.stop_gradient(parsing)
        gen_c = jax.lax.stop_gradient(gen_c)
        state, d_metrics = d_phase(state, img, ft, gen_c, batch, keys_d,
                                   do_r1=do_r1_d)
        n_dp = 2 if cfg.double_d_parsing else 1
        for i_dp in range(n_dp):
            if cfg.strict_phase_noise:
                # Fresh per-phase generator draw (ks[7+i]), matching the
                # monolithic step exactly at the cost of one extra G forward.
                (_, _, parsing_i, gen_c_i), _ = g_fwd(
                    state.g_params, state.g_buffers, batch, ks[7 + i_dp])
                parsing_i = jax.lax.stop_gradient(parsing_i)
                gen_c_i = jax.lax.stop_gradient(gen_c_i)
            else:
                parsing_i, gen_c_i = parsing, gen_c
            state, dp_metrics = dp_phase(
                state, parsing_i, gen_c_i, batch,
                real_signs=d_metrics["real_signs"], do_r1=do_r1_dp,
                fold_post=(i_dp == n_dp - 1))
        return state, {**g_metrics, **d_metrics, **dp_metrics,
                       "ada_p": state.ada_p}

    return step
