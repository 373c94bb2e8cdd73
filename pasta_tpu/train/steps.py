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

from .augment import augment_pipe, AugmentConfig
from .config import TrainConfig
from .loss_terms import build_loss_cores, gt_parsing_onehot
from .state import TrainState, make_models, make_optimizers


def _run_g(g, g_params, g_buffers, batch, noise_key, update_w_avg=True):
    """Generator forward incl. w_avg update (loss_fullbody.py run_G).

    Returns (img, finetune, pred_parsing, gen_c, buffers): the style code is
    produced by the same forward (one style-encoder pass per loss
    evaluation, like the reference's loss_fullbody.py:127-129)."""
    n = batch["real_img"].shape[0]
    variables = {"params": g_params, "buffers": g_buffers}
    (img, finetune, pred_parsing, gen_c), mutated = g.apply(
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
        return_code=True,
    )
    return img, finetune, pred_parsing, gen_c, mutated["buffers"]


# Back-compat alias (loss math lives in loss_terms — the single source of
# truth shared by all three step implementations).
_gt_parsing_onehot = gt_parsing_onehot


def make_train_step(cfg: TrainConfig, vgg_params=None, mesh=None):
    """Returns step(state, batch, key, do_r1_d, do_r1_dp) -> (state, metrics).

    The lazy R1 regularizers run as their OWN jitted programs with their
    own optimizer updates — the reference's Dreg/DPreg phase semantics
    (each phase does its own backward + opt.step(); folding R1 into the
    Dmain update was a one-update approximation AND put the D grad-of-grad
    in the same program as Gmain's backward, which does not fit 16GB HBM
    at 512px batch 8). The main program therefore always compiles the
    plain variant with every stream-batching/fake-reuse optimization on.
    """
    g, d, dp = make_models(cfg)
    _opt_cache = {}

    # With cfg.remat, VGG x-branch activations are rematerialized in the
    # backward (handled inside build_loss_cores), and so are the
    # discriminator forwards (the G phase backprops through D on three
    # branches — img/finetune/parsing — whose activations would all be
    # live at once).
    def _d_apply(params, x, c):
        return d.apply({"params": params}, x, c)

    def _dp_apply(params, x, c):
        return dp.apply({"params": params}, x, c)

    d_remat = cfg.remat if cfg.d_remat is None else cfg.d_remat

    def _make_cores(remat_d):
        da, dpa = _d_apply, _dp_apply
        if remat_d:
            da, dpa = jax.checkpoint(da), jax.checkpoint(dpa)
        return build_loss_cores(cfg, d, dp, vgg_params, mesh=mesh,
                                d_apply=da, dp_apply=dpa)

    # Remat policy is per program (numerics-neutral): the main program
    # honors cfg.d_remat (off measures +9% at b8: 1259 vs 1375 ms, r4d);
    # the standalone R1 programs force D remat whenever global remat is
    # on — the D grad-of-grad without it needs 20.5GB at b8
    # (r4e_train_nodremat OOM).
    cores = _make_cores(d_remat)
    cores_r1 = cores if (d_remat or not cfg.remat) else _make_cores(True)

    def _get_opts(d_params):
        if "opts" not in _opt_cache:
            _opt_cache["opts"] = make_optimizers(cfg, d_params)
        return _opt_cache["opts"]

    def g_loss_fn(g_params, state: TrainState, batch, keys,
                  batch_streams=True, return_fakes=False, cores=cores):
        img, finetune, pred_parsing, gen_c, new_buffers = _run_g(
            g, g_params, state.g_buffers, batch, keys["noise"])
        loss, metrics = cores["g"](
            (img, finetune, pred_parsing, gen_c),
            state.d_params, state.dp_params, state.ada_p, batch, keys,
            batch_streams=batch_streams)
        if return_fakes:
            fakes = jax.lax.stop_gradient(dict(
                fake_img=img, fake_finetune=finetune,
                fake_parsing_soft=jax.nn.softmax(pred_parsing, axis=-1),
                gen_c=gen_c))
            return loss, (new_buffers, metrics, fakes)
        return loss, (new_buffers, metrics)

    def d_loss_fn(d_params, g_params, g_buffers, state, batch, keys, do_r1,
                  cores=cores):
        if "fake_img" in batch:
            # Shared no-grad fakes computed once per step (strict_phase_noise
            # off): one generator forward feeds the D and parsing-D phases.
            img, finetune, gen_c = (
                batch["fake_img"], batch["fake_finetune"], batch["gen_c"])
        else:
            img, finetune, _, gen_c, _ = _run_g(
                g, g_params, g_buffers, batch, keys["noise"],
                update_w_avg=False)
            img = jax.lax.stop_gradient(img)
            finetune = jax.lax.stop_gradient(finetune)
        return cores["d"](d_params, img, finetune, gen_c, state.ada_p,
                          batch, keys, do_r1)

    def dp_loss_fn(dp_params, g_params, g_buffers, state, batch, keys, do_r1,
                   cores=cores):
        if "fake_parsing_soft" in batch:
            parsing_soft = batch["fake_parsing_soft"]
            gen_c = batch["gen_c"]
        else:
            _, _, pred_parsing, gen_c, _ = _run_g(
                g, g_params, g_buffers, batch, keys["noise"],
                update_w_avg=False)
            parsing_soft = jax.lax.stop_gradient(
                jax.nn.softmax(pred_parsing, axis=-1))
        return cores["dp"](dp_params, parsing_soft, gen_c, batch, do_r1)

    def pl_loss_fn(g_params, state: TrainState, batch, noise_key, pl_key):
        """Path-length regularization (Gpl): penalize the variance of
        |J_ws^T y| for random image-space directions y.

        The reference ships this phase disabled (loss_fullbody.py:200-221 is
        commented out and references a gen_ws its run_G no longer returns);
        formula per StyleGAN2. Runs on batch//pl_batch_shrink samples, and
        its gradient flows into both the mapping path (through ws) and the
        synthesis weights (through the double grad), like torch
        create_graph=True."""
        n = batch["real_img"].shape[0]
        bs = max(n // max(cfg.pl_batch_shrink, 1), 1)
        sub = jax.tree.map(lambda x: x[:bs], batch)
        variables = {"params": g_params, "buffers": state.g_buffers}

        ws = g.apply(variables, jnp.zeros((bs, 0)), sub["style_input"],
                     sub["retain"], method="style_and_ws")[2]

        def img_of_ws(w):
            def run_synthesis(m, w_):
                pose_feat = m.encode_pose(sub["pose"])
                _, feats = m.encode_style(sub["style_input"], sub["retain"])
                cat_feats = {str(f.shape[1]): f for f in feats}
                img, _, _ = m.synthesis(
                    w_, pose_feat, cat_feats, sub["denorm_upper_input"],
                    sub["denorm_lower_input"], sub["denorm_upper_mask"],
                    sub["denorm_lower_mask"], sub["gt_parsing"])
                return img

            return g.apply(variables, w, method=run_synthesis,
                           rngs={"noise": noise_key})

        img = img_of_ws(ws)
        hw = img.shape[1] * img.shape[2]
        pl_noise = jax.random.normal(pl_key, img.shape) / jnp.sqrt(float(hw))
        pl_grads = jax.grad(lambda w: jnp.sum(img_of_ws(w) * pl_noise))(ws)
        # [N, num_ws, w_dim] -> per-sample length: sqrt(mean_ws sum_dim g^2)
        pl_lengths = jnp.sqrt(
            jnp.mean(jnp.sum(jnp.square(pl_grads), axis=2), axis=1))
        pl_mean = state.pl_mean + \
            (jnp.mean(pl_lengths) - state.pl_mean) * cfg.pl_decay
        pl_penalty = jnp.mean(jnp.square(pl_lengths - pl_mean))
        # lazy reg: applied every g_reg_interval steps with gain=interval
        loss = pl_penalty * cfg.pl_weight * cfg.g_reg_interval
        return loss, (pl_mean, dict(pl_penalty=pl_penalty))

    def _microbatches(batch):
        a = cfg.grad_accum
        return jax.tree.map(
            lambda x: x.reshape((a, x.shape[0] // a) + x.shape[1:]), batch)

    def _accum_grad(loss_fn, params, batch, *rest_and_keys):
        """Mean loss/grads over grad_accum microbatches via lax.scan
        (reference batch_gpu accumulation rounds,
        training_loop_fullbody.py:616-629). The last argument must be the
        PRNG-key dict — split per microbatch so noise/augment draws differ
        across rounds like the reference's."""
        *rest, keys = rest_and_keys
        if cfg.grad_accum == 1:
            return jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, *rest, keys)
        a = cfg.grad_accum
        micro = _microbatches(batch)
        keys_split = {k: jax.random.split(v, a) for k, v in keys.items()}

        def body(carry, xs):
            mb, mb_keys = xs
            gsum, lsum, asum = carry
            (loss, aux_new), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, mb, *rest, mb_keys)
            gsum = jax.tree.map(jnp.add, gsum, grads)
            asum = jax.tree.map(jnp.add, asum, aux_new)
            return (gsum, lsum + loss, asum), None

        zero_g = jax.tree.map(jnp.zeros_like, params)
        first_mb = jax.tree.map(lambda x: x[0], micro)
        # Aux (metrics AND buffer updates) is MEANED over microbatches, so
        # the ADA controller's real_signs estimate covers the full batch.
        # For w_avg this is exact: each microbatch's update is
        # beta*pre + (1-beta)*mean(styles_mb) from the same pre-step buffers
        # (linear in the style mean), so the microbatch mean equals the
        # update computed from the full-batch style mean.
        aux_shape = jax.eval_shape(
            lambda p, b: loss_fn(p, b, *rest, keys)[1], params, first_mb)
        aux0 = jax.tree.map(lambda sh: jnp.zeros(sh.shape, sh.dtype),
                            aux_shape)
        (gsum, lsum, asum), _ = jax.lax.scan(
            body, (zero_g, 0.0, aux0), (micro, keys_split))
        aux = jax.tree.map(lambda x: x / a, asum)
        return (lsum / a, aux), jax.tree.map(lambda g: g / a, gsum)

    @functools.partial(
        jax.jit, static_argnames=("do_pl",),
        donate_argnums=(0,) if cfg.donate else ())
    def main_step(state: TrainState, batch, key, do_pl: bool = False):
        g_opt_tx, d_opt_tx, dp_opt_tx = _get_opts(state.d_params)
        ks = jax.random.split(key, 12)
        keys_g = dict(noise=ks[0], aug1=ks[1], aug2=ks[2])
        keys_d = dict(noise=ks[3], aug1=ks[4], aug2=ks[5], aug3=ks[6])

        # NOTE on style mixing: the reference gates it by style_mixing_prob
        # (loss_fullbody.py:87-91) but ships prob=0 AND z_dim=0 — with no z
        # input the mixed mapping output is identical to the original, so
        # mixing is a structural no-op for this model family; intentionally
        # not implemented.

        # --- G phase --- (named scopes mirror the reference's
        # Timing/<phase> taxonomy, training_loop_fullbody.py:482-487)
        reuse_fakes = (cfg.reuse_g_fakes and not cfg.strict_phase_noise
                       and cfg.grad_accum == 1)
        with jax.named_scope("Gmain"):
            (g_loss, g_aux), g_grads = _accum_grad(
                lambda p, b, s_, k_: g_loss_fn(
                    p, s_, b, k_, return_fakes=reuse_fakes),
                state.g_params, batch, state, keys_g)
            new_g_buffers, g_metrics = g_aux[0], g_aux[1]
        if cfg.sanitize_grads:
            g_grads = jax.tree.map(
                lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5),
                g_grads)
        g_updates, g_opt = g_opt_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        state = state.replace(
            g_params=g_params, g_buffers=new_g_buffers, g_opt=g_opt)

        # --- Gpl phase (lazy path-length reg; own optimizer step, like the
        # reference's Greg phase) ---
        pl_metrics = {}
        if do_pl:
            assert cfg.pl_weight != 0, "do_pl requires pl_weight != 0"
            (_, (new_pl_mean, pl_metrics)), pl_grads = jax.value_and_grad(
                pl_loss_fn, has_aux=True)(
                    state.g_params, state, batch, ks[9], ks[10])
            if cfg.sanitize_grads:
                pl_grads = jax.tree.map(
                    lambda x: jnp.nan_to_num(
                        x, nan=0.0, posinf=1e5, neginf=-1e5), pl_grads)
            pl_updates, g_opt = g_opt_tx.update(
                pl_grads, state.g_opt, state.g_params)
            g_params = optax.apply_updates(state.g_params, pl_updates)
            state = state.replace(
                g_params=g_params, g_opt=g_opt, pl_mean=new_pl_mean)

        # --- shared fake forward (one no-grad G forward from the updated G
        # feeds the D and parsing-D phases; strict_phase_noise=True restores
        # the reference's fresh per-phase generator draws; reuse_g_fakes
        # skips even the shared forward by feeding Gmain's own fakes) ---
        batch_d = batch
        if reuse_fakes:
            batch_d = dict(batch, **g_aux[2])
        elif not cfg.strict_phase_noise:
            f_img, f_ft, f_pp, f_code, _ = _run_g(
                g, state.g_params, state.g_buffers, batch, keys_d["noise"],
                update_w_avg=False)
            batch_d = dict(
                batch,
                fake_img=jax.lax.stop_gradient(f_img),
                fake_finetune=jax.lax.stop_gradient(f_ft),
                fake_parsing_soft=jax.lax.stop_gradient(
                    jax.nn.softmax(f_pp, axis=-1)),
                gen_c=jax.lax.stop_gradient(f_code),
            )

        # --- D phase (sees updated G, like the reference phase order;
        # the lazy R1 reg runs as its own program/update — see r1_d_step) ---
        with jax.named_scope("Dmain"):
            (d_loss, d_metrics), d_grads = _accum_grad(
                lambda p, b, gp, gb, s_, r_, k_: d_loss_fn(
                    p, gp, gb, s_, b, k_, r_),
                state.d_params, batch_d, state.g_params, state.g_buffers,
                state, False, keys_d)
        if cfg.sanitize_grads:
            d_grads = jax.tree.map(
                lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5),
                d_grads)
        d_updates, d_opt = d_opt_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)
        state = state.replace(d_params=d_params, d_opt=d_opt)

        # --- parsing-D phase(s) --- (each registered phase draws its own
        # fresh generator noise, like the reference's per-phase run_G)
        n_dp = 2 if cfg.double_d_parsing else 1
        dp_metrics = {}
        for i_dp in range(n_dp):
            keys_dp = dict(noise=ks[7 + i_dp])
            with jax.named_scope("DPmain"):
                (dp_loss, dp_metrics), dp_grads = _accum_grad(
                    lambda p, b, gp, gb, s_, r_, k_: dp_loss_fn(
                        p, gp, gb, s_, b, k_, r_),
                    state.dp_params, batch_d, state.g_params,
                    state.g_buffers, state, False, keys_dp)
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

        ada_p_pre = state.ada_p
        state = state.replace(
            step=state.step + 1,
            cur_nimg=state.cur_nimg + cfg.batch_size,
            g_ema_params=g_ema_params,
            g_ema_buffers=g_ema_buffers,
            ada_p=ada_p,
        )
        metrics = dict(ada_p=ada_p, **g_metrics, **d_metrics, **dp_metrics,
                       **pl_metrics)
        # Context for the standalone R1 programs: the D conditioning code
        # (from the shared fake forward) and the ada_p the Dmain augment
        # used (the reference updates ada once per tick, after all phases).
        gen_c = batch_d.get(
            "gen_c", jnp.zeros((batch["real_img"].shape[0], 0)))
        return state, metrics, (gen_c, ada_p_pre)

    def _sanitize(grads):
        if not cfg.sanitize_grads:
            return grads
        return jax.tree.map(
            lambda x: jnp.nan_to_num(x, nan=0.0, posinf=1e5, neginf=-1e5),
            grads)

    @functools.partial(jax.jit, donate_argnums=(0,) if cfg.donate else ())
    def r1_d_step(state: TrainState, batch, gen_c, ada_p, key):
        """Dreg phase: standalone lazy-R1 backward + its own optimizer
        update (reference loss_fullbody.py:306-330 / train phase registry).
        Splitting it out keeps the D grad-of-grad's memory peak out of the
        Gmain-bearing program — the folded variant needs >15.75GB at 512px
        batch 8 — and matches the reference's per-phase opt.step()
        semantics exactly (the folded single-update was an approximation:
        Adam is nonlinear in the summed gradient)."""
        _, d_opt_tx, _ = _get_opts(state.d_params)
        ks = jax.random.split(key, 12)
        if cfg.strict_phase_noise:
            _, _, _, gen_c, _ = _run_g(
                g, state.g_params, state.g_buffers, batch, ks[3],
                update_w_avg=False)
            gen_c = jax.lax.stop_gradient(gen_c)
        keys = dict(aug3=ks[6])  # same slice Dmain's real branch draws
        with jax.named_scope("Dr1"):
            (_, r1_metrics), grads = jax.value_and_grad(
                cores_r1["d_r1"], has_aux=True)(
                    state.d_params, gen_c, ada_p, batch, keys)
        updates, d_opt = d_opt_tx.update(
            _sanitize(grads), state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        return state.replace(d_params=d_params, d_opt=d_opt), r1_metrics

    @functools.partial(jax.jit, donate_argnums=(0,) if cfg.donate else ())
    def r1_dp_step(state: TrainState, batch, gen_c, key):
        """DPreg phase: standalone lazy-R1 for the parsing discriminator."""
        _, _, dp_opt_tx = _get_opts(state.d_params)
        ks = jax.random.split(key, 12)
        if cfg.strict_phase_noise:
            _, _, _, gen_c, _ = _run_g(
                g, state.g_params, state.g_buffers, batch, ks[7],
                update_w_avg=False)
            gen_c = jax.lax.stop_gradient(gen_c)
        with jax.named_scope("DPr1"):
            (_, r1_metrics), grads = jax.value_and_grad(
                cores_r1["dp_r1"], has_aux=True)(
                    state.dp_params, gen_c, batch)
        updates, dp_opt = dp_opt_tx.update(
            _sanitize(grads), state.dp_opt, state.dp_params)
        dp_params = optax.apply_updates(state.dp_params, updates)
        return state.replace(dp_params=dp_params, dp_opt=dp_opt), r1_metrics

    def train_step(state: TrainState, batch, key, do_r1_d: bool = False,
                   do_r1_dp: bool = False, do_pl: bool = False):
        state, metrics, (gen_c, ada_p_pre) = main_step(
            state, batch, key, do_pl=do_pl)
        if do_r1_d:
            state, m = r1_d_step(state, batch, gen_c, ada_p_pre, key)
            metrics = {**metrics, **m}
        if do_r1_dp:
            state, m = r1_dp_step(state, batch, gen_c, key)
            metrics = {**metrics, **m}
        return state, metrics

    return train_step


def make_phase_steps(cfg: TrainConfig, vgg_params=None, mesh=None):
    """Split-phase variant of make_train_step: one jitted program per phase
    (G / D / D_parsing / EMA+ADA bookkeeping) instead of one monolithic
    step. Same semantics and call signature; compiles much smaller programs
    (the monolithic 512px step can exceed toolchain compiler limits).
    """
    assert cfg.freeze_d_layers == 0 and cfg.grad_accum == 1, (
        "freeze-D / grad accumulation are handled by the monolithic "
        "make_train_step; split-phase mode targets compiler-size limits")
    assert cfg.pl_weight == 0, (
        "path-length regularization is only implemented in the monolithic "
        "make_train_step (the reference ships it disabled)")
    import functools as _ft

    inner = _build_phase_fns(cfg, vgg_params, mesh=mesh)

    donate = (0,) if cfg.donate else ()

    @_ft.partial(jax.jit, donate_argnums=donate)
    def g_step(state, batch, key):
        return inner["g"](state, batch, key)

    @_ft.partial(jax.jit, static_argnames=("do_r1",), donate_argnums=donate)
    def d_step(state, batch, key, do_r1=False):
        return inner["d"](state, batch, key, do_r1)

    @_ft.partial(jax.jit, static_argnames=("do_r1",), donate_argnums=donate)
    def dp_step(state, batch, key, do_r1=False):
        return inner["dp"](state, batch, key, do_r1)

    @_ft.partial(jax.jit, donate_argnums=donate)
    def post_step(state, real_signs):
        return inner["post"](state, real_signs)

    def step(state, batch, key, do_r1_d=False, do_r1_dp=False, do_pl=False):
        assert not do_pl, "pl reg requires step_mode='monolithic'"
        k1, k2, k3 = jax.random.split(key, 3)
        state, g_metrics = g_step(state, batch, k1)
        state, d_metrics = d_step(state, batch, k2, do_r1=do_r1_d)
        n_dp = 2 if cfg.double_d_parsing else 1
        for k3i in jax.random.split(k3, n_dp):
            state, dp_metrics = dp_step(state, batch, k3i, do_r1=do_r1_dp)
        state = post_step(state, d_metrics["real_signs"])
        return state, {**g_metrics, **d_metrics, **dp_metrics,
                       "ada_p": state.ada_p}

    return step


def _build_phase_fns(cfg: TrainConfig, vgg_params=None, mesh=None):
    """Phase bodies shared by make_phase_steps (same math as the monolithic
    step, factored per module update)."""
    g, d, dp = make_models(cfg)
    g_opt_tx, d_opt_tx, dp_opt_tx = make_optimizers(cfg)
    sanitize = (lambda t: jax.tree.map(
        lambda x: jnp.nan_to_num(x, nan=0.0, posinf=1e5, neginf=-1e5), t)
    ) if cfg.sanitize_grads else (lambda t: t)

    # ONE loss definition across step modes: the same loss_terms cores the
    # monolithic step uses (round-3 verdict: this path had re-implemented
    # the closures and silently dropped the contextual term). Module applies
    # stay un-checkpointed here — phase programs are small by construction,
    # and remat is a physical choice, not part of the loss math.
    cores = build_loss_cores(cfg, d, dp, vgg_params, mesh=mesh)

    def g_loss_fn(g_params, state, batch, keys):
        img, finetune, pred_parsing, gen_c, new_buffers = _run_g(
            g, g_params, state.g_buffers, batch, keys["noise"])
        loss, metrics = cores["g"](
            (img, finetune, pred_parsing, gen_c),
            state.d_params, state.dp_params, state.ada_p, batch, keys)
        return loss, (new_buffers, metrics)

    def d_loss_fn(d_params, state, batch, keys, do_r1):
        img, finetune, _, gen_c, _ = _run_g(
            g, state.g_params, state.g_buffers, batch, keys["noise"],
            update_w_avg=False)
        img = jax.lax.stop_gradient(img)
        finetune = jax.lax.stop_gradient(finetune)
        return cores["d"](d_params, img, finetune, gen_c, state.ada_p,
                          batch, keys, do_r1)

    def dp_loss_fn(dp_params, state, batch, keys, do_r1):
        _, _, pred_parsing, gen_c, _ = _run_g(
            g, state.g_params, state.g_buffers, batch, keys["noise"],
            update_w_avg=False)
        parsing_soft = jax.lax.stop_gradient(
            jax.nn.softmax(pred_parsing, axis=-1))
        return cores["dp"](dp_params, parsing_soft, gen_c, batch, do_r1)

    def g_phase(state, batch, key):
        ks = jax.random.split(key, 3)
        keys = dict(noise=ks[0], aug1=ks[1], aug2=ks[2])
        (loss, (new_buffers, metrics)), grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params, state, batch, keys)
        grads = sanitize(grads)
        updates, g_opt = g_opt_tx.update(grads, state.g_opt, state.g_params)
        params = optax.apply_updates(state.g_params, updates)
        return state.replace(g_params=params, g_buffers=new_buffers,
                             g_opt=g_opt), metrics

    def _gen_c_of(state, batch, noise_key):
        _, _, _, gen_c, _ = _run_g(
            g, state.g_params, state.g_buffers, batch, noise_key,
            update_w_avg=False)
        return jax.lax.stop_gradient(gen_c)

    def d_phase(state, batch, key, do_r1):
        ks = jax.random.split(key, 4)
        keys = dict(noise=ks[0], aug1=ks[1], aug2=ks[2], aug3=ks[3])
        (loss, metrics), grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params, state, batch, keys,
                                     False)
        grads = sanitize(grads)
        updates, d_opt = d_opt_tx.update(grads, state.d_opt, state.d_params)
        params = optax.apply_updates(state.d_params, updates)
        state = state.replace(d_params=params, d_opt=d_opt)
        if do_r1:
            # Dreg: own backward + optimizer update (reference phase
            # semantics; same split as make_train_step's r1_d_step).
            gen_c = _gen_c_of(state, batch, keys["noise"])
            (_, r1_metrics), grads = jax.value_and_grad(
                cores["d_r1"], has_aux=True)(
                    state.d_params, gen_c, state.ada_p, batch, keys)
            updates, d_opt = d_opt_tx.update(
                sanitize(grads), state.d_opt, state.d_params)
            params = optax.apply_updates(state.d_params, updates)
            state = state.replace(d_params=params, d_opt=d_opt)
            metrics = {**metrics, **r1_metrics}
        return state, metrics

    def dp_phase(state, batch, key, do_r1):
        keys = dict(noise=key)
        (loss, metrics), grads = jax.value_and_grad(
            dp_loss_fn, has_aux=True)(state.dp_params, state, batch, keys,
                                      False)
        grads = sanitize(grads)
        updates, dp_opt = dp_opt_tx.update(grads, state.dp_opt,
                                           state.dp_params)
        params = optax.apply_updates(state.dp_params, updates)
        state = state.replace(dp_params=params, dp_opt=dp_opt)
        if do_r1:
            gen_c = _gen_c_of(state, batch, keys["noise"])
            (_, r1_metrics), grads = jax.value_and_grad(
                cores["dp_r1"], has_aux=True)(state.dp_params, gen_c, batch)
            updates, dp_opt = dp_opt_tx.update(
                sanitize(grads), state.dp_opt, state.dp_params)
            params = optax.apply_updates(state.dp_params, updates)
            state = state.replace(dp_params=params, dp_opt=dp_opt)
            metrics = {**metrics, **r1_metrics}
        return state, metrics

    def post(state, real_signs):
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

    return dict(g=g_phase, d=d_phase, dp=dp_phase, post=post)
