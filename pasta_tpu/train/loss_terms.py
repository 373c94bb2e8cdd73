"""Single source of truth for the G / D / D-parsing loss math.

Parity surface: /root/reference/training/loss_fullbody.py:117-330 (Gmain,
Dmain, Dr1 and the parsing-discriminator twins).

All three step implementations consume these builders —
``steps.make_train_step`` (monolithic), ``steps.make_phase_steps``
(per-phase jits) and ``decomposed.make_decomposed_steps`` (VJP-chained) —
so the loss definition cannot drift between them (round-3 verdict: phase
mode silently omitted the contextual term and reported thinner metrics).

The cores operate on generator OUTPUTS ``(img, finetune, parsing_logits,
gen_c)``; how those outputs are produced (fused forward, chunked scan,
shared no-grad fakes) and whether module applies are rematerialized stays a
per-implementation physical choice — pass ``d_apply`` / ``dp_apply`` to
keep e.g. the monolithic step's ``jax.checkpoint`` wrapping. Remat does not
change the math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..losses.gan import g_nonsat_loss, d_logistic_loss
from ..losses.parsing import weighted_parsing_ce
from .augment import augment_pipe, AugmentConfig


def gt_parsing_onehot(gt_parsing):
    """7-channel one-hot of the gt parsing map (loss_fullbody.py:300-308)."""
    idx = gt_parsing[..., 0].astype(jnp.int32)
    return jax.nn.one_hot(idx, 7, dtype=jnp.float32)


def _ilv(*xs):
    """Interleave sub-batches along batch: [a0,b0,a1,b1,...].

    MinibatchStdLayer groups are batch-strided (group of sample j =
    {j % (N/G) + k*(N/G)}, reference networks.py:527-549). Interleaving S
    equal sub-batches keeps every group inside ONE sub-batch whenever
    group_size divides the sub-batch length — so one discriminator call on
    the interleaved stack is bit-identical to S separate calls, at S x the
    conv batch (better MXU utilization, one kernel launch)."""
    return jnp.stack(xs, axis=1).reshape((-1,) + xs[0].shape[1:])


def _dilv(x, s):
    """Inverse of `_ilv`: split an interleaved batch into its s parts."""
    y = x.reshape((-1, s) + x.shape[1:])
    return [y[:, i] for i in range(s)]


def build_loss_cores(cfg, d, dp, vgg_params=None, mesh=None,
                     d_apply=None, dp_apply=None):
    """Returns dict(g=g_terms, d=d_terms, dp=dp_terms).

    g_terms(outputs, d_params, dp_params, ada_p, batch, keys)
        -> (loss, metrics); outputs = (img, finetune, parsing_logits, gen_c),
        keys needs {"aug1", "aug2"}.
    d_terms(d_params, img, finetune, gen_c, ada_p, batch, keys, do_r1)
        -> (loss, metrics); keys needs {"aug1", "aug2", "aug3"}; fakes must
        already be stop-gradiented by the caller.
    dp_terms(dp_params, parsing_soft, gen_c, batch, do_r1)
        -> (loss, metrics); parsing_soft is the softmaxed (and for the fake
        input stop-gradiented) parsing plane.
    """
    d_apply = d_apply or (lambda p, x, c: d.apply({"params": p}, x, c))
    dp_apply = dp_apply or (lambda p, x, c: dp.apply({"params": p}, x, c))

    _vgg_dtype = jnp.bfloat16 if cfg.vgg_bf16 else None
    if cfg.vgg_weight > 0 and vgg_params is not None:
        from ..losses.vgg import vgg_features, vgg_feature_loss

        # The real image's feature pyramid is computed ONCE per loss
        # evaluation (no grad) and shared by the img and finetune terms;
        # only the x-branch forward sits under remat (the 512px pyramids
        # are ~300MB/image otherwise).
        def _pair_losses(params, x2, real_feats):
            # one VGG forward over [img; finetune], each half compared to
            # the same real pyramid — same math as two calls, half the
            # kernel launches and remat recomputes
            from ..losses.vgg import vgg_features as _vf, FEATURE_WEIGHTS
            fx = _vf(params, x2, dtype=_vgg_dtype)
            li = lf = 0.0
            for w, a, b in zip(FEATURE_WEIGHTS, fx, real_feats):
                nb = b.shape[0]
                d = jnp.abs(a - jnp.concatenate([b, b], axis=0)
                            ).astype(jnp.float32)
                li = li + w * jnp.mean(d[:nb])
                lf = lf + w * jnp.mean(d[nb:])
            return jnp.stack([li, lf])

        _vgg_remat = (cfg.remat if cfg.vgg_remat is None else cfg.vgg_remat)
        _pair_x = jax.checkpoint(_pair_losses) if _vgg_remat else _pair_losses

        def _single_loss(params, x, real_feats):
            return vgg_feature_loss(params, x, real_feats, dtype=_vgg_dtype)

        _single_x = (jax.checkpoint(_single_loss) if _vgg_remat
                     else _single_loss)

        def _vgg_pair(img, finetune, real, batched=True):
            real_feats = [jax.lax.stop_gradient(f)
                          for f in vgg_features(vgg_params, real,
                                                dtype=_vgg_dtype)]
            if batched:
                out = _pair_x(vgg_params, jnp.concatenate([img, finetune], 0),
                              real_feats)
                return out[0], out[1]
            # unbatched: two forwards at single-stream activation footprint
            # (the R1 program variant sits ~90MB from the HBM ceiling at
            # batch 8 — stream batching tips it over)
            return (_single_x(vgg_params, img, real_feats),
                    _single_x(vgg_params, finetune, real_feats))
    else:
        _vgg_pair = None

    def _can_batch_d(n):
        gs = cfg.mbstd_group_size
        return gs is not None and n >= gs and n % gs == 0

    def _d_in(img, pose, ada_p, aug_key, augment=True):
        """ADA-augment the 3ch image, then concat pose rgb (run_D,
        loss_fullbody.py:100-106)."""
        if augment and cfg.use_ada:
            img = augment_pipe(img, ada_p, aug_key, AugmentConfig.bgc(),
                               impl=cfg.ada_impl, spmd_mesh=mesh)
        return jnp.concatenate([img, pose[..., 0:3]], axis=-1)

    def g_terms(outputs, d_params, dp_params, ada_p, batch, keys,
                batch_streams=True):
        img, finetune, pred_parsing, gen_c = outputs
        n = img.shape[0]

        if _can_batch_d(n) and batch_streams:
            # img+finetune interleaved into ONE augment + D call (see _ilv)
            d_in2 = _d_in(_ilv(img, finetune),
                          _ilv(batch["pose"], batch["pose"]),
                          ada_p, keys["aug1"])
            logits2 = d_apply(d_params, d_in2, _ilv(gen_c, gen_c))
            gen_logits, ft_logits = _dilv(logits2, 2)
        else:
            d_in = _d_in(img, batch["pose"], ada_p, keys["aug1"])
            d_in_ft = _d_in(finetune, batch["pose"], ada_p, keys["aug2"])
            gen_logits = d_apply(d_params, d_in, gen_c)
            ft_logits = d_apply(d_params, d_in_ft, gen_c)

        parsing_soft = jax.nn.softmax(pred_parsing, axis=-1)
        dp_in = jnp.concatenate(
            [parsing_soft, batch["pose"][..., 0:3]], axis=-1)
        parsing_logits = dp_apply(dp_params, dp_in, gen_c)

        loss_gmain = g_nonsat_loss(gen_logits)
        loss_gmain_ft = g_nonsat_loss(ft_logits)
        loss_g_parsing = g_nonsat_loss(parsing_logits)

        loss_l1 = loss_l1_ft = 0.0
        if cfg.l1_weight > 0:
            loss_l1 = jnp.mean(
                jnp.abs(img - batch["real_img"])) * cfg.l1_weight
            loss_l1_ft = jnp.mean(
                jnp.abs(finetune - batch["real_img"])) * cfg.l1_weight

        loss_mask = 0.0
        if cfg.mask_weight > 0:
            loss_mask = weighted_parsing_ce(
                pred_parsing, batch["gt_parsing"][..., 0].astype(jnp.int32)
            ) * cfg.mask_weight

        loss_vgg = loss_vgg_ft = 0.0
        if _vgg_pair is not None:
            loss_vgg, loss_vgg_ft = _vgg_pair(
                img, finetune, batch["real_img"], batched=batch_streams)
            loss_vgg = loss_vgg * cfg.vgg_weight
            loss_vgg_ft = loss_vgg_ft * cfg.vgg_weight

        loss_ctx = 0.0
        if cfg.contextual_weight > 0 and vgg_params is not None:
            from ..losses.contextual import contextual_loss

            loss_ctx = contextual_loss(
                vgg_params, finetune,
                batch["real_img"]) * cfg.contextual_weight

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
        return loss, metrics

    def d_terms(d_params, img, finetune, gen_c, ada_p, batch, keys, do_r1):
        n = img.shape[0]

        def real_logits_of(real_img):
            n_x = real_img.shape[0]
            real_in = _d_in(real_img, batch["pose"][:n_x], ada_p,
                            keys["aug3"])
            return d_apply(d_params, real_in, gen_c[:n_x])

        if _can_batch_d(n) and not do_r1:
            # non-R1 program: fake img + finetune + real in ONE interleaved
            # augment + D call (R1 keeps real in its own grad closure)
            d_in3 = _d_in(_ilv(img, finetune, batch["real_img"]),
                          _ilv(*[batch["pose"]] * 3), ada_p, keys["aug1"])
            logits3 = d_apply(d_params, d_in3, _ilv(*[gen_c] * 3))
            gen_logits, ft_logits, real_logits = _dilv(logits3, 3)
        elif _can_batch_d(n):
            d_in2 = _d_in(_ilv(img, finetune),
                          _ilv(batch["pose"], batch["pose"]),
                          ada_p, keys["aug1"])
            logits2 = d_apply(d_params, d_in2, _ilv(gen_c, gen_c))
            gen_logits, ft_logits = _dilv(logits2, 2)
            real_logits = real_logits_of(batch["real_img"])
        else:
            d_in = _d_in(img, batch["pose"], ada_p, keys["aug1"])
            d_in_ft = _d_in(finetune, batch["pose"], ada_p, keys["aug2"])
            gen_logits = d_apply(d_params, d_in, gen_c)
            ft_logits = d_apply(d_params, d_in_ft, gen_c)
            real_logits = real_logits_of(batch["real_img"])

        loss_fake = (d_logistic_loss(fake_logits=gen_logits)
                     + d_logistic_loss(fake_logits=ft_logits)) / 2
        loss_real = d_logistic_loss(real_logits=real_logits)

        loss = loss_fake + loss_real
        r1 = 0.0
        if do_r1:
            # r1_batch_shrink: unbiased penalty estimate on a batch prefix
            # (memory headroom; same estimator in every step mode).
            n_r1 = batch["real_img"].shape[0] // cfg.r1_batch_shrink
            grads = jax.grad(
                lambda x: jnp.sum(real_logits_of(x)))(
                    batch["real_img"][:n_r1])
            r1 = jnp.mean(jnp.sum(jnp.square(grads), axis=(1, 2, 3)))
            # lazy reg: applied every interval steps with gain=interval
            loss = loss + r1 * (cfg.r1_gamma / 2) * cfg.d_reg_interval
        metrics = dict(
            d_loss=loss_fake + loss_real,
            real_scores=jnp.mean(real_logits),
            real_signs=jnp.mean(jnp.sign(real_logits)),
            r1_penalty=r1)
        return loss, metrics

    def dp_terms(dp_params, parsing_soft, gen_c, batch, do_r1):
        pose_rgb = batch["pose"][..., 0:3]
        gt_onehot = gt_parsing_onehot(batch["gt_parsing"])
        n = parsing_soft.shape[0]

        def real_logits_of(gt_oh):
            n_x = gt_oh.shape[0]
            real_in = jnp.concatenate([gt_oh, pose_rgb[:n_x]], axis=-1)
            return dp_apply(dp_params, real_in, gen_c[:n_x])

        if _can_batch_d(n) and not do_r1:
            # fake + real parsing in ONE interleaved DP call (see _ilv)
            in2 = jnp.concatenate(
                [_ilv(parsing_soft, gt_onehot.astype(parsing_soft.dtype)),
                 _ilv(pose_rgb, pose_rgb)], axis=-1)
            fake_logits, real_logits = _dilv(
                dp_apply(dp_params, in2, _ilv(gen_c, gen_c)), 2)
        else:
            fake_in = jnp.concatenate([parsing_soft, pose_rgb], axis=-1)
            fake_logits = dp_apply(dp_params, fake_in, gen_c)
            real_logits = real_logits_of(gt_onehot)

        loss_fake = d_logistic_loss(fake_logits=fake_logits)
        loss_real = d_logistic_loss(real_logits=real_logits)
        loss = loss_fake + loss_real
        r1 = 0.0
        if do_r1:
            n_r1 = gt_onehot.shape[0] // cfg.r1_batch_shrink
            grads = jax.grad(
                lambda x: jnp.sum(real_logits_of(x)))(gt_onehot[:n_r1])
            r1 = jnp.mean(jnp.sum(jnp.square(grads), axis=(1, 2, 3)))
            loss = loss + r1 * (cfg.r1_gamma / 2) * cfg.d_reg_interval
        metrics = dict(dp_loss=loss_fake + loss_real, dp_r1_penalty=r1)
        return loss, metrics

    def d_r1_terms(d_params, gen_c, ada_p, batch, keys):
        """Standalone lazy-R1 loss for the img discriminator — the
        reference's Dreg phase (loss_fullbody.py:306-330): its own backward
        and its own optimizer step, separate from Dmain. Keeping it out of
        the main program also keeps the D grad-of-grad's memory peak out of
        the Gmain-bearing step (the folded variant OOMs the 16GB chip at
        batch 8)."""
        n_r1 = batch["real_img"].shape[0] // cfg.r1_batch_shrink

        def real_logits_of(x):
            real_in = _d_in(x, batch["pose"][:n_r1], ada_p, keys["aug3"])
            return d_apply(d_params, real_in, gen_c[:n_r1])

        grads = jax.grad(lambda x: jnp.sum(real_logits_of(x)))(
            batch["real_img"][:n_r1])
        r1 = jnp.mean(jnp.sum(jnp.square(grads), axis=(1, 2, 3)))
        loss = r1 * (cfg.r1_gamma / 2) * cfg.d_reg_interval
        return loss, dict(r1_penalty=r1)

    def dp_r1_terms(dp_params, gen_c, batch):
        """Standalone lazy-R1 loss for the parsing discriminator."""
        pose_rgb = batch["pose"][..., 0:3]
        gt_onehot = gt_parsing_onehot(batch["gt_parsing"])
        n_r1 = gt_onehot.shape[0] // cfg.r1_batch_shrink

        def real_logits_of(x):
            real_in = jnp.concatenate([x, pose_rgb[:n_r1]], axis=-1)
            return dp_apply(dp_params, real_in, gen_c[:n_r1])

        grads = jax.grad(lambda x: jnp.sum(real_logits_of(x)))(
            gt_onehot[:n_r1])
        r1 = jnp.mean(jnp.sum(jnp.square(grads), axis=(1, 2, 3)))
        loss = r1 * (cfg.r1_gamma / 2) * cfg.d_reg_interval
        return loss, dict(dp_r1_penalty=r1)

    return dict(g=g_terms, d=d_terms, dp=dp_terms, d_in=_d_in,
                d_r1=d_r1_terms, dp_r1=dp_r1_terms)
