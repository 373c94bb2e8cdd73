"""PASTA-GAN++ generator: style branch + SPADE texture branch (NHWC).

References (/root/reference/training/networks.py):
  SynthesisNetworkFull_v18 — networks.py:2197-2327
  GeneratorFull_v20        — networks.py:2329-2366

Shipped config (train.py:191-202, fashion): z_dim=0, c_dim=512, w_dim=512,
img_resolution=512, img_channels=3, channel_base=32768, channel_max=512,
conv_clamp=256, mapping num_layers=1; G synthesis always runs fp32
(networks.py:2294,2325 force_fp32).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Dict, Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.layers import Conv2dLayer, ResBlock
from ..nn.mapping import MappingNetwork
from ..nn.encoders import ConstEncoderNetwork, StyleEncoderNetwork
from ..nn.synthesis import SynthesisBlockStyle, SynthesisBlockTexture, SpadeResBlock


def _channels_dict(resolutions, channel_base, channel_max):
    return {res: min(channel_base // res, channel_max) for res in resolutions}


def _nearest_half(x):
    """torch F.interpolate(scale_factor=0.5) default (nearest): even-index
    subsampling of an NHWC tensor."""
    return x[:, ::2, ::2, :]


class SynthesisNetwork(nn.Module):
    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: Optional[float] = None
    use_noise: bool = True
    # bf16 compute for the top-N-resolution blocks (style + texture + SPADE);
    # params stay fp32, torgb/parsing outputs stay fp32. The reference forces
    # G fp32 (networks.py:2294) — this is the TPU training-speed lever.
    num_bf16_res: int = 0
    # jax.checkpoint each synthesis block: peak-activation memory of the
    # backward drops to ~one block's activations (plus per-block inputs) at
    # the cost of one extra forward — how the monolithic 512px train step
    # fits a single chip's HBM.
    remat: bool = False
    # Only remat blocks at resolution >= this (with remat=True). Small-res
    # blocks (8..64) hold tiny activations but real FLOPs (512ch) — storing
    # them costs ~0.5 GB at batch 8 while skipping their backward recompute.
    remat_min_res: int = 0
    # Remat each SPADE normalization inside the SPADE resblocks (see
    # SpadeResBlock.inner_remat; needed for batch-16 HBM, pure recompute
    # overhead when the step fits without it). None = follow `remat`.
    spade_inner_remat: Optional[bool] = None

    @property
    def block_resolutions(self):
        return [2 ** i for i in range(3, int(math.log2(self.img_resolution)) + 1)]

    @property
    def num_ws(self):
        # b8 contributes 1 conv, every later block 2; +1 for the last torgb.
        return 1 + 2 * (len(self.block_resolutions) - 1) + 1

    def _make_spade_encoder(self):
        """3ch @512 -> 64 -> 128ch @256 encoder (networks.py:2245-2250).

        Built once; shared between the upper and lower garment paths."""
        ngf = 64
        conv_cls = nn.remat(Conv2dLayer) if self.remat else Conv2dLayer
        res_cls = nn.remat(ResBlock) if self.remat else ResBlock
        layers = (
            conv_cls(3, ngf, kernel_size=7, activation="relu",
                     name="spade_encoder.0"),
            res_cls(ngf, ngf, kernel_size=4, activation="relu",
                    name="spade_encoder.1"),
            res_cls(ngf, ngf * 2, kernel_size=4, activation="relu", down=2,
                    name="spade_encoder.2"),
        )

        def encode(x):
            for layer in layers:
                x = layer(x)
            return x

        return encode

    def _spade_prepare(self, mask_512, denorm_mask, denorm_input):
        """Mask math ahead of the spade encoder (networks.py:2253-2264):
        masked encoder input + the valid / residual 256px region masks."""
        dt = mask_512.dtype
        mask_512 = (mask_512 > 0.9).astype(dt)
        mask_256 = (_nearest_half(mask_512) > 0.9).astype(dt)
        denorm_mask_256 = (_nearest_half(denorm_mask) > 0.9).astype(dt)

        valid_mask = ((mask_256 + denorm_mask_256) == 2.0).astype(dt)
        res_mask = mask_256 - valid_mask
        denorm_input = denorm_input * mask_512 - (1 - mask_512)
        return denorm_input, valid_mask, res_mask

    def _spade_fill(self, feat, valid_mask, res_mask):
        """Fill predicted-but-not-covered region with the masked average
        feature (networks.py:2265-2276); stats accumulate in fp32."""
        valid_feat_sum = jnp.sum(
            feat * valid_mask.astype(feat.dtype), axis=(1, 2), keepdims=True,
            dtype=jnp.float32)
        valid_mask_sum = jnp.sum(valid_mask, axis=(1, 2), keepdims=True,
                                 dtype=jnp.float32)
        valid_index = (valid_mask_sum > 10).astype(jnp.float32)
        num_px = feat.shape[1] * feat.shape[2]
        valid_mask_sum = valid_mask_sum * valid_index + num_px * (1 - valid_index)
        avg_feat = (valid_feat_sum / valid_mask_sum).astype(feat.dtype)
        return feat * (1 - res_mask).astype(feat.dtype) \
            + avg_feat * res_mask.astype(feat.dtype)

    @nn.compact
    def __call__(self, ws, pose_feat, cat_feat, denorm_upper_input,
                 denorm_lower_input, denorm_upper_mask, denorm_lower_mask,
                 gt_parsing=None, noise_mode="random"):
        resolutions = self.block_resolutions
        channels = _channels_dict(resolutions, self.channel_base, self.channel_max)
        ws = ws.astype(jnp.float32)
        res_log2 = int(math.log2(self.img_resolution))
        bf16_res = max(2 ** (res_log2 + 1 - self.num_bf16_res), 16) \
            if self.num_bf16_res > 0 else self.img_resolution * 2

        block_common = dict(
            w_dim=self.w_dim,
            img_channels=self.img_channels,
            conv_clamp=self.conv_clamp,
            use_noise=self.use_noise,
        )
        inner_remat = (self.remat if self.spade_inner_remat is None
                       else self.spade_inner_remat)

        def _remat_at(res):
            return self.remat and res >= self.remat_min_res

        def style_cls(res):
            # noise_mode is the only non-array argument (static).
            return nn.remat(SynthesisBlockStyle, static_argnums=(6,)) \
                if _remat_at(res) else SynthesisBlockStyle

        def texture_cls(res):
            return nn.remat(SynthesisBlockTexture, static_argnums=(7,)) \
                if _remat_at(res) else SynthesisBlockTexture

        def spade_cls(res):
            return nn.remat(SpadeResBlock) if _remat_at(res) \
                else SpadeResBlock

        # Per-resolution skip entries, pre-cast to their consumer block's
        # dtype OUTSIDE the remat boundary: a remat'd bf16 block then saves
        # a bf16 residual (and one tensor, not the whole f32 dict) — the
        # batch-16 HBM driver in round 2's profile.
        def _blk_dtype(res):
            return jnp.bfloat16 if res >= bf16_res else jnp.float32

        cat_cast = {
            res: cat_feat[str(res)].astype(_blk_dtype(res))
            for res in resolutions
            if res > 32 and str(res) in cat_feat
        }

        # Style branch: b8 ... b512. torgb of block k shares its w with
        # block k+1's conv0 (reference ws.narrow slicing, networks.py:2281-2289).
        x = img = None
        pred_parsing = None
        x_256 = img_256 = None
        w_idx = 0
        for res in resolutions:
            in_ch = channels[res // 2] if res > 8 else 0
            n_conv = 1 if res == 8 else 2
            block = style_cls(res)(
                in_channels=in_ch,
                out_channels=channels[res],
                resolution=res,
                is_last=(res == self.img_resolution),
                is_style=True,
                use_bf16=(res >= bf16_res),
                name=f"b{res}",
                **block_common,
            )
            cur_ws = ws[:, w_idx : w_idx + n_conv + 1]
            if x is not None:
                # cast outside the remat boundary: the saved residual is
                # then bf16 for bf16 blocks (identical numerics — the
                # block's internal astype becomes a no-op)
                x = x.astype(_blk_dtype(res))
            # noise_mode positionally: nn.remat static_argnums indexes
            # positional args only (self=0).
            with jax.named_scope(f"style_b{res}"):
                x, img, pp = block(x, img, cur_ws, pose_feat,
                                   cat_cast.get(res), noise_mode)
            if pp is not None:
                pred_parsing = pp
            if res == resolutions[-2]:
                x_256, img_256 = x, img
            w_idx += n_conv

        # Parsing-index map drives the SPADE texture branch.
        if gt_parsing is not None:
            parsing_index = gt_parsing
        else:
            probs = jax.nn.softmax(jax.lax.stop_gradient(pred_parsing), axis=-1)
            parsing_index = jnp.argmax(probs, axis=-1)[..., None].astype(jnp.float32)

        upper_mask = (
            (parsing_index == 1).astype(jnp.float32)
            + (parsing_index == 4).astype(jnp.float32)
        )
        lower_mask = (
            (parsing_index == 2).astype(jnp.float32)
            + (parsing_index == 3).astype(jnp.float32)
        )

        spade_encode = self._make_spade_encoder()
        enc_dtype = jnp.bfloat16 if self.num_bf16_res > 0 else jnp.float32
        # One encoder pass over [upper; lower] stacked on batch (per-sample
        # independent convs -> numerically identical to two passes, but the
        # 7x7 stem + 64-ch 512px resblocks run once at 2B instead of twice
        # at B — fewer op launches on the serving/train critical path).
        up_in, up_valid, up_res = self._spade_prepare(
            jax.lax.stop_gradient(upper_mask),
            denorm_upper_mask, denorm_upper_input)
        lo_in, lo_valid, lo_res = self._spade_prepare(
            jax.lax.stop_gradient(lower_mask),
            denorm_lower_mask, denorm_lower_input)
        with jax.named_scope("spade_encoder"):
            feat2 = spade_encode(
                jnp.concatenate([up_in, lo_in], axis=0).astype(enc_dtype))
        n = up_in.shape[0]
        spade_upper_feat = self._spade_fill(feat2[:n], up_valid, up_res)
        spade_lower_feat = self._spade_fill(feat2[n:], lo_valid, lo_res)

        upper_mask_256 = (_nearest_half(upper_mask) > 0.9).astype(jnp.float32)
        lower_mask_256 = (_nearest_half(lower_mask) > 0.9).astype(jnp.float32)
        spade_feat = (
            spade_upper_feat * upper_mask_256 + spade_lower_feat * lower_mask_256
        )

        res_256 = resolutions[-2]
        spade_dtype = jnp.bfloat16 if res_256 >= bf16_res else jnp.float32
        with jax.named_scope("spade_b256"):
            x_spade = spade_cls(res_256)(
                channels[res_256], channels[res_256], spade_channels=128,
                conv_clamp=self.conv_clamp, inner_remat=inner_remat,
                name="spade_b256_1")(
                    x_256.astype(spade_dtype), spade_feat.astype(spade_dtype))
            x_spade = spade_cls(res_256)(
                channels[res_256], channels[res_256], spade_channels=128,
                conv_clamp=self.conv_clamp, inner_remat=inner_remat,
                name="spade_b256_2")(
                    x_spade, spade_feat.astype(spade_dtype))

        res_512 = resolutions[-1]
        texture = texture_cls(res_512)(
            in_channels=channels[res_512 // 2],
            out_channels=channels[res_512],
            resolution=res_512,
            is_last=True,
            is_style=False,
            use_bf16=(res_512 >= bf16_res),
            inner_remat=inner_remat,
            name="texture_b512",
            **block_common,
        )
        last_ws = ws[:, self.num_ws - 3 : self.num_ws]
        with jax.named_scope("texture_b512"):
            _, finetune_img, _ = texture(
                x_spade.astype(_blk_dtype(res_512)), img_256, last_ws,
                pose_feat, cat_cast.get(res_512), parsing_index, noise_mode)

        return img, finetune_img, pred_parsing


class Generator(nn.Module):
    """Top-level generator: pose/style encoders + mapping + synthesis."""

    z_dim: int = 0
    c_dim: int = 512
    w_dim: int = 512
    img_resolution: int = 512
    img_channels: int = 3
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: Optional[float] = 256
    use_noise: bool = True
    mapping_layers: int = 1
    num_bf16_res: int = 0
    remat: bool = False
    remat_min_res: int = 0              # see SynthesisNetwork.remat_min_res
    spade_inner_remat: Optional[bool] = None

    def setup(self):
        self.synthesis = SynthesisNetwork(
            w_dim=self.w_dim,
            img_resolution=self.img_resolution,
            img_channels=self.img_channels,
            channel_base=self.channel_base,
            channel_max=self.channel_max,
            conv_clamp=self.conv_clamp,
            use_noise=self.use_noise,
            num_bf16_res=self.num_bf16_res,
            remat=self.remat,
            remat_min_res=self.remat_min_res,
            spade_inner_remat=self.spade_inner_remat,
        )
        self.num_ws = self.synthesis.num_ws
        self.mapping = MappingNetwork(
            z_dim=self.z_dim,
            c_dim=self.c_dim,
            w_dim=self.w_dim,
            num_ws=self.num_ws,
            num_layers=self.mapping_layers,
        )
        # Pose features feed the first synthesis block directly: channel
        # count and spatial size must match channels_dict[8] at 8x8. The
        # reference hardcodes 512/6-downs for the 512px model
        # (networks.py:2350); derived here so smaller test configs work.
        ch8 = min(self.channel_base // 8, self.channel_max)
        n_down = int(math.log2(self.img_resolution)) - 3
        # The 512px encoder activations (~270MB each in fp32) dominate the
        # training-step live set; remat them with the synthesis blocks.
        const_cls = nn.remat(ConstEncoderNetwork) if self.remat \
            else ConstEncoderNetwork
        style_cls = nn.remat(StyleEncoderNetwork) if self.remat \
            else StyleEncoderNetwork
        self.const_encoding = const_cls(
            input_nc=3 + 2, output_nc=ch8, ngf=max(ch8 // 8, 4),
            n_downsampling=n_down)
        self.style_encoding = style_cls(
            input_nc=10 * 3 + 5 * 3, output_nc=512, ngf=64)

    def __call__(self, z, c, retain, pose, denorm_upper_input,
                 denorm_lower_input, denorm_upper_mask, denorm_lower_mask,
                 gt_parsing=None, truncation_psi=1.0, truncation_cutoff=None,
                 update_w_avg=False, noise_mode="random", return_code=False):
        """Returns (coarse img, finetune img, pred_parsing), all NHWC;
        with return_code=True also the style code (gen_c) as a 4th element —
        the loss consumes it directly instead of re-running the style
        encoder, like the reference's single style_encoding call per
        accumulate_gradients (loss_fullbody.py:127-129).

        Args mirror GeneratorFull_v20.forward (networks.py:2353-2366):
            c:      [N, 45, 128, 128]-equivalent NHWC garment patch stack.
            retain: [N, 512, 512, 6] head/skin retain input.
            pose:   [N, 512, 512, 5] stick figure + conditioning maps.
            denorm_{upper,lower}_input: [N, 512, 512, 3] pasted garments.
            denorm_{upper,lower}_mask:  [N, 512, 512, 1].
        """
        from ..shapes import assert_shape

        n, res = c.shape[0], self.img_resolution
        # Trace-time input contracts (reference misc.assert_shape usage in
        # networks.py forward paths): catch NHWC mix-ups at the boundary.
        assert_shape(c, (n, res // 4, res // 4, 45), name="c")
        assert_shape(retain, (n, res, res, 6), name="retain")
        assert_shape(pose, (n, res, res, 5), name="pose")
        for nm, t in (("denorm_upper_input", denorm_upper_input),
                      ("denorm_lower_input", denorm_lower_input)):
            assert_shape(t, (n, res, res, 3), name=nm)
        for nm, t in (("denorm_upper_mask", denorm_upper_mask),
                      ("denorm_lower_mask", denorm_lower_mask)):
            assert_shape(t, (n, res, res, 1), name=nm)
        if gt_parsing is not None:
            assert_shape(gt_parsing, (n, res, res, 1), name="gt_parsing")
        # Named profiler scopes mirror the reference's record_function
        # taxonomy (torch_utils/misc.py:104-109 profiled_function usage).
        with jax.named_scope("const_encoding"):
            pose_feat = self.encode_pose(pose)
        with jax.named_scope("style_encoding"):
            stylecode, feats = self.encode_style(c, retain)
        with jax.named_scope("mapping"):
            ws = self.mapping(
                z, stylecode, truncation_psi=truncation_psi,
                truncation_cutoff=truncation_cutoff, update_w_avg=update_w_avg)
        cat_feats = {str(f.shape[1]): f for f in feats}
        with jax.named_scope("synthesis"):
            img, finetune, pred_parsing = self.synthesis(
                ws, pose_feat, cat_feats, denorm_upper_input,
                denorm_lower_input, denorm_upper_mask, denorm_lower_mask,
                gt_parsing, noise_mode=noise_mode)
        if return_code:
            return img, finetune, pred_parsing, stylecode
        return img, finetune, pred_parsing

    @property
    def _enc_dtype(self):
        """Compute dtype for the conditioning encoders (pose/style/retain).

        bf16 whenever the synthesis mixed-precision lever is on: these paths
        are conditioning-only (the reference runs its D in fp16 at the same
        resolutions) and their f32 convs at 512px are otherwise a large
        fixed cost per forward."""
        return jnp.bfloat16 if self.num_bf16_res > 0 else jnp.float32

    def encode_pose(self, pose):
        return self.const_encoding(pose.astype(self._enc_dtype))

    def encode_style(self, c, retain):
        """Style code (always returned fp32 — it feeds mapping/w) and the
        cat_feat pyramid (encoder compute dtype)."""
        stylecode, feats = self.style_encoding(
            c.astype(self._enc_dtype), retain.astype(self._enc_dtype))
        return stylecode.astype(jnp.float32), feats

    def style_and_ws(self, z, c, retain, truncation_psi=1.0):
        """Encoder+mapping half (used by the loss's run_G split)."""
        stylecode, feats = self.encode_style(c, retain)
        ws = self.mapping(z, stylecode, truncation_psi=truncation_psi)
        return stylecode, feats, ws
