"""SAM2 prompt encoder, two-way transformer, and mask decoder in Flax.

Image-prediction path only (the reference's usage: a full-frame box prompt per
thumbnail, multimask_output=False — reference: atlas_patch/services/
segmentation.py:128-136). Semantics mirror SAM2's SAM-head modules; all shapes
static, NHWC feature maps.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from atlaspatch_tpu.models.sam2.config import SAM2Config


class FeedForward(nn.Module):
    """proj_in → act → hidden layers → proj_out (+ optional sigmoid)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    activation: str = "relu"
    sigmoid_output: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = {"relu": jax.nn.relu, "gelu": lambda v: jax.nn.gelu(v, approximate=False)}[
            self.activation
        ]
        x = act(nn.Dense(self.hidden_dim, name="proj_in")(x))
        for i in range(self.num_layers - 2):
            x = act(nn.Dense(self.hidden_dim, name=f"layers_{i}")(x))
        x = nn.Dense(self.output_dim, name="proj_out")(x)
        if self.sigmoid_output:
            x = jax.nn.sigmoid(x)
        return x


class RandomPositionalEmbedding(nn.Module):
    """Random-Fourier positional encoding for normalized [0,1] coordinates."""

    hidden_size: int
    scale: float = 1.0

    @nn.compact
    def __call__(self, coords01: jnp.ndarray) -> jnp.ndarray:
        # Gaussian projection matrix is part of the checkpoint (a buffer in the
        # torch model); stored here as a non-learned param filled at conversion.
        gaussian = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=self.scale),
            (2, self.hidden_size // 2),
        )
        coords = 2.0 * coords01 - 1.0
        proj = (2.0 * math.pi) * (coords @ gaussian)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


class PromptEncoder(nn.Module):
    """Encodes box/point prompts into sparse tokens + dense embedding."""

    cfg: SAM2Config

    def setup(self):
        cfg = self.cfg
        self.shared_embedding = RandomPositionalEmbedding(
            cfg.prompt_hidden_size, name="shared_embedding"
        )
        self.point_embed = self.param(
            "point_embed", nn.initializers.normal(0.02), (4, cfg.prompt_hidden_size)
        )
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(0.02), (1, cfg.prompt_hidden_size)
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(0.02), (1, cfg.prompt_hidden_size)
        )

    @property
    def image_embedding_size(self) -> int:
        return self.cfg.image_size // 16

    def embed_boxes(self, boxes: jnp.ndarray) -> jnp.ndarray:
        """(B, P, 4) xyxy in image pixels → (B, P, 3, C) sparse tokens
        [top-left + PE2, bottom-right + PE3, not-a-point pad]."""
        cfg = self.cfg
        coords = (boxes + 0.5).reshape(*boxes.shape[:2], 2, 2) / cfg.image_size
        corner_pe = self.shared_embedding(coords)
        tl = corner_pe[:, :, 0, :] + self.point_embed[2]
        br = corner_pe[:, :, 1, :] + self.point_embed[3]
        pad = jnp.broadcast_to(self.not_a_point_embed[0], tl.shape)
        return jnp.stack([tl, br, pad], axis=2)

    def embed_points(self, points: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        """(B, P, N, 2) pixel coords + (B, P, N) labels → (B, P, N+1, C)."""
        cfg = self.cfg
        points = points + 0.5
        points = jnp.pad(points, ((0, 0), (0, 0), (0, 1), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, 0), (0, 1)), constant_values=-1)
        pe = self.shared_embedding(points / cfg.image_size)
        pe = jnp.where(labels[..., None] == -1, self.not_a_point_embed[0], pe)
        pe = jnp.where(labels[..., None] != -10, pe, jnp.zeros_like(pe))
        picked = jnp.take(self.point_embed, jnp.clip(labels, 0, None), axis=0)
        return pe + picked * (labels >= 0)[..., None]

    def dense_no_mask(self, batch_size: int) -> jnp.ndarray:
        s = self.image_embedding_size
        return jnp.broadcast_to(
            self.no_mask_embed[0][None, None, None, :],
            (batch_size, s, s, self.cfg.prompt_hidden_size),
        )

    def image_wide_pe(self) -> jnp.ndarray:
        """(1, S, S, C) dense positional encoding over the image embedding grid."""
        s = self.image_embedding_size
        grid = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
        yx = jnp.stack(jnp.meshgrid(grid, grid, indexing="ij"), axis=-1)  # (S,S,[y,x])
        coords = jnp.stack([yx[..., 1], yx[..., 0]], axis=-1)  # (S,S,[x,y])
        return self.shared_embedding(coords)[None]

    def __call__(self, boxes: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        sparse = self.embed_boxes(boxes)
        dense = self.dense_no_mask(boxes.shape[0])
        return sparse, dense


class DecoderAttention(nn.Module):
    """Attention with optional internal downsampling (SAM two-way transformer)."""

    hidden_size: int
    num_heads: int
    downsample_rate: int = 1

    @nn.compact
    def __call__(self, q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        internal = self.hidden_size // self.downsample_rate
        head_dim = internal // self.num_heads
        B, P = q.shape[:2]

        def split(x):
            return x.reshape(B * P, -1, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        qh = split(nn.Dense(internal, name="q_proj")(q))
        kh = split(nn.Dense(internal, name="k_proj")(k))
        vh = split(nn.Dense(internal, name="v_proj")(v))
        attn = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * (head_dim**-0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(qh.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, P, -1, internal)
        return nn.Dense(self.hidden_size, name="o_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    cfg: SAM2Config
    skip_first_layer_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        cfg = self.cfg
        heads = cfg.decoder_num_heads
        hs = cfg.prompt_hidden_size

        if self.skip_first_layer_pe:
            queries = DecoderAttention(hs, heads, 1, name="self_attn")(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + DecoderAttention(hs, heads, 1, name="self_attn")(q, q, queries)
        queries = nn.LayerNorm(name="layer_norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DecoderAttention(
            hs, heads, cfg.attention_downsample_rate, name="cross_attn_token_to_image"
        )(q, k, keys)
        queries = nn.LayerNorm(name="layer_norm2")(queries)

        # the per-block MLP is structurally lin1/lin2 (2 Dense layers) in
        # SAM2's TwoWayAttentionBlock regardless of how many transformer
        # layers the decoder stacks — decoder_num_layers is NOT its depth
        queries = queries + FeedForward(
            cfg.decoder_mlp_dim, hs, num_layers=2, name="mlp"
        )(queries)
        queries = nn.LayerNorm(name="layer_norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DecoderAttention(
            hs, heads, cfg.attention_downsample_rate, name="cross_attn_image_to_token"
        )(k, q, queries)
        keys = nn.LayerNorm(name="layer_norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    cfg: SAM2Config

    @nn.compact
    def __call__(self, point_embeddings, image_embeddings, image_pe):
        """point_embeddings (B,P,T,C); image_embeddings/image_pe (B,P,HW,C)."""
        cfg = self.cfg
        queries, keys = point_embeddings, image_embeddings
        for i in range(cfg.decoder_num_layers):
            queries, keys = TwoWayAttentionBlock(
                cfg, skip_first_layer_pe=(i == 0), name=f"layers_{i}"
            )(queries, keys, point_embeddings, image_pe)
        q = queries + point_embeddings
        k = keys + image_pe
        queries = queries + DecoderAttention(
            cfg.prompt_hidden_size,
            cfg.decoder_num_heads,
            cfg.attention_downsample_rate,
            name="final_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(name="layer_norm_final_attn")(queries)
        return queries, keys


class MaskDecoder(nn.Module):
    cfg: SAM2Config

    @nn.compact
    def __call__(
        self,
        image_embeddings: jnp.ndarray,  # (B, S, S, C) NHWC, dense prompt already added by caller? no: added here
        image_pe: jnp.ndarray,  # (1 or B, S, S, C)
        sparse_prompt: jnp.ndarray,  # (B, P, T, C)
        dense_prompt: jnp.ndarray,  # (B, S, S, C)
        high_res_feats: tuple[jnp.ndarray, jnp.ndarray],  # NHWC (4S,4S,C/8), (2S,2S,C/4)
        multimask_output: bool,
    ):
        cfg = self.cfg
        hs = cfg.prompt_hidden_size
        num_mask_tokens = cfg.num_multimask_outputs + 1
        B, S = image_embeddings.shape[0], image_embeddings.shape[1]
        P = sparse_prompt.shape[1]

        obj_score_token = self.param(
            "obj_score_token", nn.initializers.normal(0.02), (1, hs)
        )
        iou_token = self.param("iou_token", nn.initializers.normal(0.02), (1, hs))
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(0.02), (num_mask_tokens, hs)
        )

        output_tokens = jnp.concatenate([obj_score_token, iou_token, mask_tokens], axis=0)
        output_tokens = jnp.broadcast_to(output_tokens[None, None], (B, P, *output_tokens.shape))
        tokens = jnp.concatenate([output_tokens, sparse_prompt], axis=2)

        src = image_embeddings + dense_prompt
        src = jnp.broadcast_to(src[:, None], (B, P, S, S, hs)).reshape(B, P, S * S, hs)
        pe = jnp.broadcast_to(image_pe[:, None], (B, P, S, S, hs)).reshape(B, P, S * S, hs)

        point_out, image_out = TwoWayTransformer(cfg, name="transformer")(tokens, src, pe)
        iou_token_out = point_out[:, :, 1, :]
        mask_tokens_out = point_out[:, :, 2 : 2 + num_mask_tokens, :]

        # Upscale image embedding (stride16 → stride4) with skip connections.
        img = image_out.reshape(B * P, S, S, hs)
        feat_s0, feat_s1 = high_res_feats
        feat_s0 = jnp.repeat(feat_s0, P, axis=0)
        feat_s1 = jnp.repeat(feat_s1, P, axis=0)
        up = nn.ConvTranspose(
            hs // 4, kernel_size=(2, 2), strides=(2, 2), name="upscale_conv1"
        )(img)
        up = up + feat_s1
        up = nn.LayerNorm(name="upscale_layer_norm")(up)
        up = jax.nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(
            hs // 8, kernel_size=(2, 2), strides=(2, 2), name="upscale_conv2"
        )(up)
        up = jax.nn.gelu(up + feat_s0, approximate=False)

        hyper_in = jnp.stack(
            [
                FeedForward(hs, hs // 8, 3, name=f"output_hypernetworks_mlps_{i}")(
                    mask_tokens_out[:, :, i, :]
                )
                for i in range(num_mask_tokens)
            ],
            axis=2,
        )  # (B, P, num_mask_tokens, C/8)
        Hu, Wu = up.shape[1], up.shape[2]
        up_flat = up.reshape(B, P, Hu * Wu, hs // 8)
        masks = jnp.einsum("bpmc,bpnc->bpmn", hyper_in, up_flat).reshape(
            B, P, num_mask_tokens, Hu, Wu
        )

        iou_pred = FeedForward(
            cfg.iou_head_hidden_dim,
            num_mask_tokens,
            cfg.iou_head_depth,
            sigmoid_output=True,
            name="iou_prediction_head",
        )(iou_token_out)
        object_score_logits = FeedForward(hs, 1, 3, name="pred_obj_score_head")(
            point_out[:, :, 0, :]
        )

        if multimask_output:
            masks = masks[:, :, 1:]
            iou_pred = iou_pred[:, :, 1:]
        elif cfg.dynamic_multimask_via_stability:
            masks, iou_pred = self._dynamic_multimask(masks, iou_pred)
        else:
            masks = masks[:, :, 0:1]
            iou_pred = iou_pred[:, :, 0:1]

        return masks, iou_pred, object_score_logits

    def _dynamic_multimask(self, all_masks, all_iou):
        """Fall back to best multimask output when the single mask is unstable."""
        cfg = self.cfg
        multimask = all_masks[:, :, 1:]
        multi_iou = all_iou[:, :, 1:]
        best = jnp.argmax(multi_iou, axis=-1)  # (B,P)
        best_masks = jnp.take_along_axis(
            multimask, best[..., None, None, None], axis=2
        )  # (B,P,1,H,W)
        best_iou = jnp.take_along_axis(multi_iou, best[..., None], axis=-1)

        single = all_masks[:, :, 0:1]
        single_iou = all_iou[:, :, 0:1]
        delta = cfg.dynamic_multimask_stability_delta
        flat = single.reshape(*single.shape[:3], -1)
        area_i = jnp.sum(flat > delta, axis=-1).astype(jnp.float32)
        area_u = jnp.sum(flat > -delta, axis=-1).astype(jnp.float32)
        stability = jnp.where(area_u > 0, area_i / area_u, 1.0)
        is_stable = stability >= cfg.dynamic_multimask_stability_thresh

        masks = jnp.where(is_stable[..., None, None], single, best_masks)
        iou = jnp.where(is_stable, single_iou, best_iou)
        return masks, iou
