"""Torch checkpoint → Flax parameter conversion for SAM2.

Accepts two naming schemes:
  * HuggingFace transformers `Sam2Model` state dicts (used by the test-suite
    parity oracle and by facebook/sam2.1-hiera-tiny HF checkpoints);
  * the original `sam2` package naming, which is what the reference pipeline's
    finetuned checkpoint `model.pth` uses (reference:
    atlas_patch/services/segmentation.py:60-68 loads `checkpoint["model"]`
    into SAM2Base) — translated key-by-key to the HF scheme first.

Array layout changes: Linear (out,in)→(in,out); Conv (O,I,kh,kw)→(kh,kw,I,O);
ConvTranspose (I,O,kh,kw)→(kh,kw,I,O) with spatial flip (lax.conv_transpose
convention); trunk positional embeddings NCHW→NHWC.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _linear(sd, prefix):
    return {
        "kernel": _np(sd[f"{prefix}.weight"]).T,
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _conv(sd, prefix):
    return {
        "kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _conv_transpose(sd, prefix):
    w = _np(sd[f"{prefix}.weight"])  # (I, O, kh, kw)
    kernel = w.transpose(2, 3, 0, 1)[::-1, ::-1]  # (kh, kw, I, O), flipped
    return {"kernel": np.ascontiguousarray(kernel), "bias": _np(sd[f"{prefix}.bias"])}


def _norm(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _feedforward(sd, prefix, num_layers):
    out = {
        "proj_in": _linear(sd, f"{prefix}.proj_in"),
        "proj_out": _linear(sd, f"{prefix}.proj_out"),
    }
    for i in range(num_layers - 2):
        out[f"layers_{i}"] = _linear(sd, f"{prefix}.layers.{i}")
    return out


def _decoder_attention(sd, prefix):
    return {
        "q_proj": _linear(sd, f"{prefix}.q_proj"),
        "k_proj": _linear(sd, f"{prefix}.k_proj"),
        "v_proj": _linear(sd, f"{prefix}.v_proj"),
        "o_proj": _linear(sd, f"{prefix}.o_proj"),
    }


def hf_to_flax(sd: Mapping[str, Any], cfg) -> dict:
    """HF transformers Sam2Model state dict → params for SAM2ImageModel."""
    n_blocks = sum(cfg.blocks_per_stage)

    backbone: dict[str, Any] = {
        "patch_embed": _conv(sd, "vision_encoder.backbone.patch_embed.projection"),
        "pos_embed": _np(sd["vision_encoder.backbone.pos_embed"]).transpose(0, 2, 3, 1),
        "pos_embed_window": _np(sd["vision_encoder.backbone.pos_embed_window"]).transpose(
            0, 2, 3, 1
        ),
    }
    for i in range(n_blocks):
        p = f"vision_encoder.backbone.blocks.{i}"
        block = {
            "layer_norm1": _norm(sd, f"{p}.layer_norm1"),
            "layer_norm2": _norm(sd, f"{p}.layer_norm2"),
            "attn": {
                "qkv": _linear(sd, f"{p}.attn.qkv"),
                "proj": _linear(sd, f"{p}.attn.proj"),
            },
            "mlp": _feedforward(sd, f"{p}.mlp", 2),
        }
        if f"{p}.proj.weight" in sd:
            block["proj"] = _linear(sd, f"{p}.proj")
        backbone[f"blocks_{i}"] = block

    neck = {
        f"convs_{i}": _conv(sd, f"vision_encoder.neck.convs.{i}")
        for i in range(len(cfg.backbone_channel_list))
    }

    prompt_encoder = {
        "shared_embedding": {
            "positional_embedding": _np(
                sd.get(
                    "prompt_encoder.shared_embedding.positional_embedding",
                    sd.get("shared_image_embedding.positional_embedding"),
                )
            )
        },
        "point_embed": _np(sd["prompt_encoder.point_embed.weight"]),
        "not_a_point_embed": _np(sd["prompt_encoder.not_a_point_embed.weight"]),
        "no_mask_embed": _np(sd["prompt_encoder.no_mask_embed.weight"]),
    }

    transformer: dict[str, Any] = {}
    for i in range(cfg.decoder_num_layers):
        p = f"mask_decoder.transformer.layers.{i}"
        transformer[f"layers_{i}"] = {
            "self_attn": _decoder_attention(sd, f"{p}.self_attn"),
            "cross_attn_token_to_image": _decoder_attention(
                sd, f"{p}.cross_attn_token_to_image"
            ),
            "cross_attn_image_to_token": _decoder_attention(
                sd, f"{p}.cross_attn_image_to_token"
            ),
            "mlp": _feedforward(sd, f"{p}.mlp", 2),  # block MLP is always lin1/lin2
            "layer_norm1": _norm(sd, f"{p}.layer_norm1"),
            "layer_norm2": _norm(sd, f"{p}.layer_norm2"),
            "layer_norm3": _norm(sd, f"{p}.layer_norm3"),
            "layer_norm4": _norm(sd, f"{p}.layer_norm4"),
        }
    transformer["final_attn_token_to_image"] = _decoder_attention(
        sd, "mask_decoder.transformer.final_attn_token_to_image"
    )
    transformer["layer_norm_final_attn"] = _norm(
        sd, "mask_decoder.transformer.layer_norm_final_attn"
    )

    num_mask_tokens = cfg.num_multimask_outputs + 1
    mask_decoder: dict[str, Any] = {
        "obj_score_token": _np(sd["mask_decoder.obj_score_token.weight"]),
        "iou_token": _np(sd["mask_decoder.iou_token.weight"]),
        "mask_tokens": _np(sd["mask_decoder.mask_tokens.weight"]),
        "transformer": transformer,
        "upscale_conv1": _conv_transpose(sd, "mask_decoder.upscale_conv1"),
        "upscale_conv2": _conv_transpose(sd, "mask_decoder.upscale_conv2"),
        "upscale_layer_norm": _norm(sd, "mask_decoder.upscale_layer_norm"),
        "iou_prediction_head": _feedforward(
            sd, "mask_decoder.iou_prediction_head", cfg.iou_head_depth
        ),
        "pred_obj_score_head": _feedforward(sd, "mask_decoder.pred_obj_score_head", 3),
    }
    for i in range(num_mask_tokens):
        mask_decoder[f"output_hypernetworks_mlps_{i}"] = _feedforward(
            sd, f"mask_decoder.output_hypernetworks_mlps.{i}", 3
        )

    return {
        "backbone": backbone,
        "neck": neck,
        "prompt_encoder": prompt_encoder,
        "mask_decoder": mask_decoder,
        "conv_s0": _conv(sd, "mask_decoder.conv_s0"),
        "conv_s1": _conv(sd, "mask_decoder.conv_s1"),
        "no_memory_embedding": _np(sd["no_memory_embedding"]),
    }


# --- original `sam2` package key scheme --------------------------------------------
def _original_to_hf_key(key: str) -> str | None:
    """Translate an original-sam2 state-dict key to the HF scheme; None = skip
    (video-only modules the image path never uses)."""
    drop_prefixes = (
        "memory_attention.",
        "memory_encoder.",
        "mask_downsample.",
        "obj_ptr_proj.",
        "obj_ptr_tpos_proj.",
    )
    drop_exact = {
        "no_mem_pos_enc",
        "no_obj_ptr",
        "no_obj_embed_spatial",
        "maskmem_tpos_enc",
    }
    if key in drop_exact or any(key.startswith(p) for p in drop_prefixes):
        return None

    k = key
    k = k.replace("image_encoder.trunk.", "vision_encoder.backbone.")
    k = k.replace("image_encoder.neck.", "vision_encoder.neck.")
    k = k.replace("patch_embed.proj.", "patch_embed.projection.")
    # neck convs: original wraps conv in a submodule
    k = k.replace(".conv.weight", ".weight").replace(".conv.bias", ".bias")
    # trunk block norms
    k = k.replace(".norm1.", ".layer_norm1.").replace(".norm2.", ".layer_norm2.")
    # trunk MLP: original MLP uses layers.0 / layers.1
    if "vision_encoder.backbone.blocks." in k and ".mlp.layers." in k:
        k = k.replace(".mlp.layers.0.", ".mlp.proj_in.")
        k = k.replace(".mlp.layers.1.", ".mlp.proj_out.")

    k = k.replace("sam_prompt_encoder.", "prompt_encoder.")
    k = k.replace(
        "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix",
        "prompt_encoder.shared_embedding.positional_embedding",
    )
    if "prompt_encoder.point_embeddings." in k:
        # original: 4 separate Embedding(1, C); HF: one Embedding(4, C). Handled
        # specially in original_to_flax; mark with a sentinel passthrough.
        return key
    k = k.replace("prompt_encoder.mask_downscaling.", "prompt_encoder.mask_embed.")

    k = k.replace("sam_mask_decoder.", "mask_decoder.")
    # two-way transformer norms + out_proj
    if "mask_decoder.transformer." in k:
        k = k.replace(".norm1.", ".layer_norm1.").replace(".norm2.", ".layer_norm2.")
        k = k.replace(".norm3.", ".layer_norm3.").replace(".norm4.", ".layer_norm4.")
        k = k.replace("transformer.norm_final_attn.", "transformer.layer_norm_final_attn.")
        k = k.replace(".out_proj.", ".o_proj.")
        # MLPBlock lin1/lin2 → proj_in/proj_out
        k = k.replace(".mlp.lin1.", ".mlp.proj_in.").replace(".mlp.lin2.", ".mlp.proj_out.")
    # output upscaling Sequential: 0=convT,1=LN,3=convT
    k = k.replace("mask_decoder.output_upscaling.0.", "mask_decoder.upscale_conv1.")
    k = k.replace("mask_decoder.output_upscaling.1.", "mask_decoder.upscale_layer_norm.")
    k = k.replace("mask_decoder.output_upscaling.3.", "mask_decoder.upscale_conv2.")
    # 3-layer MLP heads: layers.{0,1,2} → proj_in / layers.0 / proj_out
    for head in (
        "output_hypernetworks_mlps.0",
        "output_hypernetworks_mlps.1",
        "output_hypernetworks_mlps.2",
        "output_hypernetworks_mlps.3",
        "iou_prediction_head",
        "pred_obj_score_head",
    ):
        base = f"mask_decoder.{head}.layers."
        if base + "0." in k:
            k = k.replace(base + "0.", f"mask_decoder.{head}.proj_in.")
        elif base + "2." in k:
            k = k.replace(base + "2.", f"mask_decoder.{head}.proj_out.")
        elif base + "1." in k:
            k = k.replace(base + "1.", f"mask_decoder.{head}.layers.0.")

    if k == "no_mem_embed":
        return "no_memory_embedding"
    return k


def original_to_flax(sd: Mapping[str, Any], cfg) -> dict:
    """Original sam2-package state dict (the reference checkpoint format) → params."""
    hf_sd: dict[str, Any] = {}
    point_rows: dict[int, np.ndarray] = {}
    for key, value in sd.items():
        mapped = _original_to_hf_key(key)
        if mapped is None:
            continue
        if "prompt_encoder.point_embeddings." in mapped:
            idx = int(mapped.split("point_embeddings.")[1].split(".")[0])
            point_rows[idx] = _np(value).reshape(-1)
            continue
        hf_sd[mapped] = value
    if point_rows:
        hf_sd["prompt_encoder.point_embed.weight"] = np.stack(
            [point_rows[i] for i in sorted(point_rows)], axis=0
        )
    return hf_to_flax(hf_sd, cfg)


def load_checkpoint(path: str, cfg) -> dict:
    """Load a torch .pth/.pt checkpoint (original or HF naming) into Flax params."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    keys = list(ckpt.keys())
    if any(k.startswith("image_encoder.trunk") for k in keys):
        return original_to_flax(ckpt, cfg)
    if any(k.startswith("sam2.") for k in keys):
        ckpt = {k[len("sam2.") :]: v for k, v in ckpt.items()}
    return hf_to_flax(ckpt, cfg)
