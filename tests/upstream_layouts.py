"""Synthetic upstream-layout checkpoint generators for the converter harness.

For every converter family, build a state dict with the exact upstream key
naming (timm / transformers / open_clip / torchvision / torchscale) whose
shapes invert the converter's transposes/concats/splits against the Flax
model's own init-shape tree. Running the production converter over these and
comparing structure+shapes against ``model.init`` validates each zoo entry's
converter↔model consistency at its real configuration (dims, heads, packed
SwiGLU, register tokens, pooling heads, projections) without network access.

Upstream naming sources mirrored here (reference files for the quirks):
CHIEF old-layout downsample remap chief_ctranspath.py:141-151, HF CLIP's
``pre_layrnorm`` typo, DINOv3 bias-free k_proj, MUSK torchscale 'A' experts.
"""

from __future__ import annotations

import numpy as np


def _z(shape) -> np.ndarray:
    return np.zeros(tuple(int(s) for s in shape), np.float32)


def _inv_lin(sd, key, t) -> None:
    """Target {kernel (in,out), bias? (out,)} → torch Linear (out,in)/(out,)."""
    sd[f"{key}.weight"] = _z(t["kernel"].shape[::-1])
    if "bias" in t:
        sd[f"{key}.bias"] = _z(t["bias"].shape)


def _inv_ln(sd, key, t) -> None:
    sd[f"{key}.weight"] = _z(t["scale"].shape)
    sd[f"{key}.bias"] = _z(t["bias"].shape)


def _inv_patch_conv(sd, key, t) -> None:
    kh, kw, cin, cout = t["kernel"].shape
    sd[f"{key}.weight"] = _z((cout, cin, kh, kw))
    if "bias" in t:
        sd[f"{key}.bias"] = _z((cout,))


def _inv_bn(sd, key, t) -> None:
    sd[f"{key}.weight"] = _z(t["scale"].shape)
    sd[f"{key}.bias"] = _z(t["bias"].shape)
    sd[f"{key}.running_mean"] = _z(t["mean"].shape)
    sd[f"{key}.running_var"] = _z(t["var"].shape)


def _inv_qkv_packed(sd, wkey, bkey, t) -> None:
    d, d3 = t["kernel"].shape
    sd[wkey] = _z((d3, d))
    if "bias" in t:
        sd[bkey] = _z((d3,))


def _inv_qkv_separate(sd, q, k, v, t, *, skip_bias=()) -> None:
    d, d3 = t["kernel"].shape
    per = d3 // 3
    for name in (q, k, v):
        sd[f"{name}.weight"] = _z((per, d))
    if "bias" in t:
        for name in (q, k, v):
            if name not in skip_bias:
                sd[f"{name}.bias"] = _z((per,))


# --- ViT families ---------------------------------------------------------------------


def timm_vit_sd(spec, t, *, key_prefix: str = "") -> dict:
    g = lambda k: key_prefix + k  # noqa: E731
    sd: dict = {}
    _inv_patch_conv(sd, g("patch_embed.proj"), t["patch_embed"])
    sd[g("pos_embed")] = _z(t["pos_embed"].shape)
    _inv_ln(sd, g("norm"), t["norm"])
    if "cls_token" in t:
        sd[g("cls_token")] = _z(t["cls_token"].shape)
    if "reg_token" in t:
        sd[g("reg_token")] = _z(t["reg_token"].shape)
    for i in range(spec.depth):
        b = t[f"blocks_{i}"]
        p = g(f"blocks.{i}")
        _inv_ln(sd, f"{p}.norm1", b["norm1"])
        _inv_ln(sd, f"{p}.norm2", b["norm2"])
        _inv_qkv_packed(sd, f"{p}.attn.qkv.weight", f"{p}.attn.qkv.bias", b["attn"]["qkv"])
        _inv_lin(sd, f"{p}.attn.proj", b["attn"]["proj"])
        _inv_lin(sd, f"{p}.mlp.fc1", b["mlp"]["fc1"])
        _inv_lin(sd, f"{p}.mlp.fc2", b["mlp"]["fc2"])
        if "ls1" in b:
            sd[f"{p}.ls1.gamma"] = _z(b["ls1"].shape)
            sd[f"{p}.ls2.gamma"] = _z(b["ls2"].shape)
    if "proj" in t and not key_prefix:  # CONCH v1.5-style Linear projection
        sd[g("proj.weight")] = _z(t["proj"]["kernel"].shape[::-1])
    return sd


def hf_vit_sd(spec, t, *, prefix: str = "vit.") -> dict:
    g = lambda k: prefix + k  # noqa: E731
    sd: dict = {}
    _inv_patch_conv(sd, g("embeddings.patch_embeddings.projection"), t["patch_embed"])
    sd[g("embeddings.cls_token")] = _z(t["cls_token"].shape)
    sd[g("embeddings.position_embeddings")] = _z(t["pos_embed"].shape)
    _inv_ln(sd, g("layernorm"), t["norm"])
    for i in range(spec.depth):
        b = t[f"blocks_{i}"]
        p = g(f"encoder.layer.{i}")
        _inv_ln(sd, f"{p}.layernorm_before", b["norm1"])
        _inv_ln(sd, f"{p}.layernorm_after", b["norm2"])
        _inv_qkv_separate(
            sd,
            f"{p}.attention.attention.query",
            f"{p}.attention.attention.key",
            f"{p}.attention.attention.value",
            b["attn"]["qkv"],
        )
        _inv_lin(sd, f"{p}.attention.output.dense", b["attn"]["proj"])
        _inv_lin(sd, f"{p}.intermediate.dense", b["mlp"]["fc1"])
        _inv_lin(sd, f"{p}.output.dense", b["mlp"]["fc2"])
    return sd


def hf_dinov2_sd(spec, t, *, prefix: str = "dinov2.") -> dict:
    g = lambda k: prefix + k  # noqa: E731
    sd: dict = {}
    _inv_patch_conv(sd, g("embeddings.patch_embeddings.projection"), t["patch_embed"])
    sd[g("embeddings.cls_token")] = _z(t["cls_token"].shape)
    sd[g("embeddings.position_embeddings")] = _z(t["pos_embed"].shape)
    _inv_ln(sd, g("layernorm"), t["norm"])
    if "reg_token" in t:
        sd[g("embeddings.register_tokens")] = _z(t["reg_token"].shape)
    for i in range(spec.depth):
        b = t[f"blocks_{i}"]
        p = g(f"encoder.layer.{i}")
        _inv_ln(sd, f"{p}.norm1", b["norm1"])
        _inv_ln(sd, f"{p}.norm2", b["norm2"])
        _inv_qkv_separate(
            sd,
            f"{p}.attention.attention.query",
            f"{p}.attention.attention.key",
            f"{p}.attention.attention.value",
            b["attn"]["qkv"],
        )
        _inv_lin(sd, f"{p}.attention.output.dense", b["attn"]["proj"])
        if spec.swiglu:
            _inv_lin(sd, f"{p}.mlp.weights_in", b["mlp"]["fc1"])
            _inv_lin(sd, f"{p}.mlp.weights_out", b["mlp"]["fc2"])
        else:
            _inv_lin(sd, f"{p}.mlp.fc1", b["mlp"]["fc1"])
            _inv_lin(sd, f"{p}.mlp.fc2", b["mlp"]["fc2"])
        sd[f"{p}.layer_scale1.lambda1"] = _z(b["ls1"].shape)
        sd[f"{p}.layer_scale2.lambda1"] = _z(b["ls2"].shape)
    return sd


def hf_dinov3_sd(spec, t) -> dict:
    sd: dict = {}
    _inv_patch_conv(sd, "embeddings.patch_embeddings", t["patch_embed"])
    sd["embeddings.cls_token"] = _z(t["cls_token"].shape)
    _inv_ln(sd, "layernorm", t["norm"])
    if "reg_token" in t:
        sd["embeddings.register_tokens"] = _z(t["reg_token"].shape)
    for i in range(spec.depth):
        b = t[f"blocks_{i}"]
        p = f"layer.{i}"
        _inv_ln(sd, f"{p}.norm1", b["norm1"])
        _inv_ln(sd, f"{p}.norm2", b["norm2"])
        # DINOv3 k_proj carries no bias upstream; converter zero-fills it.
        _inv_qkv_separate(
            sd,
            f"{p}.attention.q_proj",
            f"{p}.attention.k_proj",
            f"{p}.attention.v_proj",
            b["attn"]["qkv"],
            skip_bias=(f"{p}.attention.k_proj",),
        )
        _inv_lin(sd, f"{p}.attention.o_proj", b["attn"]["proj"])
        if spec.gated_mlp:
            _inv_lin(sd, f"{p}.mlp.gate_proj", b["mlp"]["fc_gate"])
            _inv_lin(sd, f"{p}.mlp.up_proj", b["mlp"]["fc_up"])
            _inv_lin(sd, f"{p}.mlp.down_proj", b["mlp"]["fc2"])
        else:
            _inv_lin(sd, f"{p}.mlp.up_proj", b["mlp"]["fc1"])
            _inv_lin(sd, f"{p}.mlp.down_proj", b["mlp"]["fc2"])
        sd[f"{p}.layer_scale1.lambda1"] = _z(b["ls1"].shape)
        sd[f"{p}.layer_scale2.lambda1"] = _z(b["ls2"].shape)
    return sd


def open_clip_vit_sd(spec, t, *, prefix: str = "visual.") -> dict:
    g = lambda k: prefix + k  # noqa: E731
    sd: dict = {}
    kh, kw, cin, cout = t["patch_embed"]["kernel"].shape
    sd[g("conv1.weight")] = _z((cout, cin, kh, kw))
    sd[g("class_embedding")] = _z((t["cls_token"].shape[-1],))
    sd[g("positional_embedding")] = _z(t["pos_embed"].shape[1:])
    _inv_ln(sd, g("ln_pre"), t["ln_pre"])
    _inv_ln(sd, g("ln_post"), t["norm"])
    if "proj" in t:
        sd[g("proj")] = _z(t["proj"]["kernel"].shape)  # copied without transpose
    for i in range(spec.depth):
        b = t[f"blocks_{i}"]
        p = g(f"transformer.resblocks.{i}")
        _inv_ln(sd, f"{p}.ln_1", b["norm1"])
        _inv_ln(sd, f"{p}.ln_2", b["norm2"])
        _inv_qkv_packed(sd, f"{p}.attn.in_proj_weight", f"{p}.attn.in_proj_bias", b["attn"]["qkv"])
        _inv_lin(sd, f"{p}.attn.out_proj", b["attn"]["proj"])
        _inv_lin(sd, f"{p}.mlp.c_fc", b["mlp"]["fc1"])
        _inv_lin(sd, f"{p}.mlp.c_proj", b["mlp"]["fc2"])
    return sd


def hf_clip_sd(spec, t, *, prefix: str = "vision_model.") -> dict:
    g = lambda k: prefix + k  # noqa: E731
    sd: dict = {}
    kh, kw, cin, cout = t["patch_embed"]["kernel"].shape
    sd[g("embeddings.patch_embedding.weight")] = _z((cout, cin, kh, kw))
    sd[g("embeddings.class_embedding")] = _z((t["cls_token"].shape[-1],))
    sd[g("embeddings.position_embedding.weight")] = _z(t["pos_embed"].shape[1:])
    _inv_ln(sd, g("pre_layrnorm"), t["ln_pre"])  # HF's historical typo, kept upstream
    _inv_ln(sd, g("post_layernorm"), t["norm"])
    if "proj" in t:
        sd["visual_projection.weight"] = _z(t["proj"]["kernel"].shape[::-1])
    for i in range(spec.depth):
        b = t[f"blocks_{i}"]
        p = g(f"encoder.layers.{i}")
        _inv_ln(sd, f"{p}.layer_norm1", b["norm1"])
        _inv_ln(sd, f"{p}.layer_norm2", b["norm2"])
        _inv_qkv_separate(
            sd, f"{p}.self_attn.q_proj", f"{p}.self_attn.k_proj", f"{p}.self_attn.v_proj",
            b["attn"]["qkv"],
        )
        _inv_lin(sd, f"{p}.self_attn.out_proj", b["attn"]["proj"])
        _inv_lin(sd, f"{p}.mlp.fc1", b["mlp"]["fc1"])
        _inv_lin(sd, f"{p}.mlp.fc2", b["mlp"]["fc2"])
    return sd


def hf_siglip_sd(spec, t, *, prefix: str = "vision_model.") -> dict:
    g = lambda k: prefix + k  # noqa: E731
    sd: dict = {}
    _inv_patch_conv(sd, g("embeddings.patch_embedding"), t["patch_embed"])
    sd[g("embeddings.position_embedding.weight")] = _z(t["pos_embed"].shape[1:])
    _inv_ln(sd, g("post_layernorm"), t["norm"])
    for i in range(spec.depth):
        b = t[f"blocks_{i}"]
        p = g(f"encoder.layers.{i}")
        _inv_ln(sd, f"{p}.layer_norm1", b["norm1"])
        _inv_ln(sd, f"{p}.layer_norm2", b["norm2"])
        _inv_qkv_separate(
            sd, f"{p}.self_attn.q_proj", f"{p}.self_attn.k_proj", f"{p}.self_attn.v_proj",
            b["attn"]["qkv"],
        )
        _inv_lin(sd, f"{p}.self_attn.out_proj", b["attn"]["proj"])
        _inv_lin(sd, f"{p}.mlp.fc1", b["mlp"]["fc1"])
        _inv_lin(sd, f"{p}.mlp.fc2", b["mlp"]["fc2"])
    h = t["head"]
    hp = g("head")
    d = h["q_proj"]["kernel"].shape[0]
    sd[f"{hp}.probe"] = _z(h["probe"].shape)
    sd[f"{hp}.attention.in_proj_weight"] = _z((3 * d, d))
    sd[f"{hp}.attention.in_proj_bias"] = _z((3 * d,))
    _inv_lin(sd, f"{hp}.attention.out_proj", h["out_proj"])
    _inv_ln(sd, f"{hp}.layernorm", h["norm"])
    _inv_lin(sd, f"{hp}.mlp.fc1", h["mlp"]["fc1"])
    _inv_lin(sd, f"{hp}.mlp.fc2", h["mlp"]["fc2"])
    return sd


def open_clip_timm_tower_sd(spec, t) -> dict:
    trunk_t = {k: v for k, v in t.items() if k != "proj"}
    sd = timm_vit_sd(spec, trunk_t, key_prefix="visual.trunk.")
    if "proj" in t:
        sd["visual.head.proj.weight"] = _z(t["proj"]["kernel"].shape[::-1])
    return sd


def torchvision_vit_sd(spec, t) -> dict:
    sd: dict = {}
    _inv_patch_conv(sd, "conv_proj", t["patch_embed"])
    sd["class_token"] = _z(t["cls_token"].shape)
    sd["encoder.pos_embedding"] = _z(t["pos_embed"].shape)
    _inv_ln(sd, "encoder.ln", t["norm"])
    for i in range(spec.depth):
        b = t[f"blocks_{i}"]
        p = f"encoder.layers.encoder_layer_{i}"
        _inv_ln(sd, f"{p}.ln_1", b["norm1"])
        _inv_ln(sd, f"{p}.ln_2", b["norm2"])
        _inv_qkv_packed(
            sd, f"{p}.self_attention.in_proj_weight", f"{p}.self_attention.in_proj_bias",
            b["attn"]["qkv"],
        )
        _inv_lin(sd, f"{p}.self_attention.out_proj", b["attn"]["proj"])
        _inv_lin(sd, f"{p}.mlp.0", b["mlp"]["fc1"])
        _inv_lin(sd, f"{p}.mlp.3", b["mlp"]["fc2"])
    return sd


# --- CNN / Swin / CoCa / BEiT3 families -----------------------------------------------


def torchvision_resnet_sd(spec, t) -> dict:
    sd: dict = {}
    _inv_patch_conv(sd, "conv1", t["conv1"])
    _inv_bn(sd, "bn1", t["bn1"])
    n_convs = 3 if spec.bottleneck else 2
    for stage, n_blocks in enumerate(spec.layers):
        for bi in range(n_blocks):
            blk = t[f"layer{stage + 1}_{bi}"]
            src = f"layer{stage + 1}.{bi}"
            for c in range(1, n_convs + 1):
                _inv_patch_conv(sd, f"{src}.conv{c}", blk[f"conv{c}"])
                _inv_bn(sd, f"{src}.bn{c}", blk[f"bn{c}"])
            if "downsample_conv" in blk:
                _inv_patch_conv(sd, f"{src}.downsample.0", blk["downsample_conv"])
                _inv_bn(sd, f"{src}.downsample.1", blk["downsample_bn"])
    # torchvision checkpoints carry the classifier head; converter must drop it.
    sd["fc.weight"] = _z((1000, spec.embedding_dim))
    sd["fc.bias"] = _z((1000,))
    return sd


def torchvision_convnext_sd(spec, t) -> dict:
    sd: dict = {}
    _inv_patch_conv(sd, "features.0.0", t["stem_conv"])
    _inv_ln(sd, "features.0.1", t["stem_norm"])
    for stage in range(4):
        feat_idx = 1 + 2 * stage
        if stage > 0:
            _inv_ln(sd, f"features.{feat_idx - 1}.0", t[f"down{stage}_norm"])
            _inv_patch_conv(sd, f"features.{feat_idx - 1}.1", t[f"down{stage}_conv"])
        for bi in range(spec.depths[stage]):
            blk = t[f"stage{stage}_block{bi}"]
            src = f"features.{feat_idx}.{bi}.block"
            _inv_patch_conv(sd, f"{src}.0", blk["dwconv"])
            _inv_ln(sd, f"{src}.2", blk["norm"])
            _inv_lin(sd, f"{src}.3", blk["pw1"])
            _inv_lin(sd, f"{src}.5", blk["pw2"])
            sd[f"features.{feat_idx}.{bi}.layer_scale"] = _z(
                (blk["gamma"].shape[0], 1, 1)
            )
    return sd


def open_clip_resnet_sd(spec, t, *, prefix: str = "visual.") -> dict:
    sd: dict = {}
    for c in (1, 2, 3):
        _inv_patch_conv(sd, f"{prefix}conv{c}", t[f"conv{c}"])
        _inv_bn(sd, f"{prefix}bn{c}", t[f"bn{c}"])
    for stage, n_blocks in enumerate(spec.layers):
        for bi in range(n_blocks):
            blk = t[f"layer{stage + 1}_{bi}"]
            src = f"{prefix}layer{stage + 1}.{bi}"
            for c in (1, 2, 3):
                _inv_patch_conv(sd, f"{src}.conv{c}", blk[f"conv{c}"])
                _inv_bn(sd, f"{src}.bn{c}", blk[f"bn{c}"])
            if "downsample_conv" in blk:
                _inv_patch_conv(sd, f"{src}.downsample.0", blk["downsample_conv"])
                _inv_bn(sd, f"{src}.downsample.1", blk["downsample_bn"])
    ap = t["attnpool"]
    sd[f"{prefix}attnpool.positional_embedding"] = _z(ap["positional_embedding"].shape)
    for proj in ("q_proj", "k_proj", "v_proj", "c_proj"):
        _inv_lin(sd, f"{prefix}attnpool.{proj}", ap[proj])
    return sd


def timm_swin_sd(spec, t, *, chief_old_layout: bool = False) -> dict:
    sd: dict = {}
    _inv_ln(sd, "patch_embed.norm", t["patch_norm"])
    _inv_ln(sd, "norm", t["norm"])
    if spec.conv_stem:
        kh, kw, cin, cout = t["stem_conv0"]["kernel"].shape
        sd["patch_embed.proj.0.weight"] = _z((cout, cin, kh, kw))
        _inv_bn(sd, "patch_embed.proj.1", t["stem_bn0"])
        kh, kw, cin, cout = t["stem_conv1"]["kernel"].shape
        sd["patch_embed.proj.3.weight"] = _z((cout, cin, kh, kw))
        _inv_bn(sd, "patch_embed.proj.4", t["stem_bn1"])
        _inv_patch_conv(sd, "patch_embed.proj.6", t["stem_proj"])
    else:
        _inv_patch_conv(sd, "patch_embed.proj", t["stem_proj"])
    for stage in range(len(spec.depths)):
        if stage > 0:
            m = t[f"merge{stage}"]
            # CHIEF checkpoints keep the OLD timm layout (downsample belongs
            # to the previous stage); the converter must remap it.
            dst = f"layers.{stage - 1}" if chief_old_layout else f"layers.{stage}"
            _inv_ln(sd, f"{dst}.downsample.norm", m["norm"])
            sd[f"{dst}.downsample.reduction.weight"] = _z(
                m["reduction"]["kernel"].shape[::-1]
            )
        for bi in range(spec.depths[stage]):
            blk = t[f"stage{stage}_block{bi}"]
            p = f"layers.{stage}.blocks.{bi}"
            _inv_ln(sd, f"{p}.norm1", blk["norm1"])
            _inv_ln(sd, f"{p}.norm2", blk["norm2"])
            _inv_lin(sd, f"{p}.attn.qkv", blk["attn"]["qkv"])
            _inv_lin(sd, f"{p}.attn.proj", blk["attn"]["proj"])
            sd[f"{p}.attn.relative_position_bias_table"] = _z(
                blk["attn"]["rel_pos_table"].shape
            )
            # buffers present in real checkpoints; converter must drop them
            sd[f"{p}.attn.relative_position_index"] = _z((1,))
            _inv_lin(sd, f"{p}.mlp.fc1", blk["fc1"])
            _inv_lin(sd, f"{p}.mlp.fc2", blk["fc2"])
    return sd


def _coca_pool_sd(sd, t_pool, g) -> None:
    d = t_pool["q_proj"]["kernel"].shape[1]
    sd[g("query")] = _z(t_pool["query"].shape)
    _inv_ln(sd, g("ln_q"), t_pool["ln_q"])
    _inv_ln(sd, g("ln_k"), t_pool["ln_k"])
    sd[g("attn.q_proj_weight")] = _z(t_pool["q_proj"]["kernel"].shape[::-1])
    sd[g("attn.k_proj_weight")] = _z(t_pool["k_proj"]["kernel"].shape[::-1])
    sd[g("attn.v_proj_weight")] = _z(t_pool["v_proj"]["kernel"].shape[::-1])
    sd[g("attn.in_proj_bias")] = _z((3 * d,))
    _inv_lin(sd, g("attn.out_proj"), t_pool["out_proj"])


def open_clip_coca_sd(spec, t) -> dict:
    trunk_t = dict(t["trunk"])
    trunk_t["norm"] = t["ln_post"]  # trunk converter reads visual.ln_post
    if "proj" in t:
        trunk_t["proj"] = t["proj"]
    sd = open_clip_vit_sd(spec.trunk, trunk_t, prefix="visual.")
    _coca_pool_sd(sd, t["attn_pool"], lambda k: f"visual.attn_pool.{k}")
    return sd


def conch_v1_sd(spec, t) -> dict:
    sd = timm_vit_sd(spec.trunk, t["trunk"], key_prefix="visual.trunk.")
    _coca_pool_sd(sd, t["attn_pool"], lambda k: f"visual.attn_pool_contrast.{k}")
    sd["visual.ln_contrast.weight"] = _z(t["ln_post"]["scale"].shape)
    sd["visual.ln_contrast.bias"] = _z(t["ln_post"]["bias"].shape)
    return sd


def musk_beit3_sd(spec, t) -> dict:
    sd: dict = {}
    p = "beit3."
    _inv_patch_conv(sd, f"{p}vision_embed.proj", t["patch_embed"])
    sd[f"{p}vision_embed.cls_token"] = _z(t["cls_token"].shape)
    sd[f"{p}encoder.embed_positions.A.weight"] = _z(t["pos_embed"].shape)
    if "norm" in t:
        _inv_ln(sd, f"{p}encoder.layer_norm.A", t["norm"])
    for i in range(spec.depth):
        b = t[f"blocks_{i}"]
        q = f"{p}encoder.layers.{i}"
        _inv_ln(sd, f"{q}.self_attn_layer_norm.A", b["ln1"])
        _inv_ln(sd, f"{q}.final_layer_norm.A", b["ln2"])
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _inv_lin(sd, f"{q}.self_attn.{proj}.A", b["attn"][proj])
        _inv_ln(sd, f"{q}.self_attn.inner_attn_ln.A", b["attn"]["inner_attn_ln"])
        _inv_lin(sd, f"{q}.ffn.A.fc1", b["fc1"])
        _inv_lin(sd, f"{q}.ffn.A.fc2", b["fc2"])
        _inv_ln(sd, f"{q}.ffn.A.ffn_layernorm", b["ffn_ln"])
    return sd


def synth_state_dict(entry, target_params: dict) -> dict:
    """Upstream-layout state dict for ``entry`` matching ``target_params``."""
    family, spec, t = entry.family, entry.spec, target_params
    if family == "timm_vit":
        return timm_vit_sd(spec, t)
    if family == "hf_vit":
        return hf_vit_sd(spec, t, prefix="vit.")
    if family == "dinov2":
        return hf_dinov2_sd(spec, t, prefix="dinov2.")
    if family == "dinov3":
        return hf_dinov3_sd(spec, t)
    if family == "clip_hf":
        return hf_clip_sd(spec, t)
    if family == "clip_openclip":
        return open_clip_vit_sd(spec, t)
    if family == "clip_timm_tower":
        return open_clip_timm_tower_sd(spec, t)
    if family == "siglip":
        return hf_siglip_sd(spec, t)
    if family == "torchvision_vit":
        return torchvision_vit_sd(spec, t)
    if family == "resnet":
        return torchvision_resnet_sd(spec, t)
    if family == "convnext":
        return torchvision_convnext_sd(spec, t)
    if family == "clip_modified_resnet":
        return open_clip_resnet_sd(spec, t)
    if family == "swin":
        return timm_swin_sd(spec, t, chief_old_layout=spec.conv_stem)
    if family == "coca":
        return open_clip_coca_sd(spec, t)
    if family == "conch":
        return conch_v1_sd(spec, t)
    if family == "beit3":
        return musk_beit3_sd(spec, t)
    raise NotImplementedError(f"no synthetic layout for family {family}")
