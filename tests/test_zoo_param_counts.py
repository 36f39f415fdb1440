"""Pin encoder config constants against independently-published param counts.

A wrong dim/depth/heads/FFN-gating constant shifts the total parameter count
by far more than the tolerance here, so matching the publicly documented
model sizes (HF model cards / papers) validates the config data without
network access or checkpoints. Counts are computed abstractly via
``jax.eval_shape`` at the FULL production spec (no memory cost — includes
the 7B DINOv3).

Published sources: facebook/dinov3-* and facebook/dinov2-* HF cards and the
DINOv3 paper (vision-trunk totals), torchvision model docs (ViT/ResNet/
ConvNeXt, classifier head excluded here), paige-ai/Virchow* cards (632M),
MahmoodLab/UNI2-h card (681M), bioptimus/H-optimus-0 card (1.1B ViT-g/14),
prov-gigapath card (1.13B ViT-g/14).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atlaspatch_tpu.models.encoders.zoo import ENTRIES, _model_for

# name → (published trunk params in millions, relative tolerance)
PUBLISHED_M = {
    # DINOv3 suite (HF facebook/dinov3-*-pretrain-lvd1689m cards)
    "dinov3_vits16": (21.6, 0.05),
    "dinov3_vits16_plus": (29.0, 0.06),
    "dinov3_vitb16": (85.7, 0.05),
    "dinov3_vitl16": (303.0, 0.05),
    "dinov3_vitl16_sat": (303.0, 0.05),
    "dinov3_vith16_plus": (840.0, 0.05),
    "dinov3_vit7b16": (6716.0, 0.05),
    "dinov3_vit7b16_sat": (6716.0, 0.05),
    # DINOv2 suite (HF facebook/dinov2-* cards)
    "dinov2_small": (22.1, 0.05),
    "dinov2_base": (86.6, 0.05),
    "dinov2_large": (304.0, 0.05),
    "dinov2_giant": (1136.0, 0.05),
    # torchvision trunks (head excluded)
    "vit_b_16": (85.8, 0.05),
    "vit_l_16": (303.3, 0.05),
    "vit_h_14": (630.8, 0.05),
    "resnet50": (23.5, 0.05),
    "resnet152": (58.1, 0.05),
    "convnext_large": (196.2, 0.05),
    # pathology FMs with published sizes
    "uni_v1": (303.0, 0.05),         # MahmoodLab/UNI: ViT-L/16
    "uni_v2": (681.0, 0.06),         # MahmoodLab/UNI2-h card
    "virchow_v1": (632.0, 0.05),     # paige-ai/Virchow: ViT-H/14 SwiGLUPacked
    "virchow_v2": (632.0, 0.05),
    "h_optimus_0": (1134.0, 0.05),   # bioptimus: ViT-g/14
    "prov_gigapath": (1134.0, 0.05), # prov-gigapath: ViT-g/14
    "phikon_v1": (85.8, 0.05),       # owkin/phikon: ViT-B
    "phikon_v2": (303.0, 0.05),      # owkin/phikon-v2: ViT-L
    # OpenAI CLIP image encoders (CLIP paper appendix tables; visual tower
    # incl. the image projection, as encode_image uses)
    "clip_rn50": (38.3, 0.05),
    "clip_rn101": (56.3, 0.05),
    "clip_rn50x4": (87.1, 0.05),
    "clip_rn50x16": (167.3, 0.05),
    "clip_rn50x64": (420.4, 0.05),
    "clip_vit_b_32": (87.8, 0.05),
    "clip_vit_b_16": (86.2, 0.05),
    "clip_vit_l_14": (304.0, 0.05),
    "clip_vit_l_14_336": (304.3, 0.05),
    # CONCH (MahmoodLab): v1 = iBOT ViT-B/16 vision tower (~86M) + attentional
    # pooler; v1.5 (TITAN card) = ViT-L/16 tower
    "conch_v1": (86.0, 0.06),
    "conch_v15": (303.0, 0.06),
    # Lunit SSL benchmark models (1aurent/* mirrors of lunit-io): ResNet-50
    # trunks + ViT-S DINO (21.7M per the DINO paper)
    "lunit_resnet50_bt": (23.5, 0.05),
    "lunit_resnet50_swav": (23.5, 0.05),
    "lunit_resnet50_mocov2": (23.5, 0.05),
    "lunit_vit_small_patch16_dino": (21.7, 0.05),
    "lunit_vit_small_patch8_dino": (21.7, 0.05),
    # PLIP (vinid/plip): CLIP ViT-B/32 vision tower
    "plip": (87.8, 0.05),
    # MedSigLIP (google/medsiglip-448): SigLIP SoViT-400M vision tower
    # (427.7M actual — "400M" is the nominal family name)
    "medsiglip": (427.7, 0.05),
    # MUSK (xiangjx/musk): BEiT-3 large vision path (24 layers, 1024 dim,
    # multiway FFN) — ViT-L-equivalent vision parameterization per the
    # BEiT-3 paper; arithmetic-derived, see WEIGHTS.md
    "musk": (304.0, 0.06),
    # OpenMidnight: dinov2_vitg14_reg skeleton (ViT-g/14 w/ registers, 1.14B)
    "openmidnight": (1134.0, 0.05),
    # PathOrchestra (AI4Pathology): ViT-L/16
    "pathorchestra": (303.0, 0.05),
    # H0-mini (bioptimus): distilled ViT-B
    "h0_mini": (85.7, 0.05),
    # Hibou (histai): B = ViT-B/14 w/ registers, L = ViT-L/14 w/ registers
    "hibou_b": (85.7, 0.05),
    "hibou_l": (303.0, 0.05),
    # BiomedCLIP (microsoft): ViT-B/16 vision tower
    "biomedclip": (86.2, 0.05),
    # Midnight (kaiko-ai): ViT-g/14
    "midnight": (1134.0, 0.05),
    # CHIEF-CTransPath: Swin-tiny + ConvStem (CTransPath paper: 27.5M)
    "chief-ctranspath": (27.5, 0.05),
    # OmiCLIP (WangGuangyuLab/Loki): open_clip coca_ViT-L-14 vision tower
    # + attentional pooler
    "omiclip": (306.0, 0.05),
    # Quilt (wisdomik/QuiltNet-*): CLIP ViT-B/32 and ViT-B/16 vision towers
    "quilt_b_32": (87.8, 0.05),
    "quilt_b_16": (86.2, 0.05),
    "quilt_b_16_pmb": (86.2, 0.05),
}


def _param_count(entry) -> int:
    model = _model_for(entry)
    spec = entry.spec
    size = getattr(spec, "img_size", None) or getattr(spec, "image_size", None) or 224
    dummy = jnp.zeros((1, int(size), int(size), 3), jnp.float32)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), dummy))["params"]
    return sum(int(np.prod(leaf.shape)) for leaf in jax.tree.leaves(shapes))


@pytest.mark.parametrize("name", sorted(PUBLISHED_M))
def test_param_count_matches_published(name):
    want_m, rtol = PUBLISHED_M[name]
    got_m = _param_count(ENTRIES[name]) / 1e6
    assert got_m == pytest.approx(want_m, rel=rtol), (
        f"{name}: config yields {got_m:.1f}M params, published {want_m}M — "
        "a dim/depth/heads/FFN constant is off"
    )
