"""The reference's hydra SAM2 YAML parses into exactly the built-in hiera-tiny
config (validates CLI --sam2-config / SegmentationConfig.config_path parity)."""

from pathlib import Path

import pytest

from atlaspatch_tpu.models.sam2.config import SAM2Config

REFERENCE_YAML = Path("/root/reference/atlas_patch/configs/sam2.1_hiera_t.yaml")


@pytest.mark.skipif(not REFERENCE_YAML.exists(), reason="reference yaml not mounted")
def test_reference_yaml_matches_tiny():
    parsed = SAM2Config.from_reference_yaml(REFERENCE_YAML)
    assert parsed == SAM2Config.tiny()


def test_custom_yaml(tmp_path: Path):
    yaml_path = tmp_path / "custom.yaml"
    yaml_path.write_text(
        """
model:
  image_size: 512
  image_encoder:
    trunk:
      embed_dim: 64
      num_heads: 2
      stages: [1, 2, 2]
      global_att_blocks: [3]
      window_pos_embed_bkg_spatial_size: [7, 7]
      window_spec: [8, 4, 7]
    neck:
      d_model: 128
      backbone_channel_list: [256, 128, 64]
      fpn_top_down_levels: [1, 2]
"""
    )
    cfg = SAM2Config.from_reference_yaml(yaml_path)
    assert cfg.image_size == 512
    assert cfg.hidden_size == 64
    assert cfg.blocks_per_stage == (1, 2, 2)
    assert cfg.embed_dim_per_stage == (64, 128, 256)
    assert cfg.num_heads_per_stage == (2, 4, 8)
    assert cfg.global_attention_blocks == (3,)
    assert cfg.window_size_per_stage == (8, 4, 7)
    assert cfg.fpn_hidden_size == 128
    assert cfg.backbone_channel_list == (256, 128, 64)
    assert cfg.fpn_top_down_levels == (1, 2)
