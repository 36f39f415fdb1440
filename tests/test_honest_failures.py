"""Fail-loud contracts: missing SAM2 weights and unsupported slide formats."""

from pathlib import Path

import pytest

from atlaspatch_tpu.io.factory import UnsupportedFormatError, WSIFactory


def test_sam2_service_raises_without_weights(monkeypatch, tmp_path):
    """Without a checkpoint and without the explicit random-weights opt-in the
    segmentation service must refuse to start (reference loads-or-raises,
    atlas_patch/services/segmentation.py:46-68)."""
    from atlaspatch_tpu.core.config import SegmentationConfig
    from atlaspatch_tpu.services.segmentation import SAM2SegmentationService

    monkeypatch.delenv("ATLASPATCH_ALLOW_RANDOM_WEIGHTS", raising=False)
    monkeypatch.delenv("ATLASPATCH_SAM2_CHECKPOINT", raising=False)
    # Point the HF-cache probe somewhere empty so no real checkpoint is found.
    monkeypatch.setenv("HF_HOME", str(tmp_path / "empty-hf"))
    with pytest.raises(RuntimeError, match="ATLASPATCH_ALLOW_RANDOM_WEIGHTS"):
        SAM2SegmentationService(SegmentationConfig(device="cpu"))


def test_sam2_service_random_init_with_optin(monkeypatch, tmp_path):
    from atlaspatch_tpu.core.config import SegmentationConfig
    from atlaspatch_tpu.services.segmentation import SAM2SegmentationService

    monkeypatch.setenv("ATLASPATCH_ALLOW_RANDOM_WEIGHTS", "1")
    monkeypatch.delenv("ATLASPATCH_SAM2_CHECKPOINT", raising=False)
    monkeypatch.setenv("HF_HOME", str(tmp_path / "empty-hf"))
    svc = SAM2SegmentationService(SegmentationConfig(device="cpu"))
    assert svc.predictor.params is not None


@pytest.mark.parametrize("ext", [".mrxs", ".vms", ".vmu", ".dcm"])
def test_non_tiff_containers_raise_clearly(tmp_path: Path, ext: str):
    fake = tmp_path / f"slide{ext}"
    fake.write_bytes(b"\x00" * 64)
    assert WSIFactory.detect(str(fake)) is None
    with pytest.raises(UnsupportedFormatError, match="not supported"):
        WSIFactory.load(str(fake))


def test_discovery_skips_unsupported_containers(tmp_path: Path):
    from atlaspatch_tpu.utils.params import get_wsi_files

    (tmp_path / "a.svs").touch()
    (tmp_path / "b.mrxs").touch()
    files = get_wsi_files(str(tmp_path))
    assert [Path(f).name for f in files] == ["a.svs"]


def test_info_lists_only_real_formats():
    from click.testing import CliRunner

    from atlaspatch_tpu.cli import cli

    result = CliRunner().invoke(cli, ["info"])
    assert result.exit_code == 0
    supported_line = next(
        line for line in result.output.splitlines() if line.startswith("Supported WSI")
    )
    for ext in (".mrxs", ".vms", ".vmu", ".dcm"):
        assert ext not in supported_line
    assert "Not supported" in result.output
