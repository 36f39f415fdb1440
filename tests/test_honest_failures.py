"""Fail-loud contracts: missing SAM2 weights and unsupported slide formats."""

from pathlib import Path

import pytest

from atlaspatch_tpu.io.factory import WSIFactory


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


@pytest.mark.parametrize(
    ("ext", "marker"),
    [(".mrxs", "mirax"), (".vms", "vms"), (".vmu", "vmu"), (".dcm", "DICOM")],
)
def test_corrupt_containers_fail_with_backend_error(tmp_path: Path, ext: str, marker: str):
    """Each non-TIFF container has a real backend now; a garbage file must
    produce that backend's clear error, not a misleading TIFF parse failure."""
    fake = tmp_path / f"slide{ext}"
    fake.write_bytes(b"\x00" * 64)
    assert WSIFactory.detect(str(fake)) is not None
    with pytest.raises(Exception, match=marker):
        WSIFactory.load(str(fake))._ensure_loaded()


def test_discovery_includes_container_formats(tmp_path: Path):
    from atlaspatch_tpu.utils.params import get_wsi_files

    (tmp_path / "a.svs").touch()
    (tmp_path / "b.mrxs").touch()
    (tmp_path / "c.dcm").touch()
    files = get_wsi_files(str(tmp_path))
    assert [Path(f).name for f in files] == ["a.svs", "b.mrxs", "c.dcm"]


def test_unknown_extension_still_raises(tmp_path: Path):
    fake = tmp_path / "slide.czi"
    fake.write_bytes(b"\x00" * 64)
    assert WSIFactory.detect(str(fake)) is None
    with pytest.raises(ValueError, match="No backend"):
        WSIFactory.load(str(fake))


def test_info_lists_container_formats():
    from click.testing import CliRunner

    from atlaspatch_tpu.cli import cli

    result = CliRunner().invoke(cli, ["info"])
    assert result.exit_code == 0
    assert "Non-TIFF containers" in result.output
    for ext in (".mrxs", ".vms", ".vmu", ".dcm"):
        assert ext in result.output
