"""CLI end-to-end: segment-and-get-coords and detect-tissue on PNG slides with
the miniature SAM2 (random weights) on CPU."""

from pathlib import Path

import h5py
import pytest
from PIL import Image

from atlaspatch_tpu.io.synthetic_wsi import make_tissue_canvas


@pytest.fixture
def slide_dir(tmp_path: Path) -> Path:
    sdir = tmp_path / "slides"
    sdir.mkdir()
    for i in range(2):
        Image.fromarray(make_tissue_canvas(768, 512, seed=i, n_blobs=2)).save(
            sdir / f"s{i}.png"
        )
    (tmp_path / "mpp.csv").write_text("wsi,mpp\ns0.png,0.5\ns1.png,0.5\n")
    return sdir


@pytest.fixture
def tiny_sam2(monkeypatch):
    from atlaspatch_tpu.models.sam2.config import SAM2Config

    monkeypatch.setattr(SAM2Config, "tiny", SAM2Config.test_tiny)


def test_cli_segment_and_get_coords(slide_dir: Path, tmp_path: Path, tiny_sam2):
    from click.testing import CliRunner

    from atlaspatch_tpu.cli import cli

    out = tmp_path / "out"
    runner = CliRunner()
    result = runner.invoke(
        cli,
        [
            "segment-and-get-coords",
            str(slide_dir),
            "--output", str(out),
            "--patch-size", "64",
            "--target-mag", "20",
            "--device", "cpu",
            "--seg-batch-size", "2",
            "--mpp-csv", str(tmp_path / "mpp.csv"),
            "--verbose",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert "Completed 2 slide(s), failures: 0" in result.output
    for i in range(2):
        h5 = out / "patches" / f"s{i}.h5"
        assert h5.exists()
        with h5py.File(h5) as f:
            assert "coords" in f and "passports" in f
            assert f.attrs["patch_size"] == 64


def test_cli_detect_tissue(slide_dir: Path, tmp_path: Path, tiny_sam2):
    from click.testing import CliRunner

    from atlaspatch_tpu.cli import cli

    out = tmp_path / "vis_out"
    runner = CliRunner()
    result = runner.invoke(
        cli,
        [
            "detect-tissue",
            str(slide_dir),
            "--output", str(out),
            "--device", "cpu",
            "--seg-batch-size", "2",
            "--mpp-csv", str(tmp_path / "mpp.csv"),
            "--verbose",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert "Created 2 mask overlay(s), failures: 0" in result.output
    for i in range(2):
        assert (out / "visualization" / f"s{i}_mask.png").exists()
        assert (out / "visualization" / f"s{i}_mask_bw.png").exists()


def test_cli_seg_data_parallel(slide_dir: Path, tmp_path: Path, tiny_sam2):
    """--seg-data-parallel shards segmentation over the 8 virtual CPU devices
    and produces the same H5 outputs."""
    from click.testing import CliRunner

    from atlaspatch_tpu.cli import cli

    out = tmp_path / "out_dp"
    runner = CliRunner()
    result = runner.invoke(
        cli,
        [
            "segment-and-get-coords",
            str(slide_dir),
            "--output", str(out),
            "--patch-size", "64",
            "--target-mag", "20",
            "--device", "cpu",
            "--seg-batch-size", "2",
            "--seg-data-parallel",
            "--mpp-csv", str(tmp_path / "mpp.csv"),
            "--verbose",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert "Completed 2 slide(s), failures: 0" in result.output
    for i in range(2):
        with h5py.File(out / "patches" / f"s{i}.h5") as f:
            assert f.attrs["num_patches"] > 0


def test_cli_detect_tissue_per_slide_isolation(slide_dir: Path, tmp_path: Path, tiny_sam2):
    """One poisoned slide (no MPP → magnification unknown at thumbnail time)
    must fail alone; the rest of its batch still produces overlays. (The
    reference fails the whole batch: reference cli.py:384-391.)"""
    from click.testing import CliRunner
    from PIL import Image as PILImage

    from atlaspatch_tpu.cli import cli
    from atlaspatch_tpu.io.synthetic_wsi import make_tissue_canvas

    # a third slide with NO mpp.csv entry: opens fine, thumbnail prep raises
    PILImage.fromarray(make_tissue_canvas(768, 512, seed=9, n_blobs=2)).save(
        slide_dir / "s2_bad.png"
    )
    out = tmp_path / "vis_iso"
    runner = CliRunner()
    result = runner.invoke(
        cli,
        [
            "detect-tissue",
            str(slide_dir),
            "--output", str(out),
            "--device", "cpu",
            "--seg-batch-size", "3",  # all three land in ONE batch
            "--mpp-csv", str(tmp_path / "mpp.csv"),
            "--verbose",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert "Created 2 mask overlay(s), failures: 1" in result.output
    for i in range(2):
        assert (out / "visualization" / f"s{i}_mask_bw.png").exists()
    assert not (out / "visualization" / "s2_bad_mask_bw.png").exists()
    assert "[FAIL] s2_bad.png" in result.output


def test_fast_preset_adopts_seg_input_768(tmp_path: Path, monkeypatch):
    """--fast runs SAM2 at 768 (quality-gated: IoU within 0.5 pt of 1024 on
    the trained checkpoint, docs/PERF.md) unless --seg-input-size is passed;
    without --fast the reference-parity default (architecture size) stays."""
    from click.testing import CliRunner

    from atlaspatch_tpu import cli as cli_mod

    captured: dict = {}
    real = cli_mod._build_app_config

    class _Stop(Exception):
        pass

    def spy(kw, feature_cfg):
        captured["cfg"] = real(kw, feature_cfg)
        raise _Stop

    monkeypatch.setattr(cli_mod, "_build_app_config", spy)
    runner = CliRunner()
    base = [
        "segment-and-get-coords", str(tmp_path), "--output", str(tmp_path / "o"),
        "--patch-size", "64", "--target-mag", "20", "--device", "cpu",
    ]

    assert isinstance(runner.invoke(cli_mod.cli, base + ["--fast"]).exception, _Stop)
    seg = captured["cfg"].segmentation
    assert (seg.input_size, seg.precision, seg.batch_size) == (768, "bfloat16", 8)

    # explicit --seg-input-size wins over the preset
    runner.invoke(cli_mod.cli, base + ["--fast", "--seg-input-size", "1024"])
    assert captured["cfg"].segmentation.input_size == 1024

    # no --fast: the architecture's size (reference parity)
    runner.invoke(cli_mod.cli, base)
    assert captured["cfg"].segmentation.input_size is None


def test_cli_seg_input_size_validated_at_option_layer(tmp_path: Path):
    """Invalid --seg-input-size is a clean click UsageError, not a
    SegmentationConfig traceback (ADVICE r4)."""
    from click.testing import CliRunner

    from atlaspatch_tpu.cli import cli

    runner = CliRunner()
    for cmd in ("detect-tissue", "process"):
        result = runner.invoke(
            cli,
            [cmd, str(tmp_path), "--output", str(tmp_path / "o"),
             "--seg-input-size", "100"]
            + (["--patch-size", "256", "--feature-extractors", "resnet50"]
               if cmd == "process" else []),
        )
        assert result.exit_code == 2, result.output
        assert "positive multiple of 32" in result.output


def test_fast_preset_logs_batch_sweep_hint_on_multicore(
    slide_dir: Path, tmp_path: Path, tiny_sam2, monkeypatch, caplog
):
    """--fast bakes in the dev-box batch-8 knee; on >2-CPU hosts the CLI must
    point users at tools/sweep_seg_batch.py instead of silently inheriting a
    tunnel artifact (docs/PERF.md sweep caveat)."""
    import logging

    from click.testing import CliRunner

    from atlaspatch_tpu import cli as cli_mod

    monkeypatch.setattr(cli_mod.os, "cpu_count", lambda: 16)
    runner = CliRunner()
    with caplog.at_level(logging.INFO, logger="atlaspatch_tpu.cli"):
        result = runner.invoke(
            cli_mod.cli,
            [
                "segment-and-get-coords", str(slide_dir),
                "--output", str(tmp_path / "out"),
                "--patch-size", "64", "--target-mag", "20", "--device", "cpu", "--fast",
                "--seg-precision", "float32", "--verbose",
                "--mpp-csv", str(slide_dir.parent / "mpp.csv"),
            ],
            catch_exceptions=False,
        )
    assert result.exit_code == 0, result.output
    assert any("sweep_seg_batch" in r.getMessage() for r in caplog.records)

    # explicit --seg-batch-size suppresses the hint (nothing was guessed)
    caplog.clear()
    with caplog.at_level(logging.INFO, logger="atlaspatch_tpu.cli"):
        result = runner.invoke(
            cli_mod.cli,
            [
                "segment-and-get-coords", str(slide_dir),
                "--output", str(tmp_path / "out2"),
                "--patch-size", "64", "--target-mag", "20", "--device", "cpu", "--fast",
                "--seg-precision", "float32", "--seg-batch-size", "4", "--verbose",
                "--mpp-csv", str(slide_dir.parent / "mpp.csv"),
            ],
            catch_exceptions=False,
        )
    assert result.exit_code == 0, result.output
    assert not any("sweep_seg_batch" in r.getMessage() for r in caplog.records)
