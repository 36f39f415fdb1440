"""Mask-quality metrics + evaluate-masks CLI + finetune validation split.

The reference publishes F1-vs-baselines quality claims but ships no scoring
code (SURVEY.md §6); these are first-party."""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from atlaspatch_tpu.utils.maskeval import binary_mask_metrics, score_mask_dirs


def test_binary_mask_metrics_hand_computed():
    pred = np.zeros((4, 4), bool)
    truth = np.zeros((4, 4), bool)
    pred[:2, :2] = True  # 4 px predicted
    truth[:2, :4] = True  # 8 px truth; overlap = 4
    m = binary_mask_metrics(pred, truth)
    assert m["iou"] == pytest.approx(4 / 8)
    assert m["f1"] == pytest.approx(2 * 4 / (2 * 4 + 0 + 4))
    assert m["precision"] == pytest.approx(1.0)
    assert m["recall"] == pytest.approx(0.5)

    # empty vs empty = perfect; shape mismatch raises
    e = binary_mask_metrics(np.zeros((2, 2), bool), np.zeros((2, 2), bool))
    assert e == {"iou": 1.0, "f1": 1.0, "precision": 1.0, "recall": 1.0}
    with pytest.raises(ValueError):
        binary_mask_metrics(np.zeros((2, 2), bool), np.zeros((3, 3), bool))


def _save(path: Path, arr: np.ndarray) -> None:
    Image.fromarray((arr * 255).astype(np.uint8)).save(path)


def test_score_mask_dirs_with_naming_and_resize(tmp_path: Path):
    pred_dir = tmp_path / "pred"
    truth_dir = tmp_path / "truth"
    pred_dir.mkdir()
    truth_dir.mkdir()
    mask = np.zeros((32, 40), bool)
    mask[8:24, 10:30] = True
    # prediction uses detect-tissue naming; the overlay twin AND the
    # patch-grid rendering that share the stem must be ignored
    _save(pred_dir / "slideA_mask_bw.png", mask)
    _save(pred_dir / "slideA_mask.png", np.ones_like(mask))  # green overlay stand-in
    _save(pred_dir / "slideA.png", np.ones_like(mask))  # grid visualization stand-in
    # truth at a different scale (2x), plain stem naming
    big = np.kron(mask, np.ones((2, 2), bool))
    _save(truth_dir / "slideA.png", big)

    rows, summary = score_mask_dirs(pred_dir, truth_dir)
    assert summary["n"] == 1 and rows[0]["slide"] == "slideA"
    assert rows[0]["iou"] == pytest.approx(1.0)

    with pytest.raises(FileNotFoundError):
        score_mask_dirs(pred_dir, tmp_path / "nowhere")


def test_evaluate_masks_cli(tmp_path: Path):
    from click.testing import CliRunner

    from atlaspatch_tpu.cli import cli

    pred_dir = tmp_path / "pred"
    truth_dir = tmp_path / "truth"
    pred_dir.mkdir()
    truth_dir.mkdir()
    a = np.zeros((20, 20), bool)
    a[:10] = True
    _save(pred_dir / "s1_mask_bw.png", a)
    _save(truth_dir / "s1_mask.png", a)
    b = np.zeros((20, 20), bool)
    b[:, :10] = True
    _save(pred_dir / "s2_mask_bw.png", a)
    _save(truth_dir / "s2.png", b)

    csv_out = tmp_path / "metrics.csv"
    result = CliRunner().invoke(
        cli,
        ["evaluate-masks", str(pred_dir), "--truth", str(truth_dir),
         "--csv", str(csv_out)],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert "s1: IoU 1.0000" in result.output
    assert "Mean over 2 slide(s)" in result.output
    import csv

    with open(csv_out) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert float(rows[1]["iou"]) == pytest.approx(1 / 3)  # half-overlap squares


def test_finetune_validation_split(tmp_path: Path):
    from tests.test_finetune_loop import _make_dataset

    from atlaspatch_tpu.models.train.loop import finetune_sam2

    images, masks = _make_dataset(tmp_path, n=4)
    summary = finetune_sam2(
        images,
        masks,
        tmp_path / "out",
        epochs=1,
        batch_size=2,
        image_size=128,
        device="cpu",
        seed=0,
        val_fraction=0.5,
    )
    assert summary["pairs"] == 2 and summary["val_pairs"] == 2
    assert summary["steps"] == 1  # 2 train pairs / batch 2
    assert np.isfinite(summary["val_loss"])
    assert 0.0 <= summary["val_iou"] <= 1.0


def test_detect_tissue_to_evaluate_masks_workflow(tmp_path: Path, monkeypatch):
    """The documented quality loop (docs/TRAINING.md §3): detect-tissue's
    visualization dir feeds evaluate-masks directly; scoring its own output
    against itself is a perfect 1.0 across the board."""
    from click.testing import CliRunner

    from atlaspatch_tpu.cli import cli
    from atlaspatch_tpu.io.synthetic_wsi import make_tissue_canvas
    from atlaspatch_tpu.models.sam2.config import SAM2Config

    monkeypatch.setattr(SAM2Config, "tiny", SAM2Config.test_tiny)
    sdir = tmp_path / "slides"
    sdir.mkdir()
    for i in range(2):
        Image.fromarray(make_tissue_canvas(512, 384, seed=i, n_blobs=2)).save(
            sdir / f"s{i}.png"
        )
    (tmp_path / "mpp.csv").write_text("wsi,mpp\ns0.png,0.5\ns1.png,0.5\n")

    runner = CliRunner()
    out = tmp_path / "out"
    r1 = runner.invoke(
        cli,
        ["detect-tissue", str(sdir), "-o", str(out), "--device", "cpu",
         "--mpp-csv", str(tmp_path / "mpp.csv")],
        catch_exceptions=False,
    )
    assert r1.exit_code == 0, r1.output
    vis = out / "visualization"
    assert sorted(p.name for p in vis.glob("*_mask_bw.png")) == [
        "s0_mask_bw.png",
        "s1_mask_bw.png",
    ]

    r2 = runner.invoke(
        cli,
        ["evaluate-masks", str(vis), "--truth", str(vis)],
        catch_exceptions=False,
    )
    assert r2.exit_code == 0, r2.output
    assert "Mean over 2 slide(s): IoU 1.0000  F1 1.0000" in r2.output
