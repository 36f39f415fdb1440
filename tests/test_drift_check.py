"""Drift-check tool: the networked-day procedure's offline-testable half.

tools/fetch_and_verify.sh (dry-run covered here too) wires this into the
one-command real-weight validation; snapshot/compare must work standalone so
the two halves can run on different machines (docs/WEIGHTS.md)."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import numpy as np

from atlaspatch_tpu.tools.drift_check import compare, make_patches, snapshot

REPO = Path(__file__).resolve().parent.parent


def test_patches_deterministic():
    a, b = make_patches(), make_patches()
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.uint8 and a.shape == (8, 256, 256, 3)


def test_snapshot_and_compare_roundtrip(tmp_path: Path, monkeypatch):
    monkeypatch.setenv("ATLASPATCH_ALLOW_RANDOM_WEIGHTS", "1")
    assert snapshot(tmp_path, ["resnet18"], device="cpu") == 0
    ours = tmp_path / "resnet18.ours.npy"
    assert ours.exists() and (tmp_path / "patches.npy").exists()

    feats = np.load(ours)
    # identical reference features -> PASS
    np.save(tmp_path / "resnet18.ref.npy", feats)
    assert compare(tmp_path, tolerance=1e-3) == 0
    report = json.loads((tmp_path / "drift_report.json").read_text())
    assert report["results"][0]["status"] == "PASS"
    assert report["results"][0]["cosine"] > 0.999999

    # perturb past the gate -> FAIL
    np.save(tmp_path / "resnet18.ref.npy", feats * 1.01)
    assert compare(tmp_path, tolerance=1e-3) == 1

    # missing ref -> SKIP, not failure
    (tmp_path / "resnet18.ref.npy").unlink()
    assert compare(tmp_path, tolerance=1e-3) == 0
    report = json.loads((tmp_path / "drift_report.json").read_text())
    assert report["results"][0]["status"] == "SKIP"


def test_fetch_and_verify_dry_run(tmp_path: Path):
    out = subprocess.run(
        ["bash", str(REPO / "tools" / "fetch_and_verify.sh"), "--dry-run",
         str(tmp_path / "w"), "resnet18,uni_v1"],
        capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "resnet18\ttorchvision resnet18" in out.stdout
    assert "uni_v1\t" in out.stdout
    assert "verify-weights" in out.stdout
