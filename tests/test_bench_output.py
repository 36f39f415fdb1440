"""Pin bench.py's stdout contract: ONE compact JSON line the driver can parse.

The driver keeps only a ~2000-char tail of bench stdout and parses that as
JSON. Round 4's per-pass stage counters grew the line to ~4.5 KB and the
official record (BENCH_r04.json) carried ``parsed: null`` despite the best
numbers of any round. The contract pinned here: per-pass detail goes to the
sidecar file, the stdout line stays well under the tail window and carries
every metric's best/median/vs_baseline.
"""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def _fat_metrics() -> dict:
    # Realistic worst case: 3 metrics, 5 passes each, full stage tables.
    stage_names = [
        "thumb_prepare", "segment_dispatch", "segment_fetch", "mask_resample",
        "contours", "grid", "h5_write", "slide_open", "embed_prep",
        "embed_dispatch", "embed_fetch",
    ]
    passes = [
        {
            "rate": 377292.1 + p,
            "wall_s": 1.832,
            "host_probe_s": 0.0412,
            "stages": {n: [0.123456, 0.098765] for n in stage_names},
        }
        for p in range(5)
    ]
    return {
        "seg_coords_synthetic": {
            "value": 377292.1, "median": 376306.4, "unit": "slides/hour",
            "vs_baseline": 19.912, "median_vs_baseline": 19.861, "passes": passes,
        },
        "seg_coords_real_tiff": {
            "value": 336974.9, "median": 325887.2, "unit": "slides/hour",
            "vs_baseline": 17.787, "median_vs_baseline": 17.201, "passes": passes,
        },
        "embed_vitl_pps": {
            "value": 219.4, "median": 136.9, "device_resident": 856.4,
            "device_resident_tanh": 1131.0, "device_resident_int8": 1451.3,
            "unit": "patches/s", "vs_baseline": None, "passes": passes,
            "fetch_decomposition": {"chunks": 16, "per_chunk_ms": 220.5,
                                    "mode": "deferred"},
        },
    }


def test_stdout_line_is_compact_and_complete(tmp_path, monkeypatch):
    monkeypatch.setenv("ATLASPATCH_BENCH_DETAIL", str(tmp_path / "detail.json"))
    bench = _load_bench()
    line = bench.emit_results(_fat_metrics())

    # The driver-parse contract: one line, comfortably under the 2000-char
    # tail even if the driver prepends a few stray stderr-leak characters.
    assert "\n" not in line
    assert len(line) < 1800, len(line)

    doc = json.loads(line)
    assert doc["value"] == 377292.1
    assert doc["unit"] == "slides/hour"
    assert doc["vs_baseline"] == 19.912
    assert doc["median_value"] == 376306.4
    # All three metrics present with best+median, no per-pass payloads.
    for key in ("seg_coords_synthetic", "seg_coords_real_tiff", "embed_vitl_pps"):
        m = doc["metrics"][key]
        assert "value" in m and "median" in m
        assert "passes" not in m

    # The diagnostics survive in the sidecar, losslessly.
    detail = json.loads((tmp_path / "detail.json").read_text())
    assert detail["seg_coords_synthetic"]["passes"][0]["stages"]["segment_fetch"]


def test_headline_falls_back_when_synthetic_skipped(tmp_path, monkeypatch):
    monkeypatch.setenv("ATLASPATCH_BENCH_DETAIL", str(tmp_path / "detail.json"))
    bench = _load_bench()
    metrics = _fat_metrics()
    del metrics["seg_coords_synthetic"]
    doc = json.loads(bench.emit_results(metrics))
    assert doc["value"] == 336974.9
    assert doc["vs_baseline"] == 17.787


def test_sidecar_failure_does_not_break_stdout(tmp_path, monkeypatch):
    monkeypatch.setenv(
        "ATLASPATCH_BENCH_DETAIL", str(tmp_path / "no" / "such" / "dir" / "d.json")
    )
    bench = _load_bench()
    doc = json.loads(bench.emit_results(_fat_metrics()))
    assert doc["value"] == 377292.1
