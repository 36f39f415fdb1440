"""Two-process multi-host end-to-end test (VERDICT r1 #7).

Spawns two real CLI processes with ATLASPATCH_NUM_HOSTS=2 / HOST_ID={0,1}
over one shared output directory and asserts the shared-FS protocol holds
end-to-end: combined completeness (every slide's H5 valid), exactly-once
processing (lock files + skip-existing dedupe the overlap that work stealing
creates), and no lock litter left behind.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import h5py
import numpy as np
import pytest
from PIL import Image

N_SLIDES = 6
REPO = Path(__file__).resolve().parent.parent


def _make_slides(d: Path) -> None:
    rng = np.random.default_rng(7)
    for i in range(N_SLIDES):
        img = rng.uniform(150, 255, (384, 512, 3)).astype(np.uint8)
        img[64:320, 64:448] = (185, 130, 165)  # tissue blob
        Image.fromarray(img).save(d / f"m{i}.png")


def _host_cmd(in_dir: Path, out: Path, mpp_csv: Path) -> list[str]:
    return [
        sys.executable, "-m", "atlaspatch_tpu.cli", "segment-and-get-coords",
        str(in_dir), "-o", str(out), "--patch-size", "128", "--target-mag", "20",
        "--device", "cpu", "--mpp-csv", str(mpp_csv), "--verbose",
    ]


def test_two_hosts_share_one_output(tmp_path: Path):
    in_dir = tmp_path / "slides"
    in_dir.mkdir()
    _make_slides(in_dir)
    mpp_csv = tmp_path / "mpp.csv"
    mpp_csv.write_text(
        "wsi,mpp\n" + "".join(f"m{i}.png,0.5\n" for i in range(N_SLIDES))
    )
    out = tmp_path / "out"

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        ATLASPATCH_ALLOW_RANDOM_WEIGHTS="1",
        ATLASPATCH_NUM_HOSTS="2",
        PYTHONPATH=str(REPO),
    )
    procs = []
    for host_id in range(2):
        host_env = dict(env, ATLASPATCH_HOST_ID=str(host_id))
        procs.append(
            subprocess.Popen(
                _host_cmd(in_dir, out, mpp_csv),
                env=host_env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                cwd=str(REPO),
            )
        )
    outputs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=900)
        outputs.append(stdout)
        assert p.returncode == 0, stdout[-3000:]

    # Combined completeness: every slide has a valid H5.
    for i in range(N_SLIDES):
        with h5py.File(out / "patches" / f"m{i}.h5") as f:
            assert int(f.attrs["num_patches"]) > 0
            assert f["coords"].shape[0] == int(f.attrs["num_patches"])

    # Exactly-once processing: each slide was extracted by one host; the
    # other host either never reached it or logged a skip (lock/existing).
    processed_counts = {
        f"m{i}.png": sum(f"Processed m{i}.png" in o for o in outputs)
        for i in range(N_SLIDES)
    }
    assert all(c == 1 for c in processed_counts.values()), (processed_counts, outputs[0][-2000:])

    # Work stealing + locks produced overlap handling: at least one skip
    # message somewhere proves the two hosts actually raced (not strictly
    # required for correctness, but with stealing on, overlap is expected).
    combined = "\n".join(outputs)
    assert ("locked by another process" in combined) or ("already processed" in combined)

    # No lock litter.
    assert list((out / "patches").glob("*.lock")) == []


def test_host_shard_stealing_unit(monkeypatch):
    from atlaspatch_tpu.parallel.multihost import host_shard

    items = list(range(10))
    monkeypatch.setenv("ATLASPATCH_NUM_HOSTS", "2")
    monkeypatch.setenv("ATLASPATCH_HOST_ID", "1")
    assert host_shard(items) == [1, 3, 5, 7, 9]
    assert host_shard(items, steal=True) == [1, 3, 5, 7, 9, 0, 2, 4, 6, 8]
    monkeypatch.setenv("ATLASPATCH_HOST_STEAL", "0")
    assert host_shard(items, steal=True) == [1, 3, 5, 7, 9]
