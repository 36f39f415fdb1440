#!/usr/bin/env python
"""Out-of-process fuzz campaign over the first-party slide decoders.

The in-suite fuzz tests (tests/test_native_tiff.py, test_container_formats.py,
test_vendor_formats.py) run a few dozen mutations in-process — enough to pin
the hardening contract, not enough to explore it, and a segfault would kill
the test run without attribution. This tool runs an arbitrary number of
mutated-file open/read attempts in fork-isolated batches so that a crash
(signal death) or a hang is recorded with its seed and the campaign
continues. Crashing inputs are copied to the report directory for replay.

Usage:
    python tools/fuzz_decoders.py [--cases 500] [--formats svs_jpeg,mirax]
                                  [--out /tmp/fuzz_report] [--seed 0]

Every surviving open must also serve bounded reads (extract + thumbnail) —
parser survival alone is not the bar, the read paths walk attacker-shaped
geometry too. Any clean Python exception is a pass; death by signal, a hang,
or a child that exits nonzero is a finding.

Builders are the suite's spec-conformant synthetic writers (tests/), so every
format the production factory registers is represented, including the vendor
TIFF flavors (NDPI striped JPEG, SCN collections, Ventana BIF join overlaps,
Philips UFS) and the non-TIFF containers (MIRAX, VMS, VMU, DICOM).
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import shutil
import signal
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

CASE_TIMEOUT_S = 20  # per-case alarm inside the child (catches decode loops)
BATCH = 50  # cases per forked child


# --------------------------------------------------------------------- corpus
def _rgb(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    base = rng.integers(0, 256, (h // 8 + 1, w // 8 + 1, 3), np.uint8)
    return np.kron(base, np.ones((8, 8, 1), np.uint8))[:h, :w]


def build_corpus(root: Path) -> dict[str, tuple[Path, Path]]:
    """name -> (open_path, mutate_target). Slides are small on purpose: the
    parser/geometry attack surface is in the structure, not the pixel count,
    and small files keep per-case IO negligible."""
    from tiff_builder import (
        TYPE_ASCII,
        TiffWriter,
        rgb_to_full_range_ycbcr,
        write_pyramid,
    )
    import container_builders as cb
    import test_vendor_formats as tvf
    from test_container_formats import smooth_rgb

    cb.smooth_rgb = smooth_rgb

    rng = np.random.default_rng(7)
    corpus: dict[str, tuple[Path, Path]] = {}

    def add(name: str, open_path: Path, target: Path | None = None) -> None:
        corpus[name] = (open_path, target or open_path)

    d = root / "slides"
    d.mkdir(parents=True, exist_ok=True)

    # Plain + compressed TIFF pyramids through the Aperio-style description.
    p = d / "a.svs"
    write_pyramid(p, _rgb(rng, 160, 224), levels=2, tile=64, compression=7,
                  description="Aperio Fake |AppMag = 20|MPP = 0.5|")
    add("svs_jpeg", p)
    p = d / "a347.svs"  # shared JPEGTables (tag 347, abbreviated streams)
    w = TiffWriter()
    w.add_level(_rgb(rng, 160, 224), tile=64, compression=7,
                shared_jpeg_tables=True,
                description="Aperio Fake |AppMag = 20|MPP = 0.5|")
    w.save(p)
    add("svs_jpegtables", p)
    p = d / "b.tiff"
    write_pyramid(p, _rgb(rng, 128, 160), levels=2, tile=None, compression=8)
    add("tiff_deflate_strips", p)
    p = d / "c.tiff"
    write_pyramid(p, _rgb(rng, 96, 128), levels=1, tile=None, compression=32773)
    add("tiff_packbits", p)
    p = d / "c2.tiff"
    w = TiffWriter()
    w.add_level(_rgb(rng, 96, 128), compression=8, predictor=2)
    w.save(p)
    add("tiff_deflate_pred2", p)
    from PIL import Image as _Image

    p = d / "lzw.tif"  # LZW comes from PIL; the suite's builder doesn't emit it
    _Image.fromarray(_rgb(rng, 96, 128)).save(p, compression="tiff_lzw")
    add("tiff_lzw", p)
    p = d / "pal.tif"  # palette-color (photometric 3 + ColorMap lookup)
    _Image.fromarray(_rgb(rng, 96, 128)).quantize(colors=120).save(p)
    add("tiff_palette", p)
    from tiff_builder import write_ome_pyramid

    p = d / "o.ome.tiff"  # SubIFD pyramid + OME-XML metadata
    write_ome_pyramid(p, _rgb(rng, 128, 96), levels=2, physical_size_x=0.5,
                      mag=20.0, extra_planes=1)
    add("ome_subifd", p)

    from tiff_builder import write_bigendian_single_level, write_bigtiff_single_level

    p = d / "big.tiff"
    write_bigtiff_single_level(p, _rgb(rng, 96, 160))
    add("bigtiff", p)
    p = d / "be.tiff"
    write_bigendian_single_level(p, _rgb(rng, 96, 160))
    add("tiff_bigendian", p)

    # Aperio JPEG2000 flavors (33005 RGB comps, 33003 YCbCr comps).
    p = d / "j2k_rgb.svs"
    write_pyramid(p, _rgb(rng, 128, 128), levels=1, tile=64, compression=33005,
                  description="Aperio |MPP = 0.25|")
    add("svs_j2k_rgb", p)
    p = d / "j2k_ycc.svs"
    ycc = rgb_to_full_range_ycbcr(_rgb(rng, 128, 128))
    write_pyramid(p, ycc, levels=1, tile=64, compression=33003,
                  description="Aperio |MPP = 0.25|")
    add("svs_j2k_ycbcr", p)

    # NDPI giant single-strip JPEG with restart markers + SourceLens tags.
    img = _rgb(rng, 96, 256)
    stream = tvf._jpeg_with_restarts(img, rows=2)
    p = d / "n.ndpi"
    tvf._write_single_strip_ndpi(p, tvf._zero_sof_dims(stream), 256, 96)
    add("ndpi_striped", p)

    # Leica SCN collection (macro + region pyramid).
    main = _rgb(rng, 96, 128)
    w = TiffWriter()
    w.add_level(_rgb(rng, 100, 60), description=tvf._scn_xml((60, 100), [(128, 96, 1), (64, 48, 2)], 40))
    w.add_level(main, resolution=(40000.0, 40000.0, 3))
    w.add_level(main[::2, ::2].copy())
    p = d / "s.scn"
    w.save(p)
    add("scn", p)

    # Ventana BIF with AOI join overlaps (positioned painter in play).
    p, _, _ = tvf._overlapping_bif(d)
    add("bif_joints", p)

    # Philips TIFF with UFS XML.
    w = TiffWriter()
    w.add_level(_rgb(rng, 192, 256), tile=128, description=tvf.PHILIPS_XML,
                extra_tags=[(305, TYPE_ASCII, ["Philips DP v1.0"])])
    w.add_level(_rgb(rng, 96, 128), tile=128)
    p = d / "ph.tiff"
    w.save(p)
    add("philips", p)

    # Trestle .tif with per-level OverlapsXY (overlap-corrected canvases).
    w = TiffWriter()
    w.add_level(_rgb(rng, 192, 256), tile=64,
                description="Background Color=FFFFFF;OverlapsXY=16 8 4 2;"
                            "Objective Power=20",
                extra_tags=[(305, TYPE_ASCII, ["MedScan"])])
    w.add_level(_rgb(rng, 96, 128), tile=64)
    p = d / "tr.tif"
    w.save(p)
    add("trestle", p)

    # Non-TIFF containers.
    img = cb.smooth_rgb(128, 96)
    p = cb.write_mirax(d / "m.mrxs", img, tile_w=64, tile_h=48, n_levels=2)
    add("mirax_index", p, p.with_suffix("") / "Index.dat")
    add("mirax_slidedat", p, p.with_suffix("") / "Slidedat.ini")
    data0 = next((p.with_suffix("").glob("Data*.dat")), None)
    if data0 is not None:
        add("mirax_data", p, data0)
    p = cb.write_vms(d / "v.vms", cb.smooth_rgb(128, 128))
    jpg = next(iter(sorted(d.glob("v_*.jpg"))), None)
    if jpg is not None:
        add("vms_jpeg", p, jpg)
    p = cb.write_vmu(d / "u.vmu", cb.smooth_rgb(128, 64), column_width=32)
    add("vmu_ngr", p, p.parent / "u.ngr")
    p = cb.write_dicom_level(d / "dj.dcm", cb.smooth_rgb(128, 64), tile=64)
    add("dicom", p)
    p = cb.write_dicom_level(d / "dk.dcm", cb.smooth_rgb(128, 64), tile=64,
                             codec="j2k")
    add("dicom_j2k", p)
    return corpus


# ---------------------------------------------------------------------- child
def _raise_timeout(signum, frame):  # noqa: ARG001
    raise TimeoutError("case exceeded alarm")


_INTERESTING_U32 = [0, 1, 2, 63, 64, 2**16, 2**24, 2**26, 2**30, 2**31, 2**32 - 1]


def _mutate_tiff_entry(rng: np.random.Generator, raw: bytearray) -> bool:
    """Structure-aware mutation: scramble one IFD entry's type/count/value in
    a classic little-endian TIFF. Every stall the byte-level campaign found
    was of this shape (a tag that still parses but declares garbage), so
    target it directly instead of waiting for random flips to land there."""
    import struct

    if bytes(raw[:4]) != b"II*\x00":
        return False
    try:
        off = struct.unpack_from("<I", raw, 4)[0]
        ifds = []
        for _ in range(8):
            if not (8 <= off <= len(raw) - 6):
                break
            n = struct.unpack_from("<H", raw, off)[0]
            if n == 0 or off + 2 + 12 * n + 4 > len(raw):
                break
            ifds.append((off, n))
            off = struct.unpack_from("<I", raw, off + 2 + 12 * n)[0]
            if off == 0:
                break
        if not ifds:
            return False
        ioff, n = ifds[int(rng.integers(0, len(ifds)))]
        eoff = ioff + 2 + 12 * int(rng.integers(0, n))
        field = int(rng.integers(0, 3))
        if field == 0:  # type
            struct.pack_into("<H", raw, eoff + 2, int(rng.integers(0, 20)))
        elif field == 1:  # count
            struct.pack_into("<I", raw, eoff + 4,
                             int(rng.choice(_INTERESTING_U32)))
        else:  # inline value / data offset
            struct.pack_into("<I", raw, eoff + 8,
                             int(rng.choice(_INTERESTING_U32 + [len(raw) - 1])))
        return True
    except Exception:
        return False


def _mutate(rng: np.random.Generator, original: bytes) -> bytes:
    raw = bytearray(original)
    kind = rng.integers(0, 12)
    if kind >= 10:  # structured TIFF-entry mutation (1-2 entries)
        hit = _mutate_tiff_entry(rng, raw)
        if hit and rng.integers(0, 2):
            _mutate_tiff_entry(rng, raw)
        if hit:
            return bytes(raw)
        kind = rng.integers(0, 10)  # non-TIFF target: fall through
    if kind == 0 and len(raw) > 8:  # truncate
        return bytes(raw[: int(rng.integers(4, len(raw)))])
    if kind == 1:  # append garbage
        return bytes(raw) + bytes(rng.integers(0, 256, int(rng.integers(1, 512)), np.uint8))
    if kind == 2 and len(raw) > 64:  # zero a run
        pos = int(rng.integers(0, len(raw) - 32))
        n = int(rng.integers(4, 32))
        raw[pos : pos + n] = b"\x00" * n
        return bytes(raw)
    if kind == 3 and len(raw) > 64:  # duplicate a slice elsewhere
        a = int(rng.integers(0, len(raw) - 32))
        b = int(rng.integers(0, len(raw) - 32))
        raw[b : b + 16] = raw[a : a + 16]
        return bytes(raw)
    if kind == 4 and len(raw) > 16:  # interesting int32 at an aligned offset
        # Binary containers (MIRAX Index.dat, DICOM, TIFF value arrays) keep
        # counts/offsets as aligned little-endian ints; boundary constants
        # there find size-validation gaps that random flips rarely reach.
        import struct

        for _ in range(int(rng.integers(1, 4))):
            pos = int(rng.integers(0, (len(raw) - 4) // 4)) * 4
            struct.pack_into(
                "<i", raw, pos,
                int(rng.choice([0, 1, -1, 2**16, 2**24, 2**31 - 1, -2**31])),
            )
        return bytes(raw)
    for _ in range(int(rng.integers(1, 16))):  # byte flips (default)
        raw[int(rng.integers(0, len(raw)))] = int(rng.integers(0, 256))
    return bytes(raw)


def run_batch(open_path: str, target_path: str, original: bytes,
              seeds: list[int], status_path: str, hang_log: str) -> None:
    """Child body: run each seed's case; write the seed to status_path BEFORE
    acting so the parent can attribute a signal death."""
    from atlaspatch_tpu.io.factory import WSIFactory

    signal.signal(signal.SIGALRM, _raise_timeout)
    target = Path(target_path)
    status = Path(status_path)
    for seed in seeds:
        status.write_text(str(seed))
        rng = np.random.default_rng(seed)
        target.write_bytes(_mutate(rng, original))
        signal.alarm(CASE_TIMEOUT_S)
        t0 = time.monotonic()
        wsi = None
        try:
            wsi = WSIFactory().load(open_path, mpp=0.5)
            wsi.extract((0, 0), 0, (16, 16))
            wsi.get_thumb((32, 32))
        except TimeoutError:
            with open(hang_log, "a") as f:
                f.write(json.dumps({"seed": seed, "hang_s": time.monotonic() - t0}) + "\n")
        except Exception:
            pass  # clean failure IS the contract
        finally:
            signal.alarm(0)
            if wsi is not None:
                try:
                    wsi.cleanup()
                except Exception:
                    pass
    status.write_text("done")


# --------------------------------------------------------------------- parent
def fuzz_format(name: str, open_path: Path, target: Path, cases: int,
                base_seed: int, report_dir: Path) -> dict:
    original = target.read_bytes()
    status_path = report_dir / f"{name}.status"
    hang_log = report_dir / f"{name}.hangs.jsonl"
    findings: list[dict] = []
    t0 = time.monotonic()
    done = 0
    ctx = mp.get_context("fork")
    while done < cases:
        seeds = [base_seed + done + i for i in range(min(BATCH, cases - done))]
        proc = ctx.Process(
            target=run_batch,
            args=(str(open_path), str(target), original, seeds,
                  str(status_path), str(hang_log)),
        )
        proc.start()
        proc.join(timeout=CASE_TIMEOUT_S * len(seeds) + 60)
        if proc.is_alive():  # batch-level hang the alarm didn't catch
            proc.terminate()
            proc.join(10)
            seed = status_path.read_text().strip()
            findings.append({"kind": "hard-hang", "seed": seed})
            shutil.copyfile(target, report_dir / f"{name}.hang.{seed}")
            done = (int(seed) - base_seed) + 1 if seed.isdigit() else done + len(seeds)
            continue
        if proc.exitcode != 0:
            seed = status_path.read_text().strip()
            findings.append({"kind": "crash", "exitcode": proc.exitcode, "seed": seed})
            shutil.copyfile(target, report_dir / f"{name}.crash.{seed}")
            # Resume after the crashing seed.
            done = (int(seed) - base_seed) + 1 if seed.isdigit() else done + len(seeds)
            continue
        done += len(seeds)
    target.write_bytes(original)
    hangs = sum(1 for _ in open(hang_log)) if hang_log.exists() else 0
    return {
        "format": name,
        "cases": done,
        "crashes": [f for f in findings if f["kind"] != "hang"],
        "soft_hangs": hangs,
        "seconds": round(time.monotonic() - t0, 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=500, help="cases per format")
    ap.add_argument("--formats", type=str, default="", help="comma list; default all")
    ap.add_argument("--out", type=str, default="/tmp/fuzz_report")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    report_dir = Path(args.out)
    report_dir.mkdir(parents=True, exist_ok=True)
    tmp = Path(tempfile.mkdtemp(prefix="fuzzcorpus-"))
    corpus = build_corpus(tmp)
    wanted = [f for f in args.formats.split(",") if f] or list(corpus)
    unknown = sorted(set(wanted) - set(corpus))
    if unknown:
        print(f"unknown formats: {unknown}; available: {sorted(corpus)}")
        return 2

    results = []
    total_findings = 0
    for name in wanted:
        open_path, target = corpus[name]
        r = fuzz_format(name, open_path, target, args.cases,
                        args.seed, report_dir)
        total_findings += len(r["crashes"])
        print(json.dumps(r), flush=True)
        results.append(r)
    (report_dir / "summary.json").write_text(json.dumps(results, indent=1))
    shutil.rmtree(tmp, ignore_errors=True)
    print(f"TOTAL: {sum(r['cases'] for r in results)} cases, "
          f"{total_findings} crash/hard-hang findings, "
          f"{sum(r['soft_hangs'] for r in results)} soft hangs "
          f"(report: {report_dir})")
    return 1 if total_findings else 0


if __name__ == "__main__":
    sys.exit(main())
