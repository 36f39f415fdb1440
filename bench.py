"""End-to-end throughput benchmark — three metrics, one JSON line.

1. ``seg_coords_synthetic`` — slides/hour for segment-and-get-coords on
   in-memory synthetic pyramids (headline; comparable across rounds). The
   reference's headline is 100 WSIs in ~19 s (BASELINE.md) ⇒ ~18,947 slides/h.
2. ``seg_coords_real_tiff`` — the identical pipeline over real pyramidal
   JPEG-tiled SVS files on disk, decoded by the native C++ TIFF layer through
   the production factory/loader. This covers the slide-decode path the
   synthetic metric excludes (the reference's ~19 s includes OpenSlide reads).
3. ``embed_vitl_pps`` — patches embedded/sec through the ViT-L engine path
   (host prep threads → H2D dispatch → jitted forward), the second BASELINE
   north-star metric. No published reference value ⇒ vs_baseline null.

Config: seg bfloat16, seg batch 8, seg input 768 — the CLI's ``--fast``
preset (defaults stay float32/batch-1/1024 for reference-exact numerics). Each stage reports
best AND median over ATLASPATCH_BENCH_PASSES passes: the TPU tunnel on this
host fluctuates >2x run-to-run, so best approximates the machine and median
the session.

Prints ONE JSON line: the headline metric in the driver's
{"metric","value","unit","vs_baseline"} shape, plus "median_value", "config"
and a "metrics" object carrying all three measurements.
"""

from __future__ import annotations

import json
import statistics
import tempfile
import time
from pathlib import Path

import numpy as np

import os
import sys

# A benchmark measures compute, not mask quality: random SAM2/encoder weights
# are explicitly fine here (identical FLOPs/bytes to the real checkpoints).
os.environ.setdefault("ATLASPATCH_ALLOW_RANDOM_WEIGHTS", "1")
# Always collect per-stage counters: every pass's breakdown lands in the JSON
# so a degraded driver capture is self-diagnosing (which stage lost the time —
# decode? open? H5? device dispatch?) instead of a bare slides/hour number.
os.environ.setdefault("ATLASPATCH_PROFILE", "1")

# 192 slides: enough steady state for the 3-stage pipeline to overlap host
# work (thumb decode, contours, H5) with the device fetch wait. Measured on
# the real chip: 64 slides = 11x baseline with the pass fill/drain
# dominating; 192 = 15.6-15.9x with stage-sum > wall (true overlap).
# Larger gives <2% more (fill is already ~13% of the pass).
N_SLIDES = int(os.environ.get("ATLASPATCH_BENCH_SLIDES", "192"))
N_TIFF_SLIDES = int(os.environ.get("ATLASPATCH_BENCH_TIFF_SLIDES", "192"))
N_EMBED_PATCHES = int(os.environ.get("ATLASPATCH_BENCH_EMBED_PATCHES", "512"))
EMBED_ENCODER = os.environ.get("ATLASPATCH_BENCH_EMBED_ENCODER", "vit_l_16")
# Embed chunk size: one constant feeds the warmup, the measured call, AND the
# fetch-decomposition chunk math (keeping them in lockstep).
EMBED_BATCH = int(os.environ.get("ATLASPATCH_BENCH_EMBED_BATCH", "32"))
# Batch 8 is the measured knee on this host (192-slide sweep, bf16):
# real-TIFF median 16.9x at 8 vs 16.4x/15.6x/13.4x at 16/32/64 and 14.9x at
# 4; synthetic 18.4x at 8 vs 17.7x/15.6x at 16/32. Fine-grained batches keep
# the per-batch packed-mask fetch overlapped with the next batch's host prep
# on this 1-CPU host + high-latency tunnel.
SEG_BATCH = int(os.environ.get("ATLASPATCH_BENCH_SEG_BATCH", "8"))
# bfloat16 is the TPU-native precision for the MXU; the CLI default stays
# float32 for users who want the reference's exact numeric chain.
SEG_PRECISION = os.environ.get("ATLASPATCH_BENCH_SEG_PRECISION", "bfloat16")
# SAM2 input size (0 = the architecture's default, 1024 for hiera-tiny).
# 768 is the --fast preset: quality-gated on the trained checkpoint (IoU
# 0.9751 vs 0.9802 at 1024, docs/PERF.md "SAM2 ceiling") for 2x fewer trunk
# FLOPs — the quadratic-MXU lever. Set 1024 to bench the parity resolution.
SEG_INPUT_SIZE = int(os.environ.get("ATLASPATCH_BENCH_SEG_INPUT_SIZE", "768"))
PASSES = max(1, int(os.environ.get("ATLASPATCH_BENCH_PASSES", "5")))  # passes are ~1-2 s each (startup dominates); 5 damps tunnel variance in the median
SKIP = set(os.environ.get("ATLASPATCH_BENCH_SKIP", "").split(","))
SLIDE_W, SLIDE_H = 4096, 3072
BASELINE_SLIDES_PER_HOUR = 100 / 19 * 3600  # reference: 100 WSIs / ~19 s


def _log(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


def _seg_service(cfg_seg):
    """Segmentation wrapper: times the true SAM2 device step but hands the
    geometry stage a thresholded-thumbnail tissue mask, because random-weight
    logits are structureless and would starve the contour/grid/H5 stages."""
    from atlaspatch_tpu.core.models import Mask
    from atlaspatch_tpu.services.segmentation import SAM2SegmentationService

    class BenchSegmentation(SAM2SegmentationService):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self._tissue_by_id: dict = {}  # instance-level: no cross-instance
            # sharing, and dropped (never-dispatched) batches die with the run

        @staticmethod
        def _tissue_of(thumb):
            return (np.asarray(thumb.convert("L"), np.float32) < 220).astype(np.float32)

        def prepare_thumbnails(self, wsis):
            thumbs = super().prepare_thumbnails(wsis)
            for t in thumbs:  # keyed per-thumbnail: prefetch thread safe
                self._tissue_by_id[id(t)] = self._tissue_of(t)
            return thumbs

        def segment_thumbnails_async(self, thumbs):
            inner_resolve = super().segment_thumbnails_async(thumbs)  # timed device path
            tissue = [self._tissue_by_id.pop(id(t), None) for t in thumbs]
            tissue = [
                tis if tis is not None else self._tissue_of(t)
                for tis, t in zip(tissue, thumbs)
            ]

            def resolve():
                inner_resolve()  # wait for the real device masks (timed)
                return [Mask(data=tis, source_shape=tis.shape) for tis in tissue]

            return resolve

        def segment_thumbnails(self, thumbs):
            return self.segment_thumbnails_async(thumbs)()

        def segment_batch(self, wsis):
            return self.segment_thumbnails(self.prepare_thumbnails(wsis))

        def segment_thumbnail(self, wsi):
            return self.segment_batch([wsi])[0]

    return BenchSegmentation(cfg_seg)


class _NullResolver:
    def resolve(self, slide):
        return None


def _host_speed_probe() -> float:
    """Relative host-CPU speed: wall seconds for a fixed single-thread numpy
    workload (~40 ms unloaded on this class of host). Recorded per stage so a
    degraded capture distinguishes 'this code got slower' from 'the host was
    contended N× during this stage' (the r3 driver runs showed real-TIFF
    sagging 40% while synthetic held — a host-CPU signature)."""
    a = np.random.default_rng(1).random((256, 256), np.float64)
    t0 = time.perf_counter()
    for _ in range(12):
        a = np.tanh(a @ a.T * 1e-3)
    float(a.sum())
    return round(time.perf_counter() - t0, 4)


def _stage_snapshot() -> dict[str, list[float]]:
    """Per-stage [wall_s, cpu_s] since the last perf.reset(). cpu_s is the
    stage's true host cycles; wall - cpu is contention/IO/device wait (the
    1-CPU host deschedules stages under each other)."""
    from atlaspatch_tpu.utils import perf

    return {name: [row["total_s"], row["cpu_s"]] for name, row in perf.report().items()}


def _settle(seconds: float | None = None) -> None:
    """Idle gap so one stage's host/relay pressure doesn't bleed into the
    next measurement (the r3 driver capture showed cumulative decay)."""
    s = float(os.environ.get("ATLASPATCH_BENCH_SETTLE", "10")) if seconds is None else seconds
    if s > 0:
        time.sleep(s)


def _run_passes(
    make_runner, n_slides: int, label: str, out_dir_of=None
) -> tuple[float, float, list[dict]]:
    """(best, median, per-pass detail) over PASSES runner executions.

    out_dir_of(p) → that pass's output root; it is DELETED right after the
    pass is measured. /tmp is disk-backed here, and ~200 H5 files × pass
    accumulate dirty pages until kernel writeback stalls a later pass inside
    its timed region (observed: one pass's h5_write wall at 9.4 s vs the
    normal 1.1 s). Deleting still-dirty files discards the pages instead."""
    import shutil

    from atlaspatch_tpu.utils import perf

    rates = []
    passes: list[dict] = []
    for p in range(PASSES):
        runner = make_runner(p)
        host_probe = _host_speed_probe()
        perf.reset()
        prof = None
        if os.environ.get("ATLASPATCH_BENCH_CPROFILE"):
            import cProfile  # noqa: PLC0415 — diagnostic only

            prof = cProfile.Profile(subcalls=False, builtins=False)
            prof.enable()
        t0 = time.perf_counter()
        results, failures = runner.run()
        dt = time.perf_counter() - t0
        if prof is not None:
            prof.disable()
            # Pass-scoped host-cycle profile (warmup/compile excluded). Main
            # thread only — worker-pool cycles show up in the stage counters.
            prof.dump_stats(f"{os.environ['ATLASPATCH_BENCH_CPROFILE']}.{label.replace(' ', '_')}.p{p}")
        assert not failures, failures[:3]
        assert len(results) == n_slides
        assert sum(r.num_patches for r in results) > 0
        if out_dir_of is not None:
            shutil.rmtree(out_dir_of(p), ignore_errors=True)
        rate = n_slides / dt * 3600
        rates.append(rate)
        passes.append(
            {"rate": round(rate, 1), "wall_s": round(dt, 3),
             "host_probe_s": host_probe, "stages": _stage_snapshot()}
        )
        _log(f"{label} pass {p + 1}/{PASSES}: {rate:.0f} slides/hour (host probe {host_probe * 1000:.0f} ms)")
    return max(rates), statistics.median(rates), passes


def _make_app_cfg(in_dir: Path, out_root: Path):
    from atlaspatch_tpu.core.config import (
        AppConfig,
        ExtractionConfig,
        OutputConfig,
        ProcessingConfig,
        SegmentationConfig,
    )

    return AppConfig(
        processing=ProcessingConfig(input_path=in_dir),
        segmentation=SegmentationConfig(
            device="tpu", batch_size=SEG_BATCH, precision=SEG_PRECISION,
            input_size=SEG_INPUT_SIZE or None,
        ),
        extraction=ExtractionConfig(
            patch_size=256, target_magnification=20, tissue_threshold=0.0
        ),
        output=OutputConfig(output_root=out_root, skip_existing=False),
        device="tpu",
    )


def _clone_cfg_with_output(cfg, out_root: Path):
    from atlaspatch_tpu.core.config import AppConfig, OutputConfig

    return AppConfig(
        processing=cfg.processing,
        segmentation=cfg.segmentation,
        extraction=cfg.extraction,
        output=OutputConfig(output_root=out_root, skip_existing=False),
        device="tpu",
    )


def write_tiff_corpus(tmp: Path) -> Path:
    """Write the real-TIFF corpus BEFORE any JAX warmup so the one CPU isn't
    encoding 64 JPEG pyramids while the relay warms, and the page cache is
    settled by the time the measured passes read the files back."""
    sys.path.insert(0, str(Path(__file__).parent / "tests"))
    from tiff_builder import write_pyramid  # noqa: PLC0415

    from atlaspatch_tpu.io.synthetic_wsi import make_tissue_canvas

    in_dir = tmp / "tiff_slides"
    in_dir.mkdir()
    _log(f"writing {N_TIFF_SLIDES} JPEG-tiled pyramidal SVS files ...")
    canvases = [make_tissue_canvas(SLIDE_W, SLIDE_H, seed=100 + s, n_blobs=3) for s in range(4)]
    for i in range(N_TIFF_SLIDES):
        write_pyramid(
            in_dir / f"tslide{i:03d}.svs",
            canvases[i % 4],
            levels=3,
            tile=256,
            compression=7,  # JPEG chunks: the Aperio hot path
            description=f"Aperio Image Library v12\r\n{SLIDE_W}x{SLIDE_H} | AppMag = 20 | MPP = 0.5",
        )
    return in_dir


def bench_seg_coords_synthetic(seg, tmp: Path) -> tuple[float, float, list[dict]]:
    """Stage 1: in-memory synthetic pyramids (decode excluded by design)."""
    from atlaspatch_tpu.io.synthetic_wsi import SyntheticWSI, make_tissue_canvas
    from atlaspatch_tpu.orchestration.runner import ProcessingRunner
    from atlaspatch_tpu.services.extraction import PatchExtractionService

    canvases = [make_tissue_canvas(SLIDE_W, SLIDE_H, seed=s, n_blobs=3) for s in range(4)]
    slides = {
        f"slide{i:03d}": SyntheticWSI(
            path=f"/virtual/slide{i:03d}.svs", mpp=0.5, level0=canvases[i % 4], levels=3
        )
        for i in range(N_SLIDES)
    }

    class BenchLoader:
        def open(self, slide):
            wsi = slides[slide.stem]
            wsi._loaded = False  # fresh open semantics
            return wsi

    in_dir = tmp / "syn_slides"
    in_dir.mkdir()
    for stem in slides:
        (in_dir / f"{stem}.svs").touch()  # discovery placeholders
    cfg = _make_app_cfg(in_dir, tmp / "syn_out")

    # Warmup compiles the SAM2 step for the exact thumb shapes/batches used —
    # including the run's REMAINDER batch, which pow2-pads to its own shape
    # and would otherwise compile inside the first timed pass.
    warm_sizes = {min(SEG_BATCH, N_SLIDES)}
    if N_SLIDES % SEG_BATCH:
        warm_sizes.add(N_SLIDES % SEG_BATCH)
    for size in sorted(warm_sizes):
        warm = [slides[f"slide{i:03d}"] for i in range(size)]
        seg.segment_thumbnails(seg.prepare_thumbnails(warm))
        seg.segment_thumbnails(seg.prepare_thumbnails(warm))
    # Render every synthetic slide's thumbnail once: SyntheticWSI builds its
    # pyramid views lazily on first touch, and with only the first batch
    # warmed, pass 1 was paying that for the other 160 slides inside its
    # timed region (observed 107k vs a 289-297k steady state).
    for i in range(0, N_SLIDES, SEG_BATCH):
        batch = [slides[f"slide{j:03d}"] for j in range(i, min(i + SEG_BATCH, N_SLIDES))]
        seg.prepare_thumbnails(batch)

    def make_runner(p):
        cfg_p = _clone_cfg_with_output(cfg, tmp / f"syn_out/pass{p}")
        return ProcessingRunner(
            config=cfg_p,
            segmentation=seg,
            extractor=PatchExtractionService(cfg_p.extraction, cfg_p.output),
            visualizer=None,
            mpp_resolver=_NullResolver(),
            wsi_loader=BenchLoader(),
        )

    return _run_passes(
        make_runner, N_SLIDES, "synthetic", out_dir_of=lambda p: tmp / f"syn_out/pass{p}"
    )


def bench_seg_coords_real_tiff(seg, tmp: Path, in_dir: Path) -> tuple[float, float, list[dict]]:
    """Stage 2: the same pipeline over real JPEG-tiled pyramids on disk,
    decoded by the native TIFF layer through the production loader. The
    corpus was pre-written by write_tiff_corpus before JAX warmup."""
    from atlaspatch_tpu.orchestration.runner import ProcessingRunner
    from atlaspatch_tpu.services.extraction import PatchExtractionService
    from atlaspatch_tpu.services.wsi_loader import DefaultWSILoader

    cfg = _make_app_cfg(in_dir, tmp / "tiff_out")

    # Warmup: real-pyramid thumbnails have their own native shapes, so the
    # grouped SAM2 step compiles fresh variants; pay that outside the timing.
    from atlaspatch_tpu.core.models import Slide

    loader = DefaultWSILoader()
    paths = sorted(in_dir.glob("*.svs"))
    for p in paths:
        p.read_bytes()  # page-cache warm: pass 1 must not measure cold disk
    warm_sizes = {min(SEG_BATCH, N_TIFF_SLIDES)}
    if N_TIFF_SLIDES % SEG_BATCH:
        warm_sizes.add(N_TIFF_SLIDES % SEG_BATCH)  # the run's remainder batch
    for size in sorted(warm_sizes):
        warm_wsis = [loader.open(Slide(path=p)) for p in paths[:size]]
        seg.segment_thumbnails(seg.prepare_thumbnails(warm_wsis))
        for w in warm_wsis:
            w.cleanup()

    def make_runner(p):
        cfg_p = _clone_cfg_with_output(cfg, tmp / f"tiff_out/pass{p}")
        return ProcessingRunner(
            config=cfg_p,
            segmentation=seg,
            extractor=PatchExtractionService(cfg_p.extraction, cfg_p.output),
            visualizer=None,
            mpp_resolver=_NullResolver(),
            wsi_loader=DefaultWSILoader(),
        )

    return _run_passes(
        make_runner, N_TIFF_SLIDES, "real-tiff", out_dir_of=lambda p: tmp / f"tiff_out/pass{p}"
    )


def bench_embed_vitl(tmp: Path) -> dict:
    """Stage 3: ViT-L patches/sec through the full engine path (host prep
    threads → uint8 H2D → fused preprocess+forward on device)."""
    from atlaspatch_tpu.models.encoders.zoo import build_default_registry
    from atlaspatch_tpu.utils import perf

    registry = build_default_registry(device="tpu", dtype="bfloat16")
    extractor = registry.create(EMBED_ENCODER)
    rng = np.random.default_rng(0)
    patches = list(rng.integers(0, 255, (N_EMBED_PATCHES, 256, 256, 3), dtype=np.uint8))

    # Warmup: compile every bucket the measured call will hit — the full
    # EMBED_BATCH-patch chunks AND the remainder chunk's pow2 bucket.
    warm = extractor.extract_batch(
        patches[: min(2 * EMBED_BATCH, len(patches))], batch_size=EMBED_BATCH
    )
    assert np.isfinite(warm).all()
    if N_EMBED_PATCHES % EMBED_BATCH:
        extractor.extract_batch(
            patches[: N_EMBED_PATCHES % EMBED_BATCH], batch_size=EMBED_BATCH
        )

    rates = []
    pass_detail: list[dict] = []
    for p in range(PASSES):
        if p:
            _settle(float(os.environ.get("ATLASPATCH_BENCH_PASS_SETTLE", "5")))
        host_probe = _host_speed_probe()
        perf.reset()
        t0 = time.perf_counter()
        feats = extractor.extract_batch(patches, batch_size=EMBED_BATCH)
        feats = np.asarray(feats)  # force full host materialization
        dt = time.perf_counter() - t0
        assert feats.shape[0] == N_EMBED_PATCHES and np.isfinite(feats).all()
        rate = N_EMBED_PATCHES / dt
        rates.append(rate)
        stages = _stage_snapshot()
        pass_detail.append(
            {"rate": round(rate, 1), "wall_s": round(dt, 3),
             "host_probe_s": host_probe, "stages": stages}
        )
        _log(f"embed {EMBED_ENCODER} pass {p + 1}/{PASSES}: {rate:.1f} patches/s")

    # Link decomposition (VERDICT r4 #3): how much of each pass is the final
    # blocking materialization vs dispatch/prep, and the per-chunk cost.
    n_chunks = -(-N_EMBED_PATCHES // EMBED_BATCH)
    fetch_s = [d["stages"].get("embed_fetch", [0.0])[0] for d in pass_detail]
    fetch_med = statistics.median(fetch_s) if fetch_s else 0.0
    fetch_decomp = {
        "chunks": n_chunks,
        "fetch_s_median": round(fetch_med, 3),
        "per_chunk_ms_median": round(1000.0 * fetch_med / n_chunks, 1),
        "mode": (
            "deferred" if os.environ.get("ATLASPATCH_DEFERRED_FETCH", "1") == "1"
            else "blocking"
        ),
        "d2h_dtype": (
            "bf16" if os.environ.get("ATLASPATCH_FEATURE_D2H_BF16", "0") == "1"
            else "f32"
        ),
    }

    # Device-resident compute rate: same jitted program over an on-device
    # batch, excluding the host link. On this host the link fluctuates >3x
    # between runs, so this is the stable round-over-round compute signal;
    # on real TPU hosts (local DMA) end-to-end approaches this ceiling.
    import jax

    def _resident_rate(ex, label: str) -> float:
        imgs_local = np.stack([ex.spec.apply_host(p) for p in patches[:32]])
        out = ex._forward_async(imgs_local)  # ensure compiled for this shape
        np.asarray(out)
        fn = ex._jitted[imgs_local.shape]
        dev_local = jax.device_put(imgs_local, ex.device)
        best = 0.0
        for _ in range(2):
            reps = 32  # enough queue depth to amortize the final fetch latency
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(ex.params, dev_local)
            np.asarray(out[0, :8])  # tiny sync fetch; full D2H is not the metric
            best = max(best, 32 * reps / (time.perf_counter() - t0))
        _log(f"embed {EMBED_ENCODER} device-resident {label}: {best:.1f} patches/s")
        return best

    resident = _resident_rate(extractor, "bf16-erf")
    extractor.cleanup()

    from atlaspatch_tpu.models.encoders.zoo import ENTRIES, build_extractor

    # bf16 + tanh GELU: the documented +32% serving mode (docs/PERF.md).
    # erf stays the parity default, but the bench must track both or
    # round-over-round comparisons silently mix modes (VERDICT r3 #6).
    # The substitution only engages for erf-GELU towers (vit.py act hook);
    # for any other activation the erf rate would masquerade as tanh, so
    # skip — and a failed tanh build must not kill the bench after the
    # expensive seg stages already ran.
    resident_tanh = 0.0
    if getattr(ENTRIES[EMBED_ENCODER].spec, "act", None) != "gelu":
        _log(f"embed {EMBED_ENCODER}: not an erf-GELU tower; skipping tanh metric")
    else:
        prev_tanh = os.environ.get("ATLASPATCH_GELU_TANH")
        os.environ["ATLASPATCH_GELU_TANH"] = "1"
        try:
            ex_t = build_extractor(ENTRIES[EMBED_ENCODER], compute_dtype="bfloat16")
            resident_tanh = _resident_rate(ex_t, "bf16-tanh")
            ex_t.cleanup()
        except Exception as e:  # noqa: BLE001 — degrade to a logged skip
            _log(f"embed {EMBED_ENCODER}: tanh metric failed ({e}); skipping")
        finally:
            if prev_tanh is None:
                os.environ.pop("ATLASPATCH_GELU_TANH", None)
            else:
                os.environ["ATLASPATCH_GELU_TANH"] = prev_tanh

    # Optional: the W8A8 serving mode's resident rate (same weights,
    # quantized). Round-over-round signal for the int8 path.
    resident_i8 = 0.0
    if os.environ.get("ATLASPATCH_BENCH_INT8", "1") == "1":
        ex8 = build_extractor(ENTRIES[EMBED_ENCODER], compute_dtype="int8")
        if ex8.compute_dtype != "int8":
            # no int8 plan for this family (zoo fell back to bf16): reporting
            # that rate under the int8 key would corrupt round-over-round
            # int8 tracking
            _log(f"embed {EMBED_ENCODER}: no int8 plan; skipping int8 metric")
        else:
            resident_i8 = _resident_rate(ex8, "int8")
        ex8.cleanup()
    return {
        "value": round(max(rates), 1),
        "median": round(statistics.median(rates), 1),
        "device_resident": round(resident, 1),
        "device_resident_tanh": round(resident_tanh, 1),
        "device_resident_int8": round(resident_i8, 1),
        "unit": "patches/s",
        "vs_baseline": None,  # no published reference number
        "fetch_decomposition": fetch_decomp,
        "passes": pass_detail,
    }


def emit_results(metrics: dict[str, dict]) -> str:
    """Build the single stdout JSON line + write the per-pass sidecar.

    Per-pass stage tables (the self-diagnosis layer) go to a SIDECAR file +
    stderr, never stdout: the driver keeps only a 2000-char tail of stdout
    and BENCH_r04's 4.5 KB line officially parsed as null (VERDICT r4 #1).
    stdout stays one compact machine-first headline line — the contract is
    pinned by tests/test_bench_output.py.
    """
    detail_path = os.environ.get(
        "ATLASPATCH_BENCH_DETAIL", str(Path(__file__).parent / "BENCH_DETAIL.json")
    )
    try:
        Path(detail_path).write_text(json.dumps(metrics, indent=1))
        _log(f"per-pass stage detail written to {detail_path}")
    except OSError as e:
        _log(f"could not write bench detail sidecar: {e}")

    headline_key = (
        "seg_coords_synthetic" if "seg_coords_synthetic" in metrics else next(iter(metrics))
    )
    headline = metrics[headline_key]
    names = {
        "seg_coords_synthetic": "seg+coords slides/hour (single chip, end-to-end",
        "seg_coords_real_tiff": "seg+coords slides/hour (real TIFF decode, end-to-end",
        "embed_vitl_pps": f"{EMBED_ENCODER} patches/s (engine end-to-end",
    }
    compact_metrics = {
        key: {k: v for k, v in m.items() if k != "passes"} for key, m in metrics.items()
    }
    return json.dumps(
        {
            "metric": (
                f"{names.get(headline_key, headline_key)}, seg {SEG_PRECISION}, "
                f"batch {SEG_BATCH} = --fast preset; best of {PASSES})"
            ),
            "value": headline["value"],
            "unit": headline["unit"],
            "vs_baseline": headline["vs_baseline"],
            "median_value": headline["median"],
            "config": {
                "seg_precision": SEG_PRECISION,
                "seg_batch": SEG_BATCH,
                "seg_input_size": SEG_INPUT_SIZE or "arch-default",
                "passes": PASSES,
                "cli_equivalent": "--fast",
            },
            "metrics": compact_metrics,
        }
    )


def main() -> None:
    metrics: dict[str, dict] = {}
    with tempfile.TemporaryDirectory() as tmpdir:
        tmp = Path(tmpdir)
        tiff_dir = write_tiff_corpus(tmp) if "real_tiff" not in SKIP else None
        seg = None
        if "synthetic" not in SKIP or "real_tiff" not in SKIP:
            from atlaspatch_tpu.core.config import SegmentationConfig

            seg = _seg_service(
                SegmentationConfig(
                    device="tpu", batch_size=SEG_BATCH, precision=SEG_PRECISION,
                    input_size=SEG_INPUT_SIZE or None,
                )
            )

        if "synthetic" not in SKIP:
            best, med, passes = bench_seg_coords_synthetic(seg, tmp)
            metrics["seg_coords_synthetic"] = {
                "value": round(best, 1),
                "median": round(med, 1),
                "unit": "slides/hour",
                "vs_baseline": round(best / BASELINE_SLIDES_PER_HOUR, 3),
                "median_vs_baseline": round(med / BASELINE_SLIDES_PER_HOUR, 3),
                "passes": passes,
            }
        if "real_tiff" not in SKIP:
            _settle()  # isolate from the synthetic stage's host/relay pressure
            best, med, passes = bench_seg_coords_real_tiff(seg, tmp, tiff_dir)
            metrics["seg_coords_real_tiff"] = {
                "value": round(best, 1),
                "median": round(med, 1),
                "unit": "slides/hour",
                "vs_baseline": round(best / BASELINE_SLIDES_PER_HOUR, 3),
                "median_vs_baseline": round(med / BASELINE_SLIDES_PER_HOUR, 3),
                "passes": passes,
            }
        if "embed" not in SKIP:
            # Release the seg stage's device buffers/thread pools and drop the
            # 64-file SVS corpus before measuring embed: BENCH_r03 showed the
            # embed e2e rate decaying 189→90 pps across passes under the
            # earlier stages' residual pressure (VERDICT r3 #4).
            if seg is not None:
                seg.close()
                seg = None
            if tiff_dir is not None:
                import shutil

                shutil.rmtree(tiff_dir, ignore_errors=True)
            _settle()
            metrics["embed_vitl_pps"] = bench_embed_vitl(tmp)

    if not metrics:
        print(
            json.dumps({"metric": "nothing measured (all stages skipped)", "value": 0,
                        "unit": "", "vs_baseline": None})
        )
        return
    print(emit_results(metrics))


if __name__ == "__main__":
    main()
