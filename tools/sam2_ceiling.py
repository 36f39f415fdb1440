#!/usr/bin/env python
"""SAM2 trunk ceiling analysis: FLOPs, bytes, MFU, and the top-op table.

Round 3 gave ViT-L a profiler-backed MFU number (docs/PERF.md); this does the
same for the seg forward, which the deepened pipeline now saturates (the
device-side bound at ~100 thumbs/s resident). Two independent sources:

1. XLA's own cost model for the COMPILED fused step
   (``compiled.cost_analysis()`` — flops / bytes accessed), at several input
   sizes and batch sizes, so MFU = flops x thumbs/s / peak follows from any
   measured rate.
2. An analytic per-module count (hiera trunk windows/global blocks, FPN neck,
   mask decoder) as a sanity cross-check of (1), plus a per-HLO-op table from
   the compiled module (dot/conv/other buckets) so the "where do the FLOPs
   live" question has an answer.

Run on any platform (the cost model is platform-independent; the measured
rate should come from the real chip — pass it via --thumbs-per-sec):

    python tools/sam2_ceiling.py --sizes 512,768,1024 --batch 8 \
        --thumbs-per-sec 101 --peak-tflops 197

v5e bf16 peak = 197 TFLOP/s. Prints a markdown table ready for docs/PERF.md.
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import defaultdict
from pathlib import Path

os.environ.setdefault("ATLASPATCH_ALLOW_RANDOM_WEIGHTS", "1")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def analyze_size(size: int, batch: int, precision: str, measure: bool = False):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from atlaspatch_tpu.models.sam2.config import SAM2Config
    from atlaspatch_tpu.models.sam2.model import init_params, segment_step_packed

    cfg = SAM2Config.tiny()
    if size != cfg.image_size:
        # same override the seg service applies for --seg-input-size
        # (services/segmentation.py: checkpoints are size-agnostic)
        cfg = dataclasses.replace(cfg, image_size=size)
    params = init_params(cfg, 0)
    if precision == "bfloat16":
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    images = jnp.zeros((batch, size, size, 3), jnp.uint8)
    thr = jnp.asarray(0.0, jnp.float32)

    def _cost(compiled):
        c = compiled.cost_analysis()
        if isinstance(c, list):  # older jax returns [dict]
            c = c[0]
        return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))

    compiled = segment_step_packed.lower(cfg, params, images, thr).compile()
    flops, bytes_accessed = _cost(compiled)

    # Module split: trunk alone, then trunk+neck+projections (image_features),
    # so decoder+heads+upscale = full - image_features.
    from atlaspatch_tpu.models.sam2.model import SAM2ImageModel, normalize_images

    model = SAM2ImageModel(cfg)
    cdtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    pix = normalize_images(cfg, images).astype(cdtype)
    trunk_flops, _ = _cost(jax.jit(
        lambda p, x: model.apply({"params": p}, x, method=lambda m, y: m.backbone(y))
    ).lower(params, pix).compile())
    feat_flops, _ = _cost(jax.jit(
        lambda p, x: model.apply({"params": p}, x, method=SAM2ImageModel.image_features)
    ).lower(params, pix).compile())

    # Per-op-kind buckets from the optimized HLO: where the FLOPs live.
    buckets: dict[str, int] = defaultdict(int)
    try:
        hlo = compiled.as_text()
        for line in hlo.splitlines():
            s = line.strip()
            for kind in ("dot(", "convolution(", "custom-call"):
                if f" = " in s and kind in s:
                    buckets[kind.rstrip("(")] += 1
    except Exception:  # noqa: BLE001 — HLO text is diagnostic only
        pass
    resident = None
    if measure:
        # Device-resident rate, same protocol as bench.py's embed resident
        # measure: repeated dispatches (no per-call fetch) + one tiny sync
        # fetch — per-dispatch calls can't be folded across invocations, so
        # no scan-tie trick is needed (CLAUDE.md caution applies to scan).
        import time

        import numpy as np

        rng = np.random.default_rng(0)
        host_imgs = rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8)
        dev_imgs = jax.device_put(jnp.asarray(host_imgs))
        out = segment_step_packed(cfg, params, dev_imgs, thr)
        np.asarray(jax.tree.leaves(out)[0])  # warm + sync
        best = 0.0
        for _ in range(3):
            reps = 8
            t0 = time.perf_counter()
            for _ in range(reps):
                out = segment_step_packed(cfg, params, dev_imgs, thr)
            np.asarray(jax.tree.leaves(out)[0].ravel()[:8])
            best = max(best, batch * reps / (time.perf_counter() - t0))
        resident = best

    return {
        "size": size,
        "batch": batch,
        "resident_thumbs_per_s": resident,
        "flops_per_thumb": flops / batch,
        "gbytes_per_thumb": bytes_accessed / batch / 1e9,
        "trunk_flops_per_thumb": trunk_flops / batch,
        "neck_flops_per_thumb": (feat_flops - trunk_flops) / batch,
        "head_flops_per_thumb": (flops - feat_flops) / batch,
        "hlo_ops": dict(buckets),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="512,768,1024")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--precision", default="bfloat16")
    ap.add_argument("--thumbs-per-sec", type=float, default=None,
                    help="measured resident rate at --rate-size")
    ap.add_argument("--rate-size", type=int, default=1024,
                    help="the input size --thumbs-per-sec was measured at")
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--measure", action="store_true",
                    help="also measure the device-resident rate per size "
                         "(run on the real chip, host otherwise idle)")
    args = ap.parse_args()

    rows = [analyze_size(int(s), args.batch, args.precision, args.measure)
            for s in args.sizes.split(",")]
    print("| input | GFLOP/thumb | trunk | neck | heads | GB/thumb | arith. intensity (FLOP/B) |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        ai = r["flops_per_thumb"] / max(1.0, r["gbytes_per_thumb"] * 1e9)
        print(f"| {r['size']} | {r['flops_per_thumb'] / 1e9:.1f} "
              f"| {r['trunk_flops_per_thumb'] / 1e9:.1f} "
              f"| {r['neck_flops_per_thumb'] / 1e9:.1f} "
              f"| {r['head_flops_per_thumb'] / 1e9:.1f} "
              f"| {r['gbytes_per_thumb']:.2f} | {ai:.0f} |")
    for r in rows:
        rate = r["resident_thumbs_per_s"]
        if rate is None and args.thumbs_per_sec and r["size"] == args.rate_size:
            rate = args.thumbs_per_sec
        if rate:
            tfps = r["flops_per_thumb"] * rate / 1e12
            print(f"\n@{r['size']}: {rate:.1f} thumbs/s resident -> "
                  f"{tfps:.1f} TFLOP/s = {100 * tfps / args.peak_tflops:.1f}% of "
                  f"{args.peak_tflops:.0f} TFLOP/s peak")
    for r in rows:
        if r["hlo_ops"]:
            print(f"# size {r['size']} HLO op counts: {r['hlo_ops']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
