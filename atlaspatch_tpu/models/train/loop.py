"""SAM2 finetuning driver: (thumbnail, mask) pairs → norm-only updates.

The reference ships no training code — its model card only documents the
recipe ("~35,000 semi-manually annotated WSI thumbnails; SAM2 finetuned with
backbone frozen, only normalization layers trained", SURVEY.md §6 /
reference CHANGELOG.md:13). This module re-creates that capability
TPU-first: the fused jitted train step from models/train/finetune.py
(focal+dice+IoU loss, gradient AND update masking to the norm parameters),
optionally data-parallel over a device mesh with XLA-inserted collectives,
host-side image loading on threads, orbax step checkpoints, and a final
``.npz`` archive directly consumable by ``--sam2-checkpoint``.
"""

from __future__ import annotations

import dataclasses
import logging
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Callable, Optional

import numpy as np

logger = logging.getLogger("atlaspatch_tpu.train")

_IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")


def collect_pairs(images_dir: Path, masks_dir: Path) -> list[tuple[Path, Path]]:
    """Match images to masks by stem (`<stem>.*` or `<stem>_mask.*`)."""
    images_dir, masks_dir = Path(images_dir), Path(masks_dir)
    mask_by_stem: dict[str, Path] = {}
    for p in sorted(masks_dir.iterdir()) if masks_dir.is_dir() else []:
        if p.suffix.lower() not in _IMAGE_EXTS:
            continue
        stem = p.stem[:-5] if p.stem.endswith("_mask") else p.stem
        mask_by_stem.setdefault(stem, p)
    pairs = []
    for p in sorted(images_dir.iterdir()):
        if p.suffix.lower() not in _IMAGE_EXTS:
            continue
        m = mask_by_stem.get(p.stem)
        if m is not None:
            pairs.append((p, m))
    if not pairs:
        raise FileNotFoundError(
            f"no (image, mask) pairs: images={images_dir} masks={masks_dir} "
            "(masks match images by stem, with an optional '_mask' suffix)"
        )
    return pairs


def load_pair(img_path: Path, mask_path: Path, size: int) -> tuple[np.ndarray, np.ndarray]:
    """uint8 (S,S,3) image + float32 (S,S) {0,1} mask, resized like the
    inference path (bilinear image, NEAREST mask — segmentation service
    parity)."""
    from PIL import Image

    img = Image.open(img_path).convert("RGB").resize((size, size), Image.BILINEAR)
    mask = Image.open(mask_path).convert("L").resize((size, size), Image.NEAREST)
    return np.asarray(img, np.uint8), (np.asarray(mask) > 127).astype(np.float32)


def finetune_sam2(
    images_dir: Path,
    masks_dir: Path,
    output_dir: Path,
    *,
    epochs: int = 1,
    batch_size: int = 2,
    learning_rate: float = 1e-4,
    checkpoint: Optional[Path] = None,
    config_path: Optional[Path] = None,
    image_size: Optional[int] = None,
    data_parallel: int = 1,
    save_every: int = 0,
    seed: int = 0,
    device: str = "tpu",
    loader_threads: int = 8,
    val_fraction: float = 0.0,
    resume: bool = False,
    lr_schedule: str = "constant",
    warmup_steps: int = 0,
    augment: bool = False,
    trainable: str = "norms",
    on_step: Optional[Callable[[int, float], None]] = None,
) -> dict:
    """Run the finetune and return a summary dict.

    ``image_size`` overrides the model input size — useful for small-scale
    experiments with random init; a checkpoint trained at 1024 loads only at
    its own size (shape mismatches fail loudly at load).
    """
    import jax

    from atlaspatch_tpu.core.config import SegmentationConfig
    from atlaspatch_tpu.models.sam2.config import SAM2Config
    from atlaspatch_tpu.models.train.checkpoints import save_checkpoint
    from atlaspatch_tpu.models.train.finetune import (
        make_eval_step,
        make_optimizer,
        make_train_step,
        shard_train_step,
    )
    from atlaspatch_tpu.services.segmentation import SAM2Predictor
    from atlaspatch_tpu.tools.convert_weights import _flatten

    # Multi-host: initialize the cross-host collective context while every
    # process is still in lockstep (right after jax.distributed rendezvous).
    # The first collective otherwise fires only after minutes of (contended)
    # SAM2 compilation, and the backend's ~30 s key-exchange window expires
    # when hosts reach it skewed (observed: "Gloo context initialization
    # failed: GetKeyValue() timed out").
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("atlaspatch_finetune_start")

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    pairs = collect_pairs(images_dir, masks_dir)

    val_pairs: list = []
    if val_fraction > 0:
        split_rng = np.random.default_rng(seed)  # deterministic holdout
        order = split_rng.permutation(len(pairs))
        n_val = max(1, int(round(len(pairs) * val_fraction)))
        if n_val >= len(pairs):
            raise ValueError("val_fraction leaves no training pairs")
        val_pairs = [pairs[i] for i in order[:n_val]]
        pairs = [pairs[i] for i in order[n_val:]]

    sam2_cfg = (
        SAM2Config.from_reference_yaml(config_path)
        if config_path is not None
        else SAM2Config.tiny()
    )
    if image_size is not None:
        sam2_cfg = dataclasses.replace(sam2_cfg, image_size=int(image_size))

    seg_cfg = SegmentationConfig(
        checkpoint_path=checkpoint, device=device
    ).validated()
    predictor = SAM2Predictor(seg_cfg, sam2_cfg=sam2_cfg)
    params, sam2_cfg = predictor.params, predictor.sam2_cfg
    size = sam2_cfg.image_size

    steps_per_epoch = max(1, len(pairs) // batch_size)
    optimizer = make_optimizer(
        learning_rate,
        schedule=lr_schedule,
        warmup_steps=warmup_steps,
        total_steps=epochs * steps_per_epoch,
    )
    opt_state = optimizer.init(params)

    # Multi-host DP: when launched under jax.distributed (maybe_init_distributed
    # in the CLI, or a test harness), every process runs this loop in lockstep
    # over a GLOBAL mesh of all hosts' devices. batch_size stays the GLOBAL
    # batch; each host loads only its contiguous slice and contributes it via
    # host_local_array_to_global_array — the gradient all-reduce is inserted
    # by XLA exactly as in the single-host sharded path.
    n_proc = jax.process_count()
    mh: tuple[int, int] | None = None  # this host's (start row, row count)
    mesh = None
    if n_proc > 1:
        from jax.sharding import Mesh

        devices = np.asarray(jax.devices())  # all hosts' devices
        # The P("data") sharding splits batch rows over EVERY mesh device,
        # not just one per host — validate against the real requirement so
        # the failure is this message, not a shape error inside jit.
        if batch_size % devices.size:
            raise ValueError(
                f"global batch size {batch_size} must divide over the "
                f"{devices.size} devices of the global mesh ({n_proc} hosts)"
            )
        mesh = Mesh(devices, ("data",))
        # Each host contributes rows proportional to ITS device count (hosts
        # may have unequal counts): host_local_array_to_global_array
        # concatenates the per-process arrays in process order, and the
        # result must land batch_size/devices.size rows on every device.
        rows_per_dev = batch_size // devices.size
        proc_of = np.asarray([d.process_index for d in devices.flat])
        counts = np.bincount(proc_of, minlength=n_proc)
        me = jax.process_index()
        mh = (int(counts[:me].sum()) * rows_per_dev, int(counts[me]) * rows_per_dev)
        step = shard_train_step(sam2_cfg, optimizer, mesh, trainable=trainable)
    elif data_parallel > 1:
        from jax.sharding import Mesh

        devices = jax.devices()
        if len(devices) < data_parallel:
            raise RuntimeError(
                f"--data-parallel {data_parallel} needs that many devices; "
                f"{len(devices)} visible"
            )
        if batch_size % data_parallel:
            raise ValueError("batch size must divide evenly over data_parallel")
        mesh = Mesh(np.asarray(devices[:data_parallel]), ("data",))
        step = shard_train_step(sam2_cfg, optimizer, mesh, trainable=trainable)
    else:
        step = jax.jit(make_train_step(sam2_cfg, optimizer, trainable=trainable))

    rng = np.random.default_rng(seed)
    pool = ThreadPoolExecutor(max_workers=max(1, loader_threads))
    losses: list[float] = []
    global_step = 0
    start_epoch = 0

    ckpt_dir = output_dir / "checkpoints"
    run_meta = {
        "n_pairs": len(pairs),
        "n_val_pairs": len(val_pairs),
        "batch_size": batch_size,
        "seed": seed,
        "image_size": size,
        "lr_schedule": lr_schedule,
        "warmup_steps": warmup_steps,
        "augment": augment,
        "trainable": trainable,
        # A changed LR breaks the exact-reproduction guarantee in any
        # schedule, so it is always pinned. epochs/total_steps shape ONLY the
        # cosine decay — pinning them under "constant" would reject the
        # legitimate resume-an-interrupted-run-with-the-full-epoch-count
        # workflow, so they are recorded only when they matter.
        "learning_rate": learning_rate,
    }
    if lr_schedule == "cosine":
        run_meta["epochs"] = epochs
        run_meta["total_steps"] = epochs * steps_per_epoch
    resumed_at = 0
    if resume:
        import json

        from atlaspatch_tpu.models.train.checkpoints import (
            latest_step,
            restore_checkpoint,
        )

        step_no = latest_step(ckpt_dir)
        if step_no is None:
            # A silent fresh start would be indistinguishable from a real
            # resume — hours of training could restart unnoticed.
            raise FileNotFoundError(
                f"--resume: no checkpoints under {ckpt_dir} (the previous run "
                "needs --save-every > 0); rerun without --resume to start fresh"
            )
        meta_path = ckpt_dir / "meta.json"
        if meta_path.exists():
            saved = json.loads(meta_path.read_text())
            # Compare only keys the checkpointed run recorded: meta.json
            # written before a key existed must stay resumable (the value was
            # simply not tracked then), but any RECORDED value must match.
            diffs = {
                k: (saved[k], run_meta[k])
                for k in run_meta
                if k in saved and saved[k] != run_meta[k]
            }
            if diffs:
                raise ValueError(
                    "--resume: run configuration differs from the checkpointed "
                    f"run (saved vs current): {diffs}. Epoch replay would be "
                    "silently wrong; start a fresh output dir instead."
                )
            untracked = sorted(k for k in run_meta if k not in saved)
            if untracked:
                logger.warning(
                    "--resume: checkpoint meta.json predates %s; cannot verify "
                    "those settings match the original run",
                    untracked,
                )
        params, opt_state, global_step = restore_checkpoint(
            ckpt_dir, step_no, jax.device_get(params), jax.device_get(opt_state)
        )
        if global_step % steps_per_epoch:
            raise ValueError(
                f"--resume: checkpoint step {global_step} is not a whole number "
                f"of epochs at {steps_per_epoch} steps/epoch — the run "
                "configuration changed since the checkpoint was written"
            )
        resumed_at = global_step
        start_epoch = min(epochs, global_step // steps_per_epoch)
        # Replay the epoch shuffles consumed before the checkpoint so the
        # resumed run sees the data order the original run would have.
        for _ in range(start_epoch):
            rng.permutation(len(pairs))
        logger.info("resumed from step %d (epoch %d)", global_step, start_epoch)

    if mh is not None:
        from jax.experimental import multihost_utils
        from jax.sharding import PartitionSpec

        # Replicated params/opt state as global arrays (identical on every
        # host: same seed/checkpoint → same init; under --resume every host
        # restored the same process-0-written checkpoint from the shared FS,
        # which is why this conversion runs AFTER the resume block).
        params = multihost_utils.host_local_array_to_global_array(
            jax.device_get(params), mesh, PartitionSpec()
        )
        opt_state = multihost_utils.host_local_array_to_global_array(
            jax.device_get(opt_state), mesh, PartitionSpec()
        )

        def _to_global_batch(arr: np.ndarray):
            return multihost_utils.host_local_array_to_global_array(
                arr, mesh, PartitionSpec("data")
            )
    else:
        _to_global_batch = None

    def _load_batch(
        idx: np.ndarray, source: list | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        src = pairs if source is None else source
        loaded = list(pool.map(lambda i: load_pair(*src[i], size), idx))
        return (
            np.stack([im for im, _ in loaded]),
            np.stack([mk for _, mk in loaded]),
        )

    eval_step = make_eval_step(sam2_cfg) if val_pairs else None
    val_loss = val_iou = None

    def _run_validation() -> tuple[float, float]:
        # Fixed-size batches (wrap the tail) keep the jitted shape static;
        # per-sample outputs let us drop the wrapped duplicates so every
        # holdout pair counts exactly once in the means.
        losses_v, ious_v = [], []
        # Multi-host: params live as global (replicated) arrays that the
        # plain-jit eval step cannot mix with host-local inputs; fetch the
        # local replica once and let every host score the full holdout
        # redundantly (cheap, and keeps eval single-host-identical).
        p_eval = jax.device_get(params) if mh is not None else params
        for b in range(0, len(val_pairs), batch_size):
            n_real = min(batch_size, len(val_pairs) - b)
            idx = np.arange(b, b + batch_size) % len(val_pairs)
            images_u8, targets = _load_batch(idx, val_pairs)
            lv, iv = eval_step(p_eval, images_u8, targets)
            losses_v.extend(np.asarray(lv)[:n_real].tolist())
            ious_v.extend(np.asarray(iv)[:n_real].tolist())
        return float(np.mean(losses_v)), float(np.mean(ious_v))

    try:
        for epoch in range(start_epoch, epochs):
            order = rng.permutation(len(pairs))
            for b in range(steps_per_epoch):
                # Wrap modulo the dataset so every batch is exactly
                # batch_size even when batch_size > len(pairs).
                idx = order[
                    np.arange(b * batch_size, (b + 1) * batch_size) % len(order)
                ]
                # Multi-host: this host loads only its contiguous batch slice;
                # augmentation draws stay GLOBAL so host p applies the exact
                # flips the single-host run would at rows [p*per, (p+1)*per).
                sel = slice(mh[0], mh[0] + mh[1]) if mh else slice(None)
                images_u8, targets = _load_batch(idx[sel])
                if augment:
                    # Flips applied identically to image and mask. Seeded by
                    # (seed, global_step), not the shuffle rng, so checkpoint
                    # resume reproduces them without replaying draws.
                    aug = np.random.default_rng((seed, global_step))
                    flips = aug.integers(0, 2, size=(batch_size, 2), dtype=np.int64)[sel]
                    images_u8 = images_u8.copy()
                    targets = targets.copy()
                    for i, (fh, fv) in enumerate(flips):
                        if fh:
                            images_u8[i] = images_u8[i, :, ::-1]
                            targets[i] = targets[i, :, ::-1]
                        if fv:
                            images_u8[i] = images_u8[i, ::-1]
                            targets[i] = targets[i, ::-1]
                if _to_global_batch is not None:
                    images_u8 = _to_global_batch(images_u8)
                    targets = _to_global_batch(targets)
                params, opt_state, loss = step(params, opt_state, images_u8, targets)
                global_step += 1
                loss_f = float(loss)
                losses.append(loss_f)
                if on_step is not None:
                    on_step(global_step, loss_f)
            if eval_step is not None:
                val_loss, val_iou = _run_validation()
                logger.info(
                    "epoch %d/%d: train loss %.4f | val loss %.4f val IoU %.4f",
                    epoch + 1,
                    epochs,
                    float(np.mean(losses[-steps_per_epoch:])),
                    val_loss,
                    val_iou,
                )
            else:
                logger.info(
                    "epoch %d/%d: mean loss %.4f",
                    epoch + 1,
                    epochs,
                    float(np.mean(losses[-steps_per_epoch:])),
                )
            if save_every and (epoch + 1) % save_every == 0:
                # Multi-host: exactly ONE writer. orbax with host-local numpy
                # trees is not multiprocess-aware (concurrent saves race on the
                # tmp dir), and params are fully replicated anyway — process 0
                # snapshots them, everyone else waits at the barrier so no host
                # runs ahead of (or tears down before) a half-written step.
                try:
                    if jax.process_index() == 0:
                        path = save_checkpoint(
                            ckpt_dir,
                            global_step,
                            jax.device_get(params),
                            jax.device_get(opt_state),
                        )
                        import json

                        (ckpt_dir / "meta.json").write_text(json.dumps(run_meta))
                        logger.info("saved %s", path)
                finally:
                    # Barrier must be reached even if the save raised (disk
                    # full, permissions): otherwise processes 1..N-1 hang in
                    # sync_global_devices until the coordination-service
                    # timeout and die with a cryptic barrier error instead of
                    # process 0's real OSError.
                    if n_proc > 1:
                        from jax.experimental import multihost_utils

                        multihost_utils.sync_global_devices(
                            f"atlaspatch_ckpt_{global_step}"
                        )
        if eval_step is not None and val_loss is None:
            # Nothing-left-to-train resume: still score the restored params
            # so --resume --val-fraction reports metrics for the checkpoint.
            val_loss, val_iou = _run_validation()
    finally:
        pool.shutdown(wait=False)

    npz_path = output_dir / "sam2_finetuned.npz"
    if jax.process_index() == 0:  # shared-FS output: one writer
        np.savez(npz_path, **_flatten(jax.device_get(params)))
    summary = {
        "steps": global_step,
        "steps_this_run": global_step - resumed_at,
        "resumed_at": resumed_at,
        "pairs": len(pairs),
        # None when a resumed run had nothing left to do
        "first_loss": losses[0] if losses else None,
        "final_loss": losses[-1] if losses else None,
        "checkpoint": str(npz_path),
        "image_size": size,
    }
    if val_loss is not None:
        summary.update(
            {"val_pairs": len(val_pairs), "val_loss": val_loss, "val_iou": val_iou}
        )
    return summary
