"""TPU batched inference engine for patch encoders.

Replaces the reference's per-extractor torch DataLoader loop (reference:
atlas_patch/models/patch/base.py:48-114) with a TPU-shaped pipeline:

  host: per-patch PIL resize/crop to the encoder's input size (kept on host
        for bit-parity with torchvision/transformers preprocessing) on a
        thread pool, overlapping device compute (double buffering);
  device: ONE jitted program per (bucketed batch, encoder): uint8 → float
        normalize (fused into the first conv by XLA) → encoder forward →
        float32 features.

Batches are padded to power-of-two buckets so at most log2(max_batch) programs
are ever compiled per encoder. Params live on device once; bfloat16 compute is
selected by the precision config while outputs stay float32 (reference returns
float32 features, base.py:106).
"""

from __future__ import annotations

import logging
import os
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Callable, Sequence

import numpy as np
from PIL import Image

from atlaspatch_tpu.models.encoders.registry import FeatureExtractor
from atlaspatch_tpu.utils import perf

logger = logging.getLogger("atlaspatch_tpu.models.encoders")

_PIL_INTERP = {
    "bilinear": Image.Resampling.BILINEAR,
    "bicubic": Image.Resampling.BICUBIC,
    "nearest": Image.Resampling.NEAREST,
    "lanczos": Image.Resampling.LANCZOS,
}


@dataclass(frozen=True)
class PreprocessSpec:
    """Host-side geometric preprocessing + normalization constants.

    mode "square": resize directly to (crop, crop) — HF image-processor style.
    mode "shortest": resize shorter side to `resize` then center-crop `crop` —
    torchvision classification-preset / CLIP style.
    """

    crop: int = 224
    resize: int = 224
    mode: str = "square"
    interpolation: str = "bilinear"
    mean: tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: tuple[float, float, float] = (0.229, 0.224, 0.225)
    rescale: float = 1.0 / 255.0

    def apply_host(self, patch: np.ndarray | Image.Image) -> np.ndarray:
        img = patch if isinstance(patch, Image.Image) else Image.fromarray(patch)
        if img.mode != "RGB":
            img = img.convert("RGB")
        interp = _PIL_INTERP[self.interpolation]
        if self.mode == "square":
            if img.size != (self.crop, self.crop):
                img = img.resize((self.crop, self.crop), interp)
        elif self.mode == "shortest":
            # torchvision-exact geometry: the long side TRUNCATES
            # (int(size*long/short), _compute_resized_output_size) and the
            # crop offset uses python round() (F.center_crop) — round()/floor
            # here would shift non-square inputs by a pixel.
            w, h = img.size
            short, long = (w, h) if w <= h else (h, w)
            if short != self.resize:
                new_long = max(1, int(self.resize * long / short))
                nw, nh = (
                    (self.resize, new_long) if w <= h else (new_long, self.resize)
                )
                img = img.resize((nw, nh), interp)
            w, h = img.size
            left = int(round((w - self.crop) / 2.0))
            top = int(round((h - self.crop) / 2.0))
            img = img.crop((left, top, left + self.crop, top + self.crop))
        else:
            raise ValueError(f"unknown preprocess mode {self.mode}")
        return np.asarray(img, dtype=np.uint8)


def _bucket(n: int, max_batch: int) -> int:
    b = 1
    while b < n:
        b *= 2
        if b >= max_batch:
            return max_batch
    return b


@dataclass
class JaxFeatureExtractor(FeatureExtractor):
    """Runs a Flax apply function over preprocessed patch batches on device.

    apply_fn(params, images_f32_nhwc) -> (N, D) features.

    With a `mesh` (axes ('data','model')), batches shard over 'data' and params
    follow `param_shardings` (replicated by default; pass tensor-parallel
    shardings from parallel/sharding.py for ViT-g-class encoders).
    """

    name: str
    embedding_dim: int
    spec: PreprocessSpec
    apply_fn: Callable
    params: dict
    device: object | None = None
    mesh: object | None = None
    param_shardings: object | None = None
    compute_dtype: str = "float32"
    max_batch: int = 256
    prep_workers: int = 8
    _jitted: dict = field(default_factory=dict, repr=False)
    _jit_lock: object = field(default_factory=threading.Lock, repr=False)

    def __post_init__(self) -> None:
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        # Opt-in bf16 device→host feature transfer: halves D2H bytes on
        # link-bound hosts; extract_batch casts back to f32 so the stored
        # feature schema is unchanged (drift = one f32→bf16 rounding,
        # ~2^-8 relative — measure for your encoder before enabling).
        # Read once: the jit cache is keyed by shape only.
        self._fetch_bf16 = os.environ.get("ATLASPATCH_FEATURE_D2H_BF16", "0") == "1"

        if self.compute_dtype in ("bfloat16", "int8"):
            # Store float params as bf16 on device. Flax modules default to
            # dtype=None (promote inputs with params), so bf16 activations
            # against f32 params silently upcast every matmul to f32 — the
            # cast here is what actually puts the MXU on the bf16 path (and
            # halves param HBM). The SAM2 service does the same
            # (services/segmentation.py:146-147). In int8 mode the quantized
            # kernels are already int8; their per-channel `qscale` factors
            # stay exact in f32 (tiny, and Int8Dense dequantizes in f32).
            from jax.tree_util import tree_map_with_path

            def _cast(path, a):
                if not hasattr(a, "dtype") or a.dtype != jnp.float32:
                    return a
                if path and getattr(path[-1], "key", None) == "qscale":
                    return a
                return a.astype(jnp.bfloat16)

            self.params = tree_map_with_path(_cast, self.params)

        if self.mesh is not None:
            if self.param_shardings is None:
                replicated = NamedSharding(self.mesh, P())
                self.param_shardings = jax.tree.map(lambda _: replicated, self.params)
            self.params = jax.tree.map(jax.device_put, self.params, self.param_shardings)
            self._data_sharding = NamedSharding(self.mesh, P("data"))
            # pad batches to a multiple of the data axis
            self._batch_align = int(self.mesh.shape["data"])
        else:
            if self.device is None:
                # local_devices: under jax.distributed, jax.devices()[0] may
                # be another host's chip (non-addressable for device_put).
                self.device = jax.local_devices()[0]
            self.params = jax.device_put(self.params, self.device)
            self._data_sharding = None
            self._batch_align = 1

    def _forward_async(self, images_u8: np.ndarray):
        """Dispatch the jitted program; returns the device array (not fetched)."""
        import jax
        import jax.numpy as jnp

        shape = images_u8.shape
        # With dispatch depth > 1, two threads can race a fresh shape here;
        # the lock guarantees ONE jit wrapper per shape (JAX then serializes
        # the single compilation internally instead of compiling twice).
        with self._jit_lock:
            fn = self._jitted.get(shape)
            if fn is None:
                spec = self.spec
                cdtype = {
                    "float32": jnp.float32,
                    "bfloat16": jnp.bfloat16,
                    "int8": jnp.bfloat16,  # activations flow bf16 between the int8 dots
                }[self.compute_dtype]

                out_dtype = jnp.bfloat16 if self._fetch_bf16 else jnp.float32

                def run(params, u8):
                    x = u8.astype(jnp.float32) * spec.rescale
                    x = (x - jnp.asarray(spec.mean, jnp.float32)) / jnp.asarray(
                        spec.std, jnp.float32
                    )
                    x = x.astype(cdtype)
                    out = self.apply_fn(params, x)
                    return out.astype(out_dtype)

                if self._data_sharding is not None:
                    fn = jax.jit(run, out_shardings=self._data_sharding)
                else:
                    fn = jax.jit(run)
                self._jitted[shape] = fn
        with perf.stage("embed_dispatch"):
            if self._data_sharding is not None:
                images = jax.device_put(images_u8, self._data_sharding)
                return fn(self.params, images)
            with jax.default_device(self.device):
                return fn(self.params, images_u8)

    @staticmethod
    def _materialize_f32(dev_out) -> np.ndarray:
        """Fetch to host, restoring f32 when features crossed the link bf16."""
        a = np.asarray(dev_out)
        return a if a.dtype == np.float32 else a.astype(np.float32)

    def _forward(self, images_u8: np.ndarray) -> np.ndarray:
        return self._materialize_f32(self._forward_async(images_u8))

    def extract_batch(
        self, patches: Sequence[np.ndarray], *, batch_size: int | None = None
    ) -> np.ndarray:
        if not len(patches):
            return np.empty((0, self.embedding_dim), dtype=np.float32)
        bs = min(self.max_batch, batch_size or len(patches))

        # Software pipeline: (a) per-chunk host preprocessing parallelized over
        # the thread pool, (b) device programs dispatched asynchronously — the
        # fetch of chunk i happens after chunk i+1 is enqueued, so host↔device
        # transfers overlap compute.
        def prep_chunk(ex: ThreadPoolExecutor, chunk) -> np.ndarray:
            if len(chunk) >= 4 and self.prep_workers > 1:
                slices = np.array_split(np.arange(len(chunk)), self.prep_workers)
                parts = ex.map(
                    lambda idx: [self.spec.apply_host(chunk[i]) for i in idx],
                    [s for s in slices if len(s)],
                )
                flat = [img for part in parts for img in part]
            else:
                flat = [self.spec.apply_host(p) for p in chunk]
            return np.stack(flat)

        chunks = [patches[i : i + bs] for i in range(0, len(patches), bs)]
        outputs: list[np.ndarray] = []
        # In-flight dispatch depth: each slot is an upload+compute enqueued on
        # its own dispatcher thread; results are collected in order. Depth > 1
        # lets multiple host→device transfers proceed concurrently — a real
        # win on high-latency links where a single stream underutilizes the
        # pipe (ATLASPATCH_H2D_DEPTH overrides; measured on the TPU tunnel).
        depth = max(1, int(os.environ.get("ATLASPATCH_H2D_DEPTH", "2")))
        # Deferred fetch (default): draining a dispatch slot only STARTS the
        # result's device→host copy (copy_to_host_async) instead of blocking
        # on it; all chunks materialize once at the end. Per-chunk blocking
        # round-trips (~150-280 ms each through the relay, VERDICT r4 #3)
        # overlap with compute AND each other. Features are the small side
        # (n×dim f32), so holding every chunk's output in flight costs ~MBs —
        # the depth knob keeps bounding the big uploads.
        # ATLASPATCH_DEFERRED_FETCH=0 restores blocking per-chunk fetches.
        deferred = os.environ.get("ATLASPATCH_DEFERRED_FETCH", "1") == "1"
        # Deferred-window cap: fut.result() only waits for DISPATCH, so with
        # no cap an extract_batch over a huge patch list could enqueue every
        # chunk's computation ahead of the device — each unexecuted chunk
        # pins its padded input batch (~5 MB at 32×224²×3) in HBM. Blocking
        # on the oldest chunk's output once the window fills forces execution
        # order and bounds in-flight device memory to ~cap×5 MB while still
        # overlapping `cap` D2H round-trips.
        max_deferred = max(
            1, int(os.environ.get("ATLASPATCH_DEFERRED_MAX_CHUNKS", "64"))
        )

        def _start_fetch(dev_out):
            try:
                dev_out.copy_to_host_async()
            except Exception:  # noqa: BLE001 — fetch still happens at the end
                pass
            return dev_out

        pending: deque[tuple] = deque()  # (dispatch_future, n_valid)
        done: deque[tuple] = deque()  # (device array, D2H already started, n_valid)

        def _drain_one() -> None:
            fut, k = pending.popleft()
            if deferred:
                with perf.stage("embed_d2h_start"):
                    done.append((_start_fetch(fut.result()), k))
                if len(done) > max_deferred:
                    dev_out, k0 = done.popleft()
                    with perf.stage("embed_fetch"):
                        outputs.append(self._materialize_f32(dev_out)[:k0])
            else:
                with perf.stage("embed_fetch"):
                    outputs.append(self._materialize_f32(fut.result())[:k])

        with ThreadPoolExecutor(max_workers=self.prep_workers) as ex, ThreadPoolExecutor(
            max_workers=depth, thread_name_prefix="h2d-dispatch"
        ) as dispatcher:
            for chunk in chunks:
                with perf.stage("embed_prep"):
                    imgs = prep_chunk(ex, chunk)
                n = imgs.shape[0]
                padded = _bucket(n, bs)
                if self._batch_align > 1:
                    padded = -(-padded // self._batch_align) * self._batch_align
                if padded != n:
                    imgs = np.concatenate(
                        [imgs, np.zeros((padded - n, *imgs.shape[1:]), imgs.dtype)]
                    )
                # drain BEFORE submitting so at most `depth` dispatches are
                # outstanding (draining after allowed depth+1, making the
                # ATLASPATCH_H2D_DEPTH knob measure one more than configured)
                while len(pending) >= depth:
                    _drain_one()
                pending.append((dispatcher.submit(self._forward_async, imgs), n))
            while pending:
                _drain_one()
            for dev_out, k in done:
                with perf.stage("embed_fetch"):
                    outputs.append(self._materialize_f32(dev_out)[:k])
        return np.concatenate(outputs, axis=0)

    def cleanup(self) -> None:
        self.params = None
        self._jitted.clear()
