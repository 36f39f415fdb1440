"""Slide-major multi-extractor embedding: each slide's patch pixels are read
ONCE and fanned out to every requested encoder (the reference re-reads pixels
per (slide, extractor): reference atlas_patch/services/feature_embedding.py:81-96).

Covers: bit-exact output parity vs the extractor-major loop, the read-once
accounting, per-extractor fault isolation mid-slide, resume over partial
feature sets, model-creation failure isolation, and the storage-level
append_features_multi contract."""

from pathlib import Path

import h5py
import numpy as np
import pytest
from PIL import Image

from atlaspatch_tpu.core.config import FeatureExtractionConfig
from atlaspatch_tpu.models.encoders.registry import PatchFeatureExtractorRegistry
from atlaspatch_tpu.services.feature_embedding import PatchFeatureEmbeddingService
from atlaspatch_tpu.services.storage import H5PatchWriter
from atlaspatch_tpu.services.wsi_loader import DefaultWSILoader
from tests.test_pipeline_e2e import ToyEncoder, _app_config, _runner


class ToyEncoder2(ToyEncoder):
    """Second deterministic encoder with a different signature."""

    name = "toy2"
    embedding_dim = 4

    def extract_batch(self, patches, *, batch_size=None):
        base = super().extract_batch(patches, batch_size=batch_size)
        return (base[:, :4] * 2.0 + 1.0).astype(np.float32)


class FlakyEncoder(ToyEncoder):
    """Raises on every call after the first — mid-slide failure."""

    name = "flaky"
    embedding_dim = 8
    calls = 0

    def extract_batch(self, patches, *, batch_size=None):
        FlakyEncoder.calls += 1
        if FlakyEncoder.calls > 1:
            raise RuntimeError("flaky encoder died mid-slide")
        return super().extract_batch(patches, batch_size=batch_size)


def _registry(*encoders):
    reg = PatchFeatureExtractorRegistry()
    for enc in encoders:
        reg.register(enc.name, enc)
    return reg


def _feat_cfg(names, batch=16):
    return FeatureExtractionConfig(
        extractors=list(names), batch_size=batch, device="cpu", precision="float32"
    )


def _extract_slides(slide_dir, out, feat_cfg):
    cfg = _app_config(slide_dir, out, features=feat_cfg)
    results, failures = _runner(cfg).run()
    assert failures == []
    return cfg, results


@pytest.fixture
def slide_dir(tmp_path: Path) -> Path:
    from atlaspatch_tpu.io.synthetic_wsi import make_tissue_canvas

    sdir = tmp_path / "slides"
    sdir.mkdir()
    for i in range(2):
        canvas = make_tissue_canvas(1024, 768, seed=i, n_blobs=2)
        Image.fromarray(canvas).save(sdir / f"slide{i}.png")
    (tmp_path / "mpp.csv").write_text(
        "wsi,mpp\n" + "\n".join(f"slide{i}.png,0.5" for i in range(2))
    )
    return sdir


def _count_patch_reads(monkeypatch):
    """Wrap _read_patch_block to tally how many patch pixels are read."""
    import threading

    counter = {"patches": 0}
    lock = threading.Lock()  # reads happen on prep + block threads
    orig = PatchFeatureEmbeddingService._read_patch_block

    def counting(self, wsi, coords):
        with lock:
            counter["patches"] += len(coords)
        return orig(self, wsi, coords)

    monkeypatch.setattr(PatchFeatureEmbeddingService, "_read_patch_block", counting)
    return counter


def test_slide_major_matches_extractor_major_bitexact(
    slide_dir, tmp_path, monkeypatch
):
    feat_cfg = _feat_cfg(["toy", "toy2"], batch=8)
    counter = _count_patch_reads(monkeypatch)

    # Extractor-major baseline
    monkeypatch.setenv("ATLASPATCH_SLIDE_MAJOR", "0")
    cfg_a, res_a = _extract_slides(slide_dir, tmp_path / "a", feat_cfg)
    svc_a = PatchFeatureEmbeddingService(
        cfg_a.extraction, cfg_a.output, feat_cfg, registry=_registry(ToyEncoder, ToyEncoder2)
    )
    assert svc_a.embed_all(res_a, wsi_loader=DefaultWSILoader()) == []
    reads_em = counter["patches"]

    # Slide-major (default when >1 extractor)
    counter["patches"] = 0
    monkeypatch.setenv("ATLASPATCH_SLIDE_MAJOR", "1")
    cfg_b, res_b = _extract_slides(slide_dir, tmp_path / "b", feat_cfg)
    svc_b = PatchFeatureEmbeddingService(
        cfg_b.extraction, cfg_b.output, feat_cfg, registry=_registry(ToyEncoder, ToyEncoder2)
    )
    assert svc_b.embed_all(res_b, wsi_loader=DefaultWSILoader()) == []
    reads_sm = counter["patches"]

    total_patches = sum(r.num_patches for r in res_b)
    assert total_patches > 0
    # Read-once: slide-major reads each patch exactly once; extractor-major twice.
    assert reads_sm == total_patches
    assert reads_em == 2 * total_patches

    for ra, rb in zip(
        sorted(res_a, key=lambda r: r.slide.stem), sorted(res_b, key=lambda r: r.slide.stem)
    ):
        with h5py.File(ra.h5_path) as fa, h5py.File(rb.h5_path) as fb:
            for name in ("toy", "toy2"):
                np.testing.assert_array_equal(fa[f"features/{name}"][:],
                                              fb[f"features/{name}"][:])
        assert rb.metadata["feature_sets"] == ["toy", "toy2"]


def test_io_block_width_is_feature_invariant(slide_dir, tmp_path, monkeypatch):
    """The writer's io-block spans ATLASPATCH_EMBED_BLOCK_CHUNKS device
    chunks (default 8) so the engine's deferred D2H overlaps chunk
    round-trips; the device chunking inside extract_batch keeps the same
    batch-stride boundaries, so features must be BIT-identical to
    block == batch — and the wide mode must actually hand the engine
    multi-chunk calls."""
    call_sizes: list[int] = []
    orig = ToyEncoder.extract_batch

    def spying(self, patches, *, batch_size=None):
        call_sizes.append(len(patches))
        return orig(self, patches, batch_size=batch_size)

    monkeypatch.setattr(ToyEncoder, "extract_batch", spying)

    monkeypatch.setenv("ATLASPATCH_EMBED_BLOCK_CHUNKS", "1")
    feat_cfg = _feat_cfg(["toy"], batch=4)
    cfg_a, res_a = _extract_slides(slide_dir, tmp_path / "narrow", feat_cfg)
    svc = PatchFeatureEmbeddingService(
        cfg_a.extraction, cfg_a.output, feat_cfg, registry=_registry(ToyEncoder)
    )
    assert svc.embed_all(res_a, wsi_loader=DefaultWSILoader()) == []
    assert max(call_sizes) <= 4

    call_sizes.clear()
    monkeypatch.setenv("ATLASPATCH_EMBED_BLOCK_CHUNKS", "4")
    cfg_b, res_b = _extract_slides(slide_dir, tmp_path / "wide", feat_cfg)
    svc = PatchFeatureEmbeddingService(
        cfg_b.extraction, cfg_b.output, feat_cfg, registry=_registry(ToyEncoder)
    )
    assert svc.embed_all(res_b, wsi_loader=DefaultWSILoader()) == []
    assert max(call_sizes) > 4  # multi-chunk blocks reached the engine

    for ra, rb in zip(
        sorted(res_a, key=lambda r: r.slide.stem),
        sorted(res_b, key=lambda r: r.slide.stem),
    ):
        with h5py.File(ra.h5_path) as fa, h5py.File(rb.h5_path) as fb:
            np.testing.assert_array_equal(
                fa["features/toy"][:], fb["features/toy"][:]
            )


def test_slide_major_isolates_mid_slide_extractor_failure(
    slide_dir, tmp_path, monkeypatch
):
    # pin block == batch: the scenario needs the 2nd extractor CALL to land
    # mid-slide (the default io-block is 8 device chunks wide)
    monkeypatch.setenv("ATLASPATCH_EMBED_BLOCK_CHUNKS", "1")
    FlakyEncoder.calls = 0
    feat_cfg = _feat_cfg(["toy", "flaky"], batch=4)  # several blocks per slide
    cfg, results = _extract_slides(slide_dir, tmp_path / "out", feat_cfg)
    svc = PatchFeatureEmbeddingService(
        cfg.extraction, cfg.output, feat_cfg, registry=_registry(ToyEncoder, FlakyEncoder)
    )
    fails = svc.embed_all(results, wsi_loader=DefaultWSILoader())
    # flaky fails on both slides; toy survives on both.
    assert len(fails) == 2
    assert all("flaky" in str(e) for _s, e in fails)
    for res in results:
        with h5py.File(res.h5_path) as f:
            assert f[f"features/toy"].shape == (res.num_patches, 8)
            assert "flaky" not in f["features"]
            assert not any(k.startswith("__tmp_") for k in f["features"])
        assert res.metadata["feature_sets"] == ["toy"]


def test_slide_major_resumes_partial_feature_sets(slide_dir, tmp_path):
    feat_cfg = _feat_cfg(["toy", "toy2"])
    cfg, results = _extract_slides(slide_dir, tmp_path / "out", feat_cfg)
    # Pre-complete 'toy' on slide 0 only.
    first = sorted(results, key=lambda r: r.slide.stem)[0]
    svc0 = PatchFeatureEmbeddingService(
        cfg.extraction, cfg.output, _feat_cfg(["toy"]), registry=_registry(ToyEncoder)
    )
    assert svc0.embed_all([first], wsi_loader=DefaultWSILoader()) == []

    svc = PatchFeatureEmbeddingService(
        cfg.extraction, cfg.output, feat_cfg, registry=_registry(ToyEncoder, ToyEncoder2)
    )
    assert svc.embed_all(results, wsi_loader=DefaultWSILoader()) == []
    for res in results:
        with h5py.File(res.h5_path) as f:
            assert set(f["features"]) == {"toy", "toy2"}
    # Idempotent re-run
    assert svc.embed_all(results, wsi_loader=DefaultWSILoader()) == []


def test_slide_major_model_creation_failure_isolated(slide_dir, tmp_path):
    feat_cfg = _feat_cfg(["toy", "missing-model"])
    cfg, results = _extract_slides(slide_dir, tmp_path / "out", feat_cfg)
    svc = PatchFeatureEmbeddingService(
        cfg.extraction, cfg.output, feat_cfg, registry=_registry(ToyEncoder)
    )
    fails = svc.embed_all(results, wsi_loader=DefaultWSILoader())
    assert len(fails) == len(results)  # one unit per slide for the missing model
    for res in results:
        with h5py.File(res.h5_path) as f:
            assert "toy" in f["features"]


class MalformedEncoder(ToyEncoder):
    """Returns the wrong row count after the first call — malformed, not raising."""

    name = "malformed"
    embedding_dim = 8
    calls = 0

    def extract_batch(self, patches, *, batch_size=None):
        MalformedEncoder.calls += 1
        rows = super().extract_batch(patches, batch_size=batch_size)
        return rows[:-1] if MalformedEncoder.calls > 1 and len(rows) > 1 else rows


class CasedEncoder(ToyEncoder):
    """Case-preserving dataset name (custom plugins may register these)."""

    name = "MyEnc"
    embedding_dim = 8


def test_slide_major_isolates_malformed_extractor_output(
    slide_dir, tmp_path, monkeypatch
):
    monkeypatch.setenv("ATLASPATCH_EMBED_BLOCK_CHUNKS", "1")
    MalformedEncoder.calls = 0
    feat_cfg = _feat_cfg(["toy", "malformed"], batch=4)
    cfg, results = _extract_slides(slide_dir, tmp_path / "out", feat_cfg)
    svc = PatchFeatureEmbeddingService(
        cfg.extraction, cfg.output, feat_cfg, registry=_registry(ToyEncoder, MalformedEncoder)
    )
    fails = svc.embed_all(results, wsi_loader=DefaultWSILoader())
    assert len(fails) == 2  # malformed failed on both slides; toy survived
    for res in results:
        with h5py.File(res.h5_path) as f:
            assert f["features/toy"].shape == (res.num_patches, 8)
            assert "malformed" not in f["features"]


def test_slide_major_preserves_dataset_name_case(slide_dir, tmp_path):
    feat_cfg = _feat_cfg(["myenc", "toy"])
    cfg, results = _extract_slides(slide_dir, tmp_path / "out", feat_cfg)
    svc = PatchFeatureEmbeddingService(
        cfg.extraction, cfg.output, feat_cfg, registry=_registry(ToyEncoder, CasedEncoder)
    )
    assert svc.embed_all(results, wsi_loader=DefaultWSILoader()) == []
    for res in results:
        with h5py.File(res.h5_path) as f:
            # Dataset key matches extractor.name verbatim, like the
            # single-extractor path writes it.
            assert set(f["features"]) == {"MyEnc", "toy"}


def test_slide_major_partial_dataset_fails_only_collider(slide_dir, tmp_path):
    feat_cfg = _feat_cfg(["toy", "toy2"])
    cfg, results = _extract_slides(slide_dir, tmp_path / "out", feat_cfg)
    bad = sorted(results, key=lambda r: r.slide.stem)[0]
    with h5py.File(bad.h5_path, "a") as f:  # stale partial rows for 'toy'
        f.require_group("features").create_dataset(
            "toy", data=np.zeros((1, 8), np.float32), maxshape=(None, 8)
        )
    svc = PatchFeatureEmbeddingService(
        cfg.extraction, cfg.output, feat_cfg, registry=_registry(ToyEncoder, ToyEncoder2)
    )
    fails = svc.embed_all(results, wsi_loader=DefaultWSILoader())
    assert len(fails) == 1 and "already exists" in str(fails[0][1])
    with h5py.File(bad.h5_path) as f:
        assert f["features/toy2"].shape == (bad.num_patches, 4)  # survivor landed
    for res in results:
        if res is not bad:
            with h5py.File(res.h5_path) as f:
                assert set(f["features"]) == {"toy", "toy2"}


def test_duplicate_extractor_names_deduped_by_config():
    cfg = FeatureExtractionConfig(
        extractors=["toy", "TOY", "toy2"], batch_size=4, device="cpu",
        precision="float32",
    ).validated()
    assert cfg.extractors == ["toy", "toy2"]


def test_slide_major_concurrent_writers_dedupe_via_locks(slide_dir, tmp_path):
    """Two services racing slide-major on the same corpus: the per-slide
    features lock makes one writer per slide; the loser skips without error
    and every feature lands exactly once."""
    import threading

    feat_cfg = _feat_cfg(["toy", "toy2"], batch=4)
    cfg, results = _extract_slides(slide_dir, tmp_path / "out", feat_cfg)

    fails: dict[int, list] = {}
    barrier = threading.Barrier(2)

    def run(idx):
        svc = PatchFeatureEmbeddingService(
            cfg.extraction, cfg.output, feat_cfg,
            registry=_registry(ToyEncoder, ToyEncoder2),
        )
        barrier.wait()
        fails[idx] = svc.embed_all(results, wsi_loader=DefaultWSILoader())

    threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert fails[0] == [] and fails[1] == []
    for res in results:
        with h5py.File(res.h5_path) as f:
            assert set(f["features"]) == {"toy", "toy2"}
            assert f["features/toy"].shape == (res.num_patches, 8)
            assert f["features/toy2"].shape == (res.num_patches, 4)


# --- storage-level contract ---------------------------------------------------------


def _writer():
    return H5PatchWriter(
        chunk_rows=8, patch_size=32, patch_size_level0=32, level0_mag=20,
        target_mag=20, level0_wh=(64, 64), overlap=0, slide_stem="s",
        wsi_path="s.png",
    )


def _h5_with_coords(tmp_path, n=10):
    p = tmp_path / "s.h5"
    with h5py.File(p, "w") as f:
        f.create_dataset("coords", data=np.zeros((n, 5), np.int32))
    return p


def test_append_features_multi_roundtrip(tmp_path):
    p = _h5_with_coords(tmp_path, n=10)
    blocks = []

    def block_fn(start, stop):
        blocks.append((start, stop))
        n = stop - start
        return {
            "a": np.full((n, 3), start, np.float32),
            "b": np.full((n, 2), -start, np.float32),
        }

    written = _writer().append_features_multi(
        output_path=p, feature_names=["a", "b"], block_fn=block_fn,
        num_rows=10, feature_batch=4, expected_total=10,
    )
    assert written == {"a": 10, "b": 10}
    assert blocks == [(0, 4), (4, 8), (8, 10)]
    with h5py.File(p) as f:
        assert f["features/a"].shape == (10, 3)
        assert f["features/b"].shape == (10, 2)
        assert f["features/a"][5, 0] == 4  # second block's fill value


def test_append_features_multi_drop_keeps_survivor(tmp_path):
    p = _h5_with_coords(tmp_path, n=10)

    def block_fn(start, stop):
        n = stop - start
        out = {"a": np.ones((n, 3), np.float32)}
        if start == 0:  # 'b' only survives the first block
            out["b"] = np.ones((n, 2), np.float32)
        return out

    written = _writer().append_features_multi(
        output_path=p, feature_names=["a", "b"], block_fn=block_fn,
        num_rows=10, feature_batch=4, expected_total=10,
    )
    assert written == {"a": 10}
    with h5py.File(p) as f:
        assert set(f["features"]) == {"a"}


def test_append_features_multi_error_wipes_all_tmps(tmp_path):
    p = _h5_with_coords(tmp_path, n=10)

    def block_fn(start, stop):
        if start >= 8:
            raise RuntimeError("boom")
        n = stop - start
        return {"a": np.ones((n, 3), np.float32), "b": np.ones((n, 2), np.float32)}

    with pytest.raises(RuntimeError):
        _writer().append_features_multi(
            output_path=p, feature_names=["a", "b"], block_fn=block_fn,
            num_rows=10, feature_batch=4, expected_total=10,
        )
    with h5py.File(p) as f:
        assert list(f["features"]) == []


def test_append_features_multi_rejects_growth_and_duplicates(tmp_path):
    p = _h5_with_coords(tmp_path, n=4)
    with pytest.raises(ValueError, match="Duplicate"):
        _writer().append_features_multi(
            output_path=p, feature_names=["a", "a"], block_fn=lambda s, e: {},
            num_rows=4, feature_batch=4,
        )

    def growing(start, stop):
        return {"a": np.ones((stop - start, 3), np.float32),
                "c": np.ones((stop - start, 3), np.float32)}

    with pytest.raises(ValueError, match="unknown"):
        _writer().append_features_multi(
            output_path=p, feature_names=["a"], block_fn=growing,
            num_rows=4, feature_batch=4,
        )

    with h5py.File(p, "a") as f:
        f.require_group("features").create_dataset("a", data=np.ones((4, 3), np.float32))
    with pytest.raises(ValueError, match="already exists"):
        _writer().append_features_multi(
            output_path=p, feature_names=["a"],
            block_fn=lambda s, e: {"a": np.ones((e - s, 3), np.float32)},
            num_rows=4, feature_batch=4,
        )


@pytest.mark.parametrize("seed", range(20))
def test_append_features_multi_randomized_drop_patterns(tmp_path, seed):
    """Property test: random feature counts/dims/drop-blocks. Invariants:
    survivors land complete and bit-exact, dropped features (and their tmps)
    vanish, and the returned row counts match what landed."""
    rng = np.random.default_rng(seed)
    num_rows = int(rng.integers(0, 40))
    batch = int(rng.integers(1, 8))
    n_feats = int(rng.integers(1, 5))
    n_blocks = -(-num_rows // batch) if num_rows else 0
    dims = {f"f{i}": int(rng.integers(1, 9)) for i in range(n_feats)}
    # Block index at which each feature stops appearing (>= n_blocks → survives)
    drop_at = {
        name: (int(rng.integers(0, n_blocks)) if n_blocks and rng.random() < 0.4
               else n_blocks)
        for name in dims
    }

    def fill(name, start, stop):
        return np.full((stop - start, dims[name]), start + hash(name) % 7, np.float32)

    def block_fn(start, stop):
        b = start // batch
        return {n: fill(n, start, stop) for n in dims if b < drop_at[n]}

    p = _h5_with_coords(tmp_path, n=num_rows)
    written = _writer().append_features_multi(
        output_path=p, feature_names=list(dims), block_fn=block_fn,
        num_rows=num_rows, feature_batch=batch,
        feature_attrs={n: {"embedding_dim": d} for n, d in dims.items()},
        expected_total=num_rows,
    )
    survivors = {n for n in dims if drop_at[n] >= n_blocks}
    assert set(written) == survivors
    with h5py.File(p) as f:
        grp = f["features"] if "features" in f else {}
        assert set(grp) == survivors
        for n in survivors:
            assert written[n] == num_rows
            ds = grp[n][:]
            assert ds.shape == (num_rows, dims[n])
            expected = np.concatenate(
                [fill(n, s, min(s + batch, num_rows)) for s in range(0, num_rows, batch)]
            ) if num_rows else np.empty((0, dims[n]), np.float32)
            np.testing.assert_array_equal(ds, expected)


def test_append_features_multi_zero_rows_uses_attr_dim(tmp_path):
    p = _h5_with_coords(tmp_path, n=0)
    written = _writer().append_features_multi(
        output_path=p, feature_names=["a"], block_fn=lambda s, e: {},
        num_rows=0, feature_batch=4,
        feature_attrs={"a": {"embedding_dim": 7}}, expected_total=0,
    )
    assert written == {"a": 0}
    with h5py.File(p) as f:
        assert f["features/a"].shape == (0, 7)
