"""H5 schema golden tests: coords, passports, file attrs, features, atomicity."""

from pathlib import Path

import h5py
import numpy as np
import pytest

from atlaspatch_tpu.services.storage import (
    PASSPORT_FORMAT,
    H5PatchWriter,
)
from atlaspatch_tpu.utils.h5 import H5AppendWriter


def _writer(**overrides):
    kwargs = dict(
        chunk_rows=4,
        patch_size=256,
        patch_size_level0=512,
        level0_mag=40,
        target_mag=20,
        level0_wh=(10000, 8000),
        overlap=0,
        slide_stem="slideA",
        wsi_path="/data/slideA.svs",
        extra_file_attrs={"filename": "slideA.svs", "mpp": 0.25},
    )
    kwargs.update(overrides)
    return H5PatchWriter(**kwargs)


def _entries(coords):
    return [(x, y, rw, rh, lv, None) for (x, y, rw, rh, lv) in coords]


def test_append_writer_atomic_commit(tmp_path: Path):
    target = tmp_path / "out.h5"
    w = H5AppendWriter(str(target), chunk_rows=2)
    w.append({"a": np.arange(6, dtype=np.int32).reshape(3, 2)})
    assert not target.exists()  # staged in tmp until close
    w.append({"a": np.arange(4, dtype=np.int32).reshape(2, 2)})
    w.update_file_attrs({"k": {"nested": 1}, "n": None})
    w.close()
    assert target.exists()
    with h5py.File(target) as f:
        assert f["a"].shape == (5, 2)
        assert f.attrs["k"] == '{"nested": 1}'
        assert f.attrs["n"] == "None"
    # no stray tmp files
    assert list(tmp_path.glob(".*tmp*")) == []


def test_append_writer_abort_leaves_nothing(tmp_path: Path):
    target = tmp_path / "out.h5"
    w = H5AppendWriter(str(target), chunk_rows=2)
    w.append({"a": np.ones((3, 2), dtype=np.float32)})
    w.abort()
    assert not target.exists()
    assert list(tmp_path.glob(".*")) == []


def test_write_coords_schema(tmp_path: Path):
    out = tmp_path / "slideA.h5"
    coords = [(0, 0, 128, 128, 1), (512, 0, 128, 128, 1), (0, 512, 128, 128, 1)]
    total, viz = _writer().write_coords(out, _entries(coords), batch=2, collect_coords=True)
    assert total == 3
    np.testing.assert_array_equal(viz, np.asarray(coords, dtype=np.int32)[:, :2])

    with h5py.File(out) as f:
        c = f["coords"][:]
        assert c.dtype == np.int32
        np.testing.assert_array_equal(c, np.asarray(coords, dtype=np.int32))
        p = f["passports"][:]
        assert p.dtype == np.dtype("S160")
        assert p[0].decode() == "slideA__x0_y0_rw128_rh128_lv1_mag40_tmag20_total3"
        assert p[1].decode() == "slideA__x512_y0_rw128_rh128_lv1_mag40_tmag20_total3"
        # file attrs
        assert f.attrs["patch_size"] == 256
        assert f.attrs["patch_size_level0"] == 512
        assert f.attrs["level0_magnification"] == 40
        assert f.attrs["target_magnification"] == 20
        assert f.attrs["overlap"] == 0
        assert f.attrs["level0_width"] == 10000
        assert f.attrs["level0_height"] == 8000
        assert f.attrs["wsi_path"] == "/data/slideA.svs"
        assert f.attrs["passport_format"] == PASSPORT_FORMAT
        assert f.attrs["passport_version"] == 2
        assert f.attrs["num_patches"] == 3
        assert f.attrs["filename"] == "slideA.svs"
        assert f.attrs["mpp"] == 0.25
        assert "creation_date" in f.attrs


def test_passport_na_for_zero_mags(tmp_path: Path):
    out = tmp_path / "s.h5"
    w = _writer(level0_mag=0, target_mag=0)
    w.write_coords(out, _entries([(1, 2, 3, 4, 0)]), batch=8)
    with h5py.File(out) as f:
        assert f["passports"][0].decode() == "slideA__x1_y2_rw3_rh4_lv0_magna_tmagna_total1"


def test_write_coords_and_images(tmp_path: Path):
    out = tmp_path / "s.h5"
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    patch = np.full((16, 16, 3), 128, dtype=np.uint8)
    entries = [(0, 0, 16, 16, 0, patch), (256, 0, 16, 16, 0, patch)]
    total, _ = _writer().write_coords_and_images(out, entries, img_dir, batch=8)
    assert total == 2
    assert (img_dir / "slideA_x0_y0.png").exists()
    assert (img_dir / "slideA_x256_y0.png").exists()


def test_append_features_roundtrip(tmp_path: Path):
    out = tmp_path / "s.h5"
    coords = [(i * 256, 0, 128, 128, 0) for i in range(5)]
    _writer().write_coords(out, _entries(coords), batch=8)

    calls = []

    def feature_fn(start, stop):
        calls.append((start, stop))
        return np.arange(start, stop, dtype=np.float32)[:, None] * np.ones(7, np.float32)

    written = H5PatchWriter(
        chunk_rows=8,
        patch_size=256,
        patch_size_level0=512,
        level0_mag=40,
        target_mag=20,
        level0_wh=(10000, 8000),
        overlap=0,
        slide_stem="slideA",
        wsi_path="x",
    ).append_features(
        output_path=out,
        feature_name="resnet50",
        feature_fn=feature_fn,
        num_rows=5,
        feature_batch=2,
        expected_total=5,
    )
    assert written == 5
    assert calls == [(0, 2), (2, 4), (4, 5)]
    with h5py.File(out) as f:
        feats = f["features/resnet50"][:]
        assert feats.shape == (5, 7)
        assert feats.dtype == np.float32
        np.testing.assert_allclose(feats[:, 0], np.arange(5, dtype=np.float32))
        assert "__tmp_resnet50" not in f["features"]


def test_append_features_rejects_duplicate_and_cleans_tmp(tmp_path: Path):
    out = tmp_path / "s.h5"
    _writer().write_coords(out, _entries([(0, 0, 1, 1, 0)]), batch=8)
    w = _writer()

    def ok_fn(start, stop):
        return np.zeros((stop - start, 3), dtype=np.float32)

    w.append_features(
        output_path=out, feature_name="f", feature_fn=ok_fn, num_rows=1, feature_batch=4
    )
    with pytest.raises(ValueError):
        w.append_features(
            output_path=out, feature_name="f", feature_fn=ok_fn, num_rows=1, feature_batch=4
        )

    def bad_fn(start, stop):
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        w.append_features(
            output_path=out, feature_name="g", feature_fn=bad_fn, num_rows=1, feature_batch=4
        )
    with h5py.File(out) as f:
        assert "g" not in f["features"]
        assert "__tmp_g" not in f["features"]


def test_append_features_count_mismatch(tmp_path: Path):
    out = tmp_path / "s.h5"
    _writer().write_coords(out, _entries([(0, 0, 1, 1, 0)] * 3), batch=8)

    def fn(start, stop):
        return np.zeros((stop - start, 3), dtype=np.float32)

    with pytest.raises(ValueError):
        _writer().append_features(
            output_path=out,
            feature_name="f",
            feature_fn=fn,
            num_rows=2,
            feature_batch=4,
            expected_total=3,
        )


def test_png_export_failure_does_not_abort_slide(tmp_path: Path, monkeypatch):
    """A failing per-patch PNG save logs and continues: coords are already
    committed, so the slide must still complete (ADVICE r1; reference
    _drain_futures swallows image-save errors)."""
    import atlaspatch_tpu.services.storage as storage_mod

    def boom(patch_arr, out_path):
        raise OSError("disk full")

    monkeypatch.setattr(storage_mod, "save_patch_png", boom)
    w = _writer()
    out = tmp_path / "s.h5"
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    patch = np.zeros((8, 8, 3), dtype=np.uint8)
    entries = [(0, 0, 512, 512, 0, patch), (512, 0, 512, 512, 0, patch)]
    total, _ = w.write_coords_and_images(out, entries, img_dir, batch=4)
    assert total == 2
    with h5py.File(out) as f:
        assert f["coords"].shape[0] == 2


def test_lowlevel_write_matches_highlevel_readback(tmp_path: Path):
    """AtomicH5's low-level fast paths (put_all datasets, scalar attrs) must
    read back byte- and TYPE-identically to plain h5py high-level writes:
    str attrs stay str (vlen UTF-8), Python ints stay int64, floats float64,
    numpy scalars keep their dtype, and exotic values (bool, arrays, bytes)
    still land via the high-level fallback."""
    from atlaspatch_tpu.utils.h5 import AtomicH5

    coords = np.arange(40, dtype=np.int32).reshape(8, 5)
    pp = np.array([b"p" * 31] * 8, dtype="S160")
    attrs = {
        "a_str": "hello/world",
        "a_int": 7,
        "a_float": 0.25,
        "a_np32": np.int32(9),
        "a_bool": True,
        "a_arr": np.array([1, 2, 3], dtype=np.int16),
        "a_bytes": b"raw",
        "a_none": None,
        "a_dict": {"k": 1},
    }

    low = tmp_path / "low.h5"
    with AtomicH5(low) as store:
        store.put_all("coords", coords)
        store.put_all("passports", pp, attrs={"ds_str": "x", "ds_int": 3})
        store.set_attrs(attrs)
        store.set_attrs({"a_str": "overwritten"})  # existing-attr fallback

    high = tmp_path / "high.h5"
    with h5py.File(high, "w") as f:
        f.create_dataset("coords", data=coords)
        d = f.create_dataset("passports", data=pp)
        d.attrs["ds_str"] = "x"
        d.attrs["ds_int"] = 3
        for k, v in attrs.items():
            f.attrs[k] = {"a_none": "None", "a_dict": '{"k": 1}'}.get(k, v)
        f.attrs["a_str"] = "overwritten"

    with h5py.File(low) as fl, h5py.File(high) as fh:
        for name in ("coords", "passports"):
            assert fl[name].dtype == fh[name].dtype
            np.testing.assert_array_equal(fl[name][:], fh[name][:])
        for node_l, node_h in ((fl, fh), (fl["passports"], fh["passports"])):
            assert set(node_l.attrs) == set(node_h.attrs)
            for k in node_l.attrs:
                vl, vh = node_l.attrs[k], node_h.attrs[k]
                assert type(vl) is type(vh), (k, type(vl), type(vh))
                if isinstance(vl, np.ndarray):
                    assert vl.dtype == vh.dtype
                    np.testing.assert_array_equal(vl, vh)
                else:
                    assert vl == vh, k
                    if hasattr(vl, "dtype"):
                        assert vl.dtype == vh.dtype, k


def test_put_all_nested_and_nonascii_names(tmp_path: Path):
    """put_all must keep create_dataset's contract for names the low-level
    fast path can't honor: 'group/name' auto-creates the group, non-ASCII
    names store with a UTF-8 link charset, object dtypes become vlen str."""
    from atlaspatch_tpu.utils.h5 import AtomicH5

    out = tmp_path / "nested.h5"
    with AtomicH5(out) as store:
        store.put_all("grp/inner", np.arange(6, dtype=np.int64).reshape(2, 3))
        store.put_all("ünïcode", np.ones(4, dtype=np.float32))
        store.put_all("objs", np.array(["a", "bb"], dtype=object))

    with h5py.File(out) as f:
        np.testing.assert_array_equal(f["grp/inner"][:], np.arange(6).reshape(2, 3))
        np.testing.assert_array_equal(f["ünïcode"][:], np.ones(4, np.float32))
        assert [v.decode() for v in f["objs"][:]] == ["a", "bb"]
