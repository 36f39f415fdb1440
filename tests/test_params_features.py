from pathlib import Path

import h5py
import numpy as np
import pytest

from atlaspatch_tpu.utils.features import (
    get_existing_features,
    missing_features,
    parse_feature_list,
)
from atlaspatch_tpu.utils.params import get_mpp_for_wsi, get_wsi_files, load_mpp_csv


def test_parse_feature_list():
    choices = ["resnet50", "uni_v1", "clip_vit_b_16"]
    assert parse_feature_list("resnet50, uni_v1", choices=choices) == ["resnet50", "uni_v1"]
    assert parse_feature_list("RESNET50 clip_vit_b_16", choices=choices) == [
        "resnet50",
        "clip_vit_b_16",
    ]
    with pytest.raises(ValueError):
        parse_feature_list("", choices=choices)
    with pytest.raises(ValueError):
        parse_feature_list("nope", choices=choices)
    with pytest.raises(ValueError):
        parse_feature_list("resnet50 resnet50", choices=choices)


def test_get_wsi_files(tmp_path: Path):
    (tmp_path / "a.svs").touch()
    (tmp_path / "b.PNG").touch()
    (tmp_path / "notes.txt").touch()
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "c.tiff").touch()

    files = get_wsi_files(str(tmp_path))
    assert [Path(f).name for f in files] == ["a.svs", "b.PNG"]

    files_r = get_wsi_files(str(tmp_path), recursive=True)
    assert [Path(f).name for f in files_r] == ["a.svs", "b.PNG", "c.tiff"]

    assert get_wsi_files(str(tmp_path / "a.svs")) == [str(tmp_path / "a.svs")]

    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError):
        get_wsi_files(str(empty))


def test_mpp_csv(tmp_path: Path):
    csv_path = tmp_path / "mpp.csv"
    csv_path.write_text("wsi,mpp\nslideA.svs,0.25\nslideB,0.5\nbad,-1\nskip,\n")
    mapping = load_mpp_csv(str(csv_path))
    assert mapping == {"slideA": 0.25, "slideB": 0.5}
    assert get_mpp_for_wsi("/x/slideA.svs", mapping) == 0.25
    assert get_mpp_for_wsi("/x/unknown.svs", mapping) is None
    assert get_mpp_for_wsi("/x/slideA.svs", None) is None

    bad = tmp_path / "bad.csv"
    bad.write_text("a,b\n1,2\n")
    with pytest.raises(ValueError):
        load_mpp_csv(str(bad))


def test_existing_and_missing_features(tmp_path: Path):
    h5_path = tmp_path / "s.h5"
    with h5py.File(h5_path, "w") as f:
        g = f.create_group("features")
        g.create_dataset("resnet50", data=np.zeros((10, 4), np.float32))
        g.create_dataset("partial", data=np.zeros((3, 4), np.float32))

    assert get_existing_features(h5_path) == {"resnet50", "partial"}
    assert get_existing_features(h5_path, expected_total=10) == {"resnet50"}
    assert missing_features(h5_path, ["resnet50", "partial", "uni_v1"], expected_total=10) == [
        "partial",
        "uni_v1",
    ]
    assert get_existing_features(tmp_path / "nope.h5") == set()
