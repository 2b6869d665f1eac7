"""Corpus bookkeeping: faculty categorization + duration distribution
(reference dataset/data_utils.py, dataset/prepare_dataset.py:25-75)."""

import os

import numpy as np

from taiwan_whisper_tpu.audio.corpus import (
    categorize_corpus,
    category_names,
    category_time_distribution,
    is_valid_sid,
    normalize_sid,
    read_vid_to_sid,
    sid_category,
)
from taiwan_whisper_tpu.audio.io import write_flac


def test_normalize_and_validate_sid():
    assert normalize_sid("x:901_123:y") == "901_123"
    assert normalize_sid("x:901_123") == "901_123"
    assert normalize_sid("901_123") == "901_123"
    assert normalize_sid(None) is None
    assert is_valid_sid("901_123")
    assert is_valid_sid("A01_x")
    assert not is_valid_sid("901")         # no section
    assert not is_valid_sid("x_1_2")       # too many parts
    assert not is_valid_sid("W01_1")       # unknown faculty char
    assert not is_valid_sid("")
    assert not is_valid_sid(None)


def test_sid_category():
    assert sid_category("901_123") == "900"   # EECS
    assert sid_category("A01_1") == "A00"     # Law
    assert sid_category("bogus") == "unknown"
    assert sid_category(None) == "unknown"
    assert "900" in category_names() and "unknown" in category_names()


def test_categorize_and_distribution(tmp_path):
    csv_path = tmp_path / "vid_cid_sid.csv"
    csv_path.write_text(
        "vid,cid,sid\n"
        "lec1,c1,x:901_123:y\n"
        "lec2,c2,101_007\n"
        "lec3,c3,zzz\n"        # invalid sid -> unknown
        "broken,row\n"          # malformed row ignored
    )
    vid_to_sid = read_vid_to_sid(str(csv_path))
    assert vid_to_sid == {"lec1": "901_123", "lec2": "101_007", "lec3": "zzz"}

    src = tmp_path / "raw"
    os.makedirs(src)
    rng = np.random.RandomState(0)
    for name, secs in [("lec1", 2.0), ("lec2", 1.0), ("lec4", 0.5)]:
        write_flac(str(src / f"{name}.flac"),
                   (rng.randn(int(16000 * secs)) * 0.1).astype(np.float32))

    out = tmp_path / "bucketed"
    res = categorize_corpus(
        sorted(str(p) for p in src.glob("*.flac")), str(out), vid_to_sid,
        move=True,
    )
    assert res.categories == {"900": 1, "100": 1, "unknown": 1}
    assert res.unknown_vids == ["lec4"]  # lec4 absent from the mapping
    assert (out / "900" / "lec1.flac").exists()
    assert (out / "100" / "lec2.flac").exists()
    assert (out / "unknown" / "lec4.flac").exists()
    assert not (src / "lec1.flac").exists()  # moved

    tsv = tmp_path / "categories.tsv"
    dist = category_time_distribution(str(out), tsv_path=str(tsv))
    assert abs(dist["900"] - 2.0) < 0.01
    assert abs(dist["100"] - 1.0) < 0.01
    assert abs(dist["unknown"] - 0.5) < 0.01
    assert dist["500"] == 0.0
    lines = tsv.read_text().strip().splitlines()
    assert len(lines) == 3 and lines[0].split("\t")[0] in category_names()
