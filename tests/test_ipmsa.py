"""IPMSA dataset + LORISTransforms tests over synthetic pickle-index volumes."""

import io
import os
import pickle
import struct

import numpy as np
import pytest

from diffusion_classifier_tpu.data.ipmsa import (
    IPMSADataset,
    LORISTransforms,
    MRIImageKeys,
    load_image,
    trial_mapping,
)
from diffusion_classifier_tpu.utils import lz4io

T = LORISTransforms
MAGIC = struct.pack("<I", 0x184D2204)


def _store_frame(payload: bytes) -> bytes:
    return (
        MAGIC
        + bytes([0x40, 0x40, 0x00])
        + struct.pack("<I", len(payload) | 0x80000000)
        + payload
        + struct.pack("<I", 0)
    )


def _write_vol(path, arr):
    buf = io.BytesIO()
    np.save(buf, arr.astype(np.float32))
    if path.endswith(".lz4"):
        with open(path, "wb") as f:
            f.write(_store_frame(buf.getvalue()))
    else:
        with open(path, "wb") as f:
            f.write(buf.getvalue())


@pytest.fixture
def fake_index(monkeypatch):
    """Two samples × (FLAIR 2tp, MASK 1tp) volumes in reference layout.

    The reference derives (trial_id, patient_id) from ABSOLUTE path
    components 3 and 4 (`dataset/ipmsa.py:185-187`), which presumes a
    ``/<a>/<b>/<trial>/<patient>/...`` layout — so the fixture roots the data
    at ``/tmp/<dir>/<trial>/<patient>/``.
    """
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="ipmsa_", dir="/tmp")
    monkeypatch.setenv("DATA_PATH", base)
    rng = np.random.default_rng(0)
    dataset_dict, D, H, W = {}, 4, 6, 5
    for s, (trial, patient) in enumerate(
        [("trialA", "p001"), ("trialB", "p002")]
    ):
        rel_dir = os.path.join(trial, patient)
        os.makedirs(os.path.join(base, rel_dir), exist_ok=True)
        flair = {}
        for tp in ("W000", "W048"):
            rel = os.path.join(rel_dir, f"flair_{tp}.npy.lz4")
            _write_vol(os.path.join(base, rel), rng.random((D, H, W)) * 100)
            flair[tp] = rel
        mask_rel = os.path.join(rel_dir, "mask.npy")
        _write_vol(os.path.join(base, mask_rel), np.ones((D, H, W)))
        dataset_dict[f"s{s}"] = {
            "MRI_AND_LABEL": {"FLAIR": flair, "MASK": {"W000": mask_rel}}
        }
    item_template = {
        MRIImageKeys.FLAIR: [
            ["MRI_AND_LABEL", "FLAIR", "W000"],
            ["MRI_AND_LABEL", "FLAIR", "W048"],
        ],
        MRIImageKeys.MASK: [["MRI_AND_LABEL", "MASK", "W000"]],
    }
    index_path = os.path.join(base, "index.pkl")
    with open(index_path, "wb") as f:
        pickle.dump(
            {"dataset_dict": dataset_dict, "item_template": item_template}, f
        )
    yield index_path
    shutil.rmtree(base, ignore_errors=True)


def test_load_image_lz4_and_plain(tmp_path):
    arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    _write_vol(str(tmp_path / "a.npy"), arr)
    _write_vol(str(tmp_path / "b.npy.lz4"), arr)
    np.testing.assert_array_equal(load_image(str(tmp_path / "a.npy")), arr)
    np.testing.assert_array_equal(load_image(str(tmp_path / "b.npy.lz4")), arr)
    with pytest.raises(ValueError, match="Unsupported"):
        load_image(str(tmp_path / "c.txt"))


def test_dataset_loads_and_caches(fake_index, tmp_path):
    cache = str(tmp_path / "cache")
    ds = IPMSADataset(fake_index, cache_dir=cache)
    assert len(ds) == 2
    calls = []

    def transform(item):
        calls.append(1)
        out = item["output"]
        return {
            "images": out[MRIImageKeys.FLAIR][:, 0].astype(np.float32),
            "prompt": np.int32(0),
            "trial": item["idx"]["trial_id"],
        }

    ds.set_transform(transform)
    item = ds[0]
    assert item["images"].shape == (2, 6, 5)  # 2 timepoints, center handled later
    # reference parity: trial_id is component 3 of the ABSOLUTE volume path
    first_path = ds.resolved_paths(0)[MRIImageKeys.FLAIR][0]
    assert item["trial"] == first_path.split("/")[3]
    # second access hits the pickle cache — transform not called again
    _ = ds[0]
    assert sum(calls) == 1
    assert os.path.exists(os.path.join(cache, "s0.pkl"))


def test_remove_condition_blocklist(fake_index, tmp_path):
    ds = IPMSADataset(fake_index)
    # block sample 0 using the (trial, patient) = path components (3, 4)
    # convention of the reference blocklist format
    first_path = ds.resolved_paths(0)[MRIImageKeys.FLAIR][0]
    parts = first_path.split("/")
    bl = tmp_path / "blocklist.txt"
    bl.write_text(f"w/{parts[3]}/{parts[4]}/whatever\n")
    ds.remove_condition(str(bl), name="filtered")
    assert len(ds) == 1
    filtered = fake_index.replace(".pkl", "_filtered.pkl")
    assert os.path.exists(filtered)
    with open(filtered, "rb") as f:
        data = pickle.load(f)
    assert list(data["dataset_dict"].keys()) == ["s1"]


def _vols():
    rng = np.random.default_rng(1)
    return {
        MRIImageKeys.FLAIR: rng.random((2, 5, 6, 6)).astype(np.float32) * 50,
        MRIImageKeys.NEWT2: (rng.random((1, 5, 6, 6)) > 0.7).astype(np.float32),
        MRIImageKeys.MASK: np.ones((1, 5, 6, 6), np.float32),
        "AGE": [42.0],
    }


def test_pad_timepoints():
    vols = _vols()
    out = T.PadTimepoints()(dict(vols))
    assert out[MRIImageKeys.NEWT2].shape[0] == 2
    # zero-padded at the FRONT
    np.testing.assert_array_equal(out[MRIImageKeys.NEWT2][0], 0)


def test_get_slice_center_slab():
    vols = T.PadTimepoints()(_vols())
    out = T.GetSlice(3)(dict(vols))
    assert out[MRIImageKeys.FLAIR].shape == (2, 3, 6, 6)
    single = T.GetSlice(1)(
        {MRIImageKeys.FLAIR: np.random.rand(2, 5, 6, 6)}
    )
    assert single[MRIImageKeys.FLAIR].shape == (2, 1, 6, 6)
    with pytest.raises(AssertionError):
        T.GetSlice(2)


def test_denoise_masks_and_binarize():
    vols = T.PadTimepoints()(_vols())
    vols[MRIImageKeys.MASK] = np.zeros_like(vols[MRIImageKeys.MASK])
    out = T.Denoise()(dict(vols))
    np.testing.assert_array_equal(out[MRIImageKeys.FLAIR], 0)
    out2 = T.BinarizeLabel()({MRIImageKeys.NEWT2: np.array([[0.0, 2.5]])})
    np.testing.assert_array_equal(out2[MRIImageKeys.NEWT2], [[0.0, 1.0]])


def test_resize_pads_to_pow2():
    vols = {MRIImageKeys.FLAIR: np.random.rand(1, 2, 6, 5).astype(np.float32)}
    out = T.Resize()(vols)
    assert out[MRIImageKeys.FLAIR].shape == (1, 2, 8, 7)  # pads 2//2 per side
    # NOTE: reference pads (pad//2, pad//2) which drops odd remainders; kept.


def test_normalize_flair_referenced():
    vols = {
        MRIImageKeys.FLAIR: np.stack(
            [np.linspace(0, 100, 36).reshape(6, 6)] * 2
        )[:, None, :, :].astype(np.float32)
    }
    out = T.Normalize()(dict(vols))
    f = out[MRIImageKeys.FLAIR]
    assert f.min() >= -1.0 - 1e-6 and f.max() <= 1.0 + 1e-6


def test_blur_label_2d_shapes_and_range():
    lab = (np.random.rand(2, 3, 8, 8) > 0.5).astype(np.float32)
    vols = {MRIImageKeys.NEWT2: lab.copy(), MRIImageKeys.CT2F: lab.copy()}
    out = T.BlurLabel2D(depth=3)(vols)
    assert out[MRIImageKeys.NEWT2].shape == (2, 1, 8, 8)
    assert np.isfinite(out[MRIImageKeys.NEWT2]).all()


def test_blur_label_3d_preserves_shape():
    lab = (np.random.rand(1, 5, 8, 8) > 0.5).astype(np.float32)
    vols = {MRIImageKeys.NEWT2: lab.copy(), MRIImageKeys.CT2F: lab.copy()}
    out = T.BlurLabel3D(sigma=1, kernel_size=5)(vols)
    assert out[MRIImageKeys.NEWT2].shape == lab.shape
    # blur preserves total mass away from boundary effects
    assert abs(out[MRIImageKeys.NEWT2].sum() - lab.sum()) / lab.sum() < 0.5


def test_trial_mapping_values():
    assert trial_mapping["placebo"] == 0
    assert trial_mapping["ocrelizumab"] == 2


def test_remove_condition_preserves_out_of_subset_entries(fake_index, tmp_path):
    """With a num_samples-truncated dataset, re-pickling after a blocklist
    filter must keep unscanned index entries (only BLOCKED keys drop) — the
    reference filters by inactive position and likewise keeps the rest
    (`dataset/ipmsa.py:231-232`)."""
    ds = IPMSADataset(fake_index, num_samples=1)  # working subset = {s0}
    first_path = ds.resolved_paths(0)[MRIImageKeys.FLAIR][0]
    parts = first_path.split("/")
    bl = tmp_path / "blocklist.txt"
    bl.write_text(f"w/{parts[3]}/{parts[4]}/whatever\n")
    ds.remove_condition(str(bl), name="subset_filtered")
    assert len(ds) == 0  # s0 blocked, subset empty
    with open(fake_index.replace(".pkl", "_subset_filtered.pkl"), "rb") as f:
        data = pickle.load(f)
    # s1 was never scanned — it must survive into the persisted index
    assert list(data["dataset_dict"].keys()) == ["s1"]


def test_malformed_item_template_fails_loudly(fake_index):
    """A key path stopping at an inner node (or empty) must error at init —
    the reference raises plain Exceptions its missing-channel `except
    KeyError` never swallows (`dataset/ipmsa.py:34-43,122-123`); a key
    genuinely absent from one sample stays tolerated."""
    with open(fake_index, "rb") as f:
        index = pickle.load(f)

    # path stops at the FLAIR inner dict: too few keys
    bad = dict(index, item_template={
        MRIImageKeys.FLAIR: [["MRI_AND_LABEL", "FLAIR"]],
    })
    bad_path = fake_index + ".inner.pkl"
    with open(bad_path, "wb") as f:
        pickle.dump(bad, f)
    with pytest.raises(ValueError, match="inner node"):
        IPMSADataset(bad_path)

    # empty key path
    bad = dict(index, item_template={MRIImageKeys.FLAIR: [[]]})
    with open(bad_path, "wb") as f:
        pickle.dump(bad, f)
    with pytest.raises(ValueError, match="empty channel key path"):
        IPMSADataset(bad_path)

    # a per-sample MISSING key is still tolerated (channel absent)
    ok = dict(index, item_template={
        MRIImageKeys.FLAIR: [["MRI_AND_LABEL", "FLAIR", "W096"]],
        MRIImageKeys.MASK: [["MRI_AND_LABEL", "MASK", "W000"]],
    })
    with open(bad_path, "wb") as f:
        pickle.dump(ok, f)
    ds = IPMSADataset(bad_path)
    assert ds.resolved_paths(0)[MRIImageKeys.FLAIR] == []
