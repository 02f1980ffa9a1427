"""Row-level unit tests for the real-data CSV/filter pipelines.

Tiny synthetic CSVs + images exercise the intricate reference semantics that
were previously only smoke-tested via experiment imports:

- CheXpert: study1-frontal row filter, null→0, −1 drop, XOR keep, seed-42
  class balance, row-order 80/10/10 splits
  (`/root/reference/dataset/chexpert.py:31-40,58-127`)
- MIMIC: head-limit balancing (FIRST min_count rows per label, not sampled)
  and the intentional no-normalize [0,1] quirk
  (`/root/reference/dataset/mimic.py:37-67`)
- PadChest: 16-bit PNGs scaled by 255·255 and grayscale→3ch replication
  (`/root/reference/dataset/padchest.py:84,90`)
- ISIC: cf_label prompt override with original_labels passthrough
  (`/root/reference/dataset/isic.py:126-134`)
"""

import csv
import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _write_csv(path, header, rows):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


def _png(path, value=128, size=(8, 8), mode="L"):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if mode == "I;16":
        arr = np.full(size, value, np.uint16)
        Image.fromarray(arr, mode="I;16").save(path)
    else:
        arr = np.full(size + (3,), value, np.uint8)
        Image.fromarray(arr, "RGB").save(path)


# --------------------------------------------------------------------- chexpert

CHEX_HEADER = ["Path", "Pleural Effusion", "No Finding"]
# hand-labelled row inventory: (path-tag, effusion, nofinding, survives-filter)
CHEX_ROWS = [
    ("p01/study1/view1_frontal.jpg", 1.0, 0.0, True),   # sick
    ("p02/study1/view1_frontal.jpg", 0.0, 1.0, True),   # healthy
    ("p03/study1/view1_frontal.jpg", 1.0, 1.0, False),  # both → XOR fails
    ("p04/study1/view1_frontal.jpg", 0.0, 0.0, False),  # neither → XOR fails
    ("p05/study1/view1_frontal.jpg", -1.0, 1.0, False), # uncertain dropped
    ("p06/study1/view1_frontal.jpg", 1.0, -1.0, False), # uncertain dropped
    ("p07/study1/view1_frontal.jpg", "", 1.0, True),    # null → 0: healthy
    ("p08/study2/view1_frontal.jpg", 1.0, 0.0, False),  # not study1
    ("p09/study1/view2_lateral.jpg", 1.0, 0.0, False),  # not frontal view1
    ("p10/study1/view1_frontal.jpg", 1.0, "", True),    # sick, null nofinding
    ("p11/study1/view1_frontal.jpg", 0.0, 1.0, True),   # healthy
    ("p12/study1/view1_frontal.jpg", 1.0, 0.0, True),   # sick
    ("p13/study1/view1_frontal.jpg", 1.0, 0.0, True),   # sick
    ("p14/study1/view1_frontal.jpg", 1.0, 0.0, True),   # sick
    ("p15/study1/view1_frontal.jpg", 0.0, 1.0, True),   # healthy
    ("p16/study1/view1_frontal.jpg", "", 1.0, True),    # null → 0: healthy
]

CHEX_SICK = ("p01", "p10", "p12", "p13", "p14")


@pytest.fixture()
def chexpert_dir(tmp_path):
    root = tmp_path / "chexpert"
    root.mkdir()
    rows = [
        (f"CheXpert-v1.0-small/{tag}", eff, nof)
        for tag, eff, nof, _ in CHEX_ROWS
    ]
    _write_csv(root / "train.csv", CHEX_HEADER, rows)
    for tag, *_ in CHEX_ROWS:
        _png(str(root / tag), value=255)
    return str(root)


def test_chexpert_filter_balance_and_splits(chexpert_dir):
    from diffusion_classifier_tpu.data.chexpert import CheXpertDataset

    splits = {
        s: CheXpertDataset(chexpert_dir, s, image_size=8)
        for s in ("train", "valid", "test")
    }
    all_paths = sum((ds.paths for ds in splits.values()), [])
    all_labels = np.concatenate([ds.labels for ds in splits.values()])

    survivors = {f"CheXpert-v1.0-small/{t}" for t, _, _, keep in CHEX_ROWS if keep}
    sick = {p for p in survivors if p.split("/")[1] in CHEX_SICK}
    healthy = survivors - sick
    assert len(sick) == len(healthy) == 5  # balanced by construction

    # every filtered-out row must be absent; survivors all present (equal
    # class counts ⇒ the seed-42 subsample keeps everything)
    assert set(all_paths) == survivors
    assert all_labels.sum() == 5 and len(all_labels) == 10
    for ds in splits.values():
        for p, lab in zip(ds.paths, ds.labels):
            assert (lab == 1) == (p in sick)

    # row-order splits: 80/10/10 of the shuffled frame, disjoint partition
    assert (len(splits["train"]), len(splits["valid"]), len(splits["test"])) \
        == (8, 1, 1)
    assert len(set(all_paths)) == len(all_paths)


def test_chexpert_item_normalization_and_mistakes(chexpert_dir):
    from diffusion_classifier_tpu.data.chexpert import CheXpertDataset

    ds = CheXpertDataset(chexpert_dir, "train", image_size=8)
    img, label = ds[0]
    assert img.shape == (8, 8, 3) and img.dtype == np.float32
    np.testing.assert_allclose(img, 1.0)  # 255 pixel → (1.0 − 0.5)/0.5
    assert label in (0, 1)

    # mistakes file: relative paths (root component stripped) of wrong preds
    wrong = [1 - l for l in ds.labels]
    assert len(ds.mistake_paths(wrong)) == len(ds)
    assert all(not p.startswith("CheXpert") for p in ds.mistake_paths(wrong))
    assert ds.mistake_paths(list(ds.labels)) == []


def test_chexpert_cf_label_overrides_every_prompt(chexpert_dir):
    from diffusion_classifier_tpu.data.chexpert import CheXpertDataLoader

    dl = CheXpertDataLoader(
        False, chexpert_dir, cf_label=1, batch_size=2, image_size=8
    )
    for batch in dl.get_train_loader():
        assert (batch["prompt"] == 1).all()


# ------------------------------------------------------------------------ mimic

def test_mimic_head_limit_balance_and_no_normalize(tmp_path):
    from diffusion_classifier_tpu.data.mimic import MimicOodDataset

    root = tmp_path / "mimic"
    root.mkdir()
    rows = [
        # (path, label): 4 zeros (incl. null), 2 ones, 1 uncertain
        ("files/p1/pa/s1/a.jpg", 0.0),
        ("files/p1/pb/s2/b.jpg", 1.0),
        ("files/p1/pc/s3/c.jpg", ""),      # null → 0
        ("files/p1/pd/s4/d.jpg", -1.0),    # dropped
        ("files/p1/pe/s5/e.jpg", 0.0),
        ("files/p1/pf/s6/f.jpg", 1.0),
        ("files/p1/pg/s7/g.jpg", 0.0),
    ]
    _write_csv(
        root / "mimic_pa_metadata.csv",
        ["image_path", "Pleural Effusion"],
        rows,
    )
    for p, _ in rows:
        _png(str(root / os.path.join(*p.split("/")[2:])), value=51)

    ds = MimicOodDataset(str(root), image_size=8)
    # min_count = 2 ⇒ FIRST two zeros (a, c-null) + FIRST two ones (b, f),
    # in concat order zeros-then-ones (reference head-limit, `:60-67`)
    assert ds.paths == [
        "files/p1/pa/s1/a.jpg",
        "files/p1/pc/s3/c.jpg",
        "files/p1/pb/s2/b.jpg",
        "files/p1/pf/s6/f.jpg",
    ]
    assert ds.labels.tolist() == [0, 0, 1, 1]

    img, _ = ds[0]
    # no Normalize: stays in [0, 1] (51/255), never shifted to [-1, 1]
    np.testing.assert_allclose(img, 51.0 / 255.0, rtol=1e-6)


# --------------------------------------------------------------------- padchest

def test_padchest_16bit_scaling_and_channel_replication(tmp_path):
    from diffusion_classifier_tpu.data.padchest import PadChestDataset

    root = tmp_path / "padchest"
    root.mkdir()
    rows = [("im0.png", 0.0), ("im1.png", 1.0), ("im2.png", -1.0)]
    _write_csv(
        root / "padchest-v1.csv",
        ["ImageID", "PleuralEffusion"],
        rows,
    )
    _png(str(root / "im0.png"), value=255 * 255, mode="I;16")
    _png(str(root / "im1.png"), value=0, mode="I;16")
    _png(str(root / "im2.png"), value=255 * 255, mode="I;16")

    ds = PadChestDataset(str(root), image_size=8)
    # NO balancing — only the -1 label row drops (reference `:45-59`)
    assert len(ds) == 2

    img, label = ds[0]
    assert img.shape == (8, 8, 3)
    # 16-bit scaling 65025/(255·255) = 1.0, then (1.0-0.5)/0.5 = 1.0
    # (reference `:84,87`)
    np.testing.assert_allclose(img, 1.0)
    # all three channels are replicas (`:90`)
    assert (img[..., 0] == img[..., 1]).all() and (img[..., 0] == img[..., 2]).all()
    # a zero-valued 16-bit PNG normalizes to -1, not 0 (`:87`)
    img1, _ = ds[1]
    np.testing.assert_allclose(img1, -1.0)


# ------------------------------------------------------------------------- isic

def test_isic_cf_label_and_original_labels(tmp_path):
    from diffusion_classifier_tpu.data.isic import ISICDataLoader

    root = tmp_path / "isic"
    (root / "images").mkdir(parents=True)
    names = [f"ISIC_{i:07d}" for i in range(10)]
    labels = [i % 2 for i in range(10)]
    _write_csv(
        root / "train_balanced.csv",
        ["image_name", "target"],
        list(zip(names, labels)),
    )
    for n in names:
        _png(str(root / "images" / f"{n}.jpg"), value=128)

    dl = ISICDataLoader(
        False, str(root), cf_label=1, batch_size=2, image_size=8
    )
    # split sizes by row order: 8 / 1 / 1
    assert len(dl.train_dataset) == 8
    assert len(dl.val_dataset) == 1 and len(dl.test_dataset) == 1
    assert dl.train_dataset.names == names[:8]

    originals = []
    for batch in dl.get_train_loader():
        assert (batch["prompt"] == 1).all()  # forced counterfactual prompt
        originals.extend(batch["original_labels"].tolist())
    # true labels pass through untouched (both classes present over the epoch)
    assert sorted(set(originals)) == [0, 1]


def test_isic_odd_tail_drops_middle_row(tmp_path):
    """With int(n*0.2) odd, the middle row of the 20% tail belongs to NO
    split — reference valid=head(tail//2), test=tail(tail//2)
    (`/root/reference/dataset/isic.py:34-40`)."""
    from diffusion_classifier_tpu.data.isic import ISICDataset

    root = tmp_path / "isic"
    (root / "images").mkdir(parents=True)
    names = [f"ISIC_{i:07d}" for i in range(15)]  # tail = 3 rows (odd)
    _write_csv(
        root / "train_balanced.csv",
        ["image_name", "target"],
        [(n, i % 2) for i, n in enumerate(names)],
    )
    for n in names:
        _png(str(root / "images" / f"{n}.jpg"))

    train = ISICDataset(str(root), "train", image_size=8)
    valid = ISICDataset(str(root), "valid", image_size=8)
    test = ISICDataset(str(root), "test", image_size=8)
    assert train.names == names[:12]
    assert valid.names == [names[12]]
    assert test.names == [names[14]]  # names[13] dropped, like the reference


def test_isic_batcher_yields_per_rank_slice(tmp_path):
    """batch_size is GLOBAL (loader.py contract): each simulated rank
    decodes and yields only its contiguous quarter of every batch."""
    from diffusion_classifier_tpu.data.isic import ISICDataset, _ISICBatcher

    root = tmp_path / "isic"
    (root / "images").mkdir(parents=True)
    names = [f"ISIC_{i:07d}" for i in range(10)]
    _write_csv(
        root / "train_balanced.csv",
        ["image_name", "target"],
        [(n, i % 2) for i, n in enumerate(names)],
    )
    for n in names:
        _png(str(root / "images" / f"{n}.jpg"))
    ds = ISICDataset(str(root), "train", image_size=8)

    per_rank = [
        [
            b["prompt"]
            for b in _ISICBatcher(
                ds, 4, True, 7, None, process_index=r, process_count=2
            )
        ]
        for r in range(2)
    ]
    full = [
        b["prompt"]
        for b in _ISICBatcher(ds, 4, True, 7, None)
    ]
    assert all(p.shape == (2,) for ranks in per_rank for p in ranks)
    for i, batch in enumerate(full):
        np.testing.assert_array_equal(
            np.concatenate([per_rank[0][i], per_rank[1][i]]), batch
        )
