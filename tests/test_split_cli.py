"""Split-generator CLI test (replaces the reference's private-`pvg` scripts).

Runs `experiments/ipmsa/split/split.py` as a subprocess over a synthetic
full-index pickle: blocklisted (trial, patient) samples are removed, the
80/10/10 split is grouped by patient directory, and the output pickles load
back in the `IPMSADataset` schema.
"""

import os
import pickle
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPLIT = os.path.join(REPO, "experiments", "ipmsa", "split", "split.py")


def _index(n=20):
    dataset_dict = {}
    for i in range(n):
        trial, patient = f"trial{i % 4}", f"p{i:03d}"
        dataset_dict[f"s{i:03d}"] = {
            "MRI_AND_LABEL": {
                "FLAIR": {"W000": f"{trial}/{patient}/flair.npy"},
            }
        }
    return {"dataset_dict": dataset_dict, "item_template": {"FLAIR": [["MRI_AND_LABEL", "FLAIR", "W000"]]}}


def test_split_cli_blocklist_and_grouping(tmp_path):
    index = tmp_path / "full_index.pkl"
    with open(index, "wb") as f:
        pickle.dump(_index(), f)
    blocklist = tmp_path / "blocklist.txt"
    blocklist.write_text("w/trial0/p000/x\nw/trial1/p001/x\n")
    out = tmp_path / "out"

    subprocess.run(
        [
            sys.executable,
            SPLIT,
            str(index),
            str(blocklist),
            "--out",
            str(out),
            "--seed",
            "42",
        ],
        check=True,
        capture_output=True,
        text=True,
    )

    splits = {}
    for name in ("train", "val", "test"):
        with open(out / f"{name}_dataset_filtered.pkl", "rb") as f:
            d = pickle.load(f)
        assert set(d) == {"dataset_dict", "item_template"}
        splits[name] = d["dataset_dict"]

    all_keys = [k for s in splits.values() for k in s]
    assert len(all_keys) == len(set(all_keys)) == 18  # 20 - 2 blocked
    assert "s000" not in all_keys and "s001" not in all_keys

    # grouped: a patient directory appears in exactly one split
    def patients(s):
        return {
            next(iter(v["MRI_AND_LABEL"]["FLAIR"].values())).rsplit("/", 1)[0]
            for v in s.values()
        }

    p = {name: patients(s) for name, s in splits.items()}
    assert not (p["train"] & p["val"]) and not (p["train"] & p["test"])
    assert not (p["val"] & p["test"])
    assert len(splits["train"]) > len(splits["val"])
