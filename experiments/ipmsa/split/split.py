"""Generic IPMSA split generation (replaces the reference's private-`pvg`
scripts, `/root/reference/experiments/ipmsa/split/split.py:5-18`, which
depend on an unavailable package).

Consumes a full pickle index in the `IPMSADataset` schema
(``{'dataset_dict', 'item_template'}``, `dataset/ipmsa.py:72-86`) and writes
``{train,val,test}_dataset_filtered.pkl`` with an IID 80/10/10 split GROUPED
by patient (samples from one patient never straddle splits — the property the
reference's grouped splitter enforced, `split.py:134`), after applying the
blocklist (`blocklist.txt`, reference format ``<x>/<trial>/<patient>/...``).

Usage:
    python split.py <full_index.pkl> [blocklist.txt] [--seed 42] [--out DIR]
"""

import argparse
import os
import pickle
import random
from collections import defaultdict


def load_blocklist(path):
    blocked = set()
    if path and os.path.exists(path):
        with open(path) as f:
            for line in f:
                parts = line.strip().split("/")
                if len(parts) >= 3:
                    blocked.add((parts[1], parts[2]))
    return blocked


def patient_group(sample_dict) -> str:
    """Derive a grouping key from the first relative path in the sample."""

    def walk(d):
        for v in d.values():
            if isinstance(v, dict):
                r = walk(v)
                if r is not None:
                    return r
            elif isinstance(v, str):
                return v
        return None

    rel = walk(sample_dict) or ""
    parts = rel.split("/")
    # layout <...>/<trial>/<patient>/<file>: last directory is the patient
    return "/".join(parts[:-1]) if len(parts) > 1 else rel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("index")
    ap.add_argument("blocklist", nargs="?", default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default=None)
    ap.add_argument("--train", type=float, default=0.8)
    ap.add_argument("--val", type=float, default=0.1)
    args = ap.parse_args()

    with open(args.index, "rb") as f:
        index = pickle.load(f)
    dataset_dict = index["dataset_dict"]
    item_template = index["item_template"]

    blocked = load_blocklist(args.blocklist)

    groups = defaultdict(list)
    for key, sample in dataset_dict.items():
        g = patient_group(sample)
        parts = g.split("/")
        tp = tuple(parts[-2:]) if len(parts) >= 2 else (g, g)
        if tp in blocked:
            continue
        groups[g].append(key)

    group_keys = sorted(groups)
    random.Random(args.seed).shuffle(group_keys)
    n = len(group_keys)
    n_train = int(n * args.train)
    n_val = int(n * args.val)
    split_groups = {
        "train": group_keys[:n_train],
        "val": group_keys[n_train : n_train + n_val],
        "test": group_keys[n_train + n_val :],
    }

    out_dir = args.out or os.path.dirname(os.path.abspath(args.index))
    os.makedirs(out_dir, exist_ok=True)
    for split, gkeys in split_groups.items():
        keys = [k for g in gkeys for k in groups[g]]
        payload = {
            "dataset_dict": {k: dataset_dict[k] for k in keys},
            "item_template": item_template,
        }
        path = os.path.join(out_dir, f"{split}_dataset_filtered.pkl")
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        print(f"{split}: {len(keys)} samples ({len(gkeys)} patients) → {path}")


if __name__ == "__main__":
    main()
