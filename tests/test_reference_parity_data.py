"""Data-pipeline parity against the EXECUTED reference LORISTransforms/metrics.

`tests/test_ipmsa.py` checks our transforms against hand-computed
expectations; this file is the stronger arm: it imports the reference's
`dataset/ipmsa.py` (lz4 stubbed) and `utils/metrics.py` and runs them
side-by-side with this framework's numpy ports on identical random volumes —
including the full composed pipeline the ipmsa experiments build
(`/root/reference/experiments/ipmsa/train.py:119-165`) down to the packed
FLAIR‖CT2F slab and the future-activity label.

Skipped when the reference tree is not mounted.
"""

import copy
import importlib.machinery
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from diffusion_classifier_tpu.data.ipmsa import (
    LORISTransforms,
    MRIImageKeys,
    make_default_transform,
)
from diffusion_classifier_tpu.utils.metrics import F1, Accuracy, Precision, Recall

_REF_DIR = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(_REF_DIR), reason="reference tree not mounted"
)


def _load_ref(relpath, name, stub_modules=()):
    stubs = {}
    for mod_name, attrs in stub_modules:
        if mod_name not in sys.modules:
            mod = types.ModuleType(mod_name)
            mod.__spec__ = importlib.machinery.ModuleSpec(mod_name, loader=None)
            for k, v in attrs.items():
                setattr(mod, k, v)
            stubs[mod_name] = mod
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(_REF_DIR, relpath)
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod, stubs
    except Exception:
        for k in stubs:
            sys.modules.pop(k, None)
        raise


@pytest.fixture(scope="module")
def ref_ipmsa():
    lz4_frame = types.ModuleType("lz4.frame")
    lz4_frame.__spec__ = importlib.machinery.ModuleSpec("lz4.frame", loader=None)
    lz4_frame.decompress = lambda b: b
    # `import lz4.frame` needs lz4 to LOOK like a package (__path__) and the
    # submodule to be pre-registered in sys.modules
    mod, stubs = _load_ref(
        "dataset/ipmsa.py",
        "ref_ipmsa",
        stub_modules=[
            ("lz4", {"frame": lz4_frame, "__path__": []}),
            ("lz4.frame", {"decompress": lz4_frame.decompress}),
        ],
    )
    yield mod
    for k in stubs:
        sys.modules.pop(k, None)


@pytest.fixture(scope="module")
def ref_metrics():
    mod, stubs = _load_ref("utils/metrics.py", "ref_metrics")
    yield mod
    for k in stubs:
        sys.modules.pop(k, None)


def _volumes(seed=0, t_flair=3, t_newt2=2, d=9, h=12, w=10):
    """Random MRI item in the reference's [t, D, H, W] layout.

    NEWT2 has fewer timepoints than FLAIR so PadTimepoints does real work;
    dict insertion order is part of the protocol (Denoise multiplies MASK
    into every key INCLUDING itself, in iteration order) so both arms must
    see the same order.
    """
    rng = np.random.default_rng(seed)
    mask = (rng.random((1, d, h, w)) > 0.2).astype(np.float32)
    return {
        MRIImageKeys.FLAIR: (rng.random((t_flair, d, h, w)) * 80).astype(
            np.float32
        ),
        MRIImageKeys.CT2F: (rng.random((t_flair, d, h, w)) > 0.8).astype(
            np.float32
        )
        * 3.0,
        MRIImageKeys.NEWT2: (rng.random((t_newt2, d, h, w)) > 0.85).astype(
            np.float32
        )
        * 2.0,
        MRIImageKeys.MASK: mask,
        "AGE": [51.0],
    }


def _assert_dicts_close(ours, theirs, atol=1e-5):
    assert set(ours) == set(theirs)
    for k in ours:
        if k == "AGE":
            continue
        a = np.asarray(ours[k], np.float32)
        b = theirs[k]
        if isinstance(b, torch.Tensor):
            b = b.numpy()
        b = np.asarray(b, np.float32)
        assert a.shape == b.shape, (k, a.shape, b.shape)
        np.testing.assert_allclose(a, b, atol=atol, rtol=1e-5, err_msg=k)


@pytest.mark.parametrize("slices", [1, 5])
def test_numpy_stage_parity(ref_ipmsa, slices):
    """PadTimepoints → GetSlice → Denoise → BinarizeLabel → Resize, stagewise
    against the executed reference (both numpy)."""
    R, O = ref_ipmsa.LORISTransforms, LORISTransforms
    ref_x, our_x = _volumes(seed=slices), _volumes(seed=slices)
    for ref_t, our_t in [
        (R.PadTimepoints(), O.PadTimepoints()),
        (R.GetSlice(slices=slices), O.GetSlice(slices=slices)),
        (R.Denoise(), O.Denoise()),
        (R.BinarizeLabel(), O.BinarizeLabel()),
        (R.Resize(), O.Resize()),
    ]:
        ref_x = ref_t(ref_x)
        our_x = our_t(our_x)
        _assert_dicts_close(our_x, ref_x)


def test_normalize_parity_both_variants(ref_ipmsa):
    """Normalize (numpy, population std) and NormalizeTensor (torch, unbiased
    std) both match their reference counterparts — and differ from each other
    (the ddof distinction is real)."""
    R, O = ref_ipmsa.LORISTransforms, LORISTransforms

    base = _volumes(seed=7, t_newt2=3)
    # an extreme voxel makes the 4σ clip engage, so the ddof=0 / ddof=1
    # bound difference is observable downstream
    base[MRIImageKeys.FLAIR][0, 0, 0, 0] = 1e4
    ours_np = O.Normalize()(copy.deepcopy(base))
    theirs_np = R.Normalize()(copy.deepcopy(base))
    _assert_dicts_close(ours_np, theirs_np)

    ours_t = O.NormalizeTensor()(copy.deepcopy(base))
    torch_in = {
        k: torch.from_numpy(v) if isinstance(v, np.ndarray) else v
        for k, v in copy.deepcopy(base).items()
    }
    theirs_t = R.NormalizeTensor()(torch_in)
    _assert_dicts_close(ours_t, theirs_t)

    assert not np.allclose(
        ours_np[MRIImageKeys.FLAIR], ours_t[MRIImageKeys.FLAIR]
    ), "ddof=0 vs ddof=1 clip should differ on data with 4σ outliers"


def test_blur3d_parity(ref_ipmsa):
    R, O = ref_ipmsa.LORISTransforms, LORISTransforms
    base = _volumes(seed=3, t_newt2=3)
    ours = O.BlurLabel3D(sigma=1, kernel_size=5)(copy.deepcopy(base))
    torch_in = {
        k: torch.from_numpy(v) if isinstance(v, np.ndarray) else v
        for k, v in copy.deepcopy(base).items()
    }
    theirs = R.BlurLabel3D(sigma=1, kernel_size=5)(torch_in)
    for k in (MRIImageKeys.NEWT2, MRIImageKeys.CT2F):
        np.testing.assert_allclose(
            np.asarray(ours[k]), theirs[k].numpy(), atol=1e-4, err_msg=k
        )


def test_blur2d_parity(ref_ipmsa):
    """BlurLabel2D: [t, D=depth, H, W] labels through the 5×5 binomial ×
    z-gaussian kernel (−1 spatial padding), vs the reference's F.conv2d."""
    depth = 3
    rng = np.random.default_rng(5)
    labels = {
        k: (rng.random((2, depth, 8, 8)) > 0.8).astype(np.float32)
        for k in (MRIImageKeys.NEWT2, MRIImageKeys.CT2F)
    }
    ours = LORISTransforms.BlurLabel2D(depth=depth)(copy.deepcopy(labels))
    torch_in = {k: torch.from_numpy(v) for k, v in labels.items()}
    theirs = ref_ipmsa.LORISTransforms.BlurLabel2D(depth=depth)(torch_in)
    for k in labels:
        np.testing.assert_allclose(
            np.asarray(ours[k]), theirs[k].numpy(), atol=1e-5, err_msg=k
        )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_full_default_pipeline_parity(ref_ipmsa, seed):
    """make_default_transform vs the reference experiments' inline pipeline
    (`experiments/ipmsa/train.py:119-165`): composed transforms, the packed
    W000 FLAIR‖CT2F slab, and the any-future-activity prompt."""
    R = ref_ipmsa.LORISTransforms
    slices = 3
    item = {"output": _volumes(seed=seed, t_newt2=2)}

    ours = make_default_transform(slices)(copy.deepcopy(item))

    x = copy.deepcopy(item)["output"]
    for t in (
        R.PadTimepoints(),
        R.GetSlice(slices=slices),
        R.Denoise(),
        R.BinarizeLabel(),
        R.Resize(),
        R.ToTensor(),
        R.BlurLabel3D(sigma=1, kernel_size=5),
        R.NormalizeTensor(),
    ):
        x = t(x)
    flair_w000 = x[MRIImageKeys.FLAIR][0]
    ct2f_w000 = x[MRIImageKeys.CT2F][0]
    ref_images = torch.cat([flair_w000, ct2f_w000], dim=0).to(torch.float32)
    newt2 = (
        (x[MRIImageKeys.NEWT2][1] / 2 + 0.5)
        + (x[MRIImageKeys.NEWT2][2] / 2 + 0.5)
    ).clamp(0, 1)
    ref_prompt = int(torch.sum(newt2) > 0)

    # ours is channel-last [H, W, 2*slices]; reference is [2*slices, H, W]
    np.testing.assert_allclose(
        ours["images"],
        ref_images.numpy().transpose(1, 2, 0),
        atol=1e-5,
    )
    assert int(ours["prompt"]) == ref_prompt


def test_metrics_parity(ref_metrics):
    """Accuracy/Precision/Recall/F1 counters vs the executed reference
    implementations (`utils/metrics.py`), streamed over several batches."""
    rng = np.random.default_rng(11)
    # binary labels: the reference's P/R/F1 treat class 1 as positive
    pairs = [
        (
            rng.integers(0, 2, 37),
            rng.integers(0, 2, 37),
        )
        for _ in range(3)
    ]

    ref_objs = [
        ref_metrics.Accuracy("acc"),
        ref_metrics.Precision("prec"),
        ref_metrics.Recall("rec"),
        ref_metrics.F1("f1"),
    ]
    our_objs = [Accuracy("acc"), Precision("prec"), Recall("rec"), F1("f1")]
    for y_pred, y_true in pairs:
        ref_batch = (
            torch.from_numpy(y_pred),
            {"prompt": torch.from_numpy(y_true)},
        )
        our_batch = (y_pred, {"prompt": y_true})
        for m in ref_objs:
            m.update(ref_batch)
        for m in our_objs:
            m.update(our_batch)

    for ref_m, our_m in zip(ref_objs, our_objs):
        ref_val = float(next(iter(ref_m.compute().values())))
        our_val = float(next(iter(our_m.compute().values())))
        np.testing.assert_allclose(
            our_val, ref_val, rtol=1e-6, err_msg=ref_m.name
        )
