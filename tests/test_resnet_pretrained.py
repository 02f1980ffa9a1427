"""Local pretrained ResNet weights (`models/resnet.py::load_pretrained_resnet`).

The reference loads torchvision ImageNet bundles (`/root/reference/nets/
resnet.py:31-47`) and, for ``in_channels != 3``, replaces conv1 with a fresh
layer (`:52-63`). Offline equivalent under test: a torchvision-``state_dict``
-named ``.npz`` loads into the Flax tree with OIHW→HWIO conversion, shape
checks, fc stripping, and the same conv1 adaptation.
"""

import jax
import numpy as np
import pytest

from diffusion_classifier_tpu.models.resnet import (
    ResNet2D,
    load_pretrained_resnet,
)


def _torch_resnet18_arrays(rng, in_ch=3):
    """Synthetic arrays under torchvision resnet18 state_dict naming."""
    arrs = {}

    def bn(prefix, c):
        arrs[f"{prefix}.weight"] = rng.standard_normal(c).astype(np.float32)
        arrs[f"{prefix}.bias"] = rng.standard_normal(c).astype(np.float32)
        arrs[f"{prefix}.running_mean"] = rng.standard_normal(c).astype(
            np.float32
        )
        arrs[f"{prefix}.running_var"] = rng.uniform(0.5, 2, c).astype(
            np.float32
        )
        arrs[f"{prefix}.num_batches_tracked"] = np.asarray(7, np.int64)

    arrs["conv1.weight"] = rng.standard_normal((64, in_ch, 7, 7)).astype(
        np.float32
    )
    bn("bn1", 64)
    prev = 64
    for s, blocks in enumerate((2, 2, 2, 2), start=1):
        c = 64 * 2 ** (s - 1)
        for i in range(blocks):
            p = f"layer{s}.{i}"
            cin = prev if i == 0 else c
            arrs[f"{p}.conv1.weight"] = rng.standard_normal(
                (c, cin, 3, 3)
            ).astype(np.float32)
            bn(f"{p}.bn1", c)
            arrs[f"{p}.conv2.weight"] = rng.standard_normal(
                (c, c, 3, 3)
            ).astype(np.float32)
            bn(f"{p}.bn2", c)
            if i == 0 and (s > 1):
                arrs[f"{p}.downsample.0.weight"] = rng.standard_normal(
                    (c, prev, 1, 1)
                ).astype(np.float32)
                bn(f"{p}.downsample.1", c)
        prev = c
    arrs["fc.weight"] = rng.standard_normal((1000, 512)).astype(np.float32)
    arrs["fc.bias"] = rng.standard_normal(1000).astype(np.float32)
    return arrs


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    path = tmp_path_factory.mktemp("w") / "resnet18.npz"
    arrs = _torch_resnet18_arrays(np.random.default_rng(0))
    np.savez(path, **arrs)
    return str(path), arrs


def _init_vars(in_ch=3):
    model = ResNet2D(variant="resnet18", in_channels=in_ch)
    x = np.zeros((1, 32, 32, in_ch), np.float32)
    return model, model.init(jax.random.PRNGKey(0), x, train=False)


def test_roundtrip_loads_every_leaf(bundle):
    path, arrs = bundle
    _, variables = _init_vars()
    new = load_pretrained_resnet(variables, path)

    # stem conv transposed OIHW→HWIO
    np.testing.assert_array_equal(
        new["params"]["conv1"]["kernel"],
        arrs["conv1.weight"].transpose(2, 3, 1, 0),
    )
    # a block conv + its bn stats
    np.testing.assert_array_equal(
        new["params"]["layer2_0"]["conv1"]["kernel"],
        arrs["layer2.0.conv1.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_array_equal(
        new["batch_stats"]["layer3_0"]["bn2"]["mean"],
        arrs["layer3.0.bn2.running_mean"],
    )
    # downsample Sequential: 0 → conv, 1 → bn_down
    np.testing.assert_array_equal(
        new["params"]["layer4_0"]["downsample"]["kernel"],
        arrs["layer4.0.downsample.0.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_array_equal(
        new["params"]["layer4_0"]["bn_down"]["scale"],
        arrs["layer4.0.downsample.1.weight"],
    )
    # tree structure unchanged (jit-compatible with the fresh init)
    assert jax.tree_util.tree_structure(new) == jax.tree_util.tree_structure(
        jax.device_get(variables)
    )


def test_forward_runs_with_loaded_weights(bundle):
    path, _ = bundle
    model, variables = _init_vars()
    new = load_pretrained_resnet(variables, path)
    x = np.random.default_rng(1).standard_normal((2, 32, 32, 3)).astype(
        np.float32
    )
    feats = model.apply(new, x, train=False)
    assert feats.shape == (2, 512)
    assert np.isfinite(np.asarray(feats)).all()
    # and the outputs differ from the random init (weights actually applied)
    base = model.apply(variables, x, train=False)
    assert not np.allclose(np.asarray(feats), np.asarray(base))


def test_conv1_adaptation_keeps_fresh_stem(bundle):
    """in_channels != 3 → conv1 stays at its random init (reference `:52-63`)."""
    path, arrs = bundle
    _, variables = _init_vars(in_ch=2)
    new = load_pretrained_resnet(variables, path, in_channels=2)
    np.testing.assert_array_equal(
        new["params"]["conv1"]["kernel"],
        jax.device_get(variables["params"]["conv1"]["kernel"]),
    )
    # ...but everything else still loaded
    np.testing.assert_array_equal(
        new["params"]["layer1_1"]["conv2"]["kernel"],
        arrs["layer1.1.conv2.weight"].transpose(2, 3, 1, 0),
    )


def test_shape_mismatch_raises(tmp_path, bundle):
    _, arrs = bundle
    bad = dict(arrs)
    bad["layer1.0.conv1.weight"] = bad["layer1.0.conv1.weight"][:32]
    path = tmp_path / "bad.npz"
    np.savez(path, **bad)
    _, variables = _init_vars()
    with pytest.raises(ValueError, match="shape"):
        load_pretrained_resnet(variables, str(path))


def test_missing_keys_raise(tmp_path, bundle):
    _, arrs = bundle
    partial = {k: v for k, v in arrs.items() if not k.startswith("layer4")}
    path = tmp_path / "partial.npz"
    np.savez(path, **partial)
    _, variables = _init_vars()
    with pytest.raises(ValueError, match="missing"):
        load_pretrained_resnet(variables, str(path))


def test_wrong_variant_raises(bundle):
    """A resnet18 bundle into a resnet34 tree fails loudly, not part-loads."""
    path, _ = bundle
    model = ResNet2D(variant="resnet34")
    x = np.zeros((1, 32, 32, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    with pytest.raises((KeyError, ValueError)):
        load_pretrained_resnet(variables, path)


def test_classifier_engine_pretrained_path(tmp_path, bundle):
    """Engine wiring: config.pretrained_path loads before sharding."""
    path, arrs = bundle
    from diffusion_classifier_tpu.engine.classifier import Classifier
    from diffusion_classifier_tpu.utils.config import ExperimentConfig

    cfg = ExperimentConfig(
        classes=5,
        image_size=32,
        variant="resnet18",
        pretrained=True,
        pretrained_path=path,
        project_root=str(tmp_path),
        experiment_dir="run",
    )
    eng = Classifier(ResNet2D(variant="resnet18", pretrained_path=path), cfg)
    batch = {
        "images": np.zeros((4, 32, 32, 3), np.float32),
        "prompt": np.zeros((4,), np.int32),
    }
    eng.init_params(batch)
    got = np.asarray(eng.variables["params"]["backbone"]["conv1"]["kernel"])
    np.testing.assert_array_equal(
        got, arrs["conv1.weight"].transpose(2, 3, 1, 0)
    )
    preds = eng._predict(eng.variables, batch["images"])
    assert preds.shape == (4,)
