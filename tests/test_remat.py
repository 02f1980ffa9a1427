"""Per-block activation rematerialization (`remat` config knob).

The TPU-native memory lever the reference has no equivalent for (torch's
analogue would be `torch.utils.checkpoint`, unused in
`/root/reference`): `jax.checkpoint` over denoiser blocks trades ~one
extra forward of FLOPs for peak activation memory. Semantics must be
EXACT — same param tree, same outputs, same gradients — with the remat
boundary visible in the jaxpr.
"""

import jax
import jax.numpy as jnp
import pytest

from diffusion_classifier_tpu.models import UNetCondition2D, UNetConfig
from diffusion_classifier_tpu.models.dit import DiT, DiTConfig


def _unet(remat: bool) -> UNetCondition2D:
    return UNetCondition2D(
        UNetConfig(
            sample_size=16,
            in_channels=3,
            out_channels=3,
            layers_per_block=1,
            block_out_channels=(8, 16),
            down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
            up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
            mid_block_type="UNetMidBlock2DCrossAttn",
            attention_head_dim=2,
            cross_attention_dim=8,
            norm_num_groups=4,
            remat=remat,
        ),
        dtype=jnp.float32,
    )


def _dit(remat: bool) -> DiT:
    return DiT(
        DiTConfig(
            num_attention_heads=2,
            attention_head_dim=8,
            in_channels=3,
            num_layers=2,
            sample_size=16,
            patch_size=4,
            num_classes=3,
            remat=remat,
        ),
        dtype=jnp.float32,
    )


@pytest.mark.parametrize("family", ["unet", "dit"])
def test_remat_is_semantically_exact(family):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 16, 3))
    t = jnp.zeros((2,))
    if family == "unet":
        plain, cpd = _unet(False), _unet(True)
        ctx = jax.random.normal(jax.random.fold_in(rng, 1), (2, 1, 8))
        args = (x, t, ctx)
    else:
        plain, cpd = _dit(False), _dit(True)
        args = (x, t, jnp.zeros((2,), jnp.int32))

    params = plain.init(rng, *args)
    # identical parameter tree: the knob changes the compiled program only
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        cpd.init(rng, *args)
    )

    out_plain = plain.apply(params, *args)
    out_remat = cpd.apply(params, *args)
    assert float(jnp.abs(out_plain - out_remat).max()) == 0.0

    def loss(net):
        return lambda p: jnp.sum(net.apply(p, *args) ** 2)

    g_plain = jax.grad(loss(plain))(params)
    g_remat = jax.grad(loss(cpd))(params)
    err = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat))
    )
    scale = max(
        float(jnp.abs(a).max()) for a in jax.tree.leaves(g_plain)
    )
    # same math; XLA may pick different conv algorithms / fusion orders for
    # the rematerialized program, so allow f32 round-off, not bit equality
    assert err <= 1e-4 * max(scale, 1.0)

    # the remat boundary must actually be in the traced program
    jaxpr = str(jax.make_jaxpr(loss(cpd))(params))
    assert "remat" in jaxpr or "checkpoint" in jaxpr
    assert "remat" not in str(jax.make_jaxpr(loss(plain))(params))


def test_remat_plumbs_from_experiment_config():
    from diffusion_classifier_tpu.models.presets import chexpert_256_dit_b4
    from diffusion_classifier_tpu.utils.config import ExperimentConfig

    assert chexpert_256_dit_b4(ExperimentConfig(remat=True)).remat is True
    assert chexpert_256_dit_b4(ExperimentConfig()).remat is False


def test_remat_train_step_on_mesh_matches_unremat():
    """remat × GSPMD: the checkpointed backward must compose with dp×tp
    sharding (the combination large-model training actually uses) and give
    the same loss as the plain program on the same placed params."""
    import numpy as np

    from diffusion_classifier_tpu.diffusion.schedule import make_schedule_fn
    from diffusion_classifier_tpu.engine.denoiser import Denoiser
    from diffusion_classifier_tpu.engine.state import (
        EmaConfig, init_train_state, make_optimizer,
    )
    from diffusion_classifier_tpu.engine.steps import make_loss_fn, make_train_step
    from diffusion_classifier_tpu.models.encoders import ClassEmbedder
    from diffusion_classifier_tpu.parallel.mesh import make_mesh, shard_batch
    from diffusion_classifier_tpu.parallel.sharding import shard_params

    def build(remat):
        cfg = UNetConfig(
            sample_size=8, in_channels=3, out_channels=3,
            block_out_channels=(16, 32),
            down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
            up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
            layers_per_block=1, attention_head_dim=2, cross_attention_dim=16,
            encoder_hid_dim=16, encoder_hid_dim_type="text_proj",
            norm_num_groups=8, remat=remat,
        )
        return Denoiser(backbone=UNetCondition2D(cfg), encoder=ClassEmbedder(4, 16))

    rng = jax.random.PRNGKey(0)
    x = np.random.default_rng(0).standard_normal((8, 8, 8, 3)).astype(np.float32)
    lab = np.zeros((8,), np.int32)
    plain = build(False)
    params = plain.init(rng, jnp.asarray(x), jnp.zeros((8,)), jnp.asarray(lab))
    schedule_fn = make_schedule_fn("shifted_cosine", 8, 8)
    tx = make_optimizer(1e-4, 2, 10)

    losses = {}
    for remat in (False, True):
        net = build(remat)
        loss_fn = make_loss_fn(
            lambda p, z, lg, l: net.apply(p, z, lg, l),
            schedule_fn, pred_param="v", null_token=4,
        )
        mesh = make_mesh(data=4, model=2)
        placed = shard_params(mesh, params, "fsdp", fsdp_min_size=1)
        state = init_train_state(placed, tx)
        step = make_train_step(loss_fn, tx, EmaConfig(), donate=False)
        with mesh:
            dev = shard_batch(mesh, {"images": x, "prompt": lab})
            _, loss = step(
                state, dev["images"], dev["prompt"], jax.random.PRNGKey(1)
            )
            losses[remat] = float(jax.block_until_ready(loss))
    assert np.isfinite(losses[True])
    assert abs(losses[True] - losses[False]) <= 1e-5 * max(
        1.0, abs(losses[False])
    )
