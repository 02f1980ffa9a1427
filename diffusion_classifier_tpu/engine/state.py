"""Train state pytree, EMA with ema_pytorch-parity stepping, optimizer factory.

EMA semantics reproduce ``ema_pytorch.EMA(model, beta, update_after_step,
update_every)`` as used by the reference (`diffusion/diffusion_classifier.py:51-56`,
updated once per optimizer step at `:453`):

- an internal call counter increments on every ``update()``;
- only calls with ``counter % update_every == 0`` do anything;
- until ``counter > update_after_step`` the EMA is a straight copy;
- afterwards the decay RAMPS toward ``beta`` following ema_pytorch's default
  Karras-style warmup ``d(c) = min(beta, 1 - (1 + e)^(-2/3))`` with
  ``e = c - update_after_step - 1`` (inv_gamma=1, power=2/3, min_value=0).

Everything is in-graph (`jnp.where` on scalars) so the whole update lives
inside the jitted train step.

Optimizer: Adam + HF ``get_cosine_schedule_with_warmup`` parity
(`experiments/cifar10/train.py:108-113`), with global-norm grad clipping at
1.0 applied before the update (reference `:444-447`).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

__all__ = [
    "EmaConfig",
    "TrainState",
    "ema_decay",
    "ema_update",
    "cosine_warmup_schedule",
    "lr_at",
    "compress_opt_state",
    "make_optimizer",
]

PyTree = Any


@flax.struct.dataclass
class EmaConfig:
    beta: float = flax.struct.field(pytree_node=False, default=0.9999)
    update_after_step: int = flax.struct.field(pytree_node=False, default=100)
    update_every: int = flax.struct.field(pytree_node=False, default=10)
    inv_gamma: float = flax.struct.field(pytree_node=False, default=1.0)
    power: float = flax.struct.field(pytree_node=False, default=2.0 / 3.0)


@flax.struct.dataclass
class TrainState:
    step: jax.Array  # optimizer steps taken
    params: PyTree
    ema_params: PyTree
    opt_state: PyTree
    ema_counter: jax.Array  # number of ema_update() calls


def ema_decay(counter: jax.Array, cfg: EmaConfig) -> jax.Array:
    """Current decay for 0-based pre-increment call number ``counter``.

    ema_pytorch's ``update()`` increments ``self.step`` BEFORE
    ``update_moving_average`` runs, so its ``get_current_decay`` sees the
    post-increment step: ``epoch = (counter + 1) - update_after_step - 1 =
    counter - update_after_step`` (round-3 review fix — the earlier ``-1``
    form lagged ema_pytorch's ramp by one call).
    """
    epoch = jnp.clip(
        counter.astype(jnp.float32) - cfg.update_after_step, min=0.0
    )
    value = 1.0 - (1.0 + epoch / cfg.inv_gamma) ** (-cfg.power)
    return jnp.where(epoch <= 0.0, 0.0, jnp.clip(value, 0.0, cfg.beta))


def ema_update(
    ema_params: PyTree, params: PyTree, counter: jax.Array, cfg: EmaConfig
) -> PyTree:
    """One ``EMA.update()`` call; ``counter`` is the pre-increment call index."""
    do_update = (counter % cfg.update_every) == 0
    decay = ema_decay(counter, cfg)
    # When skipping, keep ema as-is (decay path with d=1 on old value).
    d = jnp.where(do_update, decay, 1.0)
    return jax.tree.map(
        lambda e, p: (d * e + (1.0 - d) * p).astype(e.dtype), ema_params, params
    )


def cosine_warmup_schedule(
    base_lr: float, warmup_steps: int, total_steps: int
) -> optax.Schedule:
    """HF ``get_cosine_schedule_with_warmup`` (num_cycles=0.5) parity."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(
            1.0, total_steps - warmup_steps
        )
        cos = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * progress)))
        return base_lr * jnp.where(step < warmup_steps, warm, cos)

    return schedule


def lr_at(
    base_lr: float, warmup_steps: int, total_steps: int, step: int
) -> float:
    """Host-side value of :func:`cosine_warmup_schedule` at ``step``.

    Pure-Python mirror for the train loop's step-cadence logging
    (``log_every_steps``): evaluating the jnp schedule on the axon relay
    would cost a ~30 ms device round-trip per log line for a scalar. Kept
    bit-comparable to the jnp schedule by a unit test
    (`tests/test_state.py`).
    """
    import math

    step = float(step)
    if step < warmup_steps:
        return base_lr * step / max(1.0, float(warmup_steps))
    progress = (step - warmup_steps) / max(1.0, float(total_steps - warmup_steps))
    return base_lr * max(0.0, 0.5 * (1.0 + math.cos(math.pi * progress)))


def _cast_float_leaves(tree: PyTree, dtype) -> PyTree:
    """Cast floating leaves of an optimizer-state pytree; ints (Adam's
    ``count``) pass through."""
    return jax.tree.map(
        lambda x: (
            x.astype(dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x
        ),
        tree,
    )


def compress_opt_state(
    tx: optax.GradientTransformation, dtype
) -> optax.GradientTransformation:
    """Store the optimizer state in ``dtype``; compute every update in fp32.

    The whole-train-step roofline measured both train configs at ~49% MFU
    with the fwd+bwd matmuls compute-bound (classify MFUs 77-81%) — the gap
    is the optimizer/EMA epilogue streaming ~6 fp32 copies of every
    parameter at O(1) FLOPs/byte (BASELINE.md round-5 rooflines). Adam's
    mu/nu are 2 of those copies, read+written each step; storing them in
    bf16 halves that traffic. The moment math still runs in fp32: state is
    up-cast before the inner ``update`` and the fresh state down-cast after,
    so only the storage precision changes (~8 mantissa bits on mu/nu, a
    standard large-scale-training trade; master params, grads and EMA stay
    fp32). No reference analog (torch.optim.Adam is fp32-only,
    `/root/reference/experiments/cifar10/train.py:106-113`) — a TPU-first
    production option, default off.
    """

    def init(params):
        return _cast_float_leaves(tx.init(params), dtype)

    def update(updates, state, params=None, **extra):
        state32 = _cast_float_leaves(state, jnp.float32)
        out, new_state = tx.update(updates, state32, params, **extra)
        return out, _cast_float_leaves(new_state, dtype)

    return optax.GradientTransformation(init, update)


def make_optimizer(
    learning_rate: float,
    warmup_steps: int,
    total_steps: int,
    *,
    max_grad_norm: float = 1.0,
    state_dtype: str | None = None,
) -> optax.GradientTransformation:
    """Reference optimizer (clip-by-global-norm 1.0 + Adam with HF cosine
    warmup schedule). ``state_dtype='bf16'`` stores the Adam moments in
    bfloat16 (:func:`compress_opt_state`); None/'fp32' keeps exact parity.
    """
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adam(
            cosine_warmup_schedule(learning_rate, warmup_steps, total_steps)
        ),
    )
    if state_dtype in ("bf16", "bfloat16"):
        tx = compress_opt_state(tx, jnp.bfloat16)
    elif state_dtype not in (None, "fp32", "float32", "no"):
        raise ValueError(
            f"optimizer_state_dtype must be 'fp32' or 'bf16', got {state_dtype!r}"
        )
    return tx


def init_train_state(params: PyTree, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        ema_params=jax.tree.map(jnp.copy, params),
        opt_state=tx.init(params),
        ema_counter=jnp.zeros((), jnp.int32),
    )
