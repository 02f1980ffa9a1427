"""Shared program for the REAL 2-process distributed test.

`run()` builds a tiny conditional-UNet train step + the fused classification
tournament over the global ``('data',)`` mesh, feeding per-process loader
slices, and returns host-comparable results. `tests/test_multiprocess.py`
executes it twice:

- in-process (single process, 8 local CPU devices) for the ground truth;
- in TWO real subprocesses joined via ``jax.distributed.initialize`` (4 local
  CPU devices each, 8 global), the closest this environment gets to the
  reference's actually-executed multi-rank DDP
  (`/root/reference/diffusion/diffusion_classifier.py:375-386`).

Both paths must produce the same loss, the same global predictions, and the
same synced metric counters — proving the genuine multi-process branches
(`parallel.mesh.shard_batch`'s ``make_array_from_process_local_data``,
``local_rows``' shard assembly, ``Metric.sync_across_processes``'
``process_allgather``) compute exactly the single-process answer.

When invoked as a script (the subprocess entry), argv is
``<out_json_path>``; cluster shape comes from ``JAX_COORDINATOR_ADDRESS`` /
``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` via
`parallel.mesh.init_distributed`.
"""

import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, B, CLASSES = 32, 16, 10
SIZE = 8


def run():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship
    from diffusion_classifier_tpu.data.loader import ArrayDataLoader
    from diffusion_classifier_tpu.diffusion.classify import make_classifier
    from diffusion_classifier_tpu.diffusion.schedule import make_schedule_fn
    from diffusion_classifier_tpu.engine.state import (
        EmaConfig,
        init_train_state,
        make_optimizer,
    )
    from diffusion_classifier_tpu.engine.steps import make_loss_fn, make_train_step
    from diffusion_classifier_tpu.parallel.mesh import (
        local_rows,
        make_mesh,
        replicated,
        shard_batch,
    )
    from diffusion_classifier_tpu.utils.metrics import Accuracy

    mesh = make_mesh()  # all global devices on the 'data' axis
    denoiser, size = _flagship(tiny=True)
    assert size == SIZE

    rng_data = np.random.default_rng(0)
    images = rng_data.standard_normal((N, SIZE, SIZE, 3)).astype(np.float32)
    labels = (np.arange(N) % CLASSES).astype(np.int32)
    multi = jax.process_count() > 1
    loader = ArrayDataLoader(
        images,
        labels,
        B,
        seed=7,
        process_index=jax.process_index() if multi else None,
        process_count=jax.process_count() if multi else None,
    )
    batch = next(iter(loader))  # host-local rows (B/process_count each)

    # Params are created INSIDE jit with a replicated out-sharding: every
    # process runs the same deterministic init, so the result is a global
    # replicated array without any host-side broadcast.
    @partial(jax.jit, out_shardings=replicated(mesh))
    def make_params():
        return denoiser.init(
            jax.random.PRNGKey(0),
            jnp.zeros((B, SIZE, SIZE, 3), jnp.float32),
            jnp.zeros((B,), jnp.float32),
            jnp.zeros((B,), jnp.int32),
        )

    apply_fn = lambda p, z, lg, lab: denoiser.apply(p, z, lg, lab)  # noqa: E731
    schedule_fn = make_schedule_fn("shifted_cosine", 8, 8)
    loss_fn = make_loss_fn(
        apply_fn, schedule_fn, pred_param="v", null_token=CLASSES
    )
    tx = make_optimizer(1e-3, 2, 10)
    state = init_train_state(make_params(), tx)
    step = make_train_step(
        loss_fn, tx, EmaConfig(), grad_accum_steps=2, donate=False
    )
    classify = jax.jit(
        make_classifier(
            apply_fn,
            schedule_fn,
            pred_param="v",
            num_classes=CLASSES,
            n_stages=2,
            evaluation_per_stage=(1, 2),
            n_keep_per_stage=(3, 1),
        )
    )

    with mesh:
        dev = shard_batch(mesh, {"images": batch["images"], "prompt": batch["prompt"]})
        state, loss = step(
            state, dev["images"], dev["prompt"], jax.random.PRNGKey(1)
        )
        loss = float(jax.block_until_ready(loss))
        preds = classify(
            state.ema_params, dev["images"], dev["prompt"], jax.random.PRNGKey(2)
        )
        preds = jax.block_until_ready(preds)

    # Eval bookkeeping exactly as the engine does it: pair the model's
    # process-local output rows with the loader's host-local batch rows,
    # then sum counters across processes.
    lp = local_rows(preds)
    assert lp.shape[0] == batch["prompt"].shape[0]
    acc = Accuracy("classification accuracy")
    acc.update((lp, {"prompt": batch["prompt"]}))
    acc.sync_across_processes()

    # A replicated-param fingerprint proves the optimizer step itself agreed.
    fp = float(
        sum(
            np.float64(np.sum(np.abs(np.asarray(x, np.float32))))
            for x in jax.tree.leaves(state.params)
        )
    )
    return {
        "process_index": int(jax.process_index()),
        "process_count": int(jax.process_count()),
        "n_local_devices": jax.local_device_count(),
        "n_global_devices": jax.device_count(),
        "loss": loss,
        "param_fp": fp,
        "local_preds": np.asarray(lp).astype(int).tolist(),
        "local_labels": batch["prompt"].astype(int).tolist(),
        "counters": {k: int(v) for k, v in acc.counters.items()},
        "accuracy": {k: float(v) for k, v in acc.compute().items()},
    }


def main():
    out_path = sys.argv[1]
    # The axon sitecustomize may have preloaded jax pinned to another
    # platform; the CPU backend initializes lazily, so switching the default
    # platform here still works (same dance as tests/conftest.py).
    import jax

    jax.config.update("jax_platform_name", "cpu")

    from diffusion_classifier_tpu.parallel.mesh import init_distributed

    init_distributed()
    assert jax.process_count() == 2, jax.process_count()
    result = run()
    with open(out_path, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
