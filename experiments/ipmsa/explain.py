"""Counterfactual explanation for IPMSA (reference
`/root/reference/experiments/ipmsa/explain.py` parity).

For each forced label (active / inactive): load the test set with every
prompt overridden to that label, re-noise real images only to t=0.5, sample
back under the forced condition, and plot actual-vs-predicted — the
"what would this brain look like if (in)active" flow (`explain.py:173,239-252`).
"""

from common import build_data, build_engine, make_ipmsa_plotter

from diffusion_classifier_tpu.utils.config import ExperimentConfig


def main(active_label: bool):
    config = ExperimentConfig.from_env("INFERENCE_CONFIG")
    data = build_data(config, cf_label=int(active_label))
    engine = build_engine(config)
    engine.inference(
        val_dataloader=data.get_test_loader(),
        metrics=None,
        plot_function=make_ipmsa_plotter(config),
        classification=False,
        from_t=0.5,
        checkpoint_folder=config.checkpoint_folder,
    )


if __name__ == "__main__":
    for active_label in [True, False]:
        main(active_label=active_label)
