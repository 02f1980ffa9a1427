"""CIFAR-10 classification inference + per-class sample dumps (reference
`/root/reference/experiments/cifar10/inference.py` parity).

Driven by the ``INFERENCE_CONFIG`` env-var JSON. With
``classification=true`` reports accuracy over the test set; otherwise dumps
generated samples via the plotter.
"""

from common import build_data, build_engine, cifar_plotter

from diffusion_classifier_tpu.utils.config import ExperimentConfig
from diffusion_classifier_tpu.utils.metrics import Accuracy


def main():
    config = ExperimentConfig.from_env("INFERENCE_CONFIG")
    data = build_data(config)
    engine = build_engine(config)
    result = engine.inference(
        val_dataloader=data.get_test_loader(),
        metrics=[Accuracy("classification accuracy")]
        if config.classification
        else None,
        plot_function=cifar_plotter,
        classification=config.classification,
        checkpoint_folder=config.checkpoint_folder,
    )
    if config.classification:
        metric_output, _, _ = result
        print(metric_output)


if __name__ == "__main__":
    main()
