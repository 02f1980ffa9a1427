"""OOD evaluation of the CheXpert DiT model (reference
`/root/reference/experiments/chexpert-dit/ood.py` parity, extended to the
full OOD loader menu).

``--dataset {mimic,padchest,isic}`` (or the ``ood_dataset`` config key)
selects among the reference OOD pipelines; MIMIC at 64px is the default
(the reference's intentional resolution-mismatch stress, SURVEY §4)."""

import argparse

from common import build_engine

from diffusion_classifier_tpu.data.ood import OOD_DATASETS, make_ood_loader
from diffusion_classifier_tpu.utils.config import ExperimentConfig
from diffusion_classifier_tpu.utils.metrics import F1, Accuracy, Precision, Recall


def main(argv=None):
    config = ExperimentConfig.from_env("INFERENCE_CONFIG")
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--dataset",
        choices=OOD_DATASETS,
        default=config.ood_dataset,
        help="OOD dataset to evaluate on (default: ood_dataset config key)",
    )
    args = parser.parse_args(argv)
    loader = make_ood_loader(args.dataset, config)
    engine = build_engine(config)
    metric_output, _, _ = engine.inference(
        val_dataloader=loader,
        metrics=[Accuracy("accuracy"), F1("f1"), Precision("precision"), Recall("recall")],
        plot_function=None,
        classification=config.classification,
        checkpoint_folder=config.checkpoint_folder,
    )
    print(args.dataset, [{k: round(v, 4) for k, v in d.items()} for d in metric_output])


if __name__ == "__main__":
    main()
