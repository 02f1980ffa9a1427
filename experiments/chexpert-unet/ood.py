"""Out-of-distribution evaluation of a CheXpert-trained model (reference
`/root/reference/experiments/chexpert-unet/ood.py` parity, extended to the
full OOD loader menu).

Default dataset is MIMIC at 64px — the resolution mismatch vs 256px training
is the reference's intentional OOD stress (SURVEY §4). ``--dataset
{mimic,padchest,isic}`` (or the ``ood_dataset`` config key) selects the
other reference OOD pipelines (`/root/reference/dataset/padchest.py:97`,
`/root/reference/dataset/isic.py:79`), making BASELINE.json's multi-dataset
sweep runnable end-to-end: loop the flag over all three."""

import argparse

from common import REPO_ROOT, build_engine  # noqa: F401 (path setup)

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
