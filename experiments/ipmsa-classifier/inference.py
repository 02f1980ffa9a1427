"""Discriminative baseline inference on the IPMSA test set.

The reference's `experiments/ipmsa-classifier/inference.py` is an empty
0-byte file (SURVEY §2.1); this is the working equivalent: load the latest
checkpoint, evaluate CE loss + classification metrics on the test split.
"""

from common import build_data, build_engine

from diffusion_classifier_tpu.utils.config import ExperimentConfig
from diffusion_classifier_tpu.utils.metrics import F1, Accuracy, Precision, Recall


def main():
    config = ExperimentConfig.from_env("INFERENCE_CONFIG")
    data = build_data(config)
    engine = build_engine(config)
    val_loss, metric_output = engine.inference(
        val_dataloader=data.get_test_loader(),
        metrics=[Accuracy("accuracy"), F1("f1"), Precision("precision"), Recall("recall")],
    )
    print(f"val_loss: {val_loss:.4f}")
    print([{k: round(v, 4) for k, v in d.items()} for d in metric_output])


if __name__ == "__main__":
    main()
