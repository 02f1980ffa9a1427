"""Sample-visualization plotters shared by the experiments.

Parity targets: `cifar_plotter` (reference `experiments/cifar10/train.py:40-68`),
`chexpert_plotter` with on-device IDWT reassembly
(`experiments/chexpert-unet/train.py:40-95`, pywt loop replaced by
`ops/wavelet.haar_idwt2`), and `ipmsa_plotter` FLAIR + lesion-overlay
rendering (`experiments/ipmsa/train.py:42-110`). All consume NHWC [-1, 1]
samples and return the last written image path.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["cifar_plotter", "make_chexpert_plotter", "make_ipmsa_plotter"]


def _to_unit(img: np.ndarray) -> np.ndarray:
    return np.clip((img + 1.0) / 2.0, 0.0, 1.0)


def cifar_plotter(output_dir, batches, samples, epoch, process_idx):
    """Save the first generated sample as a PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sample = np.asarray(samples[0][0])
    image = _to_unit(sample)
    if image.shape[-1] == 1:
        image = np.repeat(image, 3, axis=-1)
    os.makedirs(output_dir, exist_ok=True)
    image_path = os.path.join(output_dir, f"sample_{epoch}_{process_idx}.png")
    plt.imsave(image_path, image)
    return image_path


def make_chexpert_plotter(config):
    """Per-batch dump with IDWT reassembly when wavelet_transform is on."""

    def plotter(output_dir, batches, samples, epoch, process_idx):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        import jax.numpy as jnp

        from ..ops.wavelet import haar_idwt2

        image_path = None
        for batch, sample in zip(batches, samples):
            prompts = np.asarray(batch["prompt"])
            for j in range(1):
                item = np.asarray(sample[j])
                if config.wavelet_transform:
                    item = np.asarray(haar_idwt2(jnp.asarray(item * 2.0)))
                img = _to_unit(item)
                activity = "active" if prompts[j] else "inactive"
                fig, axs = plt.subplots(1, 1, figsize=(5, 5))
                axs.imshow(
                    img if img.shape[-1] != 1 else img[..., 0], cmap="gray"
                )
                axs.axis("off")
                fig.suptitle(f"Patient status: {activity}", fontsize=16)
                plt.tight_layout()
                patient_path = os.path.join(output_dir, activity)
                os.makedirs(patient_path, exist_ok=True)
                image_path = os.path.join(
                    patient_path,
                    f"epoch_{epoch}_sample_{j}_process_{process_idx}.png",
                )
                plt.savefig(image_path, dpi=150)
                plt.close(fig)
        return image_path

    return plotter


def make_ipmsa_plotter(config):
    """FLAIR slab + lesion-overlay rendering (reference ipmsa/train.py:42-110).

    Samples are [B, H, W, C] where channels pack (FLAIR, CT2F) slabs —
    channel 0 is rendered as the anatomical image and the last channel as a
    red lesion-probability overlay. With wavelet_transform the sample is
    IDWT'd first.
    """

    def plotter(output_dir, batches, samples, epoch, process_idx):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        import jax.numpy as jnp

        from ..ops.wavelet import haar_idwt2

        image_path = None
        for batch, sample in zip(batches, samples):
            prompts = np.asarray(batch["prompt"])
            for j in range(1):
                item = np.asarray(sample[j])
                if config.wavelet_transform:
                    item = np.asarray(haar_idwt2(jnp.asarray(item * 2.0)))
                flair = _to_unit(item[..., 0])
                lesion = _to_unit(item[..., -1])
                activity = "active" if prompts[j] else "inactive"
                fig, axs = plt.subplots(1, 2, figsize=(10, 5))
                axs[0].imshow(flair, cmap="gray")
                axs[0].set_title("FLAIR (predicted)")
                axs[1].imshow(flair, cmap="gray")
                axs[1].imshow(lesion, cmap="Reds", alpha=0.5)
                axs[1].set_title("Lesion overlay")
                for ax in axs:
                    ax.axis("off")
                fig.suptitle(f"Patient status: {activity}", fontsize=16)
                plt.tight_layout()
                patient_path = os.path.join(output_dir, activity)
                os.makedirs(patient_path, exist_ok=True)
                image_path = os.path.join(
                    patient_path,
                    f"epoch_{epoch}_sample_{j}_process_{process_idx}.png",
                )
                plt.savefig(image_path, dpi=150)
                plt.close(fig)
        return image_path

    return plotter
