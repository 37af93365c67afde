#!/usr/bin/env python
"""Build the VAE-latent dataset (reference download_data.py parity).

Streams HF imagenet-1k-128x128, random-horizontal-flips + normalizes to
[-1, 1], encodes through the SD-VAE (JAX port, local weights via
--vae-path), and stores the **posterior distribution** (means, stds), labels,
and channel-wise mixture-of-Gaussians stats:
``var = E[sigma^2] + E[(mu - mu_bar)^2]`` (reference download_data.py:55-58).

Artifacts are memmap-friendly .npy/.npz (the trainer also reads the
reference's .pt artifacts directly — `mapdit_tpu.training.data`).

Requires network access for the HF dataset and local SD-VAE weights; both
are gated with clear errors in offline environments.
"""

import argparse

import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from mapdit_tpu.models.vae import load_encoder
from mapdit_tpu.training.data import save_dataset
from mapdit_tpu.utils import create_logger


def main(args):
    logger = create_logger()

    encoder = load_encoder(args.vae_path)
    if encoder is None:
        raise SystemExit(
            "SD-VAE weights not found. Pass --vae-path pointing at a local "
            "diffusers AutoencoderKL checkpoint (diffusion_pytorch_model"
            ".safetensors of stabilityai/sd-vae-ft-mse)."
        )

    logger.info("loading data...")
    try:
        from datasets import load_dataset

        if args.dataset.startswith("imagefolder:"):
            # offline path: a local class-per-subdirectory image tree
            # (lets the full encode->stats->save pipeline run without egress)
            ds = load_dataset(
                "imagefolder", data_dir=args.dataset.split(":", 1)[1], split="train"
            )
        else:
            ds = load_dataset(args.dataset)["train"]
    except Exception as e:
        raise SystemExit(
            f"could not load HF dataset {args.dataset!r} ({e}); this step "
            "needs network access or a pre-populated HF cache (offline: "
            "--dataset imagefolder:<dir> with class subdirectories)"
        )

    total = len(ds)
    rng = np.random.default_rng(args.seed)
    means = np.zeros((total, 4, args.image_size // 8, args.image_size // 8), np.float32)
    stds = np.zeros_like(means)
    labels = np.zeros((total,), np.int64)

    for idx in tqdm(range(0, total, args.batch_size), desc="encoding images"):
        tail = min(idx + args.batch_size, total)
        rows = ds[idx:tail]
        imgs = np.stack(
            [np.asarray(img.convert("RGB"), np.float32) for img in rows["image"]]
        )
        # RandomHorizontalFlip + ToTensor + Normalize(0.5, 0.5) equivalent
        flip = rng.random(len(imgs)) < 0.5
        imgs[flip] = imgs[flip][:, :, ::-1]
        imgs = imgs / 127.5 - 1.0
        imgs = imgs.transpose(0, 3, 1, 2)  # NHWC -> NCHW

        mean, std = encoder(jnp.asarray(imgs))
        means[idx:tail] = np.asarray(mean)
        stds[idx:tail] = np.asarray(std)
        labels[idx:tail] = np.asarray(rows["label"])

    logger.info("computing mean and std of MoG...")
    mu_bar = means.mean(axis=(0, 2, 3))
    var = (stds**2).mean(axis=(0, 2, 3)) + (
        (means - mu_bar[None, :, None, None]) ** 2
    ).mean(axis=(0, 2, 3))

    logger.info(f"saving data to {args.output_dir}...")
    save_dataset(
        args.output_dir, means, stds, labels, {"mean": mu_bar, "std": np.sqrt(var)}
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--output-dir", type=str, required=True)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--vae-path", type=str, required=True,
                        help="local SD-VAE (diffusers AutoencoderKL) weights")
    parser.add_argument("--dataset", type=str, default="benjamin-paine/imagenet-1k-128x128",
                        help="HF dataset name, or 'imagefolder:<dir>' for a "
                             "local class-per-subdirectory image tree (offline)")
    parser.add_argument("--image-size", type=int, default=128)
    parser.add_argument("--seed", type=int, default=0)
    main(parser.parse_args())
