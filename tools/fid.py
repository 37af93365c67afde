"""Sample-quality metrics (FID / KID / precision-recall) for sample_fid.py
outputs.

The reference emits ADM-evaluator-format npz (`sample_fid.py:86-97`) and
relies on the external OpenAI evaluator. This tool closes the loop in-repo:

  python tools/fid.py --samples A.npz --ref-stats ref_stats.npz
  python tools/fid.py --samples A.npz --ref-samples B.npz --metric all
  python tools/fid.py --make-stats A.npz --out stats.npz

`--metric kid` (unbiased in N, arXiv 1801.01401) and `--metric pr`
(improved precision/recall, arXiv 1904.06991 — fidelity vs diversity,
the axes guidance knobs trade) are sized for the small-N single-chip
protocol where FID's covariance estimate is badly biased.

Feature extraction (`--features`):
  * ``inception``   — torchvision InceptionV3 pool features (2048-d);
                      needs the weights in the local torch hub cache
                      (zero-egress environments must provide them).
                      HONESTY NOTE: this is the torchvision (pytorch-fid
                      style) extractor, NOT the TF1 "pool_3" graph of the
                      ADM/OpenAI evaluator the reference's npz format
                      targets (`sample_fid.py:97`) — FIDs are internally
                      consistent across runs of this tool but are known to
                      differ slightly from published ADM-protocol numbers;
                      for paper-comparable values feed the npz files to the
                      ADM evaluator itself.
  * ``random-proj`` — a deterministic random projection of the raw pixels
                      (64-d). NOT a perceptual metric — it exists so the
                      full sample_fid -> stats-cache -> Frechet pipeline
                      can be exercised end to end without Inception
                      weights; the moment weights land, the real run is
                      the same commands with ``--features inception``.

Stats files record which extractor produced them and comparisons refuse to
mix extractors. The Frechet math itself is dependency-free and unit-tested
(tests/test_fid.py).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID = ||mu1-mu2||^2 + Tr(S1 + S2 - 2 (S1 S2)^(1/2))."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    covmean = linalg.sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def activation_stats(features: np.ndarray):
    """(N, D) features -> (mu, sigma)."""
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def kid_score(
    feats1: np.ndarray,
    feats2: np.ndarray,
    subset_size: int = 1000,
    n_subsets: int = 100,
    seed: int = 0,
):
    """Kernel Inception Distance (Binkowski et al., arXiv 1801.01401):
    unbiased MMD^2 with the polynomial kernel k(x,y) = (x.y/d + 1)^3,
    averaged over ``n_subsets`` random subsets of ``subset_size``.

    Unlike FID, the estimator is unbiased in N — the metric of choice for
    the small sample counts that are cheap on one chip (sample_fid 512-
    sample protocol: 135 s), where FID's covariance estimate is badly
    biased. Returns (mean, std) over subsets.
    """
    d = feats1.shape[1]
    m = min(subset_size, len(feats1), len(feats2))
    assert m >= 2, "KID needs at least 2 samples per set"
    rng = np.random.default_rng(seed)
    x64, y64 = feats1.astype(np.float64), feats2.astype(np.float64)
    vals = []
    for _ in range(n_subsets):
        x = x64[rng.choice(len(x64), m, replace=False)]
        y = y64[rng.choice(len(y64), m, replace=False)]
        kxx = (x @ x.T / d + 1.0) ** 3
        kyy = (y @ y.T / d + 1.0) ** 3
        kxy = (x @ y.T / d + 1.0) ** 3
        # unbiased MMD^2: within-set terms exclude the diagonal
        t_xx = (kxx.sum() - np.trace(kxx)) / (m * (m - 1))
        t_yy = (kyy.sum() - np.trace(kyy)) / (m * (m - 1))
        vals.append(t_xx + t_yy - 2.0 * kxy.mean())
    return float(np.mean(vals)), float(np.std(vals))


def precision_recall(
    real_feats: np.ndarray,
    fake_feats: np.ndarray,
    nhood_size: int = 3,
):
    """Improved precision & recall (Kynkaanniemi et al., arXiv 1904.06991):
    each set's manifold is the union of hyperspheres reaching its members'
    k-th nearest in-set neighbor; precision = fraction of fakes inside the
    real manifold, recall = fraction of reals inside the fake manifold.

    The fidelity-vs-diversity diagnostic for guidance knobs (cfg_scale /
    cfg_interval trade exactly these two axes) that a single FID/KID
    number cannot separate. O(N^2) distances — meant for the small-N chip
    protocol, not 50k sets.
    """

    def k_radii(feats, k):
        d2 = (
            (feats**2).sum(1)[:, None]
            + (feats**2).sum(1)[None, :]
            - 2.0 * (feats @ feats.T)
        )
        np.fill_diagonal(d2, np.inf)
        return np.sqrt(np.maximum(np.partition(d2, k - 1, axis=1)[:, k - 1], 0.0))

    def fraction_inside(candidates, manifold, radii):
        d2 = (
            (candidates**2).sum(1)[:, None]
            + (manifold**2).sum(1)[None, :]
            - 2.0 * (candidates @ manifold.T)
        )
        d = np.sqrt(np.maximum(d2, 0.0))
        return float((d <= radii[None, :]).any(axis=1).mean())

    real = real_feats.astype(np.float64)
    fake = fake_feats.astype(np.float64)
    assert len(real) > nhood_size and len(fake) > nhood_size
    precision = fraction_inside(fake, real, k_radii(real, nhood_size))
    recall = fraction_inside(real, fake, k_radii(fake, nhood_size))
    return precision, recall


def inception_features(images_u8: np.ndarray, batch_size: int = 64) -> np.ndarray:
    """(N, H, W, 3) uint8 -> (N, 2048) InceptionV3 pool features (torch CPU).

    Needs torchvision Inception weights in the local torch hub cache.
    """
    import torch

    try:
        from torchvision import models, transforms
    except ImportError as e:
        raise RuntimeError(
            "--features inception needs torchvision + locally cached "
            "InceptionV3 weights (not available in zero-egress images); "
            "use --features random-proj to exercise the pipeline without them"
        ) from e

    net = models.inception_v3(weights=models.Inception_V3_Weights.IMAGENET1K_V1)
    net.fc = torch.nn.Identity()
    net.eval()
    pre = transforms.Compose(
        [
            transforms.ToTensor(),
            transforms.Resize((299, 299), antialias=True),
            transforms.Normalize([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
        ]
    )
    feats = []
    with torch.no_grad():
        for i in range(0, len(images_u8), batch_size):
            batch = torch.stack([pre(img) for img in images_u8[i : i + batch_size]])
            feats.append(net(batch).numpy())
    return np.concatenate(feats, axis=0)


def random_projection_features(
    images_u8: np.ndarray, dim: int = 64, seed: int = 0
) -> np.ndarray:
    """(N, H, W, C) uint8 -> (N, dim) via a fixed Gaussian random projection
    of the centered pixels. Deterministic in (image shape, dim, seed) so
    stats caches are reproducible. Pipeline stub, not a perceptual metric."""
    n = images_u8.shape[0]
    flat = images_u8.reshape(n, -1).astype(np.float32) / 127.5 - 1.0
    rng = np.random.default_rng(seed)
    proj = rng.standard_normal((flat.shape[1], dim)).astype(np.float32)
    proj /= np.sqrt(flat.shape[1])
    return flat @ proj


def extract_features(images_u8: np.ndarray, kind: str) -> np.ndarray:
    if kind == "inception":
        return inception_features(images_u8)
    if kind == "random-proj":
        return random_projection_features(images_u8)
    raise ValueError(f"unknown feature extractor: {kind}")


def _load_samples(path: str) -> np.ndarray:
    with np.load(path) as f:
        return f["arr_0"]


def _load_stats(path: str, expected_kind: str):
    with np.load(path, allow_pickle=False) as f:
        kind = str(f["features"]) if "features" in f.files else "inception"
        if kind != expected_kind:  # hard error (assert would vanish under -O)
            raise SystemExit(
                f"stats file {path} was built with --features {kind}; "
                f"refusing to compare against --features {expected_kind}"
            )
        return f["mu"], f["sigma"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--samples", type=str, help="ADM-format npz (arr_0 uint8 NHWC)")
    p.add_argument("--ref-samples", type=str, default=None)
    p.add_argument("--ref-stats", type=str, default=None, help="npz with mu, sigma")
    p.add_argument("--make-stats", type=str, default=None, help="samples npz -> stats")
    p.add_argument("--out", type=str, default="stats.npz")
    p.add_argument("--features", choices=["inception", "random-proj"],
                   default="inception",
                   help="feature extractor; random-proj is the weights-free "
                        "pipeline stub (see module docstring)")
    p.add_argument("--metric", choices=["fid", "kid", "pr", "all"], default="fid",
                   help="kid (unbiased in N) and pr (improved precision/"
                        "recall — the fidelity-vs-diversity split a scalar "
                        "distance can't give) need --ref-samples, not "
                        "--ref-stats; both are sized for the small-N chip "
                        "protocol")
    p.add_argument("--kid-subset-size", type=int, default=1000)
    p.add_argument("--kid-subsets", type=int, default=100)
    p.add_argument("--pr-nhood", type=int, default=3,
                   help="k for the precision/recall manifold radii")
    args = p.parse_args()

    if args.make_stats:
        mu, sigma = activation_stats(
            extract_features(_load_samples(args.make_stats), args.features)
        )
        np.savez(args.out, mu=mu, sigma=sigma, features=args.features)
        print(f"wrote {args.out}")
        return

    assert args.samples and (args.ref_samples or args.ref_stats)
    if args.metric in ("kid", "pr", "all") and not args.ref_samples:
        raise SystemExit(
            f"error: --metric {args.metric} needs raw reference features "
            "(--ref-samples); a (mu, sigma) stats file cannot feed it"
        )
    # validate extractor compatibility before paying for feature extraction
    ref = _load_stats(args.ref_stats, args.features) if args.ref_stats else None
    f1 = extract_features(_load_samples(args.samples), args.features)
    f2 = None
    if args.ref_samples:
        f2 = extract_features(_load_samples(args.ref_samples), args.features)
    if args.metric in ("fid", "all"):
        mu1, s1 = activation_stats(f1)
        mu2, s2 = ref if ref is not None else activation_stats(f2)
        print(f"FID: {frechet_distance(mu1, s1, mu2, s2):.4f}")
    if args.metric in ("kid", "all"):
        mean, std = kid_score(
            f1, f2, subset_size=args.kid_subset_size, n_subsets=args.kid_subsets
        )
        print(f"KID: {mean:.6f} +/- {std:.6f}")
    if args.metric in ("pr", "all"):
        # convention: --ref-samples is the REAL set, --samples the generated
        prec, rec = precision_recall(f2, f1, nhood_size=args.pr_nhood)
        print(f"precision: {prec:.4f}  recall: {rec:.4f}")


if __name__ == "__main__":
    main()
