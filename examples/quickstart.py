"""FlashDeconv-TPU quickstart: synthetic Visium-scale deconvolution.

Generates a synthetic spatial dataset (1,000 spots x 2,000 genes x 10 cell
types, spatially smooth ground truth, Poisson counts), runs the full pipeline
through the array-level API, and evaluates recovery against ground truth —
the same end-to-end smoke scenario as the reference's quickstart (reference
``examples/quickstart.py:12-145``).

Run: ``python examples/quickstart.py``
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

# Allow running straight from a source checkout without installation.
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from flashdeconv_tpu import FlashDeconv
from flashdeconv_tpu.utils.metrics import evaluate_deconvolution
from flashdeconv_tpu.utils.graph import grid_coords


def generate_synthetic_data(
    n_spots: int = 1000,
    n_genes: int = 2000,
    n_types: int = 10,
    seed: int = 42,
):
    """Synthetic ST data: smooth spatial domains + Poisson counts."""
    rng = np.random.RandomState(seed)

    # Cell-type signatures: sparse gamma programs + exclusive markers.
    X = rng.gamma(2.0, 1.0, size=(n_types, n_genes))
    X *= rng.rand(n_types, n_genes) < 0.3
    n_markers = max(5, n_genes // (n_types * 20))
    for k in range(n_types):
        cols = rng.choice(n_genes, size=n_markers, replace=False)
        X[:, cols] = 0.0
        X[k, cols] = rng.gamma(5.0, 2.0, size=n_markers)

    # Spot grid + smooth ground-truth proportions.
    side = int(np.ceil(np.sqrt(n_spots)))
    coords = grid_coords(n_spots)
    centers = rng.rand(n_types, 2) * side
    d2 = ((coords[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    logits = -d2 / (2 * (0.25 * side) ** 2)
    props = np.exp(logits + rng.gumbel(0, 0.3, size=logits.shape))
    props /= props.sum(axis=1, keepdims=True)

    # Poisson counts with gamma-distributed per-spot depth.
    mean = props @ X
    mean /= mean.sum(axis=1, keepdims=True) + 1e-12
    depth = rng.gamma(3.0, 1500.0, size=(n_spots, 1))
    Y = rng.poisson(mean * depth).astype(np.float64)
    return Y, X, coords, props


def main() -> None:
    print("=" * 60)
    print("FlashDeconv-TPU quickstart")
    print("=" * 60)

    print("\n[1/3] Generating synthetic data (1000 spots x 2000 genes)...")
    Y, X, coords, true_props = generate_synthetic_data()
    print(f"  Y: {Y.shape}, X: {X.shape}, sparsity: {np.mean(Y == 0):.1%}")

    print("\n[2/3] Running FlashDeconv...")
    model = FlashDeconv(
        sketch_dim=256,
        lambda_spatial="auto",
        rho_sparsity=0.01,
        n_hvg=1000,
        n_markers_per_type=25,
        k_neighbors=6,
        random_state=0,
        verbose=True,
    )
    t0 = time.perf_counter()
    pred_props = model.fit_transform(Y, X, coords)
    elapsed = time.perf_counter() - t0
    print(f"\n  Wall-clock: {elapsed:.2f}s "
          f"({Y.shape[0] / elapsed:.0f} spots/s end-to-end)")

    print("\n[3/3] Evaluating against ground truth...")
    metrics = evaluate_deconvolution(pred_props, true_props)
    for name, value in metrics["overall"].items():
        print(f"  {name:>22}: {value:.4f}")

    summary = model.summary()
    print(f"\n  Converged: {summary['converged']} "
          f"in {summary['n_iterations']} iterations "
          f"(lambda={summary['lambda_spatial']:.4f}, "
          f"{summary['n_genes_used']} genes)")


if __name__ == "__main__":
    main()
