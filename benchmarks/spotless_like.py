"""Spotless-style silver-standard accuracy harness.

The Spotless benchmark (Sang-aram et al. 2024) evaluates deconvolution on
*silver standards*: synthetic spots composed by mixing real scRNA-seq
profiles with known proportions. The real 56-dataset suite needs external
data; this harness reproduces its **design** — a grid of generative regimes
(cell-type counts, spot compositions, depths, dominant-type patterns) — so
accuracy can be tracked offline against the reference's published mean
Pearson of 0.944 (reference ``README.md:73-78``).

Each scenario: (1) simulate a scRNA-seq reference with per-type programs and
markers; (2) compose spots by sampling 2-6 types with Dirichlet weights on a
spatial domain pattern; (3) Poisson-sample counts at the scenario's depth;
(4) deconvolve with default settings; (5) score Pearson r between predicted
and true proportions over all spots x types.

Usage: python benchmarks/spotless_like.py [--quick]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def simulate_reference(n_types, n_genes, rng, markers_per_type=25):
    """Cell-type expression programs with exclusive markers (probability vectors)."""
    X = rng.gamma(2.0, 1.0, size=(n_types, n_genes))
    X *= rng.rand(n_types, n_genes) < 0.25
    for k in range(n_types):
        cols = rng.choice(n_genes, size=markers_per_type, replace=False)
        X[:, cols] = 0.0
        X[k, cols] = rng.gamma(6.0, 2.0, size=markers_per_type)
    return X


def simulate_silver_standard(
    n_types=10,
    n_genes=5000,
    n_spots=800,
    mean_types_per_spot=4,
    depth=2000,
    dominant_pattern="regional",
    seed=0,
):
    """One silver-standard dataset: (Y counts, X signatures, coords, truth)."""
    rng = np.random.RandomState(seed)
    X = simulate_reference(n_types, n_genes, rng)

    side = int(np.ceil(np.sqrt(n_spots)))
    xs, ys = np.meshgrid(np.arange(side), np.arange(side))
    coords = np.column_stack([xs.ravel(), ys.ravel()])[:n_spots].astype(float)

    # Spot composition: each spot mixes a small support of types.
    if dominant_pattern == "regional":
        # spatially contiguous dominant types (like tissue regions)
        centers = rng.rand(n_types, 2) * side
        d2 = ((coords[:, None] - centers[None]) ** 2).sum(-1)
        base = np.exp(-d2 / (2 * (0.3 * side) ** 2))
    else:  # "uniform": no spatial structure in composition
        base = np.ones((n_spots, n_types))

    props = np.zeros((n_spots, n_types))
    for i in range(n_spots):
        support_size = max(2, min(n_types, rng.poisson(mean_types_per_spot)))
        p = base[i] / base[i].sum()
        support = rng.choice(n_types, size=support_size, replace=False, p=p)
        w = rng.dirichlet(np.ones(support_size))
        props[i, support] = w

    # Counts: depth varies per spot (gamma), Poisson sampling.
    mean_expr = props @ (X / (X.sum(axis=1, keepdims=True) + 1e-12))
    spot_depth = rng.gamma(4.0, depth / 4.0, size=(n_spots, 1))
    Y = rng.poisson(mean_expr * spot_depth).astype(np.float64)
    return Y, X, coords, props


SCENARIOS = list(itertools.product(
    [5, 10, 20],                # n_types
    [2, 4],                     # mean types per spot
    [800, 5000],                # depth (UMIs per spot)
    ["regional", "uniform"],    # dominant pattern
))


def run(quick=False, seed0=0):
    from flashdeconv_tpu import FlashDeconv
    from flashdeconv_tpu.utils.metrics import compute_correlation, compute_jsd

    scenarios = SCENARIOS[::4] if quick else SCENARIOS
    results = []
    for i, (k, mts, depth, pattern) in enumerate(scenarios):
        Y, X, coords, props = simulate_silver_standard(
            n_types=k, mean_types_per_spot=mts, depth=depth,
            dominant_pattern=pattern, seed=seed0 + i,
        )
        t0 = time.perf_counter()
        model = FlashDeconv(
            sketch_dim=512, lambda_spatial="auto", n_hvg=2000,
            n_markers_per_type=50, random_state=0,
        )
        pred = model.fit_transform(Y, X, coords)
        secs = time.perf_counter() - t0
        r = compute_correlation(pred, props, "pearson")
        jsd = float(np.mean(compute_jsd(pred, props)))
        results.append({
            "n_types": k, "mean_types_per_spot": mts, "depth": depth,
            "pattern": pattern, "pearson": round(float(r), 4),
            "jsd": round(jsd, 4), "seconds": round(secs, 2),
        })
        print(f"# [{i + 1}/{len(scenarios)}] K={k} mts={mts} depth={depth} "
              f"{pattern}: r={r:.3f} jsd={jsd:.3f} ({secs:.1f}s)",
              file=sys.stderr)

    rs = [x["pearson"] for x in results]
    return {
        "metric": "spotless_like_mean_pearson",
        "value": round(float(np.mean(rs)), 4),
        "unit": "pearson_r",
        "vs_baseline": round(float(np.mean(rs)) / 0.944, 3),
        "min_pearson": round(float(np.min(rs)), 4),
        "n_scenarios": len(results),
        "scenarios": results,
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    print(json.dumps(run(quick=args.quick)))
