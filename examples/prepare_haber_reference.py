#!/usr/bin/env python3
"""Prepare the Haber et al. (2017) mouse-intestine scRNA-seq reference.

Downloads the Besca-processed Haber et al. single-cell survey of the mouse
small-intestinal epithelium (10,896 cells, curated ``celltype1`` labels)
from Zenodo, merges raw UMI counts with the curated annotations, applies the
QC recommended in ``docs/reference_data_guide.md`` (label curation +
minimum-cell filtering), and writes an h5ad ready to pass to
``fd.tl.deconvolve(adata_st, adata_ref, cell_type_key="celltype1")``.

Reference:
    Haber AL, Biton M, Rogel N, Herbst RH et al. A single-cell survey of
    the small intestinal epithelium. Nature 551, 333-339 (2017).

Data source: https://zenodo.org/records/4447233

Usage:
    python prepare_haber_reference.py [--output haber_intestine_reference.h5ad]
                                      [--min-cells-per-type 25]
"""

from __future__ import annotations

import argparse
import sys
import urllib.request
from pathlib import Path

ZENODO_RECORD = "https://zenodo.org/records/4447233/files"
RAW_URL = f"{ZENODO_RECORD}/haber_raw.h5ad?download=1"
PROCESSED_URL = f"{ZENODO_RECORD}/haber_processed.h5ad?download=1"

# Labels that must never enter a deconvolution reference
# (see docs/reference_data_guide.md, "The Unknown-cell problem").
EXCLUDE_LABELS = {"unknown", "unassigned", "doublet", "low_quality", "debris", "mixed"}


def fetch(url: str, dest: Path) -> None:
    if dest.exists():
        print(f"  already present: {dest}")
        return
    print(f"  downloading {url}\n  -> {dest}")

    def hook(blocks, block_size, total):
        done = blocks * block_size
        if total > 0:
            sys.stdout.write(f"\r  {done / 1e6:.0f} / {total / 1e6:.0f} MB")
            sys.stdout.flush()

    urllib.request.urlretrieve(url, dest, reporthook=hook)
    print()


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--output", type=Path, default=Path("haber_intestine_reference.h5ad")
    )
    parser.add_argument("--cache-dir", type=Path, default=Path(".haber_cache"))
    parser.add_argument("--min-cells-per-type", type=int, default=25)
    args = parser.parse_args()

    try:
        import anndata as ad
    except ImportError:
        sys.exit("This script needs anndata: pip install 'flashdeconv-tpu[io]'")

    args.cache_dir.mkdir(exist_ok=True)
    raw_path = args.cache_dir / "haber_raw.h5ad"
    proc_path = args.cache_dir / "haber_processed.h5ad"

    print("[1/4] Fetching data from Zenodo...")
    fetch(RAW_URL, raw_path)
    fetch(PROCESSED_URL, proc_path)

    print("[2/4] Merging raw counts with curated annotations...")
    raw = ad.read_h5ad(raw_path)
    processed = ad.read_h5ad(proc_path)

    # Keep only cells that survived the curated processing, and carry the
    # curated labels onto the *raw count* matrix (signatures must be built
    # from raw counts — the pipeline normalizes internally).
    common = raw.obs_names.intersection(processed.obs_names)
    ref = raw[common].copy()
    ref.obs["celltype1"] = (
        processed.obs.loc[common, "celltype1"].astype(str).values
    )

    print(f"  {ref.n_obs} cells x {ref.n_vars} genes after merge")

    print("[3/4] QC: label curation + minimum-cell filter...")
    labels = ref.obs["celltype1"].astype(str)
    bad = labels.str.lower().isin(EXCLUDE_LABELS)
    if bad.any():
        print(f"  dropping {int(bad.sum())} cells with excluded labels")
        ref = ref[~bad.values].copy()
        labels = ref.obs["celltype1"].astype(str)

    counts = labels.value_counts()
    small = counts[counts < args.min_cells_per_type]
    if len(small):
        print(f"  dropping under-backed types: {dict(small)}")
        keep = labels.isin(counts[counts >= args.min_cells_per_type].index)
        ref = ref[keep.values].copy()

    ref.obs["celltype1"] = ref.obs["celltype1"].astype("category")
    print("  final composition:")
    for name, n in ref.obs["celltype1"].value_counts().items():
        print(f"    {name:>35}: {n}")

    print(f"[4/4] Writing {args.output} ...")
    ref.write_h5ad(args.output)
    print("Done. Use with:")
    print("  import flashdeconv_tpu as fd")
    print(f"  ref = anndata.read_h5ad('{args.output}')")
    print("  fd.tl.deconvolve(adata_st, ref, cell_type_key='celltype1')")


if __name__ == "__main__":
    main()
