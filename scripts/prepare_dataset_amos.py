"""AMOS dataset preparation.

Public API preserved from the reference (scripts/prepare_dataset_amos.py):

    python scripts/prepare_dataset_amos.py --path_to_dataset <raw AMOS dir>

Expects the AMOS layout (imagesTr/labelsTr with case files). Splits by
seeded shuffle into train/val/test counts from the dataset config
(reference prepare_dataset_amos.py:31-37), then runs the PreProcessor.
"""

from __future__ import annotations

import sys
from pathlib import Path as _Path

sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import argparse
import random
from pathlib import Path

from transoar_tpu.data.preprocessor import PreProcessor
from transoar_tpu.utils.io import get_config, set_root_logger


def collect_cases(root: Path):
    images = sorted((root / "imagesTr").glob("*.nii*"))
    cases = []
    for img in images:
        lbl = root / "labelsTr" / img.name
        if lbl.exists():
            cases.append({
                "image": str(img.relative_to(root)),
                "label": str(lbl.relative_to(root)),
                "name": img.name.split(".")[0],
            })
    return cases


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--path_to_dataset", required=True)
    parser.add_argument("--config", default="dataset_amos")
    parser.add_argument("--out", default=None,
                        help="Output root (default ./dataset).")
    args = parser.parse_args()

    set_root_logger(Path.cwd() / "logs" / "prepare_dataset.log")
    config = get_config(args.config)
    prep = config["preprocessing"]

    cases = collect_cases(Path(args.path_to_dataset))
    random.Random(prep.get("seed", 10)).shuffle(cases)
    n_train, n_val = prep["num_train"], prep["num_val"]
    n_test = prep["num_test"]
    splits = {
        "train": cases[:n_train],
        "val": cases[n_train:n_train + n_val],
        "test": cases[n_train + n_val:n_train + n_val + n_test],
    }

    out_root = Path(args.out) if args.out else Path.cwd() / "dataset"
    data_config = {k: config[k] for k in (
        "num_classes", "labels", "labels_small", "labels_mid", "labels_large")}
    PreProcessor(
        splits=splits,
        path_to_dataset=args.path_to_dataset,
        path_to_splits=out_root / prep["dataset_name"],
        preprocessing_config=prep,
        data_config=data_config,
    ).run()


if __name__ == "__main__":
    main()
