"""VISCERAL dataset preparation.

Public API preserved from the reference (scripts/prepare_dataset_visceral.py):
the gold-corpus (GC) cases split into val/test halves after a seeded shuffle,
the silver corpus (SC) becomes the train set
(prepare_dataset_visceral.py:36-39).

    python scripts/prepare_dataset_visceral.py \
        --path_to_gc <GC dir> --path_to_sc <SC dir>

Each corpus directory is expected to contain one subdirectory per case with
an image and a label NIfTI (image path shorter than label path, following
the reference's length-sort convention, transoar/utils/io.py:80).
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


def collect_cases(corpus_root: Path):
    cases = []
    for case_dir in sorted(p for p in corpus_root.iterdir() if p.is_dir()):
        files = sorted(case_dir.glob("*.nii*"), key=lambda p: len(str(p)))
        if len(files) >= 2:
            cases.append({
                "image": str(files[0].relative_to(corpus_root)),
                "label": str(files[1].relative_to(corpus_root)),
                "name": case_dir.name,
                "root": str(corpus_root),
            })
    return cases


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--path_to_gc", required=True,
                        help="Gold corpus (val/test).")
    parser.add_argument("--path_to_sc", required=True,
                        help="Silver corpus (train).")
    parser.add_argument("--config", default="dataset_visceral")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    set_root_logger(Path.cwd() / "logs" / "prepare_dataset.log")
    config = get_config(args.config)
    prep = config["preprocessing"]

    rng = random.Random(prep.get("seed", 10))
    gc = collect_cases(Path(args.path_to_gc))
    sc = collect_cases(Path(args.path_to_sc))
    rng.shuffle(gc)
    rng.shuffle(sc)

    splits = {
        "train": sc,
        "val": gc[len(gc) // 2:],
        "test": gc[:len(gc) // 2],
    }

    out_root = Path(args.out) if args.out else Path.cwd() / "dataset"
    data_config = {k: config[k] for k in (
        "num_classes", "labels", "labels_small", "labels_mid", "labels_large")}

    # PreProcessor resolves case paths relative to one dataset root; VISCERAL
    # has two corpora, so pass absolute paths.
    for split_cases in splits.values():
        for case in split_cases:
            root = Path(case.pop("root"))
            case["image"] = str(root / case["image"])
            case["label"] = str(root / case["label"])

    PreProcessor(
        splits=splits,
        path_to_dataset="/",
        path_to_splits=out_root / prep["dataset_name"],
        preprocessing_config=prep,
        data_config=data_config,
    ).run()


if __name__ == "__main__":
    main()
