"""Config presets: load shipped configs and fill dataset statistics.

Real runs merge ``data_info.json`` from a preprocessed dataset
(utils/io.get_config). Benchmarks / compile checks / dry runs have no
dataset on disk, so missing statistics are filled with synthetic-but-
plausible per-organ priors (models/anchors.synthetic_bbox_props) — the
anchors, attention masks and shapes are structurally identical to a real
AMOS run.
"""

from __future__ import annotations

import copy

from transoar_tpu.models.anchors import synthetic_bbox_props
from transoar_tpu.utils.io import PATH_TO_CONFIG, get_config, load_yaml


def fill_synthetic_stats(config, seed=None):
    config = copy.deepcopy(config)
    num_organs = config["neck"]["num_organs"]
    if "bbox_properties" not in config:
        config["bbox_properties"] = synthetic_bbox_props(
            num_organs, seed=seed if seed is not None else config["seed"])
    if "labels" not in config:
        ds_cfg_name = config.get("dataset_config")
        labels = None
        if ds_cfg_name:
            try:
                ds_cfg = load_yaml(PATH_TO_CONFIG / f"{ds_cfg_name}.yaml")
                labels = {str(k): v for k, v in ds_cfg["labels"].items()}
                for key in ("labels_small", "labels_mid", "labels_large"):
                    config[key] = {str(k): v for k, v in ds_cfg[key].items()}
            except FileNotFoundError:
                labels = None
        if labels is None:
            labels = {str(i + 1): f"organ{i + 1}" for i in range(num_organs)}
            config["labels_small"] = {"1": labels["1"]}
            config["labels_mid"] = {
                str(i + 1): labels[str(i + 1)]
                for i in range(1, max(num_organs - 1, 1))}
            config["labels_large"] = {str(num_organs): labels[str(num_organs)]}
        config["labels"] = labels
    return config


def flagship_config(batch_size=None, patch_size=None):
    """Focused Decoder + AttnFPN on AMOS-shaped volumes (BASELINE.md)."""
    cfg = get_config("foc_dec_amos")
    cfg = fill_synthetic_stats(cfg)
    if batch_size is not None:
        cfg["trainer"]["batch_size"] = batch_size
    if patch_size is not None:
        cfg["augmentation"]["patch_size"] = list(patch_size)
    return cfg


def tiny_flagship_config(num_organs=6, patch=(32, 32, 16)):
    """Structurally faithful, tiny variant for dry runs on CPU meshes."""
    cfg = flagship_config(batch_size=8, patch_size=patch)
    cfg["neck"]["num_organs"] = num_organs
    cfg["neck"]["num_queries"] = num_organs * 27
    cfg["neck"]["hidden_dim"] = 96
    cfg["neck"]["dim_feedforward"] = 128
    cfg["backbone"]["start_channels"] = 8
    cfg["backbone"]["num_stages"] = 4
    cfg["backbone"]["strides"] = [[1, 1, 1]] + [[2, 2, 2]] * 3
    cfg["backbone"]["fpn_channels"] = 96
    cfg["backbone"]["out_fmaps"] = ["P2"]
    cfg["neck"]["input_levels"] = "P2"
    del cfg["bbox_properties"]
    del cfg["labels"]
    cfg = fill_synthetic_stats(cfg)
    return cfg
