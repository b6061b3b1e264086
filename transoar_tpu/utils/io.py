"""IO helpers: config loading, json/yaml, logging, run provenance.

TPU-native counterpart of reference ``transoar/utils/io.py`` (get_config:
io.py:20-38, json/pkl helpers: io.py:108-119, logger: io.py:121-129,
provenance: io.py:156-164). NIfTI IO lives in ``transoar_tpu.data.nifti``
(pure-numpy reader; the reference uses SimpleITK, which is not available
here).
"""

from __future__ import annotations

import json
import logging
import pickle
import socket
import subprocess
import sys
from pathlib import Path

import yaml

PATH_TO_CONFIG = Path(__file__).resolve().parents[2] / "config"


def load_yaml(path):
    with open(path) as stream:
        return yaml.safe_load(stream)


def load_json(path):
    with open(path) as f:
        return json.load(f)


def write_json(data, path):
    with open(path, "w") as f:
        json.dump(data, f, indent=2)


def write_pkl(data, path):
    with open(path, "wb") as f:
        pickle.dump(data, f)


def get_config(config_name, config_dir=None, dataset_dir=None):
    """Load ``<config_dir>/<config_name>.yaml`` and merge dataset statistics.

    Mirrors reference ``get_config`` (io.py:20-38): if the experiment config
    names a ``dataset``, the preprocessed dataset's ``data_info.json``
    (bbox_properties / shape_statistics / foreground_voxel_statistics) is
    merged in — dataset statistics *are* config: anchors and attention masks
    are functions of them (transoarnet.py:26, focused_decoder.py:138-159).
    """
    name = str(config_name)
    if name.endswith((".yaml", ".yml")):
        # explicit path (generated override files live outside ./config)
        config = load_yaml(Path(name))
    else:
        config_dir = Path(config_dir) if config_dir else PATH_TO_CONFIG
        config = load_yaml(config_dir / f"{name}.yaml")

    dataset = config.get("dataset")
    if dataset:
        root = Path(dataset_dir) if dataset_dir else Path.cwd() / "dataset"
        data_info = root / dataset / "data_info.json"
        if data_info.exists():
            config.update(load_json(data_info))
    return config


def validate_config(config):
    """Light-weight schema check — the reference validates nothing; we fail
    fast on the keys everything downstream dereferences."""
    required = ["neck", "backbone", "loss_coefs"]
    missing = [k for k in required if k not in config]
    if missing:
        raise KeyError(f"config missing required sections: {missing}")
    neck = config["neck"]
    # the per-organ query layout only constrains the focused-decoder branch
    # (reference focused_decoder.py:97); DETR branches use a free query set
    if neck.get("name", "foc_attn") == "foc_attn" and "retina" not in config:
        qpo, rem = divmod(neck["num_queries"], neck["num_organs"])
        if rem:
            raise ValueError(
                f"num_queries ({neck['num_queries']}) must be a multiple of "
                f"num_organs ({neck['num_organs']})")
        if qpo not in (1, 7, 27, 54):
            raise ValueError(
                f"queries per organ must be in (1, 7, 27, 54), got {qpo}")
    # Reject augmentation keys nothing consumes — silent dead config keys
    # (a p_* with no implementation) are worse than a hard error.
    known_aug = {
        "use_augmentation", "on_device", "patch_size",
        "p_gaussian_noise", "gaussian_noise_mean", "gaussian_noise_std",
        "p_gaussian_smooth", "gaussian_smooth_sigma",
        "p_intensity_scale", "intensity_scale_factors",
        "p_intensity_shift", "intensity_shift_offsets",
        "p_adjust_contrast", "adjust_contrast_gamma",
        "p_rotate", "rotation", "p_zoom", "min_zoom", "max_zoom",
        "p_shear", "shear_range", "p_translate", "translate_percentage",
        "p_flip", "flip_axis", "resample",
    }
    unknown = set(config.get("augmentation", {})) - known_aug
    if unknown:
        raise ValueError(
            f"unknown augmentation config keys (nothing consumes them): "
            f"{sorted(unknown)}")
    return config


def set_root_logger(path=None):
    handlers = [logging.StreamHandler(sys.stdout)]
    if path is not None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        handlers.insert(0, logging.FileHandler(path, "w"))
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s : %(levelname)s [%(module)s, %(lineno)d] %(message)s",
        handlers=handlers,
        force=True,
    )


def get_meta_data():
    """Run provenance (reference io.py:156-164), with jax instead of torch."""
    import jax

    meta = {
        "python_version": sys.version.splitlines()[0],
        "jax_version": jax.__version__,
        "jax_backend": jax.default_backend(),
        "host_name": socket.gethostname(),
    }
    try:
        meta["git_commit_hash"] = (
            subprocess.check_output(["git", "rev-parse", "--short", "HEAD"],
                                    stderr=subprocess.DEVNULL)
            .decode("ascii").strip())
    except (subprocess.CalledProcessError, FileNotFoundError):
        meta["git_commit_hash"] = "unknown"
    return meta
