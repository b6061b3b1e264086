"""Shared test fixtures: a tiny but structurally faithful config."""

import numpy as np

from transoar_tpu.models.anchors import synthetic_bbox_props


def tiny_config(num_organs=3, qpo=7, patch=(32, 32, 16), num_stages=4,
                input_level="P2", aux_loss=True, seg_proxy=False,
                precision="float32"):
    num_queries = num_organs * qpo
    cfg = {
        "experiment_name": "tiny",
        "seed": 0,
        "debug_mode": True,
        "overfit": False,
        "dataset": None,
        "bbox_padding": 1,
        "trainer": {
            "epochs": 2, "val_interval": 1, "lr": 2e-4, "lr_backbone": 2e-5,
            "weight_decay": 1e-4, "clip_max_norm": -1, "lr_drop": 1,
            "batch_size": 2, "shuffle": True, "num_workers": 0,
            "precision": precision,
        },
        "matching": {
            "anchor_matching": True, "cost_class": 1, "cost_bbox": 0,
            "cost_giou": 0,
        },
        "loss_coefs": {"cls": 2, "bbox": 5, "giou": 2, "segce": 2,
                       "segdice": 2},
        "backbone": {
            "name": "attn_fpn",
            "in_channels": 1,
            "start_channels": 4,
            "num_stages": num_stages,
            "strides": [[1, 1, 1]] + [[2, 2, 2]] * (num_stages - 1),
            "kernel_size": 3,
            "fpn_channels": 24,
            "out_fmaps": [input_level],
            "use_encoder_attn": False,
            "swin": {
                "depths": [2, 2], "num_heads": [2, 4],
                "window_size": [4, 4, 4], "mlp_ratio": 2, "qkv_bias": True,
                "drop_path_rate": 0.0, "conv_merging": False,
            },
            "use_decoder_attn": False,
            "def_attn": {
                "pos_encoding": "sine",
                "feature_levels": ["P2", "P3"],
                "hidden_dim": 24, "dim_feedforward": 32, "dropout": 0.0,
                "nheads": 6, "layers": 1, "n_points": 2,
            },
            "use_seg_proxy_loss": seg_proxy,
            "fg_bg": True,
        },
        "neck": {
            "name": "foc_attn",
            "pos_encoding": "sine",
            "input_levels": input_level,
            "hidden_dim": 24,
            "dropout": 0.0,
            "nheads": 4,
            "dim_feedforward": 32,
            "dec_layers": 2,
            "restrict_attn": True,
            "anchor_gen_dynamic_offset": True,
            "anchor_gen_offset": 0.1,
            "anchor_offset_pred": True,
            "max_anchor_pred_offset": 0.1,
            "num_queries": num_queries,
            "num_organs": num_organs,
            "aux_loss": aux_loss,
        },
        "augmentation": {
            "use_augmentation": False,
            "patch_size": list(patch),
            "p_gaussian_noise": 0, "p_gaussian_smooth": 0,
            "p_intensity_scale": 0.5, "p_intensity_shift": 0.5,
            "p_adjust_contrast": 0, "p_rotate": 0.5, "p_zoom": 0.5,
            "p_shear": 0.0, "p_translate": 0.5, "p_flip": 0,
            "gaussian_noise_mean": 0.0, "gaussian_noise_std": 0.1,
            "gaussian_smooth_sigma": [0.5, 1.0],
            "intensity_scale_factors": 0.1, "intensity_shift_offsets": 0.1,
            "adjust_contrast_gamma": [0.7, 1.5],
            "rotation": [-5, 5], "min_zoom": 0.9, "max_zoom": 1.1,
            "translate_percentage": 10, "shear_range": [0.1, 0.1, 0.1],
            "flip_axis": [0, 1, 2],
        },
        "parallel": {"dp": -1, "sp": 1},
        "bbox_properties": synthetic_bbox_props(num_organs, seed=3),
        "labels": {str(i + 1): f"organ{i + 1}" for i in range(num_organs)},
        "labels_small": {"1": "organ1"},
        "labels_mid": {str(i + 1): f"organ{i + 1}"
                       for i in range(1, num_organs - 1)},
        "labels_large": {str(num_organs): f"organ{num_organs}"},
    }
    return cfg


def synthetic_batch(config, batch_size=2, seed=0):
    """Random volume + consistent segmentation targets for the tiny config."""
    rng = np.random.default_rng(seed)
    patch = config["augmentation"]["patch_size"]
    num_organs = config["neck"]["num_organs"]

    images = rng.normal(size=(batch_size, *patch, 1)).astype(np.float32)
    seg = np.zeros((batch_size, *patch), np.int32)
    shape = np.array(patch, np.float64)
    for b in range(batch_size):
        for cls in range(1, num_organs + 1):
            props = config["bbox_properties"][str(cls)]
            c = np.array(props["median"][:3]) * shape
            s = np.maximum(np.array(props["median"][3:]) * shape, 6.0)
            lo = np.clip((c - s / 2).astype(int), 0, None)
            hi = np.minimum((c + s / 2).astype(int), shape.astype(int))
            seg[b, lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] = cls
    return images, seg
