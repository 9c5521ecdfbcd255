"""Shared trainer-param assembly for the tpu_e2e_* driver scripts.

The four dataset-family drivers (voc / cityscapes / isic / camvid) run the
same engine with recipe-specific overrides; keeping the common key set in
one place means a new engine parameter is added once, not four times
(drift previously failed only at runtime with a KeyError mid-driver).
``tests/test_e2e_scripts.py`` asserts each driver's params build against
the key set the CPU-tested cityscapes e2e path actually consumes.
"""


def base_params(**overrides) -> dict:
    """The common mask_mt recipe skeleton; recipe specifics via overrides."""
    p = dict(
        model="mean_teacher",
        freeze_bn=True, opt_type="adam", sgd_momentum=0.9, sgd_nesterov=False,
        sgd_weight_decay=5e-4, lr_sched="none",
        lr_step_epochs="", lr_step_gamma=0.1, lr_poly_power=0.9,
        teacher_alpha=0.99, bin_fill_holes=False,
        aug_hflip=True, aug_vflip=False, aug_hvflip=False,
        aug_scale_hung=False, aug_max_scale=1.0, aug_scale_non_uniform=False,
        aug_rot_mag=0.0, aug_strong_colour=True, aug_colour_brightness=0.4,
        aug_colour_contrast=0.4, aug_colour_saturation=0.4,
        aug_colour_hue=0.1, aug_colour_prob=0.8,
        aug_colour_greyscale_prob=0.2, mask_mode="mix", mask_prop_range="0.5",
        boxmask_n_boxes=1, boxmask_fixed_aspect_ratio=False,
        boxmask_by_size=False, boxmask_outside_bounds=False,
        boxmask_no_invert=False, cons_loss_fn="var",
        conf_per_pixel=False, unsup_batch_ratio=1,
        n_unsup=-1, n_val=-1, split_seed=12345, split_path=None,
        val_seed=131, save_preds=False, save_model=False, num_workers=4,
        compute_dtype="bfloat16", n_devices=-1, resume=False,
        nan_check_interval=100, seed=0, no_pretrained=True,
        data_on_device="auto",
    )
    p.update(overrides)
    return p
