"""Reference CLI flag parity, pinned.

Every flag each reference trainer accepts must stay accepted by the
corresponding CLI here, so `run_*.sh`-style invocations port unchanged.
The golden lists were extracted from the reference sources' @click.option
decorators (train_seg_semisup_mask_mt.py, train_seg_semisup_ict.py,
train_seg_semisup_vat_mt.py, train_seg_semisup_aug_mt.py, toy2d_train.py)
and are pinned here so a refactor of cli_common cannot silently drop one.
Extra TPU-native flags (resume, grad_accum, spatial_train, ...) are allowed
on top — this checks a superset, not equality.
"""

import click.testing  # noqa: F401  (ensures click is importable first)

_COMMON = """
arch aug_colour_brightness aug_colour_contrast aug_colour_greyscale_prob
aug_colour_hue aug_colour_prob aug_colour_saturation aug_hflip aug_hvflip
aug_max_scale aug_rot_mag aug_scale_hung aug_scale_non_uniform
aug_strong_colour aug_vflip batch_size bin_fill_holes conf_per_pixel
conf_thresh cons_loss_fn cons_weight crop_size dataset freeze_bn
iters_per_epoch job_desc learning_rate lr_poly_power lr_sched
lr_step_epochs lr_step_gamma model n_sup n_unsup n_val num_epochs
num_workers opt_type rampup save_model save_preds sgd_momentum
sgd_nesterov sgd_weight_decay split_path split_seed teacher_alpha
unsup_batch_ratio val_seed
""".split()

# reference train_seg_semisup_mask_mt.py:593-645
_MASK_MT = _COMMON + """
mask_mode mask_prop_range boxmask_n_boxes boxmask_fixed_aspect_ratio
boxmask_by_size boxmask_outside_bounds boxmask_no_invert
""".split()

# reference train_seg_semisup_ict.py:520-560
_ICT = _COMMON + ["ict_alpha"]

# reference train_seg_semisup_vat_mt.py:600-650
_VAT_MT = _COMMON + ["vat_radius", "adaptive_vat_radius",
                     "vat_dir_from_student"]

# reference train_seg_semisup_aug_mt.py:530-575
_AUG_MT = _COMMON + ["aug_free_scale_rot", "aug_offset_range"]


def _flags(cmd) -> set:
    names = set()
    for p in cmd.params:
        names.add(p.name)
    return names


def _assert_superset(cmd, ref_flags, label):
    missing = set(ref_flags) - _flags(cmd)
    assert not missing, f"{label} CLI lost reference flags: {sorted(missing)}"


def test_mask_mt_cli_covers_reference_flags():
    from cutmix_seg_tpu.train.mask_mt import experiment
    _assert_superset(experiment, _MASK_MT, "mask_mt")


def test_ict_cli_covers_reference_flags():
    from cutmix_seg_tpu.train.ict import experiment
    _assert_superset(experiment, _ICT, "ict")


def test_vat_mt_cli_covers_reference_flags():
    from cutmix_seg_tpu.train.vat_mt import experiment
    _assert_superset(experiment, _VAT_MT, "vat_mt")


def test_aug_mt_cli_covers_reference_flags():
    from cutmix_seg_tpu.train.aug_mt import experiment
    _assert_superset(experiment, _AUG_MT, "aug_mt")


# reference toy2d_train.py:460-520; '--device' (the torch cuda selector) is
# intentionally not carried — backend selection is JAX-level here
_TOY2D = """
balance_classes batch_size conf_avg conf_thresh cons_loss_fn
cons_no_dropout cons_weight dataset device dist_contour_range hidden_act
hidden_size img_noise_std job_desc learning_rate model n_hidden n_sup
norm_layer num_epochs perturb_noise_std region_erode_radius
render_cons_grad render_pred save_output seed sup_path teacher_alpha
""".split()


def test_toy2d_cli_covers_reference_flags():
    from cutmix_seg_tpu.toy2d.train import experiment
    _assert_superset(experiment, [f for f in _TOY2D if f != "device"],
                     "toy2d")
