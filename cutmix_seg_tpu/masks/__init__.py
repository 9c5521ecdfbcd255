from cutmix_seg_tpu.masks.box_mask import (  # noqa: F401
    BoxMaskConfig,
    sample_box_rects_np,
    sample_box_rects,
    rasterise_masks,
    sample_masks,
)
