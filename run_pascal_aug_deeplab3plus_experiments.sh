# Paper Pascal-VOC-aug DeepLab v3+ recipes
# (reference: run_pascal_aug_deeplab3plus_experiments.sh).
# Usage:
# > sh run_pascal_aug_deeplab3plus_experiments.sh <num_supervised_samples> <text>

n_sup=${1}
n_sup_txt=${2}

PARAMS_PASCALAUG_DEEPLAB3PLUSI="--dataset=pascal_aug --arch=resnet101_deeplabv3plus_imagenet --freeze_bn --batch_size=10 --learning_rate=1e-5 --iters_per_epoch=1000 --num_epochs=40 --split_path=./data/splits/pascal_aug/split_0.pkl"
AUG_PASCAL="--crop_size=321,321 --aug_hflip --aug_scale_hung --aug_strong_colour"

REG_SUPERVISED="--cons_weight=0.0"
REG_MASK_CUTMIX="--cons_weight=1.0 --mask_mode=mix --mask_prop_range=0.5 --conf_thresh=0.97"

# Supervised baseline
python -m cutmix_seg_tpu.train.mask_mt ${PARAMS_PASCALAUG_DEEPLAB3PLUSI} ${AUG_PASCAL} --n_sup=${n_sup} ${REG_SUPERVISED} --job_desc=pascalaug_deeplab3plusi_lr1e-5_sup_${n_sup_txt}_split0
# Mask based: CutMix
python -m cutmix_seg_tpu.train.mask_mt ${PARAMS_PASCALAUG_DEEPLAB3PLUSI} ${AUG_PASCAL} --n_sup=${n_sup} ${REG_MASK_CUTMIX} --job_desc=pascalaug_deeplab3plusi_lr1e-5_cutmix_semisup_${n_sup_txt}_split0
