# Paper Cityscapes experiment recipes (reference: run_cityscapes_experiments.sh).
# Usage:
# > sh run_cityscapes_experiments.sh <run_number> <split_seed>
# E.g.:
# > sh run_cityscapes_experiments.sh 01 12345
# > sh run_cityscapes_experiments.sh 02 23456
# > sh run_cityscapes_experiments.sh 03 34567
# > sh run_cityscapes_experiments.sh 04 45678
# > sh run_cityscapes_experiments.sh 05 56789

run=${1}
seed=${2}

PARAMS_CITYSCAPES_DEEPLAB2I="--dataset=cityscapes --arch=resnet101_deeplab_imagenet --freeze_bn --batch_size=4 --learning_rate=3e-5 --iters_per_epoch=1000 --num_epochs=40"
AUG_CITYSCAPES="--crop_size=256,512 --aug_hflip --aug_strong_colour"

REG_SUPERVISED="--cons_weight=0.0"
REG_MASK_CUTOUT="--cons_weight=1.0 --mask_mode=zero --mask_prop_range=0.0:1.0 --conf_thresh=0.97"
REG_MASK_CUTMIX="--cons_weight=1.0 --mask_mode=mix --mask_prop_range=0.5 --conf_thresh=0.97"

# Supervised baselines
for n in 100 372 744 -1; do
  tag=$n; if [ "$n" = "-1" ]; then tag=all; fi
  python -m cutmix_seg_tpu.train.mask_mt ${PARAMS_CITYSCAPES_DEEPLAB2I} ${AUG_CITYSCAPES} --n_sup=${n} ${REG_SUPERVISED} --job_desc=cityscapes_deeplab2i_lr3e-5_sup_${tag}_run${run} --split_seed=${seed}
done
# CutMix
for n in 100 372 744 -1; do
  tag=$n; if [ "$n" = "-1" ]; then tag=all; fi
  python -m cutmix_seg_tpu.train.mask_mt ${PARAMS_CITYSCAPES_DEEPLAB2I} ${AUG_CITYSCAPES} --n_sup=${n} ${REG_MASK_CUTMIX} --job_desc=cityscapes_deeplab2i_lr3e-5_cutmix_semisup_${tag}_run${run} --split_seed=${seed}
done
# Cutout
for n in 100 372 744 -1; do
  tag=$n; if [ "$n" = "-1" ]; then tag=all; fi
  python -m cutmix_seg_tpu.train.mask_mt ${PARAMS_CITYSCAPES_DEEPLAB2I} ${AUG_CITYSCAPES} --n_sup=${n} ${REG_MASK_CUTOUT} --job_desc=cityscapes_deeplab2i_lr3e-5_cutout_semisup_${tag}_run${run} --split_seed=${seed}
done
