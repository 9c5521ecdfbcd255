"""Child process for the graceful-preemption test: a many-epoch tiny trainer
whose parent sends SIGTERM mid-run. Reuses the test_trainer_e2e helpers
(tiny cityscapes zip, tiny arch, param skeleton) so there is ONE definition
of the tiny-trainer surface; argv: zip_path out_root num_epochs job_desc
[resume]."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_trainer_e2e import _params, build_tiny_zip, register_tiny_arch  # noqa: E402


def main():
    zip_path, out_root, num_epochs, job_desc = sys.argv[1:5]
    resume = len(sys.argv) > 5 and sys.argv[5] == "resume"

    if not os.path.exists(zip_path):
        build_tiny_zip(zip_path)

    # NOTE: the trainer itself calls maybe_initialize_distributed(), so the
    # coordinator env vars (if any) take effect without extra setup here
    from cutmix_seg_tpu.core import job
    from cutmix_seg_tpu.data import sources

    register_tiny_arch()
    orig = sources.CityscapesDataSource.__init__

    def patched(self, n_val, val_rng, trainval_perm, with_void=False,
                zip_path_=None):
        orig(self, n_val, val_rng, trainval_perm, with_void,
             zip_path_ or zip_path)

    sources.CityscapesDataSource.__init__ = patched

    from cutmix_seg_tpu.train.mask_mt import train_seg_semisup_mask_mt

    p = _params(zip_path, num_epochs=int(num_epochs), resume=resume,
                checkpoint_interval=1, save_model=False)
    job.submit("preempt_trainer", job_desc, train_seg_semisup_mask_mt, p,
               results_root=out_root)
    print("CHILD_EXIT_CLEAN", flush=True)


if __name__ == "__main__":
    main()
