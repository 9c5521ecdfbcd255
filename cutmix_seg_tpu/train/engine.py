"""Shared training engine for the four semi-supervised trainers.

One parameterised loop covers what the reference implements as four ~600-line
trainer scripts (train_seg_semisup_{mask_mt,ict,vat_mt,aug_mt}.py): dataset
splits, model/optimizer/state construction, host loaders, device
augmentation, the fused algorithm step, per-epoch EMA-teacher evaluation with
the reference's exact log line, JSONL metrics, checkpoints/resume, NaN
bail-out, and the final save-model / save-preds / test-eval stage
(reference: train_seg_semisup_mask_mt.py:64-577). Each trainer supplies an
``AlgorithmSpec``: the fused step factory plus how to compose its
unsupervised batch from host streams.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cutmix_seg_tpu.aug import affine as host_affine
from cutmix_seg_tpu.aug.params import GeomConfig
from cutmix_seg_tpu.core import checkpoint as ckpt
from cutmix_seg_tpu.core import job
from cutmix_seg_tpu.core.train_state import create_train_state
from cutmix_seg_tpu.data import datasets
from cutmix_seg_tpu.data.loader import HostBatchBuilder, train_stream
from cutmix_seg_tpu.ops.colour import ColourJitterConfig
from cutmix_seg_tpu.ops.iou import EvaluatorIoU
from cutmix_seg_tpu.parallel.mesh import (
    jit_sharded_step,
    make_mesh,
    maybe_initialize_distributed,
    replicated,
    shard_batch,
)
from cutmix_seg_tpu.semisup.stepcore import ConsistencyCommon
from cutmix_seg_tpu.train import common
from cutmix_seg_tpu.utils.rampup import sigmoid_rampup


@dataclasses.dataclass
class AlgorithmSpec:
    """What differs between the four trainers.

    make_step(model, tx, mesh) -> fused algorithm step fn (mesh lets steps
        shard_map custom kernels over the data axis; pass-through for the
        rest).
    unsup_streams: number of independent unsupervised streams (mask_mt mix: 2;
        others: 1). ICT draws twice from its single stream.
    pair_geom: sample two correlated geometric transforms per image (aug_mt).
    fetch: fn(engine, streams) -> host-side raw unsup batch (nested numpy
        dicts straight off the loaders; runs on the host each iteration).
    compose: fn(augmentor, raw, key) -> unsup part of the algorithm batch.
        TRACED: runs inside the single jitted per-iteration program, so the
        device augmentation fuses with the train step (the reference spreads
        this over many host-dispatched kernels;
        train_seg_semisup_mask_mt.py:287-467).
    """

    name: str
    make_step: Callable
    unsup_streams: int
    pair_geom: bool
    fetch: Callable
    compose: Callable


class TrainEngine:
    def __init__(self, ctx: job.RunContext, spec: AlgorithmSpec,
                 algo_cfg: ConsistencyCommon, p: dict):
        self.ctx = ctx
        self.spec = spec
        self.algo_cfg = algo_cfg
        self.p = dict(p)

    # ---- construction ----
    def setup(self):
        p = self.p
        # persistent XLA cache: relaunches of the same recipe skip the
        # multi-minute train-step compile entirely
        from cutmix_seg_tpu.utils.compile_cache import (
            enable_persistent_compilation_cache,
        )

        enable_persistent_compilation_cache()
        # must run before anything touches devices so the backend spans the pod
        if maybe_initialize_distributed():
            print(f"Multi-host: process {jax.process_index()} of "
                  f"{jax.process_count()}, {jax.device_count()} devices")
        if p.get("eval_spatial") and jax.process_count() != 1:
            # fail at startup, not after the first training epoch
            raise ValueError(
                "--eval_spatial places H-sharded global arrays and is "
                "single-host only; use batch-parallel eval on pods")
        self.crop_hw = common.parse_crop_size(p["crop_size"])
        if self.crop_hw is None:
            raise ValueError("the TPU pipeline requires a crop_size (static shapes)")
        self.spatial_n = int(p.get("spatial_train", 1) or 1)
        if self.spatial_n > 1 and self.crop_hw[0] % self.spatial_n != 0:
            raise ValueError(
                f"--spatial_train {self.spatial_n} requires the crop height "
                f"({self.crop_hw[0]}) to divide exactly by the H-shard ways; "
                "pick a crop height that is a multiple (sharded dims must "
                "divide the mesh axis)")

        ds_dict = datasets.load_dataset(
            p["dataset"], p["n_val"], p["val_seed"], p["n_sup"], p["n_unsup"],
            p["split_seed"], p["split_path"])
        self.ds = ds_dict["ds_src"]
        self.sup_ndx = ds_dict["sup_ndx"]
        self.unsup_ndx = ds_dict["unsup_ndx"]
        self.val_ndx = ds_dict["val_ndx_tgt"]
        self.test_ndx = ds_dict["test_ndx_tgt"]
        self.n_classes = self.ds.num_classes
        if p["bin_fill_holes"] and self.n_classes != 2:
            print("Binary hole filling can only be used with binary (2-class) "
                  "segmentation datasets")
            return False
        print("Loaded data")

        self.model = common.build_model(p["arch"], self.n_classes,
                                        p.get("compute_dtype", "bfloat16"))
        self.mean, self.std = common.resolve_mean_std(self.model, self.ds)

        if p["iters_per_epoch"] == -1:
            p["iters_per_epoch"] = len(self.unsup_ndx) // p["batch_size"]
        total_iters = p["iters_per_epoch"] * p["num_epochs"]
        opt_cfg = common.build_optimizer_config(
            p["opt_type"], p["learning_rate"], p["lr_sched"],
            p["lr_step_epochs"], p["lr_step_gamma"], p["lr_poly_power"],
            total_iters, p["iters_per_epoch"], p["sgd_momentum"],
            p["sgd_nesterov"], p["sgd_weight_decay"])

        self.mean_teacher = p["model"] == "mean_teacher"
        if p["model"] not in ("mean_teacher", "pi"):
            print(f"Unknown model type {p['model']}")
            return False
        self.state, self.tx = create_train_state(
            self.model, opt_cfg, jax.random.PRNGKey(p.get("seed", 0)),
            input_hw=(65, 65), mean_teacher=self.mean_teacher,
            pretrained=not p.get("no_pretrained", False))
        print("Built network")

        self.start_epoch = 0
        if p.get("resume"):
            latest = ckpt.latest_checkpoint(self.ctx.checkpoint_dir)
            if latest is not None:
                self.state = ckpt.restore_checkpoint(latest, self.state)
                self.start_epoch = int(self.state.step) // max(p["iters_per_epoch"], 1)
                print(f"Resumed from {latest} at epoch {self.start_epoch}")
            if jax.process_count() > 1:
                # only the lead saves checkpoints, so followers without a
                # shared results filesystem would silently restart fresh —
                # divergent state breaks GSPMD's replicated-input contract
                # and mismatched epoch counts hang the collectives
                from jax.experimental import multihost_utils

                steps = multihost_utils.process_allgather(
                    np.int64(int(self.state.step)))
                if len(set(np.asarray(steps).tolist())) != 1:
                    raise RuntimeError(
                        "--resume requires every process to restore the same "
                        f"checkpoint step; got {np.asarray(steps).tolist()} — "
                        "use a shared results directory across hosts")

        n_dev = p.get("n_devices", -1)
        if n_dev != -1 and n_dev % self.spatial_n != 0:
            raise ValueError(
                f"--n_devices {n_dev} must divide by --spatial_train "
                f"{self.spatial_n} (total devices = data x model axes)")
        self.mesh = make_mesh(
            None if n_dev == -1 else n_dev // self.spatial_n,
            n_model=self.spatial_n)
        self.n_data = self.mesh.shape["data"]

        self.geom = GeomConfig.from_cli(
            self.crop_hw, p["aug_scale_hung"], p["aug_max_scale"],
            p["aug_rot_mag"], p["aug_scale_non_uniform"], p["aug_hflip"],
            p["aug_vflip"], p["aug_hvflip"])
        if "aug_offset_range" in p:
            # aug_mt pair options (reference: train_seg_semisup_aug_mt.py CLI)
            off = p["aug_offset_range"]
            self.geom = dataclasses.replace(
                self.geom, crop_offset=(off, off),
                constrain_rot_scale=not p.get("aug_free_scale_rot", False))
        self.colour = (
            ColourJitterConfig(
                brightness=p["aug_colour_brightness"],
                contrast=p["aug_colour_contrast"],
                saturation=p["aug_colour_saturation"],
                hue=p["aug_colour_hue"],
                apply_prob=p["aug_colour_prob"],
                greyscale_prob=p["aug_colour_greyscale_prob"])
            if p["aug_strong_colour"] else None)
        self.augmentor = common.DeviceAugmentor(
            self.mean, self.std, self.crop_hw, self.geom.mode, self.colour,
            separable=common.separable_for_geom(self.geom))

        # ONE XLA program per training iteration: the device augmentation of
        # every stream (sup warp+normalise, unsup warp+colour pair+masks) is
        # traced into the same jitted program as the algorithm step, so each
        # iteration is a single dispatch of raw uint8 canvases + matrices.
        algo_step = self.spec.make_step(self.model, self.tx, self.mesh)
        augmentor = self.augmentor
        spec = self.spec
        use_cons = self.algo_cfg.cons_weight > 0.0

        spatial_n = self.spatial_n
        mesh = self.mesh

        def fused_step(state, raw, scalars):
            if "data" in scalars:
                # resident store: materialise canvases from HBM inside the
                # program (raw parts carry only indices + geometry)
                from cutmix_seg_tpu.data.resident import gather_part

                raw = {
                    k: (gather_part(scalars["data"], v,
                                    with_labels=(k == "sup"))
                        if isinstance(v, dict) and "idx" in v else v)
                    for k, v in raw.items()}
            sup = augmentor.sup(raw["sup"])
            batch = {"sup_x": sup["image"], "sup_y": sup["labels"]}
            if use_cons:
                batch.update(spec.compose(augmentor, raw, scalars["key"]))
            if spatial_n > 1:
                # --spatial_train: re-lay the augmented crops batch-over-
                # 'data' x H-over-'model' so the conv stack (fwd AND bwd)
                # runs spatially partitioned — per-chip activation memory
                # ~1/n_model at high resolution. The raw canvases stay
                # data-sharded; only the fixed-size crop tensors reshard.
                # Leaf classification shares parallel/spatial.py's rule
                # (jit_spatial_step is the raw-tensor equivalent, proven
                # equal to data-parallel in tests/test_spatial.py).
                from jax.sharding import NamedSharding

                from cutmix_seg_tpu.parallel.spatial import (
                    _spatial_batch_spec,
                )
                batch = {
                    k: jax.lax.with_sharding_constraint(
                        v, NamedSharding(mesh, _spatial_batch_spec(mesh, v)))
                    for k, v in batch.items()}
            new_state, metrics = algo_step(state, batch, scalars["ramp"])
            # metrics accumulate ON DEVICE inside the same program: the epoch
            # loop carries running sums and fetches them once per epoch,
            # instead of ~3 x iters_per_epoch scalar D2H round-trips (each a
            # full dispatch latency on remote/tunnelled TPU hosts)
            msum = jax.tree_util.tree_map(jnp.add, scalars["msum"], metrics)
            return new_state, msum

        self.step = jit_sharded_step(fused_step, self.mesh)
        # Pre-place the state replicated on the mesh: otherwise the first
        # step call sees mesh-untagged avals and the second (whose state is a
        # jit output) sees mesh-tagged ones -> a silent second trace+compile
        # of the whole program.
        self.state = jax.device_put(self.state, replicated(self.mesh))

        # Multi-host: each process loads only its slice of the global batch
        # (independent per-host sample streams; shard_batch assembles the
        # global array from process-local data over DCN). Only the host-side
        # STREAM seeds differ per process — jit inputs declared replicated
        # (the colour key, ramp) must be bitwise identical on every process
        # or GSPMD's same-value assumption breaks.
        n_proc = jax.process_count()
        base_seed = p.get("seed", 0)
        seed = base_seed + jax.process_index() * 7919
        global_batch = p["batch_size"] * self.n_data
        self.global_batch = global_batch
        if global_batch % n_proc:
            raise ValueError(
                f"global batch {global_batch} not divisible by "
                f"{n_proc} processes")
        host_batch = global_batch // n_proc
        self.use_cons = self.algo_cfg.cons_weight > 0.0
        self._setup_resident(p)
        self._sup_builder = HostBatchBuilder(
            self.ds, self.geom, with_labels=True, n_threads=p["num_workers"],
            resident=self.resident)
        self._unsup_builder = (HostBatchBuilder(
            self.ds, self.geom, with_labels=False,
            pair_geom=self.spec.pair_geom, n_threads=p["num_workers"],
            resident=self.resident)
            if self.use_cons else None)
        self._host_batch = host_batch
        self._stream_seed = seed
        self._base_seed = base_seed
        # streams are (re)opened per epoch with epoch-folded seeds — see
        # _open_epoch_streams
        self.sup_stream = None
        self.streams = []

        print("Settings:")
        print(", ".join(f"{k}={self.p[k]}" for k in sorted(self.p)))
        print("Dataset:")
        print(f"len(sup_ndx)={len(self.sup_ndx)}")
        print(f"len(unsup_ndx)={len(self.unsup_ndx)}")
        print(f"len(val_ndx)={len(self.val_ndx)}")
        if self.test_ndx is not None:
            print(f"len(test_ndx)={len(self.test_ndx)}")
        if p["n_sup"] != -1:
            print(f"sup_ndx={self.sup_ndx.tolist()}")

        # (the colour key is derived per epoch in _open_epoch_streams)
        # multi-host: only the lead process writes artifacts (checkpoints,
        # metrics, exports) — every process still runs eval (collectives)
        self.is_lead = jax.process_index() == 0
        return True

    def _setup_resident(self, p):
        """Stage the training canvases in HBM when they fit (data/resident.py):
        per-iteration host->device traffic drops from ~canvas-bytes to a few
        KB of indices + matrices — the dominant cost on tunnelled TPU hosts."""
        from cutmix_seg_tpu.data import resident as res_mod

        self.resident = None
        mode = p.get("data_on_device", "auto")
        if mode not in ("auto", "on", "off"):
            raise ValueError(f"--data_on_device must be auto/on/off, got {mode}")
        if mode == "off":
            return
        if jax.process_count() > 1:
            if mode == "on":
                raise ValueError(
                    "--data_on_device on is single-process only (replicating "
                    "the store across DCN hosts is not supported); use auto/off")
            return
        need = (np.unique(np.concatenate([self.sup_ndx, self.unsup_ndx]))
                if self.use_cons else np.unique(self.sup_ndx))
        nbytes = res_mod.resident_nbytes(self.ds, len(need), True)
        if mode == "auto" and nbytes > res_mod.DEFAULT_MAX_BYTES:
            return
        self.resident = res_mod.ResidentDataset(
            self.ds, need, self.mesh, with_labels=True)
        print(f"Data on device: {len(need)} canvases "
              f"({nbytes / 1e6:.0f} MB) staged in HBM")

    def _open_epoch_streams(self, epoch_i: int):
        """(Re)open the host input streams with epoch-folded seeds.

        Host randomness — sample order, geometric/colour parameters — is a
        pure function of (seed, process, epoch); together with the
        checkpointed in-step PRNG (state.rng advances once per step), a
        --resume from an epoch-boundary checkpoint therefore reproduces the
        uninterrupted run BIT-EXACTLY, instead of replaying the epoch-0
        stream order (tests/test_trainer_e2e.py::
        test_resume_is_bit_exact_continuation).
        """
        self.close_streams()
        ep = common.epoch_stream_seed(self._stream_seed, epoch_i)
        self.sup_stream = train_stream(
            self._sup_builder, self.sup_ndx, self._host_batch, seed=ep + 10)
        if self.use_cons:
            ub = self._host_batch * self.p["unsup_batch_ratio"]
            for si in range(self.spec.unsup_streams):
                self.streams.append(train_stream(
                    self._unsup_builder, self.unsup_ndx, ub,
                    seed=ep + 20 + si * 10))
        self.colour_key = common.epoch_colour_key(self._base_seed, epoch_i)

    def close_streams(self):
        if getattr(self, "sup_stream", None) is not None:
            self.sup_stream.close()
        for s in getattr(self, "streams", ()):
            s.close()
        self.sup_stream = None
        self.streams = []

    # ---- batches ----
    def zero_metric_sums(self):
        """Device-side running-sum carry for the fused step's metrics. Every
        algorithm step returns sup_loss, plus cons_loss/conf_rate when the
        consistency branch is active (semisup/{mask_mt,ict,vat,aug_cons}.py).
        Pre-placed replicated on the mesh: like the train state, a host-side
        zero would make the first call's avals mesh-untagged and trigger a
        silent second trace+compile of the whole fused program."""
        from cutmix_seg_tpu.semisup.stepcore import accum_zero_metrics

        return jax.device_put(accum_zero_metrics(self.use_cons),
                              replicated(self.mesh))

    def next_key(self):
        self.colour_key, k = jax.random.split(self.colour_key)
        return k

    def make_raw_batch(self):
        """Host work only: pull decoded canvases + matrices off the streams
        and place them sharded; all per-pixel work happens inside the fused
        step program."""
        raw = {"sup": next(self.sup_stream)}
        if self.use_cons:
            raw.update(self.spec.fetch(self, self.streams))
        return shard_batch(self.mesh, raw)

    def eval_state(self):
        return self.state.teacher if self.mean_teacher else self.state.student

    # ---- the loop ----
    def run(self):
        if not self.setup():
            return
        # graceful preemption: preemptible TPU slots deliver SIGTERM with a
        # grace window. Single host: stop before dispatching the next
        # iteration. Multi-host (DCN pod): per-process flags are
        # uncoordinated — an asymmetric mid-epoch stop would wedge the other
        # hosts in a collective — so each host finishes the epoch and the
        # flags are allgathered ONCE PER EPOCH at the boundary; any host's
        # signal stops every host after the (checkpointed) epoch. Either
        # way the last epoch-boundary checkpoint resumes bit-exactly
        # (mid-epoch state is never saved; resume replays the whole epoch
        # deterministically, see _open_epoch_streams). The handler ONLY
        # sets the flag: print/Tee inside a signal handler can hit
        # CPython's BufferedWriter reentrancy guard.
        import signal

        self._preempted = False
        self._solo = jax.process_count() == 1

        def _on_term(signum, frame):
            self._preempted = True

        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_term)
        except ValueError:  # not the main thread: no preemption handling
            prev_handler = None
        try:
            self._run_epochs()
        except BaseException:
            self.close_streams()
            # join the writer but never let a checkpoint-IO error mask the
            # actual training failure
            try:
                ckpt.wait_pending_saves(self.ctx.checkpoint_dir)
            except Exception as e:
                print(f"WARNING: async checkpoint write also failed: {e}")
            raise
        else:
            self.close_streams()
            # normal end / NaN bail / preemption: join so no save is lost
            # or half-written
            ckpt.wait_pending_saves(self.ctx.checkpoint_dir)
        finally:
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)

    def _run_epochs(self):
        p = self.p
        print("Training...")
        for epoch_i in range(self.start_epoch, p["num_epochs"]):
            t1 = time.time()
            self._open_epoch_streams(epoch_i)
            ramp_val = sigmoid_rampup(epoch_i, p["rampup"]) if p["rampup"] > 0 else 1.0
            ramp = jnp.float32(ramp_val)

            msum = self.zero_metric_sums()
            n_steps = 0
            profile_dir = p.get("profile_dir") if epoch_i == self.start_epoch else None
            tracing = False
            for it in range(p["iters_per_epoch"]):
                # preemption check BEFORE dispatch: a signal during the last
                # step of an epoch lets the epoch finish (eval + checkpoint)
                # and stops at the next epoch's first iteration instead of
                # discarding completed work
                if self._solo and getattr(self, "_preempted", False):
                    if tracing:
                        jax.profiler.stop_trace()
                    print("PREEMPTED: stopped at epoch {} before iter {}; "
                          "the latest epoch-boundary checkpoint resumes "
                          "this run bit-exactly (--resume)".format(
                              epoch_i + 1, it + 1), flush=True)
                    return
                if profile_dir and it == 2:
                    # trace 3 steady-state REGULAR iterations (extra steps
                    # here would break the step-count-per-epoch invariant
                    # that bit-exact resume and start_epoch derivation need)
                    jax.profiler.start_trace(profile_dir)
                    tracing = True
                raw = self.make_raw_batch()
                scalars = {"ramp": ramp, "key": self.next_key(), "msum": msum}
                if self.resident is not None:
                    scalars["data"] = self.resident.device
                self.state, msum = self.step(self.state, raw, scalars)
                n_steps += 1
                if tracing and (it >= 4 or it == p["iters_per_epoch"] - 1):
                    jax.block_until_ready(msum)  # flush device activity
                    jax.profiler.stop_trace()
                    tracing = False
                    profile_dir = None
                if (it + 1) % p.get("nan_check_interval", 100) == 0:
                    # periodic host sync: a NaN in ANY step poisons the
                    # running sum, so checking the sum catches it
                    if common.check_nan(float(msum["sup_loss"])):
                        return

            # ONE D2H fetch of the tiny metric-sum dict per epoch
            m = {k: float(np.asarray(v)) / max(n_steps, 1)
                 for k, v in msum.items()}
            sup_loss_acc = m.get("sup_loss", 0.0)
            cons_loss_acc = m.get("cons_loss", 0.0)
            conf_rate_acc = m.get("conf_rate",
                                  ramp_val if p["rampup"] > 0 else 0.0)
            if common.check_nan(sup_loss_acc) or common.check_nan(cons_loss_acc):
                return

            iou = common.evaluate(
                self.model, self.eval_state(), self.ds, self.val_ndx,
                p["batch_size"], self.mesh, self.n_classes, self.mean,
                self.std, self.model.block_size, p["bin_fill_holes"],
                spatial=p.get("eval_spatial", False))
            miou = iou.mean()
            t2 = time.time()
            print(
                "Epoch {}: took {:.3f}s, TRAIN clf loss={:.6f}, consistency "
                "loss={:.6f}, conf rate={:.3%}, VAL mIoU={:.3%}".format(
                    epoch_i + 1, t2 - t1, sup_loss_acc, cons_loss_acc,
                    conf_rate_acc, miou))
            print("-- {}".format(", ".join(f"{x:.3%}" for x in iou)))

            if self.is_lead:
                self.ctx.log_metrics({
                    "epoch": epoch_i + 1, "sup_loss": sup_loss_acc,
                    "cons_loss": cons_loss_acc, "conf_rate": conf_rate_acc,
                    "val_miou": float(miou), "epoch_time": t2 - t1,
                    "images_per_sec":
                        p["iters_per_epoch"] * self.global_batch
                        / max(t2 - t1, 1e-9),
                })
                ci = max(1, int(p.get("checkpoint_interval", 1)))
                if ((epoch_i + 1) % ci == 0
                        or epoch_i + 1 == p["num_epochs"]):
                    # D2H fetch now; serialise+write overlap the next epoch
                    ckpt.save_checkpoint_async(
                        self.ctx.checkpoint_dir, self.state,
                        int(self.state.step))

            # epoch-boundary preemption check (both modes). Multi-host: the
            # per-host flags are allgathered once per epoch, so ANY host's
            # SIGTERM stops every host at this completed epoch boundary
            # (symmetric — no host is left waiting in a collective). Solo:
            # the local flag alone (a mid-epoch signal also stops at the
            # next iteration, above).
            stop = bool(getattr(self, "_preempted", False))
            if not self._solo:
                from jax.experimental import multihost_utils as mh

                stop = bool(mh.process_allgather(np.asarray(stop)).any())
            if stop:
                ci = max(1, int(p.get("checkpoint_interval", 1)))
                if self.is_lead and ((epoch_i + 1) % ci != 0
                                     and epoch_i + 1 != p["num_epochs"]):
                    # the interval would have skipped this epoch's save;
                    # stopping makes it the resume point, so save it
                    ckpt.save_checkpoint_async(
                        self.ctx.checkpoint_dir, self.state,
                        int(self.state.step))
                if epoch_i + 1 < p["num_epochs"]:
                    print("PREEMPTED: stopping after epoch "
                          f"{epoch_i + 1}; rerun with --resume", flush=True)
                    return
                # the signal landed during the FINAL epoch: everything is
                # trained — fall through to finalise() (model export,
                # save_preds, test eval) instead of discarding it

        self.finalise()

    # ---- final artifacts ----
    def finalise(self):
        p = self.p
        if p["save_model"] and self.is_lead:
            ckpt.export_params(
                os.path.join(self.ctx.run_dir, "model.msgpack"), self.eval_state())

        if p["save_preds"] or self.test_ndx is not None:
            from cutmix_seg_tpu.data.loader import eval_batches
            from cutmix_seg_tpu.eval.evaluator import make_sharded_predict_fn
            from cutmix_seg_tpu.train.common import _eval_raw_batch, eval_batch_size

            out_dir = (os.path.join(self.ctx.run_dir, "preds")
                       if p["save_preds"] and self.is_lead else None)
            if out_dir:
                os.makedirs(out_dir, exist_ok=True)
            if p.get("eval_spatial", False):
                # --eval_spatial runs exist because batch-parallel full-res
                # forwards don't fit / don't pay; the final test eval and
                # prediction export must honour it too
                from cutmix_seg_tpu.parallel.spatial import (
                    make_spatial_predict_fn,
                    pad_batch_h,
                    spatial_batch_axis_size,
                    spatial_h_axis_size,
                )

                sp_predict = make_spatial_predict_fn(
                    self.model, self.mean, self.std, self.mesh)
                h_mult = int(np.lcm(spatial_h_axis_size(self.mesh),
                                    self.model.block_size[0]))
                n_b = spatial_batch_axis_size(self.mesh)
                eval_bs = -(-p["batch_size"] // n_b) * n_b

                def predict(state, batch):
                    b = pad_batch_h(batch, h_mult)
                    return sp_predict(state, {
                        k: b[k] for k in ("canvas", "labels", "sizes")})

                place = lambda b: b  # spatial fns place host arrays themselves
            else:
                predict = make_sharded_predict_fn(
                    self.model, self.mean, self.std, self.mesh)
                eval_bs = eval_batch_size(p["batch_size"], self.mesh)
                place = lambda b: _eval_raw_batch(self.mesh, b)

            def predict_over(indices, evaluator=None):
                # every process joins the sharded forward; only the lead
                # writes PNGs (outputs are replicated so any host can fetch)
                for batch in eval_batches(self.ds, indices, eval_bs,
                                          self.model.block_size):
                    pred, y = predict(self.eval_state(), place(batch))
                    pred, y = np.asarray(pred), np.asarray(y)
                    for k in range(batch["count"]):
                        i = int(batch["indices"][k])
                        h, w = batch["sizes"][k]
                        if out_dir:
                            self.ds.save_prediction_by_index(
                                out_dir, pred[k, :h, :w], i)
                        if evaluator is not None:
                            evaluator.update_batch(pred[k: k + 1, :h, :w],
                                                   y[k: k + 1, :h, :w])

            if p["save_preds"]:
                predict_over(self.val_ndx)
            if self.test_ndx is not None:
                test_ev = EvaluatorIoU(self.n_classes, p["bin_fill_holes"])
                predict_over(self.test_ndx, test_ev)
                test_iou = test_ev.score()
                print("FINAL TEST: mIoU={:.3%}".format(test_iou.mean()))
                print("-- TEST {}".format(", ".join(f"{x:.3%}" for x in test_iou)))

        self.close_streams()


# ---- unsupervised batch composers ----
#
# Each algorithm is a (fetch, compose) pair: ``fetch`` runs on the host each
# iteration and returns raw loader batches; ``compose`` is traced into the
# fused step and performs the device augmentation.

def fetch_two_streams(engine: TrainEngine, streams):
    """mask_mt mix: one batch from each of the two unsup streams."""
    return {"u0": next(streams[0]), "u1": next(streams[1])}


def fetch_one_stream(engine: TrainEngine, streams):
    """mask_mt zero / VAT: a single unsup batch."""
    return {"u": next(streams[0])}


def fetch_ict(engine: TrainEngine, streams):
    """Two draws from ONE stream (reference: train_seg_semisup_ict.py:272-273)."""
    return {"u0": next(streams[0]), "u1": next(streams[0])}


def fetch_aug_pair(engine: TrainEngine, streams):
    """Paired geometry: the relative transform xf0->1 = grid(m1 . inv(m0))
    is composed on the host in float64 and rides along
    (reference: datapipe/seg_data.py:219-232)."""
    host = next(streams[0])
    xf_cv = host_affine.compose(
        host["m1"].astype(np.float64),
        host_affine.invert(host["m0"].astype(np.float64)))
    xf_grid = host_affine.cv_to_grid(xf_cv, engine.crop_hw).astype(np.float32)
    return {"pair": host, "xf_grid": xf_grid}


def compose_mask_pair(augmentor, raw, key):
    """mask_mt mix and ICT: augment two unsup batches (colour pair each)."""
    k0, k1 = jax.random.split(key)
    u0 = augmentor.unsup(raw["u0"], k0)
    u1 = augmentor.unsup(raw["u1"], k1)
    return dict(ux0_tea=u0["image"], ux0_stu=u0["image_stu"], um0=u0["mask"],
                ux1_tea=u1["image"], ux1_stu=u1["image_stu"], um1=u1["mask"])


def compose_mask_single(augmentor, raw, key):
    """mask_mt zero (Cutout) and VAT: one augmented unsup batch."""
    u = augmentor.unsup(raw["u"], key)
    return dict(ux_tea=u["image"], ux_stu=u["image_stu"], um=u["mask"])


def compose_aug_pair(augmentor, raw, key):
    """Two correlated crops of each image; colour jitter, when enabled,
    applies to element 1 only (the student; aug_mt.py:150-158)."""
    host = raw["pair"]
    b0 = dict(host, m=host["m0"], interp=host["interp0"])
    b1 = dict(host, m=host["m1"], interp=host["interp1"])
    u0 = _unsup_plain(augmentor, b0)  # teacher element: no colour jitter
    u1 = augmentor.unsup(b1, key)
    return dict(ux0=u0["image"], ux1=u1["image_stu"], um0=u0["mask"],
                um1=u1["mask"], xf0_to_1=raw["xf_grid"])


def _unsup_plain(augmentor, host_batch):
    """Unsup augmentation without the colour pair (teacher element)."""
    plain = dataclasses.replace(augmentor, colour=None)
    return plain.unsup(host_batch, None)
