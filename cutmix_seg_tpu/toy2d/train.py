"""Toy-2D semi-supervised trainer (Figure-3 experiments).

Re-derivation of the reference's toy2d_train.py: MLP on 2D points with
Gaussian-perturbation consistency, optional distance-map contour gating, and
per-epoch decision-boundary renders. TPU-native differences: the whole
iteration (sup CE + consistency + Adam + EMA) is ONE jitted step with a single
combined gradient — which is exactly what the reference does here too
(toy2d_train.py:401-412, single backward, unlike the seg trainers); renders
are saved with PIL instead of cv2 windows.

Model variants (reference: toy2d_train.py:355-366):
  mean_teacher — EMA teacher provides no-grad targets;
  pi           — the target branch is a second student forward WITH gradient;
  pi_onebatch  — both branches through one concatenated forward.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import click
import jax
import jax.numpy as jnp
import numpy as np
import optax

from cutmix_seg_tpu.core import job
from cutmix_seg_tpu.core.train_state import ModelState
from cutmix_seg_tpu.semisup.ema import ema_update
from cutmix_seg_tpu.toy2d import data as toy_data
from cutmix_seg_tpu.toy2d.model import ToyMLP


def _sample_dist_map(dist_map, pts_yx):
    """Bilinear point sampling of the signed distance map with torch
    grid_sample default semantics (align_corners=False, zeros padding;
    reference: toy2d_train.py:174-206). pts_yx are in [-1, 1] real space."""
    h, w = dist_map.shape
    # real [-1,1] -> pixel coords, align_corners=False convention
    px = ((pts_yx[:, 1] + 1.0) * w - 1.0) / 2.0
    py = ((pts_yx[:, 0] + 1.0) * h - 1.0) / 2.0
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    fx = px - x0
    fy = py - y0

    def tap(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = dist_map[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inb, v, 0.0)

    top = tap(y0, x0) * (1 - fx) + tap(y0, x0 + 1) * fx
    bot = tap(y0 + 1, x0) * (1 - fx) + tap(y0 + 1, x0 + 1) * fx
    return top * (1 - fy) + bot * fy


def _robust_bce(pred, tgt):
    return -(tgt * jnp.log(pred + 1e-6) + (1 - tgt) * jnp.log(1 - pred + 1e-6))


class Toy2DAlgo:
    """The toy2d algorithm core — forward wrapper, confidence/dist-map
    gating, consistency menu, the ONE fused train step, prediction and the
    Figure-3 gradient-magnitude probe — at module level so the shipped step
    is executable outside the CLI trainer (in particular by the
    live-reference trajectory differential). Semantics unchanged from the
    previous in-trainer closures (reference: toy2d_train.py:146-206,
    233-278,325-443)."""

    def __init__(self, net, tx, *, model, cons_weight, cons_loss_fn,
                 cons_no_dropout, conf_thresh, conf_avg, teacher_alpha,
                 pstd_real, dist_contour_range=0.0, dist_map=None):
        self.net = net
        self.tx = tx
        self.model = model
        self.mean_teacher = model == "mean_teacher"
        self.cons_weight = cons_weight
        self.cons_loss_fn = cons_loss_fn
        self.use_dropout_cons = not cons_no_dropout
        self.conf_thresh = conf_thresh
        self.conf_avg = conf_avg
        self.teacher_alpha = teacher_alpha
        self.pstd_real = jnp.asarray(pstd_real, jnp.float32)
        self.dist_contour_range = dist_contour_range
        self.dist_map = dist_map
        self.train_step = jax.jit(self._train_step)
        self.predict = jax.jit(self._predict)

    def fwd(self, params, stats, x, *, train, use_dropout, drop_key):
        variables = {"params": params}
        has_stats = bool(stats)
        if has_stats:
            variables["batch_stats"] = stats
        rngs = {"dropout": drop_key} if drop_key is not None else None
        if train and has_stats:
            out, upd = self.net.apply(variables, x, train=train,
                                      use_dropout=use_dropout,
                                      mutable=["batch_stats"], rngs=rngs)
            return out, upd["batch_stats"]
        return self.net.apply(variables, x, train=train,
                              use_dropout=use_dropout, rngs=rngs), stats

    def conf_factor(self, prob_tea):
        conf = prob_tea.max(axis=1)
        fac = ((conf >= self.conf_thresh).astype(jnp.float32)
               if self.conf_thresh > 0.0 else jnp.ones_like(conf))
        if self.conf_avg:
            fac = jnp.ones_like(fac) * fac.mean()
        return fac

    def dist_weight(self, xu, xu1):
        if self.dist_map is None or self.dist_contour_range <= 0:
            return jnp.ones((xu.shape[0],), jnp.float32)
        d0 = _sample_dist_map(self.dist_map, xu)
        d1 = _sample_dist_map(self.dist_map, xu1)
        return ((d0 - d1) ** 2
                <= self.dist_contour_range ** 2).astype(jnp.float32)

    def cons_terms(self, stu_logits, tea_logits, mod_fac, weight):
        p_stu = jax.nn.softmax(stu_logits, axis=1)
        p_tea = jax.nn.softmax(tea_logits, axis=1)
        if self.cons_loss_fn == "bce":
            per = _robust_bce(p_stu, p_tea).mean(axis=1)
        elif self.cons_loss_fn == "var":
            d = p_stu - p_tea
            per = (d * d).mean(axis=1)
        elif self.cons_loss_fn == "logits_var":
            d = stu_logits - tea_logits
            per = (d * d).mean(axis=1)
        else:
            raise ValueError(self.cons_loss_fn)
        return (per * mod_fac).sum() / jnp.maximum(weight.sum(), 1e-12)

    def _train_step(self, student, teacher, opt_state, key, sup_x, sup_y,
                    unsup_x):
        key, k_noise, k_d1, k_d2, k_d3 = jax.random.split(key, 5)
        unsup_x1 = unsup_x + jax.random.normal(
            k_noise, unsup_x.shape) * self.pstd_real[None, :]

        tea_model = teacher if self.mean_teacher else None
        use_dropout_cons = self.use_dropout_cons

        def loss_fn(params):
            stats = student.batch_stats
            sup_logits, stats = self.fwd(params, stats, sup_x, train=True,
                                         use_dropout=True, drop_key=k_d1)
            logp = jax.nn.log_softmax(sup_logits, axis=1)
            sup_loss = -jnp.take_along_axis(
                logp, sup_y[:, None], axis=1).mean()

            metrics = {"sup_loss": sup_loss}
            total = sup_loss
            if self.cons_weight > 0.0:
                if self.mean_teacher:
                    tea_logits, _ = self.fwd(
                        tea_model.params, tea_model.batch_stats, unsup_x,
                        train=True, use_dropout=use_dropout_cons,
                        drop_key=k_d2)
                    tea_logits = jax.lax.stop_gradient(tea_logits)
                    stu_logits, stats = self.fwd(
                        params, stats, unsup_x1, train=True,
                        use_dropout=use_dropout_cons, drop_key=k_d3)
                elif self.model == "pi":
                    # both branches through the student, gradient flows
                    tea_logits, stats = self.fwd(
                        params, stats, unsup_x, train=True,
                        use_dropout=use_dropout_cons, drop_key=k_d2)
                    stu_logits, stats = self.fwd(
                        params, stats, unsup_x1, train=True,
                        use_dropout=use_dropout_cons, drop_key=k_d3)
                else:  # pi_onebatch
                    both = jnp.concatenate([unsup_x, unsup_x1], axis=0)
                    logits, stats = self.fwd(
                        params, stats, both, train=True,
                        use_dropout=use_dropout_cons, drop_key=k_d2)
                    tea_logits = logits[: unsup_x.shape[0]]
                    stu_logits = logits[unsup_x.shape[0]:]

                weight = self.dist_weight(unsup_x, unsup_x1)
                p_tea = jax.nn.softmax(
                    jax.lax.stop_gradient(tea_logits), axis=1)
                cfac = self.conf_factor(p_tea)
                mod_fac = cfac * weight
                cons_loss = self.cons_terms(stu_logits, tea_logits,
                                            mod_fac, weight)
                total = total + cons_loss * self.cons_weight
                metrics["cons_loss"] = cons_loss
                metrics["conf_sum"] = cfac.sum()
            return total, (stats, metrics)

        grads, (new_stats, metrics) = jax.grad(loss_fn, has_aux=True)(
            student.params)
        updates, opt_state = self.tx.update(grads, opt_state, student.params)
        new_params = optax.apply_updates(student.params, updates)
        new_student = ModelState(params=new_params, batch_stats=new_stats)
        new_teacher = (ema_update(teacher, new_student, self.teacher_alpha)
                       if self.mean_teacher else teacher)
        return new_student, new_teacher, opt_state, key, metrics

    def _predict(self, model_state, x):
        logits, _ = self.fwd(model_state.params, model_state.batch_stats, x,
                             train=False, use_dropout=True, drop_key=None)
        return logits

    def cons_grad_mag(self, model_state, student, x, key):
        """|d cons_loss / d student logits| per point, for the Figure-3
        gradient render (reference: toy2d_train.py:233-278)."""
        k_noise, k_d = jax.random.split(key)
        x1 = x + jax.random.normal(k_noise, x.shape) * self.pstd_real[None, :]
        tea_logits = self.predict(model_state, x)
        weight = self.dist_weight(x, x1)
        p_tea = jax.nn.softmax(tea_logits, axis=1)
        mod_fac = self.conf_factor(p_tea) * weight

        def loss_of_logits(stu_logits):
            return self.cons_terms(stu_logits, tea_logits, mod_fac, weight)

        stu_logits = self.predict(student, x1)
        g = jax.grad(loss_of_logits)(stu_logits)
        return jnp.sqrt((g * g).sum(axis=1))


def train_toy2d(ctx: job.RunContext, dataset, region_erode_radius,
                img_noise_std, n_sup, balance_classes, seed, sup_path, model,
                n_hidden, hidden_size, hidden_act, norm_layer,
                perturb_noise_std, dist_contour_range, conf_thresh, conf_avg,
                cons_weight, cons_loss_fn, cons_no_dropout, learning_rate,
                teacher_alpha, num_epochs, batch_size, render_cons_grad,
                render_pred, save_output):
    import optax

    settings = {k: v for k, v in locals().items()
                if k not in ("ctx", "optax")}
    print("Settings:")
    print(", ".join(f"{k}={settings[k]}" for k in sorted(settings)))

    rng_np = np.random.RandomState(seed)

    # ---- dataset ----
    if dataset.startswith("img:"):
        ds = toy_data.classification_dataset_from_image(
            dataset[4:], region_erode_radius, img_noise_std, n_sup,
            balance_classes, rng_np)
        image = ds.image
    elif dataset == "spiral":
        ds = toy_data.spiral_classification_dataset(n_sup, balance_classes, rng_np)
        image = None
    else:
        print(f"Unknown dataset {dataset}, should be spiral or img:<path>")
        return
    if sup_path is not None:
        ds.load_supervised(sup_path)

    dist_map = None
    if dist_contour_range > 0.0:
        if image is None:
            print("Constraining perturbations to lying on distance map "
                  "contours is only supported for 'image' experiments")
            return
        from scipy.ndimage import distance_transform_edt

        img1 = image >= 0.5
        dist_map = (distance_transform_edt(img1) * img1
                    - distance_transform_edt(~img1) * (~img1))
        dist_map = jnp.asarray(dist_map, jnp.float32)

    try:
        pstd = np.array([float(x.strip()) for x in perturb_noise_std.split(",")])
    except ValueError:
        pstd = np.array([6.0, 6.0])
    if pstd.size == 1:
        pstd = np.repeat(pstd, 2)
    pstd_real = jnp.asarray(pstd / ds.img_scale * 2.0, jnp.float32)

    # ---- model / state ----
    net = ToyMLP(n_hidden=n_hidden, hidden_size=hidden_size,
                 hidden_act=hidden_act, norm_layer=norm_layer)
    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    variables = net.init({"params": k_init}, jnp.zeros((2, 2)), train=False)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    student = ModelState(params=params, batch_stats=stats)
    teacher = (ModelState(params=jax.tree_util.tree_map(jnp.copy, params),
                          batch_stats=jax.tree_util.tree_map(jnp.copy, stats))
               if model == "mean_teacher" else None)

    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    algo = Toy2DAlgo(net, tx, model=model, cons_weight=cons_weight,
                     cons_loss_fn=cons_loss_fn,
                     cons_no_dropout=cons_no_dropout,
                     conf_thresh=conf_thresh, conf_avg=conf_avg,
                     teacher_alpha=teacher_alpha, pstd_real=pstd_real,
                     dist_contour_range=dist_contour_range,
                     dist_map=dist_map)
    mean_teacher = algo.mean_teacher
    train_step = algo.train_step
    predict = algo.predict

    def pred_state():
        return teacher if mean_teacher else student

    def cons_grad_mag(model_state, x, key):
        return algo.cons_grad_mag(model_state, student, x, key)

    # ---- rendering ----
    def render(key):
        grid = jnp.asarray(ds.px_grid_vis, jnp.float32)
        logits = predict(pred_state(), grid)
        if render_pred == "prob":
            vis = np.asarray(jax.nn.softmax(logits, axis=1)[:, 1])
        elif render_pred == "class":
            vis = np.asarray(jnp.argmax(logits, axis=1))
        else:
            raise ValueError(render_pred)
        grad_vis = (np.asarray(cons_grad_mag(pred_state(), grid, key))
                    if render_cons_grad else None)
        return ds.semisup_image_plot(vis, grad_vis)

    def save_render(epoch, key):
        if save_output and ctx.run_dir is not None:
            from PIL import Image

            path = os.path.join(ctx.run_dir, f"epoch_{epoch:05d}.png")
            Image.fromarray(render(key)).save(path)

    key, k_r = jax.random.split(key)
    save_render(0, k_r)

    # ---- training ----
    print(f"|sup|={len(ds.sup_X)}")
    print(f"|unsup|={len(ds.unsup_X)}")
    print(f"|all|={len(ds.X)}")
    print("Training...")

    sup_X = np.asarray(ds.sup_X, np.float32)
    sup_y = np.asarray(ds.sup_y, np.int32)
    unsup_X = np.asarray(ds.unsup_X, np.float32)
    n_unsup = len(unsup_X)
    iters = max(n_unsup // batch_size, 1)

    for epoch in range(num_epochs):
        t1 = time.time()
        order = rng_np.permutation(n_unsup)
        sup_acc = cons_acc = conf_acc = n_acc = 0.0
        metric_list = []
        for it in range(iters):
            u_idx = order[it * batch_size:(it + 1) * batch_size]
            s_idx = rng_np.randint(0, len(sup_X), size=min(batch_size, len(sup_X)))
            student, teacher, opt_state, key, metrics = train_step(
                student, teacher, opt_state, key,
                jnp.asarray(sup_X[s_idx]), jnp.asarray(sup_y[s_idx]),
                jnp.asarray(unsup_X[u_idx]))
            metric_list.append((metrics, len(s_idx)))
        for metrics, nb in metric_list:
            sup_acc += float(metrics["sup_loss"])
            cons_acc += float(metrics.get("cons_loss", 0.0))
            conf_acc += float(metrics.get("conf_sum", 0.0))
            n_acc += nb
        if n_acc > 0:
            sup_acc /= n_acc
            cons_acc /= n_acc
            conf_acc /= n_acc

        key, k_r = jax.random.split(key)
        save_render(epoch + 1, k_r)
        t2 = time.time()
        print("Epoch {}: took {:.3f}s: clf loss={:.6f}, conf rate={:.3%}, "
              "cons loss={:.6f}".format(epoch + 1, t2 - t1, sup_acc,
                                        conf_acc, cons_acc))
        ctx.log_metrics({"epoch": epoch + 1, "sup_loss": sup_acc,
                         "cons_loss": cons_acc, "conf_rate": conf_acc})

    # ---- final error over all points ----
    all_X = np.asarray(ds.X, np.float32)
    preds = []
    for start in range(0, len(all_X), 16384):
        logits = predict(pred_state(), jnp.asarray(all_X[start:start + 16384]))
        preds.append(np.asarray(jnp.argmax(logits, axis=1)))
    all_pred = np.concatenate(preds)
    err = (all_pred != ds.y).mean()
    print("FINAL RESULT: Error rate={:.6%} (supervised and unsupervised "
          "samples)".format(err))
    return err


@click.command()
@click.option("--job_desc", type=str, default="")
@click.option("--dataset", type=str, default="spiral")
@click.option("--region_erode_radius", type=int, default=35)
@click.option("--img_noise_std", type=float, default=2.0)
@click.option("--n_sup", type=int, default=10)
@click.option("--balance_classes", is_flag=True, default=False)
@click.option("--seed", type=int, default=12345)
@click.option("--sup_path", type=click.Path(dir_okay=False, exists=True))
@click.option("--model", type=click.Choice(["mean_teacher", "pi", "pi_onebatch"]),
              default="mean_teacher")
@click.option("--n_hidden", type=int, default=3)
@click.option("--hidden_size", type=int, default=512)
@click.option("--hidden_act", type=click.Choice(["relu", "lrelu"]), default="relu")
@click.option("--norm_layer", type=click.Choice(
    ["none", "batch_norm", "weight_norm", "spectral_norm", "group_norm"]),
    default="batch_norm")
@click.option("--perturb_noise_std", type=str, default="6.0")
@click.option("--dist_contour_range", type=float, default=0.0)
@click.option("--conf_thresh", type=float, default=0.97)
@click.option("--conf_avg", is_flag=True, default=False)
@click.option("--cons_weight", type=float, default=10.0)
@click.option("--cons_loss_fn", type=click.Choice(["var", "bce", "logits_var"]),
              default="var")
@click.option("--cons_no_dropout", is_flag=True, default=False)
@click.option("--learning_rate", type=float, default=2e-4)
@click.option("--teacher_alpha", type=float, default=0.99)
@click.option("--num_epochs", type=int, default=100)
@click.option("--batch_size", type=int, default=512)
@click.option("--render_cons_grad", is_flag=True, default=False)
@click.option("--render_pred", type=click.Choice(["class", "prob"]),
              default="prob")
@click.option("--save_output", is_flag=True, default=False)
def experiment(job_desc, **params):
    job.submit("toy2d_train", job_desc, train_toy2d, params)


if __name__ == "__main__":
    experiment()
