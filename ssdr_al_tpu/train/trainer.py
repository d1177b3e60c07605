"""Training loop: one compiled step (pyramid + forward + loss + backward).

Re-design of Network.train / reset_lr / restore_model
(SSDR_AL_s3dis/RandLANet.py:106-117, 213-282):
  - Adam at lr 1e-2 with per-epoch exponential decay (×cfg.lr_decay, matching
    the lr_decays table in helper_tool.py:68)
  - activation-masked weighted CE (RandLANet.py:486-503)
  - per-round optimizer reset (reset_lr, RandLANet.py:213-215 — here a fresh
    optimizer state per round)
  - best-mIoU snapshot per round, `snap-<round>` (RandLANet.py:268-271)

TPU-native differences: the whole step is one jit'ed program (the reference
runs KNN on CPU workers and the model on GPU per step); data parallelism is
sharding the batch axis over a device mesh — gradients are reduced by XLA
from the sharding annotations, no hand-written collectives.
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from ssdr_al_tpu.config import Config, class_weights as get_class_weights
from ssdr_al_tpu.models.randlanet import (
    RandLANet,
    SortedPyramid,
    build_pyramid,
    label_reduce_table,
    masked_weighted_ce,
)


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def make_lr_schedule(cfg: Config, steps_per_epoch: int):
    """lr = lr0 · decay^epoch (helper_tool.py:66-68 + RandLANet.py:257-260)."""

    def schedule(step):
        epoch = step // steps_per_epoch
        return cfg.learning_rate * (cfg.lr_decay ** epoch)

    return schedule


def create_train_state(
    model: RandLANet, cfg: Config, rng, sample_batch: Dict[str, np.ndarray],
    steps_per_epoch: int,
) -> TrainState:
    @jax.jit
    def _init(rng, xyz, features):
        pyramid = build_pyramid(xyz, cfg)
        return model.init({"params": rng}, features, pyramid, False)

    variables = _init(
        rng, jnp.asarray(sample_batch["xyz"]),
        jnp.asarray(sample_batch["features"]),
    )
    tx = optax.adam(make_lr_schedule(cfg, steps_per_epoch))
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=tx,
    )


def reset_optimizer(state: TrainState, cfg: Config, steps_per_epoch: int) -> TrainState:
    """Per-round lr reset (RandLANet.py:213-215): fresh Adam + step counter."""
    tx = optax.adam(make_lr_schedule(cfg, steps_per_epoch))
    return TrainState.create(
        apply_fn=state.apply_fn,
        params=state.params,
        batch_stats=state.batch_stats,
        tx=tx,
    )


def _step_body(model, cfg, weights, table, knn_engine, state, xyz, features,
               labels, activation, pseudo, dropout_rng):
    """Shared train-step body (pyramid → loss → grads → update), used by
    both the host-batch step and the device-pool step."""
    pyramid = build_pyramid(xyz, cfg, engine=knn_engine)
    # sorted fast path: the CE loss averages over points, so instead of
    # unsorting 13+32 channels of logits/penultimate (two [B,N]-row
    # gathers + backward scatters, ~6 ms/step at B=6×40960) permute the
    # three 1-column label/mask inputs into sorted order
    sorted_mode = isinstance(pyramid, SortedPyramid)
    if sorted_mode:
        order = pyramid.order
        pseudo = jnp.take_along_axis(pseudo, order, axis=1)
        labels = jnp.take_along_axis(labels, order, axis=1)
        activation = jnp.take_along_axis(activation, order, axis=1)

    def loss_fn(params):
        (logits, _), new_state = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            features, pyramid, True,
            unsort=not sorted_mode,
            rngs={"dropout": dropout_rng},
            mutable=["batch_stats"],
        )
        loss, acc = masked_weighted_ce(
            logits, pseudo, activation, labels,
            weights, cfg.ignored_label_inds, table,
        )
        # activation is the widened f32 copy (sum is permutation-invariant)
        return loss, (acc, new_state["batch_stats"], activation.sum())

    (loss, (acc, new_bs, act_sum)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    state = state.apply_gradients(grads=grads)
    state = state.replace(batch_stats=new_bs)
    metrics = {"loss": loss, "accuracy": acc, "activation_sum": act_sum}
    return state, metrics


def make_train_step(model: RandLANet, cfg: Config,
                    weights: np.ndarray, knn_engine: str = "window"):
    table = (
        label_reduce_table(cfg.num_classes, cfg.ignored_label_inds)
        if cfg.ignored_label_inds else None
    )

    @jax.jit
    def train_step(state: TrainState, batch, rng):
        # widen narrow-transfer batches (shrink_train_batch) on device;
        # no-ops for full-width inputs
        xyz, features = widen_train_batch(batch)
        dropout_rng = jax.random.fold_in(rng, state.step)
        pseudo = batch["pseudo"].astype(jnp.int32)
        labels = batch["labels"].astype(jnp.int32)
        activation = batch["activation"].astype(jnp.float32)
        return _step_body(model, cfg, weights, table, knn_engine, state,
                          xyz, features, labels, activation, pseudo,
                          dropout_rng)

    return train_step


def make_pooled_train_step(model: RandLANet, cfg: Config,
                           weights: np.ndarray, knn_engine: str = "window",
                           window: int = 0):
    """Train step over a DeviceTrainPool: block extraction (distance sort +
    one payload row gather, train/device_pool.py) runs INSIDE the jit, so a
    fresh-blocks step transfers only [B] cloud ids + [B, 3] pick points —
    the host pipeline's 18 B/point upload (which serializes with device
    compute on this platform) disappears from the loop. window = the
    pool's static per-sample read width (pool.window)."""
    table = (
        label_reduce_table(cfg.num_classes, cfg.ignored_label_inds)
        if cfg.ignored_label_inds else None
    )
    from ssdr_al_tpu.train.device_pool import extract_blocks

    @jax.jit
    def pooled_step(state: TrainState, pool_args, cloud_ids, picks, rng):
        key = jax.random.fold_in(rng, state.step)
        ext_key, dropout_rng = jax.random.split(key)
        xyz, features, labels, activation, pseudo = extract_blocks(
            *pool_args, cloud_ids, picks, ext_key, cfg.num_points, window)
        return _step_body(model, cfg, weights, table, knn_engine, state,
                          xyz, features, labels, activation, pseudo,
                          dropout_rng)

    return pooled_step


def make_possibility_pooled_train_step(model: RandLANet, cfg: Config,
                                       weights: np.ndarray,
                                       knn_engine: str = "window",
                                       augment: bool = True,
                                       window: int = 0):
    """Train step over a PossibilityDevicePool (the Semantic3D train2
    path): the sequential possibility-scheduled batch assembly AND the
    training step run as one jit; the possibility field threads through as
    functional state. Per-step host traffic ≈ one RNG fold."""
    table = (
        label_reduce_table(cfg.num_classes, cfg.ignored_label_inds)
        if cfg.ignored_label_inds else None
    )
    from ssdr_al_tpu.train.possibility_pool import possibility_extract

    batch_size = cfg.batch_size
    sigma = cfg.noise_init / 10

    @jax.jit
    def pooled_step(state: TrainState, pool_args, class_weight, poss, rng):
        key = jax.random.fold_in(rng, state.step)
        ext_key, dropout_rng = jax.random.split(key)
        new_poss, xyz, features, labels, activation, pseudo = (
            possibility_extract(
                *pool_args, class_weight, poss, ext_key, batch_size,
                cfg.num_points, sigma, window, augment))
        state, metrics = _step_body(
            model, cfg, weights, table, knn_engine, state,
            xyz, features, labels, activation, pseudo, dropout_rng)
        return state, new_poss, metrics

    return pooled_step


def _quantize_cols(x: np.ndarray, qmax: int, dtype) -> tuple:
    """Per-channel affine quantization of x [B, N, C] to `dtype`
    (x ≈ lo + q·sc). lo/sc are returned tiled to [B, 1, C] so a
    data-parallel shard_batch can split their batch axis like any other
    leaf."""
    b, _, c = x.shape
    lo = x.min(axis=(0, 1))
    sc = np.maximum((x.max(axis=(0, 1)) - lo) / qmax, 1e-12)
    q = np.clip(np.rint((x - lo[None, None]) / sc[None, None]), 0, qmax)
    tile = lambda v: np.broadcast_to(  # noqa: E731
        v.astype(np.float32), (b, 1, c)).copy()
    return q.astype(dtype), tile(lo), tile(sc)


def shrink_train_batch(batch, cfg: Config, *, quantize=None):
    """Narrow the per-step host→device payload. The tunnel moves ~25-35 MB/s
    each way (measured): a fresh B=6×40960 float32 batch is ~11.8 MB
    (≈340 ms) — MORE than the ~165 ms device step, so a full-width host
    pipeline transfer-starves training.

    labels/pseudo→uint8 (num_classes ≤ 255), activation→uint8 {0,1}, and
    when quantizing, the coordinate payloads go affine-quantized
    (train_step dequantizes on device):
      xyz              → uint16 grid (≤0.08 mm error on a 10 m block — far
                         below the 0.04 m subsample grid and the morton
                         code's own 10-bit/axis quantization)
      features[:, :3]  → uint16 (the augmented xyz; finer than the bf16
                         cast the model applies anyway)
      features[:, 3:]  → uint8 (colors; prepared clouds store u8/255, so
                         the round-trip is exact up to one f32 rounding)
    48 → 18 B/point (u16 xyz 6 + u16 feat-xyz 6 + u8 colors 3 + 3×u8
    labels/pseudo/activation). quantize=None (default) auto-enables on
    bfloat16 configs only — float32 configs keep exact inputs for CPU
    oracles; quantize=True/False forces. Unquantized bfloat16 configs get
    the round-2 behavior (bf16 feature cast): 27 B/point."""
    import ml_dtypes

    out = dict(batch)
    if quantize is None:
        quantize = jnp.dtype(cfg.compute_dtype) == jnp.bfloat16
    # the quantized split assumes [aug-xyz | colors] features (all shipped
    # dataset configs); fall back to the bf16 cast for exotic widths
    quantize = quantize and batch["features"].shape[-1] > 3
    if quantize:
        xyz = np.asarray(batch["xyz"], np.float32)
        out["xyz"], out["xyz_lo"], out["xyz_sc"] = _quantize_cols(
            xyz, 65535, np.uint16)
        feats = np.asarray(batch["features"], np.float32)
        del out["features"]
        (out["feat_xyz"], out["feat_lo"], out["feat_sc"]) = _quantize_cols(
            feats[..., :3], 65535, np.uint16)
        (out["colors"], out["col_lo"], out["col_sc"]) = _quantize_cols(
            feats[..., 3:], 255, np.uint8)
    elif jnp.dtype(cfg.compute_dtype) == jnp.bfloat16:
        out["features"] = np.asarray(batch["features"]).astype(
            ml_dtypes.bfloat16)
    if cfg.num_classes <= 255:
        out["labels"] = np.asarray(batch["labels"]).astype(np.uint8)
        out["pseudo"] = np.asarray(batch["pseudo"]).astype(np.uint8)
    out["activation"] = np.asarray(batch["activation"]).astype(np.uint8)
    return out


def shrink_eval_batch(batch, cfg: Config):
    """Quantized inference upload (bfloat16 configs — the recommended TPU
    config; float32 configs keep full-width batches so CPU oracles see
    exact inputs): xyz → uint16 grid, colors → uint8. Inference features
    carry the UNAUGMENTED xyz in their first three channels, so the u16
    grid is uploaded once and reused (widen_train_batch fallback):
    36 B/point full-width → 9. The u16 grid error (≤0.1 mm on a 10 m
    block) is far below the bf16 cast the model applies to features."""
    if jnp.dtype(cfg.compute_dtype) != jnp.bfloat16 or "features" not in batch:
        return batch
    if batch["features"].shape[-1] <= 3:
        # colorless layouts can't take the quantized split — keep the bf16
        # feature cast (bit-exact: fc0 casts on device anyway)
        import ml_dtypes

        batch = dict(batch)
        batch["features"] = np.asarray(batch["features"]).astype(
            ml_dtypes.bfloat16)
        return batch
    batch = dict(batch)
    feats = np.asarray(batch.pop("features"), np.float32)
    xyz = np.asarray(batch["xyz"], np.float32)
    batch["xyz"], batch["xyz_lo"], batch["xyz_sc"] = _quantize_cols(
        xyz, 65535, np.uint16)
    if not np.array_equal(feats[..., :3], xyz):
        (batch["feat_xyz"], batch["feat_lo"], batch["feat_sc"]) = \
            _quantize_cols(feats[..., :3], 65535, np.uint16)
    (batch["colors"], batch["col_lo"], batch["col_sc"]) = _quantize_cols(
        feats[..., 3:], 255, np.uint8)
    return batch


def widen_train_batch(batch):
    """Device-side inverse of shrink_train_batch's quantization: returns
    (xyz f32, features f32) for full-width OR quantized batches (jit-safe —
    branches on dict keys/dtypes, not values)."""
    xyz = batch["xyz"]
    if xyz.dtype == jnp.uint16:
        xyz = batch["xyz_lo"] + xyz.astype(jnp.float32) * batch["xyz_sc"]
    if "features" in batch:
        feats = batch["features"]
    else:
        if "feat_xyz" in batch:
            fx = (batch["feat_lo"]
                  + batch["feat_xyz"].astype(jnp.float32) * batch["feat_sc"])
        else:
            # inference batches: feature-xyz == pyramid xyz (no
            # augmentation), so the shrink uploads the u16 grid once
            fx = xyz
        col = (batch["col_lo"]
               + batch["colors"].astype(jnp.float32) * batch["col_sc"])
        feats = jnp.concatenate([fx, col], axis=-1)
    return xyz, feats


def make_eval_step(model: RandLANet, cfg: Config, knn_engine: str = "window",
                   sorted_outputs: bool = False):
    """Inference: softmax probs + penultimate 32-d features (the tensors the
    reference exposes as prob_logits / last_second_features, RandLANet.py:84,38).

    sorted_outputs=True returns a third output `order` [B, N] int32 and, on
    sorted pyramids, keeps probs/penult in MORTON-SORTED row order (row r of
    the outputs is input row order[r]), skipping the two [B, N]-row head
    unsort gathers (~24 ns/point on this platform). Consumers permute their
    host-side index maps instead (InferenceRunner, Evaluator,
    simple_evaluate all handle the 3-tuple). On non-sorted pyramids (CPU /
    engine="xla") order is the identity."""

    @jax.jit
    def eval_step(state: TrainState, batch):
        # widen quantized inference batches (InferenceRunner._shrink_batch)
        # on device; no-op for full-width inputs
        xyz, features = widen_train_batch(batch)
        pyramid = build_pyramid(xyz, cfg, engine=knn_engine)
        sorted_mode = sorted_outputs and isinstance(pyramid, SortedPyramid)
        logits, penult = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            features, pyramid, False, unsort=not sorted_mode,
        )
        probs = jax.nn.softmax(logits, axis=-1)
        if not sorted_outputs:
            return probs, penult
        # uint16 when row indices fit (N ≤ 65536): the tunnel moves
        # ~35 MB/s, so the order payload halves for free
        b, n = xyz.shape[:2]
        odt = jnp.uint16 if n <= 65536 else jnp.int32
        if sorted_mode:
            order = pyramid.order.astype(odt)
        else:
            order = jnp.broadcast_to(
                jnp.arange(n, dtype=odt)[None], (b, n))
        return probs, penult, order

    return eval_step


# ----------------------------------------------------------- checkpointing ---


def save_checkpoint(path: str, state: TrainState):
    """Serialize params + batch_stats (the reference's tf.train.Saver
    equivalent, RandLANet.py:92-93). Optimizer state is deliberately NOT
    saved: the reference also restarts its optimizer each round."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {"params": state.params, "batch_stats": state.batch_stats}
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(payload))


def restore_checkpoint(path: str, state: TrainState) -> TrainState:
    payload = {"params": state.params, "batch_stats": state.batch_stats}
    with open(path, "rb") as f:
        payload = flax.serialization.from_bytes(payload, f.read())
    return state.replace(
        params=payload["params"], batch_stats=payload["batch_stats"]
    )


class Trainer:
    """Round-based trainer mirroring Network.train (RandLANet.py:217-282)."""

    def __init__(self, cfg: Config, dataset_name: str, *, save_dir: str,
                 seed_save_dir: Optional[str] = None,
                 knn_engine: str = "window", log_fn: Callable[[str], None] = print,
                 steps_per_epoch: Optional[int] = None, mesh=None):
        self.cfg = cfg
        self.dataset_name = dataset_name
        self.save_dir = save_dir
        self.seed_save_dir = seed_save_dir
        self.mesh = mesh  # optional jax.sharding.Mesh for data parallelism
        self.log = log_fn
        self.model = RandLANet(cfg)
        self.weights = get_class_weights(dataset_name)
        self.steps_per_epoch = steps_per_epoch or cfg.train_steps
        self.train_step = make_train_step(self.model, cfg, self.weights, knn_engine)
        self._pooled_steps = {}  # (pool_kind, augment) -> compiled step
        self._knn_engine = knn_engine
        # sorted outputs: on TPU the eval forward skips the two [B,N]-row
        # head unsort gathers; InferenceRunner/Evaluator permute host index
        # maps by the returned order instead
        self.eval_step = make_eval_step(
            self.model, cfg, knn_engine, sorted_outputs=True)
        self.state: Optional[TrainState] = None
        self._rng = jax.random.PRNGKey(0)

    # ------------------------------------------------------------ state ---
    def init_state(self, sample_batch):
        self._rng, init_rng = jax.random.split(self._rng)
        self.state = create_train_state(
            self.model, self.cfg, init_rng, sample_batch, self.steps_per_epoch
        )
        return self.state

    def snapshot_path(self, round_num: int, subdir: Optional[str] = None) -> str:
        d = os.path.join(self.save_dir, subdir) if subdir else self.save_dir
        return os.path.join(d, f"snap-{round_num}")

    def restore_model(self, round_num: int):
        """RandLANet.py:106-117: round 1 restores the seed snapshot (stored
        under the seed experiment's own saver dir, as the reference does)."""
        if round_num == 1 and self.seed_save_dir:
            path = os.path.join(self.seed_save_dir, "snap-1")
        else:
            path = self.snapshot_path(round_num)
        self.state = restore_checkpoint(path, self.state)
        self.log(f"Model restored from {path}")

    # ------------------------------------------------------------ train ---
    def train_round(self, round_num: int, batch_iter_fn,
                    evaluate_fn=None, *, max_epoch: Optional[int] = None,
                    snapshot_subdir: Optional[str] = None,
                    device_pool=None, batch_size: Optional[int] = None):
        """One AL round of training.

        batch_iter_fn(epoch) → iterable of batch dicts (host pipeline).
        evaluate_fn(eval_step, state) → (miou, oa); called after
        cfg.eval_start_frac of epochs, best snapshot kept (RandLANet.py:262-271).

        device_pool: an available DeviceTrainPool — blocks are then sampled
        ON DEVICE (steps_per_epoch fresh batches of `batch_size` per epoch;
        batch_iter_fn is ignored). Callers must have update_pseudo_gt()'d
        the pool for this round. Single-device path (the dp mesh keeps the
        host pipeline)."""
        cfg = self.cfg
        max_epoch = max_epoch or cfg.max_epoch
        state = self.state
        state = reset_optimizer(state, cfg, self.steps_per_epoch)
        best_miou, best_oa = 0.0, 0.0
        self._rng, step_rng = jax.random.split(self._rng)

        use_pool = device_pool is not None
        poss_pool = False
        if use_pool:
            from ssdr_al_tpu.train.possibility_pool import (
                PossibilityDevicePool,
            )

            poss_pool = isinstance(device_pool, PossibilityDevicePool)
            # the possibility schedule is sequential over the batch — its
            # scan can't shard the batch axis; dp keeps the host pipeline
            if poss_pool and self.mesh is not None:
                use_pool = False
        if use_pool:
            # key the compiled-step cache on pool type + augment: a later
            # round can swap pool kinds (S3DIS vs possibility) and the two
            # steps have different signatures
            step_key = (poss_pool,
                        device_pool.augment if poss_pool else None,
                        device_pool.window)
            if self._pooled_steps.get(step_key) is None:
                if poss_pool:
                    self._pooled_steps[step_key] = (
                        make_possibility_pooled_train_step(
                            self.model, cfg, self.weights, self._knn_engine,
                            augment=device_pool.augment,
                            window=device_pool.window))
                else:
                    self._pooled_steps[step_key] = make_pooled_train_step(
                        self.model, cfg, self.weights, self._knn_engine,
                        window=device_pool.window)
            pooled_step = self._pooled_steps[step_key]

        if self.mesh is not None:
            # data parallelism: replicate params, shard the batch axis —
            # XLA inserts the gradient reduction over ICI from the shardings
            from ssdr_al_tpu.parallel.mesh import replicated_sharding

            state = jax.device_put(state, replicated_sharding(self.mesh))

        # pool operands are static within a round (update_pseudo_gt bumps
        # the slab version between rounds) — fetch/replicate ONCE, not per
        # epoch: the dp broadcast of a budget-sized slab is hundreds of MB
        pool_args = None
        bsz = batch_size or cfg.batch_size
        put = lambda x: x  # noqa: E731
        if use_pool:
            if not poss_pool and self.mesh is not None:
                # dp pooled training: slab replicated (cached on the pool
                # per slab version), per-step ids and picks sharded on the
                # batch axis — GSPMD partitions the extraction (gathers are
                # shard-local against the replicated slab) and inserts the
                # gradient psum
                from ssdr_al_tpu.parallel.mesh import batch_sharding

                pool_args = device_pool.replicated_args(self.mesh)
                m = int(self.mesh.devices.size)
                if bsz % m:
                    new_bsz = max(1, bsz // m) * m
                    self.log(
                        f"dp pooled training: batch {bsz} not divisible by "
                        f"mesh size {m} — rounding to {new_bsz}")
                    bsz = new_bsz
                sh = batch_sharding(self.mesh)
                put = lambda x: jax.device_put(x, sh)  # noqa: E731
            else:
                pool_args = device_pool.device_args()

        for epoch in range(max_epoch):
            t0 = time.time()
            losses, accs, act_sum = [], [], 0.0
            # `metrics` must survive a zero-step epoch (steps_per_epoch=0 or
            # an empty batch_iter): the act_sum read below otherwise depends
            # on whichever of the three loops ran last (ADVICE r4)
            metrics = {"activation_sum": 0.0, "loss": jnp.zeros(()),
                       "accuracy": jnp.zeros(())}
            if use_pool and poss_pool:
                poss = getattr(device_pool, "_poss_state", None)
                if poss is None:
                    poss = device_pool.init_possibility
                for _ in range(self.steps_per_epoch):
                    state, poss, metrics = pooled_step(
                        state, pool_args, device_pool.class_weight, poss,
                        step_rng)
                    losses.append(metrics["loss"])
                    accs.append(metrics["accuracy"])
                device_pool._poss_state = poss
                batch_iter = ()
            elif use_pool:
                for _ in range(self.steps_per_epoch):
                    ids, picks = device_pool.sample_indices(bsz)
                    state, metrics = pooled_step(
                        state, pool_args, put(ids), put(picks), step_rng)
                    losses.append(metrics["loss"])
                    accs.append(metrics["accuracy"])
                batch_iter = ()
            else:
                batch_iter = batch_iter_fn(epoch)
            for batch in batch_iter:
                batch = shrink_train_batch(batch, cfg)
                if self.mesh is not None:
                    from ssdr_al_tpu.parallel.mesh import shard_batch

                    batch = shard_batch(batch, self.mesh)
                state, metrics = self.train_step(state, batch, step_rng)
                losses.append(metrics["loss"])
                accs.append(metrics["accuracy"])
            act_sum = float(metrics["activation_sum"])
            if not losses:  # zero-step epoch: nothing to average
                losses, accs = [jnp.zeros(())], [jnp.zeros(())]
            self.log(
                f"Round {round_num} | epoch={epoch} "
                f"L_out={float(jnp.mean(jnp.stack(losses))):.3f} "
                f"Acc={float(jnp.mean(jnp.stack(accs))):.2f} "
                f"train costTime={time.time() - t0:.1f}s "
                f"activation_sum={act_sum:.0f}"
            )
            if evaluate_fn is not None and epoch + 1 >= int(max_epoch * cfg.eval_start_frac):
                t1 = time.time()
                self.state = state
                miou, oa = evaluate_fn(self.eval_step, state)
                if miou > best_miou:
                    best_miou, best_oa = miou, oa
                    save_checkpoint(
                        self.snapshot_path(round_num, snapshot_subdir), state
                    )
                self.log(
                    f"Round {round_num} | Best m_IoU is: {best_miou:.3f}, "
                    f"OA is: {best_oa:.3f} | val costTime={time.time() - t1:.1f}s"
                )
        self.state = state
        if evaluate_fn is None:
            save_checkpoint(self.snapshot_path(round_num, snapshot_subdir), state)
        return best_miou, best_oa
