"""pjit train/eval step builders (the reference's single-GPU loop body,
train.py:202-244, as a global SPMD program).

Design (SURVEY.md §2.2 TPU-native table):
  * one jitted step, donated state, batch dim sharded over the 'data' mesh
    axis, params/opt-state replicated (pure DP at this model scale);
  * gradients, loss means, and BatchNorm batch statistics are written as
    global reductions — GSPMD inserts the ICI collectives (psum) itself;
  * uint8 clips are normalized on device inside the step (fused into the
    stem conv's input);
  * stream freezing (avformer.py:78-85 freezes the pretrained A/V streams)
    is an optax mask: frozen subtrees get zero updates, exactly like
    requires_grad=False under Adam.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import Config
from ..losses import LossSuite
from ..ops.preprocess import normalize_clip, random_flip_clips

# subtrees frozen when training avformer with pretrained streams
# (reference avformer.py:78-85: whole audio_model + video_model frozen,
# only the fusion au_head trains)
FROZEN_PREFIXES = {"avformer": ("audio_model", "video_model")}


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            batch_stats=new_batch_stats,
                            opt_state=new_opt)


def trainable_mask(params, frozen_prefixes: tuple[str, ...]):
    """optax mask pytree: True = train, False = frozen."""
    def mark(path_root, tree):
        frozen = path_root in frozen_prefixes
        return jax.tree_util.tree_map(lambda _: not frozen, tree)
    return {k: mark(k, v) for k, v in params.items()}


def make_optimizer(cfg: Config, params=None) -> optax.GradientTransformation:
    """Adam(lr, weight_decay) as in the reference (train.py:334: torch Adam
    with weight_decay = L2-into-gradient, NOT adamw), with the *intended*
    x0.1 decay at epochs 30/60 as an optional schedule (the reference
    computes it but never applies it, train.py:181-185 — enable with
    cfg.lr_schedule), plus optional warmup and global-norm clipping for the
    parsed-but-dead flags (opts.py:21-24)."""
    def lr(step):
        base = cfg.learning_rate
        if cfg.lr_schedule and cfg.steps_per_epoch:
            epoch = step // max(cfg.steps_per_epoch, 1)
            base = base * jnp.where(epoch >= 60, 0.01,
                                    jnp.where(epoch >= 30, 0.1, 1.0))
        if cfg.n_warmup_steps > 0:
            base = base * jnp.minimum(1.0, (step + 1) / cfg.n_warmup_steps)
        return base

    chain = []
    if cfg.grad_clip and cfg.grad_clip > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))
    if cfg.weight_decay:
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    chain.append(optax.scale_by_adam())
    chain.append(optax.scale_by_learning_rate(lr))
    tx = optax.chain(*chain)

    frozen = FROZEN_PREFIXES.get(cfg.model_name)
    if frozen and params is not None:
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            param_labels=jax.tree_util.tree_map(
                lambda t: "train" if t else "frozen",
                trainable_mask(params, frozen)))
    return tx


def create_train_state(cfg: Config, model, variables) -> TrainState:
    tx = make_optimizer(cfg, variables["params"])
    if jax.default_backend() == "cpu":
        opt_state = tx.init(variables["params"])
    else:
        # eager optax init dispatches one op per param leaf — slow through
        # a device RPC tunnel; one jitted program hits the compile cache
        opt_state = jax.jit(tx.init)(variables["params"])
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params=variables["params"],
                      batch_stats=variables.get("batch_stats", {}),
                      opt_state=opt_state, tx=tx)


def gather_arena_windows(arena: jax.Array, ofs: jax.Array,
                         n_valid: jax.Array, sample_len: int) -> jax.Array:
    """(B,) int32 arena offsets + valid counts -> (B, sample_len) float32
    left-aligned windows, bitwise equal to the host-built buffers of
    ``Aff2CompDataset.get_audio_window`` (zeros past n_valid; a slice that
    crosses a video boundary in the packed arena is masked back to zero,
    so no inter-video padding is required)."""
    def win(o):
        return jax.lax.dynamic_slice(arena, (o,), (sample_len,))

    raw = jax.vmap(win)(ofs.reshape(-1).astype(jnp.int32))
    keep = (jnp.arange(sample_len, dtype=jnp.int32)[None, :]
            < n_valid.reshape(-1, 1).astype(jnp.int32))
    return raw * keep.astype(raw.dtype)


def prep_batch(batch: dict, train: bool, flip_rng=None,
               device_augment: bool = False, aug_rng=None,
               device_audio: bool = False, arena=None,
               sample_len: int = 441000) -> dict:
    """Device-side preprocessing: optional on-device AutoAugment (uint8
    domain), then /255+normalize; optional train-time whole-clip flip (eval
    never augments); optional on-device mel frontend (``device_audio``:
    the loader ships raw left-aligned windows + valid lengths instead of
    host-computed log-mels — ops.audio.reflect_end_patch + left-aligned
    audio_frontend reproduce the reference's per-window features exactly
    for windows >= 513 samples). With ``arena`` (an HBM-resident packed
    wav buffer, data/wav_arena.py) the batch carries int32 ``audio_ofs``
    instead of raw windows and the gather happens here."""
    x = dict(batch)
    if device_audio and "audio_features" not in x and "audio_ofs" in x \
            and "audio_len" in x and arena is not None:
        from ..ops.audio import HOP_LENGTH, audio_frontend, reflect_end_patch
        raw = gather_arena_windows(arena, x["audio_ofs"], x["audio_len"],
                                   sample_len)
        n_valid = x["audio_len"].reshape(-1).astype(jnp.int32)
        raw = reflect_end_patch(raw, n_valid)
        x["audio_features"] = audio_frontend(
            raw, feature_len=1 + n_valid // HOP_LENGTH, left_aligned=True)
    elif device_audio and "audio_features" not in x and "audio" in x \
            and "audio_len" in x:
        from ..ops.audio import HOP_LENGTH, audio_frontend, reflect_end_patch
        raw = x["audio"][:, 0, :].astype(jnp.float32)
        n_valid = x["audio_len"].reshape(-1).astype(jnp.int32)
        raw = reflect_end_patch(raw, n_valid)
        x["audio_features"] = audio_frontend(
            raw, feature_len=1 + n_valid // HOP_LENGTH, left_aligned=True)
    clip = x.get("clip")
    if clip is not None and clip.dtype == jnp.uint8:
        if train and device_augment and aug_rng is not None \
                and clip.shape[-1] == 3:
            from ..ops.augment_device import augment_clips_device
            clip = augment_clips_device(clip, aug_rng)
        clip = normalize_clip(clip)
        if train and flip_rng is not None:
            clip = random_flip_clips(clip, flip_rng)
        x["clip"] = clip
    return x


def _labels_of(batch):
    ex = batch["EX"].reshape(-1).astype(jnp.int32)
    ex = jnp.where(ex == -1, 7, ex)  # train.py:126,208 remap
    return {"AU": batch["AU"].astype(jnp.float32),
            "EX": ex,
            "VA": batch["VA"].astype(jnp.float32)}


def task_loss(suite: LossSuite, task: str, out, labels):
    t = task.lower()
    if t == "ex":
        return suite.get_ex_loss(out, labels["EX"]), {}
    if t == "au":
        return suite.get_au_loss(out, labels["AU"]), {}
    if t == "va":
        return suite.get_va_loss(out, labels["VA"]), {}
    lex, lau, lva = suite.get_mt_loss(out, labels)
    # multi-task weighting 3*EX + AU + VA (train.py:230)
    return 3.0 * lex + lau + lva, {"ex": lex, "au": lau, "va": lva}


def _build_step(cfg: Config, model, suite: LossSuite) -> Callable:
    """The un-jitted train-step body shared by make_train_step (one step
    per dispatch) and make_multi_train_step (K steps per dispatch)."""
    task = cfg.task
    sample_len = int(getattr(cfg, "sample_len_frames", 441000))

    def step(state: TrainState, batch: dict, rng: jax.Array, arena=None):
        flip_rng, drop_rng, aug_rng = jax.random.split(rng, 3)
        x = prep_batch(batch, train=True, flip_rng=flip_rng,
                       device_augment=cfg.device_augment, aug_rng=aug_rng,
                       device_audio=cfg.device_audio, arena=arena,
                       sample_len=sample_len)
        labels = _labels_of(batch)
        modes = set(getattr(model, "modes", x.keys()))
        x = {k: v for k, v in x.items() if k in modes}

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, rngs={"dropout": drop_rng},
                mutable=["batch_stats"])
            loss, parts = task_loss(suite, task, out, labels)
            return loss, (mut["batch_stats"], parts)

        (loss, (new_bs, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_bs)
        metrics = {"loss": loss, **parts}
        return new_state, metrics

    return step


def make_train_step(cfg: Config, model, suite: LossSuite,
                    mesh: Optional[Mesh] = None,
                    donate: bool = True,
                    with_arena: bool = False) -> Callable:
    """Returns step(state, batch, rng) -> (state, metrics), jitted —
    step(state, batch, rng, arena) with ``with_arena`` (the HBM-resident
    wav buffer rides as an explicit replicated argument, never a closure:
    a captured device array would be embedded as a program constant and
    re-fetched at trace time).

    With a mesh, inputs/outputs carry NamedShardings (batch over 'data');
    without, a plain jit for single-device use.
    """
    step = _build_step(cfg, model, suite)

    # GSPMD: the step is a global program. With a mesh the shardings are
    # explicit jit constraints — state replicated, batch split over 'data'
    # — rather than relying purely on input placement; GSPMD then inserts
    # the grad/BN-stat psum collectives over ICI automatically.
    donate_arg = (0,) if donate else ()
    if not with_arena:
        def step2(state, batch, rng):
            return step(state, batch, rng)
    else:
        step2 = step
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data_sh = NamedSharding(mesh, P("data"))
        shardings = (repl, data_sh, repl) + ((repl,) if with_arena else ())
        return jax.jit(step2, donate_argnums=donate_arg,
                       in_shardings=shardings)
    return jax.jit(step2, donate_argnums=donate_arg)


def make_multi_train_step(cfg: Config, model, suite: LossSuite,
                          mesh: Optional[Mesh] = None,
                          donate: bool = True,
                          with_arena: bool = False) -> Callable:
    """Returns step_k(state, batches, rng) -> (state, metrics): K train
    steps in ONE device program via ``lax.scan`` over a stacked batch
    pytree (leading axis K on every leaf).

    One dispatch + one H2D round trip then covers K optimizer steps —
    on a high-latency orchestration link (an RPC-tunneled TPU frontend,
    a congested PCIe host) per-dispatch overhead is the train-loop bound
    long before device FLOPs are (bench.py train_e2e: 1.5-17 s per
    dispatch vs a 12.8 ms device step), so amortizing it K-fold is the
    difference between ~4 and ~hundreds of clips/s fed from the loader.
    Step i uses ``fold_in(rng, i)``, matching the sequential loop's rng
    stream exactly: K scanned steps == K make_train_step calls bit-for-bit
    in f32 (tests/test_parallel.py).

    Each metrics value is the per-step (K,) vector; K is static per
    compile (stack the same number of loader batches every dispatch)."""
    step = _build_step(cfg, model, suite)

    def multi(state: TrainState, batches: dict, rng: jax.Array,
              arena=None):
        def body(st, inp):
            i, batch = inp
            st, metrics = step(st, batch, jax.random.fold_in(rng, i),
                               arena)
            return st, metrics

        k = jax.tree_util.tree_leaves(batches)[0].shape[0]
        state, metrics = jax.lax.scan(body, state,
                                      (jnp.arange(k, dtype=jnp.int32),
                                       batches))
        return state, metrics

    donate_arg = (0,) if donate else ()
    if not with_arena:
        def multi2(state, batches, rng):
            return multi(state, batches, rng)
    else:
        multi2 = multi
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        # (K, B, ...) leaves: batch axis 1 over 'data', K replicated
        data_sh = NamedSharding(mesh, P(None, "data"))
        shardings = (repl, data_sh, repl) + ((repl,) if with_arena else ())
        return jax.jit(multi2, donate_argnums=donate_arg,
                       in_shardings=shardings)
    return jax.jit(multi2, donate_argnums=donate_arg)


def make_clip_expander(mesh: Optional[Mesh] = None) -> Callable:
    """Returns expand(frames, clip_idx) -> (B, T, H, W, C) uint8 clips,
    jitted: the device half of the frame-dedup input path
    (data/dataset.py::assemble_batch). ``frames`` is the batch's
    unique-frame pool — (U_pad, H, W, C) with slot 0 all-black — and
    ``clip_idx`` the (B, T) int32 window map; one HBM gather rebuilds the
    dense clips get_clip() would have assembled on host, bitwise.

    Kept OUTSIDE the train step on purpose: U_pad varies in 64-slot
    buckets batch-to-batch, and recompiling this one-op gather per bucket
    costs ~nothing while re-specializing the whole train program would
    cost tens of seconds per bucket. The expanded clip feeds the existing
    step/stacker signatures unchanged.

    With a mesh: frames replicated (any device's windows may reference
    any pool row), clip_idx and the output batch-sharded over 'data'."""
    def expand(frames: jax.Array, clip_idx: jax.Array) -> jax.Array:
        return jnp.take(frames, clip_idx, axis=0)

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        idx_sh = NamedSharding(mesh, P("data"))
        return jax.jit(expand, in_shardings=(repl, idx_sh),
                       out_shardings=idx_sh)
    return jax.jit(expand)


def expand_dedup_batch(batch: dict, expander: Callable) -> dict:
    """frames/clip_idx -> clip, leaving other entries untouched; no-op for
    dense batches (the epoch-tail path may mix both)."""
    if "frames" not in batch or "clip_idx" not in batch:
        return batch
    out = dict(batch)
    out["clip"] = expander(out.pop("frames"), out.pop("clip_idx"))
    return out


def stack_batches(batches: list[dict]) -> dict:
    """Host-side collation for make_multi_train_step: K loader batches ->
    one pytree with leading axis K (np.stack per leaf, numeric leaves
    only — string/object entries like video ids don't ride to device)."""
    keys = [k for k, v in batches[0].items()
            if np.asarray(v).dtype.kind not in ("U", "S", "O")]
    return {k: np.stack([np.asarray(b[k]) for b in batches]) for k in keys}


def make_device_stacker(mesh: Optional[Mesh] = None) -> Callable:
    """Returns stack_k(*batches) -> (K, B, ...) pytree, jitted: the
    DEVICE-side counterpart of :func:`stack_batches` for the K-step
    dispatch path. Each of the K loader batches rides its own (small,
    async) H2D put (e.g. via mesh.shard_batch), then one program stacks
    them in HBM — a ~ms copy — instead of the host memcpy'ing the full
    K-batch pytree (1.2 GB at B=64/K=8 raw-audio batches: 3-14 s of
    single-core np.stack measured on the bench box, every dispatch).

    With a mesh, inputs are batch-sharded on 'data' (axis 0) and outputs
    carry P(None, 'data') — exactly make_multi_train_step's batch
    sharding."""
    def stack(*batches: dict):
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)

    if mesh is not None:
        data_sh = NamedSharding(mesh, P(None, "data"))
        return jax.jit(stack, out_shardings=data_sh)
    return jax.jit(stack)


def make_eval_step(cfg: Config, model, suite: LossSuite,
                   mesh: Optional[Mesh] = None,
                   with_arena: bool = False) -> Callable:
    task = cfg.task
    sample_len = int(getattr(cfg, "sample_len_frames", 441000))

    def step(params, batch_stats, batch: dict, arena=None):
        x = prep_batch(batch, train=False, device_audio=cfg.device_audio,
                       arena=arena, sample_len=sample_len)
        labels = _labels_of(batch)
        modes = set(getattr(model, "modes", x.keys()))
        x = {k: v for k, v in x.items() if k in modes}
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          x, train=False)
        loss, _ = task_loss(suite, task, out, labels)
        return out.astype(jnp.float32), loss

    if not with_arena:
        def step2(params, batch_stats, batch):
            return step(params, batch_stats, batch)
    else:
        step2 = step
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data_sh = NamedSharding(mesh, P("data"))
        shardings = (repl, repl, data_sh) + ((repl,) if with_arena else ())
        return jax.jit(step2, in_shardings=shardings)
    return jax.jit(step2)
