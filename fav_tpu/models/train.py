"""Training: jitted optax train steps for the classifier, autoencoder, and
vmapped ensembles — mesh-shardable without code change.

The reference repo trains nothing (its PyTorch AE lives outside the repo,
reference requirements.txt:1-2, docs/system_notes.md:146-170). Here training
is a first-class, TPU-native path:

* one compiled ``train_step`` per model; loss in float32, forward compute in
  bfloat16 (set by the model),
* ensembles train as a ``vmap`` over the member axis of stacked params —
  M members advance in one XLA program; sharding the member axis over the
  mesh's ensemble dimension trains member-per-device,
* ``donate_argnums`` on (params, opt_state) so XLA reuses their HBM buffers.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "TrainState",
    "create_train_state",
    "classifier_train_step",
    "classifier_eval_step",
    "augmix_train_step",
    "sam_augmix_train_step",
    "autoencoder_train_step",
    "make_ensemble_train_step",
    "make_ensemble_megastep",
    "make_train_megastep",
    "train_classifier",
    "train_autoencoder",
]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def create_train_state(
    params: Any, learning_rate: float = 1e-3, weight_decay: float = 1e-4
) -> tuple[TrainState, optax.GradientTransformation]:
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), tx


def _ce_loss(apply_fn, params, images, labels, key):
    logits = apply_fn(params, images, train=True, rngs={"dropout": key})
    loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    acc = jnp.mean(jnp.argmax(logits, -1) == labels)
    return loss, acc


def _classifier_step_core(apply_fn, tx, state, images, labels, key):
    """Plain-CE step math, shared by the per-step jit and the megastep scan."""
    (loss, acc), grads = jax.value_and_grad(
        lambda p: _ce_loss(apply_fn, p, images, labels, key), has_aux=True
    )(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), {"loss": loss, "accuracy": acc}


@functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2,))
def classifier_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    state: TrainState,
    images: jax.Array,
    labels: jax.Array,
    key: jax.Array,
) -> tuple[TrainState, dict]:
    return _classifier_step_core(apply_fn, tx, state, images, labels, key)


@functools.partial(
    jax.jit, static_argnums=(0, 1, 7, 8, 9, 10), donate_argnums=(2,)
)
def augmix_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    state: TrainState,
    images: jax.Array,
    labels: jax.Array,
    key: jax.Array,
    js_lam: jax.Array,
    freq: bool = False,
    occlude: bool = False,
    bars: bool = False,
    bf16_aug: bool = False,
) -> tuple[TrainState, dict]:
    """AugMix train step (Hendrycks et al., ICLR 2020): CE on the clean view
    plus ``js_lam`` x Jensen-Shannon consistency across (clean, augmix1,
    augmix2). All three views ride ONE batched forward — a [3B, H, W, C]
    matmul keeps the MXU saturated instead of three half-empty launches.
    Augmentation ops are disjoint from the 15 test corruptions
    (fav_tpu/ops/augment.py), so the corruption grid stays held out."""
    return _augmix_step_core(
        apply_fn, tx, state, images, labels, key, js_lam, freq, occlude, bars,
        bf16_aug,
    )


def _augmix_step_core(
    apply_fn, tx, state, images, labels, key, js_lam, freq, occlude=False,
    bars=False, bf16_aug=False,
):
    """AugMix step math, shared by the per-step jit and the megastep scan."""
    from fav_tpu.ops.augment import augmix, js_consistency

    k1, k2, kd = jax.random.split(key, 3)
    aug1 = augmix(k1, images, freq=freq, occlude=occlude, bars=bars, bf16=bf16_aug)
    aug2 = augmix(k2, images, freq=freq, occlude=occlude, bars=bars, bf16=bf16_aug)
    trio = jnp.concatenate([images, aug1, aug2], axis=0)
    b = images.shape[0]

    def loss_fn(p):
        logits = apply_fn(p, trio, train=True, rngs={"dropout": kd})
        lc, la, lb = logits[:b], logits[b : 2 * b], logits[2 * b :]
        ce = optax.softmax_cross_entropy_with_integer_labels(lc, labels).mean()
        js = js_consistency(lc, la, lb)
        acc = jnp.mean(jnp.argmax(lc, -1) == labels)
        return ce + js_lam * js, (acc, ce, js)

    (loss, (acc, ce, js)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), {
        "loss": loss,
        "accuracy": acc,
        "ce": ce,
        "js": js,
    }


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 9), donate_argnums=(3,))
def deepaugment_train_step(
    apply_fn: Callable,
    ae_apply: Callable,
    tx: optax.GradientTransformation,
    state: TrainState,
    images: jax.Array,
    labels: jax.Array,
    key: jax.Array,
    js_lam: jax.Array,
    ae_params: Any,
    freq: bool = False,
) -> tuple[TrainState, dict]:
    """AugMix + DeepAugment (Hendrycks et al., ICCV 2021): the second
    consistency view passes through the perturbed-weights autoencoder before
    its AugMix chain, importing learned-manifold distortions the hand op set
    cannot express (a weather-family candidate — fav_tpu/ops/deepaugment.py;
    measured a negative result on the weather grid, BENCH.md round 3).
    Same one-[3B] forward + JS objective as :func:`augmix_train_step`."""
    return _deepaugment_step_core(
        apply_fn, ae_apply, tx, state, images, labels, key, js_lam, ae_params, freq
    )


def _deepaugment_step_core(
    apply_fn, ae_apply, tx, state, images, labels, key, js_lam, ae_params, freq
):
    """DeepAugment step math, shared by the per-step jit and the megastep scan."""
    from fav_tpu.ops.augment import augmix, js_consistency
    from fav_tpu.ops.deepaugment import deepaugment

    k1, k2, k3, kd = jax.random.split(key, 4)
    aug1 = augmix(k1, images, freq=freq)
    aug2 = augmix(k2, deepaugment(k3, images, ae_apply, ae_params), freq=freq)
    trio = jnp.concatenate([images, aug1, aug2], axis=0)
    b = images.shape[0]

    def loss_fn(p):
        logits = apply_fn(p, trio, train=True, rngs={"dropout": kd})
        lc, la, lb = logits[:b], logits[b : 2 * b], logits[2 * b :]
        ce = optax.softmax_cross_entropy_with_integer_labels(lc, labels).mean()
        js = js_consistency(lc, la, lb)
        acc = jnp.mean(jnp.argmax(lc, -1) == labels)
        return ce + js_lam * js, (acc, ce, js)

    (loss, (acc, ce, js)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), {
        "loss": loss,
        "accuracy": acc,
        "ce": ce,
        "js": js,
    }


@functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2,))
def sam_augmix_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    state: TrainState,
    images: jax.Array,
    labels: jax.Array,
    key: jax.Array,
    js_lam: jax.Array,
    rho: jax.Array,
) -> tuple[TrainState, dict]:
    """Sharpness-aware minimization (Foret et al., ICLR 2021) on top of the
    AugMix objective: ascend ``rho`` along the normalized gradient to the
    worst nearby weights, take the real update from the gradient *there*.
    Two backward passes through the same compiled program — flat minima are
    the complementary robustness lever to input-space augmentation."""
    return _sam_step_core(apply_fn, tx, state, images, labels, key, js_lam, rho)


def _sam_step_core(apply_fn, tx, state, images, labels, key, js_lam, rho):
    """SAM+AugMix step math, shared by the per-step jit and the megastep scan."""
    from fav_tpu.ops.augment import augmix, js_consistency

    k1, k2, kd = jax.random.split(key, 3)
    aug1 = augmix(k1, images)
    aug2 = augmix(k2, images)
    trio = jnp.concatenate([images, aug1, aug2], axis=0)
    b = images.shape[0]

    def loss_fn(p):
        logits = apply_fn(p, trio, train=True, rngs={"dropout": kd})
        lc, la, lb = logits[:b], logits[b : 2 * b], logits[2 * b :]
        ce = optax.softmax_cross_entropy_with_integer_labels(lc, labels).mean()
        js = js_consistency(lc, la, lb)
        acc = jnp.mean(jnp.argmax(lc, -1) == labels)
        return ce + js_lam * js, (acc, ce, js)

    (_, _), grads1 = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    gnorm = optax.global_norm(grads1)
    scale = rho / jnp.maximum(gnorm, 1e-12)
    adv = jax.tree.map(lambda p, g: p + scale * g, state.params, grads1)
    (loss, (acc, ce, js)), grads2 = jax.value_and_grad(loss_fn, has_aux=True)(adv)
    updates, opt_state = tx.update(grads2, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), {
        "loss": loss,
        "accuracy": acc,
        "ce": ce,
        "js": js,
    }


@functools.partial(jax.jit, static_argnums=(0,))
def classifier_eval_step(apply_fn: Callable, params: Any, images: jax.Array, labels: jax.Array):
    logits = apply_fn(params, images)
    loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    acc = jnp.mean(jnp.argmax(logits, -1) == labels)
    return {"loss": loss, "accuracy": acc, "logits": logits}


def make_train_megastep(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    *,
    augmix: bool = False,
    js_lam: float = 12.0,
    freq: bool = False,
    occlude: bool = False,
    bars: bool = False,
    bf16_aug: bool = False,
    sam_rho: float = 0.0,
    deepaugment: bool = False,
    ae_apply: Callable | None = None,
    ae_params: Any = None,
):
    """Device-resident training megastep: ``lax.scan`` over K optimizer steps
    in ONE jitted program, batches gathered on-device from the resident
    train set by index.

    Why (same roofline logic as the inference megastep, BENCH.md): the
    per-step host loop pays a ~10 ms tunnel dispatch AND a full batch upload
    per step — at batch 4096 float32 that is 50 MB over a measured
    ~38 MB/s tunnel, >1.3 s/step of pure H2D before the 75 ms of compute.
    Here the dataset ships once, each chunk uploads only a [K, B] int32
    index array (16 KB/step), and the K steps run back-to-back on-device.
    Batch composition and per-step PRNG splits exactly mirror the host loop
    (``data/cifar.index_iterator`` is the shared shuffle stream), so the two
    paths produce the same trajectory up to XLA compilation-level fp
    reassociation (~1e-6/step; the scan body fuses differently than the
    standalone step) — pinned by
    tests/test_models.py::test_megastep_matches_per_step_loop.

    Covers every single-model objective: plain CE, AugMix, SAM+AugMix
    (``sam_rho > 0``) and DeepAugment (``deepaugment=True`` with
    ``ae_apply`` + ``ae_params``). Measured speedups at batch 1024 over
    the tunnel (BENCH.md Training): CE 18.5x, AugMix 5.4x, SAM 4.5x,
    DeepAugment 7.4x, 5-member ensembles 3.3x (batch 512, see
    :func:`make_ensemble_megastep`).

    ``ae_params`` is BAKED at factory time (closed over, so the 1.9 MB AE
    tree compiles into the executable as constants) rather than passed per
    call: on the tunneled TPU backend, threading that tree through the jit
    boundary into the scanned perturbation+conv body made the identical
    program 4-300x slower per call (same-session bisect,
    measurements/r3/deepaug_scan_bisect*.log — the 245 MB train set as an
    argument costs nothing, the 1.9 MB AE-as-argument is catastrophic;
    KD's stacked teacher-as-argument in a plain forward is also fine, so
    the pathology is specific to params perturbed inside the scan body).
    Re-bake by calling the factory again if the AE ever retrains mid-run.

    Returns ``megastep(state, images_all, labels_all, idx_chunk, key)
    -> (state, key, last_step_metrics)`` with ``state`` donated; thread
    the returned key into the next call (it has advanced by K splits,
    matching the host loop's split-per-step)."""
    lam = jnp.float32(js_lam)
    rho = jnp.float32(sam_rho)
    if deepaugment and (ae_apply is None or ae_params is None):
        raise ValueError("deepaugment=True requires ae_apply and ae_params")

    @functools.partial(jax.jit, donate_argnums=(0,))
    def megastep(state, images_all, labels_all, idx_chunk, key):
        def body(carry, idx):
            st, k = carry
            k, step_key = jax.random.split(k)
            images = jnp.take(images_all, idx, axis=0)
            labels = jnp.take(labels_all, idx, axis=0)
            if deepaugment:
                st, metrics = _deepaugment_step_core(
                    apply_fn, ae_apply, tx, st, images, labels, step_key, lam,
                    ae_params, freq,
                )
            elif augmix and sam_rho > 0:
                st, metrics = _sam_step_core(
                    apply_fn, tx, st, images, labels, step_key, lam, rho
                )
            elif augmix:
                st, metrics = _augmix_step_core(
                    apply_fn, tx, st, images, labels, step_key, lam, freq,
                    occlude, bars, bf16_aug,
                )
            else:
                st, metrics = _classifier_step_core(
                    apply_fn, tx, st, images, labels, step_key
                )
            return (st, k), metrics
        (state, key), metrics = jax.lax.scan(body, (state, key), idx_chunk)
        return state, key, jax.tree.map(lambda x: x[-1], metrics)

    return megastep


@functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2,))
def autoencoder_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    state: TrainState,
    images: jax.Array,
) -> tuple[TrainState, dict]:
    """AE trains on *normal* images only (reference docs/system_notes.md:150-156)."""

    def loss_fn(p):
        recon = apply_fn(p, images)
        return jnp.mean((recon - images.astype(recon.dtype)) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), {"loss": loss}


def _ensemble_member_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    augmix: bool = False,
    js_lam: float = 12.0,
    augmix_mode: str = "js",
):
    """Single-member update used (vmapped) by both the per-step ensemble
    train step and the ensemble megastep scan."""

    def member_step(state: TrainState, images, labels, key):
        if augmix and augmix_mode == "ce":
            from fav_tpu.ops.augment import augmix as _augmix

            k1, kd = jax.random.split(key)
            both = jnp.concatenate([images, _augmix(k1, images)], axis=0)
            both_labels = jnp.concatenate([labels, labels], axis=0)
            (loss, acc), grads = jax.value_and_grad(
                lambda p: _ce_loss(apply_fn, p, both, both_labels, kd), has_aux=True
            )(state.params)
        elif augmix:
            from fav_tpu.ops.augment import augmix as _augmix
            from fav_tpu.ops.augment import js_consistency

            k1, k2, kd = jax.random.split(key, 3)
            aug1 = _augmix(k1, images)
            aug2 = _augmix(k2, images)
            trio = jnp.concatenate([images, aug1, aug2], axis=0)
            b = images.shape[0]

            def loss_fn(p):
                logits = apply_fn(p, trio, train=True, rngs={"dropout": kd})
                lc, la, lb = logits[:b], logits[b : 2 * b], logits[2 * b :]
                ce = optax.softmax_cross_entropy_with_integer_labels(lc, labels).mean()
                acc = jnp.mean(jnp.argmax(lc, -1) == labels)
                return ce + js_lam * js_consistency(lc, la, lb), acc

            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        else:
            (loss, acc), grads = jax.value_and_grad(
                lambda p: _ce_loss(apply_fn, p, images, labels, key), has_aux=True
            )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), {"loss": loss, "accuracy": acc}

    return member_step


def make_ensemble_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    augmix: bool = False,
    js_lam: float = 12.0,
    augmix_mode: str = "js",
):
    """Train-step over stacked ensemble params: vmap of the single-member
    update. Each member sees the same batch but independent dropout keys
    (bagging comes from independent inits — the standard deep-ensembles
    recipe). The member axis is shardable over the mesh.

    ``augmix=True`` switches each member to AugMix training with
    member-independent augmentation draws. ``augmix_mode='js'`` is the
    canonical consistency objective; ``'ce'`` trains plain CE on
    [clean; augmented] views instead — no consistency term, so members
    are NOT pulled toward the same invariant predictive and the
    ensemble's diversity advantage is preserved (the JS term measurably
    correlates members, BENCH.md Quality)."""
    member_step = _ensemble_member_step(apply_fn, tx, augmix, js_lam, augmix_mode)
    vstep = jax.vmap(member_step, in_axes=(0, None, None, 0))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(states: TrainState, images, labels, key):
        keys = jax.random.split(key, states.step.shape[0])
        return vstep(states, images, labels, keys)

    return step


def make_ensemble_megastep(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    augmix: bool = False,
    js_lam: float = 12.0,
    augmix_mode: str = "js",
):
    """Device-resident K-step ensemble megastep: ``lax.scan`` over K vmapped
    member updates with the train set resident, indices-only upload — the
    same wall-clock lever as :func:`make_train_megastep` applied to the
    stacked-params ensemble (the KD teacher recipe). Key discipline matches
    the per-step host loop exactly: one ``split`` of the chain key per step,
    then a per-member fan-out inside the step — so per-step and megastep
    trajectories are equivalent (pinned by tests/test_models.py).

    The member axis of ``states`` stays shardable over the mesh's ensemble
    axis; the resident dataset is replicated (it is read-only inside the
    scan, XLA keeps one copy per device group).

    Returns ``megastep(states, images_all, labels_all, idx_chunk, key) ->
    (states, key, last_step_metrics)`` with ``states`` donated."""
    member_step = _ensemble_member_step(apply_fn, tx, augmix, js_lam, augmix_mode)
    vstep = jax.vmap(member_step, in_axes=(0, None, None, 0))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def megastep(states: TrainState, images_all, labels_all, idx_chunk, key):
        def body(carry, idx):
            sts, k = carry
            k, sub = jax.random.split(k)
            keys = jax.random.split(sub, sts.step.shape[0])
            images = jnp.take(images_all, idx, axis=0)
            labels = jnp.take(labels_all, idx, axis=0)
            sts, metrics = vstep(sts, images, labels, keys)
            return (sts, k), metrics

        (states, key), metrics = jax.lax.scan(body, (states, key), idx_chunk)
        return states, key, jax.tree.map(lambda x: x[-1], metrics)

    return megastep


def train_classifier(
    model,
    dataset,
    num_steps: int = 800,
    batch_size: int = 128,
    learning_rate: float = 1e-3,
    seed: int = 0,
    log_every: int = 0,
    augmix: bool = False,
    js_lam: float = 12.0,
    sam_rho: float = 0.0,
    deepaugment: bool = False,
    freq_aug: bool = False,
    occlude_aug: bool = False,
    bars_aug: bool = False,
    bf16_aug: bool = False,
    megastep: int = 0,
) -> tuple[Any, dict]:
    """Convenience host loop: train the CNN, return (params, final metrics).

    ``augmix=True`` switches to the AugMix consistency objective
    (``augmix_train_step``) for corruption-robust training; ``sam_rho > 0``
    additionally turns on sharpness-aware minimization (requires augmix);
    ``deepaugment=True`` routes the second view through the
    perturbed-weights autoencoder (``deepaugment_train_step``).

    ``megastep=K`` runs the bulk of training as device-resident K-step
    scans (``make_train_megastep``; every objective — plain CE, AugMix,
    SAM, DeepAugment) — identical trajectory, none of the per-step dispatch
    + batch-upload cost; any remainder steps fall through to the per-step
    loop below, continuing the same shuffle stream and key chain."""
    from fav_tpu.data.cifar import index_iterator

    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    sample = jnp.zeros((1,) + dataset.train_images.shape[1:], jnp.float32)
    params = model.init(init_key, sample)
    state, tx = create_train_state(params, learning_rate)

    metrics = {}
    lam = jnp.float32(js_lam)
    rho = jnp.float32(sam_rho)
    ae_apply = ae_params = None
    if deepaugment:
        from fav_tpu.ops.deepaugment import load_augmenter

        ae_apply, ae_params = load_augmenter()

    steps_done = 0
    idx_it = index_iterator(dataset.train_images.shape[0], batch_size, seed=seed)
    if megastep > 0:
        import numpy as np

        mega = make_train_megastep(
            model.apply, tx, augmix=augmix, js_lam=js_lam, freq=freq_aug,
            occlude=occlude_aug, bars=bars_aug, bf16_aug=bf16_aug,
            sam_rho=sam_rho, deepaugment=deepaugment, ae_apply=ae_apply,
            ae_params=ae_params,
        )
        images_all = jnp.asarray(dataset.train_images)  # resident for the run
        labels_all = jnp.asarray(dataset.train_labels)
        while num_steps - steps_done >= megastep:
            idx_chunk = np.stack([next(idx_it) for _ in range(megastep)]).astype(np.int32)
            state, key, metrics = mega(
                state, images_all, labels_all, jnp.asarray(idx_chunk), key,
            )
            steps_done += megastep
            if log_every and (
                steps_done % log_every == 0 or megastep >= log_every
            ):
                print(
                    f"step {steps_done}: loss={float(metrics['loss']):.4f} "
                    f"acc={float(metrics['accuracy']):.4f}"
                )

    # per-step path (and megastep tail) continues the SAME shuffle stream
    it = ((dataset.train_images[idx], dataset.train_labels[idx]) for idx in idx_it)
    for i in range(steps_done, num_steps):
        images, labels = next(it)
        key, step_key = jax.random.split(key)
        if deepaugment:
            state, metrics = deepaugment_train_step(
                model.apply, ae_apply, tx, state, jnp.asarray(images),
                jnp.asarray(labels), step_key, lam, ae_params, freq_aug,
            )
        elif augmix and sam_rho > 0:
            state, metrics = sam_augmix_train_step(
                model.apply, tx, state, jnp.asarray(images), jnp.asarray(labels),
                step_key, lam, rho,
            )
        elif augmix:
            state, metrics = augmix_train_step(
                model.apply, tx, state, jnp.asarray(images), jnp.asarray(labels),
                step_key, lam, freq_aug, occlude_aug, bars_aug, bf16_aug,
            )
        else:
            state, metrics = classifier_train_step(
                model.apply, tx, state, jnp.asarray(images), jnp.asarray(labels), step_key
            )
        if log_every and (i + 1) % log_every == 0:
            print(f"step {i+1}: loss={float(metrics['loss']):.4f} acc={float(metrics['accuracy']):.4f}")
    return state.params, {k: float(v) for k, v in metrics.items()}


def train_autoencoder(
    model,
    images,
    num_steps: int = 500,
    batch_size: int = 128,
    learning_rate: float = 1e-3,
    seed: int = 0,
) -> tuple[Any, dict]:
    import numpy as np

    from fav_tpu.data.cifar import batch_iterator

    key = jax.random.PRNGKey(seed)
    sample = jnp.zeros((1,) + images.shape[1:], jnp.float32)
    params = model.init(key, sample)
    state, tx = create_train_state(params, learning_rate)
    dummy_labels = np.zeros(images.shape[0], np.int32)
    it = batch_iterator(images, dummy_labels, batch_size, seed=seed)
    metrics = {}
    for _ in range(num_steps):
        batch, _ = next(it)
        state, metrics = autoencoder_train_step(model.apply, tx, state, jnp.asarray(batch))
    return state.params, {k: float(v) for k, v in metrics.items()}
