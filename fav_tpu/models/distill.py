"""Dropout distillation: MC-dropout quality at single-forward cost.

Technique from the retrieved literature (PAPERS.md: "Dropout Distillation
for Efficiently Estimating Model Confidence", Gurau et al.; also the
structured-dropout calibration line): a deterministic *student* is trained
to match the *teacher's* MC-dropout predictive distribution (the mean
softmax over K stochastic replicas). At serving time the student gives the
teacher's calibrated confidence in ONE forward pass — K times cheaper than
running replicas per frame, which matters for the 30 Hz live path.

TPU shape: teacher replicas are a ``vmap`` over dropout keys fused into the
same jitted step as the student update, so distillation runs entirely
on-device; soft targets never round-trip to the host.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from fav_tpu.data.cifar import batch_iterator

__all__ = ["make_distill_step", "distill_mc_dropout", "make_kd_step", "make_kd_megastep", "distill_ensemble"]


def make_distill_step(apply_fn, tx, mc_samples: int, temperature: float = 1.0):
    """One jitted step: teacher MC-mean soft targets -> student KL update.

    Loss = KL(teacher_mean_probs || student_probs) (equivalently soft-label
    cross-entropy up to the teacher-entropy constant, which has zero student
    gradient — we use the CE form).
    """

    @jax.jit
    def step(student_params, opt_state, teacher_params, images, key):
        def teacher_probs():
            def one(k):
                logits = apply_fn(teacher_params, images, train=True, rngs={"dropout": k})
                return jax.nn.softmax(logits / temperature, axis=-1)

            keys = jax.random.split(key, mc_samples)
            return jnp.mean(jax.vmap(one)(keys), axis=0)

        targets = jax.lax.stop_gradient(teacher_probs())

        def loss_fn(p):
            logits = apply_fn(p, images)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(jnp.sum(targets * logp, axis=-1))

        loss, grads = jax.value_and_grad(loss_fn)(student_params)
        updates, opt_state = tx.update(grads, opt_state, student_params)
        student_params = optax.apply_updates(student_params, updates)
        return student_params, opt_state, loss

    return step


def make_kd_step(
    student_apply,
    teacher_apply,
    tx,
    kd_temperature: float,
    hard_weight: float,
    augmix: bool = False,
    freq: bool = False,
    occlude: bool = False,
    bf16_aug: bool = False,
):
    """One jitted knowledge-distillation step from a stacked-params ensemble.

    Classic Hinton KD with an ensemble teacher: targets are the softmax of
    the *member-mean logits* at temperature T (exactly what
    ``evaluate --ensemble`` serves), the student matches them at the same T
    (loss scaled by T^2 so gradients are T-invariant), plus a small
    hard-label CE term. Teacher forwards are a ``vmap`` over the member
    axis fused into the same program as the student update — on a mesh the
    member axis shards over ensemble devices (SURVEY.md §2.5).

    ``augmix=True`` distills on [clean; AugMix(clean)] in one doubled batch
    (fav_tpu/ops/augment.py): the student learns the teacher's soft labels
    on the augmented manifold too, so robustness transfers — the hard-label
    CE stays on the clean half only. ``freq=True`` extends the AugMix op
    pool with the spectral band-gain op (weather-axis coverage);
    ``occlude=True`` with the rectangular occlusion op (snow-axis coverage).
    """
    core = _kd_step_core(
        student_apply, teacher_apply, tx, kd_temperature, hard_weight, augmix,
        freq, occlude, bf16_aug,
    )
    return jax.jit(core)


def _kd_step_core(
    student_apply, teacher_apply, tx, kd_temperature, hard_weight, augmix,
    freq, occlude=False, bf16_aug=False,
):
    """KD step math, shared by the per-step jit and the KD megastep scan."""

    def step(student_params, opt_state, stacked_teacher, images, labels, key):
        b = images.shape[0]
        if augmix:
            from fav_tpu.ops.augment import augmix as _augmix

            inp = jnp.concatenate(
                [images,
                 _augmix(key, images, freq=freq, occlude=occlude, bf16=bf16_aug)],
                axis=0,
            )
        else:
            inp = images
        member_logits = jax.vmap(lambda p: teacher_apply(p, inp))(stacked_teacher)
        targets = jax.lax.stop_gradient(
            jax.nn.softmax(jnp.mean(member_logits, axis=0) / kd_temperature, axis=-1)
        )

        def loss_fn(p):
            logits = student_apply(p, inp)
            logp_soft = jax.nn.log_softmax(logits / kd_temperature, axis=-1)
            soft = -jnp.mean(jnp.sum(targets * logp_soft, axis=-1)) * kd_temperature**2
            logp = jax.nn.log_softmax(logits[:b], axis=-1)
            hard = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))
            return soft + hard_weight * hard

        loss, grads = jax.value_and_grad(loss_fn)(student_params)
        updates, opt_state = tx.update(grads, opt_state, student_params)
        return optax.apply_updates(student_params, updates), opt_state, loss

    return step


def make_kd_megastep(
    student_apply,
    teacher_apply,
    tx,
    kd_temperature: float,
    hard_weight: float,
    augmix: bool = False,
    freq: bool = False,
    occlude: bool = False,
    bf16_aug: bool = False,
):
    """Device-resident K-step KD megastep (same design as
    ``fav_tpu.models.train.make_train_megastep``): the train set and the
    stacked teacher stay resident, each call uploads only a [K, B] int32
    index array and scans K distillation steps in one program. Over the
    tunneled TPU the per-step host loop paid a full batch H2D per step;
    this is the same 5-18x wall-clock lever measured in BENCH.md Training.

    Returns ``mega(student, opt_state, stacked_teacher, images_all,
    labels_all, idx_chunk, key) -> (student, opt_state, key, last_loss)``
    with (student, opt_state) donated."""
    import functools

    core = _kd_step_core(
        student_apply, teacher_apply, tx, kd_temperature, hard_weight, augmix,
        freq, occlude, bf16_aug,
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def mega(student, opt_state, stacked_teacher, images_all, labels_all, idx_chunk, key):
        def body(carry, idx):
            st, os_, k = carry
            k, sub = jax.random.split(k)
            st, os_, loss = core(
                st, os_, stacked_teacher,
                jnp.take(images_all, idx, axis=0),
                jnp.take(labels_all, idx, axis=0), sub,
            )
            return (st, os_, k), loss

        (student, opt_state, key), losses = jax.lax.scan(
            body, (student, opt_state, key), idx_chunk
        )
        return student, opt_state, key, losses[-1]

    return mega


def distill_ensemble(
    student_model,
    teacher_apply,
    stacked_teacher: Any,
    images,
    labels,
    num_steps: int = 3000,
    batch_size: int = 512,
    learning_rate: float = 1e-3,
    kd_temperature: float = 2.0,
    hard_weight: float = 0.3,
    seed: int = 0,
    log_every: int = 0,
    augmix: bool = False,
    freq: bool = False,
    occlude: bool = False,
    bf16_aug: bool = False,
    megastep: int = 0,
) -> Any:
    """Distill a deep ensemble into a (typically *smaller*) student.

    Unlike :func:`distill_mc_dropout`, the student architecture is free —
    it initializes from scratch, so a half-width student learns the
    ensemble's decision surface at a fraction of the serving FLOPs. This is
    the TPU-first deployment shape: one dense compact forward that keeps
    the MXU busy instead of M full-size members.

    ``megastep=K`` runs the bulk of distillation as device-resident K-step
    scans (:func:`make_kd_megastep`) — same trajectory, none of the
    per-step dispatch + batch-upload cost; remainder steps fall through to
    the per-step loop on the same shuffle stream and key chain."""
    import numpy as np

    from fav_tpu.data.cifar import index_iterator

    sample = jnp.zeros((1,) + images.shape[1:], jnp.float32)
    student = student_model.init(jax.random.PRNGKey(seed + 3), sample)
    tx = optax.adamw(learning_rate)
    opt_state = tx.init(student)
    key = jax.random.PRNGKey(seed + 29)
    idx_it = index_iterator(images.shape[0], batch_size, seed=seed)

    steps_done = 0
    if megastep > 0:
        mega = make_kd_megastep(
            student_model.apply, teacher_apply, tx, kd_temperature, hard_weight,
            augmix=augmix, freq=freq, occlude=occlude, bf16_aug=bf16_aug,
        )
        images_all = jnp.asarray(images)
        labels_all = jnp.asarray(labels)
        while num_steps - steps_done >= megastep:
            idx_chunk = np.stack([next(idx_it) for _ in range(megastep)]).astype(np.int32)
            student, opt_state, key, loss = mega(
                student, opt_state, stacked_teacher, images_all, labels_all,
                jnp.asarray(idx_chunk), key,
            )
            steps_done += megastep
            if log_every and (steps_done % log_every == 0 or megastep >= log_every):
                print(f"kd step {steps_done}: loss {float(loss):.4f}")

    step = make_kd_step(
        student_model.apply, teacher_apply, tx, kd_temperature, hard_weight,
        augmix=augmix, freq=freq, occlude=occlude, bf16_aug=bf16_aug,
    )
    for i in range(steps_done, num_steps):
        idx = next(idx_it)
        x, y = images[idx], labels[idx]
        key, sub = jax.random.split(key)
        student, opt_state, loss = step(
            student, opt_state, stacked_teacher, jnp.asarray(x), jnp.asarray(y), sub
        )
        if log_every and (i + 1) % log_every == 0:
            print(f"kd step {i+1}: loss {float(loss):.4f}")
    return student


def distill_mc_dropout(
    model,
    teacher_params: Any,
    images,
    mc_samples: int = 20,
    num_steps: int = 1000,
    batch_size: int = 256,
    learning_rate: float = 5e-4,
    temperature: float = 1.0,
    seed: int = 0,
    log_every: int = 0,
) -> Any:
    """Distill ``teacher_params``'s MC-dropout predictive into a student of
    the same architecture (initialized FROM the teacher — distillation then
    only has to reshape the confidence surface, not relearn features)."""
    student = jax.tree.map(jnp.copy, teacher_params)
    tx = optax.adamw(learning_rate)
    opt_state = tx.init(student)
    step = make_distill_step(model.apply, tx, mc_samples, temperature)
    # labels are unused by distillation; the iterator just shuffles images
    it = batch_iterator(images, jnp.zeros(images.shape[0], jnp.int32), batch_size, seed=seed)
    key = jax.random.PRNGKey(seed + 17)
    for i in range(num_steps):
        x, _ = next(it)
        key, sub = jax.random.split(key)
        student, opt_state, loss = step(student, opt_state, teacher_params, jnp.asarray(x), sub)
        if log_every and (i + 1) % log_every == 0:
            print(f"distill step {i+1}: soft-CE {float(loss):.4f}")
    return student
