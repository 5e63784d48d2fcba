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

__all__ = ["make_distill_step", "distill_mc_dropout"]


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
