"""fav_tpu quickstart: the full failure-aware pipeline in one script.

    python examples/quickstart.py [--steps 300]

Walks the minimum end-to-end slice (SURVEY.md §7): train a small CNN,
calibrate it, sweep a few corruptions, map confidence to the trust engine's
anomaly signal, replay a degradation scenario through the trust recurrence,
and print the policy trajectory. Runs anywhere (CPU or TPU); no data needed
(synthetic CIFAR-10 stand-in).
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=300)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from fav_tpu.config import DEFAULT_CONFIG, ModelParams, STATUS_CODES, policy_name
    from fav_tpu.core.trust_jax import init_carry, simulate_sequence
    from fav_tpu.data.cifar import load_cifar10
    from fav_tpu.models.calibration import expected_calibration_error, fit_temperature
    from fav_tpu.models.cnn import create_model
    from fav_tpu.models.train import classifier_eval_step, train_classifier
    from fav_tpu.models.uncertainty import anomaly_from_confidence
    from fav_tpu.parallel.sweep import corruption_sweep

    # 1. data + model ------------------------------------------------------
    ds = load_cifar10()
    print(f"[1/5] dataset: {ds.source}, devices: {jax.devices()}")
    model = create_model(ModelParams(widths=(16, 32), dense_width=32))
    params, _ = train_classifier(model, ds, num_steps=args.steps, batch_size=128)

    # 2. calibrate ---------------------------------------------------------
    n = 512
    out = classifier_eval_step(
        model.apply, params, jnp.asarray(ds.test_images[:n]), jnp.asarray(ds.test_labels[:n])
    )
    temperature = fit_temperature(out["logits"], jnp.asarray(ds.test_labels[:n]))
    conf = jnp.max(jax.nn.softmax(out["logits"] / temperature, -1), -1)
    correct = (jnp.argmax(out["logits"], -1) == jnp.asarray(ds.test_labels[:n])).astype(jnp.float64)
    print(
        f"[2/5] accuracy {float(out['accuracy']):.3f}, T={float(temperature):.3f}, "
        f"ECE {float(expected_calibration_error(conf, correct)):.4f}"
    )

    # 3. corruption sweep --------------------------------------------------
    grid = corruption_sweep(
        model.apply, params,
        jnp.asarray(ds.test_images[:256]), jnp.asarray(ds.test_labels[:256]),
        jax.random.PRNGKey(0),
        corruptions=("gaussian_noise", "fog", "defocus_blur"), severities=(1, 3, 5),
        temperature=temperature,
    )
    print("[3/5] corruption sweep (accuracy | mean anomaly):")
    for name, cells in grid.items():
        row = "  ".join(f"s{s}: {c['accuracy']:.2f}|{c['mean_anomaly']:.3f}" for s, c in cells.items())
        print(f"      {name:16s} {row}")

    # 4. confidence -> trust-engine anomaly --------------------------------
    sev5 = grid["gaussian_noise"][5]["mean_anomaly"]
    print(f"[4/5] severity-5 gaussian noise maps to anomaly {sev5:.3f} for the trust engine")

    # 5. trust replay: healthy -> degrading -> corrupted -> recovery --------
    phases = [("VISION_OK", 0.02, 60), ("VISION_OK", max(0.3, sev5), 60),
              ("VISION_CORRUPTED", 0.8, 45), ("VISION_OK", 0.02, 150)]
    statuses, anomalies = [], []
    for status, a, ticks in phases:
        statuses += [STATUS_CODES[status]] * ticks
        anomalies += [a] * ticks
    n = len(statuses)
    _, outs = simulate_sequence(
        DEFAULT_CONFIG.trust,
        jnp.asarray(statuses, jnp.int32), jnp.asarray(anomalies),
        jnp.ones(n, bool), jnp.full(n, 1 / 30),
        init_carry(DEFAULT_CONFIG.trust, dtype=jnp.float32),
    )
    print("[5/5] trust trajectory (1 s samples):")
    for i in range(0, n, 30):
        r = float(outs.reliability[i])
        bar = "#" * int(r * 30)
        print(f"      t={i/30:5.1f}s  {r:.3f} {policy_name(int(outs.policy[i])):18s} {bar}")
    print("done — see fav_tpu/serving for the live dashboard version of this loop")


if __name__ == "__main__":
    main()
