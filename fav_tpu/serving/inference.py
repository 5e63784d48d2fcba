"""Micro-batched TPU inference service for the streaming server.

SURVEY.md §7 names the hard part: 30 Hz single-frame streaming on hardware
that wants batches. Solution here:

* every live connection submits its frame to one shared asyncio queue,
* a single worker task drains the queue, pads the pending frames to a
  precompiled batch bucket (1/8/32), and runs ONE jitted forward for all
  concurrent connections (micro-batching across connections),
* results (prediction / confidence / model anomaly) fan back out through
  futures; shape buckets mean no recompilation at runtime,
* model params come from a checkpoint when present (fav_tpu/checkpoints/
  classifier) and fall back to a randomly-initialized model — the service
  reports which through ``info()`` so the dashboard can badge it.

The model anomaly honors the reference's bounded-ML invariant: it is a
scalar in [0,1] consumed by the trust engine's penalty integral only while
rules say VISION_OK (reference platform/README.md:58-64).
"""

from __future__ import annotations

import asyncio
import os
import time
from typing import Any

import numpy as np

from fav_tpu.config import ModelParams

__all__ = ["InferenceService"]

BUCKETS = (1, 8, 32)


class InferenceService:
    """Shared micro-batched classifier scoring for live frames."""

    def __init__(
        self,
        model_params: ModelParams | None = None,
        checkpoint_dir: str | None = None,
        max_wait_ms: float = 4.0,
        uncertainty: str = "msp",
        timer=None,
        monitor_dir: str | None = None,
    ):
        """``uncertainty``: 'msp' (single deterministic forward, cheapest),
        'mc_dropout' (cfg.mc_samples stochastic replicas, adds epistemic
        mutual information), 'ensemble' (cfg.ensemble_size members from a
        stacked checkpoint or stacked random init), or 'autoencoder'
        (reconstruction-error anomaly — the reference's canonical ML design,
        reference docs/system_notes.md:146-170).

        ``monitor_dir``: decoupled predictor/monitor serving — an
        independent calibrated checkpoint rides the SAME micro-batched
        forward and the reported ``confidence`` becomes
        ``min(predictor, monitor)`` (the trust lattice's explicit-failure-
        dominates rule applied to the pair; measured in BENCH.md
        "Decoupled predictor/monitor deployment" — it closes the
        confidently-wrong-under-shift hole of accuracy-champion
        checkpoints). The predictor's own confidence is still reported as
        ``confidence_self``. The monitor checkpoint MUST restore — a
        monitor silently gating with random weights would corrupt the
        confidence semantics, so a bad ``monitor_dir`` fails the service
        loudly instead of degrading."""
        if uncertainty not in ("msp", "mc_dropout", "ensemble", "autoencoder"):
            raise ValueError(f"unknown uncertainty mode: {uncertainty}")
        if monitor_dir and uncertainty == "autoencoder":
            raise ValueError("monitor_dir gates class confidence; the "
                             "autoencoder mode has none")
        self.cfg = model_params or ModelParams()
        self.max_wait = max_wait_ms / 1e3
        self.uncertainty = uncertainty
        self.timer = timer  # optional StageTimer: records inference_device
        self._queue: asyncio.Queue = asyncio.Queue()
        self._worker: asyncio.Task | None = None
        self._started = False
        self.ready = False  # True once the model is built/compiled
        self.source = "uninitialized"
        self._checkpoint_dir = checkpoint_dir
        self._monitor_dir = monitor_dir
        self.monitor_source: str | None = None
        self._forward = None
        self._params = None
        self._temperature = 1.0
        self._meta: dict = {}
        self.restore_error: str | None = None
        self._call_count = 0  # decorrelates MC-dropout masks across calls
        # feature-space OOD wire field — resolved at model build time from
        # the checkpoint's maha_fit.npz (tools/fit_maha.py)
        self.has_feature_distance = False

    # ── lazy device setup (first use; jax import stays off server boot) ──
    def _ensure_model(self) -> None:
        if self._forward is not None:
            return
        import jax
        import jax.numpy as jnp

        from fav_tpu.models.cnn import create_model
        from fav_tpu.models.uncertainty import (
            anomaly_from_confidence,
            init_ensemble,
            mutual_information,
            predictive_entropy,
        )

        sample = jnp.zeros((1, self.cfg.image_size, self.cfg.image_size, self.cfg.channels))
        if self.uncertainty == "autoencoder":
            from fav_tpu.models.cnn import ConvAutoencoder, create_autoencoder

            # architecture must match the checkpoint: read metadata up front
            pre_meta = self._peek_metadata()
            if "ae_widths" in pre_meta:
                model = ConvAutoencoder(
                    widths=tuple(pre_meta["ae_widths"]),
                    latent=int(pre_meta.get("ae_latent", pre_meta["ae_widths"][-1])),
                    compute_dtype=self.cfg.compute_dtype,
                )
            else:
                model = create_autoencoder(self.cfg)
            params = model.init(jax.random.PRNGKey(0), sample)
        else:
            # the checkpoint's architecture/ensemble-size wins over config
            # defaults: restoring 3 committed members into a 5-member template
            # must be impossible, not a silent fall-through to random weights
            pre_meta = self._peek_metadata()
            from fav_tpu.config import model_params_from_metadata

            cfg = model_params_from_metadata(self.cfg, pre_meta)
            model = create_model(cfg)
            if self.uncertainty == "ensemble":
                ensemble_size = int(pre_meta.get("ensemble_size") or cfg.ensemble_size)
                params = init_ensemble(model, jax.random.PRNGKey(0), sample, ensemble_size)
            else:
                params = model.init(jax.random.PRNGKey(0), sample)
        self.source = "random_init"

        ckpt_dir = self._resolve_ckpt_dir()
        if os.path.isdir(ckpt_dir):
            try:
                from fav_tpu.utils.checkpoint import restore_checkpoint

                params, meta = restore_checkpoint(ckpt_dir, params)
                self._meta = meta
                self._temperature = float(meta.get("temperature", 1.0))
                self.source = f"checkpoint:{ckpt_dir}"
            except Exception as e:
                # a checkpoint exists but can't be restored — serving silently
                # degraded weights is the one unacceptable outcome (mirrors
                # the reference's fake-vs-real-ML explicitness,
                # anomaly_simulator.py:7-9)
                import sys
                import traceback

                self.restore_error = f"{type(e).__name__}: {e}"
                print(
                    f"[fav_tpu] WARNING: checkpoint at {ckpt_dir} failed to "
                    f"restore ({self.restore_error}); serving RANDOM weights",
                    file=sys.stderr,
                )
                traceback.print_exc()

        if self.uncertainty == "autoencoder":
            # normalize reconstruction MSE by the training-set baseline from
            # checkpoint metadata (reference's ~0.019 baseline precedent,
            # anomaly_simulator.py:22-24); saturate at 10x baseline
            baseline = float(getattr(self, "_meta", {}).get("err_baseline", 0.002)) or 0.002

            @jax.jit
            def ae_forward(params, images, key):  # key unused: AE is deterministic
                recon = model.apply(params, images)
                err = jnp.mean((recon - images.astype(recon.dtype)) ** 2, axis=(-3, -2, -1))
                anomaly = jnp.clip((err - baseline) / (9.0 * baseline), 0.0, 1.0)
                # same packed [B, 6] layout as the classifier path (one D2H):
                # prediction -1 (no label space), raw reconstruction error in
                # the entropy slot, set_size -1 (no conformal certificate)
                f32 = jnp.float32
                return jnp.stack(
                    [
                        jnp.full(err.shape, -1.0, f32),
                        (1.0 - anomaly).astype(f32),
                        anomaly.astype(f32),
                        err.astype(f32),
                        jnp.zeros_like(err, f32),
                        jnp.full(err.shape, -1.0, f32),
                    ],
                    axis=-1,
                )

            self._forward = ae_forward
            self._params = params
            return

        temperature = self._temperature
        mode = self.uncertainty
        mc_samples = self.cfg.mc_samples
        # deploy-time conformal sets: checkpoints trained since round 3 carry
        # the split-conformal threshold calibrated on clean held-out data
        # (fav_tpu/models/conformal.py:calibration_metadata); the per-frame
        # set SIZE is the difficulty signal (1 = confident singleton,
        # growing sets = the frame is sliding out of the certified regime)
        qhat = self._meta.get("conformal_qhat")

        # feature-space OOD reading: when the checkpoint carries a
        # maha_fit.npz (tools/fit_maha.py), the msp path also streams a
        # normalized relative-Mahalanobis ``feature_distance`` per frame
        # (0 ~ typical training frame, 1 ~ its 99th percentile) — the
        # label-free "how far off the training manifold" signal the
        # logit-space scores cannot see (fav_tpu/models/mahalanobis.py).
        # Fit matrices are closure-baked program constants (CLAUDE.md).
        maha_fit = None
        if mode == "msp" and self.source.startswith("checkpoint:"):
            from fav_tpu.models.mahalanobis import FIT_FILENAME, load_fit

            fit_path = os.path.join(ckpt_dir, FIT_FILENAME)
            if os.path.isfile(fit_path):
                maha_fit = load_fit(fit_path)
                # a stale fit (checkpoint retrained at a different width, old
                # npz left behind) would make the jitted forward fail at the
                # first frame — taking down all msp serving for an auxiliary
                # signal. Shape-check against the model's penultimate width
                # (eval_shape: abstract, no compile/device work) and degrade
                # to serving WITHOUT feature_distance instead.
                from fav_tpu.models.mahalanobis import features_and_logits

                feat_dim = jax.eval_shape(
                    lambda v, x: features_and_logits(model, v, x)[0],
                    params, sample,
                ).shape[-1]
                fit_dim = maha_fit.class_means.shape[1]
                if fit_dim != feat_dim:
                    import sys

                    print(
                        f"[fav_tpu] WARNING: {fit_path} feature dim {fit_dim} "
                        f"!= model penultimate width {feat_dim}; ignoring the "
                        f"stale fit (refit with tools/fit_maha.py)",
                        file=sys.stderr,
                    )
                    maha_fit = None
        self.has_feature_distance = maha_fit is not None
        # packed-row layout (one D2H per batch): 6 fixed columns, then the
        # monitored self-confidence, then the feature distance — indices
        # resolved at build time so _row_to_dict never guesses from width
        self._col_self_conf = 6 if self._monitor_dir else None
        self._col_rmd = (
            (7 if self._monitor_dir else 6) if maha_fit is not None else None
        )

        mon_conf_fn = None
        if self._monitor_dir:
            # the monitor must restore or the service fails loudly (see
            # __init__ docstring) — a silently-random monitor would gate
            # the reported confidence with noise
            import json

            from fav_tpu.config import model_params_from_metadata
            from fav_tpu.utils.checkpoint import restore_checkpoint

            mon_meta_path = os.path.join(self._monitor_dir, "metadata.json")
            if not os.path.isfile(mon_meta_path):
                raise ValueError(
                    f"monitor checkpoint missing: {self._monitor_dir}"
                )
            with open(mon_meta_path) as f:
                mon_meta = json.load(f)
            mon_cfg = model_params_from_metadata(ModelParams(), mon_meta)
            mon_model = create_model(mon_cfg)
            mon_params = mon_model.init(jax.random.PRNGKey(0), sample)
            mon_params, mon_meta = restore_checkpoint(self._monitor_dir, mon_params)
            mon_t = float(mon_meta.get("temperature", 1.0))
            self.monitor_source = f"checkpoint:{self._monitor_dir}"

            def mon_conf_fn(images):
                probs = jax.nn.softmax(mon_model.apply(mon_params, images) / mon_t, -1)
                return jnp.max(probs, axis=-1)

        def summarize(member_probs, mon_conf=None, rmd=None):
            """Pack every score into ONE [B, 6] float32 array (+1 column
            when a monitor gates, +1 when a Mahalanobis fit ships) — a
            single device-to-host fetch per batch. Per-field fetches cost a
            blocking round trip each over the tunneled TPU backend (~165 ms
            p50 at 8 live streams, measured); packing removed that entirely.
            With a monitor: column 1 becomes the min-gated operative
            confidence (and drives the anomaly), the self-confidence column
            keeps the predictor's own. Column indices live in
            self._col_self_conf / self._col_rmd (build-time layout)."""
            mean_probs = jnp.mean(member_probs, axis=0)
            self_conf = jnp.max(mean_probs, axis=-1)
            conf = self_conf if mon_conf is None else jnp.minimum(self_conf, mon_conf)
            if qhat is not None:
                from fav_tpu.models.conformal import prediction_sets, set_sizes

                sizes = set_sizes(prediction_sets(mean_probs, float(qhat)))
            else:
                sizes = jnp.full(conf.shape, -1, jnp.int32)  # sentinel: absent
            f32 = jnp.float32
            cols = [
                jnp.argmax(mean_probs, axis=-1).astype(f32),
                conf.astype(f32),
                anomaly_from_confidence(conf).astype(f32),
                predictive_entropy(mean_probs).astype(f32),
                mutual_information(member_probs).astype(f32),
                sizes.astype(f32),
            ]
            if mon_conf is not None:
                cols.append(self_conf.astype(f32))
            if rmd is not None:
                cols.append(rmd.astype(f32))
            return jnp.stack(cols, axis=-1)

        @jax.jit
        def forward(params, images, key):
            mon_conf = mon_conf_fn(images) if mon_conf_fn is not None else None
            if mode == "msp":
                if maha_fit is not None:
                    from fav_tpu.models.mahalanobis import (
                        features_and_logits,
                        mahalanobis_scores,
                        normalized_rmd,
                    )

                    feats, logits = features_and_logits(model, params, images)
                    rmd = normalized_rmd(
                        mahalanobis_scores(feats, maha_fit)["rmd"], maha_fit
                    )
                else:
                    logits = model.apply(params, images)
                    rmd = None
                return summarize(
                    jax.nn.softmax(logits / temperature, -1)[None], mon_conf, rmd
                )
            if mode == "mc_dropout":
                # per-call key: replicas must not reuse identical dropout
                # masks across frames, or the epistemic spread is a constant
                keys = jax.random.split(key, mc_samples)

                def one(k):
                    logits = model.apply(params, images, train=True, rngs={"dropout": k})
                    return jax.nn.softmax(logits / temperature, -1)

                return summarize(jax.vmap(one)(keys), mon_conf)
            # ensemble: vmap over the stacked member axis
            member = jax.vmap(
                lambda p: jax.nn.softmax(model.apply(p, images) / temperature, -1)
            )(params)
            return summarize(member, mon_conf)

        self._forward = forward
        self._params = params

    def _resolve_ckpt_dir(self) -> str:
        """Default checkpoint dir per uncertainty mode.

        ``msp`` serves the ensemble-distilled NANO student — the deployment
        shape bench.py measures: a statistical quality tie with the compact
        student on the full grid (0.730/0.806/ECE 0.077, snow sev5 honest at
        conf 0.22) at ~1/16 the full-width forward FLOPs and 1.66x the
        megastep throughput (tools/ab_student_nano.py, BENCH.md Quality) —
        falling back compact -> classifier when no student is shipped.
        ``mc_dropout`` needs a dropout-trained model, so it stays on the
        classifier."""
        if self._checkpoint_dir is not None:
            return self._checkpoint_dir
        from fav_tpu.utils.checkpoint import DEFAULT_CKPT_DIR

        name = {
            "ensemble": "ensemble",
            "autoencoder": "autoencoder",
            "msp": "student_nano",
        }.get(self.uncertainty, "classifier")
        ckpt_dir = os.path.join(DEFAULT_CKPT_DIR, name)
        if name == "student_nano":
            for fallback in ("student_nano", "student_compact", "classifier"):
                ckpt_dir = os.path.join(DEFAULT_CKPT_DIR, fallback)
                if os.path.isdir(ckpt_dir):
                    break
        return ckpt_dir

    def _peek_metadata(self) -> dict:
        """Read checkpoint metadata without loading params (architecture
        selection must precede template construction)."""
        import json

        ckpt_dir = self._resolve_ckpt_dir()
        meta_path = os.path.join(ckpt_dir, "metadata.json")
        if os.path.isfile(meta_path):
            try:
                with open(meta_path) as f:
                    return json.load(f)
            except Exception:
                pass
        return {}

    @property
    def degraded(self) -> bool:
        """True when the built model is serving anything OTHER than the
        trained checkpoint it was supposed to: the restore failed, or no
        checkpoint existed to restore. The server stamps ``model_degraded``
        into every WS state and keeps the model anomaly OUT of the trust
        engine while this holds — confident scores from random weights must
        never be presentable as real ML (the reference's fake-vs-real
        explicitness, reference anomaly_simulator.py:7-9). False while the
        model is still unbuilt (nothing is being served yet)."""
        return self._forward is not None and not self.source.startswith("checkpoint:")

    def info(self) -> dict:
        info = {
            "source": self.source,
            "temperature": self._temperature,
            "uncertainty": self.uncertainty,
        }
        if self.degraded:
            info["degraded"] = True
        if self._meta.get("conformal_qhat") is not None:
            info["conformal_alpha"] = self._meta.get("conformal_alpha")
            info["conformal_qhat"] = self._meta.get("conformal_qhat")
        if self._monitor_dir:
            info["monitor"] = self.monitor_source or f"pending:{self._monitor_dir}"
        if self.has_feature_distance:
            # dashboard badge: this deployment streams the feature-space
            # OOD reading (normalized relative Mahalanobis) per frame
            info["feature_distance"] = True
        if self.restore_error:
            info["error"] = f"checkpoint restore failed: {self.restore_error}"
        return info

    # ── public API ──
    def _ensure_worker(self) -> None:
        if not self._started:
            self._started = True
            self._worker = asyncio.get_running_loop().create_task(self._run())

    async def score_frame(self, frame_rgb01: np.ndarray) -> dict:
        """Submit one [S,S,3] float frame in [0,1]; await its scores."""
        self._ensure_worker()
        fut: asyncio.Future = asyncio.get_running_loop().create_future()
        await self._queue.put((frame_rgb01, fut))
        return await fut

    async def maybe_score_frame(self, frame_rgb01: np.ndarray) -> dict | None:
        """Non-blocking variant for the streaming tick: while the model is
        still building/compiling (tens of seconds on first use), return None
        immediately so the 30 Hz loop keeps its heartbeat — scores attach
        once warm. Kicks the worker so warmup starts on first call."""
        self._ensure_worker()
        if not self.ready:
            return None
        return await self.score_frame(frame_rgb01)

    async def close(self) -> None:
        if self._worker is not None:
            self._worker.cancel()
            try:
                await self._worker
            except asyncio.CancelledError:
                pass
            self._worker = None
            self._started = False

    # ── worker ──
    async def _run(self) -> None:
        try:
            await asyncio.to_thread(self._ensure_model)
            # compile the smallest bucket so the first real frame is instant
            warm = np.zeros(
                (self.cfg.image_size, self.cfg.image_size, self.cfg.channels), np.float32
            )
            await asyncio.to_thread(self._infer, [warm])
        except Exception as e:  # a dead scorer must be visible, not silent
            self.source = f"error:{type(e).__name__}: {e}"
            import traceback

            traceback.print_exc()
            # drain queue forever, failing any blocking score_frame callers
            while True:
                _, fut = await self._queue.get()
                if not fut.done():
                    fut.set_exception(RuntimeError(self.source))
        self.ready = True
        # PIPELINED dispatch/fetch (same rationale as AnalysisService._run):
        # the device-to-host fetch of a batch's packed scores costs a full
        # tunnel round trip while the device is busy ~1 ms. The worker
        # dispatches each batch and hands the blocking fetch to a thread,
        # immediately collecting the next batch. The forward is stateless
        # (params never donated), so in-flight batches cannot interact.
        inflight = asyncio.Semaphore(self._MAX_INFLIGHT)
        fetch_tasks: set = set()  # strong refs: bare create_task can be GC'd

        async def fetch_and_resolve(packed, batch, t0):
            try:
                host = await asyncio.to_thread(np.asarray, packed)
                if self.timer is not None:
                    self.timer.record("inference_device", time.perf_counter() - t0)
                for i, (_, f) in enumerate(batch):
                    if not f.done():
                        f.set_result(self._row_to_dict(host[i]))
            except Exception as e:
                for _, f in batch:
                    if not f.done():
                        f.set_exception(RuntimeError(f"inference failed: {e}"))
            finally:
                inflight.release()

        while True:
            frame, fut = await self._queue.get()
            batch = [(frame, fut)]
            # micro-batch: wait briefly for concurrent connections' frames
            deadline = asyncio.get_running_loop().time() + self.max_wait
            while len(batch) < BUCKETS[-1]:
                timeout = deadline - asyncio.get_running_loop().time()
                if timeout <= 0:
                    break
                try:
                    batch.append(await asyncio.wait_for(self._queue.get(), timeout))
                except asyncio.TimeoutError:
                    break
            await inflight.acquire()
            t0 = time.perf_counter()
            try:
                packed = await asyncio.to_thread(
                    self._dispatch, [f for f, _ in batch]
                )
            except Exception as e:
                inflight.release()
                for _, f in batch:
                    if not f.done():
                        f.set_exception(RuntimeError(f"inference failed: {e}"))
                continue
            task = asyncio.get_running_loop().create_task(
                fetch_and_resolve(packed, batch, t0)
            )
            fetch_tasks.add(task)
            task.add_done_callback(fetch_tasks.discard)

    _MAX_INFLIGHT = 4  # concurrent tunnel round trips (fetch side)

    def _dispatch(self, frames: list[np.ndarray]):
        """Enqueue one batch on the device; returns the packed [B, 6] scores
        device array WITHOUT fetching it (the caller pipelines the fetch)."""
        import jax
        import jax.numpy as jnp

        n = len(frames)
        bucket = next(b for b in BUCKETS if b >= n) if n <= BUCKETS[-1] else BUCKETS[-1]
        stack = np.zeros((bucket,) + frames[0].shape, np.float32)
        for i, f in enumerate(frames[:bucket]):
            stack[i] = f
        self._call_count += 1
        key = jax.random.fold_in(jax.random.PRNGKey(7), self._call_count)
        return self._forward(self._params, jnp.asarray(stack), key)

    def _infer(self, frames: list[np.ndarray]) -> list[dict]:
        """Synchronous dispatch + fetch (warmup path)."""
        packed = np.asarray(self._dispatch(frames))
        # ONE D2H fetch for the whole batch; rows: [pred, conf, anomaly,
        # entropy, mutual_info, set_size(-1 = no conformal certificate)]
        return [self._row_to_dict(packed[i]) for i in range(len(frames))]

    def _row_to_dict(self, row: np.ndarray) -> dict:
        res = {
            "prediction": int(row[0]),
            "confidence": round(float(row[1]), 4),
            "model_anomaly": round(float(row[2]), 4),
            "entropy": round(float(row[3]), 4),
        }
        if self.uncertainty != "msp":
            res["mutual_information"] = round(float(row[4]), 4)
        if row[5] >= 0:
            res["conformal_set_size"] = int(row[5])
        col_self = getattr(self, "_col_self_conf", None)
        if col_self is not None:
            # monitored serving: row[1] was the min-gated confidence; the
            # predictor's own confidence rides its own column
            res["confidence_self"] = round(float(row[col_self]), 4)
        col_rmd = getattr(self, "_col_rmd", None)
        if col_rmd is not None:
            # normalized relative Mahalanobis (models/mahalanobis.py):
            # 0 ~ typical training frame, 1 ~ its 99th percentile
            res["feature_distance"] = round(float(row[col_rmd]), 4)
        return res
