"""fav_tpu — TPU-native failure-aware vision framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``Indra-jith/failure-aware-vision`` (reference mounted at /root/reference):

* a temporal **trust engine** mapping rule-based vision status + a bounded ML
  anomaly signal to a reliability scalar and a deterministic safety policy
  (reference: ``platform/backend/trust_engine.py``),
* a **signal analyzer** scoring camera frames for blur / blackout / freeze /
  corruption (reference: ``platform/backend/signal_analyzer.py``), fused into
  a single Pallas TPU kernel for batched throughput,
* CIFAR-10-C style **corruption transforms** (15 corruptions x 5 severities)
  as on-device kernels feeding an on-device CNN classifier,
* **uncertainty machinery**: max-softmax confidence, predictive entropy,
  MC-dropout replicas and deep ensembles as vmapped forward passes,
  temperature-scaling calibration, ECE / AUROC failure detection,
* a **streaming decision-support server** speaking the reference's exact
  WebSocket/HTTP contract (reference: ``platform/backend/main.py``) on a
  dependency-free asyncio runtime,
* **mesh parallelism** (data / ensemble axes) via ``jax.sharding`` + XLA
  collectives over ICI.

Layout:
    fav_tpu.core      trust engine (host float64 + JAX scan), attribution, logging
    fav_tpu.ops       signal analysis, corruption kernels (jnp reference + Pallas)
    fav_tpu.models    Flax CNN / autoencoder, uncertainty, calibration, training
    fav_tpu.parallel  mesh construction, sharded sweeps, ensemble sharding
    fav_tpu.data      CIFAR-10 loading (real files or synthetic fallback)
    fav_tpu.sim       vision/anomaly simulators (parity with the reference)
    fav_tpu.io        threaded video capture, JPEG codecs (C++ fast path)
    fav_tpu.serving   asyncio HTTP + WebSocket runtime and the app routes
    fav_tpu.utils     profiling, checkpointing, misc
"""

__version__ = "0.1.0"

from fav_tpu.config import FrameworkConfig, TrustParams, AnalyzerParams  # noqa: F401
