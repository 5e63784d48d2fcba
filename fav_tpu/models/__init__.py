"""Model zoo: CIFAR-scale CNN classifier, conv autoencoder, uncertainty
machinery (MC-dropout / deep ensembles), and calibration (temperature
scaling, ECE, AUROC failure detection).

The reference describes — but does not include — a PyTorch convolutional
autoencoder whose reconstruction error is the ML anomaly signal
(reference docs/system_notes.md:146-198, architecture.html:150-175); its
in-repo stand-in is ``platform/backend/anomaly_simulator.py``. Here the
models are real, on-device, and jit/vmap/pjit-native.
"""

from fav_tpu.models.cnn import FailureAwareCNN, ConvAutoencoder  # noqa: F401
from fav_tpu.models.uncertainty import (  # noqa: F401
    max_softmax_probability,
    predictive_entropy,
    mc_dropout_predict,
    ensemble_predict,
    init_ensemble,
)
from fav_tpu.models.calibration import (  # noqa: F401
    expected_calibration_error,
    fit_temperature,
    auroc,
    reliability_diagram,
)
