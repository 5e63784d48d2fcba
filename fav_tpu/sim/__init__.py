from fav_tpu.sim.vision_sim import VisionSimulator  # noqa: F401
from fav_tpu.sim.anomaly_sim import AnomalySimulator  # noqa: F401
