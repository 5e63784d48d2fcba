from fav_tpu.ops.signal import (  # noqa: F401
    AnalyzerCarry,
    FrameMetrics,
    SignalAnalyzer,
    analyze_clip,
    analyze_frame_jax,
    init_analyzer_carry,
)
from fav_tpu.ops.corruptions import (  # noqa: F401
    CORRUPTION_NAMES,
    SEVERITIES,
    apply_corruption,
    corruption_fn,
)
from fav_tpu.ops.corruptions_pallas import (  # noqa: F401
    corrupt_normalize_pallas,
    elastic_transform_pallas,
    fast_corruption_fn,
    gaussian_noise_pallas,
    glass_blur_pallas,
    impulse_noise_pallas,
)
from fav_tpu.ops.signal_pallas import analyze_frames_pallas, frame_stats_pallas  # noqa: F401
from fav_tpu.ops.augment import NUM_OPS, augment_op, augmix, js_consistency  # noqa: F401
