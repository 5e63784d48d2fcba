from fav_tpu.ops.signal import (  # noqa: F401
    AnalyzerCarry,
    FrameMetrics,
    SignalAnalyzer,
    analyze_clip,
    analyze_frame_jax,
    init_analyzer_carry,
)
