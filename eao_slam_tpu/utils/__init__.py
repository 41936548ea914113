from eao_slam_tpu.utils.profiling import StageProfiler, annotate, device_trace

__all__ = ["StageProfiler", "annotate", "device_trace"]
