from gnnla_tpu.utils.metrics import (Timer, edges_per_second, MetricsLogger,
                                     profile_trace)

__all__ = ["Timer", "edges_per_second", "MetricsLogger", "profile_trace"]
