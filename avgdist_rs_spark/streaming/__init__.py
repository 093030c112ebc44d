from .superstep import Checkpointer, SuperstepMetrics  # noqa: F401
