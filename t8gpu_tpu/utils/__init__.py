from t8gpu_tpu.utils.config import EulerConfig, AMRConfig  # noqa: F401
from t8gpu_tpu.utils.profiling import Timer, timed  # noqa: F401
