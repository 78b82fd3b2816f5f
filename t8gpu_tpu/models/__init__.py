from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver, VariableList, StepList  # noqa: F401
from t8gpu_tpu.models import initial_conditions  # noqa: F401
