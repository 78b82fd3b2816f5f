from t8gpu_tpu.memory.store import VariableStore  # noqa: F401
