from t8gpu_tpu.ops import euler, rk  # noqa: F401
