from t8gpu_tpu.io.vtk import write_vtu  # noqa: F401
