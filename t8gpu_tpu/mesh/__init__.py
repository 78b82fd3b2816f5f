from t8gpu_tpu.mesh.connectivity import FaceConnectivity, build_connectivity  # noqa: F401
from t8gpu_tpu.mesh.uniform import uniform_mesh  # noqa: F401
