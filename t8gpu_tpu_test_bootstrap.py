"""pytest bootstrap plugin (loaded via `-p t8gpu_tpu_test_bootstrap` in addopts).

Imported by pytest BEFORE fd capture starts, so it can re-exec the test run
with an environment that (a) disables the eagerly-registered TPU backend the
container's sitecustomize installs and (b) forces an 8-virtual-device CPU
platform, as the multi-device sharding tests require.  A plain conftest would
be too late: sitecustomize already initialized the TPU PJRT client, and
re-exec from conftest loses output to pytest's already-active fd capture.
"""

import os
import sys

if os.environ.get("T8GPU_TPU_TEST_REEXEC") != "1":
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        PALLAS_AXON_POOL_IPS="",
        T8GPU_TPU_TEST_REEXEC="1",
    )
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
