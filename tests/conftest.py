"""Test bootstrap: run the suite on a virtual 8-device CPU mesh.

Multi-chip behavior is tested without TPU hardware via
``--xla_force_host_platform_device_count`` (the standard fake-mesh trick,
SURVEY.md §4).  Pallas kernels run in interpreter mode on CPU (see
ops/pallas/common.use_interpret).  Set ``VTB_TEST_PLATFORM=tpu`` to run the
suite against real hardware instead.
"""

import os

os.environ.setdefault("VTB_TEST_PLATFORM", "cpu")

if os.environ["VTB_TEST_PLATFORM"] == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        )
    import jax

    jax.config.update("jax_platforms", "cpu")
