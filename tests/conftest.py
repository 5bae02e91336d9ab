"""Test environment: force CPU backend with 8 virtual devices so mesh /
shard_map / psum paths run in CI without TPU hardware (SURVEY.md §4
implication (4)). Must run before jax is imported anywhere."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment pre-registers an 'axon' TPU backend and pins
# jax_platforms='axon,cpu' from sitecustomize, so the env var alone is not
# enough — override the config before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_IMAGES = "/root/reference/KeyPointDetection/images"


@pytest.fixture()
def rng():
    # function-scoped: every test gets the same deterministic stream
    # regardless of which other tests ran before it
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def blox():
    """256x256 bundled test image (reference C9), as float32 [0,1]."""
    from visualslam_tpu.utils.images import load_gray

    return load_gray(os.path.join(REFERENCE_IMAGES, "blox.jpg"))


@pytest.fixture(scope="session")
def home():
    """512x384 bundled test image used by the reference DoG main
    (Diff_of_Gauss.cpp:730)."""
    from visualslam_tpu.utils.images import load_gray

    return load_gray(os.path.join(REFERENCE_IMAGES, "home.jpg"))
