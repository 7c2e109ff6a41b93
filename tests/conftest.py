"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding (ppocr_tpu.parallel) is validated the JAX way — with
``xla_force_host_platform_device_count`` — since only one physical TPU chip
is attached during development (SURVEY.md §4).
"""

import os

# Force the hermetic CPU backend with 8 virtual devices. NOTE: this
# environment exports JAX_PLATFORMS=axon globally and the env var is NOT
# honored once the plugin registers, so jax.config is the only reliable
# switch — set it before anything touches a backend.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# reuse compiled executables across test runs (XLA CPU compiles the det
# graph slowly at large shapes; see ppocr_tpu.utils.xla_cache)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", str(REPO_ROOT / ".jax_cache")
)

REFERENCE_ROOT = pathlib.Path("/root/reference")

import pytest  # noqa: E402

from ppocr_tpu.utils import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


@pytest.fixture(scope="session")
def reference_models():
    path = REFERENCE_ROOT / "models"
    if not path.exists():
        pytest.skip("reference models not mounted")
    return path


@pytest.fixture(scope="session")
def card_image_path():
    path = REFERENCE_ROOT / "images" / "card-jd.jpg"
    if not path.exists():
        pytest.skip("reference card image not mounted")
    return path
