"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the platform env vars *before* jax is imported anywhere, so this
sits at the very top of conftest. Parity/golden tests use the same math on
CPU; sharding tests get 8 fake devices (SURVEY.md section 4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell exports axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize imports jax at interpreter startup (before this
# conftest), so the env vars above are too late for jax's import-time config
# reads — override through the config API as well (backends are not
# initialized yet at conftest import time).
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden():
    """Loader for committed oracle golden files (tests/golden/*.npz)."""

    def load(name: str):
        path = GOLDEN_DIR / f"{name}.npz"
        if not path.exists():
            pytest.skip(f"golden file {name}.npz not generated (tools/gen_goldens.py)")
        return np.load(path)

    return load
